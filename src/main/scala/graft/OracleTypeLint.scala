package graft

import org.apache.spark.sql.types._

/** Build-time guard for the cross-engine hash channel (r10 VERDICT #2).
  *
  * The driver's correctness gate hashes the Spark result and the DuckDB
  * oracle result after canonicalizing values. Some output types are
  * value-identical on both sides yet canonicalize differently — they
  * ship red rows with CORRECT answers, and the class has now cost three
  * round-entries (x3 in r8 and r9; m22b in r10). Known fragile classes:
  *
  *  1. DecimalType(precision > 18) — DuckDB backs precision 19-38 with
  *     INT128 (HUGEINT); its textual canonicalization diverges from
  *     Spark's parquet DECIMAL. Precision <= 18 is INT64-backed on both
  *     engines and proven stable (`sql_decimal`). Fix: keep sums under
  *     precision 19 (`CAST(... AS DECIMAL(18,2))` both sides) or emit
  *     exact integer minor units (BIGINT cents). MECHANICALLY LINTED.
  *  2. Unrounded DoubleType from order-dependent aggregation — float
  *     reassociation across partitions flaps the low bits. Fix:
  *     `round(x, k)` on BOTH sides. Not mechanically lintable (a double
  *     column is fine when it is deterministic, e.g. a literal or a
  *     per-row expression), so enforced by the registry convention at
  *     the top of `Queries.scala`.
  *  3. BIGINT sums in the DuckDB oracle — DuckDB widens sum(BIGINT) to
  *     HUGEINT; the oracle must `CAST(sum(...) AS BIGINT)`. Spark-side
  *     schemas cannot see this, so it is convention too — but the lint
  *     refusing class 1 removes the only schema where the widened
  *     HUGEINT could NOT be cast back losslessly in practice.
  *
  * Enforced in two places: `Verify` refuses to dump a fragile schema
  * (the driver round-trip fails loudly with this message instead of a
  * silent hash mismatch), and `OracleTypeLintSpec` sweeps every
  * oracle-checked registry query at sf0.001 so the red row is caught in
  * `sbt test` before a round is burned.
  */
object OracleTypeLint {

  /** Max decimal precision that stays INT64-backed in both engines. */
  val MaxStableDecimalPrecision = 18

  /** All hash-fragile leaf types reachable in `schema`, as
    * human-readable "path: why" strings; empty means lint-clean. */
  def violations(schema: StructType): Seq[String] = {
    def walk(path: String, dt: DataType): Seq[String] = dt match {
      case d: DecimalType if d.precision > MaxStableDecimalPrecision =>
        Seq(s"$path: DECIMAL(${d.precision},${d.scale}) — precision > " +
          s"$MaxStableDecimalPrecision is INT128/HUGEINT-backed in DuckDB " +
          "and hash-canonicalizes differently (x3 r8/r9, m22b r10); " +
          "cast both sides to DECIMAL(<=18,s) or emit BIGINT minor units")
      case s: StructType =>
        s.fields.toSeq.flatMap(f => walk(s"$path.${f.name}", f.dataType))
      case ArrayType(et, _) => walk(s"$path[]", et)
      case MapType(kt, vt, _) =>
        walk(s"$path<key>", kt) ++ walk(s"$path<value>", vt)
      case _ => Nil
    }
    schema.fields.toSeq.flatMap(f => walk(f.name, f.dataType))
  }

  /** Throws with every violation listed if `schema` is hash-fragile. */
  def check(queryName: String, schema: StructType): Unit = {
    val v = violations(schema)
    require(v.isEmpty,
      s"oracle-checked query '$queryName' outputs hash-fragile column " +
        s"type(s) — it would ship a red CORRECTNESS row with correct " +
        s"values:\n  ${v.mkString("\n  ")}")
  }
}
