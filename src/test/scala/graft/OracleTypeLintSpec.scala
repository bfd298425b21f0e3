package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Registry-wide guard for hash-fragile oracle output types (r10
  * VERDICT #2): the class that shipped x3 red for two rounds and m22b
  * in r10 — values identical on both engines, checksum channel broken.
  *
  * Three layers, cheapest first:
  *  - static: every registered oracle SQL is swept for explicit
  *    DECIMAL(p>18) casts — the driver's compare needs matching types,
  *    so a fragile Spark output always comes WITH a fragile cast in
  *    the SQL (m22b's said `DECIMAL(22,2)` verbatim). Zero-cost full
  *    registry coverage at `sbt test` time.
  *  - dynamic spot-check: the previously-red query's real output
  *    schema is lint-clean, and a deliberately fragile DataFrame is
  *    refused — proving the Verify-side wiring would fire.
  *  - complete: `Verify` itself lints EVERY oracle-checked query's
  *    materialized schema before dumping (a full-registry runtime
  *    sweep costs ~4.5 min at sf0.001, so it lives in the per-round
  *    Verify run, not here).
  */
class OracleTypeLintSpec extends AnyFunSuite {
  lazy val spark = SparkTest.session
  private val sfDir = "/root/testdata/sf0.001"

  test("DECIMAL precision > 18 is refused, <= 18 passes") {
    assert(OracleTypeLint.violations(StructType(Seq(
      StructField("ok", DecimalType(18, 2)),
      StructField("n", LongType)))).isEmpty)
    val v = OracleTypeLint.violations(StructType(Seq(
      StructField("bad", DecimalType(22, 2)))))
    assert(v.size == 1 && v.head.contains("DECIMAL(22,2)"))
  }

  test("fragile decimals are found at every nesting level") {
    val fragile = DecimalType(38, 6)
    val schema = StructType(Seq(
      StructField("s", StructType(Seq(StructField("d", fragile)))),
      StructField("a", ArrayType(fragile)),
      StructField("m", MapType(StringType, fragile))))
    val v = OracleTypeLint.violations(schema)
    assert(v.size == 3)
    assert(v.exists(_.startsWith("s.d:")))
    assert(v.exists(_.startsWith("a[]:")))
    assert(v.exists(_.startsWith("m<value>:")))
  }

  test("deliberately registering a DECIMAL(22,2) output fails the check") {
    import spark.implicits._
    val df = Seq(BigDecimal("1.23")).toDF("x")
      .selectExpr("CAST(x AS DECIMAL(22,2)) AS sum_price")
    val e = intercept[IllegalArgumentException](
      OracleTypeLint.check("deliberate_fragile", df.schema))
    assert(e.getMessage.contains("deliberate_fragile"))
    assert(e.getMessage.contains("DECIMAL(22,2)"))
  }

  test("static sweep: no registered oracle SQL casts to DECIMAL(p>18)") {
    val pat = raw"(?i)DECIMAL\s*\(\s*(\d+)".r
    val offenders = Queries.oracles.toSeq.flatMap { case (name, sql) =>
      pat.findAllMatchIn(sql).map(_.group(1).toInt)
        .filter(_ > OracleTypeLint.MaxStableDecimalPrecision)
        .map(p => s"$name (DECIMAL($p,...))")
    }
    assert(offenders.isEmpty,
      s"oracle SQL casts to a hash-fragile decimal precision — DuckDB " +
        s"backs precision > 18 with HUGEINT and the driver's hash " +
        s"canonicalization diverges (x3 r8/r9, m22b r10): " +
        offenders.mkString(", "))
  }

  test("m22b (the r10 red row) now emits a hash-stable schema") {
    val df = Queries.all("m22b_widen_prune").fn(spark, sfDir)
    OracleTypeLint.check("m22b_widen_prune", df.schema)
    val byName = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(byName("sum_price_cents") === LongType)
    assert(byName("sum_qty") === LongType)
  }
}
