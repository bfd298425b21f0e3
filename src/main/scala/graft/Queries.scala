package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Operator-inventory queries (SURVEY.md §2) + their DuckDB oracles.
  *
  * Conventions that keep the driver's hash-compare deterministic:
  *  - every computed column is aliased identically in Spark and SQL;
  *  - double aggregates are rounded on both sides (floating-point
  *    reassociation across partitions would otherwise flap the hash);
  *  - integer sums are CAST(... AS BIGINT) in DuckDB (it widens to
  *    HUGEINT) to match Spark's LongType;
  *  - anything ranked or picked has a total order (unique tie-break);
  *  - event timestamps go through a single NANOS->micros truncation
  *    identical to DuckDB's CAST(ts AS TIMESTAMP).
  */
object Queries {

  type Q = (SparkSession, String) => DataFrame

  /** One operator query + its DuckDB oracle (None -> rows-only check). */
  final case class QDef(fn: Q, sql: Option[String])

  val all: Map[String, QDef] =
    Map(
      "q1_agg" -> QDef(
        (s: SparkSession, dir: String) =>
          Tables.lineitem(s, dir)
            .groupBy(col("l_returnflag"), col("l_linestatus"))
            .agg(
              round(sum(col("l_quantity")), 2).as("sum_qty"),
              round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
              round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
              round(avg(col("l_quantity")), 4).as("avg_qty"),
              count(lit(1)).as("count_order")),
        Some("""SELECT l_returnflag, l_linestatus,
               |  round(sum(l_quantity), 2) AS sum_qty,
               |  round(sum(l_extendedprice), 2) AS sum_base_price,
               |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               |  round(avg(l_quantity), 4) AS avg_qty,
               |  count(*) AS count_order
               |FROM lineitem
               |GROUP BY l_returnflag, l_linestatus""".stripMargin))
    ) ++ modules.flatMap(_._2) ++ failCanary

  // ONE module list feeds both the `all` merge above and the duplicate
  // check below — a module registered in one but not the other (the
  // silent-shadowing escape hatch) is structurally impossible.
  private lazy val modules: Seq[(String, Map[String, QDef])] = Seq(
    "relational" -> QueriesRelational.defs, "mutation" -> QueriesMutation.defs,
    "llm" -> QueriesLlm.defs, "jobs" -> QueriesJobs.defs,
    "streaming" -> QueriesStreaming.defs, "multimodal" -> QueriesMultimodal.defs,
    "corpus" -> QueriesCorpus.defs, "temporal" -> QueriesTemporal.defs)

  // a query name registered in two modules would silently shadow the
  // earlier one in the ++ merge above — the same "query vanishes from
  // the artifact with no error" class as r5's 13 missing entries. Fail
  // loudly at first touch instead.
  locally {
    // "zz_fail_canary" is ALWAYS checked even though failCanary only
    // registers it under GRAFT_FAIL_CANARY=1: it merges LAST, so a
    // module registering that name would be silently shadowed exactly
    // when the canary is armed
    val dups = (Seq("q1_agg", "zz_fail_canary") ++ modules.flatMap(_._2.keys))
      .groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
    require(dups.isEmpty,
      s"duplicate query names across modules (one would silently shadow " +
        s"the other): ${dups.mkString(", ")}")
  }

  /** Harness self-test (env-gated, absent from normal runs): a query
    * that always throws, for demonstrating that Verify records an
    * explicit red entry and Bench an explicit "failed" name instead of
    * silently omitting them — the r5 failure mode where 13 broken
    * queries vanished from one artifact and read as fast successes in
    * the other. Enable with GRAFT_FAIL_CANARY=1. */
  private def failCanary: Map[String, QDef] =
    if (!sys.env.contains("GRAFT_FAIL_CANARY")) Map.empty
    else Map("zz_fail_canary" -> QDef(
      (s, _) => s.range(1).select(expr("assert_true(id > 0)").as("boom"), col("id")),
      Some("SELECT CAST(NULL AS BOOLEAN) AS boom, 0 AS id")))

  def registry: Map[String, Q] = all.map { case (k, d) => k -> d.fn }

  def oracles: Map[String, String] =
    all.collect { case (k, QDef(_, Some(sql))) => k -> sql }
}
