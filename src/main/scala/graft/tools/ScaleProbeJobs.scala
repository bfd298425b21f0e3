package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measured scaling evidence for the COMPOSITE payment jobs (r7 VERDICT
  * #2) — the three heaviest job-family queries, which until now were
  * argued-by-composition only. Replicates the sf0.1 orders slice at
  * 1x/4x/16x with disjoint o_orderkey ranges (same 1000 customers —
  * volume per entity grows, entity count doesn't, the GDPR/tier stress
  * shape), feeds it through PaymentData.transactionsFrom (the EXACT
  * planted-defect generator the benched jobs consume), and times the
  * EXACT core each QDef runs (QueriesJobs.incrementalCore /
  * factLoadCore / gdprCore — shared code, not a re-implementation).
  *
  * Expectations:
  *  - job_incremental: ~linear in admitted volume (two bounded scans +
  *    one bucket-pruned merge; fixed commit cost dominates at 1x),
  *  - job_fact_load: ~linear in fact rows (star build is broadcast
  *    joins; the merge rewrites every bucket since the source IS the
  *    full fact),
  *  - job_gdpr_propagate: pipeline ~linear; the gdprDelete increment
  *    should stay FLAT-ish in time vs 16x volume per customer only if
  *    stats/bloom pruning holds (that's the claim under test).
  * Run:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.ScaleProbeJobs"
  */
object ScaleProbeJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect() // warm

    val base = graft.Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_totalprice"))
    val nBase = base.count()

    // k replicas with disjoint order keys: transaction volume scales kx,
    // the customer/merchant population stays fixed (defect rates stay
    // statistically identical — the planted patterns are modular)
    def orders(k: Int): DataFrame =
      (0 until k).map { i =>
        base.select((col("o_orderkey") + lit(i.toLong * 100000000L)).as("o_orderkey"),
          col("o_custkey"), col("o_orderdate"), col("o_totalprice"))
      }.reduce(_ unionByName _)

    def t(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      (System.nanoTime() - t0) / 1e9
    }
    def drain(df: DataFrame): Unit = { df.queryExecution.toRdd.count(); () }

    for (k <- Seq(1, 4, 16)) {
      val tx = graft.jobs.PaymentData.transactionsFrom(orders(k))
        .localCheckpoint() // pin: timings exclude fixture synthesis
      val incrSec = t { drain(graft.QueriesJobs.incrementalCore(
        spark, tx, s"probe_incr_k$k")) }
      val factSec = t { drain(graft.QueriesJobs.factLoadCore(
        spark, tx, s"probe_fact_k$k")) }
      val gdprSec = t { drain(graft.QueriesJobs.gdprCore(
        spark, tx, s"probe_gdpr_k$k")) }
      spark.catalog.clearCache()
      println(f"""{"k":$k,"orders":${nBase * k},""" +
        f""""incremental_sec":$incrSec%.2f,"fact_load_sec":$factSec%.2f,""" +
        f""""gdpr_sec":$gdprSec%.2f}""")
      Seq("incr", "fact", "gdpr").foreach(n =>
        graft.core.FsUtil.deleteRecursively(
          new java.io.File(s"/tmp/graft_qstore/probe_${n}_k$k")))
    }
    spark.stop()
  }
}
