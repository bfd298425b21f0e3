package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing of job_incremental (the bench's heaviest job-family
  * query, and the one that regressed 5.45 s -> 15.95 s between rounds 7
  * and 8 with an UNCHANGED query body): splits the benched wall into
  * fixture (planted-defect generator + bronzeStaging cache), the day-1
  * bucketed create, the day-2 own-watermark merge, the job_control
  * appends, and the final read, so the regression is attributable to a
  * specific commit-path stage rather than "the query got slower". Same
  * code path as QueriesJobs.incrementalCore, instrumented inline. Run:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.ProfileIncremental"
  */
object ProfileIncremental {
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
    spark.range(1000000).selectExpr("sum(id)").collect()

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[incr] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    val total0 = System.nanoTime()
    val root = "/tmp/graft_profile_incr"
    graft.core.FsUtil.deleteRecursively(new java.io.File(root))
    val st = new graft.core.TableStore(spark, root)
    val jc = new graft.ops.JobControl(st)

    val staging = t("fixture: staging cache+count") {
      val tx = graft.jobs.PaymentData.transactions(spark, sfDir)
      val s0 = graft.jobs.PaymentJobs.bronzeStaging(tx).cache()
      s0.count(); s0
    }
    val cutoff = lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    def ntz(ts: Timestamp) = lit(ts.toString.stripSuffix(".0")).cast("timestamp_ntz")
    val batch1 = staging.filter(col("updated_at") < cutoff)
      .withColumn("is_late_arrival", lit(false))
      .withColumn("arrival_delay_hours", lit(0))
      .withColumn("delta_change_type", lit("LOAD"))
    t("day1: createBucketed(32)") {
      st.createBucketed("bronze_transactions", batch1, Seq("transaction_id"), n = 32)
    }
    val (n1, w1) = t("day1: count + max(updated_at)") {
      (batch1.count(), Timestamp.valueOf(batch1.agg(max("updated_at"))
        .head().getAs[java.time.LocalDateTime](0)))
    }
    t("day1: job_control init+record") {
      jc.record("load_bronze", "BATCH_D1", "bronze", "SUCCESS",
        Timestamp.valueOf("2026-08-11 00:00:00"), Timestamp.valueOf("2026-08-11 01:00:00"),
        Some(w1), n1, n1, 0)
    }
    val w = t("day2: lastWatermark read") { ntz(jc.lastWatermark("load_bronze").get) }
    val incr = staging.filter(col("updated_at") > w)
      .withColumn("is_late_arrival", graft.ops.Validation.isLateArrival(
        col("transaction_timestamp"), col("updated_at"), w))
      .withColumn("arrival_delay_hours",
        when(col("is_late_arrival"), graft.ops.Validation.arrivalDelayHours(
          col("transaction_timestamp"), col("updated_at"))).otherwise(lit(0)))
      .withColumn("delta_change_type", lit("INCREMENTAL"))
    t("day2: mergeUpsert composite key") {
      st.mergeUpsert("bronze_transactions", incr,
        Seq("transaction_id", "updated_at"), changeTypeCol = None)
    }
    val (n2, w2) = t("day2: count + max(updated_at)") {
      (incr.count(), Timestamp.valueOf(incr.agg(max("updated_at"))
        .head().getAs[java.time.LocalDateTime](0)))
    }
    t("day2: job_control record") {
      jc.record("load_bronze", "BATCH_D2", "bronze", "SUCCESS",
        Timestamp.valueOf("2026-08-12 00:00:00"), Timestamp.valueOf("2026-08-12 01:00:00"),
        Some(w2), n2, n2, 0)
    }
    t("rerun: idempotency count") {
      val rerun = staging.filter(
        col("updated_at") > ntz(jc.lastWatermark("load_bronze").get)).count()
      require(rerun == 0, s"idempotency violated: re-run admitted $rerun rows")
    }
    t("final: read + drain") {
      st.read("bronze_transactions").withColumn("watermark_used", w)
        .queryExecution.toRdd.count()
    }
    println(f"[incr] TOTAL                              ${(System.nanoTime() - total0) / 1e9}%7.2f s")
    spark.stop()
  }
}
