package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level timing of job_quarantine_replay (the heaviest job-family
  * query without a documented cost floor): separates fixture
  * construction (synthesize transactions, bronze staging+load, create
  * the quarantine table) from the operator proper (the two replay
  * merges — the second proves exactly-once is a no-op re-merge), so a
  * slow run says WHICH side to optimize. Run:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.ProfileReplay"
  */
object ProfileReplay {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[replay] $label%-30s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    val root = "/tmp/graft_profile_replay"
    graft.core.FsUtil.deleteRecursively(new java.io.File(root))
    val st = new graft.core.TableStore(spark, root)
    import graft.jobs.{PaymentData, PaymentJobs}

    val txns = t("synthesize transactions") {
      val x = PaymentData.transactions(spark, sfDir).cache(); x.count(); x
    }
    t("bronze staging + load") {
      PaymentJobs.bronzeLoad(st, PaymentJobs.bronzeStaging(txns))
    }
    t("create quarantine table") {
      st.create("bronze_quarantine", PaymentJobs.bronzeQuarantine(txns))
    }
    val clock = lit("2030-06-01 00:00:00").cast("timestamp_ntz")
    t("replay 1 (merges rows)") {
      PaymentJobs.quarantineReplay(st, st.read("bronze_quarantine"), clock).count()
    }
    t("replay 2 (exactly-once no-op)") {
      PaymentJobs.quarantineReplay(st, st.read("bronze_quarantine"), clock).count()
    }
    txns.unpersist()
    spark.stop()
  }
}
