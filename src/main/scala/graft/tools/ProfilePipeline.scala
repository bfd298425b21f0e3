package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.core.TableStore
import graft.jobs.{PaymentData, PaymentJobs}

/** Dev profiling harness: stage-level wall-clock of the payment
  * pipeline composites (the bench's slow set). Not part of the driver
  * contract. */
object ProfilePipeline {
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
    Tables.all.foreach(t => Tables.load(spark, sfDir, t).count())

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    val root = java.nio.file.Files.createTempDirectory("profile").toString
    val store = new TableStore(spark, root)
    val txns = t("read txns")(PaymentData.transactions(spark, sfDir))
    val staging = t("bronzeStaging+cache") {
      val s = PaymentJobs.bronzeStaging(txns)
        .withColumn("is_deleted", lit(false))
        .withColumn("deleted_at", lit(null).cast("timestamp_ntz"))
        .cache()
      s.count(); s
    }
    val originals = staging.filter(col("updated_at") === col("transaction_timestamp"))
    t("createBucketed bronze n=32") {
      store.createBucketed("bronze_transactions",
        originals.withColumn("delta_change_type", lit("LOAD"))
          .withColumn("delta_version", lit(1L)),
        keys = Seq("transaction_id"), n = 32)
    }
    val cdcBatch = staging
      .filter(expr("CAST(substring(transaction_id, 5, 20) AS BIGINT)") % 50 === 0)
      .withColumn("delta_change_type", lit("ignored"))
      .withColumn("delta_version", lit(2L))
    t("mergeUpsert bronze (CDC)") {
      store.mergeUpsert("bronze_transactions", cdcBatch,
        Seq("transaction_id", "updated_at"))
    }
    val bronze = store.read("bronze_transactions")
    val silver = t("silverFromBronze+cache") {
      val s = PaymentJobs.silverFromBronze(bronze).cache(); s.count(); s
    }
    t("createBucketed silver n=32") {
      store.createBucketed("silver_transactions", silver,
        keys = Seq("transaction_id"), n = 32)
    }
    val fact = t("factStar compute") {
      val f = PaymentJobs.factStar(silver, PaymentJobs.dimCustomerCurrent(silver),
        PaymentJobs.dimMerchantCurrent(silver),
        PaymentJobs.dimPaymentMethod(silver), PaymentJobs.dimStatus(silver),
        graft.ops.DateSpine.dimDate(spark, "1995-01-01", "2002-12-31"))
      f.queryExecution.toRdd.count(); f
    }
    t("createBucketed fact n=32") {
      store.createBucketed("fact_transactions",
        fact.filter(col("date_key") % 2 === 0), Seq("transaction_id"), n = 32)
    }
    t("mergeUpsert fact") {
      store.mergeUpsert("fact_transactions", fact, Seq("transaction_id"),
        changeTypeCol = None)
    }
    spark.stop()
  }
}
