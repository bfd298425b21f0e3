package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing of job_fact_load and job_gdpr_propagate — the two
  * heaviest benched job-family queries after job_incremental (which has
  * its own ProfileIncremental). Splits each benched wall into fixture
  * (planted-defect generator + staging/pipeline construction) vs the
  * operator proper (the merge / the GDPR mark+propagate), so the
  * PLANS.md cost floors say how much of the wall a 100 TB run would
  * actually pay per unit of work. Same code paths as
  * QueriesJobs.factLoadCore / gdprCore, instrumented inline. Run:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.ProfileJobs"
  */
object ProfileJobs {
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

    def t[A](tag: String, label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[$tag] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    // ---- job_fact_load (QueriesJobs.factLoadCore) ----
    locally {
      val root = "/tmp/graft_profile_factload"
      graft.core.FsUtil.deleteRecursively(new java.io.File(root))
      val st = new graft.core.TableStore(spark, root)
      val total0 = System.nanoTime()
      val silver = t("factload", "fixture: silver cache+count") {
        val tx = graft.jobs.PaymentData.transactions(spark, sfDir)
        val s0 = graft.QueriesJobs.stampedSilver(graft.jobs.PaymentJobs.bronzeStaging(tx))
        val c = s0.cache(); c.count(); c
      }
      val fact = t("factload", "fixture: fact star cache+count") {
        val f = graft.QueriesJobs.fullFact(spark, silver).cache(); f.count(); f
      }
      t("factload", "fixture: seed createBucketed(32)") {
        require(!fact.isEmpty, "load_fact gate: empty source")
        val retired = spark.sql(graft.QueriesJobs.RetiredRowSparkSql)
        val seed = fact.filter(col("date_key") % 2 === 0)
          .withColumn("gateway_revenue", lit(0.0))
          .unionByName(retired)
        st.createBucketed("fact_transactions", seed, Seq("transaction_id"), n = 32)
      }
      t("factload", "operator: full-fact mergeUpsert") {
        st.mergeUpsert("fact_transactions", fact, Seq("transaction_id"),
          changeTypeCol = None)
      }
      t("factload", "job_control record") {
        val n = fact.count()
        val jc = new graft.ops.JobControl(st)
        jc.record("load_fact", "BATCH_0001", "gold", "SUCCESS",
          Timestamp.valueOf("2026-08-12 00:00:00"), Timestamp.valueOf("2026-08-12 01:00:00"),
          None, n, n, 0)
      }
      t("factload", "final: read + drain") {
        st.read("fact_transactions").queryExecution.toRdd.count()
      }
      println(f"[factload] TOTAL                              ${(System.nanoTime() - total0) / 1e9}%7.2f s")
      silver.unpersist(); fact.unpersist(): Unit
    }

    // ---- job_gdpr_propagate (QueriesJobs.gdprCore) ----
    locally {
      val root = "/tmp/graft_profile_gdpr"
      graft.core.FsUtil.deleteRecursively(new java.io.File(root))
      val st = new graft.core.TableStore(spark, root)
      val total0 = System.nanoTime()
      val tx = graft.jobs.PaymentData.transactions(spark, sfDir)
      val staging = t("gdpr", "fixture: staging cache+count") {
        val s0 = graft.jobs.PaymentJobs.stagingWithAudit(tx).cache(); s0.count(); s0
      }
      val bronze = t("gdpr", "fixture: bronzeLoad (seed+CDC merge)") {
        graft.jobs.PaymentJobs.bronzeLoad(st, staging)
      }
      t("gdpr", "fixture: loadSilver createBucketed") {
        graft.jobs.PaymentJobs.loadSilver(st, bronze): Unit
      }
      t("gdpr", "operator: bronze UPDATE (mark)") {
        st.update("bronze_transactions",
          condition = col("customer_id") === "USER_0042",
          set = Map(
            "is_deleted" -> lit(true),
            "deleted_at" -> graft.jobs.PaymentJobs.now,
            "delta_change_type" -> lit("DELETE")))
      }
      t("gdpr", "operator: silver mergeDelete (propagate)") {
        val deletedIds = st.read("bronze_transactions")
          .filter(col("is_deleted")).select("transaction_id")
        st.mergeDelete("silver_transactions", deletedIds, Seq("transaction_id"))
      }
      t("gdpr", "final: read + drain") {
        st.read("silver_transactions").queryExecution.toRdd.count()
      }
      println(f"[gdpr] TOTAL                              ${(System.nanoTime() - total0) / 1e9}%7.2f s")
      staging.unpersist(): Unit
    }
    spark.stop()
  }
}
