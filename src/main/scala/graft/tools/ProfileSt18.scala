package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level timing of st18_stream_scd2_dim (the r9 bench's heaviest
  * query): splits the wall into fixture construction (staging/silver
  * caches, the two delta merge commits, the dim seed), the stream
  * itself (two foreachBatch SCD2 steps), and the convergence PROOF
  * (the single-shot batch re-run + both exceptAll directions) — the
  * proof deliberately computes the dim a second time, a cost the query
  * pays for its oracle that a production run would not. Run:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.ProfileSt18"
  */
object ProfileSt18 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s.range(1000000).selectExpr("sum(id)").collect()

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[st18] $label%-36s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    import org.apache.spark.sql.streaming.Trigger
    import graft.jobs.{PaymentData, PaymentJobs}
    val root = "/tmp/graft_profile_st18"
    graft.core.FsUtil.deleteRecursively(new java.io.File(root))
    val st = new graft.core.TableStore(s, root)
    val (staging, silverAll, silverPre) = t("fixture: staging+silver caches") {
      val stg = PaymentJobs.bronzeStaging(PaymentData.transactions(s, dir))
        .withColumn("is_deleted", lit(false)).cache()
      val all = PaymentJobs.silverFromBronze(stg).cache()
      all.count()
      val pre = PaymentJobs.silverFromBronze(
        stg.filter(col("updated_at") === col("transaction_timestamp") &&
          col("transaction_timestamp") < lit("1998-01-01").cast("timestamp_ntz")))
      (stg, all, pre)
    }
    val silverDay1 = silverPre.filter(
      col("customer_id").isNull || !col("customer_id").like("USER_09%"))
    t("fixture: silver create + CDF") {
      st.create("silver", silverDay1)
      st.setChangeFeed("silver", true)
    }
    val delta = t("fixture: delta derive + cache") {
      val d = silverAll.join(
        silverDay1.select("transaction_id", "updated_at"),
        Seq("transaction_id", "updated_at"), "left_anti").cache()
      d.count(); d
    }
    val half = when(col("customer_id").isNull, lit(0L))
      .otherwise(pmod(xxhash64(col("customer_id")), lit(2)))
    t("fixture: 2 delta merge commits") {
      st.mergeUpsert("silver", delta.filter(half === 0L),
        Seq("transaction_id"), changeTypeCol = None)
      st.mergeUpsert("silver", delta.filter(half === 1L),
        Seq("transaction_id"), changeTypeCol = None)
    }
    val cfg = graft.ops.Scd2.Config("customer_id", "customer_key",
      Seq("customer_tier", "last_transaction_date"))
    val today = to_date(lit("2026-08-12"))
    val dim1 = t("fixture: dim seed build + create") {
      val d = graft.ops.SurrogateKeys.byOrder(
          PaymentJobs.customerAggregates(silverPre)
            .filter(!col("customer_id").like("USER_09%")),
          "customer_key", Seq(col("customer_id")))
        .withColumn("effective_start_date", to_date(lit("2026-01-01")))
        .withColumn("effective_end_date", lit(null).cast("date"))
        .withColumn("is_current", lit(true))
        .cache()
      st.create("dim", d); d
    }
    s.conf.set("spark.sql.catalog.graft_pst18", "graft.sources.GraftCatalog")
    s.conf.set("spark.sql.catalog.graft_pst18.root", root)
    t("stream: 2 SCD2 micro-batch steps") {
      val q = s.readStream
        .option("startVersion", "1").option("maxVersionsPerTrigger", "1")
        .table("graft_pst18.silver.changes")
        .writeStream.option("checkpointLocation", s"$root/_ckpt")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          t(s"  batch $id step") {
            val b = batch.cache()
            val v = b.select(max("_commit_version")).head().getLong(0)
            val affected = b.select("customer_id")
              .filter(col("customer_id").isNotNull).distinct()
            val snapshot = PaymentJobs.customerAggregates(
                st.readVersion("silver", v))
              .join(affected, Seq("customer_id"), "left_semi")
            st.overwrite("dim",
              graft.ops.Scd2.step(st.read("dim"), snapshot, cfg, today))
            b.unpersist(): Unit
          }
        }
        .start()
      q.awaitTermination()
    }
    t("proof: batch re-run + exceptAll x2") {
      val streamed = st.read("dim").cache()
      val batchRun = graft.ops.Scd2.step(dim1,
        PaymentJobs.customerAggregates(silverAll), cfg, today)
      val biz = streamed.columns.filterNot(_ == "customer_key").sorted.map(col).toSeq
      val (sb, bb) = (streamed.select(biz: _*), batchRun.select(biz: _*))
      require(sb.exceptAll(bb).isEmpty && bb.exceptAll(sb).isEmpty)
    }
    t("final: read + drain") {
      st.read("dim").queryExecution.toRdd.count()
    }
    s.stop()
  }
}
