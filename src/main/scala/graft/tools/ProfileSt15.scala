package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level timing of st15_stream_dedup_admission (the bench's
  * heaviest streaming query): separates fixture construction (shingle
  * cache, seeded bucketed band index, the two source commits) from the
  * stream itself (two foreachBatch admission micro-batches), so a slow
  * run says WHICH side to optimize — the operator, or the harness that
  * builds its inputs. Run:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.ProfileSt15"
  */
object ProfileSt15 {
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
      println(f"[st15] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    val root = "/tmp/graft_profile_st15"
    graft.core.FsUtil.deleteRecursively(new java.io.File(root))
    val st = new graft.core.TableStore(spark, root)

    val sh = t("shingle hash + cache") {
      val s = graft.QueriesLlm.hashedShinglesFor(spark, sfDir).cache()
      s.count(); s
    }
    t("seed band index (bucketed)") {
      st.createBucketed("band_index",
        graft.ops.Dedup.minhashBands(
          sh.filter(col("doc_id") % 3 === 2), "doc_id", "h"),
        Seq("bkey"), 16)
    }
    t("source commits (2 versions)") {
      val docs = graft.Tables.documents(spark, sfDir).select("doc_id", "text")
      st.create("incoming", docs.filter(col("doc_id") % 3 === 1))
      st.append("incoming", docs.filter(col("doc_id") % 3 === 0))
      st.createEmpty("admitted", org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id BIGINT, batch BIGINT"))
    }
    spark.conf.set("spark.sql.catalog.graft_pst15", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_pst15.root", root)
    t("stream: 2 admission batches") {
      import org.apache.spark.sql.streaming.Trigger
      val q = spark.readStream.option("maxVersionsPerTrigger", "1")
        .table("graft_pst15.incoming")
        .writeStream
        .option("checkpointLocation", s"$root/_ckpt")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          t(s"  batch $id admission") {
            val batchSh = sh.join(b.select("doc_id").distinct(),
              Seq("doc_id"), "left_semi").cache()
            val batchBands =
              graft.ops.Dedup.minhashBands(batchSh, "doc_id", "h").cache()
            val idxBands = st.read("band_index")
            val corpusSh = sh.join(idxBands.select("doc_id").distinct(),
              Seq("doc_id"), "left_semi")
            val rejected = graft.ops.Dedup.nearDupsAgainstIndex(
              batchBands, idxBands, batchSh, corpusSh, "doc_id", "h",
              threshold = 0.5)
            val admitted = batchSh.select(col("doc_id")).distinct()
              .join(rejected.select(col("batch_id").as("doc_id")),
                Seq("doc_id"), "left_anti")
            st.append("band_index",
              batchBands.join(admitted, Seq("doc_id"), "left_semi"))
            st.append("admitted", admitted.withColumn("batch", lit(id)))
            batchSh.unpersist(); batchBands.unpersist(): Unit
          }
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    println(s"[st15] admitted rows: ${st.read("admitted").count()}")
    spark.stop()
  }
}
