package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measured scaling evidence for the r14 quantile IVM kind — the
  * kind's claim is STRONGER than the sketch kinds' and so is the bar:
  * bin counts form a full abelian group, there is NO recompute arm,
  * so a fixed-size batch must cost the SAME whether it is insert-only,
  * delete-only, or a bin-moving update, and that cost must be FLAT as
  * the source grows 1x/4x/16x (the source is never read — not even on
  * retraction, where sketch_distinct pays a group-pruned source read).
  * Extraction (readQuantileView) is measured beside it: the view holds
  * one row per group regardless of source volume, so the quantile walk
  * must be volume-invariant too.
  * Fresh store per k (history depth constant, only volume varies).
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.ScaleProbeQuantile"
  */
object ScaleProbeQuantile {
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

    val base = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey"),
        col("l_extendedprice").cast("double").as("v"))
    def corpus(k: Int): DataFrame =
      (0 until k).map { i =>
        base.select(
          (col("l_orderkey") + lit(i.toLong * 100000000L)).as("l_orderkey"),
          col("l_suppkey"), col("v"))
      }.reduce(_ unionByName _)

    def t(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      (System.nanoTime() - t0) / 1e9
    }

    for (k <- Seq(1, 4, 16)) {
      val data = corpus(k).localCheckpoint()
      val nRows = data.count()
      val root = "/tmp/graft_probe_quantile"
      graft.core.FsUtil.deleteRecursively(new java.io.File(root))
      val st = new graft.core.TableStore(spark, root)
      st.create("src", data)
      st.setChangeFeed("src", true)
      graft.ops.Ivm.createCountSumView(st, "qv", "src",
        Seq("l_suppkey"), "v", kind = "quantile")
      def refresh(): Unit = { graft.ops.Ivm.refreshView(st, "qv"): Unit }
      // three FIXED 10k-row batches against existing groups — by the
      // abelian-group claim all three are one algebra pass apiece
      val ins = data.limit(10000)
        .select((col("l_orderkey") + 900000000L).as("l_orderkey"),
          col("l_suppkey"), col("v"))
        .localCheckpoint()
      st.append("src", ins)
      val insertSec = t(refresh())
      st.deleteVectorized("src", col("l_orderkey") >= 900000000L)
      val deleteSec = t(refresh())
      st.updateVectorized("src", col("l_orderkey") < 10000L,
        Map("v" -> (col("v") * 2.0))) // every touched value moves bins
      val updateSec = t(refresh())
      val extractSec = t {
        graft.ops.Ivm.readQuantileView(st, "qv", Seq(0.5, 0.95, 0.99))
          .agg(sum(col("q95"))).collect(): Unit
      }
      println(f"""{"k":$k,"rows":$nRows,"insert_sec":$insertSec%.2f,""" +
        f""""delete_sec":$deleteSec%.2f,"update_sec":$updateSec%.2f,""" +
        f""""extract_sec":$extractSec%.2f}""")
      graft.core.FsUtil.deleteRecursively(new java.io.File(root))
    }
    spark.stop()
  }
}
