package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measured scaling evidence for the r14 sketch-state IVM kinds: does
  * sketch maintenance hold its two cost claims as the SOURCE grows
  * 1x/4x/16x?
  *   - UNION arm (insert-only batch of fixed size): O(touched groups)
  *     register unions — expect flat: the batch is constant, the view
  *     read is bucket-pruned to the touched groups, the source is
  *     never read.
  *   - RECOMPUTE arm (delete touching a FIXED set of 5 groups): a
  *     version-pinned group-pruned source read — with the source
  *     BUCKETED on the group key the probe reads only those groups'
  *     buckets, so the wall tracks the affected groups' rows (which
  *     scale with volume) but never the table scan. The same delete
  *     against an UNCLUSTERED source is measured beside it: that arm
  *     degrades toward a scan, which is exactly why the kind's
  *     documentation tells 100 TB deployments to cluster the source
  *     on the view's group key (or accept scan-cost retractions).
  *   - ROLLUP hard arm: the coarse recompute reads the SKETCH VIEW
  *     (one row per fine group), not the source — expect flat at any
  *     source volume.
  * Fresh store per k (history depth constant, only volume varies).
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.ScaleProbeSketch"
  */
object ScaleProbeSketch {
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
      .select(col("l_orderkey"), col("l_suppkey"))
    def corpus(k: Int): DataFrame =
      (0 until k).map { i =>
        base.select(
          (col("l_orderkey") + lit(i.toLong * 100000000L)).as("l_orderkey"),
          col("l_suppkey"))
      }.reduce(_ unionByName _)
        .withColumn("cgrp", col("l_suppkey") % 10)
        .select(col("cgrp"), col("l_suppkey"), col("l_orderkey"))

    def t(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      (System.nanoTime() - t0) / 1e9
    }

    for (k <- Seq(1, 4, 16)) {
      val data = corpus(k).localCheckpoint()
      val nRows = data.count()
      def build(name: String, clustered: Boolean): graft.core.TableStore = {
        val root = s"/tmp/graft_probe_sketch_$name"
        graft.core.FsUtil.deleteRecursively(new java.io.File(root))
        val st = new graft.core.TableStore(spark, root)
        if (clustered)
          st.createBucketed("src", data, Seq("l_suppkey"), n = 64)
        else st.create("src", data)
        st.setChangeFeed("src", true)
        graft.ops.Ivm.createCountSumView(st, "fine", "src",
          Seq("cgrp", "l_suppkey"), "l_orderkey", kind = "sketch_distinct")
        st.setChangeFeed("fine", true)
        graft.ops.Ivm.createSketchRollup(st, "roll", "fine", Seq("cgrp"))
        st
      }
      val stC = build("c", clustered = true)
      val stU = build("u", clustered = false)
      // fixed 10k-row insert-only batch: NEW fine groups (suppkey
      // offset), so the rollup absorbs by pure register union
      val batch = data.limit(10000)
        .select(col("cgrp"), (col("l_suppkey") + 1000000L).as("l_suppkey"),
          col("l_orderkey"))
        .localCheckpoint()
      def refreshAll(st: graft.core.TableStore): Unit =
        { graft.ops.Ivm.refreshView(st, "roll"): Unit }
      stC.append("src", batch)
      val unionSec = t(refreshAll(stC))
      // delete touching a FIXED 5-group set: the fine recompute arm,
      // group-pruned (bucketed src) vs scan-bound (unclustered src)
      val hot = Seq(7L, 19L, 31L, 43L, 55L)
      stC.deleteVectorized("src", col("l_suppkey").isin(hot: _*))
      val recomputeClusteredSec = t(refreshAll(stC))
      stU.deleteVectorized("src", col("l_suppkey").isin(hot: _*))
      val recomputeUnclusteredSec = t(refreshAll(stU))
      println(f"""{"k":$k,"rows":$nRows,"union_sec":$unionSec%.2f,""" +
        f""""recompute_clustered_sec":$recomputeClusteredSec%.2f,""" +
        f""""recompute_unclustered_sec":$recomputeUnclusteredSec%.2f}""")
      Seq("c", "u").foreach(n => graft.core.FsUtil.deleteRecursively(
        new java.io.File(s"/tmp/graft_probe_sketch_$n")))
    }
    spark.stop()
  }
}
