package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dirs-read evidence for the FK-index scale story (r12 VERDICT #3/#4,
  * replacing PLANS.md's "FK clustering would dir-prune it" caveat with
  * numbers).
  *
  * The dim-term / B-key probe asks "which live view rows carry these
  * FK values?". Dir-granularity pruning obeys one law: a probe reads
  * ~min(|candidate rows|, |dirs|) dirs — so on a 32-dir local fixture
  * NOTHING prunes (any realistic candidate set hits every dir), while
  * a 100 TB table has 10^5 dirs and the same candidate set touches a
  * fraction. This probe builds the scale-representative shape — a
  * 512-leaf-dir view, a customer-grained FK (~190 rows/fk) — and
  * measures, for dim changes touching 1/8/64 FKs:
  *   - the SCAN path (no index): full view scan + broadcast semi-join;
  *     dirs read = all.
  *   - the INDEX path: `<view>__fkidx` (bucketed on fk) read by the
  *     affected FKs -> candidate view keys -> view read via its own
  *     bucket layout. Dirs read = |affected fk buckets| narrow index
  *     dirs + min(|cand|, 512) wide view dirs.
  * Wall = min of 3, alternating; dirs counted via probeDirCount (the
  * exact sets readProbe scans — deterministic, contention-immune).
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.ProbeFkIndex"
  */
object ProbeFkIndex {
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
      .select(col("l_orderkey"), col("l_suppkey"), col("l_quantity"))
    val k = 16
    val corpus = (0 until k).map { i =>
        base.select((col("l_orderkey") + lit(i.toLong * 100000000L)).as("l_orderkey"),
          col("l_suppkey"), col("l_quantity"))
      }.reduce(_ unionByName _)
      // customer-grained fk: ~50k distinct -> ~190 rows per fk at 16x
      .withColumn("fk", col("l_orderkey") % 50021L)
      .localCheckpoint()

    // view dir count: 512 default; 4096 probes the law past the r13
    // extrapolation point (SPARK_GRAFT_FKIDX_BUCKETS=4096) — the regime
    // where even an 8-FK candidate set reads a fraction of dirs wide
    val buckets =
      sys.env.getOrElse("SPARK_GRAFT_FKIDX_BUCKETS", "512").toInt
    val root = "/tmp/graft_probe_fkidx"
    graft.core.FsUtil.deleteRecursively(new java.io.File(root))
    val st = new graft.core.TableStore(spark, root)
    st.createBucketed("v", corpus.withColumn("_live", lit(true)),
      Seq("l_orderkey"), n = buckets)
    graft.ops.Ivm.enableFkIndex(st, "v", Seq("fk"), Seq("l_orderkey"),
      buckets = 512)
    val idx = graft.ops.Ivm.fkIndexTable("v")

    def t(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      (System.nanoTime() - t0) / 1e9
    }
    for (nFks <- Seq(1, 8, 64)) {
      val fks = (0 until nFks).map(i => 7L + 613L * i)
      val probe = spark.createDataset(fks)(
        org.apache.spark.sql.Encoders.scalaLong).toDF("fk").localCheckpoint()
      def scanProbe(): Long = st.read("v").filter(col("_live"))
        .join(broadcast(probe), Seq("fk"), "left_semi")
        .select(col("l_orderkey")).count()
      def ixProbe(): Long = {
        val cand = st.readProbe(idx, probe, Seq("fk"))
          .join(broadcast(probe), Seq("fk"), "left_semi")
          .select(col("l_orderkey")).distinct().localCheckpoint()
        st.readProbe("v", cand, Seq("l_orderkey")).filter(col("_live"))
          .join(broadcast(probe), Seq("fk"), "left_semi")
          .select(col("l_orderkey")).count()
      }
      // affected-row parity first (the probe must be EXACT)
      require(scanProbe() == ixProbe(), s"probe mismatch at nFks=$nFks")
      val (scanSecs, ixSecs) = (1 to 3).map(_ => (t(scanProbe()), t(ixProbe()))).unzip
      val candRows = st.readProbe(idx, probe, Seq("fk"))
        .join(broadcast(probe), Seq("fk"), "left_semi")
        .select(col("l_orderkey")).distinct().localCheckpoint()
      val (dIdx, dIdxTot) = st.probeDirCount(idx, probe, Seq("fk"))
      val (dView, dViewTot) = st.probeDirCount("v", candRows, Seq("l_orderkey"))
      println(f"""{"n_fks":$nFks,"cand_rows":${candRows.count()},""" +
        f""""dirs_scan":$dViewTot,"dirs_ix_index":$dIdx/$dIdxTot,""" +
        f""""dirs_ix_view":$dView/$dViewTot,""" +
        f""""scan_sec_min":${scanSecs.min}%.2f,"ix_sec_min":${ixSecs.min}%.2f}""")
    }
    graft.core.FsUtil.deleteRecursively(new java.io.File(root))
    spark.stop()
  }
}
