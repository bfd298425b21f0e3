package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-benchmark for the columnar deletion-vector skip: scans a
  * DV'd table through the DSv2 catalog twice — once on the vectorized
  * path (GraftDvSkipColumnarReader + RemappedColumnVector) and once
  * with `-Dgraft.sql.vectorized=false`-equivalent row decoding — and
  * prints one JSON line with both timings. Run:
  *   sbt "runMain graft.tools.DvBench"
  */
object DvBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = Files.createTempDirectory("dvbench").toString
    spark.conf.set("spark.sql.catalog.dvb", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.dvb.root", root)
    val ts = new graft.core.TableStore(spark, root)
    // 8M rows across 8 files; DV-delete ~1% scattered so EVERY file
    // carries a deletion vector (the post-merge-on-read hot state)
    val n = 8000000L
    ts.create("t", spark.range(n).repartition(8)
      .select(col("id"), (col("id") * 3).as("x"),
        concat(lit("payload_"), col("id") % 1000).as("s")).toDF())
    ts.deleteVectorized("t", col("id") % 100 === 0L)
    def time(vectorized: Boolean): Double = {
      sys.props("graft.sql.vectorized") = vectorized.toString
      spark.sql("SELECT sum(x) FROM dvb.t WHERE id >= 0").collect() // warm
      val t0 = System.nanoTime()
      val r = spark.sql("SELECT sum(x), sum(length(s)) FROM dvb.t WHERE id >= 0")
        .collect()(0)
      val sec = (System.nanoTime() - t0) / 1e9
      require(r.getLong(0) > 0)
      sec
    }
    val row = time(vectorized = false)
    val col0 = time(vectorized = true)
    sys.props.remove("graft.sql.vectorized")
    println(s"""{"metric":"dv_scan","rows":$n,"row_path_sec":$row,""" +
      s""""columnar_sec":$col0,"speedup":${row / col0}}""")
    spark.stop()
  }
}
