package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Fixed-cost breakdown of a SMALL commit — the per-version floor every
  * mutation query's fixture history and every streaming micro-batch
  * pays. Times 12 sequential 100-row appends (after one warm-up create)
  * and then isolates the components driver-side: the Spark write job,
  * footer stats collection, manifest encode+link, pointer move. Run:
  *   sbt "runMain graft.tools.ProbeCommit"
  */
object ProbeCommit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect() // warm
    val root = Files.createTempDirectory("probecommit").toString
    val ts = new graft.core.TableStore(spark, root)
    val df = spark.range(100).select(col("id"),
      concat(lit("v"), col("id")).as("v"))
    ts.create("t", df)
    // warm the append path once (codegen, classloading)
    ts.append("t", df)
    val n = 12
    val t0 = System.nanoTime()
    var i = 0
    while (i < n) { ts.append("t", df); i += 1 }
    val per = (System.nanoTime() - t0) / 1e9 / n
    println(f"[commit] small append end-to-end      $per%7.3f s/commit")

    // component: the bare Spark write job of the same 100 rows
    val w0 = System.nanoTime()
    i = 0
    while (i < n) {
      df.write.mode("overwrite").parquet(s"$root/bare_write_$i"); i += 1
    }
    println(f"[commit]   bare parquet write job     ${(System.nanoTime() - w0) / 1e9 / n}%7.3f s/job")

    // component: footer stats collection on one such dir
    val s0 = System.nanoTime()
    i = 0
    while (i < n) {
      graft.core.DirStats.collect(
        java.nio.file.Paths.get(s"$root/bare_write_0"), df.schema): Unit
      i += 1
    }
    println(f"[commit]   footer stats collect       ${(System.nanoTime() - s0) / 1e9 / n}%7.3f s/dir")

    // versions on disk after the loop — sanity that nothing rebased
    println(s"[commit] final version ${ts.currentVersion("t")}")
    spark.stop()
  }
}
