package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Where does an append on a 10^4/10^5-dir manifest spend its time?
  * ProbeManifest measured the wall superlinear (0.82 s at 10^4,
  * 48.7 s at 10^5); this probe rebuilds the fixture and SAMPLES the
  * driver thread's stack every 50 ms during the append, printing the
  * collapsed top frames. Run:
  *   sbt "runMain graft.tools.ProbeAppendHot [n]"
  */
object ProbeAppendHot {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = Files.createTempDirectory(s"probeapphot$n").toString
    val ts = new graft.core.TableStore(spark, root)
    val tmpl = Files.createTempDirectory("pah_tmpl")
    spark.range(0, 3200, 1, 32)
      .select(col("id"), concat(lit("v"), col("id")).as("v"))
      .sortWithinPartitions("id")
      .write.mode("overwrite").parquet(tmpl.toString)
    val parts = {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(Files.list(tmpl))(_.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).toSeq.sortBy(_.toString))
    }
    ts.create("t", spark.range(1).select(col("id"),
      concat(lit("v"), col("id")).as("v")))
    val batch = "b000000001-probe"
    val batchPath = ts.dataRoot("t").resolve(batch)
    var k = 0
    while (k < n) {
      val leaf = batchPath.resolve(s"__b=$k")
      Files.createDirectories(leaf)
      Files.createLink(leaf.resolve("part-0.parquet"), parts(k % parts.size))
      k += 1
    }
    ts.attachBucketedDirs("t", batch, replace = true)
    println(s"[apphot] fixture ready: $n dirs")

    val main = Thread.currentThread()
    val samples = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = true
    val sampler = new Thread(() => {
      while (sampling) {
        val st = main.getStackTrace
        // collapse to the deepest graft/spark frame few levels
        val key = st.take(8)
          .map(f => s"${f.getClassName}.${f.getMethodName}:${f.getLineNumber}")
          .mkString(" <- ")
        if (key.nonEmpty) samples.merge(key, 1, (a, b) => a + b)
        Thread.sleep(50)
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    val t0 = System.nanoTime()
    ts.append("t", spark.range(1).select(col("id"),
      concat(lit("v"), col("id")).as("v")))
    val wall = (System.nanoTime() - t0) / 1e9
    sampling = false
    println(f"[apphot] append wall ${wall}%.2f s; top stacks:")
    import scala.jdk.CollectionConverters._
    samples.asScala.toSeq.sortBy(-_._2.intValue).take(12).foreach { case (s, c) =>
      println(f"[apphot] $c%5d  $s")
    }
    graft.core.FsUtil.deleteRecursively(new java.io.File(root))
    graft.core.FsUtil.deleteRecursively(tmpl.toFile)
    spark.stop()
  }
}
