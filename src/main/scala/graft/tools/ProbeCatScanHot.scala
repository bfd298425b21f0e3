package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Where does a point-predicate catalog scan on a 10^5-dir table spend
  * its time? Samples the driver thread during the count. Run:
  *   sbt "runMain graft.tools.ProbeCatScanHot [n]"
  */
object ProbeCatScanHot {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = Files.createTempDirectory(s"probecathot$n").toString
    val ts = new graft.core.TableStore(spark, root)
    val tmpl = Files.createTempDirectory("pch_tmpl")
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
    println(s"[cathot] fixture ready: $n dirs")
    spark.conf.set("spark.sql.catalog.pch", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.pch.root", root)

    val main = Thread.currentThread()
    val samples = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = true
    val sampler = new Thread(() => {
      while (sampling) {
        val st = main.getStackTrace
        val key = st.take(10)
          .map(f => s"${f.getClassName.split('.').last}.${f.getMethodName}:${f.getLineNumber}")
          .mkString(" <- ")
        if (key.nonEmpty) samples.merge(key, 1, (a, b) => a + b)
        Thread.sleep(25)
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    val t0 = System.nanoTime()
    val c = spark.table("pch.t").filter(col("id") === 1234L).count()
    val wall = (System.nanoTime() - t0) / 1e9
    sampling = false
    println(f"[cathot] count=$c wall ${wall}%.2f s; top stacks:")
    import scala.jdk.CollectionConverters._
    samples.asScala.toSeq.sortBy(-_._2.intValue).take(10).foreach { case (s, cnt) =>
      println(f"[cathot] $cnt%5d  $s")
    }
    // second run, warm (plan caches, fs cache)
    val t1 = System.nanoTime()
    val c2 = spark.table("pch.t").filter(col("id") === 1235L).count()
    println(f"[cathot] warm second scan ${(System.nanoTime() - t1) / 1e9}%.2f s (count=$c2)")
    graft.core.FsUtil.deleteRecursively(new java.io.File(root))
    graft.core.FsUtil.deleteRecursively(tmpl.toFile)
    spark.stop()
  }
}
