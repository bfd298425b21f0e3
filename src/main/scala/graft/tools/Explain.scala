package graft.tools
import org.apache.spark.sql.SparkSession
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val name = args.headOption.getOrElse("e2_cosine_neardup")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.explain("formatted")
    val t0 = System.nanoTime()
    println("rows=" + df.count() + " sec=" + (System.nanoTime() - t0) / 1e9)
    spark.stop()
  }
}
