package graft.tools
import org.apache.spark.sql.SparkSession
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val name = args.headOption.getOrElse("d3_minhash_lsh")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.show(20, false)
    println("rows=" + df.count())
    spark.stop()
  }
}
