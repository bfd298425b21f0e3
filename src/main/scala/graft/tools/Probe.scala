package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // set AFTER session creation to test dynamic settability
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = "/root/testdata/sf0.01"
    for (t <- Seq("events", "lineitem", "orders", "documents", "embeddings")) {
      val df = spark.read.parquet(s"$dir/$t.parquet")
      println(s"== $t: ${df.schema.map(f => f.name + ":" + f.dataType.simpleString).mkString(", ")}")
    }
    val ev = spark.read.parquet(s"$dir/events.parquet")
    ev.withColumn("ts_str", date_format(timestamp_micros(col("ts") / 1000 cast "long"), "yyyy-MM-dd HH:mm:ss.SSSSSS")).show(3, false)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    println("docs=" + docs.count() + " distinct_text=" + docs.select("text").distinct.count())
    spark.stop()
  }
}
