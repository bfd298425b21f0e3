package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object DebugEr1 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val clean = graft.Tables.part(s, dir).select(col("p_partkey"), col("p_name"))
    println("parts: " + clean.count())
    def stats(name: String, key: org.apache.spark.sql.Column) = {
      val k = clean.select(key.as("blk")).groupBy("blk").count()
      val row = k.agg(count(lit(1)), max("count"), sum(col("count")*col("count"))).head()
      println(f"$name%8s distinct=${row.getLong(0)}%6d maxBlock=${row.getLong(1)}%8d sumSq(pairs)=${row.getLong(2)}%14d")
    }
    stats("prefix2", substring(col("p_name"), 1, 2))
    stats("suffix2", substring(col("p_name"), -2, 2))
    stats("suffix4", substring(col("p_name"), -4, 4))
    def t[A](l: String)(f: => A): A = { val t0=System.nanoTime(); val r=f; println(f"[er1] $l ${(System.nanoTime()-t0)/1e9}%.2f s"); r }
    val dirty = clean.select(col("p_partkey").as("probe_key"),
      concat(substring(col("p_name"), 1, 2), expr("substring(p_name, 4)")).as("probe_name"))
    def branch(key: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      dirty.withColumn("blk", key(col("probe_name")))
        .join(clean.withColumn("blk", key(col("p_name"))), Seq("blk")).drop("blk")
        .filter(abs(length(col("p_name")) - length(col("probe_name"))) <= 2)
    t("prefix candidates count") { println(branch(n => substring(n,1,2)).count()) }
    t("suffix candidates count") { println(branch(n => substring(n,-2,2)).count()) }
    t("prefix lev pass") { println(branch(n => substring(n,1,2))
      .filter(levenshtein(col("probe_name"), col("p_name")) <= 2).count()) }
    t("suffix lev pass") { println(branch(n => substring(n,-2,2))
      .filter(levenshtein(col("probe_name"), col("p_name")) <= 2).count()) }
    s.stop()
  }
}
