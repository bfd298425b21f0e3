package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables

/** Dev profiling harness: stage-level wall-clock of the near-dup
  * family (d2/d3/d5 — the bench's watched set). Not part of the
  * driver contract. */
object ProfileNearDup {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.all.foreach(t => Tables.load(spark, sfDir, t).count())

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-32s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    val docs = Tables.documents(spark, sfDir)
    println(s"[profile] docs=${docs.count()} " +
      s"words~${docs.select(avg(size(split(col("text"), " ")))).first().getDouble(0)}")

    val raw = docs.select(col("doc_id"), col("text"))
      .withColumn("w", split(col("text"), " "))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(w) - 2), " +
          "i -> concat(element_at(w, i), ' ', element_at(w, i + 1), ' ', element_at(w, i + 2)))"))
        .as("shingle"))
    val sh = raw.select(col("doc_id"), xxhash64(col("shingle")).as("h")).distinct().cache()
    t("hashedShingles distinct+cache")(println(s"  shingles=${sh.count()}"))

    val stop = t("df-cap stop set") {
      val s0 = sh.groupBy("h").agg(count(lit(1)).as("df"))
        .filter(col("df") > 1000).select("h")
      println(s"  stop=${s0.count()}"); s0
    }
    val capped = sh.join(broadcast(stop), Seq("h"), "left_anti")
    val cand = t("inverted-index self-join pairs") {
      val c = capped.select(col("doc_id").as("doc_a"), col("h"))
        .join(capped.select(col("doc_id").as("doc_b"), col("h")), Seq("h"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("overlap_lb"))
        .drop("overlap_lb").cache()
      println(s"  cand=${c.count()}"); c
    }
    val sets = sh.groupBy("doc_id").agg(collect_set(col("h")).as("set"))
      .withColumn("n", size(col("set")).cast("long"))
    t("verifyPairs (sets agg + 2 joins)") {
      val ratio = lit(1.0 / 0.5)
      val v = cand
        .join(sets.select(col("doc_id").as("doc_a"), col("set").as("sa"),
          col("n").as("na")), Seq("doc_a"))
        .join(sets.select(col("doc_id").as("doc_b"), col("set").as("sb"),
          col("n").as("nb")), Seq("doc_b"))
        .filter(least(col("na"), col("nb")) * ratio >= greatest(col("na"), col("nb")))
        .withColumn("inter", size(array_intersect(col("sa"), col("sb"))).cast("long"))
        .withColumn("jaccard", col("inter") / (col("na") + col("nb") - col("inter")))
        .filter(col("jaccard") >= lit(0.5))
      println(s"  verified=${v.count()}")
    }
    // the real queries, bench-style (toRdd.count), 3 repeats each
    for (q <- Seq("d2_ngram_jaccard", "d3_minhash_lsh", "d5_dedup_clusters")) {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(q)(spark, sfDir).queryExecution.toRdd.count()
        val sec = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        sec
      }
      println(f"[profile] $q%-28s ${times.map(x => f"$x%5.2f").mkString(" ")} median=${times.sorted.apply(1)}%5.2f")
    }
    // d3 signature side
    val bands = t("minhash 64-agg + band explode") {
      val b = graft.ops.Dedup.minhashBands(sh, "doc_id", "h", 64, 32).cache()
      println(s"  bandrows=${b.count()}"); b
    }
    t("band self-join candidates") {
      val c = bands.select(col("doc_id").as("doc_a"), col("band"), col("bkey"))
        .join(bands.select(col("doc_id").as("doc_b"), col("band"), col("bkey")),
          Seq("band", "bkey"))
        .filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct()
      println(s"  d3cand=${c.count()}")
    }
    spark.stop()
  }
}
