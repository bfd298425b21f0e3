package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables

/** Dev profiling harness for d4's 256-bit SimHash: stage wall-clocks
  * and cardinalities (gram rows, signature rows, band rows, JOIN rows
  * before dedup, pairs after radius). Not part of the driver contract. */
object ProfileSimhash {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.maxFields",
        sys.env.getOrElse("SPARK_GRAFT_MAXFIELDS", "100"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-36s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    // the SHIPPED d4 formulation: the gram is hashed as the
    // (word, word, word, seed) tuple — no 3-gram string materialized
    val W = 4
    val tok = Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), col("w"),
        explode(expr("IF(size(w) >= 3, sequence(1, size(w) - 2), array())")).as("i"))
    val words = (0 until W).foldLeft(tok) { (d, w) =>
      d.withColumn(s"h$w", xxhash64(
        element_at(col("w"), col("i")),
        element_at(col("w"), col("i") + 1),
        element_at(col("w"), col("i") + 2), lit(w)))
    }.drop("w", "i")
    t("gram rows")(println(s"  grams=${words.count()}"))
    val packedCols = for (w <- 0 until W; j <- 0 until 16) yield
      sum((0 until 4).map { i =>
        shiftleft(shiftright(col(s"h$w"), 4 * j + i).bitwiseAND(1), 16 * i)
      }.reduce(_ + _)).as(s"p${w}_$j")
    val agg = words.groupBy("doc_id").agg(count(lit(1)).as("n"), packedCols: _*)
    val sigCols = (0 until W).map { w =>
      (0 until 64).foldLeft(lit(0L)) { (acc, k) =>
        val cnt = shiftright(col(s"p${w}_${k / 4}"), 16 * (k % 4)).bitwiseAND(lit(0xFFFFL))
        acc.bitwiseOR(when(cnt * 2 > col("n"), shiftleft(lit(1L), k)).otherwise(lit(0L)))
      }.as(s"s$w")
    }
    t("hash columns only")(println(s"  rows=${words.select(col("doc_id"), col("h0"), col("h1"), col("h2"), col("h3")).queryExecution.toRdd.count()}"))
    t("votes aggregate only")(println(s"  groups=${agg.queryExecution.toRdd.count()}"))
    val sim = agg.select(col("doc_id") +: sigCols: _*).cache()
    t("signatures (votes+project+cache)")(println(s"  sigs=${sim.count()}"))
    val chunks = (0 until 4 * W).map { bi =>
      struct(lit(bi).as("band"),
        shiftright(col(s"s${bi / 4}"), (bi % 4) * 16).bitwiseAND(lit(0xFFFFL)).as("bkey"))
    }
    val sigs = (0 until W).map(w => col(s"s$w"))
    val bands = sim.select(col("doc_id") +: sigs :+ explode(array(chunks: _*)).as("bb"): _*)
      .select(col("doc_id") +: sigs :+ col("bb.band").as("band") :+ col("bb.bkey").as("bkey"): _*)
      .cache()
    t("band rows")(println(s"  bands=${bands.count()}"))
    t("bucket histogram") {
      val h = bands.groupBy("band", "bkey").count()
        .agg(count(lit(1)).as("buckets"), max("count").as("max_bucket"),
          sum(col("count") * col("count")).as("sum_sq"))
        .first()
      println(s"  buckets=${h.getLong(0)} max=${h.getLong(1)} joinRows~${h.getLong(2)}")
    }
    val left = bands.select(col("doc_id").as("doc_a") +:
      (0 until W).map(w => col(s"s$w").as(s"a$w")) :+ col("band") :+ col("bkey"): _*)
    val right = bands.select(col("doc_id").as("doc_b") +:
      (0 until W).map(w => col(s"s$w").as(s"b$w")) :+ col("band") :+ col("bkey"): _*)
    val joined = left.join(right, Seq("band", "bkey"))
      .filter(col("doc_a") < col("doc_b"))
    t("join rows (pre-distinct)")(println(s"  joinRows=${joined.count()}"))
    val hamming = (0 until W).map(w =>
      bit_count(col(s"a$w").bitwiseXOR(col(s"b$w")))).reduce(_ + _)
    t("pairs (distinct + radius)") {
      val p = joined.select(col("doc_a"), col("doc_b"), hamming.as("hamming"))
        .distinct().filter(col("hamming") <= 45)
      println(s"  pairs=${p.count()}")
    }
    spark.stop()
  }
}
