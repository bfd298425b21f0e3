package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Skew

/** Salted-aggregation/join equivalence to the direct forms, and the
  * SparkSessionExtensions registration of vec_dot. */
class SkewExtensionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  def skewed(n: Int): org.apache.spark.sql.DataFrame = {
    val rnd = new scala.util.Random(7)
    // 80% of rows on one hot key
    Seq.fill(n)((if (rnd.nextInt(10) < 8) "HOT" else "k" + rnd.nextInt(20),
      rnd.nextInt(100).toDouble)).toDF("k", "x")
  }

  test("saltedAgg == direct groupBy for sum/count/max") {
    val df = skewed(5000)
    val direct = df.groupBy("k")
      .agg(sum("x").as("s"), count(lit(1)).as("n"), max("x").as("m"))
      .as[(String, Double, Long, Double)].collect().toSet
    val salted = Skew.saltedAgg(df, Seq("k"), buckets = 8)(Map(
        "s" -> (sum("x"), sum(_)),
        "n" -> (count(lit(1)), sum(_)),
        "m" -> (max("x"), max(_))))
      .select(col("k"), col("s"), col("n").cast("long"), col("m"))
      .as[(String, Double, Long, Double)].collect().toSet
    // sums of doubles: compare with tolerance by key
    val dm = direct.map(r => r._1 -> r).toMap
    assert(salted.size === direct.size)
    salted.foreach { case (k, s, n, m) =>
      val (_, ds, dn, dmx) = dm(k)
      assert(math.abs(s - ds) < 1e-6 && n == dn && m == dmx, s"key=$k")
    }
  }

  test("saltedJoin == direct join") {
    val left = skewed(5000)
    val right = Seq(("HOT", 1), ("k1", 2), ("k5", 3), ("missing", 9))
      .toDF("k", "tag")
    val direct = left.join(right, Seq("k")).groupBy("k", "tag")
      .agg(count(lit(1)).as("n")).as[(String, Int, Long)].collect().toSet
    val salted = Skew.saltedJoin(left, right, "k", buckets = 8)
      .groupBy("k", "tag").agg(count(lit(1)).as("n"))
      .as[(String, Int, Long)].collect().toSet
    assert(salted === direct)
  }

  test("vec_dot is usable from SQL and matches a manual dot product") {
    graft.functions.VectorFunctions.register(spark)
    val row = spark.sql(
      "SELECT vec_dot(array(CAST(1.5 AS FLOAT), CAST(-2 AS FLOAT)), " +
        "array(CAST(4 AS FLOAT), CAST(0.5 AS FLOAT))) AS d").head()
    assert(math.abs(row.getDouble(0) - (1.5 * 4 + -2 * 0.5)) < 1e-12)
    // and the interpreted path (eval) agrees with codegen
    val arr = Seq((Array(1.5f, -2f), Array(4f, 0.5f))).toDF("a", "b")
    val viaCol = arr.select(expr("vec_dot(a, b)")).head().getDouble(0)
    assert(viaCol === row.getDouble(0))
  }

  test("GraftExtensions injects vec_dot at session-extension level") {
    // builder-level extensions bind at session construction; applying to
    // a fresh SparkSessionExtensions instance must register cleanly
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // throws if the injection is malformed
  }
}
