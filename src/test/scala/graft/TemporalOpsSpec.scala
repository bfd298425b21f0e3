package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Temporal

/** Equivalence of the scale-safe temporal joins against naive
  * formulations on seeded random inputs — asofJoin vs a ranked
  * inequality join, rangeJoin vs crossJoin+filter. */
class TemporalOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  private def randTimes(seed: Long, n: Int, keys: Int) = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)((rnd.nextInt(keys).toLong, rnd.nextInt(1000).toLong, rnd.nextInt(10000).toLong))
  }

  test("asofJoin == ranked inequality join (incl. same-instant and no-match rows)") {
    for (seed <- 1L to 3L) {
      val left = randTimes(seed, 120, 8).zipWithIndex
        .map { case ((k, t, _), i) => (k, t, i.toLong) }
        .toDF("k", "lt", "lid")
      val right = randTimes(seed + 7, 120, 8).zipWithIndex
        .map { case ((k, t, v), i) => (k, t, v, i.toLong) }
        .toDF("k", "rt", "rv", "rid")

      val got = Temporal.asofJoin(left, right, on = Seq("k"),
          leftTs = "lt", rightTs = "rt",
          payload = Seq("rv", "rid"), tieBreak = Seq("rid"))
        .select("lid", "rid", "rv")
        .as[(Long, Option[Long], Option[Long])].collect().toSet

      // naive: all right rows at-or-before, ranked, keep the top-1
      val w = Window.partitionBy("lid").orderBy(col("rt").desc, col("rid").desc)
      val naive = left.join(right, Seq("k"))
        .filter(col("rt") <= col("lt"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("lid", "rid", "rv")
      val naiveMap = naive.as[(Long, Long, Long)].collect()
        .map { case (l, ri, rv) => l -> (Some(ri), Some(rv)) }.toMap
      val expected = left.select("lid").as[Long].collect().toSet.map { lid: Long =>
        val (ri, rv) = naiveMap.getOrElse(lid, (None, None))
        (lid, ri, rv)
      }
      assert(got === expected, s"seed=$seed")
    }
  }

  test("rangeJoin == crossJoin + filter (window edges exact)") {
    for (seed <- 1L to 3L) {
      val left = randTimes(seed, 80, 1).zipWithIndex
        .map { case ((_, t, _), i) => (t, i.toLong) }.toDF("lt", "lid")
      val right = randTimes(seed + 9, 80, 1).zipWithIndex
        .map { case ((_, t, _), i) => (t, i.toLong) }.toDF("rt", "rid")
      for ((lo, hi) <- Seq((0L, 100L), (-50L, 50L), (10L, 11L))) {
        val got = Temporal.rangeJoin(left, right, "lt", "rt", lo, hi)
          .select("lid", "rid").as[(Long, Long)].collect().toSet
        val naive = left.crossJoin(right)
          .filter(col("rt") >= col("lt") + lo && col("rt") < col("lt") + hi)
          .select("lid", "rid").as[(Long, Long)].collect().toSet
        assert(got === naive, s"seed=$seed window=[$lo,$hi)")
      }
    }
  }

  test("events helper derives identical ev_ts/tsu from nanos-long and timestamp_ntz files") {
    // The driver's events.ts physical type has shifted across rounds
    // (NANOS->BIGINT under the legacy conf, MICROS->TIMESTAMP_NTZ on
    // Spark 4.1+); the real testdata only exercises ONE branch, so pin
    // the other with synthetic files: same instants, both layouts.
    val micros = Seq(0L, 1L, 999999L, 1700000000123456L, 4102444800000000L)
    def dir(tag: String) = java.nio.file.Files.createTempDirectory(tag)
    val dLong = dir("evlong")
    micros.zipWithIndex.map { case (u, i) => (i.toLong, u * 1000L) }
      .toDF("event_id", "ts").coalesce(1).write.mode("overwrite")
      .parquet(dLong.resolve("events.parquet").toString)
    val dNtz = dir("evntz")
    micros.zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"))
      .coalesce(1).write.mode("overwrite")
      .parquet(dNtz.resolve("events.parquet").toString)
    def derived(d: java.nio.file.Path) =
      QueriesRelational.events(spark, d.toString)
        .select("event_id", "ev_ts", "tsu")
        .collect().map(r => (r.getLong(0), r.get(1).toString, r.getLong(2))).toSet
    val fromLong = derived(dLong)
    val fromNtz = derived(dNtz)
    assert(fromLong === fromNtz)
    // tsu is exactly the epoch-us value on both paths (session is UTC)
    assert(fromLong.map(t => t._1 -> t._3).toMap ===
      micros.zipWithIndex.map { case (u, i) => i.toLong -> u }.toMap)
  }

  test("asofJoin carries NULL payload values and never mixes right rows") {
    val left = Seq((1L, 3L, 10L)).toDF("k", "lt", "lid")
    val right = Seq((1L, 1L, Some(10L), Some(100L)),
        (1L, 2L, None, Some(200L)))
      .toDF("k", "rt", "a", "b")
    val out = Temporal.asofJoin(left, right, Seq("k"), "lt", "rt", Seq("a", "b"))
    // the latest at-or-before quote has a=NULL, b=200: a must come back
    // NULL (not resurrect the older row's 10) and b must come from the
    // SAME right row — a (10, 200) result would be a row that never
    // existed
    assert(out.select("a", "b").as[(Option[Long], Option[Long])].head() ===
      ((None, Some(200L))))
  }
}
