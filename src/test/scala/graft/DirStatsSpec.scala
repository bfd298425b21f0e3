package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{DirStats, TableStore}

/** Manifest column-statistics semantics: parquet-compatible ordering,
  * NaN exclusion, and the all-null-vs-unreliable distinction for
  * absent column chunks. */
class DirStatsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  def freshStore(): TableStore =
    new TableStore(spark, Files.createTempDirectory("dirstats").toString)

  test("utf8Lt matches unsigned UTF-8 byte order, not UTF-16 order") {
    // U+10000 (surrogate pair, UTF-16 units 0xD800 0xDC00) vs U+FFFD:
    // Java String order compares code units, so U+10000 sorts BELOW
    // U+FFFD; UTF-8 byte order (what parquet computes UTF8 min/max in)
    // sorts it ABOVE (F0 90 80 80 > EF BF BD).
    val supplementary = new String(Character.toChars(0x10000))
    val highBmp = "�"
    assert(supplementary < highBmp) // Java's order — the trap
    assert(DirStats.utf8Lt(highBmp, supplementary)) // parquet's order
    assert(!DirStats.utf8Lt(supplementary, highBmp))
    // and the byte encodings agree
    def bytes(s: String) = s.getBytes("UTF-8").map(_ & 0xff).toSeq
    assert(Ordering.Implicits.seqOrdering[Seq, Int].lt(
      bytes(highBmp), bytes(supplementary)))
    // prefix case
    assert(DirStats.utf8Lt("ab", "abc") && !DirStats.utf8Lt("abc", "ab"))
  }

  test("NaN float/double footer bounds never enter the manifest") {
    val ts = freshStore()
    // parquet-mr's double stats use '<'/'>' comparisons, so a NaN FIRST
    // value sticks as min and max forever (every later comparison is
    // false) — this is the footer shape that must be rejected. (A NaN
    // in any later position is silently EXCLUDED from footer bounds
    // instead; the pruning consumer handles that case — see
    // StatsPruning's float/double max rule.)
    ts.create("t", Seq(
      (1L, Double.NaN, 1.0), (2L, 2.0, 2.0), (3L, 3.0, 3.0)
    ).toDF("id", "with_nan", "clean").coalesce(1))
    val snap = ts.snapshot("t")
    val stats = snap.stats.values.toSeq
    assert(stats.nonEmpty)
    // clean columns keep bounds; the NaN column has no min/max claim
    val all = stats.flatMap(_.cols.get("clean")).flatMap(_.min)
    assert(all.nonEmpty)
    val nanBounds = stats.flatMap(_.cols.get("with_nan"))
      .flatMap(cs => cs.min.toSeq ++ cs.max.toSeq)
    assert(nanBounds.isEmpty, s"NaN column must have no bounds, got $nanBounds")
    // row count is still exact from the manifest
    assert(snap.rowCount.contains(3L))
  }

  test("string bounds survive the manifest round trip and bound the data") {
    val ts = freshStore()
    ts.create("t", Seq("m", "a", "z", "q").toDF("s"))
    val snap = ts.snapshot("t")
    val cs = snap.stats.values.flatMap(_.cols.get("s"))
    assert(cs.flatMap(_.min).toSeq.contains("a"))
    assert(cs.flatMap(_.max).toSeq.contains("z"))
  }

  test("attachDir marks columns absent from external files unreliable") {
    val ts = freshStore()
    ts.create("t", Seq((1L, "a")).toDF("id", "v"))
    // external writer drops column v entirely
    val ext = ts.dataRoot("t").resolve("ext-001")
    Seq(2L, 3L).toDF("id").write.parquet(ext.toString)
    ts.attachDir("t", "ext-001", replace = false)
    val snap = ts.snapshot("t")
    val extStats = snap.stats.get("ext-001")
    // id is present with bounds; v must NOT claim an all-null count
    assert(extStats.exists(_.cols.contains("id")))
    assert(extStats.forall(!_.cols.contains("v")))
    // reading still surfaces v as null (schema-driven scan)
    assert(ts.read("t").filter("v IS NULL").count() === 2)
  }

  test("non-primitive columns never get fabricated all-null stats") {
    import org.apache.spark.sql.functions.{col, struct}
    val ts = freshStore()
    // a struct column's parquet chunks are nested leaves ('s.x'), which
    // the flat chunk lookup can't see — stats must be ABSENT, not an
    // asserted all-null count (which would answer COUNT(s) as 0 and
    // prune `s IS NOT NULL` mutations into silent no-ops)
    ts.create("t", Seq((1L, 10L), (2L, 20L)).toDF("k", "x")
      .select(col("k"), struct(col("x").as("x")).as("s")))
    val stats = ts.snapshot("t").stats.values.headOption
    assert(stats.exists(_.cols.contains("k")))
    assert(stats.forall(!_.cols.contains("s")),
      "struct column must carry no stats entry")
    assert(ts.read("t").filter("s IS NOT NULL").count() === 2)
  }

  test("external files whose timestamp unit disagrees with the schema " +
      "get no stats (bounds in the wrong unit would prune unsoundly)") {
    val ts = freshStore()
    ts.create("t", Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("id", "ts"))
    // external writer produced TIMESTAMP(MILLIS): Spark reads the VALUES
    // correctly (scan-time conversion) but raw footer bounds are millis —
    // ~1000x below a micros literal
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MILLIS")
    try Seq((2L, java.sql.Timestamp.valueOf("2024-06-01 00:00:00")))
      .toDF("id", "ts").write
      .parquet(ts.dataRoot("t").resolve("ext-ms").toString)
    finally spark.conf.unset("spark.sql.parquet.outputTimestampType")
    ts.attachDir("t", "ext-ms", replace = false)
    val extStats = ts.snapshot("t").stats.get("ext-ms")
    assert(extStats.exists(_.cols.contains("id")))
    assert(extStats.forall(!_.cols.contains("ts")),
      "millis-annotated timestamp column must carry no stats")
    // the rows themselves read correctly regardless
    assert(ts.read("t").filter("ts >= timestamp'2024-05-01 00:00:00'").count() === 1)
  }
}
