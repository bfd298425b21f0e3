package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.EqualTo
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{StatsPruning, TableStore}

/** Z-order clustering: after optimizeByZOrder(a, b) a point predicate
  * on EITHER column must prune most dirs, where lexical range
  * clustering on (a) leaves predicates on b unprunable. */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  /** 100x100 grid: x and y uniform and independent — the worst case for
    * single-column clustering, the home case for Z-order. */
  private def grid = (0L until 10000L).map(i => (i, i % 100, i / 100))
    .toDF("id", "x", "y")

  private def liveCount(ts: TableStore, name: String, col: String, v: Long): Int = {
    val snap = ts.snapshot(name)
    StatsPruning.liveDirs(snap.dirs, snap.stats, snap.schema,
      Seq(EqualTo(col, v))).size
  }

  test("z-order prunes on every clustering column; lexical range only on the first") {
    val root = Files.createTempDirectory("zorder").toString
    val ts = new TableStore(spark, root)

    ts.create("lex", grid.repartition(4))
    ts.optimizeByRange("lex", Seq("x"), 16)
    assert(ts.liveDirCount("lex") === 16)
    // leading column prunes hard…
    assert(liveCount(ts, "lex", "x", 42L) <= 2)
    // …but every dir spans all of y: no pruning at all
    assert(liveCount(ts, "lex", "y", 42L) === 16)

    ts.create("z", grid.repartition(4))
    ts.optimizeByZOrder("z", Seq("x", "y"), 16)
    assert(ts.liveDirCount("z") === 16)
    val xLive = liveCount(ts, "z", "x", 42L)
    val yLive = liveCount(ts, "z", "y", 42L)
    // 16 dirs ~ top 4 z bits = 2 quantile-rank bits per column: a point
    // predicate pins those 2 bits -> ~1/4 of dirs survive per column
    assert(xLive <= 8, s"x=42 should prune most dirs, kept $xLive/16")
    assert(yLive <= 8, s"y=42 should prune most dirs, kept $yLive/16")

    // the rewrite is a reorder, never a row change
    assert(ts.read("z").count() === 10000)
    assert(ts.read("z").agg(sum("id")).head().getLong(0) === (0L until 10000L).sum)
    assert(ts.read("z").filter(col("x") === 42 && col("y") === 7).count() === 1)
  }

  test("z-order rejects unsupported shapes") {
    val root = Files.createTempDirectory("zorderbad").toString
    val ts = new TableStore(spark, root)
    ts.create("t", Seq((1L, "a", 2L)).toDF("id", "s", "v"))
    intercept[IllegalArgumentException] {
      ts.optimizeByZOrder("t", Seq("id"), 4) // 1 column: use range
    }
    intercept[IllegalArgumentException] {
      ts.optimizeByZOrder("t", Seq("id", "s"), 4) // string not rankable
    }
    intercept[IllegalArgumentException] {
      ts.optimizeByZOrder("t", Seq("id", "missing"), 4)
    }
  }

  test("optimizeIncrementalByRange reclusters only the overlapping tail") {
    val ts = new TableStore(spark, Files.createTempDirectory("increcluster").toString)
    ts.create("t", (0L until 9000L).map(i => (i, s"v$i")).toDF("k", "v"))
    ts.optimizeByRange("t", Seq("k"), 3) // disjoint thirds
    val clustered = ts.liveDirs("t")
    assert(clustered.size === 3)
    // a fully clustered table is a no-op (and commits nothing)
    val vBefore = ts.currentVersion("t")
    assert(ts.optimizeIncrementalByRange("t", "k") === 0)
    assert(ts.currentVersion("t") === vBefore)
    // two appends overlapping ONLY the middle third
    ts.append("t", (3500L until 3600L).map(i => (i, s"a$i")).toDF("k", "v").coalesce(1))
    ts.append("t", (4000L until 4100L).map(i => (i, s"b$i")).toDF("k", "v").coalesce(1))
    val before = ts.read("t").as[(Long, String)].collect().toSet
    val n = ts.optimizeIncrementalByRange("t", "k")
    // the middle dir + both appended dirs rewrite; the outer thirds carry
    assert(n === 3, s"rewrote $n dirs")
    val after = ts.liveDirs("t")
    assert(after.toSet.intersect(clustered.toSet).size === 2,
      "disjoint dirs must be carried untouched")
    assert(ts.read("t").as[(Long, String)].collect().toSet === before)
    // the result is fully clustered again: a second pass is a no-op,
    // and a point predicate prunes to one dir
    assert(ts.optimizeIncrementalByRange("t", "k") === 0)
    val snap = ts.snapshot("t")
    val hit = StatsPruning.liveDirs(snap.dirs, snap.stats,
      ts.read("t").schema, Seq(EqualTo("k", 3550L)))
    assert(hit.size === 1, s"expected 1 dir for a point key, got ${hit.size}")
  }
}
