package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.TableStore
import graft.ops.Ivm

/** The FK secondary index (r12 VERDICT #3/#4): `<view>__fkidx` turns
  * the dim-term and B-key probes — the two honestly-documented
  * volume-linear residues of join-view maintenance — into two
  * bucket-pruned reads. These specs prove the INDEXED paths produce
  * results identical to a direct re-join of the final states across
  * fk moves, deletes, and dim renames, that the index's
  * conservative-superset contract holds (ever-live pairs, swept
  * lazily), and that the registry lifecycle cascades it. */
class IvmIndexSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  private def freshStore(tag: String): TableStore =
    new TableStore(spark, Files.createTempDirectory(tag).toString)

  test("dim-term probe through the FK index: digest-equal to the direct " +
      "join across appends, fk moves, deletes, and dim renames") {
    val st = freshStore("fkidx1")
    st.create("src", Seq((1L, 10L, 100L), (2L, 10L, 200L), (3L, 20L, 300L),
      (4L, 30L, 400L)).toDF("k", "fk", "qty"))
    st.setChangeFeed("src", true)
    st.create("dim", Seq((10L, "a"), (20L, "b"), (30L, "c"), (40L, "d"))
      .toDF("dk", "nm"))
    st.setChangeFeed("dim", true)
    def enrich(rows: DataFrame): DataFrame = rows
      .join(broadcast(st.read("dim")), col("fk") === col("dk"), "left")
      .select(col("k"), col("fk"), col("qty"), col("nm"))
    val sv0 = st.currentVersion("src")
    val dv0 = st.currentVersion("dim")
    st.createBucketed("view",
      enrich(st.readVersion("src", sv0)).withColumn("_live", lit(true)),
      Seq("k"), n = 4)
    Ivm.enableFkIndex(st, "view", Seq("fk"), Seq("k"), buckets = 4)
    assert(st.exists("view__fkidx"))

    // history: fk move (row 1: 10->20), delete (row 3), append (row 5),
    // dim renames touching BOTH an original fk and the move target
    st.update("src", col("k") === 1L, Map("fk" -> lit(20L)))
    st.delete("src", col("k") === 3L)
    st.append("src", Seq((5L, 40L, 500L)).toDF("k", "fk", "qty"))
    st.update("dim", col("dk").isin(10L, 20L),
      Map("nm" -> concat(col("nm"), lit("!"))))
    val affected = st.readChangesBetween("dim", dv0, st.currentVersion("dim"))
      .select(col("dk").as("fk"))
    Ivm.applyJoinDelta(st, "view", "src", sv0, st.currentVersion("src"),
      Seq("k"), enrich, dimAffected = Some((affected, Seq("fk"))))

    val expect = st.read("src")
      .join(st.read("dim"), col("fk") === col("dk"), "left")
      .select(col("k"), col("fk"), col("qty"), col("nm"))
      .as[(Long, Long, Long, String)].collect().toSet
    assert(Ivm.readJoinView(st, "view")
      .as[(Long, Long, Long, String)].collect().toSet === expect)

    // conservative superset: the fk move left BOTH (10,1) and (20,1)
    val idx = st.read("view__fkidx").as[(Long, Long)].collect().toSet
    assert(idx.contains((10L, 1L)) && idx.contains((20L, 1L)),
      s"ever-live contract violated: $idx")
    // the swept index matches the live view exactly, and a later
    // dim-term apply through the swept index stays correct
    Ivm.compactFkIndex(st, "view")
    assert(st.read("view__fkidx").as[(Long, Long)].collect().toSet ===
      Ivm.readJoinView(st, "view").select(col("fk"), col("k"))
        .as[(Long, Long)].collect().toSet)
    val dv1 = st.currentVersion("dim")
    st.update("dim", col("dk") === 40L, Map("nm" -> lit("D")))
    Ivm.applyJoinDelta(st, "view", "src",
      st.currentVersion("src"), st.currentVersion("src"), Seq("k"), enrich,
      dimAffected = Some((st.readChangesBetween("dim", dv1,
        st.currentVersion("dim")).select(col("dk").as("fk")), Seq("fk"))))
    assert(Ivm.readJoinView(st, "view").filter(col("k") === 5L)
      .select("nm").as[String].head() === "D")
  }

  test("two-sided B-key probe through the FK index: digest-equal to the " +
      "direct join across join-key moves and deletes on both sides") {
    val st = freshStore("fkidx2")
    st.create("ta", Seq((1L, 10L, 5L), (2L, 10L, 9L), (3L, 20L, 3L))
      .toDF("ka", "j", "qty"))
    st.setChangeFeed("ta", true)
    st.create("tb", Seq((100L, 10L, "x"), (200L, 20L, "y"), (300L, 30L, "z"))
      .toDF("kb", "bj", "tag"))
    st.setChangeFeed("tb", true)
    def combine(a: DataFrame, b: DataFrame): DataFrame =
      a.join(b, col("j") === col("bj"))
        .select(col("ka"), col("kb"), col("j"), col("qty"), col("tag"))
    val (a0, b0) = (st.currentVersion("ta"), st.currentVersion("tb"))
    st.createBucketed("pairs",
      combine(st.readVersion("ta", a0), st.readVersion("tb", b0))
        .withColumn("_live", lit(true)), Seq("ka"), n = 4)
    Ivm.enableFkIndex(st, "pairs", Seq("kb"), Seq("ka"), buckets = 4)

    // B-side join-key move (200: 20->10), A-side delete, appends both
    st.update("tb", col("kb") === 200L, Map("bj" -> lit(10L)))
    st.delete("ta", col("ka") === 2L)
    st.append("ta", Seq((4L, 30L, 7L)).toDF("ka", "j", "qty"))
    st.append("tb", Seq((400L, 20L, "w")).toDF("kb", "bj", "tag"))
    Ivm.applyTwoSidedJoinDelta(st, "pairs",
      "ta", a0, st.currentVersion("ta"), Seq("ka"),
      "tb", b0, st.currentVersion("tb"), Seq("kb"), combine)

    val expect = combine(st.read("ta"), st.read("tb"))
      .as[(Long, Long, Long, Long, String)].collect().toSet
    assert(Ivm.readJoinView(st, "pairs")
      .as[(Long, Long, Long, Long, String)].collect().toSet === expect)

    // a second round through the now-populated index still converges
    st.update("tb", col("kb") === 300L, Map("bj" -> lit(20L)))
    val b1 = st.currentVersion("tb")
    Ivm.applyTwoSidedJoinDelta(st, "pairs",
      "ta", st.currentVersion("ta"), st.currentVersion("ta"), Seq("ka"),
      "tb", b1 - 1, b1, Seq("kb"), combine)
    assert(Ivm.readJoinView(st, "pairs")
      .as[(Long, Long, Long, Long, String)].collect().toSet ===
      combine(st.read("ta"), st.read("tb"))
        .as[(Long, Long, Long, Long, String)].collect().toSet)
  }

  test("a REGISTERED join view's self-driving refresh probes through " +
      "the index: dim-only refreshes converge across fk moves") {
    val root = Files.createTempDirectory("fkidx4").toString
    spark.conf.set("spark.sql.catalog.gfkr", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gfkr.root", root)
    val st = new TableStore(spark, root)
    st.create("src", Seq((1L, 10L, 100L), (2L, 10L, 200L), (3L, 20L, 300L))
      .toDF("k", "fk", "qty"))
    st.setChangeFeed("src", true)
    st.create("dim", Seq((10L, "a"), (20L, "b"), (30L, "c")).toDF("dk", "nm"))
    st.setChangeFeed("dim", true)
    spark.sql("CALL gfkr.system.create_join_view('jv', 'src', 'k', 'dim:fk=dk:nm', 4)")
    spark.sql("CALL gfkr.system.index_view('jv', 'fk', 4)")
    // source fk move + dim rename on BOTH the old and new fk, then one
    // self-driving refresh — the dim-term probe routes through the
    // index (root fkCols == idxCols) and must stay exact
    st.update("src", col("k") === 1L, Map("fk" -> lit(30L)))
    st.update("dim", col("dk").isin(10L, 30L),
      Map("nm" -> concat(col("nm"), lit("!"))))
    assert(spark.sql("CALL gfkr.system.refresh_join_view('jv')")
      .head().getLong(1) === 2L) // one src commit + one dim commit
    assert(spark.sql("SELECT k, nm FROM gfkr.jv WHERE _live")
      .as[(Long, String)].collect().toSet ===
      st.read("src").join(st.read("dim"), col("fk") === col("dk"), "left")
        .select(col("k"), col("nm"))
        .as[(Long, String)].collect().toSet)
    // a second dim-only refresh through the (now fk-moved) index
    st.update("dim", col("dk") === 20L, Map("nm" -> lit("B")))
    assert(spark.sql("CALL gfkr.system.refresh_join_view('jv')")
      .head().getLong(1) === 1L)
    assert(spark.sql("SELECT nm FROM gfkr.jv WHERE _live AND k = 3")
      .as[String].head() === "B")
  }

  test("adaptive probe arm (r13 VERDICT #4): a point dim change takes " +
      "the index arm, a wide one auto-falls-back to scan; both converge") {
    val st = freshStore("fkidx5")
    // 64 bucket dirs (> the 48-dir pruning floor) so the dirs-read law
    // is live at spec scale: the arm choice compares |candidates|
    // against liveDirCount
    val n = 200
    st.create("src", spark.range(1, n + 1)
      .select(col("id").as("k"), (col("id") % 10).as("fk"),
        (col("id") * 3).as("qty")))
    st.setChangeFeed("src", true)
    st.create("dim", spark.range(0, 10)
      .select(col("id").as("dk"), concat(lit("nm"), col("id")).as("nm")))
    st.setChangeFeed("dim", true)
    def enrich(rows: DataFrame): DataFrame = rows
      .join(broadcast(st.read("dim")), col("fk") === col("dk"), "left")
      .select(col("k"), col("fk"), col("qty"), col("nm"))
    val sv = st.currentVersion("src")
    st.createBucketed("view",
      enrich(st.readVersion("src", sv)).withColumn("_live", lit(true)),
      Seq("k"), n = 64)
    Ivm.enableFkIndex(st, "view", Seq("fk"), Seq("k"), buckets = 8)
    val arms = scala.collection.mutable.ArrayBuffer.empty[String]
    st.onStep = s => if (s.startsWith("fkidx-arm-")) arms += s

    // point change: ONE fk's candidates (20 keys) < 64 dirs -> index arm
    val dv0 = st.currentVersion("dim")
    st.update("dim", col("dk") === 3L, Map("nm" -> lit("NM3!")))
    Ivm.applyJoinDelta(st, "view", "src", sv, st.currentVersion("src"),
      Seq("k"), enrich, dimAffected = Some((
        st.readChangesBetween("dim", dv0, st.currentVersion("dim"))
          .select(col("dk").as("fk")), Seq("fk"))))
    assert(arms.toSeq === Seq("fkidx-arm-index"), s"arms: $arms")
    // the dirs-read law, asserted: the index-arm candidate keys select
    // their buckets EXACTLY (20 of 64+), where the scan-side fk probe
    // reads every dir (hash layout on k defeats fk stats)
    val cand3 = st.read("view__fkidx").filter(col("fk") === 3L)
      .select(col("k"))
    val (candDirs, total) = st.probeDirCount("view", cand3, Seq("k"))
    // total is ~64 (hash may leave a couple of buckets empty) but must
    // sit above the 48-dir pruning floor for the law to be live
    assert(candDirs <= 20 && total > 48, s"index arm read $candDirs/$total")
    val (scanDirs, total2) = st.probeDirCount("view",
      st.read("dim").select(col("dk").as("fk")), Seq("fk"))
    assert(scanDirs === total2, s"scan-side probe pruned: $scanDirs/$total2")

    // wide change: every fk (200 candidate keys) >= dirs -> scan arm
    arms.clear()
    val dv1 = st.currentVersion("dim")
    st.update("dim", lit(true), Map("nm" -> concat(col("nm"), lit("w"))))
    Ivm.applyJoinDelta(st, "view", "src",
      st.currentVersion("src"), st.currentVersion("src"), Seq("k"), enrich,
      dimAffected = Some((
        st.readChangesBetween("dim", dv1, st.currentVersion("dim"))
          .select(col("dk").as("fk")), Seq("fk"))))
    assert(arms.toSeq === Seq("fkidx-arm-scan"), s"arms: $arms")
    st.onStep = _ => ()

    // both arms converged to the direct re-join
    val expect = st.read("src")
      .join(st.read("dim"), col("fk") === col("dk"), "left")
      .select(col("k"), col("fk"), col("qty"), col("nm"))
      .as[(Long, Long, Long, String)].collect().toSet
    assert(Ivm.readJoinView(st, "view")
      .as[(Long, Long, Long, String)].collect().toSet === expect)
  }

  test("crash at EVERY durable step of an indexed apply: the index " +
      "stays a conservative superset and the txn-stamped retry converges") {
    // the two-table design's whole crash contract in one sweep: the
    // index commit precedes the view commit, so a writer death at ANY
    // step leaves (a) every live view pair present in the index —
    // probes can never miss a live row — and (b) at most extra
    // candidates, which the probe's fk semi-join discards; the SAME
    // apply re-run (same feed window, same txn) converges exactly-once
    final class SimulatedCrash extends scala.util.control.ControlThrowable
    def enrichOf(ts: TableStore)(rows: DataFrame): DataFrame = rows
      .join(broadcast(ts.read("dim")), col("fk") === col("dk"), "left")
      .select(col("k"), col("fk"), col("qty"), col("nm"))
    def build(): TableStore = {
      val ts = freshStore("fkidxcrash")
      ts.create("src", Seq((1L, 10L, 100L), (2L, 10L, 200L), (3L, 20L, 300L),
        (4L, 30L, 400L)).toDF("k", "fk", "qty"))
      ts.setChangeFeed("src", true) // src v1
      ts.create("dim", Seq((10L, "a"), (20L, "b"), (30L, "c"), (40L, "d"))
        .toDF("dk", "nm"))
      ts.setChangeFeed("dim", true) // dim v1
      ts.createBucketed("view",
        enrichOf(ts)(ts.read("src")).withColumn("_live", lit(true)),
        Seq("k"), n = 4)
      Ivm.enableFkIndex(ts, "view", Seq("fk"), Seq("k"), buckets = 4)
      // the backlog: fk move, delete, append, dim rename on old+new fk
      ts.update("src", col("k") === 1L, Map("fk" -> lit(20L)))
      ts.delete("src", col("k") === 3L)
      ts.append("src", Seq((5L, 40L, 500L)).toDF("k", "fk", "qty"))
      ts.update("dim", col("dk").isin(10L, 20L),
        Map("nm" -> concat(col("nm"), lit("!"))))
      ts
    }
    def applyOnce(ts: TableStore): Unit =
      Ivm.applyJoinDelta(ts, "view", "src", 1L, ts.currentVersion("src"),
        Seq("k"), enrichOf(ts), dimAffected = Some((
          ts.readChangesBetween("dim", 1L, ts.currentVersion("dim"))
            .select(col("dk").as("fk")), Seq("fk"))),
        txn = Some(("crash", 1L)))
    def livePairs(ts: TableStore): Set[(Long, Long)] =
      Ivm.readJoinView(ts, "view").select(col("fk"), col("k"))
        .as[(Long, Long)].collect().toSet
    def idxPairs(ts: TableStore): Set[(Long, Long)] =
      ts.read("view__fkidx").as[(Long, Long)].collect().toSet
    // recovery "two minutes after the crash" (CrashSweepSpec's clock):
    // age in-flight scratch past the live-writer grace window so the
    // retry's collision handler may adopt the crashed attempt's ghost
    def ageScratch(ts: TableStore): Unit = {
      val old = java.nio.file.attribute.FileTime
        .fromMillis(System.currentTimeMillis() - 120000L)
      Seq("view", "view__fkidx", "src", "dim").foreach { t =>
        val td = ts.dataRoot(t).getParent
        Seq("_cdf", "data", "_dv", "_v").map(td.resolve)
          .filter(Files.isDirectory(_)).foreach { d =>
            scala.util.Using.resource(Files.list(d))(
              _.iterator().forEachRemaining(p =>
                if (p.getFileName.toString.startsWith("."))
                  Files.setLastModifiedTime(p, old): Unit))
          }
      }
    }
    // the documented contract: a retry that collides with the crashed
    // attempt's adopted ghost fails LOUDLY and converges on re-run
    def recover(ts: TableStore): Unit = {
      ageScratch(ts)
      var tries = 0
      while (tries >= 0) {
        try { applyOnce(ts); tries = -1 }
        catch {
          case _: java.util.ConcurrentModificationException if tries < 3 =>
            tries += 1
        }
      }
    }
    // clean trace sizes the sweep
    val probe = build()
    var n = 0
    probe.onStep = _ => n += 1
    applyOnce(probe)
    probe.onStep = _ => ()
    assert(n >= 4, s"apply traced only $n durable steps")
    for (k <- 1 to n) {
      val ts = build()
      var i = 0
      ts.onStep = _ => { i += 1; if (i == k) throw new SimulatedCrash }
      try { applyOnce(ts); fail(s"crash at step $k did not propagate") }
      catch { case _: SimulatedCrash => () }
      ts.onStep = _ => ()
      assert(livePairs(ts).subsetOf(idxPairs(ts)),
        s"step $k: a live view pair is missing from the index")
      recover(ts) // the retry (same window, same txn; loud loser re-runs)
      val expect = ts.read("src")
        .join(ts.read("dim"), col("fk") === col("dk"), "left")
        .select(col("k"), col("fk"), col("qty"), col("nm"))
        .as[(Long, Long, Long, String)].collect().toSet
      assert(Ivm.readJoinView(ts, "view")
        .as[(Long, Long, Long, String)].collect().toSet === expect,
        s"step $k: retry did not converge")
      assert(livePairs(ts).subsetOf(idxPairs(ts)),
        s"step $k: post-retry superset violated")
    }
  }

  test("registry lifecycle cascades the index: drop_view removes " +
      "__fkidx; list_views hides it") {
    val root = Files.createTempDirectory("fkidx3").toString
    spark.conf.set("spark.sql.catalog.gfki", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gfki.root", root)
    val st = new TableStore(spark, root)
    st.create("src", Seq((1L, 10L, 100L)).toDF("k", "fk", "qty"))
    st.setChangeFeed("src", true)
    st.create("dim", Seq((10L, "a")).toDF("dk", "nm"))
    st.setChangeFeed("dim", true)
    spark.sql("CALL gfki.system.create_join_view('jv', 'src', 'k', 'dim:fk=dk:nm', 4)")
    // the SQL face derives the keys from the registry
    spark.sql("CALL gfki.system.index_view('jv', 'fk', 4)")
    assert(st.exists("jv__fkidx"))
    spark.sql("CALL gfki.system.compact_fkidx('jv')")
    // hidden from the registry listing, dropped with its view
    assert(spark.sql("CALL gfki.system.list_views()").collect()
      .map(_.getString(0)).toSet === Set("jv"))
    assert(spark.sql("CALL gfki.system.drop_view('jv')").head().getLong(1) === 2L)
    assert(!st.exists("jv") && !st.exists("jv__fkidx"))
  }
}
