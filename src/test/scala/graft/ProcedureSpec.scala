package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.TableStore

/** SQL stored procedures: CALL graft.system.<verb>(...) drives the
  * store's maintenance surface and returns a summary row. */
class ProcedureSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  test("vacuum / compact / restore / zorder / bloom via CALL") {
    val root = Files.createTempDirectory("proc").toString
    spark.conf.set("spark.sql.catalog.gproc", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gproc.root", root)
    val ts = new TableStore(spark, root)
    ts.create("t", (0L until 300L).map(i => (i, i % 100, s"v$i")).toDF("id", "x", "v"))
    ts.append("t", (300L until 600L).map(i => (i, i % 100, s"v$i")).toDF("id", "x", "v"))
    ts.append("t", (600L until 900L).map(i => (i, i % 100, s"v$i")).toDF("id", "x", "v"))

    // compact to one batch
    val c = spark.sql("CALL gproc.system.compact('t', 2)").head()
    assert(c.getString(0) === "t")
    assert(ts.read("t").count() === 900)

    // restore to the pre-compact version
    spark.sql("CALL gproc.system.restore('t', 2)")
    assert(ts.currentVersion("t") === 4)
    assert(ts.read("t").count() === 900)
    assert(ts.liveDirCount("t") === 3)

    // z-order on (id, x), then vacuum away the superseded layouts
    spark.sql("CALL gproc.system.optimize_zorder('t', 'id,x', 8)")
    assert(ts.read("t").count() === 900)
    val deleted = spark.sql("CALL gproc.system.vacuum('t', 1)").head().getLong(1)
    assert(deleted > 0)
    assert(ts.read("t").count() === 900)

    // bloom index from SQL; a point delete then prunes
    spark.sql("CALL gproc.system.set_bloom_columns('t', 'id')")
    assert(ts.bloomRoot("t").toFile.list().nonEmpty)

    // DESCRIBE HISTORY as a multi-row procedure result
    val hist = spark.sql("CALL gproc.system.history('t')").collect()
    assert(hist.length >= 2) // vacuum kept the latest window
    assert(hist.map(_.getLong(0)).contains(ts.currentVersion("t")))

    // procedures are discoverable
    val names = spark.sql("SHOW PROCEDURES IN gproc.system")
      .collect().map(_.toString).mkString(",")
    assert(names.contains("vacuum") && names.contains("optimize_zorder"))

    // change feed toggle from SQL; a delete then records change rows
    spark.sql("CALL gproc.system.set_change_feed('t', true)")
    assert(ts.changeFeedEnabled("t"))
    val v0 = ts.currentVersion("t")
    ts.delete("t", col("id") === 7L)
    val ch = ts.readChangesBetween("t", v0, ts.currentVersion("t"))
      .select("id", "_change_type").as[(Long, String)].collect().toSet
    assert(ch === Set((7L, "delete")))

    // row tracking from SQL: enable, then _row_id appears on the scan
    // and on the change feed
    spark.sql("CALL gproc.system.enable_row_tracking('t')")
    val ids = spark.sql("SELECT id, _row_id FROM gproc.t")
      .as[(Long, Long)].collect().toMap
    assert(ids.size === 899 && ids.values.toSeq.distinct.size === 899)
    val v1 = ts.currentVersion("t")
    ts.deleteVectorized("t", col("id") === 11L)
    val chId = ts.readChangesBetween("t", v1, ts.currentVersion("t"),
        withRowIds = true)
      .select("id", "_change_type", "_row_id")
      .as[(Long, String, Option[Long])].collect().toSet
    assert(chId === Set((11L, "delete", Some(ids(11L)))))
  }

  test("optimize_incremental via CALL reclusters only the overlap") {
    val root = Files.createTempDirectory("procinc").toString
    spark.conf.set("spark.sql.catalog.ginc", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ginc.root", root)
    val ts = new TableStore(spark, root)
    ts.create("t", (0L until 3000L).map(i => (i, s"v$i")).toDF("k", "v"))
    ts.optimizeByRange("t", Seq("k"), 3)
    ts.append("t", (1200L until 1300L).map(i => (i, s"a$i")).toDF("k", "v").coalesce(1))
    val r = spark.sql("CALL ginc.system.optimize_incremental('t', 'k')").head()
    assert(r.getString(0) === "t")
    assert(r.getLong(1) === 2L, s"expected 2 dirs rewritten, got ${r.getLong(1)}")
    assert(spark.sql("CALL ginc.system.optimize_incremental('t', 'k')")
      .head().getLong(1) === 0L)
    assert(ts.read("t").count() === 3100)
  }

  test("vacuum_dry_run reports the sweep without touching anything") {
    val root = Files.createTempDirectory("procdry").toString
    spark.conf.set("spark.sql.catalog.gdry", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gdry.root", root)
    val ts = new TableStore(spark, root)
    ts.create("t", (0L until 100L).map(i => (i, s"v$i")).toDF("k", "v"))
    ts.overwrite("t", (0L until 100L).map(i => (i, s"w$i")).toDF("k", "v"))
    val dry = spark.sql("CALL gdry.system.vacuum_dry_run('t', 1)").head().getLong(1)
    assert(dry > 0L, "superseded version 0 should be sweepable")
    // nothing was deleted: time travel to v0 still works
    assert(ts.readVersion("t", 0).count() === 100)
    val real = spark.sql("CALL gdry.system.vacuum('t', 1)").head().getLong(1)
    assert(real === dry, "the real sweep deletes exactly what dry-run named")
    // BOTH time-travel faces refuse the swept version LOUDLY (the
    // manifest-vacuumed contract m21 proves for the library face)
    val e = intercept[IllegalArgumentException](ts.readVersion("t", 0).count())
    assert(e.getMessage.contains("manifest vacuumed"))
    val eSql = intercept[Exception](
      spark.sql("SELECT * FROM gdry.t VERSION AS OF 0").count())
    assert(Iterator.iterate(eSql: Throwable)(_.getCause).takeWhile(_ != null)
      .take(8).exists(t =>
        String.valueOf(t.getMessage).contains("manifest vacuumed")),
      s"SQL time travel must surface the vacuumed-version error, got $eSql")
  }

  test("update_vectorized assignments survive quoted commas and escapes") {
    val root = java.nio.file.Files.createTempDirectory("procparse").toString
    spark.conf.set("spark.sql.catalog.gproc2", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gproc2.root", root)
    val ts = new graft.core.TableStore(spark, root)
    ts.create("t", Seq((1L, "a", "z"), (2L, "b", "z")).toDF("id", "v", "w"))
    // double-quoted literal with a comma + a second clause: the old
    // splitter never tracked double quotes and split inside the string
    spark.sql(
      """CALL gproc2.system.update_vectorized('t', 'id = 1',
        |  'v = "x,y", w = concat(w, \'!\')')""".stripMargin)
    assert(ts.read("t").as[(Long, String, String)].collect().toSet ===
      Set((1L, "x,y", "z!"), (2L, "b", "z")))
  }

  test("materialized-view procedures: create / refresh / compact, " +
      "self-driving watermark, loud on non-views") {
    val root = Files.createTempDirectory("procmv").toString
    spark.conf.set("spark.sql.catalog.gmv", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gmv.root", root)
    val ts = new TableStore(spark, root)
    ts.create("src", Seq((1L, 1L, 10L), (2L, 1L, 20L), (3L, 2L, 30L))
      .toDF("k", "grp", "qty"))
    ts.setChangeFeed("src", true)
    // CREATE: full compute + definition props + seeded watermark
    val seedV = spark.sql(
      "CALL gmv.system.create_agg_view('v', 'src', 'grp', 'qty', 'count_sum', 4)")
      .head().getLong(1)
    assert(seedV === ts.lastTxnVersion("v", "ivm:src").get)
    assert(ts.properties("v")("ivm.kind") === "count_sum")
    // an idle refresh absorbs nothing
    assert(spark.sql("CALL gmv.system.refresh_agg_view('v')")
      .head().getLong(1) === 0L)
    // mutate: group 1 loses a row, group 2 empties, group 3 appears
    ts.delete("src", col("k") === 2L)
    ts.delete("src", col("grp") === 2L)
    ts.append("src", Seq((4L, 3L, 40L)).toDF("k", "grp", "qty"))
    assert(spark.sql("CALL gmv.system.refresh_agg_view('v')")
      .head().getLong(1) === 3L)
    // a RE-DELIVERED refresh (same window) is a no-op — the watermark
    // rode the apply's own commit
    assert(spark.sql("CALL gmv.system.refresh_agg_view('v')")
      .head().getLong(1) === 0L)
    assert(spark.sql("SELECT grp, n_rows, sum_qty FROM gmv.v WHERE n_rows > 0")
      .as[(Long, Long, Long)].collect().toSet ===
      Set((1L, 1L, 10L), (3L, 1L, 40L)))
    // the emptied group's tombstone sweeps through the procedure face
    assert(ts.read("v").count() === 3)
    spark.sql("CALL gmv.system.compact_agg_view('v')")
    assert(ts.read("v").count() === 2)
    // refusals are loud: refresh/compact on a non-view
    val boom = intercept[Exception](
      spark.sql("CALL gmv.system.refresh_agg_view('src')").collect())
    assert(boom.getMessage.contains("not a registered"))
  }

  test("materialized-view kinds max and distinct: self-driving refresh " +
      "including the two-level cascade") {
    val root = Files.createTempDirectory("procmv2").toString
    spark.conf.set("spark.sql.catalog.gmv2", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gmv2.root", root)
    val ts = new TableStore(spark, root)
    // grp 1 holds 10 TWICE and 20; grp 2 holds 30 — exercises both the
    // max multiplicity retraction and the distinct zero-crossing
    ts.create("src", Seq((1L, 1L, 10L), (2L, 1L, 10L), (3L, 1L, 20L),
      (4L, 2L, 30L)).toDF("k", "grp", "qty"))
    ts.setChangeFeed("src", true)
    spark.sql("CALL gmv2.system.create_agg_view('vmax', 'src', 'grp', 'qty', 'max', 4)")
    spark.sql("CALL gmv2.system.create_agg_view('vdst', 'src', 'grp', 'qty', 'distinct', 4)")
    ts.delete("src", col("k") === 3L) // grp 1's max 20 retracts -> 10
    ts.delete("src", col("k") === 1L) // one copy of (1,10): value survives
    ts.append("src", Seq((5L, 2L, 40L)).toDF("k", "grp", "qty"))
    assert(spark.sql("CALL gmv2.system.refresh_agg_view('vmax')")
      .head().getLong(1) === 3L)
    assert(spark.sql("CALL gmv2.system.refresh_agg_view('vdst')")
      .head().getLong(1) >= 1L) // its own level absorbed the aux feed
    assert(spark.sql("SELECT grp, mx FROM gmv2.vmax WHERE mx IS NOT NULL")
      .as[(Long, Long)].collect().toSet === Set((1L, 10L), (2L, 40L)))
    assert(spark.sql(
      "SELECT grp, n_rows AS n_distinct FROM gmv2.vdst WHERE n_rows > 0")
      .as[(Long, Long)].collect().toSet === Set((1L, 1L), (2L, 2L)))
    // idle refreshes absorb nothing at any level
    assert(spark.sql("CALL gmv2.system.refresh_agg_view('vmax')")
      .head().getLong(1) === 0L)
    assert(spark.sql("CALL gmv2.system.refresh_agg_view('vdst')")
      .head().getLong(1) === 0L)
    // the cascade sweeps BOTH levels
    spark.sql("CALL gmv2.system.compact_agg_view('vdst')")
    assert(ts.read("vdst__aux").filter(col("n_rows") === 0L).count() === 0)
    // converged to the direct aggregates
    assert(spark.sql("SELECT grp, mx FROM gmv2.vmax WHERE mx IS NOT NULL")
      .as[(Long, Long)].collect().toSet ===
      ts.read("src").groupBy("grp").agg(max("qty").as("mx"))
        .as[(Long, Long)].collect().toSet)
    assert(spark.sql(
      "SELECT grp, n_rows FROM gmv2.vdst WHERE n_rows > 0")
      .as[(Long, Long)].collect().toSet ===
      ts.read("src").groupBy("grp").agg(countDistinct(col("qty")).as("nd"))
        .as[(Long, Long)].collect().toSet)
  }

  test("declarative join view via CALL: snowflake chain, dim-only " +
      "refresh propagates through the chain, deletes tombstone") {
    val root = Files.createTempDirectory("procjv").toString
    spark.conf.set("spark.sql.catalog.gjv", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gjv.root", root)
    val ts = new TableStore(spark, root)
    ts.create("src", Seq((1L, 10L, 100L), (2L, 10L, 200L), (3L, 20L, 300L))
      .toDF("k", "fk", "qty"))
    ts.setChangeFeed("src", true)
    // snowflake: d1 (fk -> region ref + attr), d2 (region -> attr)
    ts.create("d1", Seq((10L, "a", 7L), (20L, "b", 8L))
      .toDF("d_fk", "d_attr", "d_reg"))
    ts.setChangeFeed("d1", true)
    ts.create("d2", Seq((7L, "r7"), (8L, "r8")).toDF("r_key", "r_name"))
    ts.setChangeFeed("d2", true)
    spark.sql("""CALL gjv.system.create_join_view('jv', 'src', 'k',
                |  'd1:fk=d_fk:d_attr|d2:d_reg=r_key:r_name', 4)""".stripMargin)
    assert(spark.sql("SELECT k, d_attr, r_name FROM gjv.jv WHERE _live")
      .as[(Long, String, String)].collect().toSet ===
      Set((1L, "a", "r7"), (2L, "a", "r7"), (3L, "b", "r8")))
    // DEEP dim-only change: d2's r7 renames; the refresh must walk
    // d2 -> d1 -> src.fk and re-enrich exactly k=1,2
    ts.update("d2", col("r_key") === 7L, Map("r_name" -> lit("R7!")))
    assert(spark.sql("CALL gjv.system.refresh_join_view('jv')")
      .head().getLong(1) === 1L)
    assert(spark.sql("SELECT k, r_name FROM gjv.jv WHERE _live")
      .as[(Long, String)].collect().toSet ===
      Set((1L, "R7!"), (2L, "R7!"), (3L, "r8")))
    // source delete + append in one window; deletes tombstone
    ts.delete("src", col("k") === 2L)
    ts.append("src", Seq((4L, 20L, 400L)).toDF("k", "fk", "qty"))
    assert(spark.sql("CALL gjv.system.refresh_join_view('jv')")
      .head().getLong(1) === 2L)
    assert(spark.sql("SELECT k FROM gjv.jv WHERE NOT _live")
      .as[Long].collect().toSeq === Seq(2L))
    // idle refresh no-ops; compact sweeps the tombstone
    assert(spark.sql("CALL gjv.system.refresh_join_view('jv')")
      .head().getLong(1) === 0L)
    spark.sql("CALL gjv.system.compact_agg_view('jv')")
    assert(ts.read("jv").count() === 3)
    assert(spark.sql("SELECT k, qty, d_attr, r_name FROM gjv.jv WHERE _live")
      .as[(Long, Long, String, String)].collect().toSet ===
      Set((1L, 100L, "a", "R7!"), (3L, 300L, "b", "r8"),
        (4L, 400L, "b", "r8")))
  }

  test("registered two-sided join view and the min kind via CALL") {
    val root = Files.createTempDirectory("procj2").toString
    spark.conf.set("spark.sql.catalog.gj2", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gj2.root", root)
    val ts = new TableStore(spark, root)
    ts.create("ta", Seq((1L, 10L, 5L), (2L, 10L, 9L), (3L, 20L, 3L))
      .toDF("ka", "j", "qty"))
    ts.setChangeFeed("ta", true)
    ts.create("tb", Seq((100L, 10L, "x"), (200L, 20L, "y"))
      .toDF("kb", "bj", "tag"))
    ts.setChangeFeed("tb", true)
    spark.sql("""CALL gj2.system.create_join2_view('pairs', 'ta', 'ka',
                |  'tb', 'kb', 'j=bj', 'tag', 4)""".stripMargin)
    assert(spark.sql("SELECT ka, kb FROM gj2.pairs WHERE _live")
      .as[(Long, Long)].collect().toSet ===
      Set((1L, 100L), (2L, 100L), (3L, 200L)))
    // min view over ta through the registry
    spark.sql("CALL gj2.system.create_agg_view('vmin', 'ta', 'j', 'qty', 'min', 4)")
    assert(spark.sql("SELECT j, mx FROM gj2.vmin WHERE mx IS NOT NULL")
      .as[(Long, Long)].collect().toSet === Set((10L, 5L), (20L, 3L)))
    // B-side join-key move + A-side delete, one refresh for each view
    ts.update("tb", col("kb") === 200L, Map("bj" -> lit(10L)))
    ts.delete("ta", col("ka") === 3L) // grp 20's min-holder dies
    assert(spark.sql("CALL gj2.system.refresh_join2_view('pairs')")
      .head().getLong(1) === 2L)
    assert(spark.sql("SELECT ka, kb FROM gj2.pairs WHERE _live")
      .as[(Long, Long)].collect().toSet ===
      Set((1L, 100L), (2L, 100L), (1L, 200L), (2L, 200L)))
    assert(spark.sql("CALL gj2.system.refresh_agg_view('vmin')")
      .head().getLong(1) === 1L)
    // grp 20 emptied -> NULL tombstone filtered by the face; grp 10's
    // min survives its non-minimal retraction arm untouched
    assert(spark.sql("SELECT j, mx FROM gj2.vmin WHERE mx IS NOT NULL")
      .as[(Long, Long)].collect().toSet === Set((10L, 5L)))
    // compact sweeps the two-sided view's tombstones
    spark.sql("CALL gj2.system.compact_agg_view('pairs')")
    assert(ts.read("pairs").count() === 4)
  }
}
