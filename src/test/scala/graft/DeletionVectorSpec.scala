package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.TableStore

/** Deletion vectors: merge-on-read DELETE that commits (file, position)
  * tombstones instead of rewriting dirs; reads on both the library and
  * the SQL (DSv2) path apply them; rewrites materialize and drop them. */
class DeletionVectorSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  private def fresh(): (TableStore, java.nio.file.Path) = {
    val root = Files.createTempDirectory("dvstore")
    (new TableStore(spark, root.toString), root)
  }

  test("deleteVectorized removes rows without rewriting dirs") {
    val (ts, root) = fresh()
    ts.create("t", (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v"))
    ts.append("t", (101L to 200L).map(i => (i, s"v$i")).toDF("id", "v"))
    val dirsBefore = ts.liveDirs("t")
    ts.deleteVectorized("t", col("id") % 10 === 0L)
    assert(ts.liveDirs("t") === dirsBefore) // no dir rewritten
    assert(ts.read("t").count() === 180)
    assert(ts.read("t").filter(col("id") % 10 === 0L).count() === 0)
    // sidecar exists; time travel shows the pre-delete state
    assert(Files.isDirectory(root.resolve("t").resolve("_dv")))
    assert(ts.readVersion("t", 1).count() === 200)
  }

  test("a second DV delete on the same dir merges tombstones") {
    val (ts, _) = fresh()
    ts.create("t", (1L to 50L).map(i => (i, i * 2)).toDF("id", "x"))
    ts.deleteVectorized("t", col("id") <= 10L)
    ts.deleteVectorized("t", col("id") > 40L)
    assert(ts.read("t").as[(Long, Long)].collect().map(_._1).sorted.toSeq ===
      (11L to 40L))
    // metadata row count reflects both waves
    assert(ts.snapshot("t").rowCount === Some(30L))
  }

  test("merge and compact materialize DV deletes; no resurrection") {
    val (ts, _) = fresh()
    ts.createBucketed("t", (1L to 40L).map(i => (i, s"v$i")).toDF("id", "v"),
      Seq("id"), 4)
    ts.deleteVectorized("t", col("id") === 7L)
    assert(ts.read("t").count() === 39)
    // merge rewrites the touched buckets reading THROUGH the DV
    ts.mergeUpsert("t", Seq((8L, "V8")).toDF("id", "v"), Seq("id"),
      changeTypeCol = None)
    assert(ts.read("t").filter(col("id") === 7L).count() === 0)
    ts.compact("t")
    assert(ts.read("t").count() === 39)
    assert(ts.snapshot("t").dvs.isEmpty) // rewritten dirs dropped their DVs
  }

  test("SQL catalog path applies DVs: scan, filter, metadata COUNT") {
    val root = Files.createTempDirectory("dvsql").toString
    spark.conf.set("spark.sql.catalog.gdv", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gdv.root", root)
    val ts = new TableStore(spark, root)
    ts.create("t", (1L to 100L).map(i => (i, i % 10, s"v$i")).toDF("id", "x", "v"))
    ts.deleteVectorized("t", col("id") <= 20L)
    assert(spark.sql("SELECT count(*) FROM gdv.t").head().getLong(0) === 80L)
    assert(spark.sql("SELECT sum(id) FROM gdv.t").head().getLong(0) ===
      (21L to 100L).sum)
    // pushdown-shaped predicate over a DV'd file still correct
    assert(spark.sql("SELECT count(*) FROM gdv.t WHERE id <= 30").head().getLong(0) === 10L)
    // MIN falls back to a real scan (stats would say 1)
    assert(spark.sql("SELECT min(id) FROM gdv.t").head().getLong(0) === 21L)
  }

  test("DV delete with change feed records the deleted rows") {
    val (ts, _) = fresh()
    ts.create("t", (1L to 10L).map(i => (i, s"v$i")).toDF("id", "v"))
    ts.setChangeFeed("t", true)
    val v0 = ts.currentVersion("t")
    ts.deleteVectorized("t", col("id") === 3L || col("id") === 4L)
    val ch = ts.readChangesBetween("t", v0, ts.currentVersion("t"))
      .select("id", "_change_type").as[(Long, String)].collect().toSet
    assert(ch === Set((3L, "delete"), (4L, "delete")))
    // without CDF, the change feed refuses to skip over a DV commit
    val (ts2, _) = fresh()
    ts2.create("u", (1L to 10L).map(i => (i, s"v$i")).toDF("id", "v"))
    ts2.deleteVectorized("u", col("id") === 3L)
    val e = intercept[IllegalStateException](
      ts2.readChangesBetween("u", 0, 1).count())
    assert(e.getMessage.contains("deletion vectors"))
  }

  test("delete.mode=merge-on-read routes SQL DELETE through DVs") {
    val root = Files.createTempDirectory("dvmode").toString
    spark.conf.set("spark.sql.catalog.gdvm", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gdvm.root", root)
    spark.sql("""CREATE TABLE gdvm.t (id BIGINT, v STRING)
                 TBLPROPERTIES ('delete.mode'='merge-on-read')""")
    val ts = new TableStore(spark, root)
    ts.append("t", (1L to 50L).map(i => (i, s"v$i")).toDF("id", "v"))
    val dirsBefore = ts.liveDirs("t")
    spark.sql("DELETE FROM gdvm.t WHERE id <= 10")
    assert(ts.liveDirs("t") === dirsBefore) // merge-on-read: no rewrite
    assert(spark.sql("SELECT count(*) FROM gdvm.t").head().getLong(0) === 40L)
    assert(spark.sql("SHOW TBLPROPERTIES gdvm.t").collect()
      .exists(r => r.getString(0) == "delete.mode" && r.getString(1) == "merge-on-read"))
    // flip the mode off via ALTER and the next delete rewrites
    spark.sql("ALTER TABLE gdvm.t UNSET TBLPROPERTIES ('delete.mode')")
    spark.sql("DELETE FROM gdvm.t WHERE id = 11")
    assert(spark.sql("SELECT count(*) FROM gdvm.t").head().getLong(0) === 39L)
    assert(ts.liveDirs("t") !== dirsBefore)
  }

  test("vacuum sweeps sidecars no retained manifest references") {
    val (ts, root) = fresh()
    ts.create("t", (1L to 30L).map(i => (i, s"v$i")).toDF("id", "v"))
    ts.deleteVectorized("t", col("id") === 5L)
    assert(Files.list(root.resolve("t").resolve("_dv")).count() === 1)
    ts.compact("t") // materializes; DV no longer referenced by latest
    ts.vacuum("t", retainVersions = 1)
    assert(!Files.isDirectory(root.resolve("t").resolve("_dv")) ||
      Files.list(root.resolve("t").resolve("_dv")).count() === 0)
    assert(ts.read("t").count() === 29)
  }
}
