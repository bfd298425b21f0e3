package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.TableStore

/** Merge-on-read SQL row-level operations (`'rowlevel.mode'=
  * 'merge-on-read'`): MERGE INTO / UPDATE / DELETE become delta-based
  * ops — tombstone DV sidecars + one inserted dir, no live dir
  * rewritten. */
class DeltaRowLevelSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  private def freshSql(cat: String): (TableStore, String) = {
    val root = Files.createTempDirectory("mordelta").toString
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (new TableStore(spark, root), root)
  }

  test("SQL MERGE INTO under merge-on-read rewrites no dirs") {
    val (ts, _) = freshSql("mor1")
    ts.create("t", (1L to 100L).map(i => (i, s"v$i", i * 10)).toDF("id", "v", "x"))
    ts.append("t", (101L to 200L).map(i => (i, s"v$i", i * 10)).toDF("id", "v", "x"))
    ts.setProperties("t", Map("rowlevel.mode" -> "merge-on-read"))
    val dirsBefore = ts.liveDirs("t")
    Seq((50L, "U50", 0L), (150L, "U150", 0L), (300L, "N300", 3000L))
      .toDF("id", "v", "x").createOrReplaceTempView("mor1_src")
    spark.sql("""MERGE INTO mor1.t t USING mor1_src s ON t.id = s.id
                 WHEN MATCHED THEN UPDATE SET v = s.v, x = s.x
                 WHEN NOT MATCHED THEN INSERT *""")
    // every pre-merge dir still live (tombstoned, not rewritten)
    assert(ts.liveDirs("t").take(dirsBefore.size) === dirsBefore)
    assert(ts.snapshot("t").dvs.nonEmpty)
    val got = spark.sql("SELECT id, v, x FROM mor1.t")
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.size === 201)
    assert(got(50L) === (("U50", 0L)) && got(150L) === (("U150", 0L)))
    assert(got(300L) === (("N300", 3000L)) && got(49L) === (("v49", 490L)))
    // metadata COUNT nets tombstones against the appended postimages
    assert(spark.sql("SELECT count(*) FROM mor1.t").head().getLong(0) === 201L)
  }

  test("SQL UPDATE and un-pushable DELETE take the delta path too") {
    val (ts, _) = freshSql("mor2")
    ts.create("t", (1L to 60L).map(i => (i, i % 7, s"v$i")).toDF("id", "k", "v"))
    ts.setProperties("t", Map("rowlevel.mode" -> "merge-on-read"))
    val dirsBefore = ts.liveDirs("t")
    spark.sql("UPDATE mor2.t SET v = concat(v, '!') WHERE k = 3")
    assert(ts.liveDirs("t").take(dirsBefore.size) === dirsBefore)
    assert(spark.sql("SELECT count(*) FROM mor2.t WHERE v LIKE '%!'")
      .head().getLong(0) === (1L to 60L).count(_ % 7 == 3))
    // DELETE with a non-v1-translatable predicate goes through the
    // row-level (delta) path rather than deleteWhere
    spark.sql("DELETE FROM mor2.t WHERE id % 10 = 4")
    assert(spark.sql("SELECT count(*) FROM mor2.t").head().getLong(0) ===
      60L - (1L to 60L).count(_ % 10 == 4))
    assert(ts.read("t").filter(col("id") % 10 === 4).count() === 0)
  }

  test("delta ops stack with prior DVs; rewrite materializes everything") {
    val (ts, _) = freshSql("mor3")
    ts.create("t", (1L to 50L).map(i => (i, s"v$i")).toDF("id", "v"))
    ts.setProperties("t", Map("rowlevel.mode" -> "merge-on-read",
      "delete.mode" -> "merge-on-read"))
    spark.sql("DELETE FROM mor3.t WHERE id <= 5")  // deleteWhere -> DV
    Seq((10L, "U10"), (3L, "Z3")).toDF("id", "v")
      .createOrReplaceTempView("mor3_src")
    // id=3 is already DV-deleted: NOT MATCHED -> re-insert
    spark.sql("""MERGE INTO mor3.t t USING mor3_src s ON t.id = s.id
                 WHEN MATCHED THEN UPDATE SET v = s.v
                 WHEN NOT MATCHED THEN INSERT *""")
    val got = ts.read("t").as[(Long, String)].collect().toMap
    assert(got.size === 46) // 50 - 5 deleted + 1 reinserted
    assert(got(10L) === "U10" && got(3L) === "Z3" && !got.contains(4L))
    ts.compact("t")
    assert(ts.snapshot("t").dvs.isEmpty)
    assert(ts.read("t").count() === 46)
  }

  test("bucketed tables keep their layout through a delta MERGE") {
    val (ts, _) = freshSql("mor5")
    ts.createBucketed("t", (1L to 80L).map(i => (i, s"v$i")).toDF("id", "v"),
      Seq("id"), 8)
    ts.setProperties("t", Map("rowlevel.mode" -> "merge-on-read"))
    Seq((5L, "U5"), (100L, "N100"), (101L, "N101")).toDF("id", "v")
      .createOrReplaceTempView("mor5_src")
    spark.sql("""MERGE INTO mor5.t t USING mor5_src s ON t.id = s.id
                 WHEN MATCHED THEN UPDATE SET v = s.v
                 WHEN NOT MATCHED THEN INSERT *""")
    // inserted/updated rows landed as __b=<k> LEAF dirs: the layout
    // survives and key-driven merge pruning stays available
    assert(ts.liveDirs("t").forall(_.contains("/__b=")))
    val got = spark.sql("SELECT id, v FROM mor5.t").as[(Long, String)]
      .collect().toMap
    assert(got.size === 82 && got(5L) === "U5" && got(100L) === "N100")
    // a LIBRARY bucketed merge after the delta commit still prunes
    val before = ts.liveDirs("t").toSet
    ts.mergeUpsert("t", Seq((100L, "Z")).toDF("id", "v"), Seq("id"),
      changeTypeCol = None)
    assert(ts.liveDirs("t").toSet.intersect(before).nonEmpty)
    assert(ts.read("t").as[(Long, String)].collect().toMap.apply(100L) === "Z")
  }

  test("cloneTable is zero-copy and isolates both directions") {
    val (ts, root) = freshSql("mor6")
    ts.create("src", (1L to 50L).map(i => (i, s"v$i")).toDF("id", "v"))
    ts.deleteVectorized("src", col("id") === 9L) // pending DV carries
    spark.sql("CALL mor6.system.clone('src', 'dst')")
    assert(ts.read("dst").count() === 49)
    // zero-copy: the clone's files are hard links (same inode -> same
    // size on disk, and mutating ONE table never changes the other)
    ts.update("dst", col("id") === 1L, Map("v" -> lit("DST")))
    assert(ts.read("src").as[(Long, String)].collect().toMap.apply(1L) === "v1")
    ts.append("src", Seq((200L, "s200")).toDF("id", "v"))
    assert(ts.read("dst").count() === 49)
    // vacuum on src can't break dst: dst's links keep shared bytes alive
    ts.compact("src")
    ts.vacuum("src", retainVersions = 1)
    assert(ts.read("dst").count() === 49)
    assert(ts.read("dst").as[(Long, String)].collect().toMap.apply(2L) === "v2")
  }

  test("MERGE with NOT MATCHED BY SOURCE works on both row-level paths") {
    for ((cat, mor) <- Seq(("mrgA", false), ("mrgB", true))) {
      val (ts, _) = freshSql(cat)
      ts.create("t", (1L to 20L).map(i => (i, s"v$i")).toDF("id", "v"))
      if (mor) ts.setProperties("t", Map("rowlevel.mode" -> "merge-on-read"))
      Seq((5L, "U5"), (25L, "N25")).toDF("id", "v")
        .createOrReplaceTempView(s"${cat}_src")
      // full sync semantics: update matches, insert new, DROP rows the
      // source no longer carries
      spark.sql(s"""MERGE INTO $cat.t t USING ${cat}_src s ON t.id = s.id
                    WHEN MATCHED THEN UPDATE SET v = s.v
                    WHEN NOT MATCHED THEN INSERT *
                    WHEN NOT MATCHED BY SOURCE THEN DELETE""")
      val got = spark.sql(s"SELECT id, v FROM $cat.t").as[(Long, String)]
        .collect().toMap
      assert(got === Map(5L -> "U5", 25L -> "N25"), s"mor=$mor")
    }
  }

  test("MERGE WITH SCHEMA EVOLUTION adds source-only columns") {
    val (ts, _) = freshSql("mrgEvo")
    ts.create("t", Seq((1L, "a")).toDF("id", "v"))
    Seq((1L, "A", 9.5), (2L, "b", 1.0)).toDF("id", "v", "score")
      .createOrReplaceTempView("mrgEvo_src")
    spark.sql("""MERGE WITH SCHEMA EVOLUTION INTO mrgEvo.t t
                 USING mrgEvo_src s ON t.id = s.id
                 WHEN MATCHED THEN UPDATE SET *
                 WHEN NOT MATCHED THEN INSERT *""")
    val got = spark.sql("SELECT id, v, score FROM mrgEvo.t")
      .as[(Long, String, Double)].collect().toSet
    assert(got === Set((1L, "A", 9.5), (2L, "b", 1.0)))
  }

  test("change feed records delta ops as delete+insert pairs") {
    val (ts, _) = freshSql("mor4")
    ts.create("t", (1L to 10L).map(i => (i, i * 1L)).toDF("id", "x"))
    ts.setChangeFeed("t", true)
    ts.setProperties("t", Map("rowlevel.mode" -> "merge-on-read"))
    val v0 = ts.currentVersion("t")
    spark.sql("UPDATE mor4.t SET x = x + 100 WHERE id >= 9")
    val ch = ts.readChangesBetween("t", v0, ts.currentVersion("t"))
      .select("id", "x", "_change_type").as[(Long, Long, String)].collect().toSet
    assert(ch === Set((9L, 9L, "delete"), (10L, 10L, "delete"),
      (9L, 109L, "insert"), (10L, 110L, "insert")))
  }

  test("delta MERGE works when the warehouse root itself contains /data/") {
    // the tombstone writer derives manifest-relative paths from _file:
    // it must cut at the LAST /data/ segment (the store's convention) —
    // a first-occurrence cut shifts every relpath and fails the commit
    val base = Files.createTempDirectory("morroot")
    val root = base.resolve("data").resolve("wh")
    Files.createDirectories(root)
    spark.conf.set("spark.sql.catalog.mor7", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.mor7.root", root.toString)
    val ts = new TableStore(spark, root.toString)
    ts.create("t", (1L to 50L).map(i => (i, s"v$i")).toDF("id", "v"))
    ts.setProperties("t", Map("rowlevel.mode" -> "merge-on-read"))
    val dirsBefore = ts.liveDirs("t")
    Seq((7L, "U7")).toDF("id", "v").createOrReplaceTempView("mor7_src")
    spark.sql("""MERGE INTO mor7.t t USING mor7_src s ON t.id = s.id
                 WHEN MATCHED THEN UPDATE SET v = s.v""")
    assert(ts.liveDirs("t").take(dirsBefore.size) === dirsBefore)
    assert(ts.snapshot("t").dvs.nonEmpty, "tombstones must have landed")
    val got = spark.sql("SELECT id, v FROM mor7.t")
      .as[(Long, String)].collect().toMap
    assert(got.size === 50 && got(7L) === "U7" && got(8L) === "v8")
  }
}
