package graft

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.TableStore

/** Incremental manifest log: commits write O(changed dirs) delta
  * records against the previous version; readers resolve base chains
  * bounded by full-snapshot checkpoints (`<v>.ckpt.json`, every K
  * delta commits). This is what keeps commit metadata small on a table
  * with ~10^6 live files — a full manifest per append would be ~100 MB
  * of JSON write amplification per tiny commit. */
class ManifestLogSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  private def vDir(root: String, t: String): Path = Paths.get(root, t, "_v")
  private def record(root: String, t: String, v: Long): String =
    new String(Files.readAllBytes(vDir(root, t).resolve(s"$v.json")))

  test("appends write delta records that stay small as the table grows") {
    val root = Files.createTempDirectory("mlog").toString
    val ts = new TableStore(spark, root)
    ts.create("t", (0L until 100L).map(i => (i, s"r$i")).toDF("id", "v").coalesce(1))
    assert(!record(root, "t", 0).contains("\"base\""), "v0 must be a full snapshot")
    (1 to 40).foreach { k =>
      ts.append("t", Seq((100L + k, s"n$k")).toDF("id", "v").coalesce(1))
    }
    // v40 carries 41 dirs; its commit record describes only the one added
    val r40 = record(root, "t", 40)
    assert(r40.contains("\"base\": 39"), s"expected delta record: $r40")
    assert(!r40.contains("\"dirs\""), "delta must not re-list all dirs")
    val sizes = (1 to 40).map(v =>
      Files.size(vDir(root, "t").resolve(s"$v.json")))
    assert(sizes.max - sizes.min < 200,
      s"delta size must not grow with table size: $sizes")
    // resolution reproduces the exact committed state at every version
    assert(ts.read("t").count() === 140)
    assert(ts.liveDirCount("t") === 41)
    (0 to 40 by 10).foreach { v =>
      assert(ts.readVersion("t", v).count() === 100 + v, s"time travel to $v")
    }
  }

  test("checkpoints bound the resolution chain and vacuum keeps chains readable") {
    val root = Files.createTempDirectory("mlogckpt").toString
    val ts = new TableStore(spark, root)
    ts.create("t", Seq((1L, "a")).toDF("id", "v"))
    (1 to 20).foreach(k => ts.append("t", Seq((k + 1L, s"n$k")).toDF("id", "v")))
    // default interval 8: delta commits at 8 and 16 got checkpoints
    assert(Files.exists(vDir(root, "t").resolve("8.ckpt.json")))
    assert(Files.exists(vDir(root, "t").resolve("16.ckpt.json")))
    assert(!Files.exists(vDir(root, "t").resolve("20.ckpt.json")))
    // a fresh store (cold cache) resolves through the checkpoint
    assert(new TableStore(spark, root).readVersion("t", 20).count() === 21)
    // vacuum to the last 3 versions: the oldest retained version (18, a
    // delta whose chain reaches below the sweep line) gets checkpointed
    // so every retained version still resolves from a cold start
    ts.vacuum("t", retainVersions = 3)
    assert(Files.exists(vDir(root, "t").resolve("18.ckpt.json")))
    assert(!Files.exists(vDir(root, "t").resolve("17.json")))
    val cold = new TableStore(spark, root)
    (18L to 20L).foreach(v => assert(cold.readVersion("t", v).count() === v + 1))
    assert(cold.history("t").count() === 3)
  }

  test("metadata changes and full rewrites fall back to full snapshots") {
    val root = Files.createTempDirectory("mlogfull").toString
    val ts = new TableStore(spark, root)
    ts.create("t", (0L until 50L).map(i => (i, s"r$i")).toDF("id", "v").coalesce(1))
    ts.append("t", Seq((50L, "x")).toDF("id", "v"))
    assert(record(root, "t", 1).contains("\"base\""))
    // column rename changes the column mapping -> full record
    ts.renameColumn("t", "v", "val")
    assert(!record(root, "t", 2).contains("\"base\""), "rename must write full")
    // compact rewrites every dir -> diff is not smaller, full record
    ts.compact("t")
    assert(!record(root, "t", 3).contains("\"base\""), "compact must write full")
    // back to deltas afterwards, resolving on the new schema
    ts.append("t", Seq((51L, "y")).toDF("id", "val"))
    assert(record(root, "t", 4).contains("\"base\": 3"))
    assert(ts.read("t").count() === 52)
    assert(ts.read("t").columns.toSeq === Seq("id", "val"))
  }

  test("delta records carry row-level state: deletion vectors and row ids") {
    val root = Files.createTempDirectory("mlogdv").toString
    val ts = new TableStore(spark, root)
    ts.create("t", (0L until 100L).map(i => (i, s"r$i")).toDF("id", "v").coalesce(1))
    ts.enableRowTracking("t")
    ts.append("t", (100L until 110L).map(i => (i, s"r$i")).toDF("id", "v").coalesce(1))
    val vAfterAppend = ts.currentVersion("t")
    assert(record(root, "t", vAfterAppend).contains("\"rowbaseset\""))
    ts.deleteVectorized("t", org.apache.spark.sql.functions.col("id") < 5)
    val vAfterDel = ts.currentVersion("t")
    val r = record(root, "t", vAfterDel)
    assert(r.contains("\"base\"") && r.contains("\"dvset\""),
      s"MoR delete should be a delta with a dvset: $r")
    assert(ts.read("t").count() === 105)
    // cold resolution agrees on ids and tombstones
    val cold = new TableStore(spark, root)
    assert(cold.readWithRowIds("t").select("_row_id").distinct().count() === 105)
  }

  test("the commit race stays loud: losers collide on the record file") {
    val root = Files.createTempDirectory("mlograce").toString
    val ts = new TableStore(spark, root)
    ts.create("t", Seq((1L, "a")).toDF("id", "v"))
    // a "concurrent" writer sneaks in a full overwrite between this
    // writer's read and its manifest put — the overwrite path does not
    // rebase, so the loser must fail loudly, delta records or not
    val other = new TableStore(spark, root)
    ts.onBeforeOptimisticCommit = () => {
      ts.onBeforeOptimisticCommit = () => ()
      other.overwrite("t", Seq((9L, "w")).toDF("id", "v"))
    }
    // append rebases: both commits land
    ts.append("t", Seq((2L, "b")).toDF("id", "v"))
    assert(ts.read("t").as[(Long, String)].collect().toSet ===
      Set((9L, "w"), (2L, "b")))
  }

  test("a crashed write's orphan batch dir never corrupts reads; vacuum sweeps it aged") {
    val root = Files.createTempDirectory("mlogcrash").toString
    val ts = new TableStore(spark, root)
    import spark.implicits._
    ts.create("t", (0L until 50L).map(i => (i, s"r$i")).toDF("id", "v"))
    // simulate a writer that died between writeBatch and commitManifest:
    // a fully-written parquet dir under data/ that no manifest names
    val orphan = Paths.get(root, "t", "data", "b000000099-deadbeef")
    (50L until 60L).map(i => (i, s"x$i")).toDF("id", "v")
      .write.parquet(orphan.toString)
    assert(ts.read("t").count() === 50, "orphan rows must not leak into reads")
    assert(spark.read.parquet(orphan.toString).count() === 10)
    // young orphan: vacuum's in-flight age guard leaves it alone
    ts.vacuum("t", retainVersions = 1)
    assert(Files.isDirectory(orphan), "young orphan looks like an in-flight write")
    // aged past the guard it is crash debris and sweeps
    Files.setLastModifiedTime(orphan,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 2 * 3600L * 1000))
    ts.vacuum("t", retainVersions = 1)
    assert(!Files.exists(orphan), "aged orphan must sweep")
    assert(ts.read("t").count() === 50)
  }

  test("reader-version gate: a manifest from a NEWER format refuses " +
      "loudly instead of silently misreading") {
    val root = Files.createTempDirectory("mlogver").toString
    val ts = new TableStore(spark, root)
    ts.create("t", Seq((1L, "a")).toDF("id", "v"))
    // every written record carries the gate at the current level
    assert(record(root, "t", 0).contains("\"reqreader\": 1"))
    ts.append("t", Seq((2L, "b")).toDF("id", "v"))
    assert(record(root, "t", 1).contains("\"reqreader\": 1"))
    // simulate a table written by a FUTURE engine: bump the record's
    // required level past what this library supports
    val p = vDir(root, "t").resolve("1.json")
    Files.write(p, new String(Files.readAllBytes(p))
      .replace("\"reqreader\": 1", "\"reqreader\": 99").getBytes)
    val cold = new TableStore(spark, root) // no manifest cache
    val e = intercept[IllegalStateException](cold.read("t").count())
    assert(e.getMessage.contains("reader version 99"), e.getMessage)
    assert(e.getMessage.contains("upgrade"), e.getMessage)
    // version 0 (old level) stays readable — the gate is per record
    assert(cold.readVersion("t", 0).count() === 1L)
  }

  test("manifest dir budget: refuse past maxDirs with compact guidance, " +
      "recover by raising the conf and compacting") {
    val root = Files.createTempDirectory("mbudget").toString
    val ts = new TableStore(spark, root)
    ts.create("t", Seq((1L, "a")).toDF("id", "v").coalesce(1))
    (2L to 5L).foreach(i =>
      ts.append("t", Seq((i, s"v$i")).toDF("id", "v").coalesce(1)))
    val dirs = ts.snapshot("t").dirs.size
    assert(dirs >= 5)
    try {
      spark.conf.set("spark.graft.manifest.maxDirs", (dirs - 1).toString)
      val boom = intercept[IllegalStateException](ts.read("t").count())
      assert(boom.getMessage.contains("compact"))
      assert(boom.getMessage.contains("maxDirs"))
      // recovery path from the error message: raise the budget (here:
      // disable), compact to collapse the dir count, re-arm the budget
      spark.conf.set("spark.graft.manifest.maxDirs", "0")
      assert(ts.read("t").count() === 5L)
      ts.compact("t", targetPartitions = 1)
      spark.conf.set("spark.graft.manifest.maxDirs", (dirs - 1).toString)
      assert(ts.snapshot("t").dirs.size < dirs)
      assert(ts.read("t").count() === 5L) // back inside the envelope
    } finally spark.conf.unset("spark.graft.manifest.maxDirs")
  }
}
