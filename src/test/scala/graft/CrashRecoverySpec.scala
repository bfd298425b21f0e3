package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.TableStore

/** Crash atomicity of the commit protocol. A commit is (1) write data
  * dirs, (2) hard-link the manifest at v (put-if-absent), (3) move the
  * `_LATEST` pointer. A crash between (2) and (3) leaves a "ghost":
  * a durable manifest readers never saw — and, before recovery existed,
  * every later commit recomputed next = `_LATEST`+1 and collided with
  * the ghost forever (a permanently unwritable table). These tests
  * build each crash state deterministically (commit normally, then
  * rewind the pointer / relocate the staging — byte-identical to what
  * a crash leaves) and prove recovery: ghosts are adopted, staged
  * change-feed rows are completed, torn legacy manifests refuse
  * loudly, and vacuum sweeps publication scratch without touching
  * adoptable ghosts. */
class CrashRecoverySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  def freshStore(): TableStore =
    new TableStore(spark, Files.createTempDirectory("crashstore").toString)

  private def tableDir(ts: TableStore, name: String): Path =
    ts.dataRoot(name).getParent

  /** Simulate the crash-between-manifest-and-pointer state: rewind
    * `_LATEST` to `v` while later manifests stay on disk. */
  private def rewindLatest(ts: TableStore, name: String, v: Long): Unit =
    Files.write(tableDir(ts, name).resolve("_LATEST"),
      v.toString.getBytes(StandardCharsets.UTF_8))

  private def ageDir(p: Path, ms: Long): Unit =
    Files.setLastModifiedTime(p, FileTime.fromMillis(System.currentTimeMillis() - ms))

  test("ghost manifest: reads stay at the published version; the next append adopts it instead of wedging") {
    val ts = freshStore()
    ts.create("t", Seq((1L, "a")).toDF("id", "v"))       // v0
    ts.append("t", Seq((2L, "b")).toDF("id", "v"))       // v1 — the ghost
    rewindLatest(ts, "t", 0L)

    // the unpublished commit is invisible — exactly the pre-crash view
    assert(ts.currentVersion("t") === 0L)
    assert(ts.read("t").as[(Long, String)].collect().toSet === Set((1L, "a")))

    // vacuum in the ghost state must treat the ghost as the FUTURE:
    // its dirs and manifest survive (they're above cur), so adoption
    // stays possible afterwards
    ts.vacuum("t", retainVersions = 1)
    // the append collides with the ghost at v1, adopts it, rebases, lands at v2
    ts.append("t", Seq((3L, "c")).toDF("id", "v"))
    assert(ts.currentVersion("t") === 2L)
    assert(ts.read("t").as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    // the adopted version is byte-faithful to what the crashed writer wrote
    assert(ts.readVersion("t", 1L).as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "b")))
  }

  test("ghost with staged change-feed rows: adoption completes the staging and the feed is intact") {
    val ts = freshStore()
    ts.create("t", (1L to 10L).map(i => (i, s"r$i")).toDF("id", "v")) // v0
    ts.setChangeFeed("t", enabled = true)                             // v1
    ts.deleteVectorized("t", org.apache.spark.sql.functions.col("id") <= 3L) // v2
    val wantChanges = ts.readChangesBetween("t", 1L, 2L)
      .selectExpr("id", "_change_type").as[(Long, String)].collect().toSet
    assert(wantChanges.nonEmpty)

    // crash state: the DV commit's manifest is linked but unpublished,
    // and its _cdf rows are still in the pre-move staging dot-dir. The
    // staging uuid is the dv sidecar's (the writer shares one uuid
    // across dv-<v>-<uuid> and .v<v>-<uuid>).
    val td = tableDir(ts, "t")
    val dvName = {
      val s = Files.list(td.resolve("_dv"))
      try s.iterator().next().getFileName.toString finally s.close()
    }
    val uuid = dvName.split('-').last
    val staging = td.resolve("_cdf").resolve(s".v2-$uuid")
    Files.move(td.resolve("_cdf").resolve("2"), staging)
    ageDir(staging, 120000L) // past the live-writer grace
    rewindLatest(ts, "t", 1L)
    assert(ts.read("t").count() === 10L) // delete invisible pre-adoption

    ts.append("t", Seq((99L, "x")).toDF("id", "v")) // adopts v2, lands v3
    assert(ts.currentVersion("t") === 3L)
    assert(ts.read("t").count() === 8L) // 10 - 3 deleted + 1 appended
    assert(Files.isDirectory(td.resolve("_cdf").resolve("2")))
    assert(ts.readChangesBetween("t", 1L, 2L)
      .selectExpr("id", "_change_type").as[(Long, String)].collect().toSet === wantChanges)
  }

  test("young staging backs off (a live writer may own it); aged staging adopts on retry") {
    val ts = freshStore()
    ts.create("t", (1L to 5L).map(i => (i, s"r$i")).toDF("id", "v"))
    ts.setChangeFeed("t", enabled = true)
    ts.deleteVectorized("t", org.apache.spark.sql.functions.col("id") === 1L) // v2
    val td = tableDir(ts, "t")
    val uuid = {
      val s = Files.list(td.resolve("_dv"))
      try s.iterator().next().getFileName.toString.split('-').last finally s.close()
    }
    val staging = td.resolve("_cdf").resolve(s".v2-$uuid")
    Files.move(td.resolve("_cdf").resolve("2"), staging) // mtime = NOW
    rewindLatest(ts, "t", 1L)

    // a fresh staging looks like a live writer mid-publish: the append
    // backs off each attempt and fails LOUDLY — nothing is corrupted
    intercept[java.util.ConcurrentModificationException](
      ts.append("t", Seq((98L, "x")).toDF("id", "v")))
    assert(ts.currentVersion("t") === 1L)
    assert(ts.read("t").count() === 5L)

    ageDir(staging, 120000L)
    ts.append("t", Seq((99L, "y")).toDF("id", "v"))
    assert(ts.currentVersion("t") === 3L)
    assert(ts.read("t").count() === 5L) // 5 - 1 deleted + 1 appended
    assert(ts.readChangesBetween("t", 1L, 2L).count() > 0)
  }

  test("legacy torn manifest (pre-hard-link crash) refuses loudly and names the file") {
    val ts = freshStore()
    ts.create("t", Seq((1L, "a")).toDF("id", "v"))
    Files.write(tableDir(ts, "t").resolve("_v").resolve("1.json"),
      "{\"schema\": \"id BI".getBytes(StandardCharsets.UTF_8)) // torn mid-write
    val e = intercept[IllegalStateException](
      ts.append("t", Seq((2L, "b")).toDF("id", "v")))
    assert(e.getMessage.contains("unreadable manifest"))
    assert(e.getMessage.contains("version 1"))
    assert(ts.read("t").count() === 1L) // table still readable
  }

  test("crashed CREATE: the half-created table is published and the retry gets create-on-existing semantics") {
    val ts = freshStore()
    ts.create("t", Seq((1L, "old")).toDF("id", "v"))
    Files.delete(tableDir(ts, "t").resolve("_LATEST")) // crash before pointer
    assert(!ts.exists("t"))

    // the re-create collides at v0, publishes the ghost, and reports
    // the conflict; the table is now VISIBLE with the crashed create's
    // rows instead of wedging every future create
    intercept[java.util.ConcurrentModificationException](
      ts.create("t", Seq((2L, "new")).toDF("id", "v")))
    assert(ts.exists("t"))
    assert(ts.read("t").as[(Long, String)].collect().toSet === Set((1L, "old")))

    // and the user-level retry proceeds as create-on-existing
    ts.create("t", Seq((2L, "new")).toDF("id", "v"))
    assert(ts.read("t").as[(Long, String)].collect().toSet === Set((2L, "new")))
  }

  test("published version with stranded feed staging: the change READER heals it (no commit ever collides)") {
    val ts = freshStore()
    ts.create("t", (1L to 10L).map(i => (i, s"r$i")).toDF("id", "v")) // v0
    ts.setChangeFeed("t", enabled = true)                             // v1
    ts.deleteVectorized("t", org.apache.spark.sql.functions.col("id") <= 2L) // v2
    val want = ts.readChangesBetween("t", 1L, 2L)
      .selectExpr("id", "_change_type").as[(Long, String)].collect().toSet

    // crash AFTER the pointer move, BEFORE the staging move: version 2
    // is visible, its feed rows stranded in the dot-dir. The pointer is
    // NOT rewound — commit-side adoption can never fire for this state.
    val td = tableDir(ts, "t")
    val uuid = {
      val s = Files.list(td.resolve("_dv"))
      try s.iterator().next().getFileName.toString.split('-').last finally s.close()
    }
    val staging = td.resolve("_cdf").resolve(s".v2-$uuid")
    Files.move(td.resolve("_cdf").resolve("2"), staging)
    assert(ts.currentVersion("t") === 2L) // still published

    // young staging: the reader refuses with a retry hint, not a wrong
    // answer and not the misleading "enable the change feed" error
    val e = intercept[IllegalStateException](
      ts.readChangesBetween("t", 1L, 2L).collect())
    assert(e.getMessage.contains("mid-publish"))

    ageDir(staging, 120000L)
    assert(ts.readChangesBetween("t", 1L, 2L)
      .selectExpr("id", "_change_type").as[(Long, String)].collect().toSet === want)
    assert(Files.isDirectory(td.resolve("_cdf").resolve("2"))) // healed in place
  }

  test("adoption racing a LIVE publisher: both commits land and the pointer never regresses") {
    import scala.concurrent.{Await, Future, Promise}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val ts = freshStore()
    ts.create("t", Seq((1L, "a")).toDF("id", "v"))
    val root = ts.dataRoot("t").getParent.getParent.toString
    // writer A pauses INSIDE the ghost window (manifest 1 linked,
    // pointer not yet moved) — exactly where a crash would strand it
    val inWindow = Promise[Unit]()
    val resume = Promise[Unit]()
    var fired = false
    ts.onAfterManifestLink = () => if (!fired) {
      fired = true
      inWindow.success(())
      Await.result(resume.future, 30.seconds)
    }
    val aDone = Future { ts.append("t", Seq((2L, "A")).toDF("id", "v")) }
    Await.result(inWindow.future, 30.seconds)
    // writer B (separate handle, no hook) collides with A's linked-but-
    // unpublished manifest, adopts it, and commits on top
    val tsB = new TableStore(spark, root)
    tsB.append("t", Seq((3L, "B")).toDF("id", "v"))
    assert(tsB.currentVersion("t") === 2L) // adopted v1 + B's v2
    // A resumes: its own pointer move must NOT regress below B's commit
    resume.success(())
    Await.result(aDone, 30.seconds)
    ts.onAfterManifestLink = () => ()
    assert(ts.currentVersion("t") === 2L, "a late publisher must never rewind _LATEST")
    assert(ts.read("t").as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "A"), (3L, "B")))
    assert(ts.readVersion("t", 1L).as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "A"))) // the adopted version is A's, byte-faithful
  }

  test("a crashed streaming-epoch commit stays exactly-once: the restart adopts it and skips") {
    val ts = freshStore()
    ts.create("t", Seq((1L, "a")).toDF("id", "v"))
    // epoch 1 commits (v1 carries txns q->1), then the pointer move is
    // lost to a crash
    ts.attachStreamEpoch("t", queryId = "q", epochId = 1L, files = Seq.empty)
    assert(ts.currentVersion("t") === 1L)
    rewindLatest(ts, "t", 0L)
    // the restarted sink re-attempts the SAME epoch: it must adopt the
    // ghost, see its own txn watermark in it, and commit NOTHING new
    ts.attachStreamEpoch("t", queryId = "q", epochId = 1L, files = Seq.empty)
    assert(ts.currentVersion("t") === 1L,
      "the retried epoch must dedupe against the adopted ghost, not double-commit")
    // and a LATER epoch proceeds normally on top
    ts.attachStreamEpoch("t", queryId = "q", epochId = 2L, files = Seq.empty)
    assert(ts.currentVersion("t") === 2L)
  }

  test("vacuum sweeps aged manifest-publication temps and keeps young ones") {
    val ts = freshStore()
    ts.create("t", Seq((1L, "a")).toDF("id", "v"))
    val vDir = tableDir(ts, "t").resolve("_v")
    val aged = vDir.resolve(".m7-deadbeef")
    val young = vDir.resolve(".m8-cafebabe")
    val agedPtr = tableDir(ts, "t").resolve("_LATEST.tmp7-deadbeef")
    Files.write(aged, "{}".getBytes(StandardCharsets.UTF_8))
    Files.write(young, "{}".getBytes(StandardCharsets.UTF_8))
    Files.write(agedPtr, "7".getBytes(StandardCharsets.UTF_8))
    Files.setLastModifiedTime(aged,
      FileTime.fromMillis(System.currentTimeMillis() - 2 * 3600L * 1000))
    Files.setLastModifiedTime(agedPtr,
      FileTime.fromMillis(System.currentTimeMillis() - 2 * 3600L * 1000))
    ts.vacuum("t", retainVersions = 1)
    assert(!Files.exists(aged))
    assert(!Files.exists(agedPtr))
    assert(Files.exists(young))
  }
}
