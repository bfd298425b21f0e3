package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.TableStore
import graft.ops.JobControl

/** Watermark-driven incremental processing (the reference's whole
  * "streaming" story — SURVEY §1.1): each run reads ITS OWN job's last
  * watermark, processes only rows past it, and records the new one.
  */
class JobControlSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  test("incremental runs process only rows past their own watermark") {
    val store = new TableStore(spark, Files.createTempDirectory("jc").toString)
    val jc = new JobControl(store)
    val job = "load_events"

    // first run: no watermark -> full load
    assert(jc.lastWatermark(job).isEmpty)
    val batch1 = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00"), "a"),
      (2L, Timestamp.valueOf("2024-01-02 00:00:00"), "b"))
      .toDF("id", "updated_at", "v")
    store.create("events_tbl", batch1)
    val wm1 = batch1.agg(max("updated_at")).head().getTimestamp(0)
    jc.record(job, "b1", "bronze", "SUCCESS",
      Timestamp.valueOf("2026-08-12 01:00:00"), Timestamp.valueOf("2026-08-12 01:01:00"),
      Some(wm1), read = 2, written = 2, quarantined = 0)
    assert(jc.lastWatermark(job).contains(wm1))

    // second run: only rows with updated_at > wm1 are processed
    val source = Seq(
      (2L, Timestamp.valueOf("2024-01-02 00:00:00"), "b"),      // old, filtered
      (3L, Timestamp.valueOf("2024-01-05 00:00:00"), "c"))      // new
      .toDF("id", "updated_at", "v")
    val incr = source.filter(col("updated_at") > lit(jc.lastWatermark(job).get))
    assert(incr.count() === 1)
    store.mergeUpsert("events_tbl", incr, Seq("id"), changeTypeCol = None)
    assert(store.read("events_tbl").count() === 3)
    val wm2 = incr.agg(max("updated_at")).head().getTimestamp(0)
    jc.record(job, "b2", "bronze", "SUCCESS",
      Timestamp.valueOf("2026-08-12 02:00:00"), Timestamp.valueOf("2026-08-12 02:01:00"),
      Some(wm2), read = 1, written = 1, quarantined = 0)
    assert(jc.lastWatermark(job).contains(wm2))

    // FAILED runs never advance the watermark (own-watermark invariant)
    jc.record(job, "b3", "bronze", "FAILED",
      Timestamp.valueOf("2026-08-12 03:00:00"), Timestamp.valueOf("2026-08-12 03:01:00"),
      None, read = 0, written = 0, quarantined = 0, error = Some("boom"))
    assert(jc.lastWatermark(job).contains(wm2))
    // and other jobs see their own (empty) watermark, not this one's
    assert(jc.lastWatermark("other_job").isEmpty)
  }

  test("archive moves old records once and is idempotent") {
    import org.apache.spark.sql.functions.{col, lit}
    val store = new TableStore(spark,
      java.nio.file.Files.createTempDirectory("jcarch").toString)
    val jc = new JobControl(store)
    def rec(batch: String, completed: String): Unit =
      jc.record("j", batch, "bronze", "SUCCESS",
        Timestamp.valueOf(completed), Timestamp.valueOf(completed),
        None, 1, 1, 0)
    rec("old1", "2026-01-01 00:00:00")
    rec("old2", "2026-02-01 00:00:00")
    rec("new1", "2026-08-01 00:00:00")
    val cutoff = lit("2026-05-14 00:00:00").cast("timestamp")
    jc.archive(cutoff)
    assert(store.read("job_control").count() === 1)
    assert(store.read("job_control_archive")
      .select("batch_id").as[String].collect().toSet === Set("old1", "old2"))
    // re-running the sweep moves nothing more
    jc.archive(cutoff)
    assert(store.read("job_control").count() === 1)
    assert(store.read("job_control_archive").count() === 2)
    // the surviving record is the recent one, watermark API still works
    assert(store.read("job_control").filter(col("batch_id") === "new1").count() === 1)
  }

  test("a SUCCESS run recorded without a watermark reads back as None") {
    val store = new TableStore(spark, Files.createTempDirectory("jcnull").toString)
    val jc = new JobControl(store)
    // full-refresh runs legitimately record no watermark
    jc.record("j", "b0", "bronze", "SUCCESS",
      Timestamp.valueOf("2026-01-01 00:00:00"),
      Timestamp.valueOf("2026-01-01 00:01:00"), None, 1, 1, 0,
      runMode = "full_refresh")
    // was Some(null): callers .get the value straight into a filter,
    // silently zeroing the next incremental run
    assert(jc.lastWatermark("j") === None)
    jc.record("j", "b1", "bronze", "SUCCESS",
      Timestamp.valueOf("2026-01-02 00:00:00"),
      Timestamp.valueOf("2026-01-02 00:01:00"),
      Some(Timestamp.valueOf("2026-01-02 00:00:00")), 1, 1, 0)
    assert(jc.lastWatermark("j") ===
      Some(Timestamp.valueOf("2026-01-02 00:00:00")))
  }
}
