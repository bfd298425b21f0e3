package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.TableStore

/** The reference's watermark / run-metadata machinery
  * (docs/SCHEMA_REGISTRY.md:53-81 — `{layer}.job_control`;
  * shared/read_watermark.py, shared/write_watermark.py,
  * silver/jobs/validate_silver.py:31-60).
  *
  * Incremental processing in the reference is batch high-watermarking:
  * each layer persists last_processed_timestamp for its job and filters
  * `updated_at > watermark` on the next run. The own-watermark invariant
  * (a layer reads ITS OWN job_control, not its upstream's —
  * docs/KNOWN_ISSUES.md:368-432) is preserved by keying on job_name.
  */
class JobControl(store: TableStore, table: String = "job_control") {

  /** The registry's full 23-column job_control contract
    * (docs/SCHEMA_REGISTRY.md:53-81). The last two columns are named
    * after the reference's runtime (cluster name / Spark app id) and
    * are nullable free-text here. */
  val schema: StructType = StructType(Seq(
    StructField("job_name", StringType),
    StructField("layer", StringType),
    StructField("batch_id", StringType),
    StructField("run_mode", StringType),
    StructField("status", StringType),
    StructField("processing_date", DateType),
    StructField("start_date", DateType),
    StructField("end_date", DateType),
    StructField("last_processed_timestamp", TimestampType),
    StructField("last_processed_batch_id", StringType),
    StructField("records_read", LongType),
    StructField("records_written", LongType),
    StructField("records_failed", LongType),
    StructField("records_quarantined", LongType),
    StructField("started_at", TimestampType),
    StructField("completed_at", TimestampType),
    StructField("duration_seconds", LongType),
    StructField("retry_count", LongType),
    StructField("max_retries", LongType),
    StructField("error_message", StringType),
    StructField("triggered_by", StringType),
    StructField("dataproc_cluster", StringType),
    StructField("spark_app_id", StringType)))

  def init(): Unit = if (!store.exists(table)) store.createEmpty(table, schema)

  /** O1: latest successful watermark for a job — ORDER BY completed_at
    * DESC LIMIT 1 (TakeOrderedAndProject: no full sort at scale). */
  def lastWatermark(jobName: String): Option[Timestamp] = {
    init()
    store.read(table)
      .filter(col("job_name") === jobName && col("status") === "SUCCESS")
      .orderBy(col("completed_at").desc)
      .limit(1)
      .select("last_processed_timestamp")
      .collect()
      // flatMap, not map: a SUCCESS row recorded with watermark = None
      // (full-refresh runs) must read as "no watermark", not Some(null)
      // — callers .get the value into a filter, and a null watermark
      // would silently zero out the next incremental run
      .headOption.flatMap(r => Option(r.getTimestamp(0)))
  }

  /** S6/S8: append one run record (full 23-column contract; the common
    * call sites only supply the operational core, the rest default to
    * the reference's values for a first-attempt incremental run). */
  def record(jobName: String, batchId: String, layer: String, status: String,
             startedAt: Timestamp, completedAt: Timestamp,
             watermark: Option[Timestamp],
             read: Long, written: Long, quarantined: Long,
             error: Option[String] = None,
             runMode: String = "incremental",
             processingDate: Option[java.sql.Date] = None,
             startDate: Option[java.sql.Date] = None,
             endDate: Option[java.sql.Date] = None,
             lastBatchId: Option[String] = None,
             failed: Long = 0L,
             retryCount: Long = 0L,
             maxRetries: Long = 2L,
             triggeredBy: String = "manual"): Unit = {
    init()
    val spark = store.read(table).sparkSession
    val duration = (completedAt.getTime - startedAt.getTime) / 1000L
    val row = Row(jobName, layer, batchId, runMode, status,
      processingDate.orNull, startDate.orNull, endDate.orNull,
      watermark.orNull, lastBatchId.orNull,
      read, written, failed, quarantined,
      startedAt, completedAt, duration, retryCount, maxRetries,
      error.orNull, triggeredBy, null, null)
    store.append(table, spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(row)), schema))
  }

  /** Retention sweep (docs/SCHEMA_REGISTRY.md:118-121 —
    * `{layer}.job_control_archive` holds records older than 90 days):
    * copy rows with completed_at before `cutoff` into the archive
    * table, then remove them from the live table. The delete rides the
    * manifest-stats pruned copy-on-write, so on a long-lived control
    * table only the dirs whose completed_at range reaches past the
    * cutoff are rewritten. */
  def archive(cutoff: org.apache.spark.sql.Column): Unit = {
    init()
    val archiveTable = s"${table}_archive"
    if (!store.exists(archiveTable)) store.createEmpty(archiveTable, schema)
    // ONE pinned snapshot drives both sides: re-evaluating the predicate
    // against the live table for the delete would remove rows a
    // concurrent writer landed between the copy and the delete (e.g. a
    // backfilled run with an old completed_at) without ever archiving
    // them. The copy is also made idempotent (anti-join against the
    // archive on the identifying columns), so a crash between append
    // and delete re-runs cleanly instead of duplicating rows.
    val v = store.currentVersion(table)
    val doomed = store.readVersion(table, v).filter(col("completed_at") < cutoff)
    val idCols = Seq("job_name", "batch_id", "started_at")
    store.append(archiveTable,
      doomed.join(store.read(archiveTable).select(idCols.map(col): _*),
        idCols, "left_anti"))
    // delete EXACTLY the archived rows: keyed on the identifying
    // columns of the pinned snapshot, not a re-evaluated predicate
    store.mergeDelete(table, doomed.select(idCols.map(col): _*), idCols)
  }
}
