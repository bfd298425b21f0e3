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

  val schema: StructType = StructType(Seq(
    StructField("job_name", StringType),
    StructField("batch_id", StringType),
    StructField("layer", StringType),
    StructField("status", StringType),
    StructField("started_at", TimestampType),
    StructField("completed_at", TimestampType),
    StructField("last_processed_timestamp", TimestampType),
    StructField("records_read", LongType),
    StructField("records_written", LongType),
    StructField("records_quarantined", LongType),
    StructField("error_message", StringType)))

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
      .headOption.map(_.getTimestamp(0))
  }

  /** S6/S8: append one run record. */
  def record(jobName: String, batchId: String, layer: String, status: String,
             startedAt: Timestamp, completedAt: Timestamp,
             watermark: Option[Timestamp],
             read: Long, written: Long, quarantined: Long,
             error: Option[String] = None): Unit = {
    init()
    val spark = store.read(table).sparkSession
    val row = Row(jobName, batchId, layer, status, startedAt, completedAt,
      watermark.orNull, read, written, quarantined, error.orNull)
    store.append(table, spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(row)), schema))
  }
}
