package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.{JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.parquet.filter2.predicate.FilterPredicate
import org.apache.parquet.hadoop.ParquetInputFormat
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.execution.datasources.parquet.{ParquetReadSupport, VectorizedParquetRecordReader}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.vectorized.ColumnarBatch

/** Vectorized (ColumnarBatch) read path for the DSv2 catalog scan,
  * built on Spark's own VectorizedParquetRecordReader — the same class
  * behind FileSourceScanExec's parquet scans — driven through the
  * production ParquetReadSupport schema-clipping path so:
  *   - decoding is columnar (no per-row boxed Group materialization),
  *   - columns a file predates (ALTER TABLE ADD COLUMN) come back as
  *     null vectors,
  *   - a pushed FilterPredicate does row-group statistics skipping.
  *
  * The batch is handed to Spark as-is, so whole-stage codegen consumes
  * ColumnVectors directly — at scale this is the difference between a
  * scan bound by object churn and one bound by I/O.
  */
class GraftColumnarPartitionReader(file: String, required: StructType,
                                   pushed: FilterPredicate)
    extends PartitionReader[ColumnarBatch] {

  private def mk(pred: FilterPredicate): VectorizedParquetRecordReader = {
    val conf = new Configuration()
    conf.set(ParquetInputFormat.READ_SUPPORT_CLASS, classOf[ParquetReadSupport].getName)
    conf.set(ParquetReadSupport.SPARK_ROW_REQUESTED_SCHEMA, required.json)
    // the engine's files are written by this store (Spark parquet or the
    // GraftParquet writer): binary=UTF8 strings, INT64-micros timestamps,
    // no INT96, modern (proleptic-Gregorian) dates -> CORRECTED rebase
    // ParquetToSparkSchemaConverter reads these with no defaults — the
    // production scan always sets the full quintet, so must we
    conf.setBoolean("spark.sql.parquet.binaryAsString", false)
    conf.setBoolean("spark.sql.parquet.int96AsTimestamp", false)
    conf.setBoolean("spark.sql.caseSensitive", false)
    conf.setBoolean("spark.sql.parquet.inferTimestampNTZ.enabled", true)
    conf.setBoolean("spark.sql.legacy.parquet.nanosAsLong", false)
    conf.setBoolean("spark.sql.parquet.fieldId.read.enabled", false)
    conf.setBoolean("spark.sql.parquet.fieldId.write.enabled", false)
    if (pred != null) ParquetInputFormat.setFilterPredicate(conf, pred)
    val r = new VectorizedParquetRecordReader(
      null, "CORRECTED", "UTC", "CORRECTED", "UTC",
      /* useOffHeap = */ false, /* capacity = */ 4096)
    // mapred.FileSplit (extends the mapreduce one): Spark's reader base
    // casts the split to the old API class
    val split = new org.apache.hadoop.mapred.FileSplit(
      new Path(file), 0, java.nio.file.Files.size(java.nio.file.Paths.get(file)),
      Array.empty[String])
    val ctx = new TaskAttemptContextImpl(conf,
      new TaskAttemptID(new TaskID(new JobID(), TaskType.MAP, 0), 0))
    r.initialize(split, ctx)
    r.initBatch(new StructType(), InternalRow.empty)
    r.enableReturningBatches()
    r
  }

  private val reader: VectorizedParquetRecordReader =
    // a predicate over a column this file predates (ALTER TABLE ADD
    // COLUMN) fails parquet's schema validation at row-group filtering;
    // retry without the pushed predicate — Spark re-applies all filters
    // above the scan, so dropping the pushdown is safe, never wrong
    if (pushed == null) mk(null)
    else try mk(pushed) catch { case _: Exception => mk(null) }

  private var batch: ColumnarBatch = _

  override def next(): Boolean = {
    val has = reader.nextKeyValue()
    if (has) batch = reader.getCurrentValue.asInstanceOf[ColumnarBatch]
    has
  }

  override def get(): ColumnarBatch = batch

  override def close(): Unit = reader.close()
}

object GraftVectorized {
  /** Escape hatch: -Dgraft.sql.vectorized=false falls back to the
    * row-at-a-time parquet-mr reader. */
  def enabled: Boolean =
    sys.props.getOrElse("graft.sql.vectorized", "true").equalsIgnoreCase("true")

  /** Combined parquet predicate for a partition, or null. */
  def predicate(pushed: Array[Filter], fullSchema: StructType): FilterPredicate =
    pushed.toSeq.flatMap(f => GraftFilters.translate(f, fullSchema))
      .reduceOption(org.apache.parquet.filter2.predicate.FilterApi.and)
      .orNull
}
