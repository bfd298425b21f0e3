package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.{JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.parquet.filter2.predicate.FilterPredicate
import org.apache.parquet.hadoop.ParquetInputFormat
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.execution.datasources.parquet.{ParquetReadSupport, VectorizedParquetRecordReader}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.{DecimalType, StructType}
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
                                   pushed: Array[Filter],
                                   fullSchema: StructType)
    extends PartitionReader[ColumnarBatch] {

  private def mk(pred: FilterPredicate): VectorizedParquetRecordReader = {
    val conf = GraftParquet.newConf()
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
    try {
      r.initialize(split, ctx)
      r.initBatch(new StructType(), InternalRow.empty)
      r.enableReturningBatches()
      r
    } catch { case e: Throwable =>
      // initialize already opened the file: close before rethrowing, or
      // every schema-evolution retry leaks a file handle
      try r.close() catch { case _: Exception => () }
      throw e
    }
  }

  private def footerSchema(): org.apache.parquet.schema.MessageType =
    scala.util.Using.resource(
      org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new Path(file), GraftParquet.newConf())))(
      _.getFooter.getFileMetaData.getSchema)

  private val reader: VectorizedParquetRecordReader = {
    // DECIMAL predicates translate to unscaled longs AT THE LOGICAL
    // SCALE — pushing one into a file whose DECIMAL annotation carries a
    // DIFFERENT scale (pre-rescale-widening files) passes parquet's
    // schema validation (both sides INT64) but compares wrongly-scaled
    // unscaled values: row groups with MATCHING rows get skipped and
    // Spark's re-evaluation above the scan cannot resurrect them — a
    // silent wrong answer, not a perf loss. No exception fires, so this
    // must be gated PROACTIVELY: when the pushed set references a
    // decimal column, one footer read decides per-file whether the
    // annotation scale matches (same rule as the row path's
    // fileEvaluable); mismatching files keep every NON-decimal conjunct.
    val effective: Array[Filter] = {
      def decimalCol(ref: String): Option[DecimalType] =
        fullSchema.fields.find(_.name.equalsIgnoreCase(ref))
          .map(_.dataType).collect { case d: DecimalType => d }
      if (!pushed.exists(_.references.exists(r => decimalCol(r).isDefined))) pushed
      else {
        val fs = try footerSchema() catch { case _: Exception => null }
        def scaleMatches(ref: String): Boolean = decimalCol(ref) match {
          case None => true // non-decimal: existing exception-retry covers it
          case Some(d) => fs != null && fs.containsField(ref) && {
            val p = fs.getFields.get(fs.getFieldIndex(ref))
            p.isPrimitive && (p.asPrimitiveType().getLogicalTypeAnnotation match {
              case dec: org.apache.parquet.schema.LogicalTypeAnnotation
                  .DecimalLogicalTypeAnnotation => dec.getScale == d.scale
              case _ => false
            })
          }
        }
        pushed.filter(_.references.forall(scaleMatches))
      }
    }
    // a predicate over a column this file predates (ALTER TABLE ADD
    // COLUMN) fails parquet's schema validation at row-group filtering.
    // Retry with the subset of filters THIS file can evaluate (same
    // containsField rule as the row path) — dropping everything would
    // lose row-group skipping on the still-valid conjuncts; Spark
    // re-applies all filters above the scan, so any dropped pushdown is
    // safe, never wrong. The footer read happens only on evolved files.
    val full = GraftVectorized.predicate(effective, fullSchema)
    if (full == null) mk(null)
    else try mk(full) catch { case _: Exception =>
      val sub =
        try {
          val fileSchema = footerSchema()
          GraftVectorized.predicate(
            effective.filter(_.references.forall(fileSchema.containsField)),
            fullSchema)
        } catch { case _: Exception => null }
      if (sub == null) mk(null)
      else try mk(sub) catch { case _: Exception => mk(null) }
    }
  }

  private var batch: ColumnarBatch = _

  override def next(): Boolean = {
    val has = reader.nextKeyValue()
    if (has) batch = reader.getCurrentValue.asInstanceOf[ColumnarBatch]
    has
  }

  override def get(): ColumnarBatch = batch

  override def close(): Unit = reader.close()
}

/** A ColumnVector view that remaps row ids through a surviving-rows
  * index — the zero-copy half of the columnar deletion-vector skip:
  * every accessor delegates to the wrapped vector at `map(rowId)`.
  * Struct/interval children are wrapped with the same map (their
  * accessors are addressed by parent row id via ColumnVector's final
  * getStruct/getInterval); array/map children are NOT remapped —
  * their coordinates are element offsets, and getArray/getMap delegate
  * to the base vector which builds them against its own children.
  * Per-batch and owns nothing: close() is a no-op (the parquet reader
  * owns the underlying vectors). */
private[sources] class RemappedColumnVector(base: org.apache.spark.sql.vectorized.ColumnVector,
                                            map: Array[Int])
    extends org.apache.spark.sql.vectorized.ColumnVector(base.dataType) {
  import org.apache.spark.sql.types.{CalendarIntervalType, StructType => SStructType}
  override def close(): Unit = ()
  override def hasNull: Boolean = base.hasNull
  override def numNulls: Int = {
    var n = 0; var i = 0
    while (i < map.length) { if (base.isNullAt(map(i))) n += 1; i += 1 }
    n
  }
  override def isNullAt(rowId: Int): Boolean = base.isNullAt(map(rowId))
  override def getBoolean(rowId: Int): Boolean = base.getBoolean(map(rowId))
  override def getByte(rowId: Int): Byte = base.getByte(map(rowId))
  override def getShort(rowId: Int): Short = base.getShort(map(rowId))
  override def getInt(rowId: Int): Int = base.getInt(map(rowId))
  override def getLong(rowId: Int): Long = base.getLong(map(rowId))
  override def getFloat(rowId: Int): Float = base.getFloat(map(rowId))
  override def getDouble(rowId: Int): Double = base.getDouble(map(rowId))
  override def getArray(rowId: Int): org.apache.spark.sql.vectorized.ColumnarArray =
    base.getArray(map(rowId))
  override def getMap(ordinal: Int): org.apache.spark.sql.vectorized.ColumnarMap =
    base.getMap(map(ordinal))
  override def getDecimal(rowId: Int, precision: Int, scale: Int): org.apache.spark.sql.types.Decimal =
    base.getDecimal(map(rowId), precision, scale)
  override def getUTF8String(rowId: Int): org.apache.spark.unsafe.types.UTF8String =
    base.getUTF8String(map(rowId))
  override def getBinary(rowId: Int): Array[Byte] = base.getBinary(map(rowId))
  override def getChild(ordinal: Int): org.apache.spark.sql.vectorized.ColumnVector =
    base.dataType match {
      case _: SStructType | CalendarIntervalType =>
        new RemappedColumnVector(base.getChild(ordinal), map)
      case _ => base.getChild(ordinal)
    }
}

/** Columnar deletion-vector skip: wraps the vectorized per-file reader
  * (run WITHOUT parquet-mr pushdown, so the running row count equals
  * the file row index) and re-exposes each batch with the tombstoned
  * positions removed via [[RemappedColumnVector]] — no data copy, no
  * row-path fallback. DV'd files stay on the ColumnarBatch path that
  * whole-stage codegen consumes; without this, one deletion vector
  * anywhere in a snapshot used to demote the ENTIRE scan to the
  * row-at-a-time reader (the round-4 read-amplification cliff). */
class GraftDvSkipColumnarReader(inner: PartitionReader[ColumnarBatch],
                                positions: Array[Long])
    extends PartitionReader[ColumnarBatch] {
  private var base = 0L // file row index of the current batch's first row
  private var p = 0 // cursor into the sorted positions
  private var out: ColumnarBatch = _

  override def next(): Boolean = {
    while (inner.next()) {
      val b = inner.get()
      val n = b.numRows()
      val startP = p
      while (p < positions.length && positions(p) < base + n) p += 1
      val ndel = p - startP
      if (ndel == 0) { out = b; base += n; return true }
      if (ndel < n) {
        val map = new Array[Int](n - ndel)
        var i = 0; var q = startP; var j = 0
        while (i < n) {
          if (q < p && positions(q) == base + i) q += 1
          else { map(j) = i; j += 1 }
          i += 1
        }
        val cols = Array.tabulate[org.apache.spark.sql.vectorized.ColumnVector](
          b.numCols())(c => new RemappedColumnVector(b.column(c), map))
        out = new ColumnarBatch(cols, map.length)
        base += n
        return true
      }
      base += n // every row in the batch tombstoned: skip it entirely
    }
    false
  }
  override def get(): ColumnarBatch = out
  override def close(): Unit = inner.close()
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
