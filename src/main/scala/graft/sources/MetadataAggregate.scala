package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate._
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.{ColStats, DirStats}

/** Metadata-only aggregates: COUNT(*) / COUNT(col) / MIN / MAX with no
  * WHERE and no GROUP BY answered entirely from the manifest's per-dir
  * statistics — the scan never lists, opens, or decodes a data file.
  * At 100 TB this turns "how many rows / what's the high-water mark"
  * (the watermark pattern the reference runs before every incremental
  * load) from a full-table pass into a driver-side manifest lookup,
  * the same trick Delta's OptimizeMetadataOnlyDeltaQuery plays over
  * its transaction log.
  *
  * Refusal rules (fall back to a real scan):
  *  - any dir lacking reliable stats for the needed column;
  *  - MAX on float/double — parquet footer bounds silently exclude NaN
  *    (which Spark's MAX would return), so the manifest max may not be
  *    the true max. MIN stays answerable: NaN never sorts below a
  *    bound. A dir that is entirely NaN has unreliable bounds and is
  *    caught by the first rule.
  *  - COUNT(DISTINCT ...), or any aggregate shape other than the four
  *    above.
  */
object MetadataAggregate {

  /** Try to answer `agg` from stats. Some((schema, row)) when every
    * aggregate expression is answerable for every live dir. */
  def answer(agg: Aggregation, schema: StructType, dirs: Seq[String],
             stats: Map[String, DirStats],
             dvDeleted: Map[String, Long] = Map.empty)
      : Option[(StructType, InternalRow)] = {
    if (agg.groupByExpressions().nonEmpty) return None
    if (!dirs.forall(stats.contains)) return None
    val dirStats = dirs.map(stats)
    // deletion vectors: COUNT(*) subtracts the manifest's tombstone
    // counts; everything else is unanswerable over a DV'd dir (the
    // deleted rows' nulls/extremes are unknown to the stats)
    val hasDv = dirs.exists(dvDeleted.contains)
    val answered = agg.aggregateExpressions().toSeq.map {
      case _: CountStar =>
        Some((StructField("count_star", LongType, nullable = false),
          (dirStats.map(_.rows).sum - dirs.flatMap(dvDeleted.get).sum): Any))
      case c: Count if !c.isDistinct && !hasDv =>
        for {
          f <- field(schema, c.column())
          css <- colStats(dirStats, f.name)
          nulls <- traverse(css.map(_._2.nulls))
        } yield (StructField(s"count_${f.name}", LongType, nullable = false),
          (css.map(_._1.rows).sum - nulls.sum): Any)
      case m: Min if !hasDv =>
        for {
          f <- field(schema, m.column())
          css <- colStats(dirStats, f.name)
          // a reliable entry with no min means the dir is all-null for
          // the column — MIN ignores nulls, so skip it
          lo = css.flatMap(_._2.min)
          v <- bound(lo, f.dataType, isMin = true)
        } yield (StructField(s"min_${f.name}", f.dataType, nullable = true), v)
      case m: Max if !hasDv =>
        for {
          f <- field(schema, m.column())
          if f.dataType != DoubleType && f.dataType != FloatType // hidden NaN
          css <- colStats(dirStats, f.name)
          hi = css.flatMap(_._2.max)
          v <- bound(hi, f.dataType, isMin = false)
        } yield (StructField(s"max_${f.name}", f.dataType, nullable = true), v)
      case _ => None
    }
    traverse(answered).map { fs =>
      (StructType(fs.map(_._1)),
        InternalRow.fromSeq(fs.map(v => internal(v._2, v._1.dataType))))
    }
  }

  private def traverse[A](xs: Seq[Option[A]]): Option[Seq[A]] =
    if (xs.forall(_.isDefined)) Some(xs.map(_.get)) else None

  private def field(schema: StructType, col: org.apache.spark.sql.connector.expressions.Expression): Option[StructField] =
    col match {
      case nr: NamedReference if nr.fieldNames().length == 1 =>
        schema.fields.find(_.name.equalsIgnoreCase(nr.fieldNames()(0)))
      case _ => None
    }

  /** Every dir's stats entry for the column, or None if any dir lacks
    * a reliable entry. */
  private def colStats(dirStats: Seq[DirStats], name: String): Option[Seq[(DirStats, ColStats)]] =
    traverse(dirStats.map(ds => ds.cols.get(name).map(ds -> _)))

  /** Fold per-dir bounds into the global one; Some(null) when every
    * dir is all-null (SQL MIN/MAX of nothing-but-null is null). */
  private def bound(vs: Seq[Any], dt: DataType, isMin: Boolean): Option[Any] =
    if (vs.isEmpty) Some(null)
    else Some(vs.reduce((a, b) =>
      if (graft.core.DirStats.lt(a, b) == isMin) a else b))

  private[sources] def internal(v: Any, dt: DataType): Any = (v, dt) match {
    case (s: String, _) => UTF8String.fromString(s)
    // manifest holds decimals as unscaled longs; InternalRow wants Decimal
    case (l: Long, d: DecimalType) => Decimal.createUnsafe(l, d.precision, d.scale)
    case (other, _) => other // Long/Int/Double/Float/Boolean, date days, ts micros
  }
}

/** The zero-file local scan produced when MetadataAggregate answers
  * (one row) or a stored procedure returns results (any number). */
class GraftMetadataScan(schema: StructType, resultRows: Array[InternalRow],
                        describeSource: String) extends Scan with LocalScan {
  def this(schema: StructType, row: InternalRow, describeSource: String) =
    this(schema, Array(row), describeSource)
  override def readSchema(): StructType = schema
  override def rows(): Array[InternalRow] = resultRows
  override def description(): String =
    s"graft metadata-only aggregate over $describeSource (0 files read)"
}
