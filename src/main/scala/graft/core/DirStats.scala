package graft.core

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._
import scala.util.Using

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.spark.sql.types._

/** Per-data-dir column statistics stored in the table manifest — the
  * engine's analogue of the per-file stats Delta keeps in its
  * transaction log for data skipping (Delta VLDB paper §4.2): a scan
  * with a pushed predicate consults the manifest and never even OPENS
  * files in dirs whose [min,max] ranges can't match, and metadata-only
  * aggregates (COUNT/MIN/MAX without WHERE) are answered from the
  * manifest with zero data I/O.
  *
  * Collection is one parquet FOOTER read per file at commit time,
  * driver-side — O(files just written), no data pages touched. Values
  * are held in the engine's canonical primitive forms (Long / Int /
  * Double / Float / Boolean / String; timestamps as Long micros, dates
  * as Int days — the same representations the store's INT64-micros
  * parquet layout uses), so comparisons during pruning are exact.
  *
  * A column with unreliable or absent footer statistics simply has no
  * entry — every consumer treats "no stats" as "might match".
  */
final case class ColStats(min: Option[Any], max: Option[Any], nulls: Option[Long])

final case class DirStats(rows: Long, cols: Map[String, ColStats])

object DirStats {

  /** Aggregate footer statistics over the parquet files of one data dir.
    * Returns None when the dir has no parquet files (empty write). */
  def collect(dirPath: Path, schema: StructType): Option[DirStats] = {
    if (!Files.isDirectory(dirPath)) return None
    val files = Using.resource(Files.list(dirPath))(
      _.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).toSeq)
    if (files.isEmpty) return None
    var rows = 0L
    // per column: (min, max, nulls, reliable) — reliable drops to false
    // the moment any row group lacks usable stats for that column
    val acc = scala.collection.mutable.Map[String, (Any, Any, Long, Boolean)]()
    schema.fields.foreach(f => acc(f.name) = (null, null, 0L, true))
    files.foreach { f =>
      val footer = Using.resource(ParquetFileReader.open(
          HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(f.toString), new Configuration())))(
        _.getFooter)
      footer.getBlocks.asScala.foreach { block =>
        rows += block.getRowCount
        val byPath = block.getColumns.asScala
          .map(c => c.getPath.toDotString -> c).toMap
        schema.fields.foreach { field =>
          val (mn, mx, nulls, ok) = acc(field.name)
          if (ok) byPath.get(field.name) match {
            case None =>
              // file predates this column (ADD COLUMN): all its rows are
              // null for it — null count grows, min/max unaffected
              acc(field.name) = (mn, mx, nulls + block.getRowCount, true)
            case Some(chunk) =>
              val st = chunk.getStatistics
              if (st == null || !st.isNumNullsSet)
                acc(field.name) = (null, null, 0L, false)
              else if (!st.hasNonNullValue)
                // stats present but no values -> row group is all-null
                acc(field.name) = (mn, mx, nulls + st.getNumNulls, true)
              else canonical(st.genericGetMin, field.dataType)
                .zip(canonical(st.genericGetMax, field.dataType)) match {
                case Some((lo, hi)) =>
                  val nmn = if (mn == null || lt(lo, mn)) lo else mn
                  val nmx = if (mx == null || lt(mx, hi)) hi else mx
                  acc(field.name) = (nmn, nmx, nulls + st.getNumNulls, true)
                case None =>
                  acc(field.name) = (null, null, 0L, false)
              }
          }
        }
      }
    }
    val cols = acc.collect { case (name, (mn, mx, nulls, true)) =>
      name -> ColStats(Option(mn), Option(mx), Some(nulls))
    }.toMap
    Some(DirStats(rows, cols))
  }

  /** parquet footer value -> the engine's canonical primitive for the
    * Spark type; None if the combination isn't one we trust. */
  private def canonical(v: Any, dt: DataType): Option[Any] = (dt, v) match {
    case (LongType, x: java.lang.Long) => Some(x.longValue)
    case (IntegerType, x: java.lang.Integer) => Some(x.intValue)
    case (DoubleType, x: java.lang.Double) => Some(x.doubleValue)
    case (FloatType, x: java.lang.Float) => Some(x.floatValue)
    case (BooleanType, x: java.lang.Boolean) => Some(x.booleanValue)
    case (StringType, b: Binary) => Some(b.toStringUsingUTF8)
    case (TimestampType | TimestampNTZType, x: java.lang.Long) => Some(x.longValue)
    case (DateType, x: java.lang.Integer) => Some(x.intValue)
    case _ => None
  }

  /** Total order over canonical values of one column's type. */
  def lt(a: Any, b: Any): Boolean = (a, b) match {
    case (x: Long, y: Long) => x < y
    case (x: Int, y: Int) => x < y
    case (x: Double, y: Double) => x < y
    case (x: Float, y: Float) => x < y
    case (x: Boolean, y: Boolean) => !x && y
    case (x: String, y: String) => x < y
    case _ => throw new IllegalArgumentException(
      s"incomparable stats values: ${a.getClass} vs ${b.getClass}")
  }
  def lte(a: Any, b: Any): Boolean = !lt(b, a)

  // ---- manifest JSON round trip (values as strings, typed by schema) ----

  def toJsonFragment(stats: Map[String, DirStats], jsonStr: String => String): String = {
    val dirs = stats.toSeq.sortBy(_._1).map { case (d, ds) =>
      val cols = ds.cols.toSeq.sortBy(_._1).map { case (c, cs) =>
        val parts = Seq(
          cs.min.map(v => s""""min": ${jsonStr(encode(v))}"""),
          cs.max.map(v => s""""max": ${jsonStr(encode(v))}"""),
          cs.nulls.map(n => s""""nulls": $n""")).flatten
        s"${jsonStr(c)}: {${parts.mkString(", ")}}"
      }
      s"""${jsonStr(d)}: {"rows": ${ds.rows}, "cols": {${cols.mkString(", ")}}}"""
    }
    s"{${dirs.mkString(", ")}}"
  }

  private def encode(v: Any): String = v match {
    case d: Double => java.lang.Double.toString(d) // round-trip exact
    case f: Float => java.lang.Float.toString(f)
    case other => other.toString
  }

  def fromParsed(parsed: Any, schema: StructType): Map[String, DirStats] = {
    val types = schema.fields.map(f => f.name -> f.dataType).toMap
    parsed.asInstanceOf[Map[String, Any]].map { case (d, v) =>
      val m = v.asInstanceOf[Map[String, Any]]
      val cols = m.getOrElse("cols", Map.empty).asInstanceOf[Map[String, Any]]
        .flatMap { case (c, cv) =>
          // a column dropped from the schema (never happens today) or of
          // an unexpected type is simply skipped — "no stats"
          types.get(c).flatMap { dt =>
            val cm = cv.asInstanceOf[Map[String, Any]]
            def dec(k: String): Option[Any] =
              cm.get(k).flatMap(s => decode(s.asInstanceOf[String], dt))
            Some(c -> ColStats(dec("min"), dec("max"),
              cm.get("nulls").map(_.asInstanceOf[Long])))
          }
        }
      d -> DirStats(m("rows").asInstanceOf[Long], cols)
    }
  }

  private def decode(s: String, dt: DataType): Option[Any] = dt match {
    case LongType | TimestampType | TimestampNTZType => s.toLongOption
    case IntegerType | DateType => s.toIntOption
    case DoubleType => s.toDoubleOption
    case FloatType => s.toFloatOption
    case BooleanType => s.toBooleanOption
    case StringType => Some(s)
    case _ => None
  }
}
