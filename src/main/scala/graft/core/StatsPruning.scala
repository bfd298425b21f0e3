package graft.core

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** Manifest-statistics data skipping — the consumer of [[DirStats]]:
  * given a scan's pushed predicates, decide per data dir whether ANY
  * row could match, and drop the dirs that can't before a single file
  * is listed or opened. This is the engine's analogue of Delta's
  * add-file min/max skipping (Delta VLDB paper §4.2): at 100 TB the
  * win isn't decode time but never touching the object-store at all
  * for out-of-range partitions.
  *
  * Soundness rules (a dir is pruned ONLY when no row can match):
  *  - a dir or column without reliable stats always "might match";
  *  - float/double upper bounds are treated as open-ended: parquet-mr
  *    computes double min/max with `<`/`>` comparisons, so NaN values
  *    (which Spark orders ABOVE everything) are silently absent from
  *    footer bounds — max-based pruning on a float/double column could
  *    drop NaN rows that `x > v` matches. Min-based pruning stays safe
  *    (NaN is never below a bound), as does non-NaN equality (NaN
  *    equals nothing but NaN).
  *  - Not / unknown predicates never prune.
  */
object StatsPruning {

  /** The dirs of `dirStats` whose rows might satisfy ALL `filters`
    * (missing-stats dirs always survive). */
  def liveDirs(dirs: Seq[String], stats: Map[String, DirStats],
               schema: StructType, filters: Seq[Filter]): Seq[String] =
    if (filters.isEmpty) dirs
    else dirs.filter { d =>
      stats.get(d) match {
        // a zero-row dir (empty write) can never satisfy any predicate
        case Some(ds) => ds.rows > 0 && !filters.exists(f => cannotMatch(ds, schema, f))
        case None => true
      }
    }

  /** True only when NO row in a dir with these stats can satisfy f. */
  private[core] def cannotMatch(ds: DirStats, schema: StructType, f: Filter): Boolean = f match {
    case EqualTo(a, v) => outsideBounds(ds, schema, a, v)
    case EqualNullSafe(a, null) => colStats(ds, a).flatMap(_.nulls).contains(0L)
    case EqualNullSafe(a, v) => outsideBounds(ds, schema, a, v)
    case In(a, vs) =>
      vs != null && vs.nonEmpty && vs.forall(v => outsideBounds(ds, schema, a, v))
    // x > v needs a row with value above v: prune when max <= v —
    // EXCEPT float/double, whose footer max may hide NaN rows (NaN > v
    // in Spark's ordering), so their max is treated as open-ended
    case GreaterThan(a, v) => !isFp(schema, a) &&
      withCanon(ds, schema, a, v) { (cs, cv) =>
        cs.max.exists(hi => !DirStats.lt(cv, hi)) // hi <= v
      }
    case GreaterThanOrEqual(a, v) => !isFp(schema, a) &&
      withCanon(ds, schema, a, v) { (cs, cv) =>
        cs.max.exists(hi => DirStats.lt(hi, cv)) // hi < v
      }
    // x < v: prune when min >= v (safe for float/double — NaN rows sort
    // above everything, so they'd never satisfy x < v anyway)
    case LessThan(a, v) =>
      withCanon(ds, schema, a, v) { (cs, cv) =>
        cs.min.exists(lo => !DirStats.lt(lo, cv)) // lo >= v
      }
    case LessThanOrEqual(a, v) =>
      withCanon(ds, schema, a, v) { (cs, cv) =>
        cs.min.exists(lo => DirStats.lt(cv, lo)) // lo > v
      }
    case IsNull(a) => colStats(ds, a).flatMap(_.nulls).contains(0L)
    case IsNotNull(a) =>
      colStats(ds, a).flatMap(_.nulls).exists(_ == ds.rows)
    case And(l, r) => cannotMatch(ds, schema, l) || cannotMatch(ds, schema, r)
    case Or(l, r) => cannotMatch(ds, schema, l) && cannotMatch(ds, schema, r)
    case StringStartsWith(a, p) if p != null && p.nonEmpty =>
      // rows matching have value >= p; prune when max < p
      withCanon(ds, schema, a, p) { (cs, pv) =>
        cs.max.exists(hi => DirStats.lt(hi, pv))
      }
    case _ => false // Not, StringContains, unknown: never prune
  }

  /** True only when stats prove EVERY row in the dir satisfies f — the
    * dual of [[cannotMatch]], used by the metadata-only DELETE: a dir
    * fully covered by the predicate drops from the manifest with zero
    * data I/O. Sound only under a COMPLETE conjunction (the caller
    * guarantees no conjunct was dropped in translation). Nulls make a
    * comparison predicate non-true, so every comparison case also
    * requires a proven zero null count; float/double comparisons never
    * qualify (footer bounds may hide NaN). */
  private[core] def mustMatch(ds: DirStats, schema: StructType, f: Filter): Boolean = {
    def noNulls(a: String): Boolean = colStats(ds, a).flatMap(_.nulls).contains(0L)
    f match {
      case EqualTo(a, v) => noNulls(a) && !isFp(schema, a) &&
        withCanon(ds, schema, a, v) { (cs, cv) =>
          cs.min.contains(cv) && cs.max.contains(cv)
        }
      case GreaterThan(a, v) => noNulls(a) && !isFp(schema, a) &&
        withCanon(ds, schema, a, v) { (cs, cv) =>
          cs.min.exists(lo => DirStats.lt(cv, lo)) // lo > v
        }
      case GreaterThanOrEqual(a, v) => noNulls(a) && !isFp(schema, a) &&
        withCanon(ds, schema, a, v) { (cs, cv) =>
          cs.min.exists(lo => !DirStats.lt(lo, cv)) // lo >= v
        }
      case LessThan(a, v) => noNulls(a) && !isFp(schema, a) &&
        withCanon(ds, schema, a, v) { (cs, cv) =>
          cs.max.exists(hi => DirStats.lt(hi, cv)) // hi < v
        }
      case LessThanOrEqual(a, v) => noNulls(a) && !isFp(schema, a) &&
        withCanon(ds, schema, a, v) { (cs, cv) =>
          cs.max.exists(hi => !DirStats.lt(cv, hi)) // hi <= v
        }
      case IsNull(a) => colStats(ds, a).flatMap(_.nulls).contains(ds.rows)
      case IsNotNull(a) => noNulls(a)
      case In(a, vs) => noNulls(a) && !isFp(schema, a) &&
        vs != null && vs.nonEmpty &&
        withCanon(ds, schema, a, vs.head) { (cs, _) =>
          // single-valued dir whose value is in the list
          cs.min.isDefined && cs.min == cs.max &&
            vs.exists(v => canonValue(v, fieldType(schema, a).get) == cs.min)
        }
      case And(l, r) => mustMatch(ds, schema, l) && mustMatch(ds, schema, r)
      case Or(l, r) => mustMatch(ds, schema, l) || mustMatch(ds, schema, r)
      case _ => false
    }
  }

  private def colStats(ds: DirStats, name: String): Option[ColStats] =
    ds.cols.get(name).orElse {
      // scan columns are resolved case-insensitively; stats keys carry
      // the schema's case
      ds.cols.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v }
    }

  /** v strictly outside [min,max] — null filter values never prune
    * (EqualTo(a, null) matches nothing, but Spark shouldn't push it and
    * pruning on it would be pointless); NaN never prunes. */
  private def outsideBounds(ds: DirStats, schema: StructType, a: String, v: Any): Boolean =
    withCanon(ds, schema, a, v) { (cs, cv) =>
      cs.min.exists(lo => DirStats.lt(cv, lo)) ||
        cs.max.exists(hi => DirStats.lt(hi, cv))
    }

  private def isFp(schema: StructType, a: String): Boolean =
    fieldType(schema, a).exists(t => t == DoubleType || t == FloatType)

  private def fieldType(schema: StructType, a: String): Option[DataType] =
    schema.fields.collectFirst { case f if f.name.equalsIgnoreCase(a) => f.dataType }

  private def withCanon(ds: DirStats, schema: StructType, a: String, v: Any)(
      f: (ColStats, Any) => Boolean): Boolean =
    (colStats(ds, a), fieldType(schema, a).flatMap(canonValue(v, _))) match {
      case (Some(cs), Some(cv)) => f(cs, cv)
      case _ => false
    }

  /** Filter literal -> the manifest's canonical primitive for the
    * column type; None (never prune) for combinations we don't trust. */
  private[core] def canonValue(v: Any, dt: DataType): Option[Any] = (dt, v) match {
    case (_, null) => None
    case (LongType, x: Long) => Some(x)
    case (LongType, x: Int) => Some(x.toLong)
    case (IntegerType, x: Int) => Some(x)
    case (IntegerType, x: Long) if x.isValidInt => Some(x.toInt)
    case (DoubleType, x: Double) => if (x.isNaN) None else Some(x)
    case (FloatType, x: Float) => if (x.isNaN) None else Some(x)
    case (BooleanType, x: Boolean) => Some(x)
    case (StringType, x: String) => Some(x)
    case (StringType, x: org.apache.spark.unsafe.types.UTF8String) => Some(x.toString)
    case (DateType, x: java.sql.Date) =>
      Some(org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaDate(x))
    case (DateType, x: java.time.LocalDate) =>
      Some(org.apache.spark.sql.catalyst.util.DateTimeUtils.localDateToDays(x))
    // catalyst-internal literal forms (from CatalystFilters.translate):
    // dates are days-since-epoch Int, timestamps micros-since-epoch Long
    // — already the manifest's canonical primitives
    case (DateType, x: Int) => Some(x)
    case (TimestampType, x: java.sql.Timestamp) =>
      Some(org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaTimestamp(x))
    case (TimestampType, x: java.time.Instant) =>
      Some(org.apache.spark.sql.catalyst.util.DateTimeUtils.instantToMicros(x))
    case (TimestampType, x: Long) => Some(x)
    // TIMESTAMP_NTZ literals arrive as LocalDateTime from the v2 filter
    // API and as Long micros from catalyst Literals — both canonicalize
    // to the manifest's micros representation
    case (TimestampNTZType, x: java.time.LocalDateTime) =>
      Some(org.apache.spark.sql.catalyst.util.DateTimeUtils.localDateTimeToMicros(x))
    case (TimestampNTZType, x: Long) => Some(x)
    // decimal literal -> exact unscaled long at the column's scale;
    // a value that doesn't fit the scale exactly never prunes
    case (d: DecimalType, x) =>
      val jbd = x match {
        case b: java.math.BigDecimal => Some(b)
        case b: scala.math.BigDecimal => Some(b.bigDecimal)
        case b: org.apache.spark.sql.types.Decimal => Some(b.toJavaBigDecimal)
        case _ => None
      }
      jbd.flatMap { b =>
        try Some(b.setScale(d.scale).unscaledValue().longValueExact())
        catch { case _: ArithmeticException => None }
      }
    case _ => None
  }
}

/** Resolved Catalyst predicate -> v1 [[Filter]], for feeding a
  * library-path UPDATE/DELETE condition into [[StatsPruning]]. The
  * produced filters carry catalyst-INTERNAL literal values (UTF8String,
  * Int days, Long micros) — [[StatsPruning.canonValue]] normalizes both
  * internal and external forms, but these filters must NOT be handed to
  * consumers expecting external types (parquet-mr pushdown etc.).
  * Untranslatable shapes return None: the caller simply prunes less. */
object CatalystFilters {
  import org.apache.spark.sql.catalyst.expressions.{
    Attribute, EqualNullSafe => CEqNS, EqualTo => CEq, Expression,
    GreaterThan => CGt, GreaterThanOrEqual => CGtEq, In => CIn, InSet,
    IsNotNull => CIsNotNull, IsNull => CIsNull, LessThan => CLt,
    LessThanOrEqual => CLtEq, Literal, Not => CNot, StartsWith,
    And => CAnd, Or => COr}

  def translate(e: Expression): Option[Filter] = e match {
    case CEq(a: Attribute, Literal(v, _)) => Some(EqualTo(a.name, v))
    case CEq(Literal(v, _), a: Attribute) => Some(EqualTo(a.name, v))
    case CEqNS(a: Attribute, Literal(v, _)) => Some(EqualNullSafe(a.name, v))
    case CEqNS(Literal(v, _), a: Attribute) => Some(EqualNullSafe(a.name, v))
    case CGt(a: Attribute, Literal(v, _)) => Some(GreaterThan(a.name, v))
    case CGt(Literal(v, _), a: Attribute) => Some(LessThan(a.name, v))
    case CGtEq(a: Attribute, Literal(v, _)) => Some(GreaterThanOrEqual(a.name, v))
    case CGtEq(Literal(v, _), a: Attribute) => Some(LessThanOrEqual(a.name, v))
    case CLt(a: Attribute, Literal(v, _)) => Some(LessThan(a.name, v))
    case CLt(Literal(v, _), a: Attribute) => Some(GreaterThan(a.name, v))
    case CLtEq(a: Attribute, Literal(v, _)) => Some(LessThanOrEqual(a.name, v))
    case CLtEq(Literal(v, _), a: Attribute) => Some(GreaterThanOrEqual(a.name, v))
    case CIsNull(a: Attribute) => Some(IsNull(a.name))
    case CIsNotNull(a: Attribute) => Some(IsNotNull(a.name))
    case a: Attribute if a.dataType == BooleanType => Some(EqualTo(a.name, true))
    case CNot(a: Attribute) if a.dataType == BooleanType => Some(EqualTo(a.name, false))
    case CIn(a: Attribute, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
      Some(In(a.name, vs.map(_.asInstanceOf[Literal].value).toArray))
    case InSet(a: Attribute, vs) if vs.nonEmpty => Some(In(a.name, vs.toArray))
    case StartsWith(a: Attribute, Literal(v, _)) if v != null =>
      Some(StringStartsWith(a.name, v.toString))
    case CAnd(l, r) =>
      // EXACT or nothing. Top-level conjunctions are split by the caller
      // before translation, so an And reaching here is NESTED (under
      // Or/Not) — and a partially-translated nested And is a WEAKER
      // filter that the completeness flag in conditionFiltersComplete
      // cannot see: `(a AND udf(x)) OR b` would translate to the weaker
      // `a OR b`, be reported complete, and let the metadata-only DELETE
      // drop a whole dir whose rows satisfy `a OR b` but not the real
      // condition — permanent data loss. Refusing costs only pruning
      // strength on that conjunct.
      for (lf <- translate(l); rf <- translate(r)) yield And(lf, rf)
    case COr(l, r) =>
      for (lf <- translate(l); rf <- translate(r)) yield Or(lf, rf)
    case CNot(x) => translate(x).map(Not) // StatsPruning never prunes Not
    case _ => None
  }
}
