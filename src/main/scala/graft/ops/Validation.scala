package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's 3-tier validation engine as reusable Column builders
  * (docs/VALIDATION_RULES.md; bronze/jobs/validate_bronze.py:65-181).
  *
  * Tier 1 (P4/P5): fatal rows -> quarantine with an error_reason.
  * Tier 2 (P6):    suspect rows -> loaded, flagged FAILED_VALIDATION with
  *                 a ';'-joined validation_errors list.
  * Tier 3 (P7):    fixable nulls -> COALESCE defaults.
  * P8:             late-arrival derivation from a watermark.
  *
  * All pure Column expressions: they stay inside whole-stage codegen and
  * are evaluated once per row in the scan stage — no UDFs, no extra
  * shuffles, identical cost at 100 TB per-row.
  */
object Validation {

  /** A named validation rule; `failCond` is true when the rule FAILS. */
  final case class Rule(name: String, failCond: Column)

  /** P4: true when any tier-1 rule fails (quarantine predicate). */
  def anyFail(rules: Seq[Rule]): Column =
    rules.map(r => coalesce(r.failCond, lit(false))).reduce(_ || _)

  /** P5: first failing rule's name (CASE chain), null when clean. */
  def classify(rules: Seq[Rule]): Column =
    rules.foldRight(lit(null).cast("string")) { (r, acc) =>
      when(coalesce(r.failCond, lit(false)), lit(r.name)).otherwise(acc)
    }

  /** P6: ';'-joined list of ALL failing rule names ('' when clean). */
  def errorList(rules: Seq[Rule]): Column =
    concat_ws(";", rules.map(r =>
      when(coalesce(r.failCond, lit(false)), lit(r.name))): _*)

  /** P6: FAILED_VALIDATION / PASSED flag. */
  def qualityFlag(rules: Seq[Rule]): Column =
    when(anyFail(rules), lit("FAILED_VALIDATION")).otherwise(lit("PASSED"))

  /** P7: tier-3 defaults — COALESCE(col, default) per entry. */
  def applyDefaults(df: DataFrame, defaults: Map[String, String]): DataFrame =
    defaults.foldLeft(df) { case (d, (c, dflt)) =>
      d.withColumn(c, coalesce(col(c), lit(dflt)))
    }

  /** P8: is_late_arrival = event_ts < watermark && updated_at > watermark
    * (bronze/jobs/validate_bronze.py:57-63). */
  def isLateArrival(eventTs: Column, updatedAt: Column, watermark: Column): Column =
    coalesce(eventTs < watermark && updatedAt > watermark, lit(false))

  /** P8: arrival delay in whole hours via unix_timestamp arithmetic
    * (bronze/jobs/validate_bronze.py:139-148). */
  def arrivalDelayHours(eventTs: Column, updatedAt: Column): Column =
    ((unix_timestamp(updatedAt) - unix_timestamp(eventTs)) / 3600).cast("int")

  /** P2: watermark incremental predicate — new rows OR late updates
    * (bronze/jobs/validate_bronze.py:44). Pushed to the parquet scan by
    * Catalyst, so an incremental run only decodes matching row groups.
    *
    * Null semantics are the REFERENCE's, kept verbatim: with a null
    * `eventTs` the whole predicate is NULL and the row is dropped at
    * the scan — it never reaches tier-1 quarantine on an incremental
    * run. (The logically-equal `eventTs > w || updatedAt > w` would
    * keep such rows; the reference's SQL uses the two-conjunct form,
    * so ours must too or incremental counts diverge from it.) */
  def watermarkPredicate(eventTs: Column, updatedAt: Column, wm: Option[Column]): Column =
    wm.map(w => eventTs > w || (eventTs <= w && updatedAt > w)).getOrElse(lit(true))
}
