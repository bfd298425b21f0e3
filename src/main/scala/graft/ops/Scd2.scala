package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic SCD Type 2 step (reference Gold/dim/gold_dim_customer_scd2.py
  * and gold_dim_merchant_scd2.py): given the current dimension state and
  * a fresh snapshot of business attributes, produce the next dimension
  * state —
  *   1. NEW business keys      -> insert, is_current=true       (J3 anti-join)
  *   2. CHANGED tracked attrs  -> close old version (M4), insert new (J2)
  *   3. unchanged              -> carried through untouched
  *
  * The clock is injected (SURVEY §7.4.2) so tests and oracles are
  * deterministic; the reference hardcodes CURRENT_DATE().
  *
  * Scale: two equi-joins on the business key (broadcast when the dim is
  * small) + one union; surrogate keys for inserted rows use the
  * reference's global ROW_NUMBER, acceptable because dimensions are
  * small by definition — use SurrogateKeys.dense for degenerate
  * fact-sized "dimensions".
  */
object Scd2 {

  /** `closeGuard` is AND-ed into the close condition — the reference's
    * `AND target.effective_start_date < CURRENT_DATE()`
    * (gold_dim_merchant_scd2.py:206-216): a version inserted TODAY is
    * not closed on a same-day re-run (the new version still inserts;
    * the guard only suppresses the close). */
  final case class Config(
      businessKey: String,
      surrogateKey: String,
      trackedCols: Seq[String],
      effectiveStart: String = "effective_start_date",
      effectiveEnd: String = "effective_end_date",
      isCurrent: String = "is_current",
      closeGuard: Column = lit(true))

  /** One SCD2 maintenance step. `dim` must carry businessKey,
    * surrogateKey, tracked+carried attribute cols, effective dates and
    * is_current; `snapshot` carries businessKey + the same attribute
    * cols. Returns the full next dim state. */
  def step(dim: DataFrame, snapshot: DataFrame, cfg: Config, today: Column): DataFrame = {
    val bk = cfg.businessKey
    val attrCols = snapshot.columns.filterNot(_ == bk).toSeq
    val current = dim.filter(col(cfg.isCurrent))

    // J3: business keys with no CURRENT version — brand-new keys AND
    // re-opened ones (a key whose current row was closed externally,
    // e.g. a GDPR delete flow, then reappears in a snapshot). Anti-join
    // against the full dim would silently drop re-opened keys forever:
    // not "new" (old closed versions exist) and not "changed" (the
    // change join scans current rows only). On dims maintained solely
    // by this step the two formulations agree — closes always ship
    // with a replacement insert.
    val newRows = snapshot.join(current.select(bk).distinct(), Seq(bk), "left_anti")

    // J2: existing current rows whose tracked attributes changed
    val snapTracked = snapshot.select((bk +: attrCols).map(c => col(c).as(s"__n_$c")): _*)
    val changedJoin = current.join(snapTracked, col(bk) === col(s"__n_$bk"), "inner")
      .filter(cfg.trackedCols.map(c => !(col(c) <=> col(s"__n_$c"))).reduce(_ || _))
    val changedKeys = changedJoin.select(col(bk)).distinct()
    val changedNew = changedJoin.select(col(bk) +: attrCols.map(c => col(s"__n_$c").as(c)): _*)

    // M4: close the superseded current versions (guard suppresses the
    // close for rows the reference's MERGE condition would not match)
    val hit = coalesce(col("__chg"), lit(false)) && col(cfg.isCurrent) && cfg.closeGuard
    val closed = dim
      .join(changedKeys.withColumn("__chg", lit(true)), Seq(bk), "left_outer")
      .withColumn(cfg.effectiveEnd, when(hit, today).otherwise(col(cfg.effectiveEnd)))
      .withColumn(cfg.isCurrent, when(hit, lit(false)).otherwise(col(cfg.isCurrent)))
      .drop("__chg")

    // W3: surrogate keys for all inserted rows, offset past the max key
    val maxKey = dim.agg(coalesce(max(col(cfg.surrogateKey)), lit(0L))).head().getLong(0)
    val inserts = SurrogateKeys.byOrder(
        newRows.unionByName(changedNew), cfg.surrogateKey, Seq(col(bk)), maxKey)
      .withColumn(cfg.effectiveStart, today)
      .withColumn(cfg.effectiveEnd, lit(null).cast("date"))
      .withColumn(cfg.isCurrent, lit(true))

    closed.unionByName(inserts.select(closed.columns.map(col): _*))
  }
}
