package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.TableStore

/** Incremental materialized-view maintenance with retraction: a grouped
  * (count, sum) view absorbs a change-feed backlog without re-reading
  * the source or the unchanged part of the view.
  *
  * Algebra: every feed row carries a sign (+1 for insert /
  * update_postimage, −1 for delete / update_preimage), so the whole
  * backlog — any number of commits — collapses to ONE commutative
  * delta aggregate per group; no per-version loop. New absolutes come
  * from a group-pruned read of the view (broadcast semi-join on the
  * changed groups; the store's stats/bloom pruning drops every dir
  * holding none of them). Maintenance cost is O(changed rows → changed
  * groups), never O(source) or O(view).
  *
  * Exactly-once: the apply is ONE mergeUpsert commit — groups whose
  * count retracts to zero are written as (0, 0) TOMBSTONES rather than
  * deleted in a second commit, so there is no partial-apply window —
  * and the optional `txn` (Delta's txnAppId/txnVersion idempotent-write
  * pattern) makes an at-least-once driver (foreachBatch re-delivery)
  * apply each batch once: the txn stamp rides the same manifest commit
  * as the data. [[readView]] is the consumer face (tombstones
  * filtered); [[compactDead]] sweeps tombstones in a maintenance
  * window. Double-apply without txn protection is caught loudly by the
  * negative-count guard whenever any retracted group goes below zero.
  *
  * The driver-visible faces are `mv1_incremental_agg` (batch) and
  * `st19_stream_materialized_view` (streaming, same body); both oracles
  * prove convergence to a direct re-aggregation of the final state.
  */
object Ivm {

  /** Absorb `feed` (a readChangesBetween frame over the view's source)
    * into `view`, a table with columns (groupCols..., n_rows, sum_qty)
    * where sum_qty sums the feed's `valueCol`. One commit; a no-op on
    * an empty feed. With `txn = Some((appId, version))` the apply is
    * idempotent under re-delivery. Composite `groupCols` serve the
    * auxiliary-state views (mv3's (group, value) multiplicity table). */
  def applyCountSumDelta(st: TableStore, view: String, feed: DataFrame,
                         groupCols: Seq[String], valueCol: String,
                         txn: Option[(String, Long)] = None): Unit = {
    // skip BEFORE computing: a re-delivered batch must not recompute
    // absolutes against the post-apply view (the arithmetic below is
    // only meaningful against the pre-apply state)
    if (txn.exists { case (app, v) => st.lastTxnVersion(view, app).exists(_ >= v) })
      return
    val keys = groupCols.map(col)
    val sgn = when(col("_change_type").isin("insert", "update_postimage"),
      1L).otherwise(-1L)
    val delta = feed
      .groupBy(keys: _*)
      .agg(sum(sgn).as("dn"), sum(sgn * col(valueCol)).as("dsum"))
      .localCheckpoint() // reused: pruned view read, guard, upsert
    if (delta.isEmpty) return
    val old = st.read(view)
      .join(broadcast(delta.select(keys: _*)), groupCols, "left_semi")
    val next = delta.join(old, groupCols, "left_outer")
      .select(keys ++ Seq(
        (coalesce(col("n_rows"), lit(0L)) + col("dn")).as("n_rows"),
        (coalesce(col("sum_qty"), lit(0L)) + col("dsum")).as("sum_qty")): _*)
      .localCheckpoint()
    require(next.filter(col("n_rows") < 0L).isEmpty,
      s"IVM count went negative on $view — the feed overlaps an already-" +
        "applied range (double apply); pass a txn to make applies idempotent")
    st.mergeUpsert(view, next, groupCols, txn = txn)
  }

  /** The consumer face of a maintained view: live groups only. */
  def readView(st: TableStore, view: String): DataFrame =
    st.read(view).filter(col("n_rows") > 0L)

  /** MAX with retraction — the NON-distributive aggregate face of IVM.
    * Inserts/postimages only ever RAISE a group's max, so they absorb
    * by pure algebra (greatest of the stored max and the batch max).
    * A retraction (delete/preimage) whose value REACHES the stored max
    * may or may not lower it (multiplicity: another row may carry the
    * same value), so exactly those groups — and only those — recompute
    * from a VERSION-PINNED read of the source, group-pruned by a
    * broadcast semi-join: O(affected groups' source rows), never the
    * table. Groups that recompute to empty become mx=NULL tombstones
    * ([[readMaxView]] filters them; [[compactDeadMax]] sweeps). One
    * commit; `txn` as in [[applyCountSumDelta]]. `valueCol` must be
    * BIGINT. `srcVersion` must be the version the feed ends at. */
  def applyMaxDelta(st: TableStore, view: String, srcName: String,
                    srcVersion: Long, feed: DataFrame,
                    groupCols: Seq[String], valueCol: String,
                    txn: Option[(String, Long)] = None): Unit =
    applyExtremeDelta(st, view, srcName, srcVersion, feed, groupCols,
      valueCol, txn, maxNotMin = true)

  /** MIN with retraction — [[applyMaxDelta]]'s mirror (lowers absorb by
    * algebra; a retraction reaching the stored min recomputes). */
  def applyMinDelta(st: TableStore, view: String, srcName: String,
                    srcVersion: Long, feed: DataFrame,
                    groupCols: Seq[String], valueCol: String,
                    txn: Option[(String, Long)] = None): Unit =
    applyExtremeDelta(st, view, srcName, srcVersion, feed, groupCols,
      valueCol, txn, maxNotMin = false)

  private def applyExtremeDelta(st: TableStore, view: String, srcName: String,
                                srcVersion: Long, feed: DataFrame,
                                groupCols: Seq[String], valueCol: String,
                                txn: Option[(String, Long)],
                                maxNotMin: Boolean): Unit = {
    if (txn.exists { case (app, v) => st.lastTxnVersion(view, app).exists(_ >= v) })
      return
    def ext(c: org.apache.spark.sql.Column) = if (maxNotMin) max(c) else min(c)
    val keys = groupCols.map(col)
    val isIns = col("_change_type").isin("insert", "update_postimage")
    val touched = feed.groupBy(keys: _*)
      .agg(ext(when(isIns, col(valueCol))).as("mx_ins"),
        ext(when(!isIns, col(valueCol))).as("mx_ret"))
      .localCheckpoint()
    if (touched.isEmpty) return
    val old = st.read(view)
      .join(broadcast(touched.select(keys: _*)), groupCols, "left_semi")
    val merged = touched.join(old, groupCols, "left_outer")
      .localCheckpoint()
    // easy: no retraction, or one that provably stays strictly inside
    // the stored extreme — algebra alone (greatest/least skip NULLs, so
    // a tombstoned or brand-new group takes the batch extreme)
    val reaches = col("mx_ret").isNotNull && (col("mx").isNull ||
      (if (maxNotMin) col("mx_ret") >= col("mx") else col("mx_ret") <= col("mx")))
    val combine =
      if (maxNotMin) greatest(col("mx"), col("mx_ins"))
      else least(col("mx"), col("mx_ins"))
    val easy = merged.filter(!coalesce(reaches, lit(false)))
      .select(keys :+ combine.as("mx"): _*)
    val hard = merged.filter(coalesce(reaches, lit(false))).select(keys: _*)
    // pin the recompute: `dead`'s anti-join references it a second
    // time, and mergeUpsert itself runs a uniqueness-gate pass before
    // the write — without the checkpoint the version-pinned source
    // aggregate would re-execute per consumer (same guard
    // applyCountSumDelta puts on `next`)
    val recomputed = st.readVersion(srcName, srcVersion)
      .join(broadcast(hard), groupCols, "left_semi")
      .groupBy(keys: _*).agg(ext(col(valueCol)).as("mx"))
      .localCheckpoint()
    val dead = hard.join(recomputed.select(keys: _*), groupCols, "left_anti")
      .select(keys :+ lit(null).cast("long").as("mx"): _*)
    st.mergeUpsert(view, easy.unionByName(recomputed).unionByName(dead)
      .localCheckpoint(), groupCols, txn = txn)
  }

  /** The consumer face of a maintained max view: live groups only. */
  def readMaxView(st: TableStore, view: String): DataFrame =
    st.read(view).filter(col("mx").isNotNull)

  /** Sweep max-view tombstones (mx NULL); same maintenance-window
    * discipline as [[compactDead]]. */
  def compactDeadMax(st: TableStore, view: String, groupCol: String): Unit = {
    val dead = st.read(view).filter(col("mx").isNull)
      .select(col(groupCol)).localCheckpoint()
    if (!dead.isEmpty) st.mergeDelete(view, dead, Seq(groupCol))
  }

  /** Sweep retraction tombstones (n_rows = 0). Run in a maintenance
    * window — racing a concurrent apply could delete a group the apply
    * is resurrecting (same discipline as vacuum vs. writers). */
  def compactDead(st: TableStore, view: String, groupCol: String): Unit = {
    val dead = st.read(view).filter(col("n_rows") === 0L)
      .select(col(groupCol)).localCheckpoint()
    if (!dead.isEmpty) st.mergeDelete(view, dead, Seq(groupCol))
  }
}
