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
  * holding none of them), and groups whose count retracts to zero are
  * deleted from the view. Maintenance cost is O(changed rows → changed
  * groups), never O(source) or O(view).
  *
  * The driver-visible face is `mv1_incremental_agg` (QueriesMutation),
  * whose oracle proves the incremental path converges to a direct
  * re-aggregation of the final state.
  */
object Ivm {

  /** Absorb `feed` (a readChangesBetween frame over the view's source)
    * into `view`, a table with columns (groupCol, n_rows, sum_qty)
    * where sum_qty sums the feed's `valueCol`. Commits one upsert and,
    * if any group emptied, one delete. */
  def applyCountSumDelta(st: TableStore, view: String, feed: DataFrame,
                         groupCol: String, valueCol: String): Unit = {
    val sgn = when(col("_change_type").isin("insert", "update_postimage"),
      1L).otherwise(-1L)
    val delta = feed
      .groupBy(col(groupCol))
      .agg(sum(sgn).as("dn"), sum(sgn * col(valueCol)).as("dsum"))
      .localCheckpoint() // reused: pruned view read, upsert, retract
    val old = st.read(view)
      .join(broadcast(delta.select(col(groupCol))), Seq(groupCol), "left_semi")
    val next = delta.join(old, Seq(groupCol), "left_outer")
      .select(col(groupCol),
        (coalesce(col("n_rows"), lit(0L)) + col("dn")).as("n_rows"),
        (coalesce(col("sum_qty"), lit(0L)) + col("dsum")).as("sum_qty"))
      .localCheckpoint()
    st.mergeUpsert(view, next.filter(col("n_rows") > 0L), Seq(groupCol))
    val dead = next.filter(col("n_rows") === 0L).select(col(groupCol))
    if (!dead.isEmpty) st.mergeDelete(view, dead, Seq(groupCol))
  }
}
