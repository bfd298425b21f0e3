package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (brief §scale: "salting for skew").
  *
  * AQE's skew-join handling covers sort-merge joins at runtime, but a
  * skewed AGGREGATION still funnels each hot key's rows through one
  * task's hash-map slot, and a skewed broadcast-build is unaffected by
  * AQE. Salting splits each key into `buckets` sub-keys, aggregates
  * partially per sub-key (parallel), then re-aggregates the per-salt
  * partials — the classic two-phase combine, expressed so Catalyst
  * still plans hash aggregates with map-side partial combine at BOTH
  * phases.
  */
object Skew {

  /** DETERMINISTIC salt: xxhash64 over every column (seeded), pmod into
    * `buckets`. A salt built from spark_partition_id / mono_id /
    * rand() is recomputed DIFFERENTLY when a fetch failure re-runs map
    * tasks, and mixed old/new shuffle outputs double-count or drop rows
    * (the SPARK-23207 class) — wrong aggregates beat slow ones in no
    * world. The cost: byte-identical FULL-ROW duplicates of a hot key
    * collapse into one salt bucket, so a corpus that is one identical
    * row repeated a billion times stays skewed — that degenerate shape
    * needs an upstream exact-dedup (d1) anyway, and every realistic hot
    * key varies in SOME other column, which is all the hash needs. */
  private def rowSalt(df: DataFrame, buckets: Int): Column =
    pmod(xxhash64(lit(42L) +: df.columns.map(col): _*), lit(buckets.toLong))

  /** Two-phase salted aggregation: equivalent to
    * `df.groupBy(keys).agg(aggs)` for aggregates with a partial/merge
    * decomposition. `aggs` maps output column name -> (partial aggregate
    * over raw rows, merge aggregate over partials). */
  def saltedAgg(df: DataFrame, keys: Seq[String], buckets: Int)(
      aggs: Map[String, (Column, Column => Column)]): DataFrame = {
    val salted = df.withColumn("__salt", rowSalt(df, buckets))
    val partial = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(aggs.head._2._1.as(s"__p_${aggs.head._1}"),
        aggs.tail.map { case (n, (p, _)) => p.as(s"__p_$n") }.toSeq: _*)
    partial.groupBy(keys.map(col): _*)
      .agg(aggs.head._2._2(col(s"__p_${aggs.head._1}")).as(aggs.head._1),
        aggs.tail.map { case (n, (_, m)) => m(col(s"__p_$n")).as(n) }.toSeq: _*)
  }

  /** Salted equi-join for a skewed LEFT side against a small-ish right
    * side that cannot be broadcast: explode the right side `buckets`
    * times, salt the left deterministically (see [[rowSalt]]), join on
    * (key, salt) — hot keys spread over `buckets` tasks. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 buckets: Int, joinType: String = "inner"): DataFrame = {
    // right/full outer would emit `buckets` null-extended copies of every
    // unmatched right row (it is exploded per salt) — reject upfront
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti")
      .contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left join types, not $joinType")
    val saltedLeft = left.withColumn("__salt", rowSalt(left, buckets))
    val explodedRight = right.withColumn("__salt",
      explode(sequence(lit(0L), lit((buckets - 1).toLong))))
    saltedLeft.join(explodedRight, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
