package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-construction operators as reusable library surface (the
  * oracle-checked instances are x1/x2/x3 in QueriesCorpus).
  *
  * Determinism is the design center: sampling decisions hash the row's
  * own key (never rand()), and the packing prefix sum depends only on
  * the total order of `idCol` — so re-runs, executor counts, and
  * partitioning choices can never change the output corpus.
  */
object Corpus {

  /** Deterministic inclusion hash: first 8 hex chars of md5(key) —
    * uniform, replayable anywhere md5 exists. */
  def inclusionHash(key: Column): Column =
    substring(md5(key.cast("string")), 1, 8)

  /** Rate-based stratified sampling: keep rows whose hash falls under
    * the group's threshold ("80000000" = 50%, "40000000" = 25%, ...).
    * Pure narrow map+filter — no shuffle, no state. */
  def stratifiedSample(df: DataFrame, key: Column, group: Column,
                       thresholds: Map[String, String],
                       default: String): DataFrame = {
    val thr = thresholds.foldRight(lit(default)) { case ((g, t), acc) =>
      when(group === g, lit(t)).otherwise(acc)
    }
    df.filter(inclusionHash(key) < thr)
  }

  /** Exact per-group quotas: the hash order is a deterministic uniform
    * shuffle, so the first `quota` rows per group in hash order are an
    * exact uniform sample. */
  def quotaSample(df: DataFrame, key: Column, group: Column, quota: Int): DataFrame = {
    val w = Window.partitionBy(group).orderBy(inclusionHash(key).asc, key.asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= quota).drop("__rn")
  }

  /** Concat-and-chunk sequence packing: assign each document the bin of
    * its token-stream start position (`floor(start / budget)`), where
    * the stream concatenates documents in `idCol` order.
    *
    * The running sum is a DISTRIBUTED prefix sum: range-partition on
    * the id, per-partition window, then add per-partition offsets (a
    * driver-side cumsum over <= nPartitions totals). No global
    * data-sized window anywhere, and the result is INDEPENDENT of
    * nPartitions — the prefix sum is a pure function of the id order
    * (CorpusOpsSpec proves 1/4/32-partition equality and 20-run
    * stability under varying AQE/shuffle settings).
    *
    * Determinism: the range exchange samples its boundaries, so
    * `spark_partition_id()` is only meaningful for ONE physical
    * evaluation. We therefore materialize the partition assignment
    * exactly once (`localCheckpoint`) and derive BOTH the per-partition
    * cumsum and the per-partition totals from that same materialized
    * frame; the offsets become a <= nPartitions-entry CASE expression
    * computed on the driver. Two independent evaluations joined on
    * partition id (the round-4 bug) can never disagree again. */
  def packSequences(df: DataFrame, idCol: String, tokensCol: String,
                    budget: Long, nPartitions: Int = 32): DataFrame = {
    val t = df.select(col(idCol), col(tokensCol).cast("long").as("__n"))
      .repartitionByRange(nPartitions, col(idCol))
      .withColumn("__p", spark_partition_id())
      .localCheckpoint() // pin ONE partition assignment for all consumers
    val wLocal = Window.partitionBy(col("__p")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = t.withColumn("__cum", sum(col("__n")).over(wLocal))
    // Per-partition totals from the SAME materialized frame; bounded
    // metadata (<= nPartitions rows), so the exclusive cumsum runs on
    // the driver and the offset lookup is a codegen'd CASE — no
    // single-partition window stage.
    val totals = t.groupBy(col("__p")).agg(sum(col("__n")).as("__pt"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = totals.map { case (p, pt) => val o = acc; acc += pt; (p, o) }
    val offExpr = offsets.foldLeft(lit(0L): Column) { case (e, (p, o)) =>
      when(col("__p") === p, lit(o)).otherwise(e)
    }
    local
      .withColumn("stream_start", offExpr + col("__cum") - col("__n"))
      .withColumn("bin", floor(col("stream_start") / budget))
      .select(col(idCol), col("__n").as("n_tokens"), col("stream_start"), col("bin"))
  }

  /** Seeded deterministic corpus shuffle into ordered shards — the
    * "global shuffle" step before training-data serialization. Each
    * row's shuffle key is md5(id || ':' || seed): a uniform, replayable
    * permutation (same family as [[inclusionHash]] — never rand()).
    * Shard = the key's last hex nibble (16 balanced shards; compose
    * more nibbles for wider fan-out at larger scale), and `shard_pos`
    * orders rows WITHIN their shard by key — a per-shard window, so the
    * sort parallelizes across shards instead of one global ORDER BY.
    * Re-runs, executor counts, and partitioning can never change the
    * output: (shard, shard_pos) is a pure function of (id, seed). */
  def shuffleShards(df: DataFrame, idCol: Column, seed: Long): DataFrame = {
    val sharded = df
      .withColumn("skey", md5(concat(idCol.cast("string"), lit(s":$seed"))))
      .withColumn("shard",
        expr("instr('0123456789abcdef', substring(skey, 32, 1)) - 1").cast("int"))
    val w = Window.partitionBy(col("shard")).orderBy(col("skey"), idCol)
    sharded.withColumn("shard_pos", row_number().over(w).cast("long"))
  }
}
