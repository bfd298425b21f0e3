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
    * window over <= nPartitions rows). No global data-sized window
    * anywhere, and the result is INDEPENDENT of nPartitions — the
    * prefix sum is a pure function of the id order (CorpusOpsSpec
    * proves 1/4/32-partition equality). */
  def packSequences(df: DataFrame, idCol: String, tokensCol: String,
                    budget: Long, nPartitions: Int = 32): DataFrame = {
    val t = df.select(col(idCol), col(tokensCol).cast("long").as("__n"))
      .repartitionByRange(nPartitions, col(idCol))
      .withColumn("__p", spark_partition_id())
    val wLocal = Window.partitionBy(col("__p")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = t.withColumn("__cum", sum(col("__n")).over(wLocal))
    val wOff = Window.orderBy(col("__p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = t.groupBy(col("__p")).agg(sum(col("__n")).as("__pt"))
      .withColumn("__off", sum(col("__pt")).over(wOff) - col("__pt"))
      .select(col("__p"), col("__off"))
    local.join(broadcast(offsets), Seq("__p"))
      .withColumn("stream_start", col("__off") + col("__cum") - col("__n"))
      .withColumn("bin", floor(col("stream_start") / budget))
      .select(col(idCol), col("__n").as("n_tokens"), col("stream_start"), col("bin"))
  }
}
