package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators (reference W1/W2).
  *
  *  - W1 exact-duplicate drop: bronze/jobs/validate_bronze.py:161-168
  *    (ROW_NUMBER PARTITION BY (transaction_id, updated_at) ... = 1)
  *  - W2 latest-version dedup: silver/jobs/validate_silver.py:119-129
  *    (ROW_NUMBER PARTITION BY transaction_id ORDER BY updated_at DESC)
  */
object Dedup {

  /** W1: drop exact duplicates on the composite key. `dropDuplicates` is
    * the Catalyst-native form of ROW_NUMBER()=1 over identical rows —
    * plans as a hash aggregate with map-side partial combine, which beats
    * a window (shuffle + per-partition sort) at scale. */
  def exact(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)

  /** W2: keep the latest version per key (ORDER BY orderCol DESC,
    * tieBreak ASC). Window form — single shuffle on keys + sort; the
    * reference's exact shape. Skewed hot keys are the scale risk;
    * prefer [[latestVersionAgg]] when the ordering tuple can be packed
    * into a struct. */
  def latestVersion(df: DataFrame, keys: Seq[String],
                    orderCol: String, tieBreak: Seq[Column] = Seq.empty): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(orderCol).desc +: tieBreak: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** W2 scale path: hash-aggregate max_by(row, orderingStruct) — partial
    * aggregation on the map side means hot keys never concentrate whole
    * groups on one task the way a window sort does. `ordering` must be a
    * struct whose lexicographic MAX picks the winner (e.g.
    * struct(updated_at, -id) for "latest, then smallest id"). */
  def latestVersionAgg(df: DataFrame, keys: Seq[String], ordering: Column): DataFrame = {
    val dataCols = df.columns.filterNot(keys.contains)
    val packed = df.groupBy(keys.map(col): _*)
      .agg(max_by(struct(dataCols.map(col): _*), ordering).as("__row"))
    packed.select(keys.map(col) ++ dataCols.map(c => col(s"__row.$c").as(c)): _*)
  }
}
