package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructField

/** Surrogate-key generation (reference W3:
  * Gold/dim/gold_dim_payment_methods.py:40 — ROW_NUMBER() OVER (ORDER BY
  * bk) + max_existing_key).
  */
object SurrogateKeys {

  /** Reference shape: global ROW_NUMBER over a total order (W3) —
    * re-expressed as a range-partitioned SORT + [[dense]] zipWithIndex,
    * so the numbering is fully parallel at any dim size. The obvious
    * `row_number() OVER (ORDER BY ...)` (even with a constant partition
    * key — Spark 4.1 constant-folds it away) funnels the entire input
    * through ONE task: fine at 10^3 dim rows, a wall at the 10^8-row
    * dims a 100 TB warehouse carries. `df.sort` range-shuffles across
    * the cluster; zipWithIndex preserves the sorted partition order and
    * adds per-partition offsets from one tiny count job, so ids equal
    * the global ROW_NUMBER exactly (ties, as in ROW_NUMBER, are
    * arbitrary-but-unique). */
  def byOrder(df: DataFrame, keyCol: String, orderBy: Seq[Column], base: Long = 0L): DataFrame =
    dense(df.sort(orderBy: _*), keyCol, base)

  /** Scale path (SURVEY §7.4.4): dense ids with NO global sort —
    * zipWithIndex assigns per-partition offsets from a driver-side scan
    * of partition sizes (one tiny job), so a 10^10-row assignment stays
    * fully parallel. Ids are dense but partition-order dependent, which
    * is fine for surrogate keys (only uniqueness + density matter). */
  def dense(df: DataFrame, keyCol: String, base: Long = 0L): DataFrame = {
    val schema = df.schema
    val indexed = df.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ (i + 1 + base))
    }
    val spark = df.sparkSession
    spark.createDataFrame(indexed,
      org.apache.spark.sql.types.StructType(schema.fields :+ StructField(keyCol, LongType, nullable = false)))
  }
}
