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

  /** Reference shape: global ROW_NUMBER — deterministic, but single-
    * partition. Correct choice for dimension tables (10^2..10^6 rows);
    * never use on fact-scale data — [[dense]] is the scale path.
    * The constant partition key is the DELIBERATE single-partition
    * choice made explicit (same plan, but Spark's "No Partition
    * Defined" warning no longer floods the logs for an intended
    * dim-scale sort). */
  def byOrder(df: DataFrame, keyCol: String, orderBy: Seq[Column], base: Long = 0L): DataFrame =
    df.withColumn(keyCol,
      (row_number().over(Window.partitionBy(lit(0)).orderBy(orderBy: _*))
        + lit(base)).cast(LongType))

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
