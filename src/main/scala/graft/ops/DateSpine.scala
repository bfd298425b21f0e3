package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** gold.dim_date built engine-side (reference S4 generates 2,192 VALUES
  * rows driver-side in Python — Gold/dim/gold_dim_date.py:35-64; here it
  * is a single `sequence()` + `explode`, fully distributed and lazy).
  */
object DateSpine {

  /** Date dimension between two ISO dates inclusive, with the reference's
    * 11 columns (docs/SCHEMA_REGISTRY.md:198-247). */
  def dimDate(spark: SparkSession, start: String, end: String): DataFrame = {
    spark.range(1).select(
      explode(sequence(
        to_date(lit(start)), to_date(lit(end)), expr("interval 1 day"))).as("full_date"))
      .select(
        date_format(col("full_date"), "yyyyMMdd").cast("int").as("date_key"),
        col("full_date"),
        year(col("full_date")).as("year"),
        quarter(col("full_date")).as("quarter"),
        month(col("full_date")).as("month"),
        date_format(col("full_date"), "MMMM").as("month_name"),
        dayofmonth(col("full_date")).as("day"),
        dayofweek(col("full_date")).as("day_of_week"),
        date_format(col("full_date"), "EEEE").as("day_name"),
        dayofyear(col("full_date")).as("day_of_year"),
        dayofweek(col("full_date")).isin(1, 7).as("is_weekend"))
  }
}
