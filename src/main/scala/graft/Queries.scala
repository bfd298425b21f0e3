package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Operator-inventory queries (SURVEY.md §2) + their DuckDB oracles.
  *
  * Conventions that keep the driver's hash-compare deterministic:
  *  - every computed column is aliased identically in Spark and SQL;
  *  - double aggregates that sum many values are rounded on both sides
  *    (floating-point reassociation across partitions would otherwise
  *    make the hash flap);
  *  - every query has a total ordering in its semantics OR is a set
  *    the driver sorts; ties are broken by a unique key.
  */
object Queries {

  type Q = (SparkSession, String) => DataFrame

  /** registry of name -> query; populated by the sections below. */
  def registry: Map[String, Q] = base

  def oracles: Map[String, String] = baseSql

  // A1/A2-style aggregation over lineitem (TPC-H Q1 shape): hash
  // aggregation with partial+final combine; group keys keep the result
  // small so at 100 TB this is a map-side-combine-dominated scan.
  private val base: Map[String, Q] = Map(
    "q1_agg" -> ((s: SparkSession, dir: String) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          count(lit(1)).as("count_order"))
    })
  )

  private val baseSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus""".stripMargin
  )
}
