package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry exercises one operator from SURVEY.md §2 against
  * the driver-provided testdata tables; `oracleSql` carries the DuckDB
  * equivalent. Column names are aliased identically on both sides because
  * the driver's compare sorts columns by name before hashing.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full medallion chain: defect-planted input -> 3-tier validation
    * -> W1/W2 dedup -> star join with broadcast dims + derived measures. */
  def entry(spark: SparkSession): DataFrame =
    queries("job_fact_star")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.registry

  def oracleSql: Map[String, String] =
    Queries.oracles
}
