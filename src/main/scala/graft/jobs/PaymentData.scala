package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deterministic reference-shaped payment-transaction input, derived
  * from the driver testdata `orders` table with planted defects at the
  * reference generator's defect classes (FIXTURES.md §A: Tier-1 fatal,
  * Tier-2 suspect, Tier-3 fixable-null, CDC update versions, intra-batch
  * exact duplicates).
  *
  * Dual-implemented: [[transactions]] builds the Spark DataFrame; [[Sql]]
  * is the equivalent DuckDB CTE used by the job-level oracles. Defects
  * are keyed off `o_orderkey` residues so both sides are pure functions
  * of the same input:
  *   - k%101==7  -> NULL transaction_id          (Tier-1 NULL_TRANSACTION_ID)
  *   - k%101==13 -> id with embedded space       (Tier-1 INVALID_FORMAT)
  *   - k%101==29 -> future timestamp (2030)      (Tier-1 FUTURE_TIMESTAMP)
  *   - k%101==43 -> NULL timestamp               (Tier-1 NULL_TIMESTAMP)
  *   - k%101==41 -> NULL amount                  (Tier-1 NULL_AMOUNT)
  *   - k%101==37 -> negative amount              (Tier-2 NEGATIVE_AMOUNT)
  *   - k%97==5/11/23/31 -> NULL merchant_name / product_name /
  *     device_type / location_type               (Tier-3 defaults)
  *   - k%50==0 (and not Tier-1) -> a second CDC version 2 days later,
  *     status Failed, merchant renamed " Pvt Ltd" (drives SCD2)
  *   - k%70==0 -> exact duplicate row            (W1 dedup target)
  */
object PaymentData {

  /** Injected clock (SURVEY §7.4.2): the reference's CURRENT_TIMESTAMP
    * in validation predicates, pinned for determinism. */
  val Now = "2026-08-12 00:00:00"

  def transactions(s: SparkSession, dir: String): DataFrame =
    transactionsFrom(Tables.orders(s, dir))

  /** Same planted-defect generator over an arbitrary orders-shaped
    * frame (o_orderkey, o_custkey, o_orderdate, o_totalprice) — lets
    * the scaling probes feed k-times-replicated orders through the
    * EXACT generator the benched jobs consume. */
  def transactionsFrom(o: DataFrame): DataFrame = {
    val k = col("o_orderkey")
    val mid = k % 520
    val base = o.select(
      when(k % 101 === 7, lit(null).cast("string"))
        .when(k % 101 === 13, concat(lit("TXN "), k.cast("string")))
        .otherwise(concat(lit("TXN_"), k.cast("string"))).as("transaction_id"),
      concat(lit("USER_"), lpad((col("o_custkey") % 1000).cast("string"), 4, "0")).as("customer_id"),
      when(k % 101 === 29, lit("2030-01-01 00:00:00").cast("timestamp_ntz"))
        .when(k % 101 === 43, lit(null).cast("timestamp_ntz"))
        .otherwise(col("o_orderdate")).as("transaction_timestamp"),
      when(mid >= 500, concat(lit("MERCH_9"), lpad((mid - 500).cast("string"), 3, "0")))
        .otherwise(concat(lit("MERCH_"), lpad(mid.cast("string"), 4, "0"))).as("merchant_id"),
      when(k % 97 === 5, lit(null).cast("string"))
        .otherwise(concat(lit("Merchant_"), mid.cast("string"))).as("merchant_name"),
      when(k % 3 === 0, "electronics").when(k % 3 === 1, "grocery")
        .otherwise("travel").as("product_category"),
      when(k % 97 === 11, lit(null).cast("string"))
        .otherwise(concat(lit("Product_"), (k % 50).cast("string"))).as("product_name"),
      when(k % 101 === 41, lit(null).cast("double"))
        .when(k % 101 === 37, -col("o_totalprice"))
        .otherwise(col("o_totalprice")).as("amount"),
      (col("o_totalprice") * 0.02).as("fee_amount"),
      when(k % 100 < 95, col("o_totalprice") * 0.01).otherwise(lit(0.0)).as("cashback_amount"),
      floor(col("o_totalprice") / 15).cast("int").as("loyalty_points"),
      when(k % 20 < 12, "UPI").when(k % 20 < 15, "Credit Card")
        .when(k % 20 < 18, "Debit Card").when(k % 20 < 19, "Wallet Balance")
        .otherwise("Bank Transfer").as("payment_method"),
      when(k % 100 < 95, "Successful").when(k % 100 < 99, "Failed")
        .otherwise("Pending").as("transaction_status"),
      when(k % 97 === 23, lit(null).cast("string"))
        .when(k % 10 < 6, "Android").when(k % 10 < 9, "iOS")
        .otherwise("Web").as("device_type"),
      when(k % 97 === 31, lit(null).cast("string"))
        .when(k % 10 < 7, "Urban").when(k % 10 < 9, "Suburban")
        .otherwise("Rural").as("location_type"),
      lit("INR").as("currency"),
      col("o_orderdate").as("updated_at"),
      k.as("__k"))
    // CDC version 2 (status update + merchant rename) for k%50==0 rows
    // that aren't Tier-1 defective
    val v2 = base
      .filter(col("__k") % 50 === 0 &&
        !(col("__k") % 101).isin(7, 13, 29, 41, 43))
      .withColumn("updated_at", col("updated_at") + expr("INTERVAL 2 DAYS"))
      .withColumn("transaction_status", lit("Failed"))
      .withColumn("merchant_name", concat(col("merchant_name"), lit(" Pvt Ltd")))
    val dups = base.filter(col("__k") % 70 === 0)
    base.unionByName(v2).unionByName(dups).drop("__k")
  }

  /** The same dataset as a DuckDB CTE named `txns` (oracle side). */
  val Sql: String =
    """WITH pb AS (
      |  SELECT o_orderkey AS k, o_orderkey % 520 AS mid,
      |    CASE WHEN o_orderkey % 101 = 7 THEN NULL
      |         WHEN o_orderkey % 101 = 13 THEN 'TXN ' || o_orderkey
      |         ELSE 'TXN_' || o_orderkey END AS transaction_id,
      |    'USER_' || lpad(CAST(o_custkey % 1000 AS VARCHAR), 4, '0') AS customer_id,
      |    CASE WHEN o_orderkey % 101 = 29 THEN TIMESTAMP '2030-01-01 00:00:00'
      |         WHEN o_orderkey % 101 = 43 THEN NULL
      |         ELSE o_orderdate END AS transaction_timestamp,
      |    CASE WHEN o_orderkey % 520 >= 500
      |         THEN 'MERCH_9' || lpad(CAST(o_orderkey % 520 - 500 AS VARCHAR), 3, '0')
      |         ELSE 'MERCH_' || lpad(CAST(o_orderkey % 520 AS VARCHAR), 4, '0') END AS merchant_id,
      |    CASE WHEN o_orderkey % 97 = 5 THEN NULL
      |         ELSE 'Merchant_' || (o_orderkey % 520) END AS merchant_name,
      |    CASE WHEN o_orderkey % 3 = 0 THEN 'electronics'
      |         WHEN o_orderkey % 3 = 1 THEN 'grocery' ELSE 'travel' END AS product_category,
      |    CASE WHEN o_orderkey % 97 = 11 THEN NULL
      |         ELSE 'Product_' || (o_orderkey % 50) END AS product_name,
      |    CASE WHEN o_orderkey % 101 = 41 THEN NULL
      |         WHEN o_orderkey % 101 = 37 THEN -o_totalprice
      |         ELSE o_totalprice END AS amount,
      |    o_totalprice * 0.02 AS fee_amount,
      |    CASE WHEN o_orderkey % 100 < 95 THEN o_totalprice * 0.01 ELSE 0.0 END AS cashback_amount,
      |    CAST(floor(o_totalprice / 15) AS INT) AS loyalty_points,
      |    CASE WHEN o_orderkey % 20 < 12 THEN 'UPI' WHEN o_orderkey % 20 < 15 THEN 'Credit Card'
      |         WHEN o_orderkey % 20 < 18 THEN 'Debit Card' WHEN o_orderkey % 20 < 19 THEN 'Wallet Balance'
      |         ELSE 'Bank Transfer' END AS payment_method,
      |    CASE WHEN o_orderkey % 100 < 95 THEN 'Successful' WHEN o_orderkey % 100 < 99 THEN 'Failed'
      |         ELSE 'Pending' END AS transaction_status,
      |    CASE WHEN o_orderkey % 97 = 23 THEN NULL WHEN o_orderkey % 10 < 6 THEN 'Android'
      |         WHEN o_orderkey % 10 < 9 THEN 'iOS' ELSE 'Web' END AS device_type,
      |    CASE WHEN o_orderkey % 97 = 31 THEN NULL WHEN o_orderkey % 10 < 7 THEN 'Urban'
      |         WHEN o_orderkey % 10 < 9 THEN 'Suburban' ELSE 'Rural' END AS location_type,
      |    'INR' AS currency,
      |    o_orderdate AS updated_at
      |  FROM orders),
      |pv2 AS (
      |  SELECT k, mid, transaction_id, customer_id, transaction_timestamp, merchant_id,
      |    merchant_name || ' Pvt Ltd' AS merchant_name, product_category, product_name,
      |    amount, fee_amount, cashback_amount, loyalty_points, payment_method,
      |    'Failed' AS transaction_status, device_type, location_type, currency,
      |    updated_at + INTERVAL 2 DAY AS updated_at
      |  FROM pb WHERE k % 50 = 0 AND k % 101 NOT IN (7, 13, 29, 41, 43)),
      |txns AS (
      |  SELECT * EXCLUDE (k, mid) FROM pb
      |  UNION ALL SELECT * EXCLUDE (k, mid) FROM pv2
      |  UNION ALL SELECT * EXCLUDE (k, mid) FROM pb WHERE k % 70 = 0)""".stripMargin
}
