package graft.jobs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.TableStore
import graft.ops.{DateSpine, Dedup, SurrogateKeys, Validation}

/** The reference's composite pipeline jobs (SURVEY §2.11) as Scala
  * function composition over the ops layer — validate_bronze,
  * load_bronze, validate/load_silver, GDPR mark+propagate, dims, fact.
  * Airflow orchestration collapses to plain function calls; table
  * mutation goes through [[graft.core.TableStore]].
  *
  * All transforms are pure Column logic (whole-stage codegen, no UDFs),
  * the validation split reuses one predicate for both branches
  * (bronze/jobs/validate_bronze.py:100-104,163-167), and dims are
  * broadcast into the fact join (docs/Gold_Layer_Developer_Guide.md:
  * 388-398). The clock is injected via [[PaymentData.Now]].
  */
object PaymentJobs {

  private val now = lit(PaymentData.Now).cast("timestamp_ntz")

  /** Tier-1 fatal rules (docs/VALIDATION_RULES.md:17-35); order matters —
    * classify() reports the FIRST failing rule. */
  val tier1Rules: Seq[Validation.Rule] = Seq(
    Validation.Rule("NULL_TRANSACTION_ID", col("transaction_id").isNull),
    Validation.Rule("INVALID_FORMAT", col("transaction_id").like("% %")),
    Validation.Rule("NULL_AMOUNT", col("amount").isNull),
    Validation.Rule("NULL_TIMESTAMP", col("transaction_timestamp").isNull),
    Validation.Rule("FUTURE_TIMESTAMP", col("transaction_timestamp") > now))

  /** Tier-2 suspect rules (loaded but flagged). */
  val tier2Rules: Seq[Validation.Rule] = Seq(
    Validation.Rule("NEGATIVE_AMOUNT", col("amount") < 0),
    Validation.Rule("EXCESSIVE_CASHBACK", col("cashback_amount") > col("amount")))

  /** Tier-3 fixable nulls (docs/VALIDATION_RULES.md:64-79). */
  val tier3Defaults: Map[String, String] = Map(
    "merchant_name" -> "UNKNOWN_MERCHANT",
    "product_name" -> "NOT_AVAILABLE",
    "device_type" -> "UNKNOWN",
    "location_type" -> "NOT_AVAILABLE")

  /** validate_bronze quarantine branch: Tier-1 rows + classification
    * (bronze/jobs/validate_bronze.py:65-105). */
  def bronzeQuarantine(txns: DataFrame): DataFrame =
    txns.filter(Validation.anyFail(tier1Rules))
      .select(col("transaction_id"), col("customer_id"),
        col("transaction_timestamp"), col("amount"), col("updated_at"),
        Validation.classify(tier1Rules).as("error_reason"),
        lit("TIER_1").as("error_tier"))

  /** validate_bronze staging branch: ¬Tier-1 → Tier-3 defaults → Tier-2
    * flags → W1 exact dedup (bronze/jobs/validate_bronze.py:114-181). */
  def bronzeStaging(txns: DataFrame): DataFrame = {
    val clean = txns.filter(!Validation.anyFail(tier1Rules))
    val fixed = Validation.applyDefaults(clean, tier3Defaults)
      .withColumn("data_quality_flag", Validation.qualityFlag(tier2Rules))
      .withColumn("validation_errors", Validation.errorList(tier2Rules))
    Dedup.exact(fixed, Seq("transaction_id", "updated_at"))
  }

  /** load_bronze (M1): seed the table with the original versions, then
    * MERGE a CDC batch on the composite key; returns the loaded table.
    * (bronze/jobs/load_bronze.py:66-109 — matched→UPDATE all cols,
    * not-matched→INSERT, both stamped delta_change_type='MERGE') */
  def bronzeLoad(store: TableStore, staging: DataFrame): DataFrame = {
    val originals = staging.filter(col("updated_at") === col("transaction_timestamp"))
    // hash-bucketed on the merge key prefix: the CDC merge below rewrites
    // only the buckets the batch touches (TableStore prune path)
    store.createBucketed("bronze_transactions",
      originals.withColumn("delta_change_type", lit("LOAD")),
      keys = Seq("transaction_id"), n = 32)
    val cdcBatch = staging
      .filter(expr("CAST(substring(transaction_id, 5, 20) AS BIGINT)") % 50 === 0)
      .withColumn("delta_change_type", lit("ignored"))
    store.mergeUpsert("bronze_transactions", cdcBatch,
      Seq("transaction_id", "updated_at"))
    store.read("bronze_transactions")
  }

  /** validate_silver: documented semantics — drop FAILED_VALIDATION and
    * deleted rows, then W2 latest-version dedup (SURVEY §2.3 semantics
    * note; silver/jobs/validate_silver.py:119-129). Hash-agg max_by form:
    * map-side partial aggregation, no hot-key window sort at scale. */
  def silverFromBronze(bronze: DataFrame): DataFrame = {
    val clean = bronze
      .filter(col("data_quality_flag") =!= "FAILED_VALIDATION")
      .drop("data_quality_flag", "validation_errors", "delta_change_type")
    Dedup.latestVersionAgg(clean, Seq("transaction_id"), struct(col("updated_at")))
  }

  /** GDPR pair (M5 + M3): soft-delete a customer's rows in bronze, then
    * hard-delete those transaction ids from silver
    * (silver/jobs/bronze_mark_deleted_by_customer.py:126-134,
    * silver/jobs/silver_propagate_deletes.py:150-155). */
  def gdprDelete(store: TableStore, customerId: String): DataFrame = {
    store.update("bronze_transactions",
      condition = col("customer_id") === customerId,
      set = Map(
        "is_deleted" -> lit(true),
        "deleted_at" -> now,
        "delta_change_type" -> lit("DELETE")))
    val deletedIds = store.read("bronze_transactions")
      .filter(col("is_deleted")).select("transaction_id")
    store.mergeDelete("silver_transactions", deletedIds, Seq("transaction_id"))
    store.read("silver_transactions")
  }

  /** gold_dim_payment_methods (A4 + W3 + enrichment). */
  def dimPaymentMethod(silver: DataFrame): DataFrame =
    SurrogateKeys.byOrder(
      silver.select("payment_method").distinct(),
      "payment_method_key", Seq(col("payment_method")))
      .withColumn("is_digital",
        col("payment_method").isin("UPI", "Wallet Balance"))
      .select("payment_method_key", "payment_method", "is_digital")

  /** gold_dim_status (A4 + W3 + enrichment). */
  def dimStatus(silver: DataFrame): DataFrame =
    SurrogateKeys.byOrder(
      silver.select("transaction_status").distinct(),
      "status_key", Seq(col("transaction_status")))
      .withColumn("is_final", col("transaction_status") =!= "Pending")
      .select("status_key", "transaction_status", "is_final")

  /** validate_fact_transactions (P10 + J1 + derived measures + the
    * documented -1 unknown-member keys — docs/VALIDATION_RULES.md:
    * 164-182). Dims are broadcast: only the fact scan is large. */
  def factStar(silver: DataFrame, dimPm: DataFrame, dimSt: DataFrame,
               dimDate: DataFrame): DataFrame =
    silver
      .filter(!col("merchant_id").like("MERCH_9%"))
      .join(broadcast(dimPm.select("payment_method", "payment_method_key")),
        Seq("payment_method"), "left")
      .join(broadcast(dimSt.select("transaction_status", "status_key")),
        Seq("transaction_status"), "left")
      .join(broadcast(dimDate.select(col("full_date"), col("date_key"))),
        to_date(col("transaction_timestamp")) === col("full_date"), "left")
      .select(
        col("transaction_id"),
        coalesce(col("payment_method_key"), lit(-1L)).as("payment_method_key"),
        coalesce(col("status_key"), lit(-1L)).as("status_key"),
        coalesce(col("date_key"), lit(-1)).as("date_key"),
        (col("amount") - col("fee_amount") + col("cashback_amount")).as("net_customer_amount"),
        (col("amount") - col("cashback_amount")).as("merchant_net_amount"),
        col("fee_amount").as("gateway_revenue"))

  /** The full bronze→silver→gold chain against a scratch store; returns
    * the fact table (used by the flagship query and PipelineSpec). */
  def runPipeline(store: TableStore, txns: DataFrame): DataFrame = {
    // audit columns added before the load so bronze is written once
    val staging = bronzeStaging(txns)
      .withColumn("is_deleted", lit(false))
      .withColumn("deleted_at", lit(null).cast("timestamp_ntz"))
    val bronze = bronzeLoad(store, staging)
    val silver = silverFromBronze(
      bronze.drop("is_deleted", "deleted_at")).cache()
    store.createBucketed("silver_transactions", silver,
      keys = Seq("transaction_id"), n = 32) // GDPR mergeDelete prunes
    val spark = txns.sparkSession
    factStar(silver, dimPaymentMethod(silver), dimStatus(silver),
      DateSpine.dimDate(spark, "1995-01-01", "2002-12-31"))
  }
}
