package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.TableStore
import graft.jobs.{PaymentData, PaymentJobs}
import graft.ops.DateSpine

/** SURVEY §2.11 composite pipeline jobs as oracle-checked queries: each
  * runs a real job composition (through TableStore where the job
  * mutates tables) over the deterministic defect-planted PaymentData
  * input, and the DuckDB oracle re-derives the same end state in one
  * SQL statement over the shared `txns` CTE (PaymentData.Sql).
  */
object QueriesJobs {

  import Queries.{Q, QDef}

  private def freshStore(s: SparkSession, name: String): TableStore = {
    val root = s"/tmp/graft_qstore/$name"
    graft.core.FsUtil.deleteRecursively(new java.io.File(root))
    new TableStore(s, root)
  }

  // ---- shared oracle-SQL fragments (DuckDB dialect) ----

  /** Bronze staging: ¬Tier-1 + Tier-3 defaults + Tier-2 flags + W1
    * dedup (planted duplicates are exact rows -> DISTINCT). */
  private val StagingSql: String =
    s"""${PaymentData.Sql},
       |clean AS (
       |  SELECT DISTINCT transaction_id, customer_id, transaction_timestamp, merchant_id,
       |    coalesce(merchant_name, 'UNKNOWN_MERCHANT') AS merchant_name,
       |    product_category,
       |    coalesce(product_name, 'NOT_AVAILABLE') AS product_name,
       |    amount, fee_amount, cashback_amount, loyalty_points, payment_method,
       |    transaction_status,
       |    coalesce(device_type, 'UNKNOWN') AS device_type,
       |    coalesce(location_type, 'NOT_AVAILABLE') AS location_type,
       |    currency, updated_at,
       |    CASE WHEN amount < 0 OR cashback_amount > amount
       |         THEN 'FAILED_VALIDATION' ELSE 'PASSED' END AS data_quality_flag,
       |    concat_ws(';',
       |      CASE WHEN amount < 0 THEN 'NEGATIVE_AMOUNT' END,
       |      CASE WHEN cashback_amount > amount THEN 'EXCESSIVE_CASHBACK' END) AS validation_errors
       |  FROM txns
       |  WHERE NOT (transaction_id IS NULL OR transaction_id LIKE '% %'
       |         OR amount IS NULL OR transaction_timestamp IS NULL
       |         OR transaction_timestamp > TIMESTAMP '${PaymentData.Now}'))""".stripMargin

  /** Silver: documented flag filter + W2 latest-version per id. */
  private val SilverSql: String =
    s"""$StagingSql,
       |silver AS (
       |  SELECT * EXCLUDE (data_quality_flag, validation_errors, rn) FROM (
       |    SELECT *, row_number() OVER (PARTITION BY transaction_id
       |                                 ORDER BY updated_at DESC) AS rn
       |    FROM clean WHERE data_quality_flag <> 'FAILED_VALIDATION')
       |  WHERE rn = 1)""".stripMargin

  val defs: Map[String, QDef] = Map(

    // ---- validate_bronze: quarantine branch (+ audit metadata cols) ----
    "job_bronze_quarantine" -> QDef(
      (s, dir) => PaymentJobs.bronzeQuarantine(PaymentData.transactions(s, dir)),
      Some(s"""${PaymentData.Sql}
              |SELECT transaction_id, customer_id, transaction_timestamp, amount, updated_at,
              |  CASE WHEN transaction_id IS NULL THEN 'NULL_TRANSACTION_ID'
              |       WHEN transaction_id LIKE '% %' THEN 'INVALID_FORMAT'
              |       WHEN amount IS NULL THEN 'NULL_AMOUNT'
              |       WHEN transaction_timestamp IS NULL THEN 'NULL_TIMESTAMP'
              |       WHEN transaction_timestamp > TIMESTAMP '${PaymentData.Now}' THEN 'FUTURE_TIMESTAMP'
              |  END AS error_reason,
              |  'TIER_1' AS error_tier,
              |  'QUARANTINE' AS delta_change_type,
              |  CAST(NULL AS BIGINT) AS delta_version,
              |  TIMESTAMP '${PaymentData.Now}' AS quarantined_at,
              |  'ingest/payments_batch_0001.csv' AS source_file,
              |  'BATCH_0001' AS processing_batch_id
              |FROM txns
              |WHERE transaction_id IS NULL OR transaction_id LIKE '% %'
              |   OR amount IS NULL OR transaction_timestamp IS NULL
              |   OR transaction_timestamp > TIMESTAMP '${PaymentData.Now}'""".stripMargin)),

    // ---- validate_bronze: staging branch ----
    "job_bronze_staging" -> QDef(
      (s, dir) => PaymentJobs.bronzeStaging(PaymentData.transactions(s, dir)),
      Some(s"$StagingSql\nSELECT * FROM clean")),

    // ---- load_bronze: MERGE a CDC batch on the composite key ----
    "job_bronze_load" -> QDef(
      (s, dir) => {
        val st = freshStore(s, "job_bronze")
        PaymentJobs.bronzeLoad(st,
          PaymentJobs.bronzeStaging(PaymentData.transactions(s, dir)))
      },
      Some(s"""$StagingSql
              |SELECT c.*, CASE WHEN CAST(substr(transaction_id, 5, 20) AS BIGINT) % 50 = 0
              |                 THEN 'MERGE' ELSE 'LOAD' END AS delta_change_type,
              |  CAST(CASE WHEN CAST(substr(transaction_id, 5, 20) AS BIGINT) % 50 = 0
              |            THEN 2 ELSE 1 END AS BIGINT) AS delta_version
              |FROM clean c""".stripMargin)),

    // ---- validate_silver + load_silver: current-state table ----
    "job_silver" -> QDef(
      (s, dir) => PaymentJobs.silverFromBronze(
        PaymentJobs.bronzeStaging(PaymentData.transactions(s, dir))),
      Some(s"$SilverSql\nSELECT * FROM silver")),

    // ---- GDPR pair: soft-delete in bronze, propagate to silver ----
    "job_gdpr_propagate" -> QDef(
      (s, dir) => {
        val st = freshStore(s, "job_gdpr")
        PaymentJobs.runPipeline(st, PaymentData.transactions(s, dir))
        PaymentJobs.gdprDelete(st, "USER_0042")
      },
      Some(s"$SilverSql\nSELECT * FROM silver WHERE customer_id <> 'USER_0042'")),

    // ---- gold dims: distinct + surrogate keys + enrichment ----
    "job_dim_payment_method" -> QDef(
      (s, dir) => PaymentJobs.dimPaymentMethod(PaymentJobs.silverFromBronze(
        PaymentJobs.bronzeStaging(PaymentData.transactions(s, dir)))),
      Some(s"""$SilverSql
              |SELECT CAST(row_number() OVER (ORDER BY payment_method) AS BIGINT) AS payment_method_key,
              |  payment_method,
              |  payment_method IN ('UPI', 'Wallet Balance') AS is_digital
              |FROM (SELECT DISTINCT payment_method FROM silver)""".stripMargin)),

    "job_dim_status" -> QDef(
      (s, dir) => PaymentJobs.dimStatus(PaymentJobs.silverFromBronze(
        PaymentJobs.bronzeStaging(PaymentData.transactions(s, dir)))),
      Some(s"""$SilverSql
              |SELECT CAST(row_number() OVER (ORDER BY transaction_status) AS BIGINT) AS status_key,
              |  transaction_status,
              |  transaction_status <> 'Pending' AS is_final
              |FROM (SELECT DISTINCT transaction_status FROM silver)""".stripMargin)),

    // ---- gold_dim_customer SCD2: A2 aggregate snapshot -> step ----
    // (dim seeded from the pre-CDC state minus the USER_09% band; the
    //  full snapshot then drives all three branches: new keys insert,
    //  changed bands close+reversion, stable rows untouched)
    "job_dim_customer_scd2" -> QDef(
      (s, dir) => {
        def custAgg(df: DataFrame): DataFrame = df
          .groupBy(col("customer_id"))
          .agg(sum(when(col("transaction_status") === "Failed", 1).otherwise(0)).as("n_failed"))
          .withColumn("band",
            when(col("n_failed") === 0, "CLEAN")
              .when(col("n_failed") <= 2, "SOME").otherwise("MANY"))
          .select("customer_id", "band")
        // staging feeds both the dim seed and the snapshot (and Scd2.step
        // re-reads the dim for its max-key lookup): cache the common prefix
        val staging = PaymentJobs.bronzeStaging(PaymentData.transactions(s, dir)).cache()
        val silverAll = PaymentJobs.silverFromBronze(staging)
        val silverPre = PaymentJobs.silverFromBronze(
          staging.filter(col("updated_at") === col("transaction_timestamp")))
        // dim1 and the snapshot are each referenced several times inside
        // Scd2.step (anti-join, change join, close, max-key action):
        // cache both so the silver aggregate chain runs ONCE per side,
        // not once per reference
        val dim1 = graft.ops.SurrogateKeys.byOrder(
            custAgg(silverPre).filter(!col("customer_id").like("USER_09%")),
            "customer_key", Seq(col("customer_id")))
          .withColumn("effective_start_date", to_date(lit("2026-01-01")))
          .withColumn("effective_end_date", lit(null).cast("date"))
          .withColumn("is_current", lit(true))
          .cache()
        graft.ops.Scd2.step(dim1, custAgg(silverAll).cache(),
            graft.ops.Scd2.Config("customer_id", "customer_key", Seq("band")),
            to_date(lit("2026-08-12")))
          .select("customer_id", "customer_key", "band",
            "effective_start_date", "effective_end_date", "is_current")
      },
      Some(s"""$SilverSql,
              |s1 AS (SELECT * FROM clean
              |       WHERE data_quality_flag <> 'FAILED_VALIDATION'
              |         AND updated_at = transaction_timestamp),
              |agg1 AS (SELECT customer_id,
              |    CASE WHEN n_failed = 0 THEN 'CLEAN' WHEN n_failed <= 2 THEN 'SOME'
              |         ELSE 'MANY' END AS band
              |  FROM (SELECT customer_id,
              |          sum(CASE WHEN transaction_status = 'Failed' THEN 1 ELSE 0 END) AS n_failed
              |        FROM s1 GROUP BY customer_id)),
              |agg2 AS (SELECT customer_id,
              |    CASE WHEN n_failed = 0 THEN 'CLEAN' WHEN n_failed <= 2 THEN 'SOME'
              |         ELSE 'MANY' END AS band
              |  FROM (SELECT customer_id,
              |          sum(CASE WHEN transaction_status = 'Failed' THEN 1 ELSE 0 END) AS n_failed
              |        FROM silver GROUP BY customer_id)),
              |dim1 AS (SELECT customer_id, band,
              |    CAST(row_number() OVER (ORDER BY customer_id) AS BIGINT) AS customer_key,
              |    DATE '2026-01-01' AS effective_start_date,
              |    CAST(NULL AS DATE) AS effective_end_date, true AS is_current
              |  FROM agg1 WHERE customer_id NOT LIKE 'USER_09%'),
              |chg AS (SELECT d.customer_id, a.band AS new_band
              |  FROM dim1 d JOIN agg2 a USING (customer_id) WHERE d.band <> a.band),
              |closed AS (SELECT d.customer_id, d.customer_key, d.band, d.effective_start_date,
              |    CASE WHEN c.customer_id IS NOT NULL THEN DATE '2026-08-12'
              |         ELSE d.effective_end_date END AS effective_end_date,
              |    CASE WHEN c.customer_id IS NOT NULL THEN false ELSE d.is_current END AS is_current
              |  FROM dim1 d LEFT JOIN chg c ON d.customer_id = c.customer_id),
              |ins AS (SELECT customer_id, band,
              |    CAST(row_number() OVER (ORDER BY customer_id)
              |         + (SELECT max(customer_key) FROM dim1) AS BIGINT) AS customer_key,
              |    DATE '2026-08-12' AS effective_start_date,
              |    CAST(NULL AS DATE) AS effective_end_date, true AS is_current
              |  FROM (SELECT customer_id, band FROM agg2
              |        WHERE customer_id NOT IN (SELECT customer_id FROM dim1)
              |        UNION ALL SELECT customer_id, new_band FROM chg))
              |SELECT customer_id, customer_key, band, effective_start_date,
              |  effective_end_date, is_current FROM closed
              |UNION ALL
              |SELECT customer_id, customer_key, band, effective_start_date,
              |  effective_end_date, is_current FROM ins""".stripMargin)),

    // ---- fact: star join + derived measures + -1 unknown members ----
    "job_fact_star" -> QDef(
      (s, dir) => {
        // silver feeds the fact scan and both dim builds
        val silver = PaymentJobs.silverFromBronze(
          PaymentJobs.bronzeStaging(PaymentData.transactions(s, dir))).cache()
        PaymentJobs.factStar(silver,
          PaymentJobs.dimPaymentMethod(silver), PaymentJobs.dimStatus(silver),
          DateSpine.dimDate(s, "1995-01-01", "2002-12-31"))
      },
      Some(s"""$SilverSql,
              |dim_pm AS (
              |  SELECT CAST(row_number() OVER (ORDER BY payment_method) AS BIGINT) AS payment_method_key,
              |    payment_method FROM (SELECT DISTINCT payment_method FROM silver)),
              |dim_st AS (
              |  SELECT CAST(row_number() OVER (ORDER BY transaction_status) AS BIGINT) AS status_key,
              |    transaction_status FROM (SELECT DISTINCT transaction_status FROM silver))
              |SELECT s.transaction_id,
              |  coalesce(p.payment_method_key, -1) AS payment_method_key,
              |  coalesce(t.status_key, -1) AS status_key,
              |  CAST(strftime(s.transaction_timestamp, '%Y%m%d') AS INT) AS date_key,
              |  s.amount - s.fee_amount + s.cashback_amount AS net_customer_amount,
              |  s.amount - s.cashback_amount AS merchant_net_amount,
              |  s.fee_amount AS gateway_revenue
              |FROM silver s
              |LEFT JOIN dim_pm p USING (payment_method)
              |LEFT JOIN dim_st t ON s.transaction_status = t.transaction_status
              |WHERE s.merchant_id NOT LIKE 'MERCH_9%'""".stripMargin)),

    // ---- gold_dim_merchant_scd2: W4 attribute pick -> SCD2 step with
    //      the reference's effective_start_date < today close guard ----
    // (dim seeded from the pre-CDC snapshot minus the MERCH_04% band so
    //  the insert branch fires; a third of the seed rows get
    //  effective_start_date = today so the close GUARD fires: those
    //  changed merchants keep their old row current AND insert a new one)
    "job_dim_merchant_scd2" -> QDef(
      (s, dir) => {
        val today = to_date(lit("2026-08-12"))
        val staging = PaymentJobs.bronzeStaging(PaymentData.transactions(s, dir)).cache()
        val silverAll = PaymentJobs.silverFromBronze(staging)
        val silverPre = PaymentJobs.silverFromBronze(
          staging.filter(col("updated_at") === col("transaction_timestamp")))
        // cache dim1 + snapshot: Scd2.step references each several times
        // (see job_dim_customer_scd2) and the merchant snapshot is the
        // most expensive input (countDistinct + window over silver)
        val dim1 = graft.ops.SurrogateKeys.byOrder(
            PaymentJobs.merchantSnapshot(silverPre)
              .filter(!col("merchant_id").like("MERCH_04%")),
            "merchant_key", Seq(col("merchant_id")))
          .withColumn("effective_start_date",
            when(substring(col("merchant_id"), 7, 10).cast("int") % 3 === 0, today)
              .otherwise(to_date(lit("2026-01-01"))))
          .withColumn("effective_end_date", lit(null).cast("date"))
          .withColumn("is_current", lit(true))
          .cache()
        graft.ops.Scd2.step(dim1, PaymentJobs.merchantSnapshot(silverAll).cache(),
            graft.ops.Scd2.Config("merchant_id", "merchant_key",
              Seq("merchant_name", "category", "location_type"),
              closeGuard = col("effective_start_date") < today),
            today)
          .select("merchant_id", "merchant_key", "merchant_name", "category",
            "location_type", "effective_start_date", "effective_end_date", "is_current")
      },
      Some(s"""$SilverSql,
              |s1 AS (SELECT * FROM clean
              |       WHERE data_quality_flag <> 'FAILED_VALIDATION'
              |         AND updated_at = transaction_timestamp),
              |snap1 AS (
              |  SELECT merchant_id, merchant_name, product_category AS category, location_type
              |  FROM (SELECT *, row_number() OVER (PARTITION BY merchant_id
              |          ORDER BY last_transaction_date DESC, transaction_count DESC,
              |                   merchant_name, product_category, location_type) AS rn
              |        FROM (SELECT merchant_id, merchant_name, location_type, product_category,
              |                count(DISTINCT transaction_id) AS transaction_count,
              |                max(transaction_timestamp) AS last_transaction_date
              |              FROM s1
              |              WHERE merchant_id IS NOT NULL AND merchant_id NOT LIKE 'MERCH_9%'
              |              GROUP BY 1,2,3,4) a) b
              |  WHERE rn = 1),
              |snap2 AS (
              |  SELECT merchant_id, merchant_name, product_category AS category, location_type
              |  FROM (SELECT *, row_number() OVER (PARTITION BY merchant_id
              |          ORDER BY last_transaction_date DESC, transaction_count DESC,
              |                   merchant_name, product_category, location_type) AS rn
              |        FROM (SELECT merchant_id, merchant_name, location_type, product_category,
              |                count(DISTINCT transaction_id) AS transaction_count,
              |                max(transaction_timestamp) AS last_transaction_date
              |              FROM silver
              |              WHERE merchant_id IS NOT NULL AND merchant_id NOT LIKE 'MERCH_9%'
              |              GROUP BY 1,2,3,4) a) b
              |  WHERE rn = 1),
              |dim1 AS (SELECT merchant_id, merchant_name, category, location_type,
              |    CAST(row_number() OVER (ORDER BY merchant_id) AS BIGINT) AS merchant_key,
              |    CASE WHEN CAST(substr(merchant_id, 7) AS INT) % 3 = 0 THEN DATE '2026-08-12'
              |         ELSE DATE '2026-01-01' END AS effective_start_date,
              |    CAST(NULL AS DATE) AS effective_end_date, true AS is_current
              |  FROM snap1 WHERE merchant_id NOT LIKE 'MERCH_04%'),
              |chg AS (SELECT d.merchant_id, s.merchant_name AS n_name,
              |    s.category AS n_cat, s.location_type AS n_loc
              |  FROM dim1 d JOIN snap2 s USING (merchant_id)
              |  WHERE d.merchant_name <> s.merchant_name
              |     OR d.category <> s.category OR d.location_type <> s.location_type),
              |closed AS (SELECT d.merchant_id, d.merchant_key, d.merchant_name,
              |    d.category, d.location_type, d.effective_start_date,
              |    CASE WHEN c.merchant_id IS NOT NULL AND d.effective_start_date < DATE '2026-08-12'
              |         THEN DATE '2026-08-12' ELSE d.effective_end_date END AS effective_end_date,
              |    CASE WHEN c.merchant_id IS NOT NULL AND d.effective_start_date < DATE '2026-08-12'
              |         THEN false ELSE d.is_current END AS is_current
              |  FROM dim1 d LEFT JOIN (SELECT DISTINCT merchant_id FROM chg) c USING (merchant_id)),
              |ins AS (SELECT merchant_id, merchant_name, category, location_type,
              |    CAST(row_number() OVER (ORDER BY merchant_id)
              |         + (SELECT max(merchant_key) FROM dim1) AS BIGINT) AS merchant_key,
              |    DATE '2026-08-12' AS effective_start_date,
              |    CAST(NULL AS DATE) AS effective_end_date, true AS is_current
              |  FROM (SELECT merchant_id, merchant_name, category, location_type FROM snap2
              |        WHERE merchant_id NOT IN (SELECT merchant_id FROM dim1)
              |        UNION ALL SELECT merchant_id, n_name, n_cat, n_loc FROM chg))
              |SELECT merchant_id, merchant_key, merchant_name, category, location_type,
              |  effective_start_date, effective_end_date, is_current FROM closed
              |UNION ALL
              |SELECT merchant_id, merchant_key, merchant_name, category, location_type,
              |  effective_start_date, effective_end_date, is_current FROM ins""".stripMargin)),

    // ---- bronze_backfill: P3 date window + W1 + MERGE stamped BACKFILL ----
    // (seed = initial LOAD of the original versions; the backfill window
    //  re-merges 1995-1996: matched originals update to BACKFILL/v3, CDC
    //  versions inside the window arrive as BACKFILL inserts)
    "job_bronze_backfill" -> QDef(
      (s, dir) => {
        val st = freshStore(s, "job_backfill")
        val staging = PaymentJobs.bronzeStaging(PaymentData.transactions(s, dir)).cache()
        st.createBucketed("bronze_transactions",
          staging.filter(col("updated_at") === col("transaction_timestamp"))
            .withColumn("delta_change_type", lit("LOAD"))
            .withColumn("delta_version", lit(1L)),
          keys = Seq("transaction_id"), n = 32)
        PaymentJobs.bronzeBackfill(st, staging, "1995-01-01", "1996-12-31")
      },
      Some(s"""$StagingSql,
              |seed AS (SELECT * FROM clean WHERE updated_at = transaction_timestamp),
              |bf AS (SELECT * FROM clean
              |       WHERE CAST(transaction_timestamp AS DATE)
              |             BETWEEN DATE '1995-01-01' AND DATE '1996-12-31')
              |SELECT s.*,
              |  CASE WHEN b.transaction_id IS NOT NULL THEN 'BACKFILL' ELSE 'LOAD' END
              |    AS delta_change_type,
              |  CAST(CASE WHEN b.transaction_id IS NOT NULL THEN 3 ELSE 1 END AS BIGINT)
              |    AS delta_version
              |FROM seed s LEFT JOIN (SELECT DISTINCT transaction_id, updated_at FROM bf) b
              |  ON s.transaction_id = b.transaction_id AND s.updated_at = b.updated_at
              |UNION ALL
              |SELECT b.*, 'BACKFILL' AS delta_change_type, CAST(3 AS BIGINT) AS delta_version
              |FROM bf b
              |WHERE NOT EXISTS (SELECT 1 FROM seed s
              |  WHERE s.transaction_id = b.transaction_id AND s.updated_at = b.updated_at)""".stripMargin)),

    // ---- bronze_full_refresh: truncate-load + count confirmation gate ----
    // (stale seed is fully replaced by the re-derived staging, stamped
    //  FULL_REFRESH with NULL delta_version per the reference's staging;
    //  fullRefresh() fails unless the post-load count equals the staged
    //  count — TESTING_GUIDE scenario 5's confirmation gate)
    "job_bronze_full_refresh" -> QDef(
      (s, dir) => {
        val st = freshStore(s, "job_bfr")
        val staging = PaymentJobs.bronzeStaging(PaymentData.transactions(s, dir)).cache()
        st.createBucketed("bronze_transactions",
          staging.filter(col("updated_at") === col("transaction_timestamp"))
            .withColumn("delta_change_type", lit("LOAD"))
            .withColumn("delta_version", lit(1L)),
          keys = Seq("transaction_id"), n = 32)
        PaymentJobs.fullRefresh(st, "bronze_transactions",
          staging.withColumn("delta_change_type", lit("FULL_REFRESH"))
            .withColumn("delta_version", lit(null).cast("bigint")))
      },
      Some(s"""$StagingSql
              |SELECT c.*, 'FULL_REFRESH' AS delta_change_type,
              |  CAST(NULL AS BIGINT) AS delta_version
              |FROM clean c""".stripMargin)),

    // ---- the reference's core operational loop, end to end: two-batch
    //      watermark-incremental load through job_control
    //      (bronze/TESTING_GUIDE.md:125-161; own-watermark invariant
    //      docs/KNOWN_ISSUES.md:368-432) ----
    // day 1 loads everything below a cutoff and records the watermark;
    // day 2 reads its OWN watermark, loads only updated_at > w with P8
    // late-arrival derivation, advances the watermark; a third run then
    // proves idempotency: the advanced watermark admits 0 rows.
    "job_incremental" -> QDef(
      (s, dir) => {
        import java.sql.Timestamp
        val st = freshStore(s, "job_incr")
        val jc = new graft.ops.JobControl(st)
        val staging = PaymentJobs.bronzeStaging(PaymentData.transactions(s, dir)).cache()
        val cutoff = lit("1997-01-01 00:00:00").cast("timestamp_ntz")
        def ntz(t: Timestamp) = lit(t.toString.stripSuffix(".0")).cast("timestamp_ntz")
        // ---- day 1: initial load below the cutoff, watermark recorded ----
        val batch1 = staging.filter(col("updated_at") < cutoff)
          .withColumn("is_late_arrival", lit(false))
          .withColumn("arrival_delay_hours", lit(0))
          .withColumn("delta_change_type", lit("LOAD"))
        st.createBucketed("bronze_transactions", batch1, Seq("transaction_id"), n = 32)
        val n1 = batch1.count()
        val w1 = Timestamp.valueOf(batch1.agg(max("updated_at"))
          .head().getAs[java.time.LocalDateTime](0))
        jc.record("load_bronze", "BATCH_D1", "bronze", "SUCCESS",
          Timestamp.valueOf("2026-08-11 00:00:00"), Timestamp.valueOf("2026-08-11 01:00:00"),
          Some(w1), n1, n1, 0)
        // ---- day 2: OWN-watermark incremental (P2) + late arrivals (P8) ----
        val w = ntz(jc.lastWatermark("load_bronze").get)
        val incr = staging.filter(col("updated_at") > w)
          .withColumn("is_late_arrival", graft.ops.Validation.isLateArrival(
            col("transaction_timestamp"), col("updated_at"), w))
          .withColumn("arrival_delay_hours",
            when(col("is_late_arrival"), graft.ops.Validation.arrivalDelayHours(
              col("transaction_timestamp"), col("updated_at"))).otherwise(lit(0)))
          .withColumn("delta_change_type", lit("INCREMENTAL"))
        st.mergeUpsert("bronze_transactions", incr,
          Seq("transaction_id", "updated_at"), changeTypeCol = None)
        val n2 = incr.count()
        val w2 = Timestamp.valueOf(incr.agg(max("updated_at"))
          .head().getAs[java.time.LocalDateTime](0))
        jc.record("load_bronze", "BATCH_D2", "bronze", "SUCCESS",
          Timestamp.valueOf("2026-08-12 00:00:00"), Timestamp.valueOf("2026-08-12 01:00:00"),
          Some(w2), n2, n2, 0)
        // ---- idempotent re-run: the advanced watermark admits nothing ----
        val rerun = staging.filter(col("updated_at") > ntz(jc.lastWatermark("load_bronze").get)).count()
        require(rerun == 0, s"idempotency violated: re-run admitted $rerun rows")
        st.read("bronze_transactions").withColumn("watermark_used", w)
      },
      Some(s"""$StagingSql,
              |wm AS (SELECT max(updated_at) AS w FROM clean
              |       WHERE updated_at < TIMESTAMP '1997-01-01 00:00:00')
              |SELECT c.*,
              |  CASE WHEN c.updated_at > (SELECT w FROM wm)
              |       THEN c.transaction_timestamp < (SELECT w FROM wm)
              |       ELSE false END AS is_late_arrival,
              |  CASE WHEN c.updated_at > (SELECT w FROM wm)
              |        AND c.transaction_timestamp < (SELECT w FROM wm)
              |       THEN CAST(floor((epoch(c.updated_at) - epoch(c.transaction_timestamp)) / 3600) AS INT)
              |       ELSE 0 END AS arrival_delay_hours,
              |  CASE WHEN c.updated_at > (SELECT w FROM wm)
              |       THEN 'INCREMENTAL' ELSE 'LOAD' END AS delta_change_type,
              |  (SELECT w FROM wm) AS watermark_used
              |FROM clean c""".stripMargin)),

    // ---- load_fact composite: gate + M2 merge into the fact store
    //      table + job_control record
    //      (Gold/fact/load_fact_transactions.py:79-139) ----
    // seed = "yesterday's" fact state: stale gateway_revenue on half the
    // rows + one retired transaction absent from today's source. The
    // merge must restore the stale measures and CARRY the retired row —
    // distinguishing MERGE from blind overwrite in the oracle.
    "job_fact_load" -> QDef(
      (s, dir) => {
        import java.sql.Timestamp
        val st = freshStore(s, "job_factload")
        val silver = PaymentJobs.silverFromBronze(
          PaymentJobs.bronzeStaging(PaymentData.transactions(s, dir))).cache()
        val fact = PaymentJobs.factStar(silver,
          PaymentJobs.dimPaymentMethod(silver), PaymentJobs.dimStatus(silver),
          DateSpine.dimDate(s, "1995-01-01", "2002-12-31")).cache()
        // the reference's pre-merge gate: refuse an empty source
        require(!fact.isEmpty, "load_fact gate: empty source")
        val retired = {
          import s.implicits._
          Seq(("TXN_RETIRED", -1L, -1L, 19941231, 0.0, 0.0, 0.0))
            .toDF("transaction_id", "payment_method_key", "status_key", "date_key",
              "net_customer_amount", "merchant_net_amount", "gateway_revenue")
        }
        val seed = fact.filter(col("date_key") % 2 === 0)
          .withColumn("gateway_revenue", lit(0.0))
          .unionByName(retired)
        st.createBucketed("fact_transactions", seed, Seq("transaction_id"), n = 32)
        st.mergeUpsert("fact_transactions", fact, Seq("transaction_id"),
          changeTypeCol = None)
        val n = fact.count()
        val jc = new graft.ops.JobControl(st)
        jc.record("load_fact", "BATCH_0001", "gold", "SUCCESS",
          Timestamp.valueOf("2026-08-12 00:00:00"), Timestamp.valueOf("2026-08-12 01:00:00"),
          None, n, n, 0)
        st.read("fact_transactions")
      },
      Some(s"""$SilverSql,
              |dim_pm AS (
              |  SELECT CAST(row_number() OVER (ORDER BY payment_method) AS BIGINT) AS payment_method_key,
              |    payment_method FROM (SELECT DISTINCT payment_method FROM silver)),
              |dim_st AS (
              |  SELECT CAST(row_number() OVER (ORDER BY transaction_status) AS BIGINT) AS status_key,
              |    transaction_status FROM (SELECT DISTINCT transaction_status FROM silver))
              |SELECT s.transaction_id,
              |  coalesce(p.payment_method_key, -1) AS payment_method_key,
              |  coalesce(t.status_key, -1) AS status_key,
              |  CAST(strftime(s.transaction_timestamp, '%Y%m%d') AS INT) AS date_key,
              |  s.amount - s.fee_amount + s.cashback_amount AS net_customer_amount,
              |  s.amount - s.cashback_amount AS merchant_net_amount,
              |  s.fee_amount AS gateway_revenue
              |FROM silver s
              |LEFT JOIN dim_pm p USING (payment_method)
              |LEFT JOIN dim_st t ON s.transaction_status = t.transaction_status
              |WHERE s.merchant_id NOT LIKE 'MERCH_9%'
              |UNION ALL
              |SELECT 'TXN_RETIRED', CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
              |  CAST(19941231 AS INT), 0.0, 0.0, 0.0""".stripMargin)),

    // ---- fact_full_refresh: full-table star join + overwrite + gate ----
    "job_fact_full_refresh" -> QDef(
      (s, dir) => {
        val st = freshStore(s, "job_ffr")
        val silver = PaymentJobs.silverFromBronze(
          PaymentJobs.bronzeStaging(PaymentData.transactions(s, dir))).cache()
        val fact = PaymentJobs.factStar(silver,
          PaymentJobs.dimPaymentMethod(silver), PaymentJobs.dimStatus(silver),
          DateSpine.dimDate(s, "1995-01-01", "2002-12-31"))
        st.createEmpty("fact_transactions", fact.schema)
        PaymentJobs.fullRefresh(st, "fact_transactions", fact)
      },
      Some(s"""$SilverSql,
              |dim_pm AS (
              |  SELECT CAST(row_number() OVER (ORDER BY payment_method) AS BIGINT) AS payment_method_key,
              |    payment_method FROM (SELECT DISTINCT payment_method FROM silver)),
              |dim_st AS (
              |  SELECT CAST(row_number() OVER (ORDER BY transaction_status) AS BIGINT) AS status_key,
              |    transaction_status FROM (SELECT DISTINCT transaction_status FROM silver))
              |SELECT s.transaction_id,
              |  coalesce(p.payment_method_key, -1) AS payment_method_key,
              |  coalesce(t.status_key, -1) AS status_key,
              |  CAST(strftime(s.transaction_timestamp, '%Y%m%d') AS INT) AS date_key,
              |  s.amount - s.fee_amount + s.cashback_amount AS net_customer_amount,
              |  s.amount - s.cashback_amount AS merchant_net_amount,
              |  s.fee_amount AS gateway_revenue
              |FROM silver s
              |LEFT JOIN dim_pm p USING (payment_method)
              |LEFT JOIN dim_st t ON s.transaction_status = t.transaction_status
              |WHERE s.merchant_id NOT LIKE 'MERCH_9%'""".stripMargin))
  )
}
