package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.TableStore
import graft.jobs.{PaymentData, PaymentJobs}
import graft.ops.Scd2

/** Scenario tests mirroring the reference's manual TESTING_GUIDE
  * scenarios (SURVEY §5): planted-defect splits, idempotent re-run,
  * dedup invariants, GDPR completeness, SCD2 versioning.
  */
class PipelineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  val dir = "/root/testdata/sf0.001"

  def freshStore(): TableStore =
    new TableStore(spark, Files.createTempDirectory("pipeline").toString)

  lazy val txns = PaymentData.transactions(spark, dir).cache()

  test("tier-1 split is a partition: quarantine + staging cover the batch") {
    val q = PaymentJobs.bronzeQuarantine(txns)
    val staging = PaymentJobs.bronzeStaging(txns)
    assert(q.count() > 0, "planted Tier-1 defects must quarantine")
    // every input row is in exactly one branch (staging pre-dedup)
    val cleanCount = txns.count() - q.count()
    val stagingPreDedup = cleanCount
    assert(staging.count() <= stagingPreDedup)
    // quarantined ids never reach staging
    val leak = staging.join(q.select("transaction_id", "updated_at").distinct(),
      Seq("transaction_id", "updated_at"), "left_semi")
    // (quarantine rows have NULL/defective ids; only valid-id overlap counts)
    assert(leak.filter(col("transaction_id").isNotNull).count() === 0)
  }

  test("W1: staging is unique on (transaction_id, updated_at)") {
    val staging = PaymentJobs.bronzeStaging(txns)
    val dups = staging.groupBy("transaction_id", "updated_at")
      .count().filter(col("count") > 1)
    assert(dups.count() === 0)
  }

  test("bronze load is idempotent (TESTING_GUIDE scenario 2)") {
    val st = freshStore()
    val staging = PaymentJobs.bronzeStaging(txns)
    PaymentJobs.bronzeLoad(st, staging)
    val first = st.read("bronze_transactions").count()
    // re-merge the same CDC batch: counts must not change
    val cdc = staging
      .filter(expr("CAST(substring(transaction_id, 5, 20) AS BIGINT)") % 50 === 0)
      .withColumn("delta_change_type", lit("ignored"))
      .withColumn("delta_version", lit(2L))
    st.mergeUpsert("bronze_transactions", cdc, Seq("transaction_id", "updated_at"))
    assert(st.read("bronze_transactions").count() === first)
  }

  test("W2: silver is unique on transaction_id and keeps the CDC update") {
    val silver = PaymentJobs.silverFromBronze(PaymentJobs.bronzeStaging(txns))
    assert(silver.groupBy("transaction_id").count().filter(col("count") > 1).count() === 0)
    // every transaction with a planted v2 must surface the updated status
    val v2Ids = PaymentJobs.bronzeStaging(txns)
      .filter(col("updated_at") =!= col("transaction_timestamp"))
      .filter(col("data_quality_flag") =!= "FAILED_VALIDATION")
      .select("transaction_id").distinct()
    val kept = silver.join(v2Ids, Seq("transaction_id"), "left_semi")
    assert(kept.count() === v2Ids.count())
    assert(kept.filter(col("transaction_status") =!= "Failed").count() === 0)
  }

  test("GDPR: mark+propagate removes the customer everywhere (scenario)") {
    val st = freshStore()
    PaymentJobs.runPipeline(st, txns)
    val before = st.read("silver_transactions")
      .filter(col("customer_id") === "USER_0042").count()
    assert(before > 0, "target customer must exist in silver")
    val after = PaymentJobs.gdprDelete(st, "USER_0042")
    assert(after.filter(col("customer_id") === "USER_0042").count() === 0)
    // bronze keeps the audit trail, soft-deleted
    val bronze = st.read("bronze_transactions")
      .filter(col("customer_id") === "USER_0042")
    assert(bronze.count() === before || bronze.count() >= before)
    assert(bronze.filter(!col("is_deleted")).count() === 0)
    assert(bronze.filter(col("delta_change_type") =!= "DELETE").count() === 0)
  }

  test("SCD2 step: new keys insert, changed close+reversion, stable untouched") {
    import spark.implicits._
    val today = to_date(lit("2026-08-12"))
    val dim = Seq(
      (1L, "C1", "Bronze", java.sql.Date.valueOf("2026-01-01"), null.asInstanceOf[java.sql.Date], true),
      (2L, "C2", "Gold", java.sql.Date.valueOf("2026-01-01"), null.asInstanceOf[java.sql.Date], true))
      .toDF("customer_key", "customer_id", "tier", "effective_start_date", "effective_end_date", "is_current")
    val snapshot = Seq(
      ("C2", "Platinum"), // changed tier
      ("C3", "Silver"))   // brand new
      .toDF("customer_id", "tier")
    val next = Scd2.step(dim, snapshot,
      Scd2.Config(businessKey = "customer_id", surrogateKey = "customer_key",
        trackedCols = Seq("tier")), today)
    val rows = next.collect()
    assert(rows.length === 4)
    def id(r: org.apache.spark.sql.Row) = r.getAs[String]("customer_id")
    def key(r: org.apache.spark.sql.Row) = r.getAs[Long]("customer_key")
    def cur(r: org.apache.spark.sql.Row) = r.getAs[Boolean]("is_current")
    // C1 untouched current
    val c1 = rows.filter(id(_) == "C1")
    assert(c1.length === 1 && cur(c1.head))
    // C2: old version closed today, new current Platinum version
    val c2 = rows.filter(id(_) == "C2").sortBy(key)
    assert(c2.length === 2)
    assert(!cur(c2.head) &&
      c2.head.getAs[java.sql.Date]("effective_end_date").toString == "2026-08-12")
    assert(cur(c2.last) && c2.last.getAs[String]("tier") == "Platinum")
    // C3 inserted current with a fresh surrogate key > max existing
    val c3 = rows.filter(id(_) == "C3")
    assert(c3.length === 1 && cur(c3.head) && key(c3.head) > 2L)
  }

  test("idempotent SCD2: unchanged snapshot is a no-op") {
    import spark.implicits._
    val today = to_date(lit("2026-08-12"))
    val dim = Seq(
      (1L, "C1", "Bronze", java.sql.Date.valueOf("2026-01-01"), null.asInstanceOf[java.sql.Date], true))
      .toDF("customer_key", "customer_id", "tier", "effective_start_date", "effective_end_date", "is_current")
    val snapshot = Seq(("C1", "Bronze")).toDF("customer_id", "tier")
    val next = Scd2.step(dim, snapshot,
      Scd2.Config("customer_id", "customer_key", Seq("tier")), today)
    assert(next.count() === 1)
    assert(next.filter(col("is_current")).count() === 1)
  }

  test("SCD2 close guard: a version started today is not closed, but the new version inserts") {
    import spark.implicits._
    val today = to_date(lit("2026-08-12"))
    val dim = Seq(
      // started BEFORE today -> closes normally on change
      (1L, "M1", "Old Name", java.sql.Date.valueOf("2026-01-01"), null.asInstanceOf[java.sql.Date], true),
      // started TODAY -> the reference's effective_start_date < CURRENT_DATE()
      // guard suppresses the close (same-day re-run idempotency hatch)
      (2L, "M2", "Old Name", java.sql.Date.valueOf("2026-08-12"), null.asInstanceOf[java.sql.Date], true))
      .toDF("merchant_key", "merchant_id", "merchant_name", "effective_start_date", "effective_end_date", "is_current")
    val snapshot = Seq(("M1", "New Name"), ("M2", "New Name")).toDF("merchant_id", "merchant_name")
    val next = Scd2.step(dim, snapshot,
      Scd2.Config("merchant_id", "merchant_key", Seq("merchant_name"),
        closeGuard = col("effective_start_date") < today), today)
      .collect()
    val m1 = next.filter(_.getAs[String]("merchant_id") == "M1")
    assert(m1.length === 2)
    assert(m1.count(_.getAs[Boolean]("is_current")) === 1)
    assert(m1.exists(r => !r.getAs[Boolean]("is_current") &&
      r.getAs[java.sql.Date]("effective_end_date").toString == "2026-08-12"))
    // M2: old row stays current (guard), new version still inserted
    val m2 = next.filter(_.getAs[String]("merchant_id") == "M2")
    assert(m2.length === 2)
    assert(m2.forall(_.getAs[Boolean]("is_current")))
    assert(m2.forall(_.getAs[java.sql.Date]("effective_end_date") == null))
  }

  test("full refresh replaces contents and passes the count gate") {
    val st = freshStore()
    val staging = PaymentJobs.bronzeStaging(txns)
      .withColumn("delta_change_type", lit("LOAD"))
      .withColumn("delta_version", lit(1L))
    st.create("bronze_transactions", staging.limit(10)) // stale seed
    val refreshed = PaymentJobs.fullRefresh(st, "bronze_transactions",
      staging.withColumn("delta_change_type", lit("FULL_REFRESH"))
        .withColumn("delta_version", lit(null).cast("bigint")))
    assert(refreshed.count() === staging.count())
    assert(refreshed.select("delta_change_type").distinct().collect()
      .map(_.getString(0)).toSeq === Seq("FULL_REFRESH"))
  }

  test("SCD2 re-opens keys whose versions were all closed externally") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    import java.sql.Date
    // key 1's current row was closed outside the SCD2 flow (e.g. a GDPR
    // delete) — when it reappears in a snapshot it must insert a fresh
    // current version, not vanish forever (it is neither "new" against
    // the full dim nor "changed" against current rows)
    val dim = Seq((1L, 10L, "a",
        Date.valueOf("2026-01-01"), Date.valueOf("2026-02-01"), false))
      .toDF("bk", "sk", "attr",
        "effective_start_date", "effective_end_date", "is_current")
    val snap = Seq((1L, "a2")).toDF("bk", "attr")
    val next = graft.ops.Scd2.step(dim, snap,
      graft.ops.Scd2.Config("bk", "sk", Seq("attr")),
      lit(Date.valueOf("2026-03-01")))
    assert(next.count() === 2, "old closed version must carry through")
    val cur = next.filter(col("is_current"))
      .select("bk", "attr", "sk").as[(Long, String, Long)].collect().toSeq
    assert(cur === Seq((1L, "a2", 11L)),
      s"re-appearing key must insert a new current version, got $cur")
  }

  test("replay and backfill work against the PIPELINE's 23-column bronze") {
    import org.apache.spark.sql.functions.lit
    val store = freshStore()
    // runPipeline creates bronze WITH the GDPR audit pair — the replay
    // and backfill merges must align their 21-column staging frames to
    // it instead of failing conform with "missing columns"
    PaymentJobs.runPipeline(store, txns).count()
    assert(store.schemaOf("bronze_transactions").fieldNames.contains("is_deleted"))
    val before = store.read("bronze_transactions").count()
    val replayed = PaymentJobs.quarantineReplay(store,
      PaymentJobs.bronzeQuarantine(txns),
      lit("2031-01-01 00:00:00").cast("timestamp_ntz")) // past the planted 2030 stamps
    assert(replayed.count() > before, "future-timestamp rows must admit")
    // replayed rows carry the audit default, not null
    assert(replayed.filter(col("delta_change_type") === "REPLAY")
      .filter(col("is_deleted").isNull).count() === 0)
    val afterReplay = replayed.count()
    val backfilled = PaymentJobs.bronzeBackfill(store,
      PaymentJobs.bronzeStaging(txns), "1995-01-01", "2002-12-31")
    assert(backfilled.count() === afterReplay, "backfill re-merges existing rows")
  }
}
