package graft.jobs

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.TableStore
import graft.ops.JobControl

/** The reference's Airflow orchestration collapsed to ordered function
  * composition (SURVEY §3: "job sequencing becomes plain Scala function
  * composition") with the same operational contract: every job run —
  * success or failure — appends a job_control record carrying counts
  * and the new watermark; failures record FAILED + the error and
  * propagate (the DAG's task-failure semantics).
  *
  * The clock is injected for deterministic tests (SURVEY §7.4.2).
  */
class Orchestrator(store: TableStore, clock: () => Timestamp = Orchestrator.systemClock) {

  val jobControl = new JobControl(store)

  final case class JobResult(read: Long, written: Long, quarantined: Long,
                             watermark: Option[Timestamp])

  /** Run one job body with job_control bookkeeping. */
  def runJob(jobName: String, layer: String, batchId: String)(
      body: => JobResult): JobResult = {
    val started = clock()
    try {
      val r = body
      jobControl.record(jobName, batchId, layer, "SUCCESS", started, clock(),
        r.watermark, r.read, r.written, r.quarantined)
      r
    } catch {
      case e: Throwable =>
        jobControl.record(jobName, batchId, layer, "FAILED", started, clock(),
          None, 0, 0, 0, error = Some(Option(e.getMessage).getOrElse(e.toString).take(500)))
        throw e
    }
  }

  private def maxUpdated(df: DataFrame): Option[Timestamp] =
    df.agg(max("updated_at")).head().get(0) match {
      case t: Timestamp => Some(t)
      case t: java.time.LocalDateTime => Some(Timestamp.valueOf(t)) // NTZ columns
      case _ => None
    }

  /** The full daily chain: bronze validate+load -> silver -> dims ->
    * fact, every stage recorded. Returns the fact table. */
  def runDaily(txns: DataFrame, batchId: String): DataFrame = {
    val spark = txns.sparkSession
    val nTxns = txns.count()

    val staging = PaymentJobs.bronzeStaging(txns)
      .withColumn("is_deleted", lit(false))
      .withColumn("deleted_at", lit(null).cast("timestamp_ntz"))
      .cache()
    runJob("validate_bronze", "bronze", batchId) {
      val quarantined = PaymentJobs.bronzeQuarantine(txns).count()
      JobResult(nTxns, staging.count(), quarantined, None)
    }
    val bronze = runJobDf("load_bronze", "bronze", batchId) {
      PaymentJobs.bronzeLoad(store, staging)
    }
    val silver = runJobDf("load_silver", "silver", batchId) {
      val s = PaymentJobs.silverFromBronze(bronze).cache()
      store.createBucketed("silver_transactions", s, Seq("transaction_id"), 32)
      s
    }
    val fact = runJobDf("load_fact", "gold", batchId) {
      PaymentJobs.factStar(silver,
        PaymentJobs.dimCustomerCurrent(silver), PaymentJobs.dimMerchantCurrent(silver),
        PaymentJobs.dimPaymentMethod(silver), PaymentJobs.dimStatus(silver),
        graft.ops.DateSpine.dimDate(spark, "1995-01-01", "2002-12-31"))
    }
    fact
  }

  private def runJobDf(jobName: String, layer: String, batchId: String)(
      body: => DataFrame): DataFrame = {
    var out: DataFrame = null
    runJob(jobName, layer, batchId) {
      out = body
      val n = out.count()
      JobResult(n, n, 0,
        if (out.columns.contains("updated_at")) maxUpdated(out) else None)
    }
    out
  }
}

object Orchestrator {
  def systemClock: () => Timestamp = () => new Timestamp(System.currentTimeMillis())
}
