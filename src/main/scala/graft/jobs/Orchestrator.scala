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
        // the FAILED bookkeeping append must never MASK the job's own
        // failure: a record() error (store contention, control-table
        // issue) rides along as suppressed, the root cause propagates
        try jobControl.record(jobName, batchId, layer, "FAILED", started, clock(),
          None, 0, 0, 0, error = Some(Option(e.getMessage).getOrElse(e.toString).take(500)))
        catch { case r: Throwable if r ne e => e.addSuppressed(r) }
        throw e
    }
  }

  /** The full daily chain — the SAME stage bodies as
    * [[PaymentJobs.runPipeline]] (stagingWithAudit / bronzeLoad /
    * loadSilver / goldFact), wrapped with per-stage job_control
    * bookkeeping. Returns the fact table. */
  def runDaily(txns: DataFrame, batchId: String): DataFrame = {
    val nTxns = txns.count()
    val staging = PaymentJobs.stagingWithAudit(txns).cache()
    runJob("validate_bronze", "bronze", batchId) {
      val quarantined = PaymentJobs.bronzeQuarantine(txns).count()
      JobResult(nTxns, staging.count(), quarantined, None)
    }
    val bronze = runJobDf("load_bronze", "bronze", batchId) {
      PaymentJobs.bronzeLoad(store, staging)
    }
    val silver = runJobDf("load_silver", "silver", batchId) {
      PaymentJobs.loadSilver(store, bronze)
    }
    runJobDf("load_fact", "gold", batchId) {
      PaymentJobs.goldFact(silver)
    }
  }

  private def runJobDf(jobName: String, layer: String, batchId: String)(
      body: => DataFrame): DataFrame = {
    var out: DataFrame = null
    runJob(jobName, layer, batchId) {
      out = body
      // ONE action for both bookkeeping facts — a separate count() and
      // max() would execute the (possibly uncached) stage body twice
      if (out.columns.contains("updated_at")) {
        val row = out.agg(count(lit(1)), max("updated_at")).head()
        val wm = row.get(1) match {
          case t: Timestamp => Some(t)
          case t: java.time.LocalDateTime => Some(Timestamp.valueOf(t)) // NTZ
          case _ => None
        }
        JobResult(row.getLong(0), row.getLong(0), 0, wm)
      } else {
        val n = out.count()
        JobResult(n, n, 0, None)
      }
    }
    out
  }
}

object Orchestrator {
  def systemClock: () => Timestamp = () => new Timestamp(System.currentTimeMillis())
}
