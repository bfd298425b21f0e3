package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.TableStore
import graft.jobs.{Orchestrator, PaymentData}

class OrchestratorSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session

  def fixedClock: () => Timestamp = {
    var t = 0L
    () => { t += 60000; new Timestamp(1754956800000L + t) } // monotonic
  }

  test("runDaily records a SUCCESS job_control row per stage with counts") {
    val store = new TableStore(spark, Files.createTempDirectory("orch").toString)
    val orch = new Orchestrator(store, fixedClock)
    val txns = PaymentData.transactions(spark, "/root/testdata/sf0.001")
    val fact = orch.runDaily(txns, "batch_1")
    assert(fact.count() > 0)
    val jc = store.read("job_control")
    val byJob = jc.collect().map(r => r.getAs[String]("job_name") -> r).toMap
    assert(byJob.keySet === Set("validate_bronze", "load_bronze", "load_silver", "load_fact"))
    assert(jc.filter(col("status") =!= "SUCCESS").count() === 0)
    // counts reconcile: validate read == input size; silver written ==
    // silver table count; watermark recorded for bronze
    assert(byJob("validate_bronze").getAs[Long]("records_read") === txns.count())
    assert(byJob("load_silver").getAs[Long]("records_written") ===
      store.read("silver_transactions").count())
    assert(byJob("load_bronze").getAs[Timestamp]("last_processed_timestamp") != null)
  }

  test("a failing job records FAILED with the error and rethrows") {
    val store = new TableStore(spark, Files.createTempDirectory("orch2").toString)
    val orch = new Orchestrator(store, fixedClock)
    val boom = intercept[RuntimeException] {
      orch.runJob("exploding_job", "bronze", "batch_x") {
        throw new RuntimeException("planted failure")
      }
    }
    assert(boom.getMessage === "planted failure")
    val row = store.read("job_control")
      .filter(col("job_name") === "exploding_job").head()
    assert(row.getAs[String]("status") === "FAILED")
    assert(row.getAs[String]("error_message").contains("planted failure"))
    // FAILED runs never yield a watermark
    assert(new graft.ops.JobControl(store).lastWatermark("exploding_job").isEmpty)
  }
}
