package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.TableStore

/** Runtime (DPP-style) dir pruning: the dim side of a star join hands
  * its join-key values to the fact scan, which drops whole dirs via
  * bucket ids / bloom / stats before reading a file. */
class RuntimePruningSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  test("dim-side keys prune fact dirs at runtime through the bucket layout") {
    val root = Files.createTempDirectory("dpp").toString
    spark.conf.set("spark.sql.catalog.gdpp", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gdpp.root", root)
    val ts = new TableStore(spark, root)
    // fact: bucketed on the join key, 16 leaf dirs
    ts.createBucketed("fact",
      (0L until 20000L).map(i => (i % 200, i, s"r$i")).toDF("cust_id", "row_id", "payload"),
      Seq("cust_id"), n = 16)
    // dim: tiny, filter selects 2 customers
    ts.create("dim", (0L until 200L).map(i =>
      (i, if (i == 7 || i == 13) "GOLD" else "BASE")).toDF("cust_id", "tier"))

    val q = spark.sql(
      """SELECT f.row_id, d.tier FROM gdpp.fact f
        |JOIN gdpp.dim d ON f.cust_id = d.cust_id
        |WHERE d.tier = 'GOLD'""".stripMargin)
    val rows = q.collect()
    // correctness first: 2 of 200 customers x 100 rows each
    assert(rows.length === 200)
    assert(rows.forall(_.getString(1) === "GOLD"))

    // the fact scan must have been runtime-pruned to the keys' buckets
    // (walk through AQE's final plan)
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case qs: QueryStageExec => walk(qs.plan)
      case _ => p +: p.children.flatMap(walk)
    }
    val descs = walk(q.queryExecution.executedPlan).collect {
      case b: BatchScanExec => b.scan.description()
    }
    val fact = descs.find(_.contains("stats pruning: ")).mkString("|")
    assert(descs.exists(_.contains("runtime pruning:")),
      s"expected runtime pruning on the fact scan, got: $descs")
    // 2 keys -> at most 2 of 16 bucket dirs survive
    val m = "runtime pruning: (\\d+)/(\\d+)".r.findFirstMatchIn(fact)
    assert(m.exists(g => g.group(1).toInt <= 2), s"weak prune: $fact")
  }
}
