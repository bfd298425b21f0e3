package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Plan audit: summarizes each query's physical plan — node histogram,
  * pushed filters, broadcast vs shuffle joins — to catch scale
  * anti-patterns (missing pushdown, unintended cartesian/sort-merge,
  * single-partition windows) without reading full explain dumps. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, dir)
        val plan = df.queryExecution.executedPlan
        def walk(p: SparkPlan): Seq[SparkPlan] = p match {
          case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
          case _ => p +: p.children.flatMap(walk)
        }
        val nodes = walk(plan)
        val hist = nodes.groupBy(_.nodeName).view.mapValues(_.size).toMap
        val flags = Seq(
          if (hist.keys.exists(_.contains("CartesianProduct"))) Some("CARTESIAN") else None,
          if (hist.keys.exists(_.contains("SortMergeJoin"))) Some("SMJ") else None,
          if (hist.keys.exists(_.contains("BroadcastNestedLoop"))) Some("BNLJ") else None,
          if (nodes.exists(n => n.nodeName == "Window" &&
            n.toString.contains("SinglePartition"))) Some("GLOBAL_WINDOW") else None
        ).flatten
        val joins = nodes.filter(_.nodeName.contains("Join")).map(_.nodeName).distinct
        val pushed = nodes.collect {
          case f if f.nodeName.contains("Scan") =>
            val s = f.toString
            val i = s.indexOf("PushedFilters: [")
            val j = if (i >= 0) s.indexOf("]", i) else -1
            if (j > i && i >= 0) s.substring(i + 16, j).take(60) else ""
        }.filter(_.nonEmpty)
        println(f"$name%-28s joins=${joins.mkString("+")}%-50s flags=${flags.mkString(",")} pushed=${pushed.size}")
      } catch {
        case e: Throwable => println(f"$name%-28s AUDIT_ERROR ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
