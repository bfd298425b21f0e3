package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Step-level wall + Spark-job-count breakdown of the registered-DAG
  * matview fixture (sql_matview_dag — 145 jobs at the r14 baseline, ~50%
  * of its wall in inter-job driver gaps). Each fixture step is timed with
  * the number of Spark jobs it launched: the product (steps x jobs/step x
  * fixed per-job cost) is the query's floor, so the optimization lever is
  * jobs/step. Run:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.ProfileDagOps"
  */
object ProfileDagOps {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("GRAFT_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      .config("spark.sql.catalog.graft.root", "/tmp/graft_profile_dagops/sqlcat")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s.range(1000000).selectExpr("sum(id)").collect()

    val jobs = new AtomicInteger(0)
    s.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = { jobs.incrementAndGet(): Unit }
    })

    def t[A](label: String)(f: => A): A = {
      Thread.sleep(120) // let listener drain
      val j0 = jobs.get(); val t0 = System.nanoTime()
      val r = f
      Thread.sleep(120)
      println(f"[dagops] $label%-42s ${(System.nanoTime() - t0) / 1e9}%7.2f s  jobs=${jobs.get() - j0}")
      r
    }

    // repeat twice: first pass is cold (codegen), second is the real floor
    (1 to 2).foreach { pass =>
      println(s"[dagops] ---- pass $pass ----")
      Seq("dgsrc", "dgfact", "dgagg", "dgdc", "dgdn").foreach(tn =>
        graft.core.FsUtil.deleteRecursively(
          new java.io.File(s"/tmp/graft_profile_dagops/sqlcat/$tn")))
      val st = new graft.core.TableStore(s, "/tmp/graft_profile_dagops/sqlcat")
      val orders = graft.Tables.orders(s, dir)
      val silverAll = orders.select(col("o_orderkey"), col("o_custkey"),
        (col("o_orderkey") % 1000 + 1).as("price_c"),
        col("o_orderstatus").as("status"))
      t("createEmpty+setCDF dgsrc") {
        st.createEmpty("dgsrc", org.apache.spark.sql.types.StructType.fromDDL(
          "o_orderkey BIGINT, o_custkey BIGINT, price_c BIGINT, status STRING"))
        st.setChangeFeed("dgsrc", true)
      }
      t("append dgsrc (1/3 of orders)") {
        st.append("dgsrc", silverAll.filter(col("o_orderkey") % 3 === 0))
      }
      t("create+setCDF dgdc (customer)") {
        st.create("dgdc", graft.Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_name"), col("c_nationkey")))
        st.setChangeFeed("dgdc", true)
      }
      t("create+setCDF dgdn (nation)") {
        st.create("dgdn", graft.Tables.nation(s, dir)
          .select(col("n_nationkey"), col("n_name")))
        st.setChangeFeed("dgdn", true)
      }
      t("CALL create_join_view dgfact") {
        s.sql("""CALL graft.system.create_join_view('dgfact', 'dgsrc',
                |  'o_orderkey',
                |  'dgdc:o_custkey=c_custkey:c_name|dgdn:c_nationkey=n_nationkey:n_name',
                |  8)""".stripMargin).collect()
      }
      t("CALL set_change_feed dgfact") {
        s.sql("CALL graft.system.set_change_feed('dgfact', true)").collect()
      }
      t("CALL create_agg_view dgagg") {
        s.sql("""CALL graft.system.create_agg_view(
                |  'dgagg', 'dgfact', 'n_name', 'price_c', 'count_sum', 4)""".stripMargin).collect()
      }
      t("updateVectorized dgsrc (%5)") {
        st.updateVectorized("dgsrc", col("o_orderkey") % 5 === 0,
          Map("price_c" -> (col("price_c") + 7L)))
      }
      t("deleteVectorized dgsrc (%7)") {
        st.deleteVectorized("dgsrc", col("o_orderkey") % 7 === 0)
      }
      t("append dgsrc (next 1/3)") {
        st.append("dgsrc", silverAll.filter(col("o_orderkey") % 3 === 1))
      }
      t("CALL refresh_agg_view (cycle 1)") {
        s.sql("CALL graft.system.refresh_agg_view('dgagg')").collect()
      }
      t("updateVectorized dgdc (%4)") {
        st.updateVectorized("dgdc", col("c_custkey") % 4 === 0,
          Map("c_name" -> concat(col("c_name"), lit("!"))))
      }
      t("updateVectorized dgdn (%2)") {
        st.updateVectorized("dgdn", col("n_nationkey") % 2 === 0,
          Map("n_name" -> concat(col("n_name"), lit("!"))))
      }
      t("CALL refresh_agg_view (cycle 2)") {
        s.sql("CALL graft.system.refresh_agg_view('dgagg')").collect()
      }
      t("CALL refresh_agg_view (idle)") {
        s.sql("CALL graft.system.refresh_agg_view('dgagg')").collect()
      }
      t("CALL compact_agg_view") {
        s.sql("CALL graft.system.compact_agg_view('dgagg')").collect()
      }
      t("final SELECT over view") {
        s.sql("""SELECT n_name, n_rows, sum_qty AS sum_price_c
                |FROM graft.dgagg WHERE n_rows > 0""".stripMargin)
          .queryExecution.toRdd.count()
      }
    }
    s.stop()
  }
}
