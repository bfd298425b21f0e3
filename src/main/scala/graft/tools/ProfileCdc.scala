package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level timing of cdc2_rowid_replicate (the bench's heaviest
  * query): separates source-history construction (6 commits) from the
  * change-feed read and the per-version replication merges, so a slow
  * run says WHICH side to optimize. Run:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.ProfileCdc"
  */
object ProfileCdc {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[cdc2] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    val root = "/tmp/graft_profile_cdc"
    graft.core.FsUtil.deleteRecursively(new java.io.File(root))
    val st = new graft.core.TableStore(spark, root)
    val li = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_quantity"))

    t("create+track+cdf") {
      st.createEmpty("src", org.apache.spark.sql.types.StructType.fromDDL(
        "l_orderkey BIGINT, l_suppkey BIGINT, l_quantity DOUBLE"))
      st.enableRowTracking("src")
      st.setChangeFeed("src", true)
    }
    t("append v3 (25%)") { st.append("src", li.filter(col("l_orderkey") % 4 === 1)) }
    t("updateVectorized v4") { st.updateVectorized("src", col("l_quantity") <= 10.0,
      Map("l_suppkey" -> (col("l_suppkey") + 100000L))) }
    t("deleteVectorized v5") { st.deleteVectorized("src", col("l_orderkey") % 10 === 3) }
    t("append v6 (25%)") { st.append("src", li.filter(col("l_orderkey") % 4 === 2)) }
    st.createEmpty("replica", org.apache.spark.sql.types.StructType.fromDDL(
      "rid BIGINT, l_orderkey BIGINT, l_suppkey BIGINT, l_quantity DOUBLE"))

    val feed = t("feed read+cache") {
      val f = st.readChangesBetween("src", 0, st.currentVersion("src"),
        withRowIds = true).cache()
      f.count(); f
    }
    val counts = t("per-version counts") {
      feed.groupBy("_commit_version", "_change_type").count().collect()
        .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    }
    val versions = counts.keys.map(_._1).toSeq.distinct.sorted
    versions.foreach { v =>
      val b = feed.filter(col("_commit_version") === v)
      val nIns = counts.getOrElse((v, "insert"), 0L)
      val nUpd = counts.getOrElse((v, "update_postimage"), 0L)
      val nDel = counts.getOrElse((v, "delete"), 0L)
      val upserts = b
        .filter(col("_change_type").isin("insert", "update_postimage"))
        .select(col("_row_id").as("rid"), col("l_orderkey"),
          col("l_suppkey"), col("l_quantity"))
      // mirror cdc2's apply: insert-only commits append (fresh rids
      // can't collide), everything else merges on rid
      if (nIns > 0 && nUpd == 0 && nDel == 0)
        t(s"append v$v ($nIns)") { st.append("replica", upserts) }
      else {
        if (nIns + nUpd > 0) t(s"mergeUpsert v$v (${nIns + nUpd})") {
          st.mergeUpsert("replica", upserts,
            Seq("rid"), changeTypeCol = None, verifyUniqueSource = false)
        }
        if (nDel > 0) t(s"mergeDelete v$v ($nDel)") {
          st.mergeDelete("replica",
            b.filter(col("_change_type") === "delete")
              .select(col("_row_id").as("rid")), Seq("rid"))
        }
      }
    }
    t("final read") { st.read("replica").queryExecution.toRdd.count() }
    spark.stop()
  }
}
