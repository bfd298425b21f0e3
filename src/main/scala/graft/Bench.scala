package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

object Bench {

  /** The queries reported in the driver-parsed JSON line — one per
    * BASELINE.md headline row (jobs) plus the most expensive engine
    * primitives. The full per-query map for all registered queries is
    * written to target/bench_full.json; it can't go on the stdout line
    * because the driver's tail buffer truncates long lines (BENCH_r01/
    * r02 both came back "parsed": null from an ~2.5 KB line). */
  val headline: Seq[String] = Seq(
    "job_bronze_load", "job_bronze_full_refresh", "job_bronze_backfill",
    "job_bronze_quarantine", "job_silver", "job_gdpr_propagate",
    "job_dim_customer_scd2", "job_dim_merchant_scd2", "job_fact_star",
    "job_fact_full_refresh", "job_fact_load", "job_incremental",
    "job_silver_handoff", "j1_star_join", "m1_merge_composite",
    "d3_minhash_lsh", "d5_dedup_clusters", "e3_ann_lsh_topk",
    "d2_ngram_jaccard", "x4_asof_join", "x7_incremental_dedup",
    "x8_corpus_pipeline", "sql_mor_merge", "cdc2_rowid_replicate",
    "cdc3_rowid_compact_apply")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up executor threads, codegen compiler, and the FS cache so the
    // first timed query doesn't absorb session start-up (~3-4 s). The
    // warm-up time doubles as a co-tenant contention sentinel: r5's
    // recorded bench was poisoned by a contended machine (a trivial
    // projection read 395 s); a slow warm-up makes such a run
    // self-identifying in the artifact.
    val w0 = System.nanoTime()
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.all.foreach(t => Tables.load(spark, sfDir, t).count())
    val warmupSec = (System.nanoTime() - w0) / 1e9
    if (warmupSec > 30)
      System.err.println(f"[bench] WARNING: warm-up took $warmupSec%.1f s — machine likely contended; treat this run's timings as unreliable")
    // optional local-iteration filter: comma-separated query names as
    // args(0); the driver invokes with no args (all queries)
    val only: Option[Set[String]] = args.lift(0).map(_.split(",").toSet)
    // deterministic order so per-round numbers are comparable
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
      System.err.println(s"[bench] running $name")
      val t0 = System.nanoTime()
      // materialize through the PHYSICAL plan: df.count() would let
      // Catalyst prune every unreferenced projection (measuring a
      // different, cheaper query); toRdd.count() iterates the plan's
      // fully-evaluated UnsafeRows, so projections, casts, and derived
      // measures are all actually computed
      val ok =
        try { fn(spark, sfDir).queryExecution.toRdd.count(); true }
        catch { case e: Throwable =>
          // a throw must not read as a fast success (r5: 13 broken
          // queries recorded ~0.07 s each and LOWERED the total)
          failed += name
          System.err.println(s"[bench] FAILED $name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}")
          false
        }
      val sec = (System.nanoTime() - t0) / 1e9
      // isolate queries from each other: several cache intermediates
      // they hand back still-cached; 80 queries' worth of leaked blocks
      // fills storage memory and the GC pressure taxes every later
      // query (r02: a trivial 8-column projection read 26 s)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      name -> (if (ok) sec else -1.0)
    }
    def jsonMap(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    def jsonArr(ss: Seq[String]): String = ss.map("\"" + _ + "\"").mkString("[", ",", "]")
    val good = results.filter(_._2 >= 0)
    val total = good.map(_._2).sum
    Files.createDirectories(Paths.get("target"))
    val fullSep = if (results.isEmpty) "" else ","
    Files.write(Paths.get("target/bench_full.json"),
      (jsonMap(results).dropRight(1) +
        s"""$fullSep"_failed":${jsonArr(failed.toSeq)},"_warmup_sec":$warmupSec}""")
        .getBytes(StandardCharsets.UTF_8))
    val head = good.filter(r => headline.contains(r._1))
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":${jsonMap(head)},"queries_run":${good.size},"failed":${jsonArr(failed.toSeq)},"warmup_sec":$warmupSec,"sf":"$sfDir"}""")
    spark.stop()
  }
}
