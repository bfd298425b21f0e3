package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measured scaling evidence for the dedup family's 100 TB claims: build
  * replicated corpora at 1x/4x/16x the sf0.1 documents table and time
  *  - d1-style exact dedup (hash aggregate — expect ~linear),
  *  - the minhash band-index build (per-doc signatures — expect ~linear,
  *    the part that parallelizes across executors), and
  *  - the x7-style incremental admission probe of a FIXED 500-doc batch
  *    against each index (expect far-sublinear: candidates come from the
  *    band equi-join, corpus re-shingling is semi-joined to candidates —
  *    O(batch x dup-multiplicity), never O(corpus)).
  * Replicas carry a per-copy tag word so they stay near-dups (realistic
  * heavy-duplication corpora) without being byte-identical. Run:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.ScaleProbe"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect() // warm

    val base = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val nBase = base.count()

    def corpus(k: Int): DataFrame =
      (0 until k).map { i =>
        base.select((col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
          concat(col("text"), lit(s" copytag$i")).as("text"))
      }.reduce(_ unionByName _)

    def shingles(d: DataFrame): DataFrame = d
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(w) - 2), " +
          "i -> concat(element_at(w, i), ' ', element_at(w, i + 1), ' ', element_at(w, i + 2)))"))
        .as("shingle"))
      .select(col("doc_id"), xxhash64(col("shingle")).as("h"))
      .distinct()

    def t(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }

    // fixed probe batch: 500 docs drawn from the base corpus (they have
    // near-dups in every replica — the worst realistic admission case)
    val batch = base.filter(col("doc_id") % (nBase / 500).max(1L) === 0L)
      .select((col("doc_id") + lit(900000000L)).as("doc_id"), col("text"))
    val batchSh = shingles(batch).localCheckpoint()
    val batchBands = graft.ops.Dedup.minhashBands(batchSh, "doc_id", "h")
      .localCheckpoint()

    for (k <- Seq(1, 4, 16)) {
      val c = corpus(k).localCheckpoint() // pin: probe timings exclude corpus synthesis
      val csh = shingles(c)
      val (exactSec, nExact) = t {
        c.groupBy(col("text")).agg(min(col("doc_id"))).count()
      }
      var index: DataFrame = null
      val (indexSec, nIndex) = t {
        index = graft.ops.Dedup.minhashBands(csh, "doc_id", "h").localCheckpoint()
        index.count()
      }
      val (probeSec, nRejected) = t {
        graft.ops.Dedup.nearDupsAgainstIndex(
          batchBands, index, batchSh, csh, "doc_id", "h", threshold = 0.5).count()
      }
      println(f"""{"k":$k,"docs":${nBase * k},"exact_sec":$exactSec%.2f,""" +
        f""""index_sec":$indexSec%.2f,"index_rows":$nIndex,""" +
        f""""probe_sec":$probeSec%.2f,"batch":500,"rejected":$nRejected}""")
    }

    // ---- d6b bloom decontamination: FIXED benchmark side, growing
    // train corpus. The bloom probe is a narrow no-shuffle pass, so its
    // time should track raw scan+hash throughput (gentle slope, cores
    // absorb it); d6's exact inverted-index join shuffles |train
    // shingles| and is the cost the bloom pass avoids. ----
    def shingles8raw(d: DataFrame): DataFrame = d
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), explode(expr(
        // guard: size(w) < 8 would make sequence() descend and slice() throw
        "transform(IF(size(w) >= 8, sequence(1, size(w) - 7), array()), " +
          "i -> array_join(slice(w, i, 8), ' '))"))
        .as("shingle"))
    val mBits = 1L << 21
    val kHash = 5
    val benchSide = base.filter(col("doc_id") % 20 < 2) // fixed: the eval benchmark
    val buildT0 = System.nanoTime()
    val bits = graft.ops.Corpus.bloomBuild(
      shingles8raw(benchSide), col("shingle"), mBits, kHash)
    val buildSec = (System.nanoTime() - buildT0) / 1e9
    for (k <- Seq(1, 4, 16)) {
      val train = corpus(k).filter(col("doc_id") % 20 >= 2).localCheckpoint()
      val (bloomSec, nFlagged) = t {
        graft.ops.Corpus.bloomMaybeContains(
            shingles8raw(train), col("shingle"), bits, mBits, kHash)
          .select(col("doc_id")).distinct().count()
      }
      val (exactSec, nExact) = t {
        shingles8raw(train).join(
            broadcast(shingles8raw(benchSide).select(col("shingle")).distinct()),
            Seq("shingle"))
          .select(col("doc_id")).distinct().count()
      }
      println(f"""{"d6b_k":$k,"bloom_build_sec":$buildSec%.2f,""" +
        f""""bloom_probe_sec":$bloomSec%.2f,"flagged":$nFlagged,""" +
        f""""exact_join_sec":$exactSec%.2f,"exact":$nExact}""")
    }
    spark.stop()
  }
}
