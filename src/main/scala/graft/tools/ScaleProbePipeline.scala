package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measured scaling evidence for the r7 pipeline additions: replicate
  * the sf0.1 documents table 1x/4x/16x (per-copy tag word, as
  * ScaleProbe) and time
  *  - x14-style passage dedup (segment explode -> min-keeper aggregate
  *    -> ordered reassembly; expect ~linear in corpus — one map-side-
  *    combinable shuffle of segments, no pairwise anything), and
  *  - x13-style DSIR weighting (bigram bucket pass + 256-row broadcast
  *    score join + per-doc aggregate + top-k; expect ~linear scan-bound
  *    with the fixed-size distribution tables constant).
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *        sbt "runMain graft.tools.ScaleProbePipeline"
  */
object ScaleProbePipeline {
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
      .select(col("doc_id"), col("text"), col("source"))
    val nBase = base.count()

    def corpus(k: Int): DataFrame =
      (0 until k).map { i =>
        base.select((col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
          concat(col("text"), lit(s" copytag$i")).as("text"), col("source"))
      }.reduce(_ unionByName _)

    def t(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }

    // args(0) == "t16" runs only the merge-depth probe (local iteration)
    val scaleKs = if (args.headOption.contains("t16")) Seq.empty[Int] else Seq(1, 4, 16)
    for (k <- scaleKs) {
      val c = corpus(k).localCheckpoint() // pin: timings exclude synthesis

      // x14 passage dedup core (10-word segments, min-keeper, reassembly)
      val (dedupSec, nDocs) = t {
        val segs = c
          .select(col("doc_id"), split(col("text"), " ").as("w"))
          .select(col("doc_id"), explode(expr(
            "transform(sequence(0, cast(ceil(size(w) / 10.0) as int) - 1), " +
              "g -> struct(g as g, array_join(slice(w, g * 10 + 1, 10), ' ') as seg))"))
            .as("x"))
          .select(col("doc_id"), col("x.g").as("g"), col("x.seg").as("seg"),
            graft.ops.Corpus.packedOcc(col("doc_id"), col("x.g")).as("occ"))
        val keep = segs.groupBy(col("seg")).agg(min(col("occ")).as("keeper"))
        segs.join(keep, Seq("seg"))
          .groupBy(col("doc_id"))
          .agg(count(when(col("occ") === col("keeper"), 1)).as("n_kept"))
          .count()
      }

      // x13 DSIR core (bigram buckets, smoothed dists, score, top-100)
      val (dsirSec, nTop) = t {
        val toks = c
          .select(col("doc_id"), col("source"), split(col("text"), " ").as("w"))
          .select(col("doc_id"), col("source"),
            explode(expr("transform(sequence(1, size(w) - 1), " +
              "i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))"))
              .as("gram"))
          .withColumn("md5_g", md5(col("gram")))
          .select(col("doc_id"), col("source"),
            ((expr("locate(substring(md5_g, 1, 1), '0123456789abcdef') - 1") * 16 +
              expr("locate(substring(md5_g, 2, 1), '0123456789abcdef') - 1"))
              .cast("int")).as("b"))
        val isTgt = col("source").isin("src0", "src1")
        val spine = spark.range(256).select(col("id").cast("int").as("b"))
        val cnts = toks.withColumn("tgt", isTgt)
          .groupBy(col("tgt"), col("b")).agg(count(lit(1)).as("c"))
        val totals = cnts.groupBy(col("tgt")).agg(sum(col("c")).as("total"))
        def dist(tgt: Boolean) =
          spine.crossJoin(totals.filter(col("tgt") === tgt).select(col("total")))
            .join(cnts.filter(col("tgt") === tgt).select(col("b"), col("c")),
              Seq("b"), "left_outer")
            .select(col("b"), ((coalesce(col("c"), lit(0L)) + lit(0.5)) /
              (col("total") + lit(128.0))).as("p"))
        val score = dist(tgt = true).withColumnRenamed("p", "pt")
          .join(dist(tgt = false).withColumnRenamed("p", "pr"), Seq("b"))
          .select(col("b"), log(col("pt") / col("pr")).as("sc"))
        toks.filter(!isTgt)
          .join(broadcast(score), Seq("b"))
          .groupBy(col("doc_id"))
          .agg(round(avg(col("sc")), 6).as("dsir_w"))
          .orderBy(col("dsir_w").desc, col("doc_id").asc).limit(100)
          .count()
      }

      // x18 ExactSubstr core (sliding 10-token windows as xxhash64
      // longs, min-keeper, keeper-coverage reconstruction) — 10x x14's
      // window density; expect the same ~linear shape since windows
      // move as 8-byte longs and the keeper pick map-side combines
      val (substrSec, nSub) = t {
        val L = 10
        val toks = c.select(col("doc_id"), split(col("text"), " ").as("w"))
        val wins = toks
          .select(col("doc_id"), explode(expr(
            s"transform(IF(size(w) >= $L, sequence(0, size(w) - $L), array()), " +
              s"g -> struct(g as g, xxhash64(array_join(slice(w, g + 1, $L), ' ')) as wh))"))
            .as("x"))
          .select(col("doc_id"), col("x.g").as("g"), col("x.wh").as("wh"),
            graft.ops.Corpus.packedOcc(col("doc_id"), col("x.g")).as("occ"))
        val keep = wins.groupBy(col("wh")).agg(min(col("occ")).as("keeper"))
        wins.join(keep, Seq("wh")).filter(col("occ") === col("keeper"))
          .select(col("doc_id"), explode(expr(s"sequence(g, g + ${L - 1})")).as("i"))
          .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
          .count()
      }

      // x19 token-balanced shards (seeded permutation + range-partitioned
      // prefix sum + integer-DIV shard carve; expect ~linear — one range
      // Exchange + per-partition window, offsets bounded by nPartitions)
      val (shardSec, nShards) = t {
        graft.ops.Corpus.tokenBalancedShards(
          c.select(col("doc_id"), size(split(col("text"), " ")).as("tok")),
          idCol = "doc_id", tokensCol = "tok", nShards = 16, seed = 42L)
          .groupBy(col("shard")).agg(sum(col("n_tokens")))
          .count()
      }

      // t13 repetition rules (2/3/5-gram union into ONE count aggregate,
      // per-doc conditional covers; expect ~linear — two map-side-
      // combinable shuffles of gram-count rows, no window, no self-join)
      val (repSec, nRep) = t {
        val d = c.select(col("doc_id"),
          length(col("text")).cast("long").as("n_chars"),
          split(col("text"), " ").as("w"))
        def grams(n: Int) = d.select(col("doc_id"), lit(n).as("n"),
          explode(expr(s"transform(IF(size(w) >= $n, sequence(1, size(w) - ${n - 1}), " +
            s"array()), i -> array_join(slice(w, i, $n), ' '))")).as("gram"))
        grams(2).unionByName(grams(3)).unionByName(grams(5))
          .groupBy(col("doc_id"), col("n"), col("gram"))
          .agg(count(lit(1)).as("c"))
          .withColumn("cover", col("c") * length(col("gram")).cast("long"))
          .groupBy(col("doc_id"))
          .agg(max(when(col("n") === 2, col("cover"))).as("t2c"),
            max(when(col("n") === 3, col("cover"))).as("t3c"),
            sum(when(col("n") === 5 && col("c") > 1, col("cover"))
              .otherwise(lit(0L))).as("d5c"))
          .count()
      }

      // t16 BPE APPLY with a FIXED merge table (train-once/apply-
      // everywhere: the learned merges are constants at apply time).
      // All K tiers fuse into ONE narrow projection — K nested
      // left-to-right replaces in a single codegen stage, zero corpus
      // shuffles; the only exchanges are the vocabulary-sized distinct
      // and the per-doc hash agg. Expect ~linear in corpus size.
      val (bpeSec, nEnc) = t {
        val merges = Seq("a the", "of a_the", "in b", "c d", "e f")
        val enc = merges.foldLeft(
          concat(lit("|"), array_join(split(col("text"), " "), "||"), lit("|"))) {
          (cc, p) => org.apache.spark.sql.functions.replace(cc,
            lit("|" + p.replace(" ", "||") + "|"),
            lit("|" + p.replace(" ", "_") + "|"))
        }
        val toks = c.select(col("doc_id"), enc.as("t"))
          .select(col("doc_id"),
            split(expr("substring(t, 2, length(t) - 2)"), "\\|\\|").as("w"))
          .select(col("doc_id"), posexplode(col("w")))
          .select(col("doc_id"), col("pos").as("i"), col("col").as("tok"))
        val vocab = graft.ops.SurrogateKeys.byOrder(
          toks.select("tok").distinct(), "tid", Seq(col("tok")))
        toks.join(broadcast(vocab), Seq("tok"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"))
          .count()
      }

      // x20 weighted mix: expect ~linear (one range prefix sum + a
      // source-cardinality broadcast; source count stays constant as
      // the corpus replicates, so no stage narrows with scale)
      val (mixSec, nMix) = t {
        graft.ops.Corpus.weightedMix(
          c.select(col("doc_id"), col("source"),
            size(split(col("text"), " ")).cast("long").as("tok"),
            (expr("CAST(substring(source, 4) AS BIGINT)") % 4 + 1).as("wgt")),
          "doc_id", "tok", "source", "wgt", weightDen = 8L, seed = 77L).count()
      }

      println(f"""{"k":$k,"docs":${nBase * k},"passage_dedup_sec":$dedupSec%.2f,""" +
        f""""dedup_docs":$nDocs,"mix_sec":$mixSec%.2f,"mix_docs":$nMix,""" +
        f""""dsir_sec":$dsirSec%.2f,"dsir_top":$nTop,""" +
        f""""exact_substr_sec":$substrSec%.2f,"substr_docs":$nSub,""" +
        f""""token_shards_sec":$shardSec%.2f,"shards":$nShards,""" +
        f""""repetition_sec":$repSec%.2f,"rep_docs":$nRep,""" +
        f""""bpe_apply_sec":$bpeSec%.2f,"bpe_docs":$nEnc}""")
    }

    // ---- t16 apply at MERGE-TABLE DEPTH K (r9 VERDICT #8): the fused
    // projection is K nested replaces in one codegen stage at K=5; a
    // realistic merge table is far deeper. Probe K=5/25/50 on the 4x
    // corpus: the per-K walls must stay ~flat-to-linear (a codegen
    // bailout to interpreted eval would jump superlinearly) and the
    // generated code must stay ONE WholeStageCodegen span with its
    // source under the 64 KB JIT ceiling. Merge pairs come from a
    // one-pass top-K of adjacent pairs — apply cost depends only on
    // table depth, not on how the table was learned. ----
    {
      val c4 = corpus(4).localCheckpoint()
      val pairs = c4.select(split(col("text"), " ").as("w"))
        .select(explode(expr("transform(sequence(1, size(w) - 1), " +
          "i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))")).as("p"))
        .groupBy("p").count()
        .orderBy(col("count").desc, col("p").asc).limit(50)
        .collect().map(_.getString(0)).toSeq
      for (k <- Seq(5, 25, 50)) {
        val enc = pairs.take(k).foldLeft(
          concat(lit("|"), array_join(split(col("text"), " "), "||"), lit("|"))) {
          (cc, p) => org.apache.spark.sql.functions.replace(cc,
            lit("|" + p.replace(" ", "||") + "|"),
            lit("|" + p.replace(" ", "_") + "|"))
        }
        val df = c4.select(col("doc_id"), enc.as("t"))
          .select(sum(length(col("t"))).as("n"))
        // collect(), not head(): head(n) executes limit(n)'s OWN
        // QueryExecution, leaving df's AQE plan unmaterialized — the
        // introspection below then reads 0 stages / 0 bytes (vacuous)
        val (sec, n) = t(df.collect()(0).getLong(0))
        // codegen introspection AFTER execution: under AQE the
        // pre-execution executedPlan is a bare AdaptiveSparkPlanExec
        // with no WholeStageCodegen children yet. Post-collect() the
        // same QueryExecution holds the materialized final plan.
        val finalPlan = df.queryExecution.executedPlan match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            a.executedPlan
          case p => p
        }
        // executedPlan.toString renders codegen'd nodes as "*(id)"
        // prefixes (the literal word only appears in formatted explain);
        // distinct ids = whole-stage spans
        val stages = raw"\*\((\d+)\)".r
          .findAllMatchIn(finalPlan.toString).map(_.group(1)).toSet.size
        // per-stage generated source + compiled max-method bytecode:
        // the JIT refuses methods over ~8000 bytecodes (runs them
        // interpreted), so maxMethod is the number that must stay sane
        val gen = org.apache.spark.sql.execution.debug
          .codegenStringSeq(finalPlan)
        val maxSrc = gen.map(_._2.length).maxOption.getOrElse(0)
        val maxMethod = gen.map(_._3.maxMethodCodeSize).maxOption.getOrElse(0)
        println(f"""{"t16_k":$k,"apply_sec":$sec%.2f,"out_chars":$n,""" +
          f""""codegen_stages":$stages,"max_gen_src_chars":$maxSrc,""" +
          f""""max_method_bytecode":$maxMethod}""")
      }
    }
    spark.stop()
  }
}
