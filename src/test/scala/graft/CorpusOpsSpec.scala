package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Corpus

/** Determinism properties of the corpus ops: outputs are pure
  * functions of the data — partitioning, executor counts, and input
  * row order can never change them. */
class CorpusOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  private def docs(seed: Long) = {
    val rnd = new scala.util.Random(seed)
    (0L until 500L).map(i => (i, rnd.nextInt(300) + 5, s"g${i % 5}"))
      .toDF("id", "tok", "grp")
  }

  test("packSequences is independent of partitioning and input order") {
    val base = docs(1)
    val ref = Corpus.packSequences(base, "id", "tok", 256, nPartitions = 1)
      .collect().map(_.toSeq).toSet
    for (n <- Seq(4, 32)) {
      val got = Corpus.packSequences(base.orderBy(rand(seed = n)), "id", "tok",
          256, nPartitions = n)
        .collect().map(_.toSeq).toSet
      assert(got === ref, s"nPartitions=$n")
    }
    // invariants: stream starts are the exclusive prefix sum in id order;
    // bins are monotone non-decreasing
    val rows = Corpus.packSequences(base, "id", "tok", 256)
      .orderBy("id").collect()
    var cum = 0L
    rows.foreach { r =>
      assert(r.getLong(2) === cum, s"start mismatch at id ${r.getLong(0)}")
      assert(r.getLong(3) === cum / 256)
      cum += r.getLong(1)
    }
  }

  test("packSequences is stable across 20 re-runs under varying AQE/shuffle settings") {
    // Round-4 regression gate: the old implementation joined TWO
    // independent physical evaluations of a sampled range exchange on
    // spark_partition_id(), so AQE coalescing or boundary re-sampling
    // could attach offsets to the wrong partitions. The rewrite pins
    // one materialized assignment; 20 runs while toggling AQE
    // coalescing and shuffle partitioning must be bit-identical.
    val base = docs(7)
    val expected = Corpus.packSequences(base, "id", "tok", 256, nPartitions = 1)
      .collect().map(_.toSeq).toSet
    val conf = spark.conf
    val savedCoalesce = conf.get("spark.sql.adaptive.coalescePartitions.enabled", "true")
    val savedShuffle = conf.get("spark.sql.shuffle.partitions")
    try {
      for (i <- 0 until 20) {
        conf.set("spark.sql.adaptive.coalescePartitions.enabled",
          (i % 2 == 0).toString)
        conf.set("spark.sql.shuffle.partitions", Seq("3", "7", "32", "64")(i % 4))
        val got = Corpus.packSequences(base.orderBy(rand(seed = i)), "id", "tok",
            256, nPartitions = Seq(2, 5, 17, 32)(i % 4))
          .collect().map(_.toSeq).toSet
        assert(got === expected, s"run $i diverged")
      }
    } finally {
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", savedCoalesce)
      conf.set("spark.sql.shuffle.partitions", savedShuffle)
    }
  }

  test("sampling is a pure function of the key (repartition-stable)") {
    val base = docs(2)
    val thr = Map("g0" -> "80000000", "g1" -> "40000000")
    val a = Corpus.stratifiedSample(base, col("id"), col("grp"), thr, "20000000")
      .select("id").as[Long].collect().toSet
    val b = Corpus.stratifiedSample(base.repartition(17).orderBy(rand(3)),
        col("id"), col("grp"), thr, "20000000")
      .select("id").as[Long].collect().toSet
    assert(a === b)

    val qa = Corpus.quotaSample(base, col("id"), col("grp"), 10)
    val qb = Corpus.quotaSample(base.repartition(13), col("id"), col("grp"), 10)
    assert(qa.select("id").as[Long].collect().toSet ===
      qb.select("id").as[Long].collect().toSet)
    // exact quota per group
    assert(qa.groupBy("grp").count().collect().forall(_.getLong(1) === 10))
  }

  test("shuffleShards: partition-count invariant, balanced, seed-sensitive") {
    val docs = (1L to 4000L).toDF("id")
    def run(parts: Int): Map[Long, (Int, Long)] =
      graft.ops.Corpus.shuffleShards(docs.repartition(parts), col("id"), 7L)
        .select(col("id"), col("shard"), col("shard_pos"))
        .as[(Long, Int, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val a = run(1)
    assert(a === run(32), "sharding must not depend on physical partitioning")
    // balance: uniform hash nibble -> every shard within 2x of the mean
    val sizes = a.values.groupBy(_._1).view.mapValues(_.size)
    assert(sizes.size === 16)
    assert(sizes.values.max < 2 * 250 && sizes.values.min > 250 / 2, s"skew: $sizes")
    // positions are a dense 1..n permutation within each shard
    a.values.groupBy(_._1).foreach { case (shard, rows) =>
      assert(rows.map(_._2).toSeq.sorted === (1L to rows.size).toSeq,
        s"shard $shard positions not dense")
    }
    // a different seed is a genuinely different permutation
    val b = graft.ops.Corpus.shuffleShards(docs, col("id"), 8L)
      .select(col("id"), col("shard")).as[(Long, Int)].collect().toMap
    assert(a.count { case (id, (sh, _)) => b(id) == sh } < 1000,
      "seed change must reshuffle most rows")
  }

  test("tokenBalancedShards: equal token budgets, partition-invariant, contiguous") {
    // heavy-tailed doc lengths: a few docs carry most tokens — the case
    // where count-balanced sharding (x11) token-skews and this op must not
    val rnd = new scala.util.Random(11)
    val docs = (1L to 2000L).map { i =>
      val n = if (rnd.nextInt(50) == 0) 5000L + rnd.nextInt(5000) // whales
              else 1L + rnd.nextInt(100)
      (i, n)
    }.toDF("id", "tok")
    val S = 16
    def run(parts: Int): Array[(Long, Long, String, Long, Int)] =
      graft.ops.Corpus.tokenBalancedShards(docs.repartition(parts max 1),
          "id", "tok", nShards = S, seed = 7L, nPartitions = parts)
        .as[(Long, Long, String, Long, Int)].collect().sortBy(_._1)
    val a = run(1)
    assert(a.sameElements(run(32)), "sharding must not depend on partitioning")
    val total = a.map(_._2).sum
    val maxDoc = a.map(_._2).max
    val byShard = a.groupBy(_._5).view.mapValues(_.map(_._2).sum).toMap
    assert(byShard.keySet === (0 until S).toSet, s"missing shards: $byShard")
    // each shard's tokens within one document of the ideal budget — the
    // whole point vs count-balanced sharding under heavy-tailed lengths
    byShard.foreach { case (sh, t) =>
      assert(t <= total / S + maxDoc && t >= total / S - maxDoc,
        s"shard $sh tokens $t vs budget ${total / S} (maxDoc $maxDoc)")
    }
    // shards are CONTIGUOUS ranges of the permutation: ordering by
    // (skey, id), shard ids never decrease
    val inOrder = a.sortBy(r => (r._3, r._1)).map(_._5)
    assert(inOrder.zip(inOrder.tail).forall { case (x, y) => x <= y },
      "shards must be contiguous key ranges")
    // prefix sum is exact: start = sum of earlier docs' tokens
    var cum = 0L
    a.sortBy(r => (r._3, r._1)).foreach { r =>
      assert(r._4 === cum, s"start mismatch at id ${r._1}"); cum += r._2
    }
  }

  test("weightedMix: per-source budgets hit within one document, partition-invariant, seeded") {
    val rnd = new scala.util.Random(23)
    val docs = (1L to 3000L).map { i =>
      val src = s"s${(i % 5).toInt}"
      val n = if (rnd.nextInt(40) == 0) 2000L + rnd.nextInt(3000)
              else 1L + rnd.nextInt(80)
      (i, src, n, (i % 5) % 4 + 1) // weights 1..4 per source, /8 of its mass
    }.toDF("id", "source", "tok", "wgt")
    def run(parts: Int): Array[(Long, String, Long, String, Long, Long, Long)] =
      Corpus.weightedMix(docs.repartition(parts max 1), "id", "tok",
          "source", "wgt", weightDen = 8L, seed = 3L, nPartitions = parts)
        .as[(Long, String, Long, String, Long, Long, Long)].collect().sortBy(_._1)
    val a = run(1)
    assert(a.sameElements(run(32)), "mix must not depend on partitioning")
    val bySrc = a.groupBy(_._2)
    val srcTotals = docs.groupBy(col("source")).agg(sum(col("tok")))
      .as[(String, Long)].collect().toMap
    bySrc.foreach { case (src, rows) =>
      val budget = rows.head._7
      val w = (src.stripPrefix("s").toLong % 4) + 1
      assert(budget === w * srcTotals(src) / 8, s"$src budget")
      val sel = rows.map(_._3).sum
      val lastDoc = rows.maxBy(_._5) // largest src_start = boundary doc
      // budget met, overshoot bounded by the straddling document
      assert(sel >= budget && sel < budget + lastDoc._3,
        s"$src selected $sel vs budget $budget (+doc ${lastDoc._3})")
      // selection is exactly the permutation prefix: starts are a
      // gapless cumsum of the selected docs' tokens
      var cum = 0L
      rows.sortBy(r => (r._4, r._1)).foreach { r =>
        assert(r._5 === cum, s"$src start mismatch at id ${r._1}"); cum += r._3
      }
    }
    // a different seed draws a different prefix (different documents)
    val b = Corpus.weightedMix(docs, "id", "tok", "source", "wgt", 8L, seed = 99L)
      .as[(Long, String, Long, String, Long, Long, Long)].collect()
    assert(b.map(_._1).toSet !== a.map(_._1).toSet, "seed must change the draw")
  }

  test("weightedMix refuses conflicting weights inside one source") {
    val df = Seq((1L, "s0", 10L, 1L), (2L, "s0", 10L, 2L), (3L, "s1", 10L, 1L))
      .toDF("id", "source", "tok", "wgt")
    val e = intercept[Exception](
      Corpus.weightedMix(df, "id", "tok", "source", "wgt", 8L, 1L).collect())
    assert(e.getMessage.contains("conflicting weights")
      || String.valueOf(e.getCause).contains("conflicting weights"))
  }

  test("prefix-sum ops raise on null token counts instead of silently " +
      "dropping rows into a null shard/bin") {
    val df = Seq((1L, java.lang.Long.valueOf(5L)), (2L, null.asInstanceOf[java.lang.Long]))
      .toDF("id", "tok")
    val e1 = intercept[Exception](
      Corpus.tokenBalancedShards(df, "id", "tok", nShards = 4, seed = 1L).collect())
    assert(e1.getMessage.contains("null token count")
      || String.valueOf(e1.getCause).contains("null token count"))
    val e2 = intercept[Exception](
      Corpus.packSequences(df, "id", "tok", budget = 16).collect())
    assert(e2.getMessage.contains("null token count")
      || String.valueOf(e2.getCause).contains("null token count"))
  }

  test("bloomMaybeContains has zero false negatives and bounded false positives") {
    val mBits = 1L << 16 // deliberately small so FPs are observable
    val k = 5
    val ref = (0 until 2000).map(i => s"ref_$i").toDF("key")
    val bits = Corpus.bloomBuild(ref, col("key"), mBits, k)
    // load factor sanity: build set some bits, far fewer than mBits
    val set = bits.map(java.lang.Long.bitCount).sum
    assert(set > 2000 && set < mBits / 2, s"bit count $set")
    // probe side: the full ref set + disjoint negatives
    val probe = ((0 until 2000).map(i => s"ref_$i") ++
      (0 until 20000).map(i => s"neg_$i")).toDF("key")
    val kept = Corpus.bloomMaybeContains(probe, col("key"), bits, mBits, k)
      .as[String].collect().toSet
    // Bloom guarantee: every reference key survives
    assert((0 until 2000).forall(i => kept(s"ref_$i")), "false negative!")
    // FP rate at this load (~2000*5/65536 = 0.15 bits set): (1-e^-0.15)^5
    // ~ 5e-5 — allow 50x headroom before calling it broken
    val fps = kept.count(_.startsWith("neg_"))
    assert(fps <= 50, s"implausible FP count $fps / 20000")
    // probe must not leak helper columns
    val cols = Corpus.bloomMaybeContains(probe, col("key"), bits, mBits, k).columns
    assert(cols.toSeq === Seq("key"))
  }

  private val sfDir = "/root/testdata/sf0.001"

  test("x14 passage dedup keeps every distinct segment exactly once") {
    val out = Queries.all("x14_passage_dedup").fn(spark, sfDir).cache()
    // corpus-wide: Σ n_kept == |distinct 10-word segments| (each keeper
    // is one distinct segment; nothing vanishes, nothing survives twice)
    val distinctSegs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(explode(expr(
        "transform(sequence(0, cast(ceil(size(w) / 10.0) as int) - 1), " +
          "g -> array_join(slice(w, g * 10 + 1, 10), ' '))")).as("seg"))
      .distinct().count()
    val agg = out.agg(sum("n_kept"), sum("n_segs"), count(lit(1))).first()
    assert(agg.getLong(0) === distinctSegs)
    assert(agg.getLong(0) <= agg.getLong(1), "kept cannot exceed total")
    // every doc present, even fully-deduped ones
    assert(agg.getLong(2) === Tables.documents(spark, sfDir).count())
    // the earliest doc can lose segments only to ITSELF: its n_kept is
    // exactly its own distinct-segment count
    val d0 = out.orderBy("doc_id").first()
    val d0segs = Tables.documents(spark, sfDir)
      .filter(col("doc_id") === d0.getLong(0))
      .select(explode(expr(
        "transform(sequence(0, cast(ceil(size(split(text, ' ')) / 10.0) as int) - 1), " +
          "g -> array_join(slice(split(text, ' '), g * 10 + 1, 10), ' '))")).as("seg"))
      .distinct().count()
    assert(d0.getAs[Long]("n_kept") === d0segs)
  }

  test("x13 DSIR selects only raw-side docs with dense descending ranks") {
    val out = Queries.all("x13_dsir_resample").fn(spark, sfDir).cache()
    val rows = out.orderBy("rank").collect()
    assert(rows.map(_.getAs[Int]("rank")).toSeq === (1 to rows.length))
    // weights non-increasing in rank order (rounded ties broken by id)
    val ws = rows.map(_.getAs[Double]("dsir_w"))
    assert(ws.zip(ws.tail).forall { case (a, b) => a >= b })
    // no target-side (src0/src1) doc can be selected
    val tgtSelected = out.join(
      Tables.documents(spark, sfDir).filter(col("source").isin("src0", "src1")),
      Seq("doc_id")).count()
    assert(tgtSelected === 0L)
  }

  test("x17 split never separates near-dup cluster-mates") {
    val out = Queries.all("x17_leakage_safe_split").fn(spark, sfDir).cache()
    // the defining property: one split per split_key (clusters included)
    val straddling = out.groupBy("split_key")
      .agg(countDistinct(col("split")).as("s"))
      .filter(col("s") > 1).count()
    assert(straddling === 0L)
    // both splits exist and every doc is assigned exactly once
    assert(out.select("split").distinct().count() === 2L)
    assert(out.count() === Tables.documents(spark, sfDir).count())
    assert(out.select("doc_id").distinct().count() === out.count())
  }

  test("t10 gopher flags are consistent with their stats and both verdicts occur") {
    val out = Queries.all("t10_gopher_rules").fn(spark, sfDir).cache()
    val bad = out.filter(
      (col("flag_wc") =!= (col("n_words") >= 40 && col("n_words") <= 100000)) ||
      (col("flag_mwl") =!= (col("mean_wl") >= 4.0 && col("mean_wl") <= 10.0)) ||
      (col("flag_stop") =!= (col("n_stop") >= 4)) ||
      (col("flag_rep") =!= (col("top_frac") <= 0.12)) ||
      (col("keep") =!= (col("flag_wc") && col("flag_mwl") &&
        col("flag_stop") && col("flag_rep")))).count()
    assert(bad === 0L)
    val verdicts = out.select("keep").distinct().count()
    assert(verdicts === 2L, "thresholds must split the corpus")
  }
}
