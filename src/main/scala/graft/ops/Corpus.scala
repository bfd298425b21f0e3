package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-construction operators as reusable library surface (the
  * oracle-checked instances are x1/x2/x3 in QueriesCorpus).
  *
  * Determinism is the design center: sampling decisions hash the row's
  * own key (never rand()), and the packing prefix sum depends only on
  * the total order of `idCol` — so re-runs, executor counts, and
  * partitioning choices can never change the output corpus.
  */
object Corpus {

  /** Deterministic inclusion hash: first 8 hex chars of md5(key) —
    * uniform, replayable anywhere md5 exists. */
  def inclusionHash(key: Column): Column =
    substring(md5(key.cast("string")), 1, 8)

  /** First-occurrence key for passage dedup: packs (doc_id, segment
    * index) into ONE BIGINT so the min-keeper aggregate is a plain
    * long min (map-side combinable, stays in codegen) instead of a
    * struct compare. Valid only while `g < 1e6` and
    * `0 <= docId < Long.MaxValue / 1e6` — outside that range two
    * distinct (doc, g) pairs could collide or overflow and silently
    * corrupt first-occurrence ordering, so the packing itself raises
    * instead (one codegen'd branch per row; never fires on in-range
    * data). */
  def packedOcc(docId: Column, g: Column): Column = {
    val maxDoc = Long.MaxValue / 1000000L // 9.22e12 docs
    when(g < 0L || g >= 1000000L || docId < 0L || docId >= maxDoc,
      raise_error(concat(
        lit("packedOcc out of range (need 0 <= doc_id < 9.2e12, segment < 1e6): doc_id="),
        docId.cast("string"), lit(" g="), g.cast("string"))).cast("long"))
      .otherwise(docId * 1000000L + g)
  }

  /** Rate-based stratified sampling: keep rows whose hash falls under
    * the group's threshold ("80000000" = 50%, "40000000" = 25%, ...).
    * Pure narrow map+filter — no shuffle, no state. */
  def stratifiedSample(df: DataFrame, key: Column, group: Column,
                       thresholds: Map[String, String],
                       default: String): DataFrame = {
    val thr = thresholds.foldRight(lit(default)) { case ((g, t), acc) =>
      when(group === g, lit(t)).otherwise(acc)
    }
    df.filter(inclusionHash(key) < thr)
  }

  /** Exact per-group quotas: the hash order is a deterministic uniform
    * shuffle, so the first `quota` rows per group in hash order are an
    * exact uniform sample. */
  def quotaSample(df: DataFrame, key: Column, group: Column, quota: Int): DataFrame = {
    val w = Window.partitionBy(group).orderBy(inclusionHash(key).asc, key.asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= quota).drop("__rn")
  }

  /** Concat-and-chunk sequence packing: assign each document the bin of
    * its token-stream start position (`floor(start / budget)`), where
    * the stream concatenates documents in `idCol` order.
    *
    * The running sum is a DISTRIBUTED prefix sum: range-partition on
    * the id, per-partition window, then add per-partition offsets (a
    * driver-side cumsum over <= nPartitions totals). No global
    * data-sized window anywhere, and the result is INDEPENDENT of
    * nPartitions — the prefix sum is a pure function of the id order
    * (CorpusOpsSpec proves 1/4/32-partition equality and 20-run
    * stability under varying AQE/shuffle settings).
    *
    * Determinism: the range exchange samples its boundaries, so
    * `spark_partition_id()` is only meaningful for ONE physical
    * evaluation. We therefore materialize the partition assignment
    * exactly once (`localCheckpoint`) and derive BOTH the per-partition
    * cumsum and the per-partition totals from that same materialized
    * frame; the offsets become a <= nPartitions-entry CASE expression
    * computed on the driver. Two independent evaluations joined on
    * partition id (the round-4 bug) can never disagree again. */
  /** Guarded long view of a token-count column: a NULL count would
    * silently poison the prefix sums (null cumsum, null shard/bin, and
    * an unexplained driver NPE if a whole partition sums to null) —
    * raise at the row instead, like [[packedOcc]]. */
  private def tokensOrRaise(tokensCol: String): Column =
    when(col(tokensCol).isNull,
      raise_error(lit(s"null token count in '$tokensCol' — prefix-sum " +
        "ops need a concrete count per row")).cast("long"))
      .otherwise(col(tokensCol).cast("long"))

  /** The ONE-materialization distributed exclusive prefix sum both
    * [[packSequences]] and [[tokenBalancedShards]] are built on: range
    * partition by `sortCols`, pin the partition assignment with an
    * eager checkpoint, per-partition window cumsum, per-partition
    * totals collected as ≤ nPartitions driver rows whose exclusive
    * scan becomes a codegen'd CASE offset — no global sort, no
    * single-partition window, and (the round-4 bug class) no second
    * independent evaluation that could disagree with the first.
    * Returns the frame with `stream_start` attached plus the grand
    * total. */
  private def rangePrefixSum(withN: DataFrame, sortCols: Seq[Column],
                             nPartitions: Int): (DataFrame, Long) = {
    val t = withN
      .repartitionByRange(nPartitions, sortCols: _*)
      .withColumn("__p", spark_partition_id())
      .localCheckpoint() // pin ONE partition assignment for all consumers
    val wLocal = Window.partitionBy(col("__p")).orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = t.withColumn("__cum", sum(col("__n")).over(wLocal))
    val totals = t.groupBy(col("__p")).agg(sum(col("__n")).as("__pt"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = totals.map { case (p, pt) => val o = acc; acc += pt; (p, o) }
    val offExpr = offsets.foldLeft(lit(0L): Column) { case (e, (p, o)) =>
      when(col("__p") === p, lit(o)).otherwise(e)
    }
    (local.withColumn("stream_start", offExpr + col("__cum") - col("__n")), acc)
  }

  def packSequences(df: DataFrame, idCol: String, tokensCol: String,
                    budget: Long, nPartitions: Int = 32): DataFrame = {
    val (local, _) = rangePrefixSum(
      df.select(col(idCol), tokensOrRaise(tokensCol).as("__n")),
      Seq(col(idCol)), nPartitions)
    local
      .withColumn("bin", floor(col("stream_start") / budget))
      .select(col(idCol), col("__n").as("n_tokens"), col("stream_start"), col("bin"))
  }

  /** Weighted DATA MIXING to per-source token budgets — the
    * sampling-ratio step of training-corpus assembly (the published
    * practice behind Pile/DoReMi-style source weights: each source
    * contributes weight/weightDen of its token mass to the mix).
    * Documents are laid on the seeded md5 permutation WITHIN their
    * source (replayable anywhere md5 exists — never rand()) and taken
    * in that order until the source's exclusive token prefix crosses
    * budget = weight·src_total div weightDen; the boundary-straddling
    * document is included (budget met within one document's
    * granularity). All arithmetic is integer (src_start·weightDen <
    * weight·src_total), so the selection is exact at any corpus size
    * and bit-identical across engines.
    *
    * Scale shape: ONE global range-partitioned prefix sum ordered
    * (source, skey, id) — sources are contiguous runs of the global
    * order, so each source's exclusive prefix is recovered by
    * subtracting the run's first stream_start, a source-cardinality
    * aggregate broadcast back. Never a partitionBy(source) window:
    * source cardinality is tiny (tens), and windowing the corpus by it
    * would funnel 100 TB through |sources| tasks. Output is a pure
    * function of (id, tokens, source, weight, seed). */
  def weightedMix(df: DataFrame, idCol: String, tokensCol: String,
                  sourceCol: String, weightCol: String, weightDen: Long,
                  seed: Long, nPartitions: Int = 32): DataFrame = {
    require(weightDen > 0, s"weightDen must be positive: $weightDen")
    val (local, total) = rangePrefixSum(
      df.select(col(idCol), tokensOrRaise(tokensCol).as("__n"),
        col(sourceCol), col(weightCol).cast("long").as("__w"),
        md5(concat(col(idCol).cast("string"), lit(s":$seed"))).as("skey")),
      Seq(col(sourceCol), col("skey"), col(idCol)), nPartitions)
    require(total <= Long.MaxValue / weightDen.max(1L),
      s"prefix*weightDen would overflow a long: total=$total den=$weightDen")
    val perSrc = local.groupBy(col(sourceCol)).agg(
      min(col("stream_start")).as("__base"),
      sum(col("__n")).as("src_total"),
      max(col("__w")).as("__wmax"), min(col("__w")).as("__wmin"))
    // a weight must be a SOURCE property; two values inside one source
    // would make "its" budget ambiguous — refuse, don't pick. The check
    // lives INSIDE the filter's weight operand (a dropped side-column
    // would be pruned by Catalyst and never fire).
    val wChecked = when(col("__wmax") =!= col("__wmin"),
      raise_error(concat(lit("weightedMix: conflicting weights inside source "),
        col(sourceCol))).cast("long")).otherwise(col("__w"))
    local.join(broadcast(perSrc), Seq(sourceCol))
      .withColumn("src_start", col("stream_start") - col("__base"))
      .filter(col("src_start") * lit(weightDen) < wChecked * col("src_total"))
      .select(col(idCol), col(sourceCol), col("__n").as("n_tokens"),
        col("skey"), col("src_start"), col("src_total"),
        expr(s"(__w * src_total) DIV $weightDen").as("budget_tokens"))
  }

  /** Seeded deterministic corpus shuffle into ordered shards — the
    * "global shuffle" step before training-data serialization. Each
    * row's shuffle key is md5(id || ':' || seed): a uniform, replayable
    * permutation (same family as [[inclusionHash]] — never rand()).
    * Shard = the key's last hex nibble (16 balanced shards; compose
    * more nibbles for wider fan-out at larger scale), and `shard_pos`
    * orders rows WITHIN their shard by key — a per-shard window, so the
    * sort parallelizes across shards instead of one global ORDER BY.
    * Re-runs, executor counts, and partitioning can never change the
    * output: (shard, shard_pos) is a pure function of (id, seed). */
  def shuffleShards(df: DataFrame, idCol: Column, seed: Long): DataFrame = {
    val sharded = df
      .withColumn("skey", md5(concat(idCol.cast("string"), lit(s":$seed"))))
      .withColumn("shard",
        expr("instr('0123456789abcdef', substring(skey, 32, 1)) - 1").cast("int"))
    val w = Window.partitionBy(col("shard")).orderBy(col("skey"), idCol)
    sharded.withColumn("shard_pos", row_number().over(w).cast("long"))
  }

  /** Token-BALANCED shard export: the sharding that holds when document
    * lengths are heavy-tailed. [[shuffleShards]] balances shard
    * CARDINALITY; with skewed doc sizes one shard can carry a multiple
    * of another's token load — the straggler a training job then waits
    * on. Here each of `nShards` shards carries an equal TOKEN budget
    * (within one document's granularity): rows are laid on the seeded
    * md5 permutation (replayable anywhere md5 exists — never rand()),
    * the exclusive token prefix sum along that order is computed with
    * the same one-materialization scheme as [[packSequences]] (range
    * partition by key, per-partition window, ≤ nPartitions driver
    * offsets — no global sort, no single-partition window stage), and
    * `shard = start·S div total` carves contiguous equal-token key
    * ranges. Output is a pure function of (id, tokens, seed, nShards):
    * re-runs, executor counts, and partitioning can never change it —
    * provided `idCol` is unique (the permutation tie-breaks on it, the
    * same total-order contract [[packSequences]] relies on).
    * Overflow is asserted, not assumed: `start·S` must fit a long —
    * at S = 4096 that still allows ~2.2e15 total tokens (petabytes of
    * text) before the require fires. */
  def tokenBalancedShards(df: DataFrame, idCol: String, tokensCol: String,
                          nShards: Int, seed: Long,
                          nPartitions: Int = 32): DataFrame = {
    require(nShards > 0, s"nShards must be positive: $nShards")
    val (local, total) = rangePrefixSum(
      df.select(col(idCol), tokensOrRaise(tokensCol).as("__n"),
        md5(concat(col(idCol).cast("string"), lit(s":$seed"))).as("skey")),
      Seq(col("skey"), col(idCol)), nPartitions)
    require(total > 0, "token-balanced sharding needs a corpus with tokens")
    require(total <= Long.MaxValue / nShards,
      s"start*nShards would overflow a long: total=$total nShards=$nShards")
    // integer DIV end to end: double division would lose exactness past
    // 2^53 and flap shard boundaries at corpus scale. The LEAST clamp
    // only matters for zero-token rows at the very end of the stream
    // (start == total); real rows always land in [0, nShards).
    local
      .withColumn("shard",
        least(expr(s"(stream_start * $nShards) DIV $total"), lit(nShards - 1L))
          .cast("int"))
      .select(col(idCol), col("__n").as("n_tokens"), col("skey"),
        col("stream_start"), col("shard"))
  }

  // ------------------------------------------------------------------
  // Broadcast-Bloom membership: the zero-join scale path for "does this
  // row's key appear in a (much smaller) reference set", used by
  // decontamination (d6b). The reference side folds into a fixed-size
  // bitset with a distributed OR tree-aggregate (the same build shape
  // as Spark's own df.stat.bloomFilter); the corpus side tests
  // membership in one streaming pass of codegen'd expressions against
  // the broadcast bitset — no shuffle of corpus rows, no join. Bloom
  // admits false POSITIVES only, so the exact match set is always a
  // subset of the flagged set; a downstream exact verifier (or the d6
  // join on just the flagged survivors) removes the overhang.
  // ------------------------------------------------------------------

  /** The k bit positions for one key: pmod(xxhash64(key, seed_i), mBits)
    * for seed_i = 1..k. xxhash64 over the (key, i) tuple gives k
    * independent deterministic hashes — same expressions on the build
    * and probe side, all codegen'd. */
  private def bloomPositions(key: Column, mBits: Long, k: Int): Seq[Column] =
    (1 to k).map(i => pmod(xxhash64(key, lit(i)), lit(mBits)))

  /** Fold `keys`' distinct values into an mBits-wide Bloom bitset.
    * Returns the packed words (mBits/64 longs). The aggregate is a
    * treeAggregate whose per-partition state is the fixed-size bitset
    * itself — at 100 TB the reference set (an eval benchmark) is
    * millions of shingles and the bitset a few hundred MB, the same
    * driver-memory class as a broadcast-join hash map. Corpus size
    * never enters the build. */
  def bloomBuild(keys: DataFrame, key: Column, mBits: Long, k: Int): Array[Long] = {
    require(mBits % 64 == 0 && mBits > 0, s"mBits must be a positive multiple of 64: $mBits")
    val nWords = (mBits / 64).toInt
    val pos = keys.select(explode(array(bloomPositions(key, mBits, k): _*)).as("pos"))
    pos.rdd.map(_.getLong(0)).treeAggregate(new Array[Long](nWords))(
      (acc, p) => { acc((p >> 6).toInt) |= 1L << (p & 63); acc },
      (a, b) => { var i = 0; while (i < nWords) { a(i) |= b(i); i += 1 }; a })
  }

  /** Filter `df` to rows whose `key` is maybe-in-bloom. The bitset
    * rides in as a one-row broadcast DataFrame (a real Spark broadcast
    * shared by every task — never a plan-inlined literal), and the k
    * probes are plain shift/mask expressions inside whole-stage
    * codegen. Guarantee: every row whose key IS in the reference set
    * survives (no false negatives). */
  def bloomMaybeContains(df: DataFrame, key: Column,
                         bits: Array[Long], mBits: Long, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bloomDf = Seq(Tuple1(bits.toSeq)).toDF("__bloom_bits")
    val probed = df.crossJoin(broadcast(bloomDf))
    // each probe position gets a named column so the shift/mask test can
    // reference it from an expr string (variable-distance shifts have no
    // Column-API form)
    val test = bloomPositions(key, mBits, k).zipWithIndex.map { case (p, i) => (s"__p$i", p) }
    val withPos = test.foldLeft(probed) { case (d, (n, p)) => d.withColumn(n, p) }
    val cond = test.map { case (n, _) =>
      s"(element_at(__bloom_bits, CAST(shiftright($n, 6) AS INT) + 1)" +
        s" & shiftleft(1L, CAST($n % 64 AS INT))) != 0"
    }.mkString(" AND ")
    withPos.filter(expr(cond)).drop("__bloom_bits" +: test.map(_._1): _*)
  }
}
