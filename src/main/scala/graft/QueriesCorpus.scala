package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-construction operators a large-scale training-data pipeline
  * needs beyond dedup/ANN (QueriesLlm): benchmark decontamination,
  * deterministic stratified sampling / per-group quotas for corpus
  * mixing, and sequence packing — plus the ROLLUP/PIVOT analytics
  * surface over the relational tables.
  *
  * Everything is set-based and deterministic: sampling decisions hash
  * md5(doc_id) (identical in Spark and DuckDB) instead of rand(), so
  * the oracle can replay the exact sample, and a re-run of an
  * ingestion pipeline reproduces the same corpus — the property real
  * training-data pipelines need for auditability.
  */
object QueriesCorpus {

  import Queries.QDef

  /** RAW (non-distinct) word-8-gram shingles — ONE definition of the
    * 8-gram rule shared by the exact join (via [[shingles8]]) and the
    * bloom pass: if the two could drift (size guard, separator), d6b's
    * "exact ⊆ flagged" gate would red for a reason that has nothing to
    * do with the bloom. */
  private def rawShingles8(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), explode(expr(
        "transform(IF(size(w) >= 8, sequence(1, size(w) - 7), array()), i -> array_join(slice(w, i, 8), ' '))"))
        .as("shingle"))

  /** Distinct word-8-gram shingles per document (decontamination uses a
    * longer n-gram than near-dup detection: an 8-word verbatim overlap
    * with an eval benchmark is evidence of contamination, a 3-word one
    * is noise). */
  private def shingles8(s: SparkSession, dir: String): DataFrame =
    rawShingles8(s, dir).distinct()

  /** The train-side doc ids flagged by the broadcast-Bloom
    * decontamination pass (d6b's approximate stage; also dumped by
    * PlanDump). Bloom build + probe both run on RAW (non-distinct)
    * shingles: bloom tolerates duplicates, so neither side pays the
    * shingle-level distinct shuffle — the probe is a pure narrow pass:
    * explode -> hash -> shift/mask filter -> distinct(doc_id). */
  private[graft] def d6bBloomFlagged(s: SparkSession, dir: String): DataFrame = {
    val mBits = 1L << 21
    val k = 5
    val raw = rawShingles8(s, dir)
    val bits = graft.ops.Corpus.bloomBuild(
      raw.filter(col("doc_id") % 20 < 2), col("shingle"), mBits, k)
    graft.ops.Corpus
      .bloomMaybeContains(raw.filter(col("doc_id") % 20 >= 2), col("shingle"), bits, mBits, k)
      .select(col("doc_id")).distinct()
  }

  /** Deterministic md5-based inclusion hash over the doc id — the
    * SHARED [[graft.ops.Corpus.inclusionHash]] rule (first 8 hex chars;
    * Spark and DuckDB md5 agree, so the oracle replays the exact same
    * sample). Delegated, not re-implemented: two copies of the sampling
    * rule could drift independently. */
  private def inclusionHash = graft.ops.Corpus.inclusionHash(col("doc_id"))

  /** Per-language sampling-rate thresholds (corpus mixing: upsample en,
    * downsample the rest — the usual pretraining language re-balance). */
  private val RateThresholds: Seq[(String, String)] =
    Seq("en" -> "80000000", "fr" -> "40000000", "es" -> "40000000",
        "de" -> "20000000", "zh" -> "20000000")

  private val ThresholdSql =
    """CASE lang WHEN 'en' THEN '80000000' WHEN 'fr' THEN '40000000'
      |          WHEN 'es' THEN '40000000' WHEN 'de' THEN '20000000'
      |          ELSE '20000000' END""".stripMargin

  /** Hashed-bigram feature bucket for x13's DSIR weights: the first two
    * md5 nibbles of the bigram -> 0..255. Nibble extraction via strpos
    * (x11's trick) because both engines agree on md5's lowercase hex
    * but not on any direct hex->int cast. */
  private val DsirBuckets = 256
  private def bucketCol =
    (expr("locate(substring(md5_g, 1, 1), '0123456789abcdef') - 1") * 16 +
      expr("locate(substring(md5_g, 2, 1), '0123456789abcdef') - 1")).cast("int")
  private val BucketSql =
    """(strpos('0123456789abcdef', substr(md5_g, 1, 1)) - 1) * 16 +
      |     (strpos('0123456789abcdef', substr(md5_g, 2, 1)) - 1)""".stripMargin

  val defs: Map[String, QDef] = Map(

    // ---- a9: GROUP BY ROLLUP with grouping flags ----
    // (subtotal + grand-total rows in one pass — Spark and DuckDB both
    //  plan a single Expand+Aggregate, no self-union of aggregates)
    "a9_rollup" -> QDef(
      (s, dir) => Tables.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(
          grouping(col("l_returnflag")).cast("int").as("g_flag"),
          grouping(col("l_linestatus")).cast("int").as("g_status"),
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          count(lit(1)).as("n_rows"))
        .select(col("l_returnflag"), col("l_linestatus"), col("g_flag"),
          col("g_status"), col("sum_qty"), col("n_rows")),
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
             |  CAST(GROUPING(l_linestatus) AS INT) AS g_status,
             |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n_rows
             |FROM lineitem
             |GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin)),

    // ---- a10: PIVOT — status values to columns ----
    // (explicit value list so the plan is a single aggregate with no
    //  distinct-values pre-pass; count of an empty cell is 0 not null)
    "a10_pivot" -> QDef(
      (s, dir) => Tables.orders(s, dir)
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("O", "F", "P"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("O", "F", "P")),
      Some("""SELECT o_orderpriority,
             |  count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS "O",
             |  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS "F",
             |  count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS "P"
             |FROM orders GROUP BY o_orderpriority""".stripMargin)),

    // ---- a14: GROUP BY CUBE — all 2^k grouping combinations in one
    //      Expand+Aggregate pass (rollup a9 covers the hierarchy;
    //      cube covers the lattice). Grouping flags disambiguate
    //      subtotal rows from real NULL keys. ----
    "a14_cube" -> QDef(
      (s, dir) => Tables.orders(s, dir)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(
          grouping(col("o_orderstatus")).cast("int").as("g_status"),
          grouping(col("o_orderpriority")).cast("int").as("g_prio"),
          count(lit(1)).as("n_rows"),
          round(sum(col("o_totalprice")), 2).as("sum_price"))
        .select(col("o_orderstatus"), col("o_orderpriority"),
          col("g_status"), col("g_prio"), col("n_rows"), col("sum_price")),
      Some("""SELECT o_orderstatus, o_orderpriority,
             |  CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
             |  CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
             |  count(*) AS n_rows, round(sum(o_totalprice), 2) AS sum_price
             |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin)),

    // ---- a15: GROUP BY GROUPING SETS — an explicit, non-hierarchical
    //      set list ((status), (priority), ()) that neither ROLLUP nor
    //      CUBE expresses; via spark.sql over a temp view (the
    //      DataFrame API stops at rollup/cube). Still ONE
    //      Expand+Aggregate pass. ----
    "a15_grouping_sets" -> QDef(
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("orders_a15")
        s.sql("""SELECT o_orderstatus, o_orderpriority,
                |  CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
                |  CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
                |  count(*) AS n_rows
                |FROM orders_a15
                |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin)
      },
      Some("""SELECT o_orderstatus, o_orderpriority,
             |  CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
             |  CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
             |  count(*) AS n_rows
             |FROM orders
             |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin)),

    // ---- d6: benchmark decontamination — verbatim 8-gram overlap ----
    // (the train/eval split hygiene step every pretraining corpus needs:
    //  flag training docs sharing any 8-word shingle with the benchmark
    //  set. Inverted-index equi-join on the shingle — |shared shingles|
    //  work, never |train| x |bench|; at 100 TB the bench side is tiny
    //  and the join is a broadcast of its shingle set.)
    "d6_decontaminate" -> QDef(
      (s, dir) => {
        val sh = shingles8(s, dir)
        val bench = sh.filter(col("doc_id") % 20 < 2)
          .select(col("doc_id").as("bench_id"), col("shingle"))
        val train = sh.filter(col("doc_id") % 20 >= 2)
        train.join(broadcast(bench), Seq("shingle"))
          .groupBy(col("doc_id"))
          .agg(countDistinct(col("shingle")).as("n_shared"),
            countDistinct(col("bench_id")).as("n_bench_docs"),
            min(col("bench_id")).as("first_bench_id"))
          .select(col("doc_id"), col("n_shared"), col("n_bench_docs"),
            col("first_bench_id"))
      },
      Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |idx AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - 7)) AS i FROM w),
             |sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+7], ' ') AS shingle FROM idx),
             |bench AS (SELECT doc_id AS bench_id, shingle FROM sh WHERE doc_id % 20 < 2),
             |train AS (SELECT * FROM sh WHERE doc_id % 20 >= 2)
             |SELECT t.doc_id, count(DISTINCT t.shingle) AS n_shared,
             |  count(DISTINCT b.bench_id) AS n_bench_docs,
             |  min(b.bench_id) AS first_bench_id
             |FROM train t JOIN bench b ON t.shingle = b.shingle
             |GROUP BY t.doc_id""".stripMargin)),

    // ---- d6b: decontamination via broadcast Bloom bitset — the
    //      zero-join scale path for d6. The benchmark side folds into a
    //      fixed 2M-bit bitset (256 KB, k=5 — ~6e-7 shingle FPP at this
    //      load; 1 G bits / 128 MB covers a 100 M-shingle benchmark at
    //      100 TB); the train side streams ONCE against the broadcast
    //      bitset with codegen'd shift/mask probes — no shuffle of
    //      train shingles, unlike d6's inverted-index join. Bloom
    //      admits false positives only, so exact ⊆ flagged always; this
    //      companion emits the driver-visible gate (n_missed MUST be 0,
    //      FP overhang bounded) the same way the ANN recall rows do.
    //      At 100 TB you run the bloom pass over the corpus and hand
    //      only the flagged survivors (tiny) to d6's exact join. ----
    "d6b_decontaminate_bloom" -> QDef(
      (s, dir) => {
        val flagged = d6bBloomFlagged(s, dir)
        // exact side (d6's join) for the gate
        val sh = shingles8(s, dir)
        val train = sh.filter(col("doc_id") % 20 >= 2)
        val exact = train.join(
            broadcast(sh.filter(col("doc_id") % 20 < 2)
              .select(col("shingle")).distinct()), Seq("shingle"))
          .select(col("doc_id")).distinct()
        val nExact = exact.agg(count(lit(1)).as("n_exact"))
        val nMissed = exact.join(flagged, Seq("doc_id"), "left_anti")
          .agg(count(lit(1)).as("n_missed"))
        val nExtra = flagged.join(exact, Seq("doc_id"), "left_anti")
          .agg(count(lit(1)).as("n_extra"))
        val nTrain = train.select(col("doc_id")).distinct()
          .agg(count(lit(1)).as("n_train"))
        nExact.crossJoin(nMissed).crossJoin(nExtra).crossJoin(nTrain)
          .select(col("n_exact"), col("n_missed"),
            (col("n_extra") <= col("n_train") * lit(0.01)).as("extra_ok"))
      },
      Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |idx AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - 7)) AS i FROM w),
             |sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+7], ' ') AS shingle FROM idx),
             |bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 20 < 2),
             |train AS (SELECT * FROM sh WHERE doc_id % 20 >= 2),
             |exact AS (SELECT DISTINCT t.doc_id FROM train t JOIN bench b USING (shingle))
             |SELECT CAST(count(*) AS BIGINT) AS n_exact,
             |  CAST(0 AS BIGINT) AS n_missed, TRUE AS extra_ok
             |FROM exact""".stripMargin)),

    // ---- f5: JSON extraction over a semi-structured column — the
    //      events stream carries a JSON props payload; extraction stays
    //      a codegen'd path expression, no UDF, no full parse ----
    "f5_json_extract" -> QDef(
      (s, dir) => QueriesRelational.events(s, dir)
        .filter(col("event_type") === "purchase")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .withColumn("k_band", when(col("k") >= 50, "hi").otherwise("lo")),
      Some("""SELECT event_id, CAST(props->>'$.k' AS INT) AS k,
             |  CASE WHEN CAST(props->>'$.k' AS INT) >= 50 THEN 'hi' ELSE 'lo' END AS k_band
             |FROM events WHERE event_type = 'purchase'""".stripMargin)),

    // ---- a11: UNPIVOT (wide measures -> long) — Spark's unpivot
    //      operator; oracle re-derives via UNION ALL ----
    "a11_unpivot" -> QDef(
      (s, dir) => Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"))
        .unpivot(
          ids = Array(col("l_orderkey"), col("l_linenumber")),
          values = Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          variableColumnName = "measure", valueColumnName = "val"),
      Some("""SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS val FROM lineitem
             |UNION ALL
             |SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
             |UNION ALL
             |SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem""".stripMargin)),

    // ---- a12: exact percentiles per group — `percentile` is Spark's
    //      exact linear-interpolation aggregate (same definition as the
    //      oracle's quantile_cont); approx_percentile is the sketch
    //      variant for the 100 TB path where a sort per group won't fly ----
    "a12_percentiles" -> QDef(
      (s, dir) => Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(l_extendedprice, 0.95)"), 4).as("p95"),
          round(expr("percentile(l_extendedprice, 0.99)"), 4).as("p99")),
      Some("""SELECT l_returnflag,
             |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
             |  round(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
             |  round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // ---- a13: HLL++ distinct sketch with a driver-visible error gate ----
    // (the 100 TB corpus-stats path: approx_count_distinct is Spark's
    //  HyperLogLog++ — mergeable fixed-size sketch, no exact-distinct
    //  shuffle of the key space. DuckDB can't reproduce another
    //  engine's sketch, so the oracle pattern is the recall-gate one:
    //  emit the EXACT count (oracle-checkable) plus whether the sketch
    //  landed inside 3x its configured 2% rsd; a broken sketch turns
    //  the row red instead of hiding behind no_oracle. The exact side
    //  here exists only for the gate — production reads the sketch.) ----
    "a13_sketch_distinct" -> QDef(
      (s, dir) => Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_orderkey")).as("n_exact"),
          approx_count_distinct(col("l_orderkey"), rsd = 0.02).as("__sketch"))
        .select(col("l_returnflag"), col("n_exact"),
          (abs(col("__sketch") - col("n_exact"))
            <= col("n_exact") * lit(0.06)).as("within_rsd")),
      Some("""SELECT l_returnflag, CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_exact,
             |  TRUE AS within_rsd
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // ---- x1: stratified sampling by rate (corpus mixing) ----
    // (pure narrow map + filter — no shuffle, no state; the decision is
    //  a hash of the row's own key, so adding executors or reordering
    //  input cannot change the sample)
    "x1_stratified_sample" -> QDef(
      (s, dir) => graft.ops.Corpus.stratifiedSample(
          Tables.documents(s, dir), key = col("doc_id"), group = col("lang"),
          thresholds = RateThresholds.toMap, default = "20000000")
        .withColumn("h", inclusionHash)
        .select(col("doc_id"), col("lang"), col("h")),
      Some(s"""SELECT doc_id, lang, substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS h
              |FROM documents
              |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < $ThresholdSql""".stripMargin)),

    // ---- x2: exact per-group quotas (corpus mixing, hard caps) ----
    // (rate sampling gives an EXPECTED mix; quota sampling gives an
    //  exact one: the md5 order is a deterministic uniform shuffle, so
    //  "first 20 per language in hash order" is an exact uniform sample.
    //  Window partitioned by lang — parallel across groups, and each
    //  group's sort is per-partition, not global. At 100 TB a giant
    //  group would serialize its sort: pre-thin it with the x1 hash
    //  threshold at ~2x the quota rate first — the threshold pass is
    //  narrow, and the exact ranking then runs on the survivors)
    "x2_quota_sample" -> QDef(
      (s, dir) => {
        // rank re-derived for the output shape (the op drops helpers)
        val w = Window.partitionBy(col("lang"))
          .orderBy(col("h").asc, col("doc_id").asc)
        graft.ops.Corpus.quotaSample(Tables.documents(s, dir),
            key = col("doc_id"), group = col("lang"), quota = 20)
          .withColumn("h", inclusionHash)
          .withColumn("rn", row_number().over(w))
          .select(col("doc_id"), col("lang"), col("h"), col("rn"))
      },
      Some("""SELECT doc_id, lang, h, rn FROM (
             |  SELECT doc_id, lang, substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS h,
             |    row_number() OVER (PARTITION BY lang
             |      ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), doc_id) AS rn
             |  FROM documents) WHERE rn <= 20""".stripMargin)),

    // ---- x6: document chunking — overlapping context windows ----
    // (the other standard shape besides packing: split each document
    //  into 64-token chunks at stride 48 (16-token overlap) for
    //  embedding/retrieval pipelines. Pure explode over a sequence —
    //  narrow, no shuffle; chunk count is ceil(tokens/stride) per doc)
    "x6_chunk_documents" -> QDef(
      (s, dir) => Tables.documents(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .select(col("doc_id"), col("w"),
          explode(expr("sequence(1, size(w), 48)")).as("start"))
        .select(col("doc_id"),
          floor((col("start") - 1) / 48).as("chunk_seq"),
          col("start"),
          array_join(slice(col("w"), col("start"), lit(64)), " ").as("chunk_text"),
          least(size(col("w")) - col("start") + 1, lit(64)).cast("long").as("n_tokens")),
      Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |c AS (SELECT doc_id, w, unnest(generate_series(1, len(w), 48)) AS start FROM w)
             |SELECT doc_id, CAST((start - 1) // 48 AS BIGINT) AS chunk_seq, start,
             |  array_to_string(w[start : start + 63], ' ') AS chunk_text,
             |  CAST(least(len(w) - start + 1, 64) AS BIGINT) AS n_tokens
             |FROM c""".stripMargin)),

    // ---- x3: sequence packing — concat-and-chunk bin assignment ----
    // (LLM pretraining packs documents into fixed token-budget bins by
    //  concatenating in a canonical order and cutting every B tokens.
    //  The global running sum is computed as a DISTRIBUTED prefix sum:
    //  range-partition by doc_id, per-partition window, then add each
    //  partition's offset (a tiny driver-side cumsum over ≤ nPartitions
    //  rows) — no single-partition global window anywhere, so this is
    //  the shape that survives 100 TB. The result is independent of the
    //  (sampled, nondeterministic) range boundaries because the prefix
    //  sum only depends on the total doc_id order.)
    "x3_pack_sequences" -> QDef(
      (s, dir) => graft.ops.Corpus.packSequences(
        Tables.documents(s, dir)
          .select(col("doc_id"), size(split(col("text"), " ")).as("tok")),
        idCol = "doc_id", tokensCol = "tok", budget = 256),
      Some("""WITH t AS (SELECT doc_id,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
             |c AS (SELECT doc_id, n_tokens,
             |    CAST(sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
             |      AS BIGINT) - n_tokens AS stream_start FROM t)
             |SELECT doc_id, n_tokens, stream_start,
             |  CAST(stream_start // 256 AS BIGINT) AS bin
             |FROM c""".stripMargin)),

    // ---- x8: the END-TO-END training-corpus pipeline as ONE composite:
    //      plant exact copies -> exact dedup (keep min id) -> quality
    //      gate -> benchmark split -> 8-gram decontamination -> 3-gram
    //      near-dup prune (drop docs with a smaller-id partner at
    //      jaccard >= 0.5) -> deterministic per-language stratified
    //      sample. Every stage is the oracle-checked primitive (d1, t2,
    //      d6, d2, x1) composed; every join is an inverted-index or
    //      hash equi-join, so the whole pipeline is the shape that runs
    //      on a 100 TB corpus. ----
    "x8_corpus_pipeline" -> QDef(
      (s, dir) => {
        val raw = Tables.documents(s, dir)
          .select(col("doc_id"), col("text"), col("lang"))
        val docs = raw.unionByName(raw.filter(col("doc_id") % 7 === 0)
          .withColumn("doc_id", -col("doc_id")))
        // exact dedup: one survivor per text (lowest id, d1 policy)
        val deduped = docs.groupBy(col("text"))
          .agg(min(col("doc_id")).as("doc_id"),
            min_by(col("lang"), col("doc_id")).as("lang"))
          .withColumn("w", split(col("text"), " "))
          .withColumn("n_words", size(col("w")).cast("int"))
        // quality gate (t2 features)
        val gated = deduped
          .withColumn("n_stop",
            expr("CAST(size(filter(w, x -> x = 'the' OR x = 'a')) AS INT)"))
          .filter(col("n_words") >= 40 && col("n_stop") / col("n_words") <= 0.5)
        val bench = gated.filter(abs(col("doc_id")) % 20 < 2)
        val train = gated.filter(abs(col("doc_id")) % 20 >= 2)
        // 8-gram decontamination vs the benchmark split (d6 shape)
        def sh8(d: DataFrame) = d.select(col("doc_id"), explode(expr(
          "transform(IF(size(w) >= 8, sequence(1, size(w) - 7), array()), " +
            "i -> xxhash64(array_join(slice(w, i, 8), ' ')))")).as("h8")).distinct()
        val contaminated = sh8(train)
          .join(broadcast(sh8(bench).select("h8").distinct()), Seq("h8"))
          .select("doc_id").distinct()
        val clean = train.join(contaminated, Seq("doc_id"), "left_anti")
        // near-dup prune among the survivors (d2 inverted index)
        val sh3 = clean.select(col("doc_id"), explode(expr(
          "transform(IF(size(w) >= 3, sequence(1, size(w) - 2), array()), " +
            "i -> xxhash64(array_join(slice(w, i, 3), ' ')))")).as("h3")).distinct()
        val sizes = sh3.groupBy("doc_id").agg(count(lit(1)).as("n"))
        val dupped = sh3.select(col("doc_id").as("doc_a"), col("h3"))
          .join(sh3.select(col("doc_id").as("doc_b"), col("h3")), Seq("h3"))
          .filter(col("doc_a") < col("doc_b"))
          .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("i"))
          .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), Seq("doc_a"))
          .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), Seq("doc_b"))
          .filter(col("i") / (col("na") + col("nb") - col("i")) >= 0.5)
          .select(col("doc_b").as("doc_id")).distinct()
        val kept = clean.join(dupped, Seq("doc_id"), "left_anti")
        // deterministic per-language stratified sample — the EXACT
        // oracle-checked x1 primitive, not a re-implementation
        graft.ops.Corpus.stratifiedSample(kept, col("doc_id"), col("lang"),
            RateThresholds.toMap, "20000000")
          .select(col("doc_id"), col("lang"), col("n_words"))
      },
      Some(s"""WITH docs AS (
              |  SELECT doc_id, text, lang FROM documents
              |  UNION ALL
              |  SELECT -doc_id, text, lang FROM documents WHERE doc_id % 7 = 0),
              |dedup AS (SELECT min(doc_id) AS doc_id,
              |            min_by(lang, doc_id) AS lang, text
              |          FROM docs GROUP BY text),
              |q AS (SELECT doc_id, lang, text, string_split(text, ' ') AS w,
              |        CAST(len(string_split(text, ' ')) AS INT) AS n_words,
              |        CAST(len(list_filter(string_split(text, ' '),
              |          x -> x IN ('the', 'a'))) AS INT) AS n_stop
              |      FROM dedup),
              |gate AS (SELECT * FROM q
              |         WHERE n_words >= 40 AND n_stop / n_words <= 0.5),
              |bench8 AS (SELECT DISTINCT array_to_string(w[i:i+7], ' ') AS s8
              |           FROM gate, unnest(generate_series(1, len(w) - 7)) AS t(i)
              |           WHERE abs(doc_id) % 20 < 2),
              |train AS (SELECT * FROM gate WHERE abs(doc_id) % 20 >= 2),
              |tr8 AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+7], ' ') AS s8
              |        FROM train, unnest(generate_series(1, len(w) - 7)) AS t(i)),
              |contaminated AS (SELECT DISTINCT doc_id FROM tr8
              |                 JOIN bench8 USING (s8)),
              |clean AS (SELECT * FROM train
              |          WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
              |sh3 AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s3
              |        FROM clean, unnest(generate_series(1, len(w) - 2)) AS t(i)),
              |sizes AS (SELECT doc_id, count(*) AS n FROM sh3 GROUP BY doc_id),
              |inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
              |          FROM sh3 a JOIN sh3 b ON a.s3 = b.s3 AND a.doc_id < b.doc_id
              |          GROUP BY 1, 2),
              |dup AS (SELECT DISTINCT db FROM inter
              |        JOIN sizes sa ON da = sa.doc_id
              |        JOIN sizes sb ON db = sb.doc_id
              |        WHERE i / (sa.n + sb.n - i) >= 0.5)
              |SELECT doc_id, lang, n_words FROM clean
              |WHERE doc_id NOT IN (SELECT db FROM dup)
              |  AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < $ThresholdSql""".stripMargin)),

    // ---- x10: SALTED two-phase aggregation + salted join on a PLANTED
    //      hot key — the skew shapes AQE can't fix (skewed hash
    //      aggregation; a hot build side). Both ops are exact
    //      equivalents of their unsalted forms (the oracle is the plain
    //      GROUP BY + JOIN), so salting is purely a distribution
    //      change: each hot key spreads over `buckets` tasks in phase 1
    //      and re-merges in a tiny phase 2. ----
    "x10_salted_skew" -> QDef(
      (s, dir) => {
        // plant skew: every third order key collapses onto ONE hot key
        // (integral quantities sum as BIGINT so the two-phase result is
        // bit-exact regardless of how salting re-associates the sum)
        val li = Tables.lineitem(s, dir).select(
          when(col("l_orderkey") % 3 === 0, lit(7L)).otherwise(col("l_orderkey"))
            .as("k"),
          col("l_quantity").cast("long").as("q"))
        val agg = graft.ops.Skew.saltedAgg(li, Seq("k"), buckets = 16)(
          scala.collection.immutable.ListMap(
            "sum_qty" -> ((sum(col("q")),
              (p: org.apache.spark.sql.Column) => sum(p))),
            "n_rows" -> ((count(lit(1)),
              (p: org.apache.spark.sql.Column) => sum(p)))))
        val dim = Tables.orders(s, dir)
          .select(when(col("o_orderkey") % 3 === 0, lit(7L)).otherwise(col("o_orderkey"))
            .as("k"), col("o_orderpriority"))
          .groupBy("k").agg(min(col("o_orderpriority")).as("prio"))
        graft.ops.Skew.saltedJoin(agg, dim, "k", buckets = 16)
          .select(col("k"), col("sum_qty"), col("n_rows"), col("prio"))
      },
      Some("""WITH li AS (SELECT CASE WHEN l_orderkey % 3 = 0 THEN 7 ELSE l_orderkey END AS k,
             |              CAST(l_quantity AS BIGINT) AS q FROM lineitem),
             |a AS (SELECT k, CAST(sum(q) AS BIGINT) AS sum_qty,
             |             count(*) AS n_rows FROM li GROUP BY k),
             |d AS (SELECT CASE WHEN o_orderkey % 3 = 0 THEN 7 ELSE o_orderkey END AS k,
             |             min(o_orderpriority) AS prio FROM orders GROUP BY 1)
             |SELECT a.k, a.sum_qty, a.n_rows, d.prio
             |FROM a JOIN d USING (k)""".stripMargin)),

    // ---- x9: TEMPERATURE-based corpus mixing (tau = 2): per-language
    //      keep rates derived FROM the corpus's own language counts —
    //      target share q_l ∝ p_l^(1/tau), achieved by subsampling at
    //      r_l = (p_min / p_l)^(1 - 1/tau) = sqrt(c_min / c_l), so the
    //      rarest language keeps 100% and common ones damp toward it
    //      (the standard multilingual-pretraining re-balance). The rate
    //      becomes a deterministic md5 threshold (both engines compute
    //      the identical IEEE sqrt and hex rendering), so the sample is
    //      exactly reproducible; rates are a 5-row broadcast, the data
    //      pass is one filter. ----
    // ---- x12: int8 embedding quantization — the ANN memory-reduction
    //      step (4x smaller vectors for index residency): per-vector
    //      symmetric scale = 127 / max|v|, elements round via
    //      floor(x + 0.5) (spelled identically in both engines — no
    //      HALF_UP vs banker's-rounding ambiguity). Long-form output
    //      so the oracle compares every element exactly; one narrow
    //      pass, higher-order functions only, no UDF. ----
    "x12_int8_quantize" -> QDef(
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
          .select(col("vec_id"), col("embedding").as("v"))
          .withColumn("mx", expr(
            "aggregate(v, CAST(0.0 AS FLOAT), (a, x) -> greatest(a, abs(x)))"))
          .filter(col("mx") > 0.0f)
          .withColumn("scale", lit(127.0) / col("mx").cast("double"))
        e.select(col("vec_id"), col("scale"),
            posexplode(col("v")).as(Seq("i", "x")))
          .select(col("vec_id"), col("i"),
            floor(col("x").cast("double") * col("scale") + lit(0.5))
              .cast("int").as("q"))
      },
      Some("""WITH m AS (SELECT vec_id,
             |    list_max(list_transform(embedding, x -> abs(x))) AS mx
             |  FROM embeddings),
             |sc AS (SELECT vec_id, 127.0 / CAST(mx AS DOUBLE) AS scale
             |       FROM m WHERE mx > 0),
             |ex AS (SELECT e.vec_id, sc.scale,
             |         unnest(e.embedding) AS x,
             |         unnest(generate_series(0, len(e.embedding) - 1)) AS i
             |       FROM embeddings e JOIN sc ON e.vec_id = sc.vec_id)
             |SELECT vec_id, CAST(i AS INT) AS i,
             |  CAST(floor(CAST(x AS DOUBLE) * scale + 0.5) AS INT) AS q
             |FROM ex""".stripMargin)),

    "x9_temperature_mix" -> QDef(
      (s, dir) => {
        val docs = Tables.documents(s, dir).select(col("doc_id"), col("lang"))
        val counts = docs.groupBy("lang").agg(count(lit(1)).as("c"))
        val rates = counts
          .crossJoin(broadcast(counts.agg(min(col("c")).as("cmin"))))
          .withColumn("thr", lower(lpad(hex(
            least(floor(sqrt(col("cmin") / col("c")) * lit(4294967296L)),
              lit(4294967295L)).cast("long")), 8, "0")))
          .select("lang", "thr")
        docs.join(broadcast(rates), Seq("lang"))
          .filter(substring(md5(col("doc_id").cast("string")), 1, 8) < col("thr"))
          .select(col("doc_id"), col("lang"))
      },
      Some("""WITH c AS (SELECT lang, count(*) AS c FROM documents GROUP BY lang),
             |r AS (SELECT lang,
             |        lpad(lower(to_hex(least(
             |          CAST(floor(sqrt((SELECT min(c) FROM c) / c) * 4294967296) AS BIGINT),
             |          4294967295))), 8, '0') AS thr
             |      FROM c)
             |SELECT d.doc_id, d.lang FROM documents d JOIN r USING (lang)
             |WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) < thr""".stripMargin)),

    // ---- x7: INCREMENTAL near-dup dedup — admit a new batch against a
    //      PERSISTED MinHash band index (ops.Dedup.minhashBands /
    //      nearDupsAgainstIndex). The index lives in a store table
    //      bucketed on the probe key; the batch probe is a band-key
    //      equi-join reading index rows, never the corpus text, and
    //      admitted docs' bands APPEND to the index — the admission
    //      loop a continuously-ingesting 100 TB corpus needs (nothing
    //      ever recomputes corpus signatures). Exact-verify (jaccard
    //      over shingle sets, threshold 0.5) keeps the result exact;
    //      band recall at 0.5 is exhaustive on this corpus (d3's
    //      oracle-checked property, same scheme). Batch-internal dups
    //      are a separate within-batch d1/d3 pass by design. ----
    "x7_incremental_dedup" -> QDef(
      (s, dir) => {
        val root = "/tmp/graft_qstore/x7_idx"
        graft.core.FsUtil.clearAsync(new java.io.File(root))
        val st = new graft.core.TableStore(s, root)
        // hashed shingles: the index rows, set aggregates, and verify
        // intersects all move 8-byte longs, not ~20-char strings (same
        // exactness trust as d2/d3)
        val sh = QueriesLlm.hashedShinglesFor(s, dir).cache()
        val corpusSh = sh.filter(col("doc_id") % 3 =!= 0)
        val batchSh = sh.filter(col("doc_id") % 3 === 0)
        st.createBucketed("band_index",
          graft.ops.Dedup.minhashBands(corpusSh, "doc_id", "h"),
          Seq("bkey"), 16)
        val batchBands =
          graft.ops.Dedup.minhashBands(batchSh, "doc_id", "h").cache()
        val rejected = graft.ops.Dedup.nearDupsAgainstIndex(
          batchBands, st.read("band_index"),
          batchSh, corpusSh, "doc_id", "h", threshold = 0.5)
        val admitted = batchSh.select(col("doc_id")).distinct()
          .join(rejected.select(col("batch_id").as("doc_id")), Seq("doc_id"),
            "left_anti")
        // the incremental step: admitted docs join the index for the
        // NEXT batch (re-admitting this batch now admits 0 — DedupSpec)
        st.append("band_index",
          batchBands.join(admitted, Seq("doc_id"), "left_semi"))
        admitted
      },
      Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |idx AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i FROM w),
             |sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle FROM idx),
             |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
             |inter AS (SELECT a.doc_id AS ca, b.doc_id AS bb, count(*) AS i
             |          FROM sh a JOIN sh b ON a.shingle = b.shingle
             |          WHERE a.doc_id % 3 <> 0 AND b.doc_id % 3 = 0
             |          GROUP BY 1, 2),
             |dup AS (SELECT DISTINCT bb FROM inter
             |        JOIN sizes sa ON ca = sa.doc_id JOIN sizes sb ON bb = sb.doc_id
             |        WHERE i / (sa.n + sb.n - i) >= 0.5)
             |SELECT DISTINCT doc_id FROM sh
             |WHERE doc_id % 3 = 0 AND doc_id NOT IN (SELECT bb FROM dup)""".stripMargin)),

    // ---- x11: seeded deterministic corpus shuffle + sharding — the
    //      global-shuffle step before training serialization. md5-keyed
    //      permutation (replayable anywhere md5 exists — the oracle IS
    //      the proof), 16 balanced shards from the key's last nibble,
    //      within-shard order via a PER-SHARD window (no global sort). ----
    "x11_shuffle_shards" -> QDef(
      (s, dir) => graft.ops.Corpus.shuffleShards(
        Tables.documents(s, dir).select(col("doc_id")), col("doc_id"), 42L),
      Some("""WITH s AS (SELECT doc_id,
             |             md5(CAST(doc_id AS VARCHAR) || ':42') AS skey
             |           FROM documents),
             |sh AS (SELECT doc_id, skey,
             |         CAST(strpos('0123456789abcdef', substr(skey, 32, 1)) - 1
             |              AS INT) AS shard
             |       FROM s)
             |SELECT doc_id, skey, shard,
             |  CAST(ROW_NUMBER() OVER (PARTITION BY shard
             |                          ORDER BY skey, doc_id) AS BIGINT) AS shard_pos
             |FROM sh""".stripMargin)),

    // ---- x19: token-BALANCED shard export — x11 balances shard row
    //      COUNTS; under heavy-tailed doc lengths that leaves
    //      token-skewed shards (the straggler a trainer waits on).
    //      Same seeded md5 permutation as x11, then the x3 prefix-sum
    //      machinery (range partition + per-partition window + bounded
    //      driver offsets — no global sort) carves it into contiguous
    //      EQUAL-TOKEN key ranges: shard = start*S div total, integer
    //      arithmetic end to end so boundaries never flap on float
    //      precision. Deterministic: shard is a pure function of
    //      (doc_id, text, seed, S) — the oracle is the proof. ----
    // ---- x20: weighted data mixing to per-source token budgets — the
    //      sampling-ratio step of corpus assembly (Pile/DoReMi-style
    //      source weights). Each source contributes wgt/8 of its token
    //      mass (wgt = 1..4 derived from the source id), documents
    //      taken in the seeded md5 permutation until the per-source
    //      exclusive token prefix crosses the budget; integer
    //      comparisons end-to-end so the cut is exact at any scale and
    //      bit-identical in DuckDB. Scale shape (ops/Corpus.weightedMix):
    //      one range-partitioned global prefix sum + a source-
    //      cardinality broadcast — never a partitionBy(source) window
    //      (tens of sources would funnel 100 TB through tens of tasks).
    //      The returned per-source rollup pins docs, tokens, and budget
    //      per source against the oracle's window-function rederivation. ----
    "x20_weighted_mix" -> QDef(
      (s, dir) => {
        val docs = Tables.documents(s, dir).select(
          col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("tok"),
          (expr("CAST(substring(source, 4) AS BIGINT)") % 4 + 1).as("wgt"))
        graft.ops.Corpus.weightedMix(docs, "doc_id", "tok", "source", "wgt",
            weightDen = 8L, seed = 77L)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("sel_tokens"),
            min(col("budget_tokens")).as("budget_tokens"))
      },
      Some("""WITH t AS (SELECT doc_id, source,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tok,
             |    CAST(substring(source, 4) AS BIGINT) % 4 + 1 AS wgt,
             |    md5(CAST(doc_id AS VARCHAR) || ':77') AS skey FROM documents),
             |c AS (SELECT *,
             |    CAST(sum(tok) OVER (PARTITION BY source ORDER BY skey, doc_id
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) - tok AS src_start,
             |    CAST(sum(tok) OVER (PARTITION BY source) AS BIGINT) AS src_total
             |  FROM t)
             |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(tok) AS BIGINT) AS sel_tokens,
             |  CAST(min(wgt * src_total // 8) AS BIGINT) AS budget_tokens
             |FROM c WHERE src_start * 8 < wgt * src_total
             |GROUP BY 1""".stripMargin)),

    "x19_token_balanced_shards" -> QDef(
      (s, dir) => graft.ops.Corpus.tokenBalancedShards(
        Tables.documents(s, dir)
          .select(col("doc_id"), size(split(col("text"), " ")).as("tok")),
        idCol = "doc_id", tokensCol = "tok", nShards = 16, seed = 42L),
      Some("""WITH t AS (SELECT doc_id,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             |    md5(CAST(doc_id AS VARCHAR) || ':42') AS skey FROM documents),
             |c AS (SELECT doc_id, n_tokens, skey,
             |    CAST(sum(n_tokens) OVER (ORDER BY skey, doc_id ROWS UNBOUNDED PRECEDING)
             |      AS BIGINT) - n_tokens AS stream_start FROM t),
             |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total FROM t)
             |SELECT doc_id, n_tokens, skey, stream_start,
             |  CAST(LEAST((stream_start * 16) // total, 15) AS INT) AS shard
             |FROM c, tot""".stripMargin)),

    // ---- x13: DSIR importance resampling — select raw docs that look
    //      like a curated target set [Xie et al. 2023, "Data Selection
    //      for Language Models via Importance Resampling"]. Features are
    //      hashed word-bigram buckets (md5 nibbles -> 256 buckets, the
    //      paper's hashed n-gram recipe); target (src0/src1) and raw
    //      bucket distributions are Laplace-smoothed over a generated
    //      256-bucket spine; each raw doc scores avg over its bigrams of
    //      ln(p_tgt/p_raw), and the top-100 by score are selected. Scale
    //      shape: token pass is narrow, both distribution tables are
    //      bucket-cardinality (256 rows -> broadcast), scoring is one
    //      per-doc aggregate, and selection is TakeOrderedAndProject —
    //      no global sort. The doc score rounds to 6 dp BEFORE ranking
    //      so the rank (and the oracle's) never hangs on float
    //      reassociation noise; doc_id breaks exact ties. ----
    "x13_dsir_resample" -> QDef(
      (s, dir) => {
        val toks = Tables.documents(s, dir)
          .select(col("doc_id"), col("source"), split(col("text"), " ").as("w"))
          .select(col("doc_id"), col("source"),
            explode(expr("transform(IF(size(w) >= 2, sequence(1, size(w) - 1), array()), " +
              "i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))"))
              .as("gram"))
          .withColumn("md5_g", md5(col("gram")))
          .select(col("doc_id"), col("source"), bucketCol.as("b"))
        val isTgt = col("source").isin("src0", "src1")
        val spine = s.range(DsirBuckets).select(col("id").cast("int").as("b"))
        // ONE pass over the token stream: counts per (side, bucket) in a
        // single map-side-combinable aggregate; totals, smoothing, and
        // the log-ratio all derive from that 512-row table (+ the
        // generated spine for never-seen buckets). No per-side re-scan,
        // no driver-side count() scalars — at 100 TB the corpus is read
        // once for the distributions and once for the scoring join.
        val cnts = toks.withColumn("tgt", isTgt)
          .groupBy(col("tgt"), col("b")).agg(count(lit(1)).as("c"))
        // ≤2 rows, cached: both dist() sides reuse it, and the guard
        // below reads it without a second corpus pass
        val totals = cnts.groupBy(col("tgt")).agg(sum(col("c")).as("total")).cache()
        // BOTH sides must exist, or dist()'s crossJoin over the missing
        // side is empty and the query silently returns 0 rows while the
        // oracle's window-sum form still Laplace-smooths and ranks —
        // a confusing row-count red instead of this loud failure
        val sides = totals.select("tgt").collect().map(_.getBoolean(0)).toSet
        require(sides == Set(true, false),
          s"DSIR needs both target and raw docs; corpus has sides=$sides")
        def dist(tgt: Boolean) =
          spine.crossJoin(totals.filter(col("tgt") === tgt).select(col("total")))
            .join(cnts.filter(col("tgt") === tgt).select(col("b"), col("c")),
              Seq("b"), "left_outer")
            .select(col("b"),
              ((coalesce(col("c"), lit(0L)) + lit(0.5)) /
                (col("total") + lit(0.5 * DsirBuckets))).as("p"))
        val score = dist(tgt = true).withColumnRenamed("p", "pt")
          .join(dist(tgt = false).withColumnRenamed("p", "pr"), Seq("b"))
          .select(col("b"), log(col("pt") / col("pr")).as("sc"))
        // top-100 via orderBy+limit (TakeOrderedAndProject — parallel
        // partial top-k, no global sort); the rank window then runs over
        // the 100 survivors only, never the corpus-sized score table
        val scored = toks.filter(!isTgt)
          .join(broadcast(score), Seq("b"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_grams"), round(avg(col("sc")), 6).as("dsir_w"))
        scored.orderBy(col("dsir_w").desc, col("doc_id").asc).limit(100)
          .withColumn("rank", row_number()
            .over(Window.orderBy(col("dsir_w").desc, col("doc_id").asc)).cast("int"))
          .select(col("doc_id"), col("n_grams"), col("dsir_w"), col("rank"))
      },
      Some("""WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
             |g AS (SELECT doc_id, source, md5(w[i] || ' ' || w[i+1]) AS md5_g
             |      FROM w, unnest(generate_series(1, len(w) - 1)) AS t(i)),
             |tok AS (SELECT doc_id, source IN ('src0', 'src1') AS tgt,
             |  CAST((strpos('0123456789abcdef', substr(md5_g, 1, 1)) - 1) * 16 +
             |       (strpos('0123456789abcdef', substr(md5_g, 2, 1)) - 1) AS INT) AS b
             |  FROM g),
             |spine AS (SELECT unnest(generate_series(0, 255)) AS b),
             |pt AS (SELECT s.b, (coalesce(c, 0) + 0.5) /
             |         (sum(coalesce(c, 0)) OVER () + 128.0) AS pt
             |       FROM spine s LEFT JOIN
             |         (SELECT b, count(*) AS c FROM tok WHERE tgt GROUP BY b) t USING (b)),
             |pr AS (SELECT s.b, (coalesce(c, 0) + 0.5) /
             |         (sum(coalesce(c, 0)) OVER () + 128.0) AS pr
             |       FROM spine s LEFT JOIN
             |         (SELECT b, count(*) AS c FROM tok WHERE NOT tgt GROUP BY b) t USING (b)),
             |score AS (SELECT b, ln(pt / pr) AS sc FROM pt JOIN pr USING (b)),
             |docw AS (SELECT doc_id, count(*) AS n_grams, round(avg(sc), 6) AS dsir_w
             |         FROM tok JOIN score USING (b) WHERE NOT tgt GROUP BY doc_id)
             |SELECT doc_id, n_grams, dsir_w, rank FROM (
             |  SELECT *, CAST(row_number() OVER (ORDER BY dsir_w DESC, doc_id) AS INT) AS rank
             |  FROM docw) WHERE rank <= 100""".stripMargin)),

    // ---- x14: first-occurrence segment dedup — the corpus-global
    //      "remove duplicated passages, keep the first" step [Lee et al.
    //      2022, "Deduplicating Training Data Makes Language Models
    //      Better", the NearDup/ExactSubstr family at passage
    //      granularity]. Unit = non-overlapping 10-word segment; for
    //      every DISTINCT segment exactly the minimal (doc_id, seg_pos)
    //      occurrence survives, later verbatim repeats — across docs OR
    //      within one — drop, and each doc reassembles its surviving
    //      segments in order. Differs from t8 (df-threshold boilerplate
    //      drop, which removes ALL hot copies): this keeps exactly one.
    //      Scale shape: one groupBy(segment) min-aggregate (map-side
    //      combinable) + one per-doc reassembly window; the keeper key
    //      packs (doc_id, pos) into one BIGINT so the min is a plain
    //      long min, not a struct compare. ----
    // ---- x18: EXACT-SUBSTRING dedup (the ExactSubstr method of
    //      "Deduplicating Training Data Makes Language Models Better",
    //      Lee et al. 2022, re-expressed relationally): every L-token
    //      SLIDING window (stride 1 — contrast x14's disjoint segments)
    //      is keyed by content; the FIRST occurrence corpus-wide is the
    //      keeper, and a token survives iff some window covering it is
    //      a keeper (short docs, < L tokens, keep everything). Removes
    //      duplicated SPANS wherever they appear while the first copy
    //      survives intact. Scale shape: windows move as 8-byte
    //      xxhash64 longs (d2's collision trust), the keeper pick is
    //      ONE map-side-combinable min-aggregate on the packed
    //      (doc, pos) key, coverage is a bounded x L explode of keeper
    //      windows only — no suffix array, no global sort, nothing
    //      corpus-length in any single task. ----
    "x18_exact_substring_dedup" -> QDef(
      (s, dir) => {
        val L = 10
        val toks = Tables.documents(s, dir)
          .select(col("doc_id"), split(col("text"), " ").as("w"))
        val wins = toks
          .select(col("doc_id"), explode(expr(
            s"transform(IF(size(w) >= $L, sequence(0, size(w) - $L), array()), " +
              s"g -> struct(g as g, xxhash64(array_join(slice(w, g + 1, $L), ' ')) as wh))"))
            .as("x"))
          .select(col("doc_id"), col("x.g").as("g"), col("x.wh").as("wh"),
            graft.ops.Corpus.packedOcc(col("doc_id"), col("x.g")).as("occ"))
        val keep = wins.groupBy(col("wh")).agg(min(col("occ")).as("keeper"))
        val covered = wins.join(keep, Seq("wh"))
          .filter(col("occ") === col("keeper"))
          .select(col("doc_id"), explode(expr(s"sequence(g, g + ${L - 1})")).as("i"))
        // no .distinct() before the aggregate: collect_set already
        // dedups with map-side partial aggregation — a separate
        // distinct would pay a SECOND full exchange of the ~one-row-
        // per-corpus-token coverage stream for nothing
        val cover = covered.groupBy(col("doc_id"))
          .agg(sort_array(collect_set(col("i"))).as("cov"))
        toks.join(cover, Seq("doc_id"), "left_outer")
          .select(col("doc_id"), col("w"),
            when(size(col("w")) < L, col("w"))
              .otherwise(expr(
                "transform(coalesce(cov, array()), i -> element_at(w, cast(i as int) + 1))"))
              .as("kept"))
          .select(col("doc_id"),
            size(col("w")).cast("long").as("n_tok"),
            size(col("kept")).cast("long").as("n_kept"),
            array_join(col("kept"), " ").as("dedup_text"))
      },
      Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |wins AS (SELECT doc_id, g, array_to_string(w[g+1:g+10], ' ') AS win,
             |    doc_id * 1000000 + g AS occ
             |  FROM w, unnest(generate_series(0, len(w) - 10)) AS t(g)
             |  WHERE len(w) >= 10),
             |keep AS (SELECT win, min(occ) AS keeper FROM wins GROUP BY win),
             |cov AS (SELECT DISTINCT s.doc_id, s.g + t.i AS i
             |  FROM wins s JOIN keep k ON s.win = k.win AND s.occ = k.keeper,
             |       unnest(generate_series(0, 9)) AS t(i)),
             |agg AS (SELECT doc_id, list_sort(list(i)) AS cov FROM cov GROUP BY doc_id)
             |SELECT d.doc_id, CAST(len(d.w) AS BIGINT) AS n_tok,
             |  CAST(CASE WHEN len(d.w) < 10 THEN len(d.w)
             |       ELSE coalesce(len(a.cov), 0) END AS BIGINT) AS n_kept,
             |  CASE WHEN len(d.w) < 10 THEN array_to_string(d.w, ' ')
             |       ELSE coalesce(array_to_string([d.w[i + 1] FOR i IN a.cov], ' '), '')
             |  END AS dedup_text
             |FROM w d LEFT JOIN agg a USING (doc_id)""".stripMargin)),

    "x14_passage_dedup" -> QDef(
      (s, dir) => {
        val segs = Tables.documents(s, dir)
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
          .agg(
            count(lit(1)).as("n_segs"),
            count(when(col("occ") === col("keeper"), 1)).as("n_kept"),
            coalesce(array_join(expr(
              "transform(filter(sort_array(collect_list(" +
                "struct(g, occ, keeper, seg))), x -> x.occ = x.keeper), " +
                "x -> x.seg)"), " "), lit("")).as("dedup_text"))
          .select(col("doc_id"), col("n_segs"), col("n_kept"), col("dedup_text"))
      },
      Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |segs AS (SELECT doc_id, g, array_to_string(w[g*10+1 : g*10+10], ' ') AS seg,
             |    doc_id * 1000000 + g AS occ
             |  FROM w, unnest(generate_series(0, CAST(ceil(len(w) / 10.0) AS BIGINT) - 1)) AS t(g)),
             |keep AS (SELECT seg, min(occ) AS keeper FROM segs GROUP BY seg)
             |SELECT s.doc_id, count(*) AS n_segs,
             |  count(*) FILTER (WHERE s.occ = k.keeper) AS n_kept,
             |  coalesce(string_agg(s.seg, ' ' ORDER BY s.g)
             |    FILTER (WHERE s.occ = k.keeper), '') AS dedup_text
             |FROM segs s JOIN keep k USING (seg)
             |GROUP BY s.doc_id""".stripMargin)),

    // ---- x15: length-curriculum ordering — global difficulty rank +
    //      stage assignment (curriculum learning's standard first axis:
    //      train short-to-long). The global position is NOT a
    //      row_number() window (single task at corpus scale): it rides
    //      SurrogateKeys.byOrder — a range-partitioned distributed sort
    //      + zipWithIndex with per-partition offsets from one tiny count
    //      job — the same W3 scale path the dims use. Stage = position
    //      quintile by integer arithmetic on (position, n), so stage
    //      boundaries are exact, not sampled percentiles. ----
    "x15_length_curriculum" -> QDef(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"), col("n_chars"))
        val n = docs.count() // one scalar: corpus size
        graft.ops.SurrogateKeys.byOrder(docs, "position",
            Seq(col("n_chars").asc, col("doc_id").asc))
          .withColumn("stage", ((col("position") - 1) * 5 / n).cast("int"))
          .select(col("doc_id"), col("n_chars"), col("position"), col("stage"))
      },
      Some("""WITH n AS (SELECT count(*) AS n FROM documents)
             |SELECT doc_id, n_chars,
             |  CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS position,
             |  CAST((row_number() OVER (ORDER BY n_chars, doc_id) - 1) * 5 // n.n AS INT) AS stage
             |FROM documents CROSS JOIN n""".stripMargin)),

    // ---- x16: END-TO-END serialization composite — the last mile of a
    //      training-data pipeline as ONE oracle-checked query: Gopher
    //      quality gate (t10's rules, stateless array-fold form) →
    //      passage-level first-occurrence dedup over the SURVIVORS
    //      (x14's min-keeper) → token recount of the deduped text (docs
    //      deduped to nothing drop out) → 256-token sequence packing
    //      via the distributed prefix sum (x3's ops.Corpus path — no
    //      global window) → bin-to-shard assignment. Complements x8
    //      (which composes the SELECTION stages: dedup/quality/
    //      decontaminate/sample); x16 composes the SERIALIZATION
    //      stages that turn the surviving corpus into training shards.
    //      Every stage is a narrow map, an equi-join, or a
    //      map-side-combinable aggregate. ----
    "x16_serialize_pipeline" -> QDef(
      (s, dir) => {
        val stopCnt = Seq("a", "the", "data", "value", "row", "table")
          .map(t => array_contains(col("w"), t).cast("int")).reduce(_ + _)
        val kept = Tables.documents(s, dir)
          .select(col("doc_id"), col("text"), split(col("text"), " ").as("w"))
          .filter(
            size(col("w")).cast("long").between(40L, 100000L) &&
            round((length(col("text")) - (size(col("w")) - 1)) /
              size(col("w")).cast("double"), 4).between(4.0, 10.0) &&
            (stopCnt >= 4) &&
            (round(expr("array_max(transform(array_distinct(w), " +
              "x -> size(filter(w, y -> y = x))))").cast("double") /
              size(col("w")), 6) <= 0.12))
        val segs = kept
          .select(col("doc_id"), explode(expr(
            "transform(sequence(0, cast(ceil(size(w) / 10.0) as int) - 1), " +
              "g -> struct(g as g, array_join(slice(w, g * 10 + 1, 10), ' ') as seg))"))
            .as("x"))
          .select(col("doc_id"), col("x.g").as("g"), col("x.seg").as("seg"),
            graft.ops.Corpus.packedOcc(col("doc_id"), col("x.g")).as("occ"))
        val keep = segs.groupBy(col("seg")).agg(min(col("occ")).as("keeper"))
        val ded = segs.join(keep, Seq("seg"))
          .groupBy(col("doc_id"))
          .agg(array_join(expr(
            "transform(filter(sort_array(collect_list(" +
              "struct(g, occ, keeper, seg))), x -> x.occ = x.keeper), " +
              "x -> x.seg)"), " ").as("dtext"))
          .filter(col("dtext") =!= "")
        val toks = ded.select(col("doc_id"),
          size(split(col("dtext"), " ")).cast("long").as("n_tok"))
        graft.ops.Corpus.packSequences(toks, "doc_id", "n_tok", budget = 256L)
          .withColumn("shard", pmod(col("bin"), lit(8)).cast("int"))
      },
      Some("""WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
             |kept AS (SELECT doc_id, w FROM w WHERE
             |    len(w) BETWEEN 40 AND 100000
             |    AND round((len(text) - (len(w) - 1)) / CAST(len(w) AS DOUBLE), 4)
             |          BETWEEN 4.0 AND 10.0
             |    AND (CAST(list_contains(w, 'a') AS INT) + CAST(list_contains(w, 'the') AS INT) +
             |         CAST(list_contains(w, 'data') AS INT) + CAST(list_contains(w, 'value') AS INT) +
             |         CAST(list_contains(w, 'row') AS INT) + CAST(list_contains(w, 'table') AS INT)) >= 4
             |    AND round(CAST(list_max(list_transform(list_distinct(w),
             |          x -> len(list_filter(w, y -> y = x)))) AS DOUBLE) / len(w), 6) <= 0.12),
             |segs AS (SELECT doc_id, g, array_to_string(w[g*10+1 : g*10+10], ' ') AS seg,
             |    doc_id * 1000000 + g AS occ
             |  FROM kept, unnest(generate_series(0, CAST(ceil(len(w) / 10.0) AS BIGINT) - 1)) AS t(g)),
             |keep2 AS (SELECT seg, min(occ) AS keeper FROM segs GROUP BY seg),
             |ded AS (SELECT s.doc_id,
             |    string_agg(s.seg, ' ' ORDER BY s.g) FILTER (WHERE s.occ = k.keeper) AS dtext
             |  FROM segs s JOIN keep2 k USING (seg) GROUP BY s.doc_id),
             |tk AS (SELECT doc_id, CAST(len(string_split(dtext, ' ')) AS BIGINT) AS n_tokens
             |  FROM ded WHERE dtext IS NOT NULL AND dtext <> ''),
             |cum AS (SELECT doc_id, n_tokens,
             |    CAST(sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
             |      - n_tokens AS stream_start
             |  FROM tk)
             |SELECT doc_id, n_tokens, stream_start,
             |  CAST(stream_start // 256 AS BIGINT) AS bin,
             |  CAST((stream_start // 256) % 8 AS INT) AS shard
             |FROM cum""".stripMargin))
  )
}
