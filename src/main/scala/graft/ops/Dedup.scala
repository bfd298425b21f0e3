package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators (reference W1/W2).
  *
  *  - W1 exact-duplicate drop: bronze/jobs/validate_bronze.py:161-168
  *    (ROW_NUMBER PARTITION BY (transaction_id, updated_at) ... = 1)
  *  - W2 latest-version dedup: silver/jobs/validate_silver.py:119-129
  *    (ROW_NUMBER PARTITION BY transaction_id ORDER BY updated_at DESC)
  */
object Dedup {

  /** W1: drop exact duplicates on the composite key. `dropDuplicates` is
    * the Catalyst-native form of ROW_NUMBER()=1 over identical rows —
    * plans as a hash aggregate with map-side partial combine, which beats
    * a window (shuffle + per-partition sort) at scale. */
  def exact(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)

  /** W2: keep the latest version per key (ORDER BY orderCol DESC,
    * tieBreak ASC). Window form — single shuffle on keys + sort; the
    * reference's exact shape. Skewed hot keys are the scale risk;
    * prefer [[latestVersionAgg]] when the ordering tuple can be packed
    * into a struct. */
  def latestVersion(df: DataFrame, keys: Seq[String],
                    orderCol: String, tieBreak: Seq[Column] = Seq.empty): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(orderCol).desc +: tieBreak: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** W2 scale path: hash-aggregate max_by(row, orderingStruct) — partial
    * aggregation on the map side means hot keys never concentrate whole
    * groups on one task the way a window sort does. `ordering` must be a
    * struct whose lexicographic MAX picks the winner (e.g.
    * struct(updated_at, -id) for "latest, then smallest id"). */
  def latestVersionAgg(df: DataFrame, keys: Seq[String], ordering: Column): DataFrame = {
    // backtick-quote on the way into the struct and getField on the way
    // out: a data column whose NAME contains a dot (flattened-JSON
    // ingests) must resolve as a name, not a nested-field path —
    // cdcMergeStream calls this on arbitrary batch schemas
    val dataCols = df.columns.filterNot(keys.contains)
    val packed = df.groupBy(keys.map(col): _*)
      .agg(max_by(struct(dataCols.map(c => col(s"`$c`").as(c)): _*), ordering)
        .as("__row"))
    packed.select(keys.map(col) ++
      dataCols.map(c => col("__row").getField(c).as(c)): _*)
  }

  /** MinHash signatures banded into LSH keys: one row per (doc, band)
    * with `bkey` = hash of the band's signature slice. Docs sharing any
    * (band, bkey) are near-dup CANDIDATES — an equi-join key, never a
    * quadratic comparison. Hash family = xxhash64 seeded by index, so
    * keys are a pure function of the data (deterministic, and two
    * independently computed indexes agree — what makes a PERSISTED band
    * index meaningful). `shingles` must be (docCol, shingleCol) distinct
    * pairs; nHashes must be divisible by nBands. */
  def minhashBands(shingles: DataFrame, docCol: String, shingleCol: String,
                   nHashes: Int = 64, nBands: Int = 32): DataFrame = {
    require(nHashes % nBands == 0, "nHashes must be divisible by nBands")
    val rowsPerBand = nHashes / nBands
    // Hash the shingle ONCE to an 8-byte long, then derive the nHashes
    // family members from that long: xxhash64 over 8 bytes is ~free next
    // to re-hashing the full shingle string per family index (the
    // round-4 regression — 64 string hashes per input row). Works
    // identically when shingleCol is already a hash (callers may pre-hash
    // to move longs through their own shuffles).
    val hashed = shingles.withColumn("__h0", xxhash64(col(shingleCol)))
    val sigCols = (0 until nHashes).map(i =>
      min(xxhash64(col("__h0"), lit(i))).as(s"m$i"))
    val sig = hashed.groupBy(docCol).agg(sigCols.head, sigCols.tail: _*)
    val bandStructs = (0 until nBands).map { bi =>
      val slice = (0 until rowsPerBand).map(r => col(s"m${rowsPerBand * bi + r}"))
      struct(lit(bi).as("band"), xxhash64(slice: _*).as("bkey"))
    }
    sig.select(col(docCol), explode(array(bandStructs: _*)).as("bb"))
      .select(col(docCol), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
  }

  /** INCREMENTAL near-dup admission: which batch docs are near-dups
    * (exact jaccard >= threshold over shingle sets) of any INDEXED doc?
    * `indexBands` is the persisted corpus band index ([[minhashBands]]
    * rows, typically a bucketed store table keyed on bkey); candidates
    * come from the (band, bkey) equi-join — the batch side is small, so
    * at 100 TB the probe reads ~|batch| x nBands index rows through the
    * bucket layout, never the corpus. Exact verification re-shingles
    * ONLY the candidate corpus docs: `corpusShingles` is semi-joined to
    * the candidate ids BEFORE its sets aggregate, so corpus work is
    * O(candidates), not O(corpus) — the property that lets a
    * continuously-ingesting pipeline verify against a 100 TB corpus.
    * Returns the REJECTED batch doc ids with their best-matching corpus
    * doc and jaccard (callers anti-join to admit; admitted docs' bands
    * then append to the index). Shingle args carry (docCol, shingleCol)
    * distinct pairs. */
  def nearDupsAgainstIndex(batchBands: DataFrame, indexBands: DataFrame,
                           batchShingles: DataFrame, corpusShingles: DataFrame,
                           docCol: String, shingleCol: String,
                           threshold: Double): DataFrame = {
    val cand = bandCandidates(batchBands, indexBands, docCol)
    val candSets = shingleSets(corpusShingles.join(
      cand.select(col("corpus_id").as(docCol)).distinct(), Seq(docCol), "left_semi"),
      docCol, shingleCol)
    verifyCandidates(cand, shingleSets(batchShingles, docCol, shingleCol),
      candSets, docCol, threshold)
  }

  /** [[nearDupsAgainstIndex]] over PRECOMPUTED per-doc shingle sets
    * (r15, guide §1.2/§3.3): a STREAMING admission loop calls the
    * verify once per micro-batch, and re-aggregating the batch's and
    * the candidates' shingle sets from the raw shingle table each
    * batch re-paid the collect_set shuffle every trigger. The caller
    * aggregates `sets` = [[shingleSets]] over the WHOLE corpus once
    * (cached), and each batch's verify is then two joins against it —
    * the candidate frame is batch-sized, so the joins broadcast and
    * the set table is never shuffled. Results are identical: the
    * per-doc sets are the same rows the per-batch aggregation built,
    * and the candidate join keys select exactly the same subset. */
  def nearDupsAgainstIndexSets(batchBands: DataFrame, indexBands: DataFrame,
                               sets: DataFrame, docCol: String,
                               threshold: Double): DataFrame = {
    val cand = bandCandidates(batchBands, indexBands, docCol)
    verifyCandidates(cand, sets, sets, docCol, threshold)
  }

  /** Per-doc shingle sets + sizes — the exact-verify side's input. */
  def shingleSets(shingles: DataFrame, docCol: String,
                  shingleCol: String): DataFrame =
    shingles.groupBy(docCol)
      .agg(collect_set(col(shingleCol)).as("set"), count(lit(1)).as("n"))

  /** Band-collision candidate pairs: batch doc × indexed doc sharing a
    * (band, bkey) bucket. */
  private def bandCandidates(batchBands: DataFrame, indexBands: DataFrame,
                             docCol: String): DataFrame =
    batchBands.select(col(docCol).as("batch_id"), col("band"), col("bkey"))
      .join(indexBands.select(col(docCol).as("corpus_id"), col("band"), col("bkey")),
        Seq("band", "bkey"))
      .select("batch_id", "corpus_id").distinct()

  /** Exact-Jaccard verify of candidate pairs against per-doc set
    * frames; keeps each batch doc's best duplicate above `threshold`. */
  private def verifyCandidates(cand: DataFrame, batchSets: DataFrame,
                               corpusSets: DataFrame, docCol: String,
                               threshold: Double): DataFrame =
    cand
      .join(batchSets.select(col(docCol).as("batch_id"),
        col("set").as("sb"), col("n").as("nb")), Seq("batch_id"))
      .join(corpusSets.select(col(docCol).as("corpus_id"),
        col("set").as("sc"), col("n").as("nc")), Seq("corpus_id"))
      .withColumn("inter", size(array_intersect(col("sb"), col("sc"))).cast("long"))
      .withColumn("jaccard", col("inter") / (col("nb") + col("nc") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .groupBy("batch_id")
      .agg(max_by(col("corpus_id"), col("jaccard")).as("dup_of"),
        max(col("jaccard")).as("jaccard"))
}
