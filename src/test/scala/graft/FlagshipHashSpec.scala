package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** In-JVM oracle fallback for the flagship queries: each result's
  * sf0.001 hash is pinned, computed the way the driver's DuckDB compare
  * does (columns sorted by name, rows sorted, values stringified) — a
  * semantics regression in any flagship reds HERE, in `sbt test`,
  * before the driver round-trip ever runs (r7 VERDICT task #8).
  *
  * If a hash "drifts" because the query's SEMANTICS intentionally
  * changed, re-pin it only after `tools/check.py` shows the new result
  * matching its DuckDB oracle — the pin encodes "last oracle-green
  * result", not "whatever the code currently returns". */
class FlagshipHashSpec extends AnyFunSuite {
  lazy val spark = SparkTest.session
  private val sfDir = "/root/testdata/sf0.001"

  /** ONE digest implementation shared with the re-pinning tool
    * (`graft.tools.PinHash.resultHash`) — the spec and the tool can
    * never drift apart. */
  private def resultHash(df: DataFrame): String =
    graft.tools.PinHash.resultHash(df)

  // pinned from an oracle-green run (tools/check.py 171/176, round 8)
  private val pinned = Map(
    "q1_agg" -> "15a46f11992e1da01c1c4f5de2e1efe5",
    "j1_star_join" -> "66cb57b3e7b312d395f28552933fe20a",
    "m1_merge_composite" -> "438b370b7f712ead9f0b63fc4c39b18d",
    "d2_ngram_jaccard" -> "539e88fb73e8b08388a00db0ed7ed31c",
    "x13_dsir_resample" -> "560c97c2c92b76d0bc2f6d84230c6905",
    "x18_exact_substring_dedup" -> "aa1575a3152b3c5e0e290ae350229b5b",
    // r8 additions, pinned from the oracle-green tools/check.py 4/4 run
    "x19_token_balanced_shards" -> "d9fc4743fba7bfa472b4bcc7d57b51c6",
    "t13_repetition_ngrams" -> "36e3c4e02913288b337b8f93a8f765f9",
    "er1_fuzzy_match" -> "364e7af79aa11b2c2cee8598d020d935",
    "st17_stream_static_join" -> "25721cfbfe944365cf83bb822a91a013",
    "t14_bm25" -> "ee193334ff9f21487ffc44f1decd0a25",
    // sql_replace_where is deliberately NOT pinned here even though it
    // is pinned-by-proxy (its digest equals m20's by design — the SQL
    // surface and the library call run one code path): it binds the
    // shared `graft` catalog name to the query-store root, which the
    // session caches, silently re-rooting every later catalog suite
    // (the known catalog-cache-by-name behavior).
    "m20_replace_where" -> "df26c591ba5092fdbcd44330e34f676d",
    "t15_bpe_merges" -> "b33ebac4ad2fa773b5ddc20cd57a45cc",
    // r9: er2 re-pinned after the multi-key blocking union (prefix +
    // suffix) legitimately added lev-1 edges whose names share no
    // prefix — oracle-green via tools/check.py before re-pinning.
    "er2_fuzzy_dedup" -> "28fac6f3a2638b22b106596d9695365e",
    // r9 additions, pinned from oracle-green tools/check.py runs.
    // m21_vacuum is deliberately NOT pinned: like sql_replace_where it
    // binds the shared `graft` catalog name to the query-store root,
    // which the session caches by name, silently re-rooting every
    // later catalog suite.
    "t16_bpe_encode" -> "c27b192b668ee79a82434de3c7d33b8d",
    "st18_stream_scd2_dim" -> "c935dcd7d13f714feed8db2979b0c18a",
    // r10 additions, pinned from oracle-green tools/check.py runs at
    // BOTH sf0.001 (this pin's scale) and sf0.01 (the driver's gate)
    "x20_weighted_mix" -> "98b54e60be9033f7d9813aaeb582ed9d",
    "m23_crash_adopt" -> "39267ba4107fd86954ae4e7a96269751",
    // r11 additions, pinned from the oracle-green tools/check.py runs
    // (x21 MATCH at sf0.01 AND sf0.1; m24 MATCH at sf0.01)
    "x21_dedup_then_lsh" -> "53d24e6a3b16f8722259758a225bfe82",
    "m24_merge_evolve" -> "64852383a73c8c55c840978a328da343",
    // r12 flagships, pinned from the oracle-green CORRECTNESS_r12 state
    // (PinHash at r13 head, semantics untouched since). The digests
    // THEMSELVES enforce the round's equality claims:
    //   st20 == job_fact_star_incremental (one maintained star),
    //   sql_matview_join == mv4, sql_matview_join2 == mv6 (the SQL
    //   faces and the library calls run one code path).
    "mv4_incremental_star" -> "d5983e6d13f5ca8e1a4d9ea397ca5f86",
    "mv6_incremental_join2" -> "7171c359e85c5641dd09f752c28ef9ef",
    "st20_stream_star_maintenance" -> "df7bfc9246c38447bff898d22020da44",
    "job_fact_star_incremental" -> "df7bfc9246c38447bff898d22020da44",
    // r13: the two-level streaming DAG — digest-equal BY DESIGN to
    // mv5/sql_matview_dag (one cascade, three drivers: library calls,
    // SQL registry, standing stream with an injected restart)
    "st21_stream_matview_dag" -> "29d49697d735f6797d0e8edd5b90b215",
    // r13: registry-aware RESTORE made driver-visible — converges only
    // if restore rewinds the ivm:* watermarks with the rows
    "m25_restore_view" -> "6f300295e2943d2bdd1242eabf87895a",
    // r13: the set-valued top-k IVM kind (both arms in one history)
    "mv7_incremental_topk" -> "0c1f01bebdffcce3c7890e60be1305fc",
    // r14: mv7 as a standing stream with an injected checkpoint-restart
    // crash — digest-equal to mv7 BY DESIGN (one top-k algebra, two
    // drivers), so this pin enforces the equality claim itself
    "st22_stream_topk" -> "0c1f01bebdffcce3c7890e60be1305fc",
    // r14: the FK index driver-visible (oracle = UNINDEXED semantics —
    // a probe miss or a leaked stale entry reds this pin), and the
    // sketch-state IVM kind behind its a13-style exactness gate; both
    // pinned from the oracle-green tools/check.py 4/4 run at sf0.01
    "mv8_indexed_star" -> "66ed8fd329be95a414a808dcacb01499",
    "mv9_incremental_sketch" -> "e18fc46b9887995f9188bb2c57924546",
    // r14: the sketch rollup (register union from the fine view's feed,
    // never a fact read) — oracle-green tools/check.py 1/1 at sf0.01
    "mv10_sketch_rollup" -> "9987db2275c006fa449f492727534b91",
    // r14: mv9 as a standing stream with an injected restart —
    // digest-equal to mv9 BY DESIGN (one register algebra, two drivers)
    "st23_stream_sketch" -> "e18fc46b9887995f9188bb2c57924546",
    // r14: registry-aware retention on a live cascade — a sweep that
    // breaks a later refresh's window or a watermark reds this pin
    "m26_vacuum_view" -> "fb127f836d3c9e71391f06618fed5366",
    // r14: the sketch kind's pure-SQL face — digest-equal to mv9 and
    // st23 BY DESIGN (one register algebra, three drivers); binds its
    // OWN catalog name, so it pins safely in the shared session
    "sql_matview_sketch" -> "e18fc46b9887995f9188bb2c57924546",
    // r14: the histogram-state quantile IVM kind (DDSketch log bins;
    // bin counts form an abelian group, so retractions are pure
    // algebra — no recompute arm exists). The pinned result carries
    // the view's own maintained n_rows as a hash column: a count-
    // algebra slip reds this pin, not just the gate. Oracle-green
    // tools/check.py MATCH at sf0.001 AND sf0.01 before pinning.
    "mv11_incremental_quantile" -> "a32aa49ed04b38846e2437bd59228b24",
    // r14: mv11's SQL registry face and its standing-stream twin (with
    // an injected checkpoint-restart crash) — digest-equal to mv11 BY
    // DESIGN (one histogram algebra, three drivers), so these pins
    // enforce the equality claim itself; both MATCH at sf0.001 and
    // sf0.01 before pinning. sql_matview_quantile binds its OWN
    // catalog name, so it pins safely in the shared session.
    "sql_matview_quantile" -> "a32aa49ed04b38846e2437bd59228b24",
    "st24_stream_quantile" -> "a32aa49ed04b38846e2437bd59228b24",
    // r14: the quantile ROLLUP — the only rollup kind with no hard arm
    // at either level (bin counts over a partition sum to the union's);
    // n_rows rides hash-checked through TWO maintained levels.
    // Oracle-green tools/check.py MATCH at sf0.001 AND sf0.01.
    "mv12_quantile_rollup" -> "a286a64cd60694dd22ff82a37037926b",
    // r14: the moments kind (a6's maintained twin) — exact (n, Σv, Σv²)
    // state, avg/var/stddev derived at read time from exact longs, so
    // EVERY column including the variance is hash-checked (no gate).
    // Oracle-green tools/check.py MATCH at sf0.001 AND sf0.01.
    "mv13_incremental_moments" -> "3e2a680df1fb815af497f45741ced998")

  // These bind the shared `graft` catalog name to the query-store root
  // (sqlCatalogStore) — in the SHARED session that would silently
  // re-root every later catalog suite (the catalog-cache-by-name
  // behavior that kept sql_replace_where/m21_vacuum unpinned since r8).
  // `newSession()` gives an isolated SessionState (own conf + catalog
  // cache) over the same SparkContext, so the binding dies with the
  // pin. sql_merge_evolve's digest equals m24's BY DESIGN (same
  // fixture, one MERGE code path); sql_matview_refresh/dag pin the
  // registry's count_sum face and the three-level DAG.
  private val pinnedIsolated = Map(
    "sql_merge_evolve" -> "64852383a73c8c55c840978a328da343",
    "sql_matview_refresh" -> "c19b8b4ed15cb19255013926957fb6b0",
    "sql_matview_join" -> "d5983e6d13f5ca8e1a4d9ea397ca5f86",
    "sql_matview_join2" -> "7171c359e85c5641dd09f752c28ef9ef",
    "sql_matview_dag" -> "29d49697d735f6797d0e8edd5b90b215")

  pinned.foreach { case (name, expected) =>
    test(s"flagship $name: sf0.001 result hash matches the oracle-green pin") {
      val actual = resultHash(Queries.all(name).fn(spark, sfDir))
      assert(actual === expected,
        s"$name result drifted from its last oracle-green pin (got $actual) — " +
          "if intentional, re-verify vs DuckDB (tools/check.py) before re-pinning")
    }
  }

  pinnedIsolated.foreach { case (name, expected) =>
    test(s"flagship $name: sf0.001 result hash matches the pin (isolated session)") {
      val actual = resultHash(Queries.all(name).fn(spark.newSession(), sfDir))
      assert(actual === expected,
        s"$name result drifted from its last oracle-green pin (got $actual) — " +
          "if intentional, re-verify vs DuckDB (tools/check.py) before re-pinning")
    }
  }
}
