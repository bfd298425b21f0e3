package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measured scaling evidence for the STORAGE-ENGINE 100 TB claims — the
  * mutation/CDC complement of ScaleProbe's dedup curves (r6 VERDICT #5).
  * Builds tables at 1x/4x/16x the sf0.1 lineitem slice and times
  *  - mergeUpsert of a FIXED 10k-row source batch against each table
  *    (expect far-sublinear: the merge bucket-prunes to the buckets the
  *    source keys hash into, never rewriting untouched buckets),
  *  - deleteVectorized with a fixed-selectivity predicate (expect
  *    ~linear in matched rows — it writes DV sidecars, not data files —
  *    with the scan parallelizing across executors),
  *  - the cdc2-style change-feed read over the table's history (expect
  *    ~linear in change volume: per-version scans touch only that
  *    version's added dirs), and
  *  - compactDvHeavy after the delete (expect ~linear in rewritten
  *    bytes — only DV'd dirs rewrite).
  * Each k gets a fresh store so history depth is constant; only data
  * volume varies. Run:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.ScaleProbeMutation"
  */
object ScaleProbeMutation {
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

    val base = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_quantity"))
    val nBase = base.count()

    // k replicas with disjoint key ranges: volume scales, key skew doesn't
    def corpus(k: Int): DataFrame =
      (0 until k).map { i =>
        base.select((col("l_orderkey") + lit(i.toLong * 100000000L)).as("l_orderkey"),
          col("l_suppkey"), col("l_quantity"),
          // int column for the widen probe (l_suppkey fits int32)
          col("l_suppkey").cast("int").as("l_supp_i"))
      }.reduce(_ unionByName _)

    def t(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      (System.nanoTime() - t0) / 1e9
    }

    for (k <- Seq(1, 4, 16)) {
      val root = s"/tmp/graft_scaleprobe_mut/k$k"
      graft.core.FsUtil.deleteRecursively(new java.io.File(root))
      val st = new graft.core.TableStore(spark, root)
      val c = corpus(k).localCheckpoint() // pin: timings exclude synthesis

      // table bucketed on the merge key — the layout a replica converging
      // by key would actually use (bucket pruning is the scale story)
      st.createBucketed("t", c, Seq("l_orderkey"), n = 32)
      st.enableRowTracking("t")
      st.setChangeFeed("t", true)

      // fixed 10k-row upsert batch: half updates (existing keys), half
      // inserts (fresh keys) — the steady-state CDC-apply shape.
      // lineitem's l_orderkey is deliberately NON-unique in the
      // testdata (multiple lines per order); the merge source must be
      // unique on the key (M6), so collapse to one row per key first
      val updates = c.filter(col("l_orderkey") % (nBase * k / 5000).max(1L) === 0L)
        .dropDuplicates("l_orderkey")
        .limit(5000)
        .withColumn("l_quantity", col("l_quantity") + 1.0)
      val inserts = updates.select(
        (col("l_orderkey") + lit(900000000000L)).as("l_orderkey"),
        col("l_suppkey"), col("l_quantity"), col("l_supp_i"))
      val batch = updates.unionByName(inserts).localCheckpoint()

      // grouped (count,sum) view seeded BEFORE the merge: the IVM probe
      // then absorbs the merge commit's change rows only — expect FLAT
      // across k (maintenance tracks the FIXED batch's changed groups
      // and the view dirs holding them, never source or view volume)
      val vPre = st.currentVersion("t")
      st.createBucketed("v_agg", st.readVersion("t", vPre)
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("l_quantity").cast("long")).as("sum_qty")),
        Seq("l_suppkey"), n = 8)

      val mergeSec = t { st.mergeUpsert("t", batch, Seq("l_orderkey")) }
      val ivmSec = t {
        graft.ops.Ivm.applyCountSumDelta(st, "v_agg",
          st.readChangesBetween("t", vPre, st.currentVersion("t"))
            .withColumn("qty", col("l_quantity").cast("long")),
          groupCols = Seq("l_suppkey"), valueCol = "qty")
      }
      // max view seeded BEFORE the delete: the max-IVM probe then absorbs
      // a RETRACTION-HEAVY feed (the delete kills whole suppkey residue
      // classes, so ~10% of groups take the hard recompute-or-die path)
      // — expect ~linear in retracted rows, with the recompute scan
      // group-pruned to the affected residue class
      val vMid = st.currentVersion("t")
      st.createBucketed("v_max", st.readVersion("t", vMid)
        .groupBy(col("l_suppkey"))
        .agg(max(col("l_orderkey")).as("mx")),
        Seq("l_suppkey"), n = 8)

      val deleteSec = t { st.deleteVectorized("t", col("l_suppkey") % 10 === 3) }
      val ivmMaxSec = t {
        graft.ops.Ivm.applyMaxDelta(st, "v_max", "t", st.currentVersion("t"),
          st.readChangesBetween("t", vMid, st.currentVersion("t")),
          groupCols = Seq("l_suppkey"), valueCol = "l_orderkey")
      }
      val feedSec = t {
        st.readChangesBetween("t", 2, st.currentVersion("t"), withRowIds = true)
          .queryExecution.toRdd.count()
      }
      val compactSec = t { st.compactDvHeavy("t", minDeletedRatio = 0.05) }
      // replaceWhere with a FIXED-size region (one suppkey residue class
      // bounded to the FIRST replica's key range, so the region does not
      // grow with k): expect ~flat-to-mildly-rising — tombstones are
      // O(matched rows), the new batch is O(replacement rows); table
      // volume only enters through pruning, never through rewrites
      val region = col("l_suppkey") % 100 === 7 && col("l_orderkey") < 100000000L
      val replacement = base
        .filter(col("l_suppkey") % 100 === 7 && col("l_orderkey") < 100000000L)
        .withColumn("l_quantity", lit(0.0))
        .withColumn("l_supp_i", col("l_suppkey").cast("int")).localCheckpoint()
      val replaceSec = t { st.overwriteWhere("t", region, replacement) }
      // metadata-only type widening: expect FLAT across k (one manifest
      // commit regardless of table volume — the r9 feature's 100 TB
      // claim), plus the widened read staying volume-linear
      val widenSec = t {
        st.alterColumnType("t", "l_supp_i",
          org.apache.spark.sql.types.LongType)
      }
      // ---- join-view (mv4) curve: the star view's three cost regimes.
      //      star_full = the initial full compute (the REBUILD cost the
      //      incremental path amortizes away — expect ~linear in k);
      //      star_delta = absorbing a FIXED 10k-row source batch
      //      (expect ~flat: last-state collapse + broadcast dim join +
      //      bucket-pruned upsert, never a fact rescan); star_dim = a
      //      dim-only change touching ~0.1% of foreign keys (rewrite is
      //      O(affected fact rows); the view-side probe scan is the one
      //      volume-linear term — FK clustering/z-order would dir-prune
      //      it, noted in PLANS.md). ----
      val dimRows = base.select(col("l_suppkey")).distinct()
        .withColumn("s_attr", concat(lit("a"), col("l_suppkey")))
      st.create("dim", dimRows)
      st.setChangeFeed("dim", true)
      val tCols = Seq("l_orderkey", "l_suppkey", "l_quantity", "l_supp_i")
      def enrichStar(rows: DataFrame): DataFrame = rows
        .join(broadcast(st.read("dim")), Seq("l_suppkey"), "left")
        .select((tCols :+ "s_attr").map(col): _*)
      val vS0 = st.currentVersion("t")
      val starFullSec = t {
        st.createBucketed("v_star",
          enrichStar(st.readVersion("t", vS0)).withColumn("_live", lit(true)),
          Seq("l_orderkey"), n = 32)
      }
      // indexed TWIN (r12 VERDICT #3): same content, plus the FK
      // secondary index — the dim-term probe then runs as two
      // bucket-pruned reads instead of a view scan; the twin receives
      // the SAME applies so star_dim vs star_dim_ix is a controlled
      // comparison of just the probe path
      st.createBucketed("v_star_ix",
        enrichStar(st.readVersion("t", vS0)).withColumn("_live", lit(true)),
        Seq("l_orderkey"), n = 32)
      graft.ops.Ivm.enableFkIndex(st, "v_star_ix", Seq("l_suppkey"),
        Seq("l_orderkey"), buckets = 32)
      val batch2 = batch.select(
        (col("l_orderkey") + lit(950000000000L)).as("l_orderkey"),
        col("l_suppkey"), col("l_quantity"), col("l_supp_i")).localCheckpoint()
      st.mergeUpsert("t", batch2, Seq("l_orderkey"))
      val starDeltaSec = t {
        graft.ops.Ivm.applyJoinDelta(st, "v_star", "t", vS0,
          st.currentVersion("t"), Seq("l_orderkey"), enrichStar)
      }
      // the twin's source-term apply, timed separately: its extra cost
      // over star_delta is the index maintenance (one batch-sized
      // bucket-pruned upsert)
      val starDeltaIxSec = t {
        graft.ops.Ivm.applyJoinDelta(st, "v_star_ix", "t", vS0,
          st.currentVersion("t"), Seq("l_orderkey"), enrichStar)
      }
      val vS1 = st.currentVersion("t")
      val dv0 = st.currentVersion("dim")
      st.update("dim", col("l_suppkey") % 997 === 3,
        Map("s_attr" -> concat(col("s_attr"), lit("!"))))
      val affected = st.readChangesBetween("dim", dv0, st.currentVersion("dim"))
        .select("l_suppkey").localCheckpoint()
      val starDimSec = t {
        graft.ops.Ivm.applyJoinDelta(st, "v_star", "t", vS1, vS1,
          Seq("l_orderkey"), enrichStar,
          dimAffected = Some((affected, Seq("l_suppkey"))))
      }
      val starDimIxSec = t {
        graft.ops.Ivm.applyJoinDelta(st, "v_star_ix", "t", vS1, vS1,
          Seq("l_orderkey"), enrichStar,
          dimAffected = Some((affected, Seq("l_suppkey"))))
      }
      // ---- symmetric join2 (mv6) curve: A and B both k-volume, view =
      //      A ⋈ B (1:1 on the order key so pair count scales with
      //      volume, not k²). join2_full = the initial pair compute
      //      (~linear); join2_delta = absorbing a fixed 10k-row batch
      //      on EACH side in one apply (the A-key probe bucket-prunes;
      //      the B-key probe of the view is scan-bound without a
      //      second clustering — reported honestly). ----
      val aFrame = c.dropDuplicates("l_orderkey").localCheckpoint()
      val bFrame = aFrame.select(col("l_orderkey").as("b_orderkey"),
        col("l_suppkey").as("b_supp"), col("l_quantity").as("b_qty"))
        .localCheckpoint()
      st.createBucketed("ja", aFrame.drop("l_supp_i"), Seq("l_orderkey"), n = 32)
      st.setChangeFeed("ja", true)
      st.createBucketed("jb", bFrame, Seq("b_orderkey"), n = 32)
      st.setChangeFeed("jb", true)
      val (ja0, jb0) = (st.currentVersion("ja"), st.currentVersion("jb"))
      def combine2(a: DataFrame, b: DataFrame): DataFrame =
        a.join(b, col("l_orderkey") === col("b_orderkey"))
          .select(col("l_orderkey"), col("b_orderkey"), col("l_suppkey"),
            col("l_quantity"), col("b_supp"), col("b_qty"))
      val join2FullSec = t {
        st.createBucketed("v_pairs",
          combine2(st.readVersion("ja", ja0), st.readVersion("jb", jb0))
            .withColumn("_live", lit(true)), Seq("l_orderkey"), n = 32)
      }
      // indexed twin (r12 VERDICT #4): the B-key probe routes through
      // the (b_orderkey -> pair keys) index instead of scanning the
      // a-keyed view
      st.createBucketed("v_pairs_ix",
        combine2(st.readVersion("ja", ja0), st.readVersion("jb", jb0))
          .withColumn("_live", lit(true)), Seq("l_orderkey"), n = 32)
      graft.ops.Ivm.enableFkIndex(st, "v_pairs_ix", Seq("b_orderkey"),
        Seq("l_orderkey"), buckets = 32)
      val aBatch = batch.select(col("l_orderkey"), col("l_suppkey"),
        (col("l_quantity") + 5.0).as("l_quantity"))
      val bBatch = batch.select(col("l_orderkey").as("b_orderkey"),
        col("l_suppkey").as("b_supp"), (col("l_quantity") + 9.0).as("b_qty"))
      st.mergeUpsert("ja", aBatch, Seq("l_orderkey"), changeTypeCol = None)
      st.mergeUpsert("jb", bBatch, Seq("b_orderkey"), changeTypeCol = None)
      val join2DeltaSec = t {
        graft.ops.Ivm.applyTwoSidedJoinDelta(st, "v_pairs",
          "ja", ja0, st.currentVersion("ja"), Seq("l_orderkey"),
          "jb", jb0, st.currentVersion("jb"), Seq("b_orderkey"), combine2)
      }
      val join2DeltaIxSec = t {
        graft.ops.Ivm.applyTwoSidedJoinDelta(st, "v_pairs_ix",
          "ja", ja0, st.currentVersion("ja"), Seq("l_orderkey"),
          "jb", jb0, st.currentVersion("jb"), Seq("b_orderkey"), combine2)
      }
      println(f"""{"k":$k,"rows":${nBase * k},"merge_sec":$mergeSec%.2f,""" +
        f""""ivm_sec":$ivmSec%.2f,"ivm_max_sec":$ivmMaxSec%.2f,""" +
        f""""delete_sec":$deleteSec%.2f,"feed_sec":$feedSec%.2f,""" +
        f""""compact_sec":$compactSec%.2f,"replace_sec":$replaceSec%.2f,""" +
        f""""widen_sec":$widenSec%.2f,"star_full_sec":$starFullSec%.2f,""" +
        f""""star_delta_sec":$starDeltaSec%.2f,""" +
        f""""star_delta_ix_sec":$starDeltaIxSec%.2f,""" +
        f""""star_dim_sec":$starDimSec%.2f,""" +
        f""""star_dim_ix_sec":$starDimIxSec%.2f,""" +
        f""""join2_full_sec":$join2FullSec%.2f,""" +
        f""""join2_delta_sec":$join2DeltaSec%.2f,""" +
        f""""join2_delta_ix_sec":$join2DeltaIxSec%.2f,"batch":10000}""")
      graft.core.FsUtil.deleteRecursively(new java.io.File(root))
    }
    spark.stop()
  }
}
