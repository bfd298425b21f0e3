package graft

import org.apache.spark.sql.functions._

import graft.streaming.StreamingJobs

/** Structured Streaming operator queries: st1 runs a REAL streaming
  * query (parquet readStream -> event-time watermark -> tumbling-window
  * aggregate -> memory sink, AvailableNow trigger) whose materialized
  * result matches a batch DuckDB oracle; st2 is typed
  * KeyValueGroupedDataset sessionization with a window-function oracle.
  * StreamingSpec covers the unbounded-side semantics (late-event drops,
  * mapGroupsWithState, foreachBatch CDC merge) with MemoryStream.
  */
object QueriesStreaming {

  import Queries.{Q, QDef}

  val defs: Map[String, QDef] = Map(

    // ---- st1: streaming windowed aggregation, end-to-end ----
    "st1_stream_windowed_counts" -> QDef(
      (s, dir) => {
        val schema = Tables.events(s, dir).schema
        // the file-stream source requires a directory: stream the sf dir
        // with a glob pinned to the events table
        val stream = s.readStream.schema(schema)
          .option("pathGlobFilter", "events.parquet").parquet(dir)
        StreamingJobs.runToMemory(
          s, StreamingJobs.windowedEventCounts(stream), "st1_mem")
      },
      Some("""SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS window_start,
             |  event_type, count(*) AS n_events
             |FROM events GROUP BY 1, 2""".stripMargin)),

    // ---- st4: sliding windows (1-day length, 12-hour slide) ----
    // (each event lands in exactly two windows; the oracle enumerates
    //  both window starts per event and re-aggregates)
    "st4_sliding_window" -> QDef(
      (s, dir) => {
        StreamingJobs.withEventTime(Tables.events(s, dir))
          .groupBy(window(col("ev_ts"), "1 day", "12 hours"), col("event_type"))
          .agg(count(lit(1)).as("n_events"))
          .select(col("window.start").cast("timestamp_ntz").as("window_start"),
            col("event_type"), col("n_events"))
      },
      Some("""SELECT window_start, event_type, CAST(count(*) AS BIGINT) AS n_events
             |FROM (SELECT event_type, unnest([
             |        to_timestamp(floor(epoch(CAST(ts AS TIMESTAMP)) / 43200) * 43200)::TIMESTAMP,
             |        to_timestamp(floor(epoch(CAST(ts AS TIMESTAMP)) / 43200) * 43200
             |          - 43200)::TIMESTAMP]) AS window_start
             |      FROM events)
             |GROUP BY 1, 2""".stripMargin)),

    // ---- st3: built-in session_window (gap-based, streaming-capable) ----
    // (the declarative twin of st2's typed sessionization: Catalyst's
    //  session_window merges events closer than the gap; session end is
    //  last event + gap by definition)
    "st3_session_window" -> QDef(
      (s, dir) => {
        StreamingJobs.withEventTime(Tables.events(s, dir))
          .groupBy(col("user_id"), session_window(col("ev_ts"), "30 minutes"))
          .agg(count(lit(1)).as("n_events"))
          .select(col("user_id"),
            col("session_window.start").cast("timestamp_ntz").as("session_start"),
            col("session_window.end").cast("timestamp_ntz").as("session_end"),
            col("n_events"))
      },
      Some("""WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS t FROM events),
             |g AS (SELECT *, CASE WHEN lag(t) OVER w IS NULL
             |                       OR t - lag(t) OVER w >= INTERVAL 30 MINUTE
             |                     THEN 1 ELSE 0 END AS brk
             |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
             |s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY t, event_id
             |                ROWS UNBOUNDED PRECEDING) AS sid FROM g)
             |SELECT user_id, min(t) AS session_start,
             |  max(t) + INTERVAL 30 MINUTE AS session_end,
             |  count(*) AS n_events
             |FROM s GROUP BY user_id, sid""".stripMargin)),

    // ---- st2: typed sessionization (30-min gap split) ----
    "st2_sessionize" -> QDef(
      (s, dir) => {
        StreamingJobs.sessionize(Tables.events(s, dir)).toDF()
          .select(col("user_id"), col("session_id"),
            col("session_start").cast("timestamp_ntz").as("session_start"),
            col("session_end").cast("timestamp_ntz").as("session_end"),
            col("n_events"))
      },
      Some("""WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS t FROM events),
             |g AS (SELECT *, CASE WHEN lag(t) OVER w IS NULL
             |                       OR t - lag(t) OVER w > INTERVAL 30 MINUTE
             |                     THEN 1 ELSE 0 END AS brk
             |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
             |s AS (SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY t, event_id
             |                     ROWS UNBOUNDED PRECEDING) - 1 AS INT) AS session_id
             |      FROM g)
             |SELECT user_id, session_id, min(t) AS session_start,
             |  max(t) AS session_end, count(*) AS n_events
             |FROM s GROUP BY user_id, session_id""".stripMargin)),

    // ---- st7: stateful streaming dedup — dropDuplicatesWithinWatermark
    //      keys the dedup state store on (user_id, event_type); with the
    //      whole corpus in one AvailableNow batch the emitted set is
    //      exactly the distinct pairs, which the batch oracle replays ----
    "st7_stream_dedup" -> QDef(
      (s, dir) => {
        import org.apache.spark.sql.streaming.Trigger
        val schema = Tables.events(s, dir).schema
        val stream = s.readStream.schema(schema)
          .option("pathGlobFilter", "events.parquet").parquet(dir)
        val q = StreamingJobs.withEventTime(stream)
          .withWatermark("ev_ts", "1 day")
          .dropDuplicatesWithinWatermark(Seq("user_id", "event_type"))
          .select(col("user_id"), col("event_type"))
          .writeStream.format("memory").queryName("st7_mem")
          .outputMode("append")
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        s.table("st7_mem")
      },
      Some("SELECT DISTINCT user_id, event_type FROM events")),

    // ---- st17: STREAM-STATIC join — the dimension-enrichment pattern
    //      every production stream runs: the event stream inner-joins a
    //      broadcast customer dim. Stateless (no watermark, no state
    //      store — the static side is planned as a broadcast build
    //      re-resolved per micro-batch), append mode, so the enriched
    //      stream is exactly the batch join, which the oracle replays.
    //      At scale the dim broadcast is the same call the batch star
    //      join (j1) makes; a non-broadcastable dim falls back to a
    //      per-batch shuffle join with no extra streaming state. ----
    // ---- st18: STREAM-DRIVEN GOLD DIM (r8 VERDICT #7) — the SCD2
    //      close/reopen flow driven by a foreachBatch over the store's
    //      OWN change feed, reusing the EXACT batch body
    //      (PaymentJobs.customerAggregates + Scd2.step — one body, two
    //      drivers). Day-1 silver seeds the dim; day-2 changes land as
    //      two CDC merge commits over DISJOINT customer halves;
    //      maxVersionsPerTrigger=1 streams them as two micro-batches.
    //      Each batch: affected customers from the change rows, their
    //      aggregates recomputed from the silver VERSION the batch
    //      belongs to (version-pinned read — the production shape), one
    //      Scd2.step, dim overwritten. Because each customer's whole
    //      delta sits in one commit, the converged dim must equal the
    //      single-shot batch run on every business column — asserted
    //      in-query via exceptAll BOTH ways (surrogate keys excluded:
    //      key ORDER legitimately differs across chunkings). At scale
    //      this is O(changed customers) per batch — the snapshot is
    //      semi-joined to the batch's affected set, never the full
    //      customer population. Oracle = the job_dim_customer_scd2
    //      replay without the key column. ----
    "st18_stream_scd2_dim" -> QDef(
      (s, dir) => {
        import org.apache.spark.sql.streaming.Trigger
        import graft.jobs.{PaymentData, PaymentJobs}
        val root = "/tmp/graft_qstore/st18_scd2"
        graft.core.FsUtil.clearAsync(new java.io.File(root))
        val st = new graft.core.TableStore(s, root)
        val staging = PaymentJobs.bronzeStaging(PaymentData.transactions(s, dir))
          .withColumn("is_deleted", lit(false)).cache()
        val silverAll = PaymentJobs.silverFromBronze(staging).cache()
        // cached: silverPre feeds BOTH the day-1 silver create and the
        // dim seed's customerAggregates — uncached, the latest-version
        // dedup aggregate (a full staging scan + shuffle) ran twice
        val silverPre = PaymentJobs.silverFromBronze(
          staging.filter(col("updated_at") === col("transaction_timestamp") &&
            col("transaction_timestamp") < lit("1998-01-01").cast("timestamp_ntz")))
          .cache()
        // day-1 silver: the pre snapshot MINUS the future-dim-insert
        // band, so USER_09% rows arrive through the stream and the
        // insert branch fires there, exactly as the batch job's does
        val silverDay1 = silverPre.filter(
          col("customer_id").isNull || !col("customer_id").like("USER_09%"))
        st.create("silver", silverDay1)                                // v0
        st.setChangeFeed("silver", true)                               // v1
        // day-2 delta: every id whose latest version moved, plus new ids
        val delta = silverAll.join(
          silverDay1.select("transaction_id", "updated_at"),
          Seq("transaction_id", "updated_at"), "left_anti").cache()
        val half = when(col("customer_id").isNull, lit(0L))
          .otherwise(pmod(xxhash64(col("customer_id")), lit(2)))
        // gate off (r15): delta derives from the latestVersionAgg-deduped
        // silverAll, so each half is unique on transaction_id by
        // construction — the merge's uniqueness exchange is redundant
        st.mergeUpsert("silver", delta.filter(half === 0L),
          Seq("transaction_id"), changeTypeCol = None,
          verifyUniqueSource = false)                                  // v2
        st.mergeUpsert("silver", delta.filter(half === 1L),
          Seq("transaction_id"), changeTypeCol = None,
          verifyUniqueSource = false)                                  // v3
        // dim seed (shared with the batch job's dim1 construction)
        val cfg = graft.ops.Scd2.Config("customer_id", "customer_key",
          Seq("customer_tier", "last_transaction_date"))
        val today = to_date(lit("2026-08-12"))
        val dim1 = graft.ops.SurrogateKeys.byOrder(
            PaymentJobs.customerAggregates(silverPre)
              .filter(!col("customer_id").like("USER_09%")),
            "customer_key", Seq(col("customer_id")))
          .withColumn("effective_start_date", to_date(lit("2026-01-01")))
          .withColumn("effective_end_date", lit(null).cast("date"))
          .withColumn("is_current", lit(true))
          .cache()
        st.create("dim", dim1)
        s.conf.set("spark.sql.catalog.graft_st18", "graft.sources.GraftCatalog")
        s.conf.set("spark.sql.catalog.graft_st18.root", root)
        val q = s.readStream
          .option("startVersion", "1").option("maxVersionsPerTrigger", "1")
          .table("graft_st18.silver.changes")
          .writeStream.option("checkpointLocation", s"$root/_ckpt")
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
            val b = batch.cache()
            val v = b.select(max("_commit_version")).head().getLong(0)
            val affected = b.select("customer_id")
              .filter(col("customer_id").isNotNull).distinct()
            // r15 (guide §2.3/§2.4): the affected-customer semi-join is
            // pushed BELOW the aggregate — grouping is per customer_id,
            // so filtering whole customers first yields identical groups
            // while the per-batch recompute aggregates O(affected
            // customers' rows) instead of the whole pinned silver; and
            // the snapshot is checkpointed because Scd2.step consumes it
            // twice (new-key anti-join + change join) — uncached, the
            // version-pinned scan + aggregate ran twice per micro-batch
            val snapshot = PaymentJobs.customerAggregates(
                st.readVersion("silver", v)
                  .join(affected, Seq("customer_id"), "left_semi"))
              .localCheckpoint()
            st.overwrite("dim",
              graft.ops.Scd2.step(st.read("dim"), snapshot, cfg, today))
            b.unpersist(): Unit
          }
          .start()
        q.awaitTermination()
        val streamed = st.read("dim").cache()
        // one body, two drivers: the converged streamed dim equals the
        // single-shot batch step on every business column. The batch
        // side is checkpointed (r15, guide §3.3): Scd2.step consumes
        // its snapshot twice and the two exceptAll directions consume
        // batchRun twice — uncached, the proof re-ran the full-silver
        // customer aggregate ~4x
        val batchRun = graft.ops.Scd2.step(dim1,
          PaymentJobs.customerAggregates(silverAll).localCheckpoint(),
          cfg, today).localCheckpoint()
        val biz = streamed.columns.filterNot(_ == "customer_key").sorted.map(col).toSeq
        val (sb, bb) = (streamed.select(biz: _*), batchRun.select(biz: _*))
        require(sb.exceptAll(bb).isEmpty && bb.exceptAll(sb).isEmpty,
          "streamed SCD2 dim diverged from the batch run")
        streamed
          .withColumn("loaded_at", lit(PaymentData.Now).cast("timestamp_ntz"))
          .withColumn("source_system", lit("payment_gateway"))
          .select("customer_id", "customer_tier", "is_active",
            "first_transaction_date", "last_transaction_date", "lifetime_value",
            "loaded_at", "source_system",
            "effective_start_date", "effective_end_date", "is_current")
      },
      Some(s"""${QueriesJobs.Scd2CustomerOracleCtes}
              |SELECT customer_id, customer_tier, is_active,
              |  first_transaction_date, last_transaction_date, lifetime_value,
              |  TIMESTAMP '${graft.jobs.PaymentData.Now}' AS loaded_at,
              |  'payment_gateway' AS source_system,
              |  effective_start_date, effective_end_date, is_current FROM closed
              |UNION ALL
              |SELECT customer_id, customer_tier, is_active,
              |  first_transaction_date, last_transaction_date, lifetime_value,
              |  TIMESTAMP '${graft.jobs.PaymentData.Now}' AS loaded_at,
              |  'payment_gateway' AS source_system,
              |  effective_start_date, effective_end_date, is_current FROM ins""".stripMargin)),

    // ---- st19: STREAMING MATERIALIZED VIEW — mv1's incremental
    //      aggregate maintenance driven continuously from the change
    //      feed (one body, two drivers: the SAME ops.Ivm core as the
    //      batch query). Because the signed delta algebra is
    //      commutative, micro-batch BOUNDARIES don't matter: no
    //      per-version loop inside foreachBatch, any chunking of the
    //      backlog converges — demonstrated by forcing multiple
    //      batches (maxVersionsPerTrigger=2) over a history whose
    //      update moves rows between groups. startVersion=-1 replays
    //      from creation so the view bootstraps from empty through the
    //      same path it tails with; each batch costs O(its change
    //      rows → changed groups). Oracle = direct re-aggregation of
    //      the replayed final state (mv1's), so convergence is the
    //      hash check itself. ----
    "st19_stream_materialized_view" -> QDef(
      (s, dir) => {
        import org.apache.spark.sql.streaming.Trigger
        val root = "/tmp/graft_qstore/st19_mv"
        graft.core.FsUtil.clearAsync(new java.io.File(root))
        val st = new graft.core.TableStore(s, root)
        val li = QueriesMutation.ivmLineitem(s, dir)
        // the backlog the stream must absorb — the mv1/mv2 shared
        // history; the view bootstraps from EMPTY (startVersion=-1
        // replays the seed append through the same path it tails with)
        QueriesMutation.ivmCreateSource(st, li)
        st.createEmpty("agg_view", org.apache.spark.sql.types.StructType.fromDDL(
          "l_suppkey BIGINT, n_rows BIGINT, sum_qty BIGINT"))
        QueriesMutation.ivmMutateSource(st, li)
        s.conf.set("spark.sql.catalog.graft_st19", "graft.sources.GraftCatalog")
        s.conf.set("spark.sql.catalog.graft_st19.root", root)
        val q = s.readStream
          .option("startVersion", "-1").option("maxVersionsPerTrigger", "2")
          .table("graft_st19.src.changes")
          .writeStream.option("checkpointLocation", s"$root/_ckpt")
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
            // txn = (app, batchId): foreachBatch is at-least-once, and a
            // re-delivered batch must not re-add its delta — the stamp
            // rides the view's own commit (Delta txnAppId/txnVersion).
            // Empty batches no-op inside the apply.
            graft.ops.Ivm.applyCountSumDelta(st, "agg_view", batch,
              groupCols = Seq("l_suppkey"), valueCol = "qty",
              txn = Some(("st19_mv", batchId)))
          }
          .start()
        q.awaitTermination()
        graft.ops.Ivm.readView(st, "agg_view")
          .select(col("l_suppkey"), col("n_rows"), col("sum_qty"))
      },
      Some(QueriesMutation.ivmOracle(QueriesMutation.IvmCountSumAgg))),

    // ---- st20: THE GOLD STAR AS A CONTINUOUSLY-MAINTAINED VIEW — the
    //      streaming face of job_fact_star_incremental: the silver
    //      table's `.changes` stream drives Ivm.applyJoinDeltaFeed
    //      batch-by-batch through foreachBatch, txn = (app, batchId)
    //      for exactly-once under re-delivery. The CDC batch lands as
    //      TWO merge commits drained at one version per trigger, so
    //      the maintenance provably composes across micro-batches; the
    //      converged view is checked against job_fact_star's OWN
    //      oracle (digest-equal to the rebuild). This is the
    //      reference's nightly fact rebuild re-expressed as a standing
    //      stream over the change feed — at 100 TB the refresh cost is
    //      O(each CDC batch), never O(silver) or O(fact). ----
    "st20_stream_star_maintenance" -> QDef(
      (s, dir) => {
        import org.apache.spark.sql.streaming.Trigger
        val root = "/tmp/graft_qstore/st20_star"
        graft.core.FsUtil.clearAsync(new java.io.File(root))
        val st = new graft.core.TableStore(s, root)
        val staging = graft.jobs.PaymentJobs.bronzeStaging(
          graft.jobs.PaymentData.transactions(s, dir)).cache()
        val silverAll = QueriesJobs.stampedSilver(staging).cache()
        val (load1, load2) = QueriesJobs.starLoads(staging, silverAll)
        st.createBucketed("silver", load1, Seq("transaction_id"), n = 16)
        st.setChangeFeed("silver", true)
        val v0 = st.currentVersion("silver")
        val (enrich, releaseDims) = QueriesJobs.starEnrich(s, silverAll)
        st.createBucketed("fact",
          enrich(st.readVersion("silver", v0)).withColumn("_live", lit(true)),
          Seq("transaction_id"), n = 16)
        // the CDC batch arrives as two commits -> two micro-batches
        val idNum = expr("CAST(substring(transaction_id, 5, 20) AS BIGINT)")
        // gate off (r15): load2 is a filter of the latestVersionAgg-
        // deduped silver — unique on transaction_id by construction
        st.mergeUpsert("silver", load2.filter(idNum % 100 === 0),
          Seq("transaction_id"), changeTypeCol = None,
          verifyUniqueSource = false)
        st.mergeUpsert("silver", load2.filter(idNum % 100 =!= 0),
          Seq("transaction_id"), changeTypeCol = None,
          verifyUniqueSource = false)
        s.conf.set("spark.sql.catalog.graft_st20", "graft.sources.GraftCatalog")
        s.conf.set("spark.sql.catalog.graft_st20.root", root)
        val q = s.readStream
          .option("startVersion", v0.toString) // EXCLUSIVE: (v0, head]
          .option("maxVersionsPerTrigger", "1")
          .table("graft_st20.silver.changes")
          .writeStream.option("checkpointLocation", s"$root/_ckpt")
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
            graft.ops.Ivm.applyJoinDeltaFeed(st, "fact", batch,
              Seq("transaction_id"), enrich, txn = Some(("st20", batchId)))
          }
          .start()
        q.awaitTermination()
        releaseDims() // maintained view is in the store now
        staging.unpersist(); silverAll.unpersist()
        graft.ops.Ivm.readJoinView(st, "fact")
      },
      Some(QueriesJobs.FactStarOracleSql)),

    // ---- st21: TWO-LEVEL STREAMING IVM DAG WITH A CHECKPOINT RESTART
    //      — mv5's snowflake star + per-nation rollup, maintained as a
    //      standing stream: each micro-batch of the silver's `.changes`
    //      feed drives BOTH levels inside one foreachBatch (level 1 =
    //      delta-join apply on the fact view; level 2 = the rollup
    //      absorbing the fact's OWN change feed, its window derived
    //      from the registry stamp the previous cascade landed). The
    //      first stream CRASHES (injected, st19's pattern) right after
    //      a nonempty batch applied level 1 but BEFORE the checkpoint
    //      acknowledged it; the restarted stream re-delivers that batch
    //      under the same id — level 1 absorbs it via its txn stamp,
    //      level 2 via its watermark-derived empty window — proving the
    //      DAG's exactly-once composition under continuous ingestion.
    //      Digest-equal to mv5's oracle (one cascade, three drivers:
    //      library calls, SQL registry, standing stream). ----
    "st21_stream_matview_dag" -> QDef(
      (s, dir) => {
        import org.apache.spark.sql.streaming.Trigger
        val root = "/tmp/graft_qstore/st21_dag"
        graft.core.FsUtil.clearAsync(new java.io.File(root))
        val st = new graft.core.TableStore(s, root)
        val orders = Tables.orders(s, dir)
        val silverAll = orders.select(col("o_orderkey"), col("o_custkey"),
          (col("o_orderkey") % 1000 + 1).as("price_c"),
          col("o_orderstatus").as("status"))
        st.createEmpty("silver", org.apache.spark.sql.types.StructType.fromDDL(
          "o_orderkey BIGINT, o_custkey BIGINT, price_c BIGINT, status STRING"))
        st.setChangeFeed("silver", true)
        st.append("silver", silverAll.filter(col("o_orderkey") % 3 === 0))
        val sv0 = st.currentVersion("silver")
        st.create("dcust", Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_name"), col("c_nationkey")))
        st.setChangeFeed("dcust", true)
        st.create("dnat", Tables.nation(s, dir)
          .select(col("n_nationkey"), col("n_name")))
        st.setChangeFeed("dnat", true)
        def dims(src: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = src
          .join(broadcast(st.read("dcust")),
            col("o_custkey") === col("c_custkey"), "left")
          .join(broadcast(st.read("dnat")),
            col("c_nationkey") === col("n_nationkey"), "left")
          .select(col("o_orderkey"), col("o_custkey"), col("price_c"),
            col("status"), col("c_name"), col("n_name"))
        st.createBucketed("fact",
          dims(st.readVersion("silver", sv0)).withColumn("_live", lit(true)),
          Seq("o_orderkey"), 8)
        st.setChangeFeed("fact", true)
        val fv0 = st.currentVersion("fact")
        st.createBucketed("agg", st.readVersion("fact", fv0)
          .filter(col("_live"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n_rows"), sum(col("price_c")).as("sum_qty")),
          Seq("n_name"), 4)
        st.recordTxn("agg", "ivm:fact", fv0) // registry-style seed stamp

        // the silver backlog lands as THREE commits -> three micro-
        // batches at one version per trigger
        st.updateVectorized("silver", col("o_orderkey") % 5 === 0,
          Map("price_c" -> (col("price_c") + 7L)))
        st.deleteVectorized("silver", col("o_orderkey") % 7 === 0)
        st.append("silver", silverAll.filter(col("o_orderkey") % 3 === 1))

        // level 2 cascade: absorb the fact's feed window derived from
        // the rollup's own registry stamp — the same self-driving
        // bookkeeping the SQL registry uses
        def cascade(): Unit = {
          val from = st.lastTxnVersion("agg", "ivm:fact").get
          val to = st.currentVersion("fact")
          if (to > from)
            graft.ops.Ivm.applyCountSumDelta(st, "agg",
              st.readChangesBetween("fact", from, to).filter(col("_live")),
              Seq("n_name"), "price_c", txn = Some(("ivm:fact", to)))
        }
        s.conf.set("spark.sql.catalog.graft_st21", "graft.sources.GraftCatalog")
        s.conf.set("spark.sql.catalog.graft_st21.root", root)
        @volatile var bombed = false
        def run(armBomb: Boolean) = s.readStream
          .option("startVersion", sv0.toString) // EXCLUSIVE: (sv0, head]
          .option("maxVersionsPerTrigger", "1")
          .table("graft_st21.silver.changes")
          .writeStream.option("checkpointLocation", s"$root/_ckpt")
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
            graft.ops.Ivm.applyJoinDeltaFeed(st, "fact", batch,
              Seq("o_orderkey"), dims, txn = Some(("st21", batchId)))
            cascade()
            // crash AFTER both levels applied, BEFORE the checkpoint
            // ack: the restart re-delivers this batch under the same
            // id and both levels must absorb it (stamp / empty window).
            // The emptiness probe runs ONLY while the bomb is armed —
            // the restarted stream paid one batch scan per trigger for
            // a probe it could never use (r15, guide §1.2)
            if (armBomb && !bombed && !batch.isEmpty) {
              bombed = true
              throw new RuntimeException("injected crash after apply, before ack")
            }
          }
          .start()
        try run(armBomb = true).awaitTermination()
        catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => () }
        require(bombed, "st21: the injected crash never fired")
        val q2 = run(armBomb = false)
        q2.awaitTermination()

        // dim renames after the stream drains: the affected-FK apply +
        // one more cascade (the nation rename MOVES rollup groups)
        val cv0 = st.currentVersion("dcust")
        val nv0 = st.currentVersion("dnat")
        st.updateVectorized("dcust", col("c_custkey") % 4 === 0,
          Map("c_name" -> concat(col("c_name"), lit("!"))))
        st.updateVectorized("dnat", col("n_nationkey") % 2 === 0,
          Map("n_name" -> concat(col("n_name"), lit("!"))))
        val svHead = st.currentVersion("silver")
        val affected = st.readChangesBetween("dcust", cv0, st.currentVersion("dcust"))
          .select(col("c_custkey").as("o_custkey"))
          .unionByName(st.read("dcust")
            .join(broadcast(
              st.readChangesBetween("dnat", nv0, st.currentVersion("dnat"))
                .select(col("n_nationkey").as("c_nationkey")).distinct()),
              Seq("c_nationkey"), "left_semi")
            .select(col("c_custkey").as("o_custkey")))
        graft.ops.Ivm.applyJoinDelta(st, "fact", "silver", svHead, svHead,
          keys = Seq("o_orderkey"), enrich = dims,
          dimAffected = Some((affected, Seq("o_custkey"))),
          txn = Some(("st21_dim", 1L)))
        cascade()
        graft.ops.Ivm.compactDead(st, "agg", Seq("n_name"))
        graft.ops.Ivm.readView(st, "agg")
          .select(col("n_name"), col("n_rows"), col("sum_qty").as("sum_price_c"))
      },
      QueriesMutation.Mv5OracleSql),

    // ---- st22: STREAMING TOP-K — mv7's set-valued IVM kind as a
    //      standing stream (r13 VERDICT #6): each micro-batch of the
    //      source's `.changes` feed drives applyTopKDelta through
    //      foreachBatch, txn = (app, batchId) for exactly-once. The
    //      hard arm's version-pinned recompute pins at THIS BATCH's end
    //      version (max _commit_version), so a retraction of a stored
    //      pair recomputes against exactly the state the batch's window
    //      ends at — later not-yet-delivered commits can't leak in.
    //      The first stream CRASHES (st21's injection) after a
    //      nonempty batch applied but before the checkpoint ack; the
    //      restart re-delivers that batch under the same id and the
    //      txn stamp absorbs it. Digest-equal to mv7's oracle (one
    //      top-k algebra, two drivers: batch registry refresh and
    //      standing stream). ----
    "st22_stream_topk" -> QDef(
      (s, dir) => {
        import org.apache.spark.sql.streaming.Trigger
        val root = "/tmp/graft_qstore/st22_topk"
        graft.core.FsUtil.clearAsync(new java.io.File(root))
        val st = new graft.core.TableStore(s, root)
        val orders = Tables.orders(s, dir)
        val src = orders.select((col("o_custkey") % 50).as("grp"),
          (col("o_orderkey") % 100000).as("val"),
          col("o_orderkey").as("okey"))
        st.create("src", src.filter(col("okey") % 2 === 0))
        st.setChangeFeed("src", true)
        graft.ops.Ivm.createTopKView(st, "v", "src", Seq("grp"),
          "val", "okey", k = 3)
        val sv0 = st.currentVersion("src")
        // the backlog lands as THREE commits -> three micro-batches:
        // deletes retract stored top pairs (hard arm), the +50000
        // shift re-ranks through pre/postimage retraction, the append
        // inserts (easy arm)
        st.delete("src", col("okey") % 10 === 0)
        st.update("src", col("okey") % 7 === 0,
          Map("val" -> (col("val") + 50000L)))
        st.append("src", src.filter(col("okey") % 2 === 1))
        s.conf.set("spark.sql.catalog.graft_st22", "graft.sources.GraftCatalog")
        s.conf.set("spark.sql.catalog.graft_st22.root", root)
        @volatile var bombed = false
        def run(armBomb: Boolean) = s.readStream
          .option("startVersion", sv0.toString) // EXCLUSIVE: (sv0, head]
          .option("maxVersionsPerTrigger", "1")
          .table("graft_st22.src.changes")
          .writeStream.option("checkpointLocation", s"$root/_ckpt")
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
            // ONE pass serves both the emptiness probe and the hard
            // arm's end-version pin (r15, guide §1.2 — the former
            // isEmpty + max() pair was two jobs over the same batch)
            val r = batch.agg(count(lit(1)), max(col("_commit_version"))).head()
            val hasRows = r.getLong(0) > 0L
            val vEnd = if (hasRows) r.getLong(1) else st.currentVersion("src")
            graft.ops.Ivm.applyTopKDelta(st, "v", "src", vEnd, batch,
              Seq("grp"), "val", "okey", k = 3,
              txn = Some(("st22", batchId)))
            if (armBomb && !bombed && hasRows) {
              bombed = true
              throw new RuntimeException("injected crash after apply, before ack")
            }
          }
          .start()
        try run(armBomb = true).awaitTermination()
        catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => () }
        require(bombed, "st22: the injected crash never fired")
        run(armBomb = false).awaitTermination()
        graft.ops.Ivm.compactView(st, "v") // sweep padded tail ranks
        graft.ops.Ivm.readTopKView(st, "v", "val")
          .select(col("grp"), col("rnk"), col("val"), col("okey"))
      },
      QueriesMutation.Mv7OracleSql),

    // ---- st23: STREAMING SKETCH MAINTENANCE — mv9's HLL register
    //      state driven as a standing stream: per micro-batch,
    //      insert-only windows union registers (pure algebra) and
    //      windows carrying retractions recompute exactly their
    //      groups, pinned at THAT batch's end version. txn =
    //      (app, batchId) — the skip guard is the exactly-once
    //      contract here and NOT optional: re-unioning a re-delivered
    //      batch happens to be idempotent (HLL max-semantics) but a
    //      re-run recompute against a LATER source version would leak
    //      future commits into this batch's window. Crash injection +
    //      restart as st21/st22. Output and oracle are mv9's (one
    //      register algebra, two drivers): exact distinct per group,
    //      DuckDB-checked, plus the estimate's rsd gate. ----
    "st23_stream_sketch" -> QDef(
      (s, dir) => {
        import org.apache.spark.sql.streaming.Trigger
        val root = "/tmp/graft_qstore/st23_sketch"
        graft.core.FsUtil.clearAsync(new java.io.File(root))
        val st = new graft.core.TableStore(s, root)
        val li = QueriesMutation.ivmLineitem(s, dir)
        QueriesMutation.ivmCreateSource(st, li)
        graft.ops.Ivm.createCountSumView(st, "sk_view", "src",
          Seq("l_suppkey"), "l_orderkey", kind = "sketch_distinct")
        val sv0 = st.currentVersion("src")
        QueriesMutation.ivmMutateSource(st, li) // 3 commits -> 3 batches
        s.conf.set("spark.sql.catalog.graft_st23", "graft.sources.GraftCatalog")
        s.conf.set("spark.sql.catalog.graft_st23.root", root)
        @volatile var bombed = false
        def run(armBomb: Boolean) = s.readStream
          .option("startVersion", sv0.toString) // EXCLUSIVE: (sv0, head]
          .option("maxVersionsPerTrigger", "1")
          .table("graft_st23.src.changes")
          .writeStream.option("checkpointLocation", s"$root/_ckpt")
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
            // one pass for emptiness + end-version pin (see st22)
            val r = batch.agg(count(lit(1)), max(col("_commit_version"))).head()
            val hasRows = r.getLong(0) > 0L
            val vEnd = if (hasRows) r.getLong(1) else st.currentVersion("src")
            graft.ops.Ivm.applySketchDistinctDelta(st, "sk_view", "src",
              vEnd, batch, Seq("l_suppkey"), "l_orderkey",
              graft.ops.Ivm.DefaultLgK, txn = Some(("st23", batchId)))
            if (armBomb && !bombed && hasRows) {
              bombed = true
              throw new RuntimeException("injected crash after apply, before ack")
            }
          }
          .start()
        try run(armBomb = true).awaitTermination()
        catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => () }
        require(bombed, "st23: the injected crash never fired")
        run(armBomb = false).awaitTermination()
        graft.ops.Ivm.compactView(st, "sk_view")
        val est = graft.ops.Ivm.readSketchView(st, "sk_view")
          .select(col("l_suppkey"), col("n_est"))
        val exact = st.read("src").groupBy(col("l_suppkey"))
          .agg(countDistinct(col("l_orderkey")).as("n_exact"))
        exact.join(est, Seq("l_suppkey"), "left")
          .select(col("l_suppkey"), col("n_exact"),
            (col("n_est").isNotNull &&
              abs(col("n_est") - col("n_exact")) <=
                greatest(col("n_exact") * lit(0.05), lit(3.0)))
              .as("within_rsd"))
      },
      Some(QueriesMutation.ivmOracle(
        """CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_exact,
          |  TRUE AS within_rsd""".stripMargin))),

    // ---- st24: mv11's quantile maintenance as a STANDING STREAM with
    //      an injected checkpoint-restart crash — digest-equal to mv11
    //      BY DESIGN (one histogram algebra, three drivers). Note what
    //      the foreachBatch does NOT need: no end-version pin, no
    //      source read — bin counts are a full abelian group, so the
    //      batch alone IS the whole apply under any insert/delete mix;
    //      the txn stamp absorbs the crash-replayed batch. ----
    "st24_stream_quantile" -> QDef(
      (s, dir) => {
        import org.apache.spark.sql.streaming.Trigger
        val root = "/tmp/graft_qstore/st24_quant"
        graft.core.FsUtil.clearAsync(new java.io.File(root))
        val st = new graft.core.TableStore(s, root)
        val li = QueriesMutation.ivmLineitem(s, dir)
        QueriesMutation.ivmCreateSource(st, li)
        graft.ops.Ivm.createCountSumView(st, "q_view", "src",
          Seq("l_suppkey"), "qty", kind = "quantile")
        val sv0 = st.currentVersion("src")
        QueriesMutation.ivmMutateSource(st, li) // 3 commits -> 3 batches
        s.conf.set("spark.sql.catalog.graft_st24", "graft.sources.GraftCatalog")
        s.conf.set("spark.sql.catalog.graft_st24.root", root)
        @volatile var bombed = false
        def run(armBomb: Boolean) = s.readStream
          .option("startVersion", sv0.toString) // EXCLUSIVE: (sv0, head]
          .option("maxVersionsPerTrigger", "1")
          .table("graft_st24.src.changes")
          .writeStream.option("checkpointLocation", s"$root/_ckpt")
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
            graft.ops.Ivm.applyQuantileDelta(st, "q_view", batch,
              Seq("l_suppkey"), "qty", graft.ops.Ivm.QuantileAlpha,
              txn = Some(("st24", batchId)))
            if (armBomb && !bombed && !batch.isEmpty) {
              bombed = true
              throw new RuntimeException("injected crash after apply, before ack")
            }
          }
          .start()
        try run(armBomb = true).awaitTermination()
        catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => () }
        require(bombed, "st24: the injected crash never fired")
        run(armBomb = false).awaitTermination()
        graft.ops.Ivm.compactView(st, "q_view")
        val est = graft.ops.Ivm.readQuantileView(st, "q_view", Seq(0.5, 0.95))
        val exact = st.read("src").groupBy(col("l_suppkey"))
          .agg(expr("percentile(qty, 0.5)").as("p50_exact"),
            expr("percentile(qty, 0.95)").as("p95_exact"))
        exact.join(est, Seq("l_suppkey"), "left")
          .select(col("l_suppkey"), col("n_rows"),
            round(col("p50_exact"), 4).as("p50_exact"),
            round(col("p95_exact"), 4).as("p95_exact"),
            (col("q50").isNotNull && col("q95").isNotNull &&
              abs(col("q50") - col("p50_exact")) <=
                greatest(col("p50_exact") * lit(0.10), lit(2.0)) &&
              abs(col("q95") - col("p95_exact")) <=
                greatest(col("p95_exact") * lit(0.10), lit(2.0)))
              .as("within_err"))
      },
      Some(QueriesMutation.ivmOracle(
        """CAST(count(*) AS BIGINT) AS n_rows,
          |  round(quantile_cont(qty, 0.5), 4) AS p50_exact,
          |  round(quantile_cont(qty, 0.95), 4) AS p95_exact,
          |  TRUE AS within_err""".stripMargin))),

    "st17_stream_static_join" -> QDef(
      (s, dir) => {
        import org.apache.spark.sql.streaming.Trigger
        val schema = Tables.events(s, dir).schema
        val stream = s.readStream.schema(schema)
          .option("pathGlobFilter", "events.parquet").parquet(dir)
        val dim = broadcast(Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey")))
        val q = stream
          .join(dim, col("user_id") === col("c_custkey"))
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("c_mktsegment"), col("c_nationkey"))
          .writeStream.format("memory").queryName("st17_mem")
          .outputMode("append")
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        s.table("st17_mem")
      },
      Some("""SELECT event_id, user_id, event_type, c_mktsegment, c_nationkey
             |FROM events JOIN customer ON user_id = c_custkey""".stripMargin)),

    // ---- st8: stream-stream interval join — views joined to clicks
    //      within 10 minutes after them, per user; both sides carry
    //      event-time watermarks so the join state is bounded (the
    //      stateful-join flagship of Structured Streaming). One
    //      AvailableNow batch makes the joined set complete, which the
    //      batch oracle replays ----
    "st8_stream_stream_join" -> QDef(
      (s, dir) => {
        import org.apache.spark.sql.streaming.Trigger
        val schema = Tables.events(s, dir).schema
        def stream = StreamingJobs.withEventTime(
          s.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet").parquet(dir))
        val views = stream.filter(col("event_type") === "view")
          .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
            col("ev_ts").as("v_ts"))
          .withWatermark("v_ts", "1 day")
        val clicks = stream.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
            col("ev_ts").as("c_ts"))
          .withWatermark("c_ts", "1 day")
        val q = views.join(clicks, expr(
            """v_user = c_user AND
              |c_ts >= v_ts AND c_ts < v_ts + interval 10 minutes""".stripMargin))
          .select(col("view_id"), col("click_id"), col("v_user").as("user_id"))
          .writeStream.format("memory").queryName("st8_mem")
          .outputMode("append")
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        s.table("st8_mem")
      },
      Some("""SELECT v.event_id AS view_id, c.event_id AS click_id, v.user_id
             |FROM events v JOIN events c
             |  ON v.user_id = c.user_id AND v.event_type = 'view' AND c.event_type = 'click'
             | AND epoch_us(CAST(c.ts AS TIMESTAMP)) >= epoch_us(CAST(v.ts AS TIMESTAMP))
             | AND epoch_us(CAST(c.ts AS TIMESTAMP)) < epoch_us(CAST(v.ts AS TIMESTAMP)) + 600000000""".stripMargin)),

    // ---- st5: streaming feed over the versioned store ----
    // (the store's Delta-style table feed: three committed versions are
    //  consumed through readStream.table -> micro-batches keyed by
    //  manifest version -> memory sink; result must equal the batch
    //  union of all three appends)
    "st5_table_feed" -> QDef(
      (s, dir) => {
        import org.apache.spark.sql.streaming.Trigger
        val root = "/tmp/graft_qstore/st5_feed"
        graft.core.FsUtil.clearAsync(new java.io.File(root))
        val st = new graft.core.TableStore(s, root)
        val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey", "o_totalprice")
        st.create("feed", o.filter(col("o_orderkey") % 3 === 0))
        st.append("feed", o.filter(col("o_orderkey") % 3 === 1))
        st.append("feed", o.filter(col("o_orderkey") % 3 === 2))
        s.conf.set("spark.sql.catalog.graft_st5", "graft.sources.GraftCatalog")
        s.conf.set("spark.sql.catalog.graft_st5.root", root)
        val q = s.readStream.table("graft_st5.feed")
          .writeStream.format("memory").queryName("st5_mem")
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        s.table("st5_mem")
      },
      Some("SELECT o_orderkey, o_custkey, o_totalprice FROM orders")),

    // ---- st6: store -> stream -> STORE, end to end: the versioned
    //      table is both source (micro-batch per committed version) and
    //      sink (exactly-once epoch commits), with a transform between —
    //      the full incremental-materialization loop on engine tables ----
    "st6_stream_to_table" -> QDef(
      (s, dir) => {
        import org.apache.spark.sql.streaming.Trigger
        val root = "/tmp/graft_qstore/st6_pipe"
        graft.core.FsUtil.clearAsync(new java.io.File(root))
        val st = new graft.core.TableStore(s, root)
        val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey", "o_totalprice")
        st.create("src", o.filter(col("o_orderkey") % 2 === 0))
        st.append("src", o.filter(col("o_orderkey") % 2 =!= 0))
        s.conf.set("spark.sql.catalog.graft_st6", "graft.sources.GraftCatalog")
        s.conf.set("spark.sql.catalog.graft_st6.root", root)
        val sinkSchema = org.apache.spark.sql.types.StructType.fromDDL(
          "o_orderkey BIGINT, big_price DOUBLE")
        st.createEmpty("snk", sinkSchema)
        val ckpt = s"$root/_ckpt"
        val q = s.readStream.table("graft_st6.src")
          .filter(col("o_totalprice") > 150000.0)
          .select(col("o_orderkey"), (col("o_totalprice") * 2).as("big_price"))
          .writeStream.option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .toTable("graft_st6.snk")
        q.awaitTermination()
        st.read("snk")
      },
      Some("""SELECT o_orderkey, o_totalprice * 2 AS big_price
             |FROM orders WHERE o_totalprice > 150000.0""".stripMargin)),

    // ---- st16: COMPLETE output mode into a BUCKETED sink — the sink
    //      OWNS the table (Spark negotiates replace-per-epoch through
    //      SupportsTruncate.truncate). Two committed source versions
    //      drained one per trigger force TWO replace epochs: the final
    //      table must equal the batch aggregate over ALL rows — an
    //      appending sink would keep the first epoch's stale partial
    //      counts alongside the second's. The bucketed sink also pins
    //      the layout surviving streamed epochs (per-bucket routing +
    //      manifest leaf attach). Aggregates are count/max: exact in
    //      both engines, no float-reassociation hash risk. ----
    "st16_stream_complete_mode" -> QDef(
      (s, dir) => {
        import org.apache.spark.sql.streaming.Trigger
        val root = "/tmp/graft_qstore/st16_complete"
        graft.core.FsUtil.clearAsync(new java.io.File(root))
        val st = new graft.core.TableStore(s, root)
        val o = Tables.orders(s, dir)
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
        st.create("src", o.filter(col("o_orderkey") % 2 === 0))   // v0
        st.append("src", o.filter(col("o_orderkey") % 2 =!= 0))   // v1
        s.conf.set("spark.sql.catalog.graft_st16", "graft.sources.GraftCatalog")
        s.conf.set("spark.sql.catalog.graft_st16.root", root)
        st.createEmpty("snk", org.apache.spark.sql.types.StructType.fromDDL(
          "o_orderstatus STRING, n BIGINT, max_price DOUBLE"),
          bucketing = Some((Seq("o_orderstatus"), 4)))
        val q = s.readStream.option("maxVersionsPerTrigger", "1")
          .table("graft_st16.src")
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"), max("o_totalprice").as("max_price"))
          .writeStream.option("checkpointLocation", s"$root/_ckpt")
          .outputMode("complete")
          .trigger(Trigger.AvailableNow())
          .toTable("graft_st16.snk")
        q.awaitTermination()
        // replace semantics AND layout both held: all live dirs are
        // bucket leaves (loud here rather than a silent demotion)
        require(st.liveDirs("snk").forall(_.contains("/__b=")),
          "streamed complete-mode epochs must keep the bucket layout")
        st.read("snk")
      },
      Some("""SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
             |max(o_totalprice) AS max_price
             |FROM orders GROUP BY o_orderstatus""".stripMargin)),

    // ---- st9: STREAMING change data feed — the same mutation sequence
    //      cdc1 verifies in batch (merge with update pre/postimages +
    //      inserts, then a pruned delete), consumed as a stream of
    //      per-commit change rows via Trigger.AvailableNow. Downstream
    //      sees UPDATES and DELETES, not just appends — the incremental
    //      dimension-sync pattern on engine tables. Same oracle as cdc1. ----
    "st9_changes_stream" -> QDef(
      (s, dir) => {
        import org.apache.spark.sql.streaming.Trigger
        val root = "/tmp/graft_qstore/st9_cdf"
        graft.core.FsUtil.clearAsync(new java.io.File(root))
        val st = new graft.core.TableStore(s, root)
        val orders = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        st.create("t", orders.filter(col("o_orderkey") % 4 === 1))    // v0
        st.setChangeFeed("t", true)                                   // v1
        val src = orders.filter(col("o_orderkey") % 4 <= 1)
          .withColumn("o_totalprice", col("o_totalprice") * 2)
        st.mergeUpsert("t", src, Seq("o_orderkey"), changeTypeCol = None) // v2
        st.delete("t", col("o_custkey") % 10 === 3)                   // v3
        s.conf.set("spark.sql.catalog.graft_st9", "graft.sources.GraftCatalog")
        s.conf.set("spark.sql.catalog.graft_st9.root", root)
        val q = s.readStream.option("startVersion", "1")
          .table("graft_st9.t.changes")
          .writeStream.format("memory").queryName("st9_mem")
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        s.table("st9_mem")
      },
      Some("""WITH t0 AS (SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             |            WHERE o_orderkey % 4 = 1),
             |s AS (SELECT o_orderkey, o_custkey, o_totalprice * 2 AS o_totalprice
             |      FROM orders WHERE o_orderkey % 4 <= 1)
             |SELECT t0.o_orderkey, t0.o_custkey, t0.o_totalprice,
             |  'update_preimage' AS _change_type, CAST(2 AS BIGINT) AS _commit_version
             |FROM t0 JOIN s ON t0.o_orderkey = s.o_orderkey
             |UNION ALL
             |SELECT s.o_orderkey, s.o_custkey, s.o_totalprice,
             |  'update_postimage', CAST(2 AS BIGINT)
             |FROM s JOIN t0 ON t0.o_orderkey = s.o_orderkey
             |UNION ALL
             |SELECT s.o_orderkey, s.o_custkey, s.o_totalprice, 'insert', CAST(2 AS BIGINT)
             |FROM s WHERE NOT EXISTS (SELECT 1 FROM t0 WHERE t0.o_orderkey = s.o_orderkey)
             |UNION ALL
             |SELECT s.o_orderkey, s.o_custkey, s.o_totalprice, 'delete', CAST(3 AS BIGINT)
             |FROM s WHERE s.o_custkey % 10 = 3""".stripMargin)),

    // ---- st10: CDC REPLICATION between store tables — the streaming
    //      change feed drives an incremental replica: foreachBatch
    //      applies each commit's change rows IN VERSION ORDER
    //      (insert/update_postimage -> mergeUpsert, delete ->
    //      mergeDelete), so the replica converges to the source's
    //      final state without ever full-refreshing. startVersion=-1
    //      replays from creation; Trigger.AvailableNow drains the
    //      backlog and stops — the bootstrap-then-tail pattern a
    //      downstream copy of a 100 TB table needs (each increment
    //      costs O(changes), and the replica's merges prune by key). ----
    "st10_cdc_replicate" -> QDef(
      (s, dir) => {
        import org.apache.spark.sql.streaming.Trigger
        val root = "/tmp/graft_qstore/st10_cdc"
        graft.core.FsUtil.clearAsync(new java.io.File(root))
        val st = new graft.core.TableStore(s, root)
        val orders = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        st.create("src", orders.filter(col("o_orderkey") % 4 === 1))    // v0
        st.setChangeFeed("src", true)                                   // v1
        st.mergeUpsert("src",
          orders.filter(col("o_orderkey") % 4 <= 1)
            .withColumn("o_totalprice", col("o_totalprice") * 2),
          Seq("o_orderkey"), changeTypeCol = None)                      // v2
        st.delete("src", col("o_custkey") % 10 === 3)                   // v3
        st.createEmpty("replica", st.schemaOf("src"))
        s.conf.set("spark.sql.catalog.graft_st10", "graft.sources.GraftCatalog")
        s.conf.set("spark.sql.catalog.graft_st10.root", root)
        val q = s.readStream.option("startVersion", "-1")
          .table("graft_st10.src.changes")
          .writeStream
          .option("checkpointLocation", s"$root/_ckpt")
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
            val b = batch.cache()
            val versions = b.select("_commit_version").distinct()
              .collect().map(_.getLong(0)).sorted
            versions.foreach { v =>
              val ch = b.filter(col("_commit_version") === v)
              val upserts = ch
                .filter(col("_change_type").isin("insert", "update_postimage"))
                .drop("_change_type", "_commit_version")
              if (!upserts.isEmpty)
                st.mergeUpsert("replica", upserts, Seq("o_orderkey"),
                  changeTypeCol = None)
              val deletes = ch.filter(col("_change_type") === "delete")
                .select("o_orderkey")
              if (!deletes.isEmpty)
                st.mergeDelete("replica", deletes, Seq("o_orderkey"))
            }
            b.unpersist(): Unit
          }
          .start()
        q.awaitTermination()
        st.read("replica")
      },
      Some("""WITH s AS (SELECT o_orderkey, o_custkey, o_totalprice * 2 AS o_totalprice
             |           FROM orders WHERE o_orderkey % 4 <= 1)
             |SELECT o_orderkey, o_custkey, o_totalprice FROM s
             |WHERE o_custkey % 10 <> 3""".stripMargin)),

    // ---- st11: STREAMING ROW IDS — `graft.<t>.rowids` streams the
    //      table with its stable `_row_id` as a real column (DSv2
    //      streaming scans can't see metadata-column requests). Two
    //      loads land before the stream drains; each micro-batch file
    //      resolves its base from that batch's end-snapshot, so
    //      "which load produced this row" is a range test on the id —
    //      the oracle re-derives the per-origin aggregate relationally,
    //      which only matches if the streamed ids are the real ones. ----
    "st11_rowids_stream" -> QDef(
      (s, dir) => {
        import org.apache.spark.sql.streaming.Trigger
        val root = "/tmp/graft_qstore/st11_rowids"
        graft.core.FsUtil.clearAsync(new java.io.File(root))
        val st = new graft.core.TableStore(s, root)
        val o = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_totalprice"))
        st.createEmpty("t", org.apache.spark.sql.types.StructType.fromDDL(
          "o_orderkey BIGINT, o_totalprice DOUBLE"))
        st.enableRowTracking("t")
        val initial = o.filter(col("o_orderkey") % 2 === 0)
        st.append("t", initial)
        val n0 = initial.count()
        st.append("t", o.filter(col("o_orderkey") % 2 === 1))
        s.conf.set("spark.sql.catalog.graft_st11", "graft.sources.GraftCatalog")
        s.conf.set("spark.sql.catalog.graft_st11.root", root)
        val q = s.readStream
          .option("maxVersionsPerTrigger", "1") // one load per micro-batch
          .table("graft_st11.t.rowids")
          .writeStream.format("memory").queryName("st11_mem")
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        s.table("st11_mem")
          .withColumn("origin",
            when(col("_row_id") < n0, "even_load").otherwise("odd_load"))
          .groupBy("origin")
          .agg(count(lit(1)).as("n"),
            sum(col("o_orderkey")).as("key_sum"))
      },
      Some("""SELECT 'even_load' AS origin, COUNT(*) AS n,
             |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
             |FROM orders WHERE o_orderkey % 2 = 0
             |UNION ALL
             |SELECT 'odd_load', COUNT(*), CAST(SUM(o_orderkey) AS BIGINT)
             |FROM orders WHERE o_orderkey % 2 = 1""".stripMargin)),

    // ---- st12: STREAMING decontamination — d6b's broadcast-Bloom
    //      bitset applied to a document stream. The bitset is built
    //      once, batch-side, from the (fixed) benchmark; the corpus
    //      arrives as a file stream and each micro-batch probes the
    //      broadcast bitset with the same codegen'd shift/mask
    //      expressions — a STATELESS stream-batch join, so it runs in
    //      append mode with zero watermark state; the only stateful op
    //      is the doc-id dropDuplicates. This is the continuous-
    //      ingestion shape: decontaminate batches as they land instead
    //      of re-scanning the corpus. The registered result is the same
    //      driver-visible gate as d6b: every exactly-contaminated doc
    //      MUST be flagged (bloom has no false negatives), FP overhang
    //      bounded. ----
    "st12_stream_decontaminate" -> QDef(
      (s, dir) => {
        import org.apache.spark.sql.streaming.Trigger
        val mBits = 1L << 21
        val k = 5
        def explodeShingles(d: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = d
          .select(col("doc_id"), split(col("text"), " ").as("w"))
          .select(col("doc_id"), explode(expr(
            "transform(IF(size(w) >= 8, sequence(1, size(w) - 7), array()), i -> array_join(slice(w, i, 8), ' '))"))
            .as("shingle"))
        val docs = Tables.documents(s, dir)
        val bits = graft.ops.Corpus.bloomBuild(
          explodeShingles(docs.filter(col("doc_id") % 20 < 2)),
          col("shingle"), mBits, k)
        val stream = s.readStream.schema(docs.schema)
          .option("pathGlobFilter", "documents.parquet").parquet(dir)
          .filter(col("doc_id") % 20 >= 2)
        val q = graft.ops.Corpus.bloomMaybeContains(
            explodeShingles(stream), col("shingle"), bits, mBits, k)
          .select(col("doc_id")).dropDuplicates("doc_id")
          .writeStream.format("memory").queryName("st12_mem")
          .outputMode("append")
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        val flagged = s.table("st12_mem")
        // the d6b gate, batch-side: exact-contaminated ⊆ stream-flagged
        val sh = explodeShingles(docs).distinct()
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

    // ---- st15: CONTINUOUS near-dup admission — x7's incremental
    //      dedup run as a stream. Arriving document batches are commits
    //      on a store table; readStream with maxVersionsPerTrigger=1
    //      turns each commit into ONE micro-batch (deterministic batch
    //      boundaries = version order — what makes an exact oracle
    //      possible at all), and foreachBatch runs the x7 admission:
    //      band-probe the persisted index, exact-verify candidates,
    //      append admitted docs' bands so the NEXT batch dedups against
    //      them. Batch 1's admissions are live index entries by batch 2
    //      — the oracle replays both stages sequentially and every
    //      admitted id must match. Scale shape is x7's: per batch the
    //      index probe reads ~|batch| x nBands rows through the bucket
    //      layout and verify work is O(candidates), never O(corpus). ----
    "st15_stream_dedup_admission" -> QDef(
      (s, dir) => {
        import org.apache.spark.sql.streaming.Trigger
        val root = "/tmp/graft_qstore/st15_admit"
        graft.core.FsUtil.clearAsync(new java.io.File(root))
        val st = new graft.core.TableStore(s, root)
        val sh = QueriesLlm.hashedShinglesFor(s, dir).cache()
        // r15 (guide §1.2/§3.3): the exact-verify side's per-doc shingle
        // sets are aggregated ONCE over the whole corpus and cached —
        // each micro-batch previously re-ran the collect_set shuffle for
        // its batch docs AND its candidate corpus docs; the per-batch
        // verify is now two broadcast joins against this one table
        val allSets = graft.ops.Dedup.shingleSets(sh, "doc_id", "h").cache()
        // base corpus (% 3 == 2) seeds the index; % 3 == 1 then % 3 == 0
        // arrive as two committed batches
        st.createBucketed("band_index",
          graft.ops.Dedup.minhashBands(
            sh.filter(col("doc_id") % 3 === 2), "doc_id", "h"),
          Seq("bkey"), 16)
        val docs = Tables.documents(s, dir).select("doc_id", "text")
        st.create("incoming", docs.filter(col("doc_id") % 3 === 1))  // v0
        st.append("incoming", docs.filter(col("doc_id") % 3 === 0))  // v1
        st.createEmpty("admitted", org.apache.spark.sql.types.StructType.fromDDL(
          "doc_id BIGINT, batch BIGINT"))
        s.conf.set("spark.sql.catalog.graft_st15", "graft.sources.GraftCatalog")
        s.conf.set("spark.sql.catalog.graft_st15.root", root)
        val q = s.readStream.option("maxVersionsPerTrigger", "1")
          .table("graft_st15.incoming")
          .writeStream
          .option("checkpointLocation", s"$root/_ckpt")
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
            val batchSh = sh.join(b.select("doc_id").distinct(),
              Seq("doc_id"), "left_semi").cache()
            val batchBands =
              graft.ops.Dedup.minhashBands(batchSh, "doc_id", "h").cache()
            val idxBands = st.read("band_index")
            // candidate ids come from the band join against the index,
            // so the precomputed set table needs no per-batch semi-join
            // — identical pairs, identical verify (see
            // nearDupsAgainstIndexSets)
            val rejected = graft.ops.Dedup.nearDupsAgainstIndexSets(
              batchBands, idxBands, allSets, "doc_id", threshold = 0.5)
            val admitted = batchSh.select(col("doc_id")).distinct()
              .join(rejected.select(col("batch_id").as("doc_id")),
                Seq("doc_id"), "left_anti")
            st.append("band_index",
              batchBands.join(admitted, Seq("doc_id"), "left_semi"))
            st.append("admitted", admitted.withColumn("batch", lit(id)))
            batchSh.unpersist(); batchBands.unpersist(): Unit
          }
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        sh.unpersist(); allSets.unpersist()
        st.read("admitted")
      },
      Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |idx AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i FROM w),
             |sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle FROM idx),
             |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
             |i1 AS (SELECT a.doc_id AS ca, b.doc_id AS bb, count(*) AS i
             |       FROM sh a JOIN sh b ON a.shingle = b.shingle
             |       WHERE a.doc_id % 3 = 2 AND b.doc_id % 3 = 1
             |       GROUP BY 1, 2),
             |dup1 AS (SELECT DISTINCT bb FROM i1
             |         JOIN sizes sa ON ca = sa.doc_id JOIN sizes sb ON bb = sb.doc_id
             |         WHERE i / (sa.n + sb.n - i) >= 0.5),
             |adm1 AS (SELECT DISTINCT doc_id FROM sh
             |         WHERE doc_id % 3 = 1 AND doc_id NOT IN (SELECT bb FROM dup1)),
             |idx2 AS (SELECT doc_id FROM sh WHERE doc_id % 3 = 2
             |         UNION SELECT doc_id FROM adm1),
             |i2 AS (SELECT a.doc_id AS ca, b.doc_id AS bb, count(*) AS i
             |       FROM sh a JOIN sh b ON a.shingle = b.shingle
             |       WHERE a.doc_id IN (SELECT doc_id FROM idx2) AND b.doc_id % 3 = 0
             |       GROUP BY 1, 2),
             |dup2 AS (SELECT DISTINCT bb FROM i2
             |         JOIN sizes sa ON ca = sa.doc_id JOIN sizes sb ON bb = sb.doc_id
             |         WHERE i / (sa.n + sb.n - i) >= 0.5),
             |adm2 AS (SELECT DISTINCT doc_id FROM sh
             |         WHERE doc_id % 3 = 0 AND doc_id NOT IN (SELECT bb FROM dup2))
             |SELECT doc_id, CAST(0 AS BIGINT) AS batch FROM adm1
             |UNION ALL
             |SELECT doc_id, CAST(1 AS BIGINT) AS batch FROM adm2""".stripMargin)),

    // ---- st14: custom streaming state — mapGroupsWithState running
    //      per-user event counts. The state store carries one Long per
    //      user across micro-batches; update mode emits the refreshed
    //      count whenever a user appears in a batch, and the CONVERGED
    //      state (max emission per user — counts are monotone) must
    //      equal the batch groupBy count exactly. Multi-batch state
    //      carry-over is pinned separately in StreamingSpec with a
    //      MemoryStream; this makes the capability driver-visible.
    //      Scale: state is O(|users|) longs, partitioned by key — the
    //      standard shape for billions of keys. ----
    "st14_stream_stateful_counts" -> QDef(
      (s, dir) => {
        import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, Trigger}
        import s.implicits._
        val ev = Tables.events(s, dir)
        val stream = s.readStream.schema(ev.schema)
          .option("pathGlobFilter", "events.parquet").parquet(dir)
        val counted = stream.select(col("user_id").as[Long])
          .groupByKey(identity)
          .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
            (uid: Long, it: Iterator[Long], st: GroupState[Long]) =>
              val n = st.getOption.getOrElse(0L) + it.size
              st.update(n)
              (uid, n)
          }
          .toDF("user_id", "n_events")
        val q = counted.writeStream.format("memory").queryName("st14_mem")
          .outputMode("update").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        s.table("st14_mem").groupBy("user_id")
          .agg(max(col("n_events")).as("n_events"))
      },
      Some("""SELECT user_id, count(*) AS n_events
             |FROM events GROUP BY user_id""".stripMargin)),

    // ---- st13: streaming quality gate — t10's Gopher rules applied at
    //      INGEST, per micro-batch. Everything is a per-row pure
    //      function, so the stream needs NO state store and append mode
    //      emits final verdicts immediately; top-word dominance, which
    //      the batch t10 computes via explode + two aggregates (the
    //      right shape for long documents), is re-expressed here as a
    //      per-row array fold (array_max over per-distinct-word counts —
    //      O(|vocab|·|doc|) local work, the right shape for a stateless
    //      stream of bounded-length docs). Stream == batch for pure
    //      maps, so the oracle is the same per-row SQL over the full
    //      table. ----
    "st13_stream_quality_gate" -> QDef(
      (s, dir) => {
        import org.apache.spark.sql.streaming.Trigger
        val docs = Tables.documents(s, dir)
        val stream = s.readStream.schema(docs.schema)
          .option("pathGlobFilter", "documents.parquet").parquet(dir)
        val gated = stream
          .select(col("doc_id"), col("text"), split(col("text"), " ").as("w"))
          .select(col("doc_id"),
            size(col("w")).cast("long").as("n_words"),
            round((length(col("text")) - (size(col("w")) - 1)) /
              size(col("w")).cast("double"), 4).as("mean_wl"),
            Seq("a", "the", "data", "value", "row", "table")
              .map(t => array_contains(col("w"), t).cast("int"))
              .reduce(_ + _).as("n_stop"),
            round(expr(
              "array_max(transform(array_distinct(w), x -> size(filter(w, y -> y = x))))")
              .cast("double") / size(col("w")), 6).as("top_frac"))
          .withColumn("keep",
            col("n_words").between(40, 100000) && col("mean_wl").between(4.0, 10.0) &&
              col("n_stop") >= 4 && col("top_frac") <= 0.12)
        val q = gated.writeStream.format("memory").queryName("st13_mem")
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        s.table("st13_mem")
      },
      Some("""WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents)
             |SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
             |  round((len(text) - (len(w) - 1)) / CAST(len(w) AS DOUBLE), 4) AS mean_wl,
             |  CAST(list_contains(w, 'a') AS INT) + CAST(list_contains(w, 'the') AS INT) +
             |  CAST(list_contains(w, 'data') AS INT) + CAST(list_contains(w, 'value') AS INT) +
             |  CAST(list_contains(w, 'row') AS INT) + CAST(list_contains(w, 'table') AS INT)
             |    AS n_stop,
             |  round(CAST(list_max(list_transform(list_distinct(w),
             |    x -> len(list_filter(w, y -> y = x)))) AS DOUBLE) / len(w), 6) AS top_frac,
             |  len(w) BETWEEN 40 AND 100000
             |    AND round((len(text) - (len(w) - 1)) / CAST(len(w) AS DOUBLE), 4)
             |          BETWEEN 4.0 AND 10.0
             |    AND (CAST(list_contains(w, 'a') AS INT) + CAST(list_contains(w, 'the') AS INT) +
             |         CAST(list_contains(w, 'data') AS INT) + CAST(list_contains(w, 'value') AS INT) +
             |         CAST(list_contains(w, 'row') AS INT) + CAST(list_contains(w, 'table') AS INT)) >= 4
             |    AND round(CAST(list_max(list_transform(list_distinct(w),
             |          x -> len(list_filter(w, y -> y = x)))) AS DOUBLE) / len(w), 6) <= 0.12
             |    AS keep
             |FROM w""".stripMargin))
  )
}
