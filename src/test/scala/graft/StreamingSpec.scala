package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import org.scalatest.funsuite.AnyFunSuite

import graft.core.TableStore
import graft.streaming.StreamingJobs

/** Unbounded-side streaming semantics with MemoryStream: late-event
  * drops past the watermark, stateful running aggregates, and the
  * foreachBatch CDC-merge pattern into TableStore.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("watermark drops events later than the threshold (append mode)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val windowed = input.toDF().toDF("ev_ts", "k")
      .withWatermark("ev_ts", "10 minutes")
      .groupBy(window(col("ev_ts"), "10 minutes")).count()
    val q = windowed.writeStream.format("memory")
      .queryName("wm_test").outputMode("append").start()
    // batch 1: two windows; watermark advances to 01:00 - 10min = 00:50
    input.addData((ts("2024-01-01 00:05:00"), "a"), (ts("2024-01-01 01:00:00"), "b"))
    q.processAllAvailable()
    // batch 2: an event at 00:07 is far behind the watermark -> dropped;
    // one at 01:05 lands in the open window
    input.addData((ts("2024-01-01 00:07:00"), "late"), (ts("2024-01-01 01:05:00"), "c"))
    q.processAllAvailable()
    // batch 3: advance watermark far enough to close every window
    input.addData((ts("2024-01-01 03:00:00"), "z"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("wm_test")
      .select(col("window.start").cast("string"), col("count")).as[(String, Long)]
      .collect().toMap
    assert(rows("2024-01-01 00:00:00") === 1) // late event NOT counted
    assert(rows("2024-01-01 01:00:00") === 2) // open-window event counted
  }

  test("mapGroupsWithState keeps running counts across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Int)]
    val counted = input.toDS()
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (k: String, it: Iterator[(String, Int)], state: GroupState[Long]) =>
          val next = state.getOption.getOrElse(0L) + it.size
          state.update(next)
          (k, next)
      }
    val q = counted.toDF("k", "n").writeStream.format("memory")
      .queryName("state_test").outputMode("update").start()
    input.addData(("a", 1), ("a", 2), ("b", 1))
    q.processAllAvailable()
    input.addData(("a", 3), ("c", 1))
    q.processAllAvailable()
    q.stop()
    // update mode: last emitted row per key reflects cumulative state
    val last = spark.table("state_test").groupBy("k").agg(max("n").as("n"))
      .as[(String, Long)].collect().toMap
    assert(last === Map("a" -> 3L, "b" -> 1L, "c" -> 1L))
  }

  test("foreachBatch CDC merge converges the TableStore target") {
    implicit val sqlCtx = spark.sqlContext
    val store = new TableStore(spark, Files.createTempDirectory("cdcstream").toString)
    store.create("t", Seq((1L, "v0", 0L)).toDF("id", "v", "updated"))
    val input = MemoryStream[(Long, String, Long)]
    val q = StreamingJobs.cdcMergeStream(
      input.toDF().toDF("id", "v", "updated"), store, "t", Seq("id"),
      versionCol = "updated").start()
    // batch with an intra-batch duplicate key: latest `updated` wins
    input.addData((1L, "v1", 1L), (2L, "v2a", 1L), (2L, "v2b", 2L))
    q.processAllAvailable()
    input.addData((3L, "v3", 3L))
    q.processAllAvailable()
    q.stop()
    val got = store.read("t").as[(Long, String, Long)].collect().toSet
    assert(got === Set((1L, "v1", 1L), (2L, "v2b", 2L), (3L, "v3", 3L)))
  }

  test("writeStream.toTable lands epochs exactly-once in the store") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("stsink").toString
    spark.conf.set("spark.sql.catalog.graft_sink", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_sink.root", root)
    val store = new TableStore(spark, root)
    store.createEmpty("sunk", Seq((1L, "a")).toDF("id", "v").schema)
    val input = MemoryStream[(Long, String)]
    val ckpt = Files.createTempDirectory("stsink_ckpt").toString
    val q = input.toDF().toDF("id", "v").writeStream
      .option("checkpointLocation", ckpt)
      .toTable("graft_sink.sunk")
    input.addData((1L, "a"), (2L, "b"))
    q.processAllAvailable()
    input.addData((3L, "c"))
    q.processAllAvailable()
    q.stop()
    assert(store.read("sunk").as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    // the epoch watermark rode each commit: re-delivering an old epoch
    // must be a no-op (exactly-once), even with data files present
    val before = store.currentVersion("sunk")
    val stale = Files.createTempFile("stale", ".parquet")
    assert(!store.attachStreamEpoch("sunk", q.id.toString, 0L, Seq(stale)))
    assert(store.currentVersion("sunk") === before)
    assert(!Files.exists(stale)) // dropped epoch cleans its files up
    assert(store.read("sunk").count() === 3)
  }

  test("Trigger.AvailableNow drains every committed version, then stops") {
    val root = Files.createTempDirectory("anstream").toString
    val store = new TableStore(spark, root)
    spark.conf.set("spark.sql.catalog.graft_an", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_an.root", root)
    store.create("feed", Seq((1L, "a")).toDF("id", "v"))
    store.append("feed", Seq((2L, "b")).toDF("id", "v"))
    store.append("feed", Seq((3L, "c")).toDF("id", "v"))
    val q = spark.readStream.table("graft_an.feed")
      .writeStream.format("memory").queryName("an_sink")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    // all three committed versions drained in the one triggered run and
    // the query terminated on its own (the AvailableNow contract — no
    // "uncommitted batch" fallback warning path)
    assert(!q.isActive)
    assert(spark.table("an_sink").as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("streaming MV restart: crash after an applied-but-uncommitted " +
      "batch, restart from the checkpoint, exactly-once via txn stamps") {
    // r11 VERDICT #6: st19 argues batchId-keyed idempotence from
    // ChangeFeedSpec's re-delivery test; this exercises it across a
    // REAL restart — the stream dies AFTER a batch's view commit but
    // BEFORE the checkpoint acknowledges it, so the restarted stream
    // re-delivers that batch under the same batchId and the txn stamp
    // (which rode the view's own commit) must absorb it.
    val root = Files.createTempDirectory("mvrestart").toString
    val store = new TableStore(spark, root)
    spark.conf.set("spark.sql.catalog.graft_mvr", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_mvr.root", root)
    store.createEmpty("src", org.apache.spark.sql.types.StructType.fromDDL(
      "grp BIGINT, qty BIGINT"))                                    // v0
    store.setChangeFeed("src", true)                                // v1
    store.append("src", Seq((1L, 10L), (2L, 20L)).toDF("grp", "qty")) // v2
    store.update("src", col("grp") === 1L, Map("qty" -> lit(15L)))  // v3
    store.append("src", Seq((3L, 30L)).toDF("grp", "qty"))          // v4
    store.delete("src", col("grp") === 2L)                          // v5
    store.createEmpty("agg_view", org.apache.spark.sql.types.StructType.fromDDL(
      "grp BIGINT, n_rows BIGINT, sum_qty BIGINT"))
    val ckpt = s"$root/_ckpt"
    val applied = scala.collection.mutable.ArrayBuffer.empty[Long]
    @volatile var bombedAt: Option[Long] = None
    def run(armBomb: Boolean) = spark.readStream
      .option("startVersion", "-1").option("maxVersionsPerTrigger", "1")
      .table("graft_mvr.src.changes")
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        // the bomb must hit a batch that ACTUALLY stamped the view —
        // empty batches (the create/setChangeFeed versions) no-op
        // inside the apply without writing a txn stamp
        val hasRows = !batch.isEmpty
        graft.ops.Ivm.applyCountSumDelta(store, "agg_view", batch,
          Seq("grp"), "qty", txn = Some(("mvr", batchId)))
        applied.synchronized { applied += batchId }
        if (armBomb && bombedAt.isEmpty && hasRows) {
          bombedAt = Some(batchId)
          throw new RuntimeException("injected crash after apply, before ack")
        }
      }
      .start()
    val q1 = run(armBomb = true)
    intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      q1.awaitTermination())
    // the crashed batch DID commit to the view (its txn stamp landed)
    // even though the checkpoint never acknowledged it
    val b = bombedAt.get
    assert(applied.synchronized(applied.toSeq).contains(b))
    assert(store.lastTxnVersion("agg_view", "mvr") === Some(b))
    val q2 = run(armBomb = false)
    q2.awaitTermination(120000)
    assert(!q2.isActive)
    // at-least-once made real: the bombed batch was re-delivered under
    // the same id (and absorbed by the stamp — the convergence check
    // below would read doubled counts otherwise)
    assert(applied.synchronized(applied.toSeq).count(_ == b) >= 2)
    val view = graft.ops.Ivm.readView(store, "agg_view")
      .select("grp", "n_rows", "sum_qty").as[(Long, Long, Long)]
      .collect().toSet
    val direct = store.read("src").groupBy("grp")
      .agg(count(lit(1)).as("n_rows"), sum("qty").as("sum_qty"))
      .as[(Long, Long, Long)].collect().toSet
    assert(view === direct, s"restarted stream did not converge: $view")
    // the restarted run progressed past the bombed batch (the later
    // mutation versions carry rows, so later stamps exist)
    assert(store.lastTxnVersion("agg_view", "mvr").exists(_ > b))
  }

  test("maxVersionsPerTrigger drains a backlog in bounded micro-batches") {
    val root = Files.createTempDirectory("mvstream").toString
    val store = new TableStore(spark, root)
    spark.conf.set("spark.sql.catalog.graft_mv", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_mv.root", root)
    store.create("feed", Seq((1L, "a")).toDF("id", "v"))
    (2L to 6L).foreach(i => store.append("feed", Seq((i, s"v$i")).toDF("id", "v")))
    val batchSizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream
      .option("maxVersionsPerTrigger", "2")
      .table("graft_mv.feed")
      .writeStream
      .foreachBatch((df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batchSizes.synchronized { batchSizes += df.count() }: Unit)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    assert(!q.isActive)
    // 6 versions at <=2 per trigger: at least 3 batches, all rows once
    assert(batchSizes.sum === 6)
    assert(batchSizes.count(_ > 0) >= 3)
    assert(batchSizes.forall(_ <= 2))
  }

  test("merge-on-read deletes and the append stream: the initial batch " +
      "is a DV-applied snapshot; an incremental DV commit fails loudly") {
    val root = Files.createTempDirectory("dvstream").toString
    val store = new TableStore(spark, root)
    spark.conf.set("spark.sql.catalog.graft_dvs", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_dvs.root", root)
    store.create("feed", (1L to 10L).map(i => (i, s"v$i")).toDF("id", "v")) // v0
    store.deleteVectorized("feed", col("id") <= 3L)                         // v1: DV only
    val ckpt = s"$root/_stream_ckpt"
    val seen = scala.collection.mutable.Set.empty[Long]
    def run() = spark.readStream.table("graft_dvs.feed")
      .writeStream
      .foreachBatch((df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        seen.synchronized { seen ++= df.collect().map(_.getLong(0)) }: Unit)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    // initial catch-up from scratch: a SNAPSHOT read — tombstoned rows
    // must NOT appear even though the history contains a MoR delete
    val q = run()
    q.awaitTermination(60000)
    assert(seen.synchronized(seen.toSet) === (4L to 10L).toSet)
    // a DV commit in an INCREMENTAL range (the stream has a checkpointed
    // offset now) is a row-level delete the append stream can't
    // represent — restart fails loudly, never silently replays
    store.append("feed", Seq((11L, "x")).toDF("id", "v"))       // v2
    store.deleteVectorized("feed", col("id") === 5L)            // v3: DV only
    val q2 = run()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.awaitTermination(60000): Unit
      q2.processAllAvailable()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      Option(c.getMessage).exists(_.contains("deletion-vector"))),
      s"expected the DV guard to fail the stream, got: $e")
  }

  test("streaming bloom decontamination flags reference keys batch-by-batch") {
    implicit val sqlCtx = spark.sqlContext
    // reference set: 200 "contaminated" keys folded into a bitset batch-side
    val mBits = 1L << 16
    val k = 5
    val ref = (0 until 200).map(i => s"bad_$i").toDF("key")
    val bits = graft.ops.Corpus.bloomBuild(ref, col("key"), mBits, k)
    val input = MemoryStream[String]
    val flaggedStream = graft.ops.Corpus.bloomMaybeContains(
      input.toDF().toDF("key"), col("key"), bits, mBits, k)
    val q = flaggedStream.writeStream.format("memory")
      .queryName("bloom_stream").outputMode("append").start()
    // two micro-batches, each mixing contaminated and clean keys
    input.addData((0 until 100).map(i => s"bad_$i") ++ (0 until 500).map(i => s"ok_a$i"))
    q.processAllAvailable()
    val afterB1 = spark.table("bloom_stream").as[String].collect().toSet
    assert((0 until 100).forall(i => afterB1(s"bad_$i")), "batch-1 false negative")
    input.addData((100 until 200).map(i => s"bad_$i") ++ (0 until 500).map(i => s"ok_b$i"))
    q.processAllAvailable()
    q.stop()
    val all = spark.table("bloom_stream").as[String].collect().toSet
    assert((0 until 200).forall(i => all(s"bad_$i")), "batch-2 false negative")
    // FP sanity at this load (~200*5/65536 bits set): clean keys almost
    // never flag — allow a generous margin before calling it broken
    assert(all.count(_.startsWith("ok_")) <= 10, s"implausible FPs: $all")
  }

  test("Complete output mode replaces the table each epoch (truncate " +
      "honored by the streaming sink)") {
    val root = Files.createTempDirectory("stcomplete").toString
    spark.conf.set("spark.sql.catalog.graft_cm", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_cm.root", root)
    val store = new TableStore(spark, root)
    store.createEmpty("agg", Seq((1L, 1L)).toDF("k", "n").schema)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Long]
    val ckpt = Files.createTempDirectory("stcomplete_ckpt").toString
    val q = input.toDF().toDF("k").groupBy("k")
      .agg(count(lit(1)).as("n"))
      .writeStream.option("checkpointLocation", ckpt)
      .outputMode("complete")
      .toTable("graft_cm.agg")
    input.addData(1L, 1L, 2L)
    q.processAllAvailable()
    assert(store.read("agg").as[(Long, Long)].collect().toSet ===
      Set((1L, 2L), (2L, 1L)))
    input.addData(1L)
    q.processAllAvailable()
    q.stop()
    // the second epoch REPLACED the first's rows — before the fix the
    // sink appended every recomputed aggregate (stale (1,2) kept)
    assert(store.read("agg").as[(Long, Long)].collect().toSet ===
      Set((1L, 3L), (2L, 1L)),
      "complete-mode epoch must replace, not append")
  }

  test("streaming into a bucketed table keeps the bucket layout") {
    val root = Files.createTempDirectory("stbucket").toString
    spark.conf.set("spark.sql.catalog.graft_bk", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_bk.root", root)
    val store = new TableStore(spark, root)
    store.createBucketed("b", Seq((1L, "a")).toDF("id", "v"), Seq("id"), 4)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val ckpt = Files.createTempDirectory("stbucket_ckpt").toString
    val q = input.toDF().toDF("id", "v").writeStream
      .option("checkpointLocation", ckpt)
      .toTable("graft_bk.b")
    input.addData((2L, "b"), (3L, "c"), (4L, "d"))
    q.processAllAvailable()
    q.stop()
    assert(store.read("b").as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
    // every live dir is still a bucket leaf: one streamed epoch must
    // not demote the table off SPJ / key-driven merge pruning
    assert(store.liveDirs("b").forall(_.contains("/__b=")),
      s"streamed epoch demoted the layout: ${store.liveDirs("b")}")
    // and the routed leaves agree with the engine's bucket function:
    // a key-driven merge over them stays correct
    store.mergeUpsert("b", Seq((2L, "B")).toDF("id", "v"), Seq("id"),
      changeTypeCol = None)
    assert(store.read("b").as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "B"), (3L, "c"), (4L, "d")))
  }
}
