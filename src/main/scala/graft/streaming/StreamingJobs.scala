package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.core.TableStore

/** Structured Streaming surface: the reference's "streaming" is batch
  * high-watermark incremental processing (SURVEY §1.1), which maps onto
  * Structured Streaming as (a) the same job bodies driven per
  * micro-batch via foreachBatch, and (b) genuine event-time operators
  * over the `events` table (watermark + tumbling windows, stateful
  * sessionization).
  *
  * Everything here works on a 1000-executor cluster: windowed counts
  * shuffle once on (window, event_type) with partial aggregation;
  * sessionization shuffles once on user_id and sorts within groups
  * (bounded per-user state).
  */
object StreamingJobs {

  /** events with a microsecond event time, adaptive to the loaded dtype
    * of `ts`: BIGINT nanos (legacy nanosAsLong readers), TIMESTAMP_NTZ
    * (Spark 4.1+ reading TIMESTAMP(MICROS) parquet), or TIMESTAMP.
    * Emits TimestampType, not NTZ: streaming watermarks reject
    * TIMESTAMP_NTZ; the session is pinned UTC so wall clocks agree. */
  def withEventTime(events: DataFrame): DataFrame = {
    val evTs = events.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        timestamp_micros(expr("ts div 1000"))
      case _ => col("ts").cast("timestamp")
    }
    events.withColumn("ev_ts", evTs)
  }

  /** Tumbling 1-day windowed counts per event_type with an event-time
    * watermark — works identically over a batch or streaming source. */
  def windowedEventCounts(events: DataFrame): DataFrame =
    withEventTime(events)
      .withWatermark("ev_ts", "1 day")
      .groupBy(window(col("ev_ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("window.start").cast("timestamp_ntz").as("window_start"),
        col("event_type"), col("n_events"))

  /** Run a bounded streaming DataFrame to a memory sink and return the
    * materialized result. Default mode is complete (emits every window,
    * including ones the watermark has not closed — matching the batch
    * oracle); pass "append" for non-aggregated streams, which Spark
    * rejects under complete mode. */
  def runToMemory(spark: SparkSession, streamed: DataFrame, name: String,
                  outputMode: String = "complete"): DataFrame = {
    val q = streamed.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  final case class Session(
      user_id: Long, session_id: Int,
      session_start: Timestamp, session_end: Timestamp, n_events: Long)

  /** instant-based construction: Timestamp.valueOf(LocalDateTime) would
    * re-interpret the wall clock in the JVM default zone */
  private def toMicrosTs(micros: Long): Timestamp = {
    val ts = new Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
    ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
    ts
  }

  /** Typed sessionization over KeyValueGroupedDataset: split each user's
    * event stream on >30-minute gaps (ordered by (ts, event_id) for a
    * total order). One shuffle on user_id; the within-group order comes
    * from flatMapSortedGroups (the shuffle's spill-safe secondary sort),
    * and the group function streams the iterator with O(1) state and
    * LAZY session emission — a single hot key (bot user with 10^8
    * events) costs no per-group materialization, where an it.toArray +
    * sortBy would hold the whole history in one task's heap. The
    * streaming twin is flatMapGroupsWithState with a session timeout
    * (StreamingSpec). */
  def sessionize(events: DataFrame): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMicros = 30L * 60 * 1000000L
    // normalize the event time to epoch µs BEFORE the typed boundary so
    // the group function is dtype-agnostic (see withEventTime scaladoc)
    val tsu = events.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      case _ => unix_micros(col("ts").cast("timestamp"))
    }
    events
      .select(col("user_id").as[Long], col("event_id").as[Long], tsu.as("tsu").as[Long])
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapSortedGroups(col("tsu").asc, col("event_id").asc) { (uid, it) =>
        new Iterator[Session] {
          private var sid = 0
          private var pending: Session = _
          private var curStart = -1L; private var curEnd = -1L; private var curN = 0L
          private def emit(): Session = {
            val s = Session(uid, sid, toMicrosTs(curStart), toMicrosTs(curEnd), curN)
            sid += 1; s
          }
          private def advance(): Unit = {
            while (pending == null && it.hasNext) {
              val t = it.next()._3
              if (curN == 0) { curStart = t; curEnd = t; curN = 1 }
              else if (t - curEnd > gapMicros) {
                pending = emit()
                curStart = t; curEnd = t; curN = 1
              } else { curEnd = t; curN += 1 }
            }
            if (pending == null && curN > 0 && !it.hasNext) {
              pending = emit(); curN = 0
            }
          }
          override def hasNext: Boolean = { advance(); pending != null }
          override def next(): Session = {
            advance()
            val r = pending; pending = null; r
          }
        }
      }
  }

  /** The watermark-incremental pattern on a real stream: each
    * micro-batch MERGEs into the TableStore target — the reference's
    * validate+load pair driven by foreachBatch (SURVEY §7.4.5). */
  def cdcMergeStream(streamed: DataFrame, store: TableStore, table: String,
                     keys: Seq[String], versionCol: String) =
    streamed.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          // intra-batch dedup first (M6 uniqueness precondition); the
          // ordering struct LEADS with the version column so the latest
          // CDC version wins, remaining columns only break exact ties
          val rest = batch.columns.filterNot(c => keys.contains(c) || c == versionCol)
          val unique = graft.ops.Dedup.latestVersionAgg(
            batch, keys, struct((col(versionCol) +: rest.map(col)): _*))
          store.mergeUpsert(table, unique, keys,
            changeTypeCol = None, verifyUniqueSource = false)
        }
      }
}
