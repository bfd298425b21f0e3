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
    * materialized result (complete mode: emits every window, including
    * ones the watermark has not closed — matching the batch oracle). */
  def runToMemory(spark: SparkSession, streamed: DataFrame, name: String): DataFrame = {
    val q = streamed.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  final case class Session(
      user_id: Long, session_id: Int,
      session_start: Timestamp, session_end: Timestamp, n_events: Long)

  /** Typed sessionization over KeyValueGroupedDataset: split each user's
    * event stream on >30-minute gaps (ordered by (ts, event_id) for a
    * total order). One shuffle on user_id; per-group state is the
    * user's events (bounded — the streaming twin is
    * flatMapGroupsWithState with a session timeout, StreamingSpec). */
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
      .flatMapGroups { (uid, it) =>
        def toMicrosTs(micros: Long): Timestamp = {
          // instant-based construction: Timestamp.valueOf(LocalDateTime)
          // would re-interpret the wall clock in the JVM default zone
          val ts = new Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
          ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
          ts
        }
        val evs = it.toArray.sortBy(e => (e._3, e._2)) // (tsu, event_id)
        val sessions = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Long)]
        var sid = 0
        var curStart = -1L; var curEnd = -1L; var curN = 0L
        evs.foreach { case (_, _, t) =>
          if (curN == 0 || t - curEnd > gapMicros) {
            if (curN > 0) { sessions += ((sid, curStart, curEnd, curN)); sid += 1 }
            curStart = t; curEnd = t; curN = 1
          } else { curEnd = t; curN += 1 }
        }
        if (curN > 0) sessions += ((sid, curStart, curEnd, curN))
        sessions.iterator.map { case (id, s0, e0, cnt) =>
          Session(uid, id, toMicrosTs(s0), toMicrosTs(e0), cnt)
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
