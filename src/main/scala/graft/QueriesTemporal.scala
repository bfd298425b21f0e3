package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark has no native physical operator for —
  * as-of join and range (interval) join — plus the ranked-window
  * analytics family and batch sessionization, all over the `events`
  * stream table.
  *
  * The join strategies are the ones that survive 100 TB:
  *  - as-of: NOT a join at all but a union + one partitioned window
  *    pass ("latest value carried forward") — one shuffle on the key,
  *    zero fan-out, the classic trades/quotes technique;
  *  - range: bin-bucketed equi-join — each probe row expands to the
  *    two bins its window can overlap, the build side maps to its own
  *    bin, and the equi-join + exact residual filter bounds fan-out by
  *    events-per-bin instead of |left| x |right|.
  * Oracles: DuckDB's native LATERAL top-1 and inequality join — fully
  * independent formulations of the same semantics.
  */
object QueriesTemporal {

  import Queries.QDef

  private def events = QueriesRelational.events _

  val defs: Map[String, QDef] = Map(

    // ---- x4: AS-OF join — each click gets the user's latest view at
    //      or before it (trades-and-quotes point-in-time semantics) ----
    "x4_asof_join" -> QDef(
      (s, dir) => {
        // µs timestamps on both sides (the oracle's precision); the
        // at-or-before pick tie-breaks on the view's event_id
        val ev = events(s, dir) // `tsu` = epoch µs, dtype-adaptive
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id"),
            col("ev_ts").as("click_ts"), col("tsu"))
        val views = ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("tsu").as("vtsu"),
            col("event_id").as("view_id"), col("value").as("view_value"))
        graft.ops.Temporal.asofJoin(clicks, views, on = Seq("user_id"),
            leftTs = "tsu", rightTs = "vtsu",
            payload = Seq("view_id", "view_value"), tieBreak = Seq("view_id"))
          .select(col("click_id"), col("user_id"), col("click_ts"),
            col("view_id"), col("view_value"))
      },
      Some("""SELECT c.event_id AS click_id, c.user_id, CAST(c.ts AS TIMESTAMP) AS click_ts,
             |  v.view_id, v.view_value
             |FROM events c LEFT JOIN LATERAL (
             |  SELECT event_id AS view_id, value AS view_value FROM events v
             |  WHERE v.user_id = c.user_id AND v.event_type = 'view'
             |    AND CAST(v.ts AS TIMESTAMP) <= CAST(c.ts AS TIMESTAMP)
             |  ORDER BY CAST(v.ts AS TIMESTAMP) DESC, v.event_id DESC LIMIT 1) v ON true
             |WHERE c.event_type = 'click'""".stripMargin)),

    // ---- x5: RANGE join — clicks within 10s after an error, ANY user
    //      (attribution-window join with no equi key). Bin-bucketed:
    //      errors expand to the 2 bins their window overlaps, clicks
    //      hash to their own bin, equi-join on bin + exact residual ----
    "x5_range_join" -> QDef(
      (s, dir) => {
        val W = 10000000L // 10s in micros (µs precision on both engines:
                          // DuckDB truncates parquet ns timestamps to µs)
        val ev = events(s, dir)
        val errors = ev.filter(col("event_type") === "error")
          .select(col("event_id").as("error_id"), col("tsu").as("ets"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("tsu").as("cts"))
        graft.ops.Temporal.rangeJoin(errors, clicks,
            leftTs = "ets", rightTs = "cts", lower = 0L, upper = W)
          .select(col("error_id"), col("click_id"),
            (col("cts") - col("ets")).as("gap_us"))
      },
      Some("""SELECT e.event_id AS error_id, c.event_id AS click_id,
             |  epoch_us(CAST(c.ts AS TIMESTAMP)) - epoch_us(CAST(e.ts AS TIMESTAMP)) AS gap_us
             |FROM events e JOIN events c
             |  ON epoch_us(CAST(c.ts AS TIMESTAMP)) >= epoch_us(CAST(e.ts AS TIMESTAMP))
             | AND epoch_us(CAST(c.ts AS TIMESTAMP)) < epoch_us(CAST(e.ts AS TIMESTAMP)) + 10000000
             |WHERE e.event_type = 'error' AND c.event_type = 'click'""".stripMargin)),

    // ---- w6: ranked-window family — ntile / percent_rank / cume_dist /
    //      first_value / nth_value over a total order ----
    "w6_ranked_windows" -> QDef(
      (s, dir) => {
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        val wRows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.orders(s, dir).select(
          col("o_orderkey"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"),
          first(col("o_orderkey")).over(w).as("first_key"),
          nth_value(col("o_orderkey"), 2).over(wRows).as("second_key"))
      },
      Some("""SELECT o_orderkey,
             |  ntile(4) OVER w AS quartile,
             |  round(percent_rank() OVER w, 6) AS pr,
             |  round(cume_dist() OVER w, 6) AS cd,
             |  first_value(o_orderkey) OVER w AS first_key,
             |  nth_value(o_orderkey, 2) OVER (PARTITION BY o_orderpriority
             |    ORDER BY o_totalprice DESC, o_orderkey
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_key
             |FROM orders
             |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)""".stripMargin)),

    // ---- w7: batch sessionization (gaps-and-islands) — 30-minute
    //      inactivity gap starts a new session; one window pass per
    //      step, partitioned by user (the batch twin of st2/st3) ----
    "w7_sessionize_batch" -> QDef(
      (s, dir) => {
        val gap = 30L * 60 * 1000000L // 30 min in µs (oracle precision)
        val wo = Window.partitionBy(col("user_id"))
          .orderBy(col("tsu"), col("event_id"))
        val marked = events(s, dir)
          .select(col("user_id"), col("event_id"), col("ev_ts"), col("tsu"))
          .withColumn("prev_ts", lag(col("tsu"), 1).over(wo))
          .withColumn("is_new",
            when(col("prev_ts").isNull || col("tsu") - col("prev_ts") > gap, 1)
              .otherwise(0))
        marked
          .withColumn("session_seq", sum(col("is_new"))
            .over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("long"))
          .groupBy(col("user_id"), col("session_seq"))
          .agg(count(lit(1)).as("n_events"),
            min(col("ev_ts")).as("session_start"),
            max(col("ev_ts")).as("session_end"))
      },
      Some("""WITH t AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ev_ts, ts FROM events),
             |m AS (SELECT *, CASE WHEN lag(ts) OVER w IS NULL
             |                       OR ts - lag(ts) OVER w > to_minutes(30)
             |                     THEN 1 ELSE 0 END AS is_new
             |      FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |s AS (SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq FROM m)
             |SELECT user_id, session_seq, count(*) AS n_events,
             |  min(ev_ts) AS session_start, max(ev_ts) AS session_end
             |FROM s GROUP BY user_id, session_seq""".stripMargin))
  )
}
