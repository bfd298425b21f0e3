package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{DateSpine, Dedup, SurrogateKeys, Validation}

/** SURVEY §2.3-2.9 operator inventory as oracle-checked queries over the
  * driver testdata (P* predicates, J* joins, A* aggregations, W* windows,
  * O* sorts/limits, set ops, scalar functions, S4 date spine).
  *
  * Determinism rules: see Queries scaladoc. DuckDB dialect notes:
  * dayofweek() is 0-based there (Sunday=0) vs Spark's 1-based, so
  * oracles add 1; integer sums are CAST(.. AS BIGINT) because DuckDB
  * widens to HUGEINT.
  */
object QueriesRelational {

  import Queries.{Q, QDef}

  /** events.parquet's `ts` physical type has shifted across driver
    * versions: TIMESTAMP(NANOS) (which Spark reads as BIGINT nanos under
    * the legacy nanosAsLong conf) and, currently, TIMESTAMP(MICROS,
    * isAdjustedToUTC=false) (which Spark 4.1+ loads natively as
    * TIMESTAMP_NTZ; the nanos conf is irrelevant/ignored). Branch on the
    * LOADED dtype — never on a conf — and derive two normalized columns
    * every downstream consumer uses instead of touching raw `ts`:
    *  - `ev_ts` µs TIMESTAMP_NTZ event time, identical to DuckDB's
    *    CAST(ts AS TIMESTAMP);
    *  - `tsu` epoch-µs BIGINT, matching DuckDB epoch_us(CAST(ts AS
    *    TIMESTAMP)) — for the ordering / interval arithmetic paths
    *    (as-of, range join, sessionize). Sessions are pinned UTC, so the
    *    ntz→instant cast is exact. */
  def events(s: SparkSession, dir: String): DataFrame = {
    val raw = Tables.events(s, dir)
    val evTs: Column = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz")
      case org.apache.spark.sql.types.TimestampNTZType => col("ts")
      case _ => col("ts").cast("timestamp_ntz")
    }
    raw.withColumn("ev_ts", evTs)
      .withColumn("tsu", unix_micros(col("ev_ts").cast("timestamp")))
  }

  /** er1's blocked fuzzy-match core, parameterized by the probe frame
    * so Er1Spec can drive corruptions the planted fixture doesn't
    * exercise (e.g. a deletion at character 1, which breaks the prefix
    * block and must be recovered by the suffix key). `clean` carries
    * (p_partkey, p_name); `dirty` carries (probe_key, probe_name).
    *
    * Altitude is the scale decision, same as er2: the lev match runs
    * over DISTINCT NAMES (vocabulary-sized), never record pairs —
    * blocking RECORDS directly is O(sum block²) in records, and on any
    * corpus with name repetition (this one: 64 distinct names over
    * 20k rows; real linkage corpora repeat heavily too) the blocks are
    * O(n/k) and the verify quadratic: measured 49 s vs 2.6 s at sf0.1
    * for the SAME answer. Per-record best-pick min(lev·P + key) is
    * recovered exactly at name altitude because min distributes: the
    * clean side pre-aggregates min(p_partkey) per name, the name-level
    * winner packs (lev, minKey), and records pick their name's winner
    * through one vocabulary-sized hash join
    * (AQE broadcasts it whenever it fits) — no wide shuffle anywhere.
    * Candidate NAME pairs come from the union of 2-char-prefix and
    * 2-char-suffix equi-key blocks (one edit breaks at most one key);
    * dual-key duplicates are tolerated — the min-agg is insensitive. */
  private[graft] def er1Core(clean: DataFrame, dirty: DataFrame): DataFrame = {
    val P = 1L << 48
    val probeNames = dirty.select(col("probe_name")).distinct()
    val cleanMin = clean
      .groupBy(col("p_name"))
      .agg(min(when(col("p_partkey") < 0L || col("p_partkey") >= P,
        raise_error(concat(lit("er1: p_partkey outside packable 48-bit range: "),
          col("p_partkey").cast("string"))).cast("long"))
        .otherwise(col("p_partkey"))).as("minkey"))
    def scored(key: Column => Column): DataFrame =
      probeNames.withColumn("blk", key(col("probe_name")))
        .join(cleanMin.withColumn("blk", key(col("p_name"))), Seq("blk"))
        .drop("blk")
        .filter(abs(length(col("p_name")) - length(col("probe_name"))) <= 2)
        .withColumn("lev", levenshtein(col("probe_name"), col("p_name")))
        .filter(col("lev") <= 2)
    val bestPerName = scored(n => substring(n, 1, 2))
      .unionByName(scored(n => substring(n, -2, 2)))
      .groupBy(col("probe_name"))
      .agg(min(col("lev").cast("long") * P + col("minkey")).as("pk"))
    dirty.join(bestPerName, Seq("probe_name"))
      .select(col("probe_key"), col("probe_name"),
        expr(s"pk % ${P}L").as("match_key"),
        expr(s"pk DIV ${P}L").cast("int").as("lev"))
  }

  val defs: Map[String, QDef] = Map(

    // ---- S1+P1: CSV scan (header, all-string, no inferSchema) + the
    //      explicit CAST projection (bronze/jobs/validate_bronze.py:20,26-42) ----
    "s1_csv_scan" -> QDef(
      (s, dir) => {
        val out = s"/tmp/graft_csv/${new java.io.File(dir).getName}"
        Tables.orders(s, dir)
          .select("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
          .write.mode("overwrite").option("header", "true").csv(out)
        s.read.option("header", "true").csv(out) // untyped: every column string
          .select(
            col("o_orderkey").cast("long").as("o_orderkey"),
            col("o_custkey").cast("long").as("o_custkey"),
            col("o_orderstatus"), col("o_orderpriority"))
      },
      Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority
             |FROM orders""".stripMargin)),

    // ---- P2: watermark incremental predicate (new rows OR late updates) ----
    "p2_watermark_pred" -> QDef(
      (s, dir) => {
        val wm = lit("2024-01-20 00:00:00").cast("timestamp_ntz")
        val df = events(s, dir).withColumn("updated_ts",
          col("ev_ts") + make_dt_interval(lit(0), lit(0), lit(0), floor(col("value"))))
        df.filter(Validation.watermarkPredicate(col("ev_ts"), col("updated_ts"), Some(wm)))
          .select(col("event_id"), col("event_type"), col("ev_ts"), col("updated_ts"))
      },
      Some("""SELECT event_id, event_type,
             |  CAST(ts AS TIMESTAMP) AS ev_ts,
             |  CAST(ts AS TIMESTAMP) + to_seconds(CAST(floor(value) AS BIGINT)) AS updated_ts
             |FROM events
             |WHERE CAST(ts AS TIMESTAMP) > TIMESTAMP '2024-01-20 00:00:00'
             |   OR (CAST(ts AS TIMESTAMP) <= TIMESTAMP '2024-01-20 00:00:00'
             |       AND CAST(ts AS TIMESTAMP) + to_seconds(CAST(floor(value) AS BIGINT))
             |           > TIMESTAMP '2024-01-20 00:00:00')""".stripMargin)),

    // ---- P3: date-range predicate (backfill window) ----
    "p3_date_range" -> QDef(
      (s, dir) => Tables.lineitem(s, dir)
        .filter(to_date(col("l_shipdate")).between("1997-01-01", "1997-12-31"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty")),
      Some("""SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS qty
             |FROM lineitem
             |WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1997-01-01' AND DATE '1997-12-31'
             |GROUP BY l_returnflag""".stripMargin)),

    // ---- P4+P5: tier-1 quarantine split + error classifier ----
    "p4_p5_quarantine" -> QDef(
      (s, dir) => {
        val rules = Seq(
          Validation.Rule("NULL_CUSTKEY", col("o_custkey").isNull),
          Validation.Rule("LOW_PRICE", col("o_totalprice") < 2000),
          Validation.Rule("LATE_DATE", col("o_orderdate") > lit("2001-06-01 00:00:00").cast("timestamp_ntz")))
        Tables.orders(s, dir)
          .filter(Validation.anyFail(rules))
          .select(col("o_orderkey"),
            Validation.classify(rules).as("error_reason"),
            lit("TIER_1").as("error_tier"))
      },
      Some("""SELECT o_orderkey,
             |  CASE WHEN o_custkey IS NULL THEN 'NULL_CUSTKEY'
             |       WHEN o_totalprice < 2000 THEN 'LOW_PRICE'
             |       WHEN o_orderdate > TIMESTAMP '2001-06-01 00:00:00' THEN 'LATE_DATE'
             |  END AS error_reason,
             |  'TIER_1' AS error_tier
             |FROM orders
             |WHERE o_custkey IS NULL OR o_totalprice < 2000
             |   OR o_orderdate > TIMESTAMP '2001-06-01 00:00:00'""".stripMargin)),

    // ---- P6: tier-2 flag + ';'-joined validation_errors ----
    "p6_tier2_flags" -> QDef(
      (s, dir) => {
        val rules = Seq(
          Validation.Rule("HIGH_DISCOUNT", col("l_discount") > 0.08),
          Validation.Rule("HIGH_TAX", col("l_tax") > 0.06),
          Validation.Rule("BIG_QTY", col("l_quantity") >= 45))
        Tables.lineitem(s, dir).select(
          col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          Validation.qualityFlag(rules).as("data_quality_flag"),
          Validation.errorList(rules).as("validation_errors"))
      },
      Some("""SELECT l_orderkey, l_linenumber, l_partkey,
             |  CASE WHEN l_discount > 0.08 OR l_tax > 0.06 OR l_quantity >= 45
             |       THEN 'FAILED_VALIDATION' ELSE 'PASSED' END AS data_quality_flag,
             |  concat_ws(';',
             |    CASE WHEN l_discount > 0.08 THEN 'HIGH_DISCOUNT' END,
             |    CASE WHEN l_tax > 0.06 THEN 'HIGH_TAX' END,
             |    CASE WHEN l_quantity >= 45 THEN 'BIG_QTY' END) AS validation_errors
             |FROM lineitem""".stripMargin)),

    // ---- P7: tier-3 defaults (COALESCE; nulls synthesized via NULLIF) ----
    "p7_tier3_defaults" -> QDef(
      (s, dir) => Tables.documents(s, dir).select(
        col("doc_id"),
        coalesce(nullif(col("source"), lit("src3")), lit("UNKNOWN_SOURCE")).as("source_fixed"),
        coalesce(nullif(col("lang"), lit("zh")), lit("und")).as("lang_fixed")),
      Some("""SELECT doc_id,
             |  coalesce(nullif(source, 'src3'), 'UNKNOWN_SOURCE') AS source_fixed,
             |  coalesce(nullif(lang, 'zh'), 'und') AS lang_fixed
             |FROM documents""".stripMargin)),

    // ---- P8: late-arrival flag + delay hours ----
    "p8_late_arrival" -> QDef(
      (s, dir) => {
        val wm = lit("2024-01-15 00:00:00").cast("timestamp_ntz")
        val df = events(s, dir).withColumn("updated_ts",
          col("ev_ts") + make_dt_interval(floor(col("value") / 10), lit(0), lit(0), lit(0)))
        df.select(col("event_id"),
            Validation.isLateArrival(col("ev_ts"), col("updated_ts"), wm).as("is_late"),
            Validation.arrivalDelayHours(col("ev_ts"), col("updated_ts")).as("delay_hours"))
          .filter(col("is_late"))
      },
      Some("""WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ev_ts,
             |  CAST(ts AS TIMESTAMP) + to_hours(24 * CAST(floor(value / 10) AS BIGINT)) AS updated_ts
             |  FROM events)
             |SELECT event_id, true AS is_late,
             |  CAST(floor(date_diff('second', ev_ts, updated_ts) / 3600.0) AS INT) AS delay_hours
             |FROM e
             |WHERE ev_ts < TIMESTAMP '2024-01-15 00:00:00'
             |  AND updated_ts > TIMESTAMP '2024-01-15 00:00:00'""".stripMargin)),

    // ---- P9: null-safe clean-data filter (is_deleted false-or-null) ----
    "p9_clean_filter" -> QDef(
      (s, dir) => Tables.orders(s, dir)
        .withColumn("is_deleted",
          when(col("o_orderkey") % 11 === 0, lit(null).cast("boolean"))
            .when(col("o_orderstatus") === "F" && col("o_orderkey") % 7 === 0, lit(true))
            .otherwise(lit(false)))
        .filter(col("is_deleted") === false || col("is_deleted").isNull)
        .select(col("o_orderkey"), col("o_orderstatus"), col("is_deleted")),
      Some("""WITH t AS (SELECT o_orderkey, o_orderstatus,
             |  CASE WHEN o_orderkey % 11 = 0 THEN NULL
             |       WHEN o_orderstatus = 'F' AND o_orderkey % 7 = 0 THEN true
             |       ELSE false END AS is_deleted
             |  FROM orders)
             |SELECT * FROM t WHERE is_deleted = false OR is_deleted IS NULL""".stripMargin)),

    // ---- P10/P11: LIKE / NOT LIKE filters ----
    "p10_like_filter" -> QDef(
      (s, dir) => Tables.part(s, dir)
        .filter(!col("p_type").like("STANDARD%") && col("p_brand").like("Brand#1%"))
        .select(col("p_partkey"), col("p_brand"), col("p_type")),
      Some("""SELECT p_partkey, p_brand, p_type FROM part
             |WHERE p_type NOT LIKE 'STANDARD%' AND p_brand LIKE 'Brand#1%'""".stripMargin)),

    // ---- J1: star enrichment — 5-way LEFT JOIN + derived measures ----
    // Dims (part/supplier/customer/nation) are explicitly broadcast; at
    // 100 TB only the lineitem->orders join shuffles (both fact-sized).
    "j1_star_join" -> QDef(
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey", "o_orderstatus")
        val joined = li
          .join(broadcast(Tables.part(s, dir).select("p_partkey", "p_name", "p_brand")),
            col("l_partkey") === col("p_partkey"), "left")
          .join(broadcast(Tables.supplier(s, dir).select("s_suppkey", "s_name", "s_nationkey")),
            col("l_suppkey") === col("s_suppkey"), "left")
          .join(o, col("l_orderkey") === col("o_orderkey"), "left")
          .join(broadcast(Tables.customer(s, dir).select("c_custkey", "c_name", "c_mktsegment")),
            col("o_custkey") === col("c_custkey"), "left")
          .join(broadcast(Tables.nation(s, dir).select("n_nationkey", "n_name")),
            col("s_nationkey") === col("n_nationkey"), "left")
        joined.select(
          col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("p_name"), col("p_brand"), col("s_name"), col("n_name").as("supp_nation"),
          col("c_name"), col("c_mktsegment"), col("o_orderstatus"),
          // per-row scalars stay unrounded: identical IEEE ops in both
          // engines are bit-exact, while round() half-up/half-even
          // boundary behavior differs between Spark and DuckDB
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net_price"),
          (col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("charge"))
      },
      Some("""SELECT l_orderkey, l_linenumber, l_partkey, p_name, p_brand, s_name,
             |  n_name AS supp_nation, c_name, c_mktsegment, o_orderstatus,
             |  l_extendedprice * (1 - l_discount) AS net_price,
             |  l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
             |FROM lineitem
             |LEFT JOIN part ON l_partkey = p_partkey
             |LEFT JOIN supplier ON l_suppkey = s_suppkey
             |LEFT JOIN orders ON l_orderkey = o_orderkey
             |LEFT JOIN customer ON o_custkey = c_custkey
             |LEFT JOIN nation ON s_nationkey = n_nationkey""".stripMargin)),

    // ---- J2: SCD2 change detection (inner equi-join + attr inequality) ----
    "j2_change_detect" -> QDef(
      (s, dir) => {
        val cur = Tables.customer(s, dir)
        val snap = Tables.customer(s, dir).select(
          col("c_custkey").as("k"),
          when(col("c_custkey") % 10 === 3, concat(col("c_mktsegment"), lit("_V2")))
            .otherwise(col("c_mktsegment")).as("new_segment"))
        cur.join(snap, col("c_custkey") === col("k"), "inner")
          .filter(col("c_mktsegment") =!= col("new_segment"))
          .select(col("c_custkey"), col("c_mktsegment").as("old_segment"), col("new_segment"))
      },
      Some("""WITH snap AS (SELECT c_custkey AS k,
             |  CASE WHEN c_custkey % 10 = 3 THEN c_mktsegment || '_V2' ELSE c_mktsegment END AS new_segment
             |  FROM customer)
             |SELECT c_custkey, c_mktsegment AS old_segment, new_segment
             |FROM customer JOIN snap ON c_custkey = k
             |WHERE c_mktsegment <> new_segment""".stripMargin)),

    // ---- J3: anti-join (NOT EXISTS — new-row detection) ----
    "j3_anti_join" -> QDef(
      (s, dir) => Tables.customer(s, dir)
        .join(Tables.orders(s, dir).select(col("o_custkey")), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name")),
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin)),

    // ---- J4: semi-join (EXISTS — delete propagation check) ----
    "j4_semi_join" -> QDef(
      (s, dir) => Tables.customer(s, dir)
        .join(Tables.orders(s, dir).filter(col("o_orderstatus") === "F").select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_mktsegment")),
      Some("""SELECT c_custkey, c_mktsegment FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')""".stripMargin)),

    // ---- J5: inner equi-join + filter + count (delete match count) ----
    "j5_inner_join" -> QDef(
      (s, dir) => Tables.lineitem(s, dir)
        .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"), "inner")
        .filter(col("l_returnflag") === "R")
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("n_returned")),
      Some("""SELECT s_name, count(*) AS n_returned
             |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             |WHERE l_returnflag = 'R' GROUP BY s_name""".stripMargin)),

    // ---- A2: per-entity aggregate + CASE tier bucketing ----
    "a2_tier_bucketing" -> QDef(
      (s, dir) => Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(
          count(lit(1)).as("order_count"),
          min(col("o_orderdate")).as("first_order"),
          max(col("o_orderdate")).as("last_order"),
          round(sum(col("o_totalprice")), 2).as("lifetime_value"),
          max(when(col("o_orderstatus") === "O", 1).otherwise(0)).cast("int").as("has_open"))
        .withColumn("tier",
          when(col("order_count") >= 20, "Platinum")
            .when(col("order_count") >= 15, "Gold")
            .when(col("order_count") >= 10, "Silver")
            .otherwise("Bronze")),
      Some("""SELECT o_custkey,
             |  CAST(count(*) AS BIGINT) AS order_count,
             |  min(o_orderdate) AS first_order,
             |  max(o_orderdate) AS last_order,
             |  round(sum(o_totalprice), 2) AS lifetime_value,
             |  CAST(max(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS INT) AS has_open,
             |  CASE WHEN count(*) >= 20 THEN 'Platinum'
             |       WHEN count(*) >= 15 THEN 'Gold'
             |       WHEN count(*) >= 10 THEN 'Silver'
             |       ELSE 'Bronze' END AS tier
             |FROM orders GROUP BY o_custkey""".stripMargin)),

    // ---- A3: COUNT(DISTINCT) + MAX per group ----
    "a3_count_distinct" -> QDef(
      (s, dir) => Tables.orders(s, dir)
        .groupBy(col("o_orderpriority"))
        .agg(countDistinct(col("o_custkey")).as("n_customers"),
          max(col("o_orderdate")).as("last_order")),
      Some("""SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_customers,
             |  max(o_orderdate) AS last_order
             |FROM orders GROUP BY o_orderpriority""".stripMargin)),

    // ---- A4: SELECT DISTINCT ----
    "a4_distinct" -> QDef(
      (s, dir) => Tables.orders(s, dir)
        .select(col("o_orderpriority"), col("o_orderstatus")).distinct(),
      Some("SELECT DISTINCT o_orderpriority, o_orderstatus FROM orders")),

    // ---- A5: conditional counts (SUM(CASE WHEN ...)) ----
    "a5_conditional_counts" -> QDef(
      (s, dir) => Tables.orders(s, dir).agg(
        sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).cast("long").as("n_finished"),
        sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).cast("long").as("n_open"),
        sum(when(col("o_totalprice") > 300000, 1).otherwise(0)).cast("long").as("n_large"),
        sum(when(col("o_custkey").isNull, 1).otherwise(0)).cast("long").as("n_null_cust")),
      Some("""SELECT
             |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
             |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
             |  CAST(sum(CASE WHEN o_totalprice > 300000 THEN 1 ELSE 0 END) AS BIGINT) AS n_large,
             |  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_cust
             |FROM orders""".stripMargin)),

    // ---- A6: summary statistics (A1 scalar count included) ----
    "a6_summary_stats" -> QDef(
      (s, dir) => Tables.lineitem(s, dir).agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        countDistinct(col("l_partkey")).as("n_parts"),
        round(sum(col("l_extendedprice")), 2).as("total_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty")),
      Some("""SELECT count(*) AS n_rows,
             |  count(DISTINCT l_orderkey) AS n_orders,
             |  count(DISTINCT l_partkey) AS n_parts,
             |  round(sum(l_extendedprice), 2) AS total_price,
             |  round(avg(l_quantity), 4) AS avg_qty
             |FROM lineitem""".stripMargin)),

    // ---- A7: watermark computation (GREATEST(MAX,MAX), COALESCE(MAX,0)) ----
    "a7_watermark_agg" -> QDef(
      (s, dir) => Tables.orders(s, dir)
        .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
        .agg(
          greatest(max(col("o_orderdate")), max(col("l_shipdate"))).as("watermark"),
          coalesce(max(col("o_custkey")), lit(0L)).as("max_key")),
      Some("""SELECT greatest(max(o_orderdate), max(l_shipdate)) AS watermark,
             |  coalesce(max(o_custkey), 0) AS max_key
             |FROM orders JOIN lineitem ON o_orderkey = l_orderkey""".stripMargin)),

    // ---- A8: GROUP BY ... HAVING (duplicate detection shape) ----
    "a8_having" -> QDef(
      (s, dir) => Tables.orders(s, dir)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
        .filter(col("n") > 15),
      Some("""SELECT o_custkey, count(*) AS n FROM orders
             |GROUP BY o_custkey HAVING count(*) > 15""".stripMargin)),

    // ---- W1: exact-duplicate drop (hash-agg, not window sort) ----
    "w1_dedup_exact" -> QDef(
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val withDups = o.unionByName(o.filter(col("o_orderkey") % 5 === 0))
        Dedup.exact(withDups, withDups.columns.toSeq)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"), col("o_totalprice"))
      },
      Some("""SELECT DISTINCT o_orderkey, o_custkey, o_orderstatus, o_totalprice
             |FROM (SELECT * FROM orders
             |      UNION ALL SELECT * FROM orders WHERE o_orderkey % 5 = 0)""".stripMargin)),

    // ---- W2: latest-version dedup (scale path: hash-agg max_by) ----
    "w2_latest_version" -> QDef(
      (s, dir) => {
        // latest event per user; tie-break smallest event_id (ts is the
        // raw nanosecond long — no conversion needed to order)
        val raw = events(s, dir).drop("ev_ts")
        Dedup.latestVersionAgg(raw, Seq("user_id"),
            struct(col("ts"), negate(col("event_id"))))
          .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
      },
      Some("""SELECT user_id, event_id, event_type, value FROM (
             |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id ASC) AS rn
             |  FROM events) WHERE rn = 1""".stripMargin)),

    // ---- W3: surrogate key generation (global ROW_NUMBER + base) ----
    "w3_surrogate_keys" -> QDef(
      (s, dir) => {
        val dims = Tables.orders(s, dir).select(col("o_orderpriority").as("priority")).distinct()
        SurrogateKeys.byOrder(dims, "priority_key", Seq(col("priority")), base = 100L)
          .select(col("priority_key"), col("priority"))
      },
      Some("""SELECT CAST(row_number() OVER (ORDER BY priority) + 100 AS BIGINT) AS priority_key, priority
             |FROM (SELECT DISTINCT o_orderpriority AS priority FROM orders)""".stripMargin)),

    // ---- W4: attribute pick (latest row per key by date, count) ----
    "w4_attribute_pick" -> QDef(
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").desc, col("o_orderkey").asc)
        Tables.orders(s, dir)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("o_custkey"), col("o_orderkey").as("latest_order"),
            col("o_orderstatus").as("latest_status"))
      },
      Some("""SELECT o_custkey, o_orderkey AS latest_order, o_orderstatus AS latest_status FROM (
             |  SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey ASC) AS rn
             |  FROM orders) WHERE rn = 1""".stripMargin)),

    // ---- W5: LAG — status-transition audit ----
    "w5_lag_transitions" -> QDef(
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        Tables.orders(s, dir)
          .withColumn("prev_status", lag(col("o_orderstatus"), 1).over(w))
          .filter(col("prev_status").isNotNull && col("prev_status") =!= col("o_orderstatus"))
          .select(col("o_custkey"), col("o_orderkey"),
            concat(col("prev_status"), lit("->"), col("o_orderstatus")).as("transition"))
      },
      Some("""SELECT o_custkey, o_orderkey, prev_status || '->' || o_orderstatus AS transition FROM (
             |  SELECT *, lag(o_orderstatus) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS prev_status
             |  FROM orders)
             |WHERE prev_status IS NOT NULL AND prev_status <> o_orderstatus""".stripMargin)),

    // ---- O1: top-1 watermark lookup (TakeOrderedAndProject) ----
    "o1_top1" -> QDef(
      (s, dir) => Tables.orders(s, dir)
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
        .limit(1)
        .select(col("o_orderkey"), col("o_orderdate")),
      Some("""SELECT o_orderkey, o_orderdate FROM orders
             |ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1""".stripMargin)),

    // ---- O2/O3: top-k sample with total ordering ----
    "o2_topk" -> QDef(
      (s, dir) => Tables.orders(s, dir)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(5)
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("o_totalprice")),
      Some("""SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 5""".stripMargin)),

    // ---- set op: UNION ALL of two aggregate branches ----
    "set1_union_all" -> QDef(
      (s, dir) => {
        val byStatus = Tables.orders(s, dir).groupBy(col("o_orderstatus").as("key"))
          .agg(count(lit(1)).as("n")).withColumn("branch", lit("status"))
        val byPrio = Tables.orders(s, dir).groupBy(col("o_orderpriority").as("key"))
          .agg(count(lit(1)).as("n")).withColumn("branch", lit("priority"))
        byStatus.unionByName(byPrio)
      },
      Some("""SELECT o_orderstatus AS key, count(*) AS n, 'status' AS branch FROM orders GROUP BY o_orderstatus
             |UNION ALL
             |SELECT o_orderpriority AS key, count(*) AS n, 'priority' AS branch FROM orders GROUP BY o_orderpriority""".stripMargin)),

    // ---- set2: INTERSECT / EXCEPT (the reference stops at UNION ALL —
    //      §2.8; these complete the set-op surface). Both are DISTINCT
    //      set semantics in Spark and DuckDB: one hash-dedup aggregate
    //      per side + a hash semi/anti join on the full row — no sort.
    //      part keys never ordered (EXCEPT) vs ordered (INTERSECT). ----
    "set2_intersect_except" -> QDef(
      (s, dir) => {
        val p = Tables.part(s, dir).select(col("p_partkey").as("pk"))
        val l = Tables.lineitem(s, dir).select(col("l_partkey").as("pk"))
        p.intersect(l).withColumn("op", lit("ordered"))
          .unionByName(p.except(l).withColumn("op", lit("never_ordered")))
      },
      Some("""SELECT pk, 'ordered' AS op FROM
             |  (SELECT p_partkey AS pk FROM part INTERSECT SELECT l_partkey FROM lineitem)
             |UNION ALL
             |SELECT pk, 'never_ordered' AS op FROM
             |  (SELECT p_partkey AS pk FROM part EXCEPT SELECT l_partkey FROM lineitem)""".stripMargin)),

    // ---- w8: moving aggregate with an explicit frame spec (the
    //      reference's window surface stops at ROW_NUMBER/LAG — §2.6;
    //      this adds ROWS BETWEEN). 4-day trailing average over the
    //      per-(priority, day) totals: the frame is deterministic
    //      because (priority, date) is unique after the pre-aggregate —
    //      a frame over raw rows with tied timestamps would not be.
    //      Partitioned by priority, so the window never funnels the
    //      table through one task. ----
    "w8_moving_avg" -> QDef(
      (s, dir) => {
        // integer-cent arithmetic end-to-end: a double round() of the
        // windowed average lands on exact .005 halves (cent sums over
        // frames of 2/4 rows) that Spark (HALF_UP on the binary value)
        // and DuckDB (scale-multiply then half-away) resolve
        // differently — observed 6e-8 rel drift. Cent sums are exact
        // BIGINTs and the half-up division (2*wc + n) div (2*n) is
        // bit-identical everywhere; /100.0 at the end is exact at cent
        // precision
        val daily = Tables.orders(s, dir)
          .groupBy(col("o_orderpriority"), col("o_orderdate"))
          .agg(round(sum(col("o_totalprice")) * 100).cast("long").as("cents"))
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_orderdate")).rowsBetween(-3, Window.currentRow)
        daily.select(col("o_orderpriority"), col("o_orderdate"),
            (col("cents") / 100.0).as("day_total"),
            sum(col("cents")).over(w).as("wc"),
            count(lit(1)).over(w).as("n_window"))
          .withColumn("ma4",
            expr("(2 * wc + n_window) div (2 * n_window)") / 100.0)
          .select(col("o_orderpriority"), col("o_orderdate"), col("day_total"),
            col("ma4"), col("n_window"))
      },
      Some("""WITH daily AS (SELECT o_orderpriority, o_orderdate,
             |    CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS cents
             |  FROM orders GROUP BY 1, 2),
             |win AS (SELECT o_orderpriority, o_orderdate, cents / 100.0 AS day_total,
             |  CAST(sum(cents) OVER (PARTITION BY o_orderpriority ORDER BY o_orderdate
             |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT) AS wc,
             |  count(*) OVER (PARTITION BY o_orderpriority ORDER BY o_orderdate
             |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS n_window
             |  FROM daily)
             |SELECT o_orderpriority, o_orderdate, day_total,
             |  ((2 * wc + n_window) // (2 * n_window)) / 100.0 AS ma4, n_window
             |FROM win""".stripMargin)),

    // ---- S4: date spine (sequence/explode replaces driver-side VALUES) ----
    "s4_date_spine" -> QDef(
      (s, dir) => DateSpine.dimDate(s, "2023-01-01", "2028-12-31"),
      Some("""SELECT CAST(strftime(d, '%Y%m%d') AS INT) AS date_key,
             |  d AS full_date,
             |  CAST(year(d) AS INT) AS year, CAST(quarter(d) AS INT) AS quarter,
             |  CAST(month(d) AS INT) AS month, monthname(d) AS month_name,
             |  CAST(day(d) AS INT) AS day, CAST(dayofweek(d) + 1 AS INT) AS day_of_week,
             |  dayname(d) AS day_name, CAST(dayofyear(d) AS INT) AS day_of_year,
             |  dayofweek(d) IN (0, 6) AS is_weekend
             |FROM (SELECT unnest(generate_series(DATE '2023-01-01', DATE '2028-12-31', INTERVAL 1 DAY))::DATE AS d)""".stripMargin)),

    // ---- scalar functions: date/time family ----
    "f1_datetime" -> QDef(
      (s, dir) => Tables.orders(s, dir).select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        quarter(col("o_orderdate")).as("q"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        dayofweek(col("o_orderdate")).as("dow"),
        dayofyear(col("o_orderdate")).as("doy"),
        date_format(col("o_orderdate"), "EEEE").as("day_name"),
        date_format(col("o_orderdate"), "yyyyMMdd").cast("int").as("date_key"),
        date_add(to_date(col("o_orderdate")), 7).as("plus_week")),
      Some("""SELECT o_orderkey,
             |  CAST(year(o_orderdate) AS INT) AS y, CAST(quarter(o_orderdate) AS INT) AS q,
             |  CAST(month(o_orderdate) AS INT) AS m, CAST(day(o_orderdate) AS INT) AS d,
             |  CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
             |  CAST(dayofyear(o_orderdate) AS INT) AS doy,
             |  dayname(o_orderdate) AS day_name,
             |  CAST(strftime(o_orderdate, '%Y%m%d') AS INT) AS date_key,
             |  CAST(o_orderdate AS DATE) + 7 AS plus_week
             |FROM orders""".stripMargin)),

    // ---- scalar functions: string family ----
    "f2_string" -> QDef(
      (s, dir) => Tables.customer(s, dir).select(
        col("c_custkey"),
        substring(col("c_name"), 10, 5).as("name_tail"),
        upper(col("c_mktsegment")).as("seg_upper"),
        lower(col("c_mktsegment")).as("seg_lower"),
        length(col("c_name")).as("name_len"),
        concat_ws("|", col("c_name"), col("c_mktsegment")).as("joined"),
        expr("replace(c_name, 'Customer#', 'C')").as("short_name"),
        col("c_name").like("Customer#%1").as("ends_in_1")),
      Some("""SELECT c_custkey,
             |  substring(c_name, 10, 5) AS name_tail,
             |  upper(c_mktsegment) AS seg_upper, lower(c_mktsegment) AS seg_lower,
             |  CAST(length(c_name) AS INT) AS name_len,
             |  concat_ws('|', c_name, c_mktsegment) AS joined,
             |  replace(c_name, 'Customer#', 'C') AS short_name,
             |  c_name LIKE 'Customer#%1' AS ends_in_1
             |FROM customer""".stripMargin)),

    // ---- scalar functions: conditional / null family ----
    "f3_conditional" -> QDef(
      (s, dir) => Tables.customer(s, dir).select(
        col("c_custkey"),
        when(col("c_acctbal") < 0, "NEGATIVE")
          .when(col("c_acctbal") < 5000, "LOW").otherwise("HIGH").as("bal_band"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER")).as("seg_or_other"),
        greatest(col("c_acctbal"), lit(0.0)).as("bal_floor"),
        least(col("c_acctbal"), lit(1000.0)).as("bal_cap"),
        col("c_nationkey").isNull.as("nation_missing")),
      Some("""SELECT c_custkey,
             |  CASE WHEN c_acctbal < 0 THEN 'NEGATIVE' WHEN c_acctbal < 5000 THEN 'LOW' ELSE 'HIGH' END AS bal_band,
             |  coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
             |  greatest(c_acctbal, 0.0) AS bal_floor,
             |  least(c_acctbal, 1000.0) AS bal_cap,
             |  c_nationkey IS NULL AS nation_missing
             |FROM customer""".stripMargin)),

    // ---- scalar functions: math family (typed NULL literals included) ----
    "f4_math" -> QDef(
      (s, dir) => Tables.lineitem(s, dir).select(
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        (col("l_extendedprice") - col("l_extendedprice") * col("l_discount")).as("discounted"),
        floor(col("l_extendedprice")).cast("long").as("price_floor"),
        ceil(col("l_extendedprice")).cast("long").as("price_ceil"),
        abs(col("l_discount") - 0.05).as("disc_dev"),
        (col("l_orderkey") % 97).as("bucket"),
        lit(null).cast("double").as("placeholder_measure"),
        lit(null).cast("string").as("placeholder_label")),
      Some("""SELECT l_orderkey, l_linenumber, l_partkey,
             |  l_extendedprice - l_extendedprice * l_discount AS discounted,
             |  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
             |  CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
             |  abs(l_discount - 0.05) AS disc_dev,
             |  l_orderkey % 97 AS bucket,
             |  CAST(NULL AS DOUBLE) AS placeholder_measure,
             |  CAST(NULL AS VARCHAR) AS placeholder_label
             |FROM lineitem""".stripMargin)),

    // ---- S2/S9: table scan via temp view + SQL (segment revenue rollup) ----
    "s2_sql_over_view" -> QDef(
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("orders_v")
        Tables.customer(s, dir).createOrReplaceTempView("customer_v")
        s.sql("""SELECT c_mktsegment, count(*) AS n_orders,
                |  round(sum(o_totalprice), 2) AS revenue
                |FROM orders_v JOIN customer_v ON o_custkey = c_custkey
                |GROUP BY c_mktsegment""".stripMargin)
      },
      Some("""SELECT c_mktsegment, count(*) AS n_orders,
             |  round(sum(o_totalprice), 2) AS revenue
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment""".stripMargin)),

    // ---- er1: blocked ENTITY RESOLUTION / fuzzy match — the classic
    //      record-linkage shape at scale: a dirty probe side (here a
    //      deterministic single-char deletion of each part name, so the
    //      planted truth is known) matches the clean reference by
    //      edit distance, WITHOUT an all-pairs compare. Blocking =
    //      the UNION of two redundant equi-keys — 2-char prefix and
    //      2-char suffix — with candidate pairs deduped before the
    //      verify (one edit anywhere can break at most ONE of the two
    //      keys, so single-edit recall is complete wherever the edit
    //      lands; a real corpus would add a phonetic key for the
    //      two-edits-at-both-ends residue). Inside blocks: a ±2 length
    //      band, then levenshtein; the best match per probe packs
    //      (lev, key) into ONE BIGINT so the pick is a plain long-min
    //      HashAggregate (map-side combinable, stays in codegen — a
    //      struct min falls to SortAggregate; bound guarded like
    //      packedOcc, match_key must fit 48 bits). No window, no
    //      join-back: match_name is derivable by key. Candidate count
    //      is block-bounded (sum over the redundant keys), never
    //      |dirty|x|clean| — the candidates-then-exact-verify shape of
    //      d2/d3. Er1Spec proves the recall claim: a corruption at
    //      character 1 (which breaks the prefix block) still matches
    //      via the suffix key. ----
    "er1_fuzzy_match" -> QDef(
      (s, dir) => {
        val clean = Tables.part(s, dir).select(col("p_partkey"), col("p_name"))
        val dirty = clean.select(col("p_partkey").as("probe_key"),
          concat(substring(col("p_name"), 1, 2), expr("substring(p_name, 4)"))
            .as("probe_name"))
        er1Core(clean, dirty)
      },
      Some("""WITH clean AS (SELECT p_partkey, p_name FROM part),
             |dirty AS (SELECT p_partkey AS probe_key,
             |    substr(p_name, 1, 2) || substr(p_name, 4) AS probe_name FROM clean),
             |cand AS (SELECT DISTINCT d.probe_key, d.probe_name, c.p_partkey, c.p_name
             |  FROM dirty d JOIN clean c
             |    ON substr(d.probe_name, 1, 2) = substr(c.p_name, 1, 2)
             |    OR right(d.probe_name, 2) = right(c.p_name, 2)),
             |scored AS (SELECT probe_key, probe_name, p_partkey,
             |    levenshtein(probe_name, p_name) AS lev
             |  FROM cand
             |  WHERE abs(len(p_name) - len(probe_name)) <= 2
             |    AND levenshtein(probe_name, p_name) <= 2),
             |best AS (SELECT probe_key, probe_name,
             |    CAST(min(lev * 281474976710656 + p_partkey) AS BIGINT) AS pk
             |  FROM scored GROUP BY 1, 2)
             |SELECT probe_key, probe_name,
             |  CAST(pk % 281474976710656 AS BIGINT) AS match_key,
             |  CAST(pk // 281474976710656 AS INT) AS lev
             |FROM best""".stripMargin)),

    // ---- er2: fuzzy ENTITY DEDUP (er1's clustering twin): merge all
    //      records whose names are transitively within edit distance 1.
    //      The scale-critical altitude choice: the fuzzy graph is built
    //      over DISTINCT NAMES (vocabulary-sized — here ≤128 nodes;
    //      name-value dedup, the shape record-linkage systems actually
    //      run), never over record pairs, so the blocked lev join and
    //      the label propagation cost O(|vocab|²-per-block) while the
    //      record table only ever sees two vocabulary-sized hash joins.
    //      Same min-label propagation as d5 (labels = name strings,
    //      lexicographic min, ≤20 bounded iterations, eager
    //      checkpoints); the oracle replays the closure with a
    //      recursive CTE. Every record gets its cluster's canonical
    //      name and minimal entity id — singleton names canonicalize
    //      to themselves. ----
    "er2_fuzzy_dedup" -> QDef(
      (s, dir) => {
        val clean = Tables.part(s, dir)
          .select(col("p_partkey").as("eid"), col("p_name").as("nm"))
        val dirty = clean.select((col("eid") + 1000000L).as("eid"),
          concat(substring(col("nm"), 1, 2), expr("substring(nm, 4)")).as("nm"))
        val ents = clean.unionByName(dirty)
        val names = ents.select(col("nm")).distinct()
        // blocked fuzzy edges over the NAME vocabulary, both directions;
        // same redundant prefix+suffix key union as er1 (one edit can
        // break at most one of the two), candidate pairs deduped before
        // the lev verify
        def sides(key: Column => Column) = (
          names.select(col("nm").as("na"), key(col("nm")).as("blk")),
          names.select(col("nm").as("nb"), key(col("nm")).as("blk")))
        val pairs = Seq[Column => Column](n => substring(n, 1, 2), n => substring(n, -2, 2))
          .map { key =>
            val (l, r) = sides(key)
            l.join(r, Seq("blk")).filter(col("na") < col("nb"))
              .select(col("na"), col("nb"))
          }
          .reduce(_ unionByName _).distinct()
          .filter(abs(length(col("na")) - length(col("nb"))) <= 1)
          .filter(levenshtein(col("na"), col("nb")) <= 1)
        val edges = pairs
          .unionByName(pairs.select(col("nb").as("na"), col("na").as("nb")))
          .localCheckpoint()
        // min-label propagation, labels = the names themselves; init
        // from ALL names so singletons keep their own label
        var comp = names.select(col("nm"), col("nm").as("cl")).localCheckpoint()
        var converged = false
        var i = 0
        while (!converged && i < 20) {
          val nbrMin = edges
            .join(comp.select(col("nm").as("nb"), col("cl").as("nl")), Seq("nb"))
            .groupBy(col("na").as("nm")).agg(min(col("nl")).as("nmin"))
          val next = comp.join(nbrMin, Seq("nm"), "left_outer")
            .select(col("nm"),
              least(col("cl"), coalesce(col("nmin"), col("cl"))).as("cl"),
              col("cl").as("__prev"))
            .localCheckpoint() // eager: materializes before the count
          converged = next.filter(col("cl") =!= col("__prev")).count() == 0L
          comp = next.select("nm", "cl")
          i += 1
        }
        // records -> their name-cluster's canonical name + minimal eid
        val withCl = ents.join(comp, Seq("nm"))
        val canon = withCl.groupBy(col("cl")).agg(min(col("eid")).as("canonical_eid"))
        withCl.join(canon, Seq("cl"))
          .select(col("eid"), col("nm"), col("cl").as("cluster_key"),
            col("canonical_eid"))
      },
      Some("""WITH RECURSIVE clean AS (SELECT p_partkey AS eid, p_name AS nm FROM part),
             |dirty AS (SELECT p_partkey + 1000000 AS eid,
             |    substr(p_name, 1, 2) || substr(p_name, 4) AS nm FROM part),
             |ents AS (SELECT * FROM clean UNION ALL SELECT * FROM dirty),
             |names AS (SELECT DISTINCT nm FROM ents),
             |pairs AS (SELECT DISTINCT l.nm AS na, r.nm AS nb FROM names l JOIN names r
             |    ON (substr(l.nm, 1, 2) = substr(r.nm, 1, 2)
             |        OR right(l.nm, 2) = right(r.nm, 2)) AND l.nm < r.nm
             |   AND abs(len(l.nm) - len(r.nm)) <= 1
             |  WHERE levenshtein(l.nm, r.nm) <= 1),
             |edges AS (SELECT na, nb FROM pairs UNION SELECT nb, na FROM pairs),
             |reach(na, nb) AS (SELECT na, nb FROM edges
             |    UNION SELECT r.na, e.nb FROM reach r JOIN edges e ON r.nb = e.na
             |    WHERE e.nb <> r.na),
             |labels AS (SELECT n.nm,
             |    coalesce(least(n.nm, r.mn), n.nm) AS cl
             |  FROM names n LEFT JOIN
             |    (SELECT na, min(nb) AS mn FROM reach GROUP BY na) r ON n.nm = r.na),
             |withcl AS (SELECT e.eid, e.nm, l.cl FROM ents e JOIN labels l USING (nm)),
             |canon AS (SELECT cl, CAST(min(eid) AS BIGINT) AS canonical_eid
             |          FROM withcl GROUP BY cl)
             |SELECT eid, nm, cl AS cluster_key, canonical_eid
             |FROM withcl JOIN canon USING (cl)""".stripMargin))
  )
}
