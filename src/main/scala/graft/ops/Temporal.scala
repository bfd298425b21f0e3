package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators as reusable library surface — the two join
  * shapes Spark has no physical operator for, in their scale-safe
  * formulations (no |L| x |R| anywhere):
  *
  *  - [[asofJoin]]: trades-and-quotes point-in-time lookup. NOT a join:
  *    union both sides, one window pass partitioned by the key carries
  *    the latest right-side payload forward onto each left row. One
  *    shuffle on the key, zero fan-out, any skew handled by AQE like
  *    any other window.
  *  - [[rangeJoin]]: interval-overlap join. Both sides bucket into
  *    fixed-width time bins (left rows expand to the <=2 bins their
  *    window can overlap), bins equi-join, and an exact residual filter
  *    keeps true matches — work is bounded by rows-per-bin.
  *
  * `x4_asof_join` / `x5_range_join` are the oracle-checked instances;
  * TemporalOpsSpec proves equivalence against naive formulations on
  * seeded random inputs.
  */
object Temporal {

  /** For each left row, attach the latest right-side `payload` columns
    * at-or-before the left row's time (per `on` key group; left rows
    * with no prior right row get nulls).
    *
    * `tieBreak`: right-side columns that make the pick deterministic
    * when several right rows share one timestamp (the LARGEST tie-break
    * wins, matching "ORDER BY ts DESC, tb DESC LIMIT 1").
    *
    * Left and right may have disjoint schemas apart from `on`; the
    * output carries every left column plus `payload`. */
  def asofJoin(left: DataFrame, right: DataFrame, on: Seq[String],
               leftTs: String, rightTs: String,
               payload: Seq[String], tieBreak: Seq[String] = Nil): DataFrame = {
    val leftCols = left.columns.toSeq
    require(payload.intersect(leftCols).isEmpty,
      s"payload collides with left columns: ${payload.intersect(leftCols).mkString(",")}")
    val tbNames = tieBreak.zipWithIndex.map { case (_, i) => s"__tb$i" }
    // align both sides on (on, __ts, __side, left..., payload..., tb...)
    val l = left.select(
      on.map(col) ++ Seq(col(leftTs).as("__ts"), lit(1).as("__side")) ++
        leftCols.filterNot(on.contains).map(col) ++
        payload.map(p => lit(null).as(p)) ++
        tbNames.map(n => lit(null).as(n)): _*)
    val r = right.select(
      on.map(col) ++ Seq(col(rightTs).as("__ts"), lit(0).as("__side")) ++
        leftCols.filterNot(on.contains).map(c => lit(null).as(c)) ++
        payload.map(col) ++
        tieBreak.zip(tbNames).map { case (c, n) => col(c).as(n) }: _*)
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col("__ts").asc +: col("__side").asc +: tbNames.map(col(_).asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the carry is ONE struct per right row, not per-column: a struct is
    // non-null even when every field is null, so ignoreNulls skips only
    // left rows (the `when` yields null there) — a legitimately-NULL
    // payload value on the latest quote is carried as NULL instead of
    // resurrecting an older row's value, and multi-column payloads can
    // never mix fields from different right rows
    val carried = l.unionByName(r).withColumn("__carry",
      last(when(col("__side") === 0, struct(payload.map(col): _*)),
        ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col("__carry").getField(p).as(p)): _*)
  }

  /** Pairs (left, right) with `right.ts` in `[left.ts + lower,
    * left.ts + upper)` — time units are whatever the (numeric) ts
    * columns carry. Output: every left column + every right column
    * (schemas must not collide). */
  def rangeJoin(left: DataFrame, right: DataFrame,
                leftTs: String, rightTs: String,
                lower: Long, upper: Long): DataFrame = {
    require(upper > lower, "empty window")
    val clash = left.columns.toSet.intersect(right.columns.toSet)
    require(clash.isEmpty, s"column collision: ${clash.mkString(",")}")
    val w = upper - lower
    // FLOOR division (`div` truncates toward zero, which would misalign
    // bins when ts + lower goes negative) — applied identically on both
    // sides so bin ids always agree
    def fdiv(e: String) =
      s"((($e) div ${w}L) - (CASE WHEN ($e) % ${w}L < 0 THEN 1 ELSE 0 END))"
    // a width-w window overlaps at most 2 width-w bins
    val l = left.withColumn("__bin", explode(expr(
      s"sequence(${fdiv(s"$leftTs + ${lower}L")}, ${fdiv(s"$leftTs + ${upper}L - 1")})")))
    val r = right.withColumn("__bin", expr(fdiv(rightTs)))
    l.join(r, Seq("__bin"))
      .filter(col(rightTs) >= col(leftTs) + lower && col(rightTs) < col(leftTs) + upper)
      .drop("__bin")
  }
}
