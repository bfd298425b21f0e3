package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Cross-round bench comparison by RATIO DISTRIBUTION, not raw walls.
  *
  * The r11 bench-drift investigation (PLANS.md) showed the blind spot
  * of absolute comparisons: a box running uniformly ~8% slower moves
  * every query's wall, and relative canary thresholds can't see it
  * (p25 of a uniformly slow trail is itself slow). The robust signal
  * is the PER-QUERY RATIO distribution between two runs — environment
  * drift moves the whole distribution (median != 1), a real regression
  * is an OUTLIER against that median.
  *
  * Run: sbt "runMain graft.tools.BenchCompare BENCH_FULL_r10.json BENCH_FULL.json"
  * Prints: the median ratio (the environment factor), the ratio spread,
  * and every query whose median-normalized ratio leaves [1/thr, thr]
  * (default 1.3) — those are the attributable deltas worth chasing.
  *
  * No Spark, no deps: parses just the flat "queries":{"name":sec,...}
  * object with the same minimal scanning MiniJson-style approach used
  * by the bench artifact itself (values are plain JSON numbers).
  */
object BenchCompare {
  def queriesOf(path: String): Map[String, Double] = {
    val txt = new String(Files.readAllBytes(Paths.get(path)), StandardCharsets.UTF_8)
    // BENCH_FULL carries "timings"; the driver's BENCH_rN line "queries"
    val start = Seq("\"timings\"", "\"queries\"").map(txt.indexOf).find(_ >= 0).getOrElse(-1)
    require(start >= 0, s"$path has neither a \"timings\" nor a \"queries\" object")
    val open = txt.indexOf('{', start)
    // walk to the matching close brace; query values may be numbers or
    // nested objects (BENCH_FULL's {"sec":..,"first_pass":..} pairs)
    var depth = 0; var i = open; var end = -1
    while (end < 0 && i < txt.length) {
      txt.charAt(i) match {
        case '{' => depth += 1
        case '}' => depth -= 1; if (depth == 0) end = i
        case _ =>
      }
      i += 1
    }
    val body = txt.substring(open + 1, end)
    val entry = """"([A-Za-z0-9_]+)"\s*:\s*(\{[^{}]*\}|[-0-9.eE]+)""".r
    entry.findAllMatchIn(body).flatMap { m =>
      val (name, v) = (m.group(1), m.group(2))
      val sec =
        if (v.startsWith("{")) // nested record: take its "sec" field
          """"sec"\s*:\s*([-0-9.eE]+)""".r.findFirstMatchIn(v).map(_.group(1))
        else Some(v)
      sec.flatMap(s => scala.util.Try(s.toDouble).toOption).map(name -> _)
    }.toMap
  }

  /** One outlier row: (query, before, after, ratio, median-normalized). */
  final case class Outlier(q: String, before: Double, after: Double,
                           ratio: Double, normalized: Double)
  /** The ratio-distribution summary vs a previous run. */
  final case class Comparison(prev: String, n: Int, envFactor: Double,
                              p25: Double, p75: Double, outliers: Seq[Outlier])

  /** Compare `after` against the artifact at `prevPath`; None when the
    * artifacts share no nonzero-baseline query. */
  def compare(prevPath: String, after: Map[String, Double],
              thr: Double = 1.3): Option[Comparison] = {
    val before = queriesOf(prevPath)
    // both sides must be > 0: a 0.0 `after` (a skipped/failed timing
    // that leaked into the map) would zero the median and turn every
    // normalized ratio into unquoted NaN/Infinity — malformed JSON
    // inside bench_full.json that Bench's Try wrapper can't catch
    val common = (before.keySet intersect after.keySet).toSeq.sorted
      .filter(q => before(q) > 0.0 && after(q) > 0.0)
    if (common.isEmpty) return None
    val ratios = common.map(q => q -> after(q) / before(q)).sortBy(_._2)
    val rs = ratios.map(_._2)
    def pct(p: Double) = rs(math.min(rs.size - 1, (p * (rs.size - 1)).round.toInt))
    val med = pct(0.5)
    if (!(med > 0.0)) return None
    val outliers = ratios.map { case (q, r) => Outlier(q, before(q), after(q), r, r / med) }
      .filter(o => o.normalized > thr || o.normalized < 1.0 / thr)
      .sortBy(-_.normalized)
    Some(Comparison(prevPath, ratios.size, med, pct(0.25), pct(0.75), outliers))
  }

  /** The `"compare"` block Bench embeds in bench_full.json (r11 VERDICT
    * #7): cross-round comparisons should quote the ratio DISTRIBUTION —
    * a uniform environment slowdown self-reports as env_factor != 1
    * with no outliers, and a real regression is a named outlier — so
    * the artifact carries its own drift analysis instead of leaving it
    * to a later investigation. */
  def comparisonJson(prevPath: String, after: Map[String, Double],
                     thr: Double = 1.3): Option[String] =
    compare(prevPath, after, thr).map { c =>
      def f(d: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
      val outs = c.outliers.map(o =>
        s""""${o.q}":{"before":${f(o.before)},"after":${f(o.after)},""" +
          s""""ratio":${f(o.ratio)},"normalized":${f(o.normalized)}}""")
        .mkString("{", ",", "}")
      s"""{"prev":"${c.prev}","queries":${c.n},"env_factor":${f(c.envFactor)},""" +
        s""""p25":${f(c.p25)},"p75":${f(c.p75)},"threshold":$thr,""" +
        s""""outliers":$outs}"""
    }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: BenchCompare <before.json> <after.json> [threshold]")
    val thr = args.lift(2).map(_.toDouble).getOrElse(1.3)
    val before = queriesOf(args(0))
    val after = queriesOf(args(1))
    val common = (before.keySet intersect after.keySet).toSeq.sorted
    val onlyB = before.keySet -- after.keySet
    val onlyA = after.keySet -- before.keySet
    if (onlyB.nonEmpty) println(s"dropped since before: ${onlyB.toSeq.sorted.mkString(", ")}")
    if (onlyA.nonEmpty) println(s"new since before: ${onlyA.toSeq.sorted.mkString(", ")}")
    require(common.nonEmpty,
      s"the artifacts share no query names — comparing different " +
        s"generations? (${args(0)}: ${before.size} queries, " +
        s"${args(1)}: ${after.size})")
    // a 0.0 'before' wall would poison the median with Infinity ratios
    val zeroed = common.filter(before(_) <= 0.0)
    if (zeroed.nonEmpty)
      println(s"skipping zero-baseline queries: ${zeroed.mkString(", ")}")
    val ratios = common.filterNot(zeroed.toSet)
      .map(q => q -> after(q) / before(q)).sortBy(_._2)
    require(ratios.nonEmpty, "every common query has a zero baseline")
    val rs = ratios.map(_._2)
    def pct(p: Double) = rs(math.min(rs.size - 1, (p * (rs.size - 1)).round.toInt))
    val med = pct(0.5)
    println(f"queries=${ratios.size} env_factor(median ratio)=$med%.3f " +
      f"p25=${pct(0.25)}%.3f p75=${pct(0.75)}%.3f")
    val outliers = ratios.map { case (q, r) => (q, r, r / med) }
      .filter { case (_, _, n) => n > thr || n < 1.0 / thr }
    if (outliers.isEmpty)
      println(s"no per-query delta beyond ${thr}x of the environment factor")
    else {
      println(f"median-normalized outliers (beyond $thr%.2fx):")
      outliers.sortBy(-_._3).foreach { case (q, r, n) =>
        println(f"  $q%-34s ${before(q)}%7.2f -> ${after(q)}%7.2f s  " +
          f"ratio=$r%.2f normalized=$n%.2f")
      }
    }
  }
}
