package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.MiniJson

/** The bench stdout line is the driver's ONLY parse surface for a
  * round's headline timings, and it rides a ~2.5 KB tail buffer:
  * BENCH_r01/r02 lost their rounds to over-long lines, and BENCH_r09
  * (`parsed: null`) proved the CONTENDED case — the capped suspect/
  * remeasured lists plus two 40-entry canary arrays still overflowed
  * exactly when the artifact mattered most. This spec pins the
  * WORST-CASE line (every field at its maximum plausible width) under
  * 2,000 bytes, so no run condition can truncate the round's record
  * again. */
class BenchReportSpec extends AnyFunSuite {

  private def worstLine(): String = {
    // headline names at their REAL widths — plus slack: if the map ever
    // grows past 30 entries or names past 40 chars, the size assertion
    // below fails before the driver's buffer does
    val longest = Bench.headline.map(_.length).max
    assert(Bench.headline.size <= 30, "headline map grew past its budget")
    assert(longest <= 28, "a headline name outgrew its width budget — " +
      "re-check the worst-case line length before widening this")
    val head = (0 until 30).map(i => f"q${i}%02d_${"x" * 24}" -> 99999.999)
    Bench.stdoutLine(
      total = 999999.999,
      head = head,
      queriesRun = 9999,
      // fully-failed run: the cap keeps 3 wide names + an overflow marker
      failedNames = (0 until 200).map(i => f"fail${i}%03d_${"y" * 34}"),
      unvalidatedN = 999,
      remeasuredN = 999,
      canaries = Seq(99999.999, 0.001),
      canariesIo = Seq(99999.999, 0.001),
      warmupSec = 99999.999,
      sfDir = "/root/testdata/sf0.1",
      authoritative = false)
  }

  test("worst-case stdout line stays under 2,000 bytes") {
    val line = worstLine()
    val n = line.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
    assert(n < 2000, s"stdout line is $n bytes — the driver tail buffer " +
      s"(~2.5 KB) truncates long lines and the round loses its bench record")
    assert(!line.contains("\n"), "must be ONE line")
  }

  test("worst-case line is valid JSON with the driver-contract fields") {
    val m = MiniJson.obj(worstLine())
    assert(m("metric") === "total")
    assert(m.contains("value") && m.contains("unit") && m.contains("sf"))
    val qs = m("queries").asInstanceOf[Map[String, Any]]
    assert(qs.size === 30)
    assert(m("failed_n") === 200d || m("failed_n") === 200L || m("failed_n") === 200)
    // counts-only for the unbounded sets: no list fields beyond the
    // capped `failed` names
    assert(!m.contains("suspect") && !m.contains("remeasured") &&
      !m.contains("canaries_sec") && !m.contains("canaries_io_sec"))
  }

  test("a clean ordinary line parses and carries the headline timings") {
    val line = Bench.stdoutLine(379.7, Seq("job_bronze_load" -> 5.381,
      "st15_stream_dedup_admission" -> 19.4), 193, Seq.empty, 0, 0,
      Seq(0.21, 0.35), Seq(0.042, 0.11), 12.3, "/root/testdata/sf0.1")
    val m = MiniJson.obj(line)
    val qs = m("queries").asInstanceOf[Map[String, Any]]
    assert(qs.keySet === Set("job_bronze_load", "st15_stream_dedup_admission"))
    assert(m("unvalidated_n") === 0d || m("unvalidated_n") === 0L || m("unvalidated_n") === 0)
  }

  test("authority gate: unvalidated survivors, a mostly-slow canary " +
      "trail, or a half-poisoned first pass all mark the record " +
      "non-authoritative with named reasons") {
    // clean run: authoritative, no reasons
    assert(Bench.authorityGate(0, 16, 0, 0, 215) === ((true, Seq.empty)))
    // a single passing spike (re-measured clean) stays authoritative
    assert(Bench.authorityGate(2, 16, 0, 8, 215)._1)
    // unvalidated survivors always poison the record
    val (a1, r1) = Bench.authorityGate(0, 16, 3, 0, 215)
    assert(!a1 && r1.exists(_.contains("never got a clean")))
    // the BENCH_r12 shape: trail violated at most probes, half the
    // suite re-measured — both reasons named
    val (a2, r2) = Bench.authorityGate(10, 16, 0, 125, 215)
    assert(!a2)
    assert(r2.exists(_.contains("canary floors violated at 10/16")))
    assert(r2.exists(_.contains("125/215")))
    // the verdict rides the stdout line AND bench_full
    val line = Bench.stdoutLine(100.0, Seq("a" -> 1.0), 10, Seq.empty,
      0, 0, Seq(0.2), Seq(0.05), 5.0, "sf", authoritative = false)
    assert(MiniJson.obj(line)("authoritative") === false)
  }

  test("bench_full compare block: env factor is the median ratio, " +
      "outliers are median-normalized, and it parses as JSON") {
    val prev = java.nio.file.Files.createTempFile("bench_prev", ".json")
    // 5 queries: four drift uniformly at 1.10x (environment), one
    // regresses 2.2x — the block must report env_factor ~1.10 and name
    // ONLY the regression
    java.nio.file.Files.write(prev,
      """{"timings":{"a":1.0,"b":2.0,"c":4.0,"d":8.0,"e":1.0},"failed":[]}"""
        .getBytes("UTF-8"))
    val after = Map("a" -> 1.1, "b" -> 2.2, "c" -> 4.4, "d" -> 8.8, "e" -> 2.2)
    val json = graft.tools.BenchCompare
      .comparisonJson(prev.toString, after).get
    val m = MiniJson.obj(json)
    assert(math.abs(m("env_factor").asInstanceOf[Double] - 1.1) < 1e-6)
    val outs = m("outliers").asInstanceOf[Map[String, Any]]
    assert(outs.keySet === Set("e"))
    val e = outs("e").asInstanceOf[Map[String, Any]]
    assert(math.abs(e("normalized").asInstanceOf[Double] - 2.0) < 1e-6)
    // no shared queries -> no block (never a crash in Bench's path)
    assert(graft.tools.BenchCompare
      .comparisonJson(prev.toString, Map("zz" -> 1.0)).isEmpty)
    // a 0.0 `after` timing (leaked skip/failure) must not zero the
    // median into NaN/Infinity — the query drops from the comparison
    // and the block stays valid JSON (r12 ADVICE)
    val withZero = graft.tools.BenchCompare.comparisonJson(prev.toString,
      Map("a" -> 0.0, "b" -> 2.2, "c" -> 4.4, "d" -> 8.8, "e" -> 1.1)).get
    assert(!withZero.contains("NaN") && !withZero.contains("Infinity"))
    assert(MiniJson.obj(withZero)("queries") === 4d ||
      MiniJson.obj(withZero)("queries") === 4L)
    // ALL-zero after -> no block at all rather than a division by zero
    assert(graft.tools.BenchCompare.comparisonJson(prev.toString,
      Map("a" -> 0.0, "b" -> 0.0)).isEmpty)
  }
}
