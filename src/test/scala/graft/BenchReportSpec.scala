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
      sfDir = "/root/testdata/sf0.1")
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
}
