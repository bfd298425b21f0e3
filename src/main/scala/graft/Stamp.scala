package graft

import java.nio.file.{Files, Paths}

/** Provenance stamp for builder-emitted artifacts (bench_full.json, the
  * Bench stdout line, Verify's _meta.json): the commit the run was built
  * from plus a wall-clock timestamp, so a fresh artifact is
  * distinguishable from a stale or hand-edited one (r5/r6 ADVICE).
  * Reads .git directly — no subprocess, works in a bare sbt runMain. */
object Stamp {

  /** HEAD commit hash, or "unknown" outside a git checkout. */
  def commit: String =
    try {
      val head = Files.readString(Paths.get(".git/HEAD")).trim
      if (!head.startsWith("ref: ")) head
      else {
        val ref = head.drop(5)
        val loose = Paths.get(".git/" + ref)
        if (Files.exists(loose)) Files.readString(loose).trim
        else { // packed refs: "<hash> <refname>" lines
          val packed = Paths.get(".git/packed-refs")
          if (!Files.exists(packed)) "unknown"
          else Files.readAllLines(packed).stream()
            .filter(l => l.endsWith(" " + ref))
            .map[String](_.split(" ")(0)).findFirst().orElse("unknown")
        }
      }
    } catch { case _: Throwable => "unknown" }

  def ts: String = java.time.Instant.now().toString

  /** `"commit":"...","ts":"..."` — splice into a JSON object literal. */
  def jsonFields: String = s""""commit":"$commit","ts":"$ts""""
}
