#!/usr/bin/env python3
"""Repo-side leak scan: greps src/ + tools/ + build.sbt for anything
that should never appear in a public engine repo (non-public imports,
URLs, bucket refs, chat links, credentials, suspicious env vars) and
writes a **provenance-stamped** LEAKCHECK.json ({"commit","ts"} like
BENCH_r*, r5/r6/r7 ADVICE: the artifact must say which tree it scanned,
not just which round it was).

Usage: python3 tools/leakscan.py [--out LEAKCHECK.json] [--round N]
Exit code 1 if any hit is found.
"""
import argparse
import datetime
import json
import pathlib
import re
import subprocess

ROOT = pathlib.Path(__file__).resolve().parent.parent

# Roots every import in this repo is allowed to resolve against; any
# other import is a leak candidate (categories mirror the driver scan).
PUBLIC_IMPORT_ROOTS = (
    "java.", "javax.", "scala.", "org.apache.spark.", "org.apache.hadoop.",
    "org.apache.parquet.", "org.scalatest.", "org.scalacheck.", "graft.",
    "org.slf4j.", "com.fasterxml.jackson.",
)
PUBLIC_URL_HOSTS = (
    "apache.org", "spark.apache.org", "github.com", "scala-lang.org",
    "scalatest.org", "duckdb.org", "parquet.apache.org", "example.com",
    "localhost",
)

CHECKS = {
    # only fully-qualified externals (TLD-rooted) can leak; local scope
    # imports (`import spark.implicits._`, `import Queries.QDef`) can't
    "internal-import": lambda line: (
        (m := re.match(r"\s*import\s+([A-Za-z0-9_.]+)", line)) is not None
        and re.match(r"(?:com|org|net|io|ai|dev|edu|gov)\.", m.group(1))
        and not m.group(1).startswith(PUBLIC_IMPORT_ROOTS)
    ),
    "internal-url": lambda line: any(
        not any(h in u for h in PUBLIC_URL_HOSTS)
        for u in re.findall(r"https?://[^\s\"')>]+", line)
    ),
    "internal-pkg2": lambda line: re.search(
        r"\b(?:com|net|ai)\.(?!fasterxml)[a-z0-9]+\.internal\b", line) is not None,
    "internal-bucket": lambda line: re.search(
        r"\b(?:gs|s3a?|abfss?|wasbs?)://[A-Za-z0-9._-]+", line) is not None,
    # go/ short links and #channel names must flag WITHOUT the word
    # "slack" nearby — they are exactly the internal-link shapes this
    # category exists for (word-bounded so "cargo/x" etc. don't match)
    "slack-link": lambda line: re.search(
        r"slack\.com|(?<![a-z])go/[a-z][a-z0-9-]+\b|(?<=\s)#[a-z]+-[a-z]+-[a-z-]+\b",
        line) is not None,
    "api-key": lambda line: re.search(
        r"AKIA[0-9A-Z]{16}|sk-[A-Za-z0-9]{20,}|-----BEGIN [A-Z ]*PRIVATE KEY|"
        r"(?:api|secret|access)[_-]?key\s*[:=]\s*[\"'][A-Za-z0-9+/=]{16,}", line,
        re.IGNORECASE) is not None,
    "axon-env": lambda line: re.search(
        r"(?:sys\.env|getenv)\([\"'](?!SPARK_|GRAFT_|COURSIER_|JAVA_|HOME|PATH|TMPDIR|USER)"
        r"[A-Z][A-Z0-9_]*[\"']\)", line) is not None,
}

SCAN_GLOBS = ["src/**/*.scala", "tools/*.py", "build.sbt", "project/*.sbt",
              "project/*.scala", ".claude/skills/**/*.md"]


def git(*args: str) -> str:
    return subprocess.run(["git", *args], cwd=ROOT, capture_output=True,
                          text=True).stdout.strip()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(ROOT / "LEAKCHECK.json"))
    ap.add_argument("--round", type=int, default=8)
    args = ap.parse_args()

    hits: dict[str, list[str]] = {k: [] for k in CHECKS}
    for pattern in SCAN_GLOBS:
        for path in sorted(ROOT.glob(pattern)):
            if not path.is_file():
                continue
            rel = path.relative_to(ROOT)
            for i, line in enumerate(
                    path.read_text(errors="replace").splitlines(), 1):
                for cat, pred in CHECKS.items():
                    if pred(line):
                        hits[cat].append(f"{rel}:{i}: {line.strip()[:160]}")

    n = sum(len(v) for v in hits.values())
    out = {
        "round": args.round,
        "n_hits": n,
        "hits": hits,
        "commit": git("rev-parse", "HEAD"),
        "ts": datetime.datetime.now(datetime.timezone.utc).isoformat(),
    }
    pathlib.Path(args.out).write_text(json.dumps(out, indent=2) + "\n")
    print(f"leakscan: {n} hits -> {args.out}")
    for cat, v in hits.items():
        for h in v:
            print(f"  [{cat}] {h}")
    return 1 if n else 0


if __name__ == "__main__":
    raise SystemExit(main())
