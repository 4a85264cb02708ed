#!/usr/bin/env python3
"""Local leak scan with embedded provenance.

The driver's LEAKCHECK.json carries only {round, n_hits, hits} -- a
zero-hit body is byte-identical between rounds, so a fresh scan is
indistinguishable from a stale copy. This scanner re-runs the same
pattern classes over the committed tree and embeds the scanned commit
hash, a wall-clock timestamp, the file census, and the pattern table
itself, making every round's artifact provably a fresh run over a
specific tree state.

Usage: python3 tools/leakcheck.py [--out LEAKCHECK_LOCAL.json]
Exit code 1 if any hit is found.
"""
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Pattern classes mirror the driver's LEAKCHECK categories. Everything
# in this engine must derive from public knowledge (Spark API, the
# reference repo, papers) -- any internal host, bucket, package,
# slack link, API key, or bespoke env-var namespace is a leak.
PATTERNS = {
    # imports outside the public surface (spark/scala/java/graft + jdk;
    # `import s.implicits._`-style session imports are local vals, and
    # pyarrow/pandas/duckdb appear only in driver-side tools/)
    "internal-import": r"^\s*import\s+(?!org\.apache\.|scala\.|java\.|javax\.|graft\.|org\.scalatest|org\.scalacheck|org\.slf4j|com\.fasterxml|\w{1,8}\.implicits|pyarrow|pandas|duckdb|numpy|json\b|os\b|re\b|sys\b|time\b|math\b|subprocess|threading|argparse|pathlib|random\b|struct\b|hashlib)[a-z][\w.]*\.[A-Za-z]",
    # non-localhost URLs that are not apache/github/arxiv/doc cites;
    # dotless hosts (http://x, http://t1) are synthetic test URIs
    "internal-url": r"https?://(?!localhost|127\.0\.0\.1|[\w-]+(?:[/\"')\s]|$)|www\.w3\.org|github\.com|arxiv\.org|spark\.apache\.org|duckdb\.org|en\.wikipedia\.org|doi\.org|aclanthology\.org|dl\.acm\.org|(?:[\w-]+\.)*example\.(?:com|org|io)|schema\.org|purl\.org|xmlns\.com|data\.mimiro\.io|ns\.mimiro\.io|docs\.oracle\.com|openproceedings\.org|static\.googleusercontent\.com|research\.google|\w+\.samplesource\.org|graft\.io)[\w.-]+",
    # cloud bucket or object-store coordinates
    "internal-bucket": r"(?:s3a?|gs|abfss?|wasbs?)://[\w.-]+",
    # slack workspace links or channel shortcodes
    "slack-link": r"(?:slack\.com/archives|app\.slack\.com|#[a-z0-9-]*claude[a-z0-9-]*)",
    # API-key-shaped secrets
    "api-key": r"(?:sk-[A-Za-z0-9]{20,}|AKIA[0-9A-Z]{16}|ghp_[A-Za-z0-9]{30,})",
    # env vars outside the documented SPARK_*/SELFCHECK_* namespace
    "internal-env": r"sys\.env(?:\.get(?:OrElse)?)?\(\"(?!SPARK_|SELFCHECK_|HOME\b|USER\b|PATH\b)[A-Z][A-Z0-9_]*\"",
}

SCAN_EXT = {".scala", ".sbt", ".py", ".md", ".json", ".sh", ".properties", ".conf"}
SKIP_DIRS = {".git", "target", ".bloop", ".metals", ".claude"}
# retrieved public content (driver-written) is scanned by the driver's
# own tool; our scan covers what WE authored
SKIP_FILES = {"SNIPPETS.md", "PAPERS.md",
              # the scanner and its artifact self-match their own patterns
              "leakcheck.py", "LEAKCHECK_LOCAL.json"}


def git(*args):
    return subprocess.run(["git", "-C", REPO] + list(args),
                          capture_output=True, text=True).stdout.strip()


def main():
    out_path = os.path.join(REPO, "LEAKCHECK_LOCAL.json")
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]

    compiled = {k: re.compile(v, re.M) for k, v in PATTERNS.items()}
    hits = {k: [] for k in PATTERNS}
    n_files = 0
    for root, dirs, files in os.walk(REPO):
        dirs[:] = [d for d in dirs if d not in SKIP_DIRS]
        for f in files:
            if os.path.splitext(f)[1] not in SCAN_EXT or f in SKIP_FILES:
                continue
            p = os.path.join(root, f)
            rel = os.path.relpath(p, REPO)
            try:
                text = open(p, encoding="utf-8", errors="replace").read()
            except OSError:
                continue
            n_files += 1
            for name, rx in compiled.items():
                for m in rx.finditer(text):
                    line = text.count("\n", 0, m.start()) + 1
                    hits[name].append(f"{rel}:{line}: {m.group(0)[:100]}")

    n_hits = sum(len(v) for v in hits.values())
    artifact = {
        "scanned_commit": git("rev-parse", "HEAD"),
        "scanned_dirty": bool(git("status", "--porcelain")),
        "timestamp_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "n_files_scanned": n_files,
        "patterns": PATTERNS,
        "n_hits": n_hits,
        "hits": hits,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=2)
    print(f"leakcheck: {n_files} files, {n_hits} hits -> {out_path}")
    if n_hits:
        for k, v in hits.items():
            for h in v:
                print(f"  [{k}] {h}")
    sys.exit(1 if n_hits else 0)


if __name__ == "__main__":
    main()
