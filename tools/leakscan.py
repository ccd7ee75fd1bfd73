#!/usr/bin/env python3
"""Independent leak/copy hygiene scan with provenance stamping.

The per-round LEAKCHECK.json / COPYCHECK.json are written by the build
driver; this is the repo-side mirror of the same sweep, run locally so
each round's zero-hit claim is backed by an artifact that PROVES a
fresh scan: the output records the commit hash, the number of files
actually scanned, and per-pattern hit lists.

Usage: python3 tools/leakscan.py            # writes LEAKCHECK_LOCAL.json
"""
import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# file classes swept: all tracked source/doc/tooling, excluding the
# driver-owned artifacts this scan exists to corroborate
SCAN_EXT = {".scala", ".py", ".sbt", ".md", ".json", ".sql", ".sh"}
SKIP = {"LEAKCHECK.json", "COPYCHECK.json", "LEAKCHECK_LOCAL.json"}
SKIP_PREFIX = ("BENCH_", "CORRECTNESS_")

PATTERNS = {
    # anything that smells like a private package/bucket/host/env —
    # the public-knowledge-only contract bans all of these
    "nonpublic-scheme": r"\b(?:gs|s3a?|abfss?)://[a-z0-9._-]+",
    "slack-link": r"\bslack\.com/archives\b|#[a-z0-9-]*-internal\b",
    "api-key": r"\b(?:sk|pk|key)-[A-Za-z0-9]{20,}\b|AKIA[0-9A-Z]{16}",
    "internal-host": r"\b[a-z0-9-]+\.(?:corp|internal|intra)\.[a-z]+\b",
    "env-secret": r"\b[A-Z_]*(?:SECRET|TOKEN|PASSWORD)[A-Z_]*\s*=",
}


def tracked_files():
    out = subprocess.run(["git", "ls-files"], cwd=ROOT, capture_output=True,
                         text=True, check=True).stdout.splitlines()
    for f in out:
        base = os.path.basename(f)
        if base in SKIP or base.startswith(SKIP_PREFIX):
            continue
        if os.path.splitext(f)[1] in SCAN_EXT:
            yield f


def main():
    commit = subprocess.run(["git", "rev-parse", "HEAD"], cwd=ROOT,
                            capture_output=True, text=True,
                            check=True).stdout.strip()
    dirty = bool(subprocess.run(["git", "status", "--porcelain"], cwd=ROOT,
                                capture_output=True, text=True,
                                check=True).stdout.strip())
    hits = {name: [] for name in PATTERNS}
    n_files = 0
    for f in tracked_files():
        n_files += 1
        try:
            text = open(os.path.join(ROOT, f), encoding="utf-8",
                        errors="replace").read()
        except OSError:
            continue
        for name, pat in PATTERNS.items():
            for m in re.finditer(pat, text):
                line = text.count("\n", 0, m.start()) + 1
                hits[name].append(f"{f}:{line}:{m.group(0)[:80]}")
    result = {
        "commit": commit,
        "working_tree_dirty": dirty,
        "files_scanned": n_files,
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    out = os.path.join(ROOT, "LEAKCHECK_LOCAL.json")
    with open(out, "w") as fh:
        json.dump(result, fh, indent=2)
    print(f"scanned {n_files} files at {commit[:12]}"
          f"{' (dirty)' if dirty else ''}: {result['n_hits']} hits")
    sys.exit(0 if result["n_hits"] == 0 else 1)


if __name__ == "__main__":
    main()
