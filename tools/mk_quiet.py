#!/usr/bin/env python3
"""Assemble BENCH_quiet_r{N}.json from three Bench runs.

Protocol: run graft.Bench per scale with the box otherwise idle —
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS=5 sbt "runMain graft.Bench" | grep '"metric"' > /tmp/quiet_sf001.json
  (same for sf0.1 reps=5 and /tmp/sf1 reps=3)
then:  python3 tools/mk_quiet.py <round> [note]

Dev tooling only (driver-side python); the library never runs it.
"""
import json
import subprocess
import sys


def load(path):
    # Bench prints one JSON line; sbt may prefix it with "[info] "
    return json.loads(open(path).read().split("] ", 1)[-1])


def main():
    rnd = sys.argv[1]
    note = sys.argv[2] if len(sys.argv) > 2 else ""
    blocks = {}
    for name, path in [("sf0.01", "/tmp/quiet_sf001.json"),
                       ("sf0.1", "/tmp/quiet_sf01.json"),
                       ("sf1", "/tmp/quiet_sf1.json")]:
        d = load(path)
        blocks[name] = {"total": round(d["value"], 1), "queries": d["queries"],
                        "errors": d.get("errors", {}), "reps": d.get("reps"),
                        "calib": d.get("calib")}
    head = subprocess.check_output(
        ["git", "rev-parse", "--short", "HEAD"]).decode().strip()
    nq = len(blocks["sf0.1"]["queries"])
    proto = (f"median-of-5 (sf1: median-of-3), local[32], cache evicted per "
             f"rep, quiet box, run at {head} ({nq} queries{'; ' + note if note else ''}); "
             "sf1 = tools/sf1_gen.py 10x of sf0.1; failed queries would "
             "surface under 'errors' and be excluded from the total.")
    out = {"protocol": proto}
    out.update(blocks)
    with open(f"BENCH_quiet_r{rnd}.json", "w") as f:
        json.dump(out, f, indent=1)
    for name, b in blocks.items():
        print(name, "total", b["total"], "n", len(b["queries"]),
              "errors", b["errors"])
    q1, q01 = blocks["sf1"]["queries"], blocks["sf0.1"]["queries"]
    print("\ntop sf1 families (sf0.1 -> sf1, slope):")
    for k, v in sorted(q1.items(), key=lambda kv: -kv[1])[:12]:
        print(f"  {k:28s} {q01.get(k, float('nan')):7.2f} -> {v:7.2f}  "
              f"{v / q01[k]:5.1f}x")


if __name__ == "__main__":
    main()
