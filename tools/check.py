#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage:  python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify),
runs <verifyOutDir>/oracle_sql.json[name] in DuckDB over views of the
sfDir tables, and compares: row count, column names/dtypes (sorted by
name), and exact values. Exit code = number of failing queries.

This is dev tooling only (driver-side python libs); the Scala library
does not depend on it.
"""
import sys, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def load_result(path):
    files = sorted(glob.glob(f"{path}/*.parquet"))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracles.items()):
        got = load_result(f"{out_dir}/{name}")
        if got is None:
            print(f"FAIL {name}: no spark output")
            failures += 1
            continue
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            failures += 1
            continue
        got = got.reindex(sorted(got.columns), axis=1)
        exp = exp.reindex(sorted(exp.columns), axis=1)
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            failures += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            failures += 1
            continue
        ok = True
        for c in got.columns:
            g, e = got[c].to_numpy(), exp[c].to_numpy()
            if g.dtype.kind == 'f' or e.dtype.kind == 'f':
                same = np.array_equal(g.astype(float), e.astype(float), equal_nan=True)
                if not same:
                    d = np.abs(g.astype(float) - e.astype(float))
                    print(f"FAIL {name}.{c}: max abs diff {np.nanmax(d):.3e} "
                          f"({int((d > 0).sum())} rows differ)")
                    ok = False
            else:
                same = (pd.Series(g).astype(str) == pd.Series(e).astype(str)).all()
                if not same:
                    idx = (pd.Series(g).astype(str) != pd.Series(e).astype(str)).idxmax()
                    print(f"FAIL {name}.{c}: first diff row {idx}: "
                          f"{g[idx]!r} != {e[idx]!r}")
                    ok = False
        if ok:
            print(f"PASS {name} ({len(got)} rows)")
        else:
            failures += 1
    # queries with no SQL oracle: prefer the committed-golden
    # adjudication Verify wrote (golden_check.json), fall back to the
    # rows-only gate when the golden couldn't adjudicate (other scale
    # factors, regenerated testdata)
    try:
        goldens = json.load(open(f"{out_dir}/golden_check.json"))
    except Exception:
        goldens = {}
    # golden adjudications for names that ALSO have a SQL oracle count
    # as an extra independent gate (ADVICE r11: the golden must feed
    # the verdict/exit code, not just Verify's stdout)
    for name in sorted(goldens):
        g = goldens[name]
        if name in oracles and g.get("status") in ("pass", "fail"):
            det = f" ({g['detail']})" if g.get("detail") else ""
            print(f"GOLDEN {g['status'].upper()} {name}: "
                  f"{g['rows']} rows vs committed golden{det}")
            if g["status"] != "pass":
                failures += 1
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = d.rstrip('/').split('/')[-1]
        if name not in oracles:
            g = goldens.get(name)
            if g and g.get("status") in ("pass", "fail"):
                det = f" ({g['detail']})" if g.get("detail") else ""
                print(f"GOLDEN {g['status'].upper()} {name}: "
                      f"{g['rows']} rows vs committed golden{det}")
                if g["status"] != "pass":
                    failures += 1
                continue
            r = load_result(d)
            n = 0 if r is None else len(r)
            print(f"ROWS-ONLY {name}: {n} rows {'OK' if n > 0 else 'EMPTY!'}")
            if n == 0:
                failures += 1
    print(f"{'ALL PASS' if failures == 0 else str(failures) + ' FAILURES'}")
    sys.exit(min(failures, 99))


if __name__ == "__main__":
    main()
