#!/usr/bin/env python3
"""Generate a local sf10 stress dataset: 10x replication of the sf1
tables (themselves 10x of sf0.1 via sf1_gen.py) — the 100x-decade
probe of VERDICT r10 #2.

Same scheme as tools/sf1_gen.py, with key offsets scaled 10x so the
second replication round cannot collide with sf1's re-keyed ids
(sf1 orderkeys span ~[0, 9e8]; each sf10 replica shifts by 1e9).
Document text gets a second per-replica suffix token (" s{r}" on top
of sf1's " r{r}") and embeddings a second small rotation, so the
near-dup / near-neighbor workload scales ~10x per decade rather than
squaring.

Usage: python3 tools/sf10_gen.py /tmp/sf1 /tmp/sf10
"""
import sys, os
import numpy as np
import pandas as pd

R = 10
OFF = {"orderkey": 1_000_000_000, "custkey": 100_000_000,
       "partkey": 100_000_000, "suppkey": 10_000_000,
       "doc_id": 10_000_000, "vec_id": 10_000_000,
       "event_id": 1_000_000_000, "user_id": 10_000_000}


def rep(df, fn):
    return pd.concat([fn(df.copy(), r) for r in range(R)], ignore_index=True)


def main(src, dst):
    os.makedirs(dst, exist_ok=True)
    for t in ["region", "nation"]:
        pd.read_parquet(f"{src}/{t}.parquet").to_parquet(
            f"{dst}/{t}.parquet", index=False)

    cust = pd.read_parquet(f"{src}/customer.parquet")
    def fc(d, r):
        d["c_custkey"] += r * OFF["custkey"]
        return d
    rep(cust, fc).to_parquet(f"{dst}/customer.parquet", index=False)

    supp = pd.read_parquet(f"{src}/supplier.parquet")
    def fs(d, r):
        d["s_suppkey"] += r * OFF["suppkey"]
        return d
    rep(supp, fs).to_parquet(f"{dst}/supplier.parquet", index=False)

    part = pd.read_parquet(f"{src}/part.parquet")
    def fp(d, r):
        d["p_partkey"] += r * OFF["partkey"]
        return d
    rep(part, fp).to_parquet(f"{dst}/part.parquet", index=False)

    orders = pd.read_parquet(f"{src}/orders.parquet")
    def fo(d, r):
        d["o_orderkey"] += r * OFF["orderkey"]
        d["o_custkey"] += r * OFF["custkey"]
        return d
    rep(orders, fo).to_parquet(f"{dst}/orders.parquet", index=False)

    li = pd.read_parquet(f"{src}/lineitem.parquet")
    def fl(d, r):
        d["l_orderkey"] += r * OFF["orderkey"]
        d["l_partkey"] += r * OFF["partkey"]
        d["l_suppkey"] += r * OFF["suppkey"]
        return d
    rep(li, fl).to_parquet(f"{dst}/lineitem.parquet", index=False)

    ev = pd.read_parquet(f"{src}/events.parquet")
    def fe(d, r):
        d["event_id"] += r * OFF["event_id"]
        d["user_id"] += r * OFF["user_id"]
        return d
    rep(ev, fe).to_parquet(f"{dst}/events.parquet", index=False)

    docs = pd.read_parquet(f"{src}/documents.parquet")
    def fd(d, r):
        d["doc_id"] += r * OFF["doc_id"]
        if r > 0:  # vary text so near-dup pairs scale ~10x, not 100x
            d["text"] = d.text + f" s{r}"
            d["n_chars"] = d.text.str.len().astype("int64")
        return d
    rep(docs, fd).to_parquet(f"{dst}/documents.parquet", index=False)

    emb = pd.read_parquet(f"{src}/embeddings.parquet")
    def fv(d, r):
        d["vec_id"] += r * OFF["vec_id"]
        if r > 0:
            rng = np.random.RandomState(2000 + r)
            d["embedding"] = d.embedding.map(
                lambda v: (np.asarray(v, dtype=np.float32) +
                           rng.normal(0, 0.01, len(v)).astype(np.float32)))
        return d
    rep(emb, fv).to_parquet(f"{dst}/embeddings.parquet", index=False)
    print(f"wrote sf10 ({R}x sf1) to {dst}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
