#!/usr/bin/env python3
"""Generate the sf100 (1000x-decade) stress tables: 10x replication of
the sf10 documents/embeddings/events — the VERDICT r12 #7 probe of the
PRODUCTION chains (d10/d11/d13/d15, p1/p5/p6, s10), which touch only
these three tables. The relational tables are not replicated: at
~600M lineitem rows they dominate disk for queries the probe does not
run.

Same scheme as tools/sf10_gen.py with key offsets scaled another 10x
(sf10 doc_ids span ~[0, 1e8); each sf100 replica shifts by 1e8).
Document text gets a third per-replica suffix token (" t{r}") and
embeddings a third small perturbation, so the near-dup / near-neighbor
workload keeps scaling ~10x per decade rather than squaring.

Usage: python3 tools/sf100_gen.py /tmp/sf10 /tmp/sf100
"""
import sys, os
import numpy as np
import pandas as pd

R = 10
OFF = {"doc_id": 100_000_000, "vec_id": 100_000_000,
       "event_id": 10_000_000_000, "user_id": 100_000_000}


def rep_to_parquet(src_path, dst_path, fn):
    # replicate one chunk at a time into a multi-row-group parquet file
    # (pyarrow appends one row group per write) — the full 5M-doc /
    # 100M-event concat would be a needless peak-RSS spike
    import pyarrow as pa
    import pyarrow.parquet as pq
    base = pd.read_parquet(src_path)
    writer = None
    for r in range(R):
        chunk = fn(base.copy(), r)
        table = pa.Table.from_pandas(chunk, preserve_index=False)
        if writer is None:
            writer = pq.ParquetWriter(dst_path, table.schema)
        writer.write_table(table)
    writer.close()


def main(src, dst):
    os.makedirs(dst, exist_ok=True)

    def fe(d, r):
        d["event_id"] += r * OFF["event_id"]
        d["user_id"] += r * OFF["user_id"]
        return d
    rep_to_parquet(f"{src}/events.parquet", f"{dst}/events.parquet", fe)

    def fd(d, r):
        d["doc_id"] += r * OFF["doc_id"]
        if r > 0:  # vary text so near-dup pairs scale ~10x, not 100x
            d["text"] = d.text + f" t{r}"
            d["n_chars"] = d.text.str.len().astype("int64")
        return d
    rep_to_parquet(f"{src}/documents.parquet", f"{dst}/documents.parquet", fd)

    def fv(d, r):
        d["vec_id"] += r * OFF["vec_id"]
        if r > 0:
            rng = np.random.RandomState(3000 + r)
            d["embedding"] = d.embedding.map(
                lambda v: (np.asarray(v, dtype=np.float32) +
                           rng.normal(0, 0.01, len(v)).astype(np.float32)))
        return d
    rep_to_parquet(f"{src}/embeddings.parquet", f"{dst}/embeddings.parquet", fv)
    print(f"wrote sf100 (documents/embeddings/events, {R}x sf10) to {dst}")


def relational(src, dst):
    """r14 (VERDICT r13 #3): the q/x relational tables for the sf100
    probe of q5/q20 (lineitem/orders; the x/q19/q22 queries read
    events, already written by main). Same offset discipline: sf10
    orderkeys span ~[0, 1e10) so each sf100 replica shifts by 1e10."""
    import shutil
    off = {"orderkey": 10_000_000_000, "custkey": 1_000_000_000,
           "partkey": 1_000_000_000, "suppkey": 100_000_000}
    for t in ["region", "nation", "supplier", "part", "customer"]:
        # dims and small tables: q5/q20 don't join them at sf100, and
        # replicating customer/part would only grow tables the probe
        # never reads — copy through for schema completeness
        shutil.copyfile(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")

    def fo(d, r):
        d["o_orderkey"] += r * off["orderkey"]
        d["o_custkey"] += r * off["custkey"]
        return d
    rep_to_parquet(f"{src}/orders.parquet", f"{dst}/orders.parquet", fo)

    def fl(d, r):
        d["l_orderkey"] += r * off["orderkey"]
        d["l_partkey"] += r * off["partkey"]
        d["l_suppkey"] += r * off["suppkey"]
        return d
    rep_to_parquet(f"{src}/lineitem.parquet", f"{dst}/lineitem.parquet", fl)
    print(f"wrote sf100 relational (orders/lineitem {R}x sf10, dims copied)")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--relational"]
    if "--relational" in sys.argv:  # additive: extend an existing sf100
        relational(args[0], args[1])
    else:
        main(args[0], args[1])
