#!/usr/bin/env python3
"""Cross-engine fuzz harness: Spark ≡ DuckDB on generated corpora.

Generates adversarial document corpora (unicode, empty strings,
single-token docs, all-duplicate corpora, whitespace pathologies),
then compares the Spark results of d1/d4/t2/t4/t6 (written by
graft.tools.FuzzVerify) against the same oracle SQL the driver gate
uses, run in DuckDB per corpus.

Usage:
  python3 tools/fuzz.py gen /tmp/fuzz [n_corpora]
  sbt "Test/runMain graft.tools.FuzzVerify /tmp/fuzz"
  python3 tools/fuzz.py check /tmp/fuzz

Dev tooling only (driver-side python); the library never runs it.
"""
import sys, os, json, glob, random
import numpy as np
import pandas as pd
import duckdb

# every documents-only oracle query plus the embeddings family
QUERIES = ["d1_dedup_exact", "d2_dedup_ngram_jaccard", "d3_dedup_minhash_lsh",
           "d4_simhash", "d5_simhash_forest", "d8_simhash_assign",
           "d9_simhash_clusters", "d10_dedup_pipeline",
           "t1_lang_id", "t2_quality_score",
           "t3_token_stats", "t4_fingerprint", "t5_winnow_fingerprint",
           "t6_regex_tokens", "t7_repetition", "t8_tfidf", "t9_filter_cascade", "t10_shard_pack", "d7_decontaminate",
           "m1_media_meta", "m2_media_features",
           "m3_frame_sample", "d6_dedup_embedding", "s1_knn_bruteforce",
           "s2_knn_ivf", "s3_knn_srp", "s4_quantize", "s5_knn_batch",
           "s6_knn_srp_batch", "s7_kmeans_cells",
           "t11_shard_pack_bucketed", "p1_corpus_build",
           "d11_incremental_dedup", "m4_perceptual_hash",
           "p2_split_assign", "p3_mixture_sample",
           "t12_stratified_sample", "t13_unigram_surprisal",
           "t14_normalize", "t15_pii_redact", "t16_bigram_surprisal",
           "t17_kmv_distinct", "t18_vocab_overlap", "t19_cms_heavy_hitters",
           "d12_bloom_decontaminate", "d13_semantic_dedup",
           "d14_containment", "p4_weighted_sample", "p5_event_ingest", "p6_ccnet_carve",
           "d15_lsh_cluster_summary", "d16_containment_degree",
           "d17_jaccard_degree", "s8_pq_adc", "s9_pq_rerank", "s10_ivfpq_batch",
           "d18_winnow_overlap", "d21_sampled_degree",
           "d22_sampled_containment", "d23_sampled_embedding"]

WORDS = ["the", "a", "of", "and", "to", "in", "is", "data", "spark", "query",
         "row", "scan", "merge", "sort", "key", "fast", "slow", "small"]
UNICODE_WORDS = ["naïve", "café", "über", "mañana", "北京", "東京データ",
                 "привет", "مرحبا", "🙂🚀", "ábc", "ﬁre", "στιγμας"]


def gen_text(rng, kind):
    if kind == "empty":
        return ""
    if kind == "single":
        return rng.choice(WORDS + UNICODE_WORDS)
    if kind == "spaces":
        return " ".join([""] * rng.randint(2, 5)) + rng.choice(WORDS)
    if kind == "unicode":
        return " ".join(rng.choice(UNICODE_WORDS)
                        for _ in range(rng.randint(1, 30)))
    if kind == "longtok":
        return "x" * rng.randint(100, 500)
    # plain: ascii word salad
    return " ".join(rng.choice(WORDS) for _ in range(rng.randint(1, 60)))


def gen(root, n):
    rng = random.Random(20260812)
    kinds = ["plain", "plain", "plain", "unicode", "empty", "single",
             "spaces", "longtok"]
    for c in range(n):
        ndocs = rng.randint(5, 30)
        all_dup = c % 10 == 3  # every 10th corpus: one text repeated
        # every 10th corpus (offset 7): near-duplicates — the base text
        # with one token substituted per doc, exercising the nonzero-
        # Hamming paths of d5/d8/d9 (all_dup only makes distance-0
        # cliques)
        near_dup = c % 10 == 7
        base = gen_text(rng, "plain")
        rows = []
        for d in range(ndocs):
            if all_dup:
                text = base
            elif near_dup:
                toks = base.split(" ")
                toks[rng.randrange(len(toks))] = rng.choice(WORDS)
                text = " ".join(toks)
            else:
                text = gen_text(rng, rng.choice(kinds))
            rows.append((d, text, rng.choice(["en", "fr", "zz"]),
                         f"src{d % 3}", len(text)))
        df = pd.DataFrame(rows,
                          columns=["doc_id", "text", "lang", "source", "n_chars"])
        df["doc_id"] = df.doc_id.astype("int64")
        df["n_chars"] = df.n_chars.astype("int64")
        d = f"{root}/c{c:03d}"
        os.makedirs(d, exist_ok=True)
        df.to_parquet(f"{d}/documents.parquet", index=False)

        # embeddings: clustered unit-ish float32 vectors with exact
        # duplicates and near-duplicates; vec_id 0 (the s1/s2 query
        # vector) and 0-7 (IVF seed centroids) always present.
        # Every 10th corpus (offset 5) is DEGENERATE: dim-1 vectors,
        # exact zero vectors (cosine undefined -> operators must not
        # let NaN hit engine-divergent comparisons), and exact
        # duplicate vectors (tie-breaking paths).
        nrng = np.random.RandomState(7000 + c)
        degen = c % 10 == 5
        nvec = nrng.randint(20, 60)
        dim = 1 if degen else int(nrng.choice([8, 16, 64]))
        ncl = nrng.randint(2, 6)
        centers = nrng.normal(0, 1, (ncl, dim))
        vecs = []
        for v in range(nvec):
            r = nrng.rand()
            if degen and r < 0.2:
                vec = np.zeros(dim)  # zero vector: undefined cosine
            elif degen and r < 0.5 and v > 1:
                vec = vecs[nrng.randint(1, v)].copy()  # exact duplicate
            elif v > 8 and r < 0.15:
                base = vecs[nrng.randint(1, v)]  # duplicate family
                vec = base + nrng.normal(0, 1e-3, dim)
            else:
                vec = centers[v % ncl] + nrng.normal(0, 0.3, dim)
            vecs.append(vec)
        edf = pd.DataFrame({
            "vec_id": np.arange(nvec, dtype=np.int64),
            "embedding": [np.asarray(v, dtype=np.float32) for v in vecs],
            "label": np.arange(nvec, dtype=np.int32) % ncl})
        edf.to_parquet(f"{d}/embeddings.parquet", index=False)
    print(f"generated {n} corpora under {root}")


def compare(got, exp, name, corpus):
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        return f"{corpus}/{name}: columns {list(got.columns)} != {list(exp.columns)}"
    if len(got) != len(exp):
        return f"{corpus}/{name}: rows {len(got)} != {len(exp)}"
    for col in got.columns:
        a, b = got[col].to_numpy(), exp[col].to_numpy()
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            af = a.astype(float); bf = b.astype(float)
            ok = np.isclose(af, bf, rtol=1e-12, atol=1e-12, equal_nan=True)
            if not ok.all():
                i = int(np.argmin(ok))
                return f"{corpus}/{name}.{col}[{i}]: {af[i]!r} != {bf[i]!r}"
        else:
            eq = pd.Series(a).astype(object).eq(pd.Series(b).astype(object)) | \
                (pd.Series(a).isna() & pd.Series(b).isna())
            if not eq.all():
                i = int(eq.idxmin())
                return f"{corpus}/{name}.{col}[{i}]: {a[i]!r} != {b[i]!r}"
    return None


def check(root):
    oracles = json.load(open(f"{root}/oracle_sql.json"))
    failures = 0
    corpora = sorted(d for d in os.listdir(root)
                     if d.startswith("c") and os.path.isdir(f"{root}/{d}"))
    for corpus in corpora:
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{root}/{corpus}/documents.parquet')")
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{root}/{corpus}/embeddings.parquet')")
        for name in QUERIES:
            files = sorted(glob.glob(f"{root}/{corpus}/{name}/*.parquet"))
            if not files:
                print(f"FAIL {corpus}/{name}: no spark output")
                failures += 1
                continue
            got = pd.concat([pd.read_parquet(f) for f in files],
                            ignore_index=True)
            exp = con.execute(oracles[name]).df()
            err = compare(got, exp, name, corpus)
            if err:
                print(f"FAIL {err}")
                failures += 1
        con.close()
    print(f"{len(corpora)} corpora x {len(QUERIES)} queries: "
          f"{'ALL PASS' if failures == 0 else f'{failures} FAILURES'}")
    return failures


if __name__ == "__main__":
    cmd, root = sys.argv[1], sys.argv[2]
    if cmd == "gen":
        gen(root, int(sys.argv[3]) if len(sys.argv) > 3 else 100)
    elif cmd == "check":
        sys.exit(min(check(root), 99))
    else:
        sys.exit(f"unknown command {cmd}")
