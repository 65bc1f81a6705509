#!/usr/bin/env python3
"""Local sf1-scale PROBE fixtures (round-11 verdict item 7).

The driver fixtures stop at sf0.1; the iterative graph family
(x95/x104/x105/x120), q51's per-group percentile sort and the kq102
sliding-uniques serving path are argued at-most-linear but never
measured past sf0.1. This generates a 10x step for exactly the tables
those queries touch — events (10x rows), embeddings (4x rows, the
fixtures' own growth pattern), lineitem (10x) — schema-compatible and
distribution-shaped like the driver's tables (same key cardinality
ratios, 30-day window, unit-norm clustered vectors, uniform types).
Timing-only: these are NOT oracle fixtures and are never committed
(tmp/ is gitignored). Deterministic at seed=43 (deliberately not the
driver's 42 — nothing here may masquerade as driver data).

Usage: python3 tools/gen_sf1_probe.py [outdir=/root/repo/tmp/sf1probe]
"""
import json
import os
import sys

import numpy as np
import pandas as pd

OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/tmp/sf1probe"
rng = np.random.default_rng(43)
os.makedirs(OUT, exist_ok=True)

# events: 1M rows, 15k users (10x sf0.1), Jan 2024, 5 uniform types
N_EV, N_USERS = 1_000_000, 15_000
base = pd.Timestamp("2024-01-01").value  # ns
span = pd.Timestamp("2024-01-31").value - base
ev = pd.DataFrame({
    "event_id": np.arange(N_EV, dtype=np.int64),
    "ts": pd.to_datetime(
        base + np.sort(rng.integers(0, span, N_EV)), unit="ns"),
    "user_id": rng.integers(0, N_USERS, N_EV).astype(np.int64),
    "event_type": rng.choice(
        ["click", "view", "purchase", "signup", "error"], N_EV),
    "value": np.round(rng.uniform(0, 200, N_EV), 2),
    "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, N_EV)],
})
ev["ts"] = ev["ts"].astype("datetime64[us]")
ev.to_parquet(f"{OUT}/events.parquet", index=False)

# embeddings: 8000 rows (4x sf0.1), 64-dim unit-norm, 10 cluster labels
N_EMB, DIM, K = 8_000, 64, 10
centers = rng.normal(size=(K, DIM))
centers /= np.linalg.norm(centers, axis=1, keepdims=True)
labels = rng.integers(0, K, N_EMB)
vecs = centers[labels] + 0.35 * rng.normal(size=(N_EMB, DIM))
vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
emb = pd.DataFrame({
    "vec_id": np.arange(N_EMB, dtype=np.int64),
    "embedding": [row.astype(np.float32) for row in vecs],
    "label": labels.astype(np.int32),
})
emb.to_parquet(f"{OUT}/embeddings.parquet", index=False)

# lineitem: 6M rows (10x sf0.1), only the q51-relevant columns need
# realistic distributions; the rest are schema-compatible fillers
N_LI = 6_000_000
ship = pd.Timestamp("1994-01-01").value
ship_span = pd.Timestamp("1998-12-01").value - ship
li = pd.DataFrame({
    "l_orderkey": rng.integers(0, N_LI // 4, N_LI).astype(np.int64),
    "l_partkey": rng.integers(0, 200_000, N_LI).astype(np.int64),
    "l_suppkey": rng.integers(0, 10_000, N_LI).astype(np.int64),
    "l_linenumber": rng.integers(1, 8, N_LI).astype(np.int32),
    "l_quantity": rng.integers(1, 51, N_LI).astype(np.float64),
    "l_extendedprice": np.round(rng.uniform(900, 105_000, N_LI), 2),
    "l_discount": np.round(rng.integers(0, 11, N_LI) / 100.0, 2),
    "l_tax": np.round(rng.integers(0, 9, N_LI) / 100.0, 2),
    "l_returnflag": rng.choice(["A", "N", "R"], N_LI),
    "l_linestatus": rng.choice(["F", "O"], N_LI),
    "l_shipdate": pd.to_datetime(
        ship + rng.integers(0, ship_span, N_LI), unit="ns")
        .astype("datetime64[us]"),
})
li.to_parquet(f"{OUT}/lineitem.parquet", index=False)

# documents: 50k rows (10x sf0.1) for the BANDING DEDUP family
# (x3 minhash-LSH / x19 simhash / x117 winnowing / x126 CDC blocks),
# whose candidate-pair growth is data-dependent (band collisions) —
# the round-12 verdict's one unprobed family. Same shape as the driver
# fixtures: 30-word vocab (drives natural shingle collisions), uniform
# 10..100 token lengths, 5-lang/20-source mix, and ~5% of docs arranged
# as near-dup pairs (clone + 2 'dup'-token edits, the fixtures' own
# planted-pair pattern).
N_DOC = 50_000
VOCAB = np.array([
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch"])
doc_lens = rng.integers(10, 101, N_DOC)
texts = [" ".join(rng.choice(VOCAB, n)) for n in doc_lens]
for i in range(0, N_DOC // 20, 2):  # 5% of docs = near-dup pairs
    toks = texts[i].split(" ")
    for p in rng.choice(len(toks), size=min(2, len(toks)), replace=False):
        toks[p] = "dup"
    texts[i + 1] = " ".join(toks)
doc = pd.DataFrame({
    "doc_id": np.arange(N_DOC, dtype=np.int64),
    "text": texts,
    "lang": rng.choice(["en", "de", "fr", "zh", "es"], N_DOC,
                       p=[0.4, 0.15, 0.15, 0.15, 0.15]),
    "source": [f"src{s}" for s in rng.integers(0, 20, N_DOC)],
})
doc["n_chars"] = doc["text"].str.len().astype(np.int64)
doc.to_parquet(f"{OUT}/documents.parquet", index=False)

# customer: 15k rows (10x sf0.1) for the GEO family (kq59 geohash grid,
# kq107 geotile grid, kq82 centroid/bounds, kq60 nearest-k) whose points
# derive from c_custkey — schema-compatible with the driver's table.
N_CUST = 15_000
cust = pd.DataFrame({
    "c_custkey": np.arange(N_CUST, dtype=np.int64),
    "c_name": [f"Customer#{k:09d}" for k in range(N_CUST)],
    "c_nationkey": rng.integers(0, 25, N_CUST).astype(np.int32),
    "c_acctbal": np.round(rng.uniform(-999.99, 9999.99, N_CUST), 2),
    "c_mktsegment": rng.choice(
        ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"],
        N_CUST),
})
cust.to_parquet(f"{OUT}/customer.parquet", index=False)

print(json.dumps({"out": OUT, "events": N_EV, "embeddings": N_EMB,
                  "lineitem": N_LI, "documents": N_DOC,
                  "customer": N_CUST}))
