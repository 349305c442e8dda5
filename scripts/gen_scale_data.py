#!/usr/bin/env python
"""sf1-class synthetic table generator for the scaling probes (r12
verdict #7): the driver's testdata stops at sf0.1, so the decade
extension sf0.1 → sf1 needs locally-generated tables whose
DISTRIBUTIONS match the driver's (measured from /root/testdata/sf0.1,
seed-42 deterministic here):

- ``part``: p_name uniform over the same 8 adjectives × 8 nouns grid
  (64 distinct names — the ER value space is FIXED; scale grows only
  the row space, which is exactly the value-space-flat claim the ER
  probe verifies);
- ``orders``/``lineitem``: custkey/partkey/suppkey ranges scale with
  sf, ~4 lineitems per order (uniform orderkey draws ≈ the driver's
  1..17 Poisson-ish per-order counts);
- ``documents``: the driver's exact 31-word vocabulary, 10..100 tokens
  per doc, lang/source mixes matched, and ~4.8% of docs planted as
  near-dup variants of their predecessor (prefix kept, tail ~10%
  refreshed → trigram Jaccard ≳ 0.6) — matching the measured sf0.1
  density of 477/5000 docs incident to a J≥0.5 edge in ~pair-sized
  clusters.

Usage: python scripts/gen_scale_data.py <sf> <outdir>
e.g.   python scripts/gen_scale_data.py 1 /tmp/spark-graft-sf1

Writes part/orders/lineitem/documents parquet with the driver's
physical schemas. Intended for /tmp scratch — the probe results are
committed (SCALING.md), the data is not.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ADJ = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUN = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
LANGS = (["en"], [0.41, 0.15, 0.15, 0.15, 0.14])
LANG_NAMES = ["en", "zh", "es", "fr", "de"]


def _dates(rng, n, lo="1995-01-01", hi="2001-08-01"):
    lo_d, hi_d = np.datetime64(lo), np.datetime64(hi)
    days = (hi_d - lo_d).astype(int)
    return (lo_d + rng.integers(0, days + 1, n)).astype("datetime64[us]")


def gen_part(rng, n):
    a = rng.integers(0, 8, n)
    b = rng.integers(0, 8, n)
    names = [f"{ADJ[x]} {NOUN[y]}" for x, y in zip(a, b)]
    return pa.table(
        {
            "p_partkey": pa.array(np.arange(n, dtype=np.int64)),
            "p_name": pa.array(names),
            "p_brand": pa.array([f"Brand#{k}" for k in rng.integers(1, 26, n)]),
            "p_type": pa.array(
                [["LARGE", "ECONOMY", "SMALL", "STANDARD"][k] for k in rng.integers(0, 4, n)]
            ),
            "p_size": pa.array(rng.integers(1, 51, n).astype(np.int32)),
            "p_retailprice": pa.array(900.0 + np.arange(n) * 0.1),
        }
    )


def gen_orders(rng, n, n_cust):
    return pa.table(
        {
            "o_orderkey": pa.array(np.arange(n, dtype=np.int64)),
            "o_custkey": pa.array(rng.integers(0, n_cust, n)),
            "o_orderstatus": pa.array(
                [["O", "F", "P"][k] for k in rng.integers(0, 3, n)]
            ),
            "o_totalprice": pa.array(
                np.round(rng.uniform(900, 450_000, n), 2)
            ),
            "o_orderdate": pa.array(_dates(rng, n)),
            "o_orderpriority": pa.array(
                [
                    ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"][k]
                    for k in rng.integers(0, 5, n)
                ]
            ),
        }
    )


def gen_lineitem(rng, n, n_orders, n_parts, n_supp):
    return pa.table(
        {
            "l_orderkey": pa.array(rng.integers(0, n_orders, n)),
            "l_partkey": pa.array(rng.integers(0, n_parts, n)),
            "l_suppkey": pa.array(rng.integers(0, n_supp, n)),
            "l_linenumber": pa.array(rng.integers(1, 8, n).astype(np.int32)),
            "l_quantity": pa.array(rng.integers(1, 51, n).astype(np.float64)),
            "l_extendedprice": pa.array(np.round(rng.uniform(900, 105_000, n), 2)),
            "l_discount": pa.array(rng.integers(0, 11, n) / 100.0),
            "l_tax": pa.array(rng.integers(0, 9, n) / 100.0),
            "l_returnflag": pa.array(
                [["N", "A", "R"][k] for k in rng.integers(0, 3, n)]
            ),
            "l_linestatus": pa.array(
                [["O", "F"][k] for k in rng.integers(0, 2, n)]
            ),
            "l_shipdate": pa.array(_dates(rng, n)),
        }
    )


def gen_documents(rng, n):
    texts: list[str] = []
    prev_toks: list[str] = []
    for i in range(n):
        if i % 21 == 20 and prev_toks:
            # planted near-dup: keep the prefix, refresh ~10% of the
            # tail (>= 2 tokens) — trigram Jaccard vs parent >= ~0.6
            k = max(2, len(prev_toks) // 10)
            toks = prev_toks[: len(prev_toks) - k] + [
                VOCAB[j] for j in rng.integers(0, len(VOCAB), k)
            ]
        else:
            length = int(rng.integers(10, 101))
            toks = [VOCAB[j] for j in rng.integers(0, len(VOCAB), length)]
        prev_toks = toks
        texts.append(" ".join(toks))
    langs = rng.choice(len(LANG_NAMES), n, p=LANGS[1])
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array([LANG_NAMES[k] for k in langs]),
            "source": pa.array([f"src{k}" for k in rng.integers(0, 20, n)]),
            "n_chars": pa.array(
                np.array([len(t) for t in texts], dtype=np.int64)
            ),
        }
    )


def gen_events(rng, n, n_users):
    """Driver-matched events: 5 uniform types, value ~ Exp(mean 50)
    (driver sf0.1 measures mean≈50, sd≈50, min 0 — exponential), ts
    uniform over Jan 2024 at microsecond grain, props a 1-key JSON."""
    lo = np.datetime64("2024-01-01T00:00:00")
    span_us = 30 * 24 * 3600 * 1_000_000
    ts = lo + rng.integers(0, span_us, n).astype("timedelta64[us]")
    types = np.array(["click", "error", "purchase", "signup", "view"])
    ks = rng.integers(0, 100, n)
    return pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(ts),
            "user_id": pa.array(rng.integers(0, n_users, n).astype(np.int64)),
            "event_type": pa.array(types[rng.integers(0, 5, n)]),
            "value": pa.array(np.round(rng.exponential(50.0, n), 2)),
            "props": pa.array([f'{{"k": {k}}}' for k in ks]),
        }
    )


def gen_embeddings(rng, n, dim=64, k=10):
    """Driver-matched embeddings: unit-norm {dim}-d float32 vectors in
    {k} label clusters (center + noise, renormalized) — the shape the
    ANN/k-means/SemDeDup probes need (in-cluster cosine ≫ cross)."""
    centers = rng.normal(size=(k, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, k, n)
    vecs = centers[labels] + 0.35 * rng.normal(size=(n, dim))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(vecs.astype(np.float32))),
            "label": pa.array(labels.astype(np.int32)),
        }
    )


def main() -> int:
    sf = float(sys.argv[1])
    outdir = sys.argv[2]
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(42)
    n_part = int(200_000 * sf)
    n_orders = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_docs = int(50_000 * sf)
    n_events = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    n_vecs = int(20_000 * sf)
    for name, tbl in (
        ("part", gen_part(rng, n_part)),
        ("orders", gen_orders(rng, n_orders, n_cust)),
        ("lineitem", gen_lineitem(rng, n_li, n_orders, n_part, n_supp)),
        ("documents", gen_documents(rng, n_docs)),
        ("events", gen_events(rng, n_events, n_users)),
        ("embeddings", gen_embeddings(rng, n_vecs)),
    ):
        pq.write_table(tbl, os.path.join(outdir, f"{name}.parquet"))
        print(f"{name}: {tbl.num_rows} rows -> {outdir}/{name}.parquet")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
