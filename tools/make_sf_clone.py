"""Generate a statistically-matched clone of the driver's sf1.0 testdata.

The driver generates its measurement-scale tables itself (BENCH_r05.json
recorded "sf": /root/testdata/sf1.0) and that directory does not survive
sandbox resets. This tool rebuilds a clone at the same row counts with
the same generative processes inferred from the committed sf0.001/0.01/
0.1 sets (vocab, near-dup plant rate, cluster structure, key ranges), so
optimization A/Bs can run at the driver's measurement scale. It is NOT
driver data: correctness is still gated on the real sf0.01 oracle; this
clone exists only so before/after timings are taken at the right scale.

Usage: python tools/make_sf_clone.py [outdir] [scale]
  outdir default /root/sfclone1.0, scale default 10 (x sf0.1 counts).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

SRC = "/root/testdata/sf0.1"

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]


def make_documents(rng, n):
    n_words = rng.integers(10, 101, size=n)
    texts = []
    for i in range(n):
        texts.append(" ".join(rng.choice(VOCAB, size=n_words[i])))
    # 5% planted near-dups: copy of an earlier doc + " dup" (matches the
    # 250/5000 rate and trailing-"dup" marker observed in sf0.1)
    n_dup = n // 20
    dup_ids = rng.choice(n, size=n_dup, replace=False)
    for i in dup_ids:
        src = int(rng.integers(0, n))
        if src != i:
            texts[i] = texts[src] + " dup"
    langs = rng.choice(LANGS, size=n, p=LANG_P)
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": texts,
            "lang": langs,
            "source": [f"src{i % 20}" for i in range(n)],
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )


def make_embeddings(rng, n, dim=64, k=10):
    centers = rng.normal(0, 0.12, size=(k, dim)).astype(np.float32)
    labels = rng.integers(0, k, size=n)
    vecs = centers[labels] + rng.normal(0, 0.09, size=(n, dim)).astype(
        np.float32
    )
    return pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": list(vecs.astype(np.float32)),
            "label": labels.astype(np.int64),
        }
    )


def make_events(rng, n, n_users):
    steps = rng.uniform(0.2, 5.0, size=n)
    ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(
        np.cumsum(steps) * (30 * 86400) / steps.sum(), unit="s"
    )
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": ts.astype("datetime64[us]"),
            "user_id": rng.integers(0, n_users, size=n).astype(np.int64),
            "event_type": rng.choice(
                ["signup", "purchase", "view", "click", "error"], size=n
            ),
            "value": np.round(rng.uniform(0, 560, size=n), 2),
            "props": [f'{{"k": {int(v)}}}' for v in rng.integers(0, 100, size=n)],
        }
    )


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/sfclone1.0"
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(4242)

    # small dims copied verbatim (they are sf-invariant)
    for t in ("region", "nation"):
        pd.read_parquet(f"{SRC}/{t}.parquet").to_parquet(
            f"{out}/{t}.parquet", index=False
        )

    n_cust = 15_000 * scale
    n_supp = 1_000 * scale
    n_part = 20_000 * scale
    n_ord = 150_000 * scale
    n_li = 600_000 * scale

    pd.DataFrame(
        {
            "c_custkey": np.arange(n_cust, dtype=np.int64),
            "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
            "c_nationkey": rng.integers(0, 25, size=n_cust).astype(np.int32),
            "c_acctbal": np.round(rng.uniform(-999, 9999, size=n_cust), 2),
            "c_mktsegment": rng.choice(
                ["MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE"],
                size=n_cust,
            ),
        }
    ).to_parquet(f"{out}/customer.parquet", index=False)

    pd.DataFrame(
        {
            "s_suppkey": np.arange(n_supp, dtype=np.int64),
            "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
            "s_nationkey": rng.integers(0, 25, size=n_supp).astype(np.int32),
            "s_acctbal": np.round(rng.uniform(-999, 9999, size=n_supp), 2),
        }
    ).to_parquet(f"{out}/supplier.parquet", index=False)

    adjs = ["large", "hot", "cold", "small", "shiny", "dull", "red", "blue"]
    nouns = ["ring", "bolt", "nut", "gear", "pin", "rod", "cap", "disk"]
    pd.DataFrame(
        {
            "p_partkey": np.arange(n_part, dtype=np.int64),
            "p_name": [
                f"{adjs[i % len(adjs)]} {nouns[(i // 8) % len(nouns)]}"
                for i in range(n_part)
            ],
            "p_brand": [f"Brand#{1 + i % 25}" for i in range(n_part)],
            "p_type": rng.choice(
                ["LARGE", "ECONOMY", "STANDARD", "SMALL", "MEDIUM", "PROMO"],
                size=n_part,
            ),
            "p_size": rng.integers(1, 51, size=n_part).astype(np.int64),
            "p_retailprice": np.round(900 + np.arange(n_part) * 0.1, 2),
        }
    ).to_parquet(f"{out}/part.parquet", index=False)

    odates = pd.Timestamp("1995-01-01") + pd.to_timedelta(
        rng.integers(0, 2404, size=n_ord), unit="D"
    )
    pd.DataFrame(
        {
            "o_orderkey": np.arange(n_ord, dtype=np.int64),
            "o_custkey": rng.integers(0, n_cust, size=n_ord).astype(np.int64),
            "o_orderstatus": rng.choice(["P", "O", "F"], size=n_ord),
            "o_totalprice": np.round(rng.uniform(1000, 500000, size=n_ord), 2),
            "o_orderdate": odates.astype("datetime64[us]"),
            "o_orderpriority": rng.choice(
                [
                    "1-URGENT",
                    "2-HIGH",
                    "3-MEDIUM",
                    "4-NOT SPECIFIED",
                    "5-LOW",
                ],
                size=n_ord,
            ),
        }
    ).to_parquet(f"{out}/orders.parquet", index=False)

    sdates = pd.Timestamp("1995-01-02") + pd.to_timedelta(
        rng.integers(0, 2498, size=n_li), unit="D"
    )
    pd.DataFrame(
        {
            "l_orderkey": rng.integers(0, n_ord, size=n_li).astype(np.int64),
            "l_partkey": rng.integers(0, n_part, size=n_li).astype(np.int64),
            "l_suppkey": rng.integers(0, n_supp, size=n_li).astype(np.int64),
            "l_linenumber": rng.integers(1, 8, size=n_li).astype(np.int32),
            "l_quantity": rng.integers(1, 51, size=n_li).astype(np.float64),
            "l_extendedprice": np.round(rng.uniform(900, 105000, size=n_li), 2),
            "l_discount": np.round(rng.integers(0, 11, size=n_li) * 0.01, 2),
            "l_tax": np.round(rng.integers(0, 9, size=n_li) * 0.01, 2),
            "l_returnflag": rng.choice(["A", "N", "R"], size=n_li),
            "l_linestatus": rng.choice(["O", "F"], size=n_li),
            "l_shipdate": sdates.astype("datetime64[us]"),
        }
    ).to_parquet(f"{out}/lineitem.parquet", index=False)

    make_events(rng, 100_000 * scale, n_cust).to_parquet(
        f"{out}/events.parquet", index=False
    )
    make_documents(rng, 5_000 * scale).to_parquet(
        f"{out}/documents.parquet", index=False
    )
    make_embeddings(rng, 2_000 * scale).to_parquet(
        f"{out}/embeddings.parquet", index=False
    )
    open(f"{out}/_DONE", "w").close()
    print(f"wrote {out} at scale {scale}x sf0.1")


if __name__ == "__main__":
    main()
