"""Extra benchmarks for optimization work (guide §1.4): per-stage noop-sink
isolation, sub-stage breakdowns of the heavy queries, and plan dumps.

NOT part of the frozen measurement contract (bench.py is); numbers from
here are cited in OPTIMIZATION_r06.md.

Usage:
    python bench_extra.py [--sf /root/testdata/sf1.0] [--only ann,minhash,...]
    python bench_extra.py --plans       # dump .explain("formatted") for all
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, label, fn, out, reps=2):
    best = 1e18
    for _ in range(reps):
        spark.sparkContext.setJobDescription(label)
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    spark.sparkContext.setJobDescription(None)
    out[label] = round(best, 3)
    print(f"{label}: {best:.3f}s", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sf", default=SF)
    p.add_argument("--only", default=None)
    p.add_argument("--reps", type=int, default=2)
    args = p.parse_args()
    sf = args.sf
    only = set(args.only.split(",")) if args.only else None

    import __spark_entry__ as E
    from pyspark.sql import functions as F

    from gjspark.session import get_spark

    spark = get_spark("gjspark-bench-extra")
    qs = E.queries()
    out: dict[str, float] = {}

    def want(name):
        return only is None or name in only

    # --- headline queries, noop-isolated -------------------------------
    for q in (
        "q_ann_topk",
        "q_minhash_pairs",
        "q_dedup_clusters",
        "q_simhash_pairs",
        "q_latest_event_per_user",
        "q_events_hourly",
        "q_validator_newer",
        "q_pricing_summary",
        "q_revenue_by_nation",
        "q_dedup_exact",
        "q_text_stats",
        "q_ivf_topk",
    ):
        if want(q):
            timed(spark, q, lambda q=q: noop(qs[q](spark, sf)), out, args.reps)

    # --- sub-stage breakdowns ------------------------------------------
    if want("ann_sub"):
        from gjspark.operators.ann import _collect_normalized

        emb = spark.read.parquet(f"{sf}/embeddings.parquet")
        timed(
            spark,
            "ann.collect_index",
            lambda: _collect_normalized(emb, "vec_id", "embedding"),
            out,
            args.reps,
        )

    if want("minhash_sub"):
        from gjspark.operators.dedup import (
            minhash_signature_udf,
            shingle_set_udf,
        )

        docs = spark.read.parquet(f"{sf}/documents.parquet")
        par = spark.sparkContext.defaultParallelism
        d = docs.repartition(par)
        timed(
            spark,
            "minhash.signatures",
            lambda: noop(
                d.select(
                    "doc_id",
                    minhash_signature_udf(128, 5)(F.col("text")).alias("sig"),
                )
            ),
            out,
            args.reps,
        )
        timed(
            spark,
            "minhash.shingle_sets",
            lambda: noop(
                d.select(
                    "doc_id", shingle_set_udf(5)(F.col("text")).alias("sh")
                )
            ),
            out,
            args.reps,
        )

    if want("simhash_sub"):
        from gjspark.operators.dedup import simhash_pairs, simhash_udf

        docs = spark.read.parquet(f"{sf}/documents.parquet")
        timed(
            spark,
            "simhash.hashes",
            lambda: noop(
                docs.select(
                    "doc_id", simhash_udf()(F.col("text")).alias("sim")
                )
            ),
            out,
            args.reps,
        )
        timed(
            spark,
            "simhash.pairs_h3",
            lambda: noop(simhash_pairs(docs, max_hamming=3)),
            out,
            args.reps,
        )
        # candidate volume before the hamming filter (the suspected explosion)
        from pyspark.sql import functions as FF

        sh = docs.select(
            F.col("doc_id").alias("id"), simhash_udf()(F.col("text")).alias("sim")
        )
        bands = [
            F.struct(
                F.lit(b).alias("bno"),
                F.shiftrightunsigned("sim", b * 16)
                .bitwiseAND(F.lit(0xFFFF))
                .alias("bval"),
            )
            for b in range(4)
        ]
        banded = sh.select(
            "id", "sim", F.explode(F.array(*bands)).alias("b")
        ).select("id", "sim", F.col("b.bno").alias("bno"), F.col("b.bval").alias("bval"))
        hot = (
            banded.groupBy("bno", "bval")
            .agg(FF.count("*").alias("c"))
            .agg(
                FF.sum(FF.col("c") * (FF.col("c") - 1) / 2).alias("cand_pairs"),
                FF.max("c").alias("hottest_bucket"),
            )
        )
        row = hot.first()
        out["simhash.cand_pairs_prefilter"] = float(row["cand_pairs"])
        out["simhash.hottest_bucket"] = int(row["hottest_bucket"])
        print(
            f"simhash candidate pairs pre-filter: {row['cand_pairs']:.0f}, "
            f"hottest bucket {row['hottest_bucket']}",
            flush=True,
        )

    if want("cc_sub"):
        from gjspark.operators.dedup import connected_components, simhash_pairs

        docs = spark.read.parquet(f"{sf}/documents.parquet")
        pairs = simhash_pairs(docs, max_hamming=3)
        pairs_mat = pairs.persist()
        n_pairs = pairs_mat.count()
        out["cc.n_pairs"] = n_pairs
        print(f"cc input pairs: {n_pairs}", flush=True)
        timed(
            spark,
            "cc.connected_components_only",
            lambda: noop(connected_components(pairs_mat)),
            out,
            args.reps,
        )
        pairs_mat.unpersist()

    print(json.dumps({"sf": sf, "results": out}))


if __name__ == "__main__":
    main()
