"""Interleaved two-size spatial A/B for the 2M-cliff criterion.

Runs the decode -> rollup -> mosaic stages for BOTH corpus sizes
alternately inside ONE Spark session (500k, 2M, 500k, 2M, ...) and takes
min-of-R per (size, stage). Host noise on this box is nonstationary on
minute timescales (same-binary mosaic has measured 2.9s..27.8s across
windows); alternating the sizes every ~2 minutes makes slow drift hit
both sides of the per-row ratio, which is the quantity the 2M-vs-500k
memory-cliff gate (VERDICT r4 item 3) is about. The bench noise probe
brackets the run so the artifact carries an honest window verdict.

Usage: python tools/scaling_pair.py [--reps 3] [--master local[32]]
Writes BENCH/scaling_pair_r5.json unless --out is given.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_CLK = os.sysconf("SC_CLK_TCK")


def _vm_cpu_sec() -> float:
    """Cumulative user+nice+system CPU seconds of the WHOLE VM.

    Co-tenant contention on this shared host is hypervisor steal —
    invisible to the VM's own tick counters — so stage-delta CPU
    seconds are noise-immune where wall clock is not. Nothing else
    runs in this VM during a sweep, so the delta is the job's cost.
    """
    with open("/proc/stat") as f:
        parts = f.readline().split()
    return (int(parts[1]) + int(parts[2]) + int(parts[3])) / _CLK


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sizes", default="500000,2000000")
    ap.add_argument("--master", default=None)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "scaling_pair_r5.json"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from bench import _noise_probe, _spatial_dfs
    from gjspark.fixtures.generator import ensure_bench_images, ensure_fixtures
    from gjspark.session import get_spark

    ensure_fixtures()
    sizes = [int(s) for s in args.sizes.split(",")]
    # legacy 4-format corpus: keeps the pair comparable to the r3/r4 sweeps
    paths = {n: ensure_bench_images(n, jpeg=False) for n in sizes}
    master = args.master or "local[32]"
    n_threads = int(master.split("[")[1].rstrip("]"))
    spark = get_spark(
        "gjspark-scaling-pair",
        master=master,
        shuffle_partitions=max(2 * n_threads, 16),
    )

    import __spark_entry__ as E

    qs = E.queries()
    probe_before = _noise_probe(spark, qs)
    print(f"probe before: {probe_before}", flush=True)

    best: dict[int, dict[str, float]] = {n: {} for n in sizes}
    best_cpu: dict[int, dict[str, float]] = {n: {} for n in sizes}
    series: list[dict] = []
    from pyspark import StorageLevel

    # Blob-bearing frame cache level, mirroring run_bench: DISK_ONLY by
    # default (the A/B this tool ran measured heap-resident blobs as the
    # residual per-row decode-growth driver — CPU ratio 1.39 heap / 1.31
    # disk, disk also best absolute at both sizes); flip with
    # SPARK_GRAFT_BLOB_CACHE=memory to reproduce the heap variant.
    blob_level = (
        StorageLevel.MEMORY_AND_DISK
        if os.environ.get("SPARK_GRAFT_BLOB_CACHE") == "memory"
        else StorageLevel.DISK_ONLY
    )
    for rep in range(args.reps):
        for n in sizes:
            d = _spatial_dfs(spark, paths[n])
            images = d["images"].persist(blob_level)
            images.count()
            t: dict[str, float] = {}
            c: dict[str, float] = {}
            t0, c0 = time.time(), _vm_cpu_sec()
            feat = d["decoded_features"](images).persist()
            feat.agg(F.sum("pix_crc32")).collect()
            t["decode_fused"], c["decode_fused"] = time.time() - t0, _vm_cpu_sec() - c0
            t0, c0 = time.time(), _vm_cpu_sec()
            d["rollup"](feat).collect()
            t["tile_rollup"], c["tile_rollup"] = time.time() - t0, _vm_cpu_sec() - c0
            t0, c0 = time.time(), _vm_cpu_sec()
            d["mosaic"](feat).count()
            t["mosaic"], c["mosaic"] = time.time() - t0, _vm_cpu_sec() - c0
            feat.unpersist()
            images.unpersist()
            d["features"].unpersist()
            d["locations"].unpersist()
            for k, v in t.items():
                best[n][k] = min(best[n].get(k, 1e18), v)
            for k, v in c.items():
                best_cpu[n][k] = min(best_cpu[n].get(k, 1e18), v)
            series.append(
                {
                    "rep": rep,
                    "n": n,
                    **{k: round(v, 3) for k, v in t.items()},
                    **{f"cpu_{k}": round(v, 1) for k, v in c.items()},
                }
            )
            print(
                f"rep={rep} n={n} "
                + " ".join(f"{k}={v:.2f}/cpu{c[k]:.0f}" for k, v in t.items()),
                flush=True,
            )

    probe_after = _noise_probe(spark, qs)
    print(f"probe after: {probe_after}", flush=True)

    lo, hi = min(sizes), max(sizes)
    ratio = {
        k: round((best[hi][k] / hi) / (best[lo][k] / lo), 3)
        for k in best[lo]
        if k in best[hi]
    }
    ratio_cpu = {
        k: round((best_cpu[hi][k] / hi) / (best_cpu[lo][k] / lo), 3)
        for k in best_cpu[lo]
        if k in best_cpu[hi]
    }
    out = {
        "master": master,
        "reps": args.reps,
        "corpus": "legacy 4-format",
        "best_sec": {str(n): {k: round(v, 3) for k, v in best[n].items()} for n in sizes},
        "best_cpu_sec": {
            str(n): {k: round(v, 1) for k, v in best_cpu[n].items()} for n in sizes
        },
        "per_row_cost_ratio_hi_vs_lo": ratio,
        "per_row_cpu_ratio_hi_vs_lo": ratio_cpu,
        "sizes": sizes,
        "probe_before": probe_before,
        "probe_after": probe_after,
        "series": series,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(
        json.dumps(
            {
                "per_row_cost_ratio": ratio,
                "per_row_cpu_ratio": ratio_cpu,
                "best": out["best_sec"],
                "best_cpu": out["best_cpu_sec"],
            }
        )
    )


if __name__ == "__main__":
    main()
