"""spark-submit entry point (north rule: "launched via spark-submit
--py-files").

Usage:
    python -m gjspark.plans.job --images <path|iceberg-table> \
        --features <geojson-dir> --out <dir> [--resume] [--master local[32]]

Cluster launch:
    zip -r gjspark.zip gjspark
    spark-submit --py-files gjspark.zip gjspark/plans/job.py --images ...
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def load_config(path: str) -> dict:
    """JSON job-config round-trip (reference S8,
    ``GeoJsonImportController.java:116-129`` loads / ``:277-304`` saves a
    GSON config tree; ours is a plain JSON dict of job parameters)."""
    with open(path) as f:
        return json.load(f)


def save_config(cfg: dict, path: str) -> None:
    with open(path, "w") as f:
        json.dump(cfg, f, indent=2, sort_keys=True)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--config", default=None, help="JSON config file; CLI overrides")
    p.add_argument("--images")
    p.add_argument("--features")
    p.add_argument("--out")
    p.add_argument("--job-id", default="gjspark-job")
    p.add_argument("--master", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--n-parts", type=int, default=64)
    p.add_argument("--dry-run", action="store_true",
                   help="build plans, print schemas, skip writes (parity: "
                   "the reference's noAct flag, StaService.java:106-128)")
    args = p.parse_args(argv)
    if args.config:
        cfg = load_config(args.config)
        for k, v in cfg.items():
            k2 = k.replace("-", "_")
            if getattr(args, k2, None) in (None, False):
                setattr(args, k2, v)
    for req in ("images", "features"):
        if not getattr(args, req):
            p.error(f"--{req} is required (CLI or --config)")
    if not args.out and not args.dry_run:
        p.error("--out is required (CLI or --config)")

    from gjspark.plans.pipeline import build_pipeline, run_pipeline
    from gjspark.session import get_spark

    spark = get_spark("gjspark-job", master=args.master)
    t0 = time.time()
    if args.dry_run:
        dfs = build_pipeline(spark, args.images, args.features)
        for name, df in dfs.items():
            print(f"== {name}: {df.schema.simpleString()}")
        return 0
    summary = run_pipeline(
        spark,
        args.images,
        args.features,
        args.out,
        job_id=args.job_id,
        resume=args.resume,
        n_parts=args.n_parts,
    )
    summary["wall_sec"] = round(time.time() - t0, 2)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
