"""Regenerate committed goldens that depend on the driver's testdata
(currently: expected_ivf_sf001.parquet — IVF probing has no SQL twin;
the engine output is deterministic across parallelism, so the golden
pins it for the correctness gate).

Usage: python tools/make_testdata_goldens.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import __spark_entry__ as E  # noqa: E402
from gjspark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark()
    pdf = (
        E.q_ivf_topk(spark, "/root/testdata/sf0.01")
        .toPandas()
        .sort_values(["vec_id", "neighbor_id"])
        .reset_index(drop=True)
    )
    out = f"{E.FIX}/expected_ivf_sf001.parquet"
    pdf.to_parquet(out, index=False)
    print(f"wrote {out}: {len(pdf)} rows")
    spark.stop()


if __name__ == "__main__":
    main()
