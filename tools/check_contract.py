"""Offline twin of the driver's correctness gate: run each contract
query via __spark_entry__.queries() and its oracle_sql() in DuckDB at
sf0.01, sort columns by name, sort rows, compare values.

Usage: python tools/check_contract.py [q_name ...]   (default: all)
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")
import __spark_entry__ as E  # noqa: E402
from gjspark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("int64")
    df = df[sorted(df.columns)]
    return df.sort_values(sorted(df.columns)).reset_index(drop=True)


def main() -> int:
    sf = "/root/testdata/sf0.01"
    names = sys.argv[1:] or list(E.queries())
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from read_parquet('{sf}/{t}.parquet')"
        )
    oracles = E.oracle_sql()
    failures = 0
    for name in names:
        q = E.queries()[name]
        sdf = q(spark, sf).toPandas()
        if name not in oracles:
            print(f"{name}: rows={len(sdf)} (no oracle)")
            continue
        odf = con.execute(oracles[name]).df()
        a, b = norm(sdf), norm(odf)
        status = "OK"
        if list(a.columns) != list(b.columns):
            status = f"SCHEMA MISMATCH {list(a.columns)} vs {list(b.columns)}"
        elif len(a) != len(b):
            status = f"ROWS MISMATCH {len(a)} vs {len(b)}"
        else:
            try:
                pd.testing.assert_frame_equal(a, b, check_dtype=False)
            except AssertionError as e:
                status = "VALUES MISMATCH: " + str(e).splitlines()[-1][:200]
        if status != "OK":
            failures += 1
        print(f"{name}: rows={len(a)}/{len(b)} {status}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
