"""Reproduce the grading driver's contract check for selected queries.

Usage: python tools/verify_contract.py [q_name ...]   (default: all)
Compares queries()[q](spark, sf0.01) against oracle_sql()[q] in DuckDB:
row count, schema (column names), and value hash over name-sorted columns
and sorted rows — the same shape as CORRECTNESS_r*.json.
"""
import os
import sys
import hashlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

import __spark_entry__ as E
from gjspark.session import get_spark

SF = "/root/testdata/sf0.01"
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def canon(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.round(6)
        elif s.dtype == object:
            df[c] = s.map(lambda v: str(sorted(v)) if isinstance(v, (list, np.ndarray)) else str(v))
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()


def main():
    names = sys.argv[1:] or list(E.queries())
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from read_parquet('{SF}/{t}.parquet')")
    oracles = E.oracle_sql()
    qs = E.queries()
    fails = []
    for name in names:
        sdf = qs[name](spark, SF).toPandas()
        if name not in oracles:
            print(f"{name}: rows={len(sdf)} (no oracle)")
            continue
        odf = con.execute(oracles[name]).df()
        rows = len(sdf) == len(odf)
        schema = sorted(sdf.columns) == sorted(odf.columns)
        h = canon(sdf) == canon(odf) if rows and schema else False
        ok = rows and schema and h
        print(f"{name}: rows={len(sdf)}/{len(odf)} schema={schema} hash={h} -> {'OK' if ok else 'FAIL'}")
        if not ok:
            fails.append(name)
            if not schema:
                print("  spark cols:", sorted(sdf.columns))
                print("  oracle cols:", sorted(odf.columns))
    if fails:
        sys.exit(f"FAILED: {fails}")
    print("all green")


if __name__ == "__main__":
    main()
