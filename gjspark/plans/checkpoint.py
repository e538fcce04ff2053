"""Checkpointed, resumable writes with per-partition lineage + metrics
(north rule: "resumable from per-partition checkpoints carrying lineage
(source file, cell range, row counts) and metrics").

Not a Spark built-in at this granularity (SURVEY.md §4.5). Design:

- the caller supplies a deterministic partition key (default
  ``pmod(xxhash64(id_col), n_parts)``) so the data->logical-partition
  mapping is a pure function of the data — identical across runs and
  cluster sizes;
- ``groupBy(part_id).applyInPandas`` writes each logical partition to
  ``<out>/part=<id>.parquet`` atomically (temp file + rename) and emits
  one manifest row ``(job_id, part_id, row_count, bytes_out, cell_min,
  cell_max, source_files, wall_ms, status)``;
- the manifest itself is committed last (parquet + ``_SUCCESS.json``);
- resume = anti-join: completed part_ids (from the manifest) are filtered
  out *before* any work — their images are never decoded again — and the
  surviving partitions append their manifest rows.

The reference's analogue is nothing more than a progress callback
(``utils/ProgressTracker.java:17-26``) and insert/update counters
(``utils/ObservationUploader.java:83-114``); at 10^12 rows restartability
must be data-level, hence this design.
"""

from __future__ import annotations

import json
import os
import time

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("job_id", T.StringType()),
        T.StructField("part_id", T.IntegerType()),
        T.StructField("row_count", T.LongType()),
        T.StructField("bytes_out", T.LongType()),
        T.StructField("cell_min", T.LongType()),
        T.StructField("cell_max", T.LongType()),
        T.StructField("source_files", T.StringType()),
        T.StructField("wall_ms", T.LongType()),
        T.StructField("status", T.StringType()),
    ]
)


def manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest.parquet")


def completed_parts(out_dir: str) -> set[int]:
    mp = manifest_path(out_dir)
    if not os.path.exists(mp):
        return set()
    pdf = pq.read_table(mp).to_pandas()
    return set(pdf.loc[pdf["status"] == "ok", "part_id"].astype(int))


def checkpointed_write(
    df: DataFrame,
    out_dir: str,
    job_id: str,
    id_col: str,
    n_parts: int = 64,
    cell_col: str | None = None,
    source_col: str | None = None,
    resume: bool = True,
) -> pd.DataFrame:
    """Write ``df`` to ``out_dir`` in ``n_parts`` deterministic logical
    partitions; returns the full manifest (pandas). Safe to re-run: on
    resume, completed partitions are skipped entirely."""
    os.makedirs(out_dir, exist_ok=True)
    done = completed_parts(out_dir) if resume else set()

    work = df.withColumn(
        "__part", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_parts)).cast("int")
    )
    if done:
        work = work.filter(~F.col("__part").isin(*[int(p) for p in done]))

    data_cols = [c for c in df.columns]
    cell = cell_col if cell_col in data_cols else None
    src = source_col if source_col in data_cols else None

    def write_group(pdf: pd.DataFrame) -> pd.DataFrame:
        t0 = time.time()
        part = int(pdf["__part"].iloc[0])
        body = pdf[data_cols]
        final = os.path.join(out_dir, f"part={part}.parquet")
        tmp = final + f".tmp-{os.getpid()}"
        table = pa.Table.from_pandas(body, preserve_index=False)
        pq.write_table(table, tmp)
        size = os.path.getsize(tmp)
        os.replace(tmp, final)  # atomic commit of the partition
        return pd.DataFrame(
            [
                {
                    "job_id": job_id,
                    "part_id": part,
                    "row_count": len(body),
                    "bytes_out": size,
                    "cell_min": int(pdf[cell].min()) if cell else 0,
                    "cell_max": int(pdf[cell].max()) if cell else 0,
                    "source_files": json.dumps(
                        sorted(pdf[src].astype(str).unique().tolist())[:20]
                    )
                    if src
                    else "[]",
                    "wall_ms": int((time.time() - t0) * 1000),
                    "status": "ok",
                }
            ]
        )

    new_manifest = (
        work.groupBy("__part").applyInPandas(write_group, MANIFEST_SCHEMA).toPandas()
    )

    mp = manifest_path(out_dir)
    if resume and os.path.exists(mp):
        old = pq.read_table(mp).to_pandas()
        old = old[~old["part_id"].isin(new_manifest["part_id"])]
        full = pd.concat([old, new_manifest], ignore_index=True)
    else:
        full = new_manifest
    tmp = mp + ".tmp"
    pq.write_table(pa.Table.from_pandas(full, preserve_index=False), tmp)
    os.replace(tmp, mp)
    with open(os.path.join(out_dir, "_SUCCESS.json"), "w") as f:
        json.dump(
            {
                "job_id": job_id,
                "parts": int(full["part_id"].nunique()),
                "rows": int(full["row_count"].sum()),
                "bytes": int(full["bytes_out"].sum()),
            },
            f,
        )
    return full
