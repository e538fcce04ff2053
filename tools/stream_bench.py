"""Streaming ingest at bench scale with a mid-run kill (round-3 verdict
item 9): drain the 500k bench corpus through ``streaming/ingest.py`` in
micro-batches, SIGKILL the driver mid-run, restart, and verify
exactly-once; then time an uninterrupted drain vs the equivalent batch
job.

Usage: python tools/stream_bench.py [n_rows]      (default 500000)
Prints one JSON line:
  {"n": ..., "files": ..., "killed_after_s": ..., "rows_out": ...,
   "distinct_ids": ..., "exactly_once": true, "stream_wall_s": ...,
   "stream_rows_per_s": ..., "batch_wall_s": ..., "batch_rows_per_s": ...}

The kill phase runs in a subprocess (its own JVM) and is killed with
SIGKILL — a real crash, not a graceful stop. The restarted query resumes
from the file-source checkpoint; the parquet sink's ``_spark_metadata``
transaction log makes partially-committed batches invisible to readers.
"""

import json
import os
import shutil
import signal
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_CHILD = """
import sys
sys.path.insert(0, {repo!r})
from gjspark.session import get_spark
from gjspark.streaming.ingest import ingest_images
spark = get_spark("stream-kill-child")
q = ingest_images(spark, {src!r}, {out!r}, {ckpt!r})
q.awaitTermination()
print("DRAINED", flush=True)
"""


def _split_landing(src_parquet: str, landing: str, n_files: int) -> int:
    import pyarrow.parquet as pq

    t = pq.read_table(src_parquet)
    os.makedirs(landing, exist_ok=True)
    n = t.num_rows
    step = -(-n // n_files)
    for i in range(n_files):
        pq.write_table(t.slice(i * step, step), f"{landing}/batch-{i:03d}.parquet")
    return n


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    from gjspark.fixtures.generator import ensure_bench_images

    src_parquet = ensure_bench_images(n_rows)
    work = tempfile.mkdtemp(prefix="stream-bench-")
    landing = os.path.join(work, "landing")
    out = os.path.join(work, "out")
    ckpt = os.path.join(work, "ckpt")
    n = _split_landing(src_parquet, landing, 32)

    # phase 1: start draining in a child JVM, SIGKILL it mid-run
    child = subprocess.Popen(
        [sys.executable, "-c", _CHILD.format(repo=REPO, src=landing, out=out, ckpt=ckpt)],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
    )
    kill_after = 25.0  # seconds — mid-drain for 500k on this box
    t0 = time.time()
    try:
        child.wait(timeout=kill_after)
        killed = False  # finished before the kill window (small inputs)
    except subprocess.TimeoutExpired:
        child.send_signal(signal.SIGKILL)
        child.wait()
        killed = True
    killed_after = round(time.time() - t0, 1)

    # phase 2: restart and drain to completion (timed from here)
    from gjspark.session import get_spark
    from gjspark.streaming.ingest import ingest_images

    spark = get_spark("stream-bench")
    t1 = time.time()
    q = ingest_images(spark, landing, out, ckpt)
    q.awaitTermination()
    resume_wall = round(time.time() - t1, 1)

    # exactly-once check: the sink's _spark_metadata log hides any
    # partially-committed batch from the killed attempt
    got = spark.read.parquet(out)
    rows_out = got.count()
    distinct_ids = got.select("image_id").distinct().count()

    # phase 3: uninterrupted drain wall (fresh dirs) for the throughput
    out2, ckpt2 = os.path.join(work, "out2"), os.path.join(work, "ckpt2")
    t2 = time.time()
    q = ingest_images(spark, landing, out2, ckpt2)
    q.awaitTermination()
    stream_wall = round(time.time() - t2, 1)

    # batch twin: same read -> cells -> partitioned write
    from pyspark.sql import functions as F

    from gjspark.operators.cells import with_cell_columns
    from gjspark.streaming.ingest import IMAGES_SCHEMA

    out3 = os.path.join(work, "out3")
    t3 = time.time()
    batch = with_cell_columns(spark.read.schema(IMAGES_SCHEMA).parquet(landing))
    from gjspark.functions import h3 as h3f
    import pandas as pd
    import numpy as np
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql import types as T

    @pandas_udf(T.LongType())
    def _parent(cell: pd.Series) -> pd.Series:
        return pd.Series(h3f.cell_to_parent(cell.to_numpy(dtype=np.int64), 5))

    batch.withColumn("h3_r5", _parent(F.col("h3_r7"))).write.partitionBy(
        "h3_r5"
    ).mode("overwrite").parquet(out3)
    batch_wall = round(time.time() - t3, 1)

    print(
        json.dumps(
            {
                "n": n,
                "files": 32,
                "killed": killed,
                "killed_after_s": killed_after,
                "resume_wall_s": resume_wall,
                "rows_out": rows_out,
                "distinct_ids": distinct_ids,
                "exactly_once": rows_out == n and distinct_ids == n,
                "stream_wall_s": stream_wall,
                "stream_rows_per_s": round(n / stream_wall, 1),
                "batch_wall_s": batch_wall,
                "batch_rows_per_s": round(n / batch_wall, 1),
            }
        )
    )
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
