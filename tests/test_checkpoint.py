"""Checkpoint/resume: atomic partition commits, lineage manifest, and the
kill-and-rerun byte-identical guarantee (SURVEY.md §5.5)."""

import glob
import os

import pandas as pd
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from gjspark.plans.checkpoint import checkpointed_write, completed_parts


@pytest.fixture()
def df(spark):
    return spark.range(0, 10_000).select(
        F.concat(F.lit("id-"), F.col("id")).alias("image_id"),
        (F.col("id") % 97).alias("cell"),
        F.concat(F.lit("file-"), F.col("id") % 3).alias("src"),
        F.rand(42).alias("v"),
    )


def _read_all(out_dir):
    files = sorted(glob.glob(os.path.join(out_dir, "part=*.parquet")))
    return pd.concat([pq.read_table(f).to_pandas() for f in files]).sort_values(
        "image_id"
    ).reset_index(drop=True)


def test_write_and_manifest(df, tmp_path):
    out = str(tmp_path / "o1")
    m = checkpointed_write(
        df, out, "job1", id_col="image_id", n_parts=16, cell_col="cell",
        source_col="src",
    )
    assert len(m) == 16
    assert m["row_count"].sum() == 10_000
    assert (m["status"] == "ok").all()
    assert (m["bytes_out"] > 0).all()
    assert m["cell_min"].min() == 0 and m["cell_max"].max() == 96
    body = _read_all(out)
    assert len(body) == 10_000
    assert list(body.columns) == ["image_id", "cell", "src", "v"]


def test_resume_skips_completed_and_is_identical(df, tmp_path):
    ref_out = str(tmp_path / "ref")
    checkpointed_write(df, ref_out, "job", id_col="image_id", n_parts=16)
    expected = _read_all(ref_out)

    # simulate a crash after 5 partitions: write only part of the data,
    # then "kill" (manifest keeps the 5 ok rows)
    out = str(tmp_path / "crash")
    part_col = F.pmod(F.xxhash64(F.col("image_id")), F.lit(16)).cast("int")
    subset = df.filter(part_col < 5)
    checkpointed_write(subset, out, "job", id_col="image_id", n_parts=16)
    assert completed_parts(out) == {0, 1, 2, 3, 4}

    # rerun with the full input: parts 0-4 must be skipped (not rewritten)
    mtimes_before = {
        f: os.path.getmtime(f) for f in glob.glob(os.path.join(out, "part=*.parquet"))
    }
    m = checkpointed_write(df, out, "job", id_col="image_id", n_parts=16, resume=True)
    for f, t in mtimes_before.items():
        assert os.path.getmtime(f) == t, f"{f} was rewritten"
    assert completed_parts(out) == set(range(16))
    # byte-identical final content vs the clean run
    got = _read_all(out)
    pd.testing.assert_frame_equal(got, expected)
    assert m["row_count"].sum() == 10_000


def test_no_double_processing_on_full_rerun(df, tmp_path):
    out = str(tmp_path / "o2")
    checkpointed_write(df, out, "job", id_col="image_id", n_parts=8)
    m2 = checkpointed_write(df, out, "job", id_col="image_id", n_parts=8, resume=True)
    # second run had nothing to do; manifest still complete
    assert m2["row_count"].sum() == 10_000
    assert len(_read_all(out)) == 10_000
