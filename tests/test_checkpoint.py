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


class TestLegacyManifest:
    """Manifests written before the 'file' column existed must still read
    and resume: rename-mode names are deterministic part={id}.parquet."""

    def _strip_file_column(self, out):
        import pyarrow as pa

        from gjspark.plans import checkpoint as CP

        mp = CP.manifest_path(out)
        m = pq.read_table(mp).to_pandas().drop(columns=["file"])
        pq.write_table(pa.Table.from_pandas(m, preserve_index=False), mp)

    def test_read_falls_back_to_deterministic_names(self, df, tmp_path):
        from gjspark.plans import checkpoint as CP

        out = str(tmp_path / "leg1")
        CP.checkpointed_write(df, out, "j", id_col="image_id", n_parts=8)
        self._strip_file_column(out)
        body = CP.read_checkpointed(df.sparkSession, out).toPandas()
        assert len(body) == 10_000

    def test_resume_over_legacy_manifest_has_no_nan_files(self, df, tmp_path):
        from gjspark.plans import checkpoint as CP

        out = str(tmp_path / "leg2")
        part_col = F.pmod(F.xxhash64(F.col("image_id")), F.lit(8)).cast("int")
        CP.checkpointed_write(
            df.filter(part_col < 4), out, "j", id_col="image_id", n_parts=8
        )
        self._strip_file_column(out)
        full = CP.checkpointed_write(df, out, "j", id_col="image_id", n_parts=8)
        assert sorted(full["part_id"]) == list(range(8))
        assert full["file"].notna().all()
        body = CP.read_checkpointed(df.sparkSession, out).toPandas()
        assert len(body) == 10_000 and body["image_id"].is_unique

    def test_empty_ok_set_raises_clearly(self, df, tmp_path):
        from gjspark.plans import checkpoint as CP

        out = str(tmp_path / "leg3")
        CP.checkpointed_write(df, out, "j", id_col="image_id", n_parts=4)
        import pyarrow as pa

        mp = CP.manifest_path(out)
        m = pq.read_table(mp).to_pandas()
        m["status"] = "failed"
        pq.write_table(pa.Table.from_pandas(m, preserve_index=False), mp)
        with pytest.raises(ValueError, match="no status='ok'"):
            CP.read_checkpointed(df.sparkSession, out)


class TestUniqueNameCommit:
    """Object-store twin (no atomic rename): parts write straight to
    unique object names; the manifest is the only source of truth and
    readers must never trust the directory listing."""

    def test_writes_unique_names_and_reader_uses_manifest(self, df, tmp_path):
        from gjspark.plans.checkpoint import read_checkpointed

        out = str(tmp_path / "os1")
        m = checkpointed_write(
            df, out, "j", id_col="image_id", n_parts=8, commit="unique-name"
        )
        assert len(m) == 8 and (m["status"] == "ok").all()
        # every committed file has an attempt suffix, no tmp leftovers
        for f in m["file"]:
            assert "-" in f and f.endswith(".parquet")
        assert not glob.glob(os.path.join(out, "*.tmp-*"))
        body = (
            read_checkpointed(df.sparkSession, out)
            .toPandas()
            .sort_values("image_id")
            .reset_index(drop=True)
        )
        assert len(body) == 10_000

    def test_orphaned_attempt_files_are_invisible(self, df, tmp_path):
        """A failed attempt leaves half-written objects in the directory
        (object stores cannot clean atomically). The manifest never lists
        them, so the reader must return exactly one copy of every row."""
        from gjspark.plans.checkpoint import read_checkpointed

        out = str(tmp_path / "os2")
        checkpointed_write(
            df, out, "j", id_col="image_id", n_parts=8, commit="unique-name"
        )
        # plant orphans: a duplicate data file AND a garbage half-object,
        # both with valid-looking unique names
        committed = glob.glob(os.path.join(out, "part=3-*.parquet"))[0]
        dup = os.path.join(out, "part=3-deadbeef0000.parquet")
        with open(committed, "rb") as a, open(dup, "wb") as b:
            b.write(a.read())
        with open(os.path.join(out, "part=5-feedface0000.parquet"), "wb") as f:
            f.write(b"PAR1 half-written garbage from a killed attempt")
        body = (
            read_checkpointed(df.sparkSession, out)
            .toPandas()
            .sort_values("image_id")
            .reset_index(drop=True)
        )
        assert len(body) == 10_000  # no duplicates, no crash on garbage
        assert body["image_id"].is_unique

    def test_resume_recommits_only_missing_parts(self, df, tmp_path):
        from gjspark.plans import checkpoint as CP

        out = str(tmp_path / "os3")
        CP.checkpointed_write(
            df, out, "j", id_col="image_id", n_parts=8, commit="unique-name"
        )
        # simulate a crash that lost parts 2 and 6 from the manifest
        # (their attempt files remain as orphans)
        mp = CP.manifest_path(out)
        m = pq.read_table(mp).to_pandas()
        kept = m[~m["part_id"].isin([2, 6])]
        import pyarrow as pa

        pq.write_table(pa.Table.from_pandas(kept, preserve_index=False), mp)
        n_files_before = len(glob.glob(os.path.join(out, "part=*.parquet")))
        full = CP.checkpointed_write(
            df, out, "j", id_col="image_id", n_parts=8, commit="unique-name"
        )
        # resumed manifest complete; only the two missing parts re-ran
        assert sorted(full["part_id"]) == list(range(8))
        assert full["row_count"].sum() == 10_000
        n_files_after = len(glob.glob(os.path.join(out, "part=*.parquet")))
        assert n_files_after == n_files_before + 2  # orphans remain, ignored
        body = (
            CP.read_checkpointed(df.sparkSession, out)
            .toPandas()
            .sort_values("image_id")
            .reset_index(drop=True)
        )
        assert len(body) == 10_000 and body["image_id"].is_unique
