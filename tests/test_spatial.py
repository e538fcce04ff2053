"""E2E spatial pipeline vs the committed numpy-oracle goldens
(SURVEY.md §5.5): cell assignment, PIP join (broadcast + bucketed), kNN,
decode invariants, salted tiling == unsalted tiling."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gjspark.fixtures import generator as gen
from gjspark.functions import codecs as C
from gjspark.operators.cells import with_cell_columns
from gjspark.operators.multimodal import decode_stats
from gjspark.operators.spatial_join import knn_join, pip_join
from gjspark.operators.tiling import cell_tile_rollup
from gjspark.sources.geojson import read_feature_collection


@pytest.fixture(scope="module")
def images(spark, fixtures_dir):
    # single-file parquet = ONE input split: without the repartition every
    # decode-heavy operator in this module serializes on one core (~30-55s
    # per test). All kernels are partitioning-independent (bit-exactness
    # is itself under test), so fanning out changes timing only.
    df = with_cell_columns(
        spark.read.parquet(f"{fixtures_dir}/images_sf_e2e.parquet").repartition(64)
    ).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def features(spark, fixtures_dir):
    return read_feature_collection(
        spark, f"{fixtures_dir}/features_nuts.geojson"
    ).cache()


@pytest.fixture(scope="module")
def locations(spark):
    feats = gen.make_features()
    cents = gen.feature_centroids(feats)
    return spark.createDataFrame(
        [
            (f["id"], float(c[1]), float(c[0]))
            for f, c in zip(feats, cents)
        ],
        "location_id string, lat double, lon double",
    )


def test_cell_assignment_matches_golden(images, fixtures_dir):
    got = (
        images.select("image_id", *[f"h3_r{r}" for r in range(7, 13)], "s2_cell")
        .toPandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    exp = (
        pd.read_parquet(f"{fixtures_dir}/expected_cells.parquet")
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    for col in exp.columns:
        assert (got[col].to_numpy() == exp[col].to_numpy()).all(), col


@pytest.mark.parametrize("broadcast", [True, False])
def test_pip_join_matches_golden(images, features, fixtures_dir, broadcast):
    got = pip_join(images, features, broadcast_cover=broadcast).toPandas()
    exp = pd.read_parquet(f"{fixtures_dir}/expected_pip.parquet")
    got_set = set(zip(got["image_id"], got["feature_id"]))
    exp_set = set(zip(exp["image_id"], exp["feature_id"]))
    assert got_set == exp_set


def test_knn_matches_golden(images, locations, fixtures_dir):
    got = knn_join(images, locations).toPandas()
    exp = pd.read_parquet(f"{fixtures_dir}/expected_knn.parquet")
    assert len(got) == len(exp)
    m = got.merge(exp, on="image_id", suffixes=("_got", "_exp"))
    assert (m["nearest_location_id_got"] == m["nearest_location_id_exp"]).all()
    assert np.allclose(m["dist_m_got"], m["dist_m_exp"], atol=0.01)


def test_knn_cellwise_variant_matches_golden(images, locations, fixtures_dir):
    """The shuffle-join variant (for non-broadcastable location sets) must
    agree with the map-only default and the oracle."""
    from gjspark.operators.spatial_join import knn_join_cellwise

    got = (
        knn_join_cellwise(images.limit(5000).repartition(32), locations)
        .toPandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    exp = pd.read_parquet(f"{fixtures_dir}/expected_knn.parquet")
    m = got.merge(exp, on="image_id", suffixes=("_got", "_exp"))
    assert len(m) == len(got)
    assert (m["nearest_location_id_got"] == m["nearest_location_id_exp"]).all()


def test_decode_invariants(images, fixtures_dir):
    stats = decode_stats(images).toPandas().sort_values("image_id").reset_index(drop=True)
    exp = (
        pd.read_parquet(f"{fixtures_dir}/expected_images.parquet")
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    assert stats["decode_ok"].all()
    assert stats["dims_ok"].all()
    # decoded pixels byte-exact vs oracle decode (crc32)
    assert (stats["pix_crc32"].to_numpy() == exp["pix_crc32"].to_numpy()).all()
    # lossy rows met the PSNR >= 40 dB gate at generation time
    finite = np.isfinite(exp["psnr"].to_numpy())
    assert (exp["psnr"].to_numpy()[finite] >= 40.0).all()
    # phash of decoded lossless pixels == stored phash
    lossless = stats["fmt"].isin(sorted(C.LOSSLESS)).to_numpy()
    assert (
        stats["phash_decoded"].to_numpy()[lossless]
        == stats["phash_stored"].to_numpy()[lossless]
    ).all()
    # captions byte-equal through the pipeline
    n = len(stats)
    expected_caps = [gen.caption_for(i) for i in range(n)]
    assert list(stats.sort_values("image_id")["caption"]) == expected_caps


def test_mosaic_salted_equals_unsalted(images):
    from gjspark.operators.tiling import cell_mosaic, salt_map

    # the fixture's hot cell must actually trigger salting
    sm = salt_map(images, target_rows_per_salt=200).toPandas()
    assert len(sm) > 0 and sm["n_salt"].max() >= 4

    salted = (
        cell_mosaic(images, target_rows_per_salt=200)
        .toPandas()
        .sort_values("cell")
        .reset_index(drop=True)
    )
    unsalted = (
        cell_mosaic(images, target_rows_per_salt=10**9)
        .toPandas()
        .sort_values("cell")
        .reset_index(drop=True)
    )
    assert len(salted) == len(unsalted)
    assert (salted["cell"].to_numpy() == unsalted["cell"].to_numpy()).all()
    assert (salted["n_images"].to_numpy() == unsalted["n_images"].to_numpy()).all()
    # integer partial sums make the mosaics byte-identical
    for a, b in zip(salted["mosaic"], unsalted["mosaic"]):
        assert bytes(a) == bytes(b)
    assert int(salted["n_images"].sum()) == images.count()


def test_rollup_totals(images):
    roll = cell_tile_rollup(images).toPandas()
    assert int(roll["n_images"].sum()) == images.count()
    assert (roll["n_tiles"] >= roll["n_images"]).all()


def test_tiling_counts_match_pixel_math(images):
    roll = cell_tile_rollup(images).agg(F.sum("n_tiles")).collect()[0][0]
    tile = 16
    pdf = images.select("w", "h").toPandas()
    exp = int(
        (np.ceil(pdf["w"] / tile) * np.ceil(pdf["h"] / tile)).sum()
    )
    assert roll == exp


def test_mosaic_mapcombine_equals_salted(images):
    from gjspark.operators.tiling import cell_mosaic, cell_mosaic_mapcombine

    # limit() collapses to one partition — fan back out so the decode
    # parallelizes (plan-shape parity is unaffected; cached frame)
    sub = images.limit(8000).repartition(32).cache()
    a = (
        cell_mosaic(sub, target_rows_per_salt=500)
        .toPandas()
        .sort_values("cell")
        .reset_index(drop=True)
    )
    b = (
        cell_mosaic_mapcombine(sub)
        .toPandas()
        .sort_values("cell")
        .reset_index(drop=True)
    )
    assert (a["cell"].to_numpy() == b["cell"].to_numpy()).all()
    assert (a["n_images"].to_numpy() == b["n_images"].to_numpy()).all()
    for x, y in zip(a["mosaic"], b["mosaic"]):
        assert bytes(x) == bytes(y)


def test_fused_pipeline_matches_standalone(images):
    """decoded_features must reproduce decode_stats, cell_tile_rollup and
    cell_mosaic exactly from ONE decode pass (the 100TB plan shape)."""
    from gjspark.operators.fused import (
        decoded_features,
        mosaic_from_features,
        rollup_from_features,
    )
    from gjspark.operators.tiling import cell_mosaic_mapcombine

    sub = images.limit(6000).repartition(32).cache()
    feat = decoded_features(sub).cache()
    try:
        # decode stats parity (crc32 / phash / luma / flags)
        a = (
            feat.select(
                "image_id", "pix_crc32", "phash_decoded", "mean_luma",
                "decode_ok", "dims_ok",
            )
            .toPandas().sort_values("image_id").reset_index(drop=True)
        )
        b = (
            decode_stats(sub)
            .select(
                "image_id", "pix_crc32", "phash_decoded", "mean_luma",
                "decode_ok", "dims_ok",
            )
            .toPandas().sort_values("image_id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)
        # rollup parity (exact, including float luma columns)
        ra = (
            rollup_from_features(feat).toPandas()
            .sort_values("cell").reset_index(drop=True)
        )
        rb = (
            cell_tile_rollup(sub).toPandas()
            .sort_values("cell").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(ra, rb)
        # mosaic byte parity vs the map-combine plan
        ma = (
            mosaic_from_features(feat).toPandas()
            .sort_values("cell").reset_index(drop=True)
        )
        mb = (
            cell_mosaic_mapcombine(sub).toPandas()
            .sort_values("cell").reset_index(drop=True)
        )
        assert (ma["cell"].to_numpy() == mb["cell"].to_numpy()).all()
        assert (ma["n_images"].to_numpy() == mb["n_images"].to_numpy()).all()
        for x, y in zip(ma["mosaic"], mb["mosaic"]):
            assert bytes(x) == bytes(y)
    finally:
        feat.unpersist()
        sub.unpersist()


def test_thumb_compression_roundtrip_exact():
    """The delta+zlib thumb transport must be exactly invertible on ANY
    content — smooth gradients, uniform noise, wraparound-heavy deltas —
    or mosaic bytes silently drift."""
    from gjspark.operators.fused import _compress_thumbs, _decompress_thumbs

    rng = np.random.default_rng(11)
    batch = np.stack(
        [
            rng.integers(0, 256, (32, 32, 3)),           # pure noise
            np.zeros((32, 32, 3)),                        # all zero
            np.full((32, 32, 3), 255),                    # all max
            np.tile(np.arange(32)[None, :, None] * 8, (32, 1, 3)) % 256,  # ramp
            np.tile((np.arange(32) % 2)[None, :, None] * 255, (32, 1, 3)),  # alternating (wraparound deltas)
        ]
    ).astype(np.uint8)
    blobs = _compress_thumbs(batch)
    back = _decompress_thumbs(blobs)
    assert np.array_equal(back, batch.reshape(len(batch), -1))
    # order-independence: decompressing a permuted subset matches
    sub = [blobs[4], blobs[0], blobs[2]]
    assert np.array_equal(
        _decompress_thumbs(sub), batch[[4, 0, 2]].reshape(3, -1)
    )


def test_large_image_tile_sums_exact(spark):
    """Images past the float32 exactness bound (h*w*765 >= 2^24, i.e.
    >= ~149x149) must switch the integral image to float64 so tile sums
    stay integer-exact (the documented invariant) at production sizes."""
    from gjspark.functions.codecs import encode_ppm
    from gjspark.operators.fused import decoded_features

    h = w = 200  # 200*200*765 = 30.6M > 2^24: float32 cumsum would drift
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [("big-0", encode_ppm(img), "ppm", w, h, 0, "c", 0.0, 0.0, 1)],
        "image_id string, bytes binary, fmt string, w int, h int, "
        "phash long, caption string, lat double, lon double, h3_r7 long",
    )
    row = decoded_features(df).select("luma_wsum", "px").collect()[0]
    exact = int(img.sum(dtype=np.int64))
    assert row["px"] == h * w
    assert abs(row["luma_wsum"] * 3.0 - exact) < 1e-6


class TestCellsNullSafety:
    def test_null_coordinates_get_sentinel_not_batch_abort(self, spark):
        """One bad row must not poison the Arrow batch (streaming ingest
        re-reads the same file forever on failure)."""
        df = spark.createDataFrame(
            [("a", 50.0, 8.0), ("b", None, 8.0), ("c", float("nan"), 8.0)],
            "id string, lat double, lon double",
        )
        rows = {r["id"]: r for r in with_cell_columns(df).collect()}
        assert rows["a"]["h3_r9"] != 0 and rows["a"]["s2_cell"] != 0
        for bad in ("b", "c"):
            assert rows[bad]["h3_r7"] == 0
            assert rows[bad]["h3_r12"] == 0
            assert rows[bad]["s2_cell"] == 0
