"""Image quality metrics: hand-computable cases, batching independence,
decode-failure hygiene, and golden parity of the distributed operator."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from gjspark.functions import codecs as C
from gjspark.functions.quality import quality_metrics
from gjspark.operators.image_quality import image_quality, quality_filter_images


def _flat(color, h=8, w=8):
    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[:, :] = color
    return img


def _checker(h=8, w=8):
    img = np.zeros((h, w, 3), dtype=np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    img[(yy + xx) % 2 == 1] = 255
    return img


class TestQualityMetrics:
    def test_flat_gray_all_zero_but_colorfulness(self):
        e, c, s, cf = quality_metrics(_flat((128, 128, 128)))
        assert (e, c, s, cf) == (0.0, 0.0, 0.0, 0.0)

    def test_flat_red_colorfulness(self):
        e, c, s, cf = quality_metrics(_flat((255, 0, 0)))
        assert (e, c, s) == (0.0, 0.0, 0.0)
        expected = 0.3 * math.sqrt(255.0**2 + 127.5**2) / 255.0
        assert cf == math.floor(expected * 1e6 + 0.5) / 1e6

    def test_checkerboard(self):
        e, c, s, cf = quality_metrics(_checker())
        assert e == 1.0  # two equal-mass luma bins
        assert c == 0.5  # std = 127.5 over the 255 range
        assert s == 4.0  # every interior pixel: |4*c - 4*opposite|
        assert cf == 0.0  # grayscale

    def test_tiny_image_no_interior(self):
        e, c, s, cf = quality_metrics(_flat((0, 0, 0), h=2, w=2))
        assert s == 0.0

    def test_rejects_bad_input(self):
        with pytest.raises(ValueError):
            quality_metrics(np.zeros((4, 4), dtype=np.uint8))
        with pytest.raises(ValueError):
            quality_metrics(np.zeros((4, 4, 3), dtype=np.float64))

    def test_entropy_upper_bound(self):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
        e, c, s, cf = quality_metrics(img)
        assert 0.0 < e <= 8.0
        assert c > 0 and s > 0 and cf > 0


class TestImageQualityOperator:
    @pytest.fixture(scope="class")
    def imgs(self, spark):
        rng = np.random.default_rng(1)
        rows = []
        for i in range(12):
            img = rng.integers(0, 256, size=(16 + i, 20, 3), dtype=np.uint8)
            rows.append((f"im{i:02d}", bytearray(C.encode_image(img, "ppm")), "ppm"))
        rows.append(("bad", bytearray(b"not an image"), "ppm"))
        return spark.createDataFrame(
            rows, "image_id string, bytes binary, fmt string"
        )

    def test_matches_single_process(self, spark, imgs):
        out = {r["image_id"]: r for r in image_quality(imgs).collect()}
        assert not out["bad"]["decode_ok"]
        assert out["bad"]["entropy_bits"] is None
        rows = imgs.collect()
        for r in rows:
            if r["image_id"] == "bad":
                continue
            img = C.decode_image(bytes(r["bytes"]), "ppm")
            e, c, s, cf = quality_metrics(img)
            got = out[r["image_id"]]
            assert (
                got["entropy_bits"], got["rms_contrast"],
                got["sharpness"], got["colorfulness"],
            ) == (e, c, s, cf)

    def test_partitioning_independent(self, spark, imgs):
        a = sorted(map(tuple, image_quality(imgs.repartition(1)).collect()))
        b = sorted(map(tuple, image_quality(imgs.repartition(7)).collect()))
        assert a == b

    def test_quality_filter(self, spark):
        flat = _flat((200, 200, 200), 16, 16)
        rng = np.random.default_rng(2)
        noisy = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
        df = spark.createDataFrame(
            [
                ("flat", bytearray(C.encode_image(flat, "png")), "png"),
                ("noisy", bytearray(C.encode_image(noisy, "png")), "png"),
            ],
            "image_id string, bytes binary, fmt string",
        )
        kept = [r["image_id"] for r in quality_filter_images(df).collect()]
        assert kept == ["noisy"]
