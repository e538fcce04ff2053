"""Image codec invariants (SURVEY.md §5.4, north-rule PSNR gate)."""

import numpy as np
import pytest

from gjspark.functions import codecs as C

rng = np.random.default_rng(42)
SIZES = [(16, 16), (24, 32), (96, 128), (17, 23)]


@pytest.mark.parametrize("fmt", ["ppm", "bmp", "png"])
def test_lossless_roundtrip(fmt):
    for h, w in SIZES:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        dec = C.decode_image(C.encode_image(img, fmt), fmt)
        assert dec.shape == img.shape
        assert (dec == img).all()


def test_dct_psnr_gate():
    for h, w in SIZES:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        dec = C.decode_image(C.encode_image(img, "dct"), "dct")
        assert C.psnr(img, dec) >= 40.0


def test_png_crc_detects_corruption():
    img = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    data = bytearray(C.encode_image(img, "png"))
    data[40] ^= 0xFF
    with pytest.raises(ValueError):
        C.decode_png(bytes(data))


def test_phash_stability_and_discrimination():
    img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    other = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    h1 = C.phash64(img)
    near = img.copy()
    near[0, 0] = 255 - near[0, 0]
    h2 = C.phash64(near)
    h3 = C.phash64(other)
    ham = lambda a, b: bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
    assert ham(h1, h2) <= 4
    assert ham(h1, h3) > 10


def test_phash_deterministic():
    img = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    assert C.phash64(img) == C.phash64(img.copy())
