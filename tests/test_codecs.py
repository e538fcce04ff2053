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


class TestExactKernels:
    """The exact-integer resize/phash kernels must be bit-reproducible at
    ANY batch size (BLAS GEMM results depend on matrix size, so ordinary
    float batching would make values depend on partitioning)."""

    def test_thumb_matches_fraction_reference(self):
        from fractions import Fraction

        rng = np.random.default_rng(5)
        for (h, w) in [(16, 16), (24, 32), (13, 17)]:
            stack = rng.integers(0, 256, (2, h, w, 3), dtype=np.uint8)
            th = C.resize_rgb_exact(stack)
            Kh, Kw = C._rm_int(h), C._rm_int(w)
            for (a, b) in [(0, 0), (17, 5), (31, 31)]:
                for c in range(3):
                    t = sum(
                        int(Kh[a, y]) * int(Kw[b, x]) * int(stack[0, y, x, c])
                        for y in range(h)
                        for x in range(w)
                    )
                    exact = Fraction(t, h * w)
                    fl = exact.numerator // exact.denominator
                    rem = exact - fl
                    if rem > Fraction(1, 2):
                        r = fl + 1
                    elif rem < Fraction(1, 2):
                        r = fl
                    else:  # half-even
                        r = fl if fl % 2 == 0 else fl + 1
                    assert int(th[0, c, a, b]) == min(max(r, 0), 255)

    def test_thumb_batch_size_independent(self):
        rng = np.random.default_rng(6)
        big = rng.integers(0, 256, (300, 24, 48, 3), dtype=np.uint8)
        tb = C.resize_rgb_exact(big)
        for k in (1, 3, 100):
            assert np.array_equal(C.resize_rgb_exact(big[:k]), tb[:k])

    def test_phash_batch_size_independent(self):
        rng = np.random.default_rng(7)
        big = rng.integers(0, 256, (300, 24, 48, 3), dtype=np.uint8)
        pb = C.phash64_same_size(big)
        for k in (1, 3, 100):
            assert np.array_equal(C.phash64_same_size(big[:k]), pb[:k])

    def test_resize_numerators_integral_and_row_stochastic(self):
        for src in (13, 16, 24, 48, 128, 1333):
            K = C._rm_int(src)
            assert np.array_equal(K, np.rint(K))
            assert (K.sum(axis=1) == src).all()
            # K/src is exactly the row-stochastic block-mean matrix
            assert np.allclose(K / src, C._resize_matrix(src), atol=1e-12)

    def test_sandwich_bound_guard(self):
        big = np.full((1, 4096, 4096), 2.0**40)
        with pytest.raises(AssertionError, match="bound"):
            C._exact_sandwich(C._rm_int(4096), big, C._rm_int(4096))
