"""VP8L (WebP-lossless) codec: encoder round-trips, fast-vs-generic path
parity, malformed-input contract, and hand-crafted bitstreams exercising
the decoder features the in-repo encoder never emits (simple codes, LZ77
backward references, color cache, palette indexing with bundling,
predictor transform, meta-Huffman groups)."""

import numpy as np
import pytest

from gjspark.functions import webp as W


def _img(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


class TestRoundTrip:
    @pytest.mark.parametrize(
        "h,w", [(1, 1), (1, 7), (5, 3), (16, 16), (24, 64), (48, 33)]
    )
    def test_random_images(self, h, w):
        img = _img(h, w, seed=h * 100 + w)
        blob = W.encode_webp(img)
        assert blob[:4] == b"RIFF" and blob[8:12] == b"WEBP"
        out = W.decode_webp(blob)
        assert out.dtype == np.uint8 and out.shape == img.shape
        assert np.array_equal(out, img)

    def test_gradient_checker(self):
        from gjspark.fixtures.generator import make_image

        for i in (0, 5, 13):
            img = make_image(i)
            assert np.array_equal(W.decode_webp(W.encode_webp(img)), img)

    def test_fast_path_equals_generic(self, monkeypatch):
        img = _img(13, 29, seed=3)
        blob = W.encode_webp(img)
        fast = W.decode_webp(blob)
        monkeypatch.setattr(W, "_flat8", lambda *a: False)
        slow = W.decode_webp(blob)
        assert np.array_equal(fast, slow)
        assert np.array_equal(fast, img)


class TestErrors:
    def test_malformed_always_valueerror(self):
        blob = W.encode_webp(_img(8, 8))
        for cut in (2, 6, 11, 14, 20, len(blob) // 2):
            with pytest.raises(ValueError):
                W.decode_webp(blob[:cut])
        with pytest.raises(ValueError):
            W.decode_webp(b"RIFF\x00\x00\x00\x00WAVE")
        with pytest.raises(ValueError):
            W.decode_webp(b"garbage")

    def test_rejects_non_rgb(self):
        with pytest.raises(ValueError):
            W.encode_webp(np.zeros((4, 4), dtype=np.uint8))


# ---------------------------------------------------------------------------
# crafted streams
# ---------------------------------------------------------------------------


def _vp8l(payload_bits: W._BitWriter, w, h) -> bytes:
    """Wrap a crafted VP8L body (everything after the size/version header
    fields must already be in ``payload_bits``) into a RIFF container."""
    import struct

    head = W._BitWriter()
    head.put(0x2F, 8)
    head.put(w - 1, 14)
    head.put(h - 1, 14)
    head.put(0, 1)
    head.put(0, 3)
    # concatenate at bit level: replay the body's bits into head
    body = payload_bits
    data = bytearray(body.buf)
    nbits = body.n
    for byte in data:
        head.put(byte, 8)
    if nbits:
        head.put(body.acc, nbits)
    payload = head.bytes()
    riff = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        riff += b"\x00"
    out = b"WEBP" + riff
    return b"RIFF" + struct.pack("<I", len(out)) + out


def _simple1(bw, symbol):
    """1-symbol simple code (0 bits per read)."""
    bw.put(1, 1)
    bw.put(0, 1)  # num_symbols = 1
    if symbol < 2:
        bw.put(0, 1)
        bw.put(symbol, 1)
    else:
        bw.put(1, 1)
        bw.put(symbol, 8)


def _simple2(bw, s0, s1):
    """2-symbol simple code (1 bit per read: 0 -> s0, 1 -> s1)."""
    bw.put(1, 1)
    bw.put(1, 1)  # num_symbols = 2
    if s0 < 2:
        bw.put(0, 1)
        bw.put(s0, 1)
    else:
        bw.put(1, 1)
        bw.put(s0, 8)
    bw.put(s1, 8)


def _full_code_two_symbols(bw, a, b, alphabet):
    """Code-length-coded prefix code with lengths[a] = lengths[b] = 1
    (a < b), everything else unused — lets symbols >= 256 (lengths,
    cache refs) into the green code, which simple codes cannot express.

    Code-length code used: {18: len 1, 0: len 2, 1: len 2} -> canonical
    codes 18 -> 0, 0 -> 10, 1 -> 11."""
    assert a < b < alphabet
    bw.put(0, 1)  # not simple
    order = W._CL_ORDER  # (17, 18, 0, 1, ...): indices 1, 2, 3 cover us
    bw.put(0, 4)  # num_code_lengths = 4
    for i in range(4):
        bw.put({18: 1, 0: 2, 1: 2}.get(order[i], 0), 3)
    bw.put(0, 1)  # no max_symbol shortcut

    def zeros(n):
        while n >= 11:
            take = min(n, 138)
            bw.put_code(0, 1)  # CL symbol 18
            bw.put(take - 11, 7)
            n -= take
        for _ in range(n):
            bw.put_code(0b10, 2)  # CL symbol 0 (single zero)

    pos = 0
    for sym in (a, b):
        zeros(sym - pos)
        bw.put_code(0b11, 2)  # CL symbol 1 -> code length 1
        pos = sym + 1
    zeros(alphabet - pos)


class TestCraftedStreams:
    def test_simple_codes_solid_color(self):
        # 3x2 solid color via 1-symbol codes everywhere (zero pixel bits)
        bw = W._BitWriter()
        bw.put(0, 1)  # no transforms
        bw.put(0, 1)  # no cache
        bw.put(0, 1)  # no meta
        _simple1(bw, 77)  # green
        _simple1(bw, 200)  # red
        _simple1(bw, 3)  # blue
        _simple1(bw, 255)  # alpha
        _simple1(bw, 0)  # distance
        out = W.decode_webp(_vp8l(bw, 3, 2))
        assert out.shape == (2, 3, 3)
        assert (out == np.array([200, 77, 3], dtype=np.uint8)).all()

    def test_lz77_backref_distance_one(self):
        # 4x2: one literal pixel then a 7-long distance-1 copy
        bw = W._BitWriter()
        bw.put(0, 1)
        bw.put(0, 1)
        bw.put(0, 1)
        # green: full code {0: len1, 261: len1}; 261-256=5 -> length 7
        # with one extra bit 0
        _full_code_two_symbols(bw, 0, 261, 280)
        _simple1(bw, 9)  # red
        _simple1(bw, 31)  # blue
        _simple1(bw, 255)  # alpha
        _simple1(bw, 1)  # distance sym 1 -> prefix value 2 -> (1,0) -> 1
        bw.put_code(0, 1)  # green literal 0
        bw.put_code(1, 1)  # symbol 261 (length)
        bw.put(0, 1)  # length extra bit -> length 7
        out = W.decode_webp(_vp8l(bw, 4, 2))
        assert (out == np.array([9, 0, 31], dtype=np.uint8)).all()

    def test_color_cache_hit(self):
        # 2x1: literal pixel, then a cache reference to it
        cache_bits = 4
        px = (255 << 24) | (10 << 16) | (20 << 8) | 30
        idx = ((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)
        bw = W._BitWriter()
        bw.put(0, 1)  # no transforms
        bw.put(1, 1)  # cache present
        bw.put(cache_bits, 4)
        bw.put(0, 1)  # no meta
        _full_code_two_symbols(bw, 20, 280 + int(idx), 280 + (1 << cache_bits))
        _simple1(bw, 10)  # red
        _simple1(bw, 30)  # blue
        _simple1(bw, 255)  # alpha
        _simple1(bw, 0)  # distance
        bw.put_code(0, 1)  # literal green 20
        bw.put_code(1, 1)  # cache hit
        out = W.decode_webp(_vp8l(bw, 2, 1))
        assert (out == np.array([10, 20, 30], dtype=np.uint8)).all()

    def test_palette_with_bundling(self):
        # 8x1 image, 2-color palette -> width_bits 3, reduced width 1:
        # bundled indices 0b01010101 -> alternating colors
        bw = W._BitWriter()
        bw.put(1, 1)  # transform present
        bw.put(3, 2)  # color indexing
        bw.put(1, 8)  # palette_size - 1 = 1
        # palette subimage (2x1, level0=False): entries are delta-coded
        # colors: c0 = (255, 5, 6, 7); c1 = (255, 105, 96, 87)
        # deltas:  d0 = c0;            d1 = (0, 100, 90, 80)
        bw.put(0, 1)  # (palette stream) no cache
        _simple2(bw, 6, 90)  # green: c0.g then delta.g
        _simple2(bw, 5, 100)  # red
        _simple2(bw, 7, 80)  # blue
        _simple2(bw, 255, 0)  # alpha
        _simple1(bw, 0)  # distance
        bw.put(0, 1)  # pixel 0: first symbol of each 2-symbol code
        bw.put(0, 1)
        bw.put(0, 1)
        bw.put(0, 1)
        bw.put(1, 1)  # pixel 1: second symbols (the deltas)
        bw.put(1, 1)
        bw.put(1, 1)
        bw.put(1, 1)
        bw.put(0, 1)  # (main stream) no more transforms
        bw.put(0, 1)  # no cache
        bw.put(0, 1)  # no meta
        _simple1(bw, 0b10101010)  # bundled indices, first pixel in bit 0
        _simple1(bw, 0)  # red
        _simple1(bw, 0)  # blue
        _simple1(bw, 255)  # alpha
        _simple1(bw, 0)  # distance
        out = W.decode_webp(_vp8l(bw, 8, 1))
        c0 = np.array([5, 6, 7], dtype=np.uint8)
        c1 = np.array([105, 96, 87], dtype=np.uint8)
        exp = np.stack([c0, c1, c0, c1, c0, c1, c0, c1])[None, :, :]
        assert np.array_equal(out, exp)

    def test_predictor_transform_mode_left(self):
        # 4x4 solid color under predictor mode 1 (Left) everywhere:
        # residuals are zero except the top-left corner (predicted black)
        a, r, g, b = 255, 44, 55, 66
        bw = W._BitWriter()
        bw.put(1, 1)  # transform present
        bw.put(0, 2)  # predictor
        bw.put(0, 3)  # size_bits = 2 -> 4-px blocks -> 1x1 subimage
        # subimage (1x1): green = mode 1
        bw.put(0, 1)  # no cache
        _simple1(bw, 1)  # green: mode 1
        _simple1(bw, 0)
        _simple1(bw, 0)
        _simple1(bw, 255)
        _simple1(bw, 0)
        bw.put(0, 1)  # (main) no more transforms
        bw.put(0, 1)  # no cache
        bw.put(0, 1)  # no meta
        _simple2(bw, g, 0)  # green: corner residual then zeros
        _simple2(bw, r, 0)
        _simple2(bw, b, 0)
        _simple2(bw, 0, 0xFF & (a - 255))  # alpha residual 0 everywhere
        _simple1(bw, 0)
        for i in range(16):
            first = i == 0
            bw.put(0 if first else 1, 1)  # green
            bw.put(0 if first else 1, 1)  # red
            bw.put(0 if first else 1, 1)  # blue
            bw.put(0, 1)  # alpha (2-symbol code, always symbol 0)
        out = W.decode_webp(_vp8l(bw, 4, 4))
        assert (out == np.array([r, g, b], dtype=np.uint8)).all()

    def test_meta_huffman_two_groups(self):
        # 8x1, huffman_bits=2 -> entropy image 2x1 -> two groups with
        # different solid greens
        bw = W._BitWriter()
        bw.put(0, 1)  # no transforms
        bw.put(0, 1)  # no cache
        bw.put(1, 1)  # meta huffman present
        bw.put(0, 3)  # huffman_bits = 2 -> blocks of 4 px
        # entropy image 2x1: meta ids 0 and 1 (id = red<<8 | green)
        bw.put(0, 1)  # (entropy stream) no cache
        _simple2(bw, 0, 1)  # green: 0 then 1
        _simple1(bw, 0)  # red
        _simple1(bw, 0)  # blue
        _simple1(bw, 255)  # alpha
        _simple1(bw, 0)
        bw.put(0, 1)  # entropy pixel 0 -> id 0
        bw.put(1, 1)  # entropy pixel 1 -> id 1
        # group 0: solid green 11; group 1: solid green 222
        _simple1(bw, 11)
        _simple1(bw, 1)
        _simple1(bw, 2)
        _simple1(bw, 255)
        _simple1(bw, 0)
        _simple1(bw, 222)
        _simple1(bw, 3)
        _simple1(bw, 4)
        _simple1(bw, 255)
        _simple1(bw, 0)
        out = W.decode_webp(_vp8l(bw, 8, 1))
        assert (out[0, :4] == np.array([1, 11, 2], dtype=np.uint8)).all()
        assert (out[0, 4:] == np.array([3, 222, 4], dtype=np.uint8)).all()


class TestTransformKernels:
    def test_color_transform_inverse_matches_forward(self):
        """Apply the spec's forward cross-color transform in the test and
        check the decoder's inverse recovers the original channels."""
        rng = np.random.default_rng(7)
        h = w = 8
        argb = (
            np.uint32(0xFF) << 24
            | rng.integers(0, 256, (h, w)).astype(np.uint32) << 16
            | rng.integers(0, 256, (h, w)).astype(np.uint32) << 8
            | rng.integers(0, 256, (h, w)).astype(np.uint32)
        )
        g2r, g2b, r2b = 17, 250, 133  # arbitrary int8-coded factors
        el = np.full((1, 1), (r2b << 16) | (g2b << 8) | g2r, dtype=np.uint32)
        g = ((argb >> 8) & 0xFF).astype(np.uint8)
        r0 = ((argb >> 16) & 0xFF).astype(np.int32)
        b0 = (argb & 0xFF).astype(np.int32)
        rf = (r0 - W._ct_delta(np.full_like(g, g2r), g)) & 0xFF
        # the decoder's red_to_blue delta runs on the RESTORED red (== the
        # original), so the forward transform must subtract that same delta
        bf = (
            b0
            - W._ct_delta(np.full_like(g, g2b), g)
            - W._ct_delta(np.full_like(g, r2b), r0.astype(np.uint8))
        ) & 0xFF
        fwd = (
            (argb & np.uint32(0xFF00FF00))
            | rf.astype(np.uint32) << 16
            | bf.astype(np.uint32)
        )
        back = W._inv_color_transform(fwd, 3, el)
        assert np.array_equal(back, argb)

    def test_distance_map_prefix(self):
        # spec-printed prefix of the 2-D distance map
        assert W._DIST_MAP[:12] == [
            (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0),
            (1, 2), (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2),
        ]
        assert len(W._DIST_MAP) == 120
        assert len(set(W._DIST_MAP)) == 120
