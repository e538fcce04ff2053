"""GIF87a/89a codec: LZW round trips across width-bump boundaries,
dictionary churn past the 12-bit cap, interlace, multi-frame compositing
with disposal/transparency, palettize determinism, malformed-input
ValueError contract (same as jpeg/webp/bmff)."""

import struct

import numpy as np
import pytest

from gjspark.functions import gif as GIF
from gjspark.functions.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    decode_gif_frames,
    encode_gif,
    palettize_332,
)


def _paletted(h, w, ncol, seed=0):
    rng = np.random.default_rng(seed)
    pal = np.unique(rng.integers(0, 256, (ncol, 3), dtype=np.uint8), axis=0)
    idx = rng.integers(0, len(pal), (h, w))
    return pal, idx, pal[idx]


class TestRoundTrip:
    @pytest.mark.parametrize(
        "h,w,ncol",
        [(1, 1, 1), (7, 5, 2), (16, 16, 4), (33, 17, 7), (64, 64, 256), (3, 200, 3)],
    )
    def test_random_palettes(self, h, w, ncol):
        _, _, img = _paletted(h, w, ncol, seed=h * 1000 + w * 10 + ncol)
        blob = encode_gif(img)
        assert blob[:6] == b"GIF89a" and blob[-1:] == b"\x3b"
        out = decode_gif(blob)
        assert out.dtype == np.uint8 and out.shape == img.shape
        assert np.array_equal(out, img)

    def test_dictionary_churn_past_4096(self):
        # large quantized gradient forces dict growth to the 12-bit cap
        # and a mid-stream clear
        img = np.zeros((200, 300, 3), dtype=np.uint8)
        img[..., 0] = ((np.arange(300)[None, :] % 256) // 16 * 16).astype(np.uint8)
        img[..., 1] = ((np.arange(200)[:, None] % 256) // 16 * 16).astype(np.uint8)
        assert np.array_equal(decode_gif(encode_gif(img)), img)

    def test_fixture_images_palettized(self):
        from gjspark.fixtures.generator import make_image

        for i in (0, 5, 13):
            img = palettize_332(make_image(i))
            assert len(np.unique(img.reshape(-1, 3), axis=0)) <= 256
            assert np.array_equal(decode_gif(encode_gif(img)), img)

    def test_palettize_is_idempotent(self):
        img = _paletted(16, 16, 200, seed=9)[2]
        q = palettize_332(img)
        assert np.array_equal(palettize_332(q), q)


class TestLZW:
    @pytest.mark.parametrize("mcs", [2, 4, 8])
    def test_unit_streams(self, mcs):
        for arr in (
            np.zeros(5000, dtype=np.uint8),
            (np.arange(5000) % (1 << mcs)).astype(np.uint8),
        ):
            enc = _lzw_encode(arr, mcs)
            assert np.array_equal(_lzw_decode(enc, mcs, len(arr)), arr)

    def test_width_bump_boundary(self):
        # exactly enough distinct pairs to cross each width boundary
        rng = np.random.default_rng(3)
        arr = rng.integers(0, 4, 9000).astype(np.uint8)
        enc = _lzw_encode(arr, 2)
        assert np.array_equal(_lzw_decode(enc, 2, len(arr)), arr)


class TestInterlaceAndFrames:
    def _wrap(self, w, h, pal_bytes, desc, lzw, mcs=2, extra=b""):
        head = (
            b"GIF89a"
            + struct.pack("<HH", w, h)
            + bytes([0x80 | 1, 0, 0])
            + pal_bytes
        )
        body = bytearray([mcs])
        for i in range(0, len(lzw), 255):
            c = lzw[i : i + 255]
            body.append(len(c))
            body += c
        body.append(0)
        return head + extra + desc + bytes(body) + b"\x3b"

    def test_interlaced_stream(self):
        rng = np.random.default_rng(4)
        h, w = 37, 23
        pal = np.array(
            [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8
        )
        idx = rng.integers(0, 4, (h, w)).astype(np.uint8)
        order = []
        for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
            order += list(range(start, h, step))
        lzw = _lzw_encode(idx[order].ravel(), 2)
        desc = b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + bytes([0x40])
        blob = self._wrap(w, h, pal.tobytes(), desc, lzw)
        assert np.array_equal(decode_gif(blob), pal[idx])

    def test_multiframe_transparency(self):
        rng = np.random.default_rng(5)
        h, w = 37, 23
        pal = np.array(
            [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8
        )
        idx = rng.integers(0, 4, (h, w)).astype(np.uint8)
        lzw = _lzw_encode(idx.ravel(), 2)
        desc = b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        base = self._wrap(w, h, pal.tobytes(), desc, lzw)[:-1]  # drop trailer
        # frame 2: 10x8 patch at (5,5), transparent index 0, disposal 1
        idx2 = rng.integers(0, 4, (10, 8)).astype(np.uint8)
        gce = b"\x21\xf9\x04" + bytes([(1 << 2) | 1, 0, 0, 0]) + b"\x00"
        lzw2 = _lzw_encode(idx2.ravel(), 2)
        desc2 = b"\x2c" + struct.pack("<HHHH", 5, 5, 8, 10) + b"\x00"
        body2 = bytearray([2])
        for i in range(0, len(lzw2), 255):
            c = lzw2[i : i + 255]
            body2.append(len(c))
            body2 += c
        body2.append(0)
        frames = decode_gif_frames(base + gce + desc2 + bytes(body2) + b"\x3b")
        assert len(frames) == 2
        exp = frames[0].copy()
        region = exp[5:15, 5:13]
        mask = idx2 != 0
        region[mask] = pal[idx2][mask]
        assert np.array_equal(frames[1], exp)
        # decode_gif returns the first frame
        assert np.array_equal(
            decode_gif(base + gce + desc2 + bytes(body2) + b"\x3b"), frames[0]
        )


class TestErrors:
    def test_malformed_always_valueerror(self):
        img = _paletted(16, 16, 8, seed=1)[2]
        good = encode_gif(img)
        for bad in (
            b"",
            b"GIF89a",
            good[:20],
            good[: len(good) // 2],
            b"XXXX" + good[4:],
            good[:-2],
        ):
            with pytest.raises(ValueError):
                decode_gif(bad)

    def test_byte_corruption_never_escapes_valueerror(self):
        img = _paletted(16, 16, 8, seed=2)[2]
        good = bytearray(encode_gif(img))
        for i in range(21, len(good), 7):
            ba = bytearray(good)
            ba[i] ^= 0xFF
            try:
                decode_gif(bytes(ba))
            except ValueError:
                pass  # the only allowed exception type

    def test_encode_rejects_wide_palettes(self):
        rng = np.random.default_rng(6)
        img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        if len(np.unique(img.reshape(-1, 3), axis=0)) > 256:
            with pytest.raises(ValueError):
                encode_gif(img)
        assert isinstance(encode_gif(palettize_332(img)), bytes)

    def test_encode_rejects_non_rgb(self):
        with pytest.raises(ValueError):
            encode_gif(np.zeros((4, 4), dtype=np.uint8))


def test_codecs_dispatch():
    from gjspark.functions import codecs as C

    img = palettize_332(_paletted(24, 16, 100, seed=7)[2])
    blob = C.encode_image(img, "gif")
    assert np.array_equal(C.decode_image(blob, "gif"), img)
    assert "gif" in C.LOSSLESS


class TestAnimated:
    def test_round_trip_full_canvas_frames(self):
        rng = np.random.default_rng(11)
        frames = [
            palettize_332(rng.integers(0, 256, (12, 9, 3), dtype=np.uint8))
            for _ in range(7)
        ]
        blob = GIF.encode_gif_frames(frames, delay_cs=10)
        out = decode_gif_frames(blob)
        assert len(out) == 7
        for a, b in zip(out, frames):
            assert np.array_equal(a, b)
        # single-frame API returns the first frame
        assert np.array_equal(decode_gif(blob), frames[0])

    def test_rejects_mixed_shapes_and_empty(self):
        a = np.zeros((4, 4, 3), dtype=np.uint8)
        b = np.zeros((4, 5, 3), dtype=np.uint8)
        with pytest.raises(ValueError):
            GIF.encode_gif_frames([a, b])
        with pytest.raises(ValueError):
            GIF.encode_gif_frames([])

    def test_video_surface(self, spark):
        """Animated GIF rows flow through sample_frames next to rawvid
        rows carrying the same source frames — identical output pixels."""
        import struct as S

        from gjspark.operators.multimodal import sample_frames

        rng = np.random.default_rng(12)
        w, h, n = 6, 5, 9
        frames = [
            palettize_332(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
            for _ in range(n)
        ]
        gif_blob = GIF.encode_gif_frames(frames)
        raw_blob = b"RAWV" + S.pack("<HHH", w, h, n) + b"".join(
            f.tobytes() for f in frames
        )
        df = spark.createDataFrame(
            [("g1", gif_blob, "gif"), ("r1", raw_blob, "rawvid")],
            "video_id string, bytes binary, fmt string",
        )
        out = sample_frames(df, n_frames=4).toPandas()
        g = out[out.video_id == "g1"].sort_values("frame_idx").reset_index(drop=True)
        r = out[out.video_id == "r1"].sort_values("frame_idx").reset_index(drop=True)
        assert len(g) == 4 and len(r) == 4
        assert list(g.frame_idx) == list(r.frame_idx)
        assert (g.fw == w).all() and (g.fh == h).all()
        assert (g.n_frames_total == n).all()
        for pg, pr in zip(g.pixels, r.pixels):
            assert bytes(pg) == bytes(pr)
