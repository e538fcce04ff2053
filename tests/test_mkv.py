"""EBML/Matroska container: V_UNCOMPRESSED round trips, multi-cluster
streams, hand-built lacing and BlockGroup paths, unknown-size elements,
codec stubs, the malformed-input ValueError contract, and the
sample_frames surface."""

import struct

import numpy as np
import pytest

from gjspark.functions import mkv as M
from gjspark.functions.mkv import _el, _el_uint


def _frames(w, h, n, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, w * h * 3, dtype=np.uint8).tobytes()
            for _ in range(n)]


class TestRoundTrip:
    @pytest.mark.parametrize("w,h,n", [(2, 2, 1), (9, 6, 8), (16, 16, 12)])
    def test_rawvideo(self, w, h, n):
        frames = _frames(w, h, n, seed=w + h + n)
        info = M.demux_mkv(M.mux_mkv_rawvideo(frames, w, h))
        assert info["doctype"] == "matroska"
        (t,) = info["tracks"]
        assert (t["number"], t["type"], t["codec"]) == (1, 1, "V_UNCOMPRESSED")
        assert (t["w"], t["h"]) == (w, h)
        assert [f for _, f in info["frames"]] == frames

    def test_multi_cluster_timestamps(self):
        # enough frames that s16 relative timestamps force cluster splits
        frames = _frames(2, 2, 700, seed=1)
        blob = M.mux_mkv_rawvideo(frames, 2, 2, fps=10)
        info = M.demux_mkv(blob)
        assert [f for _, f in info["frames"]] == frames
        # more than one cluster element must exist
        assert blob.count(b"\x1f\x43\xb6\x75") >= 2

    def test_video_surface(self, spark):
        from gjspark.operators.multimodal import sample_frames

        w, h, n = 6, 5, 9
        frames = _frames(w, h, n, seed=2)
        raw = b"RAWV" + struct.pack("<HHH", w, h, n) + b"".join(frames)
        mkvb = M.mux_mkv_rawvideo(frames, w, h)
        df = spark.createDataFrame(
            [("r", raw, "rawvid"), ("m", mkvb, "mkv"), ("x", b"\x00" * 40, "webm")],
            "video_id string, bytes binary, fmt string",
        )
        out = sample_frames(df, n_frames=4).toPandas()
        assert set(out.video_id) == {"r", "m"}  # garbage webm skipped
        r = out[out.video_id == "r"].sort_values("frame_idx").reset_index(drop=True)
        m = out[out.video_id == "m"].sort_values("frame_idx").reset_index(drop=True)
        assert all(bytes(a) == bytes(b) for a, b in zip(r.pixels, m.pixels))


def _wrap_segment(frames_payloads, w=2, h=2, cluster_inner=None):
    """Build a stream around custom cluster innards for decoder-only paths."""
    ebml = _el(M._EBML_HDR, _el(M._DOCTYPE, b"matroska"))
    info = _el(M._INFO, _el_uint(M._TS_SCALE, 1_000_000))
    video = _el(M._VIDEO, _el_uint(M._PIXEL_W, w) + _el_uint(M._PIXEL_H, h))
    entry = _el(
        M._TRACK_ENTRY,
        _el_uint(M._TRACK_NUMBER, 1)
        + _el_uint(M._TRACK_TYPE, 1)
        + _el(M._CODEC_ID, b"V_UNCOMPRESSED")
        + video,
    )
    tracks = _el(M._TRACKS, entry)
    cluster = _el(M._CLUSTER, _el_uint(M._TIMESTAMP, 0) + cluster_inner)
    return ebml + _el(M._SEGMENT, info + tracks + cluster)


class TestDecoderOnlyPaths:
    def test_xiph_lacing(self):
        fr = [b"ab", b"c" * 255, b"defg"]  # middle size forces 255+0 coding
        lace = bytes([len(fr) - 1]) + bytes([2]) + bytes([255, 0])
        payload = b"\x81" + struct.pack(">h", 0) + bytes([0x80 | 0x02]) \
            + lace + b"".join(fr)
        blob = _wrap_segment(fr, cluster_inner=_el(M._SIMPLE_BLOCK, payload))
        info = M.demux_mkv(blob)
        assert [f for _, f in info["frames"]] == fr

    def test_fixed_lacing(self):
        fr = [b"abcd", b"efgh", b"ijkl"]
        payload = b"\x81" + struct.pack(">h", 0) + bytes([0x80 | 0x04]) \
            + bytes([2]) + b"".join(fr)
        blob = _wrap_segment(fr, cluster_inner=_el(M._SIMPLE_BLOCK, payload))
        info = M.demux_mkv(blob)
        assert [f for _, f in info["frames"]] == fr

    def test_block_group(self):
        fr = b"\x01\x02\x03\x04"
        payload = b"\x81" + struct.pack(">h", 0) + b"\x00" + fr
        bg = _el(M._BLOCK_GROUP, _el(M._BLOCK, payload))
        blob = _wrap_segment([fr], cluster_inner=bg)
        info = M.demux_mkv(blob)
        assert info["frames"] == [(1, fr)]

    def test_unknown_size_segment(self):
        # rewrite the Segment size as the reserved all-ones (unknown) VINT
        frames = _frames(2, 2, 2, seed=3)
        blob = M.mux_mkv_rawvideo(frames, 2, 2)
        sid = blob.index(b"\x18\x53\x80\x67")
        # mux writes sizes minimally; find its length from the marker byte
        b0 = blob[sid + 4]
        n = 1
        m = 0x80
        while not (b0 & m):
            n += 1
            m >>= 1
        unknown = bytes([0xFF]) if n == 1 else bytes([m | (m - 1)]) + b"\xff" * (n - 1)
        patched = blob[: sid + 4] + unknown + blob[sid + 4 + n :]
        info = M.demux_mkv(patched)
        assert [f for _, f in info["frames"]] == frames


class TestErrors:
    def test_malformed_always_valueerror(self):
        good = M.mux_mkv_rawvideo(_frames(2, 2, 2, seed=4), 2, 2)
        for bad in (b"", b"\x1a\x45\xdf", b"\x00" * 64, good[:30],
                    good[: len(good) - 3]):
            with pytest.raises(ValueError):
                M.demux_mkv(bad)

    def test_byte_corruption_never_escapes(self):
        good = M.mux_mkv_rawvideo(_frames(3, 3, 3, seed=5), 3, 3)
        from gjspark.operators.multimodal import _decode_video

        for i in range(0, len(good), 7):
            ba = bytearray(good)
            ba[i] ^= 0xFF
            try:
                _decode_video(bytes(ba), "mkv")
            except (ValueError, NotImplementedError):
                pass  # the only allowed exception types

    def test_vp8_stays_stub(self):
        from gjspark.operators.multimodal import _decode_video

        blob = M.mux_mkv_rawvideo(_frames(2, 2, 1, seed=6), 2, 2)
        blob = blob.replace(b"V_UNCOMPRESSED", b"V_VP8" + b"\x00" * 9)
        with pytest.raises(NotImplementedError):
            _decode_video(blob, "webm")

    def test_mux_rejects_bad_frames(self):
        with pytest.raises(ValueError):
            M.mux_mkv_rawvideo([], 2, 2)
        with pytest.raises(ValueError):
            M.mux_mkv_rawvideo([b"\x00" * 5], 2, 2)