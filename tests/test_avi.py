"""RIFF/AVI container: DIB and MJPG round trips, bottom-up/BGR/stride
conventions, codec stubs, malformed-input ValueError contract, and the
sample_frames surface."""

import struct

import numpy as np
import pytest

from gjspark.functions import avi as A
from gjspark.functions.jpeg import decode_jpeg, encode_jpeg


def _frames(w, h, n, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(n)]


class TestDib:
    @pytest.mark.parametrize("w,h", [(4, 4), (7, 5), (16, 9), (3, 11)])
    def test_round_trip(self, w, h):
        frames = _frames(w, h, 5, seed=w * 100 + h)
        blob = A.mux_avi([f.tobytes() for f in frames], w, h, "DIB ")
        info = A.demux_avi(blob)
        assert (info["w"], info["h"], info["n_frames"]) == (w, h, 5)
        assert info["codec"] == "DIB "
        for i, f in enumerate(frames):
            out = A.decode_avi_frame(info["frames"][i], w, h, "DIB ")
            assert np.array_equal(out, f)

    def test_dib_payload_is_bottom_up_bgr_padded(self):
        # one 2x2 frame with distinct corner colors
        f = np.array(
            [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [10, 20, 30]]],
            dtype=np.uint8,
        )
        blob = A.mux_avi([f.tobytes()], 2, 2, "DIB ")
        chunk = A.demux_avi(blob)["frames"][0]
        stride = (3 * 2 + 3) & ~3  # 8
        assert len(chunk) == stride * 2
        # first stored row is the BOTTOM image row, channels reversed:
        # RGB (0,0,255) -> BGR (255,0,0); RGB (10,20,30) -> BGR (30,20,10)
        assert chunk[0:3] == bytes([255, 0, 0])
        assert chunk[3:6] == bytes([30, 20, 10])

    def test_mux_rejects_bad_frames(self):
        with pytest.raises(ValueError):
            A.mux_avi([], 4, 4)
        with pytest.raises(ValueError):
            A.mux_avi([b"\x00" * 10], 4, 4, "DIB ")
        with pytest.raises(ValueError):
            A.mux_avi([b"\x00" * 48], 4, 4, "h264")


class TestMjpg:
    def test_round_trip_via_jpeg_decoder(self):
        frames = _frames(12, 8, 4, seed=3)
        jf = [encode_jpeg(f, 97) for f in frames]
        blob = A.mux_avi(jf, 12, 8, "MJPG")
        info = A.demux_avi(blob)
        assert info["codec"] == "MJPG"
        for i in range(4):
            out = A.decode_avi_frame(info["frames"][i], 12, 8, "MJPG")
            assert np.array_equal(out, decode_jpeg(jf[i]))

    def test_unknown_codec_is_stub(self):
        frames = _frames(4, 4, 2, seed=4)
        blob = A.mux_avi([encode_jpeg(f, 97) for f in frames], 4, 4, "MJPG")
        blob = blob.replace(b"MJPG", b"XVID")
        from gjspark.operators.multimodal import _decode_video

        with pytest.raises(NotImplementedError):
            _decode_video(blob, "avi")


class TestErrors:
    def test_malformed_always_valueerror(self):
        frames = _frames(4, 4, 2, seed=5)
        good = A.mux_avi([f.tobytes() for f in frames], 4, 4, "DIB ")
        for bad in (
            b"",
            b"RIFF",
            b"RIFX" + good[4:],
            good[:20],
            good[:60],
            good[: len(good) // 2],
        ):
            with pytest.raises(ValueError):
                A.demux_avi(bad)

    def test_missing_video_stream(self):
        # hdrl with avih but no strl
        avih = struct.pack("<IIIIIIIIII4I", 100000, 0, 0, 0, 1, 0, 1, 0,
                           4, 4, 0, 0, 0, 0)
        hdrl = b"LIST" + struct.pack("<I", 4 + 8 + len(avih)) + b"hdrl" \
            + b"avih" + struct.pack("<I", len(avih)) + avih
        body = b"AVI " + hdrl
        with pytest.raises(ValueError):
            A.demux_avi(b"RIFF" + struct.pack("<I", len(body)) + body)

    def test_short_dib_frame(self):
        with pytest.raises(ValueError):
            A.decode_avi_frame(b"\x00" * 8, 4, 4, "DIB ")


def test_sample_frames_surface(spark):
    """DIB-avi and rawvid clips with identical source frames produce
    identical sampled rows; MJPG rows decode through the jpeg codec."""
    from gjspark.operators.multimodal import sample_frames

    w, h, n = 6, 5, 9
    frames = _frames(w, h, n, seed=6)
    raw = b"RAWV" + struct.pack("<HHH", w, h, n) + b"".join(
        f.tobytes() for f in frames
    )
    avi = A.mux_avi([f.tobytes() for f in frames], w, h, "DIB ")
    mjpg = A.mux_avi([encode_jpeg(f, 97) for f in frames], w, h, "MJPG")
    df = spark.createDataFrame(
        [("r", raw, "rawvid"), ("a", avi, "avi"), ("m", mjpg, "avi")],
        "video_id string, bytes binary, fmt string",
    )
    out = sample_frames(df, n_frames=4).toPandas()
    assert set(out.video_id) == {"r", "a", "m"}
    r = out[out.video_id == "r"].sort_values("frame_idx").reset_index(drop=True)
    a = out[out.video_id == "a"].sort_values("frame_idx").reset_index(drop=True)
    m = out[out.video_id == "m"].sort_values("frame_idx").reset_index(drop=True)
    assert all(bytes(x) == bytes(y) for x, y in zip(r.pixels, a.pixels))
    for _, row in m.iterrows():
        exp = decode_jpeg(encode_jpeg(frames[row.frame_idx], 97))
        assert bytes(row.pixels) == exp.tobytes()