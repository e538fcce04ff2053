"""ISO-BMFF (MP4) container layer: mux/demux round trips, parser
generality on hand-built boxes (the variants the muxer does not emit:
co64, largesize, multi-run stsc, stss, v1 headers), and the malformed-
input ValueError contract (same as jpeg/webp)."""

import struct

import numpy as np
import pytest

from gjspark.functions import bmff
from gjspark.functions.bmff import _box, _fbox


def _frames(w, h, n, seed=3):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, w * h * 3, dtype=np.uint8).tobytes() for _ in range(n)]


def test_mux_demux_roundtrip():
    for w, h, n in [(4, 4, 1), (7, 5, 6), (16, 9, 12)]:
        frames = _frames(w, h, n)
        blob = bmff.mux_mp4_rawvideo(frames, w, h, fps=25)
        info = bmff.demux_mp4(blob)
        assert info["brand"] == "isom"
        assert info["timescale"] == 25 and info["duration"] == n
        (t,) = info["tracks"]
        assert (t.handler, t.codec) == ("vide", "rawv")
        assert (t.width, t.height) == (w, h)
        assert t.sync_samples is None  # stss absent = all sync
        assert bmff.extract_samples(blob, t) == frames


def test_box_walker_skips_unknown_boxes():
    frames = _frames(4, 4, 2)
    blob = bmff.mux_mp4_rawvideo(frames, 4, 4)
    # prepend an unknown top-level box and a 'free' box: still demuxable,
    # but stco offsets shift -> rebuild via box surgery instead: append only
    blob2 = blob + _box("free", b"\x00" * 10) + _box("wxyz", b"q")
    info = bmff.demux_mp4(blob2)
    assert bmff.extract_samples(blob2, info["tracks"][0]) == frames


def _build_custom(frames, w, h, *, co64=False, largesize=False, two_chunks=False,
                  stss=None, v1=False):
    """Hand-build a file exercising parser paths the muxer never emits."""
    n = len(frames)
    fb = w * h * 3
    ftyp = _box("ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
    if two_chunks:
        k = (n + 1) // 2
        payload = b"".join(frames)
        mdat = _box("mdat", payload)
        base = len(ftyp) + 8
        chunk_offsets = [base, base + k * fb]
        stsc_runs = [(1, k)] + ([(2, n - k)] if n - k else [])
    else:
        mdat = _box("mdat", b"".join(frames))
        base = len(ftyp) + 8
        chunk_offsets = [base]
        stsc_runs = [(1, n)]
    if largesize:
        # rewrite mdat with size==1 + 64-bit largesize (8 extra header bytes)
        payload = b"".join(frames)
        mdat = (
            struct.pack(">I", 1)
            + b"mdat"
            + struct.pack(">Q", 16 + len(payload))
            + payload
        )
        chunk_offsets = [c + 8 for c in chunk_offsets]

    entry = (
        b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 16
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)
        + struct.pack(">I", 0) + struct.pack(">H", 1)
        + bytes([4]) + b"test" + b"\x00" * 27
        + struct.pack(">Hh", 24, -1)
    )
    stsd = _fbox("stsd", 0, 0, struct.pack(">I", 1) + _box("rawv", entry))
    stts = _fbox("stts", 0, 0, struct.pack(">III", 1, n, 1))
    stsc = _fbox(
        "stsc", 0, 0,
        struct.pack(">I", len(stsc_runs))
        + b"".join(struct.pack(">III", fc, spc, 1) for fc, spc in stsc_runs),
    )
    stsz = _fbox("stsz", 0, 0, struct.pack(">II", fb, n))
    if co64:
        stco = _fbox(
            "co64", 0, 0,
            struct.pack(">I", len(chunk_offsets))
            + b"".join(struct.pack(">Q", c) for c in chunk_offsets),
        )
    else:
        stco = _fbox(
            "stco", 0, 0,
            struct.pack(">I", len(chunk_offsets))
            + b"".join(struct.pack(">I", c) for c in chunk_offsets),
        )
    tables = stsd + stts + stsc + stsz + stco
    if stss is not None:
        tables += _fbox(
            "stss", 0, 0,
            struct.pack(">I", len(stss)) + b"".join(struct.pack(">I", s) for s in stss),
        )
    stbl = _box("stbl", tables)
    vmhd = _fbox("vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dinf = _box("dinf", _fbox("dref", 0, 0, struct.pack(">I", 1) + _fbox("url ", 0, 1, b"")))
    minf = _box("minf", vmhd + dinf + stbl)
    hdlr = _fbox("hdlr", 0, 0, struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"t\x00")
    m = bmff._UNITY_MATRIX
    if v1:
        mdhd = _fbox("mdhd", 1, 0, struct.pack(">QQIQ", 0, 0, 30, n) + struct.pack(">HH", 0x55C4, 0))
        tkhd = _fbox(
            "tkhd", 1, 7,
            struct.pack(">QQI", 0, 0, 1) + b"\x00" * 4 + struct.pack(">Q", n)
            + b"\x00" * 8 + struct.pack(">HHHH", 0, 0, 0, 0) + m
            + struct.pack(">II", w << 16, h << 16),
        )
        mvhd = _fbox(
            "mvhd", 1, 0,
            struct.pack(">QQIQ", 0, 0, 30, n) + struct.pack(">I", 0x00010000)
            + struct.pack(">H", 0x0100) + b"\x00" * 10 + m + b"\x00" * 24
            + struct.pack(">I", 2),
        )
    else:
        mdhd = _fbox("mdhd", 0, 0, struct.pack(">IIII", 0, 0, 30, n) + struct.pack(">HH", 0x55C4, 0))
        tkhd = _fbox(
            "tkhd", 0, 7,
            struct.pack(">IIII", 0, 0, 1, 0) + struct.pack(">I", n) + b"\x00" * 8
            + struct.pack(">HHHH", 0, 0, 0, 0) + m
            + struct.pack(">II", w << 16, h << 16),
        )
        mvhd = _fbox(
            "mvhd", 0, 0,
            struct.pack(">IIII", 0, 0, 30, n) + struct.pack(">I", 0x00010000)
            + struct.pack(">H", 0x0100) + b"\x00" * 10 + m + b"\x00" * 24
            + struct.pack(">I", 2),
        )
    mdia = _box("mdia", mdhd + hdlr + minf)
    trak = _box("trak", tkhd + mdia)
    moov = _box("moov", mvhd + trak)
    return ftyp + mdat + moov


@pytest.mark.parametrize("variant", ["co64", "largesize", "two_chunks", "v1"])
def test_parser_variants(variant):
    frames = _frames(5, 3, 7, seed=11)
    blob = _build_custom(frames, 5, 3, **{variant: True})
    info = bmff.demux_mp4(blob)
    (t,) = info["tracks"]
    assert (t.width, t.height) == (5, 3)
    assert t.timescale == 30 and t.duration == 7
    assert bmff.extract_samples(blob, t) == frames


def test_stss_parsed():
    frames = _frames(4, 4, 6, seed=5)
    blob = _build_custom(frames, 4, 4, stss=[1, 4])
    (t,) = bmff.demux_mp4(blob)["tracks"]
    assert t.sync_samples == [1, 4]


def test_malformed_always_valueerror():
    frames = _frames(4, 4, 3)
    blob = bmff.mux_mp4_rawvideo(frames, 4, 4)
    rng = np.random.default_rng(9)
    cuts = [0, 3, 7, 12, 40, len(blob) // 2, len(blob) - 3]
    for cut in cuts:
        with pytest.raises(ValueError):
            bmff.demux_mp4(blob[:cut])
    with pytest.raises(ValueError):
        bmff.demux_mp4(rng.integers(0, 256, 128, dtype=np.uint8).tobytes())
    with pytest.raises(ValueError):
        bmff.demux_mp4(_box("ftyp", b"isom") + _box("mdat", b"xx"))  # no moov
    # sample tables that disagree: stsz claims more samples than the
    # stsc/stco chunk map supplies
    bad = _build_custom(frames, 4, 4, two_chunks=True)
    idx = bad.rindex(b"stsz")
    count_off = idx + 4 + 4 + 4  # type, fullbox header, sample_size
    bad = bad[:count_off] + struct.pack(">I", len(frames) + 5) + bad[count_off + 4 :]
    with pytest.raises(ValueError):
        bmff.demux_mp4(bad)


def test_decode_video_mp4_and_stubs():
    from gjspark.operators.multimodal import _decode_video

    frames = _frames(6, 4, 5, seed=21)
    blob = bmff.mux_mp4_rawvideo(frames, 6, 4)
    w, h, n, get = _decode_video(blob, "mp4")
    assert (w, h, n) == (6, 4, 5)
    assert [get(i) for i in range(n)] == frames
    # non-rawv codec stays an honest stub: patch the stsd entry fourcc
    # (offset: type + fullbox header + entry_count + entry size)
    si = blob.rindex(b"stsd")
    avc = blob[: si + 16] + b"avc1" + blob[si + 20 :]
    with pytest.raises(NotImplementedError):
        _decode_video(avc, "mp4")
    # garbage containers -> ValueError -> skippable rows
    with pytest.raises(ValueError):
        _decode_video(b"\x00" * 32, "webm")
    with pytest.raises(ValueError):
        _decode_video(b"\x00" * 32, "mp4")


def test_sample_frames_mixed_containers(spark):
    """mp4-wrapped and rawvid clips with identical source frames must
    produce identical sampled output rows."""
    import pandas as pd

    from gjspark.operators.multimodal import sample_frames

    frames = _frames(5, 4, 9, seed=33)
    raw = b"RAWV" + struct.pack("<HHH", 5, 4, 9) + b"".join(frames)
    mp4 = bmff.mux_mp4_rawvideo(frames, 5, 4)
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "video_id": ["a-raw", "a-mp4", "bad"],
                "bytes": [raw, mp4, b"\x01\x02\x03"],
                "fmt": ["rawvid", "mp4", "mp4"],
            }
        )
    )
    out = sample_frames(df, n_frames=4).toPandas()
    assert set(out["video_id"]) == {"a-raw", "a-mp4"}  # garbage skipped
    a = out[out.video_id == "a-raw"].sort_values("frame_idx").reset_index(drop=True)
    b = out[out.video_id == "a-mp4"].sort_values("frame_idx").reset_index(drop=True)
    assert list(a.frame_idx) == list(b.frame_idx)
    assert all(bytes(x) == bytes(y) for x, y in zip(a.pixels, b.pixels))


# ---------------------------------------------------------------------------
# m4a: raw PCM ('ipcm' + pcmC, ISO/IEC 23003-5) in the same container


class TestM4aPcm:
    def _sine(self, n=3000, seed=0):
        rng = np.random.default_rng(seed)
        x = 0.5 * np.sin(np.arange(n) * 0.05) + rng.normal(0, 0.01, n)
        return np.clip(np.round(x * 32768.0), -32768, 32767).astype(np.int16)

    def test_mux_demux_round_trip(self):
        s = self._sine()
        blob = bmff.mux_m4a_pcm(16000, s.tobytes())
        info = bmff.demux_mp4(blob)
        (t,) = info["tracks"]
        assert t.handler == "soun" and t.codec == "ipcm"
        assert t.timescale == 16000 and t.duration == 3000
        assert bmff.parse_pcm_entry(t.sample_entry_payload) == (1, 16, 16000, True)
        payload = b"".join(bmff.extract_samples(blob, t))
        assert payload == s.tobytes()
        # 1024-frame blocks: 2 full + 1 partial
        assert t.sample_sizes == [2048, 2048, 1904]

    def test_audio_decode_parity_with_rawpcm(self):
        from gjspark.operators.multimodal import _decode_audio

        s = self._sine(n=1500, seed=1)
        raw = b"RAWA" + struct.pack("<II", 8000, 1500) + s.tobytes()
        m4a = bmff.mux_m4a_pcm(8000, s.tobytes())
        r1, x1 = _decode_audio(raw, "rawpcm")
        r2, x2 = _decode_audio(m4a, "m4a")
        assert r1 == r2 and np.array_equal(x1, x2)

    def test_stereo_24bit(self):
        from gjspark.operators.multimodal import _decode_audio

        s = self._sine(n=600, seed=2)
        st = np.stack([s, np.roll(s, 7)], axis=1)
        b24 = st.astype("<i4").view(np.uint8).reshape(-1, 4)[:, :3].tobytes()
        blob = bmff.mux_m4a_pcm(44100, b24, channels=2, sample_size=24)
        rate, x = _decode_audio(blob, "m4a")
        assert rate == 44100
        assert np.allclose(x, st.mean(axis=1) / float(1 << 23))

    def test_aac_stays_stub(self):
        from gjspark.operators.multimodal import _decode_audio

        s = self._sine(n=100, seed=3)
        blob = bytearray(bmff.mux_m4a_pcm(8000, s.tobytes()))
        idx = bytes(blob).rindex(b"ipcm")  # the stsd fourcc, not the hdlr name
        blob[idx : idx + 4] = b"mp4a"
        with pytest.raises(NotImplementedError):
            _decode_audio(bytes(blob), "m4a")

    def test_no_audio_track_raises(self):
        from gjspark.operators.multimodal import _decode_audio

        frames = _frames(4, 4, 2, seed=4)
        vid = bmff.mux_mp4_rawvideo(frames, 4, 4)
        with pytest.raises(ValueError):
            _decode_audio(vid, "m4a")

    def test_mux_rejects_bad_input(self):
        with pytest.raises(ValueError):
            bmff.mux_m4a_pcm(8000, b"")
        with pytest.raises(ValueError):
            bmff.mux_m4a_pcm(8000, b"\x00\x01\x02", channels=2)  # not a frame multiple
        with pytest.raises(ValueError):
            bmff.mux_m4a_pcm(8000, b"\x00\x00", sample_size=12)

    def test_parse_pcm_entry_requires_pcmc(self):
        s = self._sine(n=64, seed=5)
        blob = bytearray(bmff.mux_m4a_pcm(8000, s.tobytes()))
        idx = bytes(blob).index(b"pcmC")
        blob[idx : idx + 4] = b"xxxx"
        info = bmff.demux_mp4(bytes(blob))
        with pytest.raises(ValueError):
            bmff.parse_pcm_entry(info["tracks"][0].sample_entry_payload)
