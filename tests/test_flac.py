"""FLAC codec (RFC 9639): encoder/decoder round trips across frame
boundaries and subframe choices, hand-built streams for the
decoder-only paths (LPC, stereo decorrelation, rice2, escape
partitions, wasted bits, multi-partition residuals), CRC/MD5 integrity
failures, the malformed-input ValueError contract, and the
audio-features surface."""

import struct

import numpy as np
import pytest

from gjspark.functions import flac as FL
from gjspark.functions.flac import _BitWriter, _crc8, _crc16


def _sine16(rate=16000, n=2000, freq=440.0, amp=0.6, ch=1, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n)[:, None]
    x = amp * np.sin(2 * np.pi * freq * t / rate) + rng.normal(0, 0.01, (n, ch))
    s = np.clip(np.round(x * 32768.0), -32768, 32767).astype(np.int16)
    return s if ch > 1 else s[:, 0]


class TestRoundTrip:
    @pytest.mark.parametrize("n", [1, 3, 100, 4096, 5000, 9000])
    def test_mono_lengths(self, n):
        s = _sine16(n=n, seed=n)
        rate, bps, out = FL.decode_flac(FL.encode_flac(16000, s))
        assert (rate, bps) == (16000, 16)
        assert np.array_equal(out[:, 0], s)

    @pytest.mark.parametrize("ch", [2, 3, 8])
    def test_multichannel(self, ch):
        s = _sine16(n=1500, ch=ch, seed=ch)
        _, _, out = FL.decode_flac(FL.encode_flac(44100, s))
        assert np.array_equal(out, s)

    def test_tonal_signal_actually_compresses(self):
        s = _sine16(n=8000, seed=1)
        blob = FL.encode_flac(16000, s)
        assert len(blob) < s.nbytes  # fixed prediction + rice must win

    def test_noise_falls_back_losslessly(self):
        rng = np.random.default_rng(2)
        s = rng.integers(-32768, 32768, 700).astype(np.int16)
        _, _, out = FL.decode_flac(FL.encode_flac(8000, s))
        assert np.array_equal(out[:, 0], s)

    def test_constant_block(self):
        s = np.full(3000, -555, dtype=np.int16)
        blob = FL.encode_flac(8000, s)
        _, _, out = FL.decode_flac(blob)
        assert np.array_equal(out[:, 0], s)
        assert len(blob) < 300  # order-1/2 prediction collapses it

    def test_mono_downmix_surface(self):
        s = _sine16(n=600, seed=3)
        rate, x = FL.decode_flac_mono(FL.encode_flac(22050, s))
        assert rate == 22050
        assert np.allclose(x, s / 32768.0)


# ---------------------------------------------------------------------------
# hand-built streams: decoder-only paths


def _streaminfo(rate, ch, bps, total, block=4096, md5=b"\x00" * 16):
    si = bytearray()
    si += struct.pack(">HH", block, block)
    si += b"\x00\x00\x00" * 2
    si += bytes(
        [
            (rate >> 12) & 0xFF,
            (rate >> 4) & 0xFF,
            ((rate & 0xF) << 4) | ((ch - 1) << 1) | ((bps - 1) >> 4),
            (((bps - 1) & 0xF) << 4) | ((total >> 32) & 0xF),
        ]
    )
    si += struct.pack(">I", total & 0xFFFFFFFF)
    si += md5
    return b"fLaC" + bytes([0x80]) + struct.pack(">I", len(si))[1:] + bytes(si)


def _frame_header(n, ch_code, frame_no=0):
    bw = _BitWriter()
    bw.write(0x3FFE, 14)
    bw.write(0, 2)
    bw.write(7, 4)       # 16-bit blocksize-1 follows
    bw.write(0, 4)       # rate from STREAMINFO
    bw.write(ch_code, 4)
    bw.write(4, 3)       # 16 bps
    bw.write(0, 1)
    bw.write(frame_no, 8)
    bw.write(n - 1, 16)
    bw.align()
    hdr = bw.bytes()
    return hdr + bytes([_crc8(hdr)])


def _finish(head, hdr, body_bw):
    body_bw.align()
    body = body_bw.bytes()
    frame = hdr + body
    return head + frame + struct.pack(">H", _crc16(frame))


def _write_verbatim(bw, x, bps=16):
    bw.write(0, 1)
    bw.write(1, 6)
    bw.write(0, 1)
    for v in x:
        bw.write(int(v), bps)


class TestDecoderOnlyPaths:
    def test_lpc_subframe(self):
        # x[i] = (3*x[i-1] - 1*x[i-2]) >> 1 + residual, order 2, shift 1
        n, order, shift = 64, 2, 1
        coefs = [3, -1]
        rng = np.random.default_rng(4)
        res = rng.integers(-20, 20, n - order)
        x = np.zeros(n, dtype=np.int64)
        x[0], x[1] = 1000, 1010
        for i in range(order, n):
            acc = sum(c * int(x[i - 1 - j]) for j, c in enumerate(coefs))
            x[i] = (acc >> shift) + res[i - order]
        bw = _BitWriter()
        bw.write(0, 1)
        bw.write(32 + order - 1, 6)  # LPC, order 2
        bw.write(0, 1)
        for i in range(order):
            bw.write(int(x[i]), 16)
        bw.write(4, 4)   # precision-1 -> 5 bits
        bw.write(shift, 5)
        for c in coefs:
            bw.write(c, 5)
        bw.write(0, 2)   # rice 4-bit
        bw.write(0, 4)   # partition order 0
        bw.write(5, 4)   # param
        FL._write_rice(bw, res, 5)
        blob = _finish(_streaminfo(8000, 1, 16, n), _frame_header(n, 0), bw)
        _, _, out = FL.decode_flac(blob)
        assert np.array_equal(out[:, 0], x)

    @pytest.mark.parametrize("ch_code", [8, 9, 10])
    def test_stereo_decorrelation(self, ch_code):
        n = 48
        rng = np.random.default_rng(ch_code)
        left = rng.integers(-5000, 5000, n).astype(np.int64)
        right = rng.integers(-5000, 5000, n).astype(np.int64)
        side = left - right
        bw = _BitWriter()
        if ch_code == 8:    # left/side: side channel is 17 bits
            _write_verbatim(bw, left, 16)
            _write_verbatim(bw, side, 17)
        elif ch_code == 9:  # right/side
            _write_verbatim(bw, side, 17)
            _write_verbatim(bw, right, 16)
        else:               # mid/side
            mid = (left + right) >> 1
            _write_verbatim(bw, mid, 16)
            _write_verbatim(bw, side, 17)
        blob = _finish(
            _streaminfo(8000, 2, 16, n), _frame_header(n, ch_code), bw
        )
        _, _, out = FL.decode_flac(blob)
        assert np.array_equal(out[:, 0], left)
        assert np.array_equal(out[:, 1], right)

    def test_rice2_and_escape_partitions(self):
        # 2 partitions: first rice2-coded, second escaped to 7-bit raw
        n, order = 32, 0
        rng = np.random.default_rng(7)
        res = rng.integers(-50, 50, n)
        bw = _BitWriter()
        bw.write(0, 1)
        bw.write(8 + order, 6)  # FIXED order 0
        bw.write(0, 1)
        bw.write(1, 2)   # rice2: 5-bit params
        bw.write(1, 4)   # partition order 1 -> 2 partitions
        bw.write(4, 5)   # partition 1: param 4
        FL._write_rice(bw, res[:16], 4)
        bw.write(31, 5)  # partition 2: escape
        bw.write(7, 5)   # 7-bit raw residuals
        for v in res[16:]:
            bw.write(int(v), 7)
        blob = _finish(_streaminfo(8000, 1, 16, n), _frame_header(n, 0), bw)
        _, _, out = FL.decode_flac(blob)
        assert np.array_equal(out[:, 0], res)

    def test_wasted_bits(self):
        n = 16
        vals = (np.arange(n, dtype=np.int64) - 8) << 3  # 3 wasted bits
        bw = _BitWriter()
        bw.write(0, 1)
        bw.write(1, 6)   # VERBATIM
        bw.write(1, 1)   # wasted-bits flag
        bw.write(1, 3)   # unary 2 -> k-1=2 -> 3 wasted bits
        for v in vals:
            bw.write(int(v) >> 3, 13)  # bps drops to 16-3
        blob = _finish(_streaminfo(8000, 1, 16, n), _frame_header(n, 0), bw)
        _, _, out = FL.decode_flac(blob)
        assert np.array_equal(out[:, 0], vals)

    def test_constant_subframe(self):
        n = 24
        bw = _BitWriter()
        bw.write(0, 1)
        bw.write(0, 6)
        bw.write(0, 1)
        bw.write(-321, 16)
        blob = _finish(_streaminfo(8000, 1, 16, n), _frame_header(n, 0), bw)
        _, _, out = FL.decode_flac(blob)
        assert (out[:, 0] == -321).all()


class TestIntegrity:
    def test_header_crc8_mismatch(self):
        blob = bytearray(FL.encode_flac(8000, _sine16(n=100)))
        # STREAMINFO is 4 + 4 + 34 bytes; frame starts at 42; crc8 is the
        # byte right before the subframes — flip a header byte instead
        blob[44] ^= 0x01  # inside the frame header
        with pytest.raises(ValueError):
            FL.decode_flac(bytes(blob))

    def test_md5_mismatch(self):
        s = _sine16(n=64)
        good = FL.encode_flac(8000, s)
        # corrupt the stored md5 (last 16 bytes of STREAMINFO at 8+18)
        bad = bytearray(good)
        bad[8 + 18] ^= 0xFF
        with pytest.raises(ValueError, match="MD5"):
            FL.decode_flac(bytes(bad))

    def test_malformed_always_valueerror(self):
        good = FL.encode_flac(8000, _sine16(n=200))
        for bad in (
            b"",
            b"fLaC",
            b"XXXX" + good[4:],
            good[:30],
            good[:60],
            good[: len(good) - 2],
        ):
            with pytest.raises(ValueError):
                FL.decode_flac(bad)

    def test_byte_corruption_never_escapes_valueerror(self):
        good = FL.encode_flac(8000, _sine16(n=300, seed=5))
        for i in range(4, len(good), 11):
            ba = bytearray(good)
            ba[i] ^= 0xFF
            try:
                FL.decode_flac(bytes(ba))
            except ValueError:
                pass  # the only allowed exception type

    def test_encode_rejects_bad_input(self):
        with pytest.raises(ValueError):
            FL.encode_flac(8000, np.zeros(4, dtype=np.float32))
        with pytest.raises(ValueError):
            FL.encode_flac(8000, np.zeros((4, 9), dtype=np.int16))
        with pytest.raises(ValueError):
            FL.encode_flac(8000, np.zeros(0, dtype=np.int16))


def test_audio_features_surface(spark):
    """flac rows produce the same features as rawpcm rows carrying the
    same int16 samples (the q_audio contract-parity shape)."""
    from gjspark.operators.multimodal import audio_features

    s = _sine16(rate=16000, n=500, seed=9)
    raw = b"RAWA" + struct.pack("<II", 16000, 500) + s.astype("<i2").tobytes()
    df = spark.createDataFrame(
        [("r", raw, "rawpcm"), ("f", FL.encode_flac(16000, s), "flac"),
         ("x", b"\x00" * 16, "mp3")],
        "audio_id string, bytes binary, fmt string",
    )
    out = audio_features(df).toPandas().set_index("audio_id")
    assert set(out.index) == {"r", "f"}
    for col in ("sample_rate", "n_samples", "duration_s", "rms", "peak",
                "zero_cross_rate"):
        assert out.loc["r", col] == out.loc["f", col]