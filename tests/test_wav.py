"""RIFF/WAVE codec: PCM16 round trips, all supported sample formats,
chunk skipping/word alignment, extensible wrapping, downmix, the
malformed-input ValueError contract, and the audio-features surface."""

import struct

import numpy as np
import pytest

from gjspark.functions import wav as W


def _sine16(rate=16000, n=777, freq=440.0, amp=0.7, ch=1, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n)[:, None]
    x = amp * np.sin(2 * np.pi * freq * t / rate) + rng.normal(0, 0.01, (n, ch))
    return np.clip(np.round(x * 32768.0), -32768, 32767).astype(np.int16)


class TestRoundTrip:
    @pytest.mark.parametrize("ch", [1, 2, 6])
    @pytest.mark.parametrize("rate", [8000, 44100])
    def test_pcm16(self, ch, rate):
        s = _sine16(rate=rate, ch=ch, seed=ch * 10 + 1)
        rate2, out = W.decode_wav(W.encode_wav(rate, s))
        assert rate2 == rate and out.shape == s.shape
        assert np.array_equal(np.round(out * 32768.0).astype(np.int16), s)

    def test_mono_1d_input(self):
        s = _sine16(n=100)[:, 0]
        rate, out = W.decode_wav_mono(W.encode_wav(8000, s))
        assert rate == 8000 and out.shape == (100,)
        assert np.array_equal(np.round(out * 32768.0).astype(np.int16), s)

    def test_odd_payload_padding(self):
        # odd data-chunk byte counts get a pad byte (word alignment)
        s = np.zeros((3, 1), dtype=np.int16)
        blob = W.encode_wav(8000, s)
        # append a dummy trailing chunk to prove the walk stays aligned
        blob += b"LIST" + struct.pack("<I", 4) + b"INFO"
        rate, out = W.decode_wav(blob)
        assert out.shape == (3, 1)

    def test_stereo_downmix_mean(self):
        s = np.stack(
            [np.full(50, 1000, dtype=np.int16), np.full(50, 3000, dtype=np.int16)],
            axis=1,
        )
        _, mono = W.decode_wav_mono(W.encode_wav(8000, s))
        assert np.allclose(mono, 2000.0 / 32768.0)


def _manual_wav(tag, bps, payload, ch=1, rate=8000, ext=False):
    if ext:
        fmt = struct.pack(
            "<HHIIHHHHI", 0xFFFE, ch, rate, rate * ch * bps // 8, ch * bps // 8,
            bps, 22, bps, 0x4,
        ) + struct.pack("<H", tag) + b"\x00" * 14
    else:
        fmt = struct.pack(
            "<HHIIHH", tag, ch, rate, rate * ch * bps // 8, ch * bps // 8, bps
        )
    body = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


class TestFormats:
    def test_pcm8(self):
        vals = np.array([0, 128, 255], dtype=np.uint8)
        _, out = W.decode_wav(_manual_wav(1, 8, vals.tobytes()))
        assert np.allclose(out[:, 0], (vals.astype(float) - 128) / 128.0)

    def test_pcm24(self):
        vals = [(-(1 << 23)), -1, 0, 1, (1 << 23) - 1]
        payload = b"".join(
            int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals
        )
        _, out = W.decode_wav(_manual_wav(1, 24, payload))
        assert np.allclose(out[:, 0], np.array(vals) / float(1 << 23))

    def test_pcm32(self):
        vals = np.array([-(1 << 31), 0, (1 << 31) - 1], dtype="<i4")
        _, out = W.decode_wav(_manual_wav(1, 32, vals.tobytes()))
        assert np.allclose(out[:, 0], vals.astype(float) / float(1 << 31))

    def test_float32_and_float64(self):
        vals = np.array([-1.0, -0.25, 0.0, 0.5, 1.0])
        _, out = W.decode_wav(_manual_wav(3, 32, vals.astype("<f4").tobytes()))
        assert np.allclose(out[:, 0], vals, atol=1e-7)
        _, out = W.decode_wav(_manual_wav(3, 64, vals.astype("<f8").tobytes()))
        assert np.array_equal(out[:, 0], vals)

    def test_extensible_pcm16(self):
        s = _sine16(n=64)
        blob = _manual_wav(1, 16, s.astype("<i2").tobytes(), ext=True)
        rate, out = W.decode_wav(blob)
        assert np.array_equal(np.round(out * 32768.0).astype(np.int16), s)


class TestErrors:
    def test_malformed_always_valueerror(self):
        good = W.encode_wav(8000, _sine16(n=64))
        for bad in (
            b"",
            b"RIFF",
            b"RIFX" + good[4:],
            good[:20],
            good[:30],
            good[: len(good) - 3],
            _manual_wav(99, 16, b"\x00\x00"),   # unknown tag
            _manual_wav(1, 12, b"\x00\x00"),    # unsupported depth
        ):
            with pytest.raises(ValueError):
                W.decode_wav(bad)

    def test_missing_chunks(self):
        head = b"RIFF" + struct.pack("<I", 4) + b"WAVE"
        with pytest.raises(ValueError):
            W.decode_wav(head)
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        only_fmt = (
            b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt)) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        )
        with pytest.raises(ValueError):
            W.decode_wav(only_fmt)

    def test_encode_rejects_bad_dtype(self):
        with pytest.raises(ValueError):
            W.encode_wav(8000, np.zeros(4, dtype=np.float32))


def test_audio_features_surface(spark):
    """wav rows produce the same features as rawpcm rows carrying the
    same int16 samples (the q_audio contract-parity shape)."""
    from gjspark.operators.multimodal import audio_features

    s = _sine16(rate=16000, n=500, seed=3)
    raw = b"RAWA" + struct.pack("<II", 16000, 500) + s.astype("<i2").tobytes()
    wavb = W.encode_wav(16000, s)
    df = spark.createDataFrame(
        [("r", raw, "rawpcm"), ("w", wavb, "wav"), ("x", b"\x00" * 16, "mp3")],
        "audio_id string, bytes binary, fmt string",
    )
    out = audio_features(df).toPandas().set_index("audio_id")
    assert set(out.index) == {"r", "w"}  # mp3 stays a skipped stub
    for col in ("sample_rate", "n_samples", "duration_s", "rms", "peak",
                "zero_cross_rate"):
        assert out.loc["r", col] == out.loc["w", col]