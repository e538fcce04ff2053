"""RIFF/WAVE (WAV) codec, pure Python/numpy, from the public
specification (Microsoft/IBM Multimedia Programming Interface and Data
Specifications 1.0; the RIFF chunk grammar and the ``fmt ``/``data``
chunk layouts are public constants).

Same posture as the other from-spec codecs here (`jpeg.py`, `webp.py`,
`gif.py`, `bmff.py`): decoder walks the word-aligned chunk list,
accepts WAVE_FORMAT_PCM (8/16/24/32-bit integer) and
WAVE_FORMAT_IEEE_FLOAT (32/64-bit) plus WAVE_FORMAT_EXTENSIBLE
wrapping either, any channel count, and skips unknown chunks (LIST,
fact, cue, ...). Encoder emits canonical 44-byte-header PCM16.

Malformed or truncated input always raises ``ValueError`` (shared
contract across all codecs here).

Reference parity note: the reference importer has no audio surface at
all; this module belongs to the multimodal training-data surface the
graft adds (SURVEY.md §2, multimodal ops).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_wav", "decode_wav_mono", "encode_wav"]

_PCM = 1
_IEEE_FLOAT = 3
_EXTENSIBLE = 0xFFFE


def _err(msg: str) -> ValueError:
    return ValueError(f"corrupt WAV stream: {msg}")


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """-> (sample_rate, float64 array shape (n_samples, n_channels) in
    [-1, 1])."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise _err("bad RIFF/WAVE header")
    off = 12
    fmt = None
    payload = None
    while off + 8 <= len(data):
        cid = data[off : off + 4]
        (size,) = struct.unpack_from("<I", data, off + 4)
        off += 8
        if off + size > len(data):
            raise _err(f"truncated '{cid.decode('latin1')}' chunk")
        if cid == b"fmt ":
            if size < 16:
                raise _err("fmt chunk too short")
            fmt = struct.unpack_from("<HHIIHH", data, off)
        elif cid == b"data":
            payload = data[off : off + size]
        off += size + (size & 1)  # chunks are word-aligned
    if fmt is None:
        raise _err("missing fmt chunk")
    if payload is None:
        raise _err("missing data chunk")
    tag, n_ch, rate, _byte_rate, block_align, bps = fmt
    if tag == _EXTENSIBLE:
        # the real format tag is the first 2 bytes of the 16-byte SubFormat
        # GUID inside the extension (after cbSize and two u16 fields)
        # fmt chunk: 16 base + u16 cbSize + u16 validbits + u32 mask + GUID
        # Locate the fmt chunk again to read the extension.
        off = 12
        while off + 8 <= len(data):
            cid = data[off : off + 4]
            (size,) = struct.unpack_from("<I", data, off + 4)
            if cid == b"fmt ":
                if size < 40:
                    raise _err("extensible fmt chunk too short")
                (tag,) = struct.unpack_from("<H", data, off + 8 + 24)
                break
            off += 8 + size + (size & 1)
    if n_ch < 1 or rate < 1:
        raise _err("bad channel count or sample rate")
    if tag == _PCM:
        if bps == 8:
            x = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
            x = (x - 128.0) / 128.0
        elif bps == 16:
            x = np.frombuffer(payload[: len(payload) & ~1], dtype="<i2")
            x = x.astype(np.float64) / 32768.0
        elif bps == 24:
            n3 = len(payload) - len(payload) % 3
            b = np.frombuffer(payload[:n3], dtype=np.uint8).reshape(-1, 3)
            v = (
                b[:, 0].astype(np.int32)
                | (b[:, 1].astype(np.int32) << 8)
                | (b[:, 2].astype(np.int32) << 16)
            )
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            x = v.astype(np.float64) / float(1 << 23)
        elif bps == 32:
            x = np.frombuffer(payload[: len(payload) & ~3], dtype="<i4")
            x = x.astype(np.float64) / float(1 << 31)
        else:
            raise _err(f"unsupported PCM bit depth {bps}")
    elif tag == _IEEE_FLOAT:
        if bps == 32:
            x = np.frombuffer(payload[: len(payload) & ~3], dtype="<f4").astype(
                np.float64
            )
        elif bps == 64:
            x = np.frombuffer(payload[: len(payload) & ~7], dtype="<f8").astype(
                np.float64
            )
        else:
            raise _err(f"unsupported float bit depth {bps}")
    else:
        raise _err(f"unsupported format tag 0x{tag:04x}")
    n = x.size - x.size % n_ch
    return rate, x[:n].reshape(-1, n_ch)


def decode_wav_mono(data: bytes) -> tuple[int, np.ndarray]:
    """-> (sample_rate, float64 mono samples): channels mean-downmixed,
    the shape the audio-features operator consumes."""
    rate, ch = decode_wav(data)
    return rate, ch[:, 0] if ch.shape[1] == 1 else ch.mean(axis=1)


def encode_wav(rate: int, samples: np.ndarray) -> bytes:
    """int16 samples, shape (n,) mono or (n, ch) -> canonical PCM16 WAV."""
    s = np.asarray(samples)
    if s.dtype != np.int16:
        raise ValueError("encode_wav expects int16 samples")
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2 or s.shape[1] < 1:
        raise ValueError("samples must be (n,) or (n, ch)")
    n_ch = s.shape[1]
    payload = s.astype("<i2").tobytes()
    block_align = 2 * n_ch
    fmt = struct.pack("<HHIIHH", _PCM, n_ch, rate, rate * block_align, block_align, 16)
    out = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(payload))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(payload))
        + payload
    )
    if len(payload) & 1:
        out += b"\x00"
    return out
