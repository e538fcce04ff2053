"""FLAC codec, pure Python/numpy, from the public specification
(RFC 9639 / the xiph.org FLAC format document — the frame grammar,
fixed-predictor coefficients, Rice coding, and CRC polynomials are the
format's published constants).

Same posture as the other from-spec codecs here (`jpeg.py`, `webp.py`,
`gif.py`, `wav.py`, `bmff.py`): an original numpy implementation around
public constants. Decoder: STREAMINFO + metadata-block walk, frame
headers (all block-size/sample-rate/sample-size codes, UTF-8-style
coded numbers), subframe types CONSTANT / VERBATIM / FIXED 0-4 /
LPC 1-32, wasted bits, Rice partitions (both 4- and 5-bit parameter
methods incl. escape-to-raw), stereo decorrelation (left/side,
right/side, mid/side), CRC-8 header + CRC-16 frame verification, and
the STREAMINFO MD5 integrity check over the decoded samples. Encoder:
fixed-blocksize frames, per-channel best-of fixed-order 0-2 prediction
with single-partition Rice residuals (escaping to VERBATIM when Rice
loses), emitting a spec-conformant stream the decoder round-trips
bit-exactly.

Malformed or truncated input always raises ``ValueError`` (shared
contract across all codecs here).

Reference parity note: the reference importer has no audio surface at
all; this module belongs to the multimodal training-data surface the
graft adds (SURVEY.md §2, multimodal ops).
"""

from __future__ import annotations

import hashlib
import struct
from bisect import bisect_left

import numpy as np

__all__ = ["decode_flac", "decode_flac_mono", "encode_flac"]


def _err(msg: str) -> ValueError:
    return ValueError(f"corrupt FLAC stream: {msg}")


# ---------------------------------------------------------------------------
# CRCs (FLAC's published polynomials: CRC-8 poly 0x07, CRC-16 poly 0x8005)


def _make_crc8_table():
    t = []
    for b in range(256):
        c = b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
        t.append(c)
    return t


def _make_crc16_table():
    t = []
    for b in range(256):
        c = b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
        t.append(c)
    return t


_CRC8 = _make_crc8_table()
_CRC16 = _make_crc16_table()


def _crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC8[c ^ b]
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC16[((c >> 8) ^ b) & 0xFF] ^ ((c << 8) & 0xFFFF)
    return c


# ---------------------------------------------------------------------------
# bit reader (MSB-first): unpacked bit array + a sorted index of set bits
# so unary (Rice quotient) reads are one bisect each


class _Bits:
    def __init__(self, data: bytes, start_byte: int = 0):
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.ones = np.flatnonzero(self.bits).tolist()
        self.pos = start_byte * 8
        self.n = len(self.bits)

    def read(self, n: int) -> int:
        p = self.pos
        if p + n > self.n:
            raise _err("bitstream exhausted")
        self.pos = p + n
        v = 0
        for b in self.bits[p : p + n]:
            v = (v << 1) | int(b)
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        j = bisect_left(self.ones, self.pos)
        if j >= len(self.ones):
            raise _err("unary run past end of stream")
        nxt = self.ones[j]
        q = nxt - self.pos
        self.pos = nxt + 1
        return q

    def align(self):
        self.pos = (self.pos + 7) & ~7


_SAMPLE_RATES = [0, 88200, 176400, 192000, 8000, 16000, 22050, 24000,
                 32000, 44100, 48000, 96000]

# published fixed-predictor coefficients, order 0..4
_FIXED_COEFS = [[], [1], [2, -1], [3, -3, 1], [4, -6, 4, -1]]


def _read_coded_number(br: _Bits) -> int:
    """UTF-8-style extended coded number (frame/sample number)."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n_extra = 0
    mask = 0x40
    while b0 & mask:
        n_extra += 1
        mask >>= 1
    if n_extra < 1 or n_extra > 6:
        raise _err("bad coded number")
    v = b0 & (mask - 1)
    for _ in range(n_extra):
        c = br.read(8)
        if c & 0xC0 != 0x80:
            raise _err("bad coded number continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _read_residual(br: _Bits, n: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise _err("reserved residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read(4)
    nparts = 1 << porder
    if n % nparts or (n >> porder) <= order and nparts > 1:
        raise _err("bad partition order")
    out = np.empty(n - order, dtype=np.int64)
    w = 0
    for p in range(nparts):
        m = (n >> porder) - (order if p == 0 else 0)
        if m < 0:
            raise _err("bad partition order")
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            for i in range(m):
                out[w + i] = br.read_signed(raw) if raw else 0
        else:
            for i in range(m):
                q = br.read_unary()
                r = br.read(param) if param else 0
                zz = (q << param) | r
                out[w + i] = (zz >> 1) ^ -(zz & 1)  # unzigzag
        w += m
    return out


def _read_subframe(br: _Bits, n: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise _err("subframe padding bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
        bps -= wasted
    if stype == 0:  # CONSTANT
        x = np.full(n, br.read_signed(bps), dtype=np.int64)
    elif stype == 1:  # VERBATIM
        x = np.fromiter((br.read_signed(bps) for _ in range(n)), np.int64, n)
    elif 8 <= stype <= 12:  # FIXED, order stype-8
        order = stype - 8
        if order > n:
            raise _err("fixed order exceeds block size")
        warm = [br.read_signed(bps) for _ in range(order)]
        res = _read_residual(br, n, order)
        x = np.empty(n, dtype=np.int64)
        x[:order] = warm
        coefs = _FIXED_COEFS[order]
        for i in range(order, n):  # serial IIR reconstruction
            acc = res[i - order]
            for j, c in enumerate(coefs):
                acc += c * x[i - 1 - j]
            x[i] = acc
    elif stype >= 32:  # LPC, order stype-31
        order = stype - 31
        if order > n:
            raise _err("lpc order exceeds block size")
        warm = [br.read_signed(bps) for _ in range(order)]
        prec = br.read(4)
        if prec == 15:
            raise _err("invalid lpc precision")
        prec += 1
        shift = br.read_signed(5)
        if shift < 0:
            raise _err("negative lpc shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        res = _read_residual(br, n, order)
        x = np.empty(n, dtype=np.int64)
        x[:order] = warm
        for i in range(order, n):
            acc = 0
            for j, c in enumerate(coefs):
                acc += c * int(x[i - 1 - j])
            x[i] = (acc >> shift) + res[i - order]
    else:
        raise _err(f"reserved subframe type {stype}")
    if wasted:
        x <<= wasted
    return x


def decode_flac(data: bytes) -> tuple[int, int, np.ndarray]:
    """-> (sample_rate, bits_per_sample, int32 array shape (n, ch))."""
    if len(data) < 8 or data[:4] != b"fLaC":
        raise _err("bad magic")
    off = 4
    si = None
    while True:
        if off + 4 > len(data):
            raise _err("truncated metadata block header")
        hdr = data[off]
        (length,) = struct.unpack(">I", b"\x00" + data[off + 1 : off + 4])
        off += 4
        if off + length > len(data):
            raise _err("truncated metadata block")
        if hdr & 0x7F == 0:  # STREAMINFO
            if length < 34:
                raise _err("short STREAMINFO")
            blob = data[off : off + 34]
            sr = (blob[10] << 12) | (blob[11] << 4) | (blob[12] >> 4)
            ch = ((blob[12] >> 1) & 0x7) + 1
            bps = (((blob[12] & 1) << 4) | (blob[13] >> 4)) + 1
            total = ((blob[13] & 0xF) << 32) | struct.unpack(
                ">I", blob[14:18]
            )[0]
            md5 = blob[18:34]
            si = (sr, ch, bps, total, md5)
        off += length
        if hdr & 0x80:
            break
    if si is None:
        raise _err("missing STREAMINFO")
    sr0, ch0, bps0, total, md5_exp = si
    if sr0 == 0 or ch0 < 1:
        raise _err("bad STREAMINFO")

    br = _Bits(data, off)
    chans: list[list[np.ndarray]] = [[] for _ in range(ch0)]
    got = 0
    while (total == 0 or got < total) and br.pos + 16 <= br.n:
        frame_start = br.pos >> 3
        if br.read(14) != 0x3FFE:
            raise _err("lost frame sync")
        br.read(1)  # reserved
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        br.read(1)  # reserved
        _read_coded_number(br)
        if bs_code == 0:
            raise _err("reserved block size code")
        elif bs_code == 1:
            n = 192
        elif bs_code <= 5:
            n = 576 << (bs_code - 2)
        elif bs_code == 6:
            n = br.read(8) + 1
        elif bs_code == 7:
            n = br.read(16) + 1
        else:
            n = 256 << (bs_code - 8)
        if sr_code == 0:
            pass
        elif sr_code <= 11:
            pass  # fixed table; STREAMINFO rate governs output
        elif sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        else:
            raise _err("invalid sample rate code")
        if ss_code in (0,):
            bps = bps0
        else:
            bps = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}.get(ss_code)
            if bps is None:
                raise _err("reserved sample size code")
        hdr_end = br.pos >> 3
        crc8 = br.read(8)
        if _crc8(data[frame_start:hdr_end]) != crc8:
            raise _err("frame header CRC-8 mismatch")

        if ch_code <= 7:
            n_ch = ch_code + 1
            subs = [_read_subframe(br, n, bps) for _ in range(n_ch)]
        elif ch_code in (8, 9, 10):
            n_ch = 2
            extra = (1, 0) if ch_code == 9 else (0, 1)
            a = _read_subframe(br, n, bps + extra[0])
            b = _read_subframe(br, n, bps + extra[1])
            if ch_code == 8:  # left/side
                subs = [a, a - b]
            elif ch_code == 9:  # right/side: a=side, b=right
                subs = [b + a, b]
            else:  # mid/side
                mid2 = (a << 1) | (b & 1)
                subs = [(mid2 + b) >> 1, (mid2 - b) >> 1]
        else:
            raise _err("reserved channel assignment")
        if n_ch != ch0:
            raise _err("frame channel count != STREAMINFO")
        br.align()
        body_end = br.pos >> 3
        crc16 = br.read(16)
        if _crc16(data[frame_start:body_end]) != crc16:
            raise _err("frame CRC-16 mismatch")
        for c in range(ch0):
            chans[c].append(subs[c])
        got += n
        # skip byte-aligned padding between frames? frames are contiguous
    if got == 0:
        raise _err("no frames")
    out = np.stack(
        [np.concatenate(c)[: total or None] for c in chans], axis=1
    )
    if total and out.shape[0] < total:
        raise _err("stream short of STREAMINFO total samples")
    lo, hi = -(1 << (bps0 - 1)), (1 << (bps0 - 1)) - 1
    if out.min(initial=0) < lo or out.max(initial=0) > hi:
        raise _err("sample out of range for bit depth")
    if md5_exp != b"\x00" * 16 and bps0 % 8 == 0:
        # STREAMINFO MD5 is over the raw interleaved little-endian
        # two's-complement samples at the stream's bit depth
        width = bps0 // 8
        if width == 1:
            raw = (out & 0xFF).astype(np.uint8).tobytes()
        elif width == 2:
            raw = np.ascontiguousarray(out.astype("<i2")).tobytes()
        elif width == 3:
            b4 = np.ascontiguousarray(out.astype("<i4")).view(np.uint8)
            raw = b4.reshape(-1, 4)[:, :3].tobytes()
        else:
            raw = np.ascontiguousarray(out.astype("<i4")).tobytes()
        if hashlib.md5(raw).digest() != md5_exp:
            raise _err("decoded-audio MD5 mismatch")
    return sr0, bps0, out.astype(np.int32)


def decode_flac_mono(data: bytes) -> tuple[int, np.ndarray]:
    """-> (sample_rate, float64 mono samples in [-1, 1]): channels
    mean-downmixed, the shape the audio-features operator consumes."""
    rate, bps, ch = decode_flac(data)
    x = ch.astype(np.float64) / float(1 << (bps - 1))
    return rate, x[:, 0] if x.shape[1] == 1 else x.mean(axis=1)


# ---------------------------------------------------------------------------
# encoder


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int):
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        return bytes(self.out)


def _rice_cost(res: np.ndarray, k: int) -> int:
    zz = (np.abs(res) << 1) - (res < 0)
    return int(np.sum(zz >> k)) + len(res) * (k + 1)


def _write_rice(bw: _BitWriter, res: np.ndarray, k: int):
    for v in res:
        v = int(v)
        zz = (v << 1) if v >= 0 else ((-v) << 1) - 1
        q = zz >> k
        bw.write(1, q + 1)  # q zeros then a 1
        if k:
            bw.write(zz & ((1 << k) - 1), k)


def encode_flac(rate: int, samples: np.ndarray, block: int = 4096) -> bytes:
    """int16 samples, shape (n,) mono or (n, ch) -> FLAC stream
    (fixed-blocksize frames, per-channel best-of fixed-order 0-2 +
    single-partition Rice, VERBATIM fallback)."""
    s = np.asarray(samples)
    if s.dtype != np.int16:
        raise ValueError("encode_flac expects int16 samples")
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2 or s.shape[1] < 1 or s.shape[1] > 8:
        raise ValueError("samples must be (n,) or (n, ch<=8)")
    n_total, n_ch = s.shape
    if n_total == 0:
        raise ValueError("empty sample array")
    bps = 16
    md5 = hashlib.md5(np.ascontiguousarray(s.astype("<i2")).tobytes()).digest()

    # STREAMINFO (last-metadata flag set)
    si = bytearray()
    si += struct.pack(">HH", block, block)
    si += b"\x00\x00\x00" * 2  # min/max frame size unknown
    si += bytes(
        [
            (rate >> 12) & 0xFF,
            (rate >> 4) & 0xFF,
            ((rate & 0xF) << 4) | ((n_ch - 1) << 1) | ((bps - 1) >> 4),
            (((bps - 1) & 0xF) << 4) | ((n_total >> 32) & 0xF),
        ]
    )
    si += struct.pack(">I", n_total & 0xFFFFFFFF)
    si += md5
    head = b"fLaC" + bytes([0x80]) + struct.pack(">I", len(si))[1:] + bytes(si)

    frames = bytearray()
    frame_no = 0
    for start in range(0, n_total, block):
        blk = s[start : start + block].astype(np.int64)
        n = blk.shape[0]
        bw = _BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)  # fixed blocksize strategy
        bw.write(7, 4)  # block size: 16-bit value-1 follows
        bw.write(0, 4)  # sample rate: from STREAMINFO
        bw.write(n_ch - 1, 4)  # independent channels
        bw.write(4, 3)  # 16-bit samples
        bw.write(0, 1)
        # coded frame number (UTF-8 style)
        if frame_no < 0x80:
            bw.write(frame_no, 8)
        elif frame_no < 0x800:
            bw.write(0xC0 | (frame_no >> 6), 8)
            bw.write(0x80 | (frame_no & 0x3F), 8)
        else:
            bw.write(0xE0 | (frame_no >> 12), 8)
            bw.write(0x80 | ((frame_no >> 6) & 0x3F), 8)
            bw.write(0x80 | (frame_no & 0x3F), 8)
        bw.write(n - 1, 16)
        bw.align()
        hdr = bw.bytes()
        frames += hdr
        frames.append(_crc8(hdr))
        bw2 = _BitWriter()
        for c in range(n_ch):
            x = blk[:, c]
            if n > 1 and (x == x[0]).all():
                bw2.write(0, 1)
                bw2.write(0, 6)  # CONSTANT
                bw2.write(0, 1)
                bw2.write(int(x[0]), bps)
                continue
            best = None
            for order in range(min(3, n)):
                res = x.copy()
                for _ in range(order):
                    res = np.diff(res)
                mean = float(np.mean(np.abs(res))) if len(res) else 0.0
                k = 0
                while (1 << (k + 1)) < mean + 1 and k < 14:
                    k += 1
                cost = _rice_cost(res, k) + order * bps
                if best is None or cost < best[0]:
                    best = (cost, order, k, res)
            cost, order, k, res = best
            if cost >= n * bps:  # VERBATIM wins
                bw2.write(0, 1)
                bw2.write(1, 6)
                bw2.write(0, 1)
                for v in x:
                    bw2.write(int(v), bps)
                continue
            bw2.write(0, 1)
            bw2.write(8 + order, 6)
            bw2.write(0, 1)  # no wasted bits
            for i in range(order):
                bw2.write(int(x[i]), bps)
            bw2.write(0, 2)  # 4-bit rice params
            bw2.write(0, 4)  # partition order 0
            bw2.write(k, 4)
            _write_rice(bw2, res, k)
        bw2.align()
        body = bw2.bytes()
        frames += body
        crc_frame = hdr + bytes([_crc8(hdr)]) + body
        frames += struct.pack(">H", _crc16(crc_frame))
        frame_no += 1
    return head + bytes(frames)
