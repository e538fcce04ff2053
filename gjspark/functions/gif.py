"""GIF87a/GIF89a codec, pure Python/numpy, from the public specification
(CompuServe GIF89a spec, also restated in RFC-adjacent W3C notes).

Same posture as `jpeg.py` (ITU-T T.81) and `webp.py` (RFC 9649): the
format's published constants and block grammar around an original numpy
implementation. Decoder: header + logical screen descriptor, global and
local color tables, graphic-control/comment/application extensions,
variable-width LZW with clear/EOI and the 12-bit cap, the 4-pass
interlace, multi-frame compositing with disposal methods 0-3 and
transparency. Encoder: single-frame GIF89a with a global palette built
from the image's unique colors (<= 256 required — the caller owns
quantization) and real LZW compression, so round trips are lossless by
construction.

Malformed or truncated input always raises ``ValueError`` (shared
contract across all codecs here).

Reference parity note: the reference importer has no raster formats at
all; this module belongs to the image-decode surface the graft adds
(SURVEY.md §2 P18).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "decode_gif",
    "decode_gif_frames",
    "encode_gif",
    "encode_gif_frames",
    "palettize_332",
]


def palettize_332(img: np.ndarray) -> np.ndarray:
    """Deterministic 3-3-2 mid-rise quantization -> <= 256 unique colors.

    GIF is a palette format; arbitrary RGB must be quantized before
    :func:`encode_gif`. The fixture corpus stores the *palettized* image
    as the source of truth for gif rows, so the format behaves losslessly
    within the corpus (decode(encode(palettize(x))) == palettize(x))."""
    out = np.empty_like(img)
    out[..., 0] = (img[..., 0] & 0xE0) | 0x10
    out[..., 1] = (img[..., 1] & 0xE0) | 0x10
    out[..., 2] = (img[..., 2] & 0xC0) | 0x20
    return out


def _err(msg: str) -> ValueError:
    return ValueError(f"corrupt GIF stream: {msg}")


# ---------------------------------------------------------------------------
# decode


def _read_subblocks(data: bytes, off: int) -> tuple[bytes, int]:
    chunks = []
    while True:
        if off >= len(data):
            raise _err("truncated sub-block chain")
        n = data[off]
        off += 1
        if n == 0:
            return b"".join(chunks), off
        if off + n > len(data):
            raise _err("truncated sub-block")
        chunks.append(data[off : off + n])
        off += n


def _lzw_codes(word: np.ndarray, pos: int, min_code_size: int, total_bits: int):
    """Vectorized extraction of every code from bit offset ``pos`` to the
    end of the stream, assuming no intervening CLEAR code.

    The GIF code-width schedule between clears is deterministic: the
    first code is read at ``min_code_size + 1`` bits and adds no table
    entry; every later code adds exactly one entry, and the width bumps
    when the table size reaches ``1 << width`` (capped at 12). So the bit
    offset of the k-th code is a pure function of k — all codes can be
    gathered with one cumsum + one shift/mask pass instead of reading
    bits one numpy scalar at a time (the old reader cost ~10 us/code;
    this is the GIF half of the decode_fused cost center). The caller
    rescans from the first CLEAR it finds, so correctness never depends
    on the no-clear assumption.

    Returns (codes int64 array, end_offsets int64 array) — end_offsets[i]
    is the bit position just after code i.
    """
    clear = 1 << min_code_size
    w0 = min_code_size + 1
    chunks = [np.full(1 + max(0, (1 << w0) - (clear + 2)), w0, np.int64)]
    for w in range(w0 + 1, 12):
        chunks.append(np.full(1 << (w - 1), w, np.int64))
    # width 12 until the next clear; cap by the bits actually remaining
    n12 = max(0, (total_bits - pos) // 12 + 1)
    chunks.append(np.full(n12, 12, np.int64))
    widths = np.concatenate(chunks)
    ends = pos + np.cumsum(widths)
    valid = ends <= total_bits
    widths, ends = widths[valid], ends[valid]
    offs = ends - widths
    byte_i = offs >> 3
    sh = (offs & 7).astype(np.uint32)
    codes = (word[byte_i] >> sh) & ((np.uint32(1) << widths.astype(np.uint32)) - 1)
    return codes.astype(np.int64), ends


def _lzw_decode(blob: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """Variable-width LZW (GIF flavor) -> uint8 index array."""
    if not 2 <= min_code_size <= 11:
        raise _err(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    total_bits = len(blob) * 8
    # word[i] = 24 stream bits starting at byte i (LSB-first order), so a
    # code at bit offset p is one shift+mask away: max width 12 + max
    # in-byte shift 7 = 19 bits needed
    b = np.frombuffer(blob, dtype=np.uint8)
    pad = np.concatenate([b, np.zeros(2, np.uint8)]).astype(np.uint32)
    word = pad[:-2] | (pad[1:-1] << np.uint32(8)) | (pad[2:] << np.uint32(16))
    # dictionary as python lists of bytes (rebuilt on clear)
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    out = bytearray()
    prev: bytes | None = None
    pos = 0
    done = False
    while not done:
        if pos + (min_code_size + 1) > total_bits:
            raise _err("LZW stream ran out of bits")
        codes, ends = _lzw_codes(word, pos, min_code_size, total_bits)
        if not len(codes):
            raise _err("LZW stream ran out of bits")
        # first CLEAR/EOI in this speculative chunk bounds the valid slice
        special = np.flatnonzero((codes == clear) | (codes == eoi))
        stop = int(special[0]) if len(special) else len(codes)
        # sequential dictionary expansion over plain ints — no width or
        # clear/eoi handling needed inside the hot loop
        for code in codes[:stop].tolist():
            if prev is None:
                if code >= len(table):
                    raise _err("first LZW code out of range")
                entry = table[code]
            else:
                lt = len(table)
                if code < lt:
                    entry = table[code]
                elif code == lt:
                    entry = prev + prev[:1]
                else:
                    raise _err("LZW code out of range")
                table.append(prev + entry[:1])
            out += entry
            prev = entry
            if len(out) >= n_pixels:
                done = True
                break
        if done:
            break
        if not len(special):
            # chunk exhausted without clear/eoi: the stream genuinely ran
            # out of bits before yielding enough pixels
            raise _err("LZW stream ran out of bits")
        if codes[stop] == eoi:
            break
        # CLEAR: reset and re-extract from just after it
        table = list(base)
        prev = None
        pos = int(ends[stop])
    if len(out) < n_pixels:
        raise _err("LZW output short of pixel count")
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(idx: np.ndarray, w: int, h: int) -> np.ndarray:
    rows = idx.reshape(h, w)
    out = np.empty_like(rows)
    src = 0
    for start, step in _INTERLACE_PASSES:
        n = len(range(start, h, step))
        out[start:h:step] = rows[src : src + n]
        src += n
    return out.ravel()


def decode_gif_frames(data: bytes):
    """-> list of (h, w, 3) uint8 RGB frames, composited per the
    disposal method of each frame's graphic-control extension."""
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise _err("bad signature")
    w, h = struct.unpack_from("<HH", data, 6)
    packed = data[10]
    bg_idx = data[11]
    off = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if off + 3 * n > len(data):
            raise _err("truncated global color table")
        gct = np.frombuffer(data, dtype=np.uint8, count=3 * n, offset=off).reshape(n, 3)
        off += 3 * n

    if w == 0 or h == 0:
        raise _err("zero canvas")
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None and bg_idx < len(gct):
        canvas[:] = gct[bg_idx]
    bg_fill = canvas[0, 0].copy()

    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0
    while True:
        if off >= len(data):
            raise _err("missing trailer")
        b0 = data[off]
        off += 1
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension
            if off >= len(data):
                raise _err("truncated extension")
            label = data[off]
            off += 1
            blob, off = _read_subblocks(data, off)
            if label == 0xF9:  # graphic control
                if len(blob) < 4:
                    raise _err("short graphic control block")
                disposal = (blob[0] >> 2) & 0x7
                transparent = blob[3] if blob[0] & 0x1 else None
            continue
        if b0 != 0x2C:
            raise _err(f"unknown block 0x{b0:02x}")
        # image descriptor
        if off + 9 > len(data):
            raise _err("truncated image descriptor")
        left, top, iw, ih = struct.unpack_from("<HHHH", data, off)
        ipacked = data[off + 8]
        off += 9
        if iw == 0 or ih == 0 or left + iw > w or top + ih > h:
            raise _err("frame outside canvas")
        lct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            if off + 3 * n > len(data):
                raise _err("truncated local color table")
            lct = np.frombuffer(
                data, dtype=np.uint8, count=3 * n, offset=off
            ).reshape(n, 3)
            off += 3 * n
        if lct is None:
            raise _err("no color table")
        if off >= len(data):
            raise _err("missing LZW code size")
        mcs = data[off]
        off += 1
        blob, off = _read_subblocks(data, off)
        idx = _lzw_decode(blob, mcs, iw * ih)
        if ipacked & 0x40:
            idx = _deinterlace(idx, iw, ih)
        if idx.max(initial=0) >= len(lct):
            raise _err("palette index out of range")
        region = canvas[top : top + ih, left : left + iw]
        saved = region.copy() if disposal == 3 else None
        rgb = lct[idx.reshape(ih, iw)]
        if transparent is not None:
            mask = idx.reshape(ih, iw) != transparent
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        if disposal == 2:  # restore to background
            region[:] = bg_fill
        elif disposal == 3 and saved is not None:  # restore to previous
            region[:] = saved
        transparent = None
        disposal = 0
    if not frames:
        raise _err("no image data")
    return frames


def decode_gif(data: bytes) -> np.ndarray:
    """First (usually only) frame as (h, w, 3) uint8 RGB."""
    return decode_gif_frames(data)[0]


# ---------------------------------------------------------------------------
# encode


def _lzw_encode(idx: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, w: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear, width)
    seq = b""
    data = idx.tobytes()
    for i in range(len(data)):
        nxt = seq + data[i : i + 1]
        if nxt in table:
            seq = nxt
            continue
        emit(table[seq], width)
        if next_code < 4096:
            table[nxt] = next_code
            # GIF encoders bump the width when the NEXT code would not fit
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear, width)
            table = {bytes([j]): j for j in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        seq = data[i : i + 1]
    if seq:
        emit(table[seq], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _palette_and_lzw(img: np.ndarray) -> tuple[int, bytes, bytes, int]:
    """-> (palette size bits, padded palette bytes, LZW blob, min code size)."""
    flat = img.reshape(-1, 3)
    palette, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"{len(palette)} colors; GIF needs <= 256 (quantize first)")
    # palette size must be a power of two >= 2
    bits = max(1, int(np.ceil(np.log2(max(len(palette), 2)))))
    size = 1 << bits
    pal = np.zeros((size, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    mcs = max(2, bits)
    return bits, pal.tobytes(), _lzw_encode(idx.astype(np.uint8), mcs), mcs


def _subblocked(mcs: int, lzw: bytes) -> bytes:
    body = bytearray([mcs])
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        body.append(len(chunk))
        body += chunk
    body.append(0)
    return bytes(body)


def encode_gif(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 with <= 256 unique colors -> single-frame GIF89a."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_gif expects (h, w, 3) uint8")
    h, w = img.shape[:2]
    bits, gct, lzw, mcs = _palette_and_lzw(img)
    head = b"GIF89a" + struct.pack("<HH", w, h) + bytes([0x80 | (bits - 1), 0, 0])
    desc = b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    return head + gct + desc + _subblocked(mcs, lzw) + b"\x3b"


def encode_gif_frames(frames: list[np.ndarray], delay_cs: int = 4) -> bytes:
    """Animated GIF89a: full-canvas opaque frames, each with its own
    local color table (<= 256 unique colors per frame — caller owns
    quantization), a graphic-control extension per frame (disposal 1 =
    leave in place, no transparency) and the NETSCAPE2.0 loop
    application extension. Because every frame is full-canvas opaque,
    :func:`decode_gif_frames` composites back exactly the input list —
    the animated round trip is lossless by construction."""
    if not frames:
        raise ValueError("encode_gif_frames needs at least one frame")
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.ndim != 3 or f.shape != (h, w, 3) or f.dtype != np.uint8:
            raise ValueError("frames must all be (h, w, 3) uint8 of one size")
    out = bytearray(b"GIF89a" + struct.pack("<HH", w, h) + bytes([0, 0, 0]))
    # NETSCAPE2.0 looping application extension (loop forever)
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for f in frames:
        bits, lct, lzw, mcs = _palette_and_lzw(f)
        # graphic control: disposal 1 (do not dispose), no transparency
        out += b"\x21\xf9\x04" + bytes([1 << 2]) + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + bytes([0x80 | (bits - 1)])
        out += lct
        out += _subblocked(mcs, lzw)
    out.append(0x3B)
    return bytes(out)
