"""Pure-numpy WebP-lossless (VP8L) baseline codec.

Implemented from the PUBLIC WebP Lossless Bitstream Specification
(RFC 9649 / Google "WebP Lossless Bitstream Specification"), the same
from-spec posture as :mod:`gjspark.functions.jpeg` (ITU-T T.81). No
reference-repo analogue (the importer has no image codecs); this closes
the ``webp`` entry of P18's honest-stub list.

Decoder scope — the full VP8L feature set:

- RIFF/WEBP/VP8L container and header;
- all four transforms (predictor 0-13, cross-color, subtract-green,
  color-indexing incl. pixel bundling), applied inverse in reverse order;
- meta-Huffman (entropy image) groups, color cache, LZ77 backward
  references with the 2-D distance map, simple (1/2-symbol) and
  code-length-coded prefix codes with the optional max_symbol limit;
- a vectorized fast path for streams whose literal codes are flat 8-bit
  and whose length/distance codes are unused (what :func:`encode_webp`
  emits): pixel payload decodes as one numpy pass instead of a per-pixel
  loop.

Encoder scope — a minimal but CONFORMANT stream: subtract-green
transform, no color cache, single Huffman group, flat 8-bit literal
codes (canonical code over 256 symbols of length 8), 0-bit single-symbol
alpha/distance codes. Every pixel costs exactly 24 bits; the point is a
valid interchange stream and a real decode path, not rate.

Interop caveat (same posture as jpeg.py/s2.py): no libwebp/PIL exists in
this container, so conformance is validated by round-trip, by hand-built
streams exercising the non-emitted features, and against the spec text —
documented-unvalidated against an external decoder. One-liner recipe
once a webp-capable env exists:
``PIL.Image.open(io.BytesIO(encode_webp(img)))`` must equal ``img``.

The 2-D distance map below is GENERATED from the neighborhood-ordering
rule evident in the spec's table (window dx in [-8, 8], dy in [0, 8];
sorted by squared Euclidean distance, then dy descending, then dx
descending; first 120). The generated prefix matches the spec's printed
table as far as cross-checked; encoder and decoder share the table, so
in-repo round-trips are self-consistent regardless.
"""

from __future__ import annotations

import struct
import zlib  # noqa: F401  (parity with sibling codecs' imports)

import numpy as np

# ---------------------------------------------------------------------------
# bit I/O (LSB-first, unlike JPEG)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, nbits: int) -> None:
        """Write ``nbits`` of ``value``, LSB first."""
        self.acc |= (value & ((1 << nbits) - 1)) << self.n
        self.n += nbits
        while self.n >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def put_code(self, code: int, length: int) -> None:
        """Write a canonical prefix code (MSB-first on the wire: the
        decoder builds ``code = code << 1 | next_bit``)."""
        for i in range(length - 1, -1, -1):
            self.put((code >> i) & 1, 1)

    def bytes(self) -> bytes:
        out = bytearray(self.buf)
        if self.n:
            out.append(self.acc & 0xFF)
        return bytes(out)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        # zero-padded window buffer: lets symbol reads gather 3 bytes with
        # three indexes instead of bit-at-a-time loops (reads past the end
        # decode the same way the old per-bit reader's implicit zeros did)
        self.pdata = data + b"\x00\x00\x00\x00"
        self.nbits = len(data) * 8
        self.bit = pos * 8

    def read(self, nbits: int) -> int:
        bit = self.bit
        if bit + nbits > self.nbits:
            # same condition as the old per-bit loop: any consumed bit
            # index past the stream end is an error
            raise ValueError("truncated VP8L stream")
        p = self.pdata
        byte = bit >> 3
        w = (
            p[byte]
            | (p[byte + 1] << 8)
            | (p[byte + 2] << 16)
            | (p[byte + 3] << 24)
        ) >> (bit & 7)
        self.bit = bit + nbits
        return w & ((1 << nbits) - 1)


# ---------------------------------------------------------------------------
# canonical prefix codes (DEFLATE-style assignment, VP8L semantics)
# ---------------------------------------------------------------------------

_MAX_CODE_LEN = 15
#: order in which code-length-code lengths appear in the stream
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def _canonical_codes(lengths) -> dict[int, tuple[int, int]]:
    """code_lengths -> {symbol: (code, length)} (canonical assignment:
    shorter lengths first, ties by symbol order)."""
    bl_count: dict[int, int] = {}
    for ln in lengths:
        if ln:
            bl_count[ln] = bl_count.get(ln, 0) + 1
    code = 0
    next_code = {}
    for ln in range(1, _MAX_CODE_LEN + 1):
        code = (code + bl_count.get(ln - 1, 0)) << 1
        next_code[ln] = code
    out = {}
    for sym, ln in enumerate(lengths):
        if ln:
            out[sym] = (next_code[ln], ln)
            next_code[ln] += 1
    return out


class _Code:
    """A decodable prefix code: either a 0-bit single-symbol code or a
    LUT over the next (up to ``_MAX_CODE_LEN``) raw LSB-first stream
    bits — windowed at the code's actual max length, which makes the
    short code-length codes ~7x cheaper to read."""

    __slots__ = ("single", "lut", "lengths", "maxlen", "mask")

    def __init__(self, single: int | None, lut: list[int] | None, lengths):
        self.single = single
        self.lut = lut
        self.lengths = lengths
        self.maxlen = max((ln for ln in lengths if ln), default=0) if lut else 0
        self.mask = (1 << self.maxlen) - 1

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        bit = br.bit
        p = br.pdata
        byte = bit >> 3
        # 3-byte gather (maxlen <= 15 + shift <= 7 = 22 bits); the zero
        # padding reproduces the old per-bit loop's implicit zeros past
        # the stream end
        w = (
            (p[byte] | (p[byte + 1] << 8) | (p[byte + 2] << 16)) >> (bit & 7)
        ) & self.mask
        e = self.lut[w]
        if e == 0:
            raise ValueError("invalid VP8L prefix code")
        br.bit = bit + (e & 0xF)
        return e >> 4


_CODE_CACHE: dict[bytes, "_Code"] = {}


def _build_code(lengths) -> _Code:
    nz = [(s, ln) for s, ln in enumerate(lengths) if ln]
    if not nz:
        raise ValueError("empty VP8L prefix code")
    if len(nz) == 1:
        return _Code(nz[0][0], None, lengths)
    # content-cached like the JPEG LUTs: real streams reuse the same code
    # shapes image over image (our encoder emits identical ones), and the
    # 2^15-entry list build is the dominant per-image cost otherwise
    key = bytes(lengths)
    cached = _CODE_CACHE.get(key)
    if cached is not None:
        return cached
    lut = np.zeros(1 << _MAX_CODE_LEN, dtype=np.int32)
    for sym, (code, ln) in _canonical_codes(lengths).items():
        # decoder consumes bits MSB-of-code first; raw stream is
        # LSB-first, so entry index's low ln bits = bit-reversed code
        rev = int(f"{code:0{ln}b}"[::-1], 2)
        step = 1 << ln
        lut[rev::step] = (sym << 4) | ln
    out = _Code(None, lut.tolist(), lengths)
    _CODE_CACHE[key] = out
    return out


def _simple_code(symbols: list[int]) -> _Code:
    if len(symbols) == 1:
        lengths = {symbols[0]: 0}
        return _Code(symbols[0], None, lengths)
    lengths = [0] * (max(symbols) + 1)
    lengths[symbols[0]] = 1
    lengths[symbols[1]] = 1
    lut = np.zeros(1 << _MAX_CODE_LEN, dtype=np.int32)
    lut[0::2] = (symbols[0] << 4) | 1
    lut[1::2] = (symbols[1] << 4) | 1
    return _Code(None, lut.tolist(), lengths)


def _read_code_lengths(br: _BitReader, alphabet: int) -> list[int]:
    """The code-length-coded (full) prefix-code form."""
    num_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_code = _build_code(cl_lengths)
    if br.read(1):  # use max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet
    lengths = [0] * alphabet
    symbol = 0
    prev = 8
    while symbol < alphabet and max_symbol > 0:
        max_symbol -= 1
        cl = cl_code.read(br)
        if cl < 16:
            lengths[symbol] = cl
            symbol += 1
            if cl:
                prev = cl
        else:
            extra, offset = {16: (2, 3), 17: (3, 3), 18: (7, 11)}[cl]
            repeat = br.read(extra) + offset
            if symbol + repeat > alphabet:
                raise ValueError("code-length repeat overflows alphabet")
            fill = prev if cl == 16 else 0
            for _ in range(repeat):
                lengths[symbol] = fill
                symbol += 1
    return lengths


def _read_prefix_code(br: _BitReader, alphabet: int) -> _Code:
    if br.read(1):  # simple
        num_symbols = br.read(1) + 1
        first_8bit = br.read(1)
        s0 = br.read(8 if first_8bit else 1)
        syms = [s0]
        if num_symbols == 2:
            syms.append(br.read(8))
        return _simple_code(syms)
    return _build_code(_read_code_lengths(br, alphabet))


# ---------------------------------------------------------------------------
# LZ77 prefix values + 2-D distance map
# ---------------------------------------------------------------------------


def _prefix_value(sym: int, br: _BitReader) -> int:
    """length/distance prefix decoding (spec 4.2.2)."""
    if sym < 4:
        return sym + 1
    extra = (sym - 2) >> 1
    offset = (2 + (sym & 1)) << extra
    return offset + br.read(extra) + 1


def _gen_distance_map() -> list[tuple[int, int]]:
    cands = []
    for dy in range(0, 9):
        for dx in range(-8, 9):
            if dy == 0 and dx <= 0:
                continue
            cands.append((dx, dy))
    cands.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], -p[0]))
    return cands[:120]


_DIST_MAP = _gen_distance_map()
_DIST_INV = {p: i + 1 for i, p in enumerate(_DIST_MAP)}


def _map_distance(code: int, xsize: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DIST_MAP[code - 1]
    return max(dy * xsize + dx, 1)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

_ALPHABETS = (280, 256, 256, 256, 40)  # green+len+cache, r, b, a, distance


def decode_webp(data: bytes) -> np.ndarray:
    """WebP-lossless bytes -> (h, w, 3) uint8 RGB.

    Malformed/truncated input always raises ``ValueError`` (struct /
    index errors are re-raised, mirroring decode_jpeg's contract)."""
    try:
        return _decode_webp(data)
    except (struct.error, IndexError, KeyError) as e:
        raise ValueError(f"corrupt WebP stream ({type(e).__name__}: {e})") from e


def _decode_webp(data: bytes) -> np.ndarray:
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP (RIFF) stream")
    pos = 12
    payload = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        if tag == b"VP8L":
            payload = data[pos + 8 : pos + 8 + size]
            break
        pos += 8 + size + (size & 1)
    if payload is None:
        raise ValueError("no VP8L chunk (only lossless WebP is supported)")
    if payload[0] != 0x2F:
        raise ValueError("bad VP8L signature")
    br = _BitReader(payload, 1)
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("unknown VP8L version")
    argb = _decode_image_stream(br, w, h, level0=True)
    rgb = np.empty((h, w, 3), dtype=np.uint8)
    rgb[:, :, 0] = (argb >> 16) & 0xFF
    rgb[:, :, 1] = (argb >> 8) & 0xFF
    rgb[:, :, 2] = argb & 0xFF
    return rgb


def _decode_image_stream(
    br: _BitReader, w: int, h: int, level0: bool
) -> np.ndarray:
    """-> (h, w) uint32 ARGB."""
    xsize = w
    transforms = []
    if level0:
        while br.read(1):
            ttype = br.read(2)
            if any(t[0] == ttype for t in transforms):
                raise ValueError("duplicate VP8L transform")
            if ttype == 0 or ttype == 1:  # predictor / cross-color
                size_bits = br.read(3) + 2
                bw = -(-xsize // (1 << size_bits))
                bh = -(-h // (1 << size_bits))
                sub = _decode_image_stream(br, bw, bh, level0=False)
                transforms.append((ttype, size_bits, sub))
            elif ttype == 2:  # subtract green
                transforms.append((2, None, None))
            else:  # color indexing
                pal_size = br.read(8) + 1
                pal = _decode_image_stream(br, pal_size, 1, level0=False)[0]
                pal = np.cumsum(  # palette entries are delta-coded per channel
                    np.stack(
                        [(pal >> s) & 0xFF for s in (24, 16, 8, 0)], axis=1
                    ).astype(np.uint8),
                    axis=0,
                    dtype=np.uint8,
                )
                if pal_size <= 2:
                    width_bits = 3
                elif pal_size <= 4:
                    width_bits = 2
                elif pal_size <= 16:
                    width_bits = 1
                else:
                    width_bits = 0
                transforms.append((3, (width_bits, pal), None))
                xsize = -(-xsize // (1 << width_bits))

    # color cache
    cache_bits = br.read(4) if br.read(1) else 0
    if cache_bits > 11:
        raise ValueError("invalid color-cache size")
    cache_size = (1 << cache_bits) if cache_bits else 0

    # meta huffman
    if level0 and br.read(1):
        huff_bits = br.read(3) + 2
        ew = -(-xsize // (1 << huff_bits))
        eh = -(-h // (1 << huff_bits))
        entropy = _decode_image_stream(br, ew, eh, level0=False)
        meta = (((entropy >> 8) & 0xFFFF)).astype(np.int64)
        n_groups = int(meta.max()) + 1
    else:
        huff_bits = 0
        meta = None
        n_groups = 1

    groups = []
    for _ in range(n_groups):
        codes = []
        for ci, alpha_sz in enumerate(_ALPHABETS):
            sz = alpha_sz + (cache_size if ci == 0 else 0)
            codes.append(_read_prefix_code(br, sz))
        groups.append(codes)

    argb = _decode_pixels(
        br, xsize, h, groups, meta, huff_bits, cache_bits
    )

    for ttype, arg, sub in reversed(transforms):
        if ttype == 2:
            argb = _inv_subtract_green(argb)
        elif ttype == 3:
            argb = _inv_color_indexing(argb, w, arg[0], arg[1])
        elif ttype == 1:
            argb = _inv_color_transform(argb, arg, sub)
        else:
            argb = _inv_predictor(argb, arg, sub)
    return argb


def _decode_pixels(br, w, h, groups, meta, huff_bits, cache_bits):
    n = w * h
    out = np.zeros(n, dtype=np.uint32)
    cache = [0] * (1 << cache_bits) if cache_bits else None

    # fast path: single group, flat 8-bit literal codes, 0-bit alpha,
    # unused distance code, no cache -> payload is 3 bytes/pixel
    if meta is None and cache_bits == 0:
        g, r, b, a, _d = groups[0]
        if (
            g.single is None
            and r.single is None
            and b.single is None
            and a.single is not None
            and _flat8(g.lengths, 256)
            and _flat8(r.lengths, 256)
            and _flat8(b.lengths, 256)
        ):
            need = n * 3
            bit = br.bit
            raw = np.frombuffer(
                br.data, dtype=np.uint8, count=min(len(br.data), (bit >> 3) + need + 1)
            )[bit >> 3 :]
            if len(raw) < need + (1 if bit & 7 else 0):
                raise ValueError("truncated VP8L literal payload")
            off = bit & 7
            if off:
                raw = ((raw[:-1] >> off) | (raw[1:] << (8 - off))).astype(np.uint8)
            trip = raw[:need].reshape(n, 3)
            # stream byte = bit-reversed canonical code = bit-reversed symbol
            gg = _BITREV[trip[:, 0]].astype(np.uint32)
            rr = _BITREV[trip[:, 1]].astype(np.uint32)
            bb = _BITREV[trip[:, 2]].astype(np.uint32)
            out[:] = (np.uint32(a.single) << 24) | (rr << 16) | (gg << 8) | bb
            br.bit = bit + need * 8
            return out.reshape(h, w)

    i = 0
    gmask = (1 << huff_bits) - 1 if huff_bits else 0
    codes = groups[0]
    while i < n:
        if meta is not None:
            y, x = divmod(i, w)
            codes = groups[int(meta[y >> huff_bits, x >> huff_bits])]
        gcode, rcode, bcode, acode, dcode = codes
        s = gcode.read(br)
        if s < 256:
            red = rcode.read(br)
            blue = bcode.read(br)
            alpha = acode.read(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[i] = px
            if cache is not None:
                cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px
            i += 1
        elif s < 280:
            length = _prefix_value(s - 256, br)
            dsym = dcode.read(br)
            dist = _map_distance(_prefix_value(dsym, br), w)
            if dist > i or i + length > n:
                raise ValueError("invalid VP8L backward reference")
            for k in range(length):
                px = int(out[i - dist])
                out[i] = px
                if cache is not None:
                    cache[
                        (0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)
                    ] = px
                i += 1
        else:
            if cache is None:
                raise ValueError("cache reference without color cache")
            out[i] = cache[s - 280]
            i += 1
    return out.reshape(h, w)


_BITREV = np.array(
    [int(f"{i:08b}"[::-1], 2) for i in range(256)], dtype=np.uint8
)


def _flat8(lengths, n) -> bool:
    return all(lengths[s] == 8 for s in range(n)) and not any(
        lengths[s] for s in range(n, len(lengths))
    )


# ----- inverse transforms ---------------------------------------------------


def _inv_subtract_green(argb: np.ndarray) -> np.ndarray:
    g = (argb >> 8) & 0xFF
    r = ((argb >> 16) & 0xFF) + g
    b = (argb & 0xFF) + g
    return (
        (argb & np.uint32(0xFF00FF00))
        | ((r & 0xFF) << 16).astype(np.uint32)
        | (b & 0xFF).astype(np.uint32)
    )


def _inv_color_indexing(argb, orig_w, width_bits, palette) -> np.ndarray:
    h = argb.shape[0]
    if width_bits:
        per = 1 << width_bits
        bits = 8 >> width_bits
        idx = (argb >> 8) & 0xFF  # bundled indices live in green
        cols = []
        for k in range(per):
            cols.append((idx >> (k * bits)) & ((1 << bits) - 1))
        idx_full = np.stack(cols, axis=2).reshape(h, -1)[:, :orig_w]
    else:
        idx_full = ((argb >> 8) & 0xFF)[:, :orig_w]
    idx_full = np.minimum(idx_full, len(palette) - 1).astype(np.int64)
    pal32 = (
        (palette[:, 0].astype(np.uint32) << 24)
        | (palette[:, 1].astype(np.uint32) << 16)
        | (palette[:, 2].astype(np.uint32) << 8)
        | palette[:, 3].astype(np.uint32)
    )
    return pal32[idx_full]


def _ct_delta(t: np.ndarray, c: np.ndarray) -> np.ndarray:
    """ColorTransformDelta: (int8(t) * int8(c)) >> 5 (arithmetic)."""
    return (t.astype(np.int8).astype(np.int32) * c.astype(np.int8).astype(np.int32)) >> 5


def _inv_color_transform(argb, size_bits, sub) -> np.ndarray:
    h, w = argb.shape
    ys = np.arange(h) >> size_bits
    xs = np.arange(w) >> size_bits
    el = sub[np.ix_(ys, xs)]
    g2r = (el & 0xFF).astype(np.uint8)  # blue channel: green_to_red
    g2b = ((el >> 8) & 0xFF).astype(np.uint8)  # green: green_to_blue
    r2b = ((el >> 16) & 0xFF).astype(np.uint8)  # red: red_to_blue
    g = ((argb >> 8) & 0xFF).astype(np.uint8)
    r = (((argb >> 16) & 0xFF).astype(np.int32) + _ct_delta(g2r, g)) & 0xFF
    b = (
        (argb & 0xFF).astype(np.int32)
        + _ct_delta(g2b, g)
        + _ct_delta(r2b, r.astype(np.uint8))
    ) & 0xFF
    return (
        (argb & np.uint32(0xFF00FF00))
        | (r.astype(np.uint32) << 16)
        | b.astype(np.uint32)
    )


def _px(a, r, g, b):
    return (
        ((a & 0xFF) << 24) | ((r & 0xFF) << 16) | ((g & 0xFF) << 8) | (b & 0xFF)
    )


def _avg2(x, y):
    return tuple(((x >> s & 0xFF) + (y >> s & 0xFF)) // 2 for s in (24, 16, 8, 0))


def _inv_predictor(argb, size_bits, sub) -> np.ndarray:
    """Sequential spec-exact inverse predictor (modes 0-13). Row-major;
    per-pixel Python — correctness path only (the in-repo encoder never
    emits this transform; it exists for decoding external streams)."""
    h, w = argb.shape
    out = argb.astype(np.int64).copy()

    def comp(px):
        return ((px >> 24) & 0xFF, (px >> 16) & 0xFF, (px >> 8) & 0xFF, px & 0xFF)

    def add(px, pred):
        pa, pr, pg, pb = comp(px)
        qa, qr, qg, qb = comp(pred)
        return _px(pa + qa, pr + qr, pg + qg, pb + qb)

    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(out[0, x - 1])
            elif x == 0:
                pred = int(out[y - 1, 0])
            else:
                mode = int((sub[y >> size_bits, x >> size_bits] >> 8) & 0xFF)
                L = int(out[y, x - 1])
                T = int(out[y - 1, x])
                TL = int(out[y - 1, x - 1])
                TR = int(out[y - 1, x + 1]) if x + 1 < w else int(out[y - 1, 0])
                if mode == 0:
                    pred = 0xFF000000
                elif mode == 1:
                    pred = L
                elif mode == 2:
                    pred = T
                elif mode == 3:
                    pred = TR
                elif mode == 4:
                    pred = TL
                elif mode == 5:
                    pred = _px(*_avg2(_px(*_avg2(L, TR)), T))
                elif mode == 6:
                    pred = _px(*_avg2(L, TL))
                elif mode == 7:
                    pred = _px(*_avg2(L, T))
                elif mode == 8:
                    pred = _px(*_avg2(TL, T))
                elif mode == 9:
                    pred = _px(*_avg2(T, TR))
                elif mode == 10:
                    pred = _px(*_avg2(_px(*_avg2(L, TL)), _px(*_avg2(T, TR))))
                elif mode == 11:  # Select
                    pl = sum(abs((T >> s & 0xFF) - (TL >> s & 0xFF)) for s in (24, 16, 8, 0))
                    pt = sum(abs((L >> s & 0xFF) - (TL >> s & 0xFF)) for s in (24, 16, 8, 0))
                    pred = L if pt <= pl else T
                elif mode == 12:  # ClampAddSubtractFull
                    pred = _px(
                        *(
                            max(0, min(255, (L >> s & 0xFF) + (T >> s & 0xFF) - (TL >> s & 0xFF)))
                            for s in (24, 16, 8, 0)
                        )
                    )
                elif mode == 13:  # ClampAddSubtractHalf
                    def cash(s):
                        ave = ((L >> s & 0xFF) + (T >> s & 0xFF)) // 2
                        return max(0, min(255, ave + (ave - (TL >> s & 0xFF)) // 2))

                    pred = _px(*(cash(s) for s in (24, 16, 8, 0)))
                else:
                    raise ValueError("invalid predictor mode")
            out[y, x] = add(int(out[y, x]), pred)
    return out.astype(np.uint32)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _put_flat8_code(bw: _BitWriter, alphabet: int) -> None:
    """Emit the code-length-coded form of: symbols 0..255 length 8, rest
    unused — via a 2-symbol code-length code {0: len 1, 8: len 1} and the
    max_symbol shortcut."""
    bw.put(0, 1)  # not simple
    bw.put(14 - 4, 4)  # num_code_lengths = 14 (covers index of symbol 8)
    for i in range(14):
        bw.put(1 if _CL_ORDER[i] in (0, 8) else 0, 3)
    bw.put(1, 1)  # use max_symbol
    bw.put(3, 3)  # length_nbits = 2 + 2*3 = 8
    bw.put(254, 8)  # max_symbol = 2 + 254 = 256
    # canonical CL code over {0, 8} at length 1: symbol 0 -> 0, 8 -> 1
    for _ in range(256):
        bw.put(1, 1)


def encode_webp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> lossless WebP (VP8L) bytes.

    Subtract-green transform + flat 8-bit literal codes; exactly 24 bits
    per pixel + ~130 bytes of header. Lossless by construction."""
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_webp expects 3-channel RGB")
    h, w = img.shape[:2]
    if w > 1 << 14 or h > 1 << 14:
        raise ValueError("image too large for VP8L dimensions")
    bw = _BitWriter()
    bw.put(0x2F, 8)  # signature
    bw.put(w - 1, 14)
    bw.put(h - 1, 14)
    bw.put(0, 1)  # alpha unused
    bw.put(0, 3)  # version
    bw.put(1, 1)  # transform present
    bw.put(2, 2)  # subtract green
    bw.put(0, 1)  # no more transforms
    bw.put(0, 1)  # no color cache
    bw.put(0, 1)  # no meta huffman
    _put_flat8_code(bw, 280)  # green
    _put_flat8_code(bw, 256)  # red
    _put_flat8_code(bw, 256)  # blue
    # alpha: simple 1-symbol code (255) -> 0 bits per pixel
    bw.put(1, 1)
    bw.put(0, 1)  # num_symbols = 1
    bw.put(1, 1)  # 8-bit symbol
    bw.put(255, 8)
    # distance: simple 1-symbol code (0), 1-bit symbol form
    bw.put(1, 1)
    bw.put(0, 1)
    bw.put(0, 1)
    bw.put(0, 1)
    # pixel payload: subtract-green residuals; flat canonical codes make
    # the wire byte the bit-reversed symbol -> pure numpy assembly
    r = img[:, :, 0].astype(np.int16)
    g = img[:, :, 1].astype(np.int16)
    b = img[:, :, 2].astype(np.int16)
    rs = ((r - g) & 0xFF).astype(np.uint8)
    bs = ((b - g) & 0xFF).astype(np.uint8)
    trip = np.stack(
        [_BITREV[g.astype(np.uint8)], _BITREV[rs], _BITREV[bs]], axis=2
    ).reshape(-1)
    head = bw.bytes()
    nbits = bw.n  # residual bits in the last (partial) header byte
    if nbits == 0:
        payload = head + trip.tobytes()
    else:
        # merge the pixel bytes into the bitstream at the current offset:
        # LSB-first, so each byte contributes (B << nbits) to this output
        # byte and (B >> (8 - nbits)) carries into the next
        arr = trip.astype(np.uint16)
        lo = ((arr << nbits) & 0xFF).astype(np.uint8)
        hi = (arr >> (8 - nbits)).astype(np.uint8)
        full = np.empty(len(trip) + 1, dtype=np.uint8)
        full[0] = head[-1] | lo[0]
        full[1:-1] = hi[:-1] | lo[1:]
        full[-1] = hi[-1]
        payload = head[:-1] + full.tobytes()
    riff = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        riff += b"\x00"
    out_bytes = b"WEBP" + riff
    return b"RIFF" + struct.pack("<I", len(out_bytes)) + out_bytes
