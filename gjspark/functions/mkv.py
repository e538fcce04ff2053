"""Matroska/WebM (EBML) container, pure Python, from the public
specifications (RFC 8794 EBML, RFC 9559 Matroska — element IDs and the
VINT/block grammar are the format's published constants).

Demuxer: EBML header (DocType), Segment walk — Info/TimestampScale,
Tracks/TrackEntry (number, type, CodecID, pixel dimensions), Clusters
with SimpleBlock and BlockGroup/Block (no-lacing, Xiph and fixed
lacing), unknown-size elements per RFC 8794 §6.2. ``V_UNCOMPRESSED``
frames (top-down RGB24, declared via the ColourSpace fourcc) decode
end-to-end; compressed codecs (V_VP8/V_VP9/V_AV1...) are surfaced so
callers can raise the shared NotImplementedError stub. Muxer writes a
conformant known-size single-video-track Matroska file with
``V_UNCOMPRESSED`` SimpleBlocks.

Malformed or truncated input always raises ``ValueError`` (shared
contract across all codecs here).

Reference parity note: the reference importer has no video surface at
all; this module belongs to the multimodal training-data surface the
graft adds (SURVEY.md §2, multimodal ops).
"""

from __future__ import annotations

import struct

__all__ = ["demux_mkv", "mux_mkv_rawvideo"]

# element IDs (stored form, marker bit included — RFC 9559 schema)
_EBML_HDR = 0x1A45DFA3
_DOCTYPE = 0x4282
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TS_SCALE = 0x2AD7B1
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_NUMBER = 0xD7
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_VIDEO = 0xE0
_PIXEL_W = 0xB0
_PIXEL_H = 0xBA
_COLOUR_SPACE = 0x2EB524
_CLUSTER = 0x1F43B675
_TIMESTAMP = 0xE7
_SIMPLE_BLOCK = 0xA3
_BLOCK_GROUP = 0xA0
_BLOCK = 0xA1
_DURATION_F = 0x4489
_MUX_APP = 0x4D80
_WRITE_APP = 0x5741


def _err(msg: str) -> ValueError:
    return ValueError(f"corrupt Matroska stream: {msg}")


def _read_id(data: bytes, off: int) -> tuple[int, int]:
    if off >= len(data):
        raise _err("truncated element id")
    b0 = data[off]
    n = 1
    for shift in (0x80, 0x40, 0x20, 0x10):
        if b0 & shift:
            break
        n += 1
    else:
        raise _err("invalid element id")
    if off + n > len(data):
        raise _err("truncated element id")
    v = 0
    for i in range(n):
        v = (v << 8) | data[off + i]
    return v, n


def _read_size(data: bytes, off: int) -> tuple[int | None, int]:
    """-> (size or None for unknown-size, n_bytes)."""
    if off >= len(data):
        raise _err("truncated element size")
    b0 = data[off]
    n = 1
    marker = 0x80
    while marker and not (b0 & marker):
        n += 1
        marker >>= 1
    if not marker or off + n > len(data):
        raise _err("invalid element size")
    v = b0 & (marker - 1)
    for i in range(1, n):
        v = (v << 8) | data[off + i]
    # all-ones value = unknown size (RFC 8794 §6.2)
    if v == (1 << (7 * n)) - 1:
        return None, n
    return v, n


def _walk(data: bytes, off: int, end: int):
    """Yield (element_id, payload_start, payload_end) within a master."""
    while off < end:
        eid, n1 = _read_id(data, off)
        size, n2 = _read_size(data, off + n1)
        p = off + n1 + n2
        pe = end if size is None else p + size
        if pe > end:
            raise _err("element overruns parent")
        yield eid, p, pe
        off = pe


def _uint(data: bytes, p: int, pe: int) -> int:
    v = 0
    for i in range(p, pe):
        v = (v << 8) | data[i]
    return v


def demux_mkv(data: bytes) -> dict:
    """-> {"doctype", "timescale", "tracks": [dict], "frames":
    [(track_number, bytes), ...]} with frames in storage order."""
    if len(data) < 8:
        raise _err("too short")
    eid, n1 = _read_id(data, 0)
    if eid != _EBML_HDR:
        raise _err("missing EBML header")
    size, n2 = _read_size(data, n1)
    if size is None:
        raise _err("EBML header must have known size")
    doctype = "matroska"
    for e, p, pe in _walk(data, n1 + n2, n1 + n2 + size):
        if e == _DOCTYPE:
            doctype = data[p:pe].decode("ascii", "replace").rstrip("\x00")
    off = n1 + n2 + size

    eid, n1 = _read_id(data, off)
    if eid != _SEGMENT:
        raise _err("missing Segment")
    size, n2 = _read_size(data, off + n1)
    seg_start = off + n1 + n2
    seg_end = len(data) if size is None else seg_start + size
    if seg_end > len(data):
        raise _err("Segment overruns file")

    timescale = 1_000_000
    tracks: list[dict] = []
    frames: list[tuple[int, bytes]] = []

    def read_block(p: int, pe: int):
        tn, nv = _read_size(data, p)  # track number is a plain VINT
        if tn is None:
            raise _err("bad block track number")
        if p + nv + 3 > pe:
            raise _err("short block header")
        flags = data[p + nv + 2]
        lacing = (flags >> 1) & 0x3
        q = p + nv + 3
        if lacing == 0:
            frames.append((tn, bytes(data[q:pe])))
            return
        if q >= pe:
            raise _err("short laced block")
        n_lace = data[q] + 1
        q += 1
        if lacing == 2:  # fixed-size lacing
            total = pe - q
            if total % n_lace:
                raise _err("bad fixed lacing")
            sz = total // n_lace
            for i in range(n_lace):
                frames.append((tn, bytes(data[q + i * sz : q + (i + 1) * sz])))
            return
        if lacing == 1:  # Xiph lacing
            sizes = []
            for _ in range(n_lace - 1):
                s = 0
                while True:
                    if q >= pe:
                        raise _err("bad xiph lacing")
                    s += data[q]
                    last = data[q] != 255
                    q += 1
                    if last:
                        break
                sizes.append(s)
            for s in sizes:
                if q + s > pe:
                    raise _err("xiph lace overrun")
                frames.append((tn, bytes(data[q : q + s])))
                q += s
            frames.append((tn, bytes(data[q:pe])))
            return
        raise _err("EBML lacing not supported")

    for eid, p, pe in _walk(data, seg_start, seg_end):
        if eid == _INFO:
            for e2, p2, pe2 in _walk(data, p, pe):
                if e2 == _TS_SCALE:
                    timescale = _uint(data, p2, pe2)
        elif eid == _TRACKS:
            for e2, p2, pe2 in _walk(data, p, pe):
                if e2 != _TRACK_ENTRY:
                    continue
                t = {"number": None, "type": None, "codec": "", "w": 0,
                     "h": 0, "colour_space": b""}
                for e3, p3, pe3 in _walk(data, p2, pe2):
                    if e3 == _TRACK_NUMBER:
                        t["number"] = _uint(data, p3, pe3)
                    elif e3 == _TRACK_TYPE:
                        t["type"] = _uint(data, p3, pe3)
                    elif e3 == _CODEC_ID:
                        t["codec"] = (
                            data[p3:pe3].decode("ascii", "replace").rstrip("\x00")
                        )
                    elif e3 == _VIDEO:
                        for e4, p4, pe4 in _walk(data, p3, pe3):
                            if e4 == _PIXEL_W:
                                t["w"] = _uint(data, p4, pe4)
                            elif e4 == _PIXEL_H:
                                t["h"] = _uint(data, p4, pe4)
                            elif e4 == _COLOUR_SPACE:
                                t["colour_space"] = bytes(data[p4:pe4])
                tracks.append(t)
        elif eid == _CLUSTER:
            for e2, p2, pe2 in _walk(data, p, pe):
                if e2 == _SIMPLE_BLOCK:
                    read_block(p2, pe2)
                elif e2 == _BLOCK_GROUP:
                    for e3, p3, pe3 in _walk(data, p2, pe2):
                        if e3 == _BLOCK:
                            read_block(p3, pe3)
    if not tracks:
        raise _err("no Tracks element")
    return {"doctype": doctype, "timescale": timescale, "tracks": tracks,
            "frames": frames}


# ---------------------------------------------------------------------------
# mux


def _enc_id(eid: int) -> bytes:
    n = (eid.bit_length() + 7) // 8
    return eid.to_bytes(n, "big")


def _enc_size(v: int) -> bytes:
    n = 1
    while v >= (1 << (7 * n)) - 1:  # avoid the all-ones (unknown) pattern
        n += 1
    return ((1 << (7 * n)) | v).to_bytes(n, "big")


def _el(eid: int, payload: bytes) -> bytes:
    return _enc_id(eid) + _enc_size(len(payload)) + payload


def _el_uint(eid: int, v: int) -> bytes:
    n = max(1, (v.bit_length() + 7) // 8)
    return _el(eid, v.to_bytes(n, "big"))


def mux_mkv_rawvideo(
    frames: list[bytes], w: int, h: int, fps: int = 10
) -> bytes:
    """Write a single-video-track Matroska file whose SimpleBlocks carry
    top-down RGB24 frames under ``V_UNCOMPRESSED`` (ColourSpace fourcc
    ``RGB\\x00``), one cluster for the stream, known sizes throughout."""
    if not frames:
        raise ValueError("no frames")
    frame_bytes = w * h * 3
    for f in frames:
        if len(f) != frame_bytes:
            raise ValueError("frame size does not match w*h*3")

    ebml = _el(
        _EBML_HDR,
        _el_uint(0x4286, 1)        # EBMLVersion
        + _el_uint(0x42F7, 1)      # EBMLReadVersion
        + _el_uint(0x42F2, 4)      # EBMLMaxIDLength
        + _el_uint(0x42F3, 8)      # EBMLMaxSizeLength
        + _el(_DOCTYPE, b"matroska")
        + _el_uint(0x4287, 4)      # DocTypeVersion
        + _el_uint(0x4285, 2),     # DocTypeReadVersion
    )
    info = _el(
        _INFO,
        _el_uint(_TS_SCALE, 1_000_000)
        + _el(_MUX_APP, b"gjspark")
        + _el(_WRITE_APP, b"gjspark")
        + _el(_DURATION_F, struct.pack(">f", len(frames) * 1000.0 / fps)),
    )
    video = _el(
        _VIDEO,
        _el_uint(_PIXEL_W, w) + _el_uint(_PIXEL_H, h)
        + _el(_COLOUR_SPACE, b"RGB\x00"),
    )
    entry = _el(
        _TRACK_ENTRY,
        _el_uint(_TRACK_NUMBER, 1)
        + _el_uint(0x73C5, 1)      # TrackUID
        + _el_uint(_TRACK_TYPE, 1)  # video
        + _el(_CODEC_ID, b"V_UNCOMPRESSED")
        + video,
    )
    tracks = _el(_TRACKS, entry)

    # SimpleBlock relative timestamps are s16 — split into clusters so
    # each block's offset from its cluster Timestamp stays in range
    ms_per_frame = 1000.0 / fps
    per_cluster = max(1, int(32767 // ms_per_frame))
    clusters = b""
    for base in range(0, len(frames), per_cluster):
        blocks = b""
        for i, f in enumerate(frames[base : base + per_cluster]):
            # SimpleBlock: track VINT(1), s16 rel timestamp, keyframe flag
            payload = (
                b"\x81" + struct.pack(">h", round(i * ms_per_frame)) + b"\x80" + f
            )
            blocks += _el(_SIMPLE_BLOCK, payload)
        clusters += _el(
            _CLUSTER,
            _el_uint(_TIMESTAMP, round(base * ms_per_frame)) + blocks,
        )

    segment = _el(_SEGMENT, info + tracks + clusters)
    return ebml + segment
