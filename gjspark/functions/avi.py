"""AVI container, pure Python/numpy, from the public specification
(Microsoft RIFF/AVI — the same word-aligned RIFF chunk grammar as
`wav.py`, plus the published ``avih``/``strh``/``strf`` header layouts
and the ``movi`` frame-chunk convention).

Demuxer walks RIFF lists (``hdrl`` → ``avih`` + per-stream
``strl``/``strh``/``strf``, then ``movi`` → ``00db``/``00dc`` frame
chunks in storage order). Two codecs decode end-to-end: ``DIB ``
(uncompressed bottom-up BGR with 4-byte row padding, per the
BITMAPINFOHEADER spec) and ``MJPG`` (motion JPEG — one baseline JPEG
per frame, decoded by this repo's from-spec `jpeg.py`). Anything else
raises ``NotImplementedError`` like the other codec stubs. Muxer
writes a conformant single-video-stream file (including the ``idx1``
index) in either codec.

Malformed or truncated input always raises ``ValueError`` (shared
contract across all codecs here).

Reference parity note: the reference importer has no video surface at
all; this module belongs to the multimodal training-data surface the
graft adds (SURVEY.md §2, multimodal ops).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["demux_avi", "decode_avi_frame", "mux_avi"]


def _err(msg: str) -> ValueError:
    return ValueError(f"corrupt AVI stream: {msg}")


def _walk(data: bytes, off: int, end: int):
    """Yield (fourcc, payload_start, payload_size) over a RIFF chunk run."""
    while off + 8 <= end:
        cid = data[off : off + 4]
        (size,) = struct.unpack_from("<I", data, off + 4)
        if off + 8 + size > end:
            raise _err(f"truncated '{cid.decode('latin1')}' chunk")
        yield cid, off + 8, size
        off += 8 + size + (size & 1)


def demux_avi(data: bytes) -> dict:
    """-> {"w", "h", "n_frames", "codec", "frames": [bytes, ...]}.

    ``codec`` is the normalized video fourcc ('DIB ', 'MJPG', ...);
    ``frames`` are the raw movi chunk payloads in storage order."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise _err("bad RIFF/AVI header")
    w = h = None
    codec = None
    frames: list[bytes] = []
    saw_hdrl = False
    for cid, p, size in _walk(data, 12, len(data)):
        if cid != b"LIST":
            continue
        list_type = data[p : p + 4]
        if list_type == b"hdrl":
            saw_hdrl = True
            for c2, p2, s2 in _walk(data, p + 4, p + size):
                if c2 == b"avih":
                    if s2 < 40:
                        raise _err("short avih")
                    w, h = struct.unpack_from("<II", data, p2 + 32)
                elif c2 == b"LIST" and data[p2 : p2 + 4] == b"strl":
                    fcc_type = handler = None
                    bi_compression = None
                    for c3, p3, s3 in _walk(data, p2 + 4, p2 + s2):
                        if c3 == b"strh":
                            if s3 < 8:
                                raise _err("short strh")
                            fcc_type = data[p3 : p3 + 4]
                            handler = data[p3 + 4 : p3 + 8]
                        elif c3 == b"strf" and fcc_type == b"vids":
                            if s3 < 40:
                                raise _err("short strf")
                            (bi_compression,) = struct.unpack_from(
                                "<I", data, p3 + 16
                            )
                    if fcc_type == b"vids" and codec is None:
                        # biCompression governs (0 = BI_RGB = 'DIB ');
                        # fall back to the strh handler fourcc if strf
                        # was absent
                        if bi_compression == 0:
                            codec = "DIB "
                        elif bi_compression is not None:
                            codec = (
                                bi_compression.to_bytes(4, "little")
                                .decode("latin1")
                                .upper()
                            )
                        elif handler:
                            codec = handler.decode("latin1").upper()
        elif list_type == b"movi":
            for c2, p2, s2 in _walk(data, p + 4, p + size):
                # '##db'/'##dc' = video frame chunks for stream ##
                if c2[2:4] in (b"db", b"dc"):
                    frames.append(bytes(data[p2 : p2 + s2]))
    if not saw_hdrl or w is None:
        raise _err("missing hdrl/avih")
    if codec is None:
        raise _err("no video stream")
    if w == 0 or h == 0:
        raise _err("zero frame size")
    if not frames:
        raise _err("no movi frames")
    return {"w": int(w), "h": int(h), "n_frames": len(frames),
            "codec": codec, "frames": frames}


def decode_avi_frame(chunk: bytes, w: int, h: int, codec: str) -> np.ndarray:
    """One movi chunk payload -> (h, w, 3) uint8 RGB."""
    if codec == "DIB ":
        stride = (3 * w + 3) & ~3
        if len(chunk) < stride * h:
            raise _err("short DIB frame")
        rows = np.frombuffer(chunk, dtype=np.uint8, count=stride * h)
        rows = rows.reshape(h, stride)[:, : 3 * w].reshape(h, w, 3)
        return rows[::-1, :, ::-1].copy()  # bottom-up BGR -> top-down RGB
    if codec == "MJPG":
        from gjspark.functions.jpeg import decode_jpeg

        img = decode_jpeg(chunk)
        if img.shape[:2] != (h, w):
            raise _err("MJPG frame size mismatch")
        return img
    raise NotImplementedError(f"avi codec '{codec}' requires external library")


def _rgb_to_dib(frame: bytes, w: int, h: int) -> bytes:
    rgb = np.frombuffer(frame, dtype=np.uint8).reshape(h, w, 3)
    stride = (3 * w + 3) & ~3
    out = np.zeros((h, stride), dtype=np.uint8)
    out[:, : 3 * w] = rgb[::-1, :, ::-1].reshape(h, 3 * w)
    return out.tobytes()


def mux_avi(
    frames: list[bytes], w: int, h: int, codec: str = "DIB ", fps: int = 10
) -> bytes:
    """Write a conformant single-video-stream AVI (hdrl + movi + idx1).

    ``codec='DIB '``: ``frames`` are raw top-down RGB24 (w*h*3 bytes
    each), converted to the spec's bottom-up padded BGR. ``codec='MJPG'``:
    ``frames`` are pre-encoded baseline JPEG blobs stored as-is."""
    if not frames:
        raise ValueError("no frames")
    if codec == "DIB ":
        for f in frames:
            if len(f) != w * h * 3:
                raise ValueError("frame size does not match w*h*3")
        payloads = [_rgb_to_dib(f, w, h) for f in frames]
        bi_compression = 0
        handler = b"DIB "
    elif codec == "MJPG":
        payloads = list(frames)
        bi_compression = int.from_bytes(b"MJPG", "little")
        handler = b"MJPG"
    else:
        raise ValueError(f"unsupported mux codec {codec!r}")
    n = len(payloads)
    stride = (3 * w + 3) & ~3

    def chunk(cid: bytes, payload: bytes) -> bytes:
        return cid + struct.pack("<I", len(payload)) + payload + (
            b"\x00" if len(payload) & 1 else b""
        )

    def lst(list_type: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", list_type + payload)

    max_size = max(len(p) for p in payloads)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps,  # microseconds per frame
        max_size * fps,    # max bytes per second
        0,                 # padding granularity
        0x10,              # AVIF_HASINDEX
        n, 0, 1,           # total frames, initial frames, streams
        max_size, w, h,
        0, 0, 0, 0,
    )
    strh = (
        b"vids" + handler
        + struct.pack("<IHHIIIIIIIi", 0, 0, 0, 0, 1, fps, 0, n, max_size, 0, 0)
        + struct.pack("<HHHH", 0, 0, w, h)  # rcFrame
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, w, h, 1, 24, bi_compression, stride * h, 0, 0, 0, 0,
    )
    strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl)

    movi_payload = b"movi"
    idx = b""
    for p in payloads:
        # idx1 offsets are relative to the 'movi' fourcc position
        idx += b"00db" + struct.pack("<III", 0x10, len(movi_payload), len(p))
        movi_payload += chunk(b"00db", p)
    movi = chunk(b"LIST", movi_payload)
    idx1 = chunk(b"idx1", idx)
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body
