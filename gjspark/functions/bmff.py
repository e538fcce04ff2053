"""ISO Base Media File Format (MP4) container demux/mux, pure Python.

Implemented from the public ISO/IEC 14496-12 specification (the box
grammar is also restated in RFC 6381 / the QuickTime File Format docs):
box = u32 size + 4CC type, ``size == 1`` -> u64 largesize follows,
``size == 0`` -> box extends to the end of its container; FullBox adds
u8 version + 24-bit flags. This module handles the CONTAINER layer
only — walking the box tree, the ``moov`` movie/track metadata, and the
``stbl`` sample tables (stsd/stts/stsc/stsz/stco/co64/stss) that map
samples to byte ranges — which is exactly the demux work a frame-
sampling training pipeline needs before any codec runs. Codec payload
decode (avc1/hev1/av01/vp09...) is NOT implemented here: those stay
honest environment stubs, same posture as avif/mp3 (`multimodal.py`).
The muxer writes a conformant single-video-track file whose sample
entry is the engine's deterministic ``rawv`` raw-RGB format, so the
container path is exercised end-to-end by real spec-shaped files.

Same error contract as `jpeg.py`/`webp.py`: malformed or truncated
input always raises ``ValueError``.

Reference parity note: the reference importer (FROST-GeoJsonImporter)
has no video path; this module belongs to the training-data-pipeline
surface the graft adds (SURVEY.md §2 P18 / multimodal).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

__all__ = ["parse_boxes", "demux_mp4", "extract_samples", "mux_mp4_rawvideo"]


# ---------------------------------------------------------------------------
# box tree


@dataclass
class Box:
    type: str
    start: int  # offset of the box header in the file
    payload_start: int
    payload_end: int
    children: list["Box"] = field(default_factory=list)


# containers whose payload is a sequence of child boxes
_CONTAINERS = {
    "moov", "trak", "mdia", "minf", "stbl", "dinf", "edts", "mvex",
    "moof", "traf", "udta",
}


def _err(msg: str) -> ValueError:
    return ValueError(f"corrupt BMFF stream: {msg}")


def parse_boxes(data: bytes, start: int = 0, end: int | None = None) -> list[Box]:
    """Walk a box sequence in ``data[start:end]`` -> list of ``Box``.

    Children of known container boxes are parsed recursively. Unknown
    box types are kept as opaque leaves (forward compatibility is a
    design goal of the format).
    """
    if end is None:
        end = len(data)
    out: list[Box] = []
    off = start
    while off < end:
        if off + 8 > end:
            raise _err(f"truncated box header at {off}")
        (size,) = struct.unpack_from(">I", data, off)
        btype = data[off + 4 : off + 8]
        try:
            type_s = btype.decode("ascii")
        except UnicodeDecodeError:
            raise _err(f"non-ascii box type at {off}") from None
        payload = off + 8
        if size == 1:
            if payload + 8 > end:
                raise _err(f"truncated largesize at {off}")
            (size,) = struct.unpack_from(">Q", data, payload)
            payload += 8
            if size < 16:
                raise _err(f"largesize too small at {off}")
            box_end = off + size
        elif size == 0:
            box_end = end
        else:
            if size < 8:
                raise _err(f"box size {size} too small at {off}")
            box_end = off + size
        if box_end > end:
            raise _err(f"box '{type_s}' overruns container at {off}")
        b = Box(type_s, off, payload, box_end)
        if type_s in _CONTAINERS:
            b.children = parse_boxes(data, payload, box_end)
        out.append(b)
        off = box_end
    return out


def _find(boxes: list[Box], type_s: str) -> Box | None:
    for b in boxes:
        if b.type == type_s:
            return b
    return None


def _find_all(boxes: list[Box], type_s: str) -> list[Box]:
    return [b for b in boxes if b.type == type_s]


def _fullbox(data: bytes, b: Box) -> tuple[int, int, int]:
    """-> (version, flags, payload offset past the FullBox header)."""
    if b.payload_start + 4 > b.payload_end:
        raise _err(f"truncated FullBox '{b.type}'")
    version = data[b.payload_start]
    flags = int.from_bytes(data[b.payload_start + 1 : b.payload_start + 4], "big")
    return version, flags, b.payload_start + 4


# ---------------------------------------------------------------------------
# demux


@dataclass
class Track:
    track_id: int
    handler: str  # 'vide' / 'soun' / ...
    codec: str  # sample-entry fourcc, e.g. 'rawv', 'avc1'
    width: int
    height: int
    timescale: int
    duration: int
    sample_sizes: list[int]
    sample_offsets: list[int]
    sync_samples: list[int] | None  # 1-based keyframe numbers; None = all
    sample_entry_payload: bytes = b""


def _u32s(data: bytes, off: int, n: int) -> list[int]:
    if off + 4 * n > len(data):
        raise _err("truncated table")
    return list(struct.unpack_from(f">{n}I", data, off))


def _parse_stbl(data: bytes, stbl: Box) -> dict:
    stsd = _find(stbl.children, "stsd")
    stsz = _find(stbl.children, "stsz")
    stsc = _find(stbl.children, "stsc")
    stco = _find(stbl.children, "stco") or _find(stbl.children, "co64")
    if not (stsd and stsz and stsc and stco):
        raise _err("stbl missing a required sample table")

    # stsd: first sample entry's fourcc (+ payload for codec probing)
    _, _, p = _fullbox(data, stsd)
    (entry_count,) = struct.unpack_from(">I", data, p)
    if entry_count < 1 or p + 16 > stsd.payload_end:
        raise _err("empty stsd")
    (esize,) = struct.unpack_from(">I", data, p + 4)
    codec = data[p + 8 : p + 12].decode("ascii", errors="replace")
    entry_payload = bytes(data[p + 12 : min(p + 4 + esize, stsd.payload_end)])

    # stsz: constant or per-sample sizes
    _, _, p = _fullbox(data, stsz)
    const_size, n_samples = struct.unpack_from(">II", data, p)
    if const_size:
        sizes = [const_size] * n_samples
    else:
        sizes = _u32s(data, p + 8, n_samples)

    # stco / co64: chunk offsets
    _, _, p = _fullbox(data, stco)
    (n_chunks,) = struct.unpack_from(">I", data, p)
    if stco.type == "co64":
        if p + 4 + 8 * n_chunks > stco.payload_end:
            raise _err("truncated co64")
        chunk_offsets = list(struct.unpack_from(f">{n_chunks}Q", data, p + 4))
    else:
        chunk_offsets = _u32s(data, p + 4, n_chunks)

    # stsc: run-length (first_chunk, samples_per_chunk) -> per-chunk counts
    _, _, p = _fullbox(data, stsc)
    (n_runs,) = struct.unpack_from(">I", data, p)
    runs = []
    for i in range(n_runs):
        fc, spc, _sdi = struct.unpack_from(">III", data, p + 4 + 12 * i)
        runs.append((fc, spc))
    per_chunk: list[int] = []
    for i, (fc, spc) in enumerate(runs):
        last = runs[i + 1][0] - 1 if i + 1 < len(runs) else n_chunks
        if fc < 1 or last < fc - 1:
            raise _err("bad stsc run")
        per_chunk.extend([spc] * (last - fc + 1))
    if len(per_chunk) != n_chunks:
        raise _err("stsc does not cover all chunks")

    # sample -> byte offset: cumulative within each chunk
    offsets: list[int] = []
    si = 0
    for ci, base in enumerate(chunk_offsets):
        off = base
        for _ in range(per_chunk[ci]):
            if si >= n_samples:
                break
            offsets.append(off)
            off += sizes[si]
            si += 1
    if si != n_samples:
        raise _err("sample tables disagree on sample count")

    # stss: sync samples (absent = every sample is a keyframe, per spec)
    stss = _find(stbl.children, "stss")
    sync = None
    if stss is not None:
        _, _, p = _fullbox(data, stss)
        (n_sync,) = struct.unpack_from(">I", data, p)
        sync = _u32s(data, p + 4, n_sync)

    return {
        "codec": codec,
        "entry_payload": entry_payload,
        "sizes": sizes,
        "offsets": offsets,
        "sync": sync,
    }


def demux_mp4(data: bytes) -> dict:
    """Parse an ISO-BMFF file -> container + per-track metadata.

    Returns ``{"brand": ..., "timescale": ..., "duration": ...,
    "tracks": [Track, ...]}``. Raises ``ValueError`` on malformed
    input. Codec payloads are untouched — use :func:`extract_samples`
    to pull the raw sample byte ranges.
    """
    if len(data) < 16:
        raise _err("too short")
    top = parse_boxes(data)
    ftyp = _find(top, "ftyp")
    moov = _find(top, "moov")
    if moov is None:
        raise _err("no moov box")
    brand = (
        data[ftyp.payload_start : ftyp.payload_start + 4].decode("ascii", "replace")
        if ftyp is not None and ftyp.payload_end - ftyp.payload_start >= 8
        else ""
    )

    mvhd = _find(moov.children, "mvhd")
    if mvhd is None:
        raise _err("no mvhd box")
    v, _, p = _fullbox(data, mvhd)
    if v == 1:
        timescale, duration = struct.unpack_from(">IQ", data, p + 16)
    else:
        timescale, duration = struct.unpack_from(">II", data, p + 8)

    tracks: list[Track] = []
    for trak in _find_all(moov.children, "trak"):
        tkhd = _find(trak.children, "tkhd")
        mdia = _find(trak.children, "mdia")
        if tkhd is None or mdia is None:
            raise _err("trak missing tkhd/mdia")
        v, _, p = _fullbox(data, tkhd)
        if v == 1:
            (track_id,) = struct.unpack_from(">I", data, p + 16)
            fixed_off = p + 16 + 4 + 4 + 8 + 8 + 2 + 2 + 2 + 2 + 36
        else:
            (track_id,) = struct.unpack_from(">I", data, p + 8)
            fixed_off = p + 8 + 4 + 4 + 4 + 8 + 2 + 2 + 2 + 2 + 36
        w_fixed, h_fixed = struct.unpack_from(">II", data, fixed_off)

        mdhd = _find(mdia.children, "mdhd")
        hdlr = _find(mdia.children, "hdlr")
        minf = _find(mdia.children, "minf")
        if mdhd is None or hdlr is None or minf is None:
            raise _err("mdia missing mdhd/hdlr/minf")
        v, _, p = _fullbox(data, mdhd)
        if v == 1:
            m_timescale, m_duration = struct.unpack_from(">IQ", data, p + 16)
        else:
            m_timescale, m_duration = struct.unpack_from(">II", data, p + 8)
        handler = data[hdlr.payload_start + 8 : hdlr.payload_start + 12].decode(
            "ascii", "replace"
        )
        stbl = _find(minf.children, "stbl")
        if stbl is None:
            raise _err("minf missing stbl")
        st = _parse_stbl(data, stbl)
        tracks.append(
            Track(
                track_id=track_id,
                handler=handler,
                codec=st["codec"],
                width=w_fixed >> 16,
                height=h_fixed >> 16,
                timescale=m_timescale,
                duration=m_duration,
                sample_sizes=st["sizes"],
                sample_offsets=st["offsets"],
                sync_samples=st["sync"],
                sample_entry_payload=st["entry_payload"],
            )
        )
    return {
        "brand": brand,
        "timescale": timescale,
        "duration": duration,
        "tracks": tracks,
    }


def extract_samples(data: bytes, track: Track) -> list[bytes]:
    """Pull every sample's byte range for ``track`` out of ``data``."""
    out = []
    for off, size in zip(track.sample_offsets, track.sample_sizes):
        if off + size > len(data):
            raise _err("sample range outside file")
        out.append(bytes(data[off : off + size]))
    return out


# ---------------------------------------------------------------------------
# mux


def _box(type_s: str, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + type_s.encode("ascii") + payload


def _fbox(type_s: str, version: int, flags: int, payload: bytes) -> bytes:
    return _box(
        type_s, bytes([version]) + flags.to_bytes(3, "big") + payload
    )


_UNITY_MATRIX = struct.pack(
    ">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
)


def mux_mp4_rawvideo(
    frames: list[bytes], w: int, h: int, fps: int = 10
) -> bytes:
    """Write a conformant single-track ISO-BMFF file whose samples are
    raw RGB24 frames under a ``rawv`` VisualSampleEntry (one frame per
    sample, one chunk for the whole track, every sample a sync sample —
    stss omitted per spec).

    Layout: ``ftyp`` + ``mdat`` + ``moov`` (offsets in ``stco`` point
    into mdat, so mdat is written before moov and nothing needs
    patching).
    """
    frame_bytes = w * h * 3
    for f in frames:
        if len(f) != frame_bytes:
            raise ValueError("frame size does not match w*h*3")
    n = len(frames)
    if n == 0:
        raise ValueError("no frames")

    ftyp = _box("ftyp", b"isom" + struct.pack(">I", 512) + b"isommp41")
    mdat = _box("mdat", b"".join(frames))
    data_start = len(ftyp) + 8  # first sample's file offset

    timescale = fps
    duration = n  # one timescale unit per frame

    mvhd = _fbox(
        "mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">I", 0x00010000)  # rate 1.0
        + struct.pack(">H", 0x0100)  # volume
        + b"\x00" * 10
        + _UNITY_MATRIX
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next_track_ID
    )
    tkhd = _fbox(
        "tkhd", 0, 0x7,  # enabled | in_movie | in_preview
        struct.pack(">IIII", 0, 0, 1, 0)  # times, track_id, reserved
        + struct.pack(">I", duration)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)  # layer, group, volume, reserved
        + _UNITY_MATRIX
        + struct.pack(">II", w << 16, h << 16),
    )
    mdhd = _fbox(
        "mdhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">HH", 0x55C4, 0),  # language 'und'
    )
    hdlr = _fbox(
        "hdlr", 0, 0,
        struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"gjspark rawv\x00",
    )
    # VisualSampleEntry 'rawv'
    entry = (
        b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16  # predefined/reserved
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)  # frame_count per sample
        + bytes([12]) + b"gjspark rawv" + b"\x00" * 19  # compressorname[32]
        + struct.pack(">Hh", 24, -1)  # depth, predefined
    )
    stsd = _fbox(
        "stsd", 0, 0, struct.pack(">I", 1) + _box("rawv", entry)
    )
    stts = _fbox("stts", 0, 0, struct.pack(">III", 1, n, 1))
    stsc = _fbox("stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _fbox("stsz", 0, 0, struct.pack(">II", frame_bytes, n))
    stco = _fbox("stco", 0, 0, struct.pack(">II", 1, data_start))
    stbl = _box("stbl", stsd + stts + stsc + stsz + stco)
    vmhd = _fbox("vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _fbox("dref", 0, 0, struct.pack(">I", 1) + _fbox("url ", 0, 1, b""))
    dinf = _box("dinf", dref)
    minf = _box("minf", vmhd + dinf + stbl)
    mdia = _box("mdia", mdhd + hdlr + minf)
    trak = _box("trak", tkhd + mdia)
    moov = _box("moov", mvhd + trak)
    return ftyp + mdat + moov


# ---------------------------------------------------------------------------
# m4a (audio-in-BMFF): raw PCM per ISO/IEC 23003-5 ('ipcm' sample entry
# with a 'pcmC' configuration box). The container grammar is identical to
# the video path; only the sample entry and the media-header boxes differ.


def mux_m4a_pcm(
    rate: int,
    pcm: bytes,
    channels: int = 1,
    sample_size: int = 16,
    frames_per_sample: int = 1024,
) -> bytes:
    """Write a single-track m4a whose samples are little-endian raw PCM
    blocks under an ``ipcm`` AudioSampleEntry + ``pcmC`` config box
    (ISO/IEC 23003-5). ``pcm`` is the interleaved little-endian payload;
    one BMFF sample = ``frames_per_sample`` PCM frames (last partial)."""
    if sample_size % 8 or sample_size not in (16, 24, 32):
        raise ValueError("sample_size must be 16/24/32")
    frame_bytes = channels * sample_size // 8
    if not pcm or len(pcm) % frame_bytes:
        raise ValueError("pcm length must be a nonzero multiple of the frame size")
    n_frames = len(pcm) // frame_bytes
    block = frames_per_sample * frame_bytes
    sizes = [
        min(block, len(pcm) - i) for i in range(0, len(pcm), block)
    ]
    n = len(sizes)

    ftyp = _box("ftyp", b"M4A " + struct.pack(">I", 512) + b"M4A isom")
    mdat = _box("mdat", pcm)
    data_start = len(ftyp) + 8

    timescale = rate
    duration = n_frames
    mvhd = _fbox(
        "mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">I", 0x00010000)
        + struct.pack(">H", 0x0100)
        + b"\x00" * 10
        + _UNITY_MATRIX
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    tkhd = _fbox(
        "tkhd", 0, 0x7,
        struct.pack(">IIII", 0, 0, 1, 0)
        + struct.pack(">I", duration)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0x0100, 0)  # audio: volume 1.0
        + _UNITY_MATRIX
        + struct.pack(">II", 0, 0),  # no visual extent
    )
    mdhd = _fbox(
        "mdhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">HH", 0x55C4, 0),
    )
    hdlr = _fbox(
        "hdlr", 0, 0,
        struct.pack(">I", 0) + b"soun" + b"\x00" * 12 + b"gjspark ipcm\x00",
    )
    # pcmC: format_flags bit0 = little-endian, then PCM sample size
    pcmc = _fbox("pcmC", 0, 0, bytes([0x01, sample_size]))
    # AudioSampleEntry 'ipcm'
    entry = (
        b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 8  # reserved
        + struct.pack(">HH", channels, sample_size)
        + struct.pack(">HH", 0, 0)  # pre_defined, reserved
        + struct.pack(">I", rate << 16)  # 16.16 samplerate
        + pcmc
    )
    stsd = _fbox("stsd", 0, 0, struct.pack(">I", 1) + _box("ipcm", entry))
    # stts in media (frame) units: full blocks + an optional partial tail
    full = n - 1 if sizes[-1] != block else n
    runs = b""
    if full:
        runs += struct.pack(">II", full, frames_per_sample)
    if full != n:
        runs += struct.pack(">II", 1, sizes[-1] // frame_bytes)
    stts = _fbox(
        "stts", 0, 0, struct.pack(">I", len(runs) // 8) + runs
    )
    stsc = _fbox("stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _fbox(
        "stsz", 0, 0,
        struct.pack(">II", 0, n) + struct.pack(f">{n}I", *sizes),
    )
    stco = _fbox("stco", 0, 0, struct.pack(">II", 1, data_start))
    stbl = _box("stbl", stsd + stts + stsc + stsz + stco)
    smhd = _fbox("smhd", 0, 0, struct.pack(">HH", 0, 0))
    dref = _fbox("dref", 0, 0, struct.pack(">I", 1) + _fbox("url ", 0, 1, b""))
    dinf = _box("dinf", dref)
    minf = _box("minf", smhd + dinf + stbl)
    mdia = _box("mdia", mdhd + hdlr + minf)
    trak = _box("trak", tkhd + mdia)
    moov = _box("moov", mvhd + trak)
    return ftyp + mdat + moov


def parse_pcm_entry(entry_payload: bytes) -> tuple[int, int, int, bool]:
    """Parse an ``ipcm`` AudioSampleEntry payload (the bytes after the
    fourcc, as captured in ``Track.sample_entry_payload``) ->
    (channels, sample_size, rate, little_endian). Requires the
    ISO/IEC 23003-5 ``pcmC`` configuration child box."""
    if len(entry_payload) < 28:
        raise _err("short AudioSampleEntry")
    channels, entry_bits = struct.unpack_from(">HH", entry_payload, 16)
    (rate_fixed,) = struct.unpack_from(">I", entry_payload, 24)
    rate = rate_fixed >> 16
    for b in parse_boxes(entry_payload, 28, len(entry_payload)):
        if b.type == "pcmC":
            _, _, p = _fullbox(entry_payload, b)
            if p + 2 > b.payload_end:
                raise _err("short pcmC")
            flags_fmt = entry_payload[p]
            size = entry_payload[p + 1]
            if size not in (16, 24, 32):
                raise _err(f"unsupported PCM sample size {size}")
            return channels, size, rate, bool(flags_fmt & 0x01)
    raise _err("ipcm entry missing pcmC box")
