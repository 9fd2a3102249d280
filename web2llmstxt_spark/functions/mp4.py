"""Pure-stdlib MP4 (ISO BMFF) box parser: real container-level parsing of
video files without ffmpeg (absent from this container).

Scope: top-level box walk (ftyp/mdat/moov, 32- and 64-bit sizes), movie
header (mvhd, version 0 and 1), track header (tkhd, 16.16 fixed-point
dimensions), media header (mdhd) + handler (hdlr), and the full sample
table chain stts/stsc/stsz/stco(co64) — enough to read duration,
resolution, frame count, per-frame byte ranges and timestamps, and to
SLICE individual frame payloads out of mdat, all codec-free. The sample
PAYLOAD stays opaque (H.264/HEVC decode needs a real codec — production:
ffmpeg/pyav inside the same mapInPandas); everything a crawl/curation
pipeline reads from an MP4 without decoding is computed here for real.

The MUXER (``build_mp4``) writes a structurally valid single-track file
(ftyp + mdat + moov with the full stbl chain) so tests and the
driver-checked ``media_meta_mp4`` row exercise the real walk: wrong chunk
arithmetic slices wrong frame bytes and fails the byte-equality checks.
"""

from __future__ import annotations

import struct


def _box(tag: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + tag + payload


def _full(tag: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(tag, struct.pack(">B3s", version, flags.to_bytes(3, "big")) + payload)


def build_mp4(
    width: int,
    height: int,
    samples: list[bytes],
    timescale: int = 1000,
    sample_delta: int = 40,
) -> bytes:
    """Mux ``samples`` (one opaque payload per video frame) into a minimal
    single-track MP4: ftyp + mdat + moov{mvhd, trak{tkhd, mdia{mdhd, hdlr,
    minf{stbl{stsd, stts, stsc, stsz, stco}}}}}. All samples land in ONE
    chunk whose stco offset points into mdat — the layout the parser's
    chunk arithmetic must invert exactly."""
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isommp42")
    mdat_payload = b"".join(samples)
    mdat = _box(b"mdat", mdat_payload)
    chunk_offset = len(ftyp) + 8  # first sample byte inside mdat
    n = len(samples)
    duration = n * sample_delta

    mvhd = _full(b"mvhd", 0, 0, struct.pack(
        ">IIII", 0, 0, timescale, duration
    ) + struct.pack(">IH", 0x00010000, 0x0100) + bytes(10) + struct.pack(
        ">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
    ) + bytes(24) + struct.pack(">I", 2))
    tkhd = _full(b"tkhd", 0, 7, struct.pack(
        ">IIIII", 0, 0, 1, 0, duration
    ) + bytes(8) + struct.pack(">hhhH", 0, 0, 0, 0) + struct.pack(
        ">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
    ) + struct.pack(">II", width << 16, height << 16))
    mdhd = _full(b"mdhd", 0, 0, struct.pack(
        ">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0
    ))
    hdlr = _full(b"hdlr", 0, 0, struct.pack(">I4s", 0, b"vide") + bytes(12) + b"vid\x00")
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + _box(
        b"mp4v",
        bytes(6) + struct.pack(">H", 1)  # reserved + data_reference_index
        + bytes(16)
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)
        + struct.pack(">I", 0) + struct.pack(">H", 1)
        + bytes(32)
        + struct.pack(">Hh", 0x18, -1),
    ))
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, sample_delta))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, n) + b"".join(
        struct.pack(">I", len(s)) for s in samples
    ))
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, chunk_offset))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", _full(b"vmhd", 0, 1, bytes(8)) + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _iter_boxes(data: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        head = 8
        if size == 1:  # 64-bit largesize
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            head = 16
        elif size == 0:  # box extends to end
            size = end - pos
        if size < head or pos + size > end:
            raise ValueError(f"bad box size {size} for {tag!r} at {pos}")
        yield tag, pos + head, pos + size
        pos += size


def _parse_fullbox(data: bytes, start: int) -> tuple[int, int]:
    version = data[start]
    return version, start + 4


def parse_mp4(blob: bytes) -> dict:
    """Walk the box tree -> ``{duration_ms, timescale, width, height,
    n_samples, total_sample_bytes, handler, sample_ranges}`` for the first
    video (or only) track; ``sample_ranges`` is [(offset, size, t_ms)] per
    sample, derived from stts/stsc/stsz/stco — the codec-free frame index.
    Raises ``ValueError`` on malformed structure — a loud boundary."""
    mvhd_timescale = mvhd_duration = None
    width = height = None
    handler = None
    mdhd_timescale = None
    stts = []  # (count, delta)
    stsc = []  # (first_chunk, samples_per_chunk)
    sizes: list[int] = []
    chunk_offsets: list[int] = []
    saw_moov = False

    def walk_stbl(s, e):
        nonlocal sizes, chunk_offsets, stts
        for tag, ps, pe in _iter_boxes(blob, s, e):
            v, p = _parse_fullbox(blob, ps)
            if tag == b"stts":
                (n_ent,) = struct.unpack_from(">I", blob, p)
                for i in range(n_ent):
                    c, d = struct.unpack_from(">II", blob, p + 4 + 8 * i)
                    stts.append((c, d))
            elif tag == b"stsc":
                (n_ent,) = struct.unpack_from(">I", blob, p)
                for i in range(n_ent):
                    fc, spc, _sd = struct.unpack_from(">III", blob, p + 4 + 12 * i)
                    stsc.append((fc, spc))
            elif tag == b"stsz":
                uniform, n = struct.unpack_from(">II", blob, p)
                if uniform:
                    sizes = [uniform] * n
                else:
                    sizes = list(struct.unpack_from(f">{n}I", blob, p + 8))
            elif tag == b"stco":
                (n,) = struct.unpack_from(">I", blob, p)
                chunk_offsets = list(struct.unpack_from(f">{n}I", blob, p + 4))
            elif tag == b"co64":
                (n,) = struct.unpack_from(">I", blob, p)
                chunk_offsets = list(struct.unpack_from(f">{n}Q", blob, p + 4))

    def walk(s, e, depth=0):
        nonlocal mvhd_timescale, mvhd_duration, width, height
        nonlocal handler, mdhd_timescale, saw_moov
        for tag, ps, pe in _iter_boxes(blob, s, e):
            if tag == b"moov":
                saw_moov = True
                walk(ps, pe, depth + 1)
            elif tag in (b"trak", b"mdia", b"minf"):
                walk(ps, pe, depth + 1)
            elif tag == b"stbl":
                walk_stbl(ps, pe)
            elif tag == b"mvhd":
                v, p = _parse_fullbox(blob, ps)
                if v == 1:
                    _c, _m, ts, dur = struct.unpack_from(">QQIQ", blob, p)
                else:
                    _c, _m, ts, dur = struct.unpack_from(">IIII", blob, p)
                mvhd_timescale, mvhd_duration = ts, dur
            elif tag == b"tkhd":
                v, p = _parse_fullbox(blob, ps)
                # w/h are the LAST 8 bytes of the box, 16.16 fixed, for
                # both versions — offset from the end avoids the v0/v1 split
                w_fx, h_fx = struct.unpack_from(">II", blob, pe - 8)
                if width is None:
                    width, height = w_fx >> 16, h_fx >> 16
            elif tag == b"mdhd":
                v, p = _parse_fullbox(blob, ps)
                if v == 1:
                    _c, _m, ts = struct.unpack_from(">QQI", blob, p)
                else:
                    _c, _m, ts = struct.unpack_from(">III", blob, p)
                mdhd_timescale = ts
            elif tag == b"hdlr":
                v, p = _parse_fullbox(blob, ps)
                handler = blob[p + 4 : p + 8].decode("ascii", "replace")
            # ftyp / mdat / free / unknown: skipped (mdat is reached only
            # through the sample table, as in a real demuxer)

    walk(0, len(blob))
    if not saw_moov:
        raise ValueError("no moov box found")
    if not sizes or not chunk_offsets:
        raise ValueError("incomplete sample table (stsz/stco missing)")
    # chunk arithmetic: expand stsc runs to per-chunk sample counts
    per_chunk: list[int] = []
    for i, (fc, spc) in enumerate(stsc):
        last = stsc[i + 1][0] - 1 if i + 1 < len(stsc) else len(chunk_offsets)
        per_chunk += [spc] * (last - fc + 1)
    # per-sample timestamps from stts deltas
    deltas: list[int] = []
    for c, d in stts:
        deltas += [d] * c
    ts = mdhd_timescale or mvhd_timescale or 1000
    ranges = []
    si = 0
    t = 0
    for ci, coff in enumerate(chunk_offsets):
        off = coff
        for _ in range(per_chunk[ci] if ci < len(per_chunk) else 0):
            if si >= len(sizes):
                break
            ranges.append((off, sizes[si], t * 1000 // ts))
            off += sizes[si]
            t += deltas[si] if si < len(deltas) else 0
            si += 1
    duration_ms = (
        mvhd_duration * 1000 // mvhd_timescale
        if mvhd_timescale
        else (t * 1000 // ts)
    )
    return {
        "duration_ms": duration_ms,
        "timescale": mvhd_timescale,
        "width": width,
        "height": height,
        "n_samples": len(sizes),
        "total_sample_bytes": sum(sizes),
        "handler": handler,
        "sample_ranges": ranges,
    }


def read_sample(blob: bytes, k: int) -> bytes:
    """Slice frame ``k``'s payload bytes out of mdat via the sample table —
    the codec-free frame extraction a range-read against an object store
    performs at scale (offset+size = one ranged GET per frame)."""
    info = parse_mp4(blob)
    off, size, _t = info["sample_ranges"][k]
    return blob[off : off + size]
