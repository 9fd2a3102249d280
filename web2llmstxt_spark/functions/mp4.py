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


def _trak(
    handler: bytes,
    width: int,
    height: int,
    samples: list[bytes],
    chunk_offset: int,
    timescale: int,
    sample_delta: int,
    track_id: int,
) -> bytes:
    n = len(samples)
    duration = n * sample_delta
    tkhd = _full(b"tkhd", 0, 7, struct.pack(
        ">IIIII", 0, 0, track_id, 0, duration
    ) + bytes(8) + struct.pack(">hhhH", 0, 0, 0, 0) + struct.pack(
        ">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
    ) + struct.pack(">II", width << 16, height << 16))
    mdhd = _full(b"mdhd", 0, 0, struct.pack(
        ">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0
    ))
    hdlr = _full(b"hdlr", 0, 0, struct.pack(">I4s", 0, handler) + bytes(12) + b"h\x00")
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + _box(
        b"mp4v" if handler == b"vide" else b"mp4a",
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
    head = _full(b"vmhd", 0, 1, bytes(8)) if handler == b"vide" else _full(
        b"smhd", 0, 0, bytes(4)
    )
    minf = _box(b"minf", head + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    return _box(b"trak", tkhd + mdia)


def build_mp4(
    width: int,
    height: int,
    samples: list[bytes],
    timescale: int = 1000,
    sample_delta: int = 40,
    audio_samples: list[bytes] | None = None,
) -> bytes:
    """Mux ``samples`` (one opaque payload per video frame) into a minimal
    MP4: ftyp + mdat + moov{mvhd, trak{tkhd, mdia{mdhd, hdlr, minf{stbl{
    stsd, stts, stsc, stsz, stco}}}}}. Each track's samples land in ONE
    chunk whose stco offset points into mdat — the layout the parser's
    chunk arithmetic must invert exactly. ``audio_samples`` adds a second
    ``soun`` track (listed FIRST in moov, like many real muxes) so tests
    can pin the parser's video-track selection on multi-track files."""
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isommp42")
    audio_samples = audio_samples or []
    mdat_payload = b"".join(samples) + b"".join(audio_samples)
    mdat = _box(b"mdat", mdat_payload)
    chunk_offset = len(ftyp) + 8  # first video sample byte inside mdat
    n = len(samples)
    duration = n * sample_delta

    mvhd = _full(b"mvhd", 0, 0, struct.pack(
        ">IIII", 0, 0, timescale, duration
    ) + struct.pack(">IH", 0x00010000, 0x0100) + bytes(10) + struct.pack(
        ">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
    ) + bytes(24) + struct.pack(">I", 3))
    video = _trak(b"vide", width, height, samples, chunk_offset,
                  timescale, sample_delta, 1)
    traks = video
    if audio_samples:
        audio = _trak(
            b"soun", 0, 0, audio_samples,
            chunk_offset + sum(len(s) for s in samples),
            timescale, sample_delta, 2,
        )
        traks = audio + video  # audio-first ordering on purpose
    moov = _box(b"moov", mvhd + traks)
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


#: nesting guard for the box walk: real files are < 8 levels deep; a
#: crafted file of thousands of nested 8-byte trak headers must raise
#: ValueError, not RecursionError
_MAX_BOX_DEPTH = 16


def _need(p: int, n: int, end: int, what: str) -> None:
    if p + n > end:
        raise ValueError(f"truncated {what} table")


def parse_mp4(blob: bytes) -> dict:
    """Walk the box tree -> ``{duration_ms, timescale, width, height,
    n_samples, total_sample_bytes, handler, sample_ranges}`` for the FIRST
    track whose handler is ``vide`` (falling back to the first track — so a
    normal video+audio mux reports the video track, never a cross-track
    mix); ``sample_ranges`` is [(offset, size, t_ms)] per sample, derived
    from stts/stsc/stsz/stco — the codec-free frame index. Raises
    ``ValueError`` on malformed structure (truncated tables, declared
    entry counts past the box end, runaway nesting) — a loud boundary."""
    mvhd_timescale = mvhd_duration = None
    saw_moov = False
    tracks: list[dict] = []  # one dict per trak, tables track-scoped

    def walk_stbl(s, e, tr):
        for tag, ps, pe in _iter_boxes(blob, s, e):
            v, p = _parse_fullbox(blob, ps)
            if tag == b"stts":
                _need(p, 4, pe, "stts")
                (n_ent,) = struct.unpack_from(">I", blob, p)
                _need(p + 4, 8 * n_ent, pe, "stts")
                for i in range(n_ent):
                    c, d = struct.unpack_from(">II", blob, p + 4 + 8 * i)
                    tr["stts"].append((c, d))
            elif tag == b"stsc":
                _need(p, 4, pe, "stsc")
                (n_ent,) = struct.unpack_from(">I", blob, p)
                _need(p + 4, 12 * n_ent, pe, "stsc")
                for i in range(n_ent):
                    fc, spc, _sd = struct.unpack_from(">III", blob, p + 4 + 12 * i)
                    tr["stsc"].append((fc, spc))
            elif tag == b"stsz":
                _need(p, 8, pe, "stsz")
                uniform, n = struct.unpack_from(">II", blob, p)
                if uniform:
                    tr["sizes"] = [uniform] * n
                else:
                    _need(p + 8, 4 * n, pe, "stsz")
                    tr["sizes"] = list(struct.unpack_from(f">{n}I", blob, p + 8))
            elif tag == b"stco":
                _need(p, 4, pe, "stco")
                (n,) = struct.unpack_from(">I", blob, p)
                _need(p + 4, 4 * n, pe, "stco")
                tr["chunk_offsets"] = list(struct.unpack_from(f">{n}I", blob, p + 4))
            elif tag == b"co64":
                _need(p, 4, pe, "co64")
                (n,) = struct.unpack_from(">I", blob, p)
                _need(p + 4, 8 * n, pe, "co64")
                tr["chunk_offsets"] = list(struct.unpack_from(f">{n}Q", blob, p + 4))

    def walk(s, e, depth, tr):
        nonlocal mvhd_timescale, mvhd_duration, saw_moov
        if depth > _MAX_BOX_DEPTH:
            raise ValueError(f"box nesting deeper than {_MAX_BOX_DEPTH}")
        for tag, ps, pe in _iter_boxes(blob, s, e):
            if tag == b"moov":
                saw_moov = True
                walk(ps, pe, depth + 1, None)
            elif tag == b"trak":
                new_tr = {
                    "width": None, "height": None, "handler": None,
                    "mdhd_timescale": None, "stts": [], "stsc": [],
                    "sizes": [], "chunk_offsets": [],
                }
                tracks.append(new_tr)
                walk(ps, pe, depth + 1, new_tr)
            elif tag in (b"mdia", b"minf"):
                walk(ps, pe, depth + 1, tr)
            elif tag == b"stbl" and tr is not None:
                walk_stbl(ps, pe, tr)
            elif tag == b"mvhd":
                v, p = _parse_fullbox(blob, ps)
                if v == 1:
                    _c, _m, ts, dur = struct.unpack_from(">QQIQ", blob, p)
                else:
                    _c, _m, ts, dur = struct.unpack_from(">IIII", blob, p)
                mvhd_timescale, mvhd_duration = ts, dur
            elif tag == b"tkhd" and tr is not None:
                # w/h are the LAST 8 bytes of the box, 16.16 fixed, for
                # both versions — offset from the end avoids the v0/v1 split
                _need(pe - 8, 8, pe, "tkhd")
                w_fx, h_fx = struct.unpack_from(">II", blob, pe - 8)
                tr["width"], tr["height"] = w_fx >> 16, h_fx >> 16
            elif tag == b"mdhd" and tr is not None:
                v, p = _parse_fullbox(blob, ps)
                if v == 1:
                    _c, _m, ts = struct.unpack_from(">QQI", blob, p)
                else:
                    _c, _m, ts = struct.unpack_from(">III", blob, p)
                tr["mdhd_timescale"] = ts
            elif tag == b"hdlr" and tr is not None:
                v, p = _parse_fullbox(blob, ps)
                _need(p + 4, 4, pe, "hdlr")
                tr["handler"] = blob[p + 4 : p + 8].decode("ascii", "replace")
            # ftyp / mdat / free / unknown: skipped (mdat is reached only
            # through the sample table, as in a real demuxer)

    try:
        walk(0, len(blob), 0, None)
    except struct.error as exc:  # short reads inside declared boxes
        raise ValueError(f"truncated box payload: {exc}") from None
    if not saw_moov:
        raise ValueError("no moov box found")
    vide = [t for t in tracks if t["handler"] == "vide"]
    tr = vide[0] if vide else (tracks[0] if tracks else None)
    if tr is None or not tr["sizes"] or not tr["chunk_offsets"] or not tr["stsc"]:
        raise ValueError("incomplete sample table (stsz/stco/stsc missing)")
    sizes, chunk_offsets, stsc, stts = (
        tr["sizes"], tr["chunk_offsets"], tr["stsc"], tr["stts"]
    )
    # chunk arithmetic: expand stsc runs to per-chunk sample counts
    per_chunk: list[int] = []
    for i, (fc, spc) in enumerate(stsc):
        last = stsc[i + 1][0] - 1 if i + 1 < len(stsc) else len(chunk_offsets)
        per_chunk += [spc] * (last - fc + 1)
    # per-sample timestamps from stts deltas
    deltas: list[int] = []
    for c, d in stts:
        deltas += [d] * c
    ts = tr["mdhd_timescale"] or mvhd_timescale or 1000
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
        "width": tr["width"],
        "height": tr["height"],
        "n_samples": len(sizes),
        "total_sample_bytes": sum(sizes),
        "handler": tr["handler"],
        "sample_ranges": ranges,
    }


def read_sample(blob: bytes, k: int, info: dict | None = None) -> bytes:
    """Slice frame ``k``'s payload bytes out of mdat via the sample table —
    the codec-free frame extraction a range-read against an object store
    performs at scale (offset+size = one ranged GET per frame). Pass the
    ``parse_mp4`` result as ``info`` when extracting many frames so the box
    walk runs once per file, not once per frame."""
    if info is None:
        info = parse_mp4(blob)
    off, size, _t = info["sample_ranges"][k]
    return blob[off : off + size]
