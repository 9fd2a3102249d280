"""Pure-stdlib PNG codec (zlib + struct): real image decode inside the
multimodal mapInPandas without PIL/ffmpeg (absent from this container).

Scope: non-interlaced 8-bit PNG, color types 0 (grayscale), 2 (truecolor
RGB) and 6 (RGBA); all five scanline filters (None/Sub/Up/Average/Paeth,
PNG spec §9). That subset is the whole spec surface the synthetic corpus
exercises — the ENCODER deliberately cycles filter types across rows so a
decode bug in any unfilter path breaks the round-trip (and the
driver-checked ``media_features`` stats downstream).

This is codec plumbing for `operators/multimodal.py`, not a general imaging
library: production swaps these two functions for PIL inside the same
mapInPandas body (the Spark-side schema/batching is unchanged).
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"
#: channels per pixel by PNG color type (8-bit only)
_CHANNELS = {0: 1, 2: 3, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(
    width: int,
    height: int,
    pixels: bytes,
    color_type: int = 2,
    filters: list[int] | None = None,
) -> bytes:
    """Encode raw top-down pixel bytes (``width*height*channels``) to PNG.

    ``filters``: per-row filter type (0..4); default CYCLES ``y % 5`` so
    every unfilter path in :func:`decode_png` is exercised by any image of
    >= 5 rows — deliberately not the "best compression" choice, this codec
    optimizes for decoder coverage in tests.
    """
    ch = _CHANNELS[color_type]
    stride = width * ch
    if len(pixels) != stride * height:
        raise ValueError(f"pixels: want {stride * height} bytes, got {len(pixels)}")
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        row = pixels[y * stride : (y + 1) * stride]
        ft = filters[y] if filters is not None else y % 5
        raw.append(ft)
        if ft == 0:  # None
            raw += row
        elif ft == 1:  # Sub
            raw += bytes(
                (row[i] - (row[i - ch] if i >= ch else 0)) & 0xFF for i in range(stride)
            )
        elif ft == 2:  # Up
            raw += bytes((row[i] - prev[i]) & 0xFF for i in range(stride))
        elif ft == 3:  # Average
            raw += bytes(
                (row[i] - ((row[i - ch] if i >= ch else 0) + prev[i]) // 2) & 0xFF
                for i in range(stride)
            )
        elif ft == 4:  # Paeth
            raw += bytes(
                (
                    row[i]
                    - _paeth(
                        row[i - ch] if i >= ch else 0,
                        prev[i],
                        prev[i - ch] if i >= ch else 0,
                    )
                )
                & 0xFF
                for i in range(stride)
            )
        else:
            raise ValueError(f"filter type {ft}")
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(blob: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG blob -> ``(width, height, channels, pixels)`` with
    ``pixels`` raw top-down bytes of length ``width*height*channels``.

    Verifies the signature and every chunk CRC; supports the subset in the
    module docstring and raises ``ValueError`` on anything else (16-bit,
    palette, interlaced) — a loud boundary, not a silent wrong answer.
    """
    if blob[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = color_type = None
    idat = bytearray()
    while pos + 8 <= len(blob):
        (length,) = struct.unpack_from(">I", blob, pos)
        tag = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", blob, pos + 8 + length)
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported color type {color_type}")
            if interlace != 0:
                raise ValueError("interlaced PNG unsupported")
            if comp != 0 or filt != 0:
                raise ValueError("nonstandard compression/filter method")
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("no IHDR chunk")
    ch = _CHANNELS[color_type]
    stride = width * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError(f"IDAT: want {(stride + 1) * height} bytes, got {len(raw)}")
    out = bytearray()
    prev = bytearray(stride)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ft == 0:
            pass
        elif ft == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + (a + prev[i]) // 2) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                c = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        else:
            raise ValueError(f"filter type {ft} at row {y}")
        out += line
        prev = line
    return width, height, ch, bytes(out)
