"""Pure-stdlib WebP container/header parser: real RIFF + bitstream-header
parsing of WebP files without PIL/libwebp (absent from this container).

Scope: the RIFF/WEBP chunk walk and all three header variants —

- ``VP8 `` (lossy): keyframe header — frame tag (keyframe bit, version,
  show_frame, first-partition size), 0x9D012A start code, 14-bit
  width/height with 2-bit upscaling codes;
- ``VP8L`` (lossless): 0x2F signature byte, 14-bit width-1/height-1 fields,
  alpha-hint bit, 3-bit version (LSB-first bit packing);
- ``VP8X`` (extended): feature flags (ICC/alpha/EXIF/XMP/animation) and
  24-bit canvas width-1/height-1, plus ANIM/ANMF frame counting for
  animations.

That is everything a crawl/curation pipeline reads from a WebP without
decoding: format variant, dimensions, alpha, animation frame count. The
pixel PAYLOAD stays opaque — VP8 arithmetic decoding / VP8L prefix-coded
ARGB needs a real codec (production: PIL/libwebp inside the same
mapInPandas) — the documented boundary, as with mp3/mp4.

The BUILDER emits structurally valid headers with deterministic filler
payloads so tests and the driver-checked ``media_meta_webp`` row exercise
the real bit unpacking: wrong LSB-first arithmetic reads wrong dimensions
and fails the md5-deriving oracle.
"""

from __future__ import annotations

import struct


def _chunk(tag: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return tag + struct.pack("<I", len(payload)) + payload + pad


def build_webp(
    width: int,
    height: int,
    variant: str = "vp8",
    alpha: bool = False,
    n_frames: int = 0,
    payload_len: int = 64,
) -> bytes:
    """Structurally valid WebP with deterministic filler payload.

    ``variant``: 'vp8' (lossy keyframe header), 'vp8l' (lossless header),
    or 'vp8x' (extended; ``n_frames`` > 0 adds ANIM + that many ANMF
    frames, each wrapping a VP8 keyframe header at the same dimensions)."""
    filler = bytes(i % 251 for i in range(payload_len))
    if variant == "vp8":
        body = _vp8_keyframe(width, height, filler)
        chunks = _chunk(b"VP8 ", body)
    elif variant == "vp8l":
        sig = bytearray([0x2F])
        bits = (width - 1) | ((height - 1) << 14) | (int(alpha) << 28) | (0 << 29)
        sig += struct.pack("<I", bits)
        chunks = _chunk(b"VP8L", bytes(sig) + filler)
    elif variant == "vp8x":
        flags = (int(alpha) << 4) | (int(n_frames > 0) << 1)
        vp8x = bytes([flags, 0, 0, 0]) + (width - 1).to_bytes(3, "little") + (
            height - 1
        ).to_bytes(3, "little")
        chunks = _chunk(b"VP8X", vp8x)
        if n_frames > 0:
            chunks += _chunk(b"ANIM", struct.pack("<IH", 0xFFFFFFFF, 0))
            frame = _vp8_keyframe(width, height, filler)
            anmf_head = (
                (0).to_bytes(3, "little") * 2
                + (width - 1).to_bytes(3, "little")
                + (height - 1).to_bytes(3, "little")
                + (40).to_bytes(3, "little")
                + bytes([0])
            )
            for _ in range(n_frames):
                chunks += _chunk(b"ANMF", anmf_head + _chunk(b"VP8 ", frame))
        else:
            chunks += _chunk(b"VP8 ", _vp8_keyframe(width, height, filler))
    else:
        raise ValueError(f"variant must be vp8|vp8l|vp8x, got {variant!r}")
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WEBP" + chunks


def _vp8_keyframe(width: int, height: int, payload: bytes) -> bytes:
    # frame tag (3 bytes, LSB-first): keyframe(0) | version(3b) |
    # show_frame(1) | first partition size (19b)
    part_size = len(payload)
    tag = (0) | (0 << 1) | (1 << 4) | (part_size << 5)
    return (
        tag.to_bytes(3, "little")
        + b"\x9d\x01\x2a"
        + struct.pack("<HH", width & 0x3FFF, height & 0x3FFF)
        + payload
    )


def parse_webp(blob: bytes) -> dict:
    """RIFF walk + header decode -> ``{variant, width, height, has_alpha,
    is_animated, n_frames}``. For VP8X files the canvas dimensions win (the
    container contract); raises ``ValueError`` on malformed structure."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WEBP":
        raise ValueError("not a WebP (bad RIFF header)")
    (riff_len,) = struct.unpack_from("<I", blob, 4)
    end = min(len(blob), 8 + riff_len)
    pos = 12
    out = {
        "variant": None, "width": None, "height": None,
        "has_alpha": False, "is_animated": False, "n_frames": 0,
    }
    while pos + 8 <= end:
        tag = blob[pos : pos + 4]
        (size,) = struct.unpack_from("<I", blob, pos + 4)
        body = blob[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"truncated {tag!r} chunk")
        if tag == b"VP8 " and out["variant"] is None:
            out["variant"] = "vp8"
            w, h = _parse_vp8_keyframe(body)
            out["width"], out["height"] = w, h
        elif tag == b"VP8L" and out["variant"] is None:
            if not body or body[0] != 0x2F:
                raise ValueError("bad VP8L signature")
            (bits,) = struct.unpack_from("<I", body, 1)
            out["variant"] = "vp8l"
            out["width"] = (bits & 0x3FFF) + 1
            out["height"] = ((bits >> 14) & 0x3FFF) + 1
            out["has_alpha"] = bool((bits >> 28) & 1)
        elif tag == b"VP8X":
            if len(body) < 10:
                raise ValueError(
                    f"VP8X chunk too short ({len(body)} bytes, need 10)"
                )
            out["variant"] = "vp8x"
            flags = body[0]
            out["has_alpha"] = bool(flags & 0x10)
            out["is_animated"] = bool(flags & 0x02)
            out["width"] = int.from_bytes(body[4:7], "little") + 1
            out["height"] = int.from_bytes(body[7:10], "little") + 1
        elif tag == b"ANMF":
            out["n_frames"] += 1
        pos += 8 + size + (size % 2)  # chunks are even-aligned
    if out["variant"] is None:
        raise ValueError("no VP8/VP8L/VP8X chunk found")
    return out


def _parse_vp8_keyframe(body: bytes) -> tuple[int, int]:
    if len(body) < 10:
        raise ValueError("VP8 chunk too short for a keyframe header")
    tag = int.from_bytes(body[0:3], "little")
    if tag & 1:
        raise ValueError("VP8 interframe (not a keyframe) — no dimensions")
    if body[3:6] != b"\x9d\x01\x2a":
        raise ValueError("bad VP8 keyframe start code")
    w_raw, h_raw = struct.unpack_from("<HH", body, 6)
    return w_raw & 0x3FFF, h_raw & 0x3FFF
