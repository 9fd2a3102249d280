"""Pure-stdlib YUV4MPEG2 (.y4m) codec: real video container parse + frame
access inside the multimodal mapInPandas without ffmpeg/pyav (absent from
this container).

YUV4MPEG2 is the uncompressed video interchange format mplayer/ffmpeg use:
an ASCII stream header ``YUV4MPEG2 W<w> H<h> F<num>:<den> [Ip] [A1:1]
[C<space>] [X<meta>]\\n`` followed by frames, each ``FRAME[ params]\\n`` +
raw planar pixel data of a fixed size derived from the header. Scope here:
colorspaces ``Cmono`` (Y plane only, w*h bytes/frame) and ``C420``/
``C420jpeg``/``C420mpeg2`` (Y + quarter-size U,V = w*h*3/2); anything else
raises. The ENCODER emits an ``XW2LST`` extension token and per-frame
``Ixxx`` params on every other frame so a parser that assumes bare headers
breaks loudly in the round-trip tests (same philosophy as png.py's cycling
filters and wav.py's planted LIST chunk).

Codec plumbing for `operators/multimodal.py`: production swaps these for an
ffmpeg/pyav frame iterator inside the same mapInPandas body. Part of the
beyond-reference multimodal surface, not a port (the reference carries no
video; SURVEY.md §1.2).
"""

from __future__ import annotations

_MAGIC = b"YUV4MPEG2"
#: bytes per frame as a fraction of w*h, by colorspace family
_FRAME_FACTOR = {"mono": (1, 1), "420": (3, 2)}


def _frame_bytes(width: int, height: int, cspace: str) -> int:
    num, den = _FRAME_FACTOR[cspace]
    return width * height * num // den


def encode_y4m(
    width: int,
    height: int,
    fps: tuple[int, int],
    frames: list[bytes],
    cspace: str = "mono",
) -> bytes:
    """Encode raw planar frames to a .y4m blob. ``cspace`` 'mono' or '420'
    (written as C420jpeg). Every other frame gets a per-frame parameter
    token so decoders must parse, not assume, the FRAME lines."""
    if cspace not in _FRAME_FACTOR:
        raise ValueError(f"colorspace {cspace!r} unsupported")
    want = _frame_bytes(width, height, cspace)
    ctok = "Cmono" if cspace == "mono" else "C420jpeg"
    out = bytearray(
        f"YUV4MPEG2 W{width} H{height} F{fps[0]}:{fps[1]} Ip A1:1 {ctok} XW2LST\n".encode()
    )
    for i, fr in enumerate(frames):
        if len(fr) != want:
            raise ValueError(f"frame {i}: want {want} bytes, got {len(fr)}")
        out += b"FRAME Xi%d\n" % i if i % 2 else b"FRAME\n"
        out += fr
    return bytes(out)


def decode_y4m(blob: bytes) -> tuple[int, int, tuple[int, int], str, list[bytes]]:
    """Decode a .y4m blob -> ``(width, height, (fps_num, fps_den), cspace,
    frames)`` with each frame the raw planar bytes (Y, or Y+U+V for 420).

    Validates the magic, requires W/H/F, accepts unknown stream/frame
    parameter tokens (skipped per spec), and raises ``ValueError`` on
    unsupported colorspaces or short frames — a loud boundary."""
    nl = blob.find(b"\n")
    if nl < 0 or not blob.startswith(_MAGIC):
        raise ValueError("not a YUV4MPEG2 blob")
    width = height = None
    fps = None
    cspace = "420"  # spec default when no C token: 4:2:0
    for tok in blob[len(_MAGIC):nl].split(b" "):
        if not tok:
            continue
        key, val = chr(tok[0]), tok[1:].decode("ascii", "replace")
        if key == "W":
            width = int(val)
        elif key == "H":
            height = int(val)
        elif key == "F":
            num, den = val.split(":")
            fps = (int(num), int(den))
        elif key == "C":
            if val == "mono":
                cspace = "mono"
            elif val.startswith("420"):
                cspace = "420"
            else:
                raise ValueError(f"unsupported colorspace C{val}")
        # I/A/X and anything else: metadata, skipped
    if width is None or height is None or fps is None:
        raise ValueError("stream header missing W/H/F")
    fsize = _frame_bytes(width, height, cspace)
    frames: list[bytes] = []
    pos = nl + 1
    while pos < len(blob):
        fnl = blob.find(b"\n", pos)
        if fnl < 0 or not blob[pos:fnl].startswith(b"FRAME"):
            raise ValueError(f"expected FRAME header at byte {pos}")
        frame = blob[fnl + 1 : fnl + 1 + fsize]
        if len(frame) != fsize:
            raise ValueError(f"frame {len(frames)}: want {fsize} bytes, got {len(frame)}")
        frames.append(frame)
        pos = fnl + 1 + fsize
    return width, height, fps, cspace, frames
