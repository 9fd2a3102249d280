"""Pure-stdlib GIF codec (LZW): real palette-image decode inside the
multimodal mapInPandas without PIL (absent from this container).

Scope: GIF87a/GIF89a, global or local color tables, interlaced or
sequential row order; ``decode_gif`` returns the first frame,
``decode_gif_frames`` decodes ALL frames of an animation with
graphic-control delays and canvas composition (sub-rect frames painted
onto the previous canvas — leave-in-place disposal; background/restore
disposal is out of scope). Other 89a extension blocks are skipped. Output
is always RGB via palette lookup. The ENCODER writes
GIF87a grayscale (identity 256-entry gray palette, LZW minimum code size
8) with full dictionary growth and mid-stream clear codes, so the decoder's
variable-width/dictionary-reset paths are exercised by any image large
enough to fill the table.

GIF is lossless, so the driver-checked ``media_features_gif`` row gets the
same md5-chain SQL oracle shape as the PNG row: wrong LZW unpacking =>
wrong bytes => hash mismatch.

This is codec plumbing for `operators/multimodal.py`, not a general imaging
library: production swaps these two functions for PIL inside the same
mapInPandas body (the Spark-side schema/batching is unchanged).
"""

from __future__ import annotations

import struct

_GRAY_PALETTE = bytes(v for i in range(256) for v in (i, i, i))

#: interlace pass layout per the GIF spec: (first row, row step)
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


# ---------------------------------------------------------------- encoder

class _LZWWriter:
    """LSB-first variable-width code packer into GIF 255-byte sub-blocks."""

    def __init__(self):
        self.bytes = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, width: int):
        self._acc |= code << self._n
        self._n += width
        while self._n >= 8:
            self.bytes.append(self._acc & 0xFF)
            self._acc >>= 8
            self._n -= 8

    def flush(self):
        if self._n:
            self.bytes.append(self._acc & 0xFF)
            self._acc = 0
            self._n = 0


def _lzw_encode(data: bytes, min_code_size: int) -> bytes:
    # dictionary keys are (prefix_code << 8) | next_byte ints, not byte
    # strings: same greedy parse, same emitted code sequence, but O(1)
    # int hashing instead of per-step bytes concatenation + hashing
    # (r5 verdict #2: the per-byte Python loop was the bench's top kernel
    # cost). Root strings are implicit (code == byte value).
    clear = 1 << min_code_size
    eoi = clear + 1
    w = _LZWWriter()
    width = min_code_size + 1
    table: dict[int, int] = {}
    next_code = eoi + 1
    w.write(clear, width)
    prefix_code = -1  # -1 == empty prefix
    for b in data:
        if prefix_code < 0:
            prefix_code = b
            continue
        key = (prefix_code << 8) | b
        cand = table.get(key)
        if cand is not None:
            prefix_code = cand
            continue
        w.write(prefix_code, width)
        table[key] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        elif next_code >= (1 << 12):
            # table full: reset (exercises the decoder's clear-code path)
            w.write(clear, width)
            table = {}
            next_code = eoi + 1
            width = min_code_size + 1
        prefix_code = b
    if prefix_code >= 0:
        w.write(prefix_code, width)
    w.write(eoi, width)
    w.flush()
    return bytes(w.bytes)


def _image_block(width: int, height: int, pixels: bytes) -> bytes:
    out = bytearray(b"\x2c")
    out += struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
    out.append(8)  # LZW minimum code size
    payload = _lzw_encode(pixels, 8)
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00"  # block terminator
    return bytes(out)


def encode_gif(width: int, height: int, pixels: bytes) -> bytes:
    """Encode raw top-down GRAYSCALE bytes (``width*height``) to a GIF87a
    still with the identity gray palette (index i -> (i,i,i))."""
    if len(pixels) != width * height:
        raise ValueError(f"pixels: want {width * height} bytes, got {len(pixels)}")
    out = bytearray(b"GIF87a")
    out += struct.pack("<HH", width, height)
    out += bytes([0xF7, 0, 0])  # global table, 8-bit, 256 entries; bg 0
    out += _GRAY_PALETTE
    out += _image_block(width, height, pixels)
    out += b"\x3b"  # trailer
    return bytes(out)


def encode_gif_anim(
    width: int, height: int, frames: list[bytes], delay_cs: int = 4
) -> bytes:
    """Encode grayscale frames to an ANIMATED GIF89a: one graphic-control
    extension (delay in centiseconds) + full-frame image block per frame,
    identity gray palette — the animation twin of the y4m stream."""
    if not frames:
        raise ValueError("need at least one frame")
    for f in frames:
        if len(f) != width * height:
            raise ValueError(
                f"frame: want {width * height} bytes, got {len(f)}"
            )
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out += bytes([0xF7, 0, 0])
    out += _GRAY_PALETTE
    for f in frames:
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += _image_block(width, height, f)
    out += b"\x3b"
    return bytes(out)


# ---------------------------------------------------------------- decoder

class _LZWReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self._acc = 0
        self._n = 0

    def read(self, width: int) -> int:
        while self._n < width:
            if self.pos >= len(self.data):
                raise ValueError("truncated LZW stream")
            self._acc |= self.data[self.pos] << self._n
            self.pos += 1
            self._n += 8
        v = self._acc & ((1 << width) - 1)
        self._acc >>= width
        self._n -= width
        return v


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    # Table entries are (start, length) SLICES of the output buffer, not
    # byte strings: every non-root LZW entry equals a run of output already
    # written (entry = prev + cur[0], and prev/cur are the two most recent
    # emits, adjacent in `out`), so emitting a code is one bytearray slice
    # copy (memcpy) and adding an entry is two ints — no per-entry bytes
    # allocation (r5 verdict #2: this loop was the top bench kernel cost).
    # Roots are (-1, byte); clear/eoi slots are None (the loud empty-slot
    # boundary, unchanged).
    clear = 1 << min_code_size
    eoi = clear + 1
    r = _LZWReader(data)
    width = min_code_size + 1
    roots: list = [(-1, i) for i in range(clear)] + [None, None]
    table = list(roots)
    out = bytearray()
    have_prev = False
    prev_start = prev_len = 0
    while len(out) < n_pixels:
        code = r.read(width)
        if code == clear:
            table = list(roots)
            width = min_code_size + 1
            have_prev = False
            continue
        if code == eoi:
            break
        if code < len(table):
            e = table[code]
            if e is None:
                raise ValueError(f"LZW code {code} refers to an empty slot")
            s, ln = e
            cur_len = 1 if s < 0 else ln
            cur_start = len(out)
            if s < 0:
                out.append(ln)  # root: single byte `ln`
            else:
                out += out[s : s + ln]
        elif code == len(table) and have_prev:
            # the KwKwK case: entry = prev + prev[0]
            cur_len = prev_len + 1
            cur_start = len(out)
            out += out[prev_start : prev_start + prev_len]
            out.append(out[prev_start])
        else:
            raise ValueError(f"LZW code {code} out of range")
        if have_prev and len(table) < 4096:
            # new entry = prev + cur[0] == out[prev_start : prev_start +
            # prev_len + 1] (cur was appended directly after prev)
            table.append((prev_start, prev_len + 1))
        if len(table) >= (1 << width) and width < 12:
            width += 1
        have_prev = True
        prev_start, prev_len = cur_start, cur_len
    return bytes(out[:n_pixels])


def _iter_images(blob: bytes):
    """Walk the data stream, yielding ``(canvas_w, canvas_h, left, top, w,
    h, rgb_bytes, delay_cs)`` per image block (palette looked up, interlace
    unwoven; ``delay_cs`` from the preceding graphic-control extension, 0
    if none). Raises ``ValueError`` on malformed structure."""
    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    if len(blob) < 13:
        raise ValueError("truncated GIF header")
    sw, sh, packed, _bg, _par = struct.unpack_from("<HHBBB", blob, 6)
    pos = 13
    global_pal = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        global_pal = blob[pos : pos + 3 * n]
        pos += 3 * n
    delay_cs = 0
    any_image = False
    while pos < len(blob):
        b = blob[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            label = blob[pos + 1] if pos + 1 < len(blob) else None
            if label == 0xF9 and pos + 7 < len(blob):  # graphic control
                (delay_cs,) = struct.unpack_from("<H", blob, pos + 4)
            pos += 2
            while pos < len(blob) and blob[pos] != 0:
                pos += 1 + blob[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected block {b:#x} at byte {pos}")
        if pos + 10 > len(blob):
            raise ValueError("truncated image descriptor")
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", blob, pos + 1)
        pos += 10
        pal = global_pal
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = blob[pos : pos + 3 * n]
            pos += 3 * n
        if pal is None:
            raise ValueError("no color table for image")
        min_code_size = blob[pos]
        pos += 1
        payload = bytearray()
        while pos < len(blob) and blob[pos] != 0:
            ln = blob[pos]
            payload += blob[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1  # block terminator
        idx = _lzw_decode(bytes(payload), min_code_size, w * h)
        if len(idx) < w * h:
            raise ValueError(f"LZW data short: {len(idx)} of {w * h} pixels")
        if ipacked & 0x40:  # interlaced: un-weave row order
            rows = [idx[r * w : (r + 1) * w] for r in range(h)]
            woven: list[bytes | None] = [None] * h
            src = 0
            for first, step in _INTERLACE_PASSES:
                for rr in range(first, h, step):
                    woven[rr] = rows[src]
                    src += 1
            idx = b"".join(woven)  # type: ignore[arg-type]
        n_pal = len(pal) // 3
        # vectorized palette lookup (was a per-pixel Python loop): one
        # bounds check + one numpy fancy-index over the (n_pal, 3) table
        import numpy as np

        idx_arr = np.frombuffer(idx, dtype=np.uint8)
        if idx_arr.size and int(idx_arr.max()) >= n_pal:
            bad = int(idx_arr[idx_arr >= n_pal][0])
            raise ValueError(f"palette index {bad} out of range ({n_pal})")
        pal_arr = np.frombuffer(pal, dtype=np.uint8)[: 3 * n_pal].reshape(n_pal, 3)
        rgb = pal_arr[idx_arr].tobytes()
        any_image = True
        yield sw, sh, left, top, w, h, rgb, delay_cs
        delay_cs = 0
    if not any_image:
        raise ValueError("no image descriptor found")


def decode_gif(blob: bytes) -> tuple[int, int, int, bytes]:
    """Decode the first frame of a GIF blob -> ``(width, height, 3,
    rgb_pixels)`` (palette looked up; interlace unwoven). Raises
    ``ValueError`` on anything malformed — a loud boundary, not a silent
    wrong answer."""
    for _sw, _sh, _l, _t, w, h, rgb, _d in _iter_images(blob):
        return w, h, 3, rgb
    raise ValueError("no image descriptor found")  # pragma: no cover


def decode_gif_frames(blob: bytes) -> dict:
    """Decode ALL frames of an (animated) GIF -> ``{width, height, frames,
    delays_cs}`` with canvas-composited RGB frames: a sub-rect frame is
    painted onto a copy of the previous canvas (disposal method 'leave in
    place' — the common web-animation case; background/restore disposal is
    out of scope for the gray synth corpus and documented here)."""
    width = height = None
    frames: list[bytes] = []
    delays: list[int] = []
    canvas: bytearray | None = None
    for sw, sh, left, top, w, h, rgb, delay in _iter_images(blob):
        if canvas is None:
            width, height = sw, sh
            canvas = bytearray(3 * sw * sh)
        # both axes checked up front: a horizontal overflow would silently
        # wrap into the next row (and GROW the canvas on the last row)
        if left + w > width or top + h > height:
            raise ValueError("frame rect outside canvas")
        for r in range(h):
            dst = 3 * ((top + r) * width + left)
            src = 3 * r * w
            canvas[dst : dst + 3 * w] = rgb[src : src + 3 * w]
        frames.append(bytes(canvas))
        delays.append(delay)
    return {
        "width": width, "height": height,
        "frames": frames, "delays_cs": delays,
    }
