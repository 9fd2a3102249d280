"""Pure numpy+stdlib baseline JPEG codec: real lossy image decode inside
the multimodal mapInPandas without PIL/libjpeg (absent from this container).

Scope: baseline sequential DCT (SOF0), 8-bit, grayscale (1 component) and
YCbCr color (3 components, 4:4:4 or 4:2:0), standard JFIF byte stream —
SOI/APP0/DQT/SOF0/DHT/SOS/EOI with 0xFF byte stuffing, optional DRI/RSTn
restart markers on decode, APPn/COM segments skipped. Progressive (SOF2),
arithmetic coding, 12-bit and hierarchical modes are rejected loudly.

The ENCODER writes its huffman/quant tables into the stream and the DECODER
builds its tables from the stream (never from this module's constants), so
an encode->decode round trip is self-consistent by construction and the
decoder also reads foreign baseline JPEGs.

Exactness contract used by the driver-checked query row
(plans/queries.py::q_media_features_jpeg): at ``quality=100`` every
quantization table entry is 1, and an image whose 8x8 blocks are each FLAT
(one gray value per block) round-trips EXACTLY — the DCT of a flat block is
DC-only (8*(v-128)) with integer DC, so quantize/dequantize is the identity
and the IDCT reproduces v bit-for-bit. That makes the decoded bytes
SQL-derivable (same md5 construction as the PNG row) while still exercising
the real bit stream: DC differential coding across blocks, huffman tables,
bit packing and byte stuffing. Non-flat blocks and chroma subsampling are
covered by pytest round trips with bounded error (tests/test_jpeg_codec.py).

This is codec plumbing for `operators/multimodal.py`, not a general imaging
library: production swaps these two functions for PIL/libjpeg-turbo inside
the same mapInPandas body (the Spark-side schema/batching is unchanged).
"""

from __future__ import annotations

import struct

import numpy as np

# ----------------------------------------------------------------- tables

#: zigzag scan order: index i of the scan -> (row, col) flattened offset
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

#: ITU-T T.81 Table K.1 (luminance) / K.2 (chrominance), raster order
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# Annex K huffman specs as (bits[1..16], huffval) — written into DHT and
# used by the encoder; the decoder always rebuilds from the stream.
DC_LUMA_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROMA_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

#: orthonormal 8x8 DCT-II matrix: dct2(B) = C @ B @ C.T, idct2(F) = C.T @ F @ C
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )


def quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 1..100 -> scaled table, entries clamped to
    [1, 255]. quality=100 -> all-ones (lossless-per-coefficient), the
    setting the exactness contract in the module docstring relies on."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be 1..100, got {quality}")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int32)


# ------------------------------------------------------------ huffman code

def _build_codes(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """Annex C code assignment: symbol -> (code, length)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decode_map(bits: list[int], huffval: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for the bit-at-a-time decoder."""
    out: dict[tuple[int, int], int] = {}
    for sym, (code, length) in _build_codes(bits, huffval).items():
        out[(length, code)] = sym
    return out


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: value -> (category, category-bit pattern)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = a.bit_length()
    bits = v if v > 0 else v + (1 << cat) - 1
    return cat, bits


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, nbits: int):
        if nbits == 0:
            return
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._n += nbits
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
        self._acc &= (1 << self._n) - 1

    def flush(self):
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


class _BitReader:
    """Entropy-coded-segment reader: un-stuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0
        self.marker: int | None = None  # marker that ended the segment

    def _fill(self):
        d = self.data
        while self._n <= 24:
            if self.pos >= len(d):
                raise ValueError("truncated entropy segment")
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
                if nxt == 0x00:
                    self.pos += 2
                elif nxt is None:
                    raise ValueError("truncated entropy segment")
                else:  # a real marker ends the segment
                    self.marker = nxt
                    b = None
            else:
                self.pos += 1
            if b is None:
                # feed 0-bits past the marker (final partial MCU padding)
                self._acc = (self._acc << 8)
                self._n += 8
            else:
                self._acc = (self._acc << 8) | b
                self._n += 8

    def read_bit(self) -> int:
        if self._n == 0:
            self._fill()
        self._n -= 1
        return (self._acc >> self._n) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self):
        """Skip to just past the next marker (for RSTn); resets bit state."""
        self._acc = 0
        self._n = 0
        self.marker = None
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and d[self.pos + 1] != 0x00:
                self.pos += 2
                return d[self.pos - 1]
            self.pos += 1
        raise ValueError("expected restart marker, hit end of stream")


def _decode_huff_symbol(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code in entropy segment")


def _extend(bits: int, cat: int) -> int:
    """Inverse of _magnitude: category bits -> signed value."""
    if cat == 0:
        return 0
    if bits < (1 << (cat - 1)):
        return bits - (1 << cat) + 1
    return bits


# ---------------------------------------------------------------- encoder

def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _dht_payload(tc: int, th: int, spec) -> bytes:
    bits, huffval = spec
    return bytes([tc << 4 | th]) + bytes(bits) + bytes(huffval)


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 -> (h, w, 3) float64 YCbCr, JFIF full range."""
    r = px[..., 0].astype(np.float64)
    g = px[..., 1].astype(np.float64)
    b = px[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def _pad_to_blocks(plane: np.ndarray, bh: int = 8, bw: int = 8) -> np.ndarray:
    """Edge-replicate pad a 2-D plane to multiples of (bh, bw)."""
    h, w = plane.shape
    ph = (bh - h % bh) % bh
    pw = (bw - w % bw) % bw
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _encode_block(
    w: _BitWriter,
    block: np.ndarray,
    qtab: np.ndarray,
    dc_codes,
    ac_codes,
    dc_pred: int,
) -> int:
    """DCT + quantize + huffman one 8x8 float block; returns new DC pred."""
    coef = _C @ (block - 128.0) @ _C.T
    q = np.round(coef / qtab.reshape(8, 8)).astype(np.int64).reshape(64)
    zz = q[ZIGZAG]
    # DC
    diff = int(zz[0]) - dc_pred
    cat, bits = _magnitude(diff)
    code, length = dc_codes[cat]
    w.write(code, length)
    w.write(bits, cat)
    # AC: (run, size) symbols with ZRL and EOB
    run = 0
    last_nz = 0
    for i in range(63, 0, -1):
        if zz[i] != 0:
            last_nz = i
            break
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            w.write(code, length)
            run -= 16
        cat, bits = _magnitude(v)
        code, length = ac_codes[(run << 4) | cat]
        w.write(code, length)
        w.write(bits, cat)
        run = 0
    if last_nz != 63:
        code, length = ac_codes[0x00]  # EOB
        w.write(code, length)
    return int(zz[0])


def encode_jpeg(
    width: int,
    height: int,
    pixels: bytes,
    channels: int = 3,
    quality: int = 100,
    subsampling: str = "444",
) -> bytes:
    """Encode raw top-down pixel bytes (``width*height*channels``, RGB or
    grayscale) to a baseline JFIF JPEG. ``subsampling`` ('444' or '420')
    applies to 3-channel input only."""
    if channels not in (1, 3):
        raise ValueError(f"channels must be 1 or 3, got {channels}")
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling must be 444 or 420, got {subsampling}")
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"pixels: want {width * height * channels} bytes, got {len(pixels)}"
        )
    q_luma = quality_scale(QUANT_LUMA, quality)
    q_chroma = quality_scale(QUANT_CHROMA, quality)
    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, channels)

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")  # APP0
    out += _seg(0xDB, bytes([0x00]) + bytes(int(q_luma[ZIGZAG[i]]) for i in range(64)))
    if channels == 3:
        out += _seg(
            0xDB, bytes([0x01]) + bytes(int(q_chroma[ZIGZAG[i]]) for i in range(64))
        )
    # SOF0
    if channels == 1:
        comps = bytes([1, 0x11, 0])
    elif subsampling == "420":
        comps = bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1])
    else:
        comps = bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1])
    out += _seg(
        0xC0,
        struct.pack(">BHHB", 8, height, width, channels) + comps,
    )
    out += _seg(0xC4, _dht_payload(0, 0, DC_LUMA_SPEC))
    out += _seg(0xC4, _dht_payload(1, 0, AC_LUMA_SPEC))
    if channels == 3:
        out += _seg(0xC4, _dht_payload(0, 1, DC_CHROMA_SPEC))
        out += _seg(0xC4, _dht_payload(1, 1, AC_CHROMA_SPEC))
    # SOS
    if channels == 1:
        sos = bytes([1, 1, 0x00, 0, 63, 0])
    else:
        sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += _seg(0xDA, sos)

    dc_l = _build_codes(*DC_LUMA_SPEC)
    ac_l = _build_codes(*AC_LUMA_SPEC)
    w = _BitWriter()
    if channels == 1:
        plane = _pad_to_blocks(arr[..., 0].astype(np.float64))
        pred = 0
        for by in range(plane.shape[0] // 8):
            for bx in range(plane.shape[1] // 8):
                pred = _encode_block(
                    w, plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8],
                    q_luma, dc_l, ac_l, pred,
                )
    else:
        dc_c = _build_codes(*DC_CHROMA_SPEC)
        ac_c = _build_codes(*AC_CHROMA_SPEC)
        ycc = _rgb_to_ycbcr(arr)
        y = ycc[..., 0]
        if subsampling == "420":
            # box-filter 2x2 chroma downsample over an even-padded plane
            cb_f = _pad_to_blocks(ycc[..., 1], 2, 2)
            cr_f = _pad_to_blocks(ycc[..., 2], 2, 2)
            cb = (cb_f[0::2, 0::2] + cb_f[0::2, 1::2]
                  + cb_f[1::2, 0::2] + cb_f[1::2, 1::2]) / 4.0
            cr = (cr_f[0::2, 0::2] + cr_f[0::2, 1::2]
                  + cr_f[1::2, 0::2] + cr_f[1::2, 1::2]) / 4.0
            y = _pad_to_blocks(y, 16, 16)
            cb = _pad_to_blocks(cb)
            cr = _pad_to_blocks(cr)
            preds = [0, 0, 0]
            for my in range(y.shape[0] // 16):
                for mx in range(y.shape[1] // 16):
                    for sy in range(2):
                        for sx in range(2):
                            oy, ox = my * 16 + sy * 8, mx * 16 + sx * 8
                            preds[0] = _encode_block(
                                w, y[oy:oy + 8, ox:ox + 8], q_luma,
                                dc_l, ac_l, preds[0],
                            )
                    preds[1] = _encode_block(
                        w, cb[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8],
                        q_chroma, dc_c, ac_c, preds[1],
                    )
                    preds[2] = _encode_block(
                        w, cr[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8],
                        q_chroma, dc_c, ac_c, preds[2],
                    )
        else:
            planes = [
                _pad_to_blocks(ycc[..., 0]),
                _pad_to_blocks(ycc[..., 1]),
                _pad_to_blocks(ycc[..., 2]),
            ]
            preds = [0, 0, 0]
            for by in range(planes[0].shape[0] // 8):
                for bx in range(planes[0].shape[1] // 8):
                    for ci, plane in enumerate(planes):
                        qt = q_luma if ci == 0 else q_chroma
                        dct_, act_ = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
                        preds[ci] = _encode_block(
                            w, plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8],
                            qt, dct_, act_, preds[ci],
                        )
    w.flush()
    out += w.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------- decoder

def _decode_block(r: _BitReader, dc_map, ac_map, qtab: np.ndarray,
                  dc_pred: int) -> tuple[np.ndarray, int]:
    zz = np.zeros(64, dtype=np.int64)
    cat = _decode_huff_symbol(r, dc_map)
    diff = _extend(r.read_bits(cat), cat)
    dc = dc_pred + diff
    zz[0] = dc
    i = 1
    while i < 64:
        sym = _decode_huff_symbol(r, ac_map)
        if sym == 0x00:  # EOB
            break
        run, cat = sym >> 4, sym & 0x0F
        if cat == 0:
            if run != 15:
                raise ValueError(f"bad AC symbol {sym:#x}")
            i += 16  # ZRL
            continue
        i += run
        if i >= 64:
            raise ValueError("AC run past end of block")
        zz[i] = _extend(r.read_bits(cat), cat)
        i += 1
    coef = np.zeros(64, dtype=np.float64)
    # zz is in scan order: scan slot i dequantizes by the table entry at its
    # raster position ZIGZAG[i] (a raster-order qtab here would be invisible
    # at q=100 where every entry is 1 — hence the q<100 round-trip tests)
    coef[ZIGZAG] = zz * qtab[ZIGZAG]
    block = _C.T @ coef.reshape(8, 8) @ _C
    return np.clip(np.round(block + 128.0), 0, 255), dc


def decode_jpeg(blob: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline JPEG blob -> ``(width, height, channels, pixels)``
    with ``pixels`` raw top-down bytes (grayscale or RGB).

    Supports SOF0 with 1 component or 3 components at 4:4:4 / 4:2:0,
    restart markers, APPn/COM skip; raises ``ValueError`` on progressive /
    arithmetic / other shapes — a loud boundary, not a silent wrong answer.
    """
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (tc, th) -> decode map
    frame = None  # (h, w, [(cid, hsamp, vsamp, tq)])
    restart_interval = 0
    while pos + 4 <= len(blob):
        if blob[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = blob[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", blob, pos + 2)
        data = blob[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            p = 0
            while p < len(data):
                pq, tq = data[p] >> 4, data[p] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                zz = np.frombuffer(data[p + 1 : p + 65], dtype=np.uint8)
                tab = np.zeros(64, dtype=np.int64)
                tab[ZIGZAG] = zz
                qtabs[tq] = tab
                p += 65
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            p = 0
            while p < len(data):
                tc, th = data[p] >> 4, data[p] & 0x0F
                bits = list(data[p + 1 : p + 17])
                n = sum(bits)
                if len(bits) < 16 or p + 17 + n > len(data):
                    raise ValueError("truncated DHT segment")
                huffval = list(data[p + 17 : p + 17 + n])
                huff[(tc, th)] = _build_decode_map(bits, huffval)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # baseline / extended seq
            prec, h, w_, nc = struct.unpack_from(">BHHB", data, 0)
            if prec != 8:
                raise ValueError(f"unsupported sample precision {prec}")
            comps = []
            for i in range(nc):
                cid, samp, tq = data[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, samp >> 4, samp & 0x0F, tq))
            frame = (h, w_, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(f"non-baseline SOF{marker - 0xC0} unsupported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", data, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = data[0]
            scan_tabs = {}
            for i in range(ns):
                cid, tsel = data[1 + 2 * i], data[2 + 2 * i]
                scan_tabs[cid] = (tsel >> 4, tsel & 0x0F)
            return _decode_scan(
                blob, pos, frame, scan_tabs, qtabs, huff, restart_interval
            )
        # APPn / COM / anything else with a length: skipped
    raise ValueError("no SOS marker found")


def _decode_scan(blob, pos, frame, scan_tabs, qtabs, huff, restart_interval):
    h, w, comps = frame
    ncomp = len(comps)
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    r = _BitReader(blob, pos)
    if ncomp == 1:
        # non-interleaved single-component scan: MCU = one block
        mcux = -(-w // 8)
        mcuy = -(-h // 8)
        cid = comps[0][0]
        planes = {cid: np.zeros((mcuy * 8, mcux * 8), dtype=np.float64)}
    else:
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
        # planes sized to whole MCUs (decode writes every MCU block)
        planes = {
            cid: np.zeros((mcuy * vs * 8, mcux * hs * 8), dtype=np.float64)
            for cid, hs, vs, tq in comps
        }
    preds = {cid: 0 for cid, *_ in comps}
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                m = r.align_to_marker()
                if not 0xD0 <= m <= 0xD7:
                    raise ValueError(f"expected RSTn, got {m:#x}")
                preds = {cid: 0 for cid in preds}
            if ncomp == 1:
                cid, hs, vs, tq = comps[0]
                dc_map = huff[(0, scan_tabs[cid][0])]
                ac_map = huff[(1, scan_tabs[cid][1])]
                block, preds[cid] = _decode_block(
                    r, dc_map, ac_map, qtabs[tq], preds[cid]
                )
                planes[cid][my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = block
            else:
                for cid, hs, vs, tq in comps:
                    dc_map = huff[(0, scan_tabs[cid][0])]
                    ac_map = huff[(1, scan_tabs[cid][1])]
                    for sy in range(vs):
                        for sx in range(hs):
                            block, preds[cid] = _decode_block(
                                r, dc_map, ac_map, qtabs[tq], preds[cid]
                            )
                            oy = (my * vs + sy) * 8
                            ox = (mx * hs + sx) * 8
                            planes[cid][oy:oy + 8, ox:ox + 8] = block
            n_mcu += 1
    if ncomp == 1:
        cid = comps[0][0]
        px = planes[cid][:h, :w].astype(np.uint8)
        return w, h, 1, px.tobytes()
    if ncomp != 3:
        raise ValueError(f"{ncomp}-component JPEG unsupported")
    full = {}
    for cid, hs, vs, tq in comps:
        plane = planes[cid]
        if hs != hmax or vs != vmax:  # replicate-upsample chroma
            plane = np.repeat(
                np.repeat(plane, hmax // hs, axis=1), vmax // vs, axis=0
            )
        full[cid] = plane[:h, :w]
    c1, c2, c3 = (comps[0][0], comps[1][0], comps[2][0])
    rgb = _ycbcr_to_rgb(full[c1], full[c2], full[c3])
    return w, h, 3, rgb.tobytes()
