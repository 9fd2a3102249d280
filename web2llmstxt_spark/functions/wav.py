"""Pure-stdlib RIFF/WAVE PCM codec (struct only): real audio decode inside
the multimodal mapInPandas without torchaudio/soundfile (absent from this
container).

Scope: canonical RIFF little-endian WAVE with a PCM ``fmt `` chunk
(audio format 1), 8-bit unsigned or 16-bit signed samples, any channel
count/rate. Unknown chunks (LIST/INFO, fact, cue) are SKIPPED per the RIFF
spec — and the encoder deliberately emits a LIST chunk between ``fmt `` and
``data`` so any decoder that assumes chunk order/adjacency breaks loudly in
the round-trip tests (same philosophy as the PNG encoder's cycling row
filters, functions/png.py).

Codec plumbing for `operators/multimodal.py`, not a general audio library:
production swaps these two functions for soundfile/ffmpeg inside the same
mapInPandas body (the Spark-side schema/batching is unchanged).

Reference parity note: the reference carries media only as opaque
attachments (SURVEY.md §1.2); this module is part of the beyond-reference
training-data surface (multimodal columns), not a port of reference code.
"""

from __future__ import annotations

import struct

#: the LIST/INFO payload the encoder plants so decoders must chunk-skip
_LIST_INFO = b"INFOISFT" + struct.pack("<I", 6) + b"w2lst\x00"


def encode_wav(
    sample_rate: int,
    n_channels: int,
    bits: int,
    payload: bytes,
    plant_list_chunk: bool = True,
) -> bytes:
    """Encode raw interleaved PCM ``payload`` bytes to a RIFF/WAVE blob.

    ``bits`` is 8 (unsigned) or 16 (signed little-endian); ``payload`` must
    be whole frames (``len % block_align == 0``). ``plant_list_chunk``
    inserts a LIST chunk before ``data`` to exercise decoder chunk-skipping.
    """
    if bits not in (8, 16):
        raise ValueError(f"bits must be 8 or 16, got {bits}")
    block_align = n_channels * bits // 8
    if block_align == 0 or len(payload) % block_align:
        raise ValueError(
            f"payload {len(payload)} bytes is not whole frames of {block_align}"
        )
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate,
        sample_rate * block_align, block_align, bits,
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if plant_list_chunk:
        body += b"LIST" + struct.pack("<I", len(_LIST_INFO)) + _LIST_INFO
    body += b"data" + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:  # RIFF chunks are word-aligned: odd data gets a pad byte
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(blob: bytes) -> tuple[int, int, int, list[int]]:
    """Decode a WAVE blob -> ``(sample_rate, n_channels, bits, samples)``.

    ``samples`` is the flat interleaved sample list: signed ints for 16-bit,
    unsigned 0..255 for 8-bit. Verifies the RIFF/WAVE magic, chunk sizes,
    and the fmt geometry; skips unknown chunks; raises ``ValueError`` on
    non-PCM, unsupported bit depths, or truncated chunks — a loud boundary,
    not a silent wrong answer.
    """
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE blob")
    (riff_size,) = struct.unpack_from("<I", blob, 4)
    if riff_size + 8 > len(blob):
        raise ValueError(f"RIFF size {riff_size} overruns blob of {len(blob)}")
    pos = 12
    rate = channels = bits = block_align = None
    data = None
    while pos + 8 <= len(blob):
        tag = blob[pos : pos + 4]
        (length,) = struct.unpack_from("<I", blob, pos + 4)
        chunk = blob[pos + 8 : pos + 8 + length]
        if len(chunk) != length:
            raise ValueError(f"truncated {tag!r} chunk: want {length}, got {len(chunk)}")
        if tag == b"fmt ":
            if length < 16:
                raise ValueError(f"fmt chunk too short ({length})")
            audio_format, channels, rate, _byte_rate, block_align, bits = (
                struct.unpack_from("<HHIIHH", chunk)
            )
            if audio_format != 1:
                raise ValueError(f"unsupported audio format {audio_format} (PCM only)")
            if bits not in (8, 16):
                raise ValueError(f"unsupported bit depth {bits}")
            if block_align != channels * bits // 8:
                raise ValueError(
                    f"block_align {block_align} != channels*bits/8 "
                    f"({channels}x{bits})"
                )
        elif tag == b"data":
            data = chunk
        # any other tag (LIST, fact, cue ...): skip
        pos += 8 + length + (length % 2)  # chunks are word-aligned
    if rate is None:
        raise ValueError("no fmt chunk")
    if data is None:
        raise ValueError("no data chunk")
    if len(data) % block_align:
        raise ValueError(f"data {len(data)} bytes is not whole frames of {block_align}")
    if bits == 8:
        samples = list(data)
    else:
        samples = list(struct.unpack(f"<{len(data) // 2}h", data))
    return rate, channels, bits, samples
