"""Pure-stdlib MP3 frame-header walker: real container-level parsing of
MPEG-1 Layer III streams without ffmpeg (absent from this container).

Scope: frame-sync scan, MPEG-1 Layer III header decode (bitrate /
sample-rate / padding / channel mode), per-frame size arithmetic
(144 * bitrate / samplerate + padding), ID3v2 tag skip (syncsafe length),
duration accounting at 1152 samples/frame. The audio PAYLOAD is opaque —
full PCM decode needs the Layer III filterbank (production: ffmpeg/pyav
inside the same mapInPandas) — but everything a crawl/curation pipeline
reads from an MP3 without decoding (duration, bitrate profile, channel
layout, frame count, CBR/VBR) is computed here for real.

The ENCODER (``build_mp3``) emits structurally valid frames with
deterministic filler payloads so tests and the driver-checked
``media_meta_mp3`` row exercise the real walk: wrong size arithmetic
desynchronizes the scan and changes every downstream stat.
"""

from __future__ import annotations

#: MPEG-1 Layer III bitrate table, kbit/s, by header bitrate index (1..14)
BITRATES = {
    1: 32, 2: 40, 3: 48, 4: 56, 5: 64, 6: 80, 7: 96,
    8: 112, 9: 128, 10: 160, 11: 192, 12: 224, 13: 256, 14: 320,
}
#: MPEG-1 sample-rate table by header samplerate index (0..2)
SAMPLE_RATES = {0: 44100, 1: 48000, 2: 32000}
#: samples per MPEG-1 Layer III frame
SAMPLES_PER_FRAME = 1152


def frame_size(bitrate_kbps: int, sample_rate: int, padding: int) -> int:
    """Layer III frame length in bytes (header included)."""
    return 144 * bitrate_kbps * 1000 // sample_rate + padding


def _header(bitrate_idx: int, sr_idx: int, padding: int, mode: int) -> bytes:
    b0 = 0xFF
    b1 = 0xFB  # sync cont. + MPEG-1 (11) + Layer III (01) + no CRC (1)
    b2 = (bitrate_idx << 4) | (sr_idx << 2) | (padding << 1)
    b3 = mode << 6
    return bytes([b0, b1, b2, b3])


def build_mp3(
    frames: list[tuple[int, int]],
    sr_idx: int = 0,
    mode: int = 3,
    id3_payload: bytes | None = None,
) -> bytes:
    """Assemble a structurally valid MPEG-1 Layer III stream.

    ``frames``: one (bitrate_idx, padding) pair per frame — varying the
    index across frames produces a true VBR stream. ``id3_payload`` (if
    given) is wrapped in an ID3v2.3 tag with a syncsafe length, prepended
    like real tagged files. Frame payloads are deterministic filler
    (byte = frame index mod 251), never valid Layer III audio — the codec
    boundary this module documents."""
    out = bytearray()
    if id3_payload is not None:
        n = len(id3_payload)
        syncsafe = bytes([
            (n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F,
        ])
        out += b"ID3\x03\x00\x00" + syncsafe + id3_payload
    sr = SAMPLE_RATES[sr_idx]
    for k, (bi, pad) in enumerate(frames):
        size = frame_size(BITRATES[bi], sr, pad)
        out += _header(bi, sr_idx, pad, mode)
        out += bytes([k % 251] * (size - 4))
    return bytes(out)


def parse_mp3(blob: bytes) -> dict:
    """Walk the frame chain -> stream statistics.

    Returns ``{n_frames, sample_rate, channels, duration_ms, bitrate_sum,
    bitrate_min, bitrate_max, is_cbr}`` with ``duration_ms`` the exact
    integer ``n_frames * 1152 * 1000 // sample_rate`` and ``bitrate_*`` in
    kbit/s (mean = bitrate_sum / n_frames, kept as a sum so the DuckDB twin
    divides once). Skips a leading ID3v2 tag; resyncs on garbage between
    frames (scan-forward to the next 0xFFE sync, as real players do);
    raises ``ValueError`` if no frame is found."""
    pos = 0
    if blob[:3] == b"ID3" and len(blob) >= 10:
        n = (
            (blob[6] << 21) | (blob[7] << 14) | (blob[8] << 7) | blob[9]
        )
        pos = 10 + n
    n_frames = 0
    sample_rate = None
    channels = None
    br_sum = 0
    br_min = br_max = None
    while pos + 4 <= len(blob):
        b0, b1, b2, b3 = blob[pos : pos + 4]
        ok = (
            b0 == 0xFF
            and (b1 & 0xE0) == 0xE0
            and (b1 & 0x18) == 0x18  # MPEG-1
            and (b1 & 0x06) == 0x02  # Layer III
            and (b2 >> 4) in BITRATES
            and ((b2 >> 2) & 0x03) in SAMPLE_RATES
        )
        if not ok:
            pos += 1  # resync scan
            continue
        bi = b2 >> 4
        sri = (b2 >> 2) & 0x03
        pad = (b2 >> 1) & 0x01
        mode = b3 >> 6
        sr = SAMPLE_RATES[sri]
        if sample_rate is None:
            sample_rate = sr
            channels = 1 if mode == 3 else 2
        elif sr != sample_rate:
            break  # sample-rate change = not one stream; stop cleanly
        br = BITRATES[bi]
        n_frames += 1
        br_sum += br
        br_min = br if br_min is None else min(br_min, br)
        br_max = br if br_max is None else max(br_max, br)
        pos += frame_size(br, sr, pad)
    if n_frames == 0:
        raise ValueError("no MPEG-1 Layer III frame found")
    return {
        "n_frames": n_frames,
        "sample_rate": sample_rate,
        "channels": channels,
        "duration_ms": n_frames * SAMPLES_PER_FRAME * 1000 // sample_rate,
        "bitrate_sum": br_sum,
        "bitrate_min": br_min,
        "bitrate_max": br_max,
        "is_cbr": br_min == br_max,
    }
