"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Training-data pipelines carry media as ``binary`` columns with a metadata
struct; compute-heavy decode/resize/feature steps run as Arrow-batched
``mapInPandas`` so each Python worker touches a whole batch of blobs at
once (never per-row UDF calls). The actual codecs (PIL/ffmpeg/torchaudio)
are NOT in this container, so the decode step is pluggable:

- ``decoder='fake'`` (default): a deterministic stand-in (blake2b-derived
  pixel statistics / frame offsets) so the Spark-side plumbing — schema,
  batching, partition sizing, output shape — is fully real and testable;
- ``decoder='pil'`` etc.: raises NotImplementedError with the exact
  production recipe, clearly marking the stub boundary.

Scale notes: media rows are wide (MBs); keep them OUT of shuffles — derive
features first (this module), then join features by id. Partition by
``maxPartitionBytes`` so a batch of blobs fits executor memory; the
metadata struct lets Catalyst prune the binary column when only metadata is
queried.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import gif, jpeg, mp3, mp4, png, wav, webp, y4m
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: media row: (doc_id, media_ref, kind, blob, meta)
MEDIA_META = StructType(
    [
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)
MEDIA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("media_ref", StringType(), False),
        StructField("kind", StringType(), False),       # image|audio|video
        StructField("blob", BinaryType(), True),
        StructField("meta", MEDIA_META, True),
    ]
)

IMAGE_FEATURES = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("media_ref", StringType()),
        StructField("width", IntegerType()),             # null for decoder='fake'
        StructField("height", IntegerType()),
        StructField("feat", ArrayType(DoubleType())),    # 16-dim embedding
        StructField("mean_luma", DoubleType()),
    ]
)

#: BT.601 luma weights x1000 — integer so the per-image luma SUM is exact and
#: the single closing division is bit-identical across Python and DuckDB
_LUMA_MILLI = (299, 587, 114)


def _fake_decode_stats(blob: bytes, dims: int = 16) -> tuple[list[float], float]:
    """Deterministic stand-in for decode+feature-extract: blake2b-derived
    statistics (stable across runs/engines; replace with a real model)."""
    d = hashlib.blake2b(blob or b"", digest_size=2 * dims + 2).digest()
    feat = [(d[2 * i] * 256 + d[2 * i + 1]) / 65535.0 - 0.5 for i in range(dims)]
    luma = d[-1] / 255.0
    return feat, luma


def _pixel_stats(w: int, h: int, ch: int, px: bytes) -> tuple[int, int, list[float], float]:
    """Decoded pixels -> deterministic stats, each a single exact-integer
    division so the DuckDB oracle twins reproduce them bit-identically.
    ONE implementation for every image decoder (png/jpeg/gif) — the
    oracle-exactness contract means any tweak must hit all three rows in
    lockstep, so there is exactly one body to tweak:

    - ``feat[j]`` = fraction of pixel bytes with high nibble j (16-bin byte
      histogram), count / n_bytes;
    - ``mean_luma`` = mean BT.601 luma over pixels in [0,1]: the integer sum
      of 299R+587G+114B divided once by 255*1000*n_pixels (grayscale: R=G=B
      -> exactly 1000*v; RGBA: alpha excluded).
    """
    import numpy as np

    arr = np.frombuffer(px, dtype=np.uint8)
    nbins = np.bincount(arr >> 4, minlength=16)
    if ch == 1:
        luma = 1000 * int(arr.sum(dtype=np.int64))
    else:
        pix = arr.reshape(-1, ch).astype(np.int64)
        luma = int(
            sum(_LUMA_MILLI[c] * int(pix[:, c].sum()) for c in range(min(ch, 3)))
        )
    n_bytes = len(px)
    n_pix = w * h
    # all-integer sums + one float division per stat: bit-identical to the
    # previous per-byte loop and to the DuckDB twins
    return w, h, [int(n) / n_bytes for n in nbins], luma / (255 * 1000 * n_pix)


def _png_decode_stats(blob: bytes) -> tuple[int, int, list[float], float]:
    """REAL decode (functions/png.py, stdlib zlib) -> :func:`_pixel_stats`."""
    return _pixel_stats(*png.decode_png(blob))


def _jpeg_decode_stats(blob: bytes) -> tuple[int, int, list[float], float]:
    """REAL lossy decode (functions/jpeg.py, numpy DCT) ->
    :func:`_pixel_stats`. The decoded bytes of the flat-block q=100 synth
    images are exactly SQL-derivable (see functions/jpeg.py docstring), so
    the driver row verifies the whole baseline bit stream — huffman, DC
    differentials, byte stuffing, IDCT — end-to-end against DuckDB."""
    return _pixel_stats(*jpeg.decode_jpeg(blob))


def _gif_decode_stats(blob: bytes) -> tuple[int, int, list[float], float]:
    """REAL decode (functions/gif.py, pure-python LZW) ->
    :func:`_pixel_stats` over the palette-resolved RGB bytes. GIF is
    lossless, so the oracle derives the identical bytes from md5() in SQL —
    a variable-width/dictionary-reset LZW bug changes the bytes and fails
    the hash match."""
    return _pixel_stats(*gif.decode_gif(blob))


def extract_image_features(media: DataFrame, decoder: str = "fake",
                           dims: int = 16) -> DataFrame:
    """image blobs -> feature vectors via mapInPandas (Arrow batches).

    ``decoder='png'``: REAL decode via the stdlib codec (functions/png.py) —
    width/height come from the parsed IHDR and feat/mean_luma from actual
    pixel bytes, so a corrupted blob or a codec bug fails loudly here.
    ``decoder='jpeg'``: REAL baseline-JPEG decode (functions/jpeg.py, numpy
    DCT + huffman built from the stream's own DHT). ``decoder='gif'``: REAL
    LZW decode (functions/gif.py, palette-resolved RGB). ``decoder='fake'``:
    blake2b stand-in (width/height null). webp/avif need PIL and raise with
    the production recipe.
    """
    if decoder not in ("fake", "png", "jpeg", "gif"):
        raise NotImplementedError(
            "webp/avif decoders unavailable in this container; production: "
            "PIL.Image.open(io.BytesIO(blob)).convert('RGB') -> resize -> "
            "model.encode inside this same mapInPandas body"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, feats, lumas = [], [], [], []
            for blob in pdf["blob"]:
                raw = bytes(blob) if blob is not None else b""
                if decoder == "png":
                    w, h, f, l = _png_decode_stats(raw)
                elif decoder == "jpeg":
                    w, h, f, l = _jpeg_decode_stats(raw)
                elif decoder == "gif":
                    w, h, f, l = _gif_decode_stats(raw)
                else:
                    f, l = _fake_decode_stats(raw, dims)
                    w = h = None
                ws.append(w)
                hs.append(h)
                feats.append(f)
                lumas.append(l)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "feat": feats,
                    "mean_luma": lumas,
                }
            )

    imgs = media.filter(F.col("kind") == "image").select("doc_id", "media_ref", "blob")
    return imgs.mapInPandas(run, IMAGE_FEATURES)


AUDIO_FEATURES = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("media_ref", StringType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("peak_abs", IntegerType()),
        StructField("mean_abs", DoubleType()),
        StructField("zero_crossings", IntegerType()),
    ]
)


def _wav_decode_stats(blob: bytes) -> tuple[int, int, int, int, int, float, int]:
    """REAL decode (functions/wav.py, stdlib struct) -> deterministic sample
    stats, each an exact-integer reduction with at most one closing division
    so the DuckDB oracle twin reproduces them bit-identically:

    - ``peak_abs`` = max |sample| (integer);
    - ``mean_abs`` = sum |sample| / (32768 * n) in [0,1];
    - ``zero_crossings`` = count of adjacent sample pairs whose negative
      flags differ (the flat interleaved stream; channels uninterleaved
      would refine this, the oracle matches this exact definition).
    """
    import numpy as np

    rate, channels, bits, samples = wav.decode_wav(blob)
    arr = np.asarray(samples, dtype=np.int64)
    n = int(arr.size)
    scale = 32768 if bits == 16 else 256
    absolute = np.abs(arr)
    neg = arr < 0
    zc = int(np.count_nonzero(neg[1:] != neg[:-1])) if n > 1 else 0
    dur_ms = n * 1000 // (rate * channels)
    return (
        rate, channels, n, dur_ms,
        int(absolute.max()) if n else 0,
        float(int(absolute.sum()) / (scale * n)) if n else 0.0,
        zc,
    )


def extract_audio_features(media: DataFrame, decoder: str = "wav") -> DataFrame:
    """audio blobs -> sample statistics via mapInPandas (Arrow batches).

    ``decoder='wav'``: REAL decode via the stdlib RIFF/PCM codec
    (functions/wav.py) — rate/channels come from the parsed fmt chunk and
    the stats from actual decoded samples, so a corrupted blob or codec bug
    fails loudly here. Other decoders (mp3/flac/ogg) need soundfile/ffmpeg
    and raise with the production recipe.
    """
    if decoder != "wav":
        raise NotImplementedError(
            "non-WAV decoders unavailable in this container; production: "
            "soundfile.read(io.BytesIO(blob)) (or ffmpeg pipe) -> resample "
            "-> feature model inside this same mapInPandas body"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                _wav_decode_stats(bytes(b) if b is not None else b"")
                for b in pdf["blob"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "sample_rate": pd.array([r[0] for r in rows], dtype="Int32"),
                    "n_channels": pd.array([r[1] for r in rows], dtype="Int32"),
                    "n_samples": pd.array([r[2] for r in rows], dtype="Int32"),
                    "duration_ms": pd.array([r[3] for r in rows], dtype="Int64"),
                    "peak_abs": pd.array([r[4] for r in rows], dtype="Int32"),
                    "mean_abs": [r[5] for r in rows],
                    "zero_crossings": pd.array([r[6] for r in rows], dtype="Int32"),
                }
            )

    auds = media.filter(F.col("kind") == "audio").select("doc_id", "media_ref", "blob")
    return auds.mapInPandas(run, AUDIO_FEATURES)


RESIZED = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("media_ref", StringType()),
        StructField("blob", BinaryType()),
        StructField("meta", MEDIA_META),
    ]
)


def resize_images(media: DataFrame, width: int, height: int,
                  decoder: str = "fake") -> DataFrame:
    """Resize step: real plumbing, fake transform (blob passthrough with
    truncation; meta rewritten to the target size)."""
    if decoder != "fake":
        raise NotImplementedError("production: PIL resize inside mapInPandas")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = [
                bytes(b)[: width * height] if b is not None else None for b in pdf["blob"]
            ]
            metas = [
                {"mime": "image/raw", "width": width, "height": height, "duration_ms": None}
                for _ in blobs
            ]
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "media_ref": pdf["media_ref"],
                 "blob": blobs, "meta": metas}
            )

    imgs = media.filter(F.col("kind") == "image").select("doc_id", "media_ref", "blob")
    return imgs.mapInPandas(run, RESIZED)


FRAMES = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("media_ref", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("ts_ms", LongType()),
    ]
)


def sample_video_frames(media: DataFrame, every_ms: int = 1000,
                        decoder: str = "fake") -> DataFrame:
    """Frame sampling: one output row per sampled frame (explode-shaped
    mapInPandas). Frame count derives from meta.duration_ms."""
    if decoder != "fake":
        raise NotImplementedError("production: ffmpeg/pyav frame iterator here")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, ref, dur in zip(pdf["doc_id"], pdf["media_ref"], pdf["duration_ms"]):
                n = int((dur or 0) // every_ms)
                for i in range(n):
                    rows.append((doc_id, ref, i, i * every_ms))
            yield pd.DataFrame(rows, columns=["doc_id", "media_ref", "frame_idx", "ts_ms"])

    vids = media.filter(F.col("kind") == "video").select(
        "doc_id", "media_ref", F.col("meta.duration_ms").alias("duration_ms")
    )
    return vids.mapInPandas(run, FRAMES)


FRAME_FEATURES = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("media_ref", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("ts_ms", LongType()),
        StructField("mean_luma", DoubleType()),
    ]
)


def extract_video_frames(media: DataFrame, every_ms: int = 500,
                         decoder: str = "y4m") -> DataFrame:
    """video blobs -> one row per SAMPLED frame with its Y-plane mean luma,
    via explode-shaped mapInPandas.

    ``decoder='y4m'``: REAL container parse via the stdlib YUV4MPEG2 codec
    (functions/y4m.py) — frame count/geometry/fps come from the parsed
    stream header and ``mean_luma`` from the actual Y-plane bytes (exact
    integer sum, one closing division — DuckDB-twin reproducible). Sampling:
    timestamps 0, every_ms, 2*every_ms, ... < duration; frame_idx =
    ts * fps_num // (1000 * fps_den). Other containers (mp4/webm) need
    ffmpeg/pyav and raise with the production recipe.
    """
    if decoder != "y4m":
        raise NotImplementedError(
            "non-y4m containers unavailable in this container; production: "
            "pyav frame iterator (av.open(io.BytesIO(blob))) inside this "
            "same mapInPandas body"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, ref, blob in zip(pdf["doc_id"], pdf["media_ref"], pdf["blob"]):
                w, h, (num, den), _cs, frames = y4m.decode_y4m(
                    bytes(blob) if blob is not None else b""
                )
                dur_ms = len(frames) * 1000 * den // num
                npix = w * h
                ts = 0
                while ts < dur_ms:
                    fidx = ts * num // (1000 * den)
                    luma = sum(frames[fidx][:npix])  # Y plane only (420: first w*h)
                    rows.append((doc_id, ref, fidx, ts, luma / (255 * npix)))
                    ts += every_ms
            yield pd.DataFrame(
                rows, columns=["doc_id", "media_ref", "frame_idx", "ts_ms", "mean_luma"]
            )

    vids = media.filter(F.col("kind") == "video").select("doc_id", "media_ref", "blob")
    return vids.mapInPandas(run, FRAME_FEATURES)


#: synthetic PNG geometry: 8x8 RGB = 192 pixel bytes = 12 md5 chunks
SYNTH_W = SYNTH_H = 8
_SYNTH_CHUNKS = SYNTH_W * SYNTH_H * 3 // 16


def synth_png_pixels(media_ref: str) -> bytes:
    """Deterministic pixel bytes for a media_ref: the md5 chain
    ``md5(ref + ':' + i)`` for chunk i — the SAME byte sequence the DuckDB
    oracle twin derives from md5() hex in SQL, so the driver-checked
    ``media_features`` stats verify the encode->decode round trip
    end-to-end (wrong unfilter => wrong bytes => hash mismatch)."""
    return b"".join(
        hashlib.md5(f"{media_ref}:{i}".encode()).digest() for i in range(_SYNTH_CHUNKS)
    )


def _synth_png_blob(media_ref: str) -> bytes:
    # default cycling filters: all five PNG filter paths exercised per image
    return png.encode_png(SYNTH_W, SYNTH_H, synth_png_pixels(media_ref))


def _attach_png_blobs(imgs: DataFrame) -> DataFrame:
    """(doc_id, media_ref) -> full media rows with REAL PNG blobs, encoded in
    Arrow-batched mapInPandas (stdlib codec; blobs never cross a shuffle —
    derive features first, then join by id)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "kind": "image",
                    "blob": [_synth_png_blob(r) for r in pdf["media_ref"]],
                    "meta": [
                        {"mime": "image/png", "width": SYNTH_W, "height": SYNTH_H,
                         "duration_ms": None}
                        for _ in pdf["media_ref"]
                    ],
                }
            )

    return imgs.mapInPandas(run, MEDIA)


#: JPEG synth geometry: 16x16 grayscale = 2x2 grid of FLAT 8x8 blocks.
#: Flat blocks at quality=100 round-trip EXACTLY through the lossy codec
#: (DC-only, all-ones quant table — functions/jpeg.py docstring), which is
#: what makes the decoded bytes SQL-derivable for the oracle while the bit
#: stream still exercises huffman + DC differential coding across blocks.
SYNTH_JPEG_SIDE = 16


def synth_jpeg_block_values(media_ref: str) -> list[int]:
    """The four flat-block gray values for a media_ref: bytes 0..3 of
    ``md5(ref + ':j0')`` — the same hex pairs the DuckDB oracle twin
    extracts with substr(md5(...)) in SQL."""
    return list(hashlib.md5(f"{media_ref}:j0".encode()).digest()[:4])


def synth_jpeg_pixels(media_ref: str) -> bytes:
    """16x16 grayscale pixels: block (by, bx) flat at value[by*2+bx]."""
    vals = synth_jpeg_block_values(media_ref)
    row_top = bytes([vals[0]] * 8 + [vals[1]] * 8)
    row_bot = bytes([vals[2]] * 8 + [vals[3]] * 8)
    return row_top * 8 + row_bot * 8


def _synth_jpeg_blob(media_ref: str) -> bytes:
    return jpeg.encode_jpeg(
        SYNTH_JPEG_SIDE, SYNTH_JPEG_SIDE, synth_jpeg_pixels(media_ref),
        channels=1, quality=100,
    )


def synth_jpeg_media(documents: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """One REAL baseline-JPEG image per document (ref ``jmg-<doc_id>``),
    encoded in Arrow-batched mapInPandas by the numpy codec — the JPEG twin
    of the PNG synth path, feeding the driver-checked ``media_features_jpeg``
    row."""
    refs = documents.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.concat(F.lit("jmg-"), F.col(id_col).cast("string")).alias("media_ref"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "kind": "image",
                    "blob": [_synth_jpeg_blob(r) for r in pdf["media_ref"]],
                    "meta": [
                        {"mime": "image/jpeg", "width": SYNTH_JPEG_SIDE,
                         "height": SYNTH_JPEG_SIDE, "duration_ms": None}
                        for _ in pdf["media_ref"]
                    ],
                }
            )

    return refs.mapInPandas(run, MEDIA)


#: GIF synth geometry: 16x16 grayscale (md5-chain bytes, identity palette).
SYNTH_GIF_SIDE = 16
_SYNTH_GIF_CHUNKS = SYNTH_GIF_SIDE * SYNTH_GIF_SIDE // 16


def synth_gif_pixels(media_ref: str) -> bytes:
    """Deterministic 16x16 grayscale bytes: md5 chain ``md5(ref + ':g' + i)``
    — the same sequence the DuckDB oracle derives from md5() hex in SQL."""
    return b"".join(
        hashlib.md5(f"{media_ref}:g{i}".encode()).digest()
        for i in range(_SYNTH_GIF_CHUNKS)
    )


def _synth_gif_blob(media_ref: str) -> bytes:
    return gif.encode_gif(SYNTH_GIF_SIDE, SYNTH_GIF_SIDE, synth_gif_pixels(media_ref))


def synth_gif_media(documents: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """One REAL GIF87a image per document (ref ``gmg-<doc_id>``), encoded in
    Arrow-batched mapInPandas by the LZW codec — the GIF twin of the PNG
    synth path, feeding the driver-checked ``media_features_gif`` row."""
    refs = documents.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.concat(F.lit("gmg-"), F.col(id_col).cast("string")).alias("media_ref"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "kind": "image",
                    "blob": [_synth_gif_blob(r) for r in pdf["media_ref"]],
                    "meta": [
                        {"mime": "image/gif", "width": SYNTH_GIF_SIDE,
                         "height": SYNTH_GIF_SIDE, "duration_ms": None}
                        for _ in pdf["media_ref"]
                    ],
                }
            )

    return refs.mapInPandas(run, MEDIA)


# ---------------------------------------------------- container-level meta
#
# mp3/mp4 close the container-parsing half of the "no ffmpeg" gap: the
# codec payload stays opaque (documented boundary), but duration/bitrate/
# resolution/frame-index — everything a crawl or curation pipeline reads
# WITHOUT decoding — is parsed for real by functions/mp3.py / mp4.py, and
# every synth parameter is an md5-derived value the DuckDB twin re-derives
# in SQL, so the driver rows verify the actual frame walk / box arithmetic.

MP3_META = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("media_ref", StringType()),
        StructField("n_frames", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("bitrate_sum", LongType()),
        StructField("bitrate_min", IntegerType()),
        StructField("bitrate_max", IntegerType()),
        StructField("is_cbr", BooleanType()),
    ]
)

MP4_META = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("media_ref", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("total_sample_bytes", LongType()),
        StructField("handler", StringType()),
    ]
)

MP4_SAMPLES = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("media_ref", StringType()),
        StructField("k", IntegerType()),
        StructField("offset", LongType()),
        StructField("size", IntegerType()),
        StructField("t_ms", LongType()),
    ]
)


def synth_mp3_frames(media_ref: str) -> list[tuple[int, int]]:
    """(bitrate_idx, padding) per frame: n = 8 + b0%8 frames (b = bytes of
    ``md5(ref + ':m0')``), frame k keyed by byte k of ``md5(ref + ':mf')``:
    bitrate index 1 + byte%14 (a true VBR profile), padding (byte//16)%2 —
    padding changes only the frame SIZE, so a walk-arithmetic bug
    desynchronizes the scan and corrupts every reported stat."""
    b0 = hashlib.md5(f"{media_ref}:m0".encode()).digest()
    fb = hashlib.md5(f"{media_ref}:mf".encode()).digest()
    n = 8 + b0[0] % 8
    return [(1 + fb[k] % 14, (fb[k] // 16) % 2) for k in range(n)]


def _synth_mp3_blob(media_ref: str) -> bytes:
    b0 = hashlib.md5(f"{media_ref}:m0".encode()).digest()
    mode = 3 if b0[1] % 4 == 3 else 0  # mono / stereo
    return mp3.build_mp3(
        synth_mp3_frames(media_ref), sr_idx=0, mode=mode,
        id3_payload=f"TIT2 {media_ref}".encode(),
    )


def synth_mp3_media(documents: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """One structurally-real VBR MP3 per document (ref ``mp3-<doc_id>``,
    ID3v2-tagged), feeding the driver-checked ``media_meta_mp3`` row."""
    refs = documents.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.concat(F.lit("mp3-"), F.col(id_col).cast("string")).alias("media_ref"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "kind": "audio",
                    "blob": [_synth_mp3_blob(r) for r in pdf["media_ref"]],
                    "meta": [
                        {"mime": "audio/mpeg", "width": None, "height": None,
                         "duration_ms": None}
                        for _ in pdf["media_ref"]
                    ],
                }
            )

    return refs.mapInPandas(run, MEDIA)


def extract_mp3_meta(media: DataFrame) -> DataFrame:
    """audio blobs -> REAL MPEG-1 Layer III frame-walk statistics via
    mapInPandas (functions/mp3.py): duration, VBR bitrate profile, channel
    layout — the codec-free metadata pass; PCM decode stays a documented
    ffmpeg boundary."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "n_frames", "sample_rate", "n_channels", "duration_ms",
                "bitrate_sum", "bitrate_min", "bitrate_max", "is_cbr",
            )}
            for blob in pdf["blob"]:
                info = mp3.parse_mp3(bytes(blob))
                rows["n_frames"].append(info["n_frames"])
                rows["sample_rate"].append(info["sample_rate"])
                rows["n_channels"].append(info["channels"])
                rows["duration_ms"].append(info["duration_ms"])
                rows["bitrate_sum"].append(info["bitrate_sum"])
                rows["bitrate_min"].append(info["bitrate_min"])
                rows["bitrate_max"].append(info["bitrate_max"])
                rows["is_cbr"].append(info["is_cbr"])
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "media_ref": pdf["media_ref"], **rows}
            )

    auds = media.filter(F.col("kind") == "audio").select("doc_id", "media_ref", "blob")
    return auds.mapInPandas(run, MP3_META)


#: mp4 synth geometry/timing (constant so the oracle derives offsets:
#: ftyp is 24 bytes -> the single chunk starts at byte 32 of the file)
MP4_SAMPLE_DELTA_MS = 40
MP4_CHUNK_OFFSET = 32


def synth_mp4_params(media_ref: str) -> tuple[int, int, int, list[int]]:
    """(width, height, n_samples, sample_sizes): dims/count from bytes of
    ``md5(ref + ':v0')``, per-sample sizes 20 + byte k of
    ``md5(ref + ':vs')`` (n <= 12 so one md5 suffices)."""
    b0 = hashlib.md5(f"{media_ref}:v0".encode()).digest()
    sb = hashlib.md5(f"{media_ref}:vs".encode()).digest()
    n = 6 + b0[0] % 6
    width = 160 + 16 * (b0[1] % 8)
    height = 120 + 16 * (b0[2] % 6)
    return width, height, n, [20 + sb[k] for k in range(n)]


def _synth_mp4_blob(media_ref: str) -> bytes:
    w, h, n, sizes = synth_mp4_params(media_ref)
    samples = [bytes([k % 251] * s) for k, s in enumerate(sizes)]
    return mp4.build_mp4(w, h, samples, timescale=1000,
                         sample_delta=MP4_SAMPLE_DELTA_MS)


def synth_mp4_media(documents: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """One structurally-real single-track MP4 per document (ref
    ``mp4-<doc_id>``), feeding the driver-checked ``media_meta_mp4`` and
    ``mp4_sample_index`` rows."""
    refs = documents.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.concat(F.lit("mp4-"), F.col(id_col).cast("string")).alias("media_ref"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "kind": "video",
                    "blob": [_synth_mp4_blob(r) for r in pdf["media_ref"]],
                    "meta": [
                        {"mime": "video/mp4", "width": None, "height": None,
                         "duration_ms": None}
                        for _ in pdf["media_ref"]
                    ],
                }
            )

    return refs.mapInPandas(run, MEDIA)


def extract_mp4_meta(media: DataFrame) -> DataFrame:
    """video blobs -> REAL ISO-BMFF box-walk metadata via mapInPandas
    (functions/mp4.py): resolution from tkhd, duration from mvhd, sample
    count/bytes from the stbl chain — codec-free; payload decode stays a
    documented ffmpeg boundary."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "width", "height", "n_samples", "duration_ms",
                "total_sample_bytes", "handler",
            )}
            for blob in pdf["blob"]:
                info = mp4.parse_mp4(bytes(blob))
                for k in rows:
                    rows[k].append(info[k])
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "media_ref": pdf["media_ref"], **rows}
            )

    vids = media.filter(F.col("kind") == "video").select("doc_id", "media_ref", "blob")
    return vids.mapInPandas(run, MP4_META)


def mp4_sample_index(media: DataFrame) -> DataFrame:
    """video blobs -> one row per frame (k, byte offset, size, timestamp)
    from the stts/stsc/stsz/stco chunk arithmetic — the codec-free frame
    index that becomes one ranged GET per frame against an object store at
    scale (functions/mp4.py read_sample)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("doc_id", "media_ref", "k", "offset", "size", "t_ms")}
            for doc_id, ref, blob in zip(
                pdf["doc_id"], pdf["media_ref"], pdf["blob"]
            ):
                info = mp4.parse_mp4(bytes(blob))
                for k, (off, size, t_ms) in enumerate(info["sample_ranges"]):
                    out["doc_id"].append(doc_id)
                    out["media_ref"].append(ref)
                    out["k"].append(k)
                    out["offset"].append(off)
                    out["size"].append(size)
                    out["t_ms"].append(t_ms)
            yield pd.DataFrame(out)

    vids = media.filter(F.col("kind") == "video").select("doc_id", "media_ref", "blob")
    return vids.mapInPandas(run, MP4_SAMPLES)


WEBP_META = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("media_ref", StringType()),
        StructField("variant", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("has_alpha", BooleanType()),
        StructField("is_animated", BooleanType()),
        StructField("n_frames", IntegerType()),
    ]
)


def synth_webp_params(media_ref: str) -> tuple[str, int, int, bool, int]:
    """(variant, width, height, alpha, n_frames) from bytes of
    ``md5(ref + ':w0')`` — the values the DuckDB twin re-derives in SQL."""
    b = hashlib.md5(f"{media_ref}:w0".encode()).digest()
    variant = ("vp8", "vp8l", "vp8x")[b[0] % 3]
    width = 100 + b[1]
    height = 80 + b[2]
    alpha = b[3] % 2 == 1 and variant != "vp8"
    n_frames = b[4] % 4 if variant == "vp8x" else 0
    return variant, width, height, alpha, n_frames


def _synth_webp_blob(media_ref: str) -> bytes:
    variant, w, h, alpha, n = synth_webp_params(media_ref)
    return webp.build_webp(w, h, variant, alpha=alpha, n_frames=n)


def synth_webp_media(documents: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """One structurally-real WebP per document (ref ``wbp-<doc_id>``,
    cycling lossy/lossless/extended+animation variants), feeding the
    driver-checked ``media_meta_webp`` row."""
    refs = documents.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.concat(F.lit("wbp-"), F.col(id_col).cast("string")).alias("media_ref"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "kind": "image",
                    "blob": [_synth_webp_blob(r) for r in pdf["media_ref"]],
                    "meta": [
                        {"mime": "image/webp", "width": None, "height": None,
                         "duration_ms": None}
                        for _ in pdf["media_ref"]
                    ],
                }
            )

    return refs.mapInPandas(run, MEDIA)


def extract_webp_meta(media: DataFrame) -> DataFrame:
    """image blobs -> REAL WebP container/header metadata via mapInPandas
    (functions/webp.py): RIFF walk + VP8 keyframe / VP8L / VP8X bit
    unpacking — format variant, dimensions, alpha, animation frame count;
    pixel decode stays the documented libwebp boundary."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "variant", "width", "height", "has_alpha", "is_animated",
                "n_frames",
            )}
            for blob in pdf["blob"]:
                info = webp.parse_webp(bytes(blob))
                for k in rows:
                    rows[k].append(info[k])
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "media_ref": pdf["media_ref"], **rows}
            )

    imgs = media.filter(F.col("kind") == "image").select("doc_id", "media_ref", "blob")
    return imgs.mapInPandas(run, WEBP_META)


GIF_FRAMES = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("media_ref", StringType()),
        StructField("frame", IntegerType()),
        StructField("delay_cs", IntegerType()),
        StructField("mean_luma", DoubleType()),
    ]
)


def synth_gif_anim_frames(media_ref: str) -> int:
    """Frame count for an animated-GIF ref: 2 + b0%3 (bytes of
    ``md5(ref + ':ga')``)."""
    return 2 + hashlib.md5(f"{media_ref}:ga".encode()).digest()[0] % 3


def synth_gif_frame_pixels(media_ref: str, frame: int) -> bytes:
    """Frame ``frame``'s 16x16 grayscale bytes: md5 chain
    ``md5(ref + ':f<frame>:' + i)`` — SQL-derivable per (doc, frame)."""
    return b"".join(
        hashlib.md5(f"{media_ref}:f{frame}:{i}".encode()).digest()
        for i in range(_SYNTH_GIF_CHUNKS)
    )


def _synth_gif_anim_blob(media_ref: str) -> bytes:
    n = synth_gif_anim_frames(media_ref)
    frames = [synth_gif_frame_pixels(media_ref, k) for k in range(n)]
    return gif.encode_gif_anim(SYNTH_GIF_SIDE, SYNTH_GIF_SIDE, frames, delay_cs=4)


def synth_gif_anim_media(documents: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """One REAL animated GIF89a per document (ref ``gfa-<doc_id>``, 2-4
    frames with graphic-control delays), feeding the driver-checked
    ``gif_frames`` row — the animation twin of the y4m video path."""
    refs = documents.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.concat(F.lit("gfa-"), F.col(id_col).cast("string")).alias("media_ref"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "kind": "image",
                    "blob": [_synth_gif_anim_blob(r) for r in pdf["media_ref"]],
                    "meta": [
                        {"mime": "image/gif", "width": SYNTH_GIF_SIDE,
                         "height": SYNTH_GIF_SIDE, "duration_ms": None}
                        for _ in pdf["media_ref"]
                    ],
                }
            )

    return refs.mapInPandas(run, MEDIA)


def extract_gif_frames(media: DataFrame) -> DataFrame:
    """animated-GIF blobs -> one row per composited frame (index, delay,
    exact mean luma) via mapInPandas, REAL decode (functions/gif.py
    decode_gif_frames): an LZW, graphic-control or canvas-composition bug
    changes the per-frame luma and fails the driver hash match."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {k: [] for k in
                   ("doc_id", "media_ref", "frame", "delay_cs", "mean_luma")}
            for doc_id, ref, blob in zip(
                pdf["doc_id"], pdf["media_ref"], pdf["blob"]
            ):
                dec = gif.decode_gif_frames(bytes(blob))
                n_pix = dec["width"] * dec["height"]
                for k, (fr, d) in enumerate(zip(dec["frames"], dec["delays_cs"])):
                    # luma only (the 16-bin histogram _pixel_stats also
                    # computes is unused here): exact integer BT.601 sum,
                    # one float division — same arithmetic as the oracle
                    pix = np.frombuffer(fr, dtype=np.uint8).reshape(-1, 3)
                    luma = int(
                        sum(
                            _LUMA_MILLI[c]
                            * int(pix[:, c].sum(dtype=np.int64))
                            for c in range(3)
                        )
                    ) / (255 * 1000 * n_pix)
                    out["doc_id"].append(doc_id)
                    out["media_ref"].append(ref)
                    out["frame"].append(k)
                    out["delay_cs"].append(d)
                    out["mean_luma"].append(luma)
            yield pd.DataFrame(out)

    imgs = media.filter(F.col("kind") == "image").select("doc_id", "media_ref", "blob")
    return imgs.mapInPandas(run, GIF_FRAMES)


#: media span kinds media_from_documents materializes by default
MEDIA_KINDS = ("image", "audio", "video")


def media_from_documents(documents: DataFrame,
                         kinds: tuple = MEDIA_KINDS) -> DataFrame:
    """Derive a media table from interleaved documents: one row per media
    span (image/audio/video), each with a real deterministically-synthesized
    blob in the span's native codec (PNG / RIFF WAV / YUV4MPEG2) so every
    downstream extractor runs a true decode. The span filter runs JVM-side
    (higher-order `filter` + explode) before any blob exists — blobs are
    born in the final mapInPandas and never cross a shuffle."""
    refs = documents.select(
        "doc_id",
        F.explode(
            F.filter(F.col("spans"), lambda s: s["kind"].isin(list(kinds)))
        ).alias("s"),
    ).select(
        "doc_id",
        F.col("s.kind").alias("kind"),
        F.col("s.media_ref").alias("media_ref"),
    )
    return _attach_media_blobs(refs)


def _attach_media_blobs(refs: DataFrame) -> DataFrame:
    """(doc_id, kind, media_ref) -> full media rows, blob encoded per kind
    in one Arrow-batched mapInPandas (stdlib codecs)."""

    def _one(kind: str, ref: str):
        if kind == "audio":
            return (
                wav.encode_wav(SYNTH_RATE, 1, 16, synth_wav_payload(ref)),
                {"mime": "audio/wav", "width": None, "height": None,
                 "duration_ms": SYNTH_SAMPLES * 1000 // SYNTH_RATE},
            )
        if kind == "video":
            # frame count varies deterministically per ref (4..6)
            n = 4 + hashlib.md5(ref.encode()).digest()[0] % 3
            num, den = SYNTH_FPS
            return (
                y4m.encode_y4m(SYNTH_W, SYNTH_H, SYNTH_FPS,
                               synth_y4m_frames(ref, n)),
                {"mime": "video/x-yuv4mpeg", "width": SYNTH_W,
                 "height": SYNTH_H, "duration_ms": n * 1000 * den // num},
            )
        return (
            _synth_png_blob(ref),
            {"mime": "image/png", "width": SYNTH_W, "height": SYNTH_H,
             "duration_ms": None},
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs, metas = [], []
            for k, r in zip(pdf["kind"], pdf["media_ref"]):
                b, m = _one(k, r)
                blobs.append(b)
                metas.append(m)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "kind": pdf["kind"],
                    "blob": blobs,
                    "meta": metas,
                }
            )

    return refs.mapInPandas(run, MEDIA)


#: synthetic WAV geometry: mono 16-bit @8 kHz, 128 samples = 256 bytes = 16 md5 chunks
SYNTH_RATE, SYNTH_SAMPLES = 8000, 128
_SYNTH_WAV_CHUNKS = SYNTH_SAMPLES * 2 // 16
#: synthetic y4m geometry: 8x8 mono @4 fps; frame = 64 bytes = 4 md5 chunks
SYNTH_FPS = (4, 1)
_SYNTH_FRAME_CHUNKS = SYNTH_W * SYNTH_H // 16


def synth_wav_payload(media_ref: str) -> bytes:
    """Deterministic PCM payload for a media_ref: md5 chain ``md5(ref:i)``
    — the same byte sequence the DuckDB oracle twin derives from md5() hex,
    so the driver-checked ``audio_features`` stats verify the RIFF
    encode->decode round trip end-to-end (a chunk-walk or int16 bug changes
    the decoded samples => hash mismatch)."""
    return b"".join(
        hashlib.md5(f"{media_ref}:{i}".encode()).digest()
        for i in range(_SYNTH_WAV_CHUNKS)
    )


def synth_y4m_frames(media_ref: str, n_frames: int) -> list[bytes]:
    """Deterministic Y planes: frame f = md5 chain ``md5(ref:f:i)`` (same
    derivation in the ``video_frames`` DuckDB twin)."""
    return [
        b"".join(
            hashlib.md5(f"{media_ref}:{f}:{i}".encode()).digest()
            for i in range(_SYNTH_FRAME_CHUNKS)
        )
        for f in range(n_frames)
    ]


def synth_audio(documents: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Derive an audio media table from a flat documents table: one mono
    16-bit WAV per document, ``media_ref = 'wav-'||doc_id``, blob a REAL
    RIFF/WAVE encode (with the planted LIST chunk) of the deterministic
    payload. The driver-checked ``audio_features`` input."""
    auds = documents.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.concat(F.lit("wav-"), F.col(id_col).cast("string")).alias("media_ref"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dur = SYNTH_SAMPLES * 1000 // SYNTH_RATE
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "kind": "audio",
                    "blob": [
                        wav.encode_wav(SYNTH_RATE, 1, 16, synth_wav_payload(r))
                        for r in pdf["media_ref"]
                    ],
                    "meta": [
                        {"mime": "audio/wav", "width": None, "height": None,
                         "duration_ms": dur}
                        for _ in pdf["media_ref"]
                    ],
                }
            )

    return auds.mapInPandas(run, MEDIA)


def synth_video(documents: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Derive a video media table from a flat documents table: one 8x8 mono
    y4m per document with ``4 + doc_id % 3`` frames (so sampled-frame counts
    vary across rows), ``media_ref = 'y4m-'||doc_id``. The driver-checked
    ``video_frames`` input."""
    vids = documents.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.concat(F.lit("y4m-"), F.col(id_col).cast("string")).alias("media_ref"),
        (F.lit(4) + F.col(id_col).cast("long") % 3).cast("int").alias("n_frames"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        num, den = SYNTH_FPS
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "kind": "video",
                    "blob": [
                        y4m.encode_y4m(
                            SYNTH_W, SYNTH_H, SYNTH_FPS, synth_y4m_frames(r, int(n))
                        )
                        for r, n in zip(pdf["media_ref"], pdf["n_frames"])
                    ],
                    "meta": [
                        {"mime": "video/x-yuv4mpeg", "width": SYNTH_W,
                         "height": SYNTH_H,
                         "duration_ms": int(n) * 1000 * den // num}
                        for n in pdf["n_frames"]
                    ],
                }
            )

    return vids.mapInPandas(run, MEDIA)


def synth_media(documents: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Derive a media table from a FLAT documents table (the testdata shape:
    no spans column): one image per document, ``media_ref = 'img-'||doc_id``,
    blob = the deterministic synthetic PNG. The driver-checked
    ``media_features`` input."""
    imgs = documents.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.concat(F.lit("img-"), F.col(id_col).cast("string")).alias("media_ref"),
    )
    return _attach_png_blobs(imgs)


# ---------------------------------------------------------------------------
# Image perceptual-hash near-dup (dHash + pigeonhole banding)
# ---------------------------------------------------------------------------

#: docs per planted near-dup group in synth_image_groups: doc_id // PHASH_GROUP
#: share a base image, doc_id % PHASH_GROUP picks the variant perturbation
PHASH_GROUP = 4
#: dHash geometry: 8x8 grayscale -> 8 rows x 7 horizontal comparisons
DHASH_BITS = (SYNTH_H) * (SYNTH_W - 1)          # 56
_DHASH_SPLIT = DHASH_BITS // 2                   # hi = bits 0..27, lo = 28..55
_DHASH_BAND_BITS = _DHASH_SPLIT // 2             # 4 bands x 14 bits
_DHASH_BAND_MASK = (1 << _DHASH_BAND_BITS) - 1
#: hot-bucket cap for dhash_neardup (mirrored in the DuckDB oracle twin) —
#: same role as similarity.MAX_BUCKET_NEARDUP: with 2^14 keys per band a
#: degenerate corpus (all-flat images hash to 0) would turn one bucket into
#: a B^2/2 self-join; buckets keep their max_bucket lowest-id members
MAX_BUCKET_DHASH = 256
_SYNTH_GRAY_CHUNKS = SYNTH_W * SYNTH_H // 16     # 64 gray bytes = 4 md5 chunks


def synth_gray_pixels(grp_ref: str, variant: int) -> bytes:
    """Deterministic 8x8 grayscale pixels for a planted near-dup group:
    base bytes = the md5 chain ``md5(grp_ref + ':' + i)`` (the same
    derivation the DuckDB oracle twin does in SQL), then variant ``v``
    forces the first pixel of each of rows 0..v-1 to 255. Forcing only ROW
    STARTS bounds the planted dHash distance: pixel ``8*j`` participates in
    exactly one horizontal comparison (bit ``j*7``), so any two variants of
    one group differ in at most PHASH_GROUP-1 = 3 hash bits — which the
    4-band pigeonhole then GUARANTEES to surface as a candidate pair."""
    base = bytearray(
        b"".join(
            hashlib.md5(f"{grp_ref}:{i}".encode()).digest()
            for i in range(_SYNTH_GRAY_CHUNKS)
        )
    )
    for j in range(variant):
        base[SYNTH_W * j] = 255
    return bytes(base)


def synth_image_groups(documents: DataFrame, id_col: str = "doc_id",
                       group: int = PHASH_GROUP) -> DataFrame:
    """Derive an image media table with PLANTED near-duplicate structure:
    docs sharing ``doc_id // group`` get the same base 8x8 grayscale image,
    perturbed per variant (see synth_gray_pixels), encoded as REAL grayscale
    PNGs (color_type 0, cycling row filters). The driver-checked
    ``image_neardup`` input: near-dup discovery runs against blobs a true
    decoder must first unfilter."""
    imgs = documents.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.concat(F.lit("img-"), F.col(id_col).cast("string")).alias("media_ref"),
        F.concat(
            F.lit("grp-"),
            F.expr(f"cast(cast({id_col} as bigint) div {int(group)} as string)"),
        ).alias("grp_ref"),
        (F.col(id_col).cast("long") % group).cast("int").alias("variant"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "kind": "image",
                    "blob": [
                        png.encode_png(SYNTH_W, SYNTH_H,
                                       synth_gray_pixels(g, int(v)), color_type=0)
                        for g, v in zip(pdf["grp_ref"], pdf["variant"])
                    ],
                    "meta": [
                        {"mime": "image/png", "width": SYNTH_W, "height": SYNTH_H,
                         "duration_ms": None}
                        for _ in pdf["media_ref"]
                    ],
                }
            )

    return imgs.mapInPandas(run, MEDIA)


DHASH = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("media_ref", StringType()),
        StructField("dhash_hi", LongType()),     # dHash bits 0..27
        StructField("dhash_lo", LongType()),     # dHash bits 28..55
    ]
)


def dhash_py(pixels: bytes, channels: int = 1) -> tuple[int, int]:
    """56-bit difference hash of an 8x8 image: bit ``r*7+c`` set iff the
    integer luma of pixel (r,c) exceeds its right neighbor (grayscale: the
    byte itself; RGB(A): the exact BT.601 milli-luma sum — compared without
    dividing, so the oracle twin is bit-identical). dHash is LOCAL (each bit
    depends on two adjacent pixels only), so a k-pixel edit moves the hash
    by <= 2k bits — unlike average-hash, whose global mean couples every
    bit. Returns (hi, lo) 28-bit halves (BIGINT-safe on both engines)."""
    ch = channels
    if ch == 1:
        g = list(pixels)
    else:
        rgb = min(ch, 3)
        g = [
            sum(_LUMA_MILLI[c] * pixels[i + c] for c in range(rgb))
            for i in range(0, len(pixels), ch)
        ]
    hi = lo = 0
    for r in range(SYNTH_H):
        for c in range(SYNTH_W - 1):
            if g[SYNTH_W * r + c] > g[SYNTH_W * r + c + 1]:
                b = r * (SYNTH_W - 1) + c
                if b < _DHASH_SPLIT:
                    hi |= 1 << b
                else:
                    lo |= 1 << (b - _DHASH_SPLIT)
    return hi, lo


def image_dhash(media: DataFrame, decoder: str = "png") -> DataFrame:
    """image blobs -> 56-bit perceptual dHash via mapInPandas (Arrow
    batches), REAL decode (functions/png.py): a wrong unfilter changes
    pixels => changes the hash => fails the driver hash match. Output:
    (doc_id, media_ref, dhash_hi, dhash_lo)."""
    if decoder != "png":
        raise NotImplementedError(
            "non-PNG decoders unavailable in this container; production: "
            "PIL open -> convert('L') -> resize((9,8)) -> dHash inside this "
            "same mapInPandas body"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            his, los = [], []
            for blob in pdf["blob"]:
                w, h, ch, px = png.decode_png(bytes(blob) if blob is not None else b"")
                if (w, h) != (SYNTH_W, SYNTH_H):
                    raise ValueError(f"dhash expects {SYNTH_W}x{SYNTH_H}, got {w}x{h}")
                hi, lo = dhash_py(px, ch)
                his.append(hi)
                los.append(lo)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "dhash_hi": pd.array(his, dtype="Int64"),
                    "dhash_lo": pd.array(los, dtype="Int64"),
                }
            )

    imgs = media.filter(F.col("kind") == "image").select("doc_id", "media_ref", "blob")
    return imgs.mapInPandas(run, DHASH)


def dhash_neardup(hashes: DataFrame, max_dist: int = 3,
                  id_col: str = "doc_id",
                  max_bucket: int | None = MAX_BUCKET_DHASH) -> DataFrame:
    """Image near-duplicate pairs from dHashes via pigeonhole banding —
    pure Column algebra after the hash (no Python boundary).

    The 56-bit hash splits into four 14-bit bands; any pair within Hamming
    distance 3 agrees EXACTLY on at least one band (pigeonhole), so
    candidate generation is a per-band equi-join — each image meets only
    its band-bucket cohort, never the full corpus. Candidates then pay the
    exact distance: bit_count(xor) on both halves, keep <= ``max_dist``.
    ``max_bucket`` caps degenerate buckets exactly like
    similarity.neardup_pairs (lowest-id members win; mirrored in the oracle
    twin). At 100 TB this is the scale shape for visual dedup: one narrow
    (id, hi, lo) projection, a 4x explode, one groupBy-equi-join shuffle —
    blobs stay behind in the decode stage.

    Output: (a, b, dist) with a < b (ids compared as-is: cast numeric ids
    BEFORE calling when lexicographic != numeric order).
    """
    from pyspark.sql import Window

    slim = hashes.select(F.col(id_col), "dhash_hi", "dhash_lo")
    bands = None
    for i in range(4):
        half = F.col("dhash_hi") if i < 2 else F.col("dhash_lo")
        key = F.shiftrightunsigned(half, (i % 2) * _DHASH_BAND_BITS).bitwiseAND(
            F.lit(_DHASH_BAND_MASK)
        )
        part = slim.select(
            F.col(id_col), "dhash_hi", "dhash_lo",
            F.lit(i).alias("band"), key.alias("key"),
        )
        bands = part if bands is None else bands.unionByName(part)
    if max_bucket is not None:
        w = Window.partitionBy("band", "key").orderBy(F.asc(id_col))
        bands = (
            bands.withColumn("__bn", F.row_number().over(w))
            .filter(F.col("__bn") <= max_bucket)
            .drop("__bn")
        )
    left = bands.select(
        F.col(id_col).alias("a"), F.col("dhash_hi").alias("ha"),
        F.col("dhash_lo").alias("la"), "band", "key",
    )
    right = bands.select(
        F.col(id_col).alias("b"), F.col("dhash_hi").alias("hb"),
        F.col("dhash_lo").alias("lb"), "band", "key",
    )
    dist = (
        F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
        + F.bit_count(F.col("la").bitwiseXOR(F.col("lb")))
    ).cast("int")
    return (
        left.join(right, ["band", "key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", dist.alias("dist"))
        .filter(F.col("dist") <= max_dist)
        .distinct()
    )


# ---------------------------------------------------------------------------
# Audio fingerprint near-dup (energy-difference fingerprint + banding)
# ---------------------------------------------------------------------------

#: docs per planted near-dup group in synth_audio_groups (same convention as
#: PHASH_GROUP: doc_id // AFP_GROUP shares a base payload, % picks variant)
AFP_GROUP = 4
#: fingerprint geometry: 128 samples -> 64 two-sample energy windows ->
#: 32 disjoint window-pair comparisons (Haitsma & Kalker 2002 use 32-bit
#: sub-fingerprints of band-energy differences; this is the time-domain
#: analogue at our synthetic 128-sample clip length)
AFP_BITS = SYNTH_SAMPLES // 4                    # 32
_AFP_BAND_BITS = AFP_BITS // 4                   # 4 bands x 8 bits
_AFP_BAND_MASK = (1 << _AFP_BAND_BITS) - 1
#: hot-bucket cap (mirrored in the DuckDB twin) — 2^8 keys per band is far
#: coarser than dHash's 2^14, so degenerate corpora (silence hashes to 0)
#: hit the cap sooner; same lowest-id-members-win semantics
MAX_BUCKET_AFP = 256


def synth_group_payload(grp_ref: str, variant: int) -> bytes:
    """Deterministic PCM payload for a planted audio near-dup group: base
    bytes = the md5 chain ``md5(grp_ref + ':' + i)`` (the derivation the
    DuckDB twin replays from md5() hex), then variant ``v`` forces samples
    4j for j in 0..v-1 to +32767 (bytes ``FF 7F`` little-endian). Sample 4j
    lies in energy window 2j, and window 2j feeds exactly ONE fingerprint
    bit (bit j compares windows 2j vs 2j+1 — DISJOINT pairs, unlike dHash's
    overlapping neighbours), so any two variants of one group differ in at
    most AFP_GROUP-1 = 3 fingerprint bits — which the 4-band pigeonhole
    GUARANTEES to surface as a candidate pair."""
    base = bytearray(
        b"".join(
            hashlib.md5(f"{grp_ref}:{i}".encode()).digest()
            for i in range(_SYNTH_WAV_CHUNKS)
        )
    )
    for j in range(variant):
        base[8 * j : 8 * j + 2] = b"\xff\x7f"
    return bytes(base)


def synth_audio_groups(documents: DataFrame, id_col: str = "doc_id",
                       group: int = AFP_GROUP) -> DataFrame:
    """Derive an audio media table with PLANTED near-duplicate structure:
    docs sharing ``doc_id // group`` get the same base 128-sample mono
    16-bit clip, perturbed per variant (synth_group_payload), encoded as
    REAL RIFF/WAVE (with the planted LIST chunk the decoder must skip). The
    driver-checked ``audio_neardup`` input."""
    auds = documents.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.concat(F.lit("wav-"), F.col(id_col).cast("string")).alias("media_ref"),
        F.concat(
            F.lit("agrp-"),
            F.expr(f"cast(cast({id_col} as bigint) div {int(group)} as string)"),
        ).alias("grp_ref"),
        (F.col(id_col).cast("long") % group).cast("int").alias("variant"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dur = SYNTH_SAMPLES * 1000 // SYNTH_RATE
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "kind": "audio",
                    "blob": [
                        wav.encode_wav(SYNTH_RATE, 1, 16,
                                       synth_group_payload(g, int(v)))
                        for g, v in zip(pdf["grp_ref"], pdf["variant"])
                    ],
                    "meta": [
                        {"mime": "audio/wav", "width": None, "height": None,
                         "duration_ms": dur}
                        for _ in pdf["media_ref"]
                    ],
                }
            )

    return auds.mapInPandas(run, MEDIA)


AFP = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("media_ref", StringType()),
        StructField("afp", LongType()),          # 32-bit fingerprint
    ]
)


def afp_py(samples: list[int]) -> int:
    """32-bit energy-difference fingerprint of a 128-sample mono clip:
    window w's integer energy E_w = |s_{2w}| + |s_{2w+1}| (exact — no
    floats, so the SQL twin is bit-identical); bit b set iff
    E_{2b} > E_{2b+1}. Window pairs are DISJOINT, so a k-sample edit moves
    the fingerprint by <= k bits — the locality that makes the planted-group
    distance bound provable."""
    if len(samples) != SYNTH_SAMPLES:
        raise ValueError(f"afp expects {SYNTH_SAMPLES} samples, got {len(samples)}")
    e = [
        abs(samples[2 * w]) + abs(samples[2 * w + 1])
        for w in range(SYNTH_SAMPLES // 2)
    ]
    fp = 0
    for b in range(AFP_BITS):
        if e[2 * b] > e[2 * b + 1]:
            fp |= 1 << b
    return fp


def audio_fingerprint(media: DataFrame, decoder: str = "wav") -> DataFrame:
    """audio blobs -> 32-bit fingerprint via mapInPandas (Arrow batches),
    REAL decode (functions/wav.py): a chunk-walk or int16 sign bug changes
    the samples => changes the fingerprint => fails the driver hash match.
    Output: (doc_id, media_ref, afp)."""
    if decoder != "wav":
        raise NotImplementedError(
            "non-WAV decoders unavailable in this container; production: "
            "soundfile/ffmpeg decode -> resample -> band energies inside "
            "this same mapInPandas body"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fps = []
            for blob in pdf["blob"]:
                _rate, _ch, _bits, samples = wav.decode_wav(
                    bytes(blob) if blob is not None else b""
                )
                fps.append(afp_py(samples))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "afp": pd.array(fps, dtype="Int64"),
                }
            )

    auds = media.filter(F.col("kind") == "audio").select("doc_id", "media_ref", "blob")
    return auds.mapInPandas(run, AFP)


def afp_neardup(fps: DataFrame, max_dist: int = 3,
                id_col: str = "doc_id",
                max_bucket: int | None = MAX_BUCKET_AFP) -> DataFrame:
    """Audio near-duplicate pairs from fingerprints via pigeonhole banding —
    pure Column algebra after the fingerprint (no Python boundary).

    The 32-bit fingerprint splits into four 8-bit bands; any pair within
    Hamming distance 3 agrees EXACTLY on at least one band (pigeonhole), so
    candidate generation is a per-band equi-join. Candidates pay the exact
    distance (bit_count(xor)), keep <= ``max_dist``. ``max_bucket`` caps
    degenerate buckets (lowest-id members win; mirrored in the oracle twin).
    Same 100 TB shape as dhash_neardup: one narrow (id, fp) projection, a
    4x explode, one groupBy-equi-join shuffle — blobs stay in decode.

    Output: (a, b, dist) with a < b (cast numeric ids BEFORE calling when
    lexicographic != numeric order).
    """
    from pyspark.sql import Window

    slim = fps.select(F.col(id_col), "afp")
    bands = None
    for i in range(4):
        key = F.shiftrightunsigned(F.col("afp"), i * _AFP_BAND_BITS).bitwiseAND(
            F.lit(_AFP_BAND_MASK)
        )
        part = slim.select(
            F.col(id_col), "afp", F.lit(i).alias("band"), key.alias("key")
        )
        bands = part if bands is None else bands.unionByName(part)
    if max_bucket is not None:
        w = Window.partitionBy("band", "key").orderBy(F.asc(id_col))
        bands = (
            bands.withColumn("__bn", F.row_number().over(w))
            .filter(F.col("__bn") <= max_bucket)
            .drop("__bn")
        )
    left = bands.select(F.col(id_col).alias("a"), F.col("afp").alias("fa"),
                        "band", "key")
    right = bands.select(F.col(id_col).alias("b"), F.col("afp").alias("fb"),
                         "band", "key")
    dist = F.bit_count(F.col("fa").bitwiseXOR(F.col("fb"))).cast("int")
    return (
        left.join(right, ["band", "key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", dist.alias("dist"))
        .filter(F.col("dist") <= max_dist)
        .distinct()
    )


# ---------------------------------------------------------------------------
# Video near-dup (per-frame dHash clip signature + cross-frame banding)
# ---------------------------------------------------------------------------

#: docs per planted near-dup group in synth_video_groups (same convention)
VFP_GROUP = 4
#: clip signature geometry: 3 sampled frames x 56-bit dHash = 168 bits,
#: stored as 3 x (hi, lo) 28-bit halves; banding concatenates three 14-bit
#: chunks ACROSS the signature into each of 4 x 42-bit band keys, so the
#: pigeonhole guarantee covers the AGGREGATE distance over all frames
VFP_FRAMES = 3
_VFP_CHUNKS = VFP_FRAMES * 4                     # 12 x 14-bit chunks
_VFP_BANDS = 4                                   # 3 chunks -> one 42-bit key
MAX_BUCKET_VFP = 256


def synth_frame_pixels(grp_ref: str, frame: int, variant: int) -> bytes:
    """Deterministic 8x8 mono pixels for frame ``frame`` of a planted video
    near-dup group: base bytes = the md5 chain ``md5(grp_ref:f:i)`` (the
    synth_y4m_frames derivation, replayed by the DuckDB twin), then variant
    ``v`` forces pixel 0 (row-0 start) of frames 0..v-1 to 255. A row-start
    pixel touches exactly ONE dHash comparison (bit 0 of that frame's hash),
    so any two variants of one group differ by at most VFP_GROUP-1 = 3 bits
    of the 168-bit clip signature — within the 4-band pigeonhole bound."""
    base = bytearray(
        b"".join(
            hashlib.md5(f"{grp_ref}:{frame}:{i}".encode()).digest()
            for i in range(_SYNTH_FRAME_CHUNKS)
        )
    )
    if frame < variant:
        base[0] = 255
    return bytes(base)


def synth_video_groups(documents: DataFrame, id_col: str = "doc_id",
                       group: int = VFP_GROUP) -> DataFrame:
    """Derive a video media table with PLANTED near-duplicate structure:
    docs sharing ``doc_id // group`` get the same base VFP_FRAMES-frame 8x8
    mono clip, perturbed per variant (synth_frame_pixels), encoded as REAL
    y4m streams (per-frame parameter tokens the decoder must parse). The
    driver-checked ``video_neardup`` input."""
    vids = documents.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.concat(F.lit("y4m-"), F.col(id_col).cast("string")).alias("media_ref"),
        F.concat(
            F.lit("vgrp-"),
            F.expr(f"cast(cast({id_col} as bigint) div {int(group)} as string)"),
        ).alias("grp_ref"),
        (F.col(id_col).cast("long") % group).cast("int").alias("variant"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        num, den = SYNTH_FPS
        dur = VFP_FRAMES * 1000 * den // num
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "kind": "video",
                    "blob": [
                        y4m.encode_y4m(
                            SYNTH_W, SYNTH_H, SYNTH_FPS,
                            [
                                synth_frame_pixels(g, f, int(v))
                                for f in range(VFP_FRAMES)
                            ],
                        )
                        for g, v in zip(pdf["grp_ref"], pdf["variant"])
                    ],
                    "meta": [
                        {"mime": "video/x-yuv4mpeg", "width": SYNTH_W,
                         "height": SYNTH_H, "duration_ms": dur}
                        for _ in pdf["media_ref"]
                    ],
                }
            )

    return vids.mapInPandas(run, MEDIA)


VFP = StructType(
    [StructField("doc_id", StringType()), StructField("media_ref", StringType())]
    + [
        StructField(f"f{f}_{half}", LongType())
        for f in range(VFP_FRAMES)
        for half in ("hi", "lo")
    ]
)


def video_clip_hash(media: DataFrame, decoder: str = "y4m") -> DataFrame:
    """video blobs -> 168-bit clip signature (per-frame 56-bit dHash of the
    first VFP_FRAMES frames) via mapInPandas, REAL decode (functions/y4m.py):
    a FRAME-header or plane-size bug changes the pixels => the signature =>
    fails the driver hash match. Output: (doc_id, media_ref, f{0..2}_{hi,lo}).

    Production shape is identical with a real decoder: sample k frames
    (ffmpeg -vf fps=...), perceptual-hash each, emit one row of 2k ints —
    the banding below never touches pixel data."""
    if decoder != "y4m":
        raise NotImplementedError(
            "non-y4m decoders unavailable in this container; production: "
            "ffmpeg frame sampling -> per-frame dHash inside this same "
            "mapInPandas body"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: dict[str, list] = {f"f{f}_{h}": [] for f in range(VFP_FRAMES)
                                     for h in ("hi", "lo")}
            for blob in pdf["blob"]:
                w, h, _fps, cspace, frames = y4m.decode_y4m(
                    bytes(blob) if blob is not None else b""
                )
                if (w, h) != (SYNTH_W, SYNTH_H) or cspace != "mono":
                    raise ValueError(
                        f"clip hash expects {SYNTH_W}x{SYNTH_H} mono, "
                        f"got {w}x{h} {cspace}"
                    )
                if len(frames) < VFP_FRAMES:
                    raise ValueError(
                        f"clip hash expects >= {VFP_FRAMES} frames, got {len(frames)}"
                    )
                for f in range(VFP_FRAMES):
                    hi, lo = dhash_py(frames[f], channels=1)
                    cols[f"f{f}_hi"].append(hi)
                    cols[f"f{f}_lo"].append(lo)
            out = {"doc_id": pdf["doc_id"], "media_ref": pdf["media_ref"]}
            out.update({k: pd.array(v, dtype="Int64") for k, v in cols.items()})
            yield pd.DataFrame(out)

    vids = media.filter(F.col("kind") == "video").select("doc_id", "media_ref", "blob")
    return vids.mapInPandas(run, VFP)


def _vfp_chunk(cols: list, idx: int):
    """14-bit chunk ``idx`` of the 168-bit clip signature: signature order is
    frame-major (f0_hi, f0_lo, f1_hi, ...), each 28-bit half holding two
    chunks (low 14 first)."""
    half = cols[idx // 2]
    return F.shiftrightunsigned(half, (idx % 2) * 14).bitwiseAND(F.lit(16383))


def vfp_neardup(hashes: DataFrame, max_dist: int = 3,
                id_col: str = "doc_id",
                max_bucket: int | None = MAX_BUCKET_VFP) -> DataFrame:
    """Video near-duplicate pairs from clip signatures via CROSS-FRAME
    pigeonhole banding — pure Column algebra after the hash.

    The 168-bit signature (3 frames x 56-bit dHash) splits into 12 x 14-bit
    chunks; band i concatenates chunks 3i..3i+2 into one 42-bit key, so any
    pair within AGGREGATE Hamming distance 3 (summed over all frames) agrees
    EXACTLY on at least one band. Candidates pay the exact distance:
    bit_count(xor) summed over the six 28-bit halves. Same 100 TB shape as
    the image/audio paths: narrow (id, 6 ints) projection, 4x explode, one
    groupBy-equi-join shuffle — frames and blobs stay in the decode stage.

    Output: (a, b, dist) with a < b."""
    from pyspark.sql import Window

    halves = [f"f{f}_{h}" for f in range(VFP_FRAMES) for h in ("hi", "lo")]
    slim = hashes.select(F.col(id_col), *halves)
    hcols = [F.col(c) for c in halves]
    bands = None
    for i in range(_VFP_BANDS):
        key = (
            _vfp_chunk(hcols, 3 * i)
            + (_vfp_chunk(hcols, 3 * i + 1) * F.lit(1 << 14))
            + (_vfp_chunk(hcols, 3 * i + 2) * F.lit(1 << 28))
        )
        part = slim.select(
            F.col(id_col), *halves, F.lit(i).alias("band"), key.alias("key")
        )
        bands = part if bands is None else bands.unionByName(part)
    if max_bucket is not None:
        w = Window.partitionBy("band", "key").orderBy(F.asc(id_col))
        bands = (
            bands.withColumn("__bn", F.row_number().over(w))
            .filter(F.col("__bn") <= max_bucket)
            .drop("__bn")
        )
    left = bands.select(
        F.col(id_col).alias("a"),
        *[F.col(c).alias(f"a_{c}") for c in halves], "band", "key",
    )
    right = bands.select(
        F.col(id_col).alias("b"),
        *[F.col(c).alias(f"b_{c}") for c in halves], "band", "key",
    )
    dist = None
    for c in halves:
        term = F.bit_count(F.col(f"a_{c}").bitwiseXOR(F.col(f"b_{c}")))
        dist = term if dist is None else dist + term
    dist = dist.cast("int")
    return (
        left.join(right, ["band", "key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", dist.alias("dist"))
        .filter(F.col("dist") <= max_dist)
        .distinct()
    )
