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

from ..functions import png
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
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


def _png_decode_stats(blob: bytes) -> tuple[int, int, list[float], float]:
    """REAL decode (functions/png.py, stdlib zlib) -> deterministic pixel
    stats, each a single exact-integer division so the DuckDB oracle twin
    reproduces them bit-identically:

    - ``feat[j]`` = fraction of pixel bytes with high nibble j (16-bin byte
      histogram), count / n_bytes;
    - ``mean_luma`` = mean BT.601 luma over pixels in [0,1]: the integer sum
      of 299R+587G+114B divided once by 255*1000*n_pixels (grayscale: R=G=B;
      RGBA: alpha excluded).
    """
    w, h, ch, px = png.decode_png(blob)
    nbins = [0] * 16
    for b in px:
        nbins[b >> 4] += 1
    rgb_ch = min(ch, 3)
    luma = 0
    for i in range(0, len(px), ch):
        if ch == 1:
            luma += 1000 * px[i]
        else:
            luma += sum(_LUMA_MILLI[c] * px[i + c] for c in range(rgb_ch))
    n_bytes = len(px)
    n_pix = w * h
    return w, h, [n / n_bytes for n in nbins], luma / (255 * 1000 * n_pix)


def extract_image_features(media: DataFrame, decoder: str = "fake",
                           dims: int = 16) -> DataFrame:
    """image blobs -> feature vectors via mapInPandas (Arrow batches).

    ``decoder='png'``: REAL decode via the stdlib codec (functions/png.py) —
    width/height come from the parsed IHDR and feat/mean_luma from actual
    pixel bytes, so a corrupted blob or a codec bug fails loudly here.
    ``decoder='fake'``: blake2b stand-in (width/height null). Other decoders
    (jpeg/webp) need PIL and raise with the production recipe.
    """
    if decoder not in ("fake", "png"):
        raise NotImplementedError(
            "non-PNG decoders unavailable in this container; production: "
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


def media_from_documents(documents: DataFrame) -> DataFrame:
    """Derive a media table from interleaved documents: one row per image
    span, with a real (deterministically synthesized) PNG blob."""
    imgs = documents.select(
        "doc_id",
        F.explode(
            F.filter(F.col("spans"), lambda s: s["kind"] == "image")
        ).alias("s"),
    ).select("doc_id", F.col("s.media_ref").alias("media_ref"))
    return _attach_png_blobs(imgs)


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
