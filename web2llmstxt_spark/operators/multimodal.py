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
        StructField("feat", ArrayType(DoubleType())),    # 16-dim embedding
        StructField("mean_luma", DoubleType()),
    ]
)


def _fake_decode_stats(blob: bytes, dims: int = 16) -> tuple[list[float], float]:
    """Deterministic stand-in for decode+feature-extract: blake2b-derived
    statistics (stable across runs/engines; replace with a real model)."""
    d = hashlib.blake2b(blob or b"", digest_size=2 * dims + 2).digest()
    feat = [(d[2 * i] * 256 + d[2 * i + 1]) / 65535.0 - 0.5 for i in range(dims)]
    luma = d[-1] / 255.0
    return feat, luma


def extract_image_features(media: DataFrame, decoder: str = "fake",
                           dims: int = 16) -> DataFrame:
    """image blobs -> feature vectors via mapInPandas (Arrow batches)."""
    if decoder != "fake":
        raise NotImplementedError(
            "real decoders unavailable in this container; production: "
            "PIL.Image.open(io.BytesIO(blob)).convert('RGB') -> resize -> "
            "model.encode inside this same mapInPandas body"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, lumas = [], []
            for blob in pdf["blob"]:
                f, l = _fake_decode_stats(bytes(blob) if blob is not None else b"", dims)
                feats.append(f)
                lumas.append(l)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
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


def media_from_documents(documents: DataFrame) -> DataFrame:
    """Derive a media table from interleaved documents: one row per image
    span, with a deterministic fake blob (blake2b of the media_ref)."""
    imgs = documents.select(
        "doc_id",
        F.explode(
            F.filter(F.col("spans"), lambda s: s["kind"] == "image")
        ).alias("s"),
    ).select("doc_id", F.col("s.media_ref").alias("media_ref"))
    return (
        imgs.withColumn("kind", F.lit("image"))
        .withColumn("blob", F.sha2(F.col("media_ref"), 256).cast("binary"))
        .withColumn(
            "meta",
            F.struct(
                F.lit("image/png").alias("mime"),
                F.lit(64).alias("width"),
                F.lit(64).alias("height"),
                F.lit(None).cast("long").alias("duration_ms"),
            ),
        )
    )
