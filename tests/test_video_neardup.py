"""Video near-dup: REAL y4m decode -> per-frame dHash clip signature ->
cross-frame pigeonhole banding, engine vs a pure-Python brute-force spec.

The planted structure (operators/multimodal.py synth_video_groups): docs
sharing doc_id // VFP_GROUP get one base 3-frame 8x8 mono clip; variant v
forces pixel 0 of frames 0..v-1 to 255. Pixel 0 touches exactly one dHash
comparison (bit 0 of that frame), so the AGGREGATE signature distance is
<= VFP_GROUP-1 = 3 by construction — which the 4x42-bit cross-frame
pigeonhole GUARANTEES to surface.
"""

import itertools

from pyspark.sql import functions as F

from web2llmstxt_spark.operators import multimodal
from web2llmstxt_spark.operators.multimodal import (
    MAX_BUCKET_VFP,
    VFP_FRAMES,
    VFP_GROUP,
    dhash_py,
    synth_frame_pixels,
)


def _signature(d: int) -> list[int]:
    """(f0_hi, f0_lo, f1_hi, f1_lo, f2_hi, f2_lo) from the planted pixels."""
    sig = []
    for f in range(VFP_FRAMES):
        hi, lo = dhash_py(
            synth_frame_pixels(f"vgrp-{d // VFP_GROUP}", f, d % VFP_GROUP),
            channels=1,
        )
        sig += [hi, lo]
    return sig


def _chunks(sig: list[int]) -> list[int]:
    """12 x 14-bit chunks, frame-major (each 28-bit half: low 14 first)."""
    out = []
    for half in sig:
        out += [half & 16383, (half >> 14) & 16383]
    return out


def _dist(sa: list[int], sb: list[int]) -> int:
    return sum(bin(x ^ y).count("1") for x, y in zip(sa, sb))


def _expected_pairs(n_docs: int, max_dist: int = 3):
    sigs = {d: _signature(d) for d in range(n_docs)}
    buckets: dict[tuple[int, int], list[int]] = {}
    for d in sorted(sigs):
        c = _chunks(sigs[d])
        for band in range(4):
            key = c[3 * band] | (c[3 * band + 1] << 14) | (c[3 * band + 2] << 28)
            buckets.setdefault((band, key), []).append(d)
    pairs = set()
    for members in buckets.values():
        for a, b in itertools.combinations(members[:MAX_BUCKET_VFP], 2):
            dist = _dist(sigs[a], sigs[b])
            if dist <= max_dist:
                pairs.add((a, b, dist))
    return pairs


def test_variant_distance_bounded():
    for g in range(6):
        sigs = []
        for v in range(VFP_GROUP):
            sig = []
            for f in range(VFP_FRAMES):
                sig += list(
                    dhash_py(synth_frame_pixels(f"vgrp-{g}", f, v), channels=1)
                )
            sigs.append(sig)
        for u, v in itertools.combinations(range(VFP_GROUP), 2):
            assert _dist(sigs[u], sigs[v]) <= VFP_GROUP - 1


def test_planted_groups_all_detected(spark):
    n = 32
    docs = spark.range(n).select(F.col("id").alias("doc_id"))
    media = multimodal.synth_video_groups(docs)
    hashes = multimodal.video_clip_hash(media).withColumn(
        "doc_id", F.col("doc_id").cast("long")
    )
    got = {
        (r["a"], r["b"], r["dist"])
        for r in multimodal.vfp_neardup(hashes, max_dist=3).collect()
    }
    want = _expected_pairs(n)
    for g in range(n // VFP_GROUP):
        base = g * VFP_GROUP
        group_pairs = {
            (a, b)
            for a, b, _ in want
            if base <= a < base + VFP_GROUP and base <= b < base + VFP_GROUP
        }
        assert len(group_pairs) == VFP_GROUP * (VFP_GROUP - 1) // 2
    assert got == want


def test_real_decode_feeds_signature(spark):
    # the signature of the DECODED blob equals the signature of the source
    # frames: the y4m round trip (FRAME parameter tokens parsed, plane sizes
    # right) is lossless on this path
    docs = spark.range(8).select(F.col("id").alias("doc_id"))
    media = multimodal.synth_video_groups(docs)
    rows = multimodal.video_clip_hash(media).collect()
    for r in rows:
        d = int(r["doc_id"])
        want = _signature(d)
        got = [r[f"f{f}_{h}"] for f in range(VFP_FRAMES) for h in ("hi", "lo")]
        assert got == want
