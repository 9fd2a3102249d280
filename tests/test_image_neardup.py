"""Image perceptual-hash near-dup: REAL PNG decode -> dHash -> pigeonhole
banding, engine vs a pure-Python brute-force spec.

The planted structure (operators/multimodal.py synth_image_groups): docs
sharing doc_id // PHASH_GROUP get one base 8x8 grayscale image; variant v
forces the first pixel of rows 0..v-1 to 255. Row-start pixels touch exactly
one dHash comparison each, so within-group distance <= PHASH_GROUP-1 = 3 by
construction — which the 4-band pigeonhole GUARANTEES to surface.
"""

import itertools

from pyspark.sql import functions as F

from web2llmstxt_spark.operators import multimodal
from web2llmstxt_spark.operators.multimodal import (
    MAX_BUCKET_DHASH,
    PHASH_GROUP,
    dhash_py,
    synth_gray_pixels,
)


def _expected_pairs(n_docs: int, max_dist: int = 3):
    """Brute-force spec: per-doc dHash from the planted pixels, 4x14-bit
    banding with the bucket cap, exact Hamming filter."""
    hashes = {}
    for d in range(n_docs):
        px = synth_gray_pixels(f"grp-{d // PHASH_GROUP}", d % PHASH_GROUP)
        hashes[d] = dhash_py(px, channels=1)
    buckets: dict[tuple[int, int], list[int]] = {}
    for d in sorted(hashes):
        hi, lo = hashes[d]
        for band, key in enumerate(
            [hi & 16383, (hi >> 14) & 16383, lo & 16383, (lo >> 14) & 16383]
        ):
            buckets.setdefault((band, key), []).append(d)
    pairs = set()
    for members in buckets.values():
        for a, b in itertools.combinations(members[:MAX_BUCKET_DHASH], 2):
            ha, la = hashes[a]
            hb, lb = hashes[b]
            dist = bin((ha ^ hb) | ((la ^ lb) << 28)).count("1")
            if dist <= max_dist:
                pairs.add((a, b, dist))
    return pairs


def test_dhash_known_pattern():
    # strictly decreasing row -> all 7 bits of each row set; flat rows -> 0
    px = bytes(list(range(64, 0, -8)) * 8)  # col-constant per row? no:
    # build explicitly: row r = [8,7,6,5,4,3,2,1] (decreasing) for r even,
    # flat 5s for r odd
    rows = []
    for r in range(8):
        rows += list(range(8, 0, -1)) if r % 2 == 0 else [5] * 8
    hi, lo = dhash_py(bytes(rows), channels=1)
    full = hi | (lo << 28)
    for r in range(8):
        for c in range(7):
            bit = (full >> (r * 7 + c)) & 1
            assert bit == (1 if r % 2 == 0 else 0)


def test_planted_groups_all_detected(spark):
    n = 32
    docs = spark.range(n).select(F.col("id").alias("doc_id"))
    media = multimodal.synth_image_groups(docs)
    hashes = multimodal.image_dhash(media).withColumn(
        "doc_id", F.col("doc_id").cast("long")
    )
    got = {
        (r["a"], r["b"], r["dist"])
        for r in multimodal.dhash_neardup(hashes, max_dist=3).collect()
    }
    # every within-group pair is guaranteed present (bounded distance +
    # pigeonhole); the engine must match the brute-force spec EXACTLY
    want = _expected_pairs(n)
    for g in range(n // PHASH_GROUP):
        base = g * PHASH_GROUP
        group_pairs = {
            (a, b)
            for a, b, _ in want
            if base <= a < base + PHASH_GROUP and base <= b < base + PHASH_GROUP
        }
        assert len(group_pairs) == PHASH_GROUP * (PHASH_GROUP - 1) // 2
    assert got == want


def test_real_decode_feeds_hash(spark):
    # the dHash of the DECODED blob equals the dHash of the source pixels:
    # evidence the PNG round trip (cycling filters) is lossless on this path
    docs = spark.range(10).select(F.col("id").alias("doc_id"))
    media = multimodal.synth_image_groups(docs)
    rows = multimodal.image_dhash(media).collect()
    for r in rows:
        d = int(r["doc_id"])
        px = synth_gray_pixels(f"grp-{d // PHASH_GROUP}", d % PHASH_GROUP)
        assert (r["dhash_hi"], r["dhash_lo"]) == dhash_py(px, channels=1)
