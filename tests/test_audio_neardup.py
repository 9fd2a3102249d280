"""Audio fingerprint near-dup: REAL WAV decode -> 32-bit energy-difference
fingerprint -> pigeonhole banding, engine vs a pure-Python brute-force spec.

The planted structure (operators/multimodal.py synth_audio_groups): docs
sharing doc_id // AFP_GROUP get one base 128-sample clip; variant v forces
samples 4j for j in 0..v-1 to +32767. Sample 4j sits in energy window 2j,
and window pairs are DISJOINT (bit b compares windows 2b vs 2b+1), so
within-group distance <= AFP_GROUP-1 = 3 by construction — which the 4-band
pigeonhole GUARANTEES to surface.
"""

import itertools
import struct

from pyspark.sql import functions as F

from web2llmstxt_spark.operators import multimodal
from web2llmstxt_spark.operators.multimodal import (
    AFP_GROUP,
    MAX_BUCKET_AFP,
    SYNTH_SAMPLES,
    afp_py,
    synth_group_payload,
)


def _samples(grp_ref: str, variant: int) -> list[int]:
    payload = synth_group_payload(grp_ref, variant)
    return list(struct.unpack(f"<{SYNTH_SAMPLES}h", payload))


def _expected_pairs(n_docs: int, max_dist: int = 3):
    """Brute-force spec: per-doc fingerprint from the planted samples,
    4x8-bit banding with the bucket cap, exact Hamming filter."""
    fps = {
        d: afp_py(_samples(f"agrp-{d // AFP_GROUP}", d % AFP_GROUP))
        for d in range(n_docs)
    }
    buckets: dict[tuple[int, int], list[int]] = {}
    for d in sorted(fps):
        for band in range(4):
            key = (fps[d] >> (band * 8)) & 255
            buckets.setdefault((band, key), []).append(d)
    pairs = set()
    for members in buckets.values():
        for a, b in itertools.combinations(members[:MAX_BUCKET_AFP], 2):
            dist = bin(fps[a] ^ fps[b]).count("1")
            if dist <= max_dist:
                pairs.add((a, b, dist))
    return pairs


def test_afp_known_pattern():
    # window energies strictly alternating high/low -> all 32 bits set;
    # then the reverse -> all clear
    hi_lo = []
    for b in range(32):
        hi_lo += [1000, 1000, 5, 5]          # E_2b = 2000 > E_2b+1 = 10
    assert afp_py(hi_lo) == (1 << 32) - 1
    lo_hi = []
    for b in range(32):
        lo_hi += [5, 5, 1000, 1000]
    assert afp_py(lo_hi) == 0


def test_variant_distance_bounded():
    # the planted construction's core invariant: any two variants of one
    # group are within fingerprint distance AFP_GROUP-1
    for g in range(8):
        fps = [
            afp_py(_samples(f"agrp-{g}", v)) for v in range(AFP_GROUP)
        ]
        for u, v in itertools.combinations(range(AFP_GROUP), 2):
            assert bin(fps[u] ^ fps[v]).count("1") <= AFP_GROUP - 1


def test_planted_groups_all_detected(spark):
    n = 32
    docs = spark.range(n).select(F.col("id").alias("doc_id"))
    media = multimodal.synth_audio_groups(docs)
    fps = multimodal.audio_fingerprint(media).withColumn(
        "doc_id", F.col("doc_id").cast("long")
    )
    got = {
        (r["a"], r["b"], r["dist"])
        for r in multimodal.afp_neardup(fps, max_dist=3).collect()
    }
    want = _expected_pairs(n)
    # every within-group pair is guaranteed present (bounded distance +
    # pigeonhole); the engine must match the brute-force spec EXACTLY
    for g in range(n // AFP_GROUP):
        base = g * AFP_GROUP
        group_pairs = {
            (a, b)
            for a, b, _ in want
            if base <= a < base + AFP_GROUP and base <= b < base + AFP_GROUP
        }
        assert len(group_pairs) == AFP_GROUP * (AFP_GROUP - 1) // 2
    assert got == want


def test_real_decode_feeds_fingerprint(spark):
    # the fingerprint of the DECODED blob equals the fingerprint of the
    # source samples: the RIFF round trip (incl. LIST-chunk skip) is
    # lossless on this path
    docs = spark.range(10).select(F.col("id").alias("doc_id"))
    media = multimodal.synth_audio_groups(docs)
    rows = multimodal.audio_fingerprint(media).collect()
    for r in rows:
        d = int(r["doc_id"])
        want = afp_py(_samples(f"agrp-{d // AFP_GROUP}", d % AFP_GROUP))
        assert r["afp"] == want
