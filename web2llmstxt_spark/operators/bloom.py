"""Partition-local Bloom URL-seen pre-filter (north rule).

At 10^10-URL scale the exact ``frontier LEFT ANTI JOIN seen`` must shuffle
both sides on url every superstep. The Bloom pass removes that cost for the
common case: per host-bucket, a compact bitmap of the bucket's seen URLs is
built with ``applyInPandas`` and cogrouped against the bucket's candidates —
candidates the bitmap rejects are DEFINITELY unseen and bypass the exact
join entirely; only "maybe seen" survivors (a small, false-positive-bounded
set) take the exact anti-join. No false negatives => the composition is
exactly equal to the plain anti-join (audited in tests/test_bloom.py).

The reference holds one driver-side ``set`` (crawled_urls,
llmsgen/crawler/web_crawler.py:189 (pyc)); this is its distributed,
memory-bounded replacement. Sizing: m = max(1024, ceil(n * BITS_PER_KEY))
bits with K=4 blake2b-derived probes => ~1.2% false positives at 10
bits/key; per-bucket bitmaps for 10^10 URLs across 4096 buckets ≈ 3 GB/bucket
aggregate — kept partition-local, never broadcast or collected.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BITS_PER_KEY = 10
NUM_PROBES = 4


def _positions(url: str, m_bits: int) -> list[int]:
    """K probe positions via double hashing of one blake2b digest."""
    d = hashlib.blake2b(url.encode("utf-8"), digest_size=16).digest()
    h1 = int.from_bytes(d[:8], "big")
    h2 = int.from_bytes(d[8:], "big") | 1
    return [(h1 + i * h2) % m_bits for i in range(NUM_PROBES)]


def build_bitmap(urls) -> bytes:
    n = max(1, len(urls))
    m_bits = max(1024, int(math.ceil(n * BITS_PER_KEY / 8)) * 8)
    bits = np.zeros(m_bits // 8, dtype=np.uint8)
    for u in urls:
        for p in _positions(u, m_bits):
            bits[p >> 3] |= 1 << (p & 7)
    return bits.tobytes()


def probe_bitmap(url: str, bitmap: bytes) -> bool:
    """True => maybe seen; False => definitely unseen."""
    m_bits = len(bitmap) * 8
    return all(bitmap[p >> 3] & (1 << (p & 7)) for p in _positions(url, m_bits))


def _bucket_col(url_col, num_buckets: int):
    from ..functions import udfs

    return udfs.host_bucket_udf(
        F.lower(F.parse_url(url_col, F.lit("HOST"))), F.lit(num_buckets)
    )


def bloom_prefilter(cand: DataFrame, seen: DataFrame, num_buckets: int) -> DataFrame:
    """Exact equivalent of ``cand.join(seen, 'url', 'left_anti')`` with a
    Bloom fast path. Returns cand rows (original columns) not present in seen.
    """
    spark = cand.sparkSession
    cand_cols = cand.columns
    cand_b = cand.withColumn("bucket", _bucket_col(F.col("url"), num_buckets))
    seen_b = seen.select("url").withColumn("bucket", _bucket_col(F.col("url"), num_buckets))

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"bucket": [int(pdf["bucket"].iloc[0])], "bitmap": [build_bitmap(list(pdf["url"]))]}
        )

    blooms = seen_b.groupBy("bucket").applyInPandas(_build, "bucket int, bitmap binary")

    out_schema = cand_b.withColumn("maybe_seen", F.lit(True)).schema

    def _probe(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return left.assign(maybe_seen=pd.Series([], dtype=bool))
        if right.empty:
            return left.assign(maybe_seen=False)
        bitmap = right["bitmap"].iloc[0]
        return left.assign(maybe_seen=left["url"].map(lambda u: probe_bitmap(u, bitmap)))

    probed = (
        cand_b.groupBy("bucket")
        .cogroup(blooms.groupBy("bucket"))
        .applyInPandas(_probe, out_schema)
    )
    definitely_unseen = probed.filter(~F.col("maybe_seen")).select(*cand_cols)
    survivors = (
        probed.filter(F.col("maybe_seen"))
        .select(*cand_cols)
        .join(seen.select("url"), "url", "left_anti")
    )
    return definitely_unseen.unionByName(survivors)
