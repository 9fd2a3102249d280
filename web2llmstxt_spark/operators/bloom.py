"""Partition-local Bloom URL-seen pre-filter with INCREMENTAL state
(north rule: "partition-local Bloom/cuckoo URL-seen filter merged per
superstep").

At 10^10-URL scale the exact ``frontier LEFT ANTI JOIN seen`` must shuffle
both sides on url every superstep. The Bloom pass removes that cost for the
common case: per host-bucket, a compact bitmap of the bucket's seen URLs is
cogrouped against the bucket's candidates — candidates the bitmap rejects
are DEFINITELY unseen and bypass the exact join entirely; only "maybe seen"
survivors (a small, false-positive-bounded set) take the exact anti-join.
No false negatives => the composition is exactly equal to the plain
anti-join (audited in tests/test_frontier_parity.py::test_bloom_off_equals_on).

Round-1 fix: the bitmaps are now STATE, not a per-superstep rebuild. Each
superstep ORs in only the bitmap delta of that superstep's newly-attempted
URLs (``delta_bitmaps`` + ``merge_bitmaps``) — per-superstep Bloom cost is
O(|attempted|), not O(|seen|). All bitmaps in one state generation share a
fixed ``m_bits``; when the per-bucket key count outgrows BITS_PER_KEY load,
the caller rebuilds from the (checkpointed) seen table at double width —
amortized O(log n) full scans over a whole crawl, like vector doubling.

The reference holds one driver-side ``set`` (crawled_urls,
llmsgen/crawler/web_crawler.py:189 (pyc)); this is its distributed,
memory-bounded replacement. Sizing: BITS_PER_KEY=10 with K=4 blake2b-derived
probes => ~1.2% false positives at capacity; per-bucket bitmaps for 10^10
URLs across 4096 buckets stay partition-local, never broadcast or collected.
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
#: per-bucket bitmap width for a fresh state generation: 2^17 bits = 16 KiB,
#: capacity ~13k URLs/bucket before the doubling rebuild triggers. Small
#: enough that a 32-bucket test crawl carries 512 KiB of state; a production
#: run sizes this to expected |seen|/bucket up front.
DEFAULT_M_BITS = 1 << 17

BLOOM_SCHEMA = "bucket int, bitmap binary, n_keys long"


def _positions(url: str, m_bits: int) -> list[int]:
    """K probe positions via double hashing of one blake2b digest."""
    d = hashlib.blake2b(url.encode("utf-8"), digest_size=16).digest()
    h1 = int.from_bytes(d[:8], "big")
    h2 = int.from_bytes(d[8:], "big") | 1
    return [(h1 + i * h2) % m_bits for i in range(NUM_PROBES)]


def build_bitmap(urls, m_bits: int = DEFAULT_M_BITS) -> bytes:
    bits = np.zeros(m_bits // 8, dtype=np.uint8)
    for u in urls:
        for p in _positions(u, m_bits):
            bits[p >> 3] |= 1 << (p & 7)
    return bits.tobytes()


def probe_bitmap(url: str, bitmap: bytes) -> bool:
    """True => maybe seen; False => definitely unseen."""
    m_bits = len(bitmap) * 8
    return all(bitmap[p >> 3] & (1 << (p & 7)) for p in _positions(url, m_bits))


def _bucket_col(url_col, num_buckets: int, salt_hosts: dict | None = None):
    """JVM-native bucket id for a URL (no Python boundary — this runs on
    every candidate every superstep). ``salt_hosts`` maps skewed hosts ->
    fan-out k: their URLs spread deterministically over k buckets
    (bucket = (hash(host) + hash(url) % k) % num_buckets) so one mega-host
    cannot pin a partition (north-rule skew salting). Safe for Bloom/seen
    state: the same URL always lands in the same bucket, membership keys on
    the full URL — only co-location granularity changes. Both the bitmap
    builder and the prefilter derive buckets through this one function, so
    delta and probe sides always agree."""
    from ..functions import native

    host = F.lower(F.parse_url(url_col, F.lit("HOST")))
    base = native.host_bucket_native(host, num_buckets)
    if salt_hosts:
        salt = F.lit(0)
        for h, k in salt_hosts.items():
            salt = F.when(
                host == F.lit(h.lower()), native.host_bucket_native(url_col, k)
            ).otherwise(salt)
        base = F.pmod(base + salt, F.lit(num_buckets)).cast("int")
    return base


# --------------------------------------------------------- incremental state

def delta_bitmaps(urls: DataFrame, num_buckets: int,
                  m_bits: int = DEFAULT_M_BITS,
                  salt_hosts: dict | None = None) -> DataFrame:
    """(bucket, bitmap, n_keys) for ONE increment of URLs (this superstep's
    attempted set, or the full seen table on init/rebuild). Shuffles only the
    increment — never the accumulated state."""
    b = urls.select("url").withColumn(
        "bucket", _bucket_col(F.col("url"), num_buckets, salt_hosts)
    )

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "bucket": [int(pdf["bucket"].iloc[0])],
                "bitmap": [build_bitmap(list(pdf["url"]), m_bits)],
                "n_keys": [len(pdf)],
            }
        )

    return b.groupBy("bucket").applyInPandas(_build, BLOOM_SCHEMA)


def merge_bitmaps(state: DataFrame | None, delta: DataFrame) -> DataFrame:
    """OR the delta into the accumulated state (same m_bits generation).
    Both sides are ≤num_buckets rows of fixed-size bitmaps — the merge
    shuffles kilobytes, not URLs. n_keys accumulates insertion counts (an
    upper bound on distinct keys; used only for the load-factor rebuild)."""
    both = delta if state is None else state.unionByName(delta)

    def _or(pdf: pd.DataFrame) -> pd.DataFrame:
        arrs = [np.frombuffer(b, dtype=np.uint8) for b in pdf["bitmap"]]
        merged = arrs[0] if len(arrs) == 1 else np.bitwise_or.reduce(arrs)
        return pd.DataFrame(
            {
                "bucket": [int(pdf["bucket"].iloc[0])],
                "bitmap": [merged.tobytes()],
                "n_keys": [int(pdf["n_keys"].sum())],
            }
        )

    return both.groupBy("bucket").applyInPandas(_or, BLOOM_SCHEMA)


def prefilter_with_state(cand: DataFrame, bloom_state: DataFrame,
                         seen: DataFrame, num_buckets: int,
                         salt_hosts: dict | None = None) -> DataFrame:
    """Exact equivalent of ``cand.join(seen, 'url', 'left_anti')``: the
    accumulated bitmaps reject definitely-unseen candidates cheaply; only
    "maybe seen" survivors pay the exact anti-join against seen."""
    cand_cols = cand.columns
    cand_b = cand.withColumn("bucket", _bucket_col(F.col("url"), num_buckets, salt_hosts))
    blooms = bloom_state.select("bucket", "bitmap")

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


def needs_rebuild(max_keys_per_bucket: int, m_bits: int) -> bool:
    """Load-factor check: past BITS_PER_KEY the false-positive rate degrades
    and maybe-seen survivors flood the exact join — double and rebuild."""
    return max_keys_per_bucket * BITS_PER_KEY > m_bits


def bloom_prefilter(cand: DataFrame, seen: DataFrame, num_buckets: int) -> DataFrame:
    """One-shot convenience (builds state from seen, then filters): kept for
    callers without superstep state. Inside FrontierCrawler the incremental
    path above is used instead."""
    n = seen.count()
    m_bits = max(1024, int(math.ceil(n * BITS_PER_KEY / 8)) * 8) if n else 1024
    state = merge_bitmaps(None, delta_bitmaps(seen, num_buckets, m_bits))
    return prefilter_with_state(cand, state, seen, num_buckets)
