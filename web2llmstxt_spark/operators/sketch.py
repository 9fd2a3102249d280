"""Count-min sketch: bounded-memory frequency estimation (engine extension).

The 100 TB problem this solves: exact token/URL/host frequency needs a
groupBy whose state grows with the number of DISTINCT keys (10^9+ tokens,
10^10 URLs); a count-min sketch (Cormode & Muthukrishnan, J. Algorithms
2005) holds d x w counters — a few KB — regardless of corpus size, never
underestimates, and overestimates by at most N/w with probability 1-2^-d.
The crawl engine's use cases: per-host request accounting at frontier
scale, hot-token detection for boilerplate heuristics, pre-filtering heavy
hitters before an exact (filtered) count.

Everything is deterministic — the d hash rows are the proven md5-prefix
arithmetic salted by row index — so the whole sketch (build AND estimate)
is replicated bit-exactly by the DuckDB oracle twin; no randomness, no
float.

Scale shape: the build is explode -> groupBy(row, bucket) with map-side
combine — the shuffle carries at most d*w distinct keys (the sketch size,
NOT the corpus size); token text collapses to (row, bucket) before any
shuffle. The counter table is d*w rows: broadcast it for estimates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import tokens_col
from .textstats import whitespace_tokens_sql

#: test-scale sketch geometry. Production at 10^12 increments: w = 2^20,
#: d = 5 keeps the additive error ~N/10^6 at ~20 MB of counters.
CMS_WIDTH = 1024
CMS_DEPTH = 4


def _bucket(col, row: int, width: int):
    """Row-salted md5-prefix bucket (the minhash/hash_embed arithmetic):
    h_row(t) = int(md5(row || ':' || t)[:15], 16) % width."""
    salted = F.concat(F.lit(f"{row}:"), col)
    return (
        F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("long") % width
    )


def _bucket_sql(expr: str, row: int, width: int) -> str:
    return (
        f"(('0x' || substr(md5('{row}:' || {expr}), 1, 15))::BIGINT % {width})"
    )


def cms_build(
    df: DataFrame,
    text_col: str = "text",
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
) -> DataFrame:
    """Build the sketch over all token OCCURRENCES of ``text_col``.

    Output: (row:int, bucket:long, cnt:long) — at most depth*width rows.
    """
    toks = df.select(F.explode(tokens_col(F.col(text_col))).alias("__tok"))
    rows = toks.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(r).alias("row"),
                    _bucket(F.col("__tok"), r, width).alias("bucket"),
                )
                for r in range(depth)
            ])
        ).alias("rb")
    )
    return rows.groupBy(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket")).agg(
        F.count("*").alias("cnt")
    )


def cms_estimate(
    counters: DataFrame,
    items: DataFrame,
    item_col: str = "token",
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
) -> DataFrame:
    """Point estimates for ``items``: est(t) = min over rows of the counter
    at (row, h_row(t)). The counter table is tiny (d*w) — broadcast; items
    never shuffle. CMS guarantee: est >= true count, always.

    Output: items' columns + est:long.
    """
    probes = items.select(
        "*",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(r).alias("row"),
                    _bucket(F.col(item_col), r, width).alias("bucket"),
                )
                for r in range(depth)
            ])
        ).alias("rb"),
    ).select("*", F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket")).drop("rb")
    joined = probes.join(F.broadcast(counters), ["row", "bucket"], "left").fillna(
        0, subset=["cnt"]
    )
    return joined.groupBy(item_col).agg(F.min("cnt").alias("est"))


def cms_topk_tokens(
    df: DataFrame,
    text_col: str = "text",
    k: int = 20,
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
) -> DataFrame:
    """Demonstration query: estimate every distinct token through the sketch
    and return the top-k by estimate (est DESC, token ASC), alongside the
    EXACT count so the never-underestimates invariant is visible
    (est >= exact, by construction). Real 100 TB use estimates a small
    candidate set — the sketch's point is that the counter state is bounded;
    the estimate-all-distinct form here is the checkable worst case.

    Output: (token, est:bigint, exact:bigint) top-k.
    """
    counters = cms_build(df, text_col, width, depth)
    toks = df.select(F.explode(tokens_col(F.col(text_col))).alias("token"))
    exact = toks.groupBy("token").agg(F.count("*").alias("exact"))
    est = cms_estimate(counters, exact.select("token"), "token", width, depth)
    return (
        exact.join(est, "token")
        .orderBy(F.desc("est"), F.asc("token"))
        .limit(k)
        .select("token", "est", "exact")
    )


def cms_topk_tokens_sql(
    text_expr: str,
    from_table: str,
    k: int = 20,
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
) -> str:
    """DuckDB twin of cms_topk_tokens: same row-salted md5 buckets, same
    min-over-rows estimate, same deterministic cut."""
    toks = whitespace_tokens_sql(text_expr)
    inc_rows = " UNION ALL ".join(
        f"SELECT {r} AS row, {_bucket_sql('token', r, width)} AS bucket FROM toks"
        for r in range(depth)
    )
    probe_rows = " UNION ALL ".join(
        f"SELECT token, {r} AS row, {_bucket_sql('token', r, width)} AS bucket FROM dtok"
        for r in range(depth)
    )
    return f"""
        WITH toks AS (
            SELECT unnest({toks}) AS token FROM {from_table}
        ),
        counters AS (
            SELECT row, bucket, count(*)::BIGINT AS cnt
            FROM ({inc_rows}) GROUP BY row, bucket
        ),
        exact AS (
            SELECT token, count(*)::BIGINT AS exact FROM toks GROUP BY token
        ),
        dtok AS (SELECT DISTINCT token FROM toks),
        probes AS ({probe_rows}),
        est AS (
            SELECT token, min(coalesce(c.cnt, 0))::BIGINT AS est
            FROM probes LEFT JOIN counters c USING (row, bucket)
            GROUP BY token
        )
        SELECT token, est, exact
        FROM exact JOIN est USING (token)
        ORDER BY est DESC, token ASC LIMIT {k}
    """
