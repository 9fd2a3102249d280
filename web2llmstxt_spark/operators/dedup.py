"""Deduplication operators for large-scale training-data pipelines.

Exact (hash-groupBy), MinHash+LSH (shingle -> minhash -> band -> bucket
join), SimHash, and n-gram Jaccard verification. Engine extensions beyond
the reference (which only dedups exact URLs via a set — J1/J3,
llmsgen/crawler/web_crawler.py:215 (pyc)); these operate on document TEXT.

Scale notes:
- exact dedup is one hash-shuffle on md5(text) with map-side partial
  aggregation; at 100 TB hash the text once (md5 column) and never shuffle
  the body — only (hash, doc_id).
- MinHash signatures are embarrassingly parallel (no shuffle); LSH banding
  turns the O(n^2) pair search into groupBy(band_key) — candidate pairs only
  materialize within buckets. Band keys are md5 strings => uniform
  distribution, no skew salting needed unless the corpus has giant
  boilerplate clusters (then: cap bucket size, sample within bucket).
- determinism: signatures use lexicographic min over md5 hex digests (not
  ``hash()``), so Spark, DuckDB and the Python twin agree bit-for-bit.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

NUM_MINHASHES = 8
NUM_BANDS = 4  # rows per band = NUM_MINHASHES // NUM_BANDS


def tokens_col(text: str | F.Column):
    """Lowercased whitespace tokens (the shingle universe)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.lower(F.trim(c)), r"\s+")


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: md5-groupBy keeping the lowest id as canonical.

    Output: (text_hash, canonical_id, dup_count).
    """
    return (
        df.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count("*").alias("dup_count"),
        )
    )


def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = NUM_MINHASHES
) -> DataFrame:
    """Per-doc MinHash signature: sig_i = min over tokens of md5(token||':'||i).

    Lexicographic min over hex digests — engine-portable determinism. Pure
    Column algebra: no Python boundary, no shuffle.
    Output: (id_col, sig_0..sig_{k-1}).
    """
    toks = F.array_distinct(tokens_col(text_col))

    def sig(i: int):
        # NB: the transform lambda must take exactly ONE arg — a second arg
        # would be interpreted by Spark as the array index.
        suffix = F.lit(f":{i}")
        return F.array_min(F.transform(toks, lambda t: F.md5(F.concat(t, suffix))))

    return df.select(F.col(id_col), *[sig(i).alias(f"sig_{i}") for i in range(k)])


def minhash_sql(text_expr: str, id_expr: str, k: int = NUM_MINHASHES) -> str:
    """DuckDB twin of minhash_signatures (select-list fragment)."""
    toks = f"list_distinct(string_split_regex(lower(trim({text_expr})), '\\s+'))"
    sigs = ", ".join(
        f"list_min(list_transform({toks}, t -> md5(t || ':{i}'))) AS sig_{i}"
        for i in range(k)
    )
    return f"{id_expr} AS doc_id, {sigs}"


def lsh_bands(sig_df: DataFrame, id_col: str = "doc_id", k: int = NUM_MINHASHES,
              bands: int = NUM_BANDS) -> DataFrame:
    """Band keys: md5 of the concatenated band rows. Output (id, band, key)."""
    rows_per = k // bands
    out = []
    for b in range(bands):
        parts = [F.col(f"sig_{b * rows_per + r}") for r in range(rows_per)]
        out.append(
            sig_df.select(
                F.col(id_col),
                F.lit(b).alias("band"),
                F.md5(F.concat_ws("|", *parts)).alias("band_key"),
            )
        )
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res


def lsh_candidate_pairs(band_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Self-join within (band, band_key) buckets -> distinct (a < b) pairs."""
    left = band_df.select(F.col("band"), F.col("band_key"), F.col(id_col).alias("a"))
    right = band_df.select(F.col("band"), F.col("band_key"), F.col(id_col).alias("b"))
    return (
        left.join(right, ["band", "band_key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def ngram_jaccard(df: DataFrame, pairs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """Verify candidate pairs with exact n-gram Jaccard (Column algebra).

    Output: (a, b, jaccard). Shingles = word n-grams joined by space.
    """
    toks = tokens_col(text_col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    shingles = F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
    )
    docs = df.select(F.col(id_col), shingles.alias("sh"))
    a = docs.select(F.col(id_col).alias("a"), F.col("sh").alias("sh_a"))
    b = docs.select(F.col(id_col).alias("b"), F.col("sh").alias("sh_b"))
    joined = pairs.join(a, "a").join(b, "b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return joined.select(
        "a", "b",
        F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0)).alias("jaccard"),
    )


# ------------------------------------------------------------------- SimHash

def simhash64_py(text: str) -> int:
    """64-bit SimHash over whitespace tokens, md5-derived bit vectors.

    Returns a SIGNED 64-bit int (two's complement) so Spark LongType holds it.
    """
    acc = [0] * 64
    for tok in set((text or "").lower().split()):
        d = hashlib.md5(tok.encode("utf-8")).digest()[:8]
        v = int.from_bytes(d, "big")
        for bit in range(64):
            acc[bit] += 1 if (v >> bit) & 1 else -1
    out = 0
    for bit in range(64):
        if acc[bit] > 0:
            out |= 1 << bit
    return out - (1 << 64) if out >= (1 << 63) else out


@pandas_udf(LongType())
def simhash64_udf(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: simhash64_py(t or ""))


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Output: (id, simhash). Near-dup candidates = small Hamming distance;
    bucket by the four 16-bit chunks for sub-linear search (pigeonhole: any
    pair within Hamming distance 3 shares at least one exact chunk)."""
    out = df.select(F.col(id_col), simhash64_udf(F.col(text_col)).alias("simhash"))
    for c in range(4):
        out = out.withColumn(
            f"chunk_{c}",
            F.shiftrightunsigned(F.col("simhash"), c * 16).bitwiseAND(F.lit(0xFFFF)),
        )
    return out
