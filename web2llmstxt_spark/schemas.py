"""Engine schemas (SURVEY.md §1; BASELINE.json input_hint).

The reference flows schemaless Python dicts (crawler/web_crawler.py:116-127);
here every stage has a fixed StructType so Catalyst can prune/push down.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: One interleaved text/media span (BASELINE.json input_hint, verbatim shape).
SPAN = StructType(
    [
        StructField("kind", StringType(), False),       # heading|text|image|link|code
        StructField("text", StringType(), True),        # '' for pure media spans
        StructField("media_ref", StringType(), True),   # asset URL / href, else ''
        StructField("offset", IntegerType(), False),    # 0-based document order
    ]
)

#: The authoritative input table of interleaved documents.
DOCUMENTS = StructType(
    [
        StructField("doc_id", StringType(), False),     # normalized page URL
        StructField("spans", ArrayType(SPAN), False),
    ]
)

#: The synthetic web the frontier crawls (fetch = join on normalized URL).
#: Replaces live HTTP (crawler.arun, crawler/web_crawler.py:93-103).
SITE_PAGES = StructType(
    [
        StructField("url", StringType(), False),        # canonical (normalized) URL
        StructField("host", StringType(), False),
        StructField("title", StringType(), True),
        StructField("spans", ArrayType(SPAN), False),
        StructField("word_count", IntegerType(), False),
        StructField("out_links", ArrayType(StringType()), False),  # raw hrefs
        StructField("content_type", StringType(), False),
        StructField("fetch_ok", BooleanType(), False),  # False => quirk Q5 path
    ]
)

SEEDS = StructType(
    [
        StructField("seed_id", IntegerType(), False),
        StructField("url", StringType(), False),
        StructField("priority", DoubleType(), False),
    ]
)

ROBOTS_RULES = StructType(
    [
        StructField("host", StringType(), False),
        StructField("agent", StringType(), False),
        StructField("rule", StringType(), False),       # 'allow' | 'disallow'
        StructField("path_prefix", StringType(), False),
    ]
)

HOST_POLICIES = StructType(
    [
        StructField("host", StringType(), False),
        StructField("max_rps", DoubleType(), False),
        StructField("max_urls_per_superstep", IntegerType(), False),
        StructField("crawl_delay_ms", IntegerType(), False),
    ]
)

SITEMAP_ENTRIES = StructType(
    [
        StructField("sitemap_url", StringType(), False),
        StructField("parent_sitemap", StringType(), True),
        StructField("url", StringType(), False),
        StructField("is_index", BooleanType(), False),
    ]
)

#: Crawled page record (SURVEY.md §1.1 "Page";
#: ref llmsgen/crawler/web_crawler.py:203,238 (pyc)).
PAGES = StructType(
    [
        StructField("url", StringType(), False),
        StructField("title", StringType(), True),
        StructField("content", StringType(), True),
        StructField("spans", ArrayType(SPAN), True),
        StructField("word_count", IntegerType(), False),
        StructField("score", DoubleType(), False),
        StructField("depth", IntegerType(), False),
        StructField("discovery_phase", StringType(), False),
        StructField("seed_id", IntegerType(), False),
        StructField("rank", LongType(), False),         # global crawl order
    ]
)

#: Frontier candidate rows between supersteps.
FRONTIER = StructType(
    [
        StructField("url", StringType(), False),
        StructField("host", StringType(), False),
        StructField("seed_id", IntegerType(), False),
        StructField("base_url", StringType(), False),
        StructField("base_domain", StringType(), False),
    ]
)

#: URL-seen state (exact side; Bloom bitmaps are kept per host-bucket).
SEEN = StructType(
    [
        StructField("url", StringType(), False),
        StructField("bucket", IntegerType(), False),
    ]
)

#: Per-superstep, per-partition lineage + metrics (north rule).
METRICS = StructType(
    [
        StructField("run_id", StringType(), False),
        StructField("superstep", IntegerType(), False),
        StructField("bucket", IntegerType(), False),
        StructField("candidates", LongType(), False),
        StructField("attempted", LongType(), False),
        StructField("fetched_ok", LongType(), False),
        StructField("pages_kept", LongType(), False),
        StructField("links_discovered", LongType(), False),
        StructField("wall_ms", LongType(), False),
    ]
)
