"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query (the frontier priority-ordering pipeline:
  C1 scoring -> threshold filter -> priority sort -> budget limit) over
  /root/testdata/sf0.001.
- ``queries()``: one entry per implemented operator (SURVEY.md §2 +
  training-data extensions), from web2llmstxt_spark.plans.queries.REGISTRY.
- ``oracle_sql()``: the DuckDB twins for every SQL-expressible entry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from web2llmstxt_spark.plans.queries import REGISTRY, q_frontier_topk  # noqa: E402


def _ensure_pkg(spark: SparkSession) -> None:
    """Ship the package to executor workers (pandas UDFs import it)."""
    from web2llmstxt_spark.session import package_zip

    try:
        spark.sparkContext.addPyFile(package_zip())
    except Exception:
        pass  # already added for this context


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _ensure_pkg(spark)
    return q_frontier_topk(spark, "/root/testdata/sf0.001")


# The driver's CORRECTNESS run checks a bounded prefix of this dict (50
# entries in r4 and r5). Rotation rule (window hygiene, r5 verdict #5): list
# FIRST the registry queries that were OUTSIDE the previous round's checked
# window, so every entry gets a fresh driver row within two rounds. These 33
# are exactly REGISTRY minus CORRECTNESS_r05.json's key set (they are green
# under scripts/check_oracles.py at this HEAD).
DRIVER_PRIORITY = [
    "jaccard_verify", "dedup_components", "embed_neardup", "quality_scores",
    "fingerprints", "token_stats", "bpe_token_hist", "ann_topk", "simhash",
    "lang_detect", "ann_ivf", "ann_lsh", "pipeline_e2e", "media_features",
    "audio_features", "video_frames", "image_neardup", "audio_neardup",
    "video_neardup", "span_roundtrip", "robots_filter", "pagination_discover",
    "politeness_cap", "decontam", "repetition_filter", "stratified_sample",
    "mixture_sample", "pii_scrub", "line_dedup", "substring_dedup",
    "substring_scrub", "bm25_search", "text_embed",
]


def _registry_order() -> list[str]:
    rest = [n for n in REGISTRY if n not in DRIVER_PRIORITY]
    return [n for n in DRIVER_PRIORITY if n in REGISTRY] + rest


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name in _registry_order():
        build = REGISTRY[name][0]

        def wrapped(spark, sf_dir, _b=build):
            _ensure_pkg(spark)
            return _b(spark, sf_dir)

        out[name] = wrapped
    return out


def oracle_sql() -> dict[str, str]:
    return {
        name: sql_fn()
        for name, (_b, sql_fn) in REGISTRY.items()
        if sql_fn is not None
    }
