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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, (build, _sql) in REGISTRY.items():
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
