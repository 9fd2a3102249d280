"""BestFirst strategy parity: Spark engine vs the pinned pure-Python oracle.

Covers the verdict-r1 gap: the reference's default non-systematic crawl path
(``crawl_website``, v1 crawler/web_crawler.py:192-369; v2
llmsgen/crawler/web_crawler.py:251+ (pyc)) — keyword-relevance ordering,
depth-by-max_pages selection, strict wc>50 gate, budget on attempts.
"""

import pytest

from web2llmstxt_spark import schemas
from web2llmstxt_spark.functions import kernels
from web2llmstxt_spark.oracle.bestfirst_oracle import (
    crawl_bestfirst,
    depth_for_max_pages,
)
from web2llmstxt_spark.operators.bestfirst import BestFirstCrawler
from web2llmstxt_spark.sources.corpus import generate_corpus

PAGE_FIELDS = ["url", "title", "content", "word_count", "score", "depth", "discovery_phase"]


def run_both(spark, corpus, base_url, max_pages, batch_size, max_depth=None, **kw):
    oracle = crawl_bestfirst(
        corpus, base_url, max_pages=max_pages, batch_size=batch_size, max_depth=max_depth
    )
    site = spark.createDataFrame(corpus.site_pages_rows(), schemas.SITE_PAGES).cache()
    engine = BestFirstCrawler(
        spark, site, base_url, max_pages=max_pages, batch_size=batch_size,
        max_depth=max_depth, **kw
    )
    pages_df, seen_df = engine.crawl()
    engine_pages = [r.asDict() for r in pages_df.orderBy("rank").collect()]
    engine_seen = {r.url for r in seen_df.collect()}
    return oracle, engine_pages, engine_seen


def assert_parity(oracle, engine_pages, engine_seen):
    assert engine_seen == oracle.seen, (
        f"seen: only_engine={sorted(engine_seen - oracle.seen)[:5]} "
        f"only_oracle={sorted(oracle.seen - engine_seen)[:5]}"
    )
    assert len(engine_pages) == len(oracle.pages)
    for i, (e, o) in enumerate(zip(engine_pages, oracle.pages)):
        for f in PAGE_FIELDS:
            assert e[f] == o[f], f"rank {i} field {f}: engine={e[f]!r} oracle={o[f]!r}"


def test_depth_selection_consts():
    # v2 pyc consts: 100, 4, 50, 3, 2
    assert depth_for_max_pages(101) == 4
    assert depth_for_max_pages(100) == 3
    assert depth_for_max_pages(51) == 3
    assert depth_for_max_pages(50) == 2
    assert depth_for_max_pages(10) == 2


def test_keyword_scorer_kernel():
    kws = kernels.bestfirst_keywords("https://www.acme.example/")
    assert kws[-1] == "acme" and len(kws) == 24
    # hits: 'api' + 'reference' (both in 'api-reference') + 'acme' = 3
    assert kernels.keyword_relevance_score(
        "https://acme.example/docs/api-reference", kws
    ) == 3 / 24
    assert kernels.keyword_relevance_score("https://other.example/x", kws) == 0.0


def test_exact_bestfirst_batch1(spark):
    """batch_size=1 is EXACT best-first (one pop per superstep)."""
    corpus = generate_corpus(seed=31, n_hosts=1, pages_per_host=25)
    base = corpus.seeds[0][1]
    assert_parity(*run_both(spark, corpus, base, max_pages=8, batch_size=1))


def test_batched_bestfirst_default(spark):
    """The library's own batch shape (10)."""
    corpus = generate_corpus(seed=33, n_hosts=1, pages_per_host=30)
    base = corpus.seeds[0][1]
    assert_parity(*run_both(spark, corpus, base, max_pages=25, batch_size=10))


def test_udf_keyword_scorer_parity(spark):
    """The native JVM keyword scorer is the default since r4; the pandas-UDF
    kernel stays as the bit-exactness oracle twin and must still match."""
    corpus = generate_corpus(seed=33, n_hosts=1, pages_per_host=30)
    base = corpus.seeds[0][1]
    assert_parity(*run_both(
        spark, corpus, base, max_pages=25, batch_size=10, use_native_scorer=False
    ))


def test_budget_counts_attempts_not_pages(spark):
    """max_pages bounds ATTEMPTS (failed fetches included)."""
    corpus = generate_corpus(seed=35, n_hosts=2, pages_per_host=25)
    base = corpus.seeds[0][1]
    oracle, engine_pages, engine_seen = run_both(
        spark, corpus, base, max_pages=12, batch_size=5
    )
    assert_parity(oracle, engine_pages, engine_seen)
    assert oracle.attempted <= 12
    # the strict wc>50 gate means kept <= attempted
    assert len(engine_pages) <= oracle.attempted


def test_depth_limit_no_expansion(spark):
    """max_depth=1: only the seed's own links are ever crawled."""
    corpus = generate_corpus(seed=37, n_hosts=1, pages_per_host=25)
    base = corpus.seeds[0][1]
    oracle, engine_pages, engine_seen = run_both(
        spark, corpus, base, max_pages=30, batch_size=10, max_depth=1
    )
    assert_parity(oracle, engine_pages, engine_seen)
    assert all(p["depth"] <= 1 for p in engine_pages)


def test_pipeline_bestfirst_dispatch(spark, tmp_path):
    """generate_llmstxt(crawl_strategy='bestfirst') runs end-to-end and
    stamps crawl_strategy_used (v2 generator dispatch)."""
    from web2llmstxt_spark.plans.pipeline import generate_llmstxt

    corpus = generate_corpus(seed=39, n_hosts=1, pages_per_host=25)
    base = corpus.seeds[0][1]
    site = spark.createDataFrame(corpus.site_pages_rows(), schemas.SITE_PAGES).cache()
    res = generate_llmstxt(
        spark, site, base, str(tmp_path), max_pages=10,
        crawl_strategy="bestfirst", collect_entries=True,
    )
    assert res["metadata"]["crawl_strategy_used"] == "bestfirst"
    oracle = crawl_bestfirst(corpus, base, max_pages=10, batch_size=10)
    assert [p["url"] for p in res["pages"]] == oracle.order


def test_large_budget_auto_batch_bounded_supersteps(spark):
    """A large-budget best-first crawl with the distributed-rank pop must
    (a) complete in O(budget/B + max_depth) supersteps — NOT budget/10
    sequential round-trips — and (b) stay page-for-page parity-exact with
    the oracle at the same B (the documented ordering deviation is vs
    batch=10, not vs determinism)."""
    from web2llmstxt_spark.operators.bestfirst import LARGE_BATCH, auto_batch_size

    corpus = generate_corpus(seed=83, n_hosts=1, pages_per_host=4000)
    base_url = corpus.seeds[0][1]
    budget = 1500
    b = LARGE_BATCH + 1  # force the two-pass distributed rank pop path
    oracle = crawl_bestfirst(corpus, base_url, max_pages=budget, batch_size=b)
    assert oracle.attempted >= 1000  # the corpus binds the claim meaningfully
    site = spark.createDataFrame(corpus.site_pages_rows(), schemas.SITE_PAGES).cache()
    engine = BestFirstCrawler(spark, site, base_url, max_pages=budget, batch_size=b)
    pages_df, seen_df = engine.crawl()
    engine_pages = [r.asDict() for r in pages_df.orderBy("rank").collect()]
    engine_seen = {r.url for r in seen_df.collect()}
    assert_parity(oracle, engine_pages, engine_seen)
    # superstep bound: ceil(attempted/B) budget steps + depth-limited
    # frontier ramp — NOT attempted/10 sequential driver round-trips
    max_steps = -(-oracle.attempted // b) + engine.max_depth + 1
    assert len(engine.metrics) <= max_steps, (len(engine.metrics), max_steps)

    # the auto dispatch picks a proportional batch, never below 10
    assert auto_batch_size(100_000) == 6250
    assert auto_batch_size(50) == 10
    auto_engine = BestFirstCrawler(spark, site, base_url, max_pages=budget, batch_size="auto")
    assert auto_engine.batch_size == auto_batch_size(budget) == 94


def test_pipeline_auto_batch_large_budget(spark, tmp_path, monkeypatch):
    """End-to-end auto-batch dispatch (r3 verdict #8): generate_llmstxt(
    crawl_strategy='bestfirst', bestfirst_batch_size='auto') at a 10^4 budget
    must (a) pick the proportional batch, (b) complete in
    <= AUTO_BATCH_TARGET_STEPS + depth-ramp supersteps — not budget/10
    driver round-trips — and (c) stay page-for-page parity with the oracle
    at the dispatched B."""
    from web2llmstxt_spark.operators import bestfirst as bf_mod
    from web2llmstxt_spark.plans.pipeline import generate_llmstxt

    captured = {}
    real = bf_mod.BestFirstCrawler

    class Capturing(real):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            captured["engine"] = self

    monkeypatch.setattr(bf_mod, "BestFirstCrawler", Capturing)
    corpus = generate_corpus(seed=83, n_hosts=1, pages_per_host=4000)
    base = corpus.seeds[0][1]
    site = spark.createDataFrame(corpus.site_pages_rows(), schemas.SITE_PAGES).cache()
    budget = 10_000
    res = generate_llmstxt(
        spark, site, base, str(tmp_path), max_pages=budget,
        crawl_strategy="bestfirst", bestfirst_batch_size="auto",
        collect_entries=True,
    )
    eng = captured["engine"]
    assert eng.batch_size == bf_mod.auto_batch_size(budget) == 625
    oracle = crawl_bestfirst(corpus, base, max_pages=budget, batch_size=eng.batch_size)
    max_steps = bf_mod.AUTO_BATCH_TARGET_STEPS + eng.max_depth + 1
    assert len(eng.metrics) <= max_steps, (len(eng.metrics), max_steps)
    assert [p["url"] for p in res["pages"]] == oracle.order
