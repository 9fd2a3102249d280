"""T5 fetch retry: UDF-internal retry with an injectable flaky transport.

Gate from VERDICT r1 #10: transient failures (503/exception) are retried
<= total times with urllib3-style backoff; permanent answers (404) are NOT
retried; a permanently-failing URL still enters ``seen`` (quirk Q5) but
yields no page; with a flaky-but-recovering transport the crawl result is
IDENTICAL to the clean-transport crawl.
"""

from web2llmstxt_spark import schemas
from web2llmstxt_spark.functions import kernels
from web2llmstxt_spark.operators.frontier import FrontierCrawler
from web2llmstxt_spark.operators.retry import (
    RetryingFetcher,
    corpus_transport,
    fetch_with_retry,
)
from web2llmstxt_spark.oracle.crawl_oracle import CrawlConfig, crawl
from web2llmstxt_spark.sources.corpus import generate_corpus


def _pages_dict(corpus):
    return {
        u: {
            "title": p.title,
            "content": p.content,
            "out_links": list(p.out_links),
            "fetch_ok": p.fetch_ok,
        }
        for u, p in corpus.pages.items()
    }


def _flaky_twice():
    """Deterministic per-URL transient-failure count in {0,1,2} (< total=3).

    Returned as a nested closure so cloudpickle serializes it BY VALUE —
    a test-module-level function would pickle by reference and executors
    cannot import the test module.
    """

    def flaky(url):
        return kernels.host_bucket(url, 3)

    return flaky


def test_retry_kernel_policy():
    calls, sleeps = [], []

    def transport(url, attempt):
        calls.append(attempt)
        if attempt <= 2:
            return {"status": 503}
        return {"status": 200, "title": "t", "content": "c", "out_links": []}

    r = fetch_with_retry(transport, "u", total=3, backoff_factor=1.0, sleep=sleeps.append)
    assert r["success"] and r["attempts"] == 3 and calls == [1, 2, 3]
    assert sleeps == [1.0, 2.0]  # backoff_factor * 2**(i-1)

    # permanent status: no retry
    r = fetch_with_retry(lambda u, a: {"status": 404}, "u", total=3, sleep=sleeps.append)
    assert not r["success"] and r["attempts"] == 1

    # exhaustion: 1 + total attempts, then give up
    n = []
    r = fetch_with_retry(lambda u, a: n.append(a) or {"status": 503}, "u", total=3)
    assert not r["success"] and r["attempts"] == 4 and n == [1, 2, 3, 4]

    # transport exceptions are retryable
    def boom(url, attempt):
        if attempt == 1:
            raise ConnectionError("reset")
        return {"status": 200, "title": "t", "content": "c", "out_links": []}

    r = fetch_with_retry(boom, "u", total=3)
    assert r["success"] and r["attempts"] == 2


def test_flaky_transport_crawl_equals_clean_crawl(spark):
    """Retry inside the UDF absorbs transient failures: the flaky-transport
    crawl is page-for-page identical to the oracle (clean) crawl."""
    corpus = generate_corpus(seed=47, n_hosts=1, pages_per_host=25)
    pages = _pages_dict(corpus)
    cfg = CrawlConfig(max_pages=8)
    site = spark.createDataFrame(corpus.site_pages_rows(), schemas.SITE_PAGES).cache()

    fetcher = RetryingFetcher(
        corpus_transport(pages, flaky_after=_flaky_twice()), total=3, sleep=None
    )
    engine = FrontierCrawler(spark, site, cfg, fetcher=fetcher)
    pages_df, seen_df = engine.crawl([(sid, url) for sid, url, _ in corpus.seeds])
    oracle = crawl(corpus, cfg)
    got = [r.asDict() for r in pages_df.orderBy("rank").collect()]
    assert [p["url"] for p in got] == oracle.order
    for e, o in zip(got, oracle.pages):
        for f in ("url", "title", "content", "word_count", "score", "depth"):
            assert e[f] == o[f]
    assert {r.url for r in seen_df.collect()} == oracle.seen


def test_permanent_failure_enters_seen_not_pages(spark):
    """A URL whose endpoint 500s on every attempt exhausts retries, enters
    seen (Q5), and is never emitted as a page — same as the oracle treats
    fetch_ok=False."""
    corpus = generate_corpus(seed=49, n_hosts=1, pages_per_host=25)
    sick = [u for u, p in corpus.pages.items() if not p.fetch_ok]
    assert sick, "corpus should contain fetch_ok=False pages"
    pages = _pages_dict(corpus)
    cfg = CrawlConfig(max_pages=10)
    site = spark.createDataFrame(corpus.site_pages_rows(), schemas.SITE_PAGES).cache()
    fetcher = RetryingFetcher(corpus_transport(pages), total=2, sleep=None)
    engine = FrontierCrawler(spark, site, cfg, fetcher=fetcher)
    pages_df, seen_df = engine.crawl([(sid, url) for sid, url, _ in corpus.seeds])
    oracle = crawl(corpus, cfg)
    assert [r.url for r in pages_df.orderBy("rank").collect()] == oracle.order
    assert {r.url for r in seen_df.collect()} == oracle.seen
    crawled_sick = set(sick) & {r.url for r in seen_df.collect()}
    assert not crawled_sick & {r.url for r in pages_df.collect()}
