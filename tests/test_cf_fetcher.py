"""Closed-form fetcher parity: ClosedFormFetcher (mapInPandas, O(candidates))
must be byte-identical to TableFetcher (equi-join) over the parquet written
by generate_corpus_cf from the same params — including misses, fetch
failures, and the full crawl result."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from web2llmstxt_spark import schemas  # noqa: E402
from web2llmstxt_spark.operators.frontier import (  # noqa: E402
    ClosedFormFetcher,
    FrontierCrawler,
    TableFetcher,
)
from web2llmstxt_spark.oracle.crawl_oracle import CrawlConfig  # noqa: E402
from web2llmstxt_spark.sources import cfcorpus  # noqa: E402

PARAMS = dict(seed=11, n_hosts=3, pages_per_host=40, out_links=12)


@pytest.fixture(scope="module")
def cf_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cfcorpus"))
    meta = cfcorpus.generate_corpus_cf(out_dir=d, **PARAMS)
    assert meta["n_pages"] == PARAMS["n_hosts"] * PARAMS["pages_per_host"]
    return d


def _site(spark, cf_dir):
    return spark.read.parquet(os.path.join(cf_dir, "site_pages.parquet"))


def test_invert_url_roundtrip():
    p = PARAMS
    for hi in range(p["n_hosts"]):
        for i in range(0, p["pages_per_host"], 7):
            row = cfcorpus.page_fields(p["seed"], hi, i, p["pages_per_host"], p["out_links"])
            assert cfcorpus.invert_url(row["url"], p["seed"], p["n_hosts"], p["pages_per_host"]) == (hi, i)
    # non-pages must invert to None
    for bad in [
        "https://other.example/docs/x-3",
        "https://bh0.example/docs/x-999999",
        "https://bh99.example/",
        "https://bh0.example/wrong/word-3",
        "https://bh0.example/docs/x-3/",  # trailing slash is not canonical
        "http://bh0.example/",            # scheme mismatch
    ]:
        assert cfcorpus.invert_url(bad, p["seed"], p["n_hosts"], p["pages_per_host"]) is None


def test_fetch_parity_with_table(spark, cf_dir):
    p = PARAMS
    site = _site(spark, cf_dir)
    # candidates: a slice of real pages + guaranteed misses
    urls = [r.url for r in site.select("url").orderBy("url").limit(25).collect()]
    urls += ["https://bh0.example/docs/nope-999", "https://elsewhere.example/"]
    cand = spark.createDataFrame(
        [(i, u, "https://bh0.example/", "bh0.example") for i, u in enumerate(urls)],
        "seed_id int, url string, base_url string, base_domain string",
    )
    cols = ["url", "found", "success", "title", "content", "wc", "out_links", "spans"]
    table_rows = {
        r["url"]: r
        for r in TableFetcher(site).fetch(cand).select(*cols).collect()
    }
    cf_rows = {
        r["url"]: r
        for r in ClosedFormFetcher(
            p["seed"], p["n_hosts"], p["pages_per_host"], p["out_links"]
        ).fetch(cand).select(*cols).collect()
    }
    assert set(table_rows) == set(cf_rows)
    for u in table_rows:
        assert table_rows[u] == cf_rows[u], u
    assert not cf_rows["https://elsewhere.example/"]["found"]


def test_crawl_parity_between_fetchers(spark, cf_dir):
    p = PARAMS
    site = _site(spark, cf_dir)
    cfg = CrawlConfig(max_pages=60)
    seeds = [(0, "https://bh0.example/"), (1, "https://bh1.example/")]

    def run(fetcher):
        eng = FrontierCrawler(spark, site, cfg, fetcher=fetcher)
        pages, seen = eng.crawl(seeds)
        return (
            [tuple(r) for r in pages.orderBy("rank").collect()],
            {r.url for r in seen.collect()},
        )

    t_pages, t_seen = run(TableFetcher(site))
    c_pages, c_seen = run(ClosedFormFetcher(
        p["seed"], p["n_hosts"], p["pages_per_host"], p["out_links"]))
    assert t_seen == c_seen
    assert t_pages == c_pages
    assert len(t_pages) > 0
