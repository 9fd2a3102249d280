"""Kill-and-resume: a crawl resumed from any superstep snapshot must produce
the identical final pages (order included) and URL-seen set (north rule)."""

import os
import shutil

from web2llmstxt_spark import schemas
from web2llmstxt_spark.oracle.crawl_oracle import CrawlConfig
from web2llmstxt_spark.operators.frontier import FrontierCrawler
from web2llmstxt_spark.sources.corpus import generate_corpus
from web2llmstxt_spark.state import checkpoint


def run_full(spark, corpus, cfg, run_dir):
    site = spark.createDataFrame(corpus.site_pages_rows(), schemas.SITE_PAGES)
    crawler = FrontierCrawler(spark, site, cfg, run_dir=run_dir)
    seeds = [(sid, url) for sid, url, _ in corpus.seeds]
    pages, seen = crawler.crawl(seeds)
    return (
        [tuple(r) for r in pages.select("rank", "url", "depth", "score").orderBy("rank").collect()],
        {r.url for r in seen.collect()},
        site,
        seeds,
    )


def test_resume_from_each_superstep(spark, tmp_path):
    corpus = generate_corpus(seed=37, n_hosts=1, pages_per_host=30)
    cfg = CrawlConfig(max_pages=8)
    run_dir = str(tmp_path / "full")
    full_pages, full_seen, site, seeds = run_full(spark, corpus, cfg, run_dir)
    last = checkpoint.last_complete_superstep(run_dir)
    assert last is not None and last >= 1

    for cut in range(0, last + 1):
        # simulate a crash right after superstep `cut`: copy the prefix of
        # the snapshot history into a fresh run_dir and resume there
        resume_dir = str(tmp_path / f"resume_{cut}")
        os.makedirs(resume_dir)
        for n in range(cut + 1):
            src = os.path.join(run_dir, f"superstep={n}")
            shutil.copytree(src, os.path.join(resume_dir, f"superstep={n}"))
        pages, seen = checkpoint.resume_crawl(spark, site, cfg, resume_dir, seeds)
        got_pages = [tuple(r) for r in pages.select("rank", "url", "depth", "score").orderBy("rank").collect()]
        got_seen = {r.url for r in seen.collect()}
        assert got_pages == full_pages, f"resume from {cut}: pages mismatch"
        assert got_seen == full_seen, f"resume from {cut}: seen mismatch"


def test_partial_snapshot_detected(spark, tmp_path):
    corpus = generate_corpus(seed=37, n_hosts=1, pages_per_host=20)
    cfg = CrawlConfig(max_pages=5)
    run_dir = str(tmp_path / "p")
    run_full(spark, corpus, cfg, run_dir)
    last = checkpoint.last_complete_superstep(run_dir)
    assert last >= 1
    # crash after `seen` write: _COMMIT (written last) and everything after
    # the crash point are absent — the snapshot must roll back a superstep
    os.remove(os.path.join(run_dir, f"superstep={last}", "_COMMIT"))
    os.remove(os.path.join(run_dir, f"superstep={last}", "seen", "_SUCCESS"))
    assert checkpoint.last_complete_superstep(run_dir) == last - 1


def test_crash_between_seen_and_frontier_rolls_back(spark, tmp_path):
    """The round-1 advice scenario: driver dies after pages+seen but before
    frontier. Pre-marker logic deemed the snapshot complete and resume
    silently returned a truncated crawl; the _COMMIT marker must reject it
    and resume must still reproduce the full result."""
    corpus = generate_corpus(seed=37, n_hosts=1, pages_per_host=30)
    cfg = CrawlConfig(max_pages=8)
    run_dir = str(tmp_path / "full")
    full_pages, full_seen, site, seeds = run_full(spark, corpus, cfg, run_dir)
    last = checkpoint.last_complete_superstep(run_dir)
    assert last >= 1

    crash_dir = str(tmp_path / "crash")
    os.makedirs(crash_dir)
    for n in range(last + 1):
        shutil.copytree(
            os.path.join(run_dir, f"superstep={n}"),
            os.path.join(crash_dir, f"superstep={n}"),
        )
    # superstep `last` crashed mid-write: frontier + metrics + _COMMIT missing
    shutil.rmtree(os.path.join(crash_dir, f"superstep={last}", "frontier"))
    os.remove(os.path.join(crash_dir, f"superstep={last}", "_COMMIT"))
    assert checkpoint.last_complete_superstep(crash_dir) == last - 1

    pages, seen = checkpoint.resume_crawl(spark, site, cfg, crash_dir, seeds)
    got_pages = [tuple(r) for r in pages.select("rank", "url", "depth", "score").orderBy("rank").collect()]
    got_seen = {r.url for r in seen.collect()}
    assert got_pages == full_pages
    assert got_seen == full_seen


def test_snapshot_metrics_carry_partition_lineage(spark, tmp_path):
    """Every committed superstep's metrics.json records per-partition
    (host-hash bucket) frontier and page counts whose totals equal the
    snapshotted state tables (north rule: per-partition lineage + metrics)."""
    import json

    corpus = generate_corpus(seed=41, n_hosts=2, pages_per_host=20)
    cfg = CrawlConfig(max_pages=6)
    run_dir = str(tmp_path / "lineage")
    run_full(spark, corpus, cfg, run_dir)
    last = checkpoint.last_complete_superstep(run_dir)
    assert last is not None and last >= 1

    for n in range(last + 1):
        base = os.path.join(run_dir, f"superstep={n}")
        with open(os.path.join(base, "metrics.json")) as f:
            m = json.load(f)
        fr = spark.read.parquet(os.path.join(base, "frontier"))
        pg = spark.read.parquet(os.path.join(base, "pages"))
        assert sum(m["frontier_by_bucket"].values()) == fr.count()
        assert sum(m["pages_by_bucket"].values()) == pg.count()
        # bucket ids are valid state-partition ids (default num_buckets=32)
        assert all(0 <= int(k) < 32 for k in m["frontier_by_bucket"])
        assert all(0 <= int(k) < 32 for k in m["pages_by_bucket"])
