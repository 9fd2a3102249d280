"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Also times one end-to-end frontier crawl over a seeded synthetic web
(reported as the "crawl" query + "urls_per_sec" extra field — the north-rule
throughput figure). Scaling evidence (N vs 4N cores) lives in
scripts/bench_scaling.py -> BENCH_SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from web2llmstxt_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "frontier_topk",
    "bestfirst_order",
    "pricing_summary",
    "join_enrich",
    "seen_antijoin",
    "dedup_exact",
    "minhash",
    "lsh_pairs",
    "jaccard_verify",
    "dedup_components",
    "embed_neardup",
    "quality_scores",
    "fingerprints",
    "events_window",
    "events_sessionize",
    "bpe_token_hist",
    "ann_topk",
    "categorize",
    "media_features",
    "media_features_jpeg",
    "media_features_gif",
    "media_meta_mp3",
    "media_meta_mp4",
    "mp4_sample_index",
    "media_meta_webp",
    "gif_frames",
    "span_roundtrip",
    "robots_filter",
    "politeness_cap",
    "decontam",
    "repetition_filter",
    "stratified_sample",
    "mixture_sample",
    "pii_scrub",
    "line_dedup",
    "substring_dedup",
    "substring_scrub",
    "bm25_search",
    "text_embed",
    "pack_sequences",
    "lm_xent",
    "c4_clean",
    "curate_e2e",
    "snapshot_diff",
    "semdedup",
    "dsir_select",
    "cms_topk",
    "hll_distinct",
    "length_quantiles",
    # full-registry tail: every remaining driver-checked query, so BENCH
    # covers the complete operator surface, not a curated subset
    "ann_ivf",
    "ann_lsh",
    "ann_pq",
    "audio_features",
    "events_by_type",
    "events_props",
    "frontier_topk_v1",
    "lang_detect",
    "link_pagerank",
    "pagination_discover",
    "pipeline_e2e",
    "quality_filter",
    "seen_antijoin_cuckoo",
    "simhash",
    "sitemap_order",
    "token_stats",
    "video_frames",
    "image_neardup",
    "audio_neardup",
    "video_neardup",
    "url_canon_cluster",
    "warc_parse",
    "recrawl_schedule",
    "bpe_merges",
    "warc_cdx",
    "crawl_traps",
    "host_mirrors",
    "feed_discover",
    "anchor_texts",
    "bpe_encode_stats",
    "warc_revisit",
    "robots_policies",
    "url_templates",
    "host_pagerank",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def run_crawl_bench(spark, n_hosts=12, pages_per_host=120, max_pages=150) -> tuple[float, int]:
    """One frontier crawl over a synthetic web; returns (sec, urls_attempted)."""
    from web2llmstxt_spark import schemas
    from web2llmstxt_spark.oracle.crawl_oracle import CrawlConfig
    from web2llmstxt_spark.operators.frontier import FrontierCrawler
    from web2llmstxt_spark.sources.corpus import generate_corpus

    corpus = generate_corpus(seed=42, n_hosts=n_hosts, pages_per_host=pages_per_host,
                             skew_factor=3)
    site = spark.createDataFrame(corpus.site_pages_rows(), schemas.SITE_PAGES)
    site = site.repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32"))).cache()
    site.count()
    cfg = CrawlConfig(max_pages=max_pages)
    seeds = [(sid, url) for sid, url, _ in corpus.seeds]
    t0 = time.time()
    crawler = FrontierCrawler(spark, site, cfg, use_bloom=True, run_dir=None)
    pages, seen = crawler.crawl(seeds)
    n_pages = pages.count()
    n_seen = seen.count()
    dt = time.time() - t0
    assert n_pages > 0
    return dt, n_seen


def run_suite(spark, sf_dir: str) -> tuple[dict[str, float], int]:
    """One full pass over the headline queries + crawl; per-item seconds."""
    from web2llmstxt_spark.plans.queries import REGISTRY

    timings: dict[str, float] = {}
    for name in HEADLINE:
        build = REGISTRY[name][0]
        t0 = time.time()
        materialize(build(spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)
    crawl_sec, urls = run_crawl_bench(spark)
    timings["crawl"] = round(crawl_sec, 3)
    return timings, urls


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # the sandbox machine's hour-scale variance is ~2x (BENCH_SCALING.md), so
    # a single rep can't be compared round over round: run N full passes and
    # report per-query BEST-OF plus the observed spread
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("bench", cores=cores)

    from web2llmstxt_spark.plans.queries import REGISTRY

    # warm the JVM + parquet footers once
    materialize(REGISTRY["pricing_summary"][0](spark, sf_dir))

    runs: list[dict[str, float]] = []
    urls = 0
    for _ in range(reps):
        timings, urls = run_suite(spark, sf_dir)
        runs.append(timings)

    best = {k: min(r[k] for r in runs) for k in runs[0]}
    spread = {k: [min(r[k] for r in runs), max(r[k] for r in runs)] for k in runs[0]}
    total = round(sum(best.values()), 3)
    line = json.dumps(
        {
            "metric": "headline_suite_sec",
            "value": total,
            "unit": "sec",
            "queries": best,
            "sf": float(sf),
            "urls_per_sec": round(urls / best["crawl"], 2),
            "cores": cores,
            "reps": reps,
            "spread": spread,
        }
    )
    print(line)
    # r4 verdict #8: BENCH_r04's stdout tail was truncated and parsed null —
    # always ALSO write the line to a file so round-over-round comparison
    # never depends on a log tail ($SPARK_GRAFT_BENCH_OUT overrides).
    out_path = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LATEST.json"),
    )
    try:
        with open(out_path, "w", encoding="utf-8") as f:
            f.write(line + "\n")
    except OSError as e:
        print(f"bench: could not write {out_path}: {e}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
