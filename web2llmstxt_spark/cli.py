"""Command-line entry point — the reference's ``run.py`` flow, Spark-native.

Mirrors the reference CLI surface (run.py:85-115 / start.py:178: url,
max_pages, export format, full text, crawling mode, sitemap url) minus the
interactive prompts. The page source is either a site-table parquet
(production shape) or the seeded synthetic corpus (sandbox default — no
network, same generator the tests use).

    python -m web2llmstxt_spark.cli crawl --seed https://ex0.example/ \
        --max-pages 10 --out /tmp/out
    python -m web2llmstxt_spark.cli crawl --site-parquet site.parquet \
        --seed https://bh0.example/ --strategy bestfirst --format json \
        --full-text --out /tmp/out
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="web2llmstxt_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("crawl", help="crawl a site table and write llms.txt outputs")
    c.add_argument("--seed", required=True, help="base URL (the crawl seed)")
    c.add_argument("--out", required=True, help="output directory")
    c.add_argument("--max-pages", type=int, default=50)
    c.add_argument("--strategy", choices=["systematic", "bestfirst", "sitemap"],
                   default="systematic")
    c.add_argument("--format", dest="export_format",
                   choices=["text", "json", "yaml"], default="text")
    c.add_argument("--full-text", action="store_true",
                   help="also write llms-full.txt (include_full_text)")
    c.add_argument("--full-text-only", action="store_true")
    c.add_argument("--style", choices=["v2", "v1"], default="v2",
                   help="text output format variant")
    c.add_argument("--desc-cache-dir", default=None,
                   help="parquet description-cache table (T4)")
    c.add_argument("--seen-filter", choices=["bloom", "cuckoo"], default="bloom",
                   help="URL-seen prefilter for the systematic engine "
                        "(cuckoo supports deletion; both correctness-neutral)")
    c.add_argument("--site-parquet", default=None,
                   help="site_pages parquet (url, host, title, spans, "
                        "word_count, out_links, content_type, fetch_ok); "
                        "omitted -> seeded synthetic corpus")
    c.add_argument("--corpus-seed", type=int, default=7,
                   help="synthetic corpus RNG seed (no --site-parquet)")
    c.add_argument("--n-hosts", type=int, default=1)
    c.add_argument("--pages-per-host", type=int, default=25)
    c.add_argument("--cores", type=int, default=None,
                   help="local[N] cores (default $SPARK_GRAFT_CPUS or 32)")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from .session import CACHE_LEVEL, get_spark

    spark = get_spark("cli", cores=args.cores)
    try:
        sitemap_blobs = None
        robots_text = None
        if args.site_parquet:
            site = spark.read.parquet(args.site_parquet)
            if args.strategy == "sitemap":
                raise SystemExit(
                    "--strategy sitemap with --site-parquet needs a sitemap "
                    "blob table; use the API (generate_llmstxt(sitemap_blobs=…))"
                )
        else:
            from . import schemas
            from .sources.corpus import generate_corpus, render_sitemap_blobs

            corpus = generate_corpus(
                seed=args.corpus_seed,
                n_hosts=args.n_hosts,
                pages_per_host=args.pages_per_host,
            )
            site = spark.createDataFrame(corpus.site_pages_rows(), schemas.SITE_PAGES).persist(CACHE_LEVEL)
            if args.strategy == "sitemap":
                sitemap_blobs = spark.createDataFrame(
                    render_sitemap_blobs(corpus), "sitemap_url string, body binary"
                )
                robots_text = f"Sitemap: {args.seed.rstrip('/')}/sitemap.xml\n"

        from .plans.pipeline import generate_llmstxt

        res = generate_llmstxt(
            spark,
            site,
            args.seed,
            args.out,
            max_pages=args.max_pages,
            export_format=args.export_format,
            include_full_text=args.full_text,
            full_text_only=args.full_text_only,
            crawl_strategy=args.strategy,
            desc_cache_dir=args.desc_cache_dir,
            seen_filter=args.seen_filter,
            output_style=args.style,
            sitemap_blobs=sitemap_blobs,
            robots_text=robots_text,
        )
        print(json.dumps({
            "paths": res["paths"],
            "pages": len(res["pages"]),
            "entries": len(res["entries"]),
            "strategy": res["metadata"]["crawl_strategy_used"],
            "processing_time_seconds": res["metadata"]["processing_time_seconds"],
        }))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
