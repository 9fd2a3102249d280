"""End-to-end pipeline: seeds -> crawl -> distill -> sinks (EP2).

Mirrors v2 ``generate_llmstxt`` (llmsgen/generator/llms_generator.py:138-209
(pyc), SURVEY.md §3-EP2): budget derivation, systematic-crawl plan select,
describe, 15-key run metadata, output dispatch.
"""

from __future__ import annotations

import time
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions import kernels
from ..oracle.crawl_oracle import CrawlConfig
from ..operators.frontier import FrontierCrawler
from ..session import CACHE_LEVEL
from ..sinks import writers
from . import distill


def generate_llmstxt(
    spark: SparkSession,
    site_pages: DataFrame,
    base_url: str,
    output_dir: str,
    max_pages: int = 50,
    export_format: str = "text",
    include_full_text: bool = False,
    max_full_text_pages: int | None = None,
    full_text_only: bool = False,
    safety_limit: int | None = None,
    robots_rules: list | None = None,
    enforce_robots: bool = False,
    host_caps: dict | None = None,
    run_dir: str | None = None,
    generated_at: str | None = None,
    seeds: list[tuple[int, str]] | None = None,
    crawl_strategy: str = "systematic",
    bestfirst_batch_size: int = 10,
    desc_cache_dir: str | None = None,
    sitemap_blobs=None,
    robots_text: str | None = None,
    root_sitemaps: list[str] | None = None,
    output_style: str = "v2",
    collect_entries: bool = False,
    seen_filter: str = "bloom",
    describe_fn=None,
    warc_out: str | None = None,
) -> dict:
    """Returns {'paths': [...], 'metadata': {...}, 'entries': [...], 'pages': [...]}.

    ``describe_fn``: injectable D5 model (a per-batch callable wrapped by
    udfs.make_describe_udf — the production LLM client plugs in here);
    None keeps the shipped v2 deterministic fallback. Composes with
    ``desc_cache_dir`` so only cache misses reach the model.

    ``collect_entries=False`` (the DEFAULT since r5 — every sink streams
    byte-identically, so the O(1)-driver path is what users get at scale)
    keeps the ENTIRE text path O(1) on the driver: llms.txt streams
    category-grouped from toLocalIterator, json/yaml/v1 stream
    index-ordered, and result['entries'] / result['pages'] are None instead
    of O(pages) lists (use metadata['total_pages_crawled'] /
    ['total_entries_processed'] for counts). Pass ``collect_entries=True``
    only when the caller actually wants the bounded per-page summary lists
    (small crawls, tests).

    ``crawl_strategy`` mirrors the reference dispatch (v1 generator/
    llms_generator.py:694-700; v2 llmsgen pyc names
    ``discover_all_links_first`` AND ``crawl_website``):
    'systematic' -> the BFS frontier engine; 'bestfirst' -> the
    keyword-relevance BestFirst engine (operators/bestfirst.py);
    'sitemap' -> raw-XML sitemap crawl (operators/sitemap_xml.py +
    operators/sitemap.py) over ``sitemap_blobs`` (sitemap_url, body) —
    roots from ``root_sitemaps`` or auto-discovery (well-known paths +
    robots ``Sitemap:`` lines in ``robots_text``).

    ``seen_filter`` selects the systematic engine's URL-seen pre-filter:
    'bloom' (default, no-FN append-only) or 'cuckoo' (supports deletion,
    operators/cuckoo.py). Both are correctness-neutral — the exact
    anti-join behind them decides membership; the filter only prunes.
    """
    start = time.time()
    # ref :169 (pyc): 3x page budget when full text requested
    actual_max_pages = max_pages * 3 if (full_text_only or include_full_text) else max_pages
    # ref :173 (pyc): systematic safety limit
    calculated_safety_limit = safety_limit or actual_max_pages * (10 if full_text_only else 5)
    comprehensive = full_text_only or include_full_text  # ref :175 (pyc)

    if crawl_strategy == "bestfirst":
        from ..operators.bestfirst import BestFirstCrawler

        bf = BestFirstCrawler(
            spark, site_pages, base_url,
            max_pages=actual_max_pages, batch_size=bestfirst_batch_size,
        )
        pages_df, _seen = bf.crawl()
    elif crawl_strategy == "sitemap":
        from ..operators import sitemap as sm
        from ..operators import sitemap_xml

        roots = root_sitemaps
        if roots is None:
            roots = sitemap_xml.auto_discover_sitemaps(
                sitemap_blobs, base_url, robots_text
            )
        entries = sitemap_xml.parse_sitemaps(sitemap_blobs, base_url)
        pages_df = sm.crawl_from_sitemap(
            spark, site_pages, entries, base_url, roots, max_pages=actual_max_pages
        )
    else:
        cfg = CrawlConfig(
            max_pages=actual_max_pages,
            comprehensive=comprehensive,
            safety_limit=calculated_safety_limit,
            enforce_robots=enforce_robots,
            host_caps=host_caps,
        )
        crawler = FrontierCrawler(
            spark, site_pages, cfg, robots_rules=robots_rules, run_dir=run_dir,
            use_bloom=True, seen_filter=seen_filter,
        )
        pages_df, _seen = crawler.crawl(seeds or [(0, base_url)])
    return distill_to_output(
        pages_df,
        base_url,
        output_dir,
        export_format=export_format,
        include_full_text=include_full_text,
        full_text_only=full_text_only,
        max_full_text_pages=max_full_text_pages,
        desc_cache_dir=desc_cache_dir,
        describe_fn=describe_fn,
        output_style=output_style,
        collect_entries=collect_entries,
        crawl_strategy_label=crawl_strategy,
        generated_at=generated_at,
        start_time=start,
        warc_out=warc_out,
    )


def distill_to_output(
    pages_df: DataFrame,
    base_url: str,
    output_dir: str,
    *,
    export_format: str = "text",
    include_full_text: bool = False,
    full_text_only: bool = False,
    max_full_text_pages: int | None = None,
    desc_cache_dir: str | None = None,
    describe_fn=None,
    output_style: str = "v2",
    collect_entries: bool = False,
    crawl_strategy_label: str = "systematic",
    generated_at: str | None = None,
    start_time: float | None = None,
    warc_out: str | None = None,
) -> dict:
    """The distill half of EP2, crawl-free: pages (url, title, content,
    word_count, rank, score, depth, discovery_phase) -> descriptions ->
    categories -> llms.txt / llms-full.txt / json / yaml sinks + 15-key
    metadata. ``generate_llmstxt`` calls this after its crawl; archive
    consumers (``generate_llmstxt_from_warc``) call it directly — fetch and
    distill as separate jobs, which is how a 100 TB WARC collection is
    processed (the crawl wrote archives months ago; distillation is a batch
    job over them)."""
    crawl_strategy = crawl_strategy_label
    start = start_time if start_time is not None else time.time()
    pages_df = pages_df.persist(CACHE_LEVEL)
    n_pages = pages_df.count()

    desc_cache_new = None
    if desc_cache_dir is not None and not full_text_only:
        # T4 check-before-generate (models/client.py:68-92): hits reuse the
        # stored description, only misses compute; write-through after.
        from ..state.desc_cache import DescriptionCache, describe_with_cache

        cache = DescriptionCache(pages_df.sparkSession, desc_cache_dir)
        entries_df, new_cache = describe_with_cache(
            pages_df, cache.load(), describe_fn=describe_fn
        )
        # merge_and_save is append-only (new delta dir, never rewrites the
        # files entries' lineage reads), so this checkpoint is not a
        # correctness requirement anymore — it stays because entries_df is
        # consumed by several downstream actions (collect, the category-sorted
        # llms.txt stream) and the checkpoint computes describe once; entries
        # carry no page content, so it is bounded.
        entries_df = entries_df.localCheckpoint(eager=True)
        desc_cache_new = cache.merge_and_save(new_cache)
    else:
        entries_df = distill.describe_pages(
            pages_df, full_text_only=full_text_only, describe_fn=describe_fn
        )
    entries_df = distill.categorize_entries(entries_df, pages_df)

    # Driver materialization is BOUNDED (round-1 fix): entries carry no page
    # content (render_desc fallbacks were computed distributed), the site
    # name/summary need one title + five 500-char samples, and llms-full.txt
    # streams through toLocalIterator inside the sink. Page CONTENT never
    # accumulates on the driver at any budget — and with
    # collect_entries=False no O(pages) LIST forms for ANY format: llms.txt
    # streams category-grouped below, json/yaml/v1 stream index-ordered
    # (entries_index_iter_factory).
    needs_entry_list = collect_entries
    entries = (
        [r.asDict() for r in entries_df.orderBy("index").collect()]
        if needs_entry_list
        else []
    )

    def entries_index_iter_factory():
        # index order == crawl rank order: the json/yaml/v1 entry sequence
        return (r.asDict() for r in entries_df.orderBy("index").toLocalIterator())

    # v2 llms.txt assembly streams from the entries table sorted by canonical
    # category position then crawl index — the sort is distributed (range
    # shuffle over content-free rows) and the driver sees one Arrow partition
    # at a time. Categories outside CATEGORY_ORDER are dropped exactly like
    # the legacy renderer's ordered-section loop.
    cat_ord = F.array_position(
        F.array(*[F.lit(c) for c in kernels.CATEGORY_ORDER]), F.col("category")
    )
    entries_stream_df = (
        entries_df.filter(F.col("category").isin(*list(kernels.CATEGORY_ORDER)))
        .withColumn("__cat_ord", cat_ord)
        .orderBy("__cat_ord", "index")
        .drop("__cat_ord")
    )

    def entries_iter_factory():
        return (r.asDict() for r in entries_stream_df.toLocalIterator())
    main_title_rows = (
        pages_df.filter(
            (F.col("url") == base_url) | (F.col("url") == base_url.rstrip("/"))
        )
        .select("title")
        .limit(1)
        .collect()
    )
    site_name = kernels.site_name_from_title(
        base_url, main_title_rows[0]["title"] if main_title_rows else None
    )
    head_samples = [
        r["c"]
        for r in pages_df.orderBy("rank")
        .select(F.substring(F.coalesce("content", F.lit("")), 1, 500).alias("c"))
        .limit(5)
        .collect()
    ]
    site_summary = kernels.site_summary_from_samples(head_samples)

    generated_at = generated_at or datetime.now(timezone.utc).isoformat()
    metadata = {  # 15 keys, ref llmsgen/generator/llms_generator.py:194 (pyc)
        "source_url": base_url,
        "domain": kernels.extract_domain_from_url(base_url),
        "total_pages_crawled": n_pages,
        "total_entries_processed": len(entries) if needs_entry_list else n_pages,
        "generated_at": generated_at,
        "model_used": "deterministic-fallback",
        "model_display_name": "Deterministic fallback (v2 testing mode)",
        "export_format": export_format,
        "processing_time_seconds": round(time.time() - start, 2),
        "batch_size": None,
        "parallel_workers": None,
        "max_full_text_pages": max_full_text_pages,
        "full_text_only_mode": full_text_only,
        "crawl_strategy_used": crawl_strategy,
        "include_full_text": include_full_text,
    }
    paths = writers.write_output_files(
        output_dir,
        base_url,
        entries,
        metadata,
        export_format,
        include_full_text,
        full_text_only,
        pages_df=pages_df,
        site_name=site_name,
        site_summary=site_summary,
        style=output_style,
        entries_iter_factory=entries_iter_factory,
        entries_index_iter_factory=None if needs_entry_list else entries_index_iter_factory,
    )
    # bounded per-page summaries (no content) for callers/tests
    pages = (
        [
            r.asDict()
            for r in pages_df.orderBy("rank")
            .select("rank", "url", "title", "word_count", "score", "depth", "discovery_phase")
            .collect()
        ]
        if collect_entries
        else None
    )
    warc_paths = None
    if warc_out:
        # archive the crawl (replayable store: `cli from-warc` re-distills
        # without refetching) — executor-side shard writes, content never
        # lands on the driver
        from ..sources import warc as warc_mod

        warc_paths = warc_mod.write_archive_files(
            warc_mod.pages_to_warc_blobs(pages_df), warc_out
        )
        metadata["warc_paths"] = warc_paths
    pages_df.unpersist()
    return {
        "paths": paths,
        "metadata": metadata,
        "entries": entries if needs_entry_list else None,
        "pages": pages,
        # T4 telemetry: how many descriptions were actually computed this run
        # (None = cache disabled); a warm re-run reports 0.
        "desc_cache_new": desc_cache_new,
    }


def generate_llmstxt_from_warc(
    spark: SparkSession,
    warc_path: str,
    base_url: str,
    output_dir: str,
    *,
    statuses: tuple = (200,),
    content_type_prefix: str = "text/",
    **distill_kw,
) -> dict:
    """Distill WARC archives into llms.txt WITHOUT a crawl — the archive IS
    the fetched-page store (fetch ran earlier, possibly elsewhere; Common
    Crawl consumers start exactly here).

    Record order (archive path, member offset) stands in for crawl rank —
    ranked with the same content-free two-pass global rank the frontier
    finalize uses (slim projection, join back on the unique (src, offset)
    record key; page text never range-shuffles). Titles come from the
    reference P9 kernel with a null meta-title (markdown H1 -> URL segment
    -> 'Untitled Page'), word counts from the pinned native counter, so a
    WARC-distilled page renders byte-identically to the same page arriving
    via the crawl path."""
    from ..functions import udfs
    from ..operators import ranking
    from ..sources import warc

    scanned = warc.read_warc_text(spark, warc_path)
    kept = scanned.filter(
        F.col("status").isin(*[int(s) for s in statuses])
        & F.col("content_type").startswith(content_type_prefix)
    )
    slim = kept.select("src", "offset")
    ranked = ranking.global_rank(
        slim, [F.asc("src"), F.asc("offset")], "rank"
    ).select("src", "offset", "rank")
    pages_df = (
        kept.join(ranked, ["src", "offset"])
        .select(
            "url",
            udfs.extract_title_udf(
                F.lit(None).cast("string"), F.col("content"), F.col("url")
            ).alias("title"),
            "content",
            udfs.native_word_count(F.col("content")).alias("word_count"),
            "rank",
            F.lit(0.0).alias("score"),
            F.lit(0).alias("depth"),
            F.lit("warc").alias("discovery_phase"),
        )
    )
    return distill_to_output(
        pages_df, base_url, output_dir,
        crawl_strategy_label="warc", **distill_kw,
    )
