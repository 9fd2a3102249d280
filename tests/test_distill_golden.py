"""Distill stage + sinks: golden-file equality with the reference output.

The reference's only end-to-end golden is
/root/reference/output/example.com-llms.txt, produced through the baked-in
mock crawl path (llmsgen/crawler/web_crawler.py:171-179 (pyc)) with the
deterministic description fallback. We reproduce the exact bytes.
"""

import json
import os

from web2llmstxt_spark import schemas
from web2llmstxt_spark.plans import distill, pipeline
from web2llmstxt_spark.sinks import writers

GOLDEN = open("/root/reference/output/example.com-llms.txt", encoding="utf-8").read()

# the mock page baked into the v2 pyc (llmsgen/crawler/web_crawler.py:171-179)
MOCK_BASE = "https://example.com/test_mock_crawl"
MOCK_PAGE = {
    "url": "https://example.com/test_mock_crawl/page1",
    "title": "Mock Page 1 Title",
    "content": "This is mock content for page 1. It has enough words.",
    "word_count": 10,
    "score": 10.0,
    "depth": 1,
    "discovery_phase": "mock",
}


def test_golden_llms_txt_bytes():
    entries = [
        {
            "url": MOCK_PAGE["url"],
            "title": MOCK_PAGE["title"],
            "description": "Content related to Mock Page 1 Title. From example.com.",
            "word_count": 10,
            "category": "General Information",
        }
    ]
    metadata = {"total_pages_crawled": 1, "generated_at": "2025-06-26T12:00:00"}
    rendered = writers.render_llms_txt(MOCK_BASE, entries, [MOCK_PAGE], metadata)
    assert rendered == GOLDEN


def test_mock_page_through_spark_distill(spark):
    """The same golden, but with description+category computed by the engine
    (pandas UDFs) instead of hand-written."""
    pages_df = spark.createDataFrame(
        [
            (
                MOCK_PAGE["url"], MOCK_PAGE["title"], MOCK_PAGE["content"], None,
                10, 10.0, 1, "mock", 0, 1,
            )
        ],
        schemas.PAGES,
    )
    entries_df = distill.categorize_entries(distill.describe_pages(pages_df), pages_df)
    entries = [r.asDict() for r in entries_df.collect()]
    metadata = {"total_pages_crawled": 1, "generated_at": "2025-06-26T12:00:00"}
    rendered = writers.render_llms_txt(MOCK_BASE, entries, [MOCK_PAGE], metadata)
    assert rendered == GOLDEN


def test_full_pipeline_end_to_end(spark, tmp_path):
    """seeds -> frontier crawl -> distill -> all sinks, over the synthetic web."""
    from web2llmstxt_spark.sources.corpus import generate_corpus

    corpus = generate_corpus(seed=31, n_hosts=1, pages_per_host=25)
    site = spark.createDataFrame(corpus.site_pages_rows(), schemas.SITE_PAGES)
    result = pipeline.generate_llmstxt(
        spark,
        site,
        "https://ex0.example/",
        str(tmp_path),
        max_pages=6,
        generated_at="2026-08-16T00:00:00",
        collect_entries=True,
    )
    (path,) = result["paths"]
    text = open(path, encoding="utf-8").read()
    assert text.startswith("# ")
    assert "\n> " in text
    assert "Generated from" in text and "on 2026-08-16 using automated crawling." in text
    # every crawled page appears exactly once as a bullet
    bullets = [ln for ln in text.splitlines() if ln.startswith("- [")]
    assert len(bullets) == len(result["pages"]) == result["metadata"]["total_pages_crawled"]
    # category sections in canonical order
    headers = [ln[3:] for ln in text.splitlines() if ln.startswith("## ")]
    from web2llmstxt_spark.functions.kernels import CATEGORY_ORDER

    assert headers == [c for c in CATEGORY_ORDER if c in headers]

    # JSON sink
    result_json = pipeline.generate_llmstxt(
        spark, site, "https://ex0.example/", str(tmp_path), max_pages=6,
        export_format="json", generated_at="2026-08-16T00:00:00",
    )
    (jpath,) = result_json["paths"]
    data = json.load(open(jpath, encoding="utf-8"))
    assert set(data) == {"metadata", "llms_entries"}
    assert len(data["metadata"]) == 15

    # full-text sink
    result_full = pipeline.generate_llmstxt(
        spark, site, "https://ex0.example/", str(tmp_path), max_pages=3,
        include_full_text=True, max_full_text_pages=5,
        generated_at="2026-08-16T00:00:00",
    )
    full_path = [p for p in result_full["paths"] if p.endswith("-llms-full.txt")][0]
    full_text = open(full_path, encoding="utf-8").read()
    assert "## Page 1:" in full_text and "**URL:**" in full_text
    assert os.path.basename(full_path) == "ex0.example-llms-full.txt"


def test_render_desc_twin_on_adversarial_content(spark):
    """The distributed render_desc column (plans/distill.py) and the
    render-time Python twin (writers.final_description) must stay
    byte-identical on content the golden corpus never exercises: a page whose
    first 30 'words' span >4096 chars (minified-JS shape), a word straddling
    the 4096 boundary, and NBSP/ideographic-space joints (non-boundaries
    under the pinned ASCII class)."""
    contents = [
        # one giant token then normal words: the 4096-prefix cut bites
        "x" * 5000 + " alpha beta gamma",
        # a word straddling exactly the 4096-char boundary
        ("word " * 819) + "straddler-token-yyyyyyyyyyyyyyyy then more words here",
        # NBSP + ideographic joints: 30-word window differs vs Python .split()
        ("alpha beta gamma　delta epsilon " * 20).strip(),
        # short page, shorter than 30 words
        "only a few words here.",
        "",
        None,
    ]
    rows = [
        (f"https://x.example/p{i}", f"T{i}", c, None, 10, 1.0, 1, "crawl", 0, i)
        for i, c in enumerate(contents)
    ]
    pages_df = spark.createDataFrame(rows, schemas.PAGES)
    # force every description onto the fallback path
    entries_df = distill.describe_pages(pages_df, full_text_only=True)
    out = distill.categorize_entries(entries_df, pages_df)
    got = {r.url: r.render_desc for r in out.collect()}
    for i, c in enumerate(contents):
        url = f"https://x.example/p{i}"
        expect = writers.final_description("N/A (full_text_only mode)", c)
        assert got[url] == expect, (url, got[url][:80], expect[:80])
