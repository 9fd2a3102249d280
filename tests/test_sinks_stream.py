"""Streaming sinks: byte parity with the legacy full-list renderers, and the
pipeline's llms.txt bytes unchanged by the no-content-collect refactor."""

import json

from web2llmstxt_spark import schemas
from web2llmstxt_spark.oracle.crawl_oracle import CrawlConfig
from web2llmstxt_spark.operators.frontier import FrontierCrawler
from web2llmstxt_spark.plans import pipeline
from web2llmstxt_spark.sinks import writers
from web2llmstxt_spark.sources.corpus import generate_corpus

PAGES = [
    {"title": f"Page {i}", "url": f"https://x.example/p{i}", "content": f"body text {i} " * 12}
    for i in range(9)
]
META = {
    "generated_at": "2026-08-16T00:00:00",
    "model_used": "deterministic-fallback",
    "total_pages_crawled": 9,
    "processing_time_seconds": 1.23,
    "max_full_text_pages": None,
}


def test_llms_full_stream_matches_render(tmp_path):
    for max_full in (None, 4, 100):
        meta = {**META, "max_full_text_pages": max_full}
        path = str(tmp_path / f"full_{max_full}.txt")
        writers.write_llms_full_stream(path, "https://x.example", iter(PAGES), len(PAGES), meta)
        legacy = writers.render_llms_full_txt("https://x.example", PAGES, meta)
        assert open(path, encoding="utf-8").read() == legacy, f"max_full={max_full}"


def test_json_stream_valid(tmp_path):
    entries = [
        {"url": "https://x.example/p0", "title": "P", "description": "d",
         "word_count": 5, "index": 1, "category": "Other Pages", "render_desc": "d"}
    ]
    path = str(tmp_path / "o.json")
    writers.write_json_stream(path, entries, META, iter(PAGES))
    data = json.load(open(path, encoding="utf-8"))
    assert set(data) == {"metadata", "llms_entries", "full_content_pages"}
    assert len(data["full_content_pages"]) == len(PAGES)
    assert "render_desc" not in data["llms_entries"][0]
    path2 = str(tmp_path / "o2.json")
    writers.write_json_stream(path2, entries, META, None)
    assert set(json.load(open(path2, encoding="utf-8"))) == {"metadata", "llms_entries"}


def test_pipeline_llms_txt_bytes_match_legacy_render(spark, tmp_path):
    """The streaming assembly (bounded collects + distributed render_desc)
    must produce the exact bytes the legacy full-collect path produced."""
    corpus = generate_corpus(seed=31, n_hosts=1, pages_per_host=25)
    site = spark.createDataFrame(corpus.site_pages_rows(), schemas.SITE_PAGES).cache()
    result = pipeline.generate_llmstxt(
        spark, site, "https://ex0.example/", str(tmp_path), max_pages=6,
        generated_at="2026-08-16T00:00:00", collect_entries=True,
    )
    (path,) = result["paths"]
    got = open(path, encoding="utf-8").read()

    # legacy path: full pages (content included) collected test-side from an
    # identical deterministic crawl
    cfg = CrawlConfig(max_pages=6, safety_limit=6 * 5)
    crawler = FrontierCrawler(spark, site, cfg, use_bloom=True)
    pages_df, _ = crawler.crawl([(0, "https://ex0.example/")])
    pages_full = [r.asDict() for r in pages_df.orderBy("rank").collect()]
    entries = [{k: v for k, v in e.items() if k != "render_desc"} for e in result["entries"]]
    legacy = writers.render_llms_txt(
        "https://ex0.example/", entries, pages_full, result["metadata"]
    )
    assert got == legacy


def test_v1_style_output(tmp_path, spark):
    """v1 format variants (generator/llms_generator.py:789-821): header
    shapes, `--- Page i ---` blocks, 80-char separators; full file streamed."""
    entries = [
        {"url": p["url"], "title": p["title"], "description": f"desc {i}",
         "word_count": 20, "index": i + 1, "category": "Other Pages",
         "render_desc": f"desc {i}"}
        for i, p in enumerate(PAGES[:3])
    ]
    txt = writers.render_llms_txt_v1("x.example", entries, "2026-08-16 00:00:00")
    assert txt.startswith("# X.EXAMPLE - LLMs.txt\n# Generated on 2026-08-16 00:00:00\n# Total pages: 3\n\n")
    assert "## Page 0\nURL: https://x.example/p0\nDescription: desc 0\n\n" in txt

    path = str(tmp_path / "full_v1.txt")
    writers.write_llms_full_v1_stream(path, "x.example", iter(PAGES[:3]), 3, "2026-08-16 00:00:00")
    got = open(path, encoding="utf-8").read()
    assert got.startswith("# X.EXAMPLE - Full Content\n")
    assert "--- Page 1 ---\nTitle: Page 0\nURL: https://x.example/p0\nContent:\n" in got
    assert got.count("=" * 80) == 4  # header sep + one per page

    # end-to-end through the pipeline dispatch
    corpus = generate_corpus(seed=57, n_hosts=1, pages_per_host=20)
    base = corpus.seeds[0][1]
    site = spark.createDataFrame(corpus.site_pages_rows(), schemas.SITE_PAGES).cache()
    res = pipeline.generate_llmstxt(
        spark, site, base, str(tmp_path / "v1"), max_pages=5,
        include_full_text=True, output_style="v1",
    )
    names = [p.split("/")[-1] for p in res["paths"]]
    assert any(n.endswith("-llms.txt") for n in names)
    assert any(n.endswith("-llms-full.txt") for n in names)
    body = open(res["paths"][0], encoding="utf-8").read()
    assert body.splitlines()[0].endswith("- LLMs.txt")


def test_yaml_full_text_bounded_consumption(tmp_path):
    """The YAML sink must SLICE the page iterator (islice), never materialize
    it: with pages >> max_full_text_pages, only ~max_full rows may be pulled
    from the toLocalIterator stream (one extra probe row is islice's
    stop-check, not materialization)."""
    yaml = __import__("yaml")
    consumed = []

    class _Row:
        def __init__(self, i):
            self.i = i

        def asDict(self):
            return {"title": f"Page {self.i}", "url": f"https://x.example/p{self.i}",
                    "content": f"body {self.i}"}

    class _FakePagesDF:
        """Duck-typed stand-in for the rank-ordered crawl DataFrame."""

        def orderBy(self, *_):
            return self

        def select(self, *_):
            return self

        def toLocalIterator(self):
            for i in range(10_000):
                consumed.append(i)
                yield _Row(i)

    entries = [
        {"url": "https://x.example/p0", "title": "P", "description": "d",
         "word_count": 5, "index": 1, "category": "Other Pages", "render_desc": "d"}
    ]
    meta = {**META, "max_full_text_pages": 7}
    paths = writers.write_output_files(
        str(tmp_path / "yaml_bounded"), "https://x.example", entries, meta,
        export_format="yaml", include_full_text=True, pages_df=_FakePagesDF(),
    )
    assert len(consumed) <= 8, f"driver pulled {len(consumed)} rows for max_full=7"
    data = yaml.safe_load(open(paths[0], encoding="utf-8"))
    assert len(data["full_content_pages"]) == 7
    assert data["full_content_pages"][0]["url"] == "https://x.example/p0"


def test_llms_txt_stream_no_entry_collect(spark, tmp_path):
    """collect_entries=False must stream the v2 llms.txt body category-
    grouped via toLocalIterator — byte-identical to the collected path — and
    return None for the O(pages) entries/pages lists."""
    corpus = generate_corpus(seed=31, n_hosts=1, pages_per_host=25)
    site = spark.createDataFrame(corpus.site_pages_rows(), schemas.SITE_PAGES).cache()
    kw = dict(max_pages=6, generated_at="2026-08-16T00:00:00")
    ref = pipeline.generate_llmstxt(
        spark, site, "https://ex0.example/", str(tmp_path / "collected"),
        collect_entries=True, **kw
    )
    got = pipeline.generate_llmstxt(
        spark, site, "https://ex0.example/", str(tmp_path / "streamed"),
        collect_entries=False, **kw
    )
    ref_txt = open(ref["paths"][0], encoding="utf-8").read()
    got_txt = open(got["paths"][0], encoding="utf-8").read()
    assert got_txt == ref_txt
    assert got["entries"] is None and got["pages"] is None
    assert got["metadata"]["total_entries_processed"] == ref["metadata"]["total_entries_processed"]


def test_yaml_stream_bytes_match_full_dump(tmp_path):
    """write_yaml_stream must be byte-identical to the one-shot yaml.dump of
    the same structure (sorted top-level keys, nested-list block layout),
    including the empty-entries and no-full-pages edges."""
    yaml = __import__("yaml")
    entries = [
        {"url": "https://x.example/p0", "title": "Tïtle", "description": "d: 1 # y",
         "word_count": 5, "index": 1, "category": "Other Pages"},
        {"url": "https://x.example/p1", "title": None, "description": "",
         "word_count": 0, "index": 2, "category": "Key Documentation"},
    ]
    pages = [{"title": p["title"], "url": p["url"], "content": p["content"]} for p in PAGES[:3]]
    cases = [
        ({"metadata": META, "llms_entries": entries, "full_content_pages": pages}, entries, pages),
        ({"metadata": META, "llms_entries": entries}, entries, None),
        ({"metadata": META, "llms_entries": []}, [], None),
    ]
    for i, (data, ents, full) in enumerate(cases):
        want = yaml.dump(data, default_flow_style=False, allow_unicode=True, indent=2)
        path = str(tmp_path / f"y{i}.yaml")
        writers.write_yaml_stream(
            path, META, iter(ents), iter(full) if full is not None else None
        )
        assert open(path, encoding="utf-8").read() == want, f"case {i}"


def test_json_stream_generator_matches_list(tmp_path):
    """llms_entries streamed from a generator must be byte-identical to the
    list path AND to json.dump(list, indent=2) — including the empty case."""
    entries = [
        {"url": f"https://x.example/p{i}", "title": f"Tïtle {i}", "description": f"d{i}",
         "word_count": i, "index": i + 1, "category": "Other Pages"}
        for i in range(3)
    ]
    for case, ents in (("some", entries), ("empty", [])):
        p_list = str(tmp_path / f"{case}_list.json")
        p_gen = str(tmp_path / f"{case}_gen.json")
        writers.write_json_stream(p_list, ents, META, None)
        writers.write_json_stream(p_gen, (e for e in ents), META, None)
        a = open(p_list, encoding="utf-8").read()
        assert a == open(p_gen, encoding="utf-8").read(), case
        # the llms_entries section is exactly json.dump(ents, indent=2)
        want_section = json.dumps(ents, indent=2, ensure_ascii=False)
        assert f'"llms_entries": {want_section}' in a, case


def test_v1_txt_stream_matches_render(tmp_path):
    entries = [
        {"url": p["url"], "title": p["title"], "description": f"desc {i}",
         "word_count": 20, "index": i + 1, "category": "Other Pages",
         "render_desc": f"desc {i}"}
        for i, p in enumerate(PAGES[:4])
    ]
    path = str(tmp_path / "v1s.txt")
    writers.write_llms_txt_v1_stream(
        path, "x.example", iter(entries), len(entries), "2026-08-16 00:00:00"
    )
    legacy = writers.render_llms_txt_v1("x.example", entries, "2026-08-16 00:00:00")
    assert open(path, encoding="utf-8").read() == legacy


def test_all_formats_honor_no_entry_collect(spark, tmp_path):
    """collect_entries=False must be honored by EVERY format (r3 verdict #7):
    json/yaml/v1 stream index-ordered entries and produce the same entry
    sequence as the collected path (metadata differs only in the measured
    processing time)."""
    yaml = __import__("yaml")
    corpus = generate_corpus(seed=31, n_hosts=1, pages_per_host=25)
    site = spark.createDataFrame(corpus.site_pages_rows(), schemas.SITE_PAGES).cache()
    kw = dict(max_pages=6, generated_at="2026-08-16T00:00:00")
    for fmt, style in (("json", "v2"), ("yaml", "v2"), ("text", "v1")):
        ref = pipeline.generate_llmstxt(
            spark, site, "https://ex0.example/", str(tmp_path / f"{fmt}{style}_c"),
            export_format=fmt, output_style=style, collect_entries=True, **kw
        )
        got = pipeline.generate_llmstxt(
            spark, site, "https://ex0.example/", str(tmp_path / f"{fmt}{style}_s"),
            export_format=fmt, output_style=style, collect_entries=False, **kw
        )
        assert got["entries"] is None and got["pages"] is None, (fmt, style)
        if fmt == "json":
            a = json.load(open(ref["paths"][0], encoding="utf-8"))
            b = json.load(open(got["paths"][0], encoding="utf-8"))
            assert a["llms_entries"] == b["llms_entries"]
        elif fmt == "yaml":
            a = yaml.safe_load(open(ref["paths"][0], encoding="utf-8"))
            b = yaml.safe_load(open(got["paths"][0], encoding="utf-8"))
            assert a["llms_entries"] == b["llms_entries"]
        else:  # v1 text: bytes identical (header has no processing time)
            a = open(ref["paths"][0], encoding="utf-8").read()
            b = open(got["paths"][0], encoding="utf-8").read()
            assert a == b


def test_default_path_is_streaming(spark, tmp_path):
    """r5: collect_entries defaults to FALSE — the plain call (what users
    get at scale) forms no O(pages) driver list and still writes the exact
    bytes of the collected run."""
    corpus = generate_corpus(seed=31, n_hosts=1, pages_per_host=25)
    site = spark.createDataFrame(corpus.site_pages_rows(), schemas.SITE_PAGES).cache()
    kw = dict(max_pages=6, generated_at="2026-08-16T00:00:00")
    default = pipeline.generate_llmstxt(
        spark, site, "https://ex0.example/", str(tmp_path / "default"), **kw
    )
    assert default["entries"] is None and default["pages"] is None
    collected = pipeline.generate_llmstxt(
        spark, site, "https://ex0.example/", str(tmp_path / "collected2"),
        collect_entries=True, **kw
    )
    assert (
        open(default["paths"][0], "rb").read()
        == open(collected["paths"][0], "rb").read()
    )
    assert default["metadata"]["total_entries_processed"] == len(collected["entries"])
