"""WARC -> llms.txt distillation (pipeline.generate_llmstxt_from_warc):
the archive is the fetched-page store; no crawl runs. Covers record
filtering, archive-order ranking, P9 title extraction with null meta-title,
and byte determinism across runs."""

import json

from web2llmstxt_spark.plans.pipeline import generate_llmstxt_from_warc
from web2llmstxt_spark.sources import warc

BASE = "https://ex.example"


def _write_archives(tmp_path):
    def page(i, body_title):
        body = (
            f"# {body_title}\n\nThis page documents the {body_title.lower()} "
            f"API endpoint with examples and pricing details for item {i}. "
            "It includes installation steps and configuration guidance."
        )
        return warc.build_record(f"{BASE}/p{i}", body.encode(), status=200)

    arc0 = warc.build_warc(
        [
            page(0, "Getting Started"),
            page(1, "Pricing Plans"),
            warc.build_record(f"{BASE}/gone", b"nope", status=404),
        ],
        compress=True,
    )
    arc1 = warc.build_warc(
        [
            page(2, "Api Reference"),
            warc.build_record(
                f"{BASE}/logo.png", b"\x89PNG...", status=200,
                content_type="image/png",
            ),
        ],
        compress=True,
    )
    (tmp_path / "crawl-00000.warc.gz").write_bytes(arc0)
    (tmp_path / "crawl-00001.warc.gz").write_bytes(arc1)


def test_warc_distill_end_to_end(spark, tmp_path):
    _write_archives(tmp_path / ".")
    out = tmp_path / "out"
    res = generate_llmstxt_from_warc(
        spark, str(tmp_path) + "/*.warc.gz", BASE, str(out),
        generated_at="2026-01-01T00:00:00+00:00", collect_entries=True,
    )
    # 404 and non-text/* records are filtered; 3 pages distill
    assert res["metadata"]["total_pages_crawled"] == 3
    assert res["metadata"]["crawl_strategy_used"] == "warc"
    assert len(res["entries"]) == 3
    # rank follows (archive path, member offset): file 0 records first
    by_rank = sorted(res["pages"], key=lambda p: p["rank"])
    assert [p["url"] for p in by_rank] == [
        f"{BASE}/p0", f"{BASE}/p1", f"{BASE}/p2",
    ]
    # P9 title rule with null meta-title: markdown H1 wins
    assert {p["title"] for p in by_rank} == {
        "Getting Started", "Pricing Plans", "Api Reference",
    }
    txt = (out / "ex.example-llms.txt").read_text()
    assert "Getting Started" in txt and "Api Reference" in txt
    assert f"{BASE}/gone" not in txt and "logo.png" not in txt


def test_warc_distill_deterministic(spark, tmp_path):
    _write_archives(tmp_path / ".")
    outs = []
    for d in ("out_a", "out_b"):
        generate_llmstxt_from_warc(
            spark, str(tmp_path) + "/*.warc.gz", BASE, str(tmp_path / d),
            generated_at="2026-01-01T00:00:00+00:00",
        )
        outs.append((tmp_path / d / "ex.example-llms.txt").read_bytes())
    assert outs[0] == outs[1]


def test_warc_distill_cli(tmp_path):
    # subprocess: cli.main stops its session on exit, which must not touch
    # this process's shared session fixture
    import subprocess
    import sys

    _write_archives(tmp_path / ".")
    out = tmp_path / "out_cli"
    proc = subprocess.run(
        [
            sys.executable, "-m", "web2llmstxt_spark.cli", "from-warc",
            "--warc", str(tmp_path) + "/*.warc.gz",
            "--base-url", BASE, "--out", str(out), "--cores", "4",
        ],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    info = json.loads(proc.stdout.strip().splitlines()[-1])
    assert info["pages"] == 3 and info["strategy"] == "warc"
    assert (out / "ex.example-llms.txt").exists()


def test_crawl_archive_replay(spark, tmp_path):
    """Crawl -> .warc.gz shards -> from-warc re-distill: the replay path.
    Every crawled page round-trips the archive byte-exactly (md5), and the
    re-distilled llms.txt covers the same URL set without refetching."""
    from web2llmstxt_spark import schemas
    from web2llmstxt_spark.plans.pipeline import generate_llmstxt
    from web2llmstxt_spark.sources.corpus import generate_corpus

    corpus = generate_corpus(seed=5, n_hosts=1, pages_per_host=20)
    site = spark.createDataFrame(corpus.site_pages_rows(), schemas.SITE_PAGES)
    base = corpus.seeds[0][1]
    arc_dir = tmp_path / "archive"
    res = generate_llmstxt(
        spark, site, base, str(tmp_path / "out1"), max_pages=8,
        warc_out=str(arc_dir), generated_at="2026-01-01T00:00:00+00:00",
        collect_entries=True,
    )
    paths = res["metadata"]["warc_paths"]
    assert paths and all(p.endswith(".warc.gz") for p in paths)

    # archive contents == crawled pages
    scanned = {
        r["url"]: r["body_md5"]
        for r in warc.read_warc(spark, str(arc_dir) + "/*").collect()
    }
    crawled = {p["url"] for p in res["pages"]}
    assert set(scanned) == crawled
    # replay: distill straight from the archive, no crawl, no site table
    res2 = generate_llmstxt_from_warc(
        spark, str(arc_dir) + "/*", base, str(tmp_path / "out2"),
        generated_at="2026-01-01T00:00:00+00:00", collect_entries=True,
    )
    assert {p["url"] for p in res2["pages"]} == crawled
    assert res2["metadata"]["total_pages_crawled"] == len(crawled)
