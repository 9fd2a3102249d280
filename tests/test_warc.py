"""WARC source (sources/warc.py): writer/parser round trip — including the
hostile payloads a naive record splitter gets wrong — plus the on-disk
binaryFile read path and the distributed scan."""

import gzip
import hashlib

from pyspark.sql import functions as F

from web2llmstxt_spark.sources import warc

PAGES = [
    ("https://ex.example/a", b"plain body", 200, "text/html"),
    # payload CONTAINS the record separator — Content-Length splitting must
    # carry it through intact (a CRLFCRLF split would truncate it)
    ("https://ex.example/b", b"tricky\r\n\r\nWARC/1.0\r\nbody", 200, "text/html"),
    ("https://ex.example/c", b"", 404, "text/html"),
    ("https://ex.example/d", b"\x89PNG\r\n\x1a\n" + bytes(range(256)), 200, "image/png"),
]


def _records():
    return [
        warc.build_record(u, body, status=s, content_type=ct)
        for u, body, s, ct in PAGES
    ]


def _assert_parsed(parsed):
    assert len(parsed) == len(PAGES)
    for rec, (u, body, s, ct) in zip(parsed, PAGES):
        assert rec["url"] == u
        assert rec["status"] == s
        assert rec["content_type"] == ct
        assert rec["content_length"] == len(body)
        assert rec["body_md5"] == hashlib.md5(body).hexdigest()


def test_roundtrip_plain():
    blob = warc.build_warc(_records(), compress=False)
    _assert_parsed(list(warc.parse_warc(blob)))


def test_roundtrip_gzip_members():
    blob = warc.build_warc(_records(), compress=True)
    assert blob[:2] == b"\x1f\x8b"
    # each record its own member: re-split count matches record count
    assert sum(1 for _ in warc._split_members(blob)) == len(PAGES)
    _assert_parsed(list(warc.parse_warc(blob)))


def test_non_response_records_skipped():
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 9\r\n\r\n"
        b"info body\r\n\r\n"
    )
    blob = info + warc.build_warc(_records(), compress=False)
    _assert_parsed(list(warc.parse_warc(blob)))


def test_read_warc_from_disk(spark, tmp_path):
    # two archives on disk, one gzip one plain — binaryFile handles both
    (tmp_path / "part0.warc.gz").write_bytes(
        warc.build_warc(_records()[:2], compress=True)
    )
    (tmp_path / "part1.warc").write_bytes(
        warc.build_warc(_records()[2:], compress=False)
    )
    got = warc.read_warc(spark, str(tmp_path) + "/*").collect()
    assert sorted(r["url"] for r in got) == sorted(u for u, *_ in PAGES)
    by_url = {r["url"]: r for r in got}
    for u, body, s, ct in PAGES:
        assert by_url[u]["body_md5"] == hashlib.md5(body).hexdigest()
        assert by_url[u]["status"] == s


def test_synth_blobs_deterministic_under_repartition(spark):
    rows = [
        (i, f"https://ex.example/p{i}", 200, "text/html", f"body {i}")
        for i in range(40)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, url string, status int, content_type string, body string"
    )
    a = {
        r["shard"]: bytes(r["warc"])
        for r in warc.synth_warc_blobs(df, n_shards=4).collect()
    }
    b = {
        r["shard"]: bytes(r["warc"])
        for r in warc.synth_warc_blobs(df.repartition(13), n_shards=4).collect()
    }
    assert a == b  # archive bytes independent of upstream partitioning
    assert set(a) == {0, 1, 2, 3}


def test_non_ascii_url_header_safe():
    # ADVICE r4: an IDN/unicode URL must not UnicodeEncodeError the writer;
    # the header carries the percent-encoded form, reserved chars untouched.
    url = "https://ex.example/café?q=süß"
    rec = warc.build_record(url, b"body")
    assert b"WARC-Target-URI: https://ex.example/caf%C3%A9?q=s%C3%BC%C3%9F" in rec
    parsed = list(warc.parse_warc(rec))
    assert parsed[0]["url"] == "https://ex.example/caf%C3%A9?q=s%C3%BC%C3%9F"
    # revisit records render through the same path
    rev = warc.build_revisit_record(url, "0" * 32)
    assert b"caf%C3%A9" in rev


def test_write_archive_files_single_pass_and_stale_cleanup(spark, tmp_path):
    out = str(tmp_path / "arch")
    pages = spark.createDataFrame(
        [(i, f"https://ex.example/p{i}", f"body {i}") for i in range(20)],
        "rank long, url string, content string",
    )
    blobs = warc.pages_to_warc_blobs(pages, n_shards=4)
    paths = warc.write_archive_files(blobs, out, prefix="crawl")
    assert len(paths) == 4
    # a later SMALLER run into the same dir must remove orphaned shards
    small = warc.pages_to_warc_blobs(pages.limit(3), n_shards=1)
    paths2 = warc.write_archive_files(small, out, prefix="crawl")
    import glob as g
    on_disk = sorted(g.glob(out + "/crawl-*.warc.gz"))
    assert on_disk == sorted(paths2) and len(on_disk) == 1
