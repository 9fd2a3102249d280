"""CDX index (sources/warc.cdx_index): the (offset, rec_length) pairs must
actually work — range-reading the compressed archive at each reported offset
yields exactly that record — and SURT keys sort a domain's hosts together."""

import hashlib

from pyspark.sql import functions as F

from web2llmstxt_spark.functions import native
from web2llmstxt_spark.sources import warc


def test_offsets_range_read_roundtrip():
    pages = [
        (f"https://h{i % 3}.ex.example/p{i}", f"body {i} {'x' * (i * 7 % 50)}")
        for i in range(20)
    ]
    blob = warc.build_warc(
        (warc.build_record(u, b.encode()) for u, b in pages), compress=True
    )
    entries = list(warc.parse_warc_cdx(blob))
    assert len(entries) == 20
    # offsets tile the archive exactly: contiguous, full coverage
    assert entries[0]["offset"] == 0
    for a, b in zip(entries, entries[1:]):
        assert b["offset"] == a["offset"] + a["rec_length"]
    assert entries[-1]["offset"] + entries[-1]["rec_length"] == len(blob)
    # the CDX promise: a range request of [offset, offset+len) is ONE record
    for e, (u, body) in zip(entries, pages):
        sliced = blob[e["offset"] : e["offset"] + e["rec_length"]]
        (rec,) = list(warc.parse_warc(sliced))
        assert rec["url"] == u == e["url"]
        assert rec["body_md5"] == hashlib.md5(body.encode()).hexdigest()


def test_surt_key_shapes(spark):
    cases = {
        "https://docs.ex2.example/guide-7": "example,ex2,docs)/guide-7",
        "https://EX.example/A/B?Page=2": "example,ex)/a/b?page=2",
        "http://one.two.three.example/": "example,three,two,one)/",
        "https://ex.example": "example,ex)/",
    }
    df = spark.createDataFrame([(u,) for u in cases], ["url"])
    got = {
        r["url"]: r["k"]
        for r in df.select(
            "url", native.surt_key_native(F.col("url")).alias("k")
        ).collect()
    }
    for u, want in cases.items():
        assert got[u] == want, u


def test_surt_sql_twin_matches():
    import duckdb

    urls = [
        "https://docs.ex2.example/guide-7",
        "https://EX.example/A/B?Page=2",
        "http://one.two.three.example/",
        "https://ex.example",
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT unnest(?) AS url", [urls])
    rows = con.execute(
        f"SELECT url, {native.surt_key_sql('url')} FROM t"
    ).fetchall()
    expect = {
        "https://docs.ex2.example/guide-7": "example,ex2,docs)/guide-7",
        "https://EX.example/A/B?Page=2": "example,ex)/a/b?page=2",
        "http://one.two.three.example/": "example,three,two,one)/",
        "https://ex.example": "example,ex)/",
    }
    for url, k in rows:
        assert k == expect[url], url


def test_cdx_distributed_matches_local(spark):
    rows = [
        (i, f"https://h{i % 3}.ex.example/p{i}", 200, "text/html", f"body {i}")
        for i in range(30)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, url string, status int, content_type string, body string"
    )
    blobs = warc.synth_warc_blobs(df, n_shards=3)
    got = warc.cdx_index(blobs).collect()
    assert len(got) == 30
    # every (shard, offset, rec_length) range-reads back to its url
    blob_by_shard = {
        r["shard"]: bytes(r["warc"]) for r in blobs.collect()
    }
    for r in got:
        sliced = blob_by_shard[r["shard"]][r["offset"] : r["offset"] + r["rec_length"]]
        (rec,) = list(warc.parse_warc(sliced))
        assert rec["url"] == r["url"]
