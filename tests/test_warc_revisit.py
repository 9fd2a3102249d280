"""WARC revisit records (sources/warc.py): the recrawl storage dedup —
classification against a prior digest index, the pointer-record format
round trip, and the storage-savings accounting."""

import hashlib

from web2llmstxt_spark.sources import warc


def test_revisit_record_roundtrip():
    body = b"page body " * 50
    md5 = hashlib.md5(body).hexdigest()
    rec = warc.build_revisit_record("https://ex.example/p", md5)
    assert len(rec) < 450  # pointer record stays tiny regardless of page size
    blob = warc.build_warc([rec], compress=True)
    # the plain-response scanner skips non-response records
    assert list(warc.parse_warc(blob)) == []


def _body(i):
    # high-entropy body (md5 hex chain): gzip can't flatten it, so the
    # response-vs-revisit size comparison measures the format, not the filler
    return " ".join(hashlib.md5(f"{i}:{j}".encode()).hexdigest() for j in range(50))


def test_classify_and_savings(spark):
    rows = [
        (i, f"https://ex.example/p{i}", 200, "text/html", _body(i))
        for i in range(40)
    ]
    pages = spark.createDataFrame(
        rows, "doc_id long, url string, status int, content_type string, body string"
    )
    # prior snapshot: p0..p29 captured; p10..p19 changed since
    prior_rows = [
        (
            f"https://ex.example/p{i}",
            hashlib.md5(
                (_body(i) + (" old" if 10 <= i < 20 else "")).encode()
            ).hexdigest(),
        )
        for i in range(30)
    ]
    prior = spark.createDataFrame(prior_rows, "url string, body_md5 string")
    typed = warc.classify_revisits(pages, prior)
    kinds = {r["url"]: r["record_type"] for r in typed.collect()}
    for i in range(40):
        want = "revisit" if (i < 10 or 20 <= i < 30) else "response"
        assert kinds[f"https://ex.example/p{i}"] == want, i

    scanned = warc.warc_scan_typed(
        warc.synth_warc_blobs_typed(typed, n_shards=4)
    ).collect()
    assert len(scanned) == 40
    by_type = {}
    for r in scanned:
        by_type.setdefault(r["record_type"], []).append(r)
    assert len(by_type["revisit"]) == 20
    # digests resolve identically from both record shapes
    for r in scanned:
        i = int(r["url"].rsplit("p", 1)[1])
        assert r["body_md5"] == hashlib.md5(_body(i).encode()).hexdigest()
    # the accounting: a revisit member stores a small fraction of a response
    avg = lambda rs: sum(x["stored_bytes"] for x in rs) / len(rs)
    assert avg(by_type["revisit"]) < avg(by_type["response"]) * 0.8
