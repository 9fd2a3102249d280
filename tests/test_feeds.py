"""Feed parser kernel + mapInPandas driver (operators/feeds.py)."""

import gzip

from web2llmstxt_spark.operators import feeds

RSS = (
    '<?xml version="1.0"?><rss version="2.0"><channel><title>t</title>'
    "<item><link>https://a.example/p1</link><title>One</title>"
    "<pubDate>2026-01-02</pubDate></item>"
    "<item><link>https://a.example/p2</link></item>"
    "<item><link>ftp://a.example/skip</link></item>"
    "</channel></rss>"
)
ATOM = (
    '<feed xmlns="http://www.w3.org/2005/Atom"><title>t</title>'
    '<entry><link rel="self" href="https://b.example/atom.xml"/>'
    '<link rel="alternate" href="https://b.example/e1"/>'
    "<title>E1</title><published>2026-02-03</published></entry>"
    '<entry><link href="https://b.example/e2"/><title>E2</title>'
    "<updated>2026-02-04</updated></entry>"
    "</feed>"
)


def test_rss_items_and_scheme_filter():
    got = feeds.parse_feed_blob("https://a.example/feed.xml", RSS)
    assert got == [
        ("https://a.example/p1", "One", "2026-01-02"),
        ("https://a.example/p2", "", ""),
    ]


def test_atom_rel_preference_and_updated_fallback():
    got = feeds.parse_feed_blob("https://b.example/atom.xml", ATOM)
    assert got == [
        ("https://b.example/e1", "E1", "2026-02-03"),
        ("https://b.example/e2", "E2", "2026-02-04"),
    ]


def test_gzip_malformed_oversize():
    gz = gzip.compress(RSS.encode())
    assert len(feeds.parse_feed_blob("https://a.example/feed.xml.gz", gz)) == 2
    assert feeds.parse_feed_blob("https://a.example/f", b"<not xml") == []
    assert feeds.parse_feed_blob("https://a.example/f", None) == []
    big = b"x" * (feeds.MAX_FEED_SIZE + 1)
    assert feeds.parse_feed_blob("https://a.example/f", big) == []


def test_map_in_pandas_driver(spark):
    df = spark.createDataFrame(
        [("https://a.example/feed.xml", RSS), ("https://b.example/atom.xml", ATOM)],
        ["feed_url", "body"],
    )
    rows = {(r["feed_url"], r["url"]) for r in feeds.parse_feeds(df).collect()}
    assert rows == {
        ("https://a.example/feed.xml", "https://a.example/p1"),
        ("https://a.example/feed.xml", "https://a.example/p2"),
        ("https://b.example/atom.xml", "https://b.example/e1"),
        ("https://b.example/atom.xml", "https://b.example/e2"),
    }
