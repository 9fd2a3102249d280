"""linkexpand.expand_links == kernels.extract_links, set-for-set per page.

The JVM fast path (SIMPLE_URL_RE + Column normalize) must be bit-identical
to ``kernels.normalize_url`` for every URL it admits, and the gate must
route every query/fragment/params/unicode/uppercase-scheme URL to the
pandas-UDF kernel. This test feeds both adversarial hand-built hrefs and
the synthetic corpus' planted raw-link forms (root-relative, absolute,
trailing-slash, tracking-param, bare-relative, cross-domain noise) through
both implementations.
"""

import pandas as pd
from pyspark.sql import functions as F

from web2llmstxt_spark.functions import kernels, linkexpand
from web2llmstxt_spark.sources.corpus import generate_corpus

BASE = "https://site-a.example"
DOMAIN = "site-a.example"

ADVERSARIAL = [
    # fast-path shapes
    "/docs", "/docs/", "docs/guide", "/a/b/c///", "/", "//proto-relative",
    "https://site-a.example/About-Us", "http://site-a.example:8080/x",
    "https://user_name.site-a.example/path_with-chars.ext",
    # kernel-path shapes (query/fragment/params/unicode/uppercase)
    "/search?q=spark&utm_source=tw", "/a?page=2", "/x#frag", "#onlyfrag",
    "/p;jsessionid=1", "/path?a=1&a=2&fbclid=zz", "/q?keep=%20enc",
    "HTTPS://site-a.example/UPPER-SCHEME", "https://site-a.example/ünï/cøde",
    "https://site-a.example/sp ace?x=y z", "/empty-val?a=&b=1",
    # excluded / dropped
    "mailto:x@y.z", "tel:+1-555", "javascript:void(0)", "", None,
    "https://other.example/offsite", "https://site-a.example",
    # trailing-newline trap: a bare `$` would admit this to the fast path
    "https://site-a.example/nl\n", "/rel-nl\n",
]


def test_expand_links_matches_kernel_adversarial(spark):
    rows = [(1, BASE, DOMAIN, ADVERSARIAL)]
    df = spark.createDataFrame(
        rows, "seed_id int, base_url string, base_domain string, out_links array<string>"
    )
    got = {
        r.url
        for r in linkexpand.expand_links(
            df, "out_links", F.col("base_url"), F.col("base_domain"),
            ["seed_id", "base_url", "base_domain"],
        ).collect()
    }
    want = set(kernels.extract_links(ADVERSARIAL, BASE, DOMAIN))
    assert got == want


def test_expand_links_matches_kernel_on_corpus(spark):
    corpus = generate_corpus(seed=77, n_hosts=3, pages_per_host=30)
    pages = list(corpus.pages.values())[:60]
    rows = [
        (i, f"https://{p.host}", p.host, p.out_links) for i, p in enumerate(pages)
    ]
    df = spark.createDataFrame(
        rows, "seed_id int, base_url string, base_domain string, out_links array<string>"
    )
    got = (
        linkexpand.expand_links(
            df, "out_links", F.col("base_url"), F.col("base_domain"),
            ["seed_id", "base_url", "base_domain"],
        )
        .groupBy("seed_id")
        .agg(F.collect_set("url").alias("urls"))
        .collect()
    )
    got_by_page = {r.seed_id: set(r.urls) for r in got}
    for i, p in enumerate(pages):
        want = set(kernels.extract_links(p.out_links, f"https://{p.host}", p.host))
        assert got_by_page.get(i, set()) == want, f"page {p.url}"


def test_simple_gate_routes_complex_urls_to_kernel():
    """Every URL the JVM gate admits must normalize identically in Python —
    checked directly against kernels.normalize_url via the same regex."""
    import re

    gate = re.compile(linkexpand.SIMPLE_URL_RE)
    for u in [
        "https://site-a.example/About-Us", "http://h.x:8080/a/b///",
        "https://h.example", "https://H.EXAMPLE/Path",
    ]:
        m = gate.match(u)
        assert m, u
        path = re.sub("/+$", "", m.group(3)) or "/"
        fast = f"{m.group(1)}://{m.group(2).lower()}{path}"
        assert fast == kernels.normalize_url(u), u
    for u in [
        "/rel", "HTTPS://upper.scheme/x", "https://h/x?q=1", "https://h/x#f",
        "https://h/x;p", "https://ünï.example/x", "https://u@h.example/x",
        "https://h.example/x\n",
    ]:
        assert not gate.match(u), u
