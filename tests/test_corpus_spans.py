"""Corpus determinism + the input_hint span-sequence invariant."""

import pyspark.sql.functions as F

from web2llmstxt_spark import schemas
from web2llmstxt_spark.functions import kernels, udfs
from web2llmstxt_spark.sources.corpus import generate_corpus


def test_corpus_is_pure_function_of_seed():
    a = generate_corpus(seed=5, n_hosts=2, pages_per_host=20)
    b = generate_corpus(seed=5, n_hosts=2, pages_per_host=20)
    assert list(a.pages) == list(b.pages)
    for u in a.pages:
        assert a.pages[u].spans == b.pages[u].spans
        assert a.pages[u].out_links == b.pages[u].out_links
    c = generate_corpus(seed=6, n_hosts=2, pages_per_host=20)
    assert list(a.pages) != list(c.pages)


def test_corpus_shape_knobs():
    corpus = generate_corpus(seed=5, n_hosts=2, pages_per_host=30, skew_factor=2)
    hosts = {}
    for p in corpus.pages.values():
        hosts[p.host] = hosts.get(p.host, 0) + 1
    assert hosts["ex0.example"] > hosts["ex1.example"]  # skew knob
    # quality mix + failure mix present
    wcs = [p.word_count for p in corpus.pages.values()]
    assert any(w < 50 for w in wcs) and any(w >= 50 for w in wcs)
    assert any(not p.fetch_ok for p in corpus.pages.values())
    # word_count column equals the reference definition over reconstructed content
    for p in corpus.pages.values():
        assert p.word_count == kernels.word_count(p.content)


def test_span_sequence_invariant_under_repartition(spark):
    """(kind, text, media_ref, order) equality: Spark-side reconstruction must
    be stable under shuffling and physical array order (input_hint)."""
    corpus = generate_corpus(seed=9, n_hosts=1, pages_per_host=15)
    rows = corpus.documents_rows()
    df = spark.createDataFrame(rows, schemas.DOCUMENTS)
    # scramble physical span order, then reconstruct
    scrambled = df.withColumn("spans", F.reverse(F.col("spans"))).repartition(16)
    got = {
        r["doc_id"]: r["content"]
        for r in scrambled.withColumn("content", udfs.spans_to_content(F.col("spans")))
        .select("doc_id", "content")
        .collect()
    }
    for url, page in corpus.pages.items():
        assert got[url] == kernels.spans_to_content_py(page.spans) == page.content


def test_span_struct_roundtrip(spark):
    corpus = generate_corpus(seed=9, n_hosts=1, pages_per_host=5)
    df = spark.createDataFrame(corpus.documents_rows(), schemas.DOCUMENTS)
    back = df.select("doc_id", F.explode("spans").alias("s")).select(
        "doc_id", "s.kind", "s.text", "s.media_ref", "s.offset"
    )
    got = {}
    for r in back.collect():
        got.setdefault(r.doc_id, []).append((r.kind, r.text, r.media_ref, r.offset))
    for url, page in corpus.pages.items():
        assert sorted(got[url], key=lambda t: t[3]) == sorted(page.spans, key=lambda t: t[3])
