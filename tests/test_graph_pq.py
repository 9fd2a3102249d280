"""PageRank (operators/graph.py) and product quantization (operators/pq.py).

The oracle hash-parity of the registry queries (link_pagerank, ann_pq) is
covered by tests/test_oracle_queries.py automatically; these tests pin the
operator semantics the SQL twin can't express: rank-mass conservation,
dangling-node redistribution vs a pure-Python reference, PQ code shape /
compression, and the recall ladder for the approximate paths.
"""

import os

import pytest
from pyspark.sql import functions as F

from web2llmstxt_spark.operators import graph, pq, similarity

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")


def _py_pagerank(n, edges, iters, d=0.85):
    """Single-threaded reference with uniform dangling-mass fold-back."""
    from collections import defaultdict

    out = defaultdict(list)
    for s, t in edges:
        out[s].append(t)
    r = {i: 1.0 / n for i in range(n)}
    for _ in range(iters):
        contrib = defaultdict(float)
        dm = 0.0
        for i in range(n):
            if out[i]:
                share = r[i] / len(out[i])
                for t in out[i]:
                    contrib[t] += share
            else:
                dm += r[i]
        r = {i: (1.0 - d) / n + d * (contrib[i] + dm / n) for i in range(n)}
    return r


def test_pagerank_dangling_vs_reference(spark):
    # node 3 is dangling; node 4 is unreferenced
    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (2, 3), (4, 2)]
    nodes = spark.createDataFrame([(i,) for i in range(5)], "id long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["rank"] for r in graph.pagerank(nodes, edf, iters=4).collect()}
    want = _py_pagerank(5, edges, iters=4)
    assert set(got) == set(want)
    for i in want:
        assert got[i] == pytest.approx(want[i], abs=1e-12), i
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_mass_conserved_on_synthetic_graph(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    edges = graph.synthetic_edges(docs)
    # out-degree varies 1..EDGE_FANOUT and is never 0 (no dangling nodes)
    degs = edges.groupBy("src").count().agg(
        F.min("count"), F.max("count"), F.count("*")
    ).first()
    assert degs[0] == 1 and degs[1] == graph.EDGE_FANOUT
    assert degs[2] == docs.count()
    ranks = graph.pagerank(docs.select(F.col("doc_id").alias("id")), edges, iters=3)
    total = ranks.agg(F.sum("rank")).first()[0]
    assert total == pytest.approx(1.0, abs=1e-9)


def test_pq_codes_shape_and_determinism(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(60)
    books = pq.seed_codebooks(emb)
    codes = pq.pq_encode(emb, books)
    rows = codes.collect()
    assert len(rows) == 60
    for r in rows:
        assert len(r["codes"]) == pq.PQ_M          # 64 floats -> m small ints
        assert all(0 <= c < pq.PQ_KSUB for c in r["codes"])
    # deterministic re-encode (argmin tie-break is pinned)
    again = {r["id"]: r["codes"] for r in pq.pq_encode(emb, books).collect()}
    assert {r["id"]: r["codes"] for r in rows} == again


def test_pq_recall_ladder(spark):
    """Measured at sf0.01 (deterministic pipeline): seed ksub=16 rerank100
    = 7/10, trained ksub=64 iters=2 rerank50 = 8/10. Gates leave a margin
    of 1 for corpus changes."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qvec = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    corpus = emb.filter(F.col("vec_id") != 0)
    exact = {r["vec_id"] for r in similarity.cosine_topk(corpus, qvec, k=10).collect()}

    books = pq.seed_codebooks(corpus)
    codes = pq.pq_encode(corpus, books).persist()
    try:
        rr = {
            r["vec_id"]
            for r in pq.pq_topk_rerank(corpus, codes, books, qvec, k=10,
                                       shortlist=100).collect()
        }
        assert len(exact & rr) >= 6, sorted(rr)
    finally:
        codes.unpersist()

    tbooks = pq.train_codebooks(corpus, ksub=64, iters=2)
    tcodes = pq.pq_encode(corpus, tbooks).persist()
    try:
        trr = {
            r["vec_id"]
            for r in pq.pq_topk_rerank(corpus, tcodes, tbooks, qvec, k=10,
                                       shortlist=50).collect()
        }
        assert len(exact & trr) >= 7, sorted(trr)
    finally:
        tcodes.unpersist()
