"""n-gram Jaccard verification, SimHash twin parity, host salting."""

import pyspark.sql.functions as F

from web2llmstxt_spark.operators import dedup


def test_ngram_jaccard_verifies_pairs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),   # near-dup of 1
        (3, "completely different text about spark engines here"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    pairs = spark.createDataFrame([(1, 2), (1, 3)], "a int, b int")
    got = {(r.a, r.b): r.jaccard for r in dedup.ngram_jaccard(df, pairs, n=3).collect()}
    assert got[(1, 2)] > 0.5
    assert got[(1, 3)] == 0.0


def test_lsh_finds_near_duplicates(spark):
    base = "spark frontier crawl engine with bloom filters and politeness budgets word"
    rows = [(i, base + f" extra{i}") for i in range(3)]  # shared token sets
    rows += [(10 + i, f"totally unrelated corpus item number {i} with words {i*7}") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    sigs = dedup.minhash_signatures(df, "text", "doc_id", k=8)
    bands = dedup.lsh_bands(sigs, "doc_id", k=8, bands=4)
    pairs = {(r.a, r.b) for r in dedup.lsh_candidate_pairs(bands, "doc_id").collect()}
    # the three near-dup docs share most tokens -> at least one band collides
    assert any(a < 3 and b < 3 for a, b in pairs)


def test_simhash_udf_matches_python_twin(spark):
    rows = [(i, f"some text number {i} with shared vocabulary tokens") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r.doc_id: r.simhash for r in dedup.simhash(df, "text", "doc_id").collect()}
    for i, text in rows:
        assert got[i] == dedup.simhash64_py(text)
    # near-identical texts have small Hamming distance
    a = dedup.simhash64_py("the quick brown fox jumps over the lazy dog today")
    b = dedup.simhash64_py("the quick brown fox jumps over the lazy cat today")
    c = dedup.simhash64_py("completely different words appear in this unrelated sentence")
    ham = lambda x, y: bin((x ^ y) & ((1 << 64) - 1)).count("1")
    assert ham(a, b) < ham(a, c)


def test_host_salting_spreads_skewed_host(spark):
    from web2llmstxt_spark.operators.frontier import FrontierCrawler
    from web2llmstxt_spark.oracle.crawl_oracle import CrawlConfig

    crawler = FrontierCrawler(spark, None.__class__ and spark.range(0).selectExpr("'x' as url"),
                              CrawlConfig(), num_buckets=16)
    urls = [(f"https://mega.example/p{i}",) for i in range(400)]
    urls += [(f"https://tiny{i}.example/",) for i in range(10)]
    df = spark.createDataFrame(urls, "url string")
    unsalted = crawler._bucketed(df)
    n_unsalted = unsalted.filter(F.col("host") == "mega.example").select("bucket").distinct().count()
    assert n_unsalted == 1  # the skewed host pins one partition
    salted = crawler._bucketed(df, salt_hosts={"mega.example": 8})
    n_salted = salted.filter(F.col("host") == "mega.example").select("bucket").distinct().count()
    assert n_salted == 8  # fan-out across 8 buckets
    # non-skewed hosts unaffected
    t0 = unsalted.filter(F.col("host") != "mega.example").select("host", "bucket").collect()
    t1 = salted.filter(F.col("host") != "mega.example").select("host", "bucket").collect()
    assert sorted(map(tuple, t0)) == sorted(map(tuple, t1))


def test_lsh_bucket_cap_limits_boilerplate_blowup(spark):
    """max_bucket caps the self-join blow-up of giant template clusters:
    a B-doc identical cluster emits C(B,2) pairs uncapped but only C(cap,2)
    capped — and capped pairs are a subset of uncapped pairs (lowest ids)."""
    from web2llmstxt_spark.operators import dedup

    docs = spark.createDataFrame(
        [(i, "identical boilerplate page text here") for i in range(20)]
        + [(100, "a unique document about gardens")],
        "doc_id long, text string",
    )
    sigs = dedup.minhash_signatures(docs, "text", "doc_id", k=8)
    bands = dedup.lsh_bands(sigs, "doc_id", k=8, bands=4)
    uncapped = {(r.a, r.b) for r in dedup.lsh_candidate_pairs(bands, "doc_id").collect()}
    capped = {(r.a, r.b) for r in
              dedup.lsh_candidate_pairs(bands, "doc_id", max_bucket=4).collect()}
    assert len(uncapped) == 20 * 19 // 2
    assert len(capped) == 4 * 3 // 2          # only the 4 lowest ids survive
    assert capped <= uncapped
    assert all(a <= 3 and b <= 3 for a, b in capped)


def test_minhash_scale_preset_shape(spark):
    """The k=128 / 16-band production preset (round-1 verdict #9) builds and
    bands correctly: 128 sig columns, 16 band keys per doc, identical docs
    collide on every band."""
    from web2llmstxt_spark.operators import dedup

    docs = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "the quick brown fox"), (3, "completely different words")],
        "doc_id long, text string",
    )
    sigs = dedup.minhash_signatures(
        docs, "text", "doc_id", k=dedup.SCALE_MINHASHES
    )
    assert len(sigs.columns) == 1 + dedup.SCALE_MINHASHES
    bands = dedup.lsh_bands(sigs, "doc_id", k=dedup.SCALE_MINHASHES,
                            bands=dedup.SCALE_BANDS)
    per_doc = bands.groupBy("doc_id").count().collect()
    assert all(r["count"] == dedup.SCALE_BANDS for r in per_doc)
    pairs = {(r.a, r.b) for r in dedup.lsh_candidate_pairs(bands, "doc_id").collect()}
    assert (1, 2) in pairs and not any(3 in p for p in pairs)


def test_simhash_vectorized_matches_reference_kernel():
    """The numpy batch kernel behind simhash64_udf must be bit-identical to
    the scalar reference kernel (simhash64_py) — including the empty-doc 0,
    unicode tokens, and the signed two's-complement conversion."""
    from web2llmstxt_spark.operators.dedup import _simhash64_batch, simhash64_py

    texts = [
        "",
        "   ",
        "one",
        "the quick brown fox jumps over the lazy dog",
        "the the the repeated repeated tokens",
        "的 是 了 在 我 有 和 不",
        "MiXeD Case TOKENS and punctuation, too!",
        "x" * 5000 + " tail words here",
        None,
    ]
    got = _simhash64_batch(texts, {})
    want = [simhash64_py(t or "") for t in texts]
    assert got == want
    assert any(v < 0 for v in got)  # the signed-conversion branch is exercised


def _minhash_py(text: str, k: int = 8) -> list[int]:
    """Pure-Python twin of the affine MinHash formula (dedup.minhash_signatures
    == dedup.minhash_sql): 60-bit md5 prefix mod 2^31-1, k affine transforms,
    min over DISTINCT whitespace tokens of the lowercased/stripped text."""
    import hashlib
    import re

    ws = re.compile(r"[ \t\n\x0b\f\r]+")
    toks = list(dict.fromkeys(ws.split((text or "").lower().strip())))
    p = dedup.MINHASH_PRIME
    hs = [int(hashlib.md5(t.encode("utf-8")).hexdigest()[:15], 16) % p for t in toks]
    return [min((h * a + b) % p for h in hs) for a, b in dedup.affine_coeffs(k)]


def test_minhash_spark_matches_python_twin(spark):
    """Spark conv(md5-prefix,16,10) + Column affine arithmetic must reproduce
    the Python/DuckDB formula bit-for-bit (signed-64 exactness, no overflow)."""
    texts = [
        "the quick brown fox",
        "",
        "   ",
        "UPPER case Mixed\ttabs\nnewlines",
        "unicode tøkens 日本語 here",
        "repeated repeated repeated token",
        "x" * 4000 + " tail",
    ]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id int, text string")
    got = {r["doc_id"]: [r[f"sig_{i}"] for i in range(8)]
           for r in dedup.minhash_signatures(df, "text", "doc_id", k=8).collect()}
    for i, t in enumerate(texts):
        assert got[i] == _minhash_py(t), f"doc {i}: {got[i]} != {_minhash_py(t)}"


def test_minhash_one_md5_per_token_in_plan(spark):
    """The scale contract: ONE md5 evaluation per token, not k. The optimized
    plan must keep the hashed-token array in its own projection (CollapseProject
    must not inline it into each of the k signature expressions)."""
    df = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
    sigs = dedup.minhash_signatures(df, "text", "doc_id", k=dedup.SCALE_MINHASHES)
    plan = sigs._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("md5") <= 2, f"md5 duplicated across signatures:\n{plan[:2000]}"


def test_connected_components_chain_and_isolated(spark):
    """A 5-node path (needs multiple propagation rounds: min label travels
    the diameter), a 2-clique, and symmetric/duplicate input edges."""
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (4, 5), (10, 11), (11, 10), (10, 11)],
        "a long, b long",
    )
    got = {
        r["node"]: r["component"]
        for r in dedup.connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10}


def test_connected_components_converges_early(spark):
    """A clique converges in one round; max_iters is an upper bound, not a
    fixed cost (the changed-count early exit must fire)."""
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3)], "a long, b long"
    )
    got = {
        r["node"]: r["component"]
        for r in dedup.connected_components(pairs, max_iters=25).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1}


def test_window_dup_stats_cross_doc_spans(spark):
    """Substring dedup: only window positions whose hash occurs in >=2
    DISTINCT docs count as duplicated; short docs emit (0, 0, 0)."""
    shared = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 tokens
    rows = [
        (1, shared + " unique tail one two three"),
        (2, "prefix words here " + shared),
        (3, "totally different body with enough tokens to form windows yes"),
        (4, "short doc"),  # < 8 tokens -> no windows
        (5, shared),       # exactly one window, fully duplicated
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r.doc_id: r for r in dedup.window_dup_stats(df, "text", "doc_id", window=8).collect()}
    assert set(got) == {1, 2, 3, 4, 5}
    assert got[4].total_windows == 0 and got[4].dup_windows == 0 and got[4].dup_bp == 0
    # doc 5: 1 window, shared with docs 1 and 2 -> 100% duplicated
    assert (got[5].total_windows, got[5].dup_windows, got[5].dup_bp) == (1, 1, 10000)
    # docs 1 and 2 each contain the shared window at one position
    assert got[1].dup_windows >= 1 and got[2].dup_windows >= 1
    assert 0 < got[1].dup_bp < 10000
    # doc 3 shares nothing
    assert got[3].dup_windows == 0 and got[3].total_windows > 0


def test_window_dup_stats_matches_duckdb_twin(spark):
    import duckdb

    rows = [(i, ("tok%d " % (i % 3)) * 12 + "common run of eight tokens exactly here now") for i in range(30)]
    rows += [(100, "tiny")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = (
        dedup.window_dup_stats(df, "text", "doc_id", window=8)
        .orderBy("doc_id").toPandas()
    )
    con = duckdb.connect()
    con.register("documents", df.toPandas())
    ora = con.sql(
        dedup.window_dup_sql("text", "doc_id", "documents", window=8) + " ORDER BY doc_id"
    ).df().astype(got.dtypes.to_dict())
    assert got.reset_index(drop=True).equals(ora.reset_index(drop=True))


def test_remove_duplicated_spans_cuts_only_covered_tokens(spark):
    shared = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 tokens
    rows = [
        (1, "intro words first " + shared + " tail xyz"),
        (2, shared),
        (3, "independent body with enough tokens to form several windows ok"),
        (4, "tiny"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r.doc_id: r for r in
           dedup.remove_duplicated_spans(df, "text", "doc_id", window=8).collect()}
    # doc 2 is entirely one duplicated window -> fully scrubbed
    assert got[2].clean_text == "" and got[2].kept_tokens == 0
    # doc 1 keeps its unique prefix/suffix, loses exactly the shared 8 tokens
    assert got[1].clean_text == "intro words first tail xyz"
    assert got[1].removed_tokens == 8
    # untouched docs round-trip (lowercased token join)
    assert got[3].removed_tokens == 0
    assert got[3].clean_text == rows[2][1]
    assert got[4].clean_text == "tiny" and got[4].removed_tokens == 0


def test_remove_duplicated_spans_matches_duckdb_twin(spark):
    import duckdb

    rows = [(i, f"head{i % 4} " * 3 + "one common run of eight exact tokens here " + f"tail{i}")
            for i in range(24)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = (dedup.remove_duplicated_spans(df, "text", "doc_id", window=8)
           .orderBy("doc_id").toPandas())
    con = duckdb.connect()
    con.register("documents", df.toPandas())
    ora = con.sql(
        dedup.remove_spans_sql("text", "doc_id", "documents", window=8)
        + " ORDER BY doc_id"
    ).df().astype(got.dtypes.to_dict())
    assert got.reset_index(drop=True).equals(ora.reset_index(drop=True))


def test_bm25_ranks_matching_docs_first(spark):
    from web2llmstxt_spark.operators import bm25

    rows = [
        (1, "spark shuffle spark shuffle exchange partition stage"),
        (2, "spark appears once among many other unrelated words here now"),
        (3, "entirely different vocabulary about cooking pasta tonight"),
        (4, "shuffle shuffle shuffle shuffle dance moves"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = bm25.bm25_topk(df, "spark shuffle", k=3).collect()
    ids = [r.doc_id for r in got]
    assert ids[0] == 1                 # matches BOTH terms, repeatedly
    assert 3 not in ids                # zero-term doc never surfaces
    assert all(got[i].score >= got[i + 1].score for i in range(len(got) - 1))


def test_bm25_matches_duckdb_twin(spark):
    import duckdb
    from web2llmstxt_spark.operators import bm25

    rows = [(i, f"alpha beta{i % 5} gamma " * (1 + i % 3) + "spark " * (i % 4))
            for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = bm25.bm25_topk(df, "spark gamma", k=7).toPandas()
    con = duckdb.connect()
    con.register("documents", df.toPandas())
    ora = con.sql(
        bm25.bm25_sql("spark gamma", "text", "doc_id", "documents", k=7)
    ).df().astype(got.dtypes.to_dict())
    assert got.reset_index(drop=True).equals(ora.reset_index(drop=True))


def test_hash_embed_similarity_structure(spark):
    """Near-identical texts embed near each other; disjoint-vocab texts
    don't — and the output feeds cosine_topk directly (text -> embedding ->
    ANN composition)."""
    import pyspark.sql.functions as FF
    from web2llmstxt_spark.operators import similarity

    rows = [
        (1, "spark shuffle exchange partition stage task executor core"),
        (2, "spark shuffle exchange partition stage task executor node"),
        (3, "pasta tomato basil garlic olive oil dinner recipe tonight"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    emb = similarity.hash_embed(df, "text", "doc_id")
    dim = len(emb.columns) - 1
    vecs = emb.select(
        FF.col("doc_id").alias("vec_id"),
        FF.array(*[FF.col(f"e_{d}") for d in range(dim)]).alias("embedding"),
    )
    q = [r.embedding for r in vecs.filter("vec_id = 1").collect()][0]
    top = similarity.cosine_topk(vecs.filter("vec_id != 1"), list(q), k=2).collect()
    assert top[0].vec_id == 2            # shares 7/8 tokens
    assert top[0].sim > 0.8 > top[1].sim  # doc 3 shares nothing


def test_hash_embed_matches_duckdb_twin(spark):
    import duckdb
    from web2llmstxt_spark.operators import similarity

    rows = [(i, f"tok{i % 7} shared words here " * (1 + i % 3)) for i in range(25)]
    rows.append((99, ""))  # empty text (one empty token after split — pinned semantics)
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = similarity.hash_embed(df, "text", "doc_id").orderBy("doc_id").toPandas()
    con = duckdb.connect()
    con.register("documents", df.toPandas())
    ora = con.sql(
        similarity.hash_embed_sql("text", "doc_id", "documents") + " ORDER BY doc_id"
    ).df().astype(got.dtypes.to_dict())
    assert got.reset_index(drop=True).equals(ora.reset_index(drop=True))


def test_semdedup_drops_within_cluster_neardups(spark):
    """SemDeDup: two well-separated concepts (seeded by the two lowest ids),
    a planted near-dup of each seed is dropped, a below-threshold member of
    each cluster is kept; the hot-cluster cap only loses recall (never
    over-deletes)."""
    from web2llmstxt_spark.operators import similarity

    a, b = [1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]
    rows = [
        (0, a),                          # cluster-A seed
        (1, b),                          # cluster-B seed
        (2, [0.999, 0.001, 0.0, 0.0]),   # near-dup of 0 (cos ~1)   -> dropped
        (3, [0.002, 0.998, 0.0, 0.0]),   # near-dup of 1            -> dropped
        (4, [0.8, 0.0, 0.6, 0.0]),       # A-cluster, cos(0,4)=0.8  -> kept
        (5, [0.0, 0.8, 0.0, 0.6]),       # B-cluster, cos(1,5)=0.8  -> kept
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    kept = similarity.semdedup(df, dim=4, nlist=2, threshold=0.95)
    got = {r.vec_id: r.cid for r in kept.collect()}
    assert set(got) == {0, 1, 4, 5}
    assert got[0] == got[4] and got[1] == got[5] and got[0] != got[1]

    # cap=1: only the first member of each cluster is examined -> no pairs,
    # nothing dropped (the cap keeps overflow members unexamined)
    all_kept = similarity.semdedup(df, dim=4, nlist=2, threshold=0.95, max_cluster=1)
    assert all_kept.count() == 6


def test_cms_never_underestimates_and_finds_heavy_hitters(spark):
    """Count-min sketch: est >= exact for every token, the planted heavy
    hitter tops the estimate ranking, and a tiny sketch (w=8) still never
    underestimates while visibly overestimating colliding tokens."""
    from web2llmstxt_spark.operators import sketch

    rows = [(i, "heavy " * 50 + f"rare{i} light{i % 3}") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    top = sketch.cms_topk_tokens(df, "text", k=50).collect()
    assert top[0].token == "heavy" and top[0].exact == 500
    assert all(r.est >= r.exact for r in top)

    tiny = sketch.cms_topk_tokens(df, "text", k=50, width=8, depth=2).collect()
    assert all(r.est >= r.exact for r in tiny)
    assert any(r.est > r.exact for r in tiny)  # collisions at w=8


def _hll_spec(items, m=64):
    """Pure-Python replica of sketch.hll_registers + hll_estimate."""
    import hashlib
    import math

    from web2llmstxt_spark.operators.sketch import HLL_WBITS, _hll_alpha

    regs = {}
    for t in items:
        idx = int(hashlib.md5(f"i:{t}".encode()).hexdigest()[:15], 16) % m
        w = int(hashlib.md5(f"r:{t}".encode()).hexdigest()[:12], 16)
        rho = HLL_WBITS + 1 - w.bit_length()  # w=0 -> bit_length 0 -> 49
        regs[idx] = max(regs.get(idx, 0), rho)
    s49 = 1 << (HLL_WBITS + 1)
    v_zero = m - len(regs)
    s = sum(1 << (HLL_WBITS + 1 - r) for r in regs.values()) + v_zero * s49
    raw = math.floor((_hll_alpha(m) * float(m * m) * float(s49)) / float(s))
    if raw <= 2.5 * m and v_zero > 0:
        return v_zero, math.floor(m * math.log(m / v_zero))
    return v_zero, raw


def test_hll_matches_python_spec_both_regimes(spark):
    """HLL: the Spark operator reproduces the pure-Python spec exactly in
    BOTH the raw regime (thousands of distinct tokens) and the
    linear-counting regime (tens), and the raw-regime estimate lands within
    3 standard errors (3 * 1.04/sqrt(64) ~= 39%) of the exact count.
    Duplicates must not move the registers (max() absorbs multiplicity)."""
    from web2llmstxt_spark.operators import sketch

    # raw regime: 3000 distinct tokens, each repeated a varying number of times
    rows = [
        (i, " ".join(f"tok{j}" for j in range(i * 30, i * 30 + 30)) + " common")
        for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = sketch.hll_distinct_tokens(df, "text").collect()[0]
    toks = {t for _, txt in rows for t in txt.split()}
    assert got.exact == len(toks) == 3001
    v_spec, est_spec = _hll_spec(toks)
    assert (got.v_zero, got.hll_est) == (v_spec, est_spec)
    assert abs(got.hll_est - got.exact) / got.exact < 0.39

    # duplicate-invariance: the same corpus 5x over -> identical sketch row
    df5 = df.union(df).union(df).union(df).union(df)
    got5 = sketch.hll_distinct_tokens(df5, "text").collect()[0]
    assert (got5.v_zero, got5.hll_est) == (got.v_zero, got.hll_est)

    # linear-counting regime: 12 distinct tokens -> empty registers trigger
    # the small-range correction, which the spec replicates
    small = spark.createDataFrame(
        [(0, " ".join(f"w{j}" for j in range(12)))], "doc_id int, text string"
    )
    gs = sketch.hll_distinct_tokens(small, "text").collect()[0]
    v_spec, est_spec = _hll_spec({f"w{j}" for j in range(12)})
    assert gs.v_zero > 0 and (gs.v_zero, gs.hll_est) == (v_spec, est_spec)
    assert abs(gs.hll_est - 12) <= 4
