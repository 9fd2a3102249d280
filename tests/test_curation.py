"""Curation operators: decontamination, repetition filter, stratified sample."""

import pyspark.sql.functions as F
import pytest

from web2llmstxt_spark.operators import curation


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # 0: clean prose
        (0, "the quick brown fox jumps over the lazy dog near the river bank", "en"),
        # 1: shares an 8-gram with doc 0 (contamination target)
        (1, "note that the quick brown fox jumps over the lazy dog was seen", "en"),
        # 2: pathological repetition (one bigram dominates; dup tokens)
        (2, "spam ham spam ham spam ham spam ham spam ham spam ham", "en"),
        # 3: all-distinct tokens
        (3, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "fr"),
        (4, "un deux trois quatre cinq six sept huit neuf dix onze douze", "fr"),
        (5, "ein text ohne wiederholung aber mit genug verschiedenen woertern darin", "de"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


class TestDecontaminate:
    def test_planted_overlap_flagged(self, spark, docs):
        bench = docs.filter(F.col("doc_id") == 0)
        out = {r.doc_id: r for r in curation.decontaminate(docs, bench, n=8).collect()}
        assert len(out) == 6  # one row per corpus doc
        assert out[0].contaminated  # benchmark member itself
        assert out[1].contaminated and out[1].n_hits >= 1  # shared 8-gram
        for i in (2, 3, 4, 5):
            assert not out[i].contaminated and out[i].n_hits == 0

    def test_ngram_order_matters(self, spark, docs):
        # at n=13 the 12-token docs produce one short shingle each; doc 1's
        # differs from doc 0's, so only the benchmark member is flagged
        bench = docs.filter(F.col("doc_id") == 0)
        out = {r.doc_id: r.contaminated
               for r in curation.decontaminate(docs, bench, n=13).collect()}
        assert out[0] and not out[1]


class TestRepetitionStats:
    def test_flags_repetitive_doc_only(self, spark, docs):
        out = {r.doc_id: r for r in curation.repetition_stats(docs).collect()}
        assert not out[2].keep
        assert out[2].n_distinct_tokens == 2
        # top bigram 'spam ham' occurs 6x of the 11 bigrams (12 tokens)
        assert out[2].top_bigram_n == 6 and out[2].n_bigrams == 11
        for i in (0, 1, 3, 4, 5):
            assert out[i].keep, f"doc {i} wrongly dropped"

    def test_counts_exact(self, spark, docs):
        r = {x.doc_id: x for x in curation.repetition_stats(docs).collect()}[0]
        assert r.n_tokens == 13 and r.n_distinct_tokens == 11  # 'the' x3


class TestLineDedup:
    @pytest.fixture(scope="class")
    def lined(self, spark):
        boiler = "subscribe to our newsletter"
        rows = [
            (0, f"{boiler}\nunique opening zero\nshared middle line\n{boiler}"),
            (1, f"{boiler}\nunique opening one\nshared middle line"),
            (2, f"shared middle line\n{boiler}\nunique closing two"),
            (3, "entirely unique document three\nwith two private lines"),
            (4, f"{boiler}"),  # nothing survives
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_boilerplate_stripped_order_kept(self, spark, lined):
        out = {r.doc_id: r for r in
               curation.line_dedup(lined, min_docs=3).collect()}
        # boiler (4 docs) and 'shared middle line' (3 docs) are boilerplate
        assert out[0].text_clean == "unique opening zero"
        assert out[1].text_clean == "unique opening one"
        assert out[2].text_clean == "unique closing two"
        # untouched doc keeps both lines in original order
        assert out[3].text_clean == (
            "entirely unique document three\nwith two private lines")
        assert (out[3].n_lines, out[3].n_kept, out[3].n_removed) == (2, 2, 0)
        # all-boilerplate doc -> empty, counts still exact
        assert out[4].text_clean == ""
        assert (out[4].n_lines, out[4].n_kept, out[4].n_removed) == (1, 0, 1)
        # doc 0 had the boiler line TWICE: both occurrences removed
        assert (out[0].n_lines, out[0].n_kept, out[0].n_removed) == (4, 1, 3)

    def test_min_docs_threshold(self, spark, lined):
        # at min_docs=4 only the boiler line (4 distinct docs) is removed;
        # 'shared middle line' (3 docs) survives everywhere
        out = {r.doc_id: r for r in
               curation.line_dedup(lined, min_docs=4).collect()}
        assert out[0].text_clean == "unique opening zero\nshared middle line"
        assert out[2].text_clean == "shared middle line\nunique closing two"


class TestStratifiedSample:
    def test_exact_k_and_rank_contiguity(self, spark, docs):
        out = curation.stratified_sample(docs, "lang", "doc_id", k=2).collect()
        by_lang = {}
        for r in out:
            by_lang.setdefault(r.lang, []).append(r.rk)
        assert {k: sorted(v) for k, v in by_lang.items()} == {
            "en": [1, 2], "fr": [1, 2], "de": [1],
        }

    def test_mixture_quotas_and_exclusion(self, spark, docs):
        """Quota = floor(total*w/sum); strata outside the mix are excluded;
        a stratum smaller than its quota contributes all it has."""
        from web2llmstxt_spark.operators.curation import (
            mixture_quotas, mixture_sample)

        # en:2 fr:1 over total 6 -> quotas en=4, fr=2; de excluded
        assert mixture_quotas({"en": 2, "fr": 1}, 6) == {"en": 4, "fr": 2}
        out = mixture_sample(docs, {"en": 2, "fr": 1}, 6).collect()
        by_lang = {}
        for r in out:
            by_lang.setdefault(r.lang, set()).add(r.rk)
        # docs has only 3 en rows: quota 4 under-fills to 3
        assert by_lang == {"en": {1, 2, 3}, "fr": {1, 2}}

    def test_salt_invariance(self, spark, docs):
        """The salted phase-1 prune is lossless: any salt gives the exact
        per-stratum top-k by the md5 key."""
        a = sorted(map(tuple, curation.stratified_sample(
            docs, "lang", "doc_id", k=2, salt=1).collect()))
        b = sorted(map(tuple, curation.stratified_sample(
            docs, "lang", "doc_id", k=2, salt=32).collect()))
        assert a == b and len(a) == 5


def test_pack_sequences_layout_invariants(spark):
    from web2llmstxt_spark.operators import curation

    rows = [(i, "w " * (10 * (i + 1))) for i in range(8)]  # 10,20,...,80 tokens
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = sorted(
        curation.pack_sequences(df, budget=64, text_col="text").collect(),
        key=lambda r: r.doc_id,
    )
    # contiguous stream: each offset = previous offset + previous length
    for prev, cur in zip(got, got[1:]):
        assert cur.stream_offset == prev.stream_offset + prev.n_tokens
    assert got[0].stream_offset == 0
    # bin math holds row-by-row
    for r in got:
        assert r.bin_id == r.stream_offset // 64
        assert r.bin_offset == r.stream_offset % 64
    # total stream length 360 tokens -> last doc starts in bin 4 (offset 280)
    assert got[-1].stream_offset == 280 and got[-1].bin_id == 4


def test_pack_sequences_matches_duckdb_twin(spark):
    import duckdb

    from web2llmstxt_spark.operators import curation

    rows = [(i, "tok " * (1 + (i * 13) % 37)) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = curation.pack_sequences(df, 100).orderBy("doc_id").toPandas()
    con = duckdb.connect()
    con.register("documents", df.toPandas())
    ora = con.sql(
        curation.pack_sequences_sql(100, "text", "doc_id", "documents")
        + " ORDER BY doc_id"
    ).df().astype(got.dtypes.to_dict())
    assert got.reset_index(drop=True).equals(ora.reset_index(drop=True))


def test_lm_xent_scores_atypical_docs_higher(spark):
    """A doc whose transitions dominate the corpus model scores LOWER
    cross-entropy than a doc made of corpus-rare transitions."""
    from web2llmstxt_spark.operators import textstats

    common = "the cat sat on the mat"
    rows = [(i, common) for i in range(9)]
    rows.append((100, "mat the on sat cat the"))  # same unigrams, rare bigrams
    rows.append((200, "x"))                       # < 2 tokens -> NULL xent
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r.doc_id: r for r in textstats.lm_xent(df, "text", "doc_id").collect()}
    assert got[0].xent < got[100].xent
    assert got[200].n_bigrams == 0 and got[200].xent is None
    assert got[0].n_bigrams == 5


def test_lm_xent_matches_duckdb_twin(spark):
    import duckdb

    from web2llmstxt_spark.operators import textstats

    rows = [(i, ("alpha beta gamma " * (1 + i % 4)) + f"tail{i % 6} omega")
            for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = textstats.lm_xent(df, "text", "doc_id").orderBy("doc_id").toPandas()
    con = duckdb.connect()
    con.register("documents", df.toPandas())
    ora = con.sql(
        textstats.lm_xent_sql("text", "doc_id", "documents") + " ORDER BY doc_id"
    ).df().astype(got.dtypes.to_dict())
    assert got.reset_index(drop=True).equals(ora.reset_index(drop=True))


def test_c4_clean_rules(spark):
    from web2llmstxt_spark.operators import curation

    nl = chr(10)
    rows = [
        # 4 good lines -> kept, short/unpunctuated lines removed
        (1, nl.join(["one two three four five six.",
                     "seven eight nine ten eleven?",
                     "no terminal punctuation here at all",
                     "tiny line.",
                     'twelve thirteen fourteen fifteen sixteen."',
                     "closing words here make five more!"])),
        # only 2 surviving lines -> page dropped
        (2, nl.join(["alpha beta gamma delta epsilon.",
                     "zeta eta theta iota kappa.",
                     "short one."])),
        (3, "good line one two three four. " + nl + "Lorem Ipsum dolor sit."),
        (4, "fine line with five words." + nl + "code block " + chr(123) + " starts here now."),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r.doc_id: r for r in curation.c4_clean(df).collect()}
    assert got[1].keep and got[1].n_kept == 4 and got[1].n_lines == 6
    assert "no terminal punctuation" not in got[1].clean_text
    assert "tiny line." not in got[1].clean_text
    assert not got[2].keep and got[2].clean_text == ""
    assert not got[3].keep            # lorem ipsum, case-insensitive
    assert not got[4].keep            # curly brace


def test_c4_clean_matches_duckdb_twin(spark):
    import duckdb

    from web2llmstxt_spark.operators import curation

    nl = chr(10)
    rows = [(i, nl.join(
        (f"word{j} " * (3 + (i + j) % 5)).strip() + ("." if (i + j) % 2 else "")
        for j in range(1 + i % 6)
    )) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = curation.c4_clean(df).orderBy("doc_id").toPandas()
    con = duckdb.connect()
    con.register("documents", df.toPandas())
    ora = con.sql(
        curation.c4_clean_sql("text", "doc_id", "documents") + " ORDER BY doc_id"
    ).df().astype(got.dtypes.to_dict())
    assert got.reset_index(drop=True).equals(ora.reset_index(drop=True))


def test_dsir_select_prefers_target_like_docs(spark):
    """DSIR: a raw doc sharing the target subset's vocabulary outranks a raw
    doc with alien vocabulary; target docs themselves score highest."""
    tgt_text = "spark shuffle partition executor stage codegen arrow"
    rows = [(i, tgt_text + f" v{i}", "en") for i in range(4)]          # target
    rows += [(10, "spark shuffle partition executor extra words", "xx"),  # target-like
             (11, "pasta tomato basil garlic dinner recipe tonight", "xx")]  # alien
    df = spark.createDataFrame(rows, "doc_id int, text string, lang string")
    from web2llmstxt_spark.operators import curation

    top = curation.dsir_select(df, F.col("lang") == "en", k=6).collect()
    scores = {r.doc_id: r.score for r in top}
    assert scores[10] > scores[11]
    assert min(scores[i] for i in range(4)) > scores[10] // 2  # targets rank high

    # DuckDB twin bit-parity on the same frame
    import duckdb

    con = duckdb.connect()
    con.register("documents", df.toPandas())
    ora = con.sql(
        curation.dsir_select_sql("text", "doc_id", "lang = 'en'", "documents", k=6)
    ).fetchall()
    assert [(r.doc_id, r.score) for r in top] == [(a, b) for a, b in ora]


def test_exact_quantiles_matches_python_spec(spark):
    """exact_quantiles: min v with |{x <= v}| >= ceil(p*N) — checked against
    a brute-force Python spec on a multiset with ties, including the exact
    integer-boundary case (p*N divisible by 10000) and p covering min/max."""
    import math

    from web2llmstxt_spark.operators import textstats

    vals = [1, 1, 1, 2, 2, 5, 5, 5, 5, 9, 40, 40]  # N=12, heavy ties
    df = spark.createDataFrame([(v,) for v in vals], "x int")
    ps = (1, 2500, 5000, 7500, 9999, 10000)  # 2500*12/10000=3 exactly
    got = {
        r.p_bp: r.value
        for r in textstats.exact_quantiles(df, "x", ps_bp=ps).collect()
    }
    sv = sorted(vals)

    def spec(p_bp):
        target = -(-p_bp * len(sv) // 10000)  # ceil in integer arithmetic
        return sv[target - 1]

    assert got == {p: spec(p) for p in ps}
    assert got[1] == min(vals) and got[10000] == max(vals)
    assert math.ceil(2500 * len(sv) / 10000) == 3 and got[2500] == sv[2]


def test_exact_quantiles_guards_wide_domains(spark):
    """r4 verdict #6: a high-cardinality column must raise before the
    unpartitioned cumulative window, not silently single-partition-sort."""
    from web2llmstxt_spark.operators import textstats

    wide = spark.range(500).select((F.col("id") * 7919).alias("x"))
    with pytest.raises(ValueError, match="distinct"):
        textstats.exact_quantiles(wide, "x", max_distinct=100)
    # opting out still works, and the guarded default passes small domains
    ok = {
        r["p_bp"]: r["value"]
        for r in textstats.exact_quantiles(wide, "x", max_distinct=None).collect()
    }
    assert ok[5000] == 249 * 7919
