"""BPE merge induction (operators/bpe.py): textbook greedy semantics —
including the consecutive-repeat framing edge a shared-delimiter encoding
gets wrong — and encode-by-replay."""

from pyspark.sql import functions as F

from web2llmstxt_spark.operators import bpe


def _words(spark, pairs):
    return spark.createDataFrame(pairs, "word string, cnt long")


def test_textbook_corpus(spark):
    # Sennrich-style toy: low x3, lower, lowest, new, newer
    words = _words(
        spark,
        [("low", 3), ("lower", 1), ("lowest", 1), ("new", 1), ("newer", 1)],
    )
    got = [
        (r["left_tok"], r["right_tok"], r["pair_count"])
        for r in bpe.learn_merges(spark, words, 3).orderBy("step").collect()
    ]
    assert got == [("l", "o", 5), ("lo", "w", 5), ("e", "r", 2)]


def test_consecutive_repeats_count_and_merge_leftmost(spark):
    # 'aaaa': pair (a,a) occurs 3x; merging must produce [aa, aa], not [aa, a, a]
    words = _words(spark, [("aaaa", 1)])
    merges = bpe.learn_merges(spark, words, 2).orderBy("step").collect()
    assert (merges[0]["left_tok"], merges[0]["right_tok"]) == ("a", "a")
    assert merges[0]["pair_count"] == 3
    # second merge sees [aa, aa] -> pair (aa, aa) once
    assert (merges[1]["left_tok"], merges[1]["right_tok"]) == ("aa", "aa")
    assert merges[1]["pair_count"] == 1


def test_odd_repeat_leftmost_first(spark):
    # 'aaa' -> [aa, a] (leftmost pair merges; the straggler stays single)
    words = _words(spark, [("aaa", 1)])
    merges = bpe.learn_merges(spark, words, 1).collect()
    toks = bpe.apply_merges(words, merges).collect()[0]["tokens"]
    assert toks == ["aa", "a"]


def test_tiebreak_lexicographic(spark):
    # (a,b) and (c,d) both count 1: (a,b) wins the tie
    words = _words(spark, [("ab", 1), ("cd", 1)])
    m = bpe.learn_merges(spark, words, 1).collect()[0]
    assert (m["left_tok"], m["right_tok"]) == ("a", "b")


def test_apply_merges_replays_training(spark):
    words = _words(
        spark,
        [("low", 3), ("lower", 1), ("lowest", 1), ("new", 1), ("newer", 1)],
    )
    merges = bpe.learn_merges(spark, words, 3).orderBy("step").collect()
    toks = {
        r["word"]: r["tokens"]
        for r in bpe.apply_merges(words, merges).collect()
    }
    assert toks["low"] == ["low"]
    assert toks["lower"] == ["low", "er"]
    assert toks["newer"] == ["n", "e", "w", "er"]


def test_early_stop_when_pairs_exhaust(spark):
    # 'aa' -> merge 1 fuses it into one symbol; no pair remains -> stop early
    words = _words(spark, [("aa", 1)])
    out = bpe.learn_merges(spark, words, 5).collect()
    assert [(r["left_tok"], r["right_tok"]) for r in out] == [("a", "a")]


def test_oracle_survives_early_stop(spark):
    # vocab supports only 2 merges but the oracle unrolls 8: the empty-best
    # iterations must be no-ops (LEFT JOIN ON TRUE), not vocab-vaporizing
    # cross joins — both twins on the same tiny documents table
    import duckdb

    from web2llmstxt_spark.plans.queries import (
        sql_bpe_encode_stats,
        sql_bpe_merges,
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT 'abc abc xy' AS text")
    merges = con.execute(sql_bpe_merges()).fetchall()
    # 'abc' x2 + 'xy' (len>=2 words): merges (a,b)->(ab,c)->(x,y) = 3 then dry
    assert len(merges) == 3
    stats = dict(
        (r[0], (r[1], r[2])) for r in con.execute(sql_bpe_encode_stats()).fetchall()
    )
    # after replay: abc -> 1 token (x2 corpus count), xy -> 1 token
    assert stats == {1: (2, 3)}

    docs = spark.createDataFrame([("abc abc xy",)], ["text"])
    words = (
        docs.selectExpr("explode(split(text, ' ')) AS word")
        .filter("word rlike '^[a-z]+$' AND length(word) >= 2")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    got = bpe.learn_merges(spark, words, 8).collect()
    assert [(r["left_tok"], r["right_tok"]) for r in got] == [
        (m[1], m[2]) for m in sorted(merges)
    ]


def _py_bpe(word_counts, n_merges):
    """Pure-Python greedy BPE reference: max count, lexicographic tiebreak,
    leftmost non-overlapping merge, multiple occurrences counted per word."""
    reprs = [(tuple(w), c) for w, c in word_counts]
    merges = []
    for _ in range(n_merges):
        pc = {}
        for syms, c in reprs:
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] = pc.get((syms[i], syms[i + 1]), 0) + c
        if not pc:
            break
        (left, right), cnt = sorted(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[0]
        merges.append((left, right, cnt))
        new = []
        for syms, c in reprs:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new.append((tuple(out), c))
        reprs = new
    return merges


def test_deep_merge_chain_with_checkpointing(spark):
    # 40 merges with checkpoint_every=8 crosses five checkpoint boundaries
    # (r5 verdict #3: plan-depth truncation must not change the merge table);
    # parity against the pure-Python greedy reference.
    import random

    rng = random.Random(1234)
    vocab = [
        (
            "".join(rng.choice("abcdef") for _ in range(rng.randint(4, 10))),
            rng.randint(1, 9),
        )
        for _ in range(60)
    ]
    # dedup words (createDataFrame rows independent; reference uses dict-like)
    seen = {}
    for w, c in vocab:
        seen[w] = seen.get(w, 0) + c
    vocab = sorted(seen.items())
    expect = _py_bpe(vocab, 40)
    words = _words(spark, vocab)
    got = [
        (r["left_tok"], r["right_tok"], r["pair_count"])
        for r in bpe.learn_merges(
            spark, words, 40, checkpoint_every=8
        ).orderBy("step").collect()
    ]
    assert got == expect
