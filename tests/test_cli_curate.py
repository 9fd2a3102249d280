"""CLI curate subcommand: pipeline composition, stats, and written output."""

import argparse

from web2llmstxt_spark.cli import run_curate


def _args(tmp_path, in_path, **over):
    d = dict(in_parquet=in_path, out=str(tmp_path / "curated"),
             text_col="text", id_col="doc_id", bench_parquet=None,
             no_repetition_gate=False, no_pii_scrub=False,
             no_substring_scrub=False, no_exact_dedup=False)
    d.update(over)
    return argparse.Namespace(**d)


def _write_docs(spark, tmp_path, rows):
    p = str(tmp_path / "docs_in")
    spark.createDataFrame(rows, "doc_id int, text string").write.parquet(p)
    return p


def test_curate_pipeline_stats_and_output(spark, tmp_path):
    uniq = ("the quick brown fox number %d jumped over one lazy dog near "
            "river bank %d today with fresh morning air around")
    rows = [(i, uniq % (i, i * 7)) for i in range(6)]
    rows += [(10, "spam spam spam spam spam spam spam spam")]       # repetition gate
    rows += [(11, rows[0][1]), (12, rows[0][1])]                    # exact dups of 0
    p = _write_docs(spark, tmp_path, rows)
    stats = run_curate(spark, _args(tmp_path, p))
    assert stats["in_docs"] == 9
    assert stats["dropped_repetition"] == 1                          # doc 10
    # docs 0/11/12 identical: substring scrub empties all three (cross-doc
    # dup windows cover them), then exact dedup keeps one of the empties
    assert stats["dedup_removed"] == 2
    assert stats["kept_docs"] == 6
    out = {r.doc_id for r in spark.read.parquet(str(tmp_path / "curated")).collect()}
    assert 10 not in out and len(out) == 6


def test_curate_decontamination_gate(spark, tmp_path):
    base = ("completely distinct words appear here item %d plus extra tail "
            "segment %d closing out this sentence nicely and cleanly")
    rows = [(i, base % (i, i)) for i in range(4)]
    p = _write_docs(spark, tmp_path, rows)
    # eval set shares doc 0's exact text -> doc 0 is contaminated
    bench = str(tmp_path / "bench_in")
    spark.createDataFrame([(100, rows[0][1])], "doc_id int, text string") \
        .write.parquet(bench)
    stats = run_curate(spark, _args(
        tmp_path, p, bench_parquet=bench,
        no_repetition_gate=True, no_substring_scrub=True, no_exact_dedup=True))
    assert stats["dropped_contaminated"] == 1
    out = {r.doc_id for r in spark.read.parquet(str(tmp_path / "curated")).collect()}
    assert out == {1, 2, 3}


def test_curate_flags_disable_stages(spark, tmp_path):
    rows = [(1, "alpha bravo contact me at bob@example.com for details today"),
            (2, "alpha bravo contact me at bob@example.com for details today")]
    p = _write_docs(spark, tmp_path, rows)
    stats = run_curate(spark, _args(
        tmp_path, p, no_repetition_gate=True, no_pii_scrub=True,
        no_substring_scrub=True, no_exact_dedup=True))
    assert stats == {"in_docs": 2, "kept_docs": 2, "out": str(tmp_path / "curated")}
    texts = {r.text for r in spark.read.parquet(str(tmp_path / "curated")).collect()}
    assert texts == {rows[0][1]}  # untouched, PII intact, dups kept


def test_curate_pack_out_writes_training_shards(spark, tmp_path):
    """--pack-out: packed shards land partitioned by shard_id, the in-shard
    (bin_id, bin_offset) replay is stream-ordered, and token accounting is
    exact (sum n_tokens == last stream_offset + its n_tokens)."""
    rows = [(i, f"tok{i} " * (5 + i % 4)) for i in range(40)]
    p = _write_docs(spark, tmp_path, rows)
    args = _args(tmp_path, p, no_repetition_gate=True, no_pii_scrub=True,
                 no_substring_scrub=True, no_exact_dedup=True,
                 pack_out=str(tmp_path / "shards"), pack_budget=16,
                 bins_per_shard=4)
    stats = run_curate(spark, args)
    pk = stats["pack"]
    assert pk["docs"] == 40
    back = spark.read.parquet(str(tmp_path / "shards"))
    assert "shard_id" in back.columns
    got = back.orderBy("shard_id", "bin_id", "bin_offset").collect()
    # shard boundaries are bin boundaries; bins map to their shard
    assert all(r.bin_id // 4 == r.shard_id for r in got)
    # stream order: offsets strictly increase along the replay order
    offs = [r.stream_offset for r in got]
    assert offs == sorted(offs) and len(set(offs)) == len(offs)
    assert pk["tokens"] == got[-1].stream_offset + got[-1].n_tokens
    assert pk["shards"] >= 2  # the tiny budget actually sharded
