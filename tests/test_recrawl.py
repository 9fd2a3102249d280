"""recrawl_schedule semantics (operators/snapshot.py): change-rate-driven
priority — hot pages outrank static ones, staler pages outrank fresher ones,
the budget cut is deterministic."""

from web2llmstxt_spark.operators.snapshot import recrawl_schedule


def _hist(spark, rows):
    return spark.createDataFrame(rows, "url string, epoch int, h string")


def test_change_rate_dominates(spark):
    rows = []
    # hot: hash differs every epoch; static: same hash all 5 epochs
    for e in range(5):
        rows.append(("https://s/hot", e, f"h{e}"))
        rows.append(("https://s/static", e, "same"))
    out = recrawl_schedule(_hist(spark, rows), now_epoch=6, budget=10).collect()
    by = {r["url"]: r for r in out}
    assert by["https://s/hot"]["n_changes"] == 4
    assert by["https://s/static"]["n_changes"] == 0
    assert by["https://s/hot"]["priority"] > by["https://s/static"]["priority"]
    # both observed through epoch 4, span 4: hot=(6-4)*5*1000/4, static=(6-4)*1*1000/4
    assert by["https://s/hot"]["priority"] == 2500
    assert by["https://s/static"]["priority"] == 500


def test_staleness_dominates_at_equal_rate(spark):
    rows = [("https://s/fresh", e, f"h{e}") for e in range(5)]
    rows += [("https://s/stale", e, f"h{e}") for e in range(3)]  # last crawl ep 2
    out = recrawl_schedule(_hist(spark, rows), now_epoch=6, budget=10).collect()
    by = {r["url"]: r for r in out}
    assert by["https://s/stale"]["last_epoch"] == 2
    assert by["https://s/stale"]["priority"] > by["https://s/fresh"]["priority"]


def test_budget_cut_and_tiebreak(spark):
    # 6 identical-priority urls, budget 3: lexicographically first 3 win
    rows = [(f"https://s/p{i}", e, f"h{e}") for i in range(6) for e in range(3)]
    out = recrawl_schedule(_hist(spark, rows), now_epoch=5, budget=3).collect()
    assert [r["url"] for r in out] == [f"https://s/p{i}" for i in range(3)]


def test_single_observation_span_clamped(spark):
    # one crawl ever: span clamps to 1, no divide-by-zero, ages with now
    rows = [("https://s/once", 0, "h0")]
    out = recrawl_schedule(_hist(spark, rows), now_epoch=4, budget=1).collect()
    assert out[0]["priority"] == 4000  # (4-0)*1*1000/1
