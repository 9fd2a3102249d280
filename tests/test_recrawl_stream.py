"""Streaming recrawl tracker (streaming/recrawl_stream.py): per-URL change
state across micro-batches and restarts; last emitted stats == batch
scheduler on the same full history."""

from pyspark.sql import functions as F

from web2llmstxt_spark.operators.snapshot import recrawl_schedule
from web2llmstxt_spark.streaming import recrawl_stream as RS

OBS_SCHEMA = "url string, epoch long, h string"

# 5 epochs, 3 urls: hot changes every epoch, warm once (epoch 3), cold never
HISTORY = [
    (f"https://s/{name}", e, h)
    for name, hashes in {
        "hot": ["h0", "h1", "h2", "h3", "h4"],
        "warm": ["w0", "w0", "w0", "w1", "w1"],
        "cold": ["c0", "c0", "c0", "c0", "c0"],
    }.items()
    for e, h in enumerate(hashes)
]


def _run_stream(spark, tmp_path, batches, run_tag="r"):
    in_dir = tmp_path / "obs"
    in_dir.mkdir(exist_ok=True)
    ck = str(tmp_path / "ck")
    out_dir = str(tmp_path / "out")
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, OBS_SCHEMA).coalesce(1).write.parquet(
            str(in_dir / f"{run_tag}{i}")
        )
    stream = (
        spark.readStream.schema(OBS_SCHEMA)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", 1)  # one epoch-batch per micro-batch
        .parquet(str(in_dir))
    )
    q = (
        RS.recrawl_tracker(stream)
        .withColumn("__t", F.current_timestamp())
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.read.parquet(out_dir)


def _latest_per_url(df):
    rows = df.orderBy("n_obs").collect()
    return {r["url"]: r for r in rows}  # later rows (higher n_obs) win


def test_stream_matches_batch_scheduler(spark, tmp_path):
    by_epoch = [[r for r in HISTORY if r[1] == e] for e in range(5)]
    out = _run_stream(spark, tmp_path, by_epoch)
    latest = _latest_per_url(out)

    batch = {
        r["url"]: r
        for r in recrawl_schedule(
            spark.createDataFrame(HISTORY, OBS_SCHEMA), now_epoch=6, budget=10
        ).collect()
    }
    stream_due = {
        r["url"]: r
        for r in RS.due_urls(
            spark.createDataFrame(
                list(latest.values()),
                "url string, n_obs long, n_changes long, first_epoch long, "
                "last_epoch long, __t timestamp",
            ),
            now_epoch=6,
            budget=10,
        ).collect()
    }
    assert set(batch) == set(stream_due) == {"https://s/hot", "https://s/warm", "https://s/cold"}
    for url in batch:
        for f in ("n_obs", "n_changes", "last_epoch", "priority"):
            assert stream_due[url][f] == batch[url][f], (url, f)


def test_state_survives_restart(spark, tmp_path):
    by_epoch = [[r for r in HISTORY if r[1] == e] for e in range(5)]
    # run 1: epochs 0-2; run 2 (fresh query, same checkpoint): epochs 3-4
    _run_stream(spark, tmp_path, by_epoch[:3], run_tag="a")
    out = _run_stream(spark, tmp_path, by_epoch[3:], run_tag="b")
    latest = _latest_per_url(out)
    hot = latest["https://s/hot"]
    # change at epoch 3 vs epoch-2 hash counted ACROSS the restart
    assert hot["n_obs"] == 5 and hot["n_changes"] == 4
    warm = latest["https://s/warm"]
    assert warm["n_changes"] == 1 and warm["last_epoch"] == 4
