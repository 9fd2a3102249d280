"""Streaming recrawl tracker — the batch scheduler's change-rate statistics
as per-URL streaming state (`applyInPandasWithState`).

A continuous crawl doesn't re-derive change rates from scratch each epoch:
every completed fetch streams one (url, epoch, content-hash) observation in,
and the tracker folds it into per-URL state (observation count, change
count, epoch span, last hash). The emitted rows are the SAME stat columns
`operators/snapshot.recrawl_schedule` aggregates in batch — ranked with the
SAME shared integer priority expression (`snapshot.recrawl_priority_col`) —
so the streaming path and the batch path order URLs identically
(tests/test_recrawl_stream.py proves last-emitted == batch on the full
history).

Ordering contract: observations for one URL must arrive in non-decreasing
epoch order ACROSS batches (the natural shape — each crawl epoch drains as
one micro-batch before the next starts; within a batch the tracker sorts by
epoch itself). Cross-batch change detection rides on the ``last_hash``
carried in state.

Scale shape: state is one short row per URL, keyed by url — the same key
the frontier shuffles on, so a co-partitioned deployment moves each
observation once. State lives in the streaming checkpoint and survives
query restarts (proven by the restart test), which is the resumability leg
of the north rule for the scheduler."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: emitted per url per micro-batch that observed it: the running stats
TRACK_OUT_SCHEMA = (
    "url string, n_obs long, n_changes long, first_epoch long, last_epoch long"
)
TRACK_STATE_SCHEMA = (
    "n_obs long, n_changes long, first_epoch long, last_epoch long, "
    "last_hash string"
)


def _track_fn():
    def track(key, pdfs, state: GroupState):
        url = key[0]
        if state.exists:
            n_obs, n_changes, first_e, last_e, last_h = state.get
        else:
            n_obs, n_changes, first_e, last_e, last_h = 0, 0, None, None, None
        obs = []
        for pdf in pdfs:
            obs.extend(zip(pdf["epoch"], pdf["h"]))
        for epoch, h in sorted(obs, key=lambda t: int(t[0])):
            epoch = int(epoch)
            if last_h is not None and h != last_h:
                n_changes += 1
            last_h = h
            n_obs += 1
            first_e = epoch if first_e is None else min(first_e, epoch)
            last_e = epoch if last_e is None else max(last_e, epoch)
        state.update((n_obs, n_changes, first_e, last_e, last_h))
        yield pd.DataFrame(
            [(url, n_obs, n_changes, first_e, last_e)],
            columns=["url", "n_obs", "n_changes", "first_epoch", "last_epoch"],
        )

    return track


def recrawl_tracker(observations: DataFrame) -> DataFrame:
    """(url, epoch, h) observation stream -> per-URL running change stats.

    Emits one stats row per url per micro-batch that observed it; the latest
    row per url always equals what the batch scheduler would compute over
    the full history so far."""
    return observations.groupBy("url").applyInPandasWithState(
        _track_fn(),
        outputStructType=TRACK_OUT_SCHEMA,
        stateStructType=TRACK_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def due_urls(stats: DataFrame, now_epoch: int, budget: int) -> DataFrame:
    """Rank tracker output by the SHARED batch priority and take the recrawl
    budget — identical scoring to `snapshot.recrawl_schedule`."""
    from ..operators.snapshot import recrawl_priority_col

    return (
        stats.select(
            "url", "n_obs", "n_changes", "last_epoch",
            recrawl_priority_col(now_epoch).alias("priority"),
        )
        .orderBy(F.desc("priority"), "url")
        .limit(budget)
    )
