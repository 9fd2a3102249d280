"""Snapshot diffing: added/removed/changed classification, invalidation
set, and the recrawl loop with the cuckoo seen filter (delete -> refetch)."""

import pytest
from pyspark.sql import functions as F

from web2llmstxt_spark.operators import cuckoo, snapshot

NB = 8
MB = 1 << 13


@pytest.fixture(scope="module")
def snaps(spark):
    v1 = spark.createDataFrame(
        [
            ("https://a.example/", "home page"),
            ("https://a.example/docs", "old docs body"),
            ("https://a.example/gone", "retired page"),
            ("https://a.example/same", "stable content"),
        ],
        "url string, content string",
    )
    v2 = spark.createDataFrame(
        [
            ("https://a.example/", "home page"),          # unchanged
            ("https://a.example/docs", "new docs body"),  # changed
            ("https://a.example/same", "stable content"), # unchanged
            ("https://a.example/new", "fresh page"),      # added
        ],
        "url string, content string",
    )
    return v1, v2


def test_diff_classification(spark, snaps):
    v1, v2 = snaps
    out = {r.url: r for r in snapshot.snapshot_diff(v1, v2).collect()}
    assert set(out) == {
        "https://a.example/docs", "https://a.example/gone",
        "https://a.example/new",
    }  # unchanged rows dropped before materializing
    assert out["https://a.example/docs"].change == "changed"
    assert out["https://a.example/gone"].change == "removed"
    assert out["https://a.example/new"].change == "added"
    # hashes present only on the side that exists
    assert out["https://a.example/new"].h_old is None
    assert out["https://a.example/gone"].h_new is None
    c = out["https://a.example/docs"]
    assert c.h_old is not None and c.h_new is not None and c.h_old != c.h_new


def test_invalidation_feeds_cuckoo_delete(spark, snaps):
    """The recrawl loop: seen filter built from v1 URLs; the diff's
    invalidation set (changed + removed) is deleted from it so those URLs
    probe unseen again, while untouched URLs stay seen (no false
    negatives)."""
    v1, v2 = snaps
    state = cuckoo.merge_state(
        None, cuckoo.delta_state(v1.select("url"), NB, MB), MB
    )
    inval = snapshot.invalidation_set(snapshot.snapshot_diff(v1, v2))
    assert {r.url for r in inval.collect()} == {
        "https://a.example/docs", "https://a.example/gone",
    }
    state2 = cuckoo.delete_urls(state, inval, NB)
    probed = {
        r.url: r.maybe_seen
        for r in cuckoo.probe_state(v1.select("url"), state2, NB).collect()
    }
    assert probed["https://a.example/"] and probed["https://a.example/same"]
    assert not probed["https://a.example/docs"]
    assert not probed["https://a.example/gone"]


def test_null_content_keys_by_row_not_nullability(spark):
    # ADVICE r4: a URL present in both snapshots with null content on one
    # side is CHANGED (or absent if both null), never removed+added.
    v1 = spark.createDataFrame(
        [("https://a.example/n", "body"), ("https://a.example/b", None)],
        "url string, content string",
    )
    v2 = spark.createDataFrame(
        [("https://a.example/n", None), ("https://a.example/b", None)],
        "url string, content string",
    )
    out = {r.url: r.change for r in snapshot.snapshot_diff(v1, v2).collect()}
    assert out == {"https://a.example/n": "changed"}
