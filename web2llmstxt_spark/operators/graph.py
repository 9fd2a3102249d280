"""Link-graph authority scoring: PageRank over the crawl graph.

The reference prioritizes its frontier with a per-URL keyword heuristic
(C1, ``llmsgen/crawler/web_crawler.py:147-167 (pyc)``). At web scale the
standard complement is link authority — PageRank (Page et al. 1999, "The
PageRank Citation Ranking: Bringing Order to the Web") over the link graph
the crawl itself discovers. This module implements it as pure DataFrame
algebra so a 10^10-edge graph runs as |iters| shuffle rounds of
(src->dst contribution) aggregation, nothing per-row in Python.

Scale shape per iteration: one equi-join edges⋈ranks on src (both sides
hash-partitioned on the join key by AQE), one groupBy(dst) sum with
map-side partial aggregation — shuffled bytes are (dst, contribution)
pairs, never the adjacency payload. Rank lineage is truncated with an
eager ``localCheckpoint`` per iteration (the same BSP-state pattern as
``operators/frontier.py``); on a cluster this maps to a per-iteration
checkpoint/Iceberg snapshot. Dangling-node mass (nodes with no out-links —
ubiquitous in real crawls) is folded back uniformly each iteration, the
textbook correction, at the cost of one tiny agg.

The driver-checked ``link_pagerank`` query derives a deterministic
synthetic edge set from the documents table (fanout regular, no dangling
nodes) so a DuckDB twin can unroll the same iterations in SQL and match
hash-for-hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: deterministic synthetic link graph over doc_id 0..n-1: doc links to
#: (doc_id * EDGE_MULT + j) % n for j in 1..(1 + doc_id % EDGE_FANOUT).
#: Out-degree VARIES 1..3 (a regular graph would make PageRank uniform —
#: a degenerate test); every node still has out-degree >= 1, so the
#: DuckDB twin can omit the dangling-mass term (exactly 0.0 here); the
#: Spark operator still computes it.
EDGE_FANOUT = 3
EDGE_MULT = 7


def synthetic_edges(docs: DataFrame, id_col: str = "doc_id",
                    fanout: int = EDGE_FANOUT, mult: int = EDGE_MULT) -> DataFrame:
    """(src, dst) edge list derived deterministically from the doc ids.

    Requires ids contiguous 0..n-1 (true of the testdata documents table);
    the count() is a metadata-scale job, not a data pass.
    """
    n = docs.count()
    src = F.col(id_col).cast("long")
    return (
        docs.select(src.alias("src"),
                    F.explode(F.array(*[F.lit(j) for j in range(1, fanout + 1)])).alias("j"))
        .filter(F.col("j") <= F.lit(1) + F.col("src") % fanout)
        .select("src", ((F.col("src") * mult + F.col("j")) % n).alias("dst"))
    )


def pagerank(nodes: DataFrame, edges: DataFrame, iters: int = 5,
             damping: float = 0.85, id_col: str = "id") -> DataFrame:
    """Fixed-iteration PageRank. ``nodes``: one column ``id_col``;
    ``edges``: (src, dst). Returns (id, rank), sum(rank) == 1 per iteration
    (damped uniform teleport + dangling mass folded back uniformly).

    Deterministic up to FP summation order (sums over in-edge contribution
    sets are order-free in exact arithmetic; callers that need cross-engine
    hash equality round the output — ulp-scale drift only).
    """
    n = nodes.count()
    # lazily checkpoint the loop-invariant graph tables: the iteration body
    # otherwise re-derives the edge list (and its groupBy outdegree) from
    # the source plan EVERY round — for URL/host graphs that is the full
    # parse+explode subtree x iters (opt guide §2.4: don't recompute what a
    # loop reuses). eager=False: each table materializes ONCE inside the
    # consumer's own job — no extra per-table driver round trip, and no
    # CacheManager plan-cache entry to leak across invocations.
    ids = nodes.select(F.col(id_col).alias("id")).localCheckpoint(eager=False)
    edges = edges.select("src", "dst").localCheckpoint(eager=False)
    outdeg = (
        edges.groupBy("src").agg(F.count("*").alias("g"))
        .localCheckpoint(eager=False)
    )
    # out-degree pre-joined into the edge table ONCE: the loop body joins
    # one table per iteration instead of two (per-edge contribution terms
    # r/g are unchanged values)
    ewg = edges.join(outdeg, "src").localCheckpoint(eager=False)
    ranks = ids.withColumn("r", F.lit(1.0) / F.lit(float(n)))
    for _ in range(iters):
        contrib = (
            ewg.join(ranks.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("r") / F.col("g")).alias("c"))
        )
        # dangling mass: rank held by nodes with no out-edges, redistributed
        # uniformly (0.0 on regular graphs). A broadcast 1-row aggregate in
        # the SAME job as the checkpoint — not a separate .first() round
        # trip per iteration; the arithmetic shape (dm/n as one double
        # division) is unchanged, so ranks are bit-identical.
        dangling = (
            ranks.join(outdeg.withColumnRenamed("src", "id"), "id", "left_anti")
            .agg(F.coalesce(F.sum("r"), F.lit(0.0)).alias("__dm"))
        )
        ranks = (
            ids.join(contrib, "id", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("c"), F.lit(0.0))
                        + F.col("__dm") / F.lit(float(n))
                    )
                ).alias("r"),
            )
            # LAZY checkpoint (the connected_components trick): each level's
            # ranks compute exactly once — the three downstream references
            # (next contrib, next dangling agg, final select) read the
            # materialized blocks instead of exponentially re-expanding the
            # plan — but no per-iteration driver job is paid; the whole
            # loop materializes inside the consumer's single action.
            .localCheckpoint(eager=False)
        )
    return ranks.select(F.col("id"), F.col("r").alias("rank"))


def anchor_texts(edges_anchored: DataFrame, top_k: int = 3) -> DataFrame:
    """Per-target anchor-text aggregation — the classic link-graph relevance
    signal (Brin & Page 1998 §2.2: anchor text is indexed AS IF it were on
    the target page; every production search/crawl stack aggregates it).

    Input: (src, dst, anchor) one row per hyperlink. Output: the ``top_k``
    most frequent anchors per dst with counts and rank, ties broken by
    anchor string so the cut is deterministic.

    Scale shape: the raw edge list (10^11+ rows at web scale) is first
    reduced by groupBy(dst, anchor) — a partial-aggregated count, so the
    popular-homepage skew (10^7 in-links) collapses map-side to one row per
    DISTINCT anchor string before anything wide runs. The top-k window then
    partitions by dst over that already-small table. Anchor strings are
    short; page bytes never appear."""
    from pyspark.sql import Window

    # ONE exchange serves both wide ops: HashPartitioning(dst) satisfies the
    # (dst, anchor) aggregate's ClusteredDistribution (every (dst, anchor)
    # group lives inside one dst partition) AND the per-dst window — without
    # this hint Spark exchanges on (dst, anchor) for the agg and again on
    # (dst) for the window
    counts = (
        edges_anchored.repartition("dst")
        .groupBy("dst", "anchor")
        .agg(F.count("*").alias("n_links"))
    )
    w = Window.partitionBy("dst").orderBy(F.desc("n_links"), F.asc("anchor"))
    return (
        counts.select(
            "dst", "anchor", "n_links", F.row_number().over(w).alias("rnk")
        )
        .filter(F.col("rnk") <= top_k)
    )
