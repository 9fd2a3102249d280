"""The BSP frontier crawler — the reference's BFS loop as Spark supersteps.

Rebuilds v2 ``discover_all_links_first`` (llmsgen/crawler/web_crawler.py:
169-249 (pyc), SURVEY.md §3-EP3) as a driver-side superstep loop where each
depth is ONE declarative DataFrame job:

    frontier ──left_anti(seen)──► score(pandas UDF) ──filter(>thr)──►
    robots filter ──► per-host politeness cap (window) ──►
    global priority order (score desc, url asc) ──► budget cut ──►
    FETCH (join site_pages / pluggable fetcher) ──► quality filter wc>=50 ──►
    emit pages + explode(out-links) ──► union into frontier; seen += attempted

Parity contract: byte-identical pages (url/title/content/word_count/score/
depth/phase), crawl ORDER (rank column) and final URL-seen set vs
``oracle.crawl_oracle.crawl`` on the same corpus + config (quirks Q1/Q5/Q6/Q7
and the comprehensive-mode mid-depth budget cut replicated — see oracle
docstring).

Scale design (10^10-URL frontier, north rule):
- frontier & seen are hash-partitioned by host bucket; the anti-join
  shuffles once on url and is preceded (optional) by the partition-local
  Bloom pre-filter in ``operators/bloom.py`` which removes the vast majority
  of already-seen URLs WITHOUT shuffling the full seen table.
- the global priority order is a range-partitioned sort (Spark samples
  boundaries; no driver collect); the budget cut uses ``limit`` (distributed
  top-k) in normal mode and a running-success window in comprehensive mode.
  The window is the only single-partition step and operates on the
  already-budget-bounded candidate slice; for budgets beyond one partition
  swap in the documented two-phase threshold selection.
- the fetch is pluggable: in production a politeness-gated HTTP pandas UDF
  (``HttpFetcher`` stub); in tests/bench the corpus join (``TableFetcher``,
  candidate side broadcast — the site table scan is a simulation artifact,
  not the design point).
- per-superstep state (frontier/seen/pages/metrics) is written to parquet
  snapshots (Iceberg-shaped layout) => resumable runs + truncated lineage.
"""

from __future__ import annotations

import json
import os
import time
import urllib.parse

import pandas as pd
from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType, StringType

from ..functions import kernels, linkexpand, udfs
from ..oracle.crawl_oracle import CrawlConfig
from ..session import CACHE_LEVEL
from . import bloom, ranking

#: below this kept-page count the finalize (url, rank) table is broadcast
#: (~120 B/row -> ≤500 MB build side), so finalize never shuffles content;
#: above it the join falls back to a hash shuffle (10^10-frontier safe)
BROADCAST_RANK_MAX = 4_000_000

#: incremental-state crawls union one cached delta per superstep; past this
#: many parts the union is compacted into a single checkpoint so plan width
#: and per-scan task counts stay bounded on deep / auto-batched crawls
STATE_COMPACT_PARTS = 32


def _union_parts(parts: list[DataFrame]) -> DataFrame:
    """Lazy union of individually-materialized state parts (append-only
    tables: seen = depth-0 checkpoint + one cached attempt set per
    superstep; frontier = depth-0 checkpoint + one checkpointed fresh-link
    delta per superstep). Scanning the union costs the same as scanning one
    checkpointed table of the same rows; building it writes nothing."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@pandas_udf(StringType())
def base_domain_udf(base_urls: pd.Series) -> pd.Series:
    """urlparse(base_url).netloc — ref llmsgen/crawler/web_crawler.py:186 (pyc)."""
    return base_urls.map(lambda u: urllib.parse.urlparse(u).netloc)


def _robots_match_udf(rules_by_host: dict):
    """Closure UDF: longest-prefix robots decision (same as oracle)."""

    @pandas_udf(BooleanType())
    def disallowed(urls: pd.Series) -> pd.Series:
        from web2llmstxt_spark.oracle.crawl_oracle import robots_disallowed

        return urls.map(lambda u: robots_disallowed(u, rules_by_host))

    return disallowed


class TableFetcher:
    """Fetch simulation: join the attempt set with the site_pages corpus on
    canonical URL. The reference's ``crawler.arun`` (crawler/web_crawler.py:
    93-103) becomes a broadcast join of the (small) per-superstep attempt set
    against the corpus."""

    # crawl() passes url_hint= only to fetchers that declare support, so a
    # user-injected fetcher with the plain fetch(cand) signature keeps working
    supports_url_hint = True

    # isin() pushdown bound: past this the In-list itself is the bottleneck
    # (expression tree size, per-batch evaluation) and a scan-side prefilter
    # stops paying for itself vs just streaming the corpus into the join
    URL_HINT_MAX = 8192

    def __init__(self, site_pages: DataFrame):
        self.site = site_pages

    def fetch(self, cand: DataFrame, url_hint: list[str] | None = None) -> DataFrame:
        """cand(url, ...) -> cand + (found, success, title, content, wc, out_links).

        Left join preserving the attempt set; the per-superstep attempt set is
        the small side, the corpus the big one — AQE converts this to a
        broadcast of whichever side is actually small at runtime. (In
        production fetch is HTTP via mapInPandas; this join only exists in the
        simulator, so its scan cost is not the scale design point.)

        url_hint: when the caller already knows the complete candidate URL
        set driver-side (depth 0: the normalized seed list — no collect
        involved), push it into the corpus scan as an In-predicate. Against a
        cached corpus sorted within partitions by url this prunes whole
        columnar batches via their min/max stats; against a parquet/Iceberg
        source it prunes row groups / data files. This is the scan-pruning
        an Iceberg seed-lookup would get from metadata for free, and it is
        semantics-free: filtering the RIGHT side of a left-outer equi-join
        to a superset of the left side's keys cannot change the result.
        """
        site = self.site
        if url_hint is not None and len(url_hint) <= self.URL_HINT_MAX:
            site = site.filter(F.col("url").isin(list(url_hint)))
        site = site.select(
            "url", "title", "spans", "out_links", "fetch_ok"
        ).withColumn("found", F.lit(True))
        # SHUFFLE_HASH on the attempt side: the left-outer join preserves
        # cand, so the corpus side can never be broadcast; without the hint
        # the planner falls back to SortMergeJoin (cand's python-UDF lineage
        # has no stats) and re-sorts the FULL wide corpus on every superstep.
        # With it, the tiny attempt set builds the hash table (LeftOuter +
        # BuildLeft) and the cached corpus streams partition-aligned.
        joined = cand.hint("SHUFFLE_HASH").join(site, "url", "left")
        return _fetch_post(
            joined.withColumn("found", F.coalesce(F.col("found"), F.lit(False)))
        )


def _fetch_post(df: DataFrame) -> DataFrame:
    """Shared fetch post-processing (TableFetcher + ClosedFormFetcher):
    derive content/wc/success from (found, spans, fetch_ok) with the SAME
    JVM expressions so both fetch modes are bit-identical downstream."""
    return (
        df.withColumn(
            "content",
            F.when(F.col("found"), udfs.spans_to_content(F.col("spans"))).otherwise(F.lit(None)),
        )
        .withColumn(
            "wc",
            F.when(F.col("found"), udfs.native_word_count(F.col("content"))).otherwise(F.lit(0)),
        )
        .withColumn("success", F.col("found") & F.coalesce(F.col("fetch_ok"), F.lit(False)))
    )


class ClosedFormFetcher:
    """HTTP-shaped fetch against the closed-form corpus
    (sources/cfcorpus.py): a mapInPandas that evaluates each candidate URL's
    page in O(1) — per-candidate work only, NO documents-table scan.

    This is the production fetcher's exact cost shape (the reference fetches
    each URL over HTTP and parses it: crawler/web_crawler.py:93-103 — work
    proportional to |candidates|, never to the corpus), so the scaling
    matrix uses it to measure the frontier ENGINE separated from the
    documents-table scan that TableFetcher adds (BENCH_SCALING.md). Parity:
    tests/test_cf_fetcher.py proves it byte-equal to TableFetcher over the
    parquet written by generate_corpus_cf from the same params.
    """

    # crawl() may pass url_hint; a scan prefilter is meaningless here (there
    # is no scan), so accept-and-ignore keeps the call-site contract
    supports_url_hint = True

    def __init__(self, seed: int, n_hosts: int, pages_per_host: int,
                 out_links: int = 40, host_offset: int = 0):
        self.params = (seed, n_hosts, pages_per_host, out_links, host_offset)

    def fetch(self, cand: DataFrame, url_hint=None) -> DataFrame:
        from pyspark.sql.types import (
            ArrayType, BooleanType, IntegerType, StringType, StructField,
            StructType,
        )

        seed, n_hosts, pages_per_host, out_links, host_offset = self.params
        span_t = StructType([
            StructField("kind", StringType()),
            StructField("text", StringType()),
            StructField("media_ref", StringType()),
            StructField("offset", IntegerType()),
        ])
        out_schema = StructType(
            list(cand.schema.fields)
            + [
                StructField("title", StringType()),
                StructField("spans", ArrayType(span_t)),
                StructField("out_links", ArrayType(StringType())),
                StructField("fetch_ok", BooleanType()),
                StructField("found", BooleanType()),
            ]
        )

        # Spread candidates across fetch workers BEFORE the narrow
        # mapInPandas: candidates arrive as slim (url, meta) rows, so AQE
        # sizes their post-shuffle partitions by PRE-fetch bytes and
        # coalesces millions of them into a handful of partitions — the
        # fetch (which fans each row out ~50x into spans/links/content)
        # would then run near-serially and everything downstream of the
        # attempt cache would inherit the same few fat partitions (measured:
        # cf crawl 2x slower than the table join at 8 cores, ANTI-scaling to
        # 32). An HTTP fetch scheduler does exactly this spread when it
        # assigns URLs to fetcher workers. Round-robin, not hash: perfectly
        # even load, and the url-hash locality the table join needed is
        # irrelevant here.
        n_fetch = int(cand.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        cand = cand.repartition(n_fetch)

        def gen(batches):
            # executors import from the shipped package zip
            from web2llmstxt_spark.sources import cfcorpus

            for pdf in batches:
                titles, spans_c, links_c, oks, founds = [], [], [], [], []
                for url in pdf["url"]:
                    loc = cfcorpus.invert_url(
                        url, seed, n_hosts, pages_per_host, host_offset
                    )
                    if loc is None:
                        titles.append(None); spans_c.append(None)
                        links_c.append(None); oks.append(None)
                        founds.append(False)
                    else:
                        row = cfcorpus.page_fields(
                            seed, loc[0], loc[1], pages_per_host, out_links
                        )
                        titles.append(row["title"])
                        spans_c.append(row["spans"])
                        links_c.append(row["out_links"])
                        oks.append(row["fetch_ok"])
                        founds.append(True)
                out = pdf.copy()
                out["title"] = titles
                out["spans"] = spans_c
                out["out_links"] = links_c
                out["fetch_ok"] = oks
                out["found"] = founds
                yield out

        return _fetch_post(cand.mapInPandas(gen, out_schema))


def HttpFetcher(*args, **kwargs):
    """Production fetch path (S2): real stdlib-urllib HTTP transport via
    mapInPandas with UDF-internal retry — implemented in
    sources/httpfetch.py (kept there with its HTML round-trip kernels and
    the loopback CorpusHTTPServer the byte-parity tests crawl against).
    This constructor is the back-compatible entry point at the old name."""
    from ..sources.httpfetch import HttpFetcher as _Impl

    return _Impl(*args, **kwargs)


class FrontierCrawler:
    def __init__(
        self,
        spark: SparkSession,
        site_pages: DataFrame,
        cfg: CrawlConfig,
        robots_rules: list[tuple] | None = None,   # (host, agent, rule, prefix)
        run_dir: str | None = None,
        num_buckets: int = 32,
        use_bloom: bool = True,
        seen_filter: str = "bloom",
        use_native_scorer: bool = True,
        run_id: str = "run",
        fetcher=None,
        salt_hosts: dict[str, int] | None = None,
        robots_mode: str = "join",
    ):
        self.spark = spark
        self.cfg = cfg
        # pluggable fetch seam (T5): default corpus-join simulator; tests
        # inject operators/retry.RetryingFetcher over a flaky transport;
        # production injects the HTTP RetryingFetcher.
        self.fetcher = fetcher if fetcher is not None else TableFetcher(site_pages)
        self.run_dir = run_dir
        self.num_buckets = num_buckets
        self.use_bloom = use_bloom
        # which approximate-membership filter pre-screens the seen anti-join
        # (north rule: "Bloom/cuckoo"). Both expose the same delta/merge/
        # probe/prefilter interface and the same no-false-negative contract;
        # cuckoo additionally supports deletion (cuckoo.delete_urls).
        if seen_filter not in ("bloom", "cuckoo"):
            raise ValueError(f"seen_filter must be 'bloom' or 'cuckoo', got {seen_filter!r}")
        self.seen_filter = seen_filter
        if seen_filter == "cuckoo":
            from . import cuckoo as _filter_mod
        else:
            _filter_mod = bloom
        self._filter_mod = _filter_mod
        # north-rule skew salting: skewed host -> fan-out k; threaded through
        # every Bloom bucket derivation (operators/bloom._bucket_col) so one
        # mega-host's URLs spread over k partitions on both the bitmap and
        # probe sides. Results are unchanged (test_salted_crawl_parity).
        self.salt_hosts = salt_hosts
        # JVM Column-algebra scorer (functions/native.py): same results as the
        # pandas-UDF kernel (parity-tested), ~no Python boundary. DEFAULT ON —
        # scoring is the highest-volume per-URL computation at a 10^10-URL
        # frontier; the pandas-UDF kernel remains the bit-exactness oracle
        # twin (use_native_scorer=False) for parity tests.
        self.use_native_scorer = use_native_scorer
        self.run_id = run_id
        self.metrics: list[dict] = []
        # incremental Bloom state (north rule "merged per superstep"): the
        # accumulated per-bucket bitmaps; each superstep ORs in only the
        # attempted-URL delta. Doubling rebuild when a bucket outgrows
        # BITS_PER_KEY load. Counters exposed for tests/metrics.
        self._bloom: DataFrame | None = None
        self.bloom_m_bits = bloom.DEFAULT_M_BITS
        self.bloom_rebuilds = 0
        self.bloom_deltas = 0
        self._bloom_rebuild_pending = False
        # S6 enforcement carrier (r5, scale-safe default): 'join' keeps
        # policies as a per-host rule-array DataFrame broadcast-joined to
        # candidates with a Column-algebra longest-prefix decision — no
        # driver dict in task closures, no per-rule plan growth, works at
        # 10^6+ hosts. 'native' (compiled WHEN chain) and 'udf' (pandas
        # closure) remain as bounded-ruleset parity twins of the same
        # semantics (test_frontier_parity exercises all three).
        if robots_mode not in ("join", "native", "udf"):
            raise ValueError(f"robots_mode must be join|native|udf, got {robots_mode!r}")
        self.robots_mode = robots_mode
        self.rules_by_host: dict = {}
        self._robots_rules_df: DataFrame | None = None
        self._robots_broadcastable = True
        if cfg.enforce_robots and robots_rules:
            for host, _agent, rule, prefix in robots_rules:
                self.rules_by_host.setdefault(host, []).append((rule, prefix))
            if robots_mode == "join":
                from . import robots as _robots

                n_rules = sum(len(r) for r in self.rules_by_host.values())
                self._robots_broadcastable = (
                    n_rules <= _robots.ROBOTS_BROADCAST_MAX_RULES
                )
                # tiny per-host table, cached once: every superstep's join
                # reuses the aggregated arrays instead of re-running the agg
                self._robots_rules_df = _robots.rules_array_from_list(
                    spark, self.rules_by_host
                ).cache()

    # ------------------------------------------------------------------ utils
    def _with_host(self, df: DataFrame, url_col: str = "url") -> DataFrame:
        return df.withColumn("host", F.lower(F.parse_url(F.col(url_col), F.lit("HOST"))))

    def _bucketed(self, df: DataFrame, url_col: str = "url",
                  salt_hosts: dict[str, int] | None = None) -> DataFrame:
        """Host-hash partitioning (north rule): co-locates a host's URLs so
        seen-filter state and politeness decisions are partition-local.

        Delegates the bucket id to ``bloom._bucket_col`` — ONE salted,
        JVM-native implementation shared with the live Bloom prefilter path
        (see its docstring for the salting contract; AQE skew-join handles
        residual skew)."""
        df = self._with_host(df, url_col)
        df = df.withColumn(
            "bucket", bloom._bucket_col(F.col(url_col), self.num_buckets, salt_hosts)
        )
        return df.repartition(self.num_buckets, "bucket")

    def _snapshot(self, df: DataFrame, name: str, superstep: int) -> DataFrame:
        """Superstep state handoff.

        run_dir set   -> parquet snapshot (the Iceberg-table pattern:
                         resumable runs + truncated lineage; see
                         state/checkpoint.py).
        run_dir unset -> eager localCheckpoint. Lineage MUST be truncated at
                         superstep boundaries: state DataFrames (seen,
                         frontier) are referenced several times by the next
                         superstep's DAG, and lazy chains re-run every prior
                         superstep's shuffles (measured: superstep wall grew
                         9s -> 14s -> 46s -> 98s lazily vs flat ~3s eager).
        """
        if self.run_dir is None:
            return df.localCheckpoint(eager=True, storageLevel=CACHE_LEVEL)
        path = os.path.join(self.run_dir, f"superstep={superstep}", name)
        df.write.mode("overwrite").parquet(path)
        return self.spark.read.parquet(path)

    def _bucket_lineage(self, df: DataFrame) -> dict[str, int]:
        """Per-partition (host-hash bucket) row counts for the durable
        snapshot's metrics.json (north rule: per-partition lineage +
        metrics). Keyed by the SAME salted bucket id that partitions the
        Bloom/seen state (bloom._bucket_col), so an operator reading the
        metrics can attribute frontier growth or skew to a concrete state
        partition. Bounded at num_buckets keys and column-pruned to `url`
        against the just-written parquet — run only in run_dir mode, where
        the snapshot write already dominates the superstep wall."""
        rows = (
            df.groupBy(
                bloom._bucket_col(F.col("url"), self.num_buckets, self.salt_hosts)
                .alias("bucket")
            )
            .count()
            .collect()
        )
        return {str(r["bucket"]): r["count"] for r in rows}

    def _commit_superstep(self, superstep: int) -> None:
        """Write the per-superstep commit marker LAST — a snapshot is only
        resumable once pages+seen+frontier (and metrics) are all on disk. A
        driver crash between the seen and frontier writes must NOT leave a
        superstep that load_state would treat as complete (round-1 advice:
        that silently truncated resumed crawls)."""
        with open(os.path.join(self.run_dir, f"superstep={superstep}", "_COMMIT"), "w") as f:
            f.write("ok")

    # ------------------------------------------------------- superstep state
    def _advance_bloom(self, attempted_urls: DataFrame, seen_next: DataFrame):
        """Next Bloom state as a lazy plan: OR in only this superstep's
        attempted URLs (O(|delta|), the round-1 fix vs rebuilding from the
        full seen table), or — when a bucket outgrew its load factor — a
        doubling rebuild from seen (amortized O(log n) full scans total)."""
        if self._bloom_rebuild_pending or self._bloom is None:
            if self._bloom is not None:
                self.bloom_m_bits *= 2
                self.bloom_rebuilds += 1
            self._bloom_rebuild_pending = False
            return self._filter_mod.merge_state(
                None, self._filter_mod.delta_state(seen_next, self.num_buckets, self.bloom_m_bits,
                                    self.salt_hosts)
            )
        self.bloom_deltas += 1
        delta = self._filter_mod.delta_state(attempted_urls, self.num_buckets, self.bloom_m_bits,
                                    self.salt_hosts)
        return self._filter_mod.merge_state(self._bloom, delta, self.bloom_m_bits)

    def _fetch_attempts(
        self, todo: DataFrame, bound: int | None, materialized: bool = False
    ) -> DataFrame:
        """Adaptive scan-pruned fetch for supersteps >= 1.

        The depth-0 fetch already pushes the seed list into the corpus scan
        as an In-predicate (the seed set is the crawl's input, known
        driver-side). Later supersteps normally can't: the attempt set is
        distributed. But whenever the attempt set is PROVABLY small — the
        previous state checkpoint's Observation bounded |frontier| (and
        cand ⊆ frontier), or the budget cut just counted cand — it is
        cheaper to materialize the candidate chain once (one tiny job),
        ship the <= URL_HINT_MAX urls to the driver, and let the fetcher
        prune its corpus scan, than to stream the full documents table
        through the fetch join. That per-superstep O(|corpus|) stream is the
        measured table-mode scaling ceiling (BENCH_SCALING.md round-4:
        ~17 s/superstep at BOTH cluster sizes for a 2,718-URL superstep on
        the 6.4 M-page corpus); with the hint such supersteps touch only
        the columnar batches / row groups whose min-max straddle an
        attempted url. Same Iceberg-metadata-lookup analogy as depth 0, and
        semantics-free for the same reason (the scan keeps a superset of
        the left side's join keys).

        `bound` None or > URL_HINT_MAX, or a fetcher with no scan
        (ClosedFormFetcher, HTTP), falls through to the plain fetch —
        zero extra jobs on that path.
        """
        f = self.fetcher
        hint_max = getattr(f, "URL_HINT_MAX", 0)
        if not (
            getattr(f, "supports_url_hint", False)
            and hint_max
            and bound is not None
            and 0 < bound <= hint_max
        ):
            return f.fetch(todo)
        if not materialized:
            todo = todo.localCheckpoint(eager=True)
        urls = [r[0] for r in todo.select("url").collect()]
        if not urls:
            return f.fetch(todo)
        return f.fetch(todo, url_hint=urls)

    def _checkpoint_state(self, seen_df: DataFrame, frontier_df: DataFrame,
                          bloom_df: DataFrame | None, tag) -> tuple:
        """ONE combined checkpoint job for all superstep state (seen +
        frontier + Bloom bitmaps share a 'kind' discriminator), with an
        Observation riding the same job to return the frontier size and the
        max per-bucket Bloom key count — no extra count() actions.

        Returns (seen, frontier, bloom_state, frontier_count).
        """
        nulls = [
            F.lit(None).cast("int").alias("bucket"),
            F.lit(None).cast("binary").alias("bitmap"),
            F.lit(None).cast("long").alias("n_keys"),
        ]
        seen_part = seen_df.select(
            F.lit("seen").alias("kind"),
            "url",
            F.lit(None).cast("int").alias("seed_id"),
            F.lit(None).cast("string").alias("base_url"),
            F.lit(None).cast("string").alias("base_domain"),
            *nulls,
        )
        frontier_part = frontier_df.select(
            F.lit("frontier").alias("kind"),
            "url", "seed_id", "base_url", "base_domain",
            *nulls,
        )
        parts = seen_part.unionByName(frontier_part)
        if bloom_df is not None:
            parts = parts.unionByName(
                bloom_df.select(
                    F.lit("bloom").alias("kind"),
                    F.lit(None).cast("string").alias("url"),
                    F.lit(None).cast("int").alias("seed_id"),
                    F.lit(None).cast("string").alias("base_url"),
                    F.lit(None).cast("string").alias("base_domain"),
                    "bucket", "bitmap", "n_keys",
                )
            )
        obs = Observation(f"state_{self.run_id}_{tag}")
        parts = parts.observe(
            obs,
            F.sum(F.when(F.col("kind") == "frontier", 1).otherwise(0)).alias("frontier_n"),
            F.max(F.when(F.col("kind") == "bloom", F.col("n_keys"))).alias("bloom_max_keys"),
        )
        state = parts.localCheckpoint(eager=True, storageLevel=CACHE_LEVEL)
        m = obs.get
        seen = state.filter(F.col("kind") == "seen").select("url")
        frontier = state.filter(F.col("kind") == "frontier").select(
            "url", "seed_id", "base_url", "base_domain"
        )
        bloom_state = None
        if bloom_df is not None:
            bloom_state = state.filter(F.col("kind") == "bloom").select(
                "bucket", "bitmap", "n_keys"
            )
            mk = m.get("bloom_max_keys")
            if mk is not None and self._filter_mod.needs_rebuild(int(mk), self.bloom_m_bits):
                self._bloom_rebuild_pending = True
        frontier_count = int(m["frontier_n"]) if m.get("frontier_n") is not None else 0
        return seen, frontier, bloom_state, frontier_count

    def _checkpoint_delta(self, fresh_df: DataFrame, bloom_df: DataFrame | None,
                          tag) -> tuple:
        """Incremental counterpart of _checkpoint_state: ONE combined job
        materializing only this superstep's frontier delta (`fresh` —
        already anti-joined disjoint from the live frontier) plus the Bloom
        bitmap state, with an Observation returning |fresh| and the max
        per-bucket Bloom key count. The seen delta needs NO job at all: it
        is exactly the attempt set, which this superstep's stats action
        already materialized into the cache.

        Returns (fresh_ckpt, bloom_state, fresh_count).
        """
        parts = fresh_df.select(
            F.lit("frontier").alias("kind"),
            "url", "seed_id", "base_url", "base_domain",
            F.lit(None).cast("int").alias("bucket"),
            F.lit(None).cast("binary").alias("bitmap"),
            F.lit(None).cast("long").alias("n_keys"),
        )
        if bloom_df is not None:
            parts = parts.unionByName(
                bloom_df.select(
                    F.lit("bloom").alias("kind"),
                    F.lit(None).cast("string").alias("url"),
                    F.lit(None).cast("int").alias("seed_id"),
                    F.lit(None).cast("string").alias("base_url"),
                    F.lit(None).cast("string").alias("base_domain"),
                    "bucket", "bitmap", "n_keys",
                )
            )
        obs = Observation(f"delta_{self.run_id}_{tag}")
        parts = parts.observe(
            obs,
            F.sum(F.when(F.col("kind") == "frontier", 1).otherwise(0)).alias("fresh_n"),
            F.max(F.when(F.col("kind") == "bloom", F.col("n_keys"))).alias("bloom_max_keys"),
        )
        state = parts.localCheckpoint(eager=True, storageLevel=CACHE_LEVEL)
        m = obs.get
        fresh_ckpt = state.filter(F.col("kind") == "frontier").select(
            "url", "seed_id", "base_url", "base_domain"
        )
        bloom_state = None
        if bloom_df is not None:
            bloom_state = state.filter(F.col("kind") == "bloom").select(
                "bucket", "bitmap", "n_keys"
            )
            mk = m.get("bloom_max_keys")
            if mk is not None and self._filter_mod.needs_rebuild(int(mk), self.bloom_m_bits):
                self._bloom_rebuild_pending = True
        fresh_n = int(m["fresh_n"]) if m.get("fresh_n") is not None else 0
        return fresh_ckpt, bloom_state, fresh_n

    # --------------------------------------------------------- distributed rank
    def _with_global_rank(self, df: DataFrame, order, rank_col: str,
                          cum_col_flag=None) -> DataFrame:
        """Two-pass distributed rank (shared impl: operators/ranking.py)."""
        return ranking.global_rank(df, order, rank_col, cum_col_flag)

    def _jobdesc(self, tag: str) -> None:
        """Crawl-phase tag for event-log / Spark-UI attribution: every job
        submitted after this carries ``crawl:<tag>`` in its description
        (scripts/analyze_eventlog.py groups stage walls by it). Driver-side
        only; zero effect on plans."""
        self.spark.sparkContext.setJobDescription(f"crawl:{tag}")

    # ------------------------------------------------------------------ crawl
    def crawl(self, seeds: list[tuple[int, str]], _resume=None):
        """Run the full BFS; returns (pages_df ordered by rank, seen_df).

        ``_resume=(last_superstep, pages, seen, frontier)`` continues from a
        state/checkpoint.py snapshot instead of fetching the seeds again.
        """
        spark = self.spark
        cfg = self.cfg
        budget = cfg.effective_safety_limit
        t_crawl = time.time()
        # coarse phase walls for the scaling harness (depth-0 setup vs BSP
        # loop vs finalize); purely driver-side clocks, no extra jobs
        self.phase_walls: dict[str, int] = {}

        seeds_df = spark.createDataFrame(
            [(sid, url) for sid, url in seeds], "seed_id int, base_url string"
        ).withColumn("base_domain", base_domain_udf(F.col("base_url")))
        # Dedup on the NORMALIZED url: _finalize (and the comprehensive-mode
        # budget cut) join ranks back by url assuming uniqueness — two seeds
        # that normalize to the same URL (trailing-slash variants) would
        # otherwise duplicate depth-0 rows and fan that join out. Lowest
        # seed_id wins, keeping the crawl order deterministic.
        w_seed = Window.partitionBy("url").orderBy(F.asc("seed_id"))
        seeds_df = (
            seeds_df.withColumn("url", udfs.normalize_url_udf(F.col("base_url")))
            .withColumn("__sr", F.row_number().over(w_seed))
            .filter(F.col("__sr") == 1)
            .drop("__sr")
        )
        # deduped seed count, driver-side (same normalize kernel as the UDF):
        # feeds the durable superstep-0 metrics' `attempted` without a job
        seed_urls = sorted({kernels.normalize_url(u) for _, u in seeds})
        n_seeds = len(seed_urls)

        # --- depth 0: main pages (ref :196-206 (pyc); score 10.0, no wc gate)
        # The seed URL set is known driver-side (it IS the input), so push it
        # into the fetch as a scan predicate: the corpus scan prunes columnar
        # batches / parquet row groups instead of streaming the full table to
        # probe |seeds| keys. Only for fetchers that declare the kwarg.
        if getattr(self.fetcher, "supports_url_hint", False):
            fetched0 = self.fetcher.fetch(seeds_df, url_hint=seed_urls)
        else:
            fetched0 = self.fetcher.fetch(seeds_df)
        main = (
            fetched0.filter(F.col("success"))
            .withColumn("title2", udfs.extract_title_udf(F.col("title"), F.col("content"), F.col("url")))
            .withColumn("score", F.lit(10.0))
            .withColumn("depth", F.lit(0))
            .withColumn("discovery_phase", F.lit("main_page"))
        )
        pages_cols = [
            "url",
            F.col("title2").alias("title"),
            "content",
            F.col("wc").alias("word_count"),
            "score",
            "depth",
            "discovery_phase",
            "seed_id",
        ]
        # ONE materialization of the depth-0 fetch: pages AND link expansion
        # both read this cache — without it the state checkpoint re-ran the
        # fetch join (a second full corpus stream) just to get out_links
        main0 = main.select(*pages_cols, "out_links", "base_url", "base_domain")
        PAGES_COL_NAMES = [
            "url", "title", "content", "word_count",
            "score", "depth", "discovery_phase", "seed_id",
        ]
        LINK_COL_NAMES = ["url", "out_links", "seed_id", "base_url", "base_domain"]
        start_depth = 1
        # Known frontier size from the last state checkpoint's Observation:
        # lets the budget cut be SKIPPED without a count job whenever
        # |frontier| <= remaining (cand ⊆ frontier). None = unknown (durable
        # snapshot modes) -> fall back to the explicit count.
        frontier_count: int | None = None
        if _resume is not None:
            last, pages, seen, frontier = _resume
            pages_count = pages.count()
            all_pages = [pages]
            if frontier is None or last >= cfg.depth_limit:
                return self._finalize(all_pages, pages_count), seen
            start_depth = last + 1
            if self.use_bloom:  # resume: rebuild filter state from seen ONCE
                self._bloom = self._filter_mod.merge_state(
                    None, self._filter_mod.delta_state(seen, self.num_buckets, self.bloom_m_bits,
                                        self.salt_hosts),
                    self.bloom_m_bits,
                ).localCheckpoint(eager=True)
        elif self.run_dir is not None:
            main0 = main0.persist(CACHE_LEVEL)
            pages = self._snapshot(main0.select(*PAGES_COL_NAMES), "pages", 0)
            pages_count = pages.count()
            seen = self._snapshot(pages.select("url"), "seen", 0)
            frontier = self._snapshot(
                self._new_links(main0.select(*LINK_COL_NAMES), from_depth=0),
                "frontier", 0,
            )
            self.metrics.append(
                {
                    "run_id": self.run_id,
                    "superstep": 0,
                    "attempted": n_seeds,
                    "pages_kept": pages_count,
                    "pages_total": pages_count,
                    "bloom_deltas": self.bloom_deltas,
                    "bloom_rebuilds": self.bloom_rebuilds,
                    "bloom_m_bits": self.bloom_m_bits,
                    "frontier_by_bucket": self._bucket_lineage(frontier),
                    "pages_by_bucket": self._bucket_lineage(pages),
                }
            )
            with open(os.path.join(self.run_dir, "superstep=0", "metrics.json"), "w") as f:
                json.dump(self.metrics[-1], f)
            self._commit_superstep(0)
            all_pages = [pages]
            if self.use_bloom:
                self._bloom = self._filter_mod.merge_state(
                    None, self._filter_mod.delta_state(seen, self.num_buckets, self.bloom_m_bits,
                                        self.salt_hosts),
                    self.bloom_m_bits,
                ).localCheckpoint(eager=True)
        else:
            main0 = main0.persist(CACHE_LEVEL)
            pages = main0.select(*PAGES_COL_NAMES)
            self._jobdesc("d0-fetch")
            pages_count = main0.count()
            self.phase_walls["d0_fetch_ms"] = int((time.time() - t_crawl) * 1000)
            bloom0 = None
            if self.use_bloom:
                # salt_hosts MUST reach the build side too: a salted seed
                # host's bits must land in the same bucket the probe reads,
                # else depth-0 URLs become Bloom false negatives (re-crawled)
                # merged (not raw-delta) form: the checkpoint stores these
                # rows as probe-able state, and a cuckoo delta (packed
                # hashes) only becomes a table through merge_state
                bloom0 = self._filter_mod.merge_state(
                    None,
                    self._filter_mod.delta_state(
                        pages.select("url"), self.num_buckets, self.bloom_m_bits,
                        self.salt_hosts,
                    ),
                    self.bloom_m_bits,
                )
            self._jobdesc("d0-state")
            t_d0s = time.time()
            seen, frontier, self._bloom, frontier_count = self._checkpoint_state(
                pages.select("url"),
                self._new_links(main0.select(*LINK_COL_NAMES), from_depth=0),
                bloom0, 0,
            )
            self.phase_walls["d0_state_ms"] = int((time.time() - t_d0s) * 1000)
            all_pages = [pages]

        self.phase_walls["depth0_ms"] = int((time.time() - t_crawl) * 1000)
        # append-only state parts for the in-memory incremental advance
        # (durable runs keep full per-superstep snapshots for resume instead)
        seen_parts: list[DataFrame] = [seen]
        frontier_parts: list[DataFrame] = [frontier]
        t_loop = time.time()
        # --- supersteps (ref :211-246 (pyc)) --------------------------------
        for depth in range(start_depth, cfg.depth_limit + 1):
            if pages_count >= budget:                      # :212
                break
            self._jobdesc(f"ss{depth}-attempt")
            t0 = time.time()
            remaining = budget - pages_count

            if self.use_bloom:
                # Bloom fast path + exact check on maybes == exact anti-join;
                # bitmaps are accumulated state, NOT rebuilt from seen
                cand = self._filter_mod.prefilter_with_state(
                    frontier, self._bloom, seen, self.num_buckets, self.salt_hosts
                )
            else:
                cand = frontier.join(seen, "url", "left_anti")  # J1 exact

            if self.use_native_scorer:
                from ..functions import native

                cand = cand.withColumn(
                    "score", native.score_url_native(F.col("url"), F.col("base_url"))
                )
            else:
                cand = cand.withColumn(
                    "score", udfs.score_url_udf(F.col("url"), F.col("base_url"))
                )
            cand = cand.filter(F.col("score") > F.lit(cfg.score_threshold))  # :218
            if cfg.enforce_robots and self.rules_by_host:
                if self.robots_mode == "join" and self._robots_rules_df is not None:
                    # hot path: broadcast-joined per-host rule arrays +
                    # Column-algebra longest-prefix decision — the carrier
                    # that survives 10^6+ hosts (no closure capture, no
                    # WHEN-chain plan growth)
                    from . import robots as _robots

                    cand = _robots.enforce_robots_join(
                        cand,
                        self._robots_rules_df,
                        broadcast=self._robots_broadcastable,
                    )
                elif self.robots_mode == "native":
                    from ..functions import native

                    # parity twin: compiled WHEN chain (bounded rulesets)
                    cand = cand.filter(
                        ~native.robots_disallowed_native(F.col("url"), self.rules_by_host)
                    )
                else:
                    # parity twin: the oracle's own matcher as a pandas UDF
                    cand = cand.filter(~_robots_match_udf(self.rules_by_host)(F.col("url")))
            if cfg.deny_hosts:
                # trap-host denylist (operators/traps): enforcement is a
                # broadcast anti-join, same cost shape as the robots chain —
                # the detector's output plugs in here without touching the
                # hot path when the list is empty
                deny_df = spark.createDataFrame(
                    [(h,) for h in sorted(cfg.deny_hosts)], "host string"
                )
                cand = (
                    self._with_host(cand)
                    .join(F.broadcast(deny_df), "host", "left_anti")
                    .drop("host")
                )
            if cfg.host_caps:
                caps_df = spark.createDataFrame(
                    list(cfg.host_caps.items()), "host string, cap int"
                )
                cand = self._with_host(cand)
                w_host = Window.partitionBy("host").orderBy(F.desc("score"), F.asc("url"))
                cand = (
                    cand.join(F.broadcast(caps_df), "host", "left")
                    .withColumn("hrank", F.row_number().over(w_host))
                    .filter(F.col("cap").isNull() | (F.col("hrank") <= F.col("cap")))
                    .drop("cap", "hrank", "host")
                )

            order = (F.desc("score"), F.asc("url"))        # canonical Q1 tie-break
            fetched_cache = None
            if cfg.comprehensive:
                # no slice (:220); budget bites mid-depth (:227): a candidate
                # is ATTEMPTED iff fewer than `remaining` successes precede it
                # in the global priority order (distributed running sum).
                # Rank on a content-free projection and join back (as in
                # _finalize): the fetched content is cached ONCE and never
                # crosses the rank's range shuffle or checkpoint; the join
                # reuses the fetch join's url partitioning, so only the
                # (url, __cum_before) table shuffles.
                fetched_cache = self._fetch_attempts(
                    cand, frontier_count
                ).persist(CACHE_LEVEL)
                appended = F.col("success") & (F.col("wc") >= 50)
                slim = fetched_cache.select("url", "score", "success", "wc")
                ranked = self._with_global_rank(
                    slim, order, "__r", cum_col_flag=appended
                ).select("url", "__cum_before")
                attempted = (
                    fetched_cache.join(ranked, "url")
                    .filter(F.col("__cum_before") < remaining)
                    .drop("__cum_before")
                )
            else:
                # :220 slice — but only pay for the distributed top-k when
                # the cut can actually bite (usually one superstep per crawl).
                # cand ⊆ frontier, so when the last checkpoint observed
                # |frontier| <= remaining the cut CANNOT bite and the whole
                # count/checkpoint detour is skipped (zero extra jobs on the
                # common path).
                todo_bound: int | None = None   # proven |todo| upper bound
                todo_materialized = False
                if frontier_count is not None and frontier_count <= remaining:
                    todo = cand
                    todo_bound = frontier_count   # cand ⊆ frontier
                else:
                    cand = cand.localCheckpoint(eager=True)
                    n_cand = cand.count()
                    if n_cand > remaining:
                        ranked = self._with_global_rank(cand, order, "__r")
                        todo = ranked.filter(F.col("__r") <= remaining).drop("__r")
                    else:
                        todo = cand
                        todo_bound = n_cand
                        todo_materialized = True
                attempted = self._fetch_attempts(todo, todo_bound, todo_materialized)
            attempted = attempted.persist(CACHE_LEVEL)
            # the ONE action of this superstep: materializes the whole chain
            # (anti-join/bloom, scoring, sort, budget cut, fetch) into the
            # cache and returns both loop-control counters at once
            appended_flag = (F.col("success") & (F.col("wc") >= 50)).cast("long")
            t_attempt = time.time()
            stats = attempted.agg(
                F.count("*").alias("att"), F.coalesce(F.sum(appended_flag), F.lit(0)).alias("added")
            ).first()
            attempt_ms = int((time.time() - t_attempt) * 1000)
            if fetched_cache is not None:
                # attempted is materialized; the pre-cut fetch cache is dead
                fetched_cache.unpersist()
            attempted_count, added = stats["att"], stats["added"]
            if attempted_count == 0:                       # :216/:221
                attempted.unpersist()
                break

            new_pages = (
                attempted.filter(F.col("success") & (F.col("wc") >= 50))  # :237
                .withColumn("title2", udfs.extract_title_udf(F.col("title"), F.col("content"), F.col("url")))
                .withColumn("depth", F.lit(depth))
                .withColumn("discovery_phase", F.lit(f"depth_{depth}"))
            )
            new_pages = new_pages.select(*pages_cols)
            pages_count += added

            # Q5. Plain union, NO dropDuplicates: `attempted` is exactly
            # anti-joined against `seen` (Bloom path == exact path, audited),
            # and internally distinct (attempted ⊆ cand ⊆ frontier; frontier
            # urls are groupBy-dedup'd at discovery; the fetch join is
            # row-preserving on the unique-url corpus). A dedup here
            # re-shuffled the FULL seen set every superstep — O(|seen|)
            # per-superstep shuffle for an invariant that already holds.
            seen_next = seen.unionByName(attempted.select("url"))
            frontier_next = frontier
            fresh = None
            if depth < cfg.depth_limit:                   # Q7: last depth no expand
                links = self._new_links(
                    new_pages.select("url").join(
                        attempted.select("url", "out_links", "seed_id", "base_url", "base_domain"),
                        "url",
                    ),
                    from_depth=depth,
                )
                # Q6: union AFTER the depth; first-discovery ctx wins
                fresh = links.join(frontier, "url", "left_anti")
                frontier_next = frontier.unionByName(fresh)

            # The loop exits after this superstep when the depth limit or the
            # page budget is reached — then frontier/Bloom state is dead
            # weight: the frontier rewrite (O(|frontier|)) and the Bloom
            # delta build (4 probe positions/URL) would never be read. The
            # last superstep is typically the LARGEST (budget exhaustion), so
            # skipping its state advance removes the single biggest
            # checkpoint. Durable runs (run_dir) still write everything —
            # resume needs the full state history.
            will_continue = depth < cfg.depth_limit and pages_count < budget
            self._jobdesc(f"ss{depth}-state")
            t_state = time.time()
            bloom_next = (
                self._advance_bloom(attempted.select("url"), seen_next)
                if self.use_bloom and (will_continue or self.run_dir is not None)
                else None
            )
            if self.run_dir is not None:
                # resumable layout: one parquet per state table
                new_pages = self._snapshot(new_pages, "pages", depth)
                seen = self._snapshot(seen_next, "seen", depth)
                frontier = self._snapshot(frontier_next, "frontier", depth)
                if bloom_next is not None:
                    self._bloom = bloom_next.localCheckpoint(eager=True)
            elif will_continue:
                # INCREMENTAL state advance, O(|delta|) per superstep: both
                # state tables are append-only (seen grows by exactly this
                # superstep's attempt set, which is ALREADY cached; frontier
                # by `fresh`, already anti-joined disjoint), so only the
                # frontier delta + Bloom bitmaps are checkpointed — ONE
                # combined job with an Observation returning |fresh| for
                # free — and the live tables become lazy unions of cached
                # parts. The previous design re-checkpointed the FULL
                # seen+frontier every superstep: O(|state|) memory-bus
                # read+write per superstep, the `ss-state` term the round-4
                # scaling decomposition measured at eff 0.78 (BENCH_
                # SCALING.md). Reads over the union cost the same as over
                # one table (each part is individually materialized; the
                # columnar cache still prunes to `url`); writes drop from
                # cumulative-state size to delta size. Compacted back into
                # one checkpoint every STATE_COMPACT_PARTS supersteps so
                # plan width stays bounded on deep/auto-batched crawls.
                seen_parts.append(attempted.select("url"))
                fresh_ckpt, self._bloom, fresh_n = self._checkpoint_delta(
                    fresh, bloom_next, depth
                )
                frontier_parts.append(fresh_ckpt)
                if frontier_count is not None:
                    frontier_count += fresh_n
                if len(frontier_parts) > STATE_COMPACT_PARTS:
                    seen, frontier, self._bloom, frontier_count = (
                        self._checkpoint_state(
                            _union_parts(seen_parts), _union_parts(frontier_parts),
                            self._bloom, f"{depth}c",
                        )
                    )
                    seen_parts = [seen]
                    frontier_parts = [frontier]
                else:
                    seen = _union_parts(seen_parts)
                    frontier = _union_parts(frontier_parts)
                new_pages = new_pages.persist(CACHE_LEVEL)
            else:
                # exiting: seen stays lazy on (checkpointed seen ∪ cached
                # attempted) — shallow lineage, no full-state job. self._bloom
                # and frontier intentionally stay ONE superstep behind seen
                # here; null the Bloom state so any future post-crawl consumer
                # (in-memory re-crawl, bitmap metrics probe) fails loudly on
                # the stale handle instead of silently reading old state
                seen = seen_next
                self._bloom = None
                new_pages = new_pages.persist(CACHE_LEVEL)
            state_ms = int((time.time() - t_state) * 1000)
            all_pages.append(new_pages)
            # NB: attempted stays persisted — lazy pages reference it
            self.metrics.append(
                {
                    "run_id": self.run_id,
                    "superstep": depth,
                    "attempted": attempted_count,
                    "pages_kept": added,
                    "pages_total": pages_count,
                    # phase split: attempt_ms = the prefilter+score+fetch job,
                    # state_ms = the combined state checkpoint / snapshots
                    "attempt_ms": attempt_ms,
                    "state_ms": state_ms,
                    "wall_ms": int((time.time() - t0) * 1000),
                    "bloom_deltas": self.bloom_deltas,
                    "bloom_rebuilds": self.bloom_rebuilds,
                    "bloom_m_bits": self.bloom_m_bits,
                }
            )
            if self.run_dir is not None:
                # per-partition lineage rides the durable snapshot only: the
                # two bounded aggs read back the parquet just written (url
                # column pruned), invisible next to the snapshot write itself
                self.metrics[-1]["frontier_by_bucket"] = self._bucket_lineage(frontier)
                self.metrics[-1]["pages_by_bucket"] = self._bucket_lineage(new_pages)
                with open(os.path.join(self.run_dir, f"superstep={depth}", "metrics.json"), "w") as f:
                    json.dump(self.metrics[-1], f)
                self._commit_superstep(depth)

        self.phase_walls["loop_ms"] = int((time.time() - t_loop) * 1000)
        self._jobdesc("finalize")
        t_fin = time.time()
        out = self._finalize(all_pages, pages_count), seen
        self.phase_walls["finalize_ms"] = int((time.time() - t_fin) * 1000)
        return out

    def _finalize(self, all_pages: list[DataFrame], n_pages: int | None = None) -> DataFrame:
        """Union per-superstep pages + assign the exact crawl order ONCE:
        within a depth, pages were appended in (score desc, url asc)
        candidate order; depth 0 in seed order (multi-seed canonicalization).

        ``n_pages`` (the already-known kept-page count) picks the join-back
        strategy: below BROADCAST_RANK_MAX the (url, rank) table is
        broadcast, so page content never shuffles AT ALL during finalize;
        above it (or unknown) a hash join shuffles content once.
        """
        result = all_pages[0]
        for df in all_pages[1:]:
            result = result.unionByName(df)
        result = result.withColumn(
            "__seed0",
            F.when(F.col("depth") == 0, F.col("seed_id")).otherwise(F.lit(0)),
        )
        final_order = (
            F.col("depth").asc(),
            F.col("__seed0").asc(),
            F.col("score").desc(),
            F.col("url").asc(),
        )
        # Rank a CONTENT-FREE projection, then join ranks back by url: page
        # content never crosses the rank's range shuffle nor its eager
        # checkpoint (at 10^6+ pages that was a ~2 GB serial crawl tail; the
        # slim rows are ~2% of that). The join-back left side keeps the fetch
        # join's url-hash partitioning through persist/union, so typically
        # only the (url, rank) table shuffles. url is unique per page (seen
        # dedup), so the inner join is exactly row-preserving.
        slim = result.select("url", "depth", "__seed0", "score")
        ranked = self._with_global_rank(slim, final_order, "rank").select("url", "rank")
        if n_pages is not None and n_pages <= BROADCAST_RANK_MAX:
            ranked = F.broadcast(ranked)
        result = result.drop("__seed0").join(ranked, "url")
        # rank IS the crawl order; returning unsorted saves a full-content
        # range-shuffle sort that every consumer either redoes (sinks,
        # pipeline: .orderBy("rank") at the point of use) or never needs
        # (distill, dedup, profiling are order-free).
        return result

    # ------------------------------------------------------------- link expand
    def _new_links(self, pages_with_links: DataFrame, from_depth: int) -> DataFrame:
        """JVM-first link expansion + per-url first-context dedup (min
        seed_id). ``linkexpand.expand_links`` keeps resolution + the common
        normalize case inside whole-stage codegen (the pandas-UDF kernel runs
        only on query/fragment/unicode links); the global groupBy subsumes
        the kernel's per-page set dedup (same result, proven by
        tests/test_linkexpand.py + the frontier parity suite)."""
        links = linkexpand.expand_links(
            pages_with_links,
            "out_links",
            F.col("base_url"),
            F.col("base_domain"),
            ["seed_id", "base_url", "base_domain"],
        )
        return (
            links.groupBy("url")
            .agg(F.min(F.struct("seed_id", "base_url", "base_domain")).alias("ctx"))
            .select("url", "ctx.seed_id", "ctx.base_url", "ctx.base_domain")
        )
