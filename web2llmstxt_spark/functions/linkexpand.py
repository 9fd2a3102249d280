"""JVM-first link expansion: the per-superstep flatMap that turns fetched
pages' raw hrefs into normalized frontier candidates.

This is the highest-volume per-URL computation of a crawl superstep after
scoring (superstep 3 of the scaling corpus explodes ~44-112 M raw links), so
the hot path must not cross the Python boundary per link. The previous shape
(``udfs.extract_links_udf``: a pandas UDF whose inner loop runs
``kernels.extract_links`` -> ``kernels.normalize_url`` — urlparse + parse_qs
+ urlencode per link) burned ~8-10 us of Python per link; here everything is
whole-stage-codegen Column algebra except a provably-rare fallback:

1. explode(out_links) JVM-side,
2. drop excluded prefixes / empty hrefs with native string predicates,
3. resolve against the site root with CASE + concat (same quirk as the
   reference: root-relative AND bare-relative hrefs resolve against the
   SITE ROOT, not the current page — crawler/web_crawler.py:444-522),
4. normalize: URLs matching ``SIMPLE_URL_RE`` (lowercase http(s) scheme,
   ASCII host, no query/fragment/params — the overwhelming majority of real
   hrefs) are normalized by an equivalent JVM expression; everything else
   falls back to the bit-exact pandas-UDF kernel (tracking-param removal,
   query re-encoding, unicode hosts).

Equivalence proof for the fast path (vs ``kernels.normalize_url``): for a
URL matching SIMPLE_URL_RE, urlparse yields scheme='http(s)' (already
lowercase by the gate), netloc=<host capture> (pure ASCII, so Java
``lower()`` == Python ``.lower()``), params=query=fragment='' (the gate
excludes ';?#'), and path=<path capture>; parse_qs('')=={} and
urlencode({})=='', so normalize_url reduces to
``scheme://lower(netloc) + (path.rstrip('/') or '/')`` — exactly the JVM
expression below. URLs with userinfo ('@'), ports are covered by the host
class; uppercase schemes, queries, fragments, ';' params, or non-ASCII
hosts do NOT match the gate and take the kernel. Parity is end-to-end
gated by tests/test_frontier_parity.py (the synthetic corpus plants
tracking-param, trailing-slash, bare-relative and unicode-joint links) and
unit-gated by tests/test_linkexpand.py against ``kernels.extract_links``.

Per-page dedup/sort note: ``kernels.extract_links`` returns a per-page
sorted set; both consumers (frontier._new_links, bestfirst) immediately
``groupBy('url')`` globally, which subsumes per-page dedup, and row order
is meaningless pre-aggregation — so this operator emits one row per kept
raw href and lets the global aggregate dedup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import udfs
from .kernels import EXCLUDED_LINK_PREFIXES

#: ASCII-only, lowercase-scheme, no-query/fragment/params gate. Anchored and
#: newline-free on both sides of the host/path classes so the Java-regex
#: semantics of ``rlike`` coincide with Python ``re`` for every admitted
#: string: no (?i), and the end anchor is ``(?![\s\S])`` (absolute end in
#: BOTH dialects) because a bare ``$`` matches before a trailing newline in
#: both — which would admit 'https://h/x\n' to the fast path while the
#: kernel keeps the newline in the normalized URL.
SIMPLE_URL_RE = r"^(https?)://([A-Za-z0-9.\-_:]+)((?:/[^?#;\n]*)?)(?![\s\S])"


def _normalize_simple(col: Column) -> Column:
    """JVM twin of ``kernels.normalize_url`` for SIMPLE_URL_RE matches."""
    scheme = F.regexp_extract(col, SIMPLE_URL_RE, 1)
    netloc = F.lower(F.regexp_extract(col, SIMPLE_URL_RE, 2))
    path = F.regexp_replace(F.regexp_extract(col, SIMPLE_URL_RE, 3), "/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    return F.concat(scheme, F.lit("://"), netloc, path)


def expand_links(
    pages: DataFrame,
    out_links_col: str,
    base_url: Column,
    base_domain: Column,
    extra_cols: list[str],
) -> DataFrame:
    """One row per kept, normalized out-link: (url, *extra_cols).

    ``base_url``/``base_domain`` are Columns (per-row for multi-seed BFS,
    literals for single-site BestFirst). Callers own the global
    ``groupBy('url')`` dedup.
    """
    raw = F.col("__raw")
    exploded = pages.select(
        F.explode(F.col(out_links_col)).alias("__raw"), base_url.alias("__base"), *extra_cols
    )
    kept = exploded.filter(raw.isNotNull() & (raw != ""))
    for prefix in EXCLUDED_LINK_PREFIXES:
        kept = kept.filter(~raw.startswith(prefix))
    # http(s)-absolute hrefs are kept only when base_domain is a substring of
    # the RAW href (reference quirk: substring, not host equality)
    kept = kept.filter(~raw.startswith("http") | F.contains(raw, base_domain))

    root = F.regexp_replace(F.col("__base"), "/+$", "")  # base_url.rstrip('/')
    resolved = (
        F.when(raw.startswith("/"), F.concat(root, raw))
        .when(raw.startswith("http"), raw)
        # bare-relative: the kernel's lstrip('/') is a no-op here (the '/'
        # branch above already caught leading slashes)
        .otherwise(F.concat(root, F.lit("/"), raw))
    )
    kept = kept.withColumn("__resolved", resolved)

    simple = F.col("__resolved").rlike(SIMPLE_URL_RE)
    fast = kept.filter(simple).withColumn("url", _normalize_simple(F.col("__resolved")))
    slow = kept.filter(~simple).withColumn(
        "url", udfs.normalize_url_udf(F.col("__resolved"))
    )
    out = fast.unionByName(slow)
    # drop self-links to the UN-normalized base_url (reference quirk: raw
    # compare against base_url, not against normalize(base_url))
    out = out.filter(F.col("url") != F.col("__base"))
    return out.select("url", *extra_cols)
