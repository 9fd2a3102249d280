"""Closed-form synthetic corpus: every page field is a pure function of
(seed, host_idx, page_idx) via splitmix64 mixing — no sequential RNG stream.

Why a second corpus flavor exists (vs ``corpus.generate_corpus_fast``): the
fast generator draws each host's pages from ONE sequential ``random.Random``
stream, so reproducing page i requires replaying the host's whole stream.
Closed-form fields make a page addressable by URL alone, which enables
``ClosedFormFetcher`` (operators/frontier.py): a mapInPandas fetcher that
"fetches" any URL in O(1) — the exact cost shape of a production HTTP
fetcher (per-candidate work only), with NO corpus table scan per superstep.
The scaling matrix runs both fetch modes; their delta isolates the
documents-table scan term from the frontier engine itself (BENCH_SCALING.md).

Bit-parity contract: ``generate_corpus_cf`` (the parquet writer) and
``page_fields`` (the per-URL evaluator the fetcher uses) are THE SAME code —
the writer enumerates (host, i) pairs and calls the evaluator, so
TableFetcher-over-the-written-parquet and ClosedFormFetcher agree byte for
byte (tests/test_cf_fetcher.py).

Layout mirrors the fast corpus: hosts ``bh{k}.example``, root ``/`` plus
``/{section}/{word}-{i}`` paths, 5-14 sentence text spans bracketed by a
heading span and an image span (the interleaved text+media document shape
from BASELINE.json's input_hint), ~5% fetch failures, out-links in 4 raw
forms (relative / absolute / trailing-slash / tracking-param).
"""

from __future__ import annotations

import os

from .corpus import SECTION_SEGMENTS, WORDS

_POOL_SIZE = 2000
_MASK = (1 << 64) - 1


def _mix(x: int) -> int:
    """splitmix64 finalizer (public domain constant set)."""
    x = (x + 0x9E3779B97F4A7C15) & _MASK
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _MASK
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _MASK
    return x ^ (x >> 31)


_TAGS = {"a": 1, "w": 2, "n": 3, "s": 4, "l": 5, "f": 6, "ok": 7, "p": 8,
         "plen": 9}


def _h(seed: int, hi: int, i: int, tag: str, j: int = 0) -> int:
    return _mix(
        (seed * 0x100000001B3 + hi * 0x1000193 + i * 0x10001 + _TAGS[tag] * 0x101 + j)
        & _MASK
    )


_pool_cache: dict[int, list[str]] = {}


def sentence_pool(seed: int) -> list[str]:
    """2000 closed-form sentences; cached per seed (built once per process —
    executors pay it on first batch, like an HTTP client warming a parser)."""
    pool = _pool_cache.get(seed)
    if pool is None:
        nw = len(WORDS)
        pool = []
        for k in range(_POOL_SIZE):
            n = 8 + _h(seed, 0, k, "plen") % 13  # 8..20 words
            ws = [WORDS[_h(seed, 0, k, "p", j) % nw] for j in range(n)]
            pool.append(" ".join(ws).capitalize() + ".")
        _pool_cache[seed] = pool
    return pool


def page_path(seed: int, hi: int, i: int) -> str:
    if i == 0:
        return "/"
    a = SECTION_SEGMENTS[_h(seed, hi, i, "a") % len(SECTION_SEGMENTS)]
    w = WORDS[_h(seed, hi, i, "w") % len(WORDS)]
    return f"/{a}/{w}-{i}"


def page_fields(seed: int, hi: int, i: int, pages_per_host: int,
                out_links: int) -> dict:
    """All columns of page (hi, i) — the single source of truth for both the
    parquet writer and the fetcher."""
    base = f"https://bh{hi}.example"
    path = page_path(seed, hi, i)
    url = base + "/" if i == 0 else base + path
    seg = path.strip("/").split("/")[-1] or "home"
    title = seg.replace("-", " ").title() + f" | BH{hi}"
    pool = sentence_pool(seed)
    n_sent = 5 + _h(seed, hi, i, "n") % 10  # 5..14
    sents = [pool[_h(seed, hi, i, "s", j) % _POOL_SIZE] for j in range(n_sent)]
    spans = [{"kind": "heading", "text": f"# {seg.title()}", "media_ref": "",
              "offset": 0}]
    for j, s in enumerate(sents, start=1):
        spans.append({"kind": "text", "text": s, "media_ref": "", "offset": j})
    spans.append({"kind": "image", "text": "",
                  "media_ref": f"{base}/img/{i}.png", "offset": n_sent + 1})
    content = "\n\n".join([spans[0]["text"]] + sents)
    lk = []
    for j in range(out_links):
        t = page_path(seed, hi, _h(seed, hi, i, "l", j) % pages_per_host)
        form = _h(seed, hi, i, "f", j) % 4
        if form == 0:
            lk.append(t)
        elif form == 1:
            lk.append(base + t)
        elif form == 2:
            lk.append(base + t + "/")
        else:
            lk.append(base + t + "?utm_source=bench&ref=x")
    lk += ["/img/a.png", "#top", "mailto:x@y.z", f"https://off{hi}.example/x"]
    return {
        "url": url, "host": f"bh{hi}.example", "title": title, "spans": spans,
        "word_count": len(content.split()), "out_links": lk,
        "content_type": "text/html",
        "fetch_ok": _h(seed, hi, i, "ok") % 100 >= 5,
    }


def invert_url(url: str, seed: int, n_hosts: int, pages_per_host: int,
               host_offset: int = 0) -> tuple[int, int] | None:
    """URL -> (host_idx, page_idx), or None if the URL is not a corpus page.
    Exact-match semantics: the URL must equal the page's canonical form —
    the same contract as TableFetcher's equi-join on the table's url column."""
    if not url.startswith("https://bh"):
        return None
    rest = url[len("https://bh"):]
    dot = rest.find(".example")
    if dot <= 0 or not rest[:dot].isdigit():
        return None
    hi = int(rest[:dot])
    if not (host_offset <= hi < host_offset + n_hosts):
        return None
    path = rest[dot + len(".example"):]
    if path == "/":
        return (hi, 0)
    # "/{a}/{w}-{i}": parse i from the trailing "-<digits>", then verify the
    # WHOLE path round-trips (wrong section/word/form -> not a corpus page)
    tail = path.rsplit("-", 1)
    if len(tail) != 2 or not tail[1].isdigit():
        return None
    i = int(tail[1])
    if not (1 <= i < pages_per_host):
        return None
    return (hi, i) if page_path(seed, hi, i) == path else None


def generate_corpus_cf(
    seed: int,
    n_hosts: int,
    pages_per_host: int,
    out_links: int = 40,
    out_dir: str | None = None,
    host_offset: int = 0,
    out_name: str = "site_pages.parquet",
    write_meta: bool = True,
) -> dict:
    """Write the closed-form corpus as parquet (same schema as
    generate_corpus_fast; same sharding protocol for parallel generation).
    meta.json carries the cf params so scaling_run can construct the
    ClosedFormFetcher without reading the table."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols: dict[str, list] = {k: [] for k in (
        "url", "host", "title", "spans", "word_count", "out_links",
        "content_type", "fetch_ok")}
    seeds = []
    for hi in range(host_offset, host_offset + n_hosts):
        seeds.append(f"https://bh{hi}.example/")
        for i in range(pages_per_host):
            row = page_fields(seed, hi, i, pages_per_host, out_links)
            for k in cols:
                cols[k].append(row[k])
    span_t = pa.struct([("kind", pa.string()), ("text", pa.string()),
                        ("media_ref", pa.string()), ("offset", pa.int32())])
    table = pa.Table.from_pydict(cols, schema=pa.schema([
        ("url", pa.string()), ("host", pa.string()), ("title", pa.string()),
        ("spans", pa.list_(span_t)), ("word_count", pa.int32()),
        ("out_links", pa.list_(pa.string())), ("content_type", pa.string()),
        ("fetch_ok", pa.bool_()),
    ]))
    meta = {
        "n_pages": len(cols["url"]), "seeds": seeds,
        "cf": {"seed": seed, "n_hosts": n_hosts,
               "pages_per_host": pages_per_host, "out_links": out_links,
               "host_offset": host_offset},
    }
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        target = os.path.join(out_dir, out_name)
        if os.path.dirname(out_name):
            os.makedirs(os.path.dirname(target), exist_ok=True)
        pq.write_table(table, target)
        if write_meta:
            import json

            with open(os.path.join(out_dir, "meta.json"), "w") as f:
                json.dump(meta, f)
        meta["path"] = out_dir
    return meta
