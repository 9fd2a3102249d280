"""Deterministic synthetic web corpus (FIXTURES.md §1-§5).

A pure function of ``(seed, sizing knobs)`` — no Spark dependency, shared by
the Spark engine tests and the pure-Python oracle. Replaces live HTTP
(``crawler.arun``, reference crawler/web_crawler.py:93-103): a fetch becomes a
lookup of the normalized URL in ``site_pages``.

Graph-shape knobs exercised (FIXTURES.md §2):
- depth >= ``chain_len`` link chains (deeper than the 3/5 depth limits),
- score-tie groups (same C1 score -> canonical tie-break, quirk Q1),
- one skewed host holding ~half the URLs (salting test),
- duplicate URLs differing only in tracking params / trailing slash /
  fragment (URL-seen identity, P1),
- sub-50-word pages (quality filter P5), fetch_ok=False pages (quirk Q5),
- asset / mailto / javascript / fragment / off-domain noise links
  (P2/P7/L1), including an off-domain URL that embeds the crawl domain as a
  substring (replicates the reference's substring domain check).
"""

from __future__ import annotations

import os
import random
from dataclasses import dataclass, field

from ..functions import kernels

WORDS = (
    "engine data spark query plan frontier crawl page link score depth "
    "document span media text image token batch partition shuffle join "
    "filter sort limit budget robots polite host bucket bloom seen state "
    "checkpoint resume metric lineage scale throughput latency vector arrow"
).split()

SECTION_SEGMENTS = [
    # high-value (C1 +3.0)
    "docs", "blog", "pricing", "about", "api", "guide", "tutorial", "news",
    "support", "faq", "overview", "reference",
    # medium-value (+1.5)
    "download", "install", "setup", "examples", "contact",
    # low-value (-5.0)
    "login", "signup", "search",
    # neutral
    "widgets", "gadgets", "stuff", "misc", "alpha", "beta",
]


@dataclass
class SitePage:
    url: str            # canonical (normalized) URL
    host: str
    title: str
    spans: list[tuple]  # (kind, text, media_ref, offset)
    word_count: int
    out_links: list[str]
    content_type: str
    fetch_ok: bool

    @property
    def content(self) -> str:
        return kernels.spans_to_content_py(self.spans)


@dataclass
class Corpus:
    pages: dict[str, SitePage]          # canonical url -> page
    seeds: list[tuple[int, str, float]]  # (seed_id, url, priority)
    robots_rules: list[tuple[str, str, str, str]]   # host, agent, rule, prefix
    host_policies: list[tuple[str, float, int, int]]  # host, rps, cap, delay
    sitemap_entries: list[tuple[str, str | None, str, bool]] = field(default_factory=list)

    def site_pages_rows(self) -> list[tuple]:
        """Rows in schemas.SITE_PAGES order."""
        return [
            (p.url, p.host, p.title, p.spans, p.word_count, p.out_links,
             p.content_type, p.fetch_ok)
            for p in self.pages.values()
        ]

    def documents_rows(self) -> list[tuple]:
        """Rows in schemas.DOCUMENTS order (doc_id, spans)."""
        return [(p.url, p.spans) for p in self.pages.values()]

    def to_parquet(self, out_dir: str) -> str:
        """Materialize site_pages as parquet via pyarrow (no Spark) — the
        bench/scaling input path (spark.read.parquet => pushdown, pruning)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        os.makedirs(out_dir, exist_ok=True)
        span_t = pa.struct(
            [("kind", pa.string()), ("text", pa.string()),
             ("media_ref", pa.string()), ("offset", pa.int32())]
        )
        schema = pa.schema(
            [
                ("url", pa.string()),
                ("host", pa.string()),
                ("title", pa.string()),
                ("spans", pa.list_(span_t)),
                ("word_count", pa.int32()),
                ("out_links", pa.list_(pa.string())),
                ("content_type", pa.string()),
                ("fetch_ok", pa.bool_()),
            ]
        )
        pages = list(self.pages.values())
        table = pa.Table.from_pydict(
            {
                "url": [p.url for p in pages],
                "host": [p.host for p in pages],
                "title": [p.title for p in pages],
                "spans": [
                    [
                        {"kind": k, "text": t, "media_ref": m, "offset": o}
                        for k, t, m, o in p.spans
                    ]
                    for p in pages
                ],
                "word_count": [p.word_count for p in pages],
                "out_links": [p.out_links for p in pages],
                "content_type": [p.content_type for p in pages],
                "fetch_ok": [p.fetch_ok for p in pages],
            },
            schema=schema,
        )
        path = os.path.join(out_dir, "site_pages.parquet")
        pq.write_table(table, path)
        return path


def _make_spans(rng: random.Random, title: str, n_words: int, host: str,
                media_kinds: tuple = ("image",)) -> list[tuple]:
    """Interleaved text+media spans whose text joins to ~n_words words.

    ``media_kinds`` widens the planted media beyond images ("audio",
    "video") without touching the rng stream, so the default corpus stays
    byte-identical while multimodal tests opt into the full modality set."""
    spans: list[tuple] = [("heading", f"# {title}", "", 0)]
    offset = 1
    words_left = n_words - 2  # heading contributes '#' + title words
    para_i = 0
    while words_left > 0:
        k = min(words_left, rng.randint(8, 25))
        sentence_words = rng.choices(WORDS, k=k)
        # capitalized sentence with terminal period so the summarizer (D1)
        # has extractable sentences
        text = " ".join(sentence_words).capitalize() + "."
        if para_i % 6 == 4:
            # Unicode-whitespace joints (NBSP + ideographic space): Python
            # str.split() treats these as word boundaries, the engine's pinned
            # ASCII class (kernels.word_count / udfs.native_word_count) does
            # NOT — planting them makes the parity suite exercise the pinned
            # class instead of passing vacuously on pure-ASCII content
            text = text.replace(" ", " ", 2).replace(" ", "　", 1)
        spans.append(("text", text, "", offset))
        offset += 1
        words_left -= k
        para_i += 1
        if para_i % 3 == 1 and "image" in media_kinds:  # interleave media
            spans.append(("image", "", f"https://{host}/img/{para_i}.png", offset))
            offset += 1
        if para_i % 7 == 5 and "audio" in media_kinds:
            spans.append(("audio", "", f"https://{host}/aud/{para_i}.wav", offset))
            offset += 1
        if para_i % 7 == 6 and "video" in media_kinds:
            spans.append(("video", "", f"https://{host}/vid/{para_i}.y4m", offset))
            offset += 1
        if para_i % 4 == 2:
            spans.append(("link", f"[more]({rng.choice(SECTION_SEGMENTS)})",
                          f"https://{host}/{rng.choice(SECTION_SEGMENTS)}", offset))
            offset += 1
        if para_i % 5 == 3:
            spans.append(("code", "```python\nx = 1\n```", "", offset))
            offset += 1
    return spans


def generate_corpus(
    seed: int = 7,
    n_hosts: int = 2,
    pages_per_host: int = 30,
    skew_factor: int = 1,
    chain_len: int = 7,
    p_low_quality: float = 0.2,
    p_fetch_fail: float = 0.1,
    media_kinds: tuple = ("image",),
) -> Corpus:
    """Deterministic corpus. ``skew_factor`` multiplies host 0's page count
    (set ~n_hosts to give host 0 about half of all URLs)."""
    rng = random.Random(seed)
    pages: dict[str, SitePage] = {}
    seeds = []
    robots_rules = []
    host_policies = []
    sitemap_entries: list[tuple] = []

    for hi in range(n_hosts):
        host = f"ex{hi}.example"
        base = f"https://{host}"
        n_pages = pages_per_host * (skew_factor if hi == 0 else 1)
        seeds.append((hi, base + "/", 1.0))

        # --- path population -------------------------------------------------
        paths = []
        # one-segment sections (score ties across same-tier keywords)
        k1 = max(4, n_pages // 3)
        paths += [f"/{seg}" for seg in rng.sample(SECTION_SEGMENTS, min(k1, len(SECTION_SEGMENTS)))]
        # two-segment pages
        while len(paths) < n_pages - chain_len - 4:
            a, b = rng.choice(SECTION_SEGMENTS), rng.choice(WORDS)
            p = f"/{a}/{b}-{rng.randint(1, 999)}"
            if p not in paths:
                paths.append(p)
        # a deep chain c1/c2/.../cN (only reachable link-by-link)
        chain_paths = []
        cur = "/chain"
        for d in range(chain_len):
            cur = f"{cur}/c{d}"
            chain_paths.append(cur)
        # pagination pages (exercise the -3.0 penalty + Other Pages category)
        pagination = [f"/blog?page={i}" for i in range(2, 5)]
        all_paths = ["/"] + paths + chain_paths + pagination

        # --- pages ------------------------------------------------------------
        canon = {}
        for path in all_paths:
            url = kernels.normalize_url(base + path)
            canon[path] = url
        path_list = list(canon)

        for i, path in enumerate(path_list):
            url = canon[path]
            if url in pages:
                continue
            seg = path.strip("/").split("/")[-1] or "home"
            titled = seg.replace("-", " ").replace("?", " ").title()
            title = f"{titled} | Ex{hi} Site" if rng.random() < 0.5 else titled
            low_quality = rng.random() < p_low_quality and path != "/"
            n_words = rng.randint(10, 45) if low_quality else rng.randint(60, 220)
            spans = _make_spans(rng, titled, n_words, host, media_kinds)
            content = kernels.spans_to_content_py(spans)
            wc = kernels.word_count(content)

            # out-links: children + random cross-links + noise, in raw forms
            targets = []
            if path == "/":
                targets += [p for p in path_list if p.count("/") == 1 and p != "/"][:12]
                targets += ["/chain/c0"]
            # chain linkage
            if path.startswith("/chain/"):
                nxt = f"{path}/c{path.count('/') - 1}"
                if nxt in canon:
                    targets.append(nxt)
            targets += rng.sample(path_list, k=min(5, len(path_list)))
            raw_links: list[str] = []
            for t in targets:
                if t == path:
                    continue
                form = rng.randrange(5)
                if form == 0:
                    raw_links.append(t)                       # root-relative path
                elif form == 1:
                    raw_links.append(base + t)                # absolute
                elif form == 2:
                    raw_links.append(base + t + ("" if "?" in t else "/"))  # trailing slash
                elif form == 3:
                    raw_links.append(base + t + ("&" if "?" in t else "?") + "utm_source=tw&ref=hp")
                else:
                    raw_links.append(t.lstrip("/"))           # bare relative
            # noise (dropped by P1/P2/P7 or domain check)
            raw_links += [
                "/img/logo.png", "/styles.css", "#top", "mailto:a@b.c",
                "tel:+155", "javascript:void(0)", "",
                f"https://offsite.example/x{rng.randint(0, 9)}",
            ]
            if rng.random() < 0.3:
                # off-domain URL embedding the crawl domain as substring:
                # passes the reference's `base_domain in link` check (L1 quirk)
                raw_links.append(f"https://tracker.example/r?to={host}&padpadpadpad")
            rng.shuffle(raw_links)

            pages[url] = SitePage(
                url=url,
                host=host,
                title=title,
                spans=spans,
                word_count=wc,
                out_links=raw_links,
                content_type="application/pdf" if rng.random() < 0.05 else "text/html",
                fetch_ok=not (rng.random() < p_fetch_fail and path != "/"),
            )

        # --- robots + politeness ---------------------------------------------
        robots_rules.append((host, "*", "disallow", "/signup"))
        robots_rules.append((host, "*", "disallow", "/search"))
        robots_rules.append((host, "*", "allow", "/"))
        host_policies.append((host, 10.0, max(5, n_pages // 4), 100))

        # --- sitemaps: root index -> two sub-sitemaps (FIXTURES.md §5) --------
        root_sm = f"{base}/sitemap.xml"
        subs = [f"{base}/sitemap-a.xml", f"{base}/sitemap-b.xml"]
        for sub in subs:
            sitemap_entries.append((root_sm, None, sub, True))
        host_urls = [u for u in pages if pages[u].host == host]
        for i, u in enumerate(host_urls):
            sitemap_entries.append((subs[i % 2], root_sm, u, False))
        # cross-domain noise a sitemap may list (must be filtered by P3)
        sitemap_entries.append((subs[0], root_sm, "https://other.example/x", False))

    return Corpus(pages=pages, seeds=seeds, robots_rules=robots_rules,
                  host_policies=host_policies, sitemap_entries=sitemap_entries)


def corpus_from_parquet(parquet_path: str, seeds: list[str]) -> Corpus:
    """Rebuild a Corpus (oracle input) from a site_pages parquet — lets the
    pure-Python oracle verify crawls over bulk-generated corpora."""
    import pyarrow.parquet as pq

    table = pq.read_table(parquet_path)
    pages: dict[str, SitePage] = {}
    for row in table.to_pylist():
        pages[row["url"]] = SitePage(
            url=row["url"],
            host=row["host"],
            title=row["title"],
            spans=[(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in row["spans"]],
            word_count=row["word_count"],
            out_links=row["out_links"],
            content_type=row["content_type"],
            fetch_ok=row["fetch_ok"],
        )
    return Corpus(
        pages=pages,
        seeds=[(i, u, 1.0) for i, u in enumerate(seeds)],
        robots_rules=[],
        host_policies=[],
    )


def generate_corpus_fast(
    seed: int,
    n_hosts: int,
    pages_per_host: int,
    out_links: int = 40,
    out_dir: str | None = None,
    sentences: tuple[int, int] = (5, 14),
    host_offset: int = 0,
    out_name: str = "site_pages.parquet",
    write_meta: bool = True,
) -> dict:
    """Bulk corpus for throughput benchmarks: same schema as generate_corpus
    but column-wise generation straight into parquet (pyarrow), ~100k pages/min.

    Link graph: each page links to `out_links` uniformly random same-host
    pages (mixed raw forms: relative / absolute / trailing-slash / tracking
    params) + a handful of noise links. Section vocabulary spans all scorer
    tiers. Returns {'n_pages', 'seeds', 'path'}.

    ``host_offset``/``out_name``/``write_meta`` support sharded parallel
    generation (scripts/gen_corpus_parallel.py): each worker emits a disjoint
    host range into its own parquet file under a shared dataset directory —
    hosts are self-contained link graphs, so sharding by host is exact.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = random.Random(seed)
    sentence_pool = [
        " ".join(rng.choices(WORDS, k=rng.randint(8, 20))).capitalize() + "."
        for _ in range(2000)
    ]

    urls, hosts_c, titles, spans_c, wcs, links_c, ctypes, oks = [], [], [], [], [], [], [], []
    seeds = []
    for hi in range(host_offset, host_offset + n_hosts):
        host = f"bh{hi}.example"
        base = f"https://{host}"
        seeds.append(base + "/")
        paths = ["/"]
        for i in range(pages_per_host - 1):
            a = SECTION_SEGMENTS[rng.randrange(len(SECTION_SEGMENTS))]
            paths.append(f"/{a}/{WORDS[rng.randrange(len(WORDS))]}-{i}")
        n = len(paths)
        for i, path in enumerate(paths):
            url = base + (path if path != "/" else "/")
            url = url.rstrip("/") or url
            if path == "/":
                url = base + "/"
            # canonical form: normalize by construction (no params/fragments)
            seg = path.strip("/").split("/")[-1] or "home"
            title = seg.replace("-", " ").title() + f" | BH{hi}"
            n_sent = rng.randint(*sentences)
            page_sents = [sentence_pool[rng.randrange(2000)] for _ in range(n_sent)]
            spans = [{"kind": "heading", "text": f"# {seg.title()}", "media_ref": "", "offset": 0}]
            for j, s in enumerate(page_sents, start=1):
                spans.append({"kind": "text", "text": s, "media_ref": "", "offset": j})
            spans.append({"kind": "image", "text": "", "media_ref": f"{base}/img/{i}.png",
                          "offset": n_sent + 1})
            content = "\n\n".join([spans[0]["text"]] + page_sents)
            wc = len(content.split())
            lk = []
            for _ in range(out_links):
                t = paths[rng.randrange(n)]
                form = rng.randrange(4)
                if form == 0:
                    lk.append(t)
                elif form == 1:
                    lk.append(base + t)
                elif form == 2:
                    lk.append(base + t + "/")
                else:
                    lk.append(base + t + "?utm_source=bench&ref=x")
            lk += ["/img/a.png", "#top", "mailto:x@y.z", f"https://off{hi}.example/x"]
            urls.append(url if path == "/" else base + path)
            hosts_c.append(host)
            titles.append(title)
            spans_c.append(spans)
            wcs.append(wc)
            links_c.append(lk)
            ctypes.append("text/html")
            oks.append(rng.random() >= 0.05)

    span_t = pa.struct([("kind", pa.string()), ("text", pa.string()),
                        ("media_ref", pa.string()), ("offset", pa.int32())])
    table = pa.Table.from_pydict(
        {
            "url": urls, "host": hosts_c, "title": titles, "spans": spans_c,
            "word_count": wcs, "out_links": links_c, "content_type": ctypes,
            "fetch_ok": oks,
        },
        schema=pa.schema([
            ("url", pa.string()), ("host", pa.string()), ("title", pa.string()),
            ("spans", pa.list_(span_t)), ("word_count", pa.int32()),
            ("out_links", pa.list_(pa.string())), ("content_type", pa.string()),
            ("fetch_ok", pa.bool_()),
        ]),
    )
    meta = {"n_pages": len(urls), "seeds": seeds}
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        target = os.path.join(out_dir, out_name)
        if os.path.dirname(out_name):  # sharded: out_name like site_pages.parquet/part-3.parquet
            os.makedirs(os.path.dirname(target), exist_ok=True)
        pq.write_table(table, target)
        if write_meta:
            import json

            with open(os.path.join(out_dir, "meta.json"), "w") as f:
                json.dump(meta, f)
        meta["path"] = out_dir
    return meta


def render_sitemap_blobs(corpus: Corpus) -> list[tuple[str, bytes]]:
    """Render the corpus' sitemap graph as raw XML bytes (every other blob
    gzipped) — the input shape of operators/sitemap_xml.parse_sitemaps.
    Index documents are namespaced; leaf urlsets are namespace-less, so both
    reference parse branches get exercised."""
    import gzip as _gzip

    by_sitemap: dict[str, list[tuple[str, bool]]] = {}
    for sm_url, _parent, url, is_index in corpus.sitemap_entries:
        by_sitemap.setdefault(sm_url, []).append((url, is_index))
    rows: list[tuple[str, bytes]] = []
    for i, (sm_url, items) in enumerate(sorted(by_sitemap.items())):
        if any(ix for _, ix in items):
            body = (
                '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
                + "".join(f"<sitemap><loc>{u}</loc></sitemap>" for u, _ in items)
                + "</sitemapindex>"
            )
        else:
            body = (
                "<urlset>"
                + "".join(f"<url><loc>{u}</loc></url>" for u, _ in items)
                + "</urlset>"
            )
        raw = body.encode()
        rows.append((sm_url, _gzip.compress(raw) if i % 2 else raw))
    return rows
