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


def _make_spans(rng: random.Random, title: str, n_words: int, host: str) -> list[tuple]:
    """Interleaved text+media spans whose text joins to ~n_words words."""
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
        spans.append(("text", text, "", offset))
        offset += 1
        words_left -= k
        para_i += 1
        if para_i % 3 == 1:  # interleave media between paragraphs
            spans.append(("image", "", f"https://{host}/img/{para_i}.png", offset))
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
) -> Corpus:
    """Deterministic corpus. ``skew_factor`` multiplies host 0's page count
    (set ~n_hosts to give host 0 about half of all URLs)."""
    rng = random.Random(seed)
    pages: dict[str, SitePage] = {}
    seeds = []
    robots_rules = []
    host_policies = []

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
            spans = _make_spans(rng, titled, n_words, host)
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

    return Corpus(pages=pages, seeds=seeds, robots_rules=robots_rules,
                  host_policies=host_policies)
