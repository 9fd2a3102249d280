"""Pure-Python BestFirst crawl oracle — ground truth for the Spark engine.

The reference's DEFAULT crawl path for non-systematic strategies is
``crawl_website`` — Crawl4AI's ``BestFirstCrawlingStrategy`` driven by a
``KeywordRelevanceScorer`` (v1 crawler/web_crawler.py:192-369; v2
llmsgen/crawler/web_crawler.py:251+ (pyc), bytecode-verified constants).
The library internals are external (C3), so this oracle PINS a deterministic
batched best-first specification that preserves every reference-recoverable
semantic, and the Spark engine (operators/bestfirst.py) is parity-tested
against it page-for-page:

- depth budget by max_pages (v2 consts ``100, 4, 50, 3, 2``):
  ``max_depth = 4 if max_pages > 100 else 3 if max_pages > 50 else 2``
- the 23 enhanced keywords + domain name, weight 1.0 (v2 const tuple);
  score = substring-hit fraction (kernels.keyword_relevance_score)
- start URL enters the queue at depth 0 with score 0.0
- priority order: score desc, depth asc, url asc (deterministic stand-in
  for the library's priority queue, whose ties are arrival-order)
- batched pops (the library crawls popped URLs in batches): each superstep
  pops min(batch_size, max_pages - attempted) URLs; every popped URL counts
  against ``max_pages`` whether or not its fetch succeeds
- page gate: ``word_count > 50`` — STRICTLY greater (v1 :321
  ``word_count > crawler_config.word_count_threshold``; threshold 50),
  unlike the systematic path's ``>= 50``
- links are extracted from every SUCCESSFUL fetch regardless of the word
  gate (the library discovers before the wrapper filters); a URL discovered
  by several parents in one superstep enters the queue once at
  ``min(parent depth) + 1``; URLs enter ``seen`` at ENQUEUE time
- no expansion past ``max_depth``
"""

from __future__ import annotations

import urllib.parse
from dataclasses import dataclass, field

from ..functions import kernels
from ..sources.corpus import Corpus


def depth_for_max_pages(max_pages: int) -> int:
    """v2 ``crawl_depth`` selection (llmsgen/crawler/web_crawler.py:251+ (pyc))."""
    return 4 if max_pages > 100 else 3 if max_pages > 50 else 2


@dataclass
class BestFirstResult:
    pages: list[dict] = field(default_factory=list)  # in exact emission order
    seen: set[str] = field(default_factory=set)
    attempted: int = 0

    @property
    def order(self) -> list[str]:
        return [p["url"] for p in self.pages]


def crawl_bestfirst(
    corpus: Corpus,
    base_url: str,
    max_pages: int = 50,
    batch_size: int = 10,
    max_depth: int | None = None,
) -> BestFirstResult:
    if max_depth is None:
        max_depth = depth_for_max_pages(max_pages)
    keywords = kernels.bestfirst_keywords(base_url)
    base_domain = urllib.parse.urlparse(base_url).netloc
    res = BestFirstResult()

    start = kernels.normalize_url(base_url)
    queue: list[tuple[str, int, float]] = [(start, 0, 0.0)]  # (url, depth, score)
    res.seen.add(start)

    while queue and res.attempted < max_pages:
        queue.sort(key=lambda t: (-t[2], t[1], t[0]))  # score desc, depth asc, url asc
        b = min(batch_size, max_pages - res.attempted)
        batch, queue = queue[:b], queue[b:]
        # min-parent-depth link merge across the batch (pinned spec)
        discovered: dict[str, int] = {}
        for url, depth, score in batch:
            res.attempted += 1
            row = corpus.pages.get(url)
            if row is None or not row.fetch_ok:
                continue
            wc = kernels.word_count(row.content)
            if wc > 50:  # STRICT (v1 :321)
                res.pages.append(
                    {
                        "url": row.url,
                        "title": kernels.extract_title(row.title, row.content, row.url),
                        "content": row.content,
                        "word_count": wc,
                        "score": score,
                        "depth": depth,
                        "discovery_phase": "bestfirst",
                    }
                )
            if depth < max_depth:
                for link in kernels.extract_links(row.out_links, base_url, base_domain):
                    if link in res.seen:
                        continue
                    discovered[link] = min(discovered.get(link, depth + 1), depth + 1)
        for link, d in discovered.items():
            if link not in res.seen:
                res.seen.add(link)
                queue.append((link, d, kernels.keyword_relevance_score(link, keywords)))
    return res
