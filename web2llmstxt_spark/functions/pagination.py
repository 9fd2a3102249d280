"""L2 — pagination discovery over raw page HTML.

Twin of ``WebCrawler._discover_pagination_links``
(crawler/web_crawler.py:524-632): five pattern groups over the page's HTML
(next/prev buttons, numbered pagers, sequential synthesis, load-more,
form-based pagination), each candidate resolved absolute and kept only when
``base_domain in full_url`` (the reference's substring test, kept verbatim).
The reference computes this set and only LOGS it — the URLs are never
enqueued (quirk Q3, SURVEY.md) — so this operator is exposed on the driver
surface as a standalone discovery op and deliberately NOT fed into any
frontier.

The reference drives the selectors through BeautifulSoup + soupsieve; this
container has neither, so the anchor/form model is built with the stdlib
``html.parser`` and the selectors are evaluated directly on it:

- class selectors (``a.next``, ``.pagination a``) match whitespace-split
  class TOKENS; descendant combinators match against the open-element stack
  at the anchor's start tag (its proper ancestors);
- ``a[rel="next"]`` matches the whitespace-normalized rel VALUE ``next``
  (CSS exact attribute match, as soupsieve applies it);
- ``:-soup-contains("Next")`` is a case-sensitive substring test on the
  element's descendant text (charrefs such as ``&gt;`` already unescaped by
  the parser); ``[aria-label*="next" i]`` / ``[title*="next" i]`` are
  case-insensitive substring tests on the attribute;
- malformed HTML recovery differs from html5lib-style rebuilding: this
  parser ignores stray end tags and leaves unclosed anchors open to end of
  input. All engine tests use well-formed HTML where the models agree.

Sequential synthesis (pattern 3) reuses the L3 kernel
(``kernels.generate_sequential_pages``, crawler/web_crawler.py:644-709),
called — as the reference does — on the CURRENT page URL.

The Spark surface is a vectorized pandas UDF (Arrow batches, no per-row
Python) returning a sorted ``array<string>`` per page; at crawl scale it
rides the same fetched-page partitions as link extraction (L1), so it adds
no shuffle of its own.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

from . import kernels

# HTML void elements never receive end tags; keep them off the open stack.
_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class _Element:
    __slots__ = (
        "tag", "href", "rel", "classes", "aria", "title",
        "data_page", "data_url", "text", "anc_classes", "anc_tags",
    )

    def __init__(self, tag, attrs, anc_classes, anc_tags):
        get = dict(attrs).get
        self.tag = tag
        self.href = get("href")
        self.rel = " ".join((get("rel") or "").split())
        self.classes = frozenset((get("class") or "").split())
        self.aria = get("aria-label") or ""
        self.title = get("title") or ""
        self.data_page = get("data-page")
        self.data_url = get("data-url")
        self.text = []
        self.anc_classes = anc_classes
        self.anc_tags = anc_tags


class _PageModel(HTMLParser):
    """One pass over the HTML building the element records the five
    selector groups read: anchors (with ancestor context + descendant
    text), buttons, any ``.load-more``/``.show-more`` element carrying an
    href, and form actions."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.stack = []          # open (tag, classes) pairs
        self.open_anchors = []   # anchors still collecting text
        self.anchors = []
        self.buttons = []
        self.loadmore = []
        self.form_actions = []

    def handle_starttag(self, tag, attrs):
        anc_classes = frozenset().union(*(c for _, c in self.stack)) if self.stack else frozenset()
        anc_tags = frozenset(t for t, _ in self.stack)
        el = _Element(tag, attrs, anc_classes, anc_tags)
        if tag == "a":
            self.anchors.append(el)
            self.open_anchors.append(el)
        elif tag == "button":
            self.buttons.append(el)
        if ({"load-more", "show-more"} & el.classes) and el.href is not None:
            self.loadmore.append(el)
        if tag == "form":
            self.form_actions.append(dict(attrs).get("action", "") or "")
        if tag not in _VOID:
            self.stack.append((tag, el.classes))

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, -1, -1):
            if self.stack[i][0] == tag:
                del self.stack[i:]
                break
        if tag == "a" and self.open_anchors:
            self.open_anchors.pop()

    def handle_data(self, data):
        for a in self.open_anchors:
            a.text.append(data)


def discover_pagination_links(html: str, current_url: str, base_domain: str) -> set[str]:
    """Pure-Python L2 kernel; the oracle twin for the pandas UDF below.

    Ref: crawler/web_crawler.py:524-632 — same five groups, same per-group
    href guards ('#' everywhere; ``javascript:`` only in group 1), same
    ``base_domain in full_url`` keep test, resolution via the L4 kernel.
    """
    out: set[str] = set()
    if not html:
        return out
    model = _PageModel()
    try:
        model.feed(html)
        model.close()
    except Exception:
        return out

    def add(href, allow_js=True):
        if href and href != "#" and (allow_js or not href.startswith("javascript:")):
            full = kernels.make_absolute_url(href, current_url)
            if full and base_domain in full:
                out.add(full)

    for a in model.anchors:
        text = "".join(a.text)
        href = a.href or ""
        # Group 1 — next/previous buttons. The reference's last three
        # selectors (".pagination a:-soup-contains('Next')" etc.) are
        # subsumed by the bare text test and kept only as comments here.
        if (
            a.rel == "next"
            or ({"next", "next-page", "page-next"} & a.classes)
            or "next" in a.aria.lower()
            or "next" in a.title.lower()
            or "Next" in text or ">" in text or "→" in text
        ):
            add(a.href, allow_js=False)
        # Group 2 — numbered pagination (no javascript: guard upstream).
        anc = a.anc_classes
        if (
            ("pagination" in anc and "page=" in href)
            or ("pager" in anc and "page=" in href)
            or "page-numbers" in anc
            or ("page/" in href and not href.endswith("/page/"))
            or ("p=" in href and not href.endswith("p="))
            or ("nav" in a.anc_tags and "page" in href)
            or "pagination-list" in anc
        ):
            add(a.href)
        # Group 4 (anchor half) — load-more links and data-page anchors.
        if "load" in href or "more" in href or a.data_page is not None:
            add(a.href or a.data_url)

    # Group 3 — sequential synthesis from the CURRENT page URL (L3 kernel).
    out |= kernels.generate_sequential_pages(current_url, base_domain)

    # Group 4 (element half) — button[data-url] and .load-more/.show-more.
    for b in model.buttons:
        if b.data_url is not None:
            add(b.href or b.data_url)
    for e in model.loadmore:
        add(e.href or e.data_url)

    # Group 5 — form-based pagination.
    for action in model.form_actions:
        if "page" in action.lower() or "search" in action.lower():
            add(action)

    return out


@pandas_udf(ArrayType(StringType()))
def discover_pagination_udf(
    html: pd.Series, urls: pd.Series, base_domains: pd.Series
) -> pd.Series:
    """Vectorized L2: sorted pagination candidates per page."""
    return pd.Series(
        [
            sorted(discover_pagination_links(h or "", u, d))
            for h, u, d in zip(html, urls, base_domains)
        ]
    )
