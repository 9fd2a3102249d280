"""RSS/Atom feed parsing — the second standard URL-discovery channel.

Sitemaps (S4/S5, `sitemap_xml.py`) answer "what pages exist"; feeds answer
"what changed lately", which is what a continuous recrawl loop
(`snapshot.recrawl_schedule`) actually wants: an ordered list of
recently-published URLs per site. The reference is sitemap-only
(crawler/web_crawler.py:930-1060 has no feed handling); this extension uses
the same architecture as sitemap_xml — a pure kernel parser (unit-testable)
batch-driven by mapInPandas over (feed_url, body) blobs, emitting a narrow
(feed_url, url, title, published) table that unions into the frontier
exactly like sitemap URLs do.

Scale: blobs arrive partitioned however the fetcher left them (host-hashed);
parsing is embarrassingly parallel, no shuffle; the output projection is a
few strings per entry regardless of feed size, and the 50 MB body cap
(mirroring MAX_SITEMAP_SIZE) bounds worker memory.
"""

from __future__ import annotations

import gzip
import xml.etree.ElementTree as ET
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

MAX_FEED_SIZE = 50 * 1024 * 1024  # same security cap as sitemaps

FEED_SCHEMA = "feed_url string, url string, title string, published string"


def _local(tag) -> str:
    """Namespace-agnostic element name ('{ns}entry' -> 'entry')."""
    return tag.rsplit("}", 1)[-1] if isinstance(tag, str) else ""


def _child_text(elem, name: str) -> str | None:
    for c in elem:
        if _local(c.tag) == name and c.text:
            return c.text.strip()
    return None


def _atom_link(entry) -> str | None:
    """Atom entry link: prefer rel='alternate' (or no rel), else first href."""
    first = None
    for c in entry:
        if _local(c.tag) == "link":
            href = (c.get("href") or "").strip()
            if not href:
                continue
            rel = c.get("rel")
            if rel in (None, "", "alternate"):
                return href
            if first is None:
                first = href
    return first


def parse_feed_blob(feed_url: str, body) -> list[tuple[str, str, str]]:
    """One raw feed blob -> [(url, title, published)]. Handles RSS 2.0
    (<item><link>text</link>) and Atom (<entry><link href=.../>), any
    namespace prefix, optional gzip; malformed/oversized blobs yield []."""
    if body is None:
        return []
    content = body.encode() if isinstance(body, str) else bytes(body)
    if len(content) > MAX_FEED_SIZE:
        return []
    if feed_url.endswith(".gz") or content.startswith(b"\x1f\x8b"):
        try:
            content = gzip.decompress(content)
        except Exception:
            pass
    try:
        root = ET.fromstring(content)
    except Exception:
        return []

    out: list[tuple[str, str, str]] = []
    for elem in root.iter():
        name = _local(elem.tag)
        if name == "item":  # RSS 2.0
            url = _child_text(elem, "link")
            if url and url.startswith("http"):
                out.append((
                    url,
                    _child_text(elem, "title") or "",
                    _child_text(elem, "pubDate") or "",
                ))
        elif name == "entry":  # Atom
            url = _atom_link(elem)
            if url and url.startswith("http"):
                out.append((
                    url,
                    _child_text(elem, "title") or "",
                    _child_text(elem, "published")
                    or _child_text(elem, "updated")
                    or "",
                ))
    return out


def parse_feeds(blobs: DataFrame, url_col: str = "feed_url", body_col: str = "body") -> DataFrame:
    """(feed_url, body) -> (feed_url, url, title, published) rows via
    mapInPandas — the batch driver for `parse_feed_blob`."""

    def parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fu, body in zip(pdf[url_col], pdf[body_col]):
                for url, title, pub in parse_feed_blob(fu, body):
                    rows.append((fu, url, title, pub))
            yield pd.DataFrame(
                rows, columns=["feed_url", "url", "title", "published"]
            )

    return blobs.select(url_col, body_col).mapInPandas(
        parse_batches, schema=FEED_SCHEMA
    )
