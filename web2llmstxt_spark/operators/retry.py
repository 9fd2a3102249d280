"""UDF-internal fetch retry (T5) with a pluggable, injectable transport.

Reference: both sitemap fetch paths mount urllib3
``Retry(total=3, backoff_factor=1|2, status_forcelist=[429,500,502,503,504])``
sessions (crawler/web_crawler.py:832-839, 920-927); the production HTTP
fetcher needs the same policy INSIDE the task (Spark task retries re-run the
whole partition — per-URL retry must live in the UDF).

Pinned policy (urllib3 2.x semantics):
- 1 initial attempt + up to ``total`` retries;
- retried: status in ``status_forcelist`` and raised transport exceptions;
- NOT retried: any other status (a 404 is a permanent answer — the URL still
  enters ``seen`` per quirk Q5, it just yields no page);
- backoff before retry i (1-based): ``backoff_factor * 2**(i-1)`` seconds,
  via an injectable ``sleep`` (tests pass a recorder; production passes
  ``time.sleep``).

``RetryingFetcher`` is a drop-in for the ``fetch(cand)`` seam of both
crawlers: a ``mapInPandas`` over the candidate batch whose transport is any
picklable ``fn(url, attempt) -> {status, title, content, out_links}``. Rows
never leave the task between attempts; the output carries ``attempts`` and
``status`` for politeness/metrics.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..functions import kernels

DEFAULT_FORCELIST = (429, 500, 502, 503, 504)

RESULT_COLS = "success boolean, title string, content string, wc int, out_links array<string>, attempts int, status int"


def fetch_with_retry(
    transport: Callable[[str, int], dict],
    url: str,
    total: int = 3,
    backoff_factor: float = 1.0,
    status_forcelist: tuple[int, ...] = DEFAULT_FORCELIST,
    sleep: Callable[[float], None] | None = None,
) -> dict:
    """The per-URL retry kernel. Returns the final transport result plus
    ``attempts``; exhausted retries yield ``{"status": last_status,
    "success": False}``."""
    last: dict = {"status": 599}
    for attempt in range(1, total + 2):  # 1 initial + total retries
        if attempt > 1 and sleep is not None:
            sleep(backoff_factor * (2 ** (attempt - 2)))
        try:
            last = transport(url, attempt)
        except Exception:
            last = {"status": 599}  # transport exception: retryable
            continue_retry = True
        else:
            continue_retry = last.get("status") in status_forcelist
        if not continue_retry:
            break
    out = dict(last)
    out["attempts"] = attempt
    out["success"] = out.get("status") == 200
    return out


class RetryingFetcher:
    """fetch(cand) -> cand + (success, title, content, wc, out_links,
    attempts, status); per-URL retry inside the task."""

    def __init__(
        self,
        transport: Callable[[str, int], dict],
        total: int = 3,
        backoff_factor: float = 1.0,
        status_forcelist: tuple[int, ...] = DEFAULT_FORCELIST,
        sleep: Callable[[float], None] | None = None,
    ):
        self.transport = transport
        self.total = total
        self.backoff_factor = backoff_factor
        self.status_forcelist = status_forcelist
        self.sleep = sleep

    def fetch(self, cand: DataFrame) -> DataFrame:
        transport = self.transport
        total, bf = self.total, self.backoff_factor
        forcelist, sleep = self.status_forcelist, self.sleep
        in_fields = cand.schema
        out_schema = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in in_fields
        ) + ", " + RESULT_COLS

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                results = []
                for url in pdf["url"]:
                    r = fetch_with_retry(
                        transport, url, total, bf, forcelist, sleep
                    )
                    content = r.get("content")
                    results.append(
                        {
                            "success": bool(r["success"]),
                            "title": r.get("title"),
                            "content": content if r["success"] else None,
                            "wc": kernels.word_count(content) if r["success"] else 0,
                            "out_links": r.get("out_links") if r["success"] else None,
                            "attempts": int(r["attempts"]),
                            "status": int(r.get("status") or 0),
                        }
                    )
                res = pd.DataFrame(results)
                yield pd.concat(
                    [pdf.reset_index(drop=True), res.reset_index(drop=True)], axis=1
                )

        return cand.mapInPandas(run, out_schema)


def corpus_transport(pages_by_url: dict, flaky_after: Callable[[str], int] | None = None):
    """A deterministic corpus-backed transport for tests/benchmarks.

    ``flaky_after(url) -> k``: the first k attempts for that URL return 503
    (transient), attempt k+1 answers truthfully. Missing URL -> 404;
    ``fetch_ok=False`` rows -> 500 on every attempt (a permanently sick
    endpoint). Picklable via closure over plain dicts.
    """

    def transport(url: str, attempt: int) -> dict:
        if flaky_after is not None and attempt <= flaky_after(url):
            return {"status": 503}
        row = pages_by_url.get(url)
        if row is None:
            return {"status": 404}
        if not row["fetch_ok"]:
            return {"status": 500}
        return {
            "status": 200,
            "title": row["title"],
            "content": row["content"],
            "out_links": row["out_links"],
        }

    return transport
