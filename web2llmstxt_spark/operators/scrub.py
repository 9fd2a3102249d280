"""PII scrubbing / redaction — a standard training-data curation pass.

Large-scale LLM corpora redact personally-identifiable strings (emails,
phone numbers, IP addresses) before training; the regex protocol here is
the published one (e.g. BigScience ROOTS / RefinedWeb PII pipelines use
exactly this class of pattern-based redaction; public knowledge). The
reference has no PII pass — this extends its curation surface the way
`operators/curation.py` does.

Engine-parity design: every pattern is written in the COMMON subset of
Java `java.util.regex` (Spark's engine) and RE2 (DuckDB's engine) — no
lookaround, no backreferences, ASCII `\\b` word boundaries, `{m,n}`
quantifiers — so the Spark plan and the DuckDB oracle twin match byte for
byte. Patterns apply SEQUENTIALLY (emails first) so an IP-shaped substring
inside an already-redacted email's domain is never double-counted; both
engines run the identical chain.

Scale shape (100 TB): pure per-row Column algebra — `regexp_extract_all`
+ `regexp_replace` inside whole-stage codegen, zero shuffles, zero Python.
The scan is the whole cost and it is embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: (name, pattern, replacement) — ORDER MATTERS (applied sequentially).
#: Patterns stay in the Java-regex ∩ RE2 common subset (see module doc).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+\d{1,2}[- ]\d{3}[- ]\d{3}[- ]\d{4}", "<PHONE>"),
    ("ipv4", r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
]


def scrub_pii(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: tuple = (),
) -> DataFrame:
    """Redact emails, phone numbers and IPv4 addresses from ``text_col``.

    Output: (id, *keep_cols, n_email, n_phone, n_ipv4, has_pii, text_clean).
    Counts are taken on the text as it stands when that pattern runs
    (sequential chain), so overlapping PII classes never double-count.
    ``keep_cols`` passes extra columns through untouched (projection only —
    still zero shuffles).
    """
    text = F.col(text_col)
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0)))
            .cast("long")
            .alias(f"n_{name}")
        )
        text = F.regexp_replace(text, pat, repl)
    total = sum(F.col(f"n_{n}") for n, _, _ in PII_PATTERNS)
    return docs.select(
        F.col(id_col), *keep_cols, *counts, text.alias("text_clean")
    ).withColumn("has_pii", total > 0)


def scrub_sql(text_expr: str) -> tuple[list[str], str]:
    """DuckDB twin: returns (count exprs aligned with PII_PATTERNS,
    fully-redacted text expr), running the identical sequential chain."""
    cur = text_expr
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(
            f"len(regexp_extract_all({cur}, '{pat}'))::BIGINT AS n_{name}"
        )
        cur = f"regexp_replace({cur}, '{pat}', '{repl}', 'g')"
    return counts, cur
