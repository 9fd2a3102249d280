"""WARC (Web ARChive, ISO 28500) source — the crawl-native storage format.

A production crawl at 10^10-URL scale doesn't hand pages around as parquet
strings: fetchers emit WARC response records (Common Crawl publishes ~100 TB
of them per monthly snapshot), and the distillation pipeline's first stage is
a distributed WARC scan. The reference tool never persists raw fetches (it
crawls and distills in one process — crawler/web_crawler.py keeps pages in
memory), so this module EXTENDS the reference's data model with the format
the same pipeline needs once fetch and distill are separate jobs.

Format implemented (subset sufficient for response archives, matching what
Common Crawl emits):
- WARC/1.0 response records: named headers, CRLF line ends, the mandatory
  ``Content-Length`` octet count, record body = full HTTP response message,
  records separated by CRLF CRLF (WARC/1.0 §4).
- Optional per-record gzip members (``.warc.gz``): each record is its own
  gzip member and members are concatenated — the Common Crawl layout that
  makes a 1 GB archive splittable at record granularity without a central
  index (readers resync on the next gzip magic via ``unused_data``).

Scale shape: ``spark.read.format("binaryFile")`` lists archives cheaply and
hands each executor whole files; ``warc_scan`` parses them inside ONE
``mapInPandas`` pass (Arrow batches, no per-row Python dispatch) and emits
only the small projected columns (url, status, digest, length) — archive
bytes never cross a shuffle. One archive = one task, the same unit of work
as Common Crawl's own processing guidance; skew across archive sizes is
handled upstream by writing fixed-size archives (shard count is the writer's
knob, ``synth_warc_blobs``).

Determinism contract (what the ``warc_parse`` oracle verifies): writer and
parser round-trip every payload byte — the oracle recomputes url/status/
length/md5 from the source table in SQL, so a single corrupted byte in
either the record framing or the gzip member layer fails the hash match.
"""

from __future__ import annotations

import gzip
import hashlib
import zlib
from urllib.parse import quote
from typing import Iterable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

CRLF = b"\r\n"

#: fixed WARC-Date for synthetic archives — WARC requires the header; the
#: synthetic corpus has no fetch clock, and a pinned value keeps writer
#: output byte-deterministic (tests diff whole archives).
SYNTH_DATE = "2026-01-01T00:00:00Z"

WARC_SCAN_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("status", IntegerType()),
        StructField("content_type", StringType()),
        StructField("content_length", LongType()),
        StructField("body_md5", StringType()),
    ]
)

WARC_BLOB_SCHEMA = StructType(
    [
        StructField("shard", IntegerType()),
        StructField("warc", BinaryType()),
    ]
)


# ------------------------------------------------------------------- writer

def _record_id(url: str) -> str:
    """Deterministic WARC-Record-ID: md5(url) rendered as a urn:uuid (the
    header is mandatory per WARC/1.0 §5.2; a content-derived id keeps
    archives reproducible where a real crawler would mint a random uuid)."""
    h = hashlib.md5(url.encode("utf-8")).hexdigest()
    return f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"


def _header_uri(url: str) -> str:
    """WARC-Target-URI rendered header-safe: percent-encode every non-ASCII
    (or otherwise header-illegal) octet while leaving all reserved URI
    characters — and existing %-escapes — untouched. The crawl's
    normalize_url does not percent-encode IDN hosts or unicode paths, and
    WARC headers are rendered ``.encode('ascii')``; without this one café
    URL would raise UnicodeEncodeError inside the executor and fail the
    whole archive job."""
    return quote(url, safe=":/?#[]@!$&'()*+,;=%")


def build_record(
    url: str,
    payload: bytes,
    status: int = 200,
    content_type: str = "text/html",
    date: str = SYNTH_DATE,
) -> bytes:
    """One WARC/1.0 response record: WARC headers + HTTP response message.

    ``Content-Length`` is the octet count of the HTTP block (status line +
    headers + blank line + payload) — the field every splitter relies on to
    skip a record without parsing its body.
    """
    reason = {200: "OK", 301: "Moved Permanently", 404: "Not Found"}.get(
        status, "Unknown"
    )
    http = (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode("ascii") + payload
    warc_headers = (
        f"WARC/1.0\r\n"
        f"WARC-Type: response\r\n"
        f"WARC-Record-ID: {_record_id(url)}\r\n"
        f"WARC-Date: {date}\r\n"
        f"WARC-Target-URI: {_header_uri(url)}\r\n"
        f"Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode("ascii")
    return warc_headers + http + CRLF + CRLF


def _gzip_member(record: bytes) -> bytes:
    """One gzip member per record (mtime pinned to 0 for byte determinism)."""
    return gzip.compress(record, compresslevel=6, mtime=0)


def build_warc(records: Iterable[bytes], compress: bool = True) -> bytes:
    """Concatenate records into one archive blob (gzip-member per record
    when ``compress``, plain concatenation otherwise)."""
    if compress:
        return b"".join(_gzip_member(r) for r in records)
    return b"".join(records)


# ------------------------------------------------------------------- parser

def _split_members(blob: bytes) -> Iterator[bytes]:
    """Yield decompressed gzip members from a multi-member blob.

    zlib's ``unused_data`` hands back the bytes after each member's end —
    the standard resync loop (also how Common Crawl readers split records
    out of a .warc.gz without an index).
    """
    buf = blob
    while buf:
        d = zlib.decompressobj(wbits=31)
        yield d.decompress(buf) + d.flush()
        buf = d.unused_data


def _parse_headers(block: bytes) -> dict:
    headers = {}
    for line in block.split(CRLF):
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().lower()] = v.strip()
    return headers


def parse_warc(blob: bytes, compressed: bool | None = None) -> Iterator[dict]:
    """Parse an archive blob into response-record dicts.

    ``compressed=None`` sniffs the gzip magic. Each yielded dict carries
    (url, status, content_type, content_length, body_md5) — the projection
    a distillation scan needs; callers wanting payload bytes use
    ``parse_warc_full``.
    """
    for rec in parse_warc_full(blob, compressed=compressed):
        yield {
            "url": rec["url"],
            "status": rec["status"],
            "content_type": rec["content_type"],
            "content_length": rec["content_length"],
            "body_md5": hashlib.md5(rec["payload"]).hexdigest(),
        }


def _parse_record(rec: bytes) -> dict | None:
    """THE single record-framing parser (every scan path goes through it —
    a framing fix lands once). Returns None for unframeable bytes; else a
    dict with ``type`` ('response' | 'revisit' | other) and, for responses:
    url/status/content_type/payload; for revisits: url/status/content_type/
    digest (the hex from WARC-Payload-Digest, algorithm prefix stripped)."""
    head_end = rec.find(CRLF + CRLF)
    if head_end < 0:
        return None
    wh = _parse_headers(rec[:head_end])
    rtype = wh.get(b"warc-type", b"").decode("ascii")
    out = {
        "type": rtype,
        "url": wh.get(b"warc-target-uri", b"").decode("utf-8"),
    }
    if rtype not in ("response", "revisit"):
        return out
    clen = int(wh[b"content-length"])
    http = rec[head_end + 4 : head_end + 4 + clen]
    status_line_end = http.find(CRLF)
    out["status"] = int(http[:status_line_end].split(b" ")[1])
    http_head_end = http.find(CRLF + CRLF)
    hh = _parse_headers(http[status_line_end + 2 : http_head_end])
    out["content_type"] = hh.get(b"content-type", b"").decode("ascii")
    if rtype == "response":
        out["payload"] = http[http_head_end + 4 :]
    else:
        digest = wh.get(b"warc-payload-digest", b"").decode("ascii")
        out["digest"] = digest.split(":", 1)[1] if ":" in digest else digest
    return out


def parse_warc_full(blob: bytes, compressed: bool | None = None) -> Iterator[dict]:
    """Like ``parse_warc`` but yields the raw ``payload`` bytes too."""
    if compressed is None:
        compressed = blob[:2] == b"\x1f\x8b"
    records = _split_members(blob) if compressed else _split_plain(blob)
    for rec in records:
        r = _parse_record(rec)
        if r is None or r["type"] != "response":
            continue
        yield {
            "url": r["url"],
            "status": r["status"],
            "content_type": r["content_type"],
            "content_length": len(r["payload"]),
            "payload": r["payload"],
        }


def _split_plain(blob: bytes) -> Iterator[bytes]:
    """Split an uncompressed archive on record boundaries using each
    record's own Content-Length (NOT a naive split on CRLFCRLF, which a
    payload could contain)."""
    pos = 0
    n = len(blob)
    while pos < n:
        head_end = blob.find(CRLF + CRLF, pos)
        if head_end < 0:
            return
        wh = _parse_headers(blob[pos:head_end])
        clen = int(wh.get(b"content-length", b"0"))
        rec_end = head_end + 4 + clen
        yield blob[pos:rec_end]
        pos = rec_end + 4  # skip the CRLF CRLF record separator


# ------------------------------------------------------------- Spark stages

def warc_scan(blobs: DataFrame, blob_col: str = "warc") -> DataFrame:
    """Distributed WARC scan: (…, warc:binary) -> one row per response
    record, via ONE mapInPandas pass (Arrow batches; archive bytes stay
    inside the task that read them — only the tiny projection shuffles)."""

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = [rec for blob in pdf[blob_col] for rec in parse_warc(bytes(blob))]
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_SCAN_SCHEMA.fields]
            )

    return blobs.mapInPandas(run, WARC_SCAN_SCHEMA)


def read_warc(spark, path: str) -> DataFrame:
    """Read .warc / .warc.gz archives from disk: binaryFile listing (whole
    file per task — the splittable unit IS the archive) -> warc_scan."""
    files = spark.read.format("binaryFile").load(path)
    return warc_scan(files.select(F.col("content").alias("warc")))


def synth_warc_blobs(
    docs: DataFrame, n_shards: int = 8, compress: bool = True
) -> DataFrame:
    """Serialize a (doc_id, url, status, content_type, body) DataFrame into
    ``n_shards`` WARC archive blobs — the writer half of the round trip.

    groupBy(shard).applyInPandas builds each archive in the executor that
    owns the shard's rows; records are laid down in doc_id order so the
    archive bytes are deterministic regardless of upstream partitioning.
    """

    def build(pdf):
        import pandas as pd

        pdf = pdf.sort_values("doc_id")
        records = (
            build_record(
                r.url,
                r.body.encode("utf-8"),
                status=int(r.status),
                content_type=r.content_type,
            )
            for r in pdf.itertuples()
        )
        return pd.DataFrame(
            {"shard": [int(pdf["shard"].iloc[0])],
             "warc": [build_warc(records, compress=compress)]}
        )

    with_shard = docs.withColumn(
        "shard", (F.col("doc_id") % n_shards).cast("int")
    )
    return with_shard.groupBy("shard").applyInPandas(build, WARC_BLOB_SCHEMA)


# ---------------------------------------------------------------- CDX index

CDX_SCHEMA = StructType(
    [
        StructField("surt_key", StringType()),
        StructField("url", StringType()),
        StructField("status", IntegerType()),
        StructField("shard", IntegerType()),
        StructField("offset", LongType()),
        StructField("rec_length", LongType()),
        StructField("body_md5", StringType()),
    ]
)


def _split_members_with_offsets(blob: bytes) -> Iterator[tuple]:
    """Like _split_members but yields (offset, compressed_length, record) —
    the (offset, length) pair is what a CDX consumer range-requests to pull
    ONE record out of a remote .warc.gz without reading the archive."""
    pos = 0
    n = len(blob)
    while pos < n:
        d = zlib.decompressobj(wbits=31)
        rec = d.decompress(blob[pos:]) + d.flush()
        consumed = (n - pos) - len(d.unused_data)
        yield pos, consumed, rec
        pos += consumed


def parse_warc_cdx(blob: bytes) -> Iterator[dict]:
    """Parse a gzip-member archive into CDX entries: per response record,
    (url, status, offset, rec_length, body_md5). Offsets address the
    COMPRESSED member, so they survive the archive being served as-is."""
    for offset, length, rec in _split_members_with_offsets(blob):
        for r in _record_fields(rec):
            r["offset"] = offset
            r["rec_length"] = length
            yield r


def _record_fields(rec: bytes) -> Iterator[dict]:
    r = _parse_record(rec)
    if r is None or r["type"] != "response":
        return
    yield {
        "url": r["url"],
        "status": r["status"],
        "body_md5": hashlib.md5(r["payload"]).hexdigest(),
    }


def cdx_index(blobs: DataFrame, blob_col: str = "warc") -> DataFrame:
    """Distributed CDX index build over gzip-member archives: one mapInPandas
    pass emits (surt_key, url, status, shard, offset, rec_length, body_md5)
    per response record. The archive bytes never leave the scanning task;
    only index rows (what Common Crawl publishes as cdx-*.gz, ~0.3% of the
    archive bytes) move. Sorting/range-partitioning the result on surt_key
    is the consumer's choice — an orderBy here would force a global sort the
    lookup layout may not need."""
    from ..functions import native

    def run(batches):
        import pandas as pd

        cols = ["url", "status", "shard", "offset", "rec_length", "body_md5"]
        for pdf in batches:
            rows = []
            for shard, blob in zip(pdf["shard"], pdf[blob_col]):
                for r in parse_warc_cdx(bytes(blob)):
                    r["shard"] = int(shard)
                    rows.append(r)
            yield pd.DataFrame(rows, columns=cols)

    parsed_schema = StructType([f for f in CDX_SCHEMA.fields if f.name != "surt_key"])
    parsed = blobs.mapInPandas(run, parsed_schema)
    return parsed.select(
        native.surt_key_native(F.col("url")).alias("surt_key"), *parsed.columns
    )


# --------------------------------------------------------- full-text scan

WARC_TEXT_SCHEMA = StructType(
    [
        StructField("src", StringType()),      # archive path/shard label
        StructField("offset", LongType()),     # record order within archive
        StructField("url", StringType()),
        StructField("status", IntegerType()),
        StructField("content_type", StringType()),
        StructField("content", StringType()),  # payload decoded utf-8
    ]
)


def warc_scan_text(
    blobs: DataFrame, blob_col: str = "warc", src_col: str = "shard"
) -> DataFrame:
    """Full-text WARC scan for distillation: one row per response record
    WITH the decoded payload (utf-8, errors replaced). (src, offset) gives
    a deterministic global record order — the crawl-order stand-in an
    archive consumer ranks by. Payloads stay inside the scanning task until
    the caller's plan decides what to shuffle."""

    def run(batches):
        import pandas as pd

        cols = [f.name for f in WARC_TEXT_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for src, blob in zip(pdf[src_col], pdf[blob_col]):
                blob = bytes(blob)
                compressed = blob[:2] == b"\x1f\x8b"
                if compressed:
                    members = _split_members_with_offsets(blob)
                else:
                    members = (
                        (i, 0, rec) for i, rec in enumerate(_split_plain(blob))
                    )
                for offset, _length, rec in members:
                    for r in parse_warc_full(rec, compressed=False):
                        rows.append(
                            {
                                "src": str(src),
                                "offset": int(offset),
                                "url": r["url"],
                                "status": r["status"],
                                "content_type": r["content_type"],
                                "content": r["payload"].decode(
                                    "utf-8", errors="replace"
                                ),
                            }
                        )
            yield pd.DataFrame(rows, columns=cols)

    return blobs.mapInPandas(run, WARC_TEXT_SCHEMA)


def read_warc_text(spark, path: str) -> DataFrame:
    """binaryFile listing -> full-text scan, src = file path."""
    files = spark.read.format("binaryFile").load(path)
    return warc_scan_text(
        files.select(F.col("path").alias("shard"), F.col("content").alias("warc"))
    )


# ------------------------------------------------------------ revisit dedup

#: WARC/1.1 §6.7.2 revisit profile: the recrawl fetched content whose digest
#: matches a prior capture, so the archive stores a small pointer record
#: instead of the payload — the storage dedup every continuous web archive
#: (Heritrix + IA's petabox, Common Crawl) applies between snapshots.
REVISIT_PROFILE = "http://netpreserve.org/warc/1.1/revisit/identical-payload-digest"

TYPED_SCAN_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("record_type", StringType()),  # response | revisit
        StructField("body_md5", StringType()),
        StructField("stored_bytes", LongType()),   # compressed member size
    ]
)


def build_revisit_record(
    url: str,
    payload_md5: str,
    status: int = 200,
    content_type: str = "text/html",
    date: str = SYNTH_DATE,
) -> bytes:
    """A revisit record: WARC headers carrying the payload digest + the HTTP
    response HEADERS ONLY as the block (per spec the block is the response
    message sans payload). ~200 bytes regardless of page size — that gap IS
    the dedup win."""
    http_head = (
        f"HTTP/1.1 {status} OK\r\n"
        f"Content-Type: {content_type}\r\n\r\n"
    ).encode("ascii")
    warc_headers = (
        f"WARC/1.0\r\n"
        f"WARC-Type: revisit\r\n"
        f"WARC-Record-ID: {_record_id(url + '#revisit')}\r\n"
        f"WARC-Date: {date}\r\n"
        f"WARC-Target-URI: {_header_uri(url)}\r\n"
        f"WARC-Profile: {REVISIT_PROFILE}\r\n"
        f"WARC-Payload-Digest: md5:{payload_md5}\r\n"
        f"Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(http_head)}\r\n\r\n"
    ).encode("ascii")
    return warc_headers + http_head + CRLF + CRLF


def synth_warc_blobs_typed(
    pages: DataFrame, n_shards: int = 8, compress: bool = True
) -> DataFrame:
    """Like synth_warc_blobs but honors a ``record_type`` column: 'revisit'
    rows serialize as digest-pointer records (their ``body`` is hashed for
    the digest header but NOT stored), everything else as full responses."""

    def build(pdf):
        import pandas as pd

        pdf = pdf.sort_values("doc_id")
        records = []
        for r in pdf.itertuples():
            if r.record_type == "revisit":
                records.append(
                    build_revisit_record(
                        r.url,
                        hashlib.md5(r.body.encode("utf-8")).hexdigest(),
                        status=int(r.status),
                        content_type=r.content_type,
                    )
                )
            else:
                records.append(
                    build_record(
                        r.url,
                        r.body.encode("utf-8"),
                        status=int(r.status),
                        content_type=r.content_type,
                    )
                )
        return pd.DataFrame(
            {"shard": [int(pdf["shard"].iloc[0])],
             "warc": [build_warc(records, compress=compress)]}
        )

    with_shard = pages.withColumn(
        "shard", (F.col("doc_id") % n_shards).cast("int")
    )
    return with_shard.groupBy("shard").applyInPandas(build, WARC_BLOB_SCHEMA)


def warc_scan_typed(blobs: DataFrame, blob_col: str = "warc") -> DataFrame:
    """Scan archives surfacing BOTH record types: responses carry the
    recomputed payload md5, revisits the digest from their header — so a
    reader resolves every URL's content hash without the deduped bytes.
    ``stored_bytes`` is the compressed member size (the storage accounting
    that quantifies the revisit win)."""

    def run(batches):
        import pandas as pd

        cols = [f.name for f in TYPED_SCAN_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for blob in pdf[blob_col]:
                blob = bytes(blob)
                for _offset, length, rec in _split_members_with_offsets(blob):
                    r = _parse_record(rec)
                    if r is None or r["type"] not in ("response", "revisit"):
                        continue
                    md5 = (
                        hashlib.md5(r["payload"]).hexdigest()
                        if r["type"] == "response"
                        else r["digest"]
                    )
                    rows.append(
                        {"url": r["url"], "record_type": r["type"],
                         "body_md5": md5, "stored_bytes": length}
                    )
            yield pd.DataFrame(rows, columns=cols)

    return blobs.mapInPandas(run, TYPED_SCAN_SCHEMA)


def classify_revisits(
    new_pages: DataFrame, prior_digests: DataFrame
) -> DataFrame:
    """Recrawl-store dedup decision: join the fresh fetches against the
    prior snapshot's (url, body_md5) CDX projection; identical digest ->
    'revisit', changed or unseen -> 'response'. One broadcast-able join on
    url; page bytes stay put."""
    prior = prior_digests.select(
        F.col("url"), F.col("body_md5").alias("__prior_md5")
    )
    return (
        new_pages.withColumn("__md5", F.md5(F.col("body")))
        .join(prior, "url", "left")
        .withColumn(
            "record_type",
            F.when(
                F.col("__prior_md5").isNotNull()
                & (F.col("__md5") == F.col("__prior_md5")),
                "revisit",
            ).otherwise("response"),
        )
        .drop("__md5", "__prior_md5")
    )


# ------------------------------------------------------------- archive sink

def pages_to_warc_blobs(
    pages: DataFrame,
    n_shards: int = 8,
    url_col: str = "url",
    body_col: str = "content",
    order_col: str = "rank",
) -> DataFrame:
    """Crawled pages -> archive blobs: the sink half that makes a crawl
    REPLAYABLE (write once, re-distill forever via `cli from-warc` — the
    fetch/distill separation every production pipeline runs). Records are
    laid down in crawl-rank order within hash-assigned shards, so output
    bytes are deterministic for a given crawl result regardless of
    partitioning (same applyInPandas shape as synth_warc_blobs)."""
    rows = pages.select(
        F.col(order_col).cast("long").alias("doc_id"),
        F.col(url_col).alias("url"),
        F.lit(200).alias("status"),
        F.lit("text/html").alias("content_type"),
        F.coalesce(F.col(body_col), F.lit("")).alias("body"),
    )
    return synth_warc_blobs(rows, n_shards=n_shards, compress=True)


def write_archive_files(blobs: DataFrame, out_dir: str, prefix: str = "crawl") -> list:
    """Write one ``<prefix>-<shard:05d>.warc.gz`` file per blob row.

    Executor-side writes to a shared filesystem — the local stand-in for an
    object-store put; each task writes only its own shard files, no driver
    materialization of archive bytes. ONE evaluation of ``blobs``: the
    write task yields the shard ids it published (mapPartitions + collect
    of ints only), so the expensive groupBy/applyInPandas gzip plan never
    runs twice. Orphaned ``<prefix>-*.warc.gz`` shards from a prior larger
    run are removed AFTER the write succeeds (write-then-delete: a failed
    job must leave the previous replayable archive intact — same-id shards
    are already replaced atomically by os.replace). Returns the sorted
    list of written paths."""
    import glob as _glob
    import os

    os.makedirs(out_dir, exist_ok=True)
    shard_rows = blobs.select("shard", "warc")

    def write_part(rows):
        for r in rows:
            shard = int(r["shard"])
            path = os.path.join(out_dir, f"{prefix}-{shard:05d}.warc.gz")
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(bytes(r["warc"]))
            os.replace(tmp, path)  # atomic publish
            yield shard

    shards = shard_rows.rdd.mapPartitions(write_part).collect()
    written = {f"{prefix}-{s:05d}.warc.gz" for s in shards}
    for f in _glob.glob(os.path.join(out_dir, f"{prefix}-*.warc.gz")):
        if os.path.basename(f) not in written:
            os.remove(f)  # orphan from a prior larger run
    return [
        os.path.join(out_dir, f"{prefix}-{s:05d}.warc.gz") for s in sorted(shards)
    ]
