"""Output sinks: llms.txt / llms-full.txt / JSON / YAML (v2 spec format).

Reference: ``llmsgen/utils/file_utils.py:94-222`` (write_text_output /
write_json_output / write_yaml_output / write_output_files), golden example
``/root/reference/output/example.com-llms.txt``.

Scale design (round-1 fix): the final artifacts are single driver-side text
files, but their ASSEMBLY must not materialize page CONTENT on the driver.

- llms.txt needs only the bounded entries projection (url/title/description/
  category — one rendered bullet per entry, inherently driver-sized) plus a
  five-sample site summary; the per-entry content fallback is computed
  DISTRIBUTED in plans/distill.py (``render_desc``).
- llms-full.txt streams rank-ordered pages through ``toLocalIterator()`` —
  one partition in driver memory at a time, never the full corpus.
- JSON with ``include_full_text`` streams ``full_content_pages`` row by row.
"""

from __future__ import annotations

import itertools
import json
import os
from typing import Iterable, Iterator

from ..functions import kernels

try:  # pyyaml is optional in the sandbox
    import yaml

    _HAS_YAML = True
except ImportError:  # pragma: no cover
    _HAS_YAML = False


def final_description(desc: str | None, page_content: str | None) -> str:
    """The render-time description fallback (ref file_utils.py:124-130).

    Byte-identical twin of the distributed ``render_desc`` column in
    plans/distill.py: BOTH sides split only a 4096-char prefix on the pinned
    ASCII whitespace class (Java ``\\s`` == kernels._WS_ASCII_RE), so a page
    whose first 30 tokens span >4 KB (minified JS, base64 blobs) truncates
    identically here and in the Spark plan instead of diverging.
    """
    if desc == "N/A (full_text_only mode)" or not desc:
        return (
            " ".join(kernels.ws_tokens(page_content[:4096])[:30]) + "..."
            if page_content
            else "No content available."
        )
    return desc


def render_llms_txt_prepared(
    site_name: str,
    site_summary: str,
    entries: list[dict],
    metadata: dict,
) -> str:
    """llms.txt from PREPARED inputs: site name/summary already computed from
    bounded samples, entries carrying their final description (``render_desc``
    if present, else ``description`` — fallbacks pre-applied distributed).
    Byte-identical to the legacy list-based renderer."""
    out = []
    out.append(f"# {site_name}\n")
    out.append(f"> {site_summary}\n")
    total = metadata.get("total_pages_crawled", len(entries))
    generated_date = metadata.get("generated_at", "").split("T")[0]
    out.append(f"Generated from {total} pages on {generated_date} using automated crawling.\n")

    by_cat: dict[str, list[dict]] = {}
    for e in entries:
        by_cat.setdefault(e["category"], []).append(e)
    for category in kernels.CATEGORY_ORDER:
        if category not in by_cat:
            continue
        out.append(f"## {category}\n")
        lines = []
        for e in by_cat[category]:
            desc = e.get("render_desc") or final_description(e.get("description"), None)
            lines.append(f"- [{e.get('title', 'Untitled')}]({e.get('url', '#')}): {desc}")
        out.append("\n".join(lines) + "\n")
    return "\n".join(out)


def write_llms_txt_stream(
    path: str,
    site_name: str,
    site_summary: str,
    entries_iter: Iterable,
    metadata: dict,
) -> None:
    """Stream the v2 llms.txt from an entries iterator ORDERED BY
    (category_ord, index) — byte-identical to ``render_llms_txt_prepared``
    without ever holding the O(pages) entry list on the driver (the iterator
    is a toLocalIterator over the distributed entries table; driver memory =
    one Arrow partition of bounded, content-free rows).

    Category sections emerge from order transitions in the sorted stream, so
    the caller must sort by the canonical kernels.CATEGORY_ORDER position.
    """
    with open(path, "w", encoding="utf-8") as f:
        w = _JoinWriter(f)
        w.emit(f"# {site_name}\n")
        w.emit(f"> {site_summary}\n")
        total = metadata.get("total_pages_crawled", 0)
        generated_date = metadata.get("generated_at", "").split("T")[0]
        w.emit(f"Generated from {total} pages on {generated_date} using automated crawling.\n")
        cur_cat = None
        for e in entries_iter:
            cat = e["category"]
            desc = e.get("render_desc") or final_description(e.get("description"), None)
            line = f"- [{e.get('title', 'Untitled')}]({e.get('url', '#')}): {desc}"
            if cat != cur_cat:
                if cur_cat is not None:
                    f.write("\n")  # close the previous block's trailing newline
                w.emit(f"## {cat}\n")
                w.emit(line)  # first line of the new block element
                cur_cat = cat
            else:
                f.write("\n" + line)  # continue the block element in place
        if cur_cat is not None:
            f.write("\n")  # final block's trailing newline


def render_llms_txt(base_url: str, entries: list[dict], pages: list[dict], metadata: dict) -> str:
    """The llms.txt spec document from in-memory lists (golden-tested twin of
    ref llmsgen/utils/file_utils.py:107-136). Production path: compute
    ``render_desc`` distributed and call ``render_llms_txt_prepared``."""
    content_map = {p.get("url"): p.get("content", "") for p in pages}
    prepared = [
        {**e, "render_desc": final_description(e.get("description"), content_map.get(e.get("url", ""), ""))}
        for e in entries
    ]
    metadata = {**metadata, "total_pages_crawled": metadata.get("total_pages_crawled", len(pages))}
    return render_llms_txt_prepared(
        kernels.extract_site_name(base_url, pages),
        kernels.generate_site_summary(pages),
        prepared,
        metadata,
    )


class _JoinWriter:
    """Writes elements joined by newline ("\\n".join semantics, streamed)."""

    def __init__(self, f):
        self.f = f
        self.first = True

    def emit(self, element: str) -> None:
        if not self.first:
            self.f.write("\n")
        self.f.write(element)
        self.first = False


def write_llms_full_stream(
    path: str,
    base_url: str,
    pages_iter: Iterable,
    total_pages: int,
    metadata: dict,
) -> None:
    """Stream llms-full.txt (ref file_utils.py:139-160) from a rank-ordered
    iterator of rows/dicts with (title, url, content). Byte-identical to the
    legacy full-list renderer; driver memory = one Arrow partition."""
    max_full = metadata.get("max_full_text_pages")
    n_write = total_pages if max_full is None else min(total_pages, max_full)
    with open(path, "w", encoding="utf-8") as f:
        w = _JoinWriter(f)
        w.emit(f"# {base_url} llms-full.txt")
        w.emit(
            f"# Generated on {metadata.get('generated_at', '')} using {metadata.get('model_used', 'N/A')}"
        )
        w.emit(f"# Total pages crawled: {metadata.get('total_pages_crawled', total_pages)}")
        w.emit(f"# Processing time: {metadata.get('processing_time_seconds', 'N/A')}s")
        if max_full is not None and total_pages > max_full:
            w.emit(f"# Displaying {n_write} of {total_pages} crawled pages due to limit.")
        w.emit("")
        for i, page in enumerate(pages_iter, 1):
            if i > n_write:
                break
            d = page if isinstance(page, dict) else page.asDict()
            w.emit(f"## Page {i}: {d.get('title', 'Untitled')}")
            w.emit(f"**URL:** {d.get('url', '#')}\n")
            w.emit(d.get("content", "No content available."))
            w.emit("\n---\n")


def render_llms_full_txt(base_url: str, pages: list[dict], metadata: dict) -> str:
    """Legacy list-based llms-full renderer (kept as the byte-parity twin of
    ``write_llms_full_stream``; see tests/test_sinks_stream.py)."""
    out = [
        f"# {base_url} llms-full.txt",
        f"# Generated on {metadata.get('generated_at', '')} using {metadata.get('model_used', 'N/A')}",
        f"# Total pages crawled: {metadata.get('total_pages_crawled', len(pages))}",
        f"# Processing time: {metadata.get('processing_time_seconds', 'N/A')}s",
    ]
    pages_to_write = pages
    max_full = metadata.get("max_full_text_pages")
    if max_full is not None and len(pages) > max_full:
        pages_to_write = pages[:max_full]
        out.append(
            f"# Displaying {len(pages_to_write)} of {len(pages)} crawled pages due to limit."
        )
    out.append("")
    for i, page in enumerate(pages_to_write, 1):
        out.append(f"## Page {i}: {page.get('title', 'Untitled')}")
        out.append(f"**URL:** {page.get('url', '#')}\n")
        out.append(page.get("content", "No content available."))
        out.append("\n---\n")
    return "\n".join(out)


# ------------------------------------------------------------ v1 format twins
# The reference ships TWO text formats; v2 (above) is the gold spec, v1
# (generator/llms_generator.py:789-821) uses `# DOMAIN - LLMs.txt` headers and
# `--- Page i ---` blocks. Selected via write_output_files(style="v1").


def render_llms_txt_v1(domain: str, entries: list[dict], generated_on: str) -> str:
    """v1 llms.txt (generator/llms_generator.py:789-801): byte-exact
    concatenation semantics of the reference's `content +=` chain."""
    content = f"# {domain.upper()} - LLMs.txt\n"
    content += f"# Generated on {generated_on}\n"
    content += f"# Total pages: {len(entries)}\n\n"
    for e in entries:
        content += f"## {e.get('title', 'Untitled')}\n"
        content += f"URL: {e.get('url', '')}\n"
        desc = e.get("render_desc") or final_description(e.get("description"), None)
        content += f"Description: {desc}\n\n"
    return content


def write_llms_full_v1_stream(
    path: str,
    domain: str,
    pages_iter: Iterable,
    total_pages: int,
    generated_on: str,
) -> None:
    """v1 llms-full.txt (generator/llms_generator.py:804-821), streamed like
    the v2 sink: one Arrow partition of driver memory, never the corpus."""
    sep = "=" * 80
    with open(path, "w", encoding="utf-8") as f:
        f.write(f"# {domain.upper()} - Full Content\n")
        f.write(f"# Generated on {generated_on}\n")
        f.write(f"# Total pages: {total_pages}\n\n")
        f.write(sep + "\n\n")
        for i, page in enumerate(pages_iter, 1):
            d = page if isinstance(page, dict) else page.asDict()
            f.write(f"--- Page {i} ---\n")
            f.write(f"Title: {d.get('title', 'Untitled')}\n")
            f.write(f"URL: {d.get('url', '')}\n")
            f.write(f"Content:\n{d.get('content', '')}\n\n")
            f.write(sep + "\n\n")


def _entry_public(e: dict) -> dict:
    return {k: v for k, v in e.items() if k != "render_desc"}


def _json_dump_list_stream(f, items: Iterable) -> None:
    """Stream a JSON array element-by-element, byte-identical to
    ``json.dump(list(items), f, indent=2, ensure_ascii=False)`` — each
    element is dumped with indent=2 and re-indented two spaces, exactly the
    nesting json.dump applies inside a top-level list. Driver memory = one
    element at a time."""
    first = True
    for it in items:
        if first:
            f.write("[")
        s = json.dumps(it, indent=2, ensure_ascii=False)
        s = "\n".join("  " + ln for ln in s.splitlines())
        f.write(("\n" if first else ",\n") + s)
        first = False
    f.write("\n]" if not first else "[]")


def write_json_stream(
    path: str,
    entries: Iterable,
    metadata: dict,
    full_pages_iter: Iterator | None,
) -> None:
    """JSON sink; ``llms_entries`` streams entry-by-entry (``entries`` may be
    any iterable — a toLocalIterator-backed generator keeps the whole sink
    O(1) on the driver) and ``full_content_pages`` (when requested) streams
    row by row so page content never accumulates on the driver."""
    with open(path, "w", encoding="utf-8") as f:
        f.write('{\n"metadata": ')
        json.dump(metadata, f, indent=2, ensure_ascii=False)
        f.write(',\n"llms_entries": ')
        _json_dump_list_stream(f, (_entry_public(e) for e in entries))
        if full_pages_iter is not None:
            f.write(',\n"full_content_pages": [')
            first = True
            for row in full_pages_iter:
                d = row if isinstance(row, dict) else row.asDict()
                f.write(("" if first else ",") + "\n")
                json.dump(d, f, ensure_ascii=False)
                first = False
            f.write("\n]")
        f.write("\n}")


def _yaml_kwargs():
    return dict(default_flow_style=False, allow_unicode=True, indent=2)


def _yaml_dump_key_list_stream(f, key: str, items: Iterable) -> None:
    """Stream ``key: [items...]`` element-by-element, byte-identical to the
    key's section in ``yaml.dump({key: list(items), ...})``: pyyaml renders a
    nested block list at the parent indent, so concatenating per-element
    single-item-list dumps reproduces the full-list bytes exactly."""
    it = iter(items)
    try:
        first = next(it)
    except StopIteration:
        f.write(yaml.dump({key: []}, **_yaml_kwargs()))
        return
    f.write(f"{key}:\n")
    f.write(yaml.dump([first], **_yaml_kwargs()))
    for item in it:
        f.write(yaml.dump([item], **_yaml_kwargs()))


def write_yaml_stream(
    path: str,
    metadata: dict,
    entries_iter: Iterable,
    full_pages_iter: Iterator | None,
) -> None:
    """YAML sink, streamed: byte-identical to
    ``yaml.dump({'metadata': ..., 'llms_entries': [...],
    'full_content_pages': [...]}, default_flow_style=False,
    allow_unicode=True, indent=2)`` — pyyaml sorts top-level keys
    (sort_keys default), so sections emit in sorted-key order — without ever
    holding the entry list or page content list on the driver."""
    sections: dict[str, object] = {"metadata": metadata, "llms_entries": entries_iter}
    if full_pages_iter is not None:
        sections["full_content_pages"] = full_pages_iter
    with open(path, "w", encoding="utf-8") as f:
        for key in sorted(sections):
            v = sections[key]
            if isinstance(v, dict):
                f.write(yaml.dump({key: v}, **_yaml_kwargs()))
            else:
                _yaml_dump_key_list_stream(f, key, v)


def write_llms_txt_v1_stream(
    path: str,
    domain: str,
    entries_iter: Iterable,
    total_entries: int,
    generated_on: str,
) -> None:
    """v1 llms.txt (generator/llms_generator.py:789-801) streamed per entry;
    byte-identical to render_llms_txt_v1 given the same entry sequence. The
    header's entry count is passed in (known from the crawl's page count) so
    the stream needs no pre-pass."""
    with open(path, "w", encoding="utf-8") as f:
        f.write(f"# {domain.upper()} - LLMs.txt\n")
        f.write(f"# Generated on {generated_on}\n")
        f.write(f"# Total pages: {total_entries}\n\n")
        for e in entries_iter:
            f.write(f"## {e.get('title', 'Untitled')}\n")
            f.write(f"URL: {e.get('url', '')}\n")
            desc = e.get("render_desc") or final_description(e.get("description"), None)
            f.write(f"Description: {desc}\n\n")


def write_output_files(
    output_dir: str,
    base_url: str,
    entries: list[dict],
    metadata: dict,
    export_format: str = "text",
    include_full_text: bool = False,
    full_text_only: bool = False,
    pages_df=None,
    site_name: str | None = None,
    site_summary: str | None = None,
    style: str = "v2",
    entries_iter_factory=None,
    entries_index_iter_factory=None,
) -> list[str]:
    """Dispatch on format (ref llmsgen/utils/file_utils.py:204-222); returns
    written paths. ``pages_df`` (rank-ordered crawl output) is only streamed,
    never collected. ``style``: 'v2' (gold spec, default) or 'v1'
    (`# DOMAIN - LLMs.txt` / `--- Page i ---` blocks,
    generator/llms_generator.py:789-821).

    ``entries_iter_factory``: zero-arg callable yielding entry dicts ordered
    by (category_ord, index). When given, the v2 llms.txt body streams from
    it (write_llms_txt_stream) and never needs the ``entries`` list — pass
    entries=[] and the artifact is still complete.

    ``entries_index_iter_factory``: zero-arg callable yielding entry dicts
    ordered by index (the json/yaml/v1 entry order). When given, those
    formats stream from it instead of the ``entries`` list — EVERY format is
    then O(1) driver memory."""
    os.makedirs(output_dir, exist_ok=True)
    domain = kernels.extract_domain_from_url(base_url)
    written = []
    fmt = export_format.lower()
    total_pages = metadata.get("total_pages_crawled", 0)
    total_entries = metadata.get("total_entries_processed", len(entries))

    def full_pages_iter():
        return (
            pages_df.orderBy("rank")
            .select("title", "url", "content")
            .toLocalIterator()
        )

    def indexed_entries():
        if entries_index_iter_factory is not None:
            return entries_index_iter_factory()
        return iter(entries)

    if fmt == "json":
        path = os.path.join(output_dir, f"{domain}-llms.json")
        write_json_stream(
            path, indexed_entries(), metadata,
            full_pages_iter() if include_full_text else None,
        )
        written.append(path)
    elif fmt == "yaml":
        if not _HAS_YAML:
            raise NotImplementedError("pyyaml not available in this environment")
        full_iter = None
        if include_full_text:
            # the page iterator is SLICED, not materialized: islice consumes
            # only max_full_text_pages rows from the toLocalIterator stream,
            # so the driver never holds the full crawl's content at once
            max_full = metadata.get("max_full_text_pages") or None
            full_iter = (
                r.asDict() for r in itertools.islice(full_pages_iter(), max_full)
            )
        path = os.path.join(output_dir, f"{domain}-llms.yaml")
        write_yaml_stream(
            path, metadata, (_entry_public(e) for e in indexed_entries()), full_iter
        )
        written.append(path)
    elif style == "v1":
        generated_on = metadata.get("generated_at", "").replace("T", " ").split(".")[0]
        if not full_text_only and total_entries:
            path = os.path.join(output_dir, f"{domain}-llms.txt")
            write_llms_txt_v1_stream(
                path, domain, indexed_entries(), total_entries, generated_on
            )
            written.append(path)
        if include_full_text or full_text_only:
            path = os.path.join(output_dir, f"{domain}-llms-full.txt")
            write_llms_full_v1_stream(path, domain, full_pages_iter(), total_pages, generated_on)
            written.append(path)
    else:
        if not full_text_only:
            path = os.path.join(output_dir, f"{domain}-llms.txt")
            name = site_name or kernels.site_name_from_title(base_url, None)
            summary = site_summary or kernels.site_summary_from_samples([])
            if entries_iter_factory is not None:
                write_llms_txt_stream(path, name, summary, entries_iter_factory(), metadata)
            else:
                with open(path, "w", encoding="utf-8") as f:
                    f.write(render_llms_txt_prepared(name, summary, entries, metadata))
            written.append(path)
        if include_full_text or full_text_only:
            path = os.path.join(output_dir, f"{domain}-llms-full.txt")
            write_llms_full_stream(path, base_url, full_pages_iter(), total_pages, metadata)
            written.append(path)
    return written
