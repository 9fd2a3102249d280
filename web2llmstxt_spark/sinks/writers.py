"""Output sinks: llms.txt / llms-full.txt / JSON / YAML (v2 spec format).

Reference: ``llmsgen/utils/file_utils.py:94-222`` (write_text_output /
write_json_output / write_yaml_output / write_output_files), golden example
``/root/reference/output/example.com-llms.txt``. The final artifacts are
driver-side text files bounded by the crawl budget, so assembly happens on
collected entry/page lists (the heavy lifting — describe/categorize — ran
distributed in plans/distill.py).
"""

from __future__ import annotations

import json
import os

from ..functions import kernels

try:  # pyyaml is optional in the sandbox
    import yaml

    _HAS_YAML = True
except ImportError:  # pragma: no cover
    _HAS_YAML = False


def render_llms_txt(base_url: str, entries: list[dict], pages: list[dict], metadata: dict) -> str:
    """The llms.txt spec document. Ref: llmsgen/utils/file_utils.py:107-136.

    ``entries`` must carry ``category`` (plans/distill.categorize_entries) and
    arrive in crawl order; sections appear in the reference's dict insertion
    order (kernels.CATEGORY_ORDER), entries in order within each.
    """
    out = []
    site_name = kernels.extract_site_name(base_url, pages)
    out.append(f"# {site_name}\n")
    out.append(f"> {kernels.generate_site_summary(pages)}\n")
    total = metadata.get("total_pages_crawled", len(pages))
    generated_date = metadata.get("generated_at", "").split("T")[0]
    out.append(f"Generated from {total} pages on {generated_date} using automated crawling.\n")

    content_map = {p.get("url"): p.get("content", "") for p in pages}
    by_cat: dict[str, list[dict]] = {}
    for e in entries:
        by_cat.setdefault(e["category"], []).append(e)
    for category in kernels.CATEGORY_ORDER:
        if category not in by_cat:
            continue
        out.append(f"## {category}\n")
        lines = []
        for e in by_cat[category]:
            desc = e.get("description", "N/A")
            if desc == "N/A (full_text_only mode)" or not desc:
                page_content = content_map.get(e.get("url", ""), "")
                desc = (
                    " ".join(page_content.split()[:30]) + "..."
                    if page_content
                    else "No content available."
                )
            lines.append(f"- [{e.get('title', 'Untitled')}]({e.get('url', '#')}): {desc}")
        out.append("\n".join(lines) + "\n")
    return "\n".join(out)


def render_llms_full_txt(base_url: str, pages: list[dict], metadata: dict) -> str:
    """Ref: llmsgen/utils/file_utils.py:139-160."""
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


def write_output_files(
    output_dir: str,
    base_url: str,
    entries: list[dict],
    pages: list[dict],
    metadata: dict,
    export_format: str = "text",
    include_full_text: bool = False,
    full_text_only: bool = False,
) -> list[str]:
    """Dispatch on format (ref llmsgen/utils/file_utils.py:204-222); returns
    written paths."""
    os.makedirs(output_dir, exist_ok=True)
    domain = kernels.extract_domain_from_url(base_url)
    written = []
    fmt = export_format.lower()
    if fmt == "json":
        data = {"metadata": metadata, "llms_entries": entries}
        if include_full_text:
            data["full_content_pages"] = pages
        path = os.path.join(output_dir, f"{domain}-llms.json")
        with open(path, "w", encoding="utf-8") as f:
            json.dump(data, f, indent=2, ensure_ascii=False)
        written.append(path)
    elif fmt == "yaml":
        if not _HAS_YAML:
            raise NotImplementedError("pyyaml not available in this environment")
        data = {"metadata": metadata, "llms_entries": entries}
        if include_full_text:
            data["full_content_pages"] = pages
        path = os.path.join(output_dir, f"{domain}-llms.yaml")
        with open(path, "w", encoding="utf-8") as f:
            yaml.dump(data, f, default_flow_style=False, allow_unicode=True, indent=2)
        written.append(path)
    else:
        if not full_text_only:
            path = os.path.join(output_dir, f"{domain}-llms.txt")
            with open(path, "w", encoding="utf-8") as f:
                f.write(render_llms_txt(base_url, entries, pages, metadata))
            written.append(path)
        if include_full_text or full_text_only:
            path = os.path.join(output_dir, f"{domain}-llms-full.txt")
            with open(path, "w", encoding="utf-8") as f:
                f.write(render_llms_full_txt(base_url, pages, metadata))
            written.append(path)
    return written
