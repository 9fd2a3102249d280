"""Reference-shaped AI describe client (D5): prompt -> generate -> verify
-> fallback, as an injectable seam for the Spark describe UDF.

The shipped v2 pipeline bypasses AI and uses the deterministic fallback
(llmsgen/generator/llms_generator.py:270 (pyc)) — that stays the engine
default, so CORRECTNESS is unaffected. This module supplies what was
missing for a user with a real endpoint: the exact prompt bytes, response
cleanup, hallucination-check -> fallback chain, and retry policy of the
reference's AI path (generator/llms_generator.py:510-570), packaged as a
picklable client whose ``as_describe_fn()`` plugs straight into
``udfs.make_describe_udf`` — so on the cluster it runs Arrow-batched inside
executors, and the T4 cache anti-join (state/desc_cache.py) guarantees only
cache misses ever reach the endpoint.

Kernels here mirror the GENERATOR-path text utilities
(utils/text_utils.py:11-139; generator/llms_generator.py:351-392,464-491,
572-601), which differ in detail from the llmsgen-path kernels already in
functions/kernels.py (D1/D6) — both families exist in the reference; each
is cited at its twin.

Transport: ``OllamaTransport`` renders the reference's exact request shape
(models/client.py:344-366: POST {base}/api/generate with model/prompt/
stream=False/options.temperature/num_predict) over stdlib urllib; any
``fn(prompt) -> str | None`` works — tests inject fakes and a loopback
HTTP server.
"""

from __future__ import annotations

import json
import re
import time
from collections.abc import Callable

from ..functions import kernels

# --------------------------------------------------- generator-path kernels

#: generator/llms_generator.py:528-543 — the exact prompt bytes; the only
#: variables are the cleaned title and the first 800 chars of key content.
PROMPT_TEMPLATE = """Create a concise, informative description for this webpage. The description should be 1-2 sentences and capture the main purpose/content.

Title: {title}

Key Content: {key_content}

Instructions:
- Be specific and factual
- Avoid generic phrases like "this page contains" or "this website provides"
- Focus on what makes this page unique or valuable
- Keep it under 150 characters if possible
- Don't hallucinate information not present in the content

Description:"""

_TITLE_SUFFIX_RES = [  # generator/llms_generator.py:470-477, applied in order
    r"\s*\|\s*.*$",
    r"\s*-\s*.*$",
    r"\s*::\s*.*$",
    r"\s*»\s*.*$",
    r"\s*>\s*.*$",
]


def clean_title_ai(title: str) -> str:
    """Generator-path title cleaner (generator/llms_generator.py:464-491):
    first suffix strip that leaves >= 5 chars wins; entities unescaped."""
    if not title:
        return "Untitled Page"
    for pat in _TITLE_SUFFIX_RES:
        new_title = re.sub(pat, "", title).strip()
        if len(new_title) >= 5:
            title = new_title
            break
    title = re.sub(r"\s+", " ", title).strip()
    for ent, ch in (("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"')):
        title = title.replace(ent, ch)
    return title or "Untitled Page"


def clean_text_ai(text: str) -> str:
    """Generator-path content cleaner (utils/text_utils.py:11-33)."""
    if not text:
        return ""
    text = re.sub(r"\s+", " ", text)
    text = "".join(c for c in text if ord(c) >= 32 or c in "\n\t")
    text = re.sub(r"\n\s*\n\s*\n+", "\n\n", text)
    for ent, ch in (
        ("&nbsp;", " "), ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", '"'), ("&apos;", "'"),
    ):
        text = text.replace(ent, ch)
    return text.strip()


_NAV_INDICATORS = (  # utils/text_utils.py:122-131
    "menu", "navigation", "nav", "breadcrumb", "sidebar",
    "footer", "header", "skip to", "toggle", "dropdown",
    "click here", "read more", "learn more", "see all",
    "view all", "show more", "load more", "back to top",
    "home", "contact", "about us", "privacy policy",
    "terms of service", "cookie policy",
)

_INFORMATIVE = (  # utils/text_utils.py:109-113
    "explain", "describe", "overview", "introduction", "guide", "tutorial",
    "learn", "understand", "concept", "principle", "method", "approach",
    "technique", "strategy", "solution", "benefit", "advantage", "feature",
)


def _is_navigation_text(text: str) -> bool:
    t = text.lower().strip()
    if len(t) < 5:
        return True
    if len(t) < 50:
        return any(ind in t for ind in _NAV_INDICATORS)
    return False


def _is_good_sentence(sentence: str, title_words: set) -> bool:
    """utils/text_utils.py:74-119."""
    sentence = sentence.strip()
    if len(sentence) < 20 or len(sentence) > 300:
        return False
    if _is_navigation_text(sentence):
        return False
    if len([w for w in sentence.split() if len(w) > 3]) < 3:
        return False
    if "http" in sentence or "www" in sentence:
        return False
    special = sum(1 for c in sentence if not c.isalnum() and c not in " .,!?-")
    if special / len(sentence) > 0.2:
        return False
    sentence_words = set(sentence.lower().split())
    if len(title_words & sentence_words) / max(len(title_words), 1) > 0.3:
        return True
    s = sentence.lower()
    return any(ind in s for ind in _INFORMATIVE)


def extract_key_sentences_ai(title: str, content: str, max_sentences: int = 3) -> str:
    """Generator-path key-sentence extraction (utils/text_utils.py:36-71)."""
    if not content:
        return ""
    cleaned = clean_text_ai(content)
    sentences = [s.strip() for s in re.split(r"[.!?]+", cleaned) if s.strip()]
    if not sentences:
        return ""
    title_words = set(title.lower().split()) if title else set()
    good = []
    for s in sentences:
        if _is_good_sentence(s, title_words):
            good.append(s)
        if len(good) >= max_sentences:
            break
    if not good:
        good = sentences[:max_sentences]
    result = ". ".join(good)
    if result and not result.endswith("."):
        result += "."
    return result


_GENERIC_PHRASES = (  # generator/llms_generator.py:357-364
    "this page contains",
    "this website provides",
    "this article discusses",
    "the main content includes",
    "key topics covered",
    "important information about",
)


def detect_hallucination_ai(description: str, title: str, content: str) -> bool:
    """Generator-path hallucination check (generator/llms_generator.py:
    351-392): too-short, generic-phrase-with-no-overlap, or word-repetition
    patterns flag the output. (The llmsgen-path D6 twin with its indicator
    list lives at kernels.detect_hallucination.)"""
    if not description or len(description.strip()) < 10:
        return True
    dl = description.lower()
    if any(p in dl for p in _GENERIC_PHRASES):
        title_words = set(title.lower().split())
        content_words = set(content.lower()[:500].split())
        desc_words = set(dl.split())
        t_ov = len(title_words & desc_words) / max(len(title_words), 1)
        c_ov = len(content_words & desc_words) / max(len(content_words), 1)
        if t_ov < 0.2 and c_ov < 0.1:
            return True
    words = description.split()
    if len(words) > 10:
        freq: dict[str, int] = {}
        for w in words:
            freq[w] = freq.get(w, 0) + 1
        if max(freq.values()) > 3 and len(words) < 50:
            return True
    return False


def smart_fallback_ai(title: str, content: str, url: str) -> str:
    """Generator-path fallback description (generator/llms_generator.py:
    572-601): content-type templates, else key sentences, else a domain
    line. (The llmsgen-path shipped default is
    kernels.create_smart_fallback_description.)"""
    try:
        domain = kernels.extract_domain_from_url(url)
    except Exception:
        domain = "website"
    cl = content.lower()
    if any(w in cl for w in ("tutorial", "guide", "how to", "step by step")):
        return f"Tutorial or guide on {title.lower()}"
    if any(w in cl for w in ("blog", "article", "post", "news")):
        return f"Article about {title.lower()}"
    if any(w in cl for w in ("product", "service", "pricing", "buy", "purchase")):
        return f"Product or service page for {title.lower()}"
    if any(w in cl for w in ("about", "company", "team", "history")):
        return f"Information about {domain}"
    if any(w in cl for w in ("contact", "email", "phone", "address")):
        return f"Contact information for {domain}"
    key = extract_key_sentences_ai(title, content)
    if key and len(key) > 20:
        return key[:120] + "..." if len(key) > 120 else key
    return f"Page about {title.lower()} on {domain}"


def content_description_ai(title: str, content: str) -> str:
    """No-client description (generator/llms_generator.py:493-510)."""
    cc = clean_text_ai(content)
    key = extract_key_sentences_ai(title, cc)
    if not key:
        return f"Page about {title.lower()}"
    if len(key) > 200:
        key = ". ".join(key.split(". ")[:2]) + "."
    return key


def build_describe_prompt(title: str, content: str) -> str:
    """The exact prompt the reference sends (generator/llms_generator.py:
    524-543): cleaned title + first 800 chars of extracted key content."""
    ct = clean_title_ai(title)
    cc = clean_text_ai(content)
    key_content = extract_key_sentences_ai(ct, cc)
    return PROMPT_TEMPLATE.format(title=ct, key_content=key_content[:800])


# ------------------------------------------------------------------ client

class DescribeClient:
    """generate_description_with_fallbacks as a picklable object
    (generator/llms_generator.py:510-570): prompt -> transport -> strip ->
    quote-strip -> hallucination check -> smart fallback; transport failure
    or empty output falls back deterministically, so the chain NEVER errors
    a batch.

    ``transport``: any picklable ``fn(prompt) -> str | None`` (None = the
    provider answered empty — not retried, per the reference's
    ``if description:`` gate). Raised exceptions ARE retried with the
    reference's tenacity policy (3 attempts, exponential wait clamped to
    [4, 10] s — wait_exponential(multiplier=1, min=4, max=10)); ``sleep``
    defaults to real ``time.sleep`` so the documented wait actually
    happens in production; tests inject a recorder or ``None`` (no wait).
    ``transport=None`` reproduces the no-client path
    (_create_content_description).
    """

    def __init__(
        self,
        transport: Callable[[str], str | None] | None,
        attempts: int = 3,
        wait_multiplier: float = 1.0,
        wait_min: float = 4.0,
        wait_max: float = 10.0,
        sleep: Callable[[float], None] | None = time.sleep,
    ):
        self.transport = transport
        self.attempts = attempts
        self.wait_multiplier = wait_multiplier
        self.wait_min = wait_min
        self.wait_max = wait_max
        self.sleep = sleep

    def _generate(self, prompt: str) -> str | None:
        for attempt in range(1, self.attempts + 1):
            if attempt > 1 and self.sleep is not None:
                wait = self.wait_multiplier * (2 ** (attempt - 2))
                self.sleep(min(max(wait, self.wait_min), self.wait_max))
            try:
                return self.transport(prompt)
            except Exception:
                if attempt == self.attempts:
                    return None
        return None

    def describe(self, title: str, content: str, url: str = "") -> str:
        if self.transport is None:
            return content_description_ai(title, content)
        ct = clean_title_ai(title)
        cc = clean_text_ai(content)
        key_content = extract_key_sentences_ai(ct, cc)
        prompt = PROMPT_TEMPLATE.format(title=ct, key_content=key_content[:800])
        description = self._generate(prompt)
        if description:
            description = description.strip()
            if description.startswith('"') and description.endswith('"'):
                description = description[1:-1]
            if detect_hallucination_ai(description, ct, cc):
                return smart_fallback_ai(ct, cc, url)
            return description
        return smart_fallback_ai(ct, cc, url)

    def as_describe_fn(self):
        """The ``describe_fn`` seam for ``udfs.make_describe_udf`` /
        ``desc_cache.describe_with_cache``: a batch callable run inside
        executors on Arrow batches; compose the T4 cache upstream so only
        misses reach the transport."""
        client = self

        def describe_batch(titles, contents, urls):
            import pandas as pd

            return pd.Series(
                [
                    client.describe(t or "", c or "", u or "")
                    for t, c, u in zip(titles, contents, urls)
                ]
            )

        return describe_batch


class OllamaTransport:
    """The reference's Ollama request, stdlib-urllib only
    (models/client.py:344-366): POST {base_url}/api/generate with
    {model, prompt, stream: False, options: {temperature, num_predict}};
    200 -> json['response'].strip(), other statuses -> None (the client
    falls back), transport errors raise (the client retries). Picklable —
    safe to close over in the executor-side UDF."""

    def __init__(
        self,
        base_url: str = "http://localhost:11434",
        model_id: str = "llama3.2:3b",
        temperature: float = 0.7,
        num_predict: int = 1024,
        timeout: float = 180.0,
    ):
        self.base_url = base_url.rstrip("/")
        self.model_id = model_id
        self.temperature = temperature
        self.num_predict = num_predict
        self.timeout = timeout

    def payload(self, prompt: str) -> dict:
        return {
            "model": self.model_id,
            "prompt": prompt,
            "stream": False,
            "options": {
                "temperature": self.temperature,
                "num_predict": self.num_predict,
            },
        }

    def __call__(self, prompt: str) -> str | None:
        import urllib.error
        import urllib.request

        req = urllib.request.Request(
            f"{self.base_url}/api/generate",
            data=json.dumps(self.payload(prompt)).encode("utf-8"),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                if resp.status != 200:
                    return None
                body = json.loads(resp.read().decode("utf-8"))
                return (body.get("response") or "").strip()
        except urllib.error.HTTPError:
            return None
