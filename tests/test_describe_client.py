"""D5 AI describe client (models/client.py): exact prompt bytes, response
cleanup chain, hallucination fallback, retry policy, Ollama wire shape, and
the cache-hit short circuit through the Spark describe seam."""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from web2llmstxt_spark.models.client import (
    DescribeClient,
    OllamaTransport,
    build_describe_prompt,
    clean_text_ai,
    clean_title_ai,
    content_description_ai,
    detect_hallucination_ai,
    extract_key_sentences_ai,
    smart_fallback_ai,
)

TITLE = "Widget Guide | Example Corp"
CONTENT = (
    "This guide explains how the widget assembly method works in practice. "
    "The approach uses a principle of layered design to describe each "
    "concept step by step. Navigation menu footer. Overview of the "
    "technique and strategy behind every feature follows below."
)


def test_prompt_bytes_exact():
    # the cleaned title drops the '| Example Corp' suffix; key content is
    # the extracted sentences capped at 800 chars; template bytes pinned
    ct = clean_title_ai(TITLE)
    key = extract_key_sentences_ai(ct, clean_text_ai(CONTENT))[:800]
    want = f"""Create a concise, informative description for this webpage. The description should be 1-2 sentences and capture the main purpose/content.

Title: {ct}

Key Content: {key}

Instructions:
- Be specific and factual
- Avoid generic phrases like "this page contains" or "this website provides"
- Focus on what makes this page unique or valuable
- Keep it under 150 characters if possible
- Don't hallucinate information not present in the content

Description:"""
    assert build_describe_prompt(TITLE, CONTENT) == want
    assert ct == "Widget Guide"


def test_clean_title_ai_keeps_short_results_unstripped():
    # a strip that would leave < 5 chars is rejected (ref :479-481)
    assert clean_title_ai("Ab | Very Long Suffix Here") == "Ab | Very Long Suffix Here"
    assert clean_title_ai("") == "Untitled Page"
    assert clean_title_ai("X &amp; Y docs") == "X & Y docs"


def test_success_path_strips_quotes_and_returns_model_output():
    seen = []

    def transport(prompt):
        seen.append(prompt)
        return '"A precise widget assembly guide covering the layered design method."'

    c = DescribeClient(transport)
    out = c.describe(TITLE, CONTENT, "https://ex.example/widgets")
    assert out == "A precise widget assembly guide covering the layered design method."
    assert seen == [build_describe_prompt(TITLE, CONTENT)]


def test_hallucination_routes_to_smart_fallback():
    # generic phrase + zero overlap with title/content -> flagged (ref :351-392)
    bad = "This page contains zzz qqq rrr vvv kkk mmm nnn"
    c = DescribeClient(lambda p: bad)
    out = c.describe(TITLE, CONTENT, "https://ex.example/widgets")
    ct, cc = clean_title_ai(TITLE), clean_text_ai(CONTENT)
    assert detect_hallucination_ai(bad, ct, cc)
    assert out == smart_fallback_ai(ct, cc, "https://ex.example/widgets")
    # the content mentions 'guide' -> the tutorial template fires
    assert out == "Tutorial or guide on widget guide"


def test_repetition_pattern_is_hallucination():
    assert detect_hallucination_ai(
        "spam spam spam spam is what what what this is really about here", "t", "c"
    )
    assert not detect_hallucination_ai(
        "A precise widget assembly guide covering the layered design method.",
        clean_title_ai(TITLE), clean_text_ai(CONTENT),
    )


def test_transport_exceptions_retried_then_fallback():
    calls, waits = [], []

    def flaky(prompt):
        calls.append(1)
        raise ConnectionError("down")

    c = DescribeClient(flaky, sleep=waits.append)
    out = c.describe(TITLE, CONTENT, "https://ex.example/widgets")
    assert len(calls) == 3  # tenacity stop_after_attempt(3)
    assert waits == [4.0, 4.0]  # wait_exponential(1, min=4, max=10) clamps
    assert out == smart_fallback_ai(
        clean_title_ai(TITLE), clean_text_ai(CONTENT), "https://ex.example/widgets"
    )


def test_empty_response_not_retried():
    calls = []

    def empty(prompt):
        calls.append(1)
        return None

    c = DescribeClient(empty)
    c.describe(TITLE, CONTENT)
    assert len(calls) == 1  # ref gates on `if description:` — no retry


def test_no_transport_gives_content_description():
    c = DescribeClient(None)
    assert c.describe(TITLE, CONTENT) == content_description_ai(TITLE, CONTENT)


class _OllamaHandler(BaseHTTPRequestHandler):
    received = []

    def do_POST(self):  # noqa: N802
        n = int(self.headers["Content-Length"])
        body = json.loads(self.rfile.read(n))
        _OllamaHandler.received.append((self.path, body))
        resp = json.dumps({"response": "  Echo: " + body["prompt"][:20] + "  "}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(resp)))
        self.end_headers()
        self.wfile.write(resp)

    def log_message(self, *a):
        pass


def test_ollama_transport_wire_shape_loopback():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _OllamaHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        tr = OllamaTransport(base, model_id="llama3.2:3b", temperature=0.5)
        out = tr("PROMPT BYTES HERE xx")
        assert out == "Echo: PROMPT BYTES HERE xx"  # stripped
        path, body = _OllamaHandler.received[-1]
        assert path == "/api/generate"
        assert body == {
            "model": "llama3.2:3b",
            "prompt": "PROMPT BYTES HERE xx",
            "stream": False,
            "options": {"temperature": 0.5, "num_predict": 1024},
        }
    finally:
        srv.shutdown()
        srv.server_close()


def test_cache_hit_short_circuits_transport(spark, tmp_path):
    """Warm T4 cache + DescribeClient seam: the transport sees ONLY misses;
    a fully warm second run reaches it zero times."""
    from pyspark.sql import functions as F

    from web2llmstxt_spark.state.desc_cache import DescriptionCache, describe_with_cache

    rows = [
        ("https://a.example/1", "One guide", "A guide explains the method used. " * 5, 20, 1),
        ("https://a.example/2", "Two blog", "A blog article post about news. " * 5, 20, 2),
    ]
    pages = spark.createDataFrame(
        rows, "url string, title string, content string, word_count int, rank long"
    )
    hits = spark.sparkContext.accumulator(0)

    def counting_transport(prompt):
        hits.add(1)
        return "A specific widget guide describing the layered method concept."

    client = DescribeClient(counting_transport)
    cache = DescriptionCache(spark, str(tmp_path / "cache"))
    entries1, new1 = describe_with_cache(pages, cache.load(), client.as_describe_fn())
    cache.merge_and_save(new1)
    first = {r.url: r.description for r in entries1.collect()}
    n_first = hits.value
    assert n_first >= 2  # both rows were misses
    entries2, new2 = describe_with_cache(pages, cache.load(), client.as_describe_fn())
    second = {r.url: r.description for r in entries2.collect()}
    assert new2.count() == 0
    assert second == first
    assert hits.value == n_first  # zero transport calls on the warm run
