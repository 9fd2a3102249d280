"""Model catalog (models/catalog.py) + interactive menu flow
(interactive.py): reference-shaped config plane, no Spark needed."""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from web2llmstxt_spark import interactive
from web2llmstxt_spark.models.catalog import (
    ModelConfig,
    ModelManager,
    build_display_name,
    estimate_ram_gb,
)


def test_display_name_and_ram_heuristics():
    # models/client.py:207-237 semantics
    assert build_display_name("llama3.2:latest") == "Llama3.2"
    assert build_display_name("qwen2.5-coder-7b") == "Qwen2.5 Coder 7B"
    assert estimate_ram_gb("llama-70b") == 40.0
    assert estimate_ram_gb("x-13b") == 8.0
    assert estimate_ram_gb("y-7b") == 4.0
    assert estimate_ram_gb("z-3b") == 2.0
    assert estimate_ram_gb("mystery") == 4.0


class _OllamaCatalogHandler(BaseHTTPRequestHandler):
    generate_calls = []

    def _json(self, obj, status=200):
        body = json.dumps(obj).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802
        if self.path == "/api/version":
            self._json({"version": "0.5.0"})
        elif self.path == "/api/tags":
            self._json({"models": [
                {"name": "llama3.2:3b"}, {"name": "qwen2.5-coder-7b"},
            ]})
        else:
            self._json({}, 404)

    def do_POST(self):  # noqa: N802
        n = int(self.headers["Content-Length"])
        _OllamaCatalogHandler.generate_calls.append(
            (self.path, json.loads(self.rfile.read(n)))
        )
        self._json({"response": "Ready"})

    def log_message(self, *a):
        pass


@pytest.fixture()
def ollama_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _OllamaCatalogHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()
    srv.server_close()


def test_list_models_merges_ollama_and_gemini(ollama_server):
    m = ModelManager(ollama_base_url=ollama_server, gemini_api_key=None)
    assert m.check_ollama_status()
    models = m.list_models()
    assert set(models) == {
        "ollama_llama3.2:3b", "ollama_qwen2.5-coder-7b",
        "gemini_gemini-1.5-flash", "gemini_gemini-1.5-pro", "gemini_gemini-pro",
    }
    o = models["ollama_llama3.2:3b"]
    assert o.status == "available" and o.estimated_ram_gb == 2.0
    assert o.display_name == "Llama3.2:3b"  # reference splits on "-" only
    # no API key -> gemini rows listed but offline (setup guidance)
    assert models["gemini_gemini-pro"].status == "offline"
    # with a key they flip to available
    m2 = ModelManager(ollama_base_url=ollama_server, gemini_api_key="k")
    assert m2.list_models()["gemini_gemini-pro"].status == "available"


def test_warm_up_sends_reference_ping(ollama_server):
    m = ModelManager(ollama_base_url=ollama_server)
    assert m.warm_up_model("llama3.2:3b")
    path, body = _OllamaCatalogHandler.generate_calls[-1]
    assert path == "/api/generate"
    assert body == {
        "model": "llama3.2:3b",
        "prompt": "Hello, respond with just 'Ready'",
        "stream": False,
        "options": {"temperature": 0.1, "num_predict": 10},
    }


def test_ollama_down_lists_only_gemini():
    m = ModelManager(ollama_base_url="http://127.0.0.1:1",  # closed port
                     gemini_api_key=None)
    assert not m.check_ollama_status()
    assert all(k.startswith("gemini_") for k in m.list_models())


def test_transport_for_bridges_to_describe_client(ollama_server):
    from web2llmstxt_spark.models.client import OllamaTransport

    m = ModelManager(ollama_base_url=ollama_server)
    cfg = m.list_models()["ollama_llama3.2:3b"]
    t = m.transport_for(cfg)
    assert isinstance(t, OllamaTransport)
    assert t.model_id == "llama3.2:3b" and t.base_url == ollama_server
    with pytest.raises(NotImplementedError, match="google-generativeai"):
        m.transport_for(ModelConfig("gemini", "gemini-pro", "G", ""))
    with pytest.raises(ValueError):
        ModelManager(ollama_base_url=ollama_server).transport_for(None)


# ------------------------------------------------------------- interactive

def _scripted(*answers):
    it = iter(answers)

    def input_fn(prompt=""):
        return next(it)

    return input_fn


def test_prompt_url_prepends_scheme_and_rejects_empty():
    out = []
    url = interactive.prompt_url(_scripted("", "ex.example"), out.append)
    assert url == "https://ex.example"
    assert any("valid URL" in line for line in out)


def test_mode_menu_reference_semantics():
    out = []
    # 1 -> normal
    assert interactive.prompt_crawl_mode(_scripted("1"), out.append) == (
        "normal", False, None)
    # 2 declined returns to menu, then 3 with explicit sitemap URL
    mode, comp, sm = interactive.prompt_crawl_mode(
        _scripted("2", "n", "3", "https://s.example/sm.xml"), out.append)
    assert (mode, comp, sm) == ("sitemap", False, "https://s.example/sm.xml")
    # 2 confirmed -> comprehensive
    assert interactive.prompt_crawl_mode(_scripted("2", "yes"), out.append) == (
        "comprehensive", True, None)
    # invalid then 1
    assert interactive.prompt_crawl_mode(_scripted("9", "1"), out.append) == (
        "normal", False, None)


def test_model_menu_zero_is_fallback_and_pick_sets_current(ollama_server):
    m = ModelManager(ollama_base_url=ollama_server, gemini_api_key=None)
    out = []
    assert interactive.prompt_model(m, _scripted("0"), out.append) is None
    cfg = interactive.prompt_model(m, _scripted("bogus", "1"), out.append)
    assert cfg is not None and cfg.provider == "ollama"
    assert m.current_model is cfg
    listing = "\n".join(out)
    assert "Deterministic fallback" in listing and "Setup Required" in listing


def test_interactive_main_full_flow_routes_to_run_fn(ollama_server):
    m = ModelManager(ollama_base_url=ollama_server)
    captured = {}

    def run_fn(**kw):
        captured.update(kw)
        return {"ok": True}

    res = interactive.interactive_main(
        input_fn=_scripted("ex.example", "2", "y", "1"),
        print_fn=lambda *a: None,
        run_fn=run_fn,
        manager=m,
    )
    assert res == {"ok": True}
    assert captured["seed"] == "https://ex.example"
    assert captured["crawl_strategy"] == "systematic"
    assert captured["comprehensive"] is True
    assert captured["describe_fn"] is not None  # model 1 selected -> client seam
    # warm-up ping went to the server for the selected model
    assert _OllamaCatalogHandler.generate_calls[-1][1]["prompt"].startswith("Hello")
