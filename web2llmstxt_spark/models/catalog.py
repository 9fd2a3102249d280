"""Model catalog / manager (config plane): the reference's ModelManager
surface re-expressed without hard provider dependencies.

Twin of models/config_types.py:12-28 (ModelConfig dataclass) and
models/client.py:28-287 (ModelManager: Ollama status probe, /api/tags
listing, display-name/RAM heuristics, static Gemini catalog, warm-up).
Nothing here computes on data — it exists so a user of the reference can
point the same configuration workflow at the Spark engine: pick a
ModelConfig, get a transport via ``transport_for``, and hand it to
DescribeClient.as_describe_fn() (models/client.py in this package).

HTTP is stdlib urllib with an injectable ``http`` hook (tests run a
loopback server; no network in CI). RAM probing uses /proc/meminfo when
psutil is absent (the reference requires psutil; same numbers here).
"""

from __future__ import annotations

import json
import os
import urllib.error
import urllib.request
from dataclasses import dataclass, field


@dataclass
class ModelConfig:
    """Model metadata (models/config_types.py:12-28)."""

    provider: str
    model_id: str
    display_name: str
    description: str
    max_tokens: int = 8192
    temperature: float = 0.7
    supports_vision: bool = False
    cost_per_1k_tokens: float = 0.0
    status: str = "unknown"  # online, offline, unknown, available
    tags: list = field(default_factory=list)
    pulls: str = ""
    size_info: str = ""
    is_available_remote: bool = False
    estimated_ram_gb: float = 0.0


#: the reference's static Gemini listing (models/client.py:243-268) —
#: shown for setup guidance even without an API key
GEMINI_CATALOG = (
    ("gemini-1.5-flash", "Gemini 1.5 Flash",
     "Fast and efficient model optimized for speed", 1048576, True),
    ("gemini-1.5-pro", "Gemini 1.5 Pro",
     "Advanced model with enhanced reasoning capabilities", 2097152, True),
    ("gemini-pro", "Gemini Pro",
     "Production-ready model for complex tasks", 32768, False),
)

STATUS_INDICATORS = {  # models/client.py:139-147
    "online": "\U0001f7e2", "offline": "\U0001f534",
    "unknown": "\U0001f7e1", "available": "✅",
}


def build_display_name(model_name: str) -> str:
    """models/client.py:207-221: ':latest' stripped, '-' parts capitalized,
    size tokens (7b, 3.8b) uppercased."""
    clean = model_name.replace(":latest", "").replace("_", " ")
    parts = []
    for part in clean.split("-"):
        if part.replace(".", "").replace("b", "").isdigit():
            parts.append(part.upper())
        else:
            parts.append(part.capitalize())
    return " ".join(parts)


def estimate_ram_gb(model_name: str) -> float:
    """models/client.py:223-237: coarse size-token heuristic."""
    m = model_name.lower()
    if "70b" in m or "72b" in m:
        return 40.0
    if "13b" in m or "14b" in m:
        return 8.0
    if "7b" in m or "8b" in m:
        return 4.0
    if "3b" in m or "1b" in m:
        return 2.0
    return 4.0


def _default_http(url: str, payload: dict | None = None, timeout: float = 10.0):
    """GET (payload None) or JSON POST; returns (status, parsed_json|None)."""
    if payload is None:
        req = urllib.request.Request(url)
    else:
        req = urllib.request.Request(
            url, data=json.dumps(payload).encode("utf-8"),
            headers={"Content-Type": "application/json"}, method="POST",
        )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            body = resp.read()
            try:
                return resp.status, json.loads(body.decode("utf-8"))
            except ValueError:
                return resp.status, None
    except urllib.error.HTTPError as e:
        return e.code, None


def available_ram_gb() -> float | None:
    """psutil.virtual_memory().available twin via /proc/meminfo
    (MemAvailable); None when unreadable."""
    try:
        with open("/proc/meminfo", encoding="ascii") as f:
            for line in f:
                if line.startswith("MemAvailable:"):
                    return int(line.split()[1]) / (1024 * 1024)
    except OSError:
        pass
    return None


class ModelManager:
    """models/client.py:28-287 surface: list/select models, probe Ollama,
    warm up a local model. ``http`` is injectable for tests."""

    def __init__(self, ollama_base_url: str | None = None,
                 gemini_api_key: str | None = None, http=_default_http):
        self.ollama_base_url = (
            ollama_base_url
            or os.environ.get("OLLAMA_BASE_URL", "http://localhost:11434")
        ).rstrip("/")
        self.gemini_api_key = (
            gemini_api_key if gemini_api_key is not None
            else os.environ.get("GEMINI_API_KEY")
        )
        self.http = http
        self.available_models: dict[str, ModelConfig] = {}
        self.current_model: ModelConfig | None = None

    # ------------------------------------------------------------ probes
    def check_ollama_status(self) -> bool:
        """GET /api/version == 200 (models/client.py:94-100)."""
        try:
            status, _ = self.http(f"{self.ollama_base_url}/api/version")
            return status == 200
        except Exception:
            return False

    def warm_up_model(self, model_id: str) -> bool:
        """The reference's warm-up ping (models/client.py:102-137): a tiny
        /api/generate call so the first real batch doesn't pay model load."""
        if not self.check_ollama_status():
            return False
        try:
            status, _ = self.http(
                f"{self.ollama_base_url}/api/generate",
                {
                    "model": model_id,
                    "prompt": "Hello, respond with just 'Ready'",
                    "stream": False,
                    "options": {"temperature": 0.1, "num_predict": 10},
                },
                60.0,
            )
            return status == 200
        except Exception:
            return False

    # ----------------------------------------------------------- catalog
    def list_models(self) -> dict[str, ModelConfig]:
        """Ollama /api/tags listing + static Gemini catalog
        (models/client.py:159-287)."""
        models: dict[str, ModelConfig] = {}
        models.update(self._list_ollama_models())
        models.update(self._list_gemini_models())
        self.available_models = models
        return models

    def _list_ollama_models(self) -> dict[str, ModelConfig]:
        if not self.check_ollama_status():
            return {}
        try:
            status, data = self.http(f"{self.ollama_base_url}/api/tags")
        except Exception:
            return {}
        if status != 200 or not data:
            return {}
        out = {}
        for info in data.get("models", []):
            name = info["name"]
            out[f"ollama_{name}"] = ModelConfig(
                provider="ollama",
                model_id=name,
                display_name=build_display_name(name),
                description=f"Local Ollama model - {name}",
                max_tokens=8192,
                temperature=0.7,
                status="available",
                estimated_ram_gb=estimate_ram_gb(name),
            )
        return out

    def _list_gemini_models(self) -> dict[str, ModelConfig]:
        out = {}
        for mid, name, desc, max_tokens, vision in GEMINI_CATALOG:
            out[f"gemini_{mid}"] = ModelConfig(
                provider="gemini",
                model_id=mid,
                display_name=name,
                description=desc,
                max_tokens=max_tokens,
                temperature=0.7,
                supports_vision=vision,
                status="available" if self.gemini_api_key else "offline",
            )
        return out

    def set_model(self, config: ModelConfig) -> None:
        self.current_model = config

    # --------------------------------------------------------- transport
    def transport_for(self, config: ModelConfig | None = None):
        """Bridge a catalog entry to the DescribeClient seam: returns a
        picklable ``fn(prompt) -> str | None``. Ollama -> OllamaTransport
        (real, stdlib); Gemini needs google-generativeai (absent here) —
        raises with the exact recipe rather than shipping a fake."""
        config = config or self.current_model
        if config is None:
            raise ValueError("no model selected (call set_model or pass one)")
        if config.provider == "ollama":
            from .client import OllamaTransport

            return OllamaTransport(
                self.ollama_base_url, config.model_id,
                temperature=config.temperature,
            )
        if config.provider == "gemini":
            raise NotImplementedError(
                "Gemini transport needs google-generativeai (not installed): "
                "genai.configure(api_key=...); GenerativeModel(model_id)"
                ".generate_content(prompt, generation_config=GenerationConfig("
                "temperature=..., max_output_tokens=...)).text — wrap that as "
                "fn(prompt)->str and pass it to DescribeClient."
            )
        raise ValueError(f"unsupported provider: {config.provider!r}")
