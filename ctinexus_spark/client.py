"""Production ModelClient: HTTP chat-completion adapter.

Rebuilds the reference's litellm production path behind the same
batch interface the Arrow UDFs call (StubModel-compatible):

- provider-specific request shaping — anthropic keeps the full
  user/assistant message list + JSON response format; gemini gets a
  "gemini/" model prefix, temperature 0.8 and JSON format; meta gets
  temperature 0.8 / top_p 0.9 and NO response format; ollama reads
  OLLAMA_BASE_URL and appends a strict-JSON instruction; everything
  else gets temperature 0.8 + JSON format
  (reference: ctinexus/llm_processor.py:1018-1094)
- 5-attempt retry around every request
  (llm_processor.py:140-160 → ctinexus_spark/retry.py)
- bounded concurrency: each batch fans out over a thread pool capped
  at max_concurrency — one executor slot never opens more than that
  many simultaneous connections
- 3-format usage accounting accumulated per call
  (llm_processor.py:1214-1272 → ctinexus_spark/metrics.py)

The transport is injectable (callable: request-dict → response-dict in
the OpenAI chat/embeddings wire shape), so the full adapter is tested
network-free with a fake transport; the default transport POSTs
JSON over urllib to {api_base}/chat/completions | /embeddings with a
Bearer token from api_key_env.

Executor-shipping note: the client is constructed driver-side and
captured by UDF closures; sockets/pools are NOT picklable, so the
thread pool and any live transport state are created lazily per
process (__getstate__ drops them).
"""

from __future__ import annotations

import json
import os
import urllib.request
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from ctinexus_spark.metrics import calculate_usage
from ctinexus_spark.prompts import build_et_prompt, build_ie_prompt, build_link_prompt
from ctinexus_spark.retry import with_retry

MAX_TOKENS = 4096  # reference LLMCaller.max_tokens (llm_processor.py:1022)


def urllib_transport(api_base: str, api_key_env: str = "MODEL_API_KEY", timeout: float = 120.0):
    """Default transport: POST the request payload as JSON to
    {api_base}{endpoint}; returns the parsed JSON response."""

    def send(payload: dict) -> dict:
        endpoint = payload.pop("_endpoint", "/chat/completions")
        req = urllib.request.Request(
            api_base.rstrip("/") + endpoint,
            data=json.dumps(payload).encode("utf-8"),
            headers={
                "Content-Type": "application/json",
                "Authorization": f"Bearer {os.environ.get(api_key_env, '')}",
            },
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return json.loads(resp.read().decode("utf-8"))

    # pickling marker: __getstate__ drops ONLY this default transport
    # (rebuildable from api_base); user-injected callables ship intact
    send._is_default_transport = True
    return send


class HttpModelClient:
    """Batched, retried, concurrency-bounded chat-completion client
    implementing the ModelClient interface (extract/tag/embed/link)."""

    def __init__(
        self,
        model: str,
        provider: str = "openai",
        transport=None,
        api_base: str = "http://localhost:8000/v1",
        api_key_env: str = "MODEL_API_KEY",
        max_concurrency: int = 8,
        max_attempts: int = 5,
        embedding_model: str | None = None,
        embedding_dim: int = 64,
        lp_relation: str = "related-to",
    ):
        self.model = model
        self.provider = provider.lower()
        self.api_base = api_base
        self.api_key_env = api_key_env
        self.max_concurrency = max_concurrency
        self.max_attempts = max_attempts
        self.embedding_model = embedding_model or model
        self.embedding_dim = embedding_dim
        self.lp_relation = lp_relation
        self._transport = transport
        self._pool = None
        self._usage_lock = None
        self.usage_totals = {
            "input": {"tokens": 0, "cost": 0.0},
            "output": {"tokens": 0, "cost": 0.0},
            "total": {"tokens": 0, "cost": 0.0},
        }

    # --- pickling: drop live resources; recreate lazily per process ---

    def __getstate__(self):
        state = dict(self.__dict__)
        state["_pool"] = None
        state["_usage_lock"] = None
        if getattr(state["_transport"], "_is_default_transport", False):
            state["_transport"] = None  # default transport: rebuild from api_base
        return state

    def _get_transport(self):
        if self._transport is None:
            self._transport = urllib_transport(self.api_base, self.api_key_env)
        return self._transport

    def _get_pool(self) -> ThreadPoolExecutor:
        if self._pool is None:
            self._pool = ThreadPoolExecutor(max_workers=self.max_concurrency)
        return self._pool

    # --- request shaping (llm_processor.py:1029-1086) ---

    def _chat_payload(self, messages: list[dict]) -> dict:
        p = {"_endpoint": "/chat/completions", "max_tokens": MAX_TOKENS}
        if self.provider == "anthropic":
            p.update(
                model=self.model,
                messages=[m for m in messages if m["role"] in ("user", "assistant")],
                response_format={"type": "json_object"},
            )
        elif self.provider == "gemini":
            p.update(
                model=f"gemini/{self.model}",
                messages=[{"role": "user", "content": messages[-1]["content"]}],
                temperature=0.8,
                response_format={"type": "json_object"},
            )
        elif self.provider == "meta":
            p.update(
                model=self.model,
                messages=[{"role": "user", "content": messages[-1]["content"]}],
                temperature=0.8,
                top_p=0.9,
            )
        elif self.provider == "ollama":
            base = os.environ.get("OLLAMA_BASE_URL", "http://localhost:11434")
            p.update(
                model=f"ollama/{self.model}",
                messages=[{
                    "role": "user",
                    "content": messages[-1]["content"]
                    + "\n\nIMPORTANT: output should be a valid JSON object "
                    "with no extra text or description.",
                }],
                temperature=0.8,
                api_base=base,
            )
        else:
            p.update(
                model=self.model,
                messages=[{"role": "user", "content": messages[-1]["content"]}],
                temperature=0.8,
                response_format={"type": "json_object"},
            )
        return p

    # --- call machinery ---

    def _ensure_lock(self):
        """Create the (unpicklable) usage lock on the CALLING thread
        before any pool fan-out — lazy creation inside _account would
        itself race between worker threads."""
        if self._usage_lock is None:
            import threading

            self._usage_lock = threading.Lock()
        return self._usage_lock

    def _account(self, response: dict) -> None:
        usage = calculate_usage(self.model, response)
        # _account runs on pool worker threads (_complete_batch fans
        # out via pool.map); the += read-modify-writes must serialize
        # or concurrent batches lose token/cost updates
        with self._ensure_lock():
            for bucket in ("input", "output", "total"):
                self.usage_totals[bucket]["tokens"] += usage[bucket]["tokens"]
                self.usage_totals[bucket]["cost"] += usage[bucket]["cost"]

    def _complete_one(self, messages: list[dict]) -> str:
        transport = self._get_transport()

        @with_retry(max_attempts=self.max_attempts, backoff_sec=0.1)
        def attempt() -> dict:
            return transport(dict(self._chat_payload(messages)))

        response = attempt()
        self._account(response)
        return response["choices"][0]["message"]["content"]

    def _complete_batch(self, message_lists: list[list[dict]]) -> list[str]:
        """One batch → bounded-concurrency fan-out, order-preserving.
        This is the call the Arrow UDFs make once per batch — the
        batched-async shape, not a serial per-row round-trip."""
        if not message_lists:
            return []
        self._ensure_lock()
        pool = self._get_pool()
        return list(pool.map(self._complete_one, message_lists))

    # --- ModelClient interface (same contract as model.StubModel) ---

    def extract(self, texts: list[str]) -> list[str]:
        return self._complete_batch([build_ie_prompt(t) for t in texts])

    def tag(self, texts: list[str], triples_per_doc: list[list[dict]]) -> list[str]:
        return self._complete_batch([build_et_prompt(tr) for tr in triples_per_doc])

    def link(self, doc_text: str, main_text: str, topic_text: str) -> str:
        return self.link_batch([(doc_text, main_text, topic_text)])[0]

    def link_batch(self, items: list[tuple[str, str, str]]) -> list[str]:
        return self._complete_batch(
            [build_link_prompt(d, m, t) for d, m, t in items]
        )

    def summarize(self, focused_text: str, repair: bool = False) -> str:
        """CTI summarization (+ strict-format repair retry), the T7
        path url_ingest drives (reference summarize/repair prompts)."""
        instruction = (
            "Rewrite the following threat-intelligence text as one "
            "plain-prose paragraph of 3-6 complete sentences covering "
            "actors, techniques, indicators, and impact. No headings, "
            "no lists, no JSON."
        )
        if repair:
            instruction += (
                " STRICT FORMAT: your previous answer was malformed; "
                "return ONLY the paragraph, nothing else."
            )
        return self._complete_batch(
            [[{"role": "user", "content": f"{instruction}\n\n{focused_text}"}]]
        )[0]

    def embed(self, texts: list[str]) -> np.ndarray:
        if not texts:
            return np.zeros((0, self.embedding_dim))
        transport = self._get_transport()

        @with_retry(max_attempts=self.max_attempts, backoff_sec=0.1)
        def attempt() -> dict:
            return transport({
                "_endpoint": "/embeddings",
                "model": self.embedding_model,
                "input": list(texts),
            })

        response = attempt()
        self._account(response)
        data = sorted(response["data"], key=lambda d: d["index"])
        return np.asarray([d["embedding"] for d in data], dtype=np.float64)
