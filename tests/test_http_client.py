"""HttpModelClient (the production litellm-path rebuild) tested
network-free with a fake transport that parses the rendered prompts
and answers with StubModel's deterministic logic — so the full
pipeline can run through the HTTP adapter inside Spark workers and be
compared against the stub run bit for bit."""

import json
import pickle
import threading
import time

import pytest

from ctinexus_spark import entry_queries as eq
from ctinexus_spark.client import HttpModelClient
from ctinexus_spark.model import StubModel, stub_embedding, stub_extract_triplets, stub_tag_class


class FakeLLMTransport:
    """In-process 'server': OpenAI-ish wire shapes in and out."""

    def __init__(self, lexicon=None, fail_first=0, delay=0.0):
        self.lexicon = lexicon or {}
        self.fail_first = fail_first
        self.delay = delay
        self.calls = 0
        self.live = 0
        self.max_live = 0
        self.payloads = []
        self._lock = threading.Lock()

    def __getstate__(self):
        state = dict(self.__dict__)
        state["_lock"] = None  # recreated on unpickle (per worker process)
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._lock = threading.Lock()

    def __call__(self, payload):
        with self._lock:
            self.calls += 1
            self.live += 1
            self.max_live = max(self.max_live, self.live)
            self.payloads.append(payload)
            if self.calls <= self.fail_first:
                self.live -= 1
                raise ConnectionError("transient transport failure")
        try:
            if self.delay:
                time.sleep(self.delay)
            return self._answer(payload)
        finally:
            with self._lock:
                self.live -= 1

    def _answer(self, payload):
        usage = {"prompt_tokens": 10, "completion_tokens": 5}
        if payload.get("_endpoint") == "/embeddings":
            data = [
                {"index": i, "embedding": stub_embedding(t).tolist()}
                for i, t in enumerate(payload["input"])
            ]
            return {"data": data, "usage": usage}
        content = payload["messages"][-1]["content"]
        if "Entity A: " in content:
            a = content.split("Entity A: ")[1].split("\n")[0]
            b = content.split("Entity B: ")[1].split("\n")[0]
            out = {"predicted_triple": {"subject": a, "relation": "related-to", "object": b}}
        elif content.startswith("You classify"):
            triples = json.loads(
                content.split("Triples:\n", 1)[1].rsplit("\nOutput JSON only.", 1)[0]
            )
            out = {
                "tagged_triples": [
                    {
                        "subject": {"text": t["subject"],
                                    "class": stub_tag_class(t["subject"], self.lexicon)},
                        "relation": t["relation"],
                        "object": {"text": t["object"],
                                   "class": stub_tag_class(t["object"], self.lexicon)},
                    }
                    for t in triples
                ]
            }
        else:
            text = content.split("Report:\n", 1)[1].rsplit("\nOutput JSON only.", 1)[0]
            out = {"triplets": stub_extract_triplets(text, self.lexicon)}
        return {"choices": [{"message": {"content": json.dumps(out)}}], "usage": usage}


def _client(transport, **kw):
    return HttpModelClient(model="test-model", transport=transport, **kw)


# --- provider request shaping (llm_processor.py:1029-1086) --------------


def test_provider_shaping():
    msgs = [{"role": "system", "content": "s"}, {"role": "user", "content": "hello"}]

    p = HttpModelClient("m", provider="anthropic")._chat_payload(msgs)
    assert p["messages"] == [{"role": "user", "content": "hello"}]
    assert p["response_format"] == {"type": "json_object"}
    assert "temperature" not in p and p["max_tokens"] == 4096

    p = HttpModelClient("m", provider="gemini")._chat_payload(msgs)
    assert p["model"] == "gemini/m" and p["temperature"] == 0.8
    assert p["response_format"] == {"type": "json_object"}

    p = HttpModelClient("m", provider="meta")._chat_payload(msgs)
    assert p["top_p"] == 0.9 and "response_format" not in p

    p = HttpModelClient("m", provider="ollama")._chat_payload(msgs)
    assert p["model"] == "ollama/m"
    assert "valid JSON object" in p["messages"][-1]["content"]
    assert "api_base" in p

    p = HttpModelClient("m", provider="openai")._chat_payload(msgs)
    assert p["temperature"] == 0.8 and p["response_format"] == {"type": "json_object"}


# --- retry (llm_processor.py:140-160) ------------------------------------


def test_retry_recovers_from_transient_failures():
    t = FakeLLMTransport(lexicon={"a": "Tool"}, fail_first=2)
    out = _client(t).extract(["a a"])
    assert json.loads(out[0])["triplets"] == [
        {"subject": "a", "relation": "precedes", "object": "a"}
    ]
    assert t.calls == 3  # 2 failures + 1 success


def test_retry_exhaustion_raises():
    t = FakeLLMTransport(fail_first=99)
    with pytest.raises(ConnectionError):
        _client(t, max_attempts=5).extract(["x"])
    assert t.calls == 5


# --- bounded concurrency --------------------------------------------------


def test_batch_fanout_bounded_and_ordered():
    t = FakeLLMTransport(lexicon={"w": "Tool"}, delay=0.05)
    c = _client(t, max_concurrency=3)
    texts = [f"w{' w' * i}" for i in range(12)]
    out = c.extract(texts)
    assert len(out) == 12
    # order-preserving: i-th answer has i triples (i+1 mentions)
    for i, raw in enumerate(out):
        assert len(json.loads(raw)["triplets"]) == i
    assert t.max_live <= 3
    assert t.max_live > 1  # actually concurrent, not serial


# --- usage accounting (llm_processor.py:1214-1272) ------------------------


def test_usage_accumulates_across_calls():
    t = FakeLLMTransport(lexicon={"a": "Tool"})
    c = _client(t)
    c.extract(["a", "a a"])
    c.link_batch([("doc", "a", "b")])
    assert c.usage_totals["input"]["tokens"] == 30
    assert c.usage_totals["output"]["tokens"] == 15
    assert c.usage_totals["total"]["tokens"] == 45


def test_embed_sorts_by_index():
    class Shuffled(FakeLLMTransport):
        def _answer(self, payload):
            r = super()._answer(payload)
            if "data" in r:
                r["data"] = list(reversed(r["data"]))
            return r

    c = _client(Shuffled())
    vecs = c.embed(["alpha", "beta"])
    assert vecs.shape == (2, 64)
    assert (vecs[0] == stub_embedding("alpha")).all()
    assert (vecs[1] == stub_embedding("beta")).all()


def test_summarize_passes_instruction_and_repair_flag():
    seen = []

    def echo(payload):
        seen.append(payload["messages"][-1]["content"])
        return {"choices": [{"message": {"content": "A clean paragraph."}}],
                "usage": {"prompt_tokens": 1, "completion_tokens": 1}}

    c = _client(echo)
    assert c.summarize("raw cti text") == "A clean paragraph."
    assert "raw cti text" in seen[0] and "STRICT FORMAT" not in seen[0]
    c.summarize("raw cti text", repair=True)
    assert "STRICT FORMAT" in seen[1]


# --- pickling into Spark workers ------------------------------------------


def test_client_pickles_without_live_pool():
    c = HttpModelClient("m", api_base="http://example.invalid/v1")
    c._get_pool()  # create a live pool, then make sure it is dropped
    c2 = pickle.loads(pickle.dumps(c))
    assert c2._pool is None
    assert c2.model == "m" and c2.api_base == "http://example.invalid/v1"


# --- end-to-end: the full fused pipeline through the HTTP adapter ---------


def test_pipeline_through_http_adapter_matches_stub(spark):
    from pyspark.sql import functions as F

    from ctinexus_spark.operators.fused import fused_kg
    from ctinexus_spark.operators.normalize import normalize_documents

    raw = eq.load_documents(spark, "/root/testdata/sf0.001").filter(F.col("url").cast("int") < 40)
    docs = normalize_documents(raw, lang_filter=None)

    http_model = _client(FakeLLMTransport(lexicon=eq.LEXICON), max_concurrency=4)
    kg_http = {(r.url, r.subj, r.pred, r.obj, r.source)
               for r in fused_kg(docs, http_model, eq.CONFIG).collect()}
    kg_stub = {(r.url, r.subj, r.pred, r.obj, r.source)
               for r in fused_kg(docs, StubModel(eq.CONFIG), eq.CONFIG).collect()}
    assert kg_http == kg_stub and kg_http


def test_pipeline_default_transport_over_real_http(spark):
    """The executor-side lifecycle no other test touches: a client
    built with the DEFAULT urllib transport pickles into Spark workers
    with transport=None (client.__getstate__), each worker process
    rebuilds transport + thread pool lazily and issues REAL HTTP to an
    in-process server. fused_kg over 50 docs must be bit-identical to
    the StubModel run (round-2 verdict next-step #7)."""
    import http.server
    import threading

    from pyspark.sql import functions as F

    from ctinexus_spark.operators.fused import fused_kg
    from ctinexus_spark.operators.normalize import normalize_documents

    answer = FakeLLMTransport(lexicon=eq.LEXICON)._answer

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            payload = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
            payload["_endpoint"] = self.path.removeprefix("/v1")
            body = json.dumps(answer(payload)).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        raw = eq.load_documents(spark, "/root/testdata/sf0.001").filter(
            F.col("url").cast("int") < 50
        )
        docs = normalize_documents(raw, lang_filter=None)
        client = HttpModelClient(
            model="test-model",
            api_base=f"http://127.0.0.1:{server.server_address[1]}/v1",
            max_concurrency=4,
        )
        assert getattr(client._get_transport(), "_is_default_transport", False)
        kg_http = {(r.url, r.subj, r.pred, r.obj, r.source)
                   for r in fused_kg(docs, client, eq.CONFIG).collect()}
        kg_stub = {(r.url, r.subj, r.pred, r.obj, r.source)
                   for r in fused_kg(docs, StubModel(eq.CONFIG), eq.CONFIG).collect()}
        assert kg_http == kg_stub and kg_http
    finally:
        server.shutdown()
        server.server_close()
