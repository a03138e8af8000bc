"""HTTP rerank + LLM provider clients against live mock servers speaking
the public protocols — closing the reference's provider tier
(Reranking/Providers/*.cs, Llm/*.cs) the way moto closed S3."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

from connapse_spark.operators.providers import (
    http_llm_provider,
    http_post_json,
    http_rerank_scorer,
)


class _Log:
    def __init__(self):
        self.requests: list[dict] = []
        self.fail_next = 0


def _serve(handler_cls):
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler_cls)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}"


def _json_response(handler, obj, code=200):
    body = json.dumps(obj).encode()
    handler.send_response(code)
    handler.send_header("Content-Type", "application/json")
    handler.send_header("Content-Length", str(len(body)))
    handler.end_headers()
    handler.wfile.write(body)


@pytest.fixture()
def rerank_server():
    log = _Log()

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            payload = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
            if log.fail_next > 0:
                log.fail_next -= 1
                self.send_response(503)
                self.end_headers()
                return
            log.requests.append(payload)
            # deterministic score = len(doc)/100; return results OUT OF
            # ORDER and omit docs containing "skip" (sub-top_n omission)
            results = [
                {"index": i, "relevance_score": len(d) / 100.0}
                for i, d in enumerate(payload["documents"])
                if "skip" not in d
            ]
            _json_response(self, {"results": list(reversed(results))})

        def log_message(self, *a):
            pass

    srv, url = _serve(Handler)
    yield log, url + "/v1/rerank"
    srv.shutdown()


def test_rerank_scorer_maps_indices_and_omissions(spark, rerank_server):
    log, url = rerank_server
    from connapse_spark.operators.search import rerank

    hits = spark.createDataFrame(
        [(1, 0.9, "a" * 30), (2, 0.8, "please skip me"), (3, 0.7, "b" * 50)],
        "id long, score double, content string",
    ).coalesce(1)
    out = rerank(hits, "q", scorer=http_rerank_scorer("q", url)).collect()
    # provider scores replace fused; out-of-order results land on the
    # right rows; NULL-scored (omitted) rows sort last under desc order
    by_id = {r["id"]: r["score"] for r in out}
    assert by_id[1] == 0.30 and by_id[3] == 0.50
    assert by_id[2] is None
    assert [r["id"] for r in out][:2] == [3, 1]
    assert all(r["query"] == "q" for r in log.requests)
    # orderBy's range-bound sampling re-runs the input, so the provider
    # may see each document a second time (documented in providers.py —
    # persist the scored frame when calls are expensive); content and
    # query are what must be exact
    sent = [d for r in log.requests for d in r["documents"]]
    assert set(sent) == {"a" * 30, "please skip me", "b" * 50}
    assert len(sent) % 3 == 0


def test_rerank_scorer_batches(spark, rerank_server):
    log, url = rerank_server
    df = spark.createDataFrame(
        [(i, f"doc {i:03d}") for i in range(70)], "id long, content string"
    ).coalesce(1)
    scored = df.select(
        "id", http_rerank_scorer("q", url, batch_size=32).alias("s")
    ).collect()
    assert len(scored) == 70 and all(r["s"] == 0.07 for r in scored)
    assert [len(r["documents"]) for r in log.requests] == [32, 32, 6]


@pytest.fixture()
def multi_style_rerank_server():
    """One server speaking all three non-Cohere rerank wire shapes, each
    verified against its reference provider (TeiCrossEncoderProvider.cs,
    VoyageCrossEncoderProvider.cs, AzureAIFoundryCrossEncoderProvider.cs)."""
    log = _Log()

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            payload = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
            log.requests.append((self.path, dict(self.headers), payload))
            if self.path == "/rerank":  # TEI: {query, texts} → top-level list
                assert "texts" in payload and "model" not in payload
                _json_response(
                    self,
                    [
                        {"index": i, "score": len(d) / 100.0}
                        for i, d in enumerate(payload["texts"])
                    ],
                )
            elif self.path == "/v1/rerank" and "top_k" in payload:  # Voyage
                _json_response(
                    self,
                    {"data": [
                        {"index": i, "relevance_score": len(d) / 100.0}
                        for i, d in enumerate(payload["documents"])
                    ]},
                )
            else:  # Azure AI Foundry: Cohere body, api-key auth
                if self.headers.get("api-key") != "foundry-secret":
                    self.send_response(401)
                    self.end_headers()
                    return
                _json_response(
                    self,
                    {"results": [
                        {"index": i, "relevance_score": len(d) / 100.0}
                        for i, d in enumerate(payload["documents"])
                    ]},
                )

        def log_message(self, *a):
            pass

    srv, url = _serve(Handler)
    yield log, url
    srv.shutdown()


def test_rerank_styles_tei_voyage_foundry(spark, multi_style_rerank_server):
    log, url = multi_style_rerank_server
    df = spark.createDataFrame(
        [(1, "a" * 30), (2, "b" * 50)], "id long, content string"
    ).coalesce(1)

    for style, path, key in (
        ("tei", "/rerank", None),
        ("voyage", "/v1/rerank", "vk"),
        ("azure_foundry", "/v2/rerank", "foundry-secret"),
    ):
        got = {
            r["id"]: r["s"]
            for r in df.select(
                "id",
                http_rerank_scorer("q", url + path, api_key=key, style=style).alias("s"),
            ).collect()
        }
        assert got == {1: 0.30, 2: 0.50}, style

    # wire assertions: TEI sent texts/raw_scores; Voyage sent top_k;
    # Foundry used Bearer-less api-key auth (asserted server-side by the
    # 401 gate) while Voyage sent a Bearer token
    tei = next(p for path, h, p in log.requests if path == "/rerank")
    assert tei["raw_scores"] is False
    voy_headers = next(h for path, h, p in log.requests if path == "/v1/rerank")
    assert voy_headers.get("Authorization") == "Bearer vk"

    with pytest.raises(ValueError, match="style"):
        http_rerank_scorer("q", url, style="grpc")


def test_foundry_rerank_url_routing():
    from connapse_spark.operators.providers import foundry_rerank_url

    # full Target URI passes through
    assert (
        foundry_rerank_url("https://x.models.ai.azure.com/v1/rerank/")
        == "https://x.models.ai.azure.com/v1/rerank"
    )
    # AI-Services gateway routes per provider slug inferred from model
    assert (
        foundry_rerank_url("https://r.services.ai.azure.com", "Cohere-rerank-v4.0")
        == "https://r.services.ai.azure.com/providers/cohere/v2/rerank"
    )
    assert (
        foundry_rerank_url("https://r.services.ai.azure.com", "jina-reranker-v3")
        == "https://r.services.ai.azure.com/providers/jina/v2/rerank"
    )
    # model deployment defaults to Cohere-native /v1/rerank
    assert (
        foundry_rerank_url("https://dep.models.ai.azure.com")
        == "https://dep.models.ai.azure.com/v1/rerank"
    )
    # a path merely CONTAINING 'rerank' is not a full Target URI — the
    # gateway route must still be appended (substring-check regression)
    assert (
        foundry_rerank_url("https://r.services.ai.azure.com/models/rerankers")
        == "https://r.services.ai.azure.com/models/rerankers/providers/cohere/v2/rerank"
    )


@pytest.fixture()
def llm_server():
    log = _Log()

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            payload = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
            if log.fail_next > 0:
                log.fail_next -= 1
                self.send_response(500)
                self.end_headers()
                return
            log.requests.append((self.path, payload))
            log.last_headers = dict(self.headers)
            if self.path.endswith("/api/generate"):
                _json_response(
                    self, {"response": f"echo[{payload['prompt'][:20]}]"}
                )
            else:  # openai-style
                content = payload["messages"][0]["content"]
                _json_response(
                    self,
                    {"choices": [{"message": {"role": "assistant",
                                              "content": f"chat[{content[:20]}]"}}]},
                )

        def log_message(self, *a):
            pass

    srv, url = _serve(Handler)
    yield log, url
    srv.shutdown()


def test_llm_provider_ollama_and_openai_styles(llm_server):
    import pandas as pd

    log, url = llm_server
    oll = http_llm_provider(url + "/api/generate", style="ollama")
    out = oll(pd.Series(["tell me about spark"]))
    assert out[0] == "echo[tell me about spark]"
    assert log.requests[-1][1]["stream"] is False

    oai = http_llm_provider(url + "/v1/chat/completions", style="openai")
    out = oai(pd.Series(["hello there friend!!"]))
    assert out[0] == "chat[hello there friend!!]"
    assert log.requests[-1][1]["messages"][0]["role"] == "user"

    with pytest.raises(ValueError, match="style"):
        http_llm_provider(url, style="soap-xml")


def test_llm_provider_azure_openai_style(llm_server):
    """AzureOpenAiLlmProvider.cs semantics over REST: deployment-routed
    URL (azure_openai_url), raw api-key header, NO model field in the
    body (the deployment IS the model)."""
    import pandas as pd

    from connapse_spark.operators.providers import azure_openai_url

    log, url = llm_server
    ep = azure_openai_url(url, "gpt4-deploy", api_version="2024-06-01")
    assert ep == url + "/openai/deployments/gpt4-deploy/chat/completions?api-version=2024-06-01"
    p = http_llm_provider(ep, style="azure_openai", api_key="az-secret")
    out = p(pd.Series(["hello from azure!!!"]))
    assert out[0] == "chat[hello from azure!!!]"
    path, payload = log.requests[-1]
    assert "/openai/deployments/gpt4-deploy/chat/completions" in path
    assert "model" not in payload
    hl = {k.lower(): v for k, v in log.last_headers.items()}
    assert hl.get("api-key") == "az-secret"
    assert "authorization" not in hl


def test_llm_provider_retries_then_succeeds(llm_server):
    import pandas as pd

    log, url = llm_server
    log.fail_next = 2
    p = http_llm_provider(url + "/api/generate", max_retries=3)
    assert p(pd.Series(["x"]))[0] == "echo[x]"


def test_llm_provider_drives_rag_answer(spark, llm_server):
    """End-to-end: rag.answer with the HTTP provider — prompts built from
    hit frames, completions fetched from the live endpoint inside the
    pandas UDF."""
    from connapse_spark.operators.rag import answer, build_prompts

    log, url = llm_server
    hits = spark.createDataFrame(
        [(1, 0.9, "spark is a distributed engine"),
         (2, 0.8, "duckdb is an in-process engine")],
        "id long, score double, content string",
    ).withColumn("query", F.lit("what is spark?"))
    prompts = build_prompts(hits)
    out = answer(prompts, provider=http_llm_provider(url + "/api/generate")).collect()
    assert len(out) >= 1
    assert all(r["answer"].startswith("echo[") for r in out)


def test_http_post_json_fails_fast_on_4xx():
    class Handler(BaseHTTPRequestHandler):
        calls = 0

        def do_POST(self):
            type(self).calls += 1
            self.send_response(400)
            self.end_headers()

        def log_message(self, *a):
            pass

    srv, url = _serve(Handler)
    try:
        import urllib.error

        with pytest.raises(urllib.error.HTTPError):
            http_post_json(url, {}, max_retries=3)
        assert Handler.calls == 1  # no retries on 4xx
    finally:
        srv.shutdown()


def test_rerank_connection_tester():
    from connapse_spark.sources.connectors import test_rerank_provider

    ok = test_rerank_provider()
    assert ok["success"] is True and ok["details"]["n_scored"] == 2
    # wrong-arity provider → failure result, not an exception
    bad = test_rerank_provider(rerank_fn=lambda q, d: [1.0])
    assert bad["success"] is False
    # raising provider → failure result
    def boom(q, d):
        raise ConnectionError("down")
    err = test_rerank_provider(rerank_fn=boom)
    assert err["success"] is False and "ConnectionError" in err["message"]
    # NaN scores are invalid
    nan = test_rerank_provider(rerank_fn=lambda q, d: [float("nan")] * len(d))
    assert nan["success"] is False


def test_all_connections_sweep(spark):
    from connapse_spark.sources.connectors import test_all_connections

    report = test_all_connections(spark)
    assert set(report) == {"embedding", "llm", "rerank"}
    assert all(r["success"] for r in report.values())
    with_storage = test_all_connections(spark, storage_uri="/root/testdata/sf0.001")
    assert with_storage["storage"]["success"] is True


# ---------------------------------------------------------------------------
# Streaming completions (r9 — ILlmProvider.StreamAsync surface)
# ---------------------------------------------------------------------------


@pytest.fixture()
def stream_llm_server():
    """Streams 3 chunks with an explicit flush + delay between each and
    records per-chunk SEND timestamps, so tests can prove INCREMENTAL
    arrival (first chunk consumed before the last is sent) rather than
    whole-body buffering."""
    import time

    log = _Log()
    log.send_times = {}

    def _chunks(handler, lines, key):
        handler.send_response(200)
        handler.send_header("Content-Type", "application/x-ndjson")
        handler.end_headers()  # HTTP/1.0: close-delimited body, no length
        times = log.send_times.setdefault(key, [])
        for ln in lines:
            handler.wfile.write(ln.encode() + b"\n")
            handler.wfile.flush()
            times.append(time.time())  # recorded per send — the client
            time.sleep(0.15)           # returns at the done marker, before
                                       # this handler finishes

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            payload = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
            log.requests.append((self.path, payload))
            log.last_headers = dict(self.headers)
            if self.path.endswith("/api/generate"):
                assert payload["stream"] is True
                _chunks(self, [
                    json.dumps({"response": "Hel", "done": False}),
                    json.dumps({"response": "lo ", "done": False}),
                    json.dumps({"response": "world", "done": False}),
                    json.dumps({"response": "", "done": True}),
                ], "ollama")
            else:  # openai/azure SSE
                assert payload["stream"] is True
                _chunks(self, [
                    'data: ' + json.dumps({"choices": [{"delta": {"role": "assistant"}}]}),
                    'data: ' + json.dumps({"choices": [{"delta": {"content": "str"}}]}),
                    'data: ' + json.dumps({"choices": [{"delta": {"content": "eam"}}]}),
                    'data: [DONE]',
                ], "sse")

        def log_message(self, *a):
            pass

    srv, url = _serve(Handler)
    yield log, url
    srv.shutdown()


def test_llm_stream_ollama_ndjson_incremental(stream_llm_server):
    import time

    from connapse_spark.operators.providers import http_llm_stream

    log, url = stream_llm_server
    recv = []
    for chunk in http_llm_stream(url + "/api/generate", "hi", style="ollama"):
        recv.append((chunk, time.time()))
    assert [c for c, _ in recv] == ["Hel", "lo ", "world"]
    # incremental: the FIRST chunk was consumed before the server sent
    # the LAST one (a whole-body buffer could only start after all sends)
    assert recv[0][1] < log.send_times["ollama"][-1]


def test_llm_stream_openai_sse_incremental(stream_llm_server):
    import time

    from connapse_spark.operators.providers import http_llm_stream

    log, url = stream_llm_server
    recv = []
    for chunk in http_llm_stream(
        url + "/v1/chat/completions", "hi", style="openai", api_key="sk-x"
    ):
        recv.append((chunk, time.time()))
    assert [c for c, _ in recv] == ["str", "eam"]
    assert recv[0][1] < log.send_times["sse"][-1]
    hl = {k.lower(): v for k, v in log.last_headers.items()}
    assert hl.get("authorization") == "Bearer sk-x"
    assert log.requests[-1][1]["model"] == "llama3"


def test_llm_stream_azure_style_headers(stream_llm_server):
    from connapse_spark.operators.providers import http_llm_stream

    log, url = stream_llm_server
    out = "".join(
        http_llm_stream(url + "/v1/chat/completions", "hi", style="azure_openai", api_key="az")
    )
    assert out == "stream"
    hl = {k.lower(): v for k, v in log.last_headers.items()}
    assert hl.get("api-key") == "az"
    assert "authorization" not in hl
    assert "model" not in log.requests[-1][1]


def test_llm_stream_rejects_unknown_style():
    from connapse_spark.operators.providers import http_llm_stream

    with pytest.raises(ValueError, match="style"):
        list(http_llm_stream("http://x", "p", style="soap-xml"))

def test_llm_stream_sse_multiline_data_reassembled():
    """SSE events whose JSON payload spans multiple ``data:`` lines are
    LEGAL (spec: an event's data is the newline-join of its data lines
    until the blank-line terminator; some proxies re-chunk this way) —
    the r9 per-line json.loads raised JSONDecodeError mid-stream on
    them (ADVICE r9). Also covers: unparseable frames skip instead of
    crashing, non-data SSE fields (event:/id:/comments) are ignored,
    and a final frame without a trailing blank line still delivers."""
    from connapse_spark.operators.providers import http_llm_stream

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            self.rfile.read(int(self.headers["Content-Length"]))
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.end_headers()
            self.wfile.write(
                b"event: message\n"
                b"id: 7\n"
                b": keep-alive comment\n"
                b'data: {"choices": [{"delta":\n'      # one JSON payload,
                b'data:  {"content": "spl"}}]}\n'      # two data lines
                b"\n"
                b"data: {this is not json\n"           # malformed frame:
                b"\n"                                  # skipped, not raised
                b'data: {"choices": [{"delta": {"content": "it"}}]}\n'
                b"\n"
                b"data: [DONE]"                        # no trailing blank —
            )                                          # lenient tail path

        def log_message(self, *a):
            pass

    srv, url = _serve(Handler)
    try:
        out = list(http_llm_stream(url + "/v1/chat/completions", "hi", style="openai"))
    finally:
        srv.shutdown()
    assert out == ["spl", "it"]
