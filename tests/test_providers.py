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
