"""The HTTP embedding provider client against a live mock server — the
moto pattern applied to E1: a stdlib http.server thread speaks the
Ollama-style protocol (OllamaEmbeddingProvider.cs:51-110), and the
provider's sub-batching, ordering, retry, and executor-side integration
are asserted against what the server actually received."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

from connapse_spark.operators.embedding import (
    embedding_provider_udf,
    http_embedding_provider,
)


class _Recorder:
    def __init__(self):
        self.batches: list[list[str]] = []
        self.fail_next = 0  # respond 503 to this many requests
        self.lock = threading.Lock()


def _make_server(rec: _Recorder):
    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers["Content-Length"])
            payload = json.loads(self.rfile.read(n))
            with rec.lock:
                if rec.fail_next > 0:
                    rec.fail_next -= 1
                    self.send_response(503)
                    self.end_headers()
                    return
                rec.batches.append(payload["input"])
            # deterministic embedding: [len(text), first_byte] per text
            vecs = [
                [float(len(t)), float(ord(t[0]) if t else 0)]
                for t in payload["input"]
            ]
            body = json.dumps({"embeddings": vecs}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}/api/embed"


@pytest.fixture()
def server():
    rec = _Recorder()
    srv, url = _make_server(rec)
    yield rec, url
    srv.shutdown()


def test_sub_batches_at_16_per_call_and_preserves_order(server):
    rec, url = server
    provider = http_embedding_provider(url, batch_size=16)
    texts = [f"text number {i}" for i in range(35)]
    vecs = provider(texts)
    assert [len(b) for b in rec.batches] == [16, 16, 3]
    assert [b for batch in rec.batches for b in batch] == texts
    assert len(vecs) == 35
    assert vecs[0] == [float(len(texts[0])), float(ord("t"))]


def test_retries_on_5xx_then_succeeds(server):
    rec, url = server
    rec.fail_next = 2
    provider = http_embedding_provider(url, batch_size=4, max_retries=3)
    vecs = provider(["abc", "de"])
    assert len(vecs) == 2 and vecs[0][0] == 3.0
    assert len(rec.batches) == 1  # the two 503s recorded nothing


def test_gives_up_after_max_retries(server):
    rec, url = server
    rec.fail_next = 99
    provider = http_embedding_provider(url, max_retries=1)
    import urllib.error

    with pytest.raises(urllib.error.HTTPError):
        provider(["x"])


def test_vector_count_mismatch_raises():
    # a mismatch needs a lying server, so spin a one-off
    def _make_lying():
        class Handler(BaseHTTPRequestHandler):
            def do_POST(self):
                n = int(self.headers["Content-Length"])
                json.loads(self.rfile.read(n))
                body = json.dumps({"embeddings": [[1.0]]}).encode()
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):
                pass

        srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        return srv, f"http://127.0.0.1:{srv.server_address[1]}/api/embed"

    srv, url2 = _make_lying()
    try:
        with pytest.raises(ValueError, match="2 texts"):
            http_embedding_provider(url2)(["a", "b"])
    finally:
        srv.shutdown()


def test_provider_runs_inside_spark_udf(spark, server):
    """End-to-end: the provider closure ships to Python workers and each
    worker calls the live endpoint — E1 with a real HTTP hop."""
    rec, url = server
    udf = embedding_provider_udf(http_embedding_provider(url, batch_size=16))
    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(10)], "id long, text string"
    ).repartition(3)
    rows = df.select("id", udf(F.col("text")).alias("emb")).collect()
    assert len(rows) == 10
    by_id = {r["id"]: r["emb"] for r in rows}
    assert by_id[7] == [5.0, float(ord("d"))]
    assert sum(len(b) for b in rec.batches) == 10
