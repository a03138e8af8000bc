"""Real HTTP provider clients for the pluggable scorer/LLM seams —
the wiring tier the reference ships as 5 rerank providers
(src/Connapse.Search/Reranking/Providers/*.cs) and 4 LLM providers
(src/Connapse.Storage/Llm/*.cs). The deterministic fakes remain the
DEFAULT everywhere (correctness entries never depend on a network);
these clients are the opt-in production path, integration-tested against
live mock servers speaking the public protocols
(tests/test_providers.py — the moto pattern).

Protocols (both are public, documented APIs):

* rerank — the Cohere/Jina ``/v1/rerank`` shape: POST
  ``{"model", "query", "documents": [...], "top_n"}`` →
  ``{"results": [{"index": i, "relevance_score": s}, ...]}`` (results may
  arrive in any order and may omit documents below top_n — omitted
  documents score NULL, matching the reference's scoredHits-only
  behavior, CrossEncoderReranker.cs:71-99);
* completion — the Ollama ``/api/generate`` shape: POST
  ``{"model", "prompt", "stream": false}`` → ``{"response": ...}``; or
  the OpenAI-style ``/v1/chat/completions`` shape: POST
  ``{"model", "messages": [{"role": "user", ...}]}`` →
  ``{"choices": [{"message": {"content": ...}}]}``.

Closures capture only strings/numbers, so they serialize to executors
cleanly and every Python worker opens its own connections — the same
discipline as connectors.s3_read_objects and http_embedding_provider.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType


def http_post_json(
    url: str,
    payload: dict,
    api_key: str | None = None,
    timeout: float = 60.0,
    max_retries: int = 3,
) -> dict:
    """One JSON POST with the shared retry policy: 5xx/connection errors
    back off exponentially (0.1·2^attempt); 4xx fail fast."""
    import json
    import time
    import urllib.error
    import urllib.request

    body = json.dumps(payload).encode("utf-8")
    headers = {"Content-Type": "application/json"}
    if api_key:
        headers["Authorization"] = f"Bearer {api_key}"
    for attempt in range(max_retries + 1):
        try:
            req = urllib.request.Request(url, data=body, headers=headers, method="POST")
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                return json.loads(resp.read().decode("utf-8"))
        except urllib.error.HTTPError as ex:
            if ex.code < 500 or attempt == max_retries:
                raise
        except (urllib.error.URLError, TimeoutError, ConnectionError):
            if attempt == max_retries:
                raise
        time.sleep(0.1 * (2 ** attempt))
    raise AssertionError("unreachable")


def http_rerank_scorer(
    query: str,
    endpoint: str,
    model: str = "rerank-english-v3.0",
    api_key: str | None = None,
    batch_size: int = 32,
    timeout: float = 60.0,
    max_retries: int = 3,
    content_col: str = "content",
) -> Column:
    """A ``scorer`` Column for :func:`search.rerank`: an Arrow-batched
    pandas UDF that sends each batch's contents as one ``/v1/rerank``
    call (documents list + the fixed query) and maps the returned
    (index, relevance_score) pairs back to row order. Results the
    provider omits score NULL — ``rerank`` then drops them, exactly the
    reference's scoredHits behavior. The hit set is top-k-sized, so this
    costs per-HIT, never per-corpus.

    Cost note: a global ``orderBy`` downstream samples its input to pick
    range bounds, which re-runs the scoring — when provider calls are
    billed, ``.persist()`` the scored frame (or ``coalesce(1)`` the
    k-sized hits so the sort is single-partition) before ordering."""

    @F.pandas_udf(DoubleType())
    def _score(contents: pd.Series) -> pd.Series:
        out: list[float | None] = []
        docs = [c or "" for c in contents]
        for at in range(0, len(docs), batch_size):
            batch = docs[at : at + batch_size]
            resp = http_post_json(
                endpoint,
                {"model": model, "query": query, "documents": batch,
                 "top_n": len(batch)},
                api_key=api_key, timeout=timeout, max_retries=max_retries,
            )
            scores: list[float | None] = [None] * len(batch)
            for r in resp["results"]:
                i = int(r["index"])
                if not 0 <= i < len(batch):
                    raise ValueError(f"rerank result index {i} out of range")
                scores[i] = float(r["relevance_score"])
            out.extend(scores)
        return pd.Series(out, dtype="float64")

    # nondeterministic stops Catalyst from DUPLICATING the expression into
    # multiple stages (observed: sort + project each re-evaluating it) —
    # every evaluation is a paid provider round-trip
    return _score.asNondeterministic()(F.col(content_col))


def http_llm_provider(
    endpoint: str,
    model: str = "llama3",
    style: str = "ollama",
    api_key: str | None = None,
    timeout: float = 120.0,
    max_retries: int = 3,
) -> Callable[[pd.Series], pd.Series]:
    """A ``Provider`` for :func:`rag.answer` — pd.Series of prompts →
    pd.Series of completions, one call per prompt (completion APIs are
    single-prompt; the pandas-UDF batching amortizes the Python↔JVM hop,
    not the provider round-trips, same as the reference's per-request
    provider calls). ``style`` picks the request/response shape:
    ``"ollama"`` (/api/generate) or ``"openai"`` (/v1/chat/completions)."""
    if style not in ("ollama", "openai"):
        raise ValueError(f"unknown provider style: {style}")

    def complete_one(prompt: str) -> str:
        if style == "ollama":
            resp = http_post_json(
                endpoint,
                {"model": model, "prompt": prompt, "stream": False},
                api_key=api_key, timeout=timeout, max_retries=max_retries,
            )
            return str(resp["response"])
        resp = http_post_json(
            endpoint,
            {"model": model,
             "messages": [{"role": "user", "content": prompt}]},
            api_key=api_key, timeout=timeout, max_retries=max_retries,
        )
        return str(resp["choices"][0]["message"]["content"])

    def provider(prompts: pd.Series) -> pd.Series:
        return pd.Series([complete_one(p or "") for p in prompts])

    return provider
