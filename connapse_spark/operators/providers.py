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
    api_key_header: str = "Authorization",
) -> dict:
    """One JSON POST with the shared retry policy: 5xx/connection errors
    back off exponentially (0.1·2^attempt); 4xx fail fast.
    ``api_key_header``: "Authorization" sends ``Bearer <key>`` (Cohere/
    Jina/Voyage/OpenAI); any other header name (Azure's ``api-key``)
    sends the raw key."""
    import json
    import time
    import urllib.error
    import urllib.request

    body = json.dumps(payload).encode("utf-8")
    headers = {"Content-Type": "application/json"}
    if api_key:
        if api_key_header == "Authorization":
            headers["Authorization"] = f"Bearer {api_key}"
        else:
            headers[api_key_header] = api_key
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


def foundry_rerank_url(base_url: str, model: str | None = None) -> str:
    """Azure AI Foundry endpoint routing
    (AzureAIFoundryCrossEncoderProvider.BuildRerankUrl): a full Target URI
    containing ``/rerank`` passes through; an AI-Services gateway
    (``.services.ai.azure.com``) routes ``/providers/{slug}/v2/rerank``
    with the slug inferred from the model name; model-specific deployments
    use Cohere-native ``/v1/rerank``."""
    trimmed = base_url.rstrip("/")
    # "already a rerank endpoint" means the path ENDS at /rerank — a
    # substring test would misclassify e.g. /models/rerankers as a full
    # Target URI and skip the gateway routing
    if trimmed.lower().endswith("/rerank"):
        return trimmed
    if ".services.ai.azure.com" in trimmed.lower():
        slug = "cohere"
        if model and model.lower().startswith("jina"):
            slug = "jina"
        return f"{trimmed}/providers/{slug}/v2/rerank"
    return f"{trimmed}/v1/rerank"


def azure_openai_url(endpoint: str, deployment: str, api_version: str = "2024-06-01") -> str:
    """Azure OpenAI deployment-URL routing (the REST form of what
    AzureOpenAiLlmProvider.cs builds through the SDK): chat completions
    live under /openai/deployments/{deployment}/chat/completions with an
    api-version query parameter."""
    return (
        f"{endpoint.rstrip('/')}/openai/deployments/{deployment}"
        f"/chat/completions?api-version={api_version}"
    )


# rerank request/response wire shapes per provider style. Each entry:
# (payload builder, results extractor, score field, api-key header)
_RERANK_STYLES = {
    # Cohere/Jina /v1/rerank (CohereCrossEncoderProvider.cs,
    # JinaCrossEncoderProvider.cs)
    "cohere": (
        lambda model, query, batch: {
            "model": model, "query": query, "documents": batch,
            "top_n": len(batch),
        },
        lambda resp: resp["results"],
        "relevance_score",
        "Authorization",
    ),
    # HuggingFace text-embeddings-inference /rerank
    # (TeiCrossEncoderProvider.cs: {query, texts, raw_scores} → top-level
    # [{index, score}] list; no model field — the server IS the model)
    "tei": (
        lambda model, query, batch: {
            "query": query, "texts": batch, "raw_scores": False,
        },
        lambda resp: resp,
        "score",
        "Authorization",
    ),
    # Voyage /v1/rerank (VoyageCrossEncoderProvider.cs: top_k request
    # field, results under "data")
    "voyage": (
        lambda model, query, batch: {
            "model": model, "query": query, "documents": batch,
            "top_k": len(batch),
        },
        lambda resp: resp["data"],
        "relevance_score",
        "Authorization",
    ),
    # Azure AI Foundry (AzureAIFoundryCrossEncoderProvider.cs: Cohere
    # body, api-key header auth; pair with foundry_rerank_url)
    "azure_foundry": (
        lambda model, query, batch: {
            "model": model, "query": query, "documents": batch,
            "top_n": len(batch),
        },
        lambda resp: resp["results"],
        "relevance_score",
        "api-key",
    ),
}


def http_rerank_scorer(
    query: str,
    endpoint: str,
    model: str = "rerank-english-v3.0",
    api_key: str | None = None,
    batch_size: int = 32,
    timeout: float = 60.0,
    max_retries: int = 3,
    content_col: str = "content",
    style: str = "cohere",
) -> Column:
    """A ``scorer`` Column for :func:`search.rerank`: an Arrow-batched
    pandas UDF that sends each batch's contents as one rerank call
    (documents list + the fixed query) and maps the returned
    (index, score) pairs back to row order. ``style`` picks the wire
    shape — "cohere" (also Jina), "tei", "voyage", "azure_foundry" — the
    reference's 5-provider family (Reranking/Providers/*.cs); all four
    share index-addressed results, so the mapping logic is one code
    path. Results the provider omits score NULL — ``rerank`` then drops
    them, exactly the reference's scoredHits behavior. The hit set is
    top-k-sized, so this costs per-HIT, never per-corpus.

    Cost note: a global ``orderBy`` downstream samples its input to pick
    range bounds, which re-runs the scoring — when provider calls are
    billed, ``.persist()`` the scored frame (or ``coalesce(1)`` the
    k-sized hits so the sort is single-partition) before ordering."""
    if style not in _RERANK_STYLES:
        raise ValueError(
            f"unknown rerank style: {style} (choose from {sorted(_RERANK_STYLES)})"
        )
    build, extract, score_field, key_header = _RERANK_STYLES[style]

    @F.pandas_udf(DoubleType())
    def _score(contents: pd.Series) -> pd.Series:
        out: list[float | None] = []
        docs = [c or "" for c in contents]
        for at in range(0, len(docs), batch_size):
            batch = docs[at : at + batch_size]
            resp = http_post_json(
                endpoint,
                build(model, query, batch),
                api_key=api_key, timeout=timeout, max_retries=max_retries,
                api_key_header=key_header,
            )
            scores: list[float | None] = [None] * len(batch)
            for r in extract(resp):
                i = int(r["index"])
                if not 0 <= i < len(batch):
                    raise ValueError(f"rerank result index {i} out of range")
                scores[i] = float(r[score_field])
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
    ``"ollama"`` (/api/generate), ``"openai"`` (/v1/chat/completions,
    Bearer auth), or ``"azure_openai"`` (AzureOpenAiLlmProvider.cs:
    same chat body/response as openai but the deployment IS the route —
    build ``endpoint`` with :func:`azure_openai_url` — the model field is
    omitted and auth is the raw ``api-key`` header)."""
    if style not in ("ollama", "openai", "azure_openai"):
        raise ValueError(f"unknown provider style: {style}")

    def complete_one(prompt: str) -> str:
        if style == "ollama":
            resp = http_post_json(
                endpoint,
                {"model": model, "prompt": prompt, "stream": False},
                api_key=api_key, timeout=timeout, max_retries=max_retries,
            )
            return str(resp["response"])
        if style == "azure_openai":
            resp = http_post_json(
                endpoint,
                {"messages": [{"role": "user", "content": prompt}]},
                api_key=api_key, timeout=timeout, max_retries=max_retries,
                api_key_header="api-key",
            )
            return str(resp["choices"][0]["message"]["content"])
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


def http_llm_stream(
    endpoint: str,
    prompt: str,
    model: str = "llama3",
    style: str = "ollama",
    api_key: str | None = None,
    timeout: float = 120.0,
):
    """Streaming completion — the ``ILlmProvider.StreamAsync`` surface
    (src/Connapse.Core/Interfaces/ILlmProvider.cs:27,
    ``IAsyncEnumerable<string>``; OllamaLlmProvider/OpenAI-compatible
    providers stream it over the same endpoints ``CompleteAsync`` posts
    to): a generator yielding text chunks AS THE PROVIDER EMITS THEM.
    Wire shapes: ``"ollama"`` = ndjson (/api/generate with
    ``stream: true`` — one JSON object per line, ``done`` terminates);
    ``"openai"`` / ``"azure_openai"`` = SSE (``data: {...}`` lines over
    /chat/completions with ``stream: true``, ``data: [DONE]``
    terminates) reading ``choices[0].delta.content``. Auth matches
    :func:`http_llm_provider` (Bearer vs raw ``api-key``; azure omits
    the model field — the deployment is the route).

    Driver-side by nature: a stream is consumed incrementally by ONE
    caller (the serving/chat seam), so this is not a corpus operator and
    never enters a plan — ``rag.answer`` keeps the batch
    ``CompleteAsync`` path. No mid-stream retries: replaying a broken
    stream would re-emit tokens the caller already consumed; connection
    errors before the first chunk surface to the caller, who may simply
    call again."""
    import json
    import urllib.request

    if style == "ollama":
        body: dict = {"model": model, "prompt": prompt, "stream": True}
    elif style in ("openai", "azure_openai"):
        body = {
            "messages": [{"role": "user", "content": prompt}],
            "stream": True,
        }
        if style == "openai":
            body["model"] = model
    else:
        raise ValueError(f"unknown provider style: {style}")
    headers = {"Content-Type": "application/json"}
    if api_key:
        if style == "azure_openai":
            headers["api-key"] = api_key
        else:
            headers["Authorization"] = f"Bearer {api_key}"
    req = urllib.request.Request(
        endpoint, data=json.dumps(body).encode("utf-8"), headers=headers, method="POST"
    )
    def _sse_dispatch(data_lines: list[str]):
        """One SSE event's accumulated ``data:`` lines → (chunk, done).
        Per the SSE spec an event's data field is the newline-join of
        its data lines (a JSON payload split across continuation lines
        by a proxy is LEGAL and must reassemble — ADVICE r9: the old
        per-line json.loads raised JSONDecodeError mid-stream on it).
        Unparseable frames skip, never crash: a streamed completion is
        append-only, so dropping a malformed keep-alive loses nothing."""
        data = "\n".join(data_lines)
        if data.strip() == "[DONE]":
            return None, True
        try:
            obj = json.loads(data)
        except json.JSONDecodeError:
            return None, False
        # choices may be empty (Azure content-filter preamble events,
        # usage/keep-alive chunks) — skip, don't crash
        choices = obj.get("choices") or []
        if not choices:
            return None, False
        return choices[0].get("delta", {}).get("content"), False

    with urllib.request.urlopen(req, timeout=timeout) as resp:
        # line iteration on the raw HTTP response reads as bytes arrive
        # (http.client de-chunks transfer-encoding transparently), so each
        # yield happens when the provider flushes, not at stream end
        pending: list[str] = []
        for raw in resp:
            line = raw.decode("utf-8").rstrip("\r\n")
            if style == "ollama":
                if not line.strip():
                    continue
                obj = json.loads(line)
                chunk = obj.get("response", "")
                if chunk:
                    yield str(chunk)
                if obj.get("done"):
                    return
            else:
                if line == "":
                    # blank line = event terminator: dispatch the frame
                    if pending:
                        chunk, done = _sse_dispatch(pending)
                        pending = []
                        if done:
                            return
                        if chunk:
                            yield str(chunk)
                elif line.startswith("data:"):
                    v = line[len("data:"):]
                    # spec: strip at most ONE leading space from the value
                    v = v[1:] if v.startswith(" ") else v
                    if pending:
                        # tolerate non-conformant streams that omit the
                        # blank-line event separator (seen in the wild —
                        # and the pre-r10 parser's only shape): if the
                        # buffered frame already parses COMPLETE, it was
                        # an event of its own — dispatch before
                        # buffering the next line; otherwise this line
                        # is a legal multi-line continuation
                        buffered = "\n".join(pending)
                        complete = buffered.strip() == "[DONE]"
                        if not complete:
                            try:
                                json.loads(buffered)
                                complete = True
                            except json.JSONDecodeError:
                                complete = False
                        if complete:
                            chunk, done = _sse_dispatch(pending)
                            pending = []
                            if done:
                                return
                            if chunk:
                                yield str(chunk)
                    pending.append(v)
                # other SSE fields (event:, id:, retry:, ':' comments)
                # carry no completion payload — ignored
        if style != "ollama" and pending:
            # lenient tail: a stream that closes without the final blank
            # line still delivers its last frame
            chunk, _ = _sse_dispatch(pending)
            if chunk:
                yield str(chunk)
