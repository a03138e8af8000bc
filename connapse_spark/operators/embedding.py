"""Embedding operators: content-addressed cache join (E2), pluggable
provider UDF (E1), and batch-ingest embedding with dedup-before-embed.

Reference: EmbeddingCache.cs:13-48 — key = sha256(content)+model+dims;
the pipeline embeds only cache misses (IngestionPipeline.cs:255-289).
Spark shape: LEFT ANTI join against the existing vectors table — the classic
incremental pattern; plus within-batch dedup (identical chunk texts embed
once, then fan back out), which at 100 TB routinely saves 20-40% of embed
compute on boilerplate-heavy corpora.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType
from pyspark.sql.window import Window

from connapse_spark.functions.embed import embed_py


def cache_misses(
    batch: DataFrame,
    cache: DataFrame,
    text_col: str = "text",
    cache_hash_col: str = "content_hash",
) -> DataFrame:
    """Rows of `batch` whose sha256(text) is absent from `cache`, with
    within-batch dedup (first id per hash represents the group).
    Two ops: window keep-first + broadcast-able left anti join."""
    hashed = batch.withColumn("content_hash", F.sha2(F.col(text_col), 256))
    w = Window.partitionBy("content_hash").orderBy(F.col("doc_id"))
    firsts = hashed.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    return firsts.join(
        cache.select(F.col(cache_hash_col).alias("content_hash")).distinct(),
        on="content_hash",
        how="left_anti",
    )


def embedding_provider_udf(provider: Callable[[list[str]], list[list[float]]] | None = None, dims: int = 64):
    """E1 EmbedBatch as an Arrow-batched pandas UDF. The provider callable
    maps a list of texts → list of vectors (sub-batching/HTTP retries live
    inside the provider, like OllamaEmbeddingProvider.cs:51-110 batches 16
    texts per call). Defaults to the deterministic hash embedder."""

    fn = provider or (lambda texts: [embed_py(t, dims) for t in texts])

    @F.pandas_udf(ArrayType(DoubleType()))
    def _embed(texts: pd.Series) -> pd.Series:
        return pd.Series(fn([t or "" for t in texts]))

    return _embed


def http_embedding_provider(
    endpoint: str,
    model: str = "nomic-embed-text",
    batch_size: int = 16,
    timeout: float = 30.0,
    max_retries: int = 3,
    api_key: str | None = None,
) -> Callable[[list[str]], list[list[float]]]:
    """REAL provider client for :func:`embedding_provider_udf`: POSTs
    Ollama-style JSON ``{"model": ..., "input": [...]}`` to ``endpoint``
    and reads ``{"embeddings": [[...], ...]}`` — the protocol of the
    reference's OllamaEmbeddingProvider (OllamaEmbeddingProvider.cs:51-110),
    including its sub-batching at ``batch_size`` texts per call.

    * stdlib ``urllib`` only (no client library assumptions); the closure
      captures just strings/numbers, so it serializes cleanly to executors
      and each Python worker opens its own connections — no driver-side
      session object crosses the wire (same discipline as
      connectors.s3_read_objects' per-partition boto3 client);
    * retries: 5xx and connection errors back off exponentially
      (0.1·2^attempt) up to ``max_retries``; 4xx fail fast — a bad request
      will not become less bad by retrying;
    * deterministic result order: batch k's vectors land at positions
      [k·batch_size, ...) — the UDF contract (one vector per input row)
      holds by construction.

    The deterministic hash embedder stays the DEFAULT provider everywhere;
    this client is opt-in wiring for a live endpoint."""
    import json
    import time
    import urllib.error
    import urllib.request

    def call_once(batch: list[str]) -> list[list[float]]:
        body = json.dumps({"model": model, "input": batch}).encode("utf-8")
        headers = {"Content-Type": "application/json"}
        if api_key:
            headers["Authorization"] = f"Bearer {api_key}"
        req = urllib.request.Request(
            endpoint, data=body, headers=headers, method="POST"
        )
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            out = json.loads(resp.read().decode("utf-8"))
        vecs = out["embeddings"]
        if len(vecs) != len(batch):
            raise ValueError(
                f"provider returned {len(vecs)} vectors for {len(batch)} texts"
            )
        return [[float(x) for x in v] for v in vecs]

    def call_with_retry(batch: list[str]) -> list[list[float]]:
        for attempt in range(max_retries + 1):
            try:
                return call_once(batch)
            except urllib.error.HTTPError as ex:
                if ex.code < 500 or attempt == max_retries:
                    raise
            except (urllib.error.URLError, TimeoutError, ConnectionError):
                if attempt == max_retries:
                    raise
            time.sleep(0.1 * (2 ** attempt))
        raise AssertionError("unreachable")

    def provider(texts: list[str]) -> list[list[float]]:
        out: list[list[float]] = []
        for at in range(0, len(texts), batch_size):
            out.extend(call_with_retry(texts[at : at + batch_size]))
        return out

    return provider


def embed_chunks(
    chunks: DataFrame,
    existing_vectors: DataFrame | None = None,
    provider=None,
    dims: int = 64,
    model_id: str = "hash-64",
    id_col: str = "chunk_id",
    text_col: str = "content",
) -> DataFrame:
    """Full E1+E2 pipeline: hash → anti-join cache → embed distinct texts
    once → fan results back to all chunk rows (join on hash).
    Output: (chunk_id, content_hash, embedding, model_id, dimensions)."""
    hashed = chunks.select(
        F.col(id_col), F.col(text_col), F.sha2(F.col(text_col), 256).alias("content_hash")
    )
    distinct_texts = hashed.select("content_hash", text_col).dropDuplicates(["content_hash"])
    if existing_vectors is not None:
        cached = existing_vectors.filter(F.col("model_id") == model_id).select(
            "content_hash", "embedding"
        )
        to_embed = distinct_texts.join(cached.select("content_hash"), "content_hash", "left_anti")
    else:
        cached = None
        to_embed = distinct_texts
    udf = embedding_provider_udf(provider, dims)
    fresh = to_embed.select("content_hash", udf(F.col(text_col)).alias("embedding"))
    all_vecs = fresh if cached is None else fresh.unionByName(cached)
    return (
        hashed.join(all_vecs, "content_hash")
        .select(
            F.col(id_col),
            "content_hash",
            "embedding",
            F.lit(model_id).alias("model_id"),
            F.lit(dims).alias("dimensions"),
        )
    )
