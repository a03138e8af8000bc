"""LLM answer stage (RAG): assemble top-k search hits into a grounded
prompt and complete it with a pluggable LLM provider.

Reference surface: ILlmProvider {CompleteAsync, StreamAsync}
(src/Connapse.Core/Interfaces/ILlmProvider.cs:7-33) with 4 provider
implementations (src/Connapse.Storage/Llm/*.cs). The reference calls the
provider per-request from the web layer; the Spark re-expression is a
batch stage over a DataFrame of (query, hits) — one Arrow batch per
provider round-trip, the same shape as the embedding provider UDF (E1).

Scale: context assembly is a groupBy on query_id (one shuffle, keyed by
the natural output key); the provider UDF is the only non-JVM stage and
is Arrow-batched. At 100 TB the hits table is already top-k-per-query
(bounded: k rows per query), so the shuffle is tiny regardless of corpus
size — cost lives in the provider calls, exactly like the reference's
"embedding API is the bottleneck" envelope (docs/architecture.md:662).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

Provider = Callable[[pd.Series], pd.Series]
"""Batch completion: prompts in → completions out (same length/order).
Real impls wrap an HTTP client and own sub-batching, mirroring
OllamaEmbeddingProvider.cs:51-110's 16-per-call loop."""


def fake_provider(prompts: pd.Series) -> pd.Series:
    """Deterministic stand-in (LLM clients are not in this container):
    digest-stamped echo of the question line, so tests can assert
    per-question stable output without a model."""
    def one(p: str) -> str:
        digest = hashlib.sha256(p.encode("utf-8")).hexdigest()[:12]
        question = p.splitlines()[-1] if p else ""
        return f"[{digest}] {question}"
    return prompts.map(one)


def build_prompts(
    hits: DataFrame,
    query_col: str = "query",
    text_col: str = "content",
    score_col: str = "score",
    max_context: int = 5,
) -> DataFrame:
    """(query, content, score) hit rows → one prompt row per query:
    top-`max_context` hits by score, newline-joined above the question.
    Pure JVM: slice(array_sort(collect_list(struct))) keeps ordering
    inside the aggregate — no window, one shuffle on the query key."""
    ranked = F.expr(
        f"slice(array_sort(collect_list(struct({score_col} as s, {text_col} as t)),"
        " (a, b) -> case when a.s > b.s then -1 when a.s < b.s then 1"
        " when a.t < b.t then -1 when a.t > b.t then 1 else 0 end),"
        f" 1, {int(max_context)})"
    )
    return (
        hits.groupBy(F.col(query_col).alias("query"))
        .agg(ranked.alias("_ctx"))
        .select(
            "query",
            F.size("_ctx").alias("n_context"),
            F.concat(
                F.lit("Answer from the context below.\n\n"),
                F.array_join(F.transform("_ctx", lambda c: c["t"]), "\n---\n"),
                F.lit("\n\n"),
                F.col("query"),
            ).alias("prompt"),
        )
    )


def answer(
    prompts: DataFrame,
    provider: Provider = fake_provider,
    prompt_col: str = "prompt",
) -> DataFrame:
    """Complete each prompt. One pandas-UDF column — Arrow moves whole
    batches to the provider callable, never row-at-a-time."""
    complete = F.pandas_udf(provider, StringType())
    return prompts.withColumn("answer", complete(F.col(prompt_col)))


def sql_rag_answer(hits_sql: str, max_context: int = 5) -> str:
    """DuckDB mirror of build_prompts + answer(fake_provider): the fake
    provider is sha256-of-prompt stamped onto the question line, so the
    whole stage is oracle-checkable."""
    nl = "chr(10)"
    sep = f"{nl}||'---'||{nl}"
    return f"""
WITH h AS ({hits_sql}),
ranked AS (
  SELECT query, content, score,
         row_number() OVER (PARTITION BY query ORDER BY score DESC, content ASC) AS rn
  FROM h
),
p AS (
  SELECT query,
         count(*) AS n_context,
         'Answer from the context below.' || {nl} || {nl} ||
           string_agg(content, {sep} ORDER BY score DESC, content ASC) ||
           {nl} || {nl} || query AS prompt
  FROM ranked WHERE rn <= {int(max_context)}
  GROUP BY query
)
SELECT query, n_context, length(prompt) AS prompt_chars,
       '[' || substr(sha256(prompt), 1, 12) || '] ' || query AS answer
FROM p
ORDER BY query
""".strip()


def rag_answer(
    hits: DataFrame,
    provider: Provider = fake_provider,
    query_col: str = "query",
    text_col: str = "content",
    score_col: str = "score",
    max_context: int = 5,
) -> DataFrame:
    """search hits → grounded answers: the reference's ask-your-documents
    flow as one lazy plan (hydrate → prompt → complete)."""
    return answer(
        build_prompts(
            hits,
            query_col=query_col,
            text_col=text_col,
            score_col=score_col,
            max_context=max_context,
        ),
        provider=provider,
    )
