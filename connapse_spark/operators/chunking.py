"""Spark-side chunking operators.

Two tiers:
 1. Pandas-UDF chunkers wrapping the pure-Python cores in chunkers.py —
    token-aware semantics (C1-C7), parallel across documents, Arrow-batched.
 2. Column-expression chunkers (char-window fixed-size, token sentence-
    window) — fully Catalyst-planned AND DuckDB-oracle-checkable; these are
    the scale path when byte/char budgets suffice (e.g. pre-tokenization
    packing at 100 TB where a whole-stage-codegen'd substring beats any UDF).
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    MapType,
    StringType,
    StructField,
    StructType,
)
from pyspark.sql.window import Window

from connapse_spark.operators.chunkers import ChunkingSettings, chunk_document

CHUNK_STRUCT = StructType(
    [
        StructField("content", StringType()),
        StructField("chunk_index", IntegerType()),
        StructField("token_count", IntegerType()),
        StructField("start_offset", IntegerType()),
        StructField("end_offset", IntegerType()),
        StructField("metadata", MapType(StringType(), StringType())),
    ]
)


def chunk_udf(strategy: str = "Recursive", settings: ChunkingSettings | None = None):
    """Arrow-batched scalar pandas UDF: text → array<chunk struct>.
    The settings object is closure-captured (broadcast with the task)."""
    s = settings or ChunkingSettings()

    @F.pandas_udf(ArrayType(CHUNK_STRUCT))
    def _chunk(texts: pd.Series, exts: pd.Series) -> pd.Series:
        out = []
        for text, ext in zip(texts, exts):
            chunks = chunk_document(text or "", strategy, ext or "", s)
            out.append(
                [
                    (
                        c["content"],
                        c["chunk_index"],
                        c["token_count"],
                        c["start_offset"],
                        c["end_offset"],
                        c["metadata"],
                    )
                    for c in chunks
                ]
            )
        return pd.Series(out)

    return _chunk


def chunk_documents(
    docs: DataFrame,
    strategy: str = "Recursive",
    settings: ChunkingSettings | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    ext_col: str | None = None,
) -> DataFrame:
    """documents → chunks: one UDF call per Arrow batch, then posexplode.
    Output schema mirrors the reference chunks table (FIXTURES.md)."""
    ext = F.col(ext_col) if ext_col else F.lit("")
    udf = chunk_udf(strategy, settings)
    exploded = docs.select(
        F.col(id_col).alias("document_id"),
        F.explode(udf(F.col(text_col), ext)).alias("c"),
    )
    return exploded.select(
        F.concat(F.col("document_id").cast("string"), F.lit(":"), F.col("c.chunk_index")).alias(
            "chunk_id"
        ),
        "document_id",
        F.col("c.content").alias("content"),
        F.col("c.chunk_index").alias("chunk_index"),
        F.col("c.token_count").alias("token_count"),
        F.col("c.start_offset").alias("start_offset"),
        F.col("c.end_offset").alias("end_offset"),
        F.col("c.metadata").alias("metadata"),
    )


# ---------------------------------------------------------------------------
# Column-expression chunkers (oracle-checkable, zero Python)
# ---------------------------------------------------------------------------


def chunk_fixed_char(
    docs: DataFrame,
    size: int = 200,
    step: int = 160,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Char-window fixed-size chunker: windows of `size` chars advancing by
    `step` (overlap = size − step). n_chunks = 1 + floor((len−1)/step) for
    the windows whose start < len; trailing window may be short.
    Pure posexplode(sequence) + substring — whole-stage codegen end to end.
    """
    n = F.length(F.col(text_col))
    n_chunks = F.when(n <= 0, F.lit(0)).otherwise(
        F.floor((n - 1) / F.lit(step)).cast("int") + 1
    )
    return (
        docs.select(
            F.col(id_col).alias("document_id"),
            F.col(text_col),
            F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_index", "_i"),
        )
        .select(
            "document_id",
            "chunk_index",
            F.substring(F.col(text_col), F.col("chunk_index") * step + 1, size).alias("content"),
            (F.col("chunk_index") * step).alias("start_offset"),
            F.least(F.col("chunk_index") * F.lit(step) + size, F.length(text_col)).alias(
                "end_offset"
            ),
        )
        .orderBy("document_id", "chunk_index")
    )


def sql_chunk_fixed_char(size: int = 200, step: int = 160) -> str:
    return f"""
SELECT document_id, chunk_index,
       substr(text, chunk_index * {step} + 1, {size}) AS content,
       chunk_index * {step} AS start_offset,
       least(chunk_index * {step} + {size}, length(text)) AS end_offset
FROM (
  SELECT doc_id AS document_id, text,
         unnest(range(0, CASE WHEN length(text) <= 0 THEN 0
                              ELSE CAST(floor((length(text) - 1) / {step}) AS INT) + 1 END)) AS chunk_index
  FROM documents
)
ORDER BY document_id, chunk_index
""".strip()


def chunk_token_window(
    docs: DataFrame,
    window: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """C5 SentenceWindow semantics on the token stream (the synthetic corpus
    has no sentence punctuation): each token is a 'sentence'; the window
    column joins the ±window neighbors — literally
    ``Window.partitionBy(doc).orderBy(idx).rowsBetween(-w, +w)``
    (SentenceWindowChunker.cs:15-101 mapping in SURVEY §2.4)."""
    from connapse_spark.functions.text import tokens_exact_expr

    toks = docs.select(
        F.col(id_col).alias("document_id"),
        F.posexplode(tokens_exact_expr(F.col(text_col))).alias("chunk_index", "content"),
    )
    w = (
        Window.partitionBy("document_id")
        .orderBy("chunk_index")
        .rowsBetween(-window, window)
    )
    return toks.select(
        "document_id",
        "chunk_index",
        "content",
        F.concat_ws(" ", F.collect_list("content").over(w)).alias("window"),
    ).orderBy("document_id", "chunk_index")


def sql_chunk_token_window(window: int = 3) -> str:
    from connapse_spark.functions.text import sql_tokens_exact

    return f"""
SELECT document_id, chunk_index, content,
       string_agg(content, ' ') OVER (
         PARTITION BY document_id ORDER BY chunk_index
         ROWS BETWEEN {window} PRECEDING AND {window} FOLLOWING) AS window
FROM (
  SELECT document_id,
         unnest(range(1, len(toks) + 1)) - 1 AS chunk_index,
         unnest(toks) AS content
  FROM (SELECT doc_id AS document_id, {sql_tokens_exact('text')} AS toks FROM documents)
)
ORDER BY document_id, chunk_index
""".strip()
