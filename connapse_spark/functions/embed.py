"""Deterministic hash embedder (FIXTURES.md determinism rule):

    embed(text, dims)[i] =
        (int(sha256(text + ':' + str(i)).hexdigest()[:8], 16) % 2000 - 1000) / 1000.0

Three mirrored implementations:
 - ``embed_expr``  — native Spark columns (sha2 + conv), fully JVM-side so the
   embedding of a 100 TB corpus is whole-stage-codegen'd with zero Python.
 - ``sql_embed``   — DuckDB oracle SQL.
 - ``embed_py``    — pure Python (driver-side query vectors, pytest).

This stands in for the reference's external embedding providers
(IEmbeddingProvider.cs:3-7, OllamaEmbeddingProvider.cs:51-110) in all
deterministic tests; the pluggable real-provider path lives in
``operators/embedding.py`` as an Arrow-batched pandas UDF.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_DIMS = 64


def embed_expr(text: Column, dims: int = DEFAULT_DIMS) -> Column:
    """array<double> hash embedding as a pure Catalyst expression."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(dims - 1)),
        lambda i: (
            F.conv(
                F.substring(F.sha2(F.concat(text, F.lit(":"), i.cast("string")), 256), 1, 8),
                16,
                10,
            ).cast("bigint")
            % 2000
            - 1000
        )
        / 1000.0,
    )


def embed_py(text: str, dims: int = DEFAULT_DIMS) -> list[float]:
    return [
        (int(hashlib.sha256(f"{text}:{i}".encode()).hexdigest()[:8], 16) % 2000 - 1000) / 1000.0
        for i in range(dims)
    ]


def sql_embed(c: str, dims: int = DEFAULT_DIMS) -> str:
    return (
        f"list_transform(range(0, {dims}), i -> "
        f"(('0x' || substr(sha256({c} || ':' || i), 1, 8))::BIGINT % 2000 - 1000) / 1000.0)"
    )


def sql_vector_literal(vec: list[float]) -> str:
    """Emit a Python float list as a DuckDB DOUBLE[] literal. repr()
    round-trips doubles exactly, but a bare ``0.354`` literal parses as
    DECIMAL in DuckDB and stays decimal through downstream folds (a norm
    over decimals rounds differently in the last ulp — observed as a
    1-ulp cosine divergence on hybrid_many). Tagging every element
    ``::DOUBLE`` pins the whole expression tree to float math; the
    decimal→double conversion is round-to-nearest, identical to Python's
    parse, so values stay bit-exact."""
    return "[" + ", ".join(f"{v!r}::DOUBLE" for v in vec) + "]"
