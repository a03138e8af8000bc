"""Pure-SQL surface: register the corpus tables and the engine's scalar
kernels so an analyst can drive the engine from ``spark.sql`` alone — no
Python DataFrame code. Two pieces:

* :func:`register_tables` — temp views over a testdata/lakehouse dir
  (the same ten tables the oracle layer sees);
* :func:`register_functions` — the reusable scalar kernels as SQL UDFs
  expressed with Spark's ``SQL function`` facility — they are Catalyst
  EXPRESSIONS (registered via DataFrame-API lambdas), not Python UDFs, so
  calling them from SQL keeps whole-stage codegen (verified by the plan
  test: no BatchEvalPython).

Scale note: views are metadata-only; every query planned through this
surface produces the exact same physical plans as the Python API — the
point of the exercise. Parity with the Python operators is pinned by
tests/test_sql_surface.py.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def register_tables(spark: SparkSession, sf_dir: str) -> None:
    """Temp views for every corpus table (events through load_events so
    the TIMESTAMP(NANOS) drift-shield applies to SQL users too)."""
    from connapse_spark.operators.events import load_events

    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if not os.path.exists(path):
            continue
        if t == "events":
            load_events(spark, sf_dir).createOrReplaceTempView(t)
        else:
            spark.read.parquet(path).createOrReplaceTempView(t)


def _sql_zorder2(a: str, b: str, bits: int = 14) -> str:
    mask = (1 << bits) - 1
    terms = []
    for ci, c in enumerate((a, b)):
        v = f"(CAST({c} AS BIGINT) & {mask})"
        for i in range(bits):
            terms.append(f"shiftleft(shiftright({v}, {i}) & 1, {i * 2 + ci})")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def register_functions(spark: SparkSession) -> None:
    """SQL-callable kernels via Spark 4's SQL scalar UDFs
    (``CREATE TEMPORARY FUNCTION ... RETURN <expression>``, SPARK-28503):
    the body is a Catalyst expression — NOT a Python UDF — so SQL callers
    keep whole-stage codegen (the parity test asserts no BatchEvalPython
    in any example plan)."""
    dot = (
        "aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0.0 AS DOUBLE), "
        "(acc, v) -> acc + v)"
    )
    l2sq = (
        "aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), "
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    norm_a = f"sqrt({dot.replace('(a, b,', '(a, a,')})"
    norm_b = f"sqrt({dot.replace('(a, b,', '(b, b,')})"
    from connapse_spark.functions.text import spark_sql_tokens_exact
    from connapse_spark.operators.textstats import BPE_RE

    stmts = {
        "ck_dot": f"(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE RETURN {dot}",
        "ck_l2sq": f"(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE RETURN {l2sq}",
        "ck_cosine": (
            "(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE RETURN "
            f"CASE WHEN {norm_a} > 0.0 AND {norm_b} > 0.0 "
            f"THEN {dot} / ({norm_a} * {norm_b}) ELSE 0.0 END"
        ),
        "ck_tokens": (
            "(t STRING) RETURNS ARRAY<STRING> RETURN "
            f"{spark_sql_tokens_exact('t')}"
        ),
        "ck_token_count": (
            "(t STRING) RETURNS INT RETURN "
            # escape the literal backslash for the SQL string parser
            f"size(regexp_extract_all(t, '{BPE_RE.replace(chr(92), chr(92) * 2)}', 0))"
        ),
        "ck_sha_bigint": (
            "(t STRING) RETURNS BIGINT RETURN "
            "CAST(conv(substring(sha2(t, 256), 1, 8), 16, 10) AS BIGINT)"
        ),
        "ck_zorder2": (
            "(a BIGINT, b BIGINT) RETURNS BIGINT RETURN "
            + _sql_zorder2("a", "b", bits=14)
        ),
    }
    for name, body in stmts.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{body}")


def example_queries() -> dict[str, str]:
    """Queries a SQL-only user would run against the registered surface —
    each exercised by the parity test against its Python-API twin."""
    return {
        "sql_knn": """
            WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
            SELECT vec_id, ck_cosine(embedding, qv) AS score
            FROM embeddings, q
            ORDER BY score DESC, vec_id LIMIT 10
        """,
        "sql_token_stats": """
            SELECT doc_id, ck_token_count(text) AS n_bpe,
                   size(ck_tokens(text)) AS n_tokens
            FROM documents ORDER BY doc_id LIMIT 100
        """,
        "sql_exact_dedup": """
            SELECT doc_id, sha2(text, 256) AS content_hash,
                   row_number() OVER (PARTITION BY sha2(text, 256) ORDER BY doc_id) AS dup_rank
            FROM documents ORDER BY doc_id LIMIT 100
        """,
        "sql_zorder": """
            SELECT o_orderkey, ck_zorder2(o_custkey, o_orderkey) AS zkey
            FROM orders ORDER BY o_orderkey LIMIT 100
        """,
    }
