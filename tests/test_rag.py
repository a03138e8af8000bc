"""LLM answer stage (operators/rag.py): prompt assembly determinism,
context ordering/truncation, and provider pluggability — the ILlmProvider
surface (ILlmProvider.cs:7-33) with a deterministic fake."""

import pandas as pd
from pyspark.sql import functions as F

from connapse_spark.operators import rag


def _hits(spark):
    rows = [
        ("what is spark?", "doc about joins", 0.2),
        ("what is spark?", "doc about spark core", 0.9),
        ("what is spark?", "doc about shuffles", 0.5),
        ("what is duckdb?", "duckdb overview", 0.8),
    ]
    return spark.createDataFrame(rows, "query string, content string, score double")


def test_build_prompts_orders_by_score_and_truncates(spark):
    out = rag.build_prompts(_hits(spark), max_context=2).orderBy("query").collect()
    assert [r["query"] for r in out] == ["what is duckdb?", "what is spark?"]
    spark_row = out[1]
    assert spark_row["n_context"] == 2
    body = spark_row["prompt"]
    # best hit first, third-ranked hit cut by max_context=2
    assert body.index("spark core") < body.index("shuffles")
    assert "joins" not in body
    assert body.rstrip().endswith("what is spark?")


def test_rag_answer_deterministic_and_pluggable(spark):
    hits = _hits(spark)
    a1 = rag.rag_answer(hits).orderBy("query").collect()
    a2 = rag.rag_answer(hits).orderBy("query").collect()
    assert [r["answer"] for r in a1] == [r["answer"] for r in a2]
    assert all(r["answer"].endswith(r["query"]) for r in a1)

    def shouty(prompts: pd.Series) -> pd.Series:
        return prompts.map(lambda p: "OK:" + str(len(p)))

    custom = rag.rag_answer(hits, provider=shouty).select("answer").collect()
    assert all(r["answer"].startswith("OK:") for r in custom)


def test_answer_stage_stays_arrow_batched(spark):
    # plan shape: completion is a single pandas-UDF projection (ArrowEvalPython),
    # not a row-at-a-time BatchEvalPython
    plan = rag.rag_answer(_hits(spark))._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
