"""Pure-SQL surface: the example queries must run, match their Python-API
twins, and stay JVM-side (no Python UDF eval in any plan)."""

import pytest
from pyspark.sql import functions as F

from connapse_spark import sql_surface


@pytest.fixture(scope="module", autouse=True)
def surface(spark, sf_dir):
    sql_surface.register_tables(spark, sf_dir)
    sql_surface.register_functions(spark)
    yield


def test_examples_run_and_stay_jvm_side(spark):
    for name, q in sql_surface.example_queries().items():
        df = spark.sql(q)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name
        assert df.count() > 0, name


def test_sql_knn_matches_python_api(spark, sf_dir):
    import os

    from connapse_spark.functions.vector import cosine_expr, to_double_array

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    q = emb.filter(F.col("vec_id") == 0).select(
        to_double_array(F.col("embedding")).alias("_qv")
    )
    py = (
        emb.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            cosine_expr(to_double_array(F.col("embedding")), F.col("_qv")).alias("score"),
        )
        .orderBy(F.desc("score"), "vec_id")
        .limit(10)
        .collect()
    )
    sql = spark.sql(sql_surface.example_queries()["sql_knn"]).collect()
    assert [r["vec_id"] for r in sql] == [r["vec_id"] for r in py]
    assert [r["score"] for r in sql] == [r["score"] for r in py]


def test_sql_zorder_matches_python_api(spark, sf_dir):
    import os

    from connapse_spark.plans.zorder import zorder_key_expr

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).limit(100)
    py = {
        r["o_orderkey"]: r["z"]
        for r in orders.select(
            "o_orderkey",
            zorder_key_expr([F.col("o_custkey"), F.col("o_orderkey")], bits=14).alias("z"),
        ).collect()
    }
    sql = spark.sql(sql_surface.example_queries()["sql_zorder"]).collect()
    for r in sql:
        assert r["zkey"] == py[r["o_orderkey"]]


def test_sql_token_count_matches_python_api(spark, sf_dir):
    import os

    from connapse_spark.operators.textstats import token_count_bpeish_expr

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).limit(100)
    py = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", token_count_bpeish_expr(F.col("text")).alias("n")
        ).collect()
    }
    for r in spark.sql(sql_surface.example_queries()["sql_token_stats"]).collect():
        assert r["n_bpe"] == py[r["doc_id"]], r["doc_id"]
