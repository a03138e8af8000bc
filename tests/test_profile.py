"""Column-profile units: metric correctness on a hand-built frame and the
single-scan plan guarantee."""

from __future__ import annotations

from connapse_spark.operators import profile


def test_column_profile_metrics(spark):
    df = spark.createDataFrame(
        [(1, "aa", 2.5), (2, None, 3.5), (2, "bbb", None), (100, "aa", 1.0)],
        "k long, s string, x double",
    )
    rows = {r["column_name"]: r for r in profile.column_profile(df).collect()}
    k = rows["k"]
    assert (k["n_rows"], k["n_null"], k["n_distinct"]) == (4, 0, 3)
    # native-type min/max, not lexicographic: 100 is the max, not the min
    assert (k["min_s"], k["max_s"]) == ("1", "100")
    s = rows["s"]
    assert (s["n_null"], s["n_distinct"], s["min_s"], s["max_s"]) == (1, 2, "aa", "bbb")
    assert s["avg_len"] == 2.3333
    x = rows["x"]  # render-unstable: counts only
    assert (x["n_null"], x["n_distinct"]) == (1, 3)
    assert x["min_s"] is None and x["max_s"] is None and x["avg_len"] is None


def test_column_profile_single_scan(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = profile.column_profile(df, ["o_orderkey", "o_orderstatus"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") + plan.count("BatchScan") == 1
