"""Column profiling (ANALYZE-style statistics) — the stats pass a planner
or a data engineer runs before pointing heavy jobs at a 100 TB table:
row/null/distinct counts, min/max, and average rendered length per column.

Spark side is ONE scan: every per-column aggregate lands in a single
``agg`` row (Catalyst turns multiple distinct aggregates into one
Expand+aggregate pipeline — still a single pass over the data, map-side
partials for the non-distinct metrics), which is then unpivoted to one
row per column with an explode over a literal struct array — no second
scan, no shuffle beyond the aggregate's own.

min/max are emitted as strings only for types whose rendering is
engine-stable (integers, strings, booleans); floats/timestamps profile
counts only (their to-string formats differ across engines, and a profile
that can't be oracle-checked is worth less than one that can).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_RENDER_STABLE = ("byte", "short", "int", "long", "bigint", "string", "boolean")


def _stable(dtype: str) -> bool:
    return any(dtype.startswith(t) for t in _RENDER_STABLE)


def column_profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """One row per column: (column_name, n_rows, n_null, n_distinct,
    min_s, max_s, avg_len)."""
    dtypes = dict(df.dtypes)
    cols = columns or list(dtypes)
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        s = F.col(c).cast("string")
        aggs += [
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"_null_{c}"),
            F.countDistinct(F.col(c)).alias(f"_nd_{c}"),
        ]
        if _stable(dtypes[c]):
            # min/max over the NATIVE type, cast after — a lexicographic
            # min over the string cast would rank '100' < '99'
            aggs += [
                F.min(F.col(c)).cast("string").alias(f"_min_{c}"),
                F.max(F.col(c)).cast("string").alias(f"_max_{c}"),
                F.round(F.avg(F.length(s)), 4).alias(f"_len_{c}"),
            ]
    one = df.agg(*aggs)
    null_s = F.lit(None).cast("string")
    structs = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.col("_n").alias("n_rows"),
            F.col(f"_null_{c}").alias("n_null"),
            F.col(f"_nd_{c}").alias("n_distinct"),
            (F.col(f"_min_{c}") if _stable(dtypes[c]) else null_s).alias("min_s"),
            (F.col(f"_max_{c}") if _stable(dtypes[c]) else null_s).alias("max_s"),
            (
                F.col(f"_len_{c}")
                if _stable(dtypes[c])
                else F.lit(None).cast("double")
            ).alias("avg_len"),
        )
        for c in cols
    ]
    return (
        one.select(F.explode(F.array(*structs)).alias("p"))
        .select("p.*")
        .orderBy("column_name")
    )


def sql_column_profile(table: str, columns: list[str], stable_cols: list[str]) -> str:
    """DuckDB mirror: same metrics, one SELECT per column UNION ALL'd (the
    oracle optimizes for clarity, not scans)."""
    parts = []
    for c in columns:
        if c in stable_cols:
            mn, mx = f"CAST(min({c}) AS VARCHAR)", f"CAST(max({c}) AS VARCHAR)"
            ln = f"round(avg(length(CAST({c} AS VARCHAR))), 4)"
        else:
            mn = mx = "CAST(NULL AS VARCHAR)"
            ln = "CAST(NULL AS DOUBLE)"
        parts.append(
            f"SELECT '{c}' AS column_name, count(*) AS n_rows, "
            f"CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null, "
            f"count(DISTINCT {c}) AS n_distinct, {mn} AS min_s, {mx} AS max_s, "
            f"{ln} AS avg_len FROM {table}"
        )
    return "\nUNION ALL\n".join(parts) + "\nORDER BY column_name"
