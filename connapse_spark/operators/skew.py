"""Skew-resistant aggregation — the salting pattern the 100 TB brief
names explicitly: a groupBy whose key distribution is Zipfian (one
mega-domain, one hot user, one empty-string bucket) sends a whole key to
ONE reducer; salting splits each key into ``n_salts`` sub-keys for a
partial aggregate, then merges the partials in a second, tiny aggregate
keyed by the true key.

AQE's skew handling covers JOINS (`skewJoin.enabled` splits oversized
partitions), but a skewed AGGREGATE still funnels each key's map-side
partial results to a single reducer task; that is usually fine (partial
aggregation has already collapsed per-partition duplicates) — the
regime where it is NOT fine is high-cardinality per-key STATE, e.g.
``collect_set``/``count_distinct`` over a hot key, where the reducer
materializes the key's whole value universe. Salting keeps every task's
state bounded by ``|key universe| / n_salts``.

Each aggregate must be decomposable into (partial, merge) pairs —
exactly the algebraic/commutative-monoid condition map-side combine
already requires. Supported here: sum, count, min, max, avg
(sum+count), count_distinct (exact — set-union via two-level distinct),
collect_set (set-union). The result is EXACTLY the unsalted answer —
the oracle entry hash-checks that equivalence, and the salt column never
escapes.

Reference has no analogue (single-node engines do not shuffle); this is
pure Spark-scale machinery, same family as sampling.hash_bucket_expr's
deterministic bucketing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# decomposition table: agg name -> (partial expr builder, merge expr builder)
_DECOMPOSABLE = {
    "sum", "sum_long", "count", "min", "max", "avg", "count_distinct",
    "collect_set",
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    salt_on: str | None = None,
) -> DataFrame:
    """GROUP BY ``keys`` with per-key salting: stage 1 aggregates on
    (keys + salt), stage 2 merges partials on keys alone.

    ``aggs`` maps output column name → (agg, input column), with agg in
    {sum, count, min, max, avg, count_distinct, collect_set}.
    ``salt_on`` picks the deterministic salt source (defaults to a
    uniform hash of the whole row via monotonically increasing id-free
    expression — here: pmod(hash of all non-key columns); pass a column
    name for a stable row identity when one exists).

    Determinism: with ``salt_on`` set, the salt is a pure function of
    that column, so the two-stage plan is replay-stable; either way the
    RESULT equals the unsalted aggregate exactly (monoid merges), which
    the oracle entry verifies cell-for-cell.
    """
    for out, (agg, _col) in aggs.items():
        if agg not in _DECOMPOSABLE:
            raise ValueError(
                f"{out}: '{agg}' is not decomposable for salting "
                f"(supported: {sorted(_DECOMPOSABLE)})"
            )
    salt_src: Column = (
        F.col(salt_on) if salt_on is not None
        else F.concat_ws("", *[F.col(c) for c in df.columns])
    )
    salt = F.pmod(F.hash(salt_src), F.lit(n_salts)).alias("_salt")
    salted = df.withColumn("_salt", salt)

    partials, merges = [], []
    for out, (agg, col) in aggs.items():
        if agg in ("sum", "sum_long"):
            partials.append(F.sum(col).alias(f"_p_{out}"))
            merges.append(F.sum(f"_p_{out}").alias(out))
        elif agg == "count":
            partials.append(F.count(col).alias(f"_p_{out}"))
            merges.append(F.sum(f"_p_{out}").cast("long").alias(out))
        elif agg == "min":
            partials.append(F.min(col).alias(f"_p_{out}"))
            merges.append(F.min(f"_p_{out}").alias(out))
        elif agg == "max":
            partials.append(F.max(col).alias(f"_p_{out}"))
            merges.append(F.max(f"_p_{out}").alias(out))
        elif agg == "avg":
            partials.append(F.sum(col).alias(f"_ps_{out}"))
            partials.append(F.count(col).alias(f"_pc_{out}"))
            merges.append(
                (F.sum(f"_ps_{out}") / F.sum(f"_pc_{out}")).alias(out)
            )
        elif agg == "count_distinct":
            # correctness never needs disjoint per-salt sets (the merge
            # re-distincts); a VALUE-derived salt additionally bounds
            # each task's set size by |universe|/n_salts
            partials.append(F.collect_set(col).alias(f"_pd_{out}"))
            merges.append(
                F.size(F.array_distinct(F.flatten(F.collect_list(f"_pd_{out}"))))
                .cast("long")
                .alias(out)
            )
        elif agg == "collect_set":
            partials.append(F.collect_set(col).alias(f"_pd_{out}"))
            merges.append(
                F.array_sort(
                    F.array_distinct(F.flatten(F.collect_list(f"_pd_{out}")))
                ).alias(out)
            )
    stage1 = salted.groupBy(*keys, "_salt").agg(*partials)
    return stage1.groupBy(*keys).agg(*merges)


def sql_salted_agg(
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    table: str = "events",
) -> str:
    """Oracle: the PLAIN unsalted aggregate — salting must be an identity
    on results, so the strongest check is equality with the direct form."""
    parts = []
    for out, (agg, col) in aggs.items():
        if agg == "sum":
            parts.append(f"sum({col}) AS {out}")
        elif agg == "sum_long":
            # DuckDB integer sums widen to HUGEINT; Spark's stay BIGINT
            parts.append(f"CAST(sum({col}) AS BIGINT) AS {out}")
        elif agg == "count":
            parts.append(f"CAST(count({col}) AS BIGINT) AS {out}")
        elif agg == "min":
            parts.append(f"min({col}) AS {out}")
        elif agg == "max":
            parts.append(f"max({col}) AS {out}")
        elif agg == "avg":
            parts.append(f"sum({col}) / count({col}) AS {out}")
        elif agg == "count_distinct":
            parts.append(f"CAST(count(DISTINCT {col}) AS BIGINT) AS {out}")
        elif agg == "collect_set":
            parts.append(f"list_sort(list(DISTINCT {col})) AS {out}")
    key_list = ", ".join(keys)
    return (
        f"SELECT {key_list}, {', '.join(parts)} FROM {table} "
        f"GROUP BY {key_list} ORDER BY {key_list}"
    )
