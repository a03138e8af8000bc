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
``count_distinct`` over a hot key, where a naive reducer materializes
the key's whole value universe.

How each family stays bounded:

* **monoid aggs** (sum, count, min, max, avg): two-stage salting — stage
  1 aggregates on (keys + salt), stage 2 merges ``n_salts`` scalar
  partials per key. Every task's state is O(1) per (key, salt).
* **count_distinct** (exact): NOT salted-set-union — merging per-salt
  sets would re-concentrate the hot key's full universe in the stage-2
  task. Instead the classic two-shuffle distinct: dedup on
  (keys, value) — the shuffle key INCLUDES the value, so a hot key's
  universe spreads across the whole cluster — then a per-key COUNT
  (monoid). No task ever holds more than its shuffle partition's share.
* **collect_set**: two-stage salted set-union. The intermediate state is
  bounded by |universe|/n_salts per task, but the RESULT row itself
  carries the key's full set — inherently |universe|-sized. Use it when
  the sets are known-small; for hot-key cardinality use count_distinct
  (exact, bounded) or a sketch (textstats.linear-counting / CMS).

Each aggregate is decomposable into (partial, merge) pairs — exactly the
algebraic/commutative-monoid condition map-side combine already
requires. The result is EXACTLY the unsalted answer — the oracle entry
hash-checks that equivalence, and the salt column never escapes.

Reference has no analogue (single-node engines do not shuffle); this is
pure Spark-scale machinery, same family as sampling.hash_bucket_expr's
deterministic bucketing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MONOID = {"sum", "sum_long", "count", "min", "max", "avg", "collect_set"}
_DECOMPOSABLE = _MONOID | {"count_distinct"}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    salt_on: str | None = None,
) -> DataFrame:
    """GROUP BY ``keys`` with skew-resistant execution: monoid aggs run
    salted two-stage (partials on keys + salt, merge on keys);
    count_distinct runs as a (keys, value)-keyed dedup + per-key count
    (see the module docstring for why set-union salting would NOT bound
    the merge task).

    ``aggs`` maps output column name → (agg, input column), with agg in
    {sum, count, min, max, avg, count_distinct, collect_set}.

    ``salt_on`` picks the salt source. The default is a CONTENT hash of
    the grouping keys plus every monoid input column
    (``pmod(hash(keys…, inputs…), n_salts)``) — fully deterministic
    under partition replay. The earlier default
    (``monotonically_increasing_id() % n_salts``) was the SPARK-23207
    indeterminate-shuffle class: an executor-loss replay can reorder the
    recomputed partition, reassign salts, and silently duplicate or lose
    stage-1 partials in exactly the large-cluster regime this module
    targets — never acceptable for a default. The trade: rows that are
    byte-identical IN THE HASHED COLUMNS share one salt bucket, so a hot
    key whose rows are all identical does not spread; pass ``salt_on``
    naming any higher-cardinality stable column (an id, an event time)
    to spread such keys. The RESULT is identical either way: monoid
    merges make the answer salt-assignment-independent, which the oracle
    entry verifies cell-for-cell.
    """
    if not aggs:
        raise ValueError("aggs must name at least one aggregate")
    for out, (agg, _col) in aggs.items():
        if agg not in _DECOMPOSABLE:
            raise ValueError(
                f"{out}: '{agg}' is not decomposable for salting "
                f"(supported: {sorted(_DECOMPOSABLE)})"
            )
    monoid = {o: a for o, a in aggs.items() if a[0] in _MONOID}
    distincts = {o: a for o, a in aggs.items() if a[0] == "count_distinct"}

    base: DataFrame | None = None
    if monoid:
        if salt_on is not None:
            salt: Column = F.pmod(F.hash(F.col(salt_on)), F.lit(n_salts))
        else:
            from pyspark.sql.types import MapType

            maps = {
                f.name for f in df.schema.fields if isinstance(f.dataType, MapType)
            }
            hashed = list(
                dict.fromkeys(
                    keys
                    + [
                        c
                        for _, (_, c) in sorted(monoid.items())
                        if c != "*" and c not in maps
                    ]
                )
            )
            if set(hashed) <= set(keys):
                # hashing only the grouping keys gives every row of a group
                # the SAME salt — the hot key would collapse into one
                # stage-1 partition, silently defeating the module. Widen
                # the hash with the frame's other hashable columns (maps
                # are not hashable in Spark).
                extra = [
                    f.name
                    for f in df.schema.fields
                    if f.name not in hashed and not isinstance(f.dataType, MapType)
                ]
                hashed += extra
                if set(hashed) <= set(keys):
                    raise ValueError(
                        "salted_agg: no non-key hashable column exists to "
                        "derive a deterministic spreading salt — pass "
                        "salt_on naming a stable column"
                    )
            salt = F.pmod(F.hash(*[F.col(c) for c in hashed]), F.lit(n_salts))
        salted = df.withColumn("_salt", salt)
        partials, merges = [], []
        for out, (agg, col) in monoid.items():
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
            elif agg == "collect_set":
                partials.append(F.collect_set(col).alias(f"_pd_{out}"))
                merges.append(
                    F.array_sort(
                        F.array_distinct(F.flatten(F.collect_list(f"_pd_{out}")))
                    ).alias(out)
                )
        stage1 = salted.groupBy(*keys, "_salt").agg(*partials)
        base = stage1.groupBy(*keys).agg(*merges)

    if distincts and base is None:
        # no monoid aggs to carry the group set: every key must still
        # appear, even when its distinct column is entirely NULL
        base = df.select(*keys).distinct()
    for out, (_agg, col) in distincts.items():
        # shuffle keyed by (keys, value): the hot key's universe spreads
        # across every partition; the count merge is a bounded monoid
        cd = (
            df.filter(F.col(col).isNotNull())
            .select(*keys, col)
            .distinct()
            .groupBy(*keys)
            .agg(F.count(F.lit(1)).cast("long").alias(out))
        )
        # per-key frames (post-aggregate); the join must be NULL-SAFE —
        # a NULL grouping key is a real group (SQL GROUP BY semantics),
        # and keys absent from the distinct side had only NULL values:
        # count(DISTINCT) there is 0
        cd = cd.select(
            *[F.col(k).alias(f"_cd_{k}") for k in keys], F.col(out)
        )
        cond = None
        for k in keys:
            eq = base[k].eqNullSafe(cd[f"_cd_{k}"])
            cond = eq if cond is None else cond & eq
        base = (
            base.join(cd, cond, "left")
            .drop(*[f"_cd_{k}" for k in keys])
            .withColumn(out, F.coalesce(F.col(out), F.lit(0).cast("long")))
        )
    assert base is not None  # aggs validated non-empty by construction
    return base.select(*keys, *aggs)


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
