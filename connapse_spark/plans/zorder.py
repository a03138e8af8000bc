"""Z-order (Morton) clustering — layout-as-index for MULTI-column pruning.

The bucketed sink (sources/sinks.py write_bucketed) co-locates one join
key; min/max row-group pruning after a plain sort helps one filter column.
When probes filter on TWO dimensions (customer AND date, domain AND
quality band), a linear sort on either leaves the other unclustered. The
standard lakehouse answer (Delta OPTIMIZE ZORDER, Iceberg sort orders;
Morton 1966) interleaves the bits of both keys so rows close in EITHER
dimension land in the same files: after repartitionByRange +
sortWithinPartitions on the z-value, every file's min/max envelope is
narrow on BOTH columns and parquet row-group skipping fires for either
predicate.

All integer bit arithmetic — the DuckDB mirror is exact, and the z-key is
deterministic under any partitioning.

Scale (100 TB): one range shuffle (the same cost as any sorted write);
the z-key itself is a map-side projection. Range boundaries come from
Spark's reservoir sampling — no extra pass. Probes pay zero: pruning is
parquet-stat skipping on the natural columns, no key rewrite at read time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key_expr(cols: list[Column], bits: int = 16) -> Column:
    """Morton-interleave ``bits`` low bits of each column (values are
    masked into [0, 2^bits); callers normalize wider domains first —
    rank/bucket/epoch-day — exactly like Delta's range-id preprocessing).
    Bit i of column c lands at output bit i·n_cols + c: literal shifts
    only, no UDF, whole-stage codegen."""
    n = len(cols)
    if not 1 <= n * bits <= 63:
        raise ValueError("n_cols * bits must fit a signed 64-bit key")
    acc = F.lit(0).cast("bigint")
    for ci, col in enumerate(cols):
        v = col.cast("bigint").bitwiseAND(F.lit((1 << bits) - 1))
        for i in range(bits):
            acc = acc + F.shiftleft(
                F.shiftright(v, i).bitwiseAND(F.lit(1)), i * n + ci
            ).cast("bigint")
    return acc


def sql_zorder_key(cols: list[str], bits: int = 16) -> str:
    """DuckDB mirror — same masks and shifts, term for term."""
    n = len(cols)
    terms = []
    for ci, c in enumerate(cols):
        v = f"(CAST({c} AS BIGINT) & {(1 << bits) - 1})"
        for i in range(bits):
            terms.append(f"((({v} >> {i}) & 1) << {i * n + ci})")
    return "(" + " + ".join(terms) + ")"


def normalized_zorder_cols(
    df: DataFrame, cols: list[str], bits: int = 16
) -> list[Column]:
    """Min/max-scale every key column onto the SAME [0, 2^bits) domain
    before interleaving. This is not cosmetic: with mismatched widths
    (custkey in [0,150) vs orderkey in [0,15000)) every significant z-bit
    comes from the wide column and the layout silently degrades to a
    single-column sort — the exact failure
    tests/test_round3.py::test_write_zordered_narrows_both_dimensions
    pins. Delta's OPTIMIZE ZORDER does the same via range-ids.

    The min/max pass is one tiny aggregate (at 100 TB read it from catalog
    column stats instead — same two numbers per column, zero scans)."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_lo_{c}"), F.max(c).alias(f"_hi_{c}")]
    stats = df.agg(*aggs).collect()[0]
    out = []
    top = (1 << bits) - 1
    for c in cols:
        lo, hi = stats[f"_lo_{c}"], stats[f"_hi_{c}"]
        if lo is None or hi is None:  # empty input: any constant key works
            lo, hi = 0, 0
        rng = max(hi - lo, 1)
        out.append(
            ((F.col(c) - F.lit(lo)).cast("double") * top / rng).cast("bigint")
        )
    return out


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    n_files: int = 8,
) -> None:
    """Cluster-and-write: normalize key domains → z-key projection → range
    repartition on the key (Spark samples boundaries; one shuffle) → sort
    within partitions → parquet. The z-key is NOT written — it is a layout
    decision, not data; re-deriving it is a projection away."""
    keyed = df.withColumn(
        "_zkey", zorder_key_expr(normalized_zorder_cols(df, cols, bits), bits)
    )
    (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
