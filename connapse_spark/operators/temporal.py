"""Temporal join operators — as-of join, banded range join, and
hierarchical time rollup. These are the classic time-series/OLAP operators
Spark's DataFrame API lacks as primitives (the brief's "custom operators"
list names as-of and range joins explicitly); each is expressed as a
composition of built-in ops that shuffles ONCE on the join key, never as a
cartesian or a driver loop, so the plans survive a 100× scale-up.

All three have exact DuckDB mirrors (DuckDB has native ASOF JOIN — the
oracle uses it, making the mirror an independent implementation rather
than a restatement, which is the strongest correctness check available).

Determinism discipline (memory: oracle-bit-parity): timestamps are integer
epoch micros end-to-end, money folds integer cents, every output is
ordered with an id tie-break, and NULL-producing left joins coalesce to
sentinel -1 so the driver canonicalizer never sees NaN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from connapse_spark.operators.events import _epoch_us, epoch_us_any

THIRTY_DAYS_US = 30 * 86_400 * 1_000_000


# ---------------------------------------------------------------------------
# As-of join (union + keyed sort + last-non-null window)
# ---------------------------------------------------------------------------


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_val: str,
) -> DataFrame:
    """For every left row, the single right row with the LARGEST
    ``right_ts <= left_ts`` for the same key (inclusive — a right row AT
    the left timestamp matches), i.e. DuckDB/QuestDB/kdb ``ASOF JOIN``.

    Implementation is the scalable union trick, not a join: tag both sides,
    union, and run ONE window per key ordered by (ts, side) with right rows
    sorting before left rows at equal ts; ``last(value, ignorenulls)`` over
    the unbounded-preceding frame carries the latest right value forward
    into each left row. One shuffle on the key, per-key linear merge —
    exactly the distributed merge-join an MPP engine does for ASOF, and
    immune to the |L|·|R| blowup of the naive range-join formulation.

    Right rows must be unique per (key, right_ts) — pre-aggregate ties
    before calling (the query entries keep max id per instant).

    Returns the left columns plus ``_asof_val`` / ``_asof_ts`` (NULL when
    no right row precedes the left row).
    """
    lcols = [c for c in left.columns]
    l = left.select(
        *lcols,
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(dict(right.dtypes)[right_val]).alias("_rv"),
        F.lit(None).cast("long").alias("_rt"),
    )
    r = right.select(
        F.col(key),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols if c != key],
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.col(right_val).alias("_rv"),
        F.col(right_ts).cast("long").alias("_rt"),
    )
    u = l.unionByName(r.select(*l.columns))
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_t"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        u.withColumn("_asof_val", F.last("_rv", ignorenulls=True).over(w))
        .withColumn("_asof_ts", F.last("_rt", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
        .drop("_t", "_side", "_rv", "_rt")
    )


def purchase_view_attribution(events: DataFrame) -> DataFrame:
    """Attribution query on the as-of kernel: each ``purchase`` event joined
    to the user's latest prior-or-simultaneous ``view`` event. Output
    (event_id, user_id, ts_us, view_event_id, view_gap_us) with -1
    sentinels for never-viewed users."""
    base = events.select(
        "user_id", "event_id", "event_type", _epoch_us("ts").alias("t")
    )
    purchases = base.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id"), F.col("t")
    )
    views = (
        base.filter(F.col("event_type") == "view")
        .groupBy("user_id", "t")  # unique per instant: max id wins
        .agg(F.max("event_id").alias("view_id"))
    )
    out = asof_join(purchases, views, key="user_id", left_ts="t",
                    right_ts="t", right_val="view_id")
    return out.select(
        F.col("event_id"),
        F.col("user_id"),
        F.col("t").alias("ts_us"),
        F.coalesce(F.col("_asof_val"), F.lit(-1)).alias("view_event_id"),
        F.coalesce(F.col("t") - F.col("_asof_ts"), F.lit(-1)).alias("view_gap_us"),
    ).orderBy("event_id")


def sql_purchase_view_attribution() -> str:
    """Mirror via DuckDB's NATIVE ASOF JOIN — an independent engine
    implementation of the same semantics (inclusive >=, latest right row
    per key), so agreement here checks the union-window trick itself."""
    return """
WITH base AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS t FROM events
),
l AS (SELECT user_id, event_id, t FROM base WHERE event_type = 'purchase'),
r AS (
  SELECT user_id, t, max(event_id) AS view_id
  FROM base WHERE event_type = 'view' GROUP BY user_id, t
)
SELECT l.event_id, l.user_id, l.t AS ts_us,
       coalesce(r.view_id, -1) AS view_event_id,
       coalesce(l.t - r.t, -1) AS view_gap_us
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.t >= r.t
ORDER BY event_id
""".strip()


# ---------------------------------------------------------------------------
# Banded range join (equi-key + time band)
# ---------------------------------------------------------------------------


def repeat_orders_window(
    orders: DataFrame, window_us: int = THIRTY_DAYS_US
) -> DataFrame:
    """Per order: how many orders the same customer placed in the PRECEDING
    ``window_us`` (exclusive of the order instant), and their exact total
    in cents — the classic repeat-purchase banded range join.

    Scale shape: the self-join is EQUI on o_custkey (one shuffle, AQE
    skew-splittable) with the band as a post-join filter; per-customer
    cardinality is bounded (TPC-H ~10 orders/customer), so per-key work is
    O(k²) with tiny k. For keys with unbounded per-key history use
    ``repeat_orders_window_bucketed`` (the production entry path), which
    joins on (key, time-bin) so a key's history spreads across bins.
    Money folds integer cents (exact, order-independent).
    """
    o = orders.select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_custkey").alias("ckey"),
        epoch_us_any(orders, "o_orderdate", unit="us").alias("t"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    a, b = o.alias("a"), o.alias("b")
    j = a.join(
        b,
        (F.col("a.ckey") == F.col("b.ckey"))
        & (F.col("b.t") < F.col("a.t"))
        & (F.col("b.t") >= F.col("a.t") - F.lit(window_us)),
        "left",
    )
    return (
        j.groupBy(F.col("a.okey").alias("o_orderkey"))
        .agg(
            F.count(F.col("b.okey")).alias("n_prior"),
            F.coalesce(F.sum(F.col("b.cents")), F.lit(0)).alias("prior_cents"),
        )
        .orderBy("o_orderkey")
    )


def repeat_orders_window_bucketed(
    orders: DataFrame, window_us: int = THIRTY_DAYS_US
) -> DataFrame:
    """Same contract as ``repeat_orders_window``, built as a TIME-BIN
    BUCKETED band join — the shape that survives unbounded per-key history
    (the plain equi-key variant goes O(k²) when one key accumulates k
    rows).

    Both sides bucket into bins of the band width: ``bin = t div W``. A
    band ``[a.t − W, a.t)`` has length exactly W, so it intersects at most
    TWO bins (a.t's own bin and the one before). Each probe row explodes
    to those two (key, bin) probes; the join is EQUI on (key, bin) with
    the band as a residual predicate. Every right row lives in exactly one
    bin, so no probe double-counts. The shuffle key is (key, bin): a
    hot key's years of history spread across its bins instead of
    converging on one reducer, and per-bin candidate lists are bounded by
    the key's arrival RATE, not its lifetime. This is the standard
    bucketed interval-join layout (Flink's interval join and DuckDB's IEJoin
    literature use the same binning argument).

    2× probe duplication is the entire overhead — a constant factor on
    the probe side against an asymptotic win on skewed keys; the
    skewed-fixture unit pins both implementations equal row-for-row.
    """
    o = orders.select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_custkey").alias("ckey"),
        epoch_us_any(orders, "o_orderdate", unit="us").alias("t"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    binf = F.floor(F.col("t") / F.lit(window_us)).cast("long")
    right = o.withColumn("bin", binf)
    probes = o.withColumn("bin", F.explode(F.array(binf, binf - F.lit(1))))
    a, b = probes.alias("a"), right.alias("b")
    j = a.join(
        b,
        (F.col("a.ckey") == F.col("b.ckey"))
        & (F.col("a.bin") == F.col("b.bin"))
        & (F.col("b.t") < F.col("a.t"))
        & (F.col("b.t") >= F.col("a.t") - F.lit(window_us)),
        "left",
    )
    # each okey contributes two probe rows; a right row matches through
    # its own bin's probe only, so the per-okey aggregate is exact
    return (
        j.groupBy(F.col("a.okey").alias("o_orderkey"))
        .agg(
            F.count(F.col("b.okey")).alias("n_prior"),
            F.coalesce(F.sum(F.col("b.cents")), F.lit(0)).alias("prior_cents"),
        )
        .orderBy("o_orderkey")
    )


def sql_repeat_orders_window(window_us: int = THIRTY_DAYS_US) -> str:
    return f"""
WITH o AS (
  SELECT o_orderkey AS okey, o_custkey AS ckey, epoch_us(o_orderdate) AS t,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
)
SELECT a.okey AS o_orderkey,
       count(b.okey) AS n_prior,
       CAST(coalesce(sum(b.cents), 0) AS BIGINT) AS prior_cents
FROM o a LEFT JOIN o b
  ON a.ckey = b.ckey AND b.t < a.t AND b.t >= a.t - {window_us}
GROUP BY a.okey ORDER BY o_orderkey
""".strip()


# ---------------------------------------------------------------------------
# Hierarchical time rollup (grouping sets)
# ---------------------------------------------------------------------------


def events_rollup(events: DataFrame, granularity: str = "day") -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: (bucket, event_type)
    leaf cells PLUS per-bucket and grand totals in ONE aggregation pass via
    ROLLUP grouping sets — a single exchange with map-side partials; the
    naive union-of-three-groupBys scans and shuffles three times. NULL
    grouping slots render as 'ALL' (neither source column is nullable, so
    the sentinel is unambiguous)."""
    day = F.date_format(F.date_trunc(granularity, F.col("ts")), "yyyy-MM-dd")
    return (
        events.select(
            day.alias("bucket"),
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .rollup("bucket", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("value_cents"),
        )
        .select(
            F.coalesce(F.col("bucket"), F.lit("ALL")).alias("bucket"),
            F.coalesce(F.col("event_type"), F.lit("ALL")).alias("event_type"),
            "n_events",
            "value_cents",
        )
        .orderBy("bucket", "event_type")
    )


def sql_events_rollup(granularity: str = "day") -> str:
    return f"""
SELECT coalesce(bucket, 'ALL') AS bucket,
       coalesce(event_type, 'ALL') AS event_type,
       count(*) AS n_events,
       CAST(sum(cents) AS BIGINT) AS value_cents
FROM (
  SELECT strftime(date_trunc('{granularity}', ts), '%Y-%m-%d') AS bucket,
         event_type,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
)
GROUP BY ROLLUP (bucket, event_type)
ORDER BY bucket, event_type
""".strip()
