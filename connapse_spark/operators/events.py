"""Event-stream analytics over the ``events`` table — the batch expression
of the windowed/sessionized aggregations a streaming deployment runs via
Structured Streaming (streaming/ holds the readStream variants; the
transformations here are shared).

The reference has no true streaming engine (SURVEY.md §2.8 — change capture
is poll + delta joins); these operators are the scale-path generalization.

Determinism notes: sums of DOUBLE are order-dependent across partitions, so
oracle-checked aggregates fold integer cents (exact) instead of raw doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SESSION_GAP_SECONDS = 1800


def load_events(spark, sf_dir: str) -> DataFrame:
    """Read the driver's events.parquet, whose ``ts`` is parquet
    TIMESTAMP(NANOS) — a type Spark's vectorized reader rejects outright
    ([PARQUET_TYPE_ILLEGAL]). ``nanosAsLong`` (runtime-settable SQL conf)
    surfaces it as raw nanos; we floor-divide to micros, exactly what
    DuckDB's nanos→TIMESTAMP read does, so oracle timestamps agree.

    The driver has shipped the column as parquet TIMESTAMP(NANOS) in one
    round and plain timestamp[us] (no isAdjustedToUTC → Spark reads
    TIMESTAMP_NTZ) in another, so normalize every shape to TIMESTAMP_NTZ:
    DuckDB reads the same files as naive timestamps, and NTZ arithmetic /
    date_trunc / date_format are session-timezone-independent, so oracle
    agreement doesn't hinge on the harness's TZ setting.

    Both conversions below go through integer epoch offsets added to a
    TIMESTAMP_NTZ literal — never through an LTZ→NTZ ``cast``, which
    renders wall-clock in the *session* timezone and would shift every
    downstream window/session/epoch query on a non-UTC harness (DuckDB
    reads the same bytes as naive UTC either way)."""
    import os

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        # raw nanos → micros since epoch, as pure NTZ arithmetic
        df = df.withColumn(
            "ts", F.expr(f"timestampadd(MICROSECOND, ts div 1000, {_EPOCH_NTZ})")
        )
    elif ts_type == "timestamp":
        # instant (LTZ) → UTC wall-clock: unix_micros is TZ-independent
        df = df.withColumn(
            "ts", F.expr(f"timestampadd(MICROSECOND, unix_micros(ts), {_EPOCH_NTZ})")
        )
    return df


_EPOCH_NTZ = "to_timestamp_ntz('1970-01-01 00:00:00')"


def _epoch_us(col: str) -> "F.Column":
    """Microseconds since the naive epoch, for TIMESTAMP or TIMESTAMP_NTZ
    input (``unix_micros`` only accepts the former). Wall-clock arithmetic
    on NTZ — mirrors DuckDB's ``epoch_us`` over naive parquet timestamps."""
    return F.expr(
        f"timestampdiff(MICROSECOND, {_EPOCH_NTZ}, cast({col} as timestamp_ntz))"
    )


def epoch_us_any(df: DataFrame, col: str, unit: str = "auto") -> "F.Column":
    """Epoch micros for a timestamp column of EITHER flavor, without a
    TZ-dependent cast: LTZ instants go through unix_micros (TZ-independent);
    NTZ wall-clocks go through the naive-epoch diff. Shields operators that
    read driver parquet directly (orders.o_orderdate, lineitem.l_shipdate)
    from the same schema drift load_events absorbs for events.ts.

    Integer columns: pass ``unit`` ("s" | "ms" | "us") when the producer's
    convention is known — that is always the right call. ``auto`` (the r5
    ADVICE fix: the old code hard-assumed bigint=micros, misreading an
    epoch-seconds bigint as ~30 minutes after 1970) resolves per value by
    magnitude, the pandas ``to_datetime`` convention: |v| < 1e11 → seconds
    (covers ±3100 AD), < 1e14 → millis, else micros. The bands only
    misread instants within weeks of 1970 stored in the finer unit —
    documented, deterministic, and overridable."""
    dt = dict(df.dtypes).get(col)
    if dt == "timestamp":
        return F.unix_micros(F.col(col))
    if dt in ("bigint", "int"):
        v = F.col(col).cast("long")
        scale = {"s": 1_000_000, "ms": 1_000, "us": 1}
        if unit != "auto":
            if unit not in scale:
                raise ValueError(f"epoch_us_any: unit must be one of {sorted(scale)} or 'auto'")
            return v * F.lit(scale[unit])
        if dt == "int":
            # a 32-bit int tops out ~2.1e9 — ~35 MINUTES of epoch micros — so
            # an int column can only be epoch SECONDS; scale, don't misread
            return v * F.lit(1_000_000)
        return (
            F.when(F.abs(v) < F.lit(100_000_000_000), v * F.lit(1_000_000))
            .when(F.abs(v) < F.lit(100_000_000_000_000), v * F.lit(1_000))
            .otherwise(v)
        )
    return _epoch_us(col)


def _epoch_seconds(col: str) -> "F.Column":
    """Whole seconds since the naive epoch (floored, like cast-to-long on
    TIMESTAMP): diff against the second-truncated wall time, exact integer
    math — no double rounding."""
    return F.expr(
        f"timestampdiff(SECOND, {_EPOCH_NTZ}, date_trunc('second', cast({col} as timestamp_ntz)))"
    )


def tumbling_agg(events: DataFrame, granularity: str = "hour") -> DataFrame:
    """Tumbling-window aggregate per (window, event_type): count + exact
    value sum in cents (integer sum → partition-order independent)."""
    return (
        events.groupBy(
            # string output: pandas ns- vs us-precision datetimes hash
            # differently even when equal, so the contract column is text
            F.date_format(F.date_trunc(granularity, F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
            F.count_distinct(F.col("user_id")).alias("n_users"),
        )
        .orderBy("window_start", "event_type")
    )


def sql_tumbling_agg(granularity: str = "hour") -> str:
    return f"""
SELECT strftime(date_trunc('{granularity}', ts), '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
       count(DISTINCT user_id) AS n_users
FROM events GROUP BY 1, 2 ORDER BY window_start, event_type
""".strip()


def sliding_agg(
    events: DataFrame, width: str = "1 hour", slide: str = "15 minutes"
) -> DataFrame:
    """Sliding-window aggregate per (window, event_type): each event lands
    in width/slide overlapping windows (Spark's native ``F.window`` with a
    slide — epoch-aligned starts). Same exact-cents discipline as
    tumbling_agg. The streaming twin is the identical expression under
    readStream + watermark."""
    return (
        events.groupBy(
            F.window(F.col("ts"), width, slide).alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "value_cents",
        )
        .orderBy("window_start", "event_type")
    )


def sql_sliding_agg(width_us: int = 3600_000_000, slide_us: int = 900_000_000) -> str:
    """DuckDB mirror of sliding_agg: replicate each event into the window
    starts k·slide with k ∈ (⌊(e−W)/S⌋, ⌊e/S⌋] — integer microsecond math,
    identical to Spark's epoch-aligned assignment."""
    return f"""
SELECT strftime(make_timestamp(k * {slide_us}), '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM (
  SELECT event_type, value,
         unnest(range((epoch_us(ts) - {width_us}) // {slide_us} + 1,
                      epoch_us(ts) // {slide_us} + 1)) AS k
  FROM events
)
GROUP BY 1, 2 ORDER BY window_start, event_type
""".strip()


def sessionize(events: DataFrame, gap_seconds: int = SESSION_GAP_SECONDS) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since the
    user's previous event exceeds the gap. Classic lag + cumulative-sum
    windows, partitioned by user — shuffles once on user_id and scales with
    per-user event counts, not total rows."""
    w = Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    with_gap = events.withColumn(
        "_new_session",
        F.when(
            _epoch_seconds("ts") - F.lag(_epoch_seconds("ts")).over(w)
            > gap_seconds,
            1,
        )
        .otherwise(0)
        .cast("int"),
    ).withColumn(
        "_first", F.when(F.lag("ts").over(w).isNull(), 1).otherwise(0)
    )
    return (
        with_gap.groupBy("user_id")
        .agg(
            (F.sum("_new_session") + F.lit(1)).alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


def sql_sessionize(gap_seconds: int = SESSION_GAP_SECONDS) -> str:
    return f"""
SELECT user_id, CAST(sum(new_session) + 1 AS BIGINT) AS n_sessions, count(*) AS n_events
FROM (
  SELECT user_id,
         CASE WHEN epoch(ts) - lag(epoch(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > {gap_seconds}
              THEN 1 ELSE 0 END AS new_session
  FROM events
)
GROUP BY user_id ORDER BY user_id
""".strip()


def top_event_types(
    events: DataFrame, granularity: str = "hour", k: int = 3
) -> DataFrame:
    """Top-k event types per tumbling window by count (ties → type order):
    grouped counts, then a per-window rank — the canonical "trending items
    per window" analytic. The input is repartitioned by the WINDOW alone
    first: aggregation only requires clustering on a subset of its group
    keys, so both the (window, type) groupBy and the rank window reuse
    that single exchange (verified: one hashpartitioning in the plan; the
    naive formulation shuffles twice)."""
    win = F.date_format(
        F.date_trunc(granularity, F.col("ts")), "yyyy-MM-dd HH:mm:ss"
    )
    counts = (
        events.repartition(win)
        .groupBy(win.alias("window_start"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    w = Window.partitionBy("window_start").orderBy(
        F.desc("n_events"), F.col("event_type")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("window_start", "rank")
    )


def sql_top_event_types(granularity: str = "hour", k: int = 3) -> str:
    return f"""
SELECT window_start, event_type, n_events, rank FROM (
  SELECT window_start, event_type, n_events,
         row_number() OVER (PARTITION BY window_start ORDER BY n_events DESC, event_type) AS rank
  FROM (
    SELECT strftime(date_trunc('{granularity}', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, count(*) AS n_events
    FROM events GROUP BY 1, 2
  )
) WHERE rank <= {k} ORDER BY window_start, rank
""".strip()


def latest_event_per_user(events: DataFrame) -> DataFrame:
    """M5 last-writer-wins (IngestionPipeline.cs:164-176 generation guard →
    batch form): row_number over (partition key order by recency desc) = 1.
    The same pattern implements the document-upsert winner (S6)."""
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        events.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("user_id", "event_id", "event_type", _epoch_us("ts").alias("ts_us"))
        .orderBy("user_id")
    )


def sql_latest_event_per_user() -> str:
    return """
SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM (
  SELECT user_id, event_id, event_type, ts,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1 ORDER BY user_id
""".strip()


def funnel_analysis(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
) -> DataFrame:
    """Ordered funnel: per user, step ``i`` counts only if it happens
    STRICTLY AFTER that user's earliest completion of step ``i-1`` (the
    standard ordered-funnel semantics — a purchase before any view is not
    a converted view). One row per step: (step_idx, step, n_users,
    conv_from_prev, conv_from_first) with exact micro-rates as integer
    pairs plus a rounded double.

    Plan: one filtered per-user min-ts aggregate per step, each joined to
    the previous step's reach — k−1 joins on user_id over
    step-filtered subsets (tiny next to the event stream), all map-side
    partial-aggregated. No windows over the full stream, no driver loops:
    the per-step frames stay distributed and the output is k rows.

    Scale (100 TB): each step's aggregate shuffles ONLY events of that
    type (predicate pushed to the scan); user-key joins ride AQE. A
    sessionized/windowed variant composes by pre-filtering `events`."""
    base = events.select(
        "user_id", F.col("event_type"), _epoch_us("ts").alias("t")
    )
    from functools import reduce

    from pyspark.sql.window import Window

    reach = []  # per step: DataFrame(step_idx, step, user_id)
    cur = None
    for i, s in enumerate(steps):
        stepdf = base.filter(F.col("event_type") == s)
        if cur is None:
            cur = stepdf.groupBy("user_id").agg(F.min("t").alias("t"))
        else:
            cur = (
                stepdf.join(cur.select("user_id", F.col("t").alias("_prev")), "user_id")
                .filter(F.col("t") > F.col("_prev"))
                .groupBy("user_id")
                .agg(F.min("t").alias("t"))
            )
        reach.append(
            cur.select(
                F.lit(i + 1).cast("long").alias("step_idx"),
                F.lit(s).alias("step"),
                "user_id",
            )
        )
    # fully lazy: k tiny per-step aggregates union into ONE k-row frame;
    # rates come from a window over those k rows (no driver-side counts,
    # so plan-only consumers run zero jobs). The unpartitioned window is
    # deliberate and safe: its input is exactly k = len(steps) rows (one
    # per funnel step), never corpus-sized.
    tagged = reduce(lambda a, b: a.unionByName(b), reach)
    # A step nobody converted through must still emit its row (n_users=0):
    # an empty groupBy produces NO row, which would shift the lag-based
    # conv_from_prev onto the wrong predecessor and diverge from the SQL
    # mirror (which always emits one row per step). Left-join the counts
    # onto a literal k-row frame of all steps.
    steps_df = events.sparkSession.createDataFrame(
        [(i + 1, s) for i, s in enumerate(steps)], "step_idx long, step string"
    )
    counts = steps_df.join(
        tagged.groupBy("step_idx", "step").agg(F.count(F.lit(1)).alias("n_users")),
        ["step_idx", "step"],
        "left",
    ).withColumn("n_users", F.coalesce(F.col("n_users"), F.lit(0)).cast("long"))
    w = Window.orderBy("step_idx").rowsBetween(Window.unboundedPreceding, 0)
    prev_n = F.lag("n_users", 1).over(Window.orderBy("step_idx"))
    first_n = F.first("n_users").over(w)
    return counts.select(
        "step_idx",
        "step",
        "n_users",
        F.round(
            F.col("n_users") / F.greatest(F.coalesce(prev_n, F.col("n_users")), F.lit(1)), 6
        ).alias("conv_from_prev"),
        F.round(F.col("n_users") / F.greatest(first_n, F.lit(1)), 6).alias(
            "conv_from_first"
        ),
    ).orderBy("step_idx")


def sql_funnel_analysis(steps: tuple[str, ...] = ("view", "click", "purchase")) -> str:
    ctes = []
    for i, s in enumerate(steps):
        if i == 0:
            ctes.append(
                f"r0 AS (SELECT user_id, min(epoch_us(ts)) AS t FROM events "
                f"WHERE event_type = '{s}' GROUP BY user_id)"
            )
        else:
            ctes.append(
                f"r{i} AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t FROM events e "
                f"JOIN r{i-1} p ON e.user_id = p.user_id "
                f"WHERE e.event_type = '{s}' AND epoch_us(e.ts) > p.t "
                f"GROUP BY e.user_id)"
            )
    selects = " UNION ALL ".join(
        f"SELECT {i + 1}::BIGINT AS step_idx, '{s}' AS step, "
        f"(SELECT count(*) FROM r{i})::BIGINT AS n_users, "
        f"round((SELECT count(*) FROM r{i}) / greatest((SELECT count(*) FROM r{max(i - 1, 0)}), 1), 6) AS conv_from_prev, "
        f"round((SELECT count(*) FROM r{i}) / greatest((SELECT count(*) FROM r0), 1), 6) AS conv_from_first"
        for i, s in enumerate(steps)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + selects + "\nORDER BY step_idx"


def retention_cohorts(
    events: DataFrame,
    bucket: str = "week",
    max_offset: int = 8,
) -> DataFrame:
    """Cohort retention: users grouped by first-activity bucket; for each
    (cohort, offset) the fraction of the cohort active ``offset`` buckets
    later. The other half of product analytics next to the funnel.

    Buckets are integer epoch-bucket indexes (epoch_us div bucket_us) —
    pure integer arithmetic on the TZ-independent epoch micros, so the
    mirror is exact and no date-truncation semantics can drift between
    engines.

    Output: (cohort_bucket, bucket_offset, n_active, cohort_size,
    retention).

    Plan: one per-user min-bucket aggregate (the cohort assignment), one
    distinct (user, bucket) activity set, one join on user, one
    (cohort, offset) count — every stage map-side-partial, keyed small.
    Scale: activity is |users|·|buckets touched| rows, far below the raw
    event stream; no windows over the stream itself."""
    us_per = {"day": 86_400_000_000, "week": 604_800_000_000}[bucket]
    base = events.select(
        "user_id", (_epoch_us("ts") / us_per).cast("bigint").alias("b")
    )
    cohort = base.groupBy("user_id").agg(F.min("b").alias("cohort_b"))
    active = base.distinct()
    joined = (
        active.join(cohort, "user_id")
        .select("user_id", "cohort_b", (F.col("b") - F.col("cohort_b")).alias("off"))
        .filter(F.col("off") <= max_offset)
    )
    sizes = cohort.groupBy("cohort_b").agg(F.count(F.lit(1)).alias("cohort_size"))
    act = joined.groupBy("cohort_b", "off").agg(F.count(F.lit(1)).alias("n_active"))
    return (
        act.join(sizes, "cohort_b")
        .select(
            F.col("cohort_b").alias("cohort_bucket"),
            F.col("off").alias("bucket_offset"),
            "n_active",
            "cohort_size",
            F.round(F.col("n_active") / F.col("cohort_size"), 6).alias("retention"),
        )
        .orderBy("cohort_bucket", "bucket_offset")
    )


def sql_retention_cohorts(bucket: str = "week", max_offset: int = 8) -> str:
    us_per = {"day": 86_400_000_000, "week": 604_800_000_000}[bucket]
    return f"""
WITH base AS (
  SELECT user_id, CAST(epoch_us(ts) // {us_per} AS BIGINT) AS b FROM events
),
cohort AS (SELECT user_id, min(b) AS cohort_b FROM base GROUP BY user_id),
active AS (SELECT DISTINCT user_id, b FROM base),
joined AS (
  SELECT a.user_id, c.cohort_b, a.b - c.cohort_b AS off
  FROM active a JOIN cohort c ON a.user_id = c.user_id
  WHERE a.b - c.cohort_b <= {max_offset}
),
sizes AS (SELECT cohort_b, count(*) AS cohort_size FROM cohort GROUP BY cohort_b),
act AS (SELECT cohort_b, off, count(*) AS n_active FROM joined GROUP BY cohort_b, off)
SELECT act.cohort_b AS cohort_bucket, act.off AS bucket_offset,
       CAST(n_active AS BIGINT) AS n_active, CAST(cohort_size AS BIGINT) AS cohort_size,
       round(n_active / cohort_size, 6) AS retention
FROM act JOIN sizes ON act.cohort_b = sizes.cohort_b
ORDER BY cohort_bucket, bucket_offset
""".strip()


def value_percentiles(
    events: DataFrame,
    pcts: tuple[float, ...] = (0.25, 0.5, 0.9, 0.99),
    group_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Exact interpolated percentiles of ``value`` per group, unpivoted to
    (group, pct, value) — the latency/size-distribution profile every
    operational dashboard wants. Spark's ``percentile`` and DuckDB's
    ``quantile_cont`` implement the same linear interpolation on the
    sorted values and agree bit-for-bit (verified), so no rounding is
    needed.

    Scale: exact percentiles sort within each group's aggregation buffer —
    fine while per-group cardinality fits an executor (events-per-type
    here). At genuinely unbounded group sizes swap ``percentile`` for
    ``percentile_approx`` with a declared accuracy — one token change in
    this plan, at the cost of the oracle (approx algorithms differ across
    engines)."""
    plist = ", ".join(repr(p) for p in pcts)
    agg = events.groupBy(group_col).agg(
        F.expr(f"percentile({value_col}, array({plist}))").alias("_ps")
    )
    pairs = F.arrays_zip(
        F.array(*[F.lit(p) for p in pcts]).alias("pct"), F.col("_ps").alias("v")
    )
    return (
        agg.select(group_col, F.explode(pairs).alias("z"))
        .select(
            group_col,
            F.col("z.pct").alias("pct"),
            F.col("z.v").alias("value"),
        )
        .orderBy(group_col, "pct")
    )


def sql_value_percentiles(
    pcts: tuple[float, ...] = (0.25, 0.5, 0.9, 0.99),
    group_col: str = "event_type",
    value_col: str = "value",
) -> str:
    qs = ", ".join(
        f"{{'pct': {p!r}, 'v': quantile_cont({value_col}, {p!r})}}" for p in pcts
    )
    return f"""
SELECT {group_col}, z.pct AS pct, z.v AS value
FROM (SELECT {group_col}, unnest([{qs}]) AS z FROM events GROUP BY {group_col})
ORDER BY {group_col}, pct
""".strip()


def props_extract_agg(events: DataFrame) -> DataFrame:
    """Semi-structured extraction: parse the ``props`` JSON column with a
    declared schema (``from_json`` — JVM-side Jackson, no Python) and
    aggregate the typed field per event type. The standard lakehouse move
    for event payloads: parse ONCE into typed columns at the start of the
    plan so every downstream predicate/aggregate runs on native columns
    (and a persisted bronze→silver write would store the struct, paying
    the parse a single time).

    Output: (event_type, n_with_k, k_min, k_max, k_sum) — integer field,
    exact aggregates.

    Scale: from_json is a map-side projection inside codegen; malformed
    rows yield NULL (counted out by n_with_k) instead of failing the job —
    the PERMISSIVE-mode contract a 100 TB ingest needs."""
    parsed = events.select(
        "event_type",
        F.from_json(F.col("props"), "k BIGINT").alias("p"),
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count(F.col("p.k")).alias("n_with_k"),
            F.min("p.k").alias("k_min"),
            F.max("p.k").alias("k_max"),
            F.sum("p.k").alias("k_sum"),
        )
        .orderBy("event_type")
    )


def sql_props_extract_agg() -> str:
    """Mirror via DuckDB's JSON extraction — an independent JSON parser,
    so agreement checks the semantics, not a shared implementation."""
    return """
SELECT event_type,
       count(CAST(json_extract(props, '$.k') AS BIGINT)) AS n_with_k,
       min(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_min,
       max(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_max,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum
FROM events GROUP BY event_type ORDER BY event_type
""".strip()
