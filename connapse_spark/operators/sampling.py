"""Deterministic sampling for training-data pipelines.

``df.sample()`` is seed-stable only for a FIXED partitioning — repartition
the input (or rerun at another parallelism) and the sampled set changes.
Training pipelines need sampling that is a pure function of the ROW so
mixes are reproducible across runs, clusters, and engine versions: hash
the row key, keep the row when the hash bucket clears the rate. Same
sha256-derived buckets as the rest of the engine — map-side, no shuffle,
mirrored exactly in the DuckDB oracle.

Buckets are per-mille (rate resolution 0.001) over the first 8 sha256 hex
chars — the same 32-bit hash family as dedup._sha_bigint.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 1000


def hash_bucket_expr(key: Column, salt: str = "") -> Column:
    """Deterministic bucket in [0, BUCKETS): sha256 of (salt || key).
    Different salts give independent bucketings — sampling and splitting
    with different salts are uncorrelated."""
    return (
        F.conv(F.substring(F.sha2(F.concat(F.lit(salt), key), 256), 1, 8), 16, 10)
        .cast("bigint")
        % BUCKETS
    )


def sql_hash_bucket(key: str, salt: str = "") -> str:
    return f"(('0x' || substr(sha256('{salt}' || {key}), 1, 8))::BIGINT % {BUCKETS})"


def deterministic_sample(
    df: DataFrame, fraction: float, key_col: str, salt: str = "sample"
) -> DataFrame:
    """Keep rows whose bucket < fraction·BUCKETS — row-deterministic
    sampling at per-mille resolution, stable under any repartitioning."""
    cut = int(round(fraction * BUCKETS))
    return df.filter(hash_bucket_expr(F.col(key_col).cast("string"), salt) < cut)


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    group_col: str,
    key_col: str,
    default_rate: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Per-group sampling rates (the training-mix recipe: e.g. keep 100% of
    one source, 10% of another). The rate lookup is a literal when-chain —
    no join; groups absent from ``rates`` fall back to ``default_rate``."""
    cut = F.lit(int(round(default_rate * BUCKETS)))
    for g, r in sorted(rates.items()):
        cut = F.when(F.col(group_col) == g, F.lit(int(round(r * BUCKETS)))).otherwise(cut)
    return df.filter(hash_bucket_expr(F.col(key_col).cast("string"), salt) < cut)


def temperature_mix(
    df: DataFrame,
    group_col: str,
    key_col: str,
    alpha: float = 0.3,
    budget_frac: float = 0.5,
    salt: str = "tmix",
) -> DataFrame:
    """Temperature-flattened source mixing (r8 — the multilingual
    sampling standard: XLM-R §3.1 / mT5 sample groups with
    ``p_g ∝ n_g^alpha``, flattening head languages and upweighting the
    tail; ``alpha=1`` is proportional, ``alpha=0`` uniform). Unlike
    :func:`stratified_sample`, the rates come FROM THE DATA: one
    aggregate derives group sizes, the per-group keep rate is
    ``min(1, budget_frac · N · p_g / n_g)``, and the selection is the
    same row-deterministic sha-bucket predicate — reproducible across
    runs, partitionings, and engines.

    Rows with a NULL group are EXCLUDED up front (a language-less row
    has no place in a per-language mix) — excluded from the totals too,
    so they never deflate the real groups' rates (r8 review).

    Determinism contract: ``pow(n, alpha)`` is the one non-exactly-
    rounded FP op (the tfidf-ln precedent), so weights are quantized to
    integer micro-units BEFORE the cross-group sum — the sum is then
    exact and order-free, and every later op (mul/div/round) is
    IEEE-identical on both engines in the mirrored order. Residual
    honesty: Java's Math.pow is 1-ulp, libm's is correctly rounded — a
    weight landing within that ulp of a .5 micro-unit boundary could
    quantize apart. No reconciliation exists short of a software pow;
    the failure mode is a VISIBLE oracle mismatch on one group, never a
    silent drift, and the gate has never observed one.

    Scale: pass 1 is one map-side-combined aggregate to a group-count
    frame (tiny: languages/sources); pass 2 broadcasts the per-group cut
    onto the scan — no second shuffle, the filter rides the read."""
    df = df.filter(F.col(group_col).isNotNull())
    sizes = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    wq = F.round(F.pow(F.col("_n").cast("double"), F.lit(alpha)) * 1e6).cast("long")
    weighted = sizes.select(group_col, "_n", wq.alias("_wq"))
    totals = weighted.agg(
        F.sum("_n").alias("_tot_n"), F.sum("_wq").alias("_tot_wq")
    )
    cuts = (
        weighted.crossJoin(F.broadcast(totals))
        .select(
            group_col,
            F.least(
                F.lit(1.0),
                (
                    F.lit(budget_frac)
                    * F.col("_tot_n").cast("double")
                    * (F.col("_wq").cast("double") / F.col("_tot_wq").cast("double"))
                )
                / F.col("_n").cast("double"),
            ).alias("_r"),
        )
        .select(group_col, F.round(F.col("_r") * BUCKETS).cast("long").alias("_cut"))
    )
    return (
        df.join(F.broadcast(cuts), group_col)
        .filter(hash_bucket_expr(F.col(key_col).cast("string"), salt) < F.col("_cut"))
        .drop("_cut")
    )


def sql_temperature_mix(
    group_col: str,
    key_col: str,
    alpha: float = 0.3,
    budget_frac: float = 0.5,
    salt: str = "tmix",
    table: str = "documents",
    select: str = "*",
) -> str:
    """DuckDB mirror of :func:`temperature_mix` — identical op order, so
    the per-group cuts (and therefore the kept row set) are bit-equal."""
    return f"""
WITH sizes AS (
  SELECT {group_col}, count(*) AS n,
         CAST(round(pow(CAST(count(*) AS DOUBLE), {alpha!r}) * 1e6) AS BIGINT) AS wq
  FROM {table} WHERE {group_col} IS NOT NULL GROUP BY {group_col}
),
totals AS (SELECT sum(n) AS tot_n, sum(wq) AS tot_wq FROM sizes),
cuts AS (
  SELECT {group_col},
         CAST(round(least(1.0,
           ({budget_frac!r} * CAST(tot_n AS DOUBLE)
            * (CAST(wq AS DOUBLE) / CAST(tot_wq AS DOUBLE)))
           / CAST(n AS DOUBLE)) * {BUCKETS}) AS BIGINT) AS cut
  FROM sizes, totals
)
SELECT {select} FROM {table} t JOIN cuts USING ({group_col})
WHERE {sql_hash_bucket(f"CAST(t.{key_col} AS VARCHAR)", salt)} < cut
""".strip()


def sql_stratified_cut(rates: dict[str, float], group_col: str, default_rate: float = 0.0) -> str:
    expr = str(int(round(default_rate * BUCKETS)))
    for g, r in sorted(rates.items()):
        expr = f"CASE WHEN {group_col} = '{g}' THEN {int(round(r * BUCKETS))} ELSE {expr} END"
    return expr


def split_expr(key: Column, test_fraction: float = 0.01, salt: str = "split") -> Column:
    """'train' / 'test' assignment as a pure row function — independent of
    the sampling buckets (different salt)."""
    cut = int(round(test_fraction * BUCKETS))
    return F.when(hash_bucket_expr(key, salt) < cut, F.lit("test")).otherwise(
        F.lit("train")
    )


def sql_split(key: str, test_fraction: float = 0.01, salt: str = "split") -> str:
    cut = int(round(test_fraction * BUCKETS))
    return f"CASE WHEN {sql_hash_bucket(key, salt)} < {cut} THEN 'test' ELSE 'train' END"


def leakage_safe_split(
    docs: DataFrame,
    dup_pairs: DataFrame,
    test_fraction: float = 0.1,
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Group-aware train/test split: near-duplicate documents MUST land on
    the same side, or the held-out set leaks into training as near-copies
    — the eval-contamination failure mode a per-document ``split_expr``
    cannot prevent (two near-dups hash independently).

    ``dup_pairs`` is any pairwise match list (id_a, id_b) — MinHash/LSH,
    SemDeDup, embedding near-dup. Pairs collapse to connected components
    (dedup.neardup_components, min-id canonical label); the split then
    hashes the GROUP key, so a whole dup cluster moves together;
    documents in no pair are their own group. The group key, not the raw
    id, is the unit of assignment — the same rule GPT-3/Llama-style
    decontamination applies between train and benchmark sets.

    At scale: components cost O(log diameter) equi-join rounds over the
    PAIR list only (corpus-sized docs never enter the iteration); the
    final assignment is one left join + a pure projection.

    Output: (id, group_key, split) — ``split`` in {'train', 'test'}.
    """
    from connapse_spark.operators.dedup import neardup_components

    comps = neardup_components(dup_pairs)
    out = (
        docs.select(F.col(id_col).alias("id"))
        .join(comps, "id", "left")
        .select(
            "id",
            # keep the id's own type — a numeric cast would crash (ANSI)
            # or NULL-collapse string ids into one hash group
            F.coalesce(F.col("component"), F.col("id")).alias("group_key"),
        )
    )
    return out.select(
        "id",
        "group_key",
        split_expr(F.col("group_key").cast("string"), test_fraction, salt).alias(
            "split"
        ),
    )


def sql_leakage_safe_split(
    components_sql: str,
    test_fraction: float = 0.1,
    id_col: str = "doc_id",
    salt: str = "split",
    table: str = "documents",
) -> str:
    """Mirror: ``components_sql`` is a full (CTE-prefixed) statement
    yielding (id, component) — e.g. similarity.sql_neardup_components_lsh
    — used as a parenthesized subquery (DuckDB allows that)."""
    key = f"coalesce(c.component, d.{id_col})"
    return f"""
SELECT d.{id_col} AS id,
       {key} AS group_key,
       {sql_split(f"CAST({key} AS VARCHAR)", test_fraction, salt)} AS split
FROM {table} d
LEFT JOIN ({components_sql}) c ON c.id = d.{id_col}
ORDER BY id
""".strip()


# ---------------------------------------------------------------------------
# Sequence packing (concat-and-chop) for pretraining batches
# ---------------------------------------------------------------------------


def pack_sequences(
    df: DataFrame,
    budget_tokens: int,
    group_col: str,
    key_col: str,
    token_count_col: str,
) -> DataFrame:
    """Concat-and-chop sequence packing: within each group the documents are
    concatenated in key order and the token stream is chopped every
    ``budget_tokens`` — the standard pretraining packing (documents may
    straddle a boundary; the trainer masks across the seam).

    Pure window math — exclusive running token sum per group, then each
    document spans sequences ⌊start/B⌋ .. ⌊(end−1)/B⌋:
    (group, key, seq_first, seq_last, offset_in_seq n_seqs). The window
    partitions by ``group_col``, so the cumsum is distributed across groups
    — NEVER a global Window.orderBy (single-partition trap); at corpus
    scale the group is (source, date-bucket) or similar, sized so one
    group's stream fits a task.
    """
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(group_col)
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum(token_count_col).over(w), F.lit(0)).cast("bigint")
    b = budget_tokens
    with_start = df.select(
        F.col(group_col), F.col(key_col), F.col(token_count_col), start.alias("start_tok")
    )
    # integer `div`, never float floor(x/y): a half-ulp rounding of the
    # double quotient would shift a boundary at large stream offsets
    return with_start.select(
        group_col,
        key_col,
        token_count_col,
        "start_tok",
        F.expr(f"start_tok div {b}").alias("seq_first"),
        F.expr(f"(start_tok + {token_count_col} - 1) div {b}").alias("seq_last"),
        F.expr(f"start_tok % {b}").alias("offset_in_seq"),
    )


def sql_pack_sequences(
    budget_tokens: int,
    group_col: str,
    key_col: str,
    token_count_col: str,
    table: str = "documents",
) -> str:
    start = (
        f"CAST(coalesce(sum({token_count_col}) OVER ("
        f"PARTITION BY {group_col} ORDER BY {key_col} "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)"
    )
    return f"""
SELECT {group_col}, {key_col}, {token_count_col},
       {start} AS start_tok,
       {start} // {budget_tokens} AS seq_first,
       ({start} + {token_count_col} - 1) // {budget_tokens} AS seq_last,
       {start} % {budget_tokens} AS offset_in_seq
FROM {table}
""".strip()


# ---------------------------------------------------------------------------
# Quality-stratified per-group sampling (FineWeb-Edu-style "best X% per
# source")
# ---------------------------------------------------------------------------


def quality_stratified_sample(
    docs: DataFrame,
    keep_fraction: float = 0.5,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Keep the top ``keep_fraction`` of each group by the continuous
    quality score (textstats.quality_score_linear) — the classifier-score
    sampling step of FineWeb-Edu (Penedo et al. 2024) / DCLM, stratified
    per source so one high-scoring domain cannot crowd out the mix (the
    same concern domain caps address by count; this addresses it by
    quality mass).

    Keep rule: rank_in_group <= ceil(keep_fraction · group_size), rank by
    (quality_logit DESC, id) so ties are deterministic.

    Output: (id, group, quality_logit, grp_rank, grp_n, kept) — every row
    classified, like the dedup operators, so drop accounting is free.

    Scale (100 TB): quality scoring is map-side; the only shuffle is the
    per-group window (one hash partitioning on the group key — source
    counts are Zipf-ish, AQE skew-split handles a giant domain). No global
    sort, no driver state."""
    from pyspark.sql.window import Window

    from connapse_spark.operators.textstats import quality_score_linear

    q = quality_score_linear(docs, id_col=id_col, text_col=text_col).select(
        F.col(id_col), F.col("quality_logit")
    )
    base = docs.select(F.col(id_col), F.col(group_col).alias("grp")).join(q, id_col)
    w = Window.partitionBy("grp").orderBy(F.desc("quality_logit"), F.col(id_col))
    wn = Window.partitionBy("grp")
    ranked = base.select(
        F.col(id_col),
        F.col("grp").alias(group_col),
        "quality_logit",
        F.row_number().over(w).cast("long").alias("grp_rank"),
        F.count(F.lit(1)).over(wn).alias("grp_n"),
    )
    kept = F.col("grp_rank") <= F.ceil(F.lit(keep_fraction) * F.col("grp_n"))
    return ranked.withColumn("kept", kept).orderBy(id_col)


def sql_quality_stratified_sample(
    keep_fraction: float = 0.5,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> str:
    from connapse_spark.operators.textstats import sql_quality_score_linear

    return f"""
WITH q AS (SELECT {id_col}, quality_logit FROM ({sql_quality_score_linear(id_col=id_col)})),
ranked AS (
  SELECT d.{id_col}, d.{group_col}, q.quality_logit,
         row_number() OVER (PARTITION BY d.{group_col}
                            ORDER BY q.quality_logit DESC, d.{id_col}) AS grp_rank,
         count(*) OVER (PARTITION BY d.{group_col}) AS grp_n
  FROM documents d JOIN q USING ({id_col})
)
SELECT {id_col}, {group_col}, quality_logit,
       CAST(grp_rank AS BIGINT) AS grp_rank, CAST(grp_n AS BIGINT) AS grp_n,
       grp_rank <= ceil({keep_fraction!r} * grp_n) AS kept
FROM ranked ORDER BY {id_col}
""".strip()


# ---------------------------------------------------------------------------
# Seeded global shuffle + token-budget sharding (training-export op)
# ---------------------------------------------------------------------------


def token_budget_shards(
    df: DataFrame,
    budget_tokens: int,
    key_col: str,
    token_count_col: str,
    seed: str = "shuffle",
    n_parts: int = 32,
) -> DataFrame:
    """Deterministic seeded global shuffle + token-budget shard chop — the
    export-side sibling of :func:`pack_sequences`: rows take a
    pseudorandom order that is a pure function of the row key (md5 over
    seed||key — stable across runs, clusters, partitionings, engine
    versions), and each document lands WHOLLY in shard
    ``exclusive_prefix_tokens div budget`` — shards carry ≈equal token
    mass (each may overrun by at most one document), which is what
    training loaders actually balance on, where count-balanced shards
    skew by document length.

    The global exclusive prefix sum uses the classic two-pass distributed
    pattern — NEVER a global ``Window.orderBy`` (the single-partition
    trap): rows bucket into ``n_parts`` ranges, per-bucket window cumsum
    (distributed), then add broadcast per-bucket offsets (one bounded
    ``n_parts``-row collect — sized by parallelism, not data). The bucket
    is a PURE FUNCTION of the shuffle key — ``floor(n_parts ×
    md5-prefix/16^4)``, monotone in the md5 order since hex compares
    lexicographically as it compares numerically — NOT
    ``spark_partition_id`` over a pinned range exchange: a data-derived
    bucket survives recomputation (no persist to leak, no cached
    partitioning to silently shift under executor loss — the
    SPARK-23207 class), md5 uniformity balances the ranges without
    sampling, and the result is partition-boundary-independent, so it is
    oracle-exact. One full-width shuffle total (the per-bucket window's
    hash exchange); the offsets pass is a map-side partial agg over a
    second scan of the narrow projection.
    """
    from pyspark.sql.window import Window

    h = F.md5(F.concat(F.lit(seed), F.col(key_col).cast("string")))
    n_parts = max(int(n_parts), 1)
    pid = F.floor(
        F.conv(F.substring(F.col("_h"), 1, 4), 16, 10).cast("long")
        * n_parts
        / F.lit(65536)
    ).cast("int")
    withpid = df.select(
        F.col(key_col), F.col(token_count_col), h.alias("_h")
    ).withColumn("_pid", pid)
    part_sums = withpid.groupBy("_pid").agg(
        F.sum(token_count_col).cast("bigint").alias("_s")
    ).collect()
    totals = {r["_pid"]: (r["_s"] or 0) for r in part_sums}
    offs, acc = [], 0
    for pid in sorted(totals):
        offs.append((int(pid), int(acc)))
        acc += totals[pid]
    spark = df.sparkSession
    odf = spark.createDataFrame(offs or [(0, 0)], "_pid int, _off long")
    w = (
        Window.partitionBy("_pid")
        .orderBy("_h", key_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local_excl = F.coalesce(F.sum(token_count_col).over(w), F.lit(0)).cast("bigint")
    return (
        withpid.join(F.broadcast(odf), "_pid")
        .withColumn("_lexcl", local_excl)
        .withColumn("start_tok", F.col("_off") + F.col("_lexcl"))
        .select(
            key_col,
            F.col(token_count_col).cast("bigint").alias(token_count_col),
            "start_tok",
            F.expr(f"start_tok div {int(budget_tokens)}").alias("shard"),
        )
    )


def sql_token_budget_shards(
    budget_tokens: int,
    key_col: str,
    token_count_expr: str,
    seed: str = "shuffle",
    table: str = "documents",
    token_count_alias: str = "n_tokens",
) -> str:
    """Mirror: one global window over the same md5 shuffle order — DuckDB
    can afford the single-stream window at oracle scale; the Spark side
    proves the distributed two-pass computes the identical prefix."""
    order = f"ORDER BY md5(concat('{seed}', CAST({key_col} AS VARCHAR))), {key_col}"
    start = (
        f"CAST(coalesce(sum({token_count_alias}) OVER ({order} "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)"
    )
    return f"""
WITH t AS (SELECT {key_col}, CAST({token_count_expr} AS BIGINT) AS {token_count_alias} FROM {table})
SELECT {key_col}, {token_count_alias},
       {start} AS start_tok,
       {start} // {budget_tokens} AS shard
FROM t
""".strip()
