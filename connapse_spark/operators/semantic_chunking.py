"""C3 SemanticChunker as a NATIVE DataFrame pipeline (SemanticChunker.cs:
18-492) — the survey's flagship Spark-first re-expression (SURVEY.md §2.4):

    sentences (posexplode) →
    ±buffer context-window texts (window collect over rowsBetween) →
    batch embed (JVM hash-embedder column; swap a pandas-UDF provider) →
    adjacent-pair cosine distance (lag window) →
    per-document adaptive breakpoint threshold
      (Percentile / StandardDeviation / InterQuartile over the distance
       series — computed from a SORTED collect_list with sequential-fold
       math so both engines produce bit-identical doubles;
       < 5 distances falls back to 1 − SemanticThreshold,
       SemanticChunker.cs:120-127) →
    split where distance > threshold →
    group ids via running sum →
    re-assemble chunks + MEAN-POOLED window embeddings
      (PrecomputedEmbedding, :209-217 — consumed by the pipeline to skip
       re-embedding, IngestionPipeline.cs:244-249).

Whole pipeline is Catalyst-planned: ONE shuffle (by doc for the windows) +
one aggregation; embeddings are computed once per sentence row in a linear
plan (threshold statistics come from whole-partition window aggregates, not
self-joins — see auto_cut for why diamonds are poison).

All 4 breakpoint methods are supported (Percentile / StandardDeviation /
InterQuartile / Gradient — for Gradient both the threshold and the splits
loop operate on the forward/central-difference series, in gradient units,
SemanticChunker.cs:358-411).

Documented simplifications vs the reference (declared per SURVEY §7):
oversize groups are NOT re-delegated to RecursiveChunker and small chunks
are not merged forward in THIS tier (both are implemented in the
per-document UDF tier, chunkers.chunk_semantic — registered as 'Semantic'
in the C7 strategy router — where sequential logic belongs); sentence
splitting is the regex '[^.!?]+[.!?]*' (RE2-safe — no lookbehind — so Spark
and DuckDB split identically); token counts are whitespace counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from connapse_spark.functions.embed import DEFAULT_DIMS, embed_expr, sql_embed
from connapse_spark.functions.vector import (
    l2norm_expr,
    paired_cosine_expr,
    sql_cosine,
)

SENTENCE_RE = r"[^.!?]+[.!?]*"
DEFAULT_SEMANTIC_THRESHOLD = 0.5  # SettingsModels.cs SemanticThreshold
MIN_DISTANCES = 5  # SemanticChunker.cs:120-127


def sentences_expr(text: Column) -> Column:
    return F.filter(
        F.transform(F.regexp_extract_all(text, F.lit(SENTENCE_RE), 0), lambda s: F.trim(s)),
        lambda s: F.length(s) > 0,
    )


def sql_sentences(c: str) -> str:
    return (
        f"list_filter(list_transform(regexp_extract_all({c}, '{SENTENCE_RE}'), "
        f"s -> trim(s)), s -> len(s) > 0)"
    )


def _threshold_expr(ss: Column, n: Column, method: str, fallback: float) -> Column:
    """Breakpoint threshold from the SORTED distance list ``ss`` (asc).
    All math is element arithmetic on the sorted array — deterministic and
    exactly mirrored in SQL. Methods follow the public semantic-chunking
    lineage (LangChain SemanticChunker): percentile 95 / mean + 3σ /
    q3 + 1.5·IQR."""

    def q(p: float) -> Column:
        pos = (n - 1).cast("double") * p
        lo = F.floor(pos).cast("int")
        frac = pos - lo
        nxt = F.least(lo + 2, n)
        return F.element_at(ss, lo + 1) + frac * (
            F.element_at(ss, nxt) - F.element_at(ss, lo + 1)
        )

    if method in ("Percentile", "Gradient"):
        # for Gradient the caller passes the SORTED GRADIENT series as ``ss``
        # (SemanticChunker.cs:388-402) — same 95th-percentile interpolation
        thr = q(0.95)
    elif method == "StandardDeviation":
        mu = F.aggregate(ss, F.lit(0.0), lambda a, v: a + v) / n
        sd = F.sqrt(
            F.aggregate(ss, F.lit(0.0), lambda a, v: a + (v - mu) * (v - mu)) / n
        )
        thr = mu + F.lit(3.0) * sd
    elif method == "InterQuartile":
        thr = q(0.75) + F.lit(1.5) * (q(0.75) - q(0.25))
    else:
        raise ValueError(f"unknown breakpoint method {method}")
    return F.when(n < MIN_DISTANCES, F.lit(fallback)).otherwise(thr)


def _sql_threshold(ss: str, n: str, method: str, fallback: float) -> str:
    def q(p: float) -> str:
        pos = f"(({n} - 1) * {p!r})"
        lo = f"CAST(floor({pos}) AS INT)"
        frac = f"({pos} - {lo})"
        nxt = f"least({lo} + 2, {n})"
        return f"({ss}[{lo} + 1] + {frac} * ({ss}[{nxt}] - {ss}[{lo} + 1]))"

    if method in ("Percentile", "Gradient"):
        thr = q(0.95)
    elif method == "StandardDeviation":
        mu = f"(list_reduce(list_prepend(0.0, {ss}), (a, v) -> a + v) / {n})"
        sd = (
            f"sqrt(list_reduce(list_prepend(0.0, list_transform({ss}, "
            f"v -> (v - {mu}) * (v - {mu}))), (a, v) -> a + v) / {n})"
        )
        thr = f"({mu} + 3.0 * {sd})"
    else:
        q75, q25 = q(0.75), q(0.25)
        thr = f"({q75} + 1.5 * ({q75} - {q25}))"
    return f"CASE WHEN {n} < {MIN_DISTANCES} THEN {fallback!r} ELSE {thr} END"


def semantic_chunks(
    docs: DataFrame,
    method: str = "Percentile",
    buffer: int = 1,
    semantic_threshold: float = DEFAULT_SEMANTIC_THRESHOLD,
    dims: int = DEFAULT_DIMS,
    id_col: str = "doc_id",
    text_col: str = "text",
    embedder=None,
) -> DataFrame:
    """Returns (document_id, chunk_index, content, n_sentences, token_count,
    embedding) — embedding is the mean-pooled window-text embedding of the
    chunk's sentences (the PrecomputedEmbedding)."""
    fallback = 1.0 - semantic_threshold
    sents = docs.select(
        F.col(id_col).alias("document_id"),
        F.posexplode(sentences_expr(F.col(text_col))).alias("idx", "sentence"),
    )
    w = Window.partitionBy("document_id").orderBy("idx")
    wctx = w.rowsBetween(-buffer, buffer)
    wall = Window.partitionBy("document_id")
    emb_fn = embedder if embedder is not None else (lambda c: embed_expr(c, dims))
    # norm materialized once per sentence and LAGGED alongside the vector
    # (r11): the adjacent-pair cosine re-folded both sides' O(d) norms per
    # row; with (_n, lag(_n)) carried as columns the pair projection pays
    # one dot fold. Same FP operation order → bit-identical distances.
    step1 = (
        sents.withColumn(
            "ctx", F.concat_ws(" ", F.collect_list("sentence").over(wctx))
        )
        .withColumn("emb", emb_fn(F.col("ctx")))
        .withColumn("_n", l2norm_expr(F.col("emb")))
    )
    # explicit null for the first sentence: the cosine maps a NULL input to
    # 0.0 (its zero-magnitude guard), which would fabricate dist=1.0
    step2 = (
        step1.withColumn("_prev", F.lag("emb").over(w))
        .withColumn("_pn", F.lag("_n").over(w))
        .withColumn(
            "dist",
            F.when(F.col("_prev").isNull(), F.lit(None).cast("double")).otherwise(
                F.lit(1.0)
                - paired_cosine_expr(
                    F.col("_pn"), F.col("_n"), F.col("_prev"), F.col("emb")
                )
            ),
        )
    )
    # Gradient iterates the forward/central-difference series of the
    # distances, in gradient units (SemanticChunker.cs:388-402): grad[0] =
    # d[1]-d[0], grad[m-1] = d[m-1]-d[m-2], else (d[i+1]-d[i-1])/2. Row idx j
    # carries d[j-1], so first/last distance rows are idx==1 / idx==max(idx).
    if method == "Gradient":
        lead_d, lag_d = F.lead("dist").over(w), F.lag("dist").over(w)
        step2 = step2.withColumn("_mi", F.max("idx").over(wall)).withColumn(
            "_bp",
            F.when(F.col("dist").isNull(), F.lit(None).cast("double"))
            .when(F.col("idx") == 1, lead_d - F.col("dist"))
            .when(F.col("idx") == F.col("_mi"), F.col("dist") - lag_d)
            .otherwise((lead_d - lag_d) / F.lit(2.0)),
        )
    else:
        step2 = step2.withColumn("_bp", F.col("dist"))
    # whole-partition stats as window aggregates — linear plan, no self-join
    step3 = (
        step2.withColumn(
            "_ss", F.sort_array(F.filter(F.collect_list("_bp").over(wall), lambda d: d.isNotNull()))
        )
        .withColumn("_n", F.size("_ss"))
        .withColumn("thr", _threshold_expr(F.col("_ss"), F.col("_n"), method, fallback))
    )
    # under MIN_DISTANCES the fallback threshold is in DISTANCE units, so the
    # comparison series falls back to distances too (SemanticChunker.cs:120-128)
    cmp_col = (
        F.when(F.col("_n") < MIN_DISTANCES, F.col("dist")).otherwise(F.col("_bp"))
        if method == "Gradient"
        else F.col("dist")
    )
    step4 = step3.withColumn(
        "grp",
        F.sum(F.when(cmp_col.isNotNull() & (cmp_col > F.col("thr")), 1).otherwise(0)).over(w),
    )
    gathered = step4.groupBy("document_id", F.col("grp").alias("chunk_index")).agg(
        F.sort_array(F.collect_list(F.struct("idx", "sentence", "emb"))).alias("svs")
    )
    pooled = F.transform(
        F.aggregate(
            F.col("svs"),
            F.array_repeat(F.lit(0.0), dims),
            lambda acc, sv: F.zip_with(acc, sv["emb"], lambda x, y: x + y),
        ),
        lambda x: x / F.size("svs"),
    )
    content = F.concat_ws(" ", F.transform("svs", lambda sv: sv["sentence"]))
    return (
        gathered.select(
            "document_id",
            "chunk_index",
            content.alias("content"),
            F.size("svs").alias("n_sentences"),
            F.size(F.split(content, r"\s+")).alias("token_count"),
            pooled.alias("embedding"),
        )
        .orderBy("document_id", "chunk_index")
    )


def sql_semantic_chunks(
    method: str = "Percentile",
    buffer: int = 1,
    semantic_threshold: float = DEFAULT_SEMANTIC_THRESHOLD,
    dims: int = DEFAULT_DIMS,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    fallback = 1.0 - semantic_threshold
    thr = _sql_threshold("ss", "n", method, fallback)
    wdoc = "PARTITION BY document_id ORDER BY idx"
    if method == "Gradient":
        bp = f"""CASE WHEN dist IS NULL THEN NULL
              WHEN idx = 1 THEN lead(dist) OVER ({wdoc}) - dist
              WHEN idx = max(idx) OVER (PARTITION BY document_id)
                THEN dist - lag(dist) OVER ({wdoc})
              ELSE (lead(dist) OVER ({wdoc}) - lag(dist) OVER ({wdoc})) / 2.0 END"""
        cmp = f"CASE WHEN n < {MIN_DISTANCES} THEN dist ELSE bp END"
    else:
        bp = "dist"
        cmp = "dist"
    return f"""
WITH sents AS MATERIALIZED (
  SELECT document_id, unnest(range(1, len(sn) + 1)) - 1 AS idx, unnest(sn) AS sentence
  FROM (SELECT {id_col} AS document_id, {sql_sentences(text_col)} AS sn FROM {table})
),
ctxd AS MATERIALIZED (
  SELECT document_id, idx, sentence,
         string_agg(sentence, ' ') OVER (
           PARTITION BY document_id ORDER BY idx
           ROWS BETWEEN {buffer} PRECEDING AND {buffer} FOLLOWING) AS ctx
  FROM sents
),
embd AS MATERIALIZED (
  SELECT document_id, idx, sentence, {sql_embed('ctx', dims)} AS emb
  FROM ctxd
),
lagged AS (
  SELECT document_id, idx, sentence, emb,
         lag(emb) OVER (PARTITION BY document_id ORDER BY idx) AS prev
  FROM embd
),
dists AS (
  SELECT document_id, idx, sentence, emb,
         CASE WHEN prev IS NULL THEN NULL
              ELSE 1.0 - {sql_cosine("prev", "emb")} END AS dist
  FROM lagged
),
bps AS (
  SELECT document_id, idx, sentence, emb, dist,
         {bp} AS bp
  FROM dists
),
stats AS (
  SELECT document_id, idx, sentence, emb, dist, bp,
         list_sort(list_filter(list(bp) OVER (PARTITION BY document_id), d -> d IS NOT NULL)) AS ss,
         len(list_filter(list(bp) OVER (PARTITION BY document_id), d -> d IS NOT NULL)) AS n
  FROM bps
),
grouped AS (
  SELECT document_id, idx, sentence, emb,
         sum(CASE WHEN ({cmp}) IS NOT NULL AND ({cmp}) > ({thr}) THEN 1 ELSE 0 END)
           OVER (PARTITION BY document_id ORDER BY idx) AS grp
  FROM stats
),
chunks AS (
  SELECT document_id, CAST(grp AS BIGINT) AS chunk_index,
         string_agg(sentence, ' ' ORDER BY idx) AS content,
         count(*) AS n_sentences,
         list(emb ORDER BY idx) AS embs
  FROM grouped GROUP BY document_id, grp
)
SELECT document_id, chunk_index, content,
       n_sentences,
       len(string_split_regex(content, '\\s+')) AS token_count,
       list_transform(
         list_reduce(
           list_prepend(list_transform(range(0, {dims}), x -> 0.0), embs),
           (acc, v) -> list_transform(range(1, {dims} + 1), i -> acc[i] + v[i])),
         x -> x / len(embs)) AS embedding
FROM chunks
ORDER BY document_id, chunk_index
""".strip()
