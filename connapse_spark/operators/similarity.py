"""Similarity-search operators: brute-force cosine top-k join (baseline) and
the IVF-partitioned scale path (plans/ivf.py). Generalizes the reference's
single-query KNN (Q2, PgVectorStore.cs:186-285) to table-vs-table retrieval.

Scale design: the query side is broadcast (queries ≪ corpus); the corpus is
scanned once; per-query top-k via window rank. At 100 TB the brute-force
pairs stream through the shuffle at |Q|·k rows after per-partition pre-rank —
for large |Q| switch to the IVF probe which prunes the corpus scan to the
nprobe nearest centroid partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from connapse_spark.functions.vector import cosine_expr, dot_expr, l2norm_expr, to_double_array


def _paired_cosine(na: F.Column, nb: F.Column, a: F.Column, b: F.Column) -> F.Column:
    """Cosine from pre-materialized per-row norms: dot/(na·nb), 0.0 on zero
    magnitude — the same FP operation order as cosine_expr, so the DuckDB
    mirrors are unchanged. Computing norms once per ROW (before the join)
    instead of per PAIR is the difference between O(n²·d) and O(n·d) norm
    work in any pairwise kernel; the join boundary stops Catalyst's
    CollapseProject from inlining them back into the pair stage."""
    return F.when(
        (na > F.lit(0.0)) & (nb > F.lit(0.0)), dot_expr(a, b) / (na * nb)
    ).otherwise(F.lit(0.0))


def knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    q_id: str = "vec_id",
    q_vec: str = "embedding",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """For every query vector, the top-k most-cosine-similar corpus rows.
    Output: (query_id, neighbor_id, rank, score)."""
    q = queries.select(
        F.col(q_id).alias("query_id"), to_double_array(F.col(q_vec)).alias("_qv")
    ).withColumn("_qn", l2norm_expr(F.col("_qv")))
    c = corpus.select(
        F.col(c_id).alias("neighbor_id"), to_double_array(F.col(c_vec)).alias("_cv")
    ).withColumn("_cn", l2norm_expr(F.col("_cv")))
    pairs = F.broadcast(q).crossJoin(c)
    if exclude_self:
        pairs = pairs.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        _paired_cosine(F.col("_qn"), F.col("_cn"), F.col("_qv"), F.col("_cv")).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def sql_knn_join(k: int = 5, n_queries: int = 10, exclude_self: bool = True) -> str:
    from connapse_spark.functions.vector import sql_cosine

    self_filter = "AND q.vec_id != c.vec_id" if exclude_self else ""
    return f"""
WITH q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < {n_queries}),
c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {sql_cosine("qv", "cv")} AS score
  FROM q JOIN c ON TRUE {self_filter}
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, score FROM ranked WHERE rank <= {k}
ORDER BY query_id, rank
""".strip()


def neardup_cosine_pairs(
    vectors: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (exact all-pairs form — the
    LSH-bucketed variant lives in plans/ivf.py for corpus scale; this exact
    form is the verification kernel applied within candidate buckets)."""
    a = vectors.select(
        F.col(id_col).alias("id_a"), to_double_array(F.col(vec_col)).alias("_va")
    ).withColumn("_na", l2norm_expr(F.col("_va")))
    b = vectors.select(
        F.col(id_col).alias("id_b"), to_double_array(F.col(vec_col)).alias("_vb")
    ).withColumn("_nb", l2norm_expr(F.col("_vb")))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            _paired_cosine(F.col("_na"), F.col("_nb"), F.col("_va"), F.col("_vb")).alias("score"),
        )
        .filter(F.col("score") >= F.lit(threshold))
        .orderBy("id_a", "id_b")
    )


def sql_neardup_cosine_pairs(threshold: float = 0.9) -> str:
    from connapse_spark.functions.vector import sql_cosine

    return f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b, {sql_cosine("a.e", "b.e")} AS score
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE {sql_cosine("a.e", "b.e")} >= {threshold!r}
ORDER BY id_a, id_b
""".strip()


def neardup_cosine_pairs_lsh(
    vectors: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH-bucketed near-dup pairs — the 100 TB path: bucket by
    deterministic sign-LSH (plans/ivf.py), generate pairs only WITHIN a
    bucket (shuffle on bucket, never an all-pairs join), verify with exact
    cosine. Approximate by construction (pairs split across buckets are
    missed — the recall/cost dial is n_planes); deterministic, so still
    oracle-checkable."""
    from connapse_spark.plans.ivf import lsh_bucket_expr

    v = vectors.select(
        F.col(id_col).alias("id"), to_double_array(F.col(vec_col)).alias("vec")
    ).select(
        "id", "vec",
        lsh_bucket_expr(F.col("vec"), n_planes).alias("bucket"),
        l2norm_expr(F.col("vec")).alias("norm"),
    )
    a = v.select(
        F.col("id").alias("id_a"), F.col("bucket"),
        F.col("vec").alias("_va"), F.col("norm").alias("_na"),
    )
    b = v.select(
        F.col("id").alias("id_b"), F.col("bucket"),
        F.col("vec").alias("_vb"), F.col("norm").alias("_nb"),
    )
    return (
        a.join(b, ["bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b", "bucket",
            _paired_cosine(F.col("_na"), F.col("_nb"), F.col("_va"), F.col("_vb")).alias("score"),
        )
        .filter(F.col("score") >= F.lit(threshold))
        .orderBy("id_a", "id_b")
    )


def sql_neardup_cosine_pairs_lsh(threshold: float = 0.9, n_planes: int = 4) -> str:
    from connapse_spark.functions.vector import sql_cosine
    from connapse_spark.plans.ivf import sql_lsh_bucket

    return f"""
WITH v AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         {sql_lsh_bucket('CAST(embedding AS DOUBLE[])', n_planes)} AS bucket
  FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.bucket AS bucket,
       {sql_cosine("a.e", "b.e")} AS score
FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE {sql_cosine("a.e", "b.e")} >= {threshold!r}
ORDER BY id_a, id_b
""".strip()


def mean_pool_by(
    vectors: DataFrame,
    group_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
) -> DataFrame:
    """E3 mean-pool (SemanticChunker.cs:290-307) per group, computed as a
    sorted sequential fold over collected vectors for bit-determinism
    (groups are bounded; the sort key fixes FP addition order)."""
    gathered = (
        vectors.select(
            F.col(group_col),
            F.struct(F.col(id_col).alias("i"), to_double_array(F.col(vec_col)).alias("v")).alias(
                "sv"
            ),
        )
        .groupBy(group_col)
        .agg(F.sort_array(F.collect_list("sv")).alias("svs"))
    )
    zeros = F.array_repeat(F.lit(0.0), dims)
    pooled = F.transform(
        F.aggregate(
            F.col("svs"), zeros, lambda acc, sv: F.zip_with(acc, sv["v"], lambda x, y: x + y)
        ),
        lambda x: x / F.size("svs"),
    )
    return gathered.select(
        F.col(group_col), F.size("svs").alias("n_vectors"), pooled.alias("centroid")
    ).orderBy(group_col)


def sql_mean_pool_by(group_col: str = "label", dims: int = 64) -> str:
    return f"""
SELECT {group_col}, len(svs) AS n_vectors,
       list_transform(
         list_reduce(
           list_prepend(list_transform(range(0, {dims}), x -> 0.0),
                        list_transform(svs, sv -> sv.v)),
           (acc, v) -> list_transform(range(1, {dims} + 1), i -> acc[i] + v[i])),
         x -> x / len(svs)) AS centroid
FROM (
  SELECT {group_col},
         list({{'i': vec_id, 'v': CAST(embedding AS DOUBLE[])}} ORDER BY vec_id) AS svs
  FROM embeddings GROUP BY {group_col}
)
ORDER BY {group_col}
""".strip()
