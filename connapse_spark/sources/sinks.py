"""Sinks: the physical layout that makes the query side fast (S6/S7 +
the index-build jobs M6). Layout IS the index in a lake engine — every
writer here chooses partition/sort keys so the matching read prunes.

| table          | partitioned by          | sorted within files by | pruned by                  |
|----------------|-------------------------|------------------------|----------------------------|
| documents      | container_id            | path                   | container filter (Q2/Q3)   |
| chunks         | container_id            | document_id, chunk_idx | container + doc filters    |
| chunk_vectors  | model_id                | content_hash           | model filter (Q2 forces it)|
| lsh_index      | model_id, bucket        | id                     | probe's bucket equality    |
| ivf_index      | model_id, list_id       | id                     | probe's nprobe lists       |
| postings       | term_bucket (hash-mod)  | term                   | query-term bucket lookup   |

The content-hash sort on chunk_vectors co-locates the E2 cache anti-join;
the per-model partition mirrors the reference's per-model partial indexes
(VectorColumnManager.cs:95-126) and keeps cross-model scans impossible by
construction, like Q2's forced model filter (VectorSearchService.cs:65-70).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

POSTINGS_BUCKETS = 64


def write_documents(docs: DataFrame, path: str, mode: str = "overwrite") -> None:
    (
        docs.repartition("container_id")
        .sortWithinPartitions("path")
        .write.mode(mode)
        .partitionBy("container_id")
        .parquet(path)
    )


def write_chunks(chunks: DataFrame, path: str, mode: str = "overwrite") -> None:
    df = chunks
    if "container_id" not in df.columns:
        df = df.withColumn("container_id", F.lit("default"))
    (
        df.repartition("container_id")
        .sortWithinPartitions("document_id", "chunk_index")
        .write.mode(mode)
        .partitionBy("container_id")
        .parquet(path)
    )


def write_vectors(vectors: DataFrame, path: str, mode: str = "overwrite") -> None:
    (
        vectors.repartition("model_id")
        .sortWithinPartitions("content_hash")
        .write.mode(mode)
        .partitionBy("model_id")
        .parquet(path)
    )


def write_lsh_index(index: DataFrame, path: str, model_id: str = "hash-64", mode: str = "overwrite") -> None:
    (
        index.withColumn("model_id", F.lit(model_id))
        .repartition("bucket")
        .sortWithinPartitions("id")
        .write.mode(mode)
        .partitionBy("model_id", "bucket")
        .parquet(path)
    )


def write_ivf_index(index: DataFrame, path: str, model_id: str = "hash-64", mode: str = "overwrite") -> None:
    (
        index.withColumn("model_id", F.lit(model_id))
        .repartition("list_id")
        .sortWithinPartitions("id")
        .write.mode(mode)
        .partitionBy("model_id", "list_id")
        .parquet(path)
    )


def write_postings(postings: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Posting lists bucketed by term hash: a query's terms map to ≤|terms|
    buckets, so the lookup scans |terms|/64 of the index."""
    (
        postings.withColumn(
            "term_bucket", F.pmod(F.hash("term"), F.lit(POSTINGS_BUCKETS))
        )
        .repartition("term_bucket")
        .sortWithinPartitions("term")
        .write.mode(mode)
        .partitionBy("term_bucket")
        .parquet(path)
    )


def read_postings_for_terms(spark: SparkSession, path: str, terms: list[str]) -> DataFrame:
    """Pruned posting read: partition filter on the terms' buckets reaches
    the scan (PartitionFilters in explain), then exact term filter."""
    df = spark.read.parquet(path)
    term_col = F.col("term")
    bucket_col = F.col("term_bucket")
    import pandas as pd  # noqa: F401  (documents the pandas-free path)

    # compute buckets with Spark's own hash on a literal frame to stay
    # consistent with the writer's pmod(hash(term), N)
    buckets = [
        r["b"]
        for r in spark.createDataFrame([(t,) for t in terms], "term string")
        .select(F.pmod(F.hash("term"), F.lit(POSTINGS_BUCKETS)).alias("b"))
        .distinct()
        .collect()
    ]
    return df.filter(bucket_col.isin(buckets) & term_col.isin(terms))


# ---------------------------------------------------------------------------
# Bucketed tables — shuffle-free co-located joins
# ---------------------------------------------------------------------------


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a BUCKETED managed table: rows are hash-distributed into
    ``n_buckets`` files by ``bucket_col`` at write time, so two tables
    bucketed the same way join WITHOUT a shuffle — Catalyst recognizes the
    matching output partitioning and plans SortMergeJoin with zero
    Exchange. This is the 100 TB answer for the recurring chunk ⋈ vector
    join (both sides bucketed by chunk_id): the shuffle is paid ONCE at
    ingest, then every join/groupBy on the bucket key is free.

    Bucketing requires the table catalog (``saveAsTable``), not a bare
    parquet path — bucket metadata lives in the catalog entry."""
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)
