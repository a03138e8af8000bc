"""Aggregation / browse operators (SURVEY.md §2.7 A1-A5).

These are the reference's stats/browse endpoints re-expressed as textbook
DataFrame aggregations. All are single-shuffle group-bys with map-side
partial aggregation; at 100 TB they scale linearly with the group-key
cardinality, not the row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corpus_stats(docs: DataFrame, group_col: str = "source") -> DataFrame:
    """A1 ContainerStats (PostgresDocumentStore.cs:191-222): one group-by with
    conditional counts. The reference groups per container; here the corpus
    grouping column stands in for container_id."""
    return docs.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.count(F.when(F.col("lang") == "en", 1)).alias("n_en"),
        F.max("n_chars").alias("max_chars"),
        F.min("doc_id").alias("first_doc_id"),
    )


def sql_corpus_stats(group_col: str = "source") -> str:
    return f"""
SELECT {group_col},
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       count(CASE WHEN lang = 'en' THEN 1 END) AS n_en,
       max(n_chars) AS max_chars,
       min(doc_id) AS first_doc_id
FROM documents GROUP BY {group_col}
""".strip()


def model_discovery(vectors: DataFrame) -> DataFrame:
    """A2 VectorModelDiscovery (VectorModelDiscovery.cs:21-81): GROUP BY
    model, dimensions → count DESC. ``label`` stands in for model_id on the
    test table; dimensions derived from the stored vector exactly like
    ``vector_dims(embedding)``."""
    return (
        vectors.groupBy(
            F.col("label").alias("model_id"), F.size("embedding").alias("dimensions")
        )
        .agg(F.count(F.lit(1)).alias("n_vectors"))
        .orderBy(F.desc("n_vectors"), F.col("model_id"))
    )


def sql_model_discovery() -> str:
    return """
SELECT label AS model_id, len(embedding) AS dimensions, count(*) AS n_vectors
FROM embeddings GROUP BY 1, 2 ORDER BY n_vectors DESC, model_id
""".strip()


def document_list_paged(
    docs: DataFrame, offset: int = 10, limit: int = 20
) -> DataFrame:
    """A3 paged document listing (PostgresDocumentStore.cs:117-142):
    deterministic ORDER BY + offset/limit (Spark 3.4+ native offset)."""
    return (
        docs.select("doc_id", "source", "lang", "n_chars")
        .orderBy(F.desc("n_chars"), F.col("doc_id"))
        .offset(offset)
        .limit(limit)
    )


def sql_document_list_paged(offset: int = 10, limit: int = 20) -> str:
    return f"""
SELECT doc_id, source, lang, n_chars FROM documents
ORDER BY n_chars DESC, doc_id LIMIT {limit} OFFSET {offset}
""".strip()


def file_browser(docs: DataFrame) -> DataFrame:
    """A4 file browser (DocumentsEndpoints.cs:120-219): explicit + implicit
    folder derivation from paths, folders-first case-insensitive ordering.
    The test corpus has no path column, so we derive a two-level virtual path
    ``/{source}/doc_{id}`` and list the direct children of the root — the
    same parent-path-equality + union + sort shape as the reference."""
    files = docs.select(
        F.concat(
            F.lit("/"), F.col("source"), F.lit("/doc_"), F.col("doc_id").cast("string")
        ).alias("path")
    )
    folders = files.select(
        F.regexp_extract("path", "^(/[^/]+)/", 1).alias("name")
    ).distinct().select(F.col("name"), F.lit(True).alias("is_folder"))
    return folders.orderBy(F.lower("name")).select("name", "is_folder")


def sql_file_browser() -> str:
    return """
SELECT name, is_folder FROM (
  SELECT DISTINCT regexp_extract(concat('/', source, '/doc_', doc_id), '^(/[^/]+)/', 1) AS name,
         TRUE AS is_folder
  FROM documents
) ORDER BY lower(name)
""".strip()


def batch_progress(batch_docs: DataFrame) -> DataFrame:
    """A5 batch progress (BatchesEndpoints.cs:14, batches/batch_documents
    schema KnowledgeDbContext.cs:337-396): per-batch counters + derived
    batch status, one group-by over the job-run table."""
    agg = batch_docs.groupBy("batch_id").agg(
        F.count(F.lit(1)).alias("total_files"),
        F.count(F.when(F.col("status") == "Ready", 1)).alias("completed"),
        F.count(F.when(F.col("status") == "Failed", 1)).alias("failed"),
    )
    done = F.col("completed") + F.col("failed") == F.col("total_files")
    return agg.withColumn(
        "batch_status",
        F.when(done & (F.col("failed") > 0), "CompletedWithErrors")
        .when(done, "Completed")
        .otherwise("InProgress"),
    ).orderBy("batch_id")


def sql_batch_progress(src: str) -> str:
    return f"""
SELECT batch_id, total_files, completed, failed,
       CASE WHEN completed + failed = total_files AND failed > 0 THEN 'CompletedWithErrors'
            WHEN completed + failed = total_files THEN 'Completed'
            ELSE 'InProgress' END AS batch_status
FROM (
  SELECT batch_id, count(*) AS total_files,
         count(CASE WHEN status = 'Ready' THEN 1 END) AS completed,
         count(CASE WHEN status = 'Failed' THEN 1 END) AS failed
  FROM ({src}) GROUP BY batch_id
)
ORDER BY batch_id
""".strip()
