"""Incremental-indexing operators (SURVEY.md §2.8) — the reference's
"streaming": reindex delta detection (M1), cloud sync delta (M2), and
last-writer-wins upserts (S6/M5).

All three are pure joins + CASE chains — the batch-correct replacement for
the reference's interactive generation machinery. At 100 TB they are one
full-outer join on the path/key (shuffle both sides once) and scale with the
catalog size, not the content size — content never moves, only listings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def reindex_decisions(
    catalog: DataFrame,
    listing: DataFrame,
    current_settings_key: str,
    forced: bool = False,
    path_col: str = "path",
) -> DataFrame:
    """M1 ReindexService decision join (ReindexService.cs:95-541): per
    document decide (action, reason) with the reference's precedence:
    Forced > FileNotFound > ContentChanged > ChunkingSettingsChanged >
    NeverIndexed > Unchanged.

    catalog: (path, content_hash, settings_key, last_indexed_at, status)
    listing: (path, content_hash) — the freshly-hashed source listing.
    """
    cat = catalog.alias("c")
    lst = listing.select(
        F.col(path_col).alias("path"), F.col("content_hash").alias("new_hash")
    ).alias("l")
    joined = cat.join(lst, F.col(f"c.{path_col}") == F.col("l.path"), "left")
    reason = (
        F.when(F.lit(forced), "Forced")
        .when(F.col("l.path").isNull(), "FileNotFound")
        .when(F.col("c.content_hash") != F.col("new_hash"), "ContentChanged")
        .when(F.col("c.settings_key") != F.lit(current_settings_key), "ChunkingSettingsChanged")
        .when(
            F.col("c.last_indexed_at").isNull() | (F.col("c.status") != "Ready"),
            "NeverIndexed",
        )
        .otherwise("Unchanged")
    )
    action = (
        F.when(reason == "FileNotFound", "Fail")
        .when(reason == "Unchanged", "Skip")
        .otherwise("Enqueue")
    )
    return joined.select(
        F.col(f"c.{path_col}").alias("path"), reason.alias("reason"), action.alias("action")
    )


def sync_delta(
    remote: DataFrame,
    catalog: DataFrame,
    snapshot: DataFrame,
    path_col: str = "path",
) -> DataFrame:
    """M2 ConnectorWatcherService delta sets (ConnectorWatcherService.cs:
    426-549): full-outer join remote listing vs catalog vs previous
    snapshot → action ∈ {create, update, delete, none}.

    remote/snapshot: (path, size_bytes, last_modified); catalog: (path).
    update = present in both remote+catalog AND (size or mtime changed vs
    snapshot); create = remote ∖ catalog; delete = catalog ∖ remote.
    """
    r = remote.select(
        F.col(path_col).alias("path"),
        F.col("size_bytes").alias("r_size"),
        F.col("last_modified").alias("r_mtime"),
    )
    c = catalog.select(F.col(path_col).alias("path"), F.lit(True).alias("in_catalog"))
    s = snapshot.select(
        F.col(path_col).alias("path"),
        F.col("size_bytes").alias("s_size"),
        F.col("last_modified").alias("s_mtime"),
    )
    j = r.join(c, "path", "full_outer").join(s, "path", "left")
    action = (
        F.when(F.col("r_size").isNotNull() & F.col("in_catalog").isNull(), "create")
        .when(F.col("r_size").isNull() & F.col("in_catalog").isNotNull(), "delete")
        .when(
            (F.col("r_size") != F.col("s_size"))
            | (F.col("r_mtime") != F.col("s_mtime"))
            | F.col("s_size").isNull(),
            "update",
        )
        .otherwise("none")
    )
    return j.select("path", action.alias("action"))


def upsert_last_writer_wins(
    existing: DataFrame,
    incoming: DataFrame,
    key_cols: list[str],
    order_col: str,
) -> DataFrame:
    """S6 document upsert with M5 semantics: union old+new, keep the row with
    the highest order_col per key, generation = count of versions seen
    (PostgresDocumentStore.cs:32-98 → row_number/count windows)."""
    unioned = existing.withColumn("_src", F.lit(0)).unionByName(
        incoming.withColumn("_src", F.lit(1))
    )
    w = Window.partitionBy(*key_cols).orderBy(F.desc(order_col), F.desc("_src"))
    return (
        unioned.withColumn("_rn", F.row_number().over(w))
        .withColumn("generation", F.count(F.lit(1)).over(Window.partitionBy(*key_cols)))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )


def delete_cascade(
    docs: DataFrame, chunks: DataFrame, vectors: DataFrame, deleted_doc_ids: DataFrame
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """S8 delete cascade (PgVectorStore.cs:299-347, FK cascades) as anti
    joins: doc → chunks → vectors."""
    d = deleted_doc_ids.select(F.col("document_id"))
    return (
        docs.join(d, docs["document_id"] == d["document_id"], "left_anti"),
        chunks.join(d, "document_id", "left_anti"),
        vectors.join(d, "document_id", "left_anti"),
    )
