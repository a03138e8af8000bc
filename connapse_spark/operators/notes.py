"""Agent memory (IAgentMemory.cs:3-9 — SaveNote/GetNote/SearchNotes/
DeleteNote): a ``notes`` table that REUSES the engine's chunk/embed/search
operators — the reference wires the same stores under a different surface.

Batch semantics: save = last-writer-wins upsert on key (S6 pattern),
delete = anti-join, search = the hybrid pipeline over note content with the
note key as the id. Nothing here is new machinery — that is the point."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from connapse_spark.operators.maintenance import upsert_last_writer_wins
from connapse_spark.operators.search import SearchOptions, hybrid_search


def save_notes(existing: DataFrame, incoming: DataFrame) -> DataFrame:
    """Upsert notes on key; newest version wins (version = monotonically
    assigned by the caller, e.g. batch timestamp)."""
    return upsert_last_writer_wins(existing, incoming, ["key"], "version").drop(
        "generation"
    )


def delete_notes(notes: DataFrame, keys: DataFrame) -> DataFrame:
    """DeleteNote as an anti-join (S8 delete-cascade pattern)."""
    return notes.join(keys.select("key"), "key", "left_anti")


def get_note(notes: DataFrame, key: str) -> DataFrame:
    return notes.filter(F.col("key") == key)


def search_notes(notes: DataFrame, query: str, top_k: int = 5) -> DataFrame:
    """SearchNotesAsync(query, topK): hybrid search over note content."""
    return hybrid_search(
        notes,
        query,
        SearchOptions(top_k=top_k),
        id_col="key",
        text_col="content",
    )
