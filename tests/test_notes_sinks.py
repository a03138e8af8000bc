"""Agent-memory notes (IAgentMemory) and partitioned sink round-trips."""

import os

from pyspark.sql import functions as F

from connapse_spark.operators import notes
from connapse_spark.operators.ingest import ingest
from connapse_spark.sources import sinks


def _notes_df(spark, rows):
    return spark.createDataFrame(rows, "key string, content string, version long")


def test_notes_save_get_delete_search(spark):
    existing = _notes_df(spark, [("a", "spark is a batch engine", 1), ("b", "ducks quack", 1)])
    incoming = _notes_df(spark, [("a", "spark is a distributed engine", 2), ("c", "new note", 2)])
    merged = notes.save_notes(existing, incoming)
    rows = {r["key"]: r for r in merged.collect()}
    assert rows["a"]["content"] == "spark is a distributed engine"  # LWW
    assert set(rows) == {"a", "b", "c"}

    assert notes.get_note(merged, "b").count() == 1
    after = notes.delete_notes(merged, spark.createDataFrame([("b",)], "key string"))
    assert {r["key"] for r in after.collect()} == {"a", "c"}

    hits = notes.search_notes(merged, "spark engine", top_k=2).collect()
    assert len(hits) >= 1
    assert hits[0]["id"] == "a"  # both query terms hit note a


def test_vectors_sink_partitions_by_model(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).limit(20)
    _, vectors = ingest(docs)
    path = str(tmp_path / "vectors")
    sinks.write_vectors(vectors, path)
    assert os.path.isdir(os.path.join(path, "model_id=hash-64"))
    back = spark.read.parquet(path)
    assert back.count() == vectors.count()
    # model filter is partition pruning on the stored table
    plan = back.filter(F.col("model_id") == "hash-64")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_chunks_sink_roundtrip(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).limit(10)
    chunks, _ = ingest(docs)
    path = str(tmp_path / "chunks")
    sinks.write_chunks(chunks, path)
    back = spark.read.parquet(path)
    assert back.count() == chunks.count()
    assert set(back.columns) >= set(chunks.columns)


# ---------------------------------------------------------------------------
# §2.9 connection testers
# ---------------------------------------------------------------------------


def test_storage_connection_ok_and_failure(spark, tmp_path):
    from connapse_spark.sources.connectors import test_storage_connection

    (tmp_path / "a.txt").write_text("hello")
    ok = test_storage_connection(spark, f"file://{tmp_path}")
    assert ok["success"] is True and ok["details"]["files_seen"] == 1
    bad = test_storage_connection(spark, f"file://{tmp_path}/definitely-missing")
    assert bad["success"] is False and "error" in bad["details"]
    assert bad["duration_s"] >= 0.0


def test_embedding_provider_tester_shapes():
    from connapse_spark.sources.connectors import test_embedding_provider

    assert test_embedding_provider()["success"] is True
    short = test_embedding_provider(provider=lambda ts: [[0.0] * 3 for _ in ts])
    assert short["success"] is False and "expected (1, 64)" in short["message"]
    boom = test_embedding_provider(provider=lambda ts: 1 / 0)
    assert boom["success"] is False and "ZeroDivisionError" in boom["message"]


def test_llm_provider_tester():
    from connapse_spark.sources.connectors import test_llm_provider

    assert test_llm_provider()["success"] is True
    assert test_llm_provider(lambda ps: [""])["success"] is False


def test_training_shards_deterministic_export(spark, sf_dir, tmp_path):
    from connapse_spark.sources import sinks
    import hashlib
    import pathlib

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(120)

    def export(p):
        sinks.write_training_shards(docs, str(p), n_shards=4)
        out = {}
        for f in sorted(pathlib.Path(p).rglob("*.json")):
            out.setdefault(f.parent.name, hashlib.sha256()).update(f.read_bytes())
        return {k: v.hexdigest() for k, v in out.items()}

    a = export(tmp_path / "a")
    b = export(tmp_path / "b")
    # identical data → byte-identical shards, independent of run
    assert a == b and set(a) == {f"shard={i}" for i in range(4)}
    # re-read round-trips every row, and shard dirs match shard_expr
    back = spark.read.json(str(tmp_path / "a"))
    assert back.count() == 120
    man = sinks.shard_manifest(docs, n_shards=4).collect()
    assert sum(r["n_docs"] for r in man) == 120
    # manifest shards = written shards
    assert {f"shard={r['shard']}" for r in man} == set(a)
