"""Executable S2 path: the boto3 S3 connector against a moto server —
the LocalStack role the reference's integration tests play
(tests/Connapse.Integration.Tests/LocalStackFixture.cs). The server runs
in its own thread with a real HTTP port, so Spark EXECUTOR processes (not
just the driver) hit the S3 API — a genuine distributed fetch."""

import pytest
from pyspark.sql import functions as F

moto = pytest.importorskip("moto.server")

from connapse_spark.sources import connectors


@pytest.fixture(scope="module")
def s3_env():
    from moto.server import ThreadedMotoServer

    srv = ThreadedMotoServer(port=0)
    srv.start()
    port = srv._server.socket.getsockname()[1]
    ep = f"http://127.0.0.1:{port}"
    c = connectors.s3_client(ep)
    c.create_bucket(Bucket="corpus")
    docs = {
        f"docs/doc{i}.txt": f"hello s3 document {i} with some text body".encode()
        for i in range(12)
    }
    docs["other/skip.txt"] = b"outside the prefix"
    for k, body in docs.items():
        c.put_object(Bucket="corpus", Key=k, Body=body)
    yield ep, docs
    srv.stop()


def test_s3_list_prefix_pruning(spark, s3_env):
    ep, docs = s3_env
    listing = connectors.s3_list_objects(spark, "corpus", prefix="docs/", endpoint_url=ep)
    rows = listing.collect()
    assert len(rows) == 12
    assert all(r["path"].startswith("s3://corpus/docs/") for r in rows)
    sizes = {r["path"]: r["size_bytes"] for r in rows}
    assert sizes["s3://corpus/docs/doc0.txt"] == len(docs["docs/doc0.txt"])


def test_s3_read_objects_distributed_roundtrip(spark, s3_env):
    ep, docs = s3_env
    listing = connectors.s3_list_objects(spark, "corpus", prefix="docs/", endpoint_url=ep)
    # >1 partition so the fetch provably runs in executor workers
    fetched = connectors.s3_read_objects(listing.repartition(3), endpoint_url=ep)
    got = {r["path"]: bytes(r["content"]) for r in fetched.collect()}
    assert got == {f"s3://corpus/{k}": v for k, v in docs.items() if k.startswith("docs/")}


def test_s3_to_parse_pipeline(spark, s3_env):
    """S3 → decode → text-parse: the connector output feeds the P1 parser
    unchanged — the upload→searchable path with a cloud source."""
    from connapse_spark.sources import parsers

    ep, _ = s3_env
    listing = connectors.s3_list_objects(spark, "corpus", prefix="docs/", endpoint_url=ep)
    raw = connectors.s3_read_objects(listing, endpoint_url=ep)
    texts = raw.select(
        F.col("path"), F.decode(F.col("content"), "UTF-8").alias("text")
    )
    parsed = parsers.parse_text_documents(
        texts.select(F.col("path"), F.col("text"))
    )
    rows = parsed.collect()
    assert len(rows) == 12
    assert all("hello s3 document" in r["text"] for r in rows)
    assert all(r["file_type"] == ".txt" for r in rows)


def test_s3_list_guard_raises_over_cap(spark, s3_env):
    ep, _ = s3_env
    with pytest.raises(ValueError, match="max_keys"):
        connectors.s3_list_objects(
            spark, "corpus", prefix="docs/", endpoint_url=ep, max_keys=5
        )


def test_s3_list_exactly_max_keys_is_not_truncation(spark, s3_env):
    """A prefix holding exactly max_keys objects completes without
    truncation and must NOT trip the guard (the r3 >= check did)."""
    ep, _ = s3_env
    rows = connectors.s3_list_objects(
        spark, "corpus", prefix="docs/", endpoint_url=ep, max_keys=12
    ).collect()
    assert len(rows) == 12


def test_s3_poll_cycle_drives_sync_delta(spark, s3_env):
    """The reference's cloud change-capture (M2 poll + delta sets,
    ConnectorWatcherService.cs:426-549), EXECUTED against the live S3 API:
    poll 1 lists the bucket; objects are then added, modified, and
    deleted; poll 2's listing + the poll-1 snapshot feed sync_delta and
    must classify every path correctly."""
    from connapse_spark.operators.maintenance import sync_delta

    ep, _ = s3_env
    c = connectors.s3_client(ep)
    c.put_object(Bucket="corpus", Key="sync/a.txt", Body=b"version one")
    c.put_object(Bucket="corpus", Key="sync/b.txt", Body=b"stays the same")
    c.put_object(Bucket="corpus", Key="sync/c.txt", Body=b"will be deleted")

    snap1 = connectors.s3_list_objects(spark, "corpus", prefix="sync/", endpoint_url=ep)
    snap1_rows = snap1.collect()  # materialize before mutating the bucket
    snap1 = spark.createDataFrame(snap1_rows, snap1.schema)

    import time as _time

    _time.sleep(1.1)  # S3 mtime granularity is seconds
    c.put_object(Bucket="corpus", Key="sync/a.txt", Body=b"version two, longer")
    c.delete_object(Bucket="corpus", Key="sync/c.txt")
    c.put_object(Bucket="corpus", Key="sync/d.txt", Body=b"brand new")

    remote = connectors.s3_list_objects(spark, "corpus", prefix="sync/", endpoint_url=ep)
    catalog = snap1.select("path")  # poll-1 state is what's indexed
    delta = {
        r["path"]: r["action"]
        for r in sync_delta(remote, catalog, snap1).collect()
        if r["action"] != "none"
    }
    assert delta == {
        "s3://corpus/sync/a.txt": "update",
        "s3://corpus/sync/c.txt": "delete",
        "s3://corpus/sync/d.txt": "create",
    }


def test_balance_by_size_spreads_bytes(spark):
    rows = [(f"s3://b/{i}", size, "t") for i, size in enumerate([1000, 10, 10, 10, 900, 10, 10, 800])]
    listing = spark.createDataFrame(rows, "path string, size_bytes long, last_modified string")
    # AQE would re-coalesce these byte-tiny test partitions; the property
    # under test is the range split itself
    old = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        balanced = connectors.balance_by_size(listing, 3)
        sizes = balanced.rdd.mapPartitions(
            lambda it: [sum(r["size_bytes"] for r in it)]
        ).collect()
        nonzero = [s for s in sizes if s > 0]
        # the three giants must not share a partition
        assert max(nonzero) < 1000 + 3 * 10 + 1, sizes
        assert balanced.count() == 8
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)


def test_s3_to_searchable_index_end_to_end(spark, s3_env, tmp_path):
    """The reference's flagship path (upload → ingest → hybrid-searchable,
    SURVEY §3.3) with a CLOUD source, fully executed: S3 objects → decode
    → ingest (chunk + embed) → vector sink → KNN probe finds the planted
    document."""
    from connapse_spark.functions.embed import embed_py
    from connapse_spark.operators.ingest import ingest
    from connapse_spark.operators.search import vector_knn

    ep, _ = s3_env
    c = connectors.s3_client(ep)
    needle = (
        "the amazing zanzibar quantum flamingo protocol describes how "
        "distributed flamingos synchronize their quantum dance steps"
    )
    c.put_object(Bucket="corpus", Key="ingest/needle.txt", Body=needle.encode())
    for i in range(5):
        c.put_object(
            Bucket="corpus",
            Key=f"ingest/hay{i}.txt",
            Body=f"ordinary filler document number {i} about nothing much".encode(),
        )

    listing = connectors.s3_list_objects(spark, "corpus", prefix="ingest/", endpoint_url=ep)
    raw = connectors.s3_read_objects(
        connectors.balance_by_size(listing, 2), endpoint_url=ep
    )
    docs = raw.select(
        F.abs(F.hash("path")).cast("long").alias("doc_id"),
        F.col("path"),
        F.decode(F.col("content"), "UTF-8").alias("text"),
    )
    chunks, vectors = ingest(docs)
    vpath = str(tmp_path / "vectors")
    vectors.select("chunk_id", "document_id", "embedding").write.parquet(vpath)

    index = spark.read.parquet(vpath).select(
        F.col("chunk_id").alias("vec_id"), "embedding"
    )
    # the deterministic hash embedder is self-similar, not semantic: the
    # query that must hit is the needle's own text (cosine 1.0), exactly
    # how the KNN oracle entries probe with a stored vector's text
    qv = embed_py(needle, 64)
    hits = vector_knn(index, qv, k=3).collect()
    top_chunk = hits[0]["vec_id"]
    assert hits[0]["score"] > 0.999
    content = {
        r["chunk_id"]: r["content"] for r in chunks.select("chunk_id", "content").collect()
    }
    assert "flamingo" in content[top_chunk]
