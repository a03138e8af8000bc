"""S4 WRITE path (VERDICT r5 ask #3): the managed-storage upload flow
against a moto S3 server — upload through the connector, see it in the
listing, read it back through the S3→parse→chunk pipeline, and check the
reference's validation rules reject exactly what UploadService rejects."""

import pytest
from pyspark.sql import functions as F

moto = pytest.importorskip("moto.server")

from connapse_spark.sources import connectors, upload


@pytest.fixture(scope="module")
def s3_env():
    from moto.server import ThreadedMotoServer

    srv = ThreadedMotoServer(port=0)
    srv.start()
    port = srv._server.socket.getsockname()[1]
    ep = f"http://127.0.0.1:{port}"
    c = connectors.s3_client(ep)
    c.create_bucket(Bucket="managed")
    yield ep
    srv.stop()


def _files(spark, rows):
    return spark.createDataFrame(
        rows, "file_name string, dir_path string, content binary"
    )


def test_put_exists_delete_single(s3_env):
    r = connectors.s3_put_object(
        "managed", "ctl/manifest.json", b'{"v":1}', "application/json", s3_env
    )
    assert r["path"] == "s3://managed/ctl/manifest.json" and r["size_bytes"] == 7
    assert connectors.s3_object_exists("managed", "ctl/manifest.json", s3_env)
    connectors.s3_delete_object("managed", "ctl/manifest.json", s3_env)
    assert not connectors.s3_object_exists("managed", "ctl/manifest.json", s3_env)
    # DeleteFileAsync contract: deleting a missing key is success
    connectors.s3_delete_object("managed", "ctl/manifest.json", s3_env)


def test_write_objects_distributed_roundtrip(spark, s3_env):
    files = spark.createDataFrame(
        [(f"w/doc{i}.txt", f"write path body {i}".encode()) for i in range(8)],
        "key string, content binary",
    ).repartition(3)  # >1 partition: PUTs provably run on executors
    receipts = connectors.s3_write_objects(files, "managed", endpoint_url=s3_env)
    rows = receipts.collect()
    assert len(rows) == 8 and all(r["etag"] for r in rows)
    listing = connectors.s3_list_objects(spark, "managed", prefix="w/", endpoint_url=s3_env)
    assert listing.count() == 8
    back = connectors.s3_read_objects(listing, endpoint_url=s3_env).collect()
    got = {r["path"]: bytes(r["content"]) for r in back}
    assert got["s3://managed/w/doc3.txt"] == b"write path body 3"


def test_upload_flow_validation_and_landing(spark, s3_env):
    files = _files(
        spark,
        [
            ("good.md", "notes/a", b"# Title\n\nuploaded body text"),
            ("also good.txt", None, b"root level file"),
            ("bad/../name.txt", "x", b"data"),  # invalid filename (separator)
            ("traversal.txt", "a/../../b", b"data"),  # path traversal
            ("noext", "x", b"data"),  # unsupported extension
            ("empty.txt", "x", b""),  # zero-byte
            ("x" * 300 + ".txt", "x", b"data"),  # filename too long
            (None, "x", b"data"),  # NULL name must be invalid, not a crash
        ],
    )
    res = upload.upload_documents(files, "managed", prefix="up", endpoint_url=s3_env)
    rows = {r["file_name"]: r for r in res.collect()}
    assert rows["good.md"]["success"]
    assert rows["good.md"]["path"] == "s3://managed/up/notes/a/good.md"
    assert rows["good.md"]["content_type"] == "text/markdown"
    assert rows["also good.txt"]["virtual_path"] == "/also good.txt"
    assert not rows["bad/../name.txt"]["success"]
    assert "Invalid filename" in rows["bad/../name.txt"]["error"]
    assert "traversal" in rows["traversal.txt"]["error"]
    assert "Unsupported" in rows["noext"]["error"]
    assert "empty" in rows["empty.txt"]["error"]
    assert "exceeds" in rows["x" * 300 + ".txt"]["error"]
    assert not rows[None]["success"] and "Invalid filename" in rows[None]["error"]
    # landing is real: the listing delta sees exactly the 2 valid files
    listing = connectors.s3_list_objects(spark, "managed", prefix="up/", endpoint_url=s3_env)
    assert listing.count() == 2


def test_upload_duplicate_paths_collapse_to_one(spark, s3_env):
    """Two batch rows with the same virtual path: path identity means ONE
    upload and ONE result row (the reference upserts by path), not a
    many-to-many receipt fan-out."""
    files = _files(
        spark,
        [("dup.txt", "d", b"first body"), ("dup.txt", "d", b"second body")],
    )
    res = upload.upload_documents(files, "managed", prefix="dup", endpoint_url=s3_env)
    rows = res.collect()
    assert len(rows) == 1 and rows[0]["success"]
    listing = connectors.s3_list_objects(spark, "managed", prefix="dup/", endpoint_url=s3_env)
    assert listing.count() == 1


def test_upload_to_ingest_pipeline(spark, s3_env):
    """Landed upload → S3 read-back → parse → chunk: the full S4 write +
    read cycle feeding the ingest pipeline (reference: UploadService →
    IngestionQueue → IngestionPipeline)."""
    from connapse_spark.sources import parsers

    files = _files(
        spark,
        [(f"pipe{i}.txt", "corpus", ("sentence one. " * 30 + f"tail {i}").encode()) for i in range(4)],
    )
    res = upload.upload_documents(files, "managed", prefix="land", endpoint_url=s3_env)
    assert res.filter("success").count() == 4
    docs = upload.document_rows(res, container_id="c1")
    assert docs.count() == 4
    assert docs.select("doc_id").distinct().count() == 4  # path-identity ids
    listing = connectors.s3_list_objects(spark, "managed", prefix="land/", endpoint_url=s3_env)
    fetched = connectors.s3_read_objects(listing, endpoint_url=s3_env)
    parsed = parsers.parse_text_documents(connectors.decode_text(fetched))
    assert parsed.count() == 4
    from connapse_spark.operators.chunking import chunk_recursive_native

    chunks = chunk_recursive_native(
        parsed.select(F.col("path").alias("doc_id"), F.col("text")),
        max_chars=120,
        text_col="text",
    )
    assert chunks.count() > 4  # every doc split into multiple chunks


def test_normalize_path_expr_matches_reference_rules(spark):
    cases = spark.createDataFrame(
        [
            ("a/b/c",),
            ("/a//b/",),
            ("a/./b",),
            ("a/../b",),
            ("../../x",),
            ("",),
            (None,),
            ("\\win\\style",),
        ],
        "p string",
    )
    got = [
        r["n"]
        for r in cases.select(upload.normalize_path_expr(F.col("p")).alias("n")).collect()
    ]
    assert got == ["/a/b/c", "/a/b", "/a/b", "/b", "/x", "/", "/", "/win/style"]
