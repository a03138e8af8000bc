"""Source connectors (S1-S5, SURVEY.md §2.1) — Spark-first.

The reference's IConnector surface (IConnector.cs:3-23 — ReadFileAsync,
ListFilesAsync(prefix) → [ConnectorFile(Path, SizeBytes, LastModified,
ContentType)], ExistsAsync, WatchAsync) collapses into Spark's ``binaryFile``
source: listing, prefix pruning, parallel reads, and (path, length,
modificationTime, content) columns all come from the data source framework;
cloud stores are the same code with an ``s3a://`` / ``abfss://`` URI —
Hadoop's connectors do the paginated listing the reference hand-rolls
(S3Connector.cs:78-108).

ConnectorType dispatch (S5, ConnectorFactory.cs + StorageModels.cs:3) is a
URI-scheme resolver: a container row maps to (uri, options), not a class
hierarchy.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ConnectorType enum (StorageModels.cs:3): value → URI scheme builder
CONNECTOR_SCHEMES = {
    0: "s3a",  # ManagedStorage (MinIO) — s3a against the MinIO endpoint
    1: "file",  # Filesystem
    3: "s3a",  # S3
    4: "abfss",  # AzureBlob
}


def connector_uri(connector_type: int, config: dict) -> str:
    """S5 dispatch: container row → source URI. Mirrors
    ConnectorFactory.Create + each connector's path mapping."""
    scheme = CONNECTOR_SCHEMES.get(connector_type)
    if scheme is None:
        raise ValueError(f"unknown connector_type {connector_type}")
    if scheme == "file":
        return "file://" + os.path.abspath(config["root_path"])
    if scheme == "s3a":
        return f"s3a://{config['bucket']}/{config.get('prefix', '').lstrip('/')}"
    return (
        f"abfss://{config['container']}@{config['account']}.dfs.core.windows.net/"
        f"{config.get('prefix', '').lstrip('/')}"
    )


def list_files(
    spark: SparkSession,
    uri: str,
    glob: str | None = None,
    recursive: bool = True,
) -> DataFrame:
    """S1-S4 ListFilesAsync: listing WITHOUT reading content — binaryFile
    scan of metadata columns only (column pruning drops the content IO).
    Returns (path, size_bytes, last_modified)."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    return reader.load(uri).select(
        F.col("path"),
        F.col("length").alias("size_bytes"),
        F.col("modificationTime").alias("last_modified"),
    )


def read_files(
    spark: SparkSession,
    uri: str,
    glob: str | None = None,
    recursive: bool = True,
) -> DataFrame:
    """S1-S4 ReadFileAsync, batch form: (path, size_bytes, last_modified,
    content: binary). One task per file group; cloud listing is pushed to
    the store's LIST API by the Hadoop connector."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    return reader.load(uri).select(
        F.col("path"),
        F.col("length").alias("size_bytes"),
        F.col("modificationTime").alias("last_modified"),
        F.col("content"),
    )


def decode_text(files: DataFrame, encoding: str = "UTF-8") -> DataFrame:
    """Text-file decode (P1 entry): binary → string column, JVM-side."""
    return files.withColumn("text", F.decode(F.col("content"), encoding))


# ---------------------------------------------------------------------------
# §2.9 connection testers (reference: Connapse.Storage/ConnectionTesters/*,
# ConnectionTestResult.cs:1-50 — Success/Message/Details/Duration shape)
# ---------------------------------------------------------------------------


def _result(success: bool, message: str, details: dict, t0: float) -> dict:
    import time

    return {
        "success": success,
        "message": message,
        "details": details,
        "duration_s": round(time.monotonic() - t0, 3),
    }


def test_storage_connection(
    spark: SparkSession, uri: str, glob: str | None = None
) -> dict:
    """Storage tester (S3ConnectionTester.cs / AzureBlobConnectionTester.cs /
    MinioConnectionTester.cs analogue): the cheapest authenticated
    round-trip is a metadata-only listing capped at one file — exercises
    scheme resolution, credentials, and bucket/container reachability
    without reading content. Never raises; failures come back in the
    result like ConnectionTestResult.CreateFailure."""
    import time

    t0 = time.monotonic()
    try:
        n = len(list_files(spark, uri, glob).limit(1).collect())
        return _result(
            True,
            f"Connected to {uri} ({'files visible' if n else 'empty prefix'})",
            {"files_seen": n},
            t0,
        )
    except Exception as ex:  # noqa: BLE001 — tester surface, never raises
        return _result(
            False, f"Connection failed: {type(ex).__name__}", {"error": str(ex)}, t0
        )


def test_embedding_provider(
    provider=None, dims: int = 64, probe_text: str = "connection probe"
) -> dict:
    """Embedding-provider tester (TeiConnectionTester.cs /
    OpenAiConnectionTester.cs analogue): one tiny driver-side probe call,
    validating the (texts → vectors) contract and the dimension count the
    index expects — the same checks the reference runs before saving a
    provider config."""
    import time

    from connapse_spark.functions.embed import embed_py

    t0 = time.monotonic()
    fn = provider or (lambda texts: [embed_py(t, dims) for t in texts])
    try:
        out = fn([probe_text])
        if len(out) != 1 or len(out[0]) != dims:
            return _result(
                False,
                f"Provider returned shape ({len(out)}, {len(out[0]) if out else 0}), expected (1, {dims})",
                {"expected_dims": dims},
                t0,
            )
        return _result(True, f"Embedding provider OK ({dims} dims)", {"dims": dims}, t0)
    except Exception as ex:  # noqa: BLE001
        return _result(
            False, f"Provider call failed: {type(ex).__name__}", {"error": str(ex)}, t0
        )


def test_llm_provider(complete_fn=None, probe_prompt: str = "ping") -> dict:
    """LLM-provider tester (OllamaConnectionTester.cs /
    AnthropicConnectionTester.cs analogue): one tiny completion, checking
    the (prompts → strings) contract."""
    import time

    t0 = time.monotonic()
    if complete_fn is None:
        import pandas as pd

        from connapse_spark.operators.rag import fake_provider

        complete_fn = lambda ps: list(fake_provider(pd.Series(ps)))  # noqa: E731
    try:
        out = complete_fn([probe_prompt])
        ok = len(out) == 1 and isinstance(out[0], str) and out[0]
        return (
            _result(True, "LLM provider OK", {"sample_len": len(out[0])}, t0)
            if ok
            else _result(False, "Provider returned empty/invalid completion", {}, t0)
        )
    except Exception as ex:  # noqa: BLE001
        return _result(
            False, f"Provider call failed: {type(ex).__name__}", {"error": str(ex)}, t0
        )
