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
