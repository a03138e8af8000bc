"""Managed-storage upload flow (S4 write path) — the batch/Spark form of
the reference's UploadService (UploadService.cs:54-167) over the connector
write surface (IConnector.WriteFileAsync, MinioConnector.cs WriteFileAsync).

Reference flow per file: validate input (filename length/characters, path
traversal, depth, supported extension, zero-byte) → normalize the virtual
path → infer content type → WriteFileAsync through the connector → upsert
the document row (generation++) → enqueue ingestion. Here the whole batch
is ONE plan: validation is a column expression evaluated in the scan
(invalid rows are carried with their error, the BulkUploadResult shape —
one bad file never fails the batch, UploadService.BulkUploadAsync),
valid rows PUT through :func:`connectors.s3_write_objects` (executor-side,
bytes never on the driver), and the receipt joins back into a
documents-shaped frame ready for maintenance.upsert_last_writer_wins
(generation/staleness, S6) and operators.ingest (parse→chunk→embed).

Scale: the validate/route step is pure narrow column work; the PUT step is
as wide as the upload frame's partitioning — a 1000-executor cluster lands
1000 objects at a time, which is the regime the reference's per-request
loop cannot reach.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from connapse_spark.sources import connectors
from connapse_spark.sources.parsers import SUPPORTED_EXTENSIONS, file_ext

MAX_FILE_NAME_LENGTH = 255  # ValidationConstants.cs:21
MAX_PATH_DEPTH = 50  # ValidationConstants.cs:20

# UploadService.cs:18-32 ContentTypeMap (case-insensitive, default
# application/octet-stream)
CONTENT_TYPE_MAP = {
    ".txt": "text/plain",
    ".md": "text/markdown",
    ".pdf": "application/pdf",
    ".docx": "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
    ".doc": "application/msword",
    ".pptx": "application/vnd.openxmlformats-officedocument.presentationml.presentation",
    ".xlsx": "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet",
    ".csv": "text/csv",
    ".json": "application/json",
    ".xml": "application/xml",
    ".html": "text/html",
    ".htm": "text/html",
}


def infer_content_type_expr(file_name: Column) -> Column:
    """UploadService.InferContentType: extension → MIME, default
    application/octet-stream."""
    ext = file_ext(file_name)
    expr = F.lit("application/octet-stream")
    for e, ct in CONTENT_TYPE_MAP.items():
        expr = F.when(ext == e, F.lit(ct)).otherwise(expr)
    return expr


def normalize_path_expr(path: Column) -> Column:
    """PathUtilities.NormalizePath as a column expression: backslashes →
    slashes, trim, leading slash, '.' and '..' segments collapsed with
    root-clamping, no trailing slash. Implemented with aggregate over the
    split segments (the stack collapse) — JVM-side, no UDF."""
    p = F.regexp_replace(F.trim(F.coalesce(path, F.lit(""))), r"\\", "/")
    segs = F.filter(F.split(p, "/"), lambda s: (s != "") & (s != "."))
    collapsed = F.aggregate(
        segs,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            s == "..",
            # pop (clamped at root)
            F.when(F.size(acc) > 0, F.slice(acc, 1, F.size(acc) - 1)).otherwise(acc),
        ).otherwise(F.concat(acc, F.array(s))),
    )
    joined = F.concat(F.lit("/"), F.array_join(collapsed, "/"))
    return F.when(joined == "/", F.lit("/")).otherwise(joined)


def _is_valid_filename(name: Column) -> Column:
    """PathUtilities.IsValidFileName: non-empty, no control chars, no
    directory separators, not '.' / '..'."""
    normalized = F.regexp_replace(name, r"\\", "/")
    return (
        (F.length(F.trim(name)) > 0)
        & ~name.rlike(r"[\x00-\x1f\x7f]")
        & ~normalized.contains("/")
        & (normalized != "..")
        & (normalized != ".")
    )


def validate_uploads(
    files: DataFrame,
    file_col: str = "file_name",
    dir_col: str = "dir_path",
    content_col: str = "content",
) -> DataFrame:
    """UploadService.ValidateInput as one column expression: adds ``error``
    (NULL = valid) and ``virtual_path`` (normalized dir + file name). The
    checks run in the reference's order so the FIRST failing rule is the
    reported error."""
    name = F.col(file_col)
    raw_dir = F.coalesce(F.col(dir_col), F.lit("/")) if dir_col in files.columns else F.lit("/")
    norm = normalize_path_expr(raw_dir)
    virtual = F.when(norm == "/", F.concat(F.lit("/"), name)).otherwise(
        F.concat(norm, F.lit("/"), name)
    )
    raw_segs = F.filter(F.split(F.regexp_replace(raw_dir, r"\\", "/"), "/"), lambda s: s != "")
    has_traversal = F.exists(raw_segs, lambda s: s == "..")
    depth = F.size(raw_segs)
    supported = file_ext(name).isin(list(SUPPORTED_EXTENSIONS))
    empty = F.coalesce(F.length(F.col(content_col)), F.lit(0)) == 0
    error = (
        # NULL name first: every later rule evaluates to SQL NULL on a NULL
        # name (no .when() fires), which would route the row to the PUT
        # stage as "valid" and crash the executor on key=None
        F.when(name.isNull(), F.lit("Invalid filename: missing."))
        .when(
            F.length(name) > MAX_FILE_NAME_LENGTH,
            F.lit(f"Filename exceeds {MAX_FILE_NAME_LENGTH} characters."),
        )
        .when(~_is_valid_filename(name), F.concat(F.lit("Invalid filename: '"), name, F.lit("'.")))
        .when(has_traversal, F.lit("Path traversal is not allowed."))
        .when(
            depth > MAX_PATH_DEPTH,
            F.lit(f"Path exceeds maximum depth of {MAX_PATH_DEPTH} levels."),
        )
        .when(~supported, F.lit("Unsupported file extension."))
        .when(empty, F.lit("File is empty. Zero-byte uploads are not allowed."))
    )
    return files.withColumn("virtual_path", virtual).withColumn("error", error)


def upload_documents(
    files: DataFrame,
    bucket: str,
    prefix: str = "",
    endpoint_url: str | None = None,
    batch_id: str | None = None,
    file_col: str = "file_name",
    dir_col: str = "dir_path",
    content_col: str = "content",
) -> DataFrame:
    """Bulk upload (UploadService.BulkUploadAsync): validate → land valid
    files in the object store → return per-file results. Output columns:
    (file_name, virtual_path, path, size_bytes, content_type, success,
    error, batch_id) — ``path`` is the landed s3:// URI (NULL on reject).

    The landed receipt rows ARE the documents-table delta: feed them to
    :func:`document_rows` then maintenance.upsert_last_writer_wins (S6
    generation++) and the ingest pipeline — the reference's
    document-upsert + ingestion-enqueue steps, batch form."""
    validated = validate_uploads(files, file_col, dir_col, content_col)
    valid = validated.filter(F.col("error").isNull())
    rejected = validated.filter(F.col("error").isNotNull())

    # build the FULL key here (prefix included) so the receipt's key joins
    # back to this frame exactly
    pfx = prefix.strip("/")
    key_expr = F.regexp_replace("virtual_path", r"^/", "")
    if pfx:
        key_expr = F.concat(F.lit(pfx + "/"), key_expr)
    # path identity: rows landing on the same key collapse to ONE upload
    # (the reference upserts by path — same-path uploads overwrite); without
    # this, duplicate keys fan out many-to-many in the receipt join below
    to_put = valid.select(
        F.col("virtual_path"),
        key_expr.alias("key"),
        F.col(content_col).alias("content"),
        infer_content_type_expr(F.col(file_col)).alias("content_type"),
        F.col(file_col).alias("file_name"),
    ).dropDuplicates(["key"])
    receipts = connectors.s3_write_objects(
        to_put.select("key", "content", "content_type"),
        bucket,
        endpoint_url=endpoint_url,
    )
    landed = (
        to_put.select("key", "virtual_path", "file_name", "content_type")
        .join(receipts, "key")
        .select(
            "file_name",
            "virtual_path",
            "path",
            "size_bytes",
            "content_type",
            F.lit(True).alias("success"),
            F.lit(None).cast("string").alias("error"),
        )
    )
    failed = rejected.select(
        F.col(file_col).alias("file_name"),
        "virtual_path",
        F.lit(None).cast("string").alias("path"),
        F.lit(None).cast("long").alias("size_bytes"),
        F.lit(None).cast("string").alias("content_type"),
        F.lit(False).alias("success"),
        "error",
    )
    out = landed.unionByName(failed)
    return out.withColumn("batch_id", F.lit(batch_id).cast("string"))


def document_rows(
    upload_results: DataFrame,
    container_id: str,
    ingested_via: str = "api",
) -> DataFrame:
    """Successful upload receipts → documents-table rows (the eager
    document upsert in ExecuteUploadAsync): deterministic doc_id =
    xxhash64(container, virtual_path) — the reference upserts BY PATH, so
    path identity IS document identity; generation semantics come from
    maintenance.upsert_last_writer_wins downstream."""
    return upload_results.filter(F.col("success")).select(
        F.xxhash64(F.lit(container_id), F.col("virtual_path")).alias("doc_id"),
        F.lit(container_id).alias("container_id"),
        F.col("file_name"),
        F.col("content_type"),
        F.col("virtual_path").alias("doc_path"),
        F.col("size_bytes"),
        F.col("path").alias("storage_uri"),
        F.lit(ingested_via).alias("ingested_via"),
    )
