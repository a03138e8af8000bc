"""Format parsers (P1-P5, SURVEY.md §2.2) — Spark-first.

P1 TextParser (TextParser.cs:8-97) is pure column math: utf-8 decode +
line/heading/delimiter heuristics, fully oracle-checkable. P2/P3 (PDF /
Office) decode for real with stdlib-only parsers (``binary_decode.py``:
zip+XML for OOXML, zlib FlateDecode + Tj/TJ scan for PDF) behind
Arrow-batched ``mapInPandas`` plumbing; swap in ``pypdf``/``python-docx``
behind the same ``decode_binary`` signature if richer format coverage
(CID fonts, embedded objects) is needed in production.

Dispatch (P4, IngestionPipeline.ParseDocumentAsync:445-464) and the
supported-extension gate (P5, FileTypeValidator.cs:8-29) are a ``when``
chain / ``isin`` filter.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TEXT_EXTENSIONS = [".txt", ".md", ".markdown", ".csv", ".log", ".json", ".xml", ".yaml", ".yml"]
BINARY_EXTENSIONS = [".pdf", ".docx", ".pptx", ".epub"]
# engine extension beyond FileTypeValidator.cs: HTML routes through the
# boilerplate-stripping extractor (operators/htmltext.py), not TextParser
HTML_EXTENSIONS = [".html", ".htm", ".xhtml"]
SUPPORTED_EXTENSIONS = TEXT_EXTENSIONS + BINARY_EXTENSIONS + HTML_EXTENSIONS


def file_ext(path: Column) -> Column:
    name = F.element_at(F.split(path, "/"), -1)
    ext = F.regexp_extract(name, r"(\.[^.]+)$", 1)
    return F.lower(ext)


def sql_file_ext(path: str) -> str:
    return f"lower(regexp_extract(list_extract(string_split({path}, '/'), -1), '(\\.[^.]+)$', 1))"


def is_supported_expr(path: Column) -> Column:
    """P5 gate: union of parser extensions (FileTypeValidator.cs:8-29)."""
    return file_ext(path).isin(SUPPORTED_EXTENSIONS)


def sql_is_supported(path: str) -> str:
    exts = ", ".join(f"'{e}'" for e in SUPPORTED_EXTENSIONS)
    return f"{sql_file_ext(path)} IN ({exts})"


def parser_kind_expr(path: Column) -> Column:
    """P4 dispatch (IngestionPipeline.ParseDocumentAsync:445-464): route a
    path to the text or binary parser family; unsupported extensions get
    NULL (the validator rejects them before dispatch)."""
    ext = file_ext(path)
    return (
        F.when(ext.isin(TEXT_EXTENSIONS), F.lit("text"))
        .when(ext.isin(BINARY_EXTENSIONS), F.lit("binary"))
        .when(ext.isin(HTML_EXTENSIONS), F.lit("html"))
        .otherwise(F.lit(None).cast("string"))
    )


def sql_parser_kind(path: str) -> str:
    ext = sql_file_ext(path)
    t = ", ".join(f"'{e}'" for e in TEXT_EXTENSIONS)
    b = ", ".join(f"'{e}'" for e in BINARY_EXTENSIONS)
    h = ", ".join(f"'{e}'" for e in HTML_EXTENSIONS)
    return (
        f"CASE WHEN {ext} IN ({t}) THEN 'text' "
        f"WHEN {ext} IN ({b}) THEN 'binary' "
        f"WHEN {ext} IN ({h}) THEN 'html' ELSE NULL END"
    )


def csv_delimiter_expr(first_line: Column) -> Column:
    """P1's delimiter heuristic (TextParser.cs:70-83): the most frequent of
    ',' '\\t' ';' in the first line; ties favor ',' then '\\t' then ';'
    (first maximum wins); none present → null."""
    n_comma = F.length(first_line) - F.length(F.replace(first_line, F.lit(","), F.lit("")))
    n_tab = F.length(first_line) - F.length(F.replace(first_line, F.lit("\t"), F.lit("")))
    n_semi = F.length(first_line) - F.length(F.replace(first_line, F.lit(";"), F.lit("")))
    best = F.greatest(n_comma, n_tab, n_semi)
    return (
        F.when(best <= 0, F.lit(None).cast("string"))
        .when(n_comma == best, ",")
        .when(n_tab == best, "\t")
        .otherwise(";")
    )


def sql_csv_delimiter(first_line: str) -> str:
    counts = {
        "comma": f"length({first_line}) - length(replace({first_line}, ',', ''))",
        "tab": f"length({first_line}) - length(replace({first_line}, chr(9), ''))",
        "semi": f"length({first_line}) - length(replace({first_line}, ';', ''))",
    }
    best = f"greatest({counts['comma']}, {counts['tab']}, {counts['semi']})"
    return (
        f"CASE WHEN {best} <= 0 THEN NULL "
        f"WHEN {counts['comma']} = {best} THEN ',' "
        f"WHEN {counts['tab']} = {best} THEN chr(9) ELSE ';' END"
    )


def parse_text_documents(
    docs: DataFrame, path_col: str = "path", text_col: str = "text"
) -> DataFrame:
    """P1: per-document parse metadata as pure columns (TextParser.cs:8-97):
    file_type (extension), line_count, has_markdown_headers (any line
    starting '#'..'######' + space), csv_delimiter (csv files only)."""
    text = F.col(text_col)
    first_line = F.element_at(F.split(text, "\n", 2), 1)
    lines = F.split(text, "\n")
    ext = file_ext(F.col(path_col))
    return docs.withColumn("file_type", ext).withColumn(
        "line_count", F.size(lines)
    ).withColumn(
        "has_markdown_headers",
        F.exists(lines, lambda l: l.rlike(r"^#{1,6} ")),
    ).withColumn(
        "csv_delimiter",
        F.when(ext == ".csv", csv_delimiter_expr(first_line)).otherwise(
            F.lit(None).cast("string")
        ),
    )


def sql_parse_text_documents(path: str = "path", text: str = "text", table: str = "documents") -> str:
    ext = sql_file_ext(path)
    first_line = f"string_split({text}, chr(10))[1]"
    return f"""
SELECT *,
       {ext} AS file_type,
       len(string_split({text}, chr(10))) AS line_count,
       len(list_filter(string_split({text}, chr(10)), l -> regexp_matches(l, '^#{{1,6}} '))) > 0 AS has_markdown_headers,
       CASE WHEN {ext} = '.csv' THEN {sql_csv_delimiter(first_line)} ELSE NULL END AS csv_delimiter
FROM {table}
""".strip()


# ---------------------------------------------------------------------------
# P2/P3 — binary parsers: real stdlib decoders over Arrow-batched plumbing
# ---------------------------------------------------------------------------

PARSED_SCHEMA = (
    "path string, content string, n_pages int, metadata map<string,string>, "
    "warnings array<string>, parse_error string"
)


def parse_binary_documents(binary_df: DataFrame) -> DataFrame:
    """P2/P3 over a ``binaryFile``-shaped frame (path, content: binary):
    mapInPandas with Arrow batches — the production shape for CPU-bound
    per-document decoding (each task decodes its partition's files; no
    shuffle; scale = add executors).

    Decoders are real, stdlib-only (``sources/binary_decode.py``): docx/pptx
    via zip+XML (ECMA-376), PDF via object-scan + FlateDecode + Tj/TJ text
    operators. Output mirrors the reference parsers: ``--- Page N ---`` /
    ``--- Slide N ---`` markers, docx table rows joined ``" | "``, and the
    Title/Author/Subject/Creator/CreationDate metadata keys
    (PdfParser.cs:34-80, OfficeParser.cs:62-208)."""
    from connapse_spark.sources.binary_decode import decode_binary

    def _parse(batches):
        for pdf in batches:
            out = []
            for path, blob in zip(pdf["path"], pdf["content"]):
                content, n_pages, metadata, warnings, err = decode_binary(
                    path, bytes(blob or b"")
                )
                out.append((path, content, n_pages, metadata, warnings, err))
            yield pd.DataFrame(
                out,
                columns=[
                    "path", "content", "n_pages", "metadata", "warnings", "parse_error"
                ],
            )

    return binary_df.select("path", "content").mapInPandas(_parse, PARSED_SCHEMA)


# ---------------------------------------------------------------------------
# HTML parse path + unified router (engine extension past FileTypeValidator)
# ---------------------------------------------------------------------------


def parse_html_documents(binary_df: DataFrame, boilerplate: bool = True) -> DataFrame:
    """HTML files through the boilerplate-stripping extractor
    (operators/htmltext.py), emitting the same PARSED_SCHEMA as the
    binary parsers so downstream (chunk -> embed -> sink) is
    parser-agnostic: content = extracted text, metadata.Title from
    <title>, n_pages = 1. Decoding delegates to the WARC path's
    decode_text_payload so BOMs strip, an inline <meta charset>
    declaration is honored, and undecodable bytes degrade to latin-1 +
    warning (never a dropped row) — one charset policy for both the
    file-ingest and crawl-ingest HTML seams."""
    from connapse_spark.operators.htmltext import extract_html
    from connapse_spark.sources.warc import decode_text_payload

    def _parse(batches):
        for pdf in batches:
            out = []
            for path, blob in zip(pdf["path"], pdf["content"]):
                raw = bytes(blob or b"")
                warnings = []
                html, enc = decode_text_payload(raw, "text/html", with_encoding=True)
                if enc == "fallback:latin-1":
                    warnings.append("utf-8 decode failed; latin-1 fallback")
                title, text = extract_html(html)
                meta = {"Title": title} if title else {}
                out.append((path, text, 1, meta, warnings, None))
            yield pd.DataFrame(
                out,
                columns=[
                    "path", "content", "n_pages", "metadata", "warnings", "parse_error"
                ],
            )

    return binary_df.select("path", "content").mapInPandas(_parse, PARSED_SCHEMA)


def parse_documents_auto(binary_df: DataFrame) -> DataFrame:
    """P4 dispatch over a binaryFile-shaped frame, one output schema:
    route by extension to the text / binary / html parser family;
    unsupported extensions become error rows (the validator's reject,
    kept as data so a 100 TB ingest can count them instead of dying).

    Plan shape: three filtered branches of the SAME scan unioned back
    together — Spark pushes the isin() filters into each branch, no
    shuffle anywhere (union is shuffle-free), and each branch's
    mapInPandas only sees its own rows."""
    kind = parser_kind_expr(F.col("path"))
    tagged = binary_df.withColumn("_kind", kind)

    binary = parse_binary_documents(tagged.filter(F.col("_kind") == "binary"))
    html = parse_html_documents(tagged.filter(F.col("_kind") == "html"))
    # text family: utf-8 decode is column math; P1 metadata lives on the
    # text, content passes through unchanged
    text = tagged.filter(F.col("_kind") == "text").select(
        "path",
        F.col("content").cast("string").alias("content"),
        F.lit(1).alias("n_pages"),
        F.map_from_arrays(
            F.array().cast("array<string>"), F.array().cast("array<string>")
        ).alias("metadata"),
        F.array().cast("array<string>").alias("warnings"),
        F.lit(None).cast("string").alias("parse_error"),
    )
    rejected = tagged.filter(F.col("_kind").isNull()).select(
        "path",
        F.lit("").alias("content"),
        F.lit(0).alias("n_pages"),
        F.map_from_arrays(
            F.array().cast("array<string>"), F.array().cast("array<string>")
        ).alias("metadata"),
        F.array().cast("array<string>").alias("warnings"),
        F.lit("UnsupportedFormat").alias("parse_error"),
    )
    return text.unionByName(binary).unionByName(html).unionByName(rejected)
