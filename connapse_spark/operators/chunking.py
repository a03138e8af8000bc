"""Spark-side chunking operators.

Two tiers:
 1. Pandas-UDF chunkers wrapping the pure-Python cores in chunkers.py —
    token-aware semantics (C1-C7), parallel across documents, Arrow-batched.
 2. Column-expression chunkers (char-window fixed-size, token sentence-
    window) — fully Catalyst-planned AND DuckDB-oracle-checkable; these are
    the scale path when byte/char budgets suffice (e.g. pre-tokenization
    packing at 100 TB where a whole-stage-codegen'd substring beats any UDF).
"""

from __future__ import annotations


import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    MapType,
    StringType,
    StructField,
    StructType,
)
from pyspark.sql.window import Window

from connapse_spark.operators.chunkers import ChunkingSettings, chunk_document

CHUNK_STRUCT = StructType(
    [
        StructField("content", StringType()),
        StructField("chunk_index", IntegerType()),
        StructField("token_count", IntegerType()),
        StructField("start_offset", IntegerType()),
        StructField("end_offset", IntegerType()),
        StructField("metadata", MapType(StringType(), StringType())),
    ]
)


def chunk_udf(strategy: str = "Recursive", settings: ChunkingSettings | None = None):
    """Arrow-batched scalar pandas UDF: text → array<chunk struct>.
    The settings object is closure-captured (broadcast with the task)."""
    s = settings or ChunkingSettings()

    @F.pandas_udf(ArrayType(CHUNK_STRUCT))
    def _chunk(texts: pd.Series, exts: pd.Series) -> pd.Series:
        out = []
        for text, ext in zip(texts, exts):
            chunks = chunk_document(text or "", strategy, ext or "", s)
            out.append(
                [
                    (
                        c["content"],
                        c["chunk_index"],
                        c["token_count"],
                        c["start_offset"],
                        c["end_offset"],
                        c["metadata"],
                    )
                    for c in chunks
                ]
            )
        return pd.Series(out)

    return _chunk


def chunk_documents(
    docs: DataFrame,
    strategy: str = "Recursive",
    settings: ChunkingSettings | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    ext_col: str | None = None,
) -> DataFrame:
    """documents → chunks: one UDF call per Arrow batch, then posexplode.
    Output schema mirrors the reference chunks table (FIXTURES.md)."""
    ext = F.col(ext_col) if ext_col else F.lit("")
    udf = chunk_udf(strategy, settings)
    exploded = docs.select(
        F.col(id_col).alias("document_id"),
        F.explode(udf(F.col(text_col), ext)).alias("c"),
    )
    return exploded.select(
        F.concat(F.col("document_id").cast("string"), F.lit(":"), F.col("c.chunk_index")).alias(
            "chunk_id"
        ),
        "document_id",
        F.col("c.content").alias("content"),
        F.col("c.chunk_index").alias("chunk_index"),
        F.col("c.token_count").alias("token_count"),
        F.col("c.start_offset").alias("start_offset"),
        F.col("c.end_offset").alias("end_offset"),
        F.col("c.metadata").alias("metadata"),
    )


# ---------------------------------------------------------------------------
# Column-expression chunkers (oracle-checkable, zero Python)
# ---------------------------------------------------------------------------


def chunk_fixed_char(
    docs: DataFrame,
    size: int = 200,
    step: int = 160,
    id_col: str = "doc_id",
    text_col: str = "text",
    ordered: bool = True,
) -> DataFrame:
    """Char-window fixed-size chunker: windows of `size` chars advancing by
    `step` (overlap = size − step). n_chunks = 1 + floor((len−1)/step) for
    the windows whose start < len; trailing window may be short.
    Pure posexplode(sequence) + substring — whole-stage codegen end to end.
    ``ordered=False`` drops the output sort (required when the input is a
    streaming DataFrame — sorting is illegal on append-mode streams).
    """
    n = F.length(F.col(text_col))
    n_chunks = F.when(n <= 0, F.lit(0)).otherwise(
        F.floor((n - 1) / F.lit(step)).cast("int") + 1
    )
    out = docs.select(
        F.col(id_col).alias("document_id"),
        F.col(text_col),
        F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_index", "_i"),
    ).select(
        "document_id",
        "chunk_index",
        F.substring(F.col(text_col), F.col("chunk_index") * step + 1, size).alias("content"),
        (F.col("chunk_index") * step).alias("start_offset"),
        F.least(F.col("chunk_index") * F.lit(step) + size, F.length(text_col)).alias(
            "end_offset"
        ),
    )
    return out.orderBy("document_id", "chunk_index") if ordered else out


def sql_chunk_fixed_char(size: int = 200, step: int = 160) -> str:
    return f"""
SELECT document_id, chunk_index,
       substr(text, chunk_index * {step} + 1, {size}) AS content,
       chunk_index * {step} AS start_offset,
       least(chunk_index * {step} + {size}, length(text)) AS end_offset
FROM (
  SELECT doc_id AS document_id, text,
         unnest(range(0, CASE WHEN length(text) <= 0 THEN 0
                              ELSE CAST(floor((length(text) - 1) / {step}) AS INT) + 1 END)) AS chunk_index
  FROM documents
)
ORDER BY document_id, chunk_index
""".strip()


def markdown_sections(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """T4 MarkdownSectionWalker as a NATIVE DataFrame plan (the per-document
    Python walker is chunkers.walk_markdown_sections; this tier is the
    corpus-scale path — posexplode lines + window aggregates, no Python).

    Heading-stack semantics (MarkdownSectionWalker: pop on level ≤ current,
    breadcrumb 'A > B > C') via windows instead of a stack: a level-v
    heading is still on the stack at heading H iff the LATEST heading at or
    before H with level ≤ v has level exactly v (anything later with a
    smaller-or-equal level would have popped it). One conditional running
    max per level (≤ 6), over heading rows only.

    Output per section: document_id, section_index, header_path, depth,
    start, end (next heading start / text length), body_start (end of the
    heading line)."""
    n = F.length(F.col(text_col))
    lines = docs.select(
        F.col(id_col).alias("document_id"),
        n.alias("_n"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("line_idx", "line"),
    )
    wcum = (
        Window.partitionBy("document_id")
        .orderBy("line_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lines = lines.withColumn(
        "line_start",
        F.coalesce(F.sum(F.length("line") + F.lit(1)).over(wcum), F.lit(0)),
    )
    heads = lines.filter(F.col("line").rlike(r"^#{1,6}\s+")).select(
        "document_id",
        "_n",
        F.col("line_start").alias("start"),
        (F.col("line_start") + F.length("line")).alias("body_start"),
        F.length(F.regexp_extract("line", r"^(#{1,6})\s", 1)).alias("depth"),
        F.trim(F.regexp_extract("line", r"^#{1,6}\s+(.*)", 1)).alias("title"),
    )
    worder = Window.partitionBy("document_id").orderBy("start")
    wstack = worder.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    crumbs = []
    for v in range(1, 6):  # stack entries strictly above the current level
        last = F.max(
            F.when(
                F.col("depth") <= v, F.struct(F.col("start"), F.col("depth"), F.col("title"))
            )
        ).over(wstack)
        crumbs.append(
            F.when((F.lit(v) < F.col("depth")) & (last["depth"] == v), last["title"])
        )
    return (
        heads.select(
            "document_id",
            F.row_number().over(worder).alias("section_index"),
            F.concat_ws(" > ", *crumbs, F.col("title")).alias("header_path"),
            "depth",
            "start",
            F.coalesce(F.lead("start").over(worder), F.col("_n")).alias("end"),
            "body_start",
        )
        .orderBy("document_id", "section_index")
    )


def sql_markdown_sections(table: str = "documents", id_col: str = "doc_id", text_col: str = "text") -> str:
    crumb_cols = []
    for v in range(1, 6):
        last = (
            f"max(CASE WHEN depth <= {v} THEN "
            f"{{'start': start, 'depth': depth, 'title': title}} END) "
            f"OVER (PARTITION BY document_id ORDER BY start "
            f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        )
        crumb_cols.append(
            f"CASE WHEN {v} < depth AND ({last}).depth = {v} THEN ({last}).title END"
        )
    crumbs = ", ".join(crumb_cols)
    return f"""
WITH lines AS (
  SELECT {id_col} AS document_id, length({text_col}) AS _n,
         unnest(range(1, len(string_split({text_col}, chr(10))) + 1)) - 1 AS line_idx,
         unnest(string_split({text_col}, chr(10))) AS line
  FROM {table}
),
pos AS (
  SELECT *, CAST(coalesce(sum(length(line) + 1) OVER (
           PARTITION BY document_id ORDER BY line_idx
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS line_start
  FROM lines
),
heads AS (
  SELECT document_id, _n, line_start AS start,
         line_start + length(line) AS body_start,
         length(regexp_extract(line, '^(#{{1,6}})\\s', 1)) AS depth,
         trim(regexp_extract(line, '^#{{1,6}}\\s+(.*)', 1)) AS title
  FROM pos WHERE regexp_matches(line, '^#{{1,6}}\\s+')
)
SELECT document_id,
       row_number() OVER (PARTITION BY document_id ORDER BY start) AS section_index,
       concat_ws(' > ', {crumbs}, title) AS header_path,
       depth,
       start,
       coalesce(lead(start) OVER (PARTITION BY document_id ORDER BY start), _n) AS "end",
       body_start
FROM heads
ORDER BY document_id, section_index
""".strip()


def chunk_doc_aware(
    docs: DataFrame,
    size: int = 240,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """C4 DocumentAwareChunker, NATIVE tier: one chunk per markdown section
    with the HeaderPath breadcrumb prepended (the retrieval win,
    SettingsModels.cs:141-148); sections longer than ``size`` chars
    sub-split into char windows, each re-prefixed with the breadcrumb —
    the same shape as the UDF tier (chunkers.chunk_document_aware) with a
    char budget instead of a token budget, which keeps the whole plan in
    Catalyst (sections → sequence → substring, zero Python).

    Scale: markdown_sections is explode + windows per document; the
    sub-split adds a map-side explode. The section body is sliced by
    offsets from a second read of the text, joined back on document_id —
    co-partitioned with the section shuffle (and broadcast when the doc
    side is small under AQE). Reconstructing bodies from the exploded
    lines instead would save that read but re-derives newline edge cases
    the offset slice gets for free; the join side carries the same bytes
    either way."""
    secs = markdown_sections(docs, id_col=id_col, text_col=text_col)
    txt = docs.select(
        F.col(id_col).alias("document_id"), F.col(text_col).alias("_txt")
    )
    j = secs.join(txt, "document_id").withColumn(
        "body",
        F.expr("substring(_txt, CAST(body_start AS INT) + 1, CAST(`end` - body_start AS INT))"),
    )
    n_sub = F.greatest(
        F.lit(1), F.ceil(F.length("body") / F.lit(size)).cast("int")
    )
    out = j.select(
        "document_id",
        "section_index",
        "header_path",
        "body_start",
        "body",
        F.posexplode(F.sequence(F.lit(0), n_sub - 1)).alias("sub_index", "_i"),
    )
    return (
        out.select(
            "document_id",
            "section_index",
            "sub_index",
            F.concat(
                F.col("header_path"),
                F.lit("\n\n"),
                F.expr(f"substring(body, sub_index * {size} + 1, {size})"),
            ).alias("content"),
            (F.col("body_start") + F.col("sub_index") * F.lit(size)).alias("start_offset"),
        )
        .orderBy("document_id", "section_index", "sub_index")
    )


def sql_chunk_doc_aware(
    size: int = 240, table: str = "documents", id_col: str = "doc_id", text_col: str = "text"
) -> str:
    secs = sql_markdown_sections(table=table, id_col=id_col, text_col=text_col)
    # strip the trailing ORDER BY — this is a building block here
    secs = secs.rsplit("ORDER BY", 1)[0].rstrip()
    return f"""
SELECT document_id, section_index, sub_index,
       concat(header_path, chr(10), chr(10), substr(body, sub_index * {size} + 1, {size})) AS content,
       body_start + sub_index * {size} AS start_offset
FROM (
  SELECT s.*, unnest(range(0, greatest(1, CAST(ceil(length(body) / {size}.0) AS BIGINT)))) AS sub_index
  FROM (
    SELECT s.*, substr(t.{text_col}, CAST(body_start AS INT) + 1, CAST("end" - body_start AS INT)) AS body
    FROM ({secs}) s JOIN {table} t ON s.document_id = t.{id_col}
  ) s
)
ORDER BY document_id, section_index, sub_index
""".strip()


def chunk_recursive_native(
    docs: DataFrame,
    max_chars: int = 400,
    sep: str = "\n\n",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """C2 RecursiveChunker, NATIVE tier (char budget; the token-budget
    overlap/merge semantics live in the UDF tier, chunkers.chunk_recursive):
    split at the natural separator, GREEDY-PACK consecutive pieces up to
    ``max_chars`` (never splitting a piece that fits), and char-window
    sub-split any piece that alone exceeds the budget — the essence of
    LangChain-style recursive splitting as pure Catalyst ops.

    The greedy pack is the sequential part: it runs as ONE aggregate fold
    over the per-document piece array (either extend the last chunk or
    append a new one) — per-doc arrays are small, the fold is map-side,
    nothing shuffles. The DuckDB oracle reproduces the identical pack with
    a recursive CTE; both sides then sub-split oversize chunks with the
    same sequence + substring windows."""
    # materialize the raw split as a column FIRST — the re-attach lambda
    # then references a cheap column, not a re-evaluated split (lesson #1
    # in ARCHITECTURE.md: lambda-captured subexpressions re-run per element)
    base = docs.select(
        F.col(id_col).alias("document_id"), F.split(F.col(text_col), sep).alias("_ps")
    )
    # re-attach the separator to every piece but the last (chunks then tile
    # the document exactly); drop empties (trailing separator)
    pieces = F.filter(
        F.transform(
            F.col("_ps"),
            lambda p, i: F.when(
                i < F.size(F.col("_ps")) - 1, F.concat(p, F.lit(sep))
            ).otherwise(p),
        ),
        lambda p: p != "",
    )
    packed = F.aggregate(
        pieces,
        F.array().cast("array<string>"),
        lambda acc, p: F.when(
            (F.size(acc) == 0)
            | (F.length(F.element_at(acc, -1)) + F.length(p) > max_chars),
            F.concat(acc, F.array(p)),
        ).otherwise(
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(F.element_at(acc, -1), p)),
            )
        ),
    )
    ch = base.select(
        "document_id",
        F.posexplode(packed).alias("pack_index", "chunk"),
    )
    n_sub = F.greatest(
        F.lit(1), F.ceil(F.length("chunk") / F.lit(max_chars)).cast("int")
    )
    out = ch.select(
        "document_id",
        "pack_index",
        "chunk",
        F.posexplode(F.sequence(F.lit(0), n_sub - 1)).alias("sub_index", "_i"),
    )
    return (
        out.select(
            "document_id",
            "pack_index",
            "sub_index",
            F.expr(f"substring(chunk, sub_index * {max_chars} + 1, {max_chars})").alias(
                "content"
            ),
        )
        .orderBy("document_id", "pack_index", "sub_index")
    )


def sql_chunk_recursive_native(
    max_chars: int = 400,
    sep: str = "\n\n",
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    sql_sep = "chr(10) || chr(10)" if sep == "\n\n" else f"'{sep}'"
    return f"""
WITH RECURSIVE pieces AS (
  SELECT document_id, i - 1 AS piece_idx, n,
         CASE WHEN i < n THEN p || {sql_sep} ELSE p END AS piece
  FROM (
    SELECT {id_col} AS document_id,
           unnest(range(1, len(ps) + 1)) AS i, len(ps) AS n,
           unnest(ps) AS p
    FROM (SELECT {id_col}, string_split({text_col}, {sql_sep}) AS ps FROM {table})
  )
  WHERE CASE WHEN i < n THEN p || {sql_sep} ELSE p END != ''
),
-- greedy pack as recursion over piece index: state = (chunks so far)
pack AS (
  SELECT document_id, piece_idx, [piece] AS chunks
  FROM pieces WHERE piece_idx = 0
  UNION ALL
  SELECT p.document_id, p.piece_idx,
         CASE WHEN length(k.chunks[-1]) + length(p.piece) > {max_chars}
              THEN list_append(k.chunks, p.piece)
              ELSE list_append(k.chunks[1:-2], k.chunks[-1] || p.piece) END
  FROM pack k JOIN pieces p
    ON p.document_id = k.document_id AND p.piece_idx = k.piece_idx + 1
),
final AS (
  SELECT document_id, chunks FROM (
    SELECT document_id, chunks,
           row_number() OVER (PARTITION BY document_id ORDER BY piece_idx DESC) AS rn
    FROM pack
  ) WHERE rn = 1
),
packed AS (
  SELECT document_id, unnest(range(1, len(chunks) + 1)) - 1 AS pack_index,
         unnest(chunks) AS chunk
  FROM final
)
SELECT document_id, pack_index, sub_index,
       substr(chunk, sub_index * {max_chars} + 1, {max_chars}) AS content
FROM (
  SELECT document_id, pack_index, chunk,
         unnest(range(0, greatest(1, CAST(ceil(length(chunk) / {max_chars}.0) AS BIGINT)))) AS sub_index
  FROM packed
)
ORDER BY document_id, pack_index, sub_index
""".strip()


def chunk_sentence_aware_native(
    docs: DataFrame,
    max_chars: int = 400,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """C6 SentenceAwareFixedSize, NATIVE tier (char budget; token-budget
    tier is chunkers.chunk_sentence_aware): regex sentence split, then
    greedy-pack WHOLE sentences up to ``max_chars`` joined with ' ' — a
    sentence is never split; a single over-budget sentence stands alone
    (same invariant the UDF tier's tests assert). One aggregate fold per
    document over the sentence array; map-side, no shuffle before the
    final order."""
    from connapse_spark.operators.semantic_chunking import sentences_expr

    base = docs.select(
        F.col(id_col).alias("document_id"),
        sentences_expr(F.col(text_col)).alias("_sents"),
    )
    packed = F.aggregate(
        F.col("_sents"),
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) == 0)
            | (F.length(F.element_at(acc, -1)) + 1 + F.length(s) > max_chars),
            F.concat(acc, F.array(s)),
        ).otherwise(
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(F.element_at(acc, -1), F.lit(" "), s)),
            )
        ),
    )
    return (
        base.select(
            "document_id", F.posexplode(packed).alias("chunk_index", "content")
        )
        .withColumn("n_chars", F.length("content"))
        .orderBy("document_id", "chunk_index")
    )


def sql_chunk_sentence_aware_native(
    max_chars: int = 400, table: str = "documents", id_col: str = "doc_id", text_col: str = "text"
) -> str:
    from connapse_spark.operators.semantic_chunking import sql_sentences

    return f"""
WITH RECURSIVE sents AS (
  SELECT document_id, i - 1 AS sent_idx, s
  FROM (
    SELECT {id_col} AS document_id,
           unnest(range(1, len(sn) + 1)) AS i, unnest(sn) AS s
    FROM (SELECT {id_col}, {sql_sentences(text_col)} AS sn FROM {table})
  )
),
pack AS (
  SELECT document_id, sent_idx, [s] AS chunks
  FROM sents WHERE sent_idx = 0
  UNION ALL
  SELECT n.document_id, n.sent_idx,
         CASE WHEN length(k.chunks[-1]) + 1 + length(n.s) > {max_chars}
              THEN list_append(k.chunks, n.s)
              ELSE list_append(k.chunks[1:-2], k.chunks[-1] || ' ' || n.s) END
  FROM pack k JOIN sents n
    ON n.document_id = k.document_id AND n.sent_idx = k.sent_idx + 1
),
final AS (
  SELECT document_id, chunks FROM (
    SELECT document_id, chunks,
           row_number() OVER (PARTITION BY document_id ORDER BY sent_idx DESC) AS rn
    FROM pack
  ) WHERE rn = 1
)
SELECT document_id, chunk_index, content, length(content) AS n_chars
FROM (
  SELECT document_id,
         unnest(range(1, len(chunks) + 1)) - 1 AS chunk_index,
         unnest(chunks) AS content
  FROM final
)
ORDER BY document_id, chunk_index
""".strip()


def chunk_token_window(
    docs: DataFrame,
    window: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """C5 SentenceWindow semantics on the token stream (the synthetic corpus
    has no sentence punctuation): each token is a 'sentence'; the window
    column joins the ±window neighbors — literally
    ``Window.partitionBy(doc).orderBy(idx).rowsBetween(-w, +w)``
    (SentenceWindowChunker.cs:15-101 mapping in SURVEY §2.4)."""
    from connapse_spark.functions.text import tokens_exact_expr

    toks = docs.select(
        F.col(id_col).alias("document_id"),
        F.posexplode(tokens_exact_expr(F.col(text_col))).alias("chunk_index", "content"),
    )
    w = (
        Window.partitionBy("document_id")
        .orderBy("chunk_index")
        .rowsBetween(-window, window)
    )
    return toks.select(
        "document_id",
        "chunk_index",
        "content",
        F.concat_ws(" ", F.collect_list("content").over(w)).alias("window"),
    ).orderBy("document_id", "chunk_index")


def sql_chunk_token_window(window: int = 3) -> str:
    from connapse_spark.functions.text import sql_tokens_exact

    return f"""
SELECT document_id, chunk_index, content,
       string_agg(content, ' ') OVER (
         PARTITION BY document_id ORDER BY chunk_index
         ROWS BETWEEN {window} PRECEDING AND {window} FOLLOWING) AS window
FROM (
  SELECT document_id,
         unnest(range(1, len(toks) + 1)) - 1 AS chunk_index,
         unnest(toks) AS content
  FROM (SELECT doc_id AS document_id, {sql_tokens_exact('text')} AS toks FROM documents)
)
ORDER BY document_id, chunk_index
""".strip()
