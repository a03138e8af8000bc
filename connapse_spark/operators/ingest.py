"""The end-to-end ingestion pipeline (SURVEY.md §3.3): documents → parse →
chunk → embed (with content-addressed cache skip) → chunks + chunk_vectors.

Reference flow (IngestionPipeline.IngestAsync, IngestionPipeline.cs:96-414):
sha256 → parse (P4) → chunk (C1-C7) → embedding cache lookup (E2) → embed
misses (E1) → staged batch sink (S7), with generation staleness guards (M5).

Batch re-expression: ONE job over all pending documents —
 1. ``chunk_documents`` (pandas-UDF strategy + posexplode) → chunks
 2. anti-join against existing vectors on (content_hash, model_id) → only
    new content is embedded (E2's classic Spark incremental pattern)
 3. embed via the pluggable embedder column fn (JVM hash-embedder default;
    Arrow-batched pandas UDF for real providers)
 4. union cache hits (carried vectors) + fresh embeds → chunk_vectors
Last-writer-wins (M5) is a ``row_number`` over (doc, chunk_index) by
generation — no interactive locking; the batch is the transaction.

Scale: steps 1-3 are map-side only (zero shuffle before the sink); the
cache anti-join shuffles on content_hash — exactly the key it is stored
sorted/partitioned by, so it co-locates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from connapse_spark.functions.embed import DEFAULT_DIMS, embed_expr
from connapse_spark.operators.chunkers import ChunkingSettings
from connapse_spark.operators.chunking import chunk_documents


def ingest(
    docs: DataFrame,
    existing_vectors: DataFrame | None = None,
    strategy: str = "Recursive",
    settings: ChunkingSettings | None = None,
    model_id: str = "hash-64",
    dims: int = DEFAULT_DIMS,
    id_col: str = "doc_id",
    text_col: str = "text",
    ext_col: str | None = None,
    embedder: Column | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Run the full pipeline. Returns (chunks, chunk_vectors).

    chunks:        (chunk_id, document_id, content, chunk_index, token_count,
                    start_offset, end_offset, metadata, content_hash)
    chunk_vectors: (chunk_id, document_id, content_hash, model_id,
                    dimensions, embedding, from_cache)
    """
    chunks = chunk_documents(
        docs, strategy=strategy, settings=settings, id_col=id_col,
        text_col=text_col, ext_col=ext_col,
    ).withColumn("content_hash", F.sha2(F.col("content"), 256))

    emb = embedder if embedder is not None else embed_expr(F.col("content"), dims)

    if existing_vectors is not None:
        cache = existing_vectors.filter(
            (F.col("model_id") == model_id) & (F.col("dimensions") == dims)
        ).select("content_hash", F.col("embedding").alias("_cached"))
        # one vector per hash (content-addressed): hashes are unique keys in
        # the vectors table by construction; dropDuplicates guards anyway
        cache = cache.dropDuplicates(["content_hash"])
        joined = chunks.join(F.broadcast(cache), "content_hash", "left")
        vectors = joined.select(
            "chunk_id",
            "document_id",
            "content_hash",
            F.lit(model_id).alias("model_id"),
            F.lit(dims).alias("dimensions"),
            F.coalesce(F.col("_cached"), emb).alias("embedding"),
            F.col("_cached").isNotNull().alias("from_cache"),
        )
    else:
        vectors = chunks.select(
            "chunk_id",
            "document_id",
            "content_hash",
            F.lit(model_id).alias("model_id"),
            F.lit(dims).alias("dimensions"),
            emb.alias("embedding"),
            F.lit(False).alias("from_cache"),
        )
    return chunks, vectors


def ingest_stats(chunks: DataFrame, vectors: DataFrame) -> DataFrame:
    """Per-document ingestion summary (the batch 'job status' row):
    chunk_count, token_sum, cache hit ratio — what the reference writes back
    onto documents (chunk_count, status Ready; IngestionPipeline.cs:357-363)."""
    # vectors' plan contains chunks' plan as a subtree (built from it in
    # ingest()); without a barrier the pandas-UDF chunker runs once per
    # aggregation branch. Persist substitutes the cached relation into both.
    chunks = chunks.persist()
    c = chunks.groupBy("document_id").agg(
        F.count(F.lit(1)).alias("chunk_count"),
        F.sum("token_count").alias("token_sum"),
    )
    v = vectors.groupBy("document_id").agg(
        F.sum(F.col("from_cache").cast("long")).alias("cached_vectors"),
        F.count(F.lit(1)).alias("total_vectors"),
    )
    return (
        c.join(v, "document_id")
        .withColumn("status", F.lit("Ready"))
        .orderBy("document_id")
    )


def ingest_serving(
    docs: DataFrame,
    base_dir: str | None = None,
    existing_vectors: DataFrame | None = None,
    strategy: str = "Recursive",
    settings: ChunkingSettings | None = None,
    model_id: str = "hash-64",
    dims: int = DEFAULT_DIMS,
    id_col: str = "doc_id",
    text_col: str = "text",
    ext_col: str | None = None,
    embedder: Column | None = None,
    nprobe: int = 4,
) -> dict:
    """The COMPLETE write path: one :func:`ingest` run feeding EVERY
    serving structure the query side reads — the batch re-expression of
    what the reference gets implicitly from Postgres (the GIN index and
    the ivfflat partial index are maintained by the same INSERT that
    lands the chunk rows; IngestionPipeline.cs:96-414 +
    KnowledgeDbContext.cs:232-245 + VectorColumnManager.cs:14-194).

    Returns a dict: ``chunks``, ``vectors``, ``keyword_index`` (the
    KeywordIndex bundle ``hybrid_search(keyword_index=…)`` serves from),
    ``tf_postings`` (the (tf_exact, tf_stemmed) pair the batched tiers
    serve from), and ``vector_index`` (the IVF bundle for
    ``hybrid_search(vector_index=…)``).

    ``chunks`` AND ``vectors`` are persisted here so the pandas-UDF
    chunker and the embedder each execute ONCE and feed all structures
    (same barrier rationale as ingest_stats — the KMeans fit alone makes
    several passes over the vectors); the caller unpersists both via
    ``result["chunks"].unpersist()`` / ``result["vectors"].unpersist()``
    when the serving structures are materialized or committed. The IVF
    build is always the MLlib fit: chunk_ids are strings ("doc:idx"),
    which the seeded builder's numeric list_id-from-seed-id trick cannot
    represent.

    With ``base_dir`` the table structures also COMMIT through the
    snapshot layer as atomically-visible versions — ``chunks/``,
    ``chunk_vectors/``, ``tf_postings/`` (kind-partitioned, the layout
    the streaming maintenance job keeps fresh) — and the IVF bundle
    lands at ``ivf_index/`` via :func:`plans.ivf.write_vector_index`
    ((model_id, list_id)-partitioned so probes prune partitions): the
    deployed layout a reader opens with ``snapshots.read_snapshot`` /
    ``ivf.load_vector_index``."""
    from connapse_spark.operators import keyword_index as ki
    from connapse_spark.plans import ivf as _ivf

    chunks, vectors = ingest(
        docs,
        existing_vectors=existing_vectors,
        strategy=strategy,
        settings=settings,
        model_id=model_id,
        dims=dims,
        id_col=id_col,
        text_col=text_col,
        ext_col=ext_col,
        embedder=embedder,
    )
    chunks = chunks.persist()
    vectors = vectors.persist()
    n_chunks = chunks.count()  # materialize the barrier; sizes the lists policy

    tokens = ki.build_token_table(chunks, id_col="chunk_id", text_col="content")
    kidx = ki.KeywordIndex(
        tokens=tokens,
        postings_exact=ki.build_postings(tokens, "tokens_exact"),
        postings_stemmed=ki.build_postings(tokens, "tokens_stemmed"),
    )
    tfe = ki.build_tf_postings(tokens, "tokens_exact")
    tfs = ki.build_tf_postings(tokens, "tokens_stemmed")
    vidx = _ivf.build_vector_index(
        vectors,
        n_lists=_ivf.ivf_n_lists(n_chunks),
        nprobe=nprobe,
        id_col="chunk_id",
        vec_col="embedding",
        n_rows=n_chunks,
    )
    if base_dir is not None:
        import os

        from connapse_spark.sources import snapshots

        snapshots.commit_snapshot(chunks, os.path.join(base_dir, "chunks"))
        snapshots.commit_snapshot(vectors, os.path.join(base_dir, "chunk_vectors"))
        tf_all = tfe.withColumn("kind", F.lit("exact")).unionByName(
            tfs.withColumn("kind", F.lit("stemmed"))
        ).select("kind", "term", "id", "tf")
        snapshots.commit_snapshot(
            tf_all, os.path.join(base_dir, "tf_postings"), partition_by=["kind"]
        )
        _ivf.write_vector_index(
            vidx, os.path.join(base_dir, "ivf_index"), model_id=model_id
        )
    return {
        "chunks": chunks,
        "vectors": vectors,
        "keyword_index": kidx,
        "tf_postings": (tfe, tfs),
        "vector_index": vidx,
    }
