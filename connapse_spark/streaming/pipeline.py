"""Structured Streaming surfaces.

The reference has NO true streaming engine — its change capture is
FileSystemWatcher debounce + 5-minute polls + delta joins (M2/M3,
ConnectorWatcherService.cs:42-44,128-259). The honest Spark mapping is a
file-source stream with ``Trigger.AvailableNow`` (each activation = one
poll cycle, exactly-once bookkeeping in the checkpoint — strictly stronger
than the reference's debounce), with deletes handled by the batch sync
delta (operators.maintenance.sync_delta), since file streams only observe
additions.

The events stream is the scale-path generalization the north star asks for:
watermarked tumbling windows and native ``session_window`` sessionization —
the streaming twins of operators.events.tumbling_agg / sessionize (same
aggregates, late data bounded by the watermark).

All transforms take/return DataFrames so the SAME logic binds to
``spark.read`` in tests and ``spark.readStream`` in deployment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_WATERMARK = "30 minutes"


def stream_text_files(spark: SparkSession, path: str, glob: str = "*.txt") -> DataFrame:
    """M3 as a stream: new files under ``path`` become (path, content) rows.
    ``maxFilesPerTrigger`` bounds a micro-batch; the checkpoint makes each
    file exactly-once — the reference needs a debounce + dedup map for this
    (ConnectorWatcherService.cs:128-259)."""
    return (
        spark.readStream.format("binaryFile")
        # streaming sources require an explicit schema; binaryFile's is fixed
        .schema("path string, modificationTime timestamp, length long, content binary")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(path)
        .select(
            F.col("path"),
            F.col("length").alias("size_bytes"),
            F.col("modificationTime").alias("last_modified"),
            F.decode(F.col("content"), "UTF-8").alias("text"),
        )
    )


def stream_warc_files(
    spark: SparkSession,
    path: str,
    glob: str = "*.warc.gz",
    boilerplate: bool = True,
) -> DataFrame:
    """M3 for the web-ingest front (sources/warc.py): new WARC archives
    under ``path`` → clean html-200 records → boilerplate-stripped
    (url, title, text) rows. Each archive is parsed exactly once per the
    file-source checkpoint — the crawl-drop directory pattern (a fetcher
    lands ``.warc.gz`` shards; every activation drains only the new
    ones). mapInPandas binds to streaming frames unchanged, so this is
    the same code path the batch round-trip oracle verifies."""
    from connapse_spark.operators.htmltext import extract_html_text
    from connapse_spark.sources import warc as _warc

    blobs = (
        spark.readStream.format("binaryFile")
        .schema("path string, modificationTime timestamp, length long, content binary")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(path)
    )
    docs = _warc.web_documents(_warc.warc_records(blobs))
    return extract_html_text(docs, "text", boilerplate=boilerplate)


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = DEFAULT_WATERMARK,
    slide: str | None = None,
) -> DataFrame:
    """Watermarked tumbling (or, with ``slide``, sliding) aggregate —
    streaming twin of operators.events.tumbling_agg / sliding_agg. Late
    events beyond the watermark are dropped deterministically instead of
    reopening windows."""
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(w.alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "value_cents",
        )
    )


def sessionized_event_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Native session windows (gap-based) — streaming twin of
    operators.events.sessionize. State is bounded by the watermark; per-user
    skew is bounded because a session closes at gap timeout."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window(F.col("ts"), gap).alias("sw"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("user_id"),
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


def streaming_dedup_first_seen(
    stream: DataFrame, id_col: str = "path", text_col: str = "text"
) -> DataFrame:
    """Streaming exact dedup — the T3 content hash as a CUSTOM STATEFUL
    operator (``applyInPandasWithState``): group the stream by sha256 of the
    content; per-hash state remembers how many occurrences have ever been
    seen; only the FIRST arrival (smallest id within its micro-batch) is
    emitted. The state store lives in the checkpoint, so dedup is
    exactly-once ACROSS activations: re-ingesting a file that already
    flowed through any earlier poll cycle emits nothing.

    This is the streaming twin of operators.dedup.exact_dedup for the
    ingest path: an arriving-documents stream is deduplicated before
    chunk/embed spend, with state partitioned by hash (scales horizontally;
    per-key state is one long).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    hashed = stream.select(
        F.col(id_col).cast("string").alias("id"),
        F.sha2(F.col(text_col), 256).alias("content_hash"),
    )

    def first_seen(key, pdfs, state):
        seen = state.get[0] if state.exists else 0
        n, first = 0, None
        for pdf in pdfs:
            if len(pdf):
                n += len(pdf)
                m = pdf["id"].min()
                first = m if first is None or m < first else first
        if seen == 0 and n > 0:
            yield pd.DataFrame({"content_hash": [key[0]], "id": [first]})
        state.update((seen + n,))

    return hashed.groupBy("content_hash").applyInPandasWithState(
        first_seen,
        outputStructType="content_hash string, id string",
        stateStructType="seen long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_available_now(
    stream_df: DataFrame,
    checkpoint_dir: str,
    out_dir: str,
) -> None:
    """One poll cycle: drain everything currently available into a parquet
    sink and stop — the Trigger.AvailableNow pattern that replaces the
    reference's 5-minute rescan loop. Re-running with the same checkpoint
    processes ONLY files that appeared since the last activation
    (exactly-once; the memory sink can't recover a checkpoint, so the
    durable sink is the contract here exactly as in production)."""
    q = (
        stream_df.writeStream.format("parquet")
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .option("path", out_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_complete_to_memory(
    stream_df: DataFrame,
    checkpoint_dir: str,
    query_name: str = "connapse_agg_stream",
) -> None:
    """AvailableNow drain for aggregated streams (complete output mode)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_ingest_pipeline(
    stream: DataFrame,
    chunk_size: int = 200,
    chunk_step: int = 160,
    dims: int = 64,
    provider=None,
    model_id: str = "hash-64",
) -> DataFrame:
    """The reference's ENTIRE ingestion loop as one checkpointed stream:
    watch → content-hash dedup → chunk → embed → (chunk, vector) rows —
    the streaming composition of M3 (stream_text_files), T3
    (streaming_dedup_first_seen's stateful exactly-once hash), C1
    (chunk_fixed_char) and E1 (embedding_provider_udf). The reference runs
    this as queue + workers + DB transactions (IngestionPipeline.cs);
    here each micro-batch flows through the same DataFrame transforms the
    batch pipeline uses, and the checkpoint carries both the file-source
    bookkeeping and the dedup state, so a re-ingested file costs nothing
    twice — not the listing, not the chunking, not the embed spend.

    Input: a (path, text) stream (e.g. stream_text_files). Output stream:
    (doc_id, chunk_index, content, content_hash, embedding, model_id) —
    the chunk+vector co-located layout the single-scan hybrid consumes.

    Scale: every stage is stateless except the hash-keyed dedup state (one
    long per distinct document ever seen, partitioned by hash); chunking
    is codegen'd posexplode, embedding is one Arrow-batched provider call
    per micro-batch partition.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from connapse_spark.operators.chunking import chunk_fixed_char
    from connapse_spark.operators.embedding import embedding_provider_udf

    hashed = stream.select(
        F.col("path").cast("string").alias("id"),
        F.col("text"),
        F.sha2(F.col("text"), 256).alias("content_hash"),
    )

    # first_seen with the payload carried through the stateful operator: a
    # stream-stream re-join of the dedup verdict onto the text would need
    # its own watermark state; emitting (id, text) directly from the
    # first-seen group costs nothing extra (state stays one long per hash).
    def first_seen_with_text(key, pdfs, state):
        seen = state.get[0] if state.exists else 0
        n, first_id, first_text = 0, None, None
        for pdf in pdfs:
            if len(pdf):
                n += len(pdf)
                row = pdf.loc[pdf["id"].idxmin()]
                if first_id is None or row["id"] < first_id:
                    first_id, first_text = row["id"], row["text"]
        if seen == 0 and n > 0:
            yield pd.DataFrame(
                {"doc_id": [first_id], "text": [first_text], "content_hash": [key[0]]}
            )
        state.update((seen + n,))

    docs = hashed.groupBy("content_hash").applyInPandasWithState(
        first_seen_with_text,
        outputStructType="doc_id string, text string, content_hash string",
        stateStructType="seen long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    chunks = chunk_fixed_char(
        docs, size=chunk_size, step=chunk_step, id_col="doc_id", text_col="text",
        ordered=False,
    )
    embed = embedding_provider_udf(provider, dims)
    return chunks.select(
        F.col("document_id").alias("doc_id"),
        "chunk_index",
        "content",
        F.sha2(F.col("content"), 256).alias("content_hash"),
        embed(F.col("content")).alias("embedding"),
        F.lit(model_id).alias("model_id"),
    )


def streaming_quality_gate(
    docs: DataFrame,
    blocklist: DataFrame,
    contam_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Streaming curation gate: per-micro-batch quality scoring plus a
    STREAM-STATIC decontamination semi-join — the continuous twin of the
    batch curate pipeline's quality/contamination stages (the dedup stages
    live in streaming_dedup_first_seen; exact-dup state does not belong in
    a stateless gate).

    The blocklist side is a STATIC frame: stream-static joins need no
    watermark and no join state — each micro-batch probes the (broadcast)
    static side, which is exactly how a benchmark blocklist behaves in a
    live ingest (it changes by deployment, not by event). Output keeps
    EVERY document with (quality_logit, gate_keep, contaminated, admit) so
    the sink can route accept/reject streams from one pass.

    Works identically under ``spark.read`` (tests) and ``spark.readStream``
    (deployment). The whole gate is ONE projection lineage of the stream:
    deriving a hits frame and joining it back would be a stream-STREAM
    self-join (illegal without watermarks, and pure overhead in batch), so
    the blocklist collapses to a one-row collect_set that the stream
    cross-joins broadcast-style — stream-static, stateless, append-safe —
    and membership is an ``arrays_overlap`` against it. At blocklist sizes
    past broadcast comfort, swap the set row for the CONSTANT-size Bloom
    bitmap (dedup.bloom_build) — same one-row stream-static shape."""
    from connapse_spark.operators.dedup import shingles_expr
    from connapse_spark.operators.textstats import quality_score_linear

    bl_row = blocklist.select(F.col("s")).agg(F.collect_set("s").alias("_bl"))
    flagged = (
        docs.crossJoin(F.broadcast(bl_row))
        .withColumn(
            "contaminated",
            F.arrays_overlap(shingles_expr(F.col(text_col), contam_n), F.col("_bl")),
        )
        .drop("_bl")
    )
    scored = quality_score_linear(
        flagged, id_col=id_col, text_col=text_col, passthrough=("contaminated",)
    )
    return scored.select(
        F.col(id_col),
        F.col("quality_logit"),
        F.col("gate_keep"),
        F.col("contaminated"),
        (F.col("gate_keep") & ~F.col("contaminated")).alias("admit"),
    )


def streaming_view_purchase_attribution(
    views: DataFrame,
    purchases: DataFrame,
    max_gap: str = "1 hour",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Stream-STREAM interval join: each purchase joined to the same
    user's view events within the preceding ``max_gap`` — the streaming
    twin of the batch as-of attribution (operators/temporal.py:90). The
    batch kernel keeps exactly the LATEST prior view; unbounded "latest"
    needs the whole history, so the streaming contract is the standard
    bounded-interval one (every view within max_gap), with watermarks on
    BOTH sides so the engine can expire join state — the range condition
    plus watermarks is precisely what Structured Streaming requires to
    bound a stream-stream join (state size ∝ watermark × rate, not
    history).

    Output (append-safe): user_id, purchase_id, purchase_ts, view_id,
    gap_sec ≥ 0. Unmatched purchases are dropped (inner join) — an outer
    variant only emits after the watermark closes, deployment's call.

    Works identically bound to batch frames (the interval join degrades to
    a plain range join — the tests pin batch↔stream parity)."""
    v = views.select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
    ).withWatermark("v_ts", watermark)
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    ).withWatermark("p_ts", watermark)
    joined = p.join(
        v,
        F.expr(
            f"p_user = v_user AND v_ts <= p_ts AND v_ts >= p_ts - INTERVAL {max_gap}"
        ),
    )
    return joined.select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        F.col("p_ts").alias("purchase_ts"),
        "view_id",
        (F.unix_micros(F.col("p_ts")) - F.unix_micros(F.col("v_ts")))
        .alias("gap_us"),
    )


def streaming_index_maintenance(
    spark: SparkSession,
    watch_dir: str,
    table_dir: str,
    centroids: DataFrame,
    checkpoint_dir: str,
    retain_last: int | None = None,
    vacuum_every: int = 8,
    vacuum_min_age_seconds: float = 0.0,
) -> None:
    """M6 as a STREAMING job — the production shape of continuous vector
    index maintenance: new embedding batches landing under ``watch_dir``
    (parquet: vec_id, embedding) are assigned to the EXISTING centroids
    (plans/ivf.ivf_index_upsert — no refit, pgvector INSERT routing) and
    the merged index is COMMITTED through the snapshot layer, partitioned
    by list_id. Every micro-batch publishes a new atomically-visible
    version; readers on a pinned version keep a consistent index while
    maintenance runs, and a crashed batch leaves the previous version
    intact (the foreachBatch + transactional-sink pattern the Structured
    Streaming guide prescribes — the snapshot manifest IS the
    transaction). The rebuild-on-drift decision stays with ivf_drift
    over the committed snapshot. ``retain_last``/``vacuum_every``/
    ``vacuum_min_age_seconds`` bound version growth exactly as in
    :func:`streaming_keyword_maintenance` (this job is the table's only
    writer, so the 0-second in-flight guard default is safe)."""
    from connapse_spark.plans.ivf import ivf_index_upsert
    from connapse_spark.sources import snapshots

    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .parquet(watch_dir)
    )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        # one surviving row per vec_id within the batch — without the cut,
        # duplicate ids would BOTH insert (ivf_index_upsert anti-joins the
        # current index by id, not the batch against itself); array<double>
        # is orderable, so desc(embedding) is a deterministic tie-break
        from pyspark.sql.window import Window

        wv = Window.partitionBy("vec_id").orderBy(F.desc("embedding"))
        batch_df = (
            batch_df.withColumn("_rn", F.row_number().over(wv))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        if snapshots.latest_version(table_dir) is None:
            cur = batch_df.sparkSession.createDataFrame(
                [],
                "id long, list_id bigint, vec array<double>, norm double",
            )
        else:
            cur = snapshots.read_snapshot(batch_df.sparkSession, table_dir).select(
                "id", F.col("list_id").cast("bigint").alias("list_id"), "vec", "norm"
            )
        merged = ivf_index_upsert(cur, centroids, batch_df).select(
            "id", F.col("list_id").cast("bigint").alias("list_id"), "vec", "norm"
        )
        snapshots.commit_snapshot(merged, table_dir, partition_by=["list_id"])
        if retain_last is not None and (batch_id + 1) % max(vacuum_every, 1) == 0:
            snapshots.vacuum_snapshot(
                table_dir,
                keep_last=retain_last,
                min_age_seconds=vacuum_min_age_seconds,
            )

    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _lww_latest_doc_event(batch_df: DataFrame) -> DataFrame:
    """Reduce a micro-batch to ONE surviving event per doc_id before it
    touches the index — the same Debezium-shaped cut
    :func:`streaming_table_upsert` applies. Without it, two updates for
    one doc in a batch would SUM their tf counts (equal to neither
    version), and an update+delete pair would resurrect the doc. Order:
    ``seq`` desc when the feed carries one (nulls last), then op desc
    ('U' beats 'D' on true ties) and text desc — arbitrary but
    deterministic, so replays converge; feeds that care about intra-batch
    order must supply ``seq``."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.desc_nulls_last("seq"), F.desc("op"), F.desc("text")
    )
    return (
        batch_df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def streaming_keyword_maintenance(
    spark: SparkSession,
    watch_dir: str,
    table_dir: str,
    checkpoint_dir: str,
    retain_last: int | None = None,
    vacuum_every: int = 8,
    vacuum_min_age_seconds: float = 0.0,
    positions_dir: str | None = None,
    stemmer: str = "suffix",
) -> None:
    """Q3/T3 as a STREAMING job — continuous keyword-index maintenance,
    the tf-postings twin of :func:`streaming_index_maintenance`: document
    batches landing under ``watch_dir`` (parquet: doc_id, text, op — op
    'D' deletes, anything else upserts; optional seq long orders events
    within a batch, and the batch is first cut to one surviving event per
    doc via :func:`_lww_latest_doc_event`) are tokenized BATCH-ONLY and
    folded into the committed (kind, term, id, tf) snapshot via
    ``keyword_index.upsert_tf_postings``, one atomically-visible version
    per micro-batch, partitioned by kind (exact/stemmed — the two tables
    ``keyword_search_many_indexed`` and the fast hybrid tier serve from,
    recovered with a kind filter that prunes at the partition level).
    A crashed batch leaves the prior version intact; pinned readers keep
    a consistent index while maintenance runs. The corpus is never
    re-tokenized — per-batch cost is the batch's own (term, id)
    aggregation plus one anti-join against the postings table.

    The snapshot also carries the doclen partition (kind='doclen',
    term='', tf=dl — ``keyword_index.read_doclen``), maintained by the
    same anti-join twin in the same atomic commit, so
    ``keyword_search_bm25_indexed`` always serves tf rows and lengths
    from one corpus version. Doclen accumulates from batch 0; pointing
    this stream at a PRE-doclen legacy table leaves that partition
    covering only post-migration docs — re-bootstrap via
    ``ingest_serving`` (or replay the corpus) to backfill.

    ``retain_last`` bounds version growth: every ``vacuum_every``-th batch
    runs ``snapshots.vacuum_snapshot(keep_last=retain_last)`` — without
    it a long-running stream accretes one manifest + full table copy per
    micro-batch forever. ``vacuum_min_age_seconds`` defaults to 0 because
    THIS job is by design the table's only writer (the in-flight-commit
    guard protects concurrent writers, which the maintenance stream
    doesn't have); raise it if anything else ever commits to the same
    table.

    ``positions_dir`` (opt-in, r10) additionally maintains a
    kind-partitioned (term, id, positions) snapshot for the
    phrase/proximity serving tiers via ``upsert_positions_postings`` —
    its OWN table and commit, roughly doubling per-batch write volume
    (positions are the heaviest postings payload). Those tiers read
    positions tables alone, so the table is self-consistent; a reader
    mixing tf AND positions across the two tables (the batched-websearch
    fast tier) should pin matching versions — or use the
    ``ingest_serving`` layout, whose root manifest pins the cut.

    ``stemmer`` (r11) tokenizes every micro-batch with the named analyzer
    (see ``keyword_index.build_token_table``); it must match the analyzer
    the maintained table was BUILT with — this stream writes raw tables
    with no manifest to record it, so the caller owns the coherence the
    ingest_serving layout gets from its manifest."""
    from connapse_spark.operators.keyword_index import (
        build_token_table,
        doclen_partition_rows,
        upsert_doclen,
        upsert_positions_postings,
        upsert_tf_postings,
    )
    from connapse_spark.sources import snapshots

    stream = (
        spark.readStream.schema("doc_id long, text string, op string, seq long")
        .parquet(watch_dir)
    )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        latest = _lww_latest_doc_event(batch_df)
        is_del = F.coalesce(F.col("op"), F.lit("U")) == "D"
        upserts = latest.filter(~is_del).select("doc_id", "text")
        deleted = latest.filter(is_del).select(F.col("doc_id").alias("id"))
        toks = build_token_table(upserts, stemmer=stemmer)
        if snapshots.latest_version(table_dir) is None:
            cur = s.createDataFrame([], "kind string, term string, id long, tf long")
        else:
            cur = snapshots.read_snapshot(s, table_dir)
        parts = []
        for kind, col in (("exact", "tokens_exact"), ("stemmed", "tokens_stemmed")):
            cur_k = cur.filter(F.col("kind") == kind).select("term", "id", "tf")
            parts.append(
                upsert_tf_postings(cur_k, toks, deleted_ids=deleted, token_col=col)
                .withColumn("kind", F.lit(kind))
            )
        # doclen rides the same snapshot (kind='doclen', term='', tf=dl):
        # BM25 serving mixes tf rows and lengths, so they must move in ONE
        # atomic version — keyword_index.read_doclen reopens this partition
        cur_dl = cur.filter(F.col("kind") == "doclen").select(
            "id", F.col("tf").alias("dl")
        )
        parts.append(
            doclen_partition_rows(upsert_doclen(cur_dl, toks, deleted_ids=deleted))
        )
        merged = (
            parts[0]
            .unionByName(parts[1])
            .select("kind", "term", "id", "tf")
            .unionByName(parts[2])
        )
        snapshots.commit_snapshot(merged, table_dir, partition_by=["kind"])
        if positions_dir is not None:
            if snapshots.latest_version(positions_dir) is None:
                cur_p = s.createDataFrame(
                    [], "kind string, term string, id long, positions array<int>"
                )
            else:
                cur_p = snapshots.read_snapshot(s, positions_dir)
            pparts = []
            for kind, col in (("exact", "tokens_exact"), ("stemmed", "tokens_stemmed")):
                cur_k = cur_p.filter(F.col("kind") == kind).select(
                    "term", "id", "positions"
                )
                pparts.append(
                    upsert_positions_postings(
                        cur_k, toks, deleted_ids=deleted, token_col=col
                    ).withColumn("kind", F.lit(kind))
                )
            snapshots.commit_snapshot(
                pparts[0].unionByName(pparts[1]).select(
                    "kind", "term", "id", "positions"
                ),
                positions_dir,
                partition_by=["kind"],
            )
        if retain_last is not None and (batch_id + 1) % max(vacuum_every, 1) == 0:
            snapshots.vacuum_snapshot(
                table_dir,
                keep_last=retain_last,
                min_age_seconds=vacuum_min_age_seconds,
            )
            if positions_dir is not None:
                snapshots.vacuum_snapshot(
                    positions_dir,
                    keep_last=retain_last,
                    min_age_seconds=vacuum_min_age_seconds,
                )

    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_keyword_maintenance_pending(
    spark: SparkSession,
    watch_dir: str,
    base_dir: str,
    delta_dir: str,
    checkpoint_dir: str,
    compact_every: int = 8,
    positions_base_dir: str | None = None,
    positions_delta_dir: str | None = None,
    retain_last: int | None = None,
    vacuum_min_age_seconds: float = 0.0,
    stemmer: str = "suffix",
) -> None:
    """High-frequency variant of :func:`streaming_keyword_maintenance` —
    the GIN-fastupdate regime. The overwrite variant pays O(index) per
    micro-batch (a term-clustered index cannot benefit from keyed
    copy-on-write: a doc touches postings in every term range); here each
    batch APPENDS its postings + tombstones to a small delta table in
    O(batch), and every ``compact_every``-th batch folds the delta into
    the base (``keyword_index.tf_compact`` — amortized, crash-safe).
    Like the overwrite variant, the batch is first cut to one surviving
    event per doc (:func:`_lww_latest_doc_event`, optional seq column).
    Readers resolve base ∪ delta via ``keyword_index.tf_resolve``; the
    micro-batch id is the tombstone clock (replay-stable through the
    checkpoint, so crashed-batch replays resolve away).

    ``positions_base_dir``/``positions_delta_dir`` (opt-in, r10, both or
    neither) extend the same fastupdate regime to the positions postings
    — the phrase/proximity serving structure, and the layout where the
    O(index)-per-batch overwrite hurts most. Appends and compactions
    ride the same micro-batch clock; readers resolve via
    ``keyword_index.positions_resolve``.

    ``retain_last`` (r10) bounds version growth the way the overwrite
    variant does: the delta accretes one snapshot version per append and
    the base one per compaction, so a long-running stream without it
    accumulates manifests forever. Vacuum runs on the compaction cadence
    (right after the fold, when old versions stop being the serve path)
    over every table this stream writes; raise
    ``vacuum_min_age_seconds`` if anything else ever commits to them.

    ``stemmer`` (r11): same contract as the overwrite variant — must
    match the base table's build analyzer; the caller owns coherence for
    raw-table streams."""
    from connapse_spark.operators.keyword_index import (
        build_token_table,
        positions_compact,
        positions_pending_append,
        tf_compact,
        tf_pending_append,
    )

    if (positions_base_dir is None) != (positions_delta_dir is None):
        raise ValueError(
            "positions_base_dir and positions_delta_dir come as a pair"
        )

    stream = (
        spark.readStream.schema("doc_id long, text string, op string, seq long")
        .parquet(watch_dir)
    )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        latest = _lww_latest_doc_event(batch_df)
        is_del = F.coalesce(F.col("op"), F.lit("U")) == "D"
        upserts = latest.filter(~is_del).select("doc_id", "text")
        deleted = latest.filter(is_del).select(F.col("doc_id").alias("id"))
        # tokenize ONCE per micro-batch: with the positions pair enabled,
        # two independent appends would each re-run the LWW cut + the
        # tokenizer — the dominant per-batch CPU of an O(batch) append
        toks = build_token_table(upserts, stemmer=stemmer)
        if positions_delta_dir is not None:
            toks = toks.persist()
        try:
            tf_pending_append(
                upserts, delta_dir, deleted_ids=deleted, batch=batch_id, tokens=toks
            )
            if positions_delta_dir is not None:
                positions_pending_append(
                    upserts,
                    positions_delta_dir,
                    deleted_ids=deleted,
                    batch=batch_id,
                    tokens=toks,
                )
        finally:
            if positions_delta_dir is not None:
                toks.unpersist()
        if compact_every and (batch_id + 1) % compact_every == 0:
            tf_compact(batch_df.sparkSession, base_dir, delta_dir)
            if positions_delta_dir is not None:
                positions_compact(
                    batch_df.sparkSession, positions_base_dir, positions_delta_dir
                )
            if retain_last is not None:
                from connapse_spark.sources import snapshots

                dirs = [base_dir, delta_dir]
                if positions_delta_dir is not None:
                    dirs += [positions_base_dir, positions_delta_dir]
                for d in dirs:
                    snapshots.vacuum_snapshot(
                        d,
                        keep_last=retain_last,
                        min_age_seconds=vacuum_min_age_seconds,
                    )

    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_serving_maintenance(
    spark: SparkSession,
    watch_dir: str,
    base_dir: str,
    checkpoint_dir: str,
    tf_mode: str = "overwrite",
    compact_every: int = 0,
    vacuum_every: int = 0,
    keep_last_cuts: int = 2,
    vacuum_min_age_seconds: float = 0.0,
    **wave_kwargs,
) -> None:
    """Continuous maintenance of a WHOLE ingest_serving layout (r11) —
    the streaming front for the serve-everything regime: document event
    batches landing under ``watch_dir`` (parquet: doc_id, text, op —
    op 'D' deletes, else upserts; optional seq orders within a batch)
    fold into the committed layout via ``ingest_serving_incremental``
    one micro-batch at a time, each batch ending with a ROOT SERVING
    MANIFEST publish. Readers through ``load_serving`` see a sequence
    of complete cuts, never a torn mix — the raw-table maintenance
    streams above keep single tables fresh; THIS one keeps chunks,
    vectors, every keyword structure, and the IVF bundle moving as one
    transactional unit (the reference's watcher + Postgres transaction
    loop, ConnectorWatcherService.cs:42-44 + IngestionPipeline.cs).

    Exactly-once: the checkpoint replays a crashed micro-batch, and the
    wave converges (keyed deletes/upserts are idempotent against torn
    table versions — the incremental path reads the last PUBLISHED cut,
    never latest table versions). ``tf_mode="pending"`` gives
    high-frequency drops the O(batch) fastupdate regime;
    ``compact_every`` then folds via ``ingest.compact_serving`` (the
    pinned-version fold + repinned republish — NEVER raw tf_compact)
    every Nth batch. ``vacuum_every`` runs pin-aware
    ``ingest.vacuum_serving(keep_last_cuts=…)`` on its own cadence so a
    long-running stream does not accrete one full layout copy per batch.
    The layout's analyzer is inherited from its manifest per the
    incremental-wave contract — no ``stemmer`` knob here by design.
    Extra ``wave_kwargs`` (model_id, dims, embedder, nprobe,
    rebuild_threshold, strategy, …) pass through to every wave."""
    from connapse_spark.operators.ingest import (
        compact_serving,
        ingest_serving_incremental,
        vacuum_serving,
    )

    stream = (
        spark.readStream.schema("doc_id long, text string, op string, seq long")
        .parquet(watch_dir)
    )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        latest = _lww_latest_doc_event(batch_df)
        is_del = F.coalesce(F.col("op"), F.lit("U")) == "D"
        upserts = latest.filter(~is_del).select("doc_id", "text")
        deleted = latest.filter(is_del).select("doc_id")
        out = ingest_serving_incremental(
            upserts, base_dir, deleted_doc_ids=deleted,
            tf_mode=tf_mode, **wave_kwargs,
        )
        out["chunks"].unpersist()
        out["vectors"].unpersist()
        s = batch_df.sparkSession
        if compact_every and (batch_id + 1) % compact_every == 0:
            compact_serving(s, base_dir)
        if vacuum_every and (batch_id + 1) % vacuum_every == 0:
            vacuum_serving(
                base_dir,
                keep_last_cuts=keep_last_cuts,
                min_age_seconds=vacuum_min_age_seconds,
            )

    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_table_upsert(
    spark: SparkSession,
    watch_dir: str,
    table_dir: str,
    key_col: str,
    schema: str,
    order_col: str,
    checkpoint_dir: str,
    op_col: str | None = None,
) -> None:
    """CDC-style streaming MERGE — keyed record batches landing under
    ``watch_dir`` (parquet) upsert into the snapshot table through the
    snapshot layer's copy-on-write core, so a micro-batch touching 0.1%
    of keys rewrites ~0.1% of the table's files instead of the whole
    table (contrast streaming_index_maintenance, which re-commits the
    merged index because centroid assignment is global). Within a batch,
    last writer wins by ``order_col`` (the Debezium-shaped reduction:
    one surviving row per key per batch).

    ``op_col`` enables FULL change feeds: the column carries the change
    kind per row ('d' = delete, anything else = upsert); after the
    per-key LWW cut, keys whose LAST event is a delete leave the table
    and the rest upsert — both applied in ONE atomic version per batch
    (snapshots.apply_changes), so readers never see the deletes without
    the upserts.

    Exactly-once: the snapshot manifest is the transactional sink — every
    micro-batch publishes one atomically-visible version, a crashed batch
    leaves the previous version intact, and a replayed batch re-merges
    idempotently (same keys, same rows, one extra version). Readers on a
    pinned version never observe a half-applied batch."""
    from pyspark.sql.window import Window

    from connapse_spark.sources import snapshots

    stream = spark.readStream.schema(schema).parquet(watch_dir)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        w = Window.partitionBy(key_col).orderBy(F.desc(order_col))
        latest = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        sess = batch_df.sparkSession
        if op_col is not None:
            dels = latest.filter(F.col(op_col) == "d").select(key_col)
            ups = latest.filter(
                F.coalesce(F.col(op_col) != "d", F.lit(True))
            ).drop(op_col)
            if snapshots.latest_version(table_dir) is None:
                snapshots.commit_snapshot(ups, table_dir)
            else:
                snapshots.apply_changes(
                    sess, table_dir, key_col, upserts=ups, delete_keys=dels
                )
        elif snapshots.latest_version(table_dir) is None:
            snapshots.commit_snapshot(latest, table_dir)
        else:
            snapshots.merge_snapshot(sess, latest, table_dir, key_col)

    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_web_ingest(
    spark: SparkSession,
    watch_dir: str,
    table_dir: str,
    checkpoint_dir: str,
    glob: str = "*.warc.gz",
    boilerplate: bool = True,
) -> None:
    """Crawl-drop → snapshot-layer documents table, end to end: new WARC
    archives under ``watch_dir`` parse to clean html-200 records, extract
    to (url, title, text), and MERGE into ``table_dir`` keyed by url —
    one atomically-visible snapshot version per micro-batch, copy-on-write
    at file level (a drop touching 0.1% of urls rewrites ~0.1% of files).

    Within a batch, the LAST occurrence wins per url — ordered by the
    archive's modificationTime (the fetcher's recency), with
    (warc_file, record_idx) as a DETERMINISTIC tie-break for archives
    written in the same instant (lexicographic, so not a recency claim —
    zero-pad shard names if same-mtime ordering matters). Across
    activations, merge_snapshot's keyed upsert IS last-writer-wins.
    Exactly-once on BOTH ends: the file-source checkpoint never re-reads
    an archive, and the manifest commit makes each batch's merge atomic."""
    from pyspark.sql.window import Window

    from connapse_spark.operators.htmltext import extract_html_text
    from connapse_spark.sources import snapshots
    from connapse_spark.sources import warc as _warc

    blobs = (
        spark.readStream.format("binaryFile")
        .schema("path string, modificationTime timestamp, length long, content binary")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(watch_dir)
    )
    recs = _warc.web_documents(
        _warc.warc_records(blobs, extra_cols=["modificationTime"]),
        keep_cols=["warc_file", "record_idx", "modificationTime"],
    )
    docs = extract_html_text(
        recs, "text", boilerplate=boilerplate,
        keep_cols=["url", "warc_file", "record_idx", "modificationTime"],
    )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        w = Window.partitionBy("url").orderBy(
            F.desc("modificationTime"), F.desc("warc_file"), F.desc("record_idx")
        )
        latest = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("url", "title", "text")
        )
        sess = batch_df.sparkSession
        if snapshots.latest_version(table_dir) is None:
            snapshots.commit_snapshot(latest, table_dir)
        else:
            snapshots.merge_snapshot(sess, latest, table_dir, "url")

    q = (
        docs.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_frontier_maintenance(
    spark: SparkSession,
    watch_dir: str,
    ledger_dir: str,
    checkpoint_dir: str,
    retain_last: int | None = None,
    vacuum_every: int = 8,
) -> None:
    """The crawl LOOP as a streaming job (r8 — the ledger twin of
    :func:`streaming_keyword_maintenance`): micro-batches of discovered
    URLs landing under ``watch_dir`` (parquet: url string) are screened
    against the persisted crawl ledger on the CANONICAL url key
    (``links.frontier_delta``), and the fresh rows append to the ledger
    snapshot as ``(url, canonical_url, batch_id)`` — ONE atomic commit
    per micro-batch, which doubles as the fetch queue: the crawler
    consumes ``ledger WHERE batch_id = N`` (:func:`frontier_batch`), so
    every URL surfaces in exactly one batch across all activations.

    Exactly-once discovery rests on two legs: the file-source checkpoint
    never re-reads a drop, and a REPLAYED batch (crash between the ledger
    commit and the checkpoint write) is detected O(1) on the driver —
    every commit records its batch id in the manifest's ``props`` slot,
    and stream batch ids are monotonic, so ``batch_id <= last committed``
    means the commit already landed (this covers batches that appended
    ZERO fresh rows too — the marker commits regardless). The append is
    the transaction: no window where a URL is marked seen but queued
    nowhere. Per-batch cost is the batch's own canonical dedup plus one
    anti-join against the ledger's STORED key column (``seen_key_col`` —
    the 10^10-row side is never re-canonicalized) — never a ledger
    rewrite (append commits carry prior files by reference).

    ``retain_last``/``vacuum_every`` bound manifest growth exactly as in
    the keyword-maintenance stream."""
    from connapse_spark.operators.links import frontier_delta
    from connapse_spark.sources import snapshots

    stream = spark.readStream.schema("url string").parquet(watch_dir)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        have = snapshots.latest_version(ledger_dir) is not None
        if have:
            m = snapshots.load_manifest(ledger_dir)
            last = (m.get("props") or {}).get("frontier_last_batch_id")
            if last is not None and batch_id <= last:
                return  # replayed batch: its commit already landed
            seen = snapshots.read_snapshot(s, ledger_dir)
        else:
            seen = s.createDataFrame(
                [], "url string, canonical_url string, batch_id long"
            )
        fresh = frontier_delta(
            batch_df, seen, seen_key_col="canonical_url"
        ).withColumn("batch_id", F.lit(batch_id).cast("long"))
        snapshots.commit_snapshot(
            fresh,
            ledger_dir,
            mode="append" if have else "overwrite",
            props={"frontier_last_batch_id": batch_id},
        )
        if retain_last is not None and (batch_id + 1) % max(vacuum_every, 1) == 0:
            snapshots.vacuum_snapshot(ledger_dir, keep_last=retain_last)

    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def frontier_batch(spark: SparkSession, ledger_dir: str, batch_id: int) -> DataFrame:
    """The fetch queue of one maintenance micro-batch: the ledger rows
    committed by that batch (url, canonical_url) — what the fetcher
    feeds to crawl_frontier_df / crawl_schedule_df."""
    from connapse_spark.sources import snapshots

    return snapshots.read_snapshot(spark, ledger_dir).filter(
        F.col("batch_id") == batch_id
    ).select("url", "canonical_url")
