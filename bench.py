"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. The LAST line
of both stdout and stderr is ONE JSON summary: {"metric": ..., "n": runs,
"value": total_sec, "unit": "sec", "n_queries": N,
"queries": {name: sec, ...}, "sf": ...} — the per-query map is INLINE
(compact separators, ~3 KB; VERDICT r11 ask #1) and the identical payload
is also written durably to BENCH_SELF.json next to this script as
truncation insurance (the r3/r4 tail-truncation episode — BENCH_NOTES.md).

Headline set = the operators that dominate real workloads: hybrid search
(full pipeline incl. embed+fusion), vector KNN, keyword, dedup families,
similarity join, chunking, and the windowed event aggregates. Each timing
includes full execution to count() — Spark plans are lazy, so forcing an
action is the only honest clock.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "hybrid_cc",
    "hybrid_dbsf",
    "hybrid_autocut",
    "hybrid_filtered",
    "hybrid_rerank",
    "knn_vector",
    "keyword_search",
    "keyword_websearch",
    "keyword_proximity",
    "keyword_bm25",
    "keyword_many",
    "hybrid_many",
    "hybrid_many_websearch",
    "hybrid_many_fast",
    "keyword_snippets",
    "hybrid_rrf",
    "hybrid_onepass",
    "hybrid_websearch",
    "semantic_topk",
    "ann_lsh",
    "ann_ivf_seeded",
    "ivf_upsert",
    "pq_encode",
    "pq_topk",
    "ann_ivfpq",
    "pq_recall",
    "knn_join",
    "neardup_cosine_lsh",
    "exact_dedup",
    "line_dedup",
    "dup_spans",
    "cdc_chunks",
    "minhash_lsh",
    "neardup_incremental",
    "leakage_split",
    "ngram_jaccard_prefix",
    "simhash",
    "quality_stats",
    "repetition_stats",
    "fingerprint",
    "tfidf_top_terms",
    "perplexity",
    "lang_mismatch",
    "dsir_weights",
    "top_bigrams",
    "cms_hitters",
    "distinct_sketch",
    "bpe_merges",
    "gopher_filter",
    "token_entropy",
    "cluster_assign",
    "semdedup",
    "random_projection",
    "chunk_fixed_char",
    "chunk_token_window",
    "chunk_doc_aware",
    "markdown_sections",
    "chunk_recursive",
    "chunk_sentence_aware",
    "chunk_semantic",
    "ingest_stats",
    "parse_text",
    "media_stats",
    "table_stats",
    "url_canonicalize",
    "domain_caps",
    "domain_stats",
    "normalize_text",
    "asof_attribution",
    "range_join_orders",
    "events_rollup",
    "parse_binary",
    "events_tumbling",
    "events_sliding",
    "events_top_types",
    "events_sessionize",
    "funnel",
    "retention",
    "value_percentiles",
    "props_extract",
    "sample_mix",
    "quality_sample",
    "pack_sequences",
    "contamination",
    "bloom_contamination",
    "corpus_curate",
    "dataset_card",
    "redact_pii",
    "language_id_multi",
    "embed_quantized",
    "mean_pool",
    "embedding_hygiene",
    "reindex_decisions",
    "sync_delta",
    # round-6 web front: full export→re-ingest→extract round trip, link
    # extraction, and the 5-iteration PageRank power loop
    "warc_roundtrip",
    "link_graph",
    "pagerank",
    # round-7 crawl front: politeness scheduling over the gated frontier,
    # revisit resolution through the real writer/parser, HITS over the
    # 50-node multigraph, anchor aggregation, indexability union gate,
    # and density-based main-content extraction
    "frontier_schedule",
    "resolve_revisits",
    "hits",
    "anchor_text_agg",
    "web_noindex",
    "main_content",
    # round-8: the distributed-robots schedule tier (same fixture as the
    # dict-tier frontier_schedule row — the delta IS the tier cost) and
    # the warm-start rank refresh (cold_3 prior + 2 warm sweeps; compare
    # against the 5-iteration pagerank row). Phrase websearch is timed in
    # the keyword-index section below against the PINNED index — putting
    # its registry entry here would cache the token table under the same
    # canonicalized plan the keyword_index_build row later builds, and
    # the build rows would silently read that cache (round-comparability
    # poison; found in the r8 review wave).
    "frontier_schedule_join",
    "pagerank_warm",
    # r8 second wave: the CDX capture index (fixture archives through the
    # located parser + SURT column math), perceptual image near-dup
    # (PNG decode → aHash → banded Hamming), and the crawl-ledger screen
    # (canonical-key anti-join over the sf corpus URL table)
    "cdx_index",
    "image_neardup",
    "frontier_delta",
    # r8 search-stage additions: MMR diversity re-rank (fixed candidate
    # count — k plan-truncated greedy steps; times the step machinery,
    # not a scan) and facet counts (one corpus scan + facet-bounded agg)
    "mmr_diversify",
    "keyword_facets",
    # r8 wave 3: data-derived multilingual mix (scan + broadcast cuts),
    # DCT pHash + audio energy-delta near-dup (fixed-cost fixtures)
    "temperature_mix",
    "image_neardup_dct",
    "audio_neardup",
    "video_neardup",
    # conditional bigram NLL: fit (pair agg) + score (pair join) per run
    "perplexity_bigram",
    # exact-substring removal: span hashes + dup-start join + in-row mask
    "remove_dup_spans",
    # r9: trained quality classifier (hashed n-gram explode + broadcast
    # weight join + id-keyed integer sum) and its curate composition
    "quality_classifier",
    "curate_classified",
    # r9 archive front: WAT metadata roundtrip (sf-scaling: export →
    # extract → re-ingest) and incremental CDX maintenance (fixed-cost
    # fixture row — base build + level append through the snapshot layer)
    "wat_roundtrip",
    "cdx_incremental",
    # keyword_many_phrase is deliberately NOT here: its registry entry
    # persists build_token_table(documents), whose canonicalized plan is
    # identical to the keyword-index build rows below — running it in
    # this loop would cache-poison those rows (the r8 lesson above). It
    # is timed in the keyword-index section against the pinned tables.
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    import __spark_entry__ as entry_mod
    from connapse_spark.session import get_spark

    spark = get_spark(app_name="connapse-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry_mod.queries()
    timings: dict[str, float] = {}
    # warmup: absorb JVM/codegen/broadcast first-run cost with one untimed
    # representative query, then time the suite
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()
    qs["hybrid_cc"](spark, sf_dir).count()

    # r8 noise sentinel (VERDICT r7 ask #7): a FIXED-COST row — one
    # 32-task sum over a pinned range, pure stage-scheduling work —
    # timed immediately after warmup and again after the whole suite.
    # Identical work at both ends: a large spread or absolute value
    # marks a host-contention window (this box's documented CPU-steal
    # episodes), so every BENCH artifact carries its own contention
    # evidence (read rule in BENCH_NOTES.md). Recorded as top-level
    # JSON fields, EXCLUDED from value/total for round comparability.
    def _sentinel() -> float:
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            spark.range(100_000, numPartitions=int(cpus)).selectExpr(
                "sum(id)"
            ).collect()
            best = min(best, time.time() - t0)
        return round(best, 3)

    sentinel_first = _sentinel()
    print(f"# noise_sentinel_first: {sentinel_first:.3f}s", file=sys.stderr, flush=True)
    # best-of-2 per query: this box is a shared microVM with intermittent
    # host CPU steal (observed 10-50s stalls on otherwise-stable queries);
    # the min of two runs measures the engine, not the neighbor. The metric
    # string + "n" field report the actual count, and BENCH_r02 was recorded
    # at n=2 — keeping the default preserves round-over-round comparability.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    # rows whose OPERATOR persists internally (resolve_revisits' enforced
    # materialization): run 2's identical canonicalized plan would read
    # run 1's cache and best-of-2 would report a cache read (~0.4s) for
    # a ~2.5s operator — the same poisoning class as the phrase row.
    # Cache is cleared before each timed run of these rows only.
    clear_cache_rows = {"resolve_revisits"}
    total = 0.0
    for name in BENCH_QUERIES:
        fn = qs[name]
        best, n = float("inf"), 0
        for _ in range(runs):
            if name in clear_cache_rows:
                spark.catalog.clearCache()
            t0 = time.time()
            n = fn(spark, sf_dir).count()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
        total += best
        print(f"# {name}: {best:.2f}s ({n} rows)", file=sys.stderr, flush=True)

    # Keyword posting-list index: build and probe timed SEPARATELY — the
    # build is an ingest-time job (one pass + two aggregations), and folding
    # it into the query hid the probe's pruned-scan win. The probe runs
    # against the materialized index like a real deployment.
    from pyspark.sql import functions as _F

    from connapse_spark.operators import keyword_index

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    # r7: split into two rows so rounds compare like-for-like — r6 folded
    # the (new) tf-postings structures into keyword_index_build, which made
    # its 1.11s→1.91s delta read as a regression when it was added work.
    t0 = time.time()
    tokens = keyword_index.build_token_table(docs).persist()
    pe = keyword_index.build_postings(tokens, "tokens_exact").persist()
    ps = keyword_index.build_postings(tokens, "tokens_stemmed").persist()
    tokens.count(), pe.count(), ps.count()
    build_t = time.time() - t0
    timings["keyword_index_build"] = round(build_t, 3)
    total += build_t
    print(f"# keyword_index_build: {build_t:.2f}s", file=sys.stderr, flush=True)
    t0 = time.time()
    tfe = keyword_index.build_tf_postings(tokens, "tokens_exact").persist()
    tfs = keyword_index.build_tf_postings(tokens, "tokens_stemmed").persist()
    tfe.count(), tfs.count()
    tf_build_t = time.time() - t0
    timings["tf_postings_build"] = round(tf_build_t, 3)
    total += tf_build_t
    print(f"# tf_postings_build: {tf_build_t:.2f}s", file=sys.stderr, flush=True)
    best, n = float("inf"), 0
    for _ in range(runs):
        t0 = time.time()
        n = keyword_index.keyword_search_indexed(
            tokens, pe, ps, entry_mod.SEARCH_QUERY, k=20
        ).count()
        best = min(best, time.time() - t0)
    timings["keyword_indexed_probe"] = round(best, 3)
    total += best
    print(f"# keyword_indexed_probe: {best:.2f}s ({n} rows)", file=sys.stderr, flush=True)

    # r8: phrase/negation websearch served from the SAME pinned index —
    # serve-only semantics (build cost is the keyword_index_build row)
    best, n = float("inf"), 0
    for _ in range(runs):
        t0 = time.time()
        n = keyword_index.keyword_search_websearch_indexed(
            tokens, pe, ps, entry_mod.WEBSEARCH_QUERY, k=20
        ).count()
        best = min(best, time.time() - t0)
    timings["keyword_phrase_indexed_probe"] = round(best, 3)
    total += best
    print(
        f"# keyword_phrase_indexed_probe: {best:.2f}s ({n} rows)",
        file=sys.stderr, flush=True,
    )

    # r9: positions-bearing postings — build row + the BATCHED phrase
    # probe against the pinned tables (serve-only; the registry twin
    # keyword_many_phrase folds the build in and runs only in the
    # correctness gate, never here — see the BENCH_QUERIES note)
    t0 = time.time()
    ppe = keyword_index.build_positions_postings(tokens, "tokens_exact").persist()
    pps = keyword_index.build_positions_postings(tokens, "tokens_stemmed").persist()
    ppe.count(), pps.count()
    pos_build_t = time.time() - t0
    timings["positions_postings_build"] = round(pos_build_t, 3)
    total += pos_build_t
    print(f"# positions_postings_build: {pos_build_t:.2f}s", file=sys.stderr, flush=True)
    best, n = float("inf"), 0
    for _ in range(runs):
        t0 = time.time()
        n = keyword_index.keyword_search_many_phrase_indexed(
            ppe, pps, entry_mod.PHRASE_BATCH_QUERIES, k=5
        ).count()
        best = min(best, time.time() - t0)
    timings["keyword_many_phrase_probe"] = round(best, 3)
    total += best
    print(
        f"# keyword_many_phrase_probe: {best:.2f}s ({n} rows)",
        file=sys.stderr, flush=True,
    )
    # r9: cover-density proximity served from the same pinned positions
    # tables (serve-only; scan twin is the keyword_proximity row)
    best, n = float("inf"), 0
    for _ in range(runs):
        t0 = time.time()
        n = keyword_index.keyword_search_proximity_indexed(
            ppe, pps, entry_mod.SEARCH_QUERY, k=20
        ).count()
        best = min(best, time.time() - t0)
    timings["keyword_proximity_indexed_probe"] = round(best, 3)
    total += best
    print(
        f"# keyword_proximity_indexed_probe: {best:.2f}s ({n} rows)",
        file=sys.stderr, flush=True,
    )

    # r10: BM25 SERVED from the index (VERDICT r9 ask #6 — the Q3
    # family's last scan-only member): stemmed tf-postings + the
    # one-int-per-doc doclen table answer the query term-pruned, no
    # corpus tokenize. Serve-only row; the doclen build is write-time
    # (folded into the postings build cost in a real ingest).
    doclen = keyword_index.build_doclen_table(tokens).persist()
    doclen.count()
    keyword_index.keyword_search_bm25_indexed(
        tfs, doclen, entry_mod.SEARCH_QUERY, k=20
    ).count()  # warm
    best, n = float("inf"), 0
    for _ in range(runs):
        t0 = time.time()
        n = keyword_index.keyword_search_bm25_indexed(
            tfs, doclen, entry_mod.SEARCH_QUERY, k=20
        ).count()
        best = min(best, time.time() - t0)
    timings["keyword_bm25_indexed_probe"] = round(best, 3)
    total += best
    print(
        f"# keyword_bm25_indexed_probe: {best:.2f}s ({n} rows)",
        file=sys.stderr, flush=True,
    )

    # r10: the opt-in Porter2 analyzer's write-time cost (the ONLY place
    # the full Snowball stemmer touches Spark: corpus tokenization via
    # mapInPandas). Measured as a full token-table build + count so the
    # round diff shows what switching analyzers costs relative to
    # keyword_index_build's JVM suffix tier.
    best, n = float("inf"), 0
    for _ in range(runs):
        t0 = time.time()
        n = keyword_index.build_token_table(
            spark.read.parquet(os.path.join(sf_dir, "documents.parquet")),
            stemmer="porter2",
        ).count()
        best = min(best, time.time() - t0)
    timings["porter2_tokenize"] = round(best, 3)
    total += best
    print(
        f"# porter2_tokenize: {best:.2f}s ({n} rows)", file=sys.stderr, flush=True
    )

    # Batched keyword from materialized tf-postings: 20 queries, one
    # pruned postings probe — the GIN regime for BASELINE.md's <20 ms
    # keyword envelope in the amortized-batch interpretation.
    kw_batch = [
        (i, f"{w} table scan") for i, w in enumerate(
            ["hash", "sort", "merge", "filter", "group", "window", "agg",
             "column", "row", "batch", "spark", "index", "vector", "token",
             "stream", "cache", "shuffle", "partition", "codegen", "parquet"]
        )
    ]
    keyword_index.keyword_search_many_indexed(tfe, tfs, kw_batch[:2], k=10).count()  # warm
    best, n = float("inf"), 0
    for _ in range(runs):
        t0 = time.time()
        n = keyword_index.keyword_search_many_indexed(tfe, tfs, kw_batch, k=10).count()
        best = min(best, time.time() - t0)
    timings["keyword_batch20_indexed"] = round(best, 3)
    total += best
    print(
        f"# keyword_batch20_indexed: {best:.2f}s ({n} rows) = {best / 20 * 1000:.0f} ms/query",
        file=sys.stderr, flush=True,
    )

    # Full hybrid SERVED from the same materialized index (VERDICT r5 ask
    # #2): keyword branch = posting-list candidates, vector branch = stored
    # vectors. Must beat hybrid_cc's full-scan keyword branch.
    from connapse_spark.operators.search import SearchOptions, hybrid_search

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    kw_idx = keyword_index.KeywordIndex(tokens, pe, ps)
    vectors = emb.select(_F.col("vec_id").alias("id"), "embedding")
    hybrid_search(
        docs, entry_mod.SEARCH_QUERY, SearchOptions(top_k=10),
        vectors=vectors, keyword_index=kw_idx,
    ).count()  # warm
    best, n = float("inf"), 0
    for _ in range(runs):
        t0 = time.time()
        n = hybrid_search(
            docs, entry_mod.SEARCH_QUERY, SearchOptions(top_k=10),
            vectors=vectors, keyword_index=kw_idx,
        ).count()
        best = min(best, time.time() - t0)
    timings["hybrid_indexed_probe"] = round(best, 3)
    total += best
    print(f"# hybrid_indexed_probe: {best:.2f}s ({n} rows)", file=sys.stderr, flush=True)

    # r10: snippets with the RANKING index-served — the only documents
    # touch is the <=k winners' text fetch for the excerpt window
    keyword_index.keyword_search_snippets_indexed(
        kw_idx, docs, entry_mod.SEARCH_QUERY, k=10
    ).count()  # warm
    best, n = float("inf"), 0
    for _ in range(runs):
        t0 = time.time()
        n = keyword_index.keyword_search_snippets_indexed(
            kw_idx, docs, entry_mod.SEARCH_QUERY, k=10
        ).count()
        best = min(best, time.time() - t0)
    timings["keyword_snippets_indexed_probe"] = round(best, 3)
    total += best
    print(
        f"# keyword_snippets_indexed_probe: {best:.2f}s ({n} rows)",
        file=sys.stderr, flush=True,
    )
    for df in (tokens, pe, ps, doclen):
        df.unpersist()
    # tfe/tfs stay pinned: the batched-hybrid section below serves its
    # keyword branch from them (hybrid_batch20_indexed); ppe/pps stay
    # pinned for the websearch batch row (hybrid_batch20_websearch)

    # IVF ANN index: same build/probe split — the KMeans fit is an index job
    # (M6's "rebuild on drift" path); the probe is the latency that matters.
    from connapse_spark.functions.embed import embed_py
    from connapse_spark.plans import ivf as _ivf

    qv = embed_py(entry_mod.SEARCH_QUERY, 64)
    t0 = time.time()
    index, centroids = _ivf.build_ivf_index(emb, n_lists=8, seed=42)
    index = index.persist()
    index.count()
    build_t = time.time() - t0
    timings["ivf_index_build"] = round(build_t, 3)
    total += build_t
    print(f"# ivf_index_build: {build_t:.2f}s", file=sys.stderr, flush=True)
    # one untimed probe absorbs the first-run codegen compile of the cosine
    # fold (~1.5s of Janino, not probe work) — the timed number is the
    # steady-state per-query latency an index serves after warmup
    _ivf.ann_ivf_topk(index, centroids, qv, k=10, nprobe=3).count()
    best, n = float("inf"), 0
    for _ in range(runs):
        t0 = time.time()
        n = _ivf.ann_ivf_topk(index, centroids, qv, k=10, nprobe=3).count()
        best = min(best, time.time() - t0)
    timings["ivf_probe"] = round(best, 3)
    total += best
    print(f"# ivf_probe: {best:.2f}s ({n} rows)", file=sys.stderr, flush=True)

    # Full hybrid with the vector branch SERVED from that same IVF index
    # (nprobe 3/8 of the lists): the steady-state single-query regime once
    # ingest has materialized the index — compare against hybrid_cc (brute
    # vector scan) and hybrid_indexed_probe (keyword-served).
    vidx = _ivf.VectorIndex(index=index, centroids=centroids, nprobe=3)
    hybrid_search(
        docs, entry_mod.SEARCH_QUERY, SearchOptions(top_k=10), vector_index=vidx
    ).count()  # warm
    best, n = float("inf"), 0
    for _ in range(runs):
        t0 = time.time()
        n = hybrid_search(
            docs, entry_mod.SEARCH_QUERY, SearchOptions(top_k=10),
            vector_index=vidx,
        ).count()
        best = min(best, time.time() - t0)
    timings["hybrid_ann_probe"] = round(best, 3)
    total += best
    print(f"# hybrid_ann_probe: {best:.2f}s ({n} rows)", file=sys.stderr, flush=True)
    # index/centroids stay pinned: the batched section below serves its
    # vector branch from them (hybrid_batch20_ann)

    # Amortized-batch hybrid — the regime BASELINE.md's <100 ms envelope
    # is scored under: 20 full-hybrid queries in ONE job through the BLAS
    # tier. Per-query latency = value / 20.
    from connapse_spark.operators.search import hybrid_search_many_fast

    # Headline-row hardening (BENCH_NOTES.md): the corpus join is pinned
    # BEFORE the timed region (the r5 81→99 ms/query drift tracked the
    # per-run join+scan, not the score kernel) and the row runs best-of-3
    # minimum — one extra run on the single headline number buys immunity
    # to the microVM's CPU-steal stalls without re-running the whole suite.
    corpus = docs.join(
        emb.select(_F.col("vec_id").alias("doc_id"), "embedding"), "doc_id"
    ).persist()
    corpus.count()
    batch_words = [
        "hash", "sort", "merge", "filter", "group", "window", "agg", "column",
        "row", "batch", "spark", "index", "vector", "token", "stream", "cache",
        "shuffle", "partition", "codegen", "parquet",
    ]
    batch_qs = [(i, f"query {w} table scan join") for i, w in enumerate(batch_words)]
    hybrid_search_many_fast(corpus, batch_qs[:2], top_k=10).count()  # warm
    best, n = float("inf"), 0
    for _ in range(max(runs, 3)):
        t0 = time.time()
        n = hybrid_search_many_fast(corpus, batch_qs, top_k=10).count()
        best = min(best, time.time() - t0)
    timings["hybrid_batch20_fast"] = round(best, 3)
    total += best
    print(
        f"# hybrid_batch20_fast: {best:.2f}s ({n} rows) = {best / 20 * 1000:.0f} ms/query",
        file=sys.stderr, flush=True,
    )

    # Same 20 queries SERVED from the write-time tf-postings: zero corpus
    # tokenization in the query path — the full-index regime every batch
    # runs in once ingest materializes the postings.
    hybrid_search_many_fast(
        corpus, batch_qs[:2], top_k=10, tf_postings=(tfe, tfs)
    ).count()  # warm
    best, n = float("inf"), 0
    for _ in range(max(runs, 3)):
        t0 = time.time()
        n = hybrid_search_many_fast(
            corpus, batch_qs, top_k=10, tf_postings=(tfe, tfs)
        ).count()
        best = min(best, time.time() - t0)
    timings["hybrid_batch20_indexed"] = round(best, 3)
    total += best
    print(
        f"# hybrid_batch20_indexed: {best:.2f}s ({n} rows) = {best / 20 * 1000:.0f} ms/query",
        file=sys.stderr, flush=True,
    )

    # r10: same batch regime with FULL WEBSEARCH SYNTAX per query
    # (VERDICT r9 ask #3 — previously one quoted phrase forced the whole
    # batch onto the per-query-expression oracle tier): keyword branch =
    # set-based match+score over the pinned tf postings + positions
    # postings (phrase atoms), vector branch = the same BLAS kernel.
    ws_forms = [
        lambda w: f'"{w} table" scan',        # phrase + term
        lambda w: f"{w} -merge",              # negation
        lambda w: f'{w} OR "table scan"',     # OR + phrase
        lambda w: f"query {w} join",          # flat terms
    ]
    ws_qs = [(i, ws_forms[i % 4](w)) for i, w in enumerate(batch_words)]
    hybrid_search_many_fast(
        corpus, ws_qs[:2], top_k=10, websearch=True,
        tf_postings=(tfe, tfs), positions_postings=(ppe, pps),
    ).count()  # warm
    best, n = float("inf"), 0
    for _ in range(max(runs, 3)):
        t0 = time.time()
        n = hybrid_search_many_fast(
            corpus, ws_qs, top_k=10, websearch=True,
            tf_postings=(tfe, tfs), positions_postings=(ppe, pps),
        ).count()
        best = min(best, time.time() - t0)
    timings["hybrid_batch20_websearch"] = round(best, 3)
    total += best
    print(
        f"# hybrid_batch20_websearch: {best:.2f}s ({n} rows) = {best / 20 * 1000:.0f} ms/query",
        file=sys.stderr, flush=True,
    )

    # FULLY index-served batch: keyword from tf-postings AND vectors from
    # the pinned IVF index at pruned probe (3/8 lists) — no corpus scan at
    # all in the query path. The 100 TB serving shape: both branches read
    # matched-candidate slices of write-time structures.
    vidx_b = _ivf.VectorIndex(index=index, centroids=centroids, nprobe=3)
    hybrid_search_many_fast(
        corpus, batch_qs[:2], top_k=10, tf_postings=(tfe, tfs), vector_index=vidx_b
    ).count()  # warm
    best, n = float("inf"), 0
    for _ in range(max(runs, 3)):
        t0 = time.time()
        n = hybrid_search_many_fast(
            corpus, batch_qs, top_k=10, tf_postings=(tfe, tfs), vector_index=vidx_b
        ).count()
        best = min(best, time.time() - t0)
    timings["hybrid_batch20_ann"] = round(best, 3)
    total += best
    print(
        f"# hybrid_batch20_ann: {best:.2f}s ({n} rows) = {best / 20 * 1000:.0f} ms/query",
        file=sys.stderr, flush=True,
    )
    corpus.unpersist()
    tfe.unpersist(), tfs.unpersist()
    ppe.unpersist(), pps.unpersist()
    index.unpersist()

    # One base dict; the durable payload adds the per-query map, the printed
    # line swaps it for a pointer. The headline JSON must survive any
    # tail/stream truncation in the caller's capture: BENCH_r03 AND BENCH_r04
    # both lost their parsed result because the full per-query map made the
    # line longer than the caller's tail window — so the final line printed
    # to stdout/stderr is a COMPACT summary only; the full per-query map
    # lives durably in BENCH_SELF.json next to this script.
    sentinel_last = _sentinel()
    print(f"# noise_sentinel_last: {sentinel_last:.3f}s", file=sys.stderr, flush=True)

    base = {
        "metric": (
            "headline query suite wall-clock"
            + (f" (best of {runs})" if runs > 1 else " (single run)")
        ),
        "n": runs,
        "value": round(total, 3),
        "unit": "sec",
        "sf": sf,
        "sentinel_first_s": sentinel_first,
        "sentinel_last_s": sentinel_last,
    }
    # r12 (VERDICT r11 ask #1): the final line INLINES the full per-query
    # map — the r11 file-pointer form ("per_query": "BENCH_SELF.json") left
    # the driver's PERF comparison with an empty per_query/scaling table,
    # which degraded the round-over-round adjudication to two noisy totals.
    # The map is ~3 KB for 139 rows (separators keep it compact); the r3/r4
    # tail-truncation risk this guarded against is covered by ALSO writing
    # the identical payload durably to BENCH_SELF.json. Additions only: all
    # r11 fields (metric/n/value/unit/sf/sentinels/n_queries) are retained.
    payload = json.dumps(
        {**base, "n_queries": len(timings), "queries": timings},
        separators=(",", ":"),
    )
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_SELF.json"), "w") as f:
        f.write(payload + "\n")
    print(payload, flush=True)
    print(payload, file=sys.stderr, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
