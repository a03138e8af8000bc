"""Physical-plan assertions: the 100 TB design claims, checked against
``explain`` output — pushdown reaches the scan, KNN avoids full sorts,
small sides broadcast, index reads prune partitions. These are the
regressions that silently cost 100× at scale while every value stays right.
"""

import os
import re

import pytest
from pyspark.sql import functions as F

from connapse_spark.functions.embed import embed_py
from connapse_spark.operators.search import SearchOptions, hybrid_search, vector_knn
from connapse_spark.plans import ivf
from connapse_spark.sources import sinks


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def _docs(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _emb(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


def test_filter_pushdown_reaches_parquet_scan(spark, sf_dir):
    df = _docs(spark, sf_dir).filter(F.col("lang") == "en").select("doc_id", "lang")
    plan = _plan(df)
    assert "PushedFilters: [" in plan
    assert "EqualTo(lang,en)" in plan.replace("IsNotNull(lang), ", "")


def test_column_pruning_reaches_read_schema(spark, sf_dir):
    df = _docs(spark, sf_dir).select("doc_id")
    plan = _plan(df)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and m.group(1) == "doc_id:bigint"  # text column NOT read


def test_knn_is_take_ordered_not_global_sort(spark, sf_dir):
    qv = embed_py("probe", 64)
    df = vector_knn(_emb(spark, sf_dir), qv, k=10, id_col="vec_id")
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan  # top-k pushdown, no full sort
    assert "Exchange rangepartitioning" not in plan  # no global sort shuffle


def test_knn_plan_has_no_shuffle(spark, sf_dir):
    qv = embed_py("probe", 64)
    df = vector_knn(_emb(spark, sf_dir), qv, k=10, id_col="vec_id")
    assert "Exchange" not in _plan(df)  # scan → project → take-ordered only


def test_hybrid_filter_pushed_to_both_branches(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    vecs = _emb(spark, sf_dir).select(F.col("vec_id").alias("id"), "embedding")
    df = hybrid_search(
        docs, "table scan", SearchOptions(top_k=5),
        predicate=F.col("lang") == "en", vectors=vecs,
    )
    plan = _plan(df)
    # keyword branch: lang filter must be pushed into the documents scan
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan


def test_lsh_probe_prunes_partitions_on_disk(spark, sf_dir, tmp_path):
    idx = ivf.build_lsh_index(_emb(spark, sf_dir), n_planes=4)
    path = str(tmp_path / "lsh")
    sinks.write_lsh_index(idx, path)
    stored = spark.read.parquet(path)
    qv = embed_py("probe", 64)
    probe = ivf.ann_lsh_topk(stored, qv, k=5, n_planes=4)
    plan = _plan(probe)
    # bucket is a partition column of the stored index → partition pruning,
    # and the scan must not be reading every bucket
    assert re.search(r"PartitionFilters: \[.*bucket.*\]", plan)


def test_postings_read_prunes_term_buckets(spark, sf_dir, tmp_path):
    from connapse_spark.operators import keyword_index

    docs = _docs(spark, sf_dir).limit(200)
    tokens = keyword_index.build_token_table(docs)
    postings = keyword_index.build_postings(tokens, "tokens_exact")
    path = str(tmp_path / "postings")
    sinks.write_postings(postings, path)
    pruned = sinks.read_postings_for_terms(spark, path, ["table", "scan"])
    plan = _plan(pruned)
    assert re.search(r"PartitionFilters: \[.*term_bucket.*\]", plan)
    rows = pruned.collect()
    assert {r["term"] for r in rows} <= {"table", "scan"}


def test_indexed_keyword_probe_plan_is_shuffle_free(spark, sf_dir):
    """The SERVING plan of the posting-list keyword probe over a
    materialized index: candidate ids broadcast into a LeftSemi join
    against the token table, top-k via TakeOrderedAndProject, and ZERO
    shuffle Exchange — the whole point of paying tokenization at write
    time. (hybrid_indexed's bench row measures this same path.)"""
    from connapse_spark.operators import keyword_index

    docs = _docs(spark, sf_dir).limit(300)
    idx = keyword_index.build_keyword_index(docs).persist()
    for df in (idx.tokens, idx.postings_exact, idx.postings_stemmed):
        df.count()  # materialize: the probe must plan against the cache
    probe = keyword_index.keyword_search_indexed(
        idx.tokens, idx.postings_exact, idx.postings_stemmed, "table scan", k=10
    )
    plan = _plan(probe)
    assert re.search(r"BroadcastHashJoin .*LeftSemi", plan) or "LeftSemi" in plan
    assert "TakeOrderedAndProject" in plan
    # broadcast exchanges are fine (candidate ids are tiny); a SHUFFLE
    # exchange would mean the probe re-aggregates the corpus
    shuffles = re.findall(r"\n[^\n]*\bExchange (?!.*Broadcast)", plan)
    assert not [s for s in shuffles if "Broadcast" not in s], plan
    idx.unpersist()


def test_websearch_indexed_matches_scan_tier(spark, sf_dir):
    """r8 (VERDICT r7 ask #8): phrase/negation/OR websearch served from
    the write-time index must be row-identical to the scan tier, and an
    all-negated OR-group (not candidate-prunable) must refuse loudly
    instead of downgrading silently."""
    import pytest
    from connapse_spark.operators import keyword_index
    from connapse_spark.operators.search import keyword_search_websearch

    docs = _docs(spark, sf_dir).limit(300)
    idx = keyword_index.build_keyword_index(docs).persist()
    q = '"table scan" fast -merge OR "fast merge"'
    served = keyword_index.keyword_search_websearch_indexed(
        idx.tokens, idx.postings_exact, idx.postings_stemmed, q, k=15
    )
    scan = keyword_search_websearch(docs, q, k=15)
    assert [(r["id"], r["score"]) for r in served.collect()] == [
        (r["doc_id"], r["score"]) for r in scan.collect()
    ]
    with pytest.raises(ValueError, match="positive term"):
        keyword_index.keyword_search_websearch_indexed(
            idx.tokens, idx.postings_exact, idx.postings_stemmed, "-merge", k=5
        )
    idx.unpersist()


def test_broadcast_join_for_small_dimension(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    small = spark.createDataFrame([("src1",), ("src2",)], "source string")
    df = docs.join(F.broadcast(small), "source")
    assert "BroadcastHashJoin" in _plan(df)


def test_whole_stage_codegen_covers_relational_pipeline(spark, sf_dir):
    """Scalar filter/project/agg pipelines must stay in one codegen span.
    (Array higher-order functions — scoring, shingling — evaluate in
    ProjectExec's interpreted path by Spark design; they are single-pass
    per row, which is why those operators materialize intermediate arrays
    as columns rather than nesting lambdas — see dedup.shingles_expr.)"""
    spark.conf.set("spark.sql.adaptive.enabled", "false")  # AQE hides spans pre-execution
    try:
        docs = _docs(spark, sf_dir)
        df = (
            docs.filter(F.col("lang") == "en")
            .select("source", F.length("text").alias("n"))
            .groupBy("source")
            .agg(F.sum("n").alias("total"))
        )
        plan = _plan(df)
        # '*(n)' prefixes mark whole-stage-codegen spans in the plan string;
        # scan→filter→project→partial-agg must share span (1)
        assert "*(1) HashAggregate" in plan and "*(1) Filter" in plan
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_embedding_neardup_defaults_to_lsh(spark):
    """The public dedup surface must not plan a cartesian unless exact=True
    is explicitly requested."""
    from connapse_spark.operators.similarity import embedding_neardup_pairs

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    default_plan = embedding_neardup_pairs(emb, threshold=0.3)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in default_plan and "NestedLoop" not in default_plan
    exact_plan = embedding_neardup_pairs(emb, threshold=0.3, exact=True)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" in exact_plan or "NestedLoop" in exact_plan or "SortMergeJoin" in exact_plan


def test_knn_join_no_full_pair_exchange(spark):
    """knn_join must prune to local top-k BEFORE the query_id exchange: the
    plan is mapInPandas (bounded emit) -> window merge, never a cross-join
    feeding the window."""
    from pyspark.sql import functions as F

    from connapse_spark.operators.similarity import knn_join

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = knn_join(emb.filter(F.col("vec_id") < 5), emb, k=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    rows = out.collect()
    assert {r["query_id"] for r in rows} == set(range(5))
    assert all(1 <= r["rank"] <= 3 for r in rows)


def test_keyword_proximity_single_bounded_exchange(spark, sf_dir):
    """The positional-tokens plan shuffles ONLY matched occurrences, once
    (groupBy doc id); the explode and term filter stay map-side."""
    from connapse_spark.operators.search import keyword_search_proximity

    df = keyword_search_proximity(_docs(spark, sf_dir), "table scan fast merge", k=10)
    plan = _plan(df)
    assert "Generate" in plan  # posexplode of the zipped token arrays
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    n_hash_exchanges = plan.count("Exchange hashpartitioning")
    assert n_hash_exchanges == 1, plan


def test_simhash_fingerprints_map_side_only(spark, sf_dir):
    """Fingerprinting is a pure projection: no hash exchange anywhere (the
    only exchange allowed is the final order-by range partitioning)."""
    from connapse_spark.operators.dedup import simhash_fingerprints

    plan = _plan(simhash_fingerprints(_docs(spark, sf_dir)))
    assert "Exchange hashpartitioning" not in plan


def test_markdown_sections_partitions_by_document_only(spark, sf_dir):
    """All window work in the native walker is keyed by document_id — no
    whole-frame (single-partition) window, no join."""
    from connapse_spark.operators.chunking import markdown_sections

    df = markdown_sections(
        _docs(spark, sf_dir).select("doc_id", F.col("text").alias("md")), text_col="md"
    )
    plan = _plan(df)
    assert "SinglePartition" not in plan
    assert "CartesianProduct" not in plan
    import re as _re

    for m in _re.finditer(r"Exchange hashpartitioning\(([^,]+)", plan):
        assert "document_id" in m.group(1)


def test_salted_join_matches_plain_join_and_spreads_key(spark):
    from connapse_spark.plans.skew import SALT_COL, salted_join, salt_expr

    probe = spark.createDataFrame(
        [(1, f"p{i}") for i in range(200)] + [(2, "q")],
        "k int, payload string",
    )
    build = spark.createDataFrame([(1, "hot"), (2, "cold")], "k int, attr string")
    out = salted_join(probe, build, "k", n_salts=8)
    plain = probe.join(build, "k")
    assert out.count() == plain.count() == 201
    assert sorted(out.columns) == sorted(plain.columns)
    # identical row multiset
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, plain.collect()))
    assert a == b
    # the hot key's rows really spread over multiple salts
    n_salts = (
        probe.select(salt_expr(8, F.col("payload")).alias(SALT_COL))
        .distinct()
        .count()
    )
    assert n_salts > 4
    # plan joins on (k, _salt): the salt is part of the join key
    plan = _plan(salted_join(probe, build, "k", n_salts=8))
    assert SALT_COL in plan


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    """Two tables bucketed on the join key must SortMergeJoin with ZERO
    Exchange — the paid-once-at-ingest co-location contract."""
    from connapse_spark.sources import sinks

    # warehouse.dir is a static conf — managed tables land in the default
    # warehouse and are dropped (files removed) in the finally block
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        docs = _docs(spark, sf_dir).select("doc_id", "source", "n_chars")
        emb = _emb(spark, sf_dir).select(F.col("vec_id").alias("doc_id"), "label")
        sinks.write_bucketed(docs, "b_docs", "doc_id", n_buckets=8, sort_col="doc_id")
        sinks.write_bucketed(emb, "b_emb", "doc_id", n_buckets=8, sort_col="doc_id")
        j = spark.table("b_docs").join(spark.table("b_emb"), "doc_id")
        plan = _plan(j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan  # bucketing replaces the shuffle
        assert j.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS b_docs")
        spark.sql("DROP TABLE IF EXISTS b_emb")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_top_event_types_single_hash_exchange(spark, sf_dir):
    """Pre-partitioning by the window alone lets the (window, type) groupBy
    AND the rank window share one exchange."""
    from connapse_spark.operators import events

    df = events.top_event_types(events.load_events(spark, sf_dir))
    plan = _plan(df)
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_salted_join_rejects_right_joins(spark):
    import pytest as _pytest

    from connapse_spark.plans.skew import salted_join

    probe = spark.createDataFrame([(1, "p")], "k int, payload string")
    build = spark.createDataFrame([(1, "b")], "k int, attr string")
    with _pytest.raises(ValueError, match="inner/left"):
        salted_join(probe, build, "k", how="full")


def test_seeded_ivf_full_probe_equals_exact_knn(spark, sf_dir):
    """nprobe = n_lists scans every list, so the seeded-IVF probe must
    reproduce the exact KNN top-k (ids AND scores) — the index is then a
    pure partitioning, not an approximation."""
    from connapse_spark.functions.embed import embed_py
    from connapse_spark.operators.search import vector_knn

    emb = _emb(spark, sf_dir)
    qv = embed_py("the quick brown fox", 64)
    index, centroids = ivf.build_ivf_index_seeded(emb, n_lists=4)
    approx = ivf.ann_ivf_topk(index, centroids, qv, k=5, nprobe=4).collect()
    exact = vector_knn(emb, qv, k=5).collect()
    assert [(r["id"], r["score"]) for r in approx] == [
        (r["vec_id"], r["score"]) for r in exact
    ]


def test_seeded_ivf_pruned_probe_scans_subset(spark, sf_dir):
    """nprobe < n_lists returns only rows from the probed lists."""
    from connapse_spark.functions.embed import embed_py

    emb = _emb(spark, sf_dir)
    qv = embed_py("the quick brown fox", 64)
    index, centroids = ivf.build_ivf_index_seeded(emb, n_lists=4)
    out = ivf.ann_ivf_topk(index, centroids, qv, k=50, nprobe=1).collect()
    assert len({r["list_id"] for r in out}) == 1


def test_ivf_upsert_routes_and_replaces(spark, sf_dir):
    """New vectors land in their nearest existing list with no refit; a
    re-upserted id replaces its old entry (LWW); untouched rows survive."""
    emb = _emb(spark, sf_dir)
    index, centroids = ivf.build_ivf_index_seeded(emb, n_lists=4)
    n0 = index.count()

    # one brand-new vector identical to seed 2 -> must land in list 2;
    # one replacement for an existing id with seed-3's vector -> moves lists
    seed2 = emb.filter(F.col("vec_id") == 2).collect()[0]["embedding"]
    seed3 = emb.filter(F.col("vec_id") == 3).collect()[0]["embedding"]
    victim = index.filter(F.col("list_id") != 3).select("id").orderBy(F.desc("id")).limit(1).collect()[0]["id"]
    new = spark.createDataFrame(
        [(10_000, [float(x) for x in seed2]), (victim, [float(x) for x in seed3])],
        "vec_id long, embedding array<double>",
    )
    merged = ivf.ivf_index_upsert(index, centroids, new)
    assert merged.count() == n0 + 1  # one insert, one replace
    got = {r["id"]: r["list_id"] for r in merged.filter(F.col("id").isin(10_000, victim)).collect()}
    assert got[10_000] == 2
    assert got[victim] == 3  # replaced embedding re-routed to list 3


def test_onepass_pool_single_lineage_no_corpus_rescan(spark, sf_dir):
    """hybrid_search_onepass is ONE linear lineage: each corpus table is
    scanned exactly once in the plan and nothing is persisted (round 2's
    persist+count leaked a cached RDD per call and scanned eagerly)."""
    import __spark_entry__ as entry

    df = entry.queries()["hybrid_onepass"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" not in plan
    assert plan.count("documents.parquet") == 1
    assert plan.count("embeddings.parquet") == 1


def test_hybrid_vector_index_full_probe_row_equal(spark, sf_dir):
    """hybrid_search(vector_index=…) at full probe must reproduce the
    brute-force hybrid exactly (ids, scores, sources) — the VectorIndex is
    a physical structure, like the posting-list keyword index."""
    docs = _docs(spark, sf_dir)
    emb = _emb(spark, sf_dir).select(F.col("vec_id").alias("id"), "embedding")
    opts = SearchOptions(top_k=10)
    brute = hybrid_search(docs, "the quick brown fox", opts, vectors=emb).collect()
    vidx = ivf.build_vector_index(emb, n_lists=4, nprobe=4, id_col="id", seeded=True)
    served = hybrid_search(
        docs, "the quick brown fox", opts, vector_index=vidx
    ).collect()
    assert [tuple(r) for r in served] == [tuple(r) for r in brute]


def test_hybrid_vector_index_probe_prunes_lists(spark, sf_dir):
    """Pruned probe: the semantic branch's candidates come only from the
    probed lists — every vector-sourced hit id must belong to a probed
    list, and the Semantic-mode plan must carry the list_id IN filter."""
    emb = _emb(spark, sf_dir).select(F.col("vec_id").alias("id"), "embedding")
    # persist = the deployed regime (the index is a written, list_id-
    # partitioned table, not a recomputed expression) — the probe filter
    # must then survive to the plan as a list_id pruning predicate
    vidx = ivf.build_vector_index(
        emb, n_lists=4, nprobe=1, id_col="id", seeded=True
    ).persist()
    qv = embed_py("the quick brown fox", 64)
    probed = set(ivf.probe_list_ids(vidx.centroids, qv, 1))
    docs = _docs(spark, sf_dir)
    out = hybrid_search(
        docs,
        "the quick brown fox",
        SearchOptions(top_k=10, mode="Semantic"),
        vector_index=vidx,
    )
    member = {
        r["id"]
        for r in vidx.index.filter(F.col("list_id").isin(list(probed))).collect()
    }
    assert {r["id"] for r in out.collect()} <= member
    assert "list_id" in _optimized(out)
    vidx.unpersist()


def test_hybrid_vector_index_respects_predicate(spark, sf_dir):
    """A docs-side predicate reaches the IVF candidate set as a semi-join:
    no hit may come from a filtered-out document."""
    docs = _docs(spark, sf_dir)
    emb = _emb(spark, sf_dir).select(F.col("vec_id").alias("id"), "embedding")
    vidx = ivf.build_vector_index(emb, n_lists=4, nprobe=4, id_col="id", seeded=True)
    pred = F.col("lang") == "en"
    out = hybrid_search(
        docs,
        "the quick brown fox",
        SearchOptions(top_k=10),
        predicate=pred,
        vector_index=vidx,
    ).collect()
    allowed = {r["doc_id"] for r in docs.filter(pred).select("doc_id").collect()}
    assert out and {r["id"] for r in out} <= allowed


def test_hybrid_many_fast_vector_index_full_probe_bit_equal(spark, sf_dir):
    """Batched fast tier with a full-probe VectorIndex is bit-equal to the
    brute fast tier: identical BLAS kernel over an identical candidate set
    (the whole corpus), regardless of how Arrow batches regroup rows."""
    from connapse_spark.operators.search import hybrid_search_many_fast

    docs = _docs(spark, sf_dir)
    emb = _emb(spark, sf_dir)
    corpus = docs.join(
        emb.select(F.col("vec_id").alias("doc_id"), "embedding"), "doc_id"
    )
    queries = [(0, "the quick brown fox"), (1, "hash join"), (2, "parquet scan")]
    brute = hybrid_search_many_fast(corpus, queries, top_k=5).collect()
    vidx = ivf.build_vector_index(
        emb.select(F.col("vec_id").alias("id"), "embedding"),
        n_lists=4,
        nprobe=4,
        id_col="id",
        seeded=True,
    )
    served = hybrid_search_many_fast(
        corpus, queries, top_k=5, vector_index=vidx
    ).collect()
    assert [tuple(r) for r in served] == [tuple(r) for r in brute]


def test_hybrid_many_fast_vector_index_pruned_matches_single_query(spark, sf_dir):
    """Pruned batched probe must reproduce the single-query IVF-served
    hybrid per qid: same per-query probe sets, same candidates, same
    rankings (scores are BLAS-vs-fold so compare ids + order)."""
    from connapse_spark.operators.search import hybrid_search_many_fast

    docs = _docs(spark, sf_dir)
    emb = _emb(spark, sf_dir)
    corpus = docs.join(
        emb.select(F.col("vec_id").alias("doc_id"), "embedding"), "doc_id"
    )
    vidx = ivf.build_vector_index(
        emb.select(F.col("vec_id").alias("id"), "embedding"),
        n_lists=4,
        nprobe=1,
        id_col="id",
        seeded=True,
    )
    queries = [(0, "the quick brown fox"), (1, "hash join")]
    batched = hybrid_search_many_fast(
        corpus, queries, top_k=5, vector_index=vidx
    ).collect()
    for qid, qtext in queries:
        single = hybrid_search(
            docs, qtext, SearchOptions(top_k=5), vector_index=vidx
        ).collect()
        got = [r["doc_id"] for r in batched if r["qid"] == qid]
        assert got == [r["id"] for r in single]


def test_written_vector_index_probe_prunes_partitions(spark, sf_dir, tmp_path):
    """The deployed serving path: a VectorIndex written through the
    (model_id, list_id)-partitioned layout and reopened must (a) answer the
    IVF-served hybrid identically to the in-memory index, and (b) show the
    probe's list filter as a PartitionFilter in the scan — disk-level
    pruning, the pgvector-ivfflat property the 100 TB design claims."""
    docs = _docs(spark, sf_dir)
    emb = _emb(spark, sf_dir).select(F.col("vec_id").alias("id"), "embedding")
    vidx = ivf.build_vector_index(emb, n_lists=4, nprobe=2, id_col="id", seeded=True)
    path = str(tmp_path / "vidx")
    ivf.write_vector_index(vidx, path)
    stored = ivf.load_vector_index(spark, path, nprobe=2)
    mem = hybrid_search(
        docs, "the quick brown fox", SearchOptions(top_k=10), vector_index=vidx
    ).collect()
    out = hybrid_search(
        docs, "the quick brown fox", SearchOptions(top_k=10), vector_index=stored
    )
    assert [tuple(r) for r in out.collect()] == [tuple(r) for r in mem]
    sem = hybrid_search(
        docs,
        "the quick brown fox",
        SearchOptions(top_k=10, mode="Semantic"),
        vector_index=stored,
    )
    assert re.search(r"PartitionFilters: \[.*list_id.*\]", _plan(sem))


def test_vector_index_manager_routes_per_model(spark):
    """VectorColumnManager parity: one partial index per model that meets
    the min-rows guard; under-threshold models serve brute-force with
    identical answers; full probe reproduces the brute KNN per model."""
    import random

    rng = random.Random(7)
    rows = [
        (i, "big", [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)
    ] + [(100 + i, "tiny", [rng.uniform(-1, 1) for _ in range(8)]) for i in range(3)]
    vecs = spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<double>"
    )
    mgr = ivf.VectorIndexManager(min_rows=10, nprobe=99, seeded=True).ensure(vecs)
    assert set(mgr.indexes) == {"big"} and mgr.skipped == {"tiny": 3}
    status = dict((m, built) for m, built, _ in mgr.status())
    assert status == {"big": True, "tiny": False}
    qv = [0.3] * 8
    for model in ("big", "tiny"):
        got = mgr.knn(vecs, model, qv, k=5).collect()
        brute = vector_knn(
            vecs.filter(F.col("label") == model), qv, k=5, id_col="vec_id"
        ).collect()
        assert [(r["id"], r["score"]) for r in got] == [
            (r["vec_id"], r["score"]) for r in brute
        ]


def test_maybe_rebuild_index_fires_only_on_drift(spark):
    """Fresh index over its own build set → no rebuild (the gauge reads
    ~0 reassign_frac); after replacing the corpus with vectors clustered
    far from the stored lists, the gauge crosses the threshold and the
    refit index assigns the NEW distribution coherently."""
    import random

    rng = random.Random(11)

    def cloud(center, n, start_id):
        return [
            (start_id + i, [center + rng.uniform(-0.05, 0.05) for _ in range(8)])
            for i in range(n)
        ]

    base = spark.createDataFrame(
        cloud(1.0, 40, 0) + cloud(-1.0, 40, 100),
        "vec_id long, embedding array<double>",
    )
    vidx = ivf.build_vector_index(base, n_lists=2, nprobe=2)
    rebuilt, same = ivf.maybe_rebuild_index(vidx, base, threshold=0.2, dims=8)
    assert not rebuilt and same is vidx

    # drift: scramble the stored assignment (list = id parity — random
    # with respect to direction) so each refreshed list mean is a noisy
    # mixture and roughly half the vectors prefer the other list; the
    # gauge MUST cross the 5% threshold and fire the rebuild
    scrambled = ivf.VectorIndex(
        index=vidx.index.withColumn(
            "list_id", F.pmod(F.col("id"), F.lit(2)).cast("int")
        ),
        centroids=vidx.centroids,
        nprobe=2,
    )
    rebuilt2, fresh = ivf.maybe_rebuild_index(scrambled, base, threshold=0.05, dims=8)
    assert rebuilt2 and fresh is not scrambled
    # the refit covers the full corpus: every vector routed to a list
    assert fresh.index.count() == base.count()

    # growth trigger: a 1-list index over a corpus the lists policy sizes
    # bigger must rebuild even though a single candidate centroid can
    # never report drift
    one_list = ivf.VectorIndex(
        index=vidx.index.withColumn("list_id", F.lit(0)),
        centroids=vidx.centroids.limit(1),
        nprobe=2,
    )
    rebuilt3, _ = ivf.maybe_rebuild_index(
        one_list, base, threshold=0.99, dims=8, n_rows=5000
    )
    assert rebuilt3  # ivf_n_lists(5000)=5 > 1 stored list


def test_write_vector_index_is_per_model(spark, sf_dir, tmp_path):
    """Two models written to ONE path must coexist: dynamic partition
    overwrite replaces only the written model's partitions, and each
    reload gets its own index rows AND its own centroids — a second
    model's write must not clobber the first (the one-path-per-model
    layout VectorIndexManager documents)."""
    emb = _emb(spark, sf_dir).select(F.col("vec_id").alias("id"), "embedding")
    a = ivf.build_vector_index(emb, n_lists=4, nprobe=2, id_col="id", seeded=True)
    b = ivf.build_vector_index(
        emb.limit(30), n_lists=2, nprobe=2, id_col="id", seeded=True
    )
    path = str(tmp_path / "multi")
    ivf.write_vector_index(a, path, model_id="model-a")
    ivf.write_vector_index(b, path, model_id="model-b")
    ra = ivf.load_vector_index(spark, path, model_id="model-a", nprobe=2)
    rb = ivf.load_vector_index(spark, path, model_id="model-b", nprobe=2)
    assert ra.index.count() == a.index.count() > 0
    assert rb.index.count() == b.index.count() > 0
    assert ra.centroids.count() == 4 and rb.centroids.count() == 2
    # re-write model-b alone: model-a untouched
    ivf.write_vector_index(b, path, model_id="model-b")
    assert ivf.load_vector_index(spark, path, model_id="model-a").index.count() == a.index.count()
    # shrinking rebuild: re-writing model-a with FEWER lists must prune the
    # stale list partitions (dynamic overwrite alone would leave them
    # serving deleted data)
    ivf.write_vector_index(b, path, model_id="model-a")
    ra2 = ivf.load_vector_index(spark, path, model_id="model-a", nprobe=2)
    assert ra2.index.count() == b.index.count()
    assert {r["list_id"] for r in ra2.index.select("list_id").distinct().collect()} == {
        r["list_id"] for r in b.index.select("list_id").distinct().collect()
    }


def test_link_edges_and_robots_gate_are_map_side_only(spark, sf_dir):
    """The web-front per-row operators add no exchange of any kind: href
    extraction and the robots gate ride the scan (100 TB = add executors)."""
    from pyspark.sql import functions as F

    from connapse_spark.operators.links import link_edges
    from connapse_spark.operators.robots import robots_filter

    pages = _docs(spark, sf_dir).select(
        F.concat(F.lit("https://e/"), F.col("doc_id").cast("string")).alias("url"),
        F.col("text"),
    )
    assert "Exchange" not in _plan(link_edges(pages))
    gated = robots_filter(pages.select("url"), {"e": "User-agent: *\nDisallow: /x\n"})
    assert "Exchange" not in _plan(gated)


def test_domain_edges_single_aggregation_exchange(spark, sf_dir):
    """Domain-graph rollup = map-side partial agg + ONE hash exchange on the
    (src_domain, dst_domain) key."""
    from pyspark.sql import functions as F

    from connapse_spark.operators.links import domain_edges

    edges = _docs(spark, sf_dir).select(
        F.concat(F.lit("https://a.com/"), F.col("doc_id").cast("string")).alias("src"),
        F.lit("https://b.co.uk/x").alias("dst"),
    )
    plan = _plan(domain_edges(edges))
    assert plan.count("Exchange hashpartitioning") == 1


def test_ivf_lists_policy_seam():
    """The reference clamp stays default; sqrt is the corpus-scale opt-in
    (VERDICT r6 ask #6): they agree at 10^4, diverge 30x+ past 10^7, and
    sqrt caps at the 65536 centroid-broadcast bound."""
    # reference policy: clamp(rows/1000, 1, 100)
    assert ivf.ivf_n_lists(500) == 1
    assert ivf.ivf_n_lists(50_000) == 50
    assert ivf.ivf_n_lists(10**11) == 100
    # sqrt policy
    assert ivf.ivf_n_lists(10_000, policy="sqrt") == 100  # crossover point
    assert ivf.ivf_n_lists(10**7, policy="sqrt") == 3162
    assert ivf.ivf_n_lists(10**11, policy="sqrt") == 65536  # capped
    assert ivf.ivf_n_lists(0, policy="sqrt") == 1
    import pytest as _pytest
    with _pytest.raises(ValueError):
        ivf.ivf_n_lists(10, policy="golden")


def test_ivf_build_honors_lists_policy(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    # sqrt policy at this n gives more lists than the reference clamp
    idx_ref, cents_ref = ivf.build_ivf_index(emb, n_rows=n)
    idx_sq, cents_sq = ivf.build_ivf_index(emb, n_rows=n, lists_policy="sqrt")
    n_ref, n_sq = cents_ref.count(), cents_sq.count()
    assert n_ref == ivf.ivf_n_lists(n)
    assert n_sq == ivf.ivf_n_lists(n, policy="sqrt")
    assert n_sq > n_ref
    # every vector still lands in exactly one list
    assert idx_sq.count() == n


def test_ivf_recall_curve_pinned(spark):
    """r9 (VERDICT r8 ask #3): the recall@10 curve vs nprobe is a
    deterministic function of the seeded build + seeded queries — pinned
    with tolerance at sf0.01 so a probe-math regression is visible, and
    full probe must be EXACT (recall 1.0, no tolerance). The sf1 decade
    of the same measurement lives in SCALING.md (tools/ann_recall.py)."""
    from tools.ann_recall import recall_curve

    curve, n = recall_curve(spark, "/root/testdata/sf0.01", n_lists=8, n_queries=10)
    assert n == 500
    assert curve[8] == 1.0                 # full probe == exact, bit-for-bit
    assert abs(curve[1] - 0.25) < 0.05     # measured 0.25
    assert abs(curve[3] - 0.55) < 0.05     # measured 0.55 (√8 rounds to 3)
    assert curve[1] < curve[3] < curve[8]  # monotone in nprobe


def test_textstats_hof_stats_materialized_once(spark, sf_dir):
    """r11 §9: the interpreted HOF stats (per-language filter() fracs, the
    mean-length fold, array_intersect greatest()) are materialized through
    a projection boundary and the argmax/rules derive from the columns —
    the before-plans carried 228 filter( occurrences in language_id_multi
    (each an O(tokens) interpreted pass per row) and 42 array_intersect(
    in gopher_filter_multi. Pins that CollapseProject does not re-inline
    the boundary (which would silently restore the blow-up)."""
    from connapse_spark.operators import textstats

    docs = _docs(spark, sf_dir)
    lang_plan = _plan(textstats.language_id_multi(docs))
    n_langs = len(textstats.LANG_STOPWORDS)
    # one filter() per language, +1 for tolerance of plan-print duplication
    assert lang_plan.count("filter(") <= 2 * (n_langs + 1), lang_plan.count("filter(")

    gopher_plan = _plan(textstats.gopher_filter_multi(docs))
    assert gopher_plan.count("array_intersect(") <= 2 * (n_langs + 1)
    assert gopher_plan.count("aggregate(") <= 2  # the mean-length fold, once


def test_explode_sites_do_not_reinfer_tokenizing_filters(spark, sf_dir):
    """r11 §12: explodes over expression-derived arrays use explode_outer +
    an isnotnull on the GENERATED attribute — a plain explode triggers
    InferFiltersFromGenerate (size(arr)>0 under the Generate), and
    predicate pushdown substitutes the array expression through the
    projection, re-running the full tokenizer per row in the inferred
    Filter. Pins that no plan carries the tokenizer more than twice
    (once per scan branch); a revert to plain explode doubles the count."""
    from connapse_spark.operators import dedup, keyword_index, textstats
    from connapse_spark.functions.text import tokens_exact_expr

    docs = _docs(spark, sf_dir)
    # the tokenizer's regex signature in plan text
    SIG = "regexp_replace(lower"

    tok_tbl = keyword_index.build_token_table(docs)
    assert _plan(keyword_index.build_tf_postings(tok_tbl)).count(SIG) <= 2
    assert _plan(keyword_index.build_positions_postings(tok_tbl)).count(SIG) <= 2
    assert _plan(dedup.contamination_check(docs, docs.select(
        F.explode(tokens_exact_expr(F.col("text"))).alias("s")
    ))).count(SIG) <= 4  # corpus side 2 (probe + id base), blocklist side 2
    # tree-form printing shows the generator expression in the Generate
    # node as well as its child projection — 2 prints, 1 evaluation; the
    # pre-fix plan carried a third copy in the inferred Filter
    assert _plan(textstats.unigram_model(docs)).count(SIG) <= 2


def test_keyword_scan_filters_do_not_duplicate_scoring(spark, sf_dir):
    """r11 §12: the scan tiers' score>0 cut runs AFTER the top-k Limit
    (keyword_search, keyword_search_bm25) or gates on the materialized occ
    column (proximity), and websearch's match gate binds the token arrays
    at the filter site — the previous shapes pushed the full scoring
    expression through the projection and evaluated it twice per row
    (keyword_websearch's pushed-down match carried ~11 tokenizer copies)."""
    from connapse_spark.operators import search

    docs = _docs(spark, sf_dir)
    SIG = "regexp_replace(lower"
    assert _plan(search.keyword_search(docs, "merge join")).count(SIG) <= 1
    assert _plan(
        search.keyword_search_websearch(docs, '"hash join" or merge -scan')
    ).count(SIG) <= 2
    prox = _plan(search.keyword_search_proximity(docs, "hash join"))
    assert prox.count(SIG) <= 1
    # r11 §13: facets' match cut lives inside the aggregates; a pre-group
    # filter would push through and re-tokenize
    facets = _plan(search.keyword_facets(docs, "hash join", "lang"))
    assert facets.count(SIG) <= 1


def test_phrase_kernel_occ_filter_is_attribute_only(spark, sf_dir):
    """r11 §16: phrase_occurrences_both computes occ_e/occ_s INSIDE the
    aggregate's result expressions (collected list bound once), so the
    occ>0 cut above it filters plain attributes. The previous shape
    derived occ in a select above the aggregate — predicate pushdown
    rewrote the cut through the projection and the Filter node carried
    the entire shifted-intersection + greedy-fold chain (a ~10 KB pushed
    condition, the whole kernel evaluated twice per grouped row)."""
    from connapse_spark.operators import keyword_index

    docs = _docs(spark, sf_dir)
    tok_tbl = keyword_index.build_token_table(docs)
    ppe = keyword_index.build_positions_postings(tok_tbl, "tokens_exact")
    pps = keyword_index.build_positions_postings(tok_tbl, "tokens_stemmed")
    out = keyword_index.keyword_search_many_phrase_indexed(
        ppe, pps, [(1, '"table hash"'), (2, '"customer join"')], k=5
    )
    plan = _plan(out)
    # the intersect fold appears once per config in the aggregate's result
    # projection; a pushdown revert duplicates it into a Filter condition
    assert plan.count("array_intersect(") <= 2, plan
    for line in plan.splitlines():
        if "Filter " in line:
            assert "array_intersect(" not in line, line
