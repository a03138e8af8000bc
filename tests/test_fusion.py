"""Fusion micro-fixtures (FIXTURES.md; mirrors HybridSearchFusionTests.cs):
known hit lists → expected merge/tag/ordering behavior for CC, DBSF, and
AutoCut."""

import pytest
from pyspark.sql import functions as F

from connapse_spark.operators.search import auto_cut, fuse


def _hits(spark, rows):
    return spark.createDataFrame(rows, ["id", "score"]).select(
        "id", F.col("score").cast("double")
    )


VEC = [("c1", 0.9), ("c2", 0.8), ("c3", 0.7)]
KW = [("c2", 0.95), ("c4", 0.85), ("c5", 0.75)]


def test_cc_merge_and_tags(spark):
    out = fuse(_hits(spark, VEC), _hits(spark, KW), alpha=0.5).collect()
    by_id = {r["id"]: r for r in out}
    assert len(by_id) == 5
    assert by_id["c2"]["source"] == "both"
    assert by_id["c1"]["source"] == "vector"
    assert by_id["c4"]["source"] == "keyword"
    # c2 wins: present in both lists
    top = max(out, key=lambda r: r["score"])
    assert top["id"] == "c2"


def test_cc_alpha_extremes(spark):
    v, k = _hits(spark, VEC), _hits(spark, KW)
    out1 = {r["id"]: r["score"] for r in fuse(v, k, alpha=1.0).collect()}
    assert out1["c1"] > out1["c4"]  # keyword-only ids score 0 at alpha=1
    assert out1["c4"] == 0.0
    out0 = {r["id"]: r["score"] for r in fuse(v, k, alpha=0.0).collect()}
    assert out0["c2"] > out0["c1"]
    assert out0["c1"] == 0.0


def test_cc_empty_keyword_side(spark):
    v = _hits(spark, VEC)
    k = spark.createDataFrame([], "id string, score double")
    out = fuse(v, k, alpha=0.5).collect()
    assert {r["id"] for r in out} == {"c1", "c2", "c3"}
    assert all(r["source"] == "vector" for r in out)


def test_scores_in_unit_range(spark):
    for method in ("ConvexCombination", "Dbsf"):
        out = fuse(_hits(spark, VEC), _hits(spark, KW), 0.5, method).collect()
        for r in out:
            assert 0.0 <= r["score"] <= 1.0


def test_dbsf_outlier_robustness(spark):
    vec = [("c1", 100.0), ("c2", 0.8), ("c3", 0.7)]
    out = {r["id"]: r["vector_score"] for r in fuse(_hits(spark, vec), _hits(spark, KW), 0.5, "Dbsf").collect()}
    # min-max would crush c2,c3 to ~0.001; DBSF must keep them meaningfully > 0.05
    assert out["c2"] > 0.05
    assert out["c3"] > 0.05


def test_autocut_cuts_dominant_gap(spark):
    hits = _hits(spark, [("a", 0.95), ("b", 0.94), ("c", 0.93), ("d", 0.5), ("e", 0.49)])
    out = auto_cut(hits).collect()
    assert {r["id"] for r in out} == {"a", "b", "c"}


def test_autocut_keeps_even_spacing(spark):
    hits = _hits(spark, [("a", 0.9), ("b", 0.8), ("c", 0.7), ("d", 0.6), ("e", 0.5)])
    out = auto_cut(hits).collect()
    assert len(out) == 5


def test_autocut_never_cuts_three_or_fewer(spark):
    hits = _hits(spark, [("a", 0.9), ("b", 0.2), ("c", 0.1)])
    out = auto_cut(hits).collect()
    assert len(out) == 3


# ---------------------------------------------------------------------------
# Q3 websearch query parsing (websearch_to_tsquery analogue)
# ---------------------------------------------------------------------------


def test_parse_websearch_phrase_negation_or():
    from connapse_spark.operators.search import parse_websearch

    groups = parse_websearch('"table scan" fast -merge OR "fast merge"')
    assert len(groups) == 2
    g1, g2 = groups
    assert [t.tokens for t in g1] == [["table", "scan"], ["fast"], ["merge"]]
    assert [t.negated for t in g1] == [False, False, True]
    assert [t.phrase for t in g1] == [True, False, False]
    assert len(g2) == 1 and g2[0].tokens == ["fast", "merge"] and g2[0].phrase


def test_parse_websearch_hyphen_compound_is_phrase():
    from connapse_spark.operators.search import parse_websearch

    groups = parse_websearch("fast-merge")
    assert groups == [groups[0]]
    assert groups[0][0].tokens == ["fast", "merge"] and groups[0][0].phrase


def test_parse_websearch_negated_phrase_and_lone_or():
    from connapse_spark.operators.search import parse_websearch

    groups = parse_websearch('-"bad phrase" good')
    (g,) = groups
    assert g[0].negated and g[0].phrase and g[0].tokens == ["bad", "phrase"]
    # leading/trailing OR collapses, case-insensitive
    assert len(parse_websearch("or apples OR")) == 1
    assert parse_websearch("") == []
    assert parse_websearch("  -  ") == []


def test_websearch_search_filters_negation(spark):
    from connapse_spark.operators.search import keyword_search_websearch

    docs = spark.createDataFrame(
        [
            (1, "the table scan is fast today"),
            (2, "the table scan needs a merge pass"),
            (3, "a fast merge finished"),
            (4, "nothing relevant here"),
        ],
        "doc_id int, text string",
    )
    out = keyword_search_websearch(docs, '"table scan" fast -merge OR "fast merge"', k=10)
    ids = {r["doc_id"] for r in out.collect()}
    # doc1: phrase + fast, no merge -> in. doc2: has merge -> excluded from
    # group1 and no "fast merge" phrase -> out. doc3: phrase "fast merge" -> in.
    assert ids == {1, 3}


def test_proximity_ranks_adjacent_above_scattered(spark):
    from connapse_spark.operators.search import (
        keyword_search,
        keyword_search_proximity,
    )

    docs = spark.createDataFrame(
        [
            # identical term frequencies; only adjacency differs
            (1, "the index rebuild ran overnight and x y z w v u finished ok"),
            (2, "the index ran overnight and x y z w v u rebuild finished ok"),
            (3, "nothing relevant here"),
        ],
        "doc_id int, text string",
    )
    flat = {r["doc_id"]: r["score"] for r in keyword_search(docs, "index rebuild", k=10).collect()}
    prox = {r["doc_id"]: r["score"] for r in keyword_search_proximity(docs, "index rebuild", k=10).collect()}
    assert flat[1] == flat[2]  # TF alone cannot tell them apart
    assert prox[1] > prox[2] > 0.0  # adjacency earns the cover bonus
    assert 3 not in prox


def test_proximity_single_term_matches_flat(spark):
    from connapse_spark.operators.search import (
        keyword_search,
        keyword_search_proximity,
    )

    docs = spark.createDataFrame(
        [(1, "merge twice merge"), (2, "no hits")], "doc_id int, text string"
    )
    flat = keyword_search(docs, "merge", k=10).collect()
    prox = keyword_search_proximity(docs, "merge", k=10).collect()
    assert [(r["doc_id"], r["score"]) for r in flat] == [
        (r["doc_id"], r["score"]) for r in prox
    ]


def test_neardup_components_clusters_pairs(spark):
    from connapse_spark.operators.dedup import neardup_components

    # component A: path 1-2-3-4 (forces multi-round propagation);
    # component B: triangle 10-11-12; isolated pair 20-21
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "id_a long, id_b long",
    )
    out = {r["id"]: r["component"] for r in neardup_components(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_deterministic_sample_stable_under_repartition(spark):
    from connapse_spark.operators.sampling import deterministic_sample, split_expr

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    s1 = {r["doc_id"] for r in deterministic_sample(df, 0.3, "doc_id").collect()}
    s2 = {
        r["doc_id"]
        for r in deterministic_sample(df.repartition(17), 0.3, "doc_id").collect()
    }
    assert s1 == s2  # pure row function: partitioning cannot change the set
    assert 0.25 < len(s1) / 2000 < 0.35
    # split is independent of the sample (different salt) and exhaustive
    splits = df.select(
        split_expr(F.col("doc_id").cast("string"), 0.1).alias("split")
    ).groupBy("split").count().collect()
    by = {r["split"]: r["count"] for r in splits}
    assert 0.05 < by["test"] / 2000 < 0.15 and by["train"] + by["test"] == 2000


def test_pack_sequences_concat_and_chop(spark):
    from connapse_spark.operators.sampling import pack_sequences

    rows = [("s", i, n) for i, n in enumerate([60, 60, 100, 10, 250])]
    df = spark.createDataFrame(rows, "source string, doc_id long, n long")
    out = {r["doc_id"]: r for r in pack_sequences(df, 100, "source", "doc_id", "n").collect()}
    # stream offsets: 0, 60, 120, 220, 230
    assert [out[i]["start_tok"] for i in range(5)] == [0, 60, 120, 220, 230]
    assert (out[0]["seq_first"], out[0]["seq_last"]) == (0, 0)
    assert (out[1]["seq_first"], out[1]["seq_last"]) == (0, 1)  # straddles
    assert (out[2]["seq_first"], out[2]["seq_last"]) == (1, 2)
    assert (out[3]["seq_first"], out[3]["seq_last"]) == (2, 2)
    assert (out[4]["seq_first"], out[4]["seq_last"]) == (2, 4)  # spans 3 seqs
    assert out[4]["offset_in_seq"] == 30


def test_repetition_stats_flags_boilerplate(spark):
    from connapse_spark.operators.textstats import repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),
            (2, "all words here are fully distinct tokens"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert out[1]["top_token_ratio"] == 1.0
    assert out[1]["top_bigram_ratio"] == 1.0
    assert out[2]["top_token_ratio"] < 0.2
    assert out[2]["top_bigram_ratio"] < 0.2


def test_contamination_flags_ngram_overlap(spark):
    from connapse_spark.operators.dedup import contamination_check

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "a completely unrelated sentence lives here now"),
            (3, "nothing shared with that quick brown fox run"),
        ],
        "doc_id long, text string",
    )
    bl = spark.createDataFrame([("quick brown fox",)], "s string")
    out = {r["id"]: r for r in contamination_check(docs, bl, n=3).collect()}
    assert out[1]["contaminated"] and out[1]["n_hits"] == 1
    assert not out[2]["contaminated"] and out[2]["n_hits"] == 0
    assert out[3]["contaminated"]  # shares the blocked 3-gram
    assert len(out) == 3  # clean docs keep their row


def test_redact_pii_scrubs_and_counts(spark):
    from connapse_spark.operators.textstats import redact_pii

    docs = spark.createDataFrame(
        [
            (1, "mail a.b+c@test.org and 10.1.2.3 and +4912345678 done"),
            (2, "no pii in this row"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in redact_pii(docs).collect()}
    assert out[1]["redacted"] == "mail <EMAIL> and <IP> and <PHONE> done"
    assert (out[1]["n_email"], out[1]["n_ipv4"], out[1]["n_phone"]) == (1, 1, 1)
    assert out[2]["redacted"] == "no pii in this row"
    assert out[2]["n_email"] == 0


def test_language_id_multi_argmax(spark):
    from connapse_spark.operators.textstats import language_id_multi

    docs = spark.createDataFrame(
        [
            (1, "the cat is on the mat and it was good for him"),
            (2, "der hund ist nicht mit der katze auf der wiese"),
            (3, "le chat est dans la maison avec les enfants du village"),
            (4, "xyzzy qwerty plugh"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["lang_pred"] for r in language_id_multi(docs).collect()}
    assert out[1] == "en" and out[2] == "de" and out[3] == "fr"
    assert out[4] == "unknown"


def test_language_id_script_classes(spark):
    from connapse_spark.operators.textstats import language_id_multi

    docs = spark.createDataFrame(
        [
            (1, "日本語のテキストです。漢字も混ざる。"),   # kana+Han → ja
            (2, "这是中文文本没有假名只有汉字"),            # pure Han → zh
            (3, "한국어 텍스트 언어 감지"),                 # Hangul → ko
            (4, "Это русский текст для проверки"),          # Cyrillic → ru
            (5, "هذا نص عربي للاختبار"),                    # Arabic → ar
            (6, "mostly english text with 中 one ideograph"),  # below threshold
            (7, "il di che per non sono come anche della nel"),  # it stopwords
            (8, "de que em para com uma os dos das mais"),       # pt
            (9, "de het een van dat niet op voor met zijn"),     # nl
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in language_id_multi(docs).collect()}
    assert [out[i]["lang_pred"] for i in range(1, 6)] == ["ja", "zh", "ko", "ru", "ar"]
    assert out[6]["lang_pred"] == "en"  # one ideograph must not flip it
    assert [out[i]["lang_pred"] for i in (7, 8, 9)] == ["it", "pt", "nl"]
    # script fractions are real fractions of non-whitespace chars
    assert out[2]["frac_sc_han"] == 1.0
    assert 0 < out[1]["frac_sc_kana"] < 1 and out[1]["frac_sc_han"] > 0


def test_gopher_filter_multi_routes_languages(spark):
    """r8: the stopword rule routes by best-matching language list or
    script fraction — fluent non-English text passes where the
    English-only gate drops it; gibberish still fails."""
    from connapse_spark.operators.textstats import gopher_filter, gopher_filter_multi

    docs = spark.createDataFrame(
        [
            (1, "der hund ist nicht mit der katze auf der wiese und das haus"),
            (2, "Это русский текст для проверки качества письма и чтения слов"),
            (3, "数据库查询优化与快速表扫描测试系统性能分析处理引擎高效执行"),
            (4, "zxqv qwerty plugh xyzzy blorp frobnicate wibble wobble flux"),
            (5, "the cat is on the mat and it was good for him to rest there"),
        ],
        "doc_id long, text string",
    )
    multi = {r["doc_id"]: r for r in gopher_filter_multi(docs, min_tokens=8).collect()}
    mono = {r["doc_id"]: r for r in gopher_filter(docs, min_tokens=8).collect()}
    assert multi[1]["rule_stopwords"] and not mono[1]["rule_stopwords"]  # de list
    assert multi[2]["rule_stopwords"] and not mono[2]["rule_stopwords"]  # cyrillic script
    assert multi[3]["rule_stopwords"] and not mono[3]["rule_stopwords"]  # han script
    assert not multi[4]["rule_stopwords"]                                # gibberish fails
    assert multi[5]["rule_stopwords"] and mono[5]["rule_stopwords"]      # en unchanged
    assert multi[2]["script_frac_max"] > 0.9 and multi[3]["n_tokens"] > 8


def test_rrf_rank_only_and_tags(spark):
    from connapse_spark.operators.search import fuse_rrf

    out = fuse_rrf(_hits(spark, VEC), _hits(spark, KW)).collect()
    by_id = {r["id"]: r for r in out}
    assert len(by_id) == 5
    # c2 is rank 1 keyword + rank 2 vector -> highest RRF mass
    assert max(out, key=lambda r: r["score"])["id"] == "c2"
    assert by_id["c2"]["source"] == "both"
    assert by_id["c1"]["source"] == "vector" and by_id["c1"]["keyword_rank"] == 0
    assert abs(by_id["c2"]["score"] - (1 / 62 + 1 / 61)) < 1e-12
    # rank-only: scaling one branch's scores by 1000x changes nothing
    scaled = _hits(spark, [(i, s * 1000) for i, s in VEC])
    out2 = {r["id"]: r["score"] for r in fuse_rrf(scaled, _hits(spark, KW)).collect()}
    assert all(abs(out2[i] - by_id[i]["score"]) < 1e-12 for i in by_id)


def test_bm25_idf_and_length_normalization(spark):
    from connapse_spark.operators.search import keyword_search_bm25

    filler = " ".join(["filler"] * 40)
    docs = spark.createDataFrame(
        [
            (1, "index rebuild finished"),             # both terms, short doc
            (2, f"index rebuild finished {filler}"),   # both terms, long doc
            (3, "index maintenance window"),            # common term only
            (4, "nothing relevant here"),
            (5, "index of topics"),
        ],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r["score"] for r in keyword_search_bm25(docs, "index rebuild", k=10).collect()}
    assert 4 not in out                    # zero-score rows are dropped
    assert out[1] > out[2]                 # length normalization: short doc wins
    assert out[2] > out[3]                 # rare term (rebuild) outweighs common (index)
    assert out[3] > 0.0 and out[5] > 0.0   # idf stays non-negative (Lucene form)


def test_line_dedup_strips_boilerplate_preserves_order(spark):
    from connapse_spark.operators.dedup import line_dedup

    boiler = "subscribe to our newsletter"
    docs = spark.createDataFrame(
        [
            (1, f"alpha unique\n{boiler}\nbeta closing"),
            (2, f"{boiler}\ngamma body"),
            (3, f"delta intro\n{boiler}"),
            (4, "   \nepsilon only\n   "),  # whitespace segments never removed
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in line_dedup(docs, min_docs=3).collect()}
    assert out[1]["clean_text"] == "alpha unique\nbeta closing"
    assert out[1]["n_segments"] == 3 and out[1]["n_removed"] == 1
    assert out[2]["clean_text"] == "gamma body"
    assert out[3]["clean_text"] == "delta intro"
    assert out[4]["clean_text"] == "   \nepsilon only\n   "
    assert out[4]["n_removed"] == 0


def test_tfidf_rare_term_outranks_common(spark):
    from connapse_spark.operators.textstats import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "shared shared shared zebra"),
            (2, "shared words here"),
            (3, "shared words again"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(docs, k=2).collect()
    doc1 = [r for r in out if r["doc_id"] == 1]
    # zebra: tf=1 df=1 -> ln(3); shared: tf=3 df=3 -> 0. zebra must lead.
    top1 = max(doc1, key=lambda r: r["score"])
    assert top1["term"] == "zebra" and top1["df"] == 1
    shared = [r for r in out if r["term"] == "shared"]
    assert all(r["score"] == 0.0 for r in shared)
    assert all(len([r for r in out if r["doc_id"] == d]) <= 2 for d in (1, 2, 3))


def test_cluster_assign_seeds_map_to_self(spark):
    from connapse_spark.operators.similarity import cluster_assign, cluster_sizes

    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0]),
        (2, [0.9, 0.1, 0.0]),   # near seed 0
        (3, [0.0, 2.0, 0.1]),   # near seed 1
        (4, [1.0, 0.0, 0.0]),   # exact tie with seed 0 direction
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in cluster_assign(emb, k=2).collect()}
    assert out[0]["cluster"] == 0 and abs(out[0]["score"] - 1.0) < 1e-12
    assert out[1]["cluster"] == 1
    assert out[2]["cluster"] == 0
    assert out[3]["cluster"] == 1
    assert out[4]["cluster"] == 0  # tie -> lowest cluster id
    sizes = {r["cluster"]: r["n_vectors"] for r in cluster_sizes(emb, k=2).collect()}
    assert sizes == {0: 3, 1: 2}


def test_gopher_filter_rules_and_keep(spark):
    from connapse_spark.operators.textstats import gopher_filter

    good = (
        "the quick brown fox jumps over a lazy dog and then runs far away "
        "while birds watch from tall trees near this quiet river valley as "
        "morning light spreads slowly across wide green fields of wheat"
    )
    docs = spark.createDataFrame(
        [
            (1, good),                       # passes everything
            (2, "short text only"),          # fails length
            (3, "spam " * 60),               # fails diversity + stopwords
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in gopher_filter(docs, min_tokens=30).collect()}
    assert out[1]["keep"] is True
    assert out[2]["keep"] is False and out[2]["rule_length"] is False
    assert out[3]["keep"] is False
    assert out[3]["rule_diversity"] is False and out[3]["rule_stopwords"] is False
    assert out[3]["rule_length"] is True  # 60 tokens: length alone is fine


def test_token_entropy_uniform_beats_repetitive(spark):
    import math

    from connapse_spark.operators.textstats import token_entropy

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),      # uniform: ln(4)
            (2, "a a a a"),      # degenerate: 0
            (3, "a a a b"),      # skewed: between
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["entropy"] for r in token_entropy(docs).collect()}
    assert abs(out[1] - math.log(4)) < 1e-9
    assert out[2] == 0.0
    assert 0.0 < out[3] < out[1]


def test_onepass_matches_two_branch_hybrid(spark):
    """hybrid_search_onepass over a co-located corpus must produce the
    exact rows of the two-branch hybrid_search on the same data — the
    per-Arrow-batch top-k pooling is a superset of both branch top-ks,
    including ties broken by id."""
    from connapse_spark.functions.embed import embed_expr
    from connapse_spark.operators.search import (
        SearchOptions,
        hybrid_search,
        hybrid_search_onepass,
    )

    texts = [
        (i, f"parquet scan predicate pushdown doc {i}" if i % 3 else f"merge join shuffle doc {i}")
        for i in range(40)
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    corpus = docs.withColumn("embedding", embed_expr(F.col("text"), 16))
    opts = SearchOptions(top_k=5)
    two = hybrid_search(
        docs, "parquet scan", opts,
        vectors=corpus.select(F.col("doc_id").alias("id"), "embedding"),
        dims=16,
    ).collect()
    one = hybrid_search_onepass(corpus, "parquet scan", opts, dims=16).collect()
    assert [(r["id"], r["score"], r["source"]) for r in two] == [
        (r["id"], r["score"], r["source"]) for r in one
    ]
    assert len(one) == 5


def test_onepass_empty_query_guard(spark):
    from connapse_spark.functions.embed import embed_expr
    from connapse_spark.operators.search import hybrid_search_onepass

    docs = spark.createDataFrame([(1, "alpha")], "doc_id long, text string")
    corpus = docs.withColumn("embedding", embed_expr(F.col("text"), 16))
    assert hybrid_search_onepass(corpus, "   ").count() == 0


def test_semdedup_lowest_id_survives(spark):
    """Two near-identical vectors in the same cluster: the lower id keeps,
    the higher id is removed; an orthogonal vector is untouched."""
    from connapse_spark.operators.similarity import semdedup

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (5, [0.999, 0.001, 0.0, 0.0]),   # near-dup of seed 0
        (9, [0.0, 0.0, 1.0, 0.0]),       # orthogonal to both seeds... lands somewhere
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in semdedup(emb, k=2, threshold=0.95).collect()}
    assert out[0]["keep"] is True
    assert out[5]["keep"] is False          # removed: cos(0,5) > 0.95, same cluster
    assert out[5]["cluster"] == out[0]["cluster"]
    assert out[1]["keep"] is True
    assert out[9]["keep"] is True           # nothing within 0.95 of it


def test_perplexity_rare_tokens_score_higher(spark):
    """A doc of corpus-rare tokens must have higher mean NLL than one made
    of the corpus's dominant token; nll accounting is exact integers."""
    from connapse_spark.operators.textstats import perplexity_score

    docs = spark.createDataFrame(
        [(1, "common common common common"), (2, "common common rare exotic")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in perplexity_score(docs).collect()}
    assert out[1]["n_tokens"] == 4 and out[2]["n_tokens"] == 4
    assert out[2]["mean_nll"] > out[1]["mean_nll"]
    assert out[1]["nll_q"] > 0  # negative logprobs -> positive nll


def test_lang_mismatch_flags_wrong_tag(spark):
    from connapse_spark.operators.textstats import lang_mismatch

    docs = spark.createDataFrame(
        [
            (1, "the cat is on the mat and it is warm", "en"),
            (2, "the cat is on the mat and it is warm", "fr"),
        ],
        "doc_id long, text string, lang string",
    )
    out = {r["doc_id"]: r for r in lang_mismatch(docs).collect()}
    assert out[1]["is_match"] is True and out[1]["lang_pred"] == "en"
    assert out[2]["is_match"] is False


def test_top_ngrams_counts_and_short_docs(spark):
    from connapse_spark.operators.textstats import top_ngrams

    docs = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "a b c"), (3, "x")],  # doc 3: too short for bigrams
        "doc_id long, text string",
    )
    out = top_ngrams(docs, n=2, k=3).collect()
    assert (out[0]["gram"], out[0]["n_occurrences"]) == ("a b", 4)
    assert (out[1]["gram"], out[1]["n_occurrences"]) == ("b a", 2)
    assert (out[2]["gram"], out[2]["n_occurrences"]) == ("b c", 1)


def test_random_projection_deterministic_and_sign_correct(spark):
    """Projecting basis vector e_d yields r[j][d]/sqrt(k) exactly; equal
    inputs sketch identically."""
    import math

    from connapse_spark.operators.similarity import _jl_matrix, random_projection

    mat = _jl_matrix(4, 3)
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [1.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    out = random_projection(emb, out_dims=3, in_dims=4).collect()
    got = {(r["vec_id"], r["component"]): r["value"] for r in out}
    for j in range(3):
        expect = mat[j][0] / math.sqrt(3.0)
        assert got[(0, j)] == expect
        assert got[(1, j)] == got[(0, j)]


def test_dsir_upweights_target_like_docs(spark):
    """Docs resembling the target subset score higher mean log ratio than
    docs resembling only the source at large."""
    from connapse_spark.operators.textstats import dsir_weights

    rows = [
        (1, "alpha beta alpha beta gamma", "tgt"),
        (2, "alpha beta gamma alpha beta", "tgt"),
        (3, "alpha beta gamma delta beta", "src"),   # target-like mix
        (4, "zulu yankee xray whiskey victor", "src"),  # nothing like target
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = dsir_weights(docs, docs.filter(F.col("lang") == "tgt"))
    got = {r["doc_id"]: r for r in out.collect()}
    assert got[3]["mean_log_ratio"] > got[4]["mean_log_ratio"]
    assert got[4]["weight_q"] < 0  # target-OOV everywhere -> strongly negative
    assert got[1]["n_tokens"] == 5


def test_dup_span_stats_flags_repeated_spans(spark):
    """A 4-token span shared by two docs marks those positions duplicated;
    a unique doc stays clean; short docs have zero grams."""
    from connapse_spark.operators.dedup import dup_span_stats

    shared = "alpha beta gamma delta"
    docs = spark.createDataFrame(
        [
            (1, shared + " unique tail one"),
            (2, shared + " different ending two"),
            (3, "totally fresh words nothing repeats here at all"),
            (4, "tiny"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dup_span_stats(docs, n=4).collect()}
    assert out[1]["n_dup_grams"] == 1 and out[2]["n_dup_grams"] == 1
    assert out[1]["n_grams"] == 4  # 7 tokens -> 4 spans of 4
    assert out[3]["n_dup_grams"] == 0 and out[3]["dup_frac"] == 0.0
    assert out[4]["n_grams"] == 0 and out[4]["dup_frac"] == 0.0
    # within-doc repetition also counts
    rep = spark.createDataFrame(
        [(9, "x y z w x y z w")], "doc_id long, text string"
    )
    r = dup_span_stats(rep, n=4).collect()[0]
    assert r["n_dup_grams"] >= 2  # 'x y z w' occurs at pos 0 and 4


def test_token_budget_shards_partition_invariant(spark):
    """The distributed two-pass prefix sum must be a pure function of the
    data: identical shard assignment at any n_parts (1, 3, 32), every doc
    wholly in one shard, shard boundaries = exclusive prefix div budget,
    and total token mass preserved."""
    from connapse_spark.operators.sampling import token_budget_shards

    rows = [(i, 10 + (i * 7) % 90) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    base = {
        r["doc_id"]: (r["start_tok"], r["shard"])
        for r in token_budget_shards(
            df, 500, "doc_id", "n", seed="t", n_parts=32
        ).collect()
    }
    for np_ in (1, 3):
        other = {
            r["doc_id"]: (r["start_tok"], r["shard"])
            for r in token_budget_shards(
                df, 500, "doc_id", "n", seed="t", n_parts=np_
            ).collect()
        }
        assert other == base
    toks = dict(rows)
    # start_toks are EXACTLY the exclusive prefix sums of the token
    # counts in start_tok order: contiguous, no gaps, no overlaps
    acc = 0
    for d, (st, _sh) in sorted(base.items(), key=lambda kv: kv[1][0]):
        assert st == acc, f"doc {d}: start_tok {st} != prefix {acc}"
        acc += toks[d]
    assert acc == sum(toks.values())
    assert all(sh == st // 500 for st, sh in base.values())
    # a different seed permutes the order (shards differ for some doc)
    reseeded = {
        r["doc_id"]: r["shard"]
        for r in token_budget_shards(df, 500, "doc_id", "n", seed="u").collect()
    }
    assert any(reseeded[d] != sh for d, (_, sh) in base.items())


# ---------------------------------------------------------------------------
# MMR diversification (r8)
# ---------------------------------------------------------------------------


def test_mmr_prefers_diverse_over_redundant(spark):
    """Three near-identical high-rel vectors + one orthogonal lower-rel
    vector: plain top-3 keeps the redundant trio; MMR's second pick is
    the orthogonal one."""
    from connapse_spark.operators.search import mmr_diversify

    rows = [
        (1, 0.95, [1.0, 0.0, 0.0]),
        (2, 0.94, [0.999, 0.01, 0.0]),
        (3, 0.93, [0.998, 0.02, 0.0]),
        (4, 0.60, [0.0, 1.0, 0.0]),
    ]
    cands = spark.createDataFrame(rows, "id int, score double, embedding array<double>")
    got = [r.id for r in mmr_diversify(cands, k=3, lam=0.5).collect()]
    assert got[0] == 1 and got[1] == 4  # diversity beats the 0.94 twin
    assert len(got) == 3


def test_mmr_grouped_queries_and_ties(spark):
    """query_col diversifies N queries in one plan; exact-tie candidates
    break by ascending id (pure function of the candidate set)."""
    from connapse_spark.operators.search import mmr_diversify

    rows = [
        ("q1", 10, 0.9, [1.0, 0.0]),
        ("q1", 11, 0.9, [1.0, 0.0]),   # exact tie with 10 -> 10 first
        ("q1", 12, 0.5, [0.0, 1.0]),
        ("q2", 20, 0.8, [0.0, 1.0]),
        ("q2", 21, 0.7, [1.0, 0.0]),
    ]
    cands = spark.createDataFrame(
        rows, "qid string, id int, score double, embedding array<double>"
    )
    out = mmr_diversify(cands, k=2, lam=0.7, query_col="qid").collect()
    got = {(r.qid, r.rank): r.id for r in out}
    assert got[("q1", 1)] == 10      # tie broken by id
    assert got[("q1", 2)] == 12      # orthogonal beats the exact twin
    assert got[("q2", 1)] == 20 and got[("q2", 2)] == 21
    assert len(out) == 4


def test_mmr_k_past_candidate_count_returns_all(spark):
    from connapse_spark.operators.search import mmr_diversify

    cands = spark.createDataFrame(
        [(1, 0.9, [1.0, 0.0]), (2, 0.5, [0.0, 1.0])],
        "id int, score double, embedding array<double>",
    )
    out = mmr_diversify(cands, k=5, lam=0.7).collect()
    assert [r.rank for r in out] == [1, 2]


def test_mmr_null_id_agrees_across_engines(spark):
    """ADVICE r8: the SQL mirror used `NOT IN (SELECT id …)` which goes
    NULL — emptying the remaining set — when any candidate id is NULL,
    while Spark's left_anti keeps NULL-id rows. Now both use anti-join
    semantics: a NULL-id candidate survives exclusion and gets selected
    identically in both engines."""
    import duckdb

    from connapse_spark.operators.search import mmr_diversify, sql_mmr_diversify

    rows = [(1, 0.9, [1.0, 0.0]), (None, 0.8, [0.0, 1.0]), (2, 0.5, [0.9, 0.1])]
    cands = spark.createDataFrame(rows, "id int, score double, embedding array<double>")
    got = [
        (r["rank"], r["id"], r["rel"], r["mmr"])
        for r in mmr_diversify(cands, k=3, lam=0.5).collect()
    ]
    src = (
        "SELECT id, CAST(rel AS DOUBLE) AS rel, emb "
        "FROM (VALUES (1, 0.9, [1.0, 0.0]), (NULL, 0.8, [0.0, 1.0]), "
        "(2, 0.5, [0.9, 0.1])) AS t(id, rel, emb)"
    )
    oracle = duckdb.sql(sql_mmr_diversify(src, k=3, lam=0.5)).fetchall()
    assert [r[1] for r in got] == [1, None, 2]  # NULL-id row selected, not dropped
    assert got == [tuple(r) for r in oracle]

    # exact m-tie between a NULL id and a non-NULL id: Spark's asc(id)
    # window is NULLS FIRST, so the mirror must say NULLS FIRST too
    # (DuckDB defaults NULLS LAST — the r9 review corner)
    tie_rows = [(1, 0.9, [1.0, 0.0]), (None, 0.8, [0.0, 1.0]), (2, 0.8, [0.0, 1.0])]
    tie = spark.createDataFrame(tie_rows, "id int, score double, embedding array<double>")
    got2 = [
        (r["rank"], r["id"]) for r in mmr_diversify(tie, k=2, lam=0.5).collect()
    ]
    src2 = (
        "SELECT id, CAST(rel AS DOUBLE) AS rel, emb "
        "FROM (VALUES (1, 0.9, [1.0, 0.0]), (NULL, 0.8, [0.0, 1.0]), "
        "(2, 0.8, [0.0, 1.0])) AS t(id, rel, emb)"
    )
    oracle2 = duckdb.sql(sql_mmr_diversify(src2, k=2, lam=0.5)).fetchall()
    assert got2 == [(r[0], r[1]) for r in oracle2]
    assert got2[1][1] is None  # the tie breaks to NULL first on both engines


def test_bigram_perplexity_counts_and_miss_paths(spark):
    """n_bigrams = n_tokens − 1 per doc; an external model scores unseen
    continuations and unknown prefixes through the quantized miss
    constants, strictly worse than in-vocab bigrams."""
    from connapse_spark.operators.textstats import bigram_model, bigram_perplexity

    fit = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the cat ran")],
        "doc_id long, text string",
    )
    model = bigram_model(fit)
    self_scored = {r.doc_id: r for r in bigram_perplexity(fit).collect()}
    assert self_scored[1].n_bigrams == 5 and self_scored[2].n_bigrams == 2
    probe = spark.createDataFrame(
        [
            (10, "the cat"),        # observed bigram
            (11, "cat zzz"),        # unseen continuation of a known prefix
            (12, "zzz qqq"),        # unknown prefix entirely
            (13, "one"),            # no bigram positions
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in bigram_perplexity(probe, model=model).collect()}
    assert got[13].n_bigrams == 0 and got[13].nll_q == 0 and got[13].mean_nll == 0.0
    assert got[10].mean_nll < got[11].mean_nll  # miss-continuation is worse
    assert got[11].nll_q > 0 and got[12].nll_q > 0


def test_bigram_perplexity_separates_salad_from_repetition(spark):
    """The conditional signal: a page of one repeated sentence scores LOW
    (its bigrams dominate its own fit) while the same words shuffled
    score HIGH — identical unigram profiles, so the unigram proxy is
    blind to this difference by construction."""
    from connapse_spark.operators.textstats import bigram_perplexity

    sent = "the quick brown fox jumps over the lazy dog"
    words = sent.split()
    salad = " ".join(
        [words[i] for i in [3, 7, 1, 8, 0, 5, 2, 6, 4]]
        + list(reversed(words)) + words[::2] + words[1::2]
    )
    docs = spark.createDataFrame(
        [(1, " . ".join([sent] * 6)), (2, salad)],
        "doc_id long, text string",
    )
    bi = {r.doc_id: r.mean_nll for r in bigram_perplexity(docs).collect()}
    assert bi[1] < bi[2]


def test_bigram_perplexity_survives_empty_and_single_token_docs(spark):
    """Zero/one-token documents (routine in crawl-quality corpora) must
    yield empty pair arrays, not a negative slice length that kills the
    job (r8 review — reproduced crash before the greatest() guard)."""
    from connapse_spark.operators.textstats import bigram_perplexity

    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, ""), (3, "   "), (4, "solo"), (5, "...!!!")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in bigram_perplexity(docs).collect()}
    assert len(got) == 5
    assert got[1].n_bigrams == 2
    for d in (2, 3, 4, 5):
        assert got[d].n_bigrams == 0 and got[d].nll_q == 0 and got[d].mean_nll == 0.0


def test_remove_dup_spans_drops_planted_boilerplate(spark):
    """A boilerplate sentence repeated across documents is removed from
    every host doc; unique text survives in order; short docs pass
    through untouched."""
    from connapse_spark.operators.dedup import remove_dup_spans

    boiler = "all rights reserved contact us for more information today"
    docs = spark.createDataFrame(
        [
            (1, f"unique alpha text one {boiler} trailing words here"),
            (2, f"{boiler} another completely different document body"),
            (3, "no duplication in this document at all whatsoever"),
            (4, "tiny"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in remove_dup_spans(docs, n=9).collect()}
    assert got[1].n_removed == 9 and boiler not in got[1].clean_text
    assert got[1].clean_text.startswith("unique alpha text one")
    assert got[1].clean_text.endswith("trailing words here")
    assert got[2].n_removed == 9
    assert got[3].n_removed == 0 and got[4].n_removed == 0
    assert got[4].clean_text == "tiny"


def test_hybrid_websearch_served_equals_scan(spark, sf_dir):
    """options.websearch=True: the indexed keyword branch (posting-list
    candidates + stored-token verification) must be row-equal to the
    scan branch inside the full fusion pipeline, and phrase negation
    must actually bite (results differ from the flat-term default)."""
    from connapse_spark.operators import keyword_index as ki
    from connapse_spark.operators.search import SearchOptions, hybrid_search

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    q = '"table scan" fast -merge OR "fast merge"'
    opts = SearchOptions(top_k=10, websearch=True)
    scan = [tuple(r) for r in hybrid_search(docs, q, opts).collect()]
    kidx = ki.build_keyword_index(docs).persist()
    served = [
        tuple(r)
        for r in hybrid_search(docs, q, opts, keyword_index=kidx).collect()
    ]
    assert scan == served
    flat = [tuple(r) for r in hybrid_search(docs, q, SearchOptions(top_k=10)).collect()]
    assert scan != flat  # tsquery semantics change the result set
    kidx.unpersist()


def test_hybrid_websearch_negation_only_falls_back_to_scan(spark, sf_dir):
    """A negation-only websearch query cannot be candidate-pruned by the
    index tier; with a keyword_index attached it must FALL BACK to the
    scan tier (identical results), never raise."""
    from connapse_spark.operators import keyword_index as ki
    from connapse_spark.operators.search import SearchOptions, hybrid_search

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    q = "-merge"
    opts = SearchOptions(top_k=5, websearch=True)
    scan = [tuple(r) for r in hybrid_search(docs, q, opts).collect()]
    kidx = ki.build_keyword_index(docs).persist()
    served = [
        tuple(r) for r in hybrid_search(docs, q, opts, keyword_index=kidx).collect()
    ]
    assert scan == served and len(scan) > 0
    kidx.unpersist()


def test_hybrid_many_websearch_matches_singles(spark, sf_dir):
    """Batched websearch hybrid: each qid's rows must equal the batch
    oracle's semantics — sanity-pinned here against per-query expectations
    (negation actually changes the result set vs the flat batch tier)."""
    from connapse_spark.operators.search import hybrid_search_many

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    corpus = docs.join(vecs, "doc_id")
    qs = [(1, '"table scan" -merge'), (2, "vector small")]
    ws = hybrid_search_many(corpus, qs, top_k=5, websearch=True).collect()
    flat = hybrid_search_many(corpus, qs, top_k=5).collect()
    by_qid_ws = {}
    for r in ws:
        by_qid_ws.setdefault(r["qid"], []).append(r["doc_id"])
    assert set(by_qid_ws) == {1, 2}
    assert all(len(v) > 0 for v in by_qid_ws.values())
    assert [tuple(r) for r in ws] != [tuple(r) for r in flat]
    # queries parsing to nothing drop per qid
    empt = hybrid_search_many(corpus, [(9, "-"), (2, "vector")], top_k=5, websearch=True)
    assert {r["qid"] for r in empt.collect()} == {2}
