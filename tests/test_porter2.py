"""Full Snowball English stemmer (functions/porter2.py, r10).

The gate pin is the ``porter2_vocab`` oracle entry (fixed vocabulary vs
hand-derived VALUES); these units pin the same vectors without Spark, the
algorithm's edge semantics, and the corpus path (pandas UDF + the indexed
BM25 tier with a porter2-built index).
"""

import pytest
from pyspark.sql import functions as F

from connapse_spark.functions.porter2 import (
    SPEC_VECTORS,
    porter2_stem,
    porter2_stem_tokens,
)


def test_spec_vectors_golden():
    bad = [(w, porter2_stem(w), e) for w, e in SPEC_VECTORS if porter2_stem(w) != e]
    assert not bad, bad


def test_vectors_are_unique_and_cover_exceptions():
    words = [w for w, _ in SPEC_VECTORS]
    assert len(words) == len(set(words))
    # every exceptional-form class is represented
    for w in ("skis", "dying", "sky", "news", "inning", "proceed"):
        assert w in words


def test_longest_match_blocks_shorter_suffixes():
    # step 4 longest match: 'ment' matches but is outside R2, so the rule
    # STOPS — the shorter in-R2 'ent' must not fire afterwards
    assert porter2_stem("argument") == "argument"
    # step 1a: 'ss'/'us' block the bare-s rule
    assert porter2_stem("abyss") == "abyss"
    assert porter2_stem("virus") == "virus"


def test_edge_shapes():
    # <=2 letters untouched; non-English passthrough; apostrophes
    assert porter2_stem("a") == "a"
    assert porter2_stem("at") == "at"
    assert porter2_stem("'cause") == "caus"
    assert porter2_stem("mother's") == "mother"
    assert porter2_stem("数据库") == "数据库"
    assert porter2_stem("naïve") == "naïve"
    # y/Y handling: consonant-y at start, vowel-y after consonant
    assert porter2_stem("youth") == "youth"
    assert porter2_stem("flying") == "fli"
    # token-list helper mirrors the scalar
    assert porter2_stem_tokens(["running", "dogs"]) == ["run", "dog"]


def test_build_token_table_porter2_and_bm25_serving(spark, sf_dir):
    """The corpus path: stemmer='porter2' produces porter2 stems via the
    Arrow UDF (parity with the pure-Python loop on real corpus text), the
    downstream tf/doclen builds are stemmer-agnostic, and the indexed BM25
    tier with the matching stem_fn retrieves morphological variants the
    default suffix-stripper config cannot unify."""
    import os

    from connapse_spark.operators import keyword_index as ki

    docs = spark.createDataFrame(
        [
            (1, "the runner was running while others ran past"),
            (2, "she runs a consultancy for rational decisions"),
            (3, "nothing related to athletics at all here"),
            (4, "generously organized national conferences"),
        ],
        "doc_id long, text string",
    )
    toks = ki.build_token_table(docs, stemmer="porter2")
    rows = {r["id"]: r for r in toks.collect()}
    # UDF output == pure-Python loop over the exact tokens (Arrow parity)
    for r in rows.values():
        assert list(r["tokens_stemmed"]) == porter2_stem_tokens(
            list(r["tokens_exact"])
        )
    assert "run" in rows[1]["tokens_stemmed"]  # running/runner→run(ner)
    assert "run" in rows[2]["tokens_stemmed"]  # runs→run

    tf = ki.build_tf_postings(toks, "tokens_stemmed")
    dl = ki.build_doclen_table(toks)
    hits = ki.keyword_search_bm25_indexed(
        tf, dl, "running", k=4, stem_fn=porter2_stem
    ).collect()
    ids = [r["id"] for r in hits]
    assert 1 in ids and 2 in ids and 3 not in ids

    # the stem_fn seam threads through the other serving tiers too
    # (r10 review finding #2): flat batch, websearch, and single-query
    # postings tiers all retrieve porter2-unified variants
    tfe = ki.build_tf_postings(toks, "tokens_exact")
    many = ki.keyword_search_many_indexed(
        tfe, tf, [(1, "running")], k=4, stem_fn=porter2_stem
    ).collect()
    assert {r["id"] for r in many} >= {1, 2}
    kidx_posts_e = ki.build_postings(toks, "tokens_exact")
    kidx_posts_s = ki.build_postings(toks, "tokens_stemmed")
    ws = ki.keyword_search_websearch_indexed(
        toks, kidx_posts_e, kidx_posts_s, "rationally", k=4, stem_fn=porter2_stem
    ).collect()
    # porter2: rationally→ration == rational→ration (the suffix stripper
    # maps rationally→rationall and finds nothing)
    assert [r["id"] for r in ws] == [2]
    single = ki.keyword_search_indexed(
        toks, kidx_posts_e, kidx_posts_s, "runs", k=4, stem_fn=porter2_stem
    ).collect()
    assert {r["id"] for r in single} >= {1, 2}

    # the bundle CARRIES its analyzer: hybrid_search over a porter2-built
    # KeywordIndex stems query terms with porter2 automatically
    from connapse_spark.operators.search import SearchOptions, hybrid_search

    kidx = ki.build_keyword_index(docs, stemmer="porter2")
    assert kidx.stem_fn is porter2_stem
    kw = hybrid_search(
        docs, "rationally", SearchOptions(top_k=4, mode="Keyword"),
        keyword_index=kidx,
    ).collect()
    assert [r["id"] for r in kw] == [2]

    # …and through the BATCHED oracle tier (review finding: the batch
    # tier read the bundle's token arrays but stemmed queries with the
    # default stripper — porter2 matches scored 0 silently)
    from connapse_spark.operators.search import hybrid_search_many

    corp = docs.withColumn(
        "embedding", F.array(*[F.lit(0.1) for _ in range(8)])
    )
    got = hybrid_search_many(
        corp, [(1, "rationally")], top_k=4, dims=8, keyword_index=kidx
    ).collect()
    kw_hits = {r["doc_id"] for r in got if r["keyword_score"] > 0.0}
    assert kw_hits == {2}

    # real-corpus parity sweep for the UDF on sf0.001 text
    corpus = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .filter(F.col("doc_id") < 30)
        .select("doc_id", "text")
    )
    ct = ki.build_token_table(corpus, stemmer="porter2").collect()
    for r in ct:
        assert list(r["tokens_stemmed"]) == porter2_stem_tokens(
            list(r["tokens_exact"])
        )

    with pytest.raises(ValueError):
        ki.build_token_table(docs, stemmer="lovins")
