"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes one entry per implemented operator from SURVEY.md §2
(plus the north-star LLM-pipeline extras); ``oracle_sql()`` returns the
DuckDB mirror for each — built from the same single-source-of-truth SQL
builders that live next to the Spark implementations in
``connapse_spark/operators/*`` so both sides evolve together.
"""

from __future__ import annotations

import os
import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from connapse_spark.functions.vector import (
    array_digest_cols,
    dequantize_expr,
    quantize_expr,
    sql_quantize_codes,
    sql_quantize_scale,
    cosine_expr,
    sql_array_digest,
    sql_cosine,
    to_double_array,
)
from connapse_spark.operators import analytics, chunking, curate, dedup, events, similarity, temporal, textstats, web
from connapse_spark.operators.embedding import cache_misses
from connapse_spark.operators.maintenance import (
    reindex_decisions,
    sync_delta,
    upsert_last_writer_wins,
)
from connapse_spark.operators import keyword_index, multimodal, normalize, profile, rag, sampling, skew
from connapse_spark.operators.ingest import ingest, ingest_stats
from connapse_spark.operators.search import (
    SearchOptions,
    fake_cross_encoder_expr,
    hybrid_search,
    hybrid_search_onepass,
    keyword_search,
    keyword_search_bm25,
    hybrid_search_many,
    hybrid_search_many_fast,
    keyword_search_many,
    keyword_search_snippets,
    keyword_search_proximity,
    keyword_search_websearch,
    rerank,
    sql_fake_cross_encoder,
    sql_keyword_bm25,
    window_substitution,
    sql_keyword_proximity,
    sql_hybrid_search_many,
    sql_keyword_search_many,
    sql_keyword_search_snippets,
    sql_keyword_websearch,
)
from connapse_spark.plans import ivf, pq, zorder
from connapse_spark.sources import parsers, sinks, snapshots
from connapse_spark import oracle

SEARCH_QUERY = "table scan fast merge"

# The driver compares Spark vs the DuckDB oracle at sf0.01 (TESTDATA.md);
# oracle_sql() has no sf_dir parameter, so data-derived literals baked into
# oracle strings (e.g. the semdedup cluster count) read this dir's metadata.
ORACLE_SF_DIR = "/root/testdata/sf0.01"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _parquet_rows(sf_dir: str, name: str) -> int:
    """Exact row count from parquet footer metadata — no Spark job, no scan;
    lets query entries derive size-dependent policy knobs (semdedup k)
    deterministically on both the Spark and oracle sides."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(os.path.join(sf_dir, f"{name}.parquet")).metadata.num_rows


def _long(df: DataFrame, *cols: str) -> DataFrame:
    """Cast computed int columns to long so Spark's schema matches DuckDB's
    BIGINT arithmetic results."""
    for c in cols:
        df = df.withColumn(c, F.col(c).cast("long"))
    return df


# ---------------------------------------------------------------------------
# Search (Q2/Q3/Q5/Q6/Q10/Q9/Q12)
# ---------------------------------------------------------------------------


def q_knn_vector(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(
        to_double_array(F.col("embedding")).alias("_qv")
    )
    return (
        emb.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            cosine_expr(to_double_array(F.col("embedding")), F.col("_qv")).alias("score"),
        )
        .orderBy(F.desc("score"), F.col("vec_id"))
        .limit(10)
    )


def q_mmr_diversify(spark, sf_dir):
    """MMR diversity re-ranking (operators/search.mmr_diversify —
    Carbonell & Goldstein 1998, the post-retrieval stage the reference
    lacks): top-12 cosine candidates for the vec_id-0 query, then 5
    greedy picks of ``0.7·rel − 0.3·max-sim-to-selected``, every step a
    Catalyst plan step sharing the left-fold cosine with the DuckDB
    mirror — all five argmax DECISIONS must agree bit-for-bit, not just
    the rounded outputs."""
    from connapse_spark.operators.search import mmr_diversify

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(
        to_double_array(F.col("embedding")).alias("_qv")
    )
    cands = (
        emb.crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("id"),
            cosine_expr(to_double_array(F.col("embedding")), F.col("_qv")).alias("rel"),
            F.col("embedding").alias("emb"),
        )
        .orderBy(F.desc("rel"), F.col("id"))
        .limit(12)
    )
    return mmr_diversify(
        cands, k=5, lam=0.7, id_col="id", score_col="rel", vec_col="emb"
    )


def q_image_neardup_dct(spark, sf_dir):
    """The DCT pHash tier over the same planted fixture (multimodal.
    image_phash_dct): 16×16 block means → orthonormal 2D DCT-II → 8×8
    low-frequency block (DC slot swapped for a mid-band coef) → lower-
    median threshold. Planted variants land at Hamming 2–14 (spatial
    block flips spread across DCT coefficients, unlike aHash's 1:1),
    unrelated bases stay ≥22; threshold 14 catches exactly the six
    planted pairs. Banding + verify mirrored in SQL over the pinned
    hashes."""
    from connapse_spark.operators import multimodal as _mm

    media = spark.createDataFrame(
        _mm.fixture_near_dup_images(), "media_id long, content binary"
    )
    return _long(
        _mm.image_neardup_pairs(media, max_hamming=14, method="phash"), "hamming"
    )


# pinned signed-64 DCT pHash values of fixture_near_dup_images; regenerate
# with tests/test_round3.py::test_image_neardup_dct_oracle_constants
_IMAGE_NEARDUP_DCT_PINNED = [
    (0, 6454023956561482184),
    (1, 1855220658001807270),
    (2, 5057592235080125501),
    (3, -5977611525025210074),
    (4, -5965524416766113514),
    (5, -7989878500192645876),
    (6, 4037065906460712685),
    (7, -2034986312315807108),
    (8, 2095846222248191833),
    (9, -4556295594169214995),
    (100, 6454041531567657416),
    (101, 1782880489479784358),
    (102, -3570178755888838595),
    (103, -5919328819087974098),
    (104, -8847819897586286250),
    (105, -9150685848222785697),
]


def _sql_image_neardup_dct() -> str:
    values = ", ".join(
        f"(CAST({mid} AS BIGINT), CAST({v} AS BIGINT))"
        for mid, v in _IMAGE_NEARDUP_DCT_PINNED
    )
    return dedup.sql_hash_neardup_pairs(
        f"SELECT id, h FROM (VALUES {values}) t(id, h)", bits=64, max_hamming=14
    )


def q_audio_neardup(spark, sf_dir):
    """Audio near-dup (multimodal.audio_neardup_pairs — the audio leg of
    the multimodal dedup story): WAV decode → 64-bit energy-delta
    fingerprint (integer-exact, a pure function of the PCM bytes) → the
    shared banded-Hamming kernel. Variants flip j+1 amplitude windows
    across both base levels and land at Hamming 2–6; distinct bases stay
    ≥14. Fingerprints pinned, banding + verify mirrored in SQL."""
    from connapse_spark.operators import multimodal as _mm

    media = spark.createDataFrame(
        _mm.fixture_near_dup_audio(), "media_id long, content binary"
    )
    return _long(_mm.audio_neardup_pairs(media, max_hamming=6), "hamming")


# pinned signed-64 energy-delta fingerprints of fixture_near_dup_audio;
# regenerate with tests/test_round3.py::test_audio_neardup_oracle_constants
_AUDIO_NEARDUP_PINNED = [
    (0, 6441597270740522708),
    (1, -3789170876707726630),
    (2, 5432816169974717114),
    (3, 7089841927307563866),
    (4, -3519231994316355894),
    (5, -3942570083134041511),
    (6, 672211902416734554),
    (7, 6243304836743715547),
    (100, 7594518775347369684),
    (101, -1492335066748773670),
    (102, 7729792717422025402),
    (103, 5919046211923776346),
    (104, -1204311966859557174),
]


def _sql_audio_neardup() -> str:
    values = ", ".join(
        f"(CAST({mid} AS BIGINT), CAST({v} AS BIGINT))"
        for mid, v in _AUDIO_NEARDUP_PINNED
    )
    return dedup.sql_hash_neardup_pairs(
        f"SELECT id, h FROM (VALUES {values}) t(id, h)", bits=64, max_hamming=6
    )


def q_video_neardup(spark, sf_dir):
    """Video near-dup (multimodal.video_neardup_pairs — the video leg of
    the multimodal dedup story): Y4M frame sampling → Y-plane aHash per
    sampled position → banded Hamming kernel ALIGNED on frame_index →
    clips pair on ≥2 matching positions. Variants replace j+1 of 6
    frames, so planted pairs match on 5/4/3/3 positions; unrelated clips
    never align twice. Frame hashes pinned; banding, alignment and the
    pair aggregate mirrored in SQL."""
    from connapse_spark.operators import multimodal as _mm

    media = spark.createDataFrame(
        _mm.fixture_near_dup_videos(), "media_id long, content binary"
    )
    return _mm.video_neardup_pairs(media, max_hamming=6, min_matching_frames=2)


# pinned signed-64 Y-plane frame hashes of fixture_near_dup_videos;
# regenerate with tests/test_round3.py::test_video_neardup_oracle_constants
_VIDEO_NEARDUP_PINNED = [
    (0, 0, -702885180841042999),
    (0, 1, -837275090026547068),
    (0, 2, -3005824826736165100),
    (0, 3, -2012291194919604530),
    (0, 4, -3343899588315339803),
    (0, 5, 7851109087997625045),
    (1, 0, 2296039338806518416),
    (1, 1, 6347139981743175753),
    (1, 2, 2554367138077549485),
    (1, 3, -1847808551044968115),
    (1, 4, 320210864512746786),
    (1, 5, 7901003299839217600),
    (2, 0, -6029122898422603181),
    (2, 1, 4174640364763710180),
    (2, 2, 776104974761167368),
    (2, 3, 6941312954147867314),
    (2, 4, 6808783289525453103),
    (2, 5, 2640210324857539330),
    (3, 0, -7613103919532846817),
    (3, 1, -8407006077530421815),
    (3, 2, 2304692984222257918),
    (3, 3, -4153112255901873201),
    (3, 4, -9107568069916509229),
    (3, 5, 487558080779146982),
    (4, 0, 1108457555335097788),
    (4, 1, -1310832103021255407),
    (4, 2, 2122412313005657222),
    (4, 3, -3977834081972241852),
    (4, 4, -3254857967094852982),
    (4, 5, 8123366622143928246),
    (5, 0, 8964479459625715325),
    (5, 1, 4056717161290739544),
    (5, 2, 3245016722368962682),
    (5, 3, 1645299664035836327),
    (5, 4, 5402858530056795735),
    (5, 5, 3419438814422660382),
    (100, 0, -702885180841042999),
    (100, 1, -7798598706804723609),
    (100, 2, -3005824826736165100),
    (100, 3, -2012291194919604530),
    (100, 4, -3343899588315339803),
    (100, 5, 7851109087997625045),
    (101, 0, 2296039338806518416),
    (101, 1, 8186926051643910824),
    (101, 2, 2554367138077549485),
    (101, 3, 2297105988716992568),
    (101, 4, 320210864512746786),
    (101, 5, 7901003299839217600),
    (102, 0, -6029122898422603181),
    (102, 1, -6976591317667073765),
    (102, 2, 776104974761167368),
    (102, 3, 3208420655055901729),
    (102, 4, 6808783289525453103),
    (102, 5, -917258116043826306),
    (103, 0, -7613103919532846817),
    (103, 1, 3495649726889116613),
    (103, 2, 2304692984222257918),
    (103, 3, -4660569206811068039),
    (103, 4, -9107568069916509229),
    (103, 5, 244457590815566285),
]


def _sql_video_neardup() -> str:
    values = ", ".join(
        f"(CAST({mid} AS BIGINT), CAST({fi} AS INTEGER), CAST({v} AS BIGINT))"
        for mid, fi, v in _VIDEO_NEARDUP_PINNED
    )
    kernel = dedup.sql_hash_neardup_pairs(
        f"SELECT id, frame_index, h FROM (VALUES {values}) t(id, frame_index, h)",
        bits=64,
        max_hamming=6,
        match_cols=["frame_index"],
    )
    return f"""
WITH pairs AS ({kernel})
SELECT id_a, id_b, CAST(count(*) AS BIGINT) AS n_matching
FROM pairs
GROUP BY id_a, id_b
HAVING count(*) >= 2
ORDER BY id_a, id_b
""".strip()


def q_perplexity_bigram(spark, sf_dir):
    """Conditional bigram NLL (textstats.bigram_perplexity — the 2-gram
    tier above the unigram perplexity proxy, one step toward CCNet's
    KenLM bucketing): two-part micro-nat quantization (numerator /
    denominator separately) so unobserved continuations score exactly
    without V² rows; self-fit here, so the oracle mirrors the full fit +
    score chain."""
    return textstats.bigram_perplexity(_t(spark, sf_dir, "documents")).orderBy(
        "doc_id"
    )


def q_remove_dup_spans(spark, sf_dir):
    """Exact-substring span removal (dedup.remove_dup_spans — the action
    half of dup_span_stats, arXiv:2107.06499 §4): every token covered by
    a corpus-duplicated 8-gram drops, survivors reassemble in order. The
    oracle mirrors span hashing, duplicated-start selection and the
    coverage mask (1-based vs 0-based lambda index reconciled), down to
    the reassembled clean_text string."""
    return dedup.remove_dup_spans(_t(spark, sf_dir, "documents"), n=8).orderBy(
        "doc_id"
    )


def q_temperature_mix(spark, sf_dir):
    """Temperature-flattened multilingual mixing (operators/sampling.
    temperature_mix — XLM-R/mT5 p ∝ n^alpha): rates derived from the
    data's own group sizes (one aggregate), selection by the
    row-deterministic sha bucket. Head language flattens, tail
    upweights; the oracle mirrors the integer-quantized weight sum and
    every FP op in order, so the kept row SET is bit-equal."""
    from connapse_spark.operators.sampling import temperature_mix

    docs = _t(spark, sf_dir, "documents")
    return temperature_mix(docs, "lang", "doc_id", alpha=0.3, budget_frac=0.5).select(
        "doc_id", "lang"
    ).orderBy("doc_id")


def q_keyword_facets(spark, sf_dir):
    """Facet counts over the keyword match set (operators/search.
    keyword_facets — the result-page sidebar aggregation): same scoring
    expression as keyword_search, aggregated per language instead of
    top-k'd, so the sidebar and the hit list can never disagree."""
    from connapse_spark.operators.search import keyword_facets

    return keyword_facets(_t(spark, sf_dir, "documents"), SEARCH_QUERY, "lang")


def _sql_mmr_diversify() -> str:
    from connapse_spark.operators.search import sql_mmr_diversify

    src = f"""
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
SELECT vec_id AS id, {sql_cosine("CAST(embedding AS DOUBLE[])", "qv")} AS rel,
       CAST(embedding AS DOUBLE[]) AS emb
FROM embeddings, q
ORDER BY rel DESC, id LIMIT 12
""".strip()
    return sql_mmr_diversify(src, k=5, lam=0.7)


_SQL_KNN_BASE = f"""
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
SELECT vec_id, {sql_cosine("CAST(embedding AS DOUBLE[])", "qv")} AS score
FROM embeddings, q {{where}}
ORDER BY score DESC, vec_id LIMIT 10
"""


def q_knn_vector_filtered(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("label") != 2)
    q = (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == 0)
        .select(to_double_array(F.col("embedding")).alias("_qv"))
    )
    return (
        emb.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            cosine_expr(to_double_array(F.col("embedding")), F.col("_qv")).alias("score"),
        )
        .orderBy(F.desc("score"), F.col("vec_id"))
        .limit(10)
    )


def q_keyword_search(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return keyword_search(docs, SEARCH_QUERY, k=20)


# phrase + negation + OR-group — exercises every websearch_to_tsquery form
WEBSEARCH_QUERY = '"table scan" fast -merge OR "fast merge"'


def q_keyword_websearch(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return keyword_search_websearch(docs, WEBSEARCH_QUERY, k=20)


def q_keyword_proximity(spark, sf_dir):
    """Q3 cover-density variant: TF + adjacent-pair 1/mindist bonuses."""
    docs = _t(spark, sf_dir, "documents")
    return keyword_search_proximity(docs, SEARCH_QUERY, k=20)


def q_keyword_bm25(spark, sf_dir):
    """Q3 extension: Okapi BM25 over stemmed tokens (one corpus pass +
    one-row stats broadcast)."""
    docs = _t(spark, sf_dir, "documents")
    return keyword_search_bm25(docs, SEARCH_QUERY, k=20)


def q_keyword_bm25_indexed(spark, sf_dir):
    """BM25 SERVED from the write-time index (r10 — VERDICT r9 ask #6,
    keyword_index.keyword_search_bm25_indexed): the stemmed tf postings +
    the one-int-per-doc doclen table answer the query with a term-pruned
    probe — no corpus tokenize in the query path. Bit-equal to the scan
    tier (same integer corpus stats, same fixed-order double expression),
    so it shares the scan tier's oracle SQL."""
    tokens = keyword_index.build_token_table(_t(spark, sf_dir, "documents")).persist()
    tfs = keyword_index.build_tf_postings(tokens, "tokens_stemmed")
    dl = keyword_index.build_doclen_table(tokens)
    return _scoped_cache_result(
        spark,
        tokens,
        keyword_index.keyword_search_bm25_indexed(
            tfs, dl, SEARCH_QUERY, k=20
        ).withColumnRenamed("id", "doc_id"),
    )


def q_hybrid_rrf(spark, sf_dir):
    """Fusion extension: reciprocal-rank fusion of the stored-vector and
    keyword branches (rank-only, normalization-free)."""
    return _hybrid(spark, sf_dir, fusion="Rrf")


def q_hybrid_onepass(spark, sf_dir):
    """Single-scan hybrid over the co-located (text, embedding) corpus:
    both branch scores in one JVM projection, per-Arrow-batch exact top-k
    pooling via mapInPandas, fusion on the pinned candidate pool — the
    corpus is read ONCE per query instead of once per branch."""
    docs = _t(spark, sf_dir, "documents")
    vecs = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), F.col("embedding")
    )
    corpus = docs.join(vecs, "doc_id")
    out = hybrid_search_onepass(corpus, SEARCH_QUERY, SearchOptions(top_k=10))
    return out.withColumnRenamed("id", "doc_id")


def q_salted_agg(spark, sf_dir):
    """Skew-resistant two-stage aggregation (operators/skew.py): groupBy
    (event_type, salt) partials merged on event_type — the Zipfian-key
    pattern. The oracle is the PLAIN unsalted aggregate: salting must be
    an identity on results."""
    ev = events.load_events(spark, sf_dir).select(
        "event_type",
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return skew.salted_agg(
        ev,
        ["event_type"],
        {
            "total_cents": ("sum_long", "cents"),
            "n_events": ("count", "cents"),
            "min_cents": ("min", "cents"),
            "max_cents": ("max", "cents"),
            "n_users": ("count_distinct", "user_id"),
        },
        n_salts=8,
    ).orderBy("event_type")


_SQL_SALTED_AGG_TABLE = (
    "(SELECT event_type, user_id, CAST(round(value * 100) AS BIGINT) AS cents "
    "FROM events)"
)


WEBSEARCH_BATCH_QUERIES = [
    (1, '"table scan" fast -merge OR "fast merge"'),
    (2, '"customer join" -slow'),
    (3, 'vector OR "hash aggregation"'),
]


def q_hybrid_many_websearch(spark, sf_dir):
    """BATCHED hybrid search with FULL websearch syntax per query (r9):
    the single-scan batch machinery's keyword expressions swap to
    match-gated websearch score expressions over the SAME shared token
    arrays — N tsquery-semantics queries, one corpus read. Oracle is a
    UNION of single-query onepass-websearch mirrors."""
    docs = _t(spark, sf_dir, "documents")
    vecs = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), F.col("embedding")
    )
    corpus = docs.join(vecs, "doc_id")
    return hybrid_search_many(
        corpus, WEBSEARCH_BATCH_QUERIES, top_k=5, websearch=True
    )


def q_hybrid_many_websearch_fast(spark, sf_dir):
    """PRODUCTION batched hybrid with FULL websearch syntax per query
    (r10 — VERDICT r9 ask #3, search.hybrid_search_many_fast(websearch=
    True)): the BLAS vector branch unchanged, the keyword branch swapped
    to keyword_index.websearch_scores_indexed — set-based match gating +
    scoring over write-time tf postings and positions postings, per-query
    expressions only over the candidate-bounded frame. Keyword doubles
    are bit-equal to the oracle tier (unit-pinned); the vector branch
    carries the fast family's round-9 contract (BLAS ulp), so this
    shares hybrid_many_websearch's oracle wrapped in round(…, 9)."""
    docs = _t(spark, sf_dir, "documents")
    vecs = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), F.col("embedding")
    )
    tokens = keyword_index.build_token_table(docs).persist()
    tfe = keyword_index.build_tf_postings(tokens, "tokens_exact")
    tfs = keyword_index.build_tf_postings(tokens, "tokens_stemmed")
    pe = keyword_index.build_positions_postings(tokens, "tokens_exact")
    ps = keyword_index.build_positions_postings(tokens, "tokens_stemmed")
    out = hybrid_search_many_fast(
        docs.join(vecs, "doc_id"),
        WEBSEARCH_BATCH_QUERIES,
        top_k=5,
        websearch=True,
        tf_postings=(tfe, tfs),
        positions_postings=(pe, ps),
    )
    return _scoped_cache_result(
        spark,
        tokens,
        out.select(
            "qid",
            "doc_id",
            F.round("score", 9).alias("score"),
            F.round("vector_score", 9).alias("vector_score"),
            F.round("keyword_score", 9).alias("keyword_score"),
            "source",
        ),
    )


def q_hybrid_many(spark, sf_dir):
    """BATCHED hybrid search: all BATCH_QUERIES answered in ONE corpus
    scan (search.hybrid_search_many) — the keyword_many amortization
    extended to the full vector+keyword+fusion pipeline; oracle is a
    UNION of the verified single-query onepass mirrors."""
    docs = _t(spark, sf_dir, "documents")
    vecs = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), F.col("embedding")
    )
    corpus = docs.join(vecs, "doc_id")
    return hybrid_search_many(corpus, BATCH_QUERIES, top_k=5)


_BATCH_FILTERS_SQL = {
    1: "lang = 'en'",
    2: "source IN ('src1', 'src2')",
    # qid 3 deliberately unfiltered — mixed batches are the common case
}


def _batch_filters_cols():
    return {
        1: F.col("lang") == "en",
        2: F.col("source").isin("src1", "src2"),
    }


def q_hybrid_many_filtered(spark, sf_dir):
    """Filtered search in the BATCH regime: each query in the batch
    carries its own corpus predicate (per-qid boolean masks evaluated in
    the one shared scan — search.hybrid_search_many's `predicates`);
    oracle = UNION of the verified single-query filtered onepass
    mirrors. The production (BLAS) tier is ranking-pinned to this one in
    units."""
    docs = _t(spark, sf_dir, "documents")
    vecs = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), F.col("embedding")
    )
    corpus = docs.join(vecs, "doc_id")
    return hybrid_search_many(
        corpus, BATCH_QUERIES, top_k=5, predicates=_batch_filters_cols()
    )


def q_hybrid_many_fast(spark, sf_dir):
    """PRODUCTION batched hybrid: BLAS-matmul vector branch + postings
    keyword branch into the same fusion tail — ~10 ms/query at batch
    sizes ≥100 (sf0.1), ranking-parity-pinned to the oracle tier."""
    docs = _t(spark, sf_dir, "documents")
    vecs = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), F.col("embedding")
    )
    corpus = docs.join(vecs, "doc_id")
    out = hybrid_search_many_fast(corpus, BATCH_QUERIES, top_k=5)
    # BLAS accumulation differs from the sequential fold in the last ulp
    # (~1e-15 relative); the oracle contract for this tier is scores
    # rounded to 9 dp — far below any ranking-relevant difference, far
    # above the ulp noise. Rankings are exactly parity-pinned in units.
    return out.select(
        "qid",
        "doc_id",
        F.round("score", 9).alias("score"),
        F.round("vector_score", 9).alias("vector_score"),
        F.round("keyword_score", 9).alias("keyword_score"),
        "source",
    )


def q_hybrid_many_indexed(spark, sf_dir):
    """Batched hybrid SERVED from write-time tf-postings (r6, the batched
    half of VERDICT r5 ask #2): the BLAS fast tier with its keyword
    branch replaced by a term-pruned probe of the materialized (term, id,
    tf) tables — no corpus tokenize in the query path at all. Bit-equal
    to hybrid_many_fast (same BLAS vector branch, same integer keyword
    math, same fuse), so it shares that tier's round-9 oracle contract."""
    docs = _t(spark, sf_dir, "documents")
    vecs = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), F.col("embedding")
    )
    tokens = keyword_index.build_token_table(docs).persist()
    tfe = keyword_index.build_tf_postings(tokens, "tokens_exact")
    tfs = keyword_index.build_tf_postings(tokens, "tokens_stemmed")
    out = hybrid_search_many_fast(
        docs.join(vecs, "doc_id"), BATCH_QUERIES, top_k=5, tf_postings=(tfe, tfs)
    )
    return _scoped_cache_result(spark, tokens, out.select(
        "qid",
        "doc_id",
        F.round("score", 9).alias("score"),
        F.round("vector_score", 9).alias("vector_score"),
        F.round("keyword_score", 9).alias("keyword_score"),
        "source",
    ))


def q_hybrid_many_ann(spark, sf_dir):
    """FULLY index-served batched hybrid: keyword from write-time
    tf-postings AND vectors from the seeded IVF index at full probe
    (nprobe = n_lists) — zero corpus scan in the query path; candidates at
    full probe are the whole corpus and the BLAS kernel is identical, so
    this is bit-equal to hybrid_many_fast and shares its round-9 oracle.
    The PRUNED batched regime (nprobe < n_lists, per-query list masks over
    a union-pruned scan) is pinned by tests/test_plans.py against the
    single-query hybrid_ann_probe semantics."""
    docs = _t(spark, sf_dir, "documents")
    vecs = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), F.col("embedding")
    )
    tokens = keyword_index.build_token_table(docs).persist()
    tfe = keyword_index.build_tf_postings(tokens, "tokens_exact")
    tfs = keyword_index.build_tf_postings(tokens, "tokens_stemmed")
    vidx = ivf.build_vector_index(
        _vectors(spark, sf_dir), n_lists=8, nprobe=8, id_col="id", seeded=True
    ).persist()
    out = hybrid_search_many_fast(
        docs.join(vecs, "doc_id"),
        BATCH_QUERIES,
        top_k=5,
        tf_postings=(tfe, tfs),
        vector_index=vidx,
    )
    try:
        return _scoped_cache_result(spark, tokens, out.select(
            "qid",
            "doc_id",
            F.round("score", 9).alias("score"),
            F.round("vector_score", 9).alias("vector_score"),
            F.round("keyword_score", 9).alias("keyword_score"),
            "source",
        ))
    finally:
        vidx.unpersist()


def q_ann_router(spark, sf_dir):
    """Per-model ANN routing under the value-hash oracle — M6 /
    VectorColumnManager parity (VectorColumnManager.cs:14-194: one partial
    ivfflat index per embedding model, queries routed to their model's
    index). ``label`` stands in for model_id; the manager builds one
    seeded index per model (lists policy → 1 list at this SF, so the
    routed probe is provably full coverage) and the per-model top-3 must
    equal a per-label brute KNN window — the router changes WHERE
    candidates come from, never WHAT ranks."""
    from connapse_spark.functions.embed import embed_py

    emb = _t(spark, sf_dir, "embeddings")
    qv = embed_py(SEARCH_QUERY, 64)
    # nprobe=100 == the lists policy's cap (ivf_n_lists clamps at 100), so
    # full coverage holds at ANY scale factor — 99 would drop one list the
    # moment a model reaches 100k rows
    mgr = ivf.VectorIndexManager(min_rows=10, nprobe=100, seeded=True).ensure(emb)
    models = sorted(r["label"] for r in emb.select("label").distinct().collect())
    out = None
    for m in models:
        part = mgr.knn(emb, m, qv, k=3).select(
            F.lit(int(m)).alias("model_id"), F.col("id"), "score"
        )
        out = part if out is None else out.unionByName(part)
    return out.orderBy("model_id", F.desc("score"), "id")


def _sql_ann_router() -> str:
    from connapse_spark.functions.embed import embed_py, sql_vector_literal
    from connapse_spark.functions.vector import sql_cosine

    qv = sql_vector_literal(embed_py(SEARCH_QUERY, 64))
    cos = sql_cosine("CAST(embedding AS DOUBLE[])", "qv")
    return f"""
WITH q AS (SELECT {qv} AS qv)
SELECT model_id, id, score FROM (
  SELECT label AS model_id, vec_id AS id, {cos} AS score,
         row_number() OVER (PARTITION BY label ORDER BY {cos} DESC, vec_id) AS rn
  FROM embeddings, q
) WHERE rn <= 3
ORDER BY model_id, score DESC, id
""".strip()


def _vectors(spark, sf_dir):
    """Stored-vector index side (the reference's chunk_vectors analogue)."""
    return _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("id"), F.col("embedding")
    )


def _hybrid(spark, sf_dir, **kw):
    docs = _t(spark, sf_dir, "documents")
    opts = SearchOptions(
        top_k=kw.get("top_k", 10),
        min_score=kw.get("min_score", 0.0),
        mode=kw.get("mode", "Hybrid"),
        fusion=kw.get("fusion", "ConvexCombination"),
        fusion_alpha=kw.get("alpha", 0.5),
        auto_cut=kw.get("autocut", False),
    )
    pred = kw.get("predicate")
    out = hybrid_search(
        docs, SEARCH_QUERY, opts, predicate=pred, vectors=_vectors(spark, sf_dir)
    )
    return out.withColumnRenamed("id", "doc_id")


def q_hybrid_cc(spark, sf_dir):
    return _hybrid(spark, sf_dir)


def q_hybrid_dbsf(spark, sf_dir):
    return _hybrid(spark, sf_dir, fusion="Dbsf")


def q_hybrid_websearch(spark, sf_dir):
    """Hybrid search with FULL websearch syntax in the keyword branch
    (r9 — SearchOptions.websearch: phrases, negation, OR-groups flow
    through the fusion pipeline the way the reference's
    websearch_to_tsquery does inside HybridSearchService; the flat-term
    scorer remains the default hybrid contract). Same stored-vector
    semantic branch and CC fusion as hybrid_cc."""
    docs = _t(spark, sf_dir, "documents")
    opts = SearchOptions(top_k=10, fusion="ConvexCombination",
                         fusion_alpha=0.5, websearch=True)
    out = hybrid_search(
        docs, WEBSEARCH_QUERY, opts, vectors=_vectors(spark, sf_dir)
    )
    return out.withColumnRenamed("id", "doc_id")


def q_hybrid_autocut(spark, sf_dir):
    return _hybrid(spark, sf_dir, autocut=True)


def q_hybrid_minscore(spark, sf_dir):
    return _hybrid(spark, sf_dir, min_score=0.3)


def q_hybrid_filtered(spark, sf_dir):
    pred = (F.col("lang") == "en") & F.col("source").isin("src1", "src2", "src3")
    return _hybrid(spark, sf_dir, predicate=pred)


_HYBRID_WHERE = "lang = 'en' AND source IN ('src1', 'src2', 'src3')"


def q_semantic_cross_model(spark, sf_dir):
    """Q7 end-to-end: Semantic mode + cross-model flag resolves to Hybrid
    (search.resolve_mode), so the keyword branch covers legacy-model docs —
    the oracle is the full hybrid pipeline."""
    from connapse_spark.operators.search import resolve_mode

    mode = resolve_mode("Semantic", enable_cross_model=True)
    return _hybrid(spark, sf_dir, mode=mode)


def q_semantic_topk(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    opts = SearchOptions(top_k=10, mode="Semantic")
    return hybrid_search(
        docs, SEARCH_QUERY, opts, vectors=_vectors(spark, sf_dir)
    ).withColumnRenamed("id", "doc_id")


def _sql_semantic_topk() -> str:
    return f"""
WITH v AS ({oracle.vector_cte_stored(SEARCH_QUERY, 20)}
)
SELECT id AS doc_id, score, 'vector' AS source FROM v
WHERE score >= 0.0 ORDER BY score DESC, id LIMIT 10
""".strip()


# ---------------------------------------------------------------------------
# Vector ops (E3/E4, similarity, near-dup)
# ---------------------------------------------------------------------------


def q_mean_pool(spark, sf_dir):
    """E3 mean-pool; the centroid array is projected to its scalar digest so
    the driver's sort-based canonicalizer never sees a list cell (the full
    array stays in the operator API, similarity.mean_pool_by)."""
    df = similarity.mean_pool_by(_t(spark, sf_dir, "embeddings"))
    df = df.select(
        "label", "n_vectors", *array_digest_cols(F.col("centroid"), "centroid")
    ).orderBy("label")
    return _long(df, "n_vectors")


def q_knn_join(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    out = similarity.knn_join(emb.filter(F.col("vec_id") < 10), emb, k=5)
    return _long(out, "rank")


def q_neardup_cosine(spark, sf_dir):
    """Exact kernel, explicitly opted into (the public API defaults to LSH)."""
    return similarity.embedding_neardup_pairs(
        _t(spark, sf_dir, "embeddings"), threshold=0.5, exact=True
    )


def q_neardup_cosine_lsh(spark, sf_dir):
    return similarity.embedding_neardup_pairs(
        _t(spark, sf_dir, "embeddings"), threshold=0.3, n_planes=4
    )


def q_neardup_groups(spark, sf_dir):
    """Near-dup clusters: LSH pair list -> connected components (iterative
    min-label propagation; canonical representative = min id)."""
    pairs = similarity.embedding_neardup_pairs(
        _t(spark, sf_dir, "embeddings"), threshold=0.3, n_planes=4
    )
    return dedup.neardup_components(pairs)


def q_snapshot_merge(spark, sf_dir):
    """Lakehouse MERGE end to end (sources/snapshots.merge_snapshot):
    commit the orders relation as snapshot v0, merge a keyed batch
    (updates via file-level copy-on-write + inserts), read the COMMITTED
    v1 back from disk. The oracle recomputes the merged relation
    directly — so the round trip through staging, manifest commit, and
    by-reference carry-over of untouched files is what's hash-checked."""
    import shutil
    import tempfile

    tdir = os.path.join(
        tempfile.gettempdir(),
        f"connapse_merge_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    shutil.rmtree(tdir, ignore_errors=True)
    base = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    ).repartition(8)
    snapshots.commit_snapshot(base, tdir)
    upd = base.filter(F.col("o_orderkey") % 10 == 3).select(
        "o_orderkey",
        F.lit(-1).cast("long").alias("o_custkey"),
        (F.col("cents") + 1).alias("cents"),
    )
    ins = base.filter(F.col("o_orderkey") % 1000 == 1).select(
        (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
        F.lit(42).cast("long").alias("o_custkey"),
        F.lit(7).cast("long").alias("cents"),
    )
    snapshots.merge_snapshot(spark, upd.unionByName(ins), tdir, "o_orderkey")
    return snapshots.read_snapshot(spark, tdir).orderBy("o_orderkey")


_SQL_SNAPSHOT_MERGE = """
WITH base AS (
  SELECT o_orderkey, o_custkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
upd AS (
  SELECT o_orderkey, CAST(-1 AS BIGINT) AS o_custkey, cents + 1 AS cents
  FROM base WHERE o_orderkey % 10 = 3
),
ins AS (
  SELECT o_orderkey + 100000000 AS o_orderkey,
         CAST(42 AS BIGINT) AS o_custkey, CAST(7 AS BIGINT) AS cents
  FROM base WHERE o_orderkey % 1000 = 1
)
SELECT * FROM (
  SELECT * FROM base WHERE o_orderkey % 10 <> 3
  UNION ALL SELECT * FROM upd
  UNION ALL SELECT * FROM ins
) ORDER BY o_orderkey
""".strip()


def q_leakage_split(spark, sf_dir):
    """Leakage-safe train/test split (sampling.leakage_safe_split): the
    LSH near-dup pair graph collapses to connected components and the
    split hashes the GROUP key — a dup cluster never straddles the
    held-out boundary (the eval-contamination guard a per-doc hash split
    cannot give)."""
    pairs = similarity.embedding_neardup_pairs(
        _t(spark, sf_dir, "embeddings"), threshold=0.3, n_planes=4
    )
    return sampling.leakage_safe_split(
        _t(spark, sf_dir, "documents"), pairs, test_fraction=0.1
    ).orderBy("id")


def q_sample_mix(spark, sf_dir):
    """Training-mix sampling: per-source rates + independent train/test
    split, all row-deterministic (stable under repartitioning)."""
    rates = {"src1": 1.0, "src2": 0.25, "src3": 0.05}
    docs = _t(spark, sf_dir, "documents")
    out = sampling.stratified_sample(docs, rates, "source", "doc_id", default_rate=0.5)
    return out.select(
        "doc_id",
        "source",
        sampling.split_expr(F.col("doc_id").cast("string"), 0.1).alias("split"),
    ).orderBy("doc_id")


def _sql_sample_mix() -> str:
    rates = {"src1": 1.0, "src2": 0.25, "src3": 0.05}
    cut = sampling.sql_stratified_cut(rates, "source", default_rate=0.5)
    return f"""
SELECT doc_id, source, {sampling.sql_split('CAST(doc_id AS VARCHAR)', 0.1)} AS split
FROM documents
WHERE {sampling.sql_hash_bucket('CAST(doc_id AS VARCHAR)', 'sample')} < ({cut})
ORDER BY doc_id
""".strip()


def q_pack_sequences(spark, sf_dir):
    """Concat-and-chop sequence packing per source (char budget 4096)."""
    docs = _t(spark, sf_dir, "documents")
    out = sampling.pack_sequences(docs, 4096, "source", "doc_id", "n_chars")
    return out.orderBy("source", "doc_id")


def _sql_pack_sequences() -> str:
    return (
        sampling.sql_pack_sequences(4096, "source", "doc_id", "n_chars")
        + "\nORDER BY source, doc_id"
    )


def q_repetition_stats(spark, sf_dir):
    """Gopher-rule repetition signals: top-token / top-bigram ownership."""
    return textstats.repetition_stats(_t(spark, sf_dir, "documents"))


def q_contamination(spark, sf_dir):
    """Decontamination screen: docs sharing a 3-gram with the held-out set
    (every 97th doc stands in for a benchmark suite)."""
    docs = _t(spark, sf_dir, "documents")
    held_out = docs.filter(F.col("doc_id") % 97 == 0)
    blocklist = held_out.select(
        F.explode(dedup.shingles_expr(F.col("text"), 3)).alias("s")
    )
    return dedup.contamination_check(docs, blocklist, n=3)


def q_zorder_key(spark, sf_dir):
    """Morton z-key over (o_custkey, o_orderkey) — the multi-column
    clustering key write_zordered lays files out by (plans/zorder.py);
    integer bit interleave, exact mirror."""
    orders = _t(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        zorder.zorder_key_expr(
            [F.col("o_custkey"), F.col("o_orderkey")], bits=14
        ).alias("zkey"),
    ).orderBy("o_orderkey")


def _sql_zorder_key() -> str:
    return (
        "SELECT o_orderkey, "
        + zorder.sql_zorder_key(["o_custkey", "o_orderkey"], bits=14)
        + " AS zkey FROM orders ORDER BY o_orderkey"
    )


def q_quality_logit(spark, sf_dir):
    """Continuous model-based quality score (linear over the Gopher
    feature vector, pinned weights) — the threshold-sweepable companion of
    the hard gopher_filter gate (textstats.quality_score_linear)."""
    return textstats.quality_score_linear(_t(spark, sf_dir, "documents")).orderBy(
        "doc_id"
    )


def q_quality_classifier(spark, sf_dir):
    """TRAINED quality classifier scores (r9 — VERDICT r8 ask #2): MLlib
    LogisticRegression over sha-hashed unigram+bigram features, fit on
    the deterministic labeled fixture (pin-verified by unit test), served
    as a broadcast (bin, weight) join + integer micro-logit sum
    (classifier.quality_classifier_scores) — the DCLM/CCNet model-filter
    stage above the heuristic gates."""
    from connapse_spark.operators import classifier

    return classifier.quality_classifier_scores(
        _t(spark, sf_dir, "documents")
    ).orderBy("doc_id")


def q_curate_classified(spark, sf_dir):
    """corpus_curate with the trained-classifier stage composed in (r9):
    same heuristic stages + a final model_low_quality verdict for docs
    that pass every rule but score below 0 micro-logits under the pinned
    model — the full RefinedWeb+DCLM stage order in one call."""
    from connapse_spark.operators import classifier

    docs = _t(spark, sf_dir, "documents")
    held_out = docs.filter(F.col("doc_id") % 97 == 0)
    blocklist = held_out.select(
        F.explode(dedup.shingles_expr(F.col("text"), 3)).alias("s")
    )
    return curate.curate(
        docs, blocklist, neardup_threshold=0.4, contam_n=3,
        classifier_model=classifier.QC_PINNED_MODEL, min_logit_q=0,
    )


def _sql_quality_classifier_entry() -> str:
    from connapse_spark.operators import classifier

    return classifier.sql_quality_classifier() + " ORDER BY doc_id"


def _sql_curate_classified() -> str:
    from connapse_spark.operators import classifier

    bl = (
        f"SELECT unnest({dedup.sql_shingles('text', 3)}) AS s "
        "FROM documents WHERE doc_id % 97 = 0"
    )
    return curate.sql_curate(
        bl, neardup_threshold=0.4, contam_n=3,
        classifier_model=classifier.QC_PINNED_MODEL, min_logit_q=0,
    )


def q_keyword_snippets(spark, sf_dir):
    """Keyword top-k with result excerpts (earliest-term char window) —
    the result-list rendering surface (search.keyword_search_snippets)."""
    return keyword_search_snippets(
        _t(spark, sf_dir, "documents"), SEARCH_QUERY, k=10
    )


def q_keyword_snippets_indexed(spark, sf_dir):
    """Snippets with the RANKING served from the write-time index (r10 —
    keyword_index.keyword_search_snippets_indexed): posting-list
    candidates rank (row-identical to the scan tier), then only the ≤k
    winners' text is fetched for the excerpt window. Shares the scan
    tier's oracle SQL."""
    docs = _t(spark, sf_dir, "documents")
    idx = keyword_index.build_keyword_index(docs).persist()
    try:
        res = keyword_index.keyword_search_snippets_indexed(
            idx, docs, SEARCH_QUERY, k=10
        )
        rows = res.collect()
        return spark.createDataFrame(rows, res.schema)
    finally:
        idx.unpersist()


def q_embedding_hygiene(spark, sf_dir):
    """Vector-table QA: exact milli-unit norms, zero-vector and z-score
    outlier flags from integer corpus sums (similarity.embedding_hygiene)."""
    return similarity.embedding_hygiene(_t(spark, sf_dir, "embeddings"))


def q_props_extract(spark, sf_dir):
    """Typed JSON-payload extraction + per-type aggregate
    (events.props_extract_agg) — from_json vs DuckDB's independent JSON
    parser."""
    return events.props_extract_agg(events.load_events(spark, sf_dir))


def q_value_percentiles(spark, sf_dir):
    """Exact interpolated value percentiles per event type, long-form
    (events.value_percentiles) — Spark percentile() and DuckDB
    quantile_cont() agree bit-for-bit."""
    return events.value_percentiles(events.load_events(spark, sf_dir))


def q_retention(spark, sf_dir):
    """Weekly cohort retention matrix (events.retention_cohorts) — integer
    epoch-bucket cohorts, TZ-drift-proof."""
    return events.retention_cohorts(events.load_events(spark, sf_dir))


def q_funnel(spark, sf_dir):
    """Ordered view→click→purchase funnel: per-step reach where step i
    must strictly follow the user's earliest step i-1 completion
    (events.funnel_analysis) — fully lazy, k-row output."""
    return events.funnel_analysis(events.load_events(spark, sf_dir))


def q_distinct_sketch(spark, sf_dir):
    """Per-source approximate distinct tokens by linear counting, with the
    exact count alongside (textstats.distinct_sketch_by) — constant-memory
    cardinality where the vocabulary map can't fit."""
    return textstats.distinct_sketch_by(_t(spark, sf_dir, "documents"))


def q_cms_hitters(spark, sf_dir):
    """Count-Min Sketch audit: exact top-20 tokens with their CMS
    estimates (cms_n >= exact_n, bounded overshoot) — the constant-memory
    frequency kernel for streaming/per-partition state
    (textstats.cms_heavy_hitters)."""
    return textstats.cms_heavy_hitters(_t(spark, sf_dir, "documents"), k=20)


def q_cdc_chunks(spark, sf_dir):
    """Content-defined chunk boundaries + per-chunk hashes (gear rolling
    hash, FastCDC family) — insertion-stable dedup segmentation
    (dedup.cdc_chunks). Entry restricted to a 200-doc slice: the DuckDB
    mirror walks a recursive CTE one char per iteration (its only faithful
    formulation — see sql_cdc_chunks), so the oracle side is the costly
    one; the slice keeps the harness fast while checking identical math."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return dedup.cdc_chunks(docs)


def q_quality_sample(spark, sf_dir):
    """Quality-stratified per-source sampling: keep the best 50% of each
    source by the continuous classifier score (sampling.
    quality_stratified_sample) — classifier-score curation, stratified so
    no domain crowds the mix."""
    return sampling.quality_stratified_sample(
        _t(spark, sf_dir, "documents"), keep_fraction=0.5
    )


def q_pq_recall(spark, sf_dir):
    """Recall@10 of the PQ-ADC probe vs the exact L2 top-10 — the
    quantization-loss acceptance gauge (plans/pq.py pq_recall), itself
    value-hash-checked."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(
        to_double_array(F.col("embedding")).alias("_qv")
    )
    return pq.pq_recall(emb, q, k=10)


def q_bpe_merges(spark, sf_dir):
    """Top-20 BPE merge candidates (weighted adjacent symbol pairs) — the
    corpus-scale tokenizer-training kernel; loops on the vocab, not the
    corpus (textstats.bpe_merge_candidates)."""
    return textstats.bpe_merge_candidates(_t(spark, sf_dir, "documents"), k=20)


def q_corpus_curate(spark, sf_dir):
    """One-call curation verdict per document: exact dedup → MinHash
    near-dup → decontamination → Gopher quality, RefinedWeb stage order
    (operators/curate.py). The composition showcase — every stage is an
    already-oracle-checked operator."""
    docs = _t(spark, sf_dir, "documents")
    held_out = docs.filter(F.col("doc_id") % 97 == 0)
    blocklist = held_out.select(
        F.explode(dedup.shingles_expr(F.col("text"), 3)).alias("s")
    )
    return curate.curate(docs, blocklist, neardup_threshold=0.4, contam_n=3)


def _sql_corpus_curate() -> str:
    bl = (
        f"SELECT unnest({dedup.sql_shingles('text', 3)}) AS s "
        "FROM documents WHERE doc_id % 97 = 0"
    )
    return curate.sql_curate(bl, neardup_threshold=0.4, contam_n=3)


BATCH_QUERIES = [
    (1, SEARCH_QUERY),
    (2, "parallel hash aggregation"),
    (3, "columnar storage layout compression"),
]


def q_keyword_many(spark, sf_dir):
    """Batched keyword search: 3 queries answered in ONE job over a shared
    postings aggregation (search.keyword_search_many) — the amortized-batch
    regime BASELINE.md scores."""
    return keyword_search_many(_t(spark, sf_dir, "documents"), BATCH_QUERIES, k=5)


PHRASE_BATCH_QUERIES = [
    (1, '"table hash"'),
    (2, '"customer join"'),
    (3, '"merge group"'),
]


def _scoped_cache_result(spark, cached, res):
    """Materialize a k-bounded result while ``cached`` is persisted, then
    release the cache (ADVICE r9: the positions-tier entries persisted
    the token table with no unpersist, leaking one cached table per
    correctness-gate run — contradicting the r8 scoped-persist cleanup).
    The result is top-k-sized, so rebuilding it as a driver-local frame
    after the collect is free and the returned plan holds no reference
    to the released cache."""
    try:
        rows = res.collect()
        return spark.createDataFrame(rows, res.schema)
    finally:
        cached.unpersist()


def q_keyword_proximity_indexed(spark, sf_dir):
    """Cover-density proximity ranking served from the positions
    postings (r9 — keyword_index.keyword_search_proximity_indexed): the
    TF part and every adjacent-pair 1/mindist bonus compute from the
    write-time (term, id, positions) tables, term-pruned; the oracle is
    the SCAN tier's own proximity SQL, so the served tier is pinned
    row-for-row against the corpus-posexplode plan."""
    tokens = keyword_index.build_token_table(_t(spark, sf_dir, "documents")).persist()
    pe = keyword_index.build_positions_postings(tokens, "tokens_exact")
    ps = keyword_index.build_positions_postings(tokens, "tokens_stemmed")
    return _scoped_cache_result(
        spark,
        tokens,
        keyword_index.keyword_search_proximity_indexed(
            pe, ps, SEARCH_QUERY, k=20
        ).withColumnRenamed("id", "doc_id"),
    )


def q_keyword_many_phrase(spark, sf_dir):
    """BATCHED phrase search served from positions-bearing postings (r9 —
    VERDICT r8 ask #6, keyword_index.keyword_search_many_phrase_indexed):
    3 quoted phrases answered in ONE job against write-time
    (term, id, positions) tables; the oracle is the per-query SCAN-tier
    websearch SQL, so the positions arithmetic (shifted-intersection
    starts + greedy non-overlap fold) is pinned value-for-value against
    the token-array string count."""
    tokens = keyword_index.build_token_table(_t(spark, sf_dir, "documents")).persist()
    pe = keyword_index.build_positions_postings(tokens, "tokens_exact")
    ps = keyword_index.build_positions_postings(tokens, "tokens_stemmed")
    return _scoped_cache_result(
        spark,
        tokens,
        keyword_index.keyword_search_many_phrase_indexed(
            pe, ps, PHRASE_BATCH_QUERIES, k=5
        ),
    )


def _sql_keyword_many_phrase() -> str:
    from connapse_spark.operators.search import sql_keyword_websearch

    parts = []
    for qid, q in PHRASE_BATCH_QUERIES:
        inner = sql_keyword_websearch(q, k=5)
        parts.append(
            f"SELECT CAST({qid} AS BIGINT) AS qid, doc_id AS id, score, "
            f"CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank "
            f"FROM ({inner})"
        )
    return " UNION ALL ".join(parts) + " ORDER BY qid, rank"


def q_keyword_many_indexed(spark, sf_dir):
    """Batched keyword search SERVED from write-time tf-postings (r6):
    identical rows to keyword_many (same oracle SQL) but the corpus
    tokenize + per-(id, term) aggregation is a materialized table the
    query batch only probes — the GIN regime for the batch tier."""
    tokens = keyword_index.build_token_table(_t(spark, sf_dir, "documents")).persist()
    tfe = keyword_index.build_tf_postings(tokens, "tokens_exact")
    tfs = keyword_index.build_tf_postings(tokens, "tokens_stemmed")
    return _scoped_cache_result(
        spark,
        tokens,
        keyword_index.keyword_search_many_indexed(tfe, tfs, BATCH_QUERIES, k=5),
    )


def q_neardup_incremental(spark, sf_dir):
    """Incremental near-dup: the doc_id%5==0 'daily batch' screened
    against the persisted banded index of the remaining corpus — no
    corpus re-hash (dedup.incremental_neardup_pairs)."""
    docs = _t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    index = dedup.minhash_banded(corpus)
    return dedup.incremental_neardup_pairs(batch, index, threshold=0.2)


def q_dataset_card(spark, sf_dir):
    """ONE-row corpus-health card: volume, per-stage drop counts, mean
    classifier score, language mix (curate.dataset_card) — the release
    summary composed from the audited operators."""
    docs = _t(spark, sf_dir, "documents")
    held_out = docs.filter(F.col("doc_id") % 97 == 0)
    blocklist = held_out.select(
        F.explode(dedup.shingles_expr(F.col("text"), 3)).alias("s")
    )
    return curate.dataset_card(docs, blocklist)


def _sql_dataset_card() -> str:
    bl = (
        f"SELECT unnest({dedup.sql_shingles('text', 3)}) AS s "
        "FROM documents WHERE doc_id % 97 = 0"
    )
    return curate.sql_dataset_card(bl)


def q_bloom_contamination(spark, sf_dir):
    """Bloom-filter decontamination twin of q_contamination: same held-out
    blocklist, but membership is j probes into a broadcast constant-size
    bitmap — the blocklist never joins the corpus. One-sided error
    (n_hits >= the exact screen's), exactly mirrored in the oracle."""
    docs = _t(spark, sf_dir, "documents")
    held_out = docs.filter(F.col("doc_id") % 97 == 0)
    blocklist = held_out.select(
        F.explode(dedup.shingles_expr(F.col("text"), 3)).alias("s")
    )
    return dedup.bloom_contamination_check(docs, blocklist, n=3, m_bits=8192, j=5)


def _sql_bloom_contamination() -> str:
    bl = (
        f"SELECT unnest({dedup.sql_shingles('text', 3)}) AS s "
        "FROM documents WHERE doc_id % 97 = 0"
    )
    return dedup.sql_bloom_contamination_check(bl, n=3, m_bits=8192, j=5)


def _sql_contamination() -> str:
    bl = (
        f"SELECT unnest({dedup.sql_shingles('text', 3)}) AS s "
        "FROM documents WHERE doc_id % 97 = 0"
    )
    return dedup.sql_contamination_check(bl, n=3)


_SQL_PII_TEXT = (
    "text || ' contact user' || doc_id || '@example.com or 10.0.' || (doc_id % 256) || '.7 tel +1555' || (1000000 + doc_id)"
)


def q_redact_pii(spark, sf_dir):
    """PII scrub over text with synthesized email/IP/phone per doc (the
    corpus itself is clean)."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(
            "concat(text, ' contact user', doc_id, '@example.com or 10.0.', "
            "doc_id % 256, '.7 tel +1555', 1000000 + doc_id)"
        ).alias("pii_text"),
    )
    out = textstats.redact_pii(docs, text_col="pii_text").orderBy("doc_id")
    return _long(out, "n_email", "n_ipv4", "n_phone")


def _sql_redact_pii() -> str:
    table = f"(SELECT doc_id, {_SQL_PII_TEXT} AS pii_text FROM documents)"
    return (
        textstats.sql_redact_pii(text_col="pii_text", table=table)
        + "\nORDER BY doc_id"
    )


_LANG_PLANTS: list[tuple[int, str]] = [
    # (doc_id beyond the corpus range, text) — one per r7-added language
    # class: Latin-script stopword languages + the script-class detections
    # (kana→ja, Han→zh, Hangul→ko, Cyrillic→ru, Arabic→ar), plus a
    # nothing-matches row that must classify 'unknown'.
    (10000001, "il di che per non sono come anche della nel alla gli dei questo ma piu"),
    (10000002, "de que em para com uma os dos das mais como mas foi ele sua ou"),
    (10000003, "de het een van dat niet op voor met zijn aan ook naar bij uit maar wordt"),
    (10000004, "これは日本語のテキストです。漢字とひらがなが混ざっています。"),
    (10000005, "这是一段中文文本，用于测试语言识别功能。"),
    (10000006, "이것은 한국어 텍스트입니다 언어 감지 테스트"),
    (10000007, "Это русский текст для проверки определения языка"),
    (10000008, "هذا نص عربي لاختبار تحديد اللغة"),
    (10000009, "zxqv 12345 blorp"),
]


def q_language_id_multi(spark, sf_dir):
    """Per-language stopword fractions + script-class fractions + the
    two-tier classification (r7: 7 Latin-script languages by stopwords,
    ja/zh/ko/ru/ar by character-script ranges). The corpus rows exercise
    the English path; the planted rows (one per added language, plus an
    'unknown') exercise each new class — both engines see the identical
    union."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    plants = spark.createDataFrame(_LANG_PLANTS, "doc_id long, text string")
    return textstats.language_id_multi(docs.unionByName(plants))


def _sql_language_id_multi() -> str:
    values = ",\n    ".join(
        f"({i}, '{t}')" for i, t in _LANG_PLANTS
    )
    table = f"""(
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT * FROM (VALUES
    {values}
  ) AS v(doc_id, text)
)"""
    return textstats.sql_language_id_multi(table=table)


_UNICODE_PLANTS: list[tuple[int, str]] = [
    # (doc_id beyond the corpus range, text) — r8 Unicode-tokenizer
    # fixtures: accented Latin (fr/de), Cyrillic, Arabic, Han, kana, plus
    # near-dup PAIRS (ru/zh) so the minhash entry emits non-ASCII
    # candidate pairs. No apostrophes (rows are embedded in oracle VALUES
    # literals); no Greek (utf8proc lower() lacks the contextual
    # final-sigma rule Java/Python apply — documented divergence corner).
    (10000101, "Le café était déjà plein après la fête du village"),
    (10000102, "Füße über der Brücke für die Königin und der König"),
    # ru/zh near-dup pairs: long shared prefix + one differing tail token,
    # so the banded MinHash join provably surfaces them (est_jaccard
    # 0.97/0.84 with the pinned hash family — verified, not assumed)
    (10000103, "привет мир это быстрое сканирование таблицы для поиска данных"
               " в большой системе хранения с высокой скоростью обработки"
               " запросов сегодня"),
    (10000104, "привет мир это быстрое сканирование таблицы для поиска данных"
               " в большой системе хранения с высокой скоростью обработки"
               " запросов вчера"),
    (10000105, "数据库查询优化与快速表扫描测试系统性能分析处理引擎高效执行计划评估一次"),
    (10000106, "数据库查询优化与快速表扫描测试系统性能分析处理引擎高效执行计划评估两次"),
    (10000107, "これは日本語のテキスト処理テストです"),
    (10000108, "هذا اختبار معالجة النصوص العربية"),
]

# Query terms across four scripts: 'café' (exact+stem), Cyrillic words,
# and Han sequences that the bigram tier must match ('数据库' → 数据+据库).
UNICODE_QUERY = "café привет сканирование 数据库 扫描"


def _unicode_docs(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    plants = spark.createDataFrame(_UNICODE_PLANTS, "doc_id long, text string")
    return docs.unionByName(plants)


def _sql_unicode_table() -> str:
    values = ",\n    ".join(f"({i}, '{t}')" for i, t in _UNICODE_PLANTS)
    return f"""(
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT * FROM (VALUES
    {values}
  ) AS v(doc_id, text)
)"""


def q_keyword_unicode(spark, sf_dir):
    """Q3 keyword search with the r8 Unicode tokenizer: a four-script
    query over the corpus ∪ planted non-ASCII docs. The CJK terms only
    match through the char-bigram tier (no word boundaries to split on);
    the Cyrillic/accented terms only tokenize at all under the
    \\p{L}\\p{N} split — under the r7 ASCII split every one was
    invisible. Mirrors reference to_tsvector('simple', ...) Unicode
    behavior (KnowledgeDbContext.cs:232-235)."""
    return keyword_search(_unicode_docs(spark, sf_dir), UNICODE_QUERY, k=20)


def q_gopher_unicode(spark, sf_dir):
    """Gopher quality gate over the corpus ∪ non-ASCII plants: the
    planted rows must emit REAL token counts and pass rule_alpha (any
    Unicode letter) — under the r7 ASCII tokenizer they scored
    n_tokens=0 and were dropped wholesale by rule_length."""
    return textstats.gopher_filter(_unicode_docs(spark, sf_dir))


def q_minhash_unicode(spark, sf_dir):
    """MinHash-LSH near-dup over the corpus ∪ non-ASCII plants: the
    planted ru and zh PAIRS differ by one word / two ideographs, so the
    banded join must surface them as candidates from shingles over
    Unicode tokens (zh shingles are bigram 3-grams)."""
    return dedup.minhash_lsh_pairs(_unicode_docs(spark, sf_dir), threshold=0.2)


def q_gopher_multi(spark, sf_dir):
    """Language-routed Gopher gate (textstats.gopher_filter_multi — r8):
    the stopword rule takes the BEST count across all seven language
    lists, and whole-script languages (CJK/Arabic/Cyrillic) pass it via
    their script fraction — so the planted non-English rows can KEEP
    where the English-only gate drops them. min_tokens lowered so the
    short plants exercise the routed rules end to end."""
    return textstats.gopher_filter_multi(
        _unicode_docs(spark, sf_dir), min_tokens=8
    )


def q_hits_warm(spark, sf_dir):
    """Warm-start HITS (links.hits_warm — the hub/authority twin of
    pagerank_warm): warm(cold_1, 2 more) on the pinned 50-node graph
    equals cold_3, so the oracle is the SAME unrolled 3-iteration SQL
    the cold hits entry pins (every half-step is a pure function of the
    previous vector; its own L1 normalization makes seeding mass
    self-correcting)."""
    from connapse_spark.operators import links as _links

    edges = _pr_edges(_t(spark, sf_dir, "documents"), weighted=False)
    prior = _links.hits(edges, n_iter=1, round_to=None)
    return _links.hits_warm(edges, prior, n_iter=_HITS_ITER - 1, round_to=9).orderBy(
        "node"
    )


def q_embed_quantized(spark, sf_dir):
    """Int8 scalar quantization round-trip: per-vector scale, code digests,
    and max reconstruction error (the 4x-memory index storage path)."""
    emb = _t(spark, sf_dir, "embeddings")
    v = to_double_array(F.col("embedding"))
    q = quantize_expr(v)
    deq = dequantize_expr(q)
    err = F.array_max(F.zip_with(v, deq, lambda a, b: F.abs(a - b)))
    codes = q["codes"]
    out = emb.select(
        "vec_id",
        q["scale"].alias("scale"),
        F.aggregate(codes, F.lit(0), lambda a, c: a + c).cast("long").alias("code_sum"),
        F.array_min(codes).alias("code_min"),
        F.array_max(codes).alias("code_max"),
        err.alias("max_abs_err"),
    ).orderBy("vec_id")
    return _long(out, "code_min", "code_max")


def _sql_embed_quantized() -> str:
    v = "CAST(embedding AS DOUBLE[])"
    scale = sql_quantize_scale("v")
    codes = sql_quantize_codes("v")
    return f"""
WITH q AS (
  SELECT vec_id, v, {scale} AS scale, {codes} AS codes
  FROM (SELECT vec_id, {v} AS v FROM embeddings)
)
SELECT vec_id, scale,
       CAST(list_reduce(list_prepend(0, codes), (a, c) -> a + c) AS BIGINT) AS code_sum,
       CAST(list_min(codes) AS BIGINT) AS code_min,
       CAST(list_max(codes) AS BIGINT) AS code_max,
       list_max(list_transform(range(1, len(v) + 1), i -> abs(v[i] - codes[i] * scale))) AS max_abs_err
FROM q ORDER BY vec_id
""".strip()


def q_cosine_adjacent(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id"), to_double_array("embedding").alias("_va"))
    b = emb.select((F.col("vec_id") - 1).alias("vec_id"), to_double_array("embedding").alias("_vb"))
    cos = cosine_expr(F.col("_va"), F.col("_vb"))
    return (
        a.join(b, "vec_id")
        .select("vec_id", cos.alias("score"), (F.lit(1.0) - cos).alias("distance"))
        .orderBy("vec_id")
    )


_SQL_COSINE_ADJACENT = f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
SELECT a.vec_id AS vec_id, {sql_cosine("a.e", "b.e")} AS score,
       1.0 - {sql_cosine("a.e", "b.e")} AS distance
FROM v a JOIN v b ON b.vec_id = a.vec_id + 1
ORDER BY vec_id
""".strip()


def q_cache_misses(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    cache = docs.filter(F.col("doc_id") % 5 != 0).select(
        F.sha2(F.col("text"), 256).alias("content_hash")
    )
    return cache_misses(docs, cache).select("doc_id", "content_hash").orderBy("doc_id")


_SQL_CACHE_MISSES = """
WITH cache AS (
  SELECT DISTINCT sha256(text) AS content_hash FROM documents WHERE doc_id % 5 != 0
),
hashed AS (
  SELECT doc_id, sha256(text) AS content_hash,
         row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
  FROM documents
)
SELECT doc_id, content_hash FROM hashed
WHERE rn = 1 AND content_hash NOT IN (SELECT content_hash FROM cache)
ORDER BY doc_id
""".strip()


def q_embed_cached(spark, sf_dir):
    """E1+E2 full path: fixed-char chunks → within-batch dedup → cache
    anti-join → Arrow-batched provider UDF on misses → fan back out by hash.
    The default provider is the hash embedder, so the oracle mirrors the
    embedding VALUES too, not just the cache logic."""
    from connapse_spark.operators.embedding import embed_chunks

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 7 == 0)
    chunks = chunking.chunk_fixed_char(docs).select(
        F.concat_ws(":", "document_id", "chunk_index").alias("chunk_id"),
        F.col("content"),
    )
    cache = (
        chunking.chunk_fixed_char(docs.filter(F.col("doc_id") % 2 == 0))
        .select(F.sha2("content", 256).alias("content_hash"))
        .distinct()
        .withColumn("embedding", F.array_repeat(F.lit(-1.0), 64))
        .withColumn("model_id", F.lit("hash-64"))
    )
    out = embed_chunks(chunks, existing_vectors=cache)
    return out.select(
        "chunk_id", "content_hash", *array_digest_cols(F.col("embedding"), "emb")
    ).orderBy("chunk_id")


def _sql_embed_cached() -> str:
    from connapse_spark.functions.embed import sql_embed

    inner = chunking.sql_chunk_fixed_char().replace("ORDER BY document_id, chunk_index", "")
    return f"""
WITH all_chunks AS MATERIALIZED (
  SELECT concat(document_id, ':', chunk_index) AS chunk_id, content
  FROM ({inner}) WHERE document_id % 7 = 0
),
cache AS (
  SELECT DISTINCT sha256(content) AS content_hash,
         list_transform(range(0, 64), x -> -1.0) AS cached_emb
  FROM ({inner}) WHERE document_id % 7 = 0 AND document_id % 2 = 0
),
hashed AS (SELECT chunk_id, content, sha256(content) AS content_hash FROM all_chunks),
with_emb AS (
  SELECT chunk_id, h.content_hash,
         coalesce(cached_emb, {sql_embed('content')}) AS embedding
  FROM hashed h LEFT JOIN cache c ON h.content_hash = c.content_hash
)
SELECT chunk_id, content_hash, {sql_array_digest('embedding', 'emb')}
FROM with_emb ORDER BY chunk_id
""".strip()


# ---------------------------------------------------------------------------
# Dedup / text analysis
# ---------------------------------------------------------------------------


def q_exact_dedup(spark, sf_dir):
    df = dedup.exact_dedup(_t(spark, sf_dir, "documents")).orderBy("doc_id")
    return _long(df, "dup_rank", "group_size")


def q_ngram_jaccard(spark, sf_dir):
    return dedup.ngram_jaccard_pairs(_t(spark, sf_dir, "documents"), threshold=0.2)


def q_ngram_jaccard_prefix(spark, sf_dir):
    return dedup.ngram_jaccard_pairs(_t(spark, sf_dir, "documents"), threshold=0.6)


def q_minhash_lsh(spark, sf_dir):
    return dedup.minhash_lsh_pairs(_t(spark, sf_dir, "documents"), threshold=0.2)


def q_simhash(spark, sf_dir):
    return dedup.simhash_fingerprints(_t(spark, sf_dir, "documents"))


def q_quality(spark, sf_dir):
    df = textstats.quality_stats(_t(spark, sf_dir, "documents")).orderBy("doc_id")
    return _long(df, "n_tokens", "n_ws_tokens", "n_bpe_tokens")


def q_langid(spark, sf_dir):
    return textstats.language_id(_t(spark, sf_dir, "documents")).orderBy("doc_id")


def q_fingerprint(spark, sf_dir):
    return textstats.fingerprint(_t(spark, sf_dir, "documents")).orderBy("doc_id")


LINE_DELIM = " line "  # synthetic corpus has no newlines; same plan, token delimiter


def q_line_dedup(spark, sf_dir):
    """CCNet/RefinedWeb line-wise boilerplate removal (segments recurring in
    >= 3 distinct docs are stripped; 41 segments hit at sf0.01)."""
    return dedup.line_dedup(
        _t(spark, sf_dir, "documents"), min_docs=3, delimiter=LINE_DELIM
    )


def q_gopher_filter(spark, sf_dir):
    """Gopher-style composite quality gate: per-rule booleans + keep, all
    integer counts and exact IEEE divisions (bit-strict oracle)."""
    return textstats.gopher_filter(_t(spark, sf_dir, "documents"))


def q_token_entropy(spark, sf_dir):
    """Unigram entropy per doc (information-density quality signal)."""
    return textstats.token_entropy(_t(spark, sf_dir, "documents"))


def q_tfidf_top_terms(spark, sf_dir):
    """Top-5 characteristic terms per doc by tf·ln(N/df) over stemmed tokens."""
    return textstats.tfidf_top_terms(_t(spark, sf_dir, "documents"), k=5)


def q_perplexity(spark, sf_dir):
    """CCNet-style quality bucketing signal: per-doc mean NLL under a
    self-fit Lidstone unigram LM, exact integer micro-nat accounting."""
    return textstats.perplexity_score(_t(spark, sf_dir, "documents"))


def q_dup_spans(spark, sf_dir):
    """Exact-substring dedup signal: fraction of 16-token spans repeated
    anywhere in the corpus (60-bit hashed spans, longs-only shuffle)."""
    return dedup.dup_span_stats(_t(spark, sf_dir, "documents"), n=16)


def q_dsir(spark, sf_dir):
    """DSIR importance weights vs the English subset as target: docs whose
    token mix resembles lang='en' rows get positive mean log ratios."""
    docs = _t(spark, sf_dir, "documents")
    return textstats.dsir_weights(docs, docs.filter(F.col("lang") == "en"))


def q_lang_mismatch(spark, sf_dir):
    """Metadata-hygiene screen: declared lang tag vs stopword detector."""
    return textstats.lang_mismatch(_t(spark, sf_dir, "documents"))


def q_top_bigrams(spark, sf_dir):
    """Corpus-wide top-20 token bigrams (tokenizer/merge-table counting pass)."""
    return textstats.top_ngrams(_t(spark, sf_dir, "documents"), n=2, k=20)


def q_cluster_assign(spark, sf_dir):
    """One Lloyd assignment step against the 8 lowest-id seed vectors —
    the oracle-checkable kernel under the rows-only ann_ivf path."""
    return similarity.cluster_assign(_t(spark, sf_dir, "embeddings"), k=8)


def q_cluster_sizes(spark, sf_dir):
    """Cluster population histogram + exact score extrema for the same
    deterministic seed clustering."""
    return similarity.cluster_sizes(_t(spark, sf_dir, "embeddings"), k=8)


def q_random_projection(spark, sf_dir):
    """JL ±1 sketch to 16 components, long format (id, component, value)."""
    return similarity.random_projection(_t(spark, sf_dir, "embeddings"), out_dims=16)


def q_semdedup(spark, sf_dir):
    """SemDeDup (arXiv:2303.09540): cluster-bucketed semantic dedup — the
    lowest-id member of every within-cluster cosine neighborhood survives.
    k is DERIVED from the corpus size (semdedup_n_clusters: k ≈ N/1024, the
    paper's own scaling rule) so per-cluster quadratic work stays bounded at
    any scale — never a fixed k. Small-SF floor keeps k ≥ 8 so the test
    corpus still exercises multi-cluster bucketing."""
    n = _parquet_rows(sf_dir, "embeddings")
    k = max(8, similarity.semdedup_n_clusters(n))
    return similarity.semdedup(_t(spark, sf_dir, "embeddings"), k=k, threshold=0.3)


# ---------------------------------------------------------------------------
# Chunking (oracle-checkable column-expression tier)
# ---------------------------------------------------------------------------


def _chunk_semantic(spark, sf_dir, method):
    """C3 semantic chunks; the mean-pooled window embedding is projected to
    its scalar digest for the driver canonicalizer (array API unchanged)."""
    from connapse_spark.operators.semantic_chunking import semantic_chunks

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    df = semantic_chunks(docs, method=method).select(
        "document_id", "chunk_index", "content", "n_sentences", "token_count",
        *array_digest_cols(F.col("embedding"), "emb"),
    )
    return _long(df, "chunk_index", "n_sentences", "token_count")


def q_chunk_semantic(spark, sf_dir):
    return _chunk_semantic(spark, sf_dir, "Percentile")


def q_chunk_semantic_stddev(spark, sf_dir):
    return _chunk_semantic(spark, sf_dir, "StandardDeviation")


def q_chunk_semantic_gradient(spark, sf_dir):
    return _chunk_semantic(spark, sf_dir, "Gradient")


def q_chunk_fixed_char(spark, sf_dir):
    df = chunking.chunk_fixed_char(_t(spark, sf_dir, "documents"))
    return _long(df, "chunk_index", "start_offset", "end_offset")


def q_chunk_token_window(spark, sf_dir):
    df = chunking.chunk_token_window(_t(spark, sf_dir, "documents"))
    return _long(df, "chunk_index")


# ---------------------------------------------------------------------------
# ANN index (M6 north star), posting-list keyword, rerank, parse, ingest,
# multimodal
# ---------------------------------------------------------------------------


def q_ann_lsh(spark, sf_dir):
    from connapse_spark.functions.embed import embed_py

    qv = embed_py(SEARCH_QUERY, 64)
    idx = ivf.build_lsh_index(_t(spark, sf_dir, "embeddings"), n_planes=4)
    return ivf.ann_lsh_topk(idx, qv, k=10, n_planes=4)


def q_ann_ivf(spark, sf_dir):
    """KMeans IVF probe — iterative MLlib fit, not SQL-expressible; the
    driver records the weaker rows-only check (SURVEY §4: the one genuinely
    new physical structure)."""
    from connapse_spark.functions.embed import embed_py

    qv = embed_py(SEARCH_QUERY, 64)
    index, centroids = ivf.build_ivf_index(
        _t(spark, sf_dir, "embeddings"), n_lists=8, seed=42
    )
    return q_fix_types(ivf.ann_ivf_topk(index, centroids, qv, k=10, nprobe=3))


def q_fix_types(df):
    return df.withColumn("list_id", F.col("list_id").cast("long"))


def q_ivf_upsert(spark, sf_dir):
    """Incremental M6 maintenance: assign a new batch to EXISTING seeded
    centroids (no refit) and LWW-merge — 20 inserts under shifted ids plus
    20 same-id re-upserts (the output row count proves the LWW dedup)."""
    emb = _t(spark, sf_dir, "embeddings")
    index, centroids = ivf.build_ivf_index_seeded(emb, n_lists=8)
    low = emb.filter(F.col("vec_id") < 20)
    new = low.select((F.col("vec_id") + 10_000).alias("vec_id"), "embedding").unionByName(
        low.select("vec_id", "embedding")
    )
    merged = ivf.ivf_index_upsert(index, centroids, new)
    return merged.select("id", "list_id", "norm").orderBy("id")


def q_ann_ivf_seeded(spark, sf_dir):
    """Deterministic-IVF twin: seed centroids + one Lloyd assignment step,
    literal-IN pruned probe — the full ANN path under a value-hash oracle
    (the sampled-KMeans build keeps its rows-only check)."""
    from connapse_spark.functions.embed import embed_py

    qv = embed_py(SEARCH_QUERY, 64)
    index, centroids = ivf.build_ivf_index_seeded(
        _t(spark, sf_dir, "embeddings"), n_lists=8
    )
    return ivf.ann_ivf_topk(index, centroids, qv, k=10, nprobe=3)


def q_ivf_drift(spark, sf_dir):
    """M6 rebuild-on-drift gauge over the seeded index: per-list mean
    refresh (one Lloyd update) vs the stored assignment — the one-row
    reassignment fraction a rebuild policy thresholds on."""
    index, _ = ivf.build_ivf_index_seeded(
        _t(spark, sf_dir, "embeddings"), n_lists=8
    )
    return ivf.ivf_drift(index)


def q_pq_encode(spark, sf_dir):
    """Product-quantization encode: (vec_id, 4-byte pq_code, recon_err).
    The stored artifact of the 64×-compression ANN path (plans/pq.py)."""
    return pq.pq_encode(_t(spark, sf_dir, "embeddings")).orderBy("vec_id")


def q_pq_topk(spark, sf_dir):
    """ADC top-10 by product-quantized L2 distance to vec 0's embedding —
    the probe side of the PQ index, fused for oracle checkability; the
    stored-codes LUT probe is unit-tested bit-equal (tests/test_round3.py)."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(
        to_double_array(F.col("embedding")).alias("_qv")
    )
    return pq.pq_topk(emb, q, k=10)


def q_ann_ivfpq(spark, sf_dir):
    """IVFPQ probe end-to-end under the value-hash oracle: seeded list
    routing (nprobe=3 of 8 lists pruned before any scoring) + 4-byte PQ
    codes scored against the broadcast ADC LUT (plans/pq.py ivfpq_*)."""
    from connapse_spark.functions.embed import embed_py

    qv = embed_py(SEARCH_QUERY, 64)
    codes, books, cents = pq.ivfpq_build(
        _t(spark, sf_dir, "embeddings"), n_lists=8
    )
    return pq.ivfpq_probe(codes, books, cents, qv, k=10, nprobe=3)


def q_keyword_indexed(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    tokens = keyword_index.build_token_table(docs).cache()
    pe = keyword_index.build_postings(tokens, "tokens_exact")
    ps = keyword_index.build_postings(tokens, "tokens_stemmed")
    return _scoped_cache_result(
        spark,
        tokens,
        keyword_index.keyword_search_indexed(tokens, pe, ps, SEARCH_QUERY, k=20),
    )


def q_keyword_indexed_phrase(spark, sf_dir):
    """Websearch (phrase + negation + OR) SERVED from the write-time
    index (r8 — VERDICT r7 ask #8: the served tier lost phrase
    semantics): posting lists screen candidates per OR-group, the stored
    token arrays verify adjacency — zero corpus re-tokenize. The oracle
    is the SCAN tier's own websearch SQL: the index is a physical
    structure, so rows must be identical."""
    docs = _t(spark, sf_dir, "documents")
    tokens = keyword_index.build_token_table(docs).cache()
    pe = keyword_index.build_postings(tokens, "tokens_exact")
    ps = keyword_index.build_postings(tokens, "tokens_stemmed")
    return _scoped_cache_result(
        spark,
        tokens,
        keyword_index.keyword_search_websearch_indexed(
            tokens, pe, ps, WEBSEARCH_QUERY, k=20
        ),
    )


def q_hybrid_indexed(spark, sf_dir):
    """hybrid_search SERVED from the posting-list keyword index (VERDICT r5
    ask #2): keyword candidates come from the write-time postings + token
    table instead of a full-scan re-tokenize. The oracle is IDENTICAL to
    hybrid_cc's — the index is a physical structure, so the rows must be
    row-equal to the full-scan hybrid."""
    docs = _t(spark, sf_dir, "documents")
    # persist via the bundle (not a bare .cache() on one member) so a
    # caller holding the index can pair it with idx.unpersist(); the
    # driver's one-shot evaluation still benefits — tokens feeds three
    # subtrees (two postings builds + the scorer) in this single plan
    idx = keyword_index.build_keyword_index(docs).persist()
    out = hybrid_search(
        docs,
        SEARCH_QUERY,
        SearchOptions(top_k=10, fusion="ConvexCombination", fusion_alpha=0.5),
        vectors=_vectors(spark, sf_dir),
        keyword_index=idx,
    )
    try:
        res = out.withColumnRenamed("id", "doc_id")
        rows = res.collect()
        return spark.createDataFrame(rows, res.schema)
    finally:
        idx.unpersist()


def q_hybrid_ann(spark, sf_dir):
    """Hybrid search with BOTH branches served from write-time index
    structures: keyword from the posting-list index, semantic from the
    seeded IVF vector index at FULL probe (nprobe = n_lists) — the regime
    proving the indexes are physical structures, not semantic changes. The
    oracle is IDENTICAL to hybrid_cc's: full-probe candidates are the whole
    corpus and vector_index scoring reuses vector_knn's exact cosine
    expression, so rows must be row-equal to the scan pipeline (reference:
    pgvector ivfflat + GIN serve the same SQL the seq-scan plan answers)."""
    docs = _t(spark, sf_dir, "documents")
    vidx = ivf.build_vector_index(
        _vectors(spark, sf_dir), n_lists=8, nprobe=8, id_col="id", seeded=True
    ).persist()
    kidx = keyword_index.build_keyword_index(docs).persist()
    out = hybrid_search(
        docs,
        SEARCH_QUERY,
        SearchOptions(top_k=10, fusion="ConvexCombination", fusion_alpha=0.5),
        keyword_index=kidx,
        vector_index=vidx,
    )
    try:
        res = out.withColumnRenamed("id", "doc_id")
        rows = res.collect()
        return spark.createDataFrame(rows, res.schema)
    finally:
        vidx.unpersist()
        kidx.unpersist()


def _hybrid_both_indexed(spark, sf_dir, fusion: str):
    """Both branches served (posting-list keyword + full-probe seeded IVF)
    under the given fusion method — the composition pin: fusion and index
    serving are ORTHOGONAL stages of hybrid_search, so each fused indexed
    tier must be row-equal to its scan twin and shares its oracle."""
    docs = _t(spark, sf_dir, "documents")
    vidx = ivf.build_vector_index(
        _vectors(spark, sf_dir), n_lists=8, nprobe=8, id_col="id", seeded=True
    ).persist()
    kidx = keyword_index.build_keyword_index(docs).persist()
    out = hybrid_search(
        docs,
        SEARCH_QUERY,
        SearchOptions(top_k=10, fusion=fusion, fusion_alpha=0.5),
        vectors=_vectors(spark, sf_dir),
        keyword_index=kidx,
        vector_index=vidx,
    )
    try:
        res = out.withColumnRenamed("id", "doc_id")
        rows = res.collect()
        return spark.createDataFrame(rows, res.schema)
    finally:
        vidx.unpersist()
        kidx.unpersist()


def q_hybrid_dbsf_indexed(spark, sf_dir):
    """DBSF fusion over fully index-served branches (r10): distribution-
    based score fusion's mean/std normalization runs on candidate sets
    that came from the postings + IVF structures — row-equal to the
    scan-tier hybrid_dbsf, whose oracle it shares."""
    return _hybrid_both_indexed(spark, sf_dir, "Dbsf")


def q_hybrid_rrf_indexed(spark, sf_dir):
    """RRF fusion over fully index-served branches (r10): rank-only
    fusion composed with index serving — row-equal to hybrid_rrf, whose
    oracle it shares."""
    return _hybrid_both_indexed(spark, sf_dir, "Rrf")


def q_hybrid_ann_probe(spark, sf_dir):
    """The SUBLINEAR serving regime: semantic branch scans only the 3 of 8
    probed inverted lists (|corpus|·3/8 of the vectors; at 100 TB the
    list_id-partitioned index makes the probe partition pruning). Its own
    exact oracle (oracle.hybrid_ann_sql) mirrors the probe: seeded
    assignment + seed-centroid ranking + probed cosine, so this pins the
    approximate path's semantics value-for-value, not just its recall."""
    docs = _t(spark, sf_dir, "documents")
    vidx = ivf.build_vector_index(
        _vectors(spark, sf_dir), n_lists=8, nprobe=3, id_col="id", seeded=True
    ).persist()
    out = hybrid_search(
        docs,
        SEARCH_QUERY,
        SearchOptions(top_k=10, fusion="ConvexCombination", fusion_alpha=0.5),
        vector_index=vidx,
    )
    try:
        res = out.withColumnRenamed("id", "doc_id")
        rows = res.collect()
        return spark.createDataFrame(rows, res.schema)
    finally:
        vidx.unpersist()


def q_hybrid_rerank(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    hits = _hybrid(spark, sf_dir).select("doc_id", "score")
    with_content = hits.join(docs.select("doc_id", "text"), "doc_id")
    out = rerank(with_content, SEARCH_QUERY, id_col="doc_id", content_col="text")
    return out.select("doc_id", "score", "fused_score").orderBy(
        F.desc("score"), "doc_id"
    )


def _sql_hybrid_rerank() -> str:
    inner = oracle.hybrid_sql(SEARCH_QUERY, stored_vectors=True)
    return f"""
WITH hybrid_hits AS ({inner}
)
SELECT h.doc_id, {sql_fake_cross_encoder(SEARCH_QUERY, "d.text")} AS score,
       h.score AS fused_score
FROM hybrid_hits h JOIN documents d ON h.doc_id = d.doc_id
ORDER BY score DESC, h.doc_id
""".strip()


def q_hybrid_window(spark, sf_dir):
    """Q11 end-to-end: hybrid hits + sentence-window metadata → substitution.
    Window values are synthesized deterministically per doc: %3==0 a real
    window, %3==1 whitespace-only (the IsNullOrWhiteSpace guard must KEEP
    the content), else absent."""
    docs = _t(spark, sf_dir, "documents")
    hits = _hybrid(spark, sf_dir).select("doc_id", "score")
    j = hits.join(
        docs.select("doc_id", F.col("text").alias("content")), "doc_id"
    )
    win = (
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit("W| "), F.substring("content", 1, 60)),
        )
        .when(F.col("doc_id") % 3 == 1, F.lit("   "))
        .otherwise(F.lit(None).cast("string"))
    )
    j = j.withColumn("metadata", F.create_map(F.lit("window"), win))
    out = window_substitution(j, content_col="content")
    return out.select("doc_id", "score", "content").orderBy(F.desc("score"), "doc_id")


def _sql_hybrid_window() -> str:
    inner = oracle.hybrid_sql(SEARCH_QUERY, stored_vectors=True)
    return f"""
WITH hybrid_hits AS ({inner}
),
j AS (
  SELECT h.doc_id, h.score, d.text AS content,
         CASE WHEN h.doc_id % 3 = 0 THEN concat('W| ', substring(d.text, 1, 60))
              WHEN h.doc_id % 3 = 1 THEN '   ' ELSE NULL END AS win
  FROM hybrid_hits h JOIN documents d ON h.doc_id = d.doc_id
)
SELECT doc_id, score,
       CASE WHEN win IS NOT NULL AND trim(win) != '' THEN win ELSE content END AS content
FROM j ORDER BY score DESC, doc_id
""".strip()


_EXTS = ["md", "txt", "csv", "log", "json"]


def _doc_path(docs):
    ext = F.element_at(
        F.array(*[F.lit(e) for e in _EXTS]), (F.col("doc_id") % 5 + 1).cast("int")
    )
    return F.concat(
        F.lit("/"), F.col("source"), F.lit("/doc_"), F.col("doc_id").cast("string"),
        F.lit("."), ext,
    )


_SQL_DOC_PATH = (
    "concat('/', source, '/doc_', doc_id, '.', ['md','txt','csv','log','json'][(doc_id % 5 + 1)::INT])"
)


def q_parse_text(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").withColumn("path", _doc_path(None))
    out = parsers.parse_text_documents(docs)
    return _long(
        out.select(
            "doc_id", "file_type", "line_count", "has_markdown_headers", "csv_delimiter"
        ).orderBy("doc_id"),
        "line_count",
    )


def _sql_parse_text() -> str:
    return f"""
WITH d AS (SELECT doc_id, text, {_SQL_DOC_PATH} AS path FROM documents)
SELECT doc_id, file_type, line_count, has_markdown_headers, csv_delimiter
FROM ({parsers.sql_parse_text_documents(table='d')})
ORDER BY doc_id
""".strip()


# wider modulus than _EXTS so the P5 gate actually rejects: exe/bin are
# unsupported, pdf/docx route to the binary parser family
_DISPATCH_EXTS = ["md", "txt", "csv", "pdf", "docx", "html", "exe", "bin"]


def _dispatch_path(docs):
    ext = F.element_at(
        F.array(*[F.lit(e) for e in _DISPATCH_EXTS]), (F.col("doc_id") % 8 + 1).cast("int")
    )
    return F.concat(
        F.lit("/"), F.col("source"), F.lit("/doc_"), F.col("doc_id").cast("string"),
        F.lit("."), ext,
    )


_SQL_DISPATCH_PATH = (
    "concat('/', source, '/doc_', doc_id, '.', "
    "['md','txt','csv','pdf','docx','html','exe','bin'][(doc_id % 8 + 1)::INT])"
)


def q_parser_dispatch(spark, sf_dir):
    """P4+P5: validator gate + parser-family dispatch over a path column."""
    docs = _t(spark, sf_dir, "documents").withColumn("path", _dispatch_path(None))
    return docs.select(
        "doc_id",
        parsers.file_ext(F.col("path")).alias("file_type"),
        parsers.is_supported_expr(F.col("path")).alias("supported"),
        parsers.parser_kind_expr(F.col("path")).alias("parser"),
    ).orderBy("doc_id")


def _sql_parser_dispatch() -> str:
    return f"""
WITH d AS (SELECT doc_id, {_SQL_DISPATCH_PATH} AS path FROM documents)
SELECT doc_id,
       {parsers.sql_file_ext('path')} AS file_type,
       {parsers.sql_is_supported('path')} AS supported,
       {parsers.sql_parser_kind('path')} AS parser
FROM d ORDER BY doc_id
""".strip()


def _markdown_col():
    """Deterministic multi-level markdown synthesized from doc text (the
    corpus has no headings): # → ## → ### → ## exercises the stack pops."""
    return F.concat_ws(
        "\n",
        F.concat(F.lit("# Doc "), F.col("doc_id").cast("string")),
        F.substring("text", 1, 60),
        F.lit("## Methods"),
        F.substring("text", 61, 80),
        F.lit("### Detail"),
        F.substring("text", 141, 60),
        F.lit("## Results"),
        F.expr("substring(text, 201)"),
    )


_SQL_MARKDOWN = (
    "concat_ws(chr(10), '# Doc ' || doc_id, substr(text, 1, 60), '## Methods', "
    "substr(text, 61, 80), '### Detail', substr(text, 141, 60), '## Results', "
    "substr(text, 201))"
)


def q_parse_binary(spark, sf_dir):
    """P2/P3: real stdlib PDF/docx/pptx decoding over the fixed fixture
    corpus (``sources/docgen.fixture_corpus`` — deterministic bytes, so the
    decode is a pure function).  The oracle pins the expected outputs as
    literals: page/slide counts, sha256 of the extracted text (page markers,
    ``" | "`` table rows — PdfParser.cs:55-80, OfficeParser.cs:62-208),
    warning counts, and error codes for the corrupt/unsupported rows."""
    from connapse_spark.sources.docgen import fixture_corpus

    blobs = spark.createDataFrame(fixture_corpus(), "path string, content binary")
    parsed = parsers.parse_binary_documents(blobs)
    return parsed.select(
        "path",
        F.col("metadata")["Title"].alias("title"),
        "n_pages",
        F.sha2(F.col("content"), 256).alias("content_sha"),
        F.size("warnings").alias("n_warnings"),
        "parse_error",
    ).orderBy("path")


def _sql_parse_binary() -> str:
    # expected outputs of the pure decode function over the fixed fixture
    # bytes; regenerate with: python -c "see tests/test_pipeline.py
    # test_parse_binary_oracle_constants"
    rows = [
        ("/fx/book.epub", "'A Tiny Book'", 3,
         "97abb1541167427f97b0985f054f0a79d488bf5e9705998427aeed69c6d0ce31", 0, "NULL"),
        ("/fx/cid.pdf", "NULL", 2,
         "f4ff7f1ba39eff2dac32f6023558da312875515246fac470b4ea9dea52589160", 0, "NULL"),
        ("/fx/deck.pptx", "'Deck'", 3,
         "8572a8248909fa3b434416f23989b9b8c6192d1817064b0808944b3179cf7e90", 0, "NULL"),
        ("/fx/modern.pdf", "'Modern'", 2,
         "6e12a0d8907bbfd5afbc5e8cc40c2721a01d7dd865eb36c9b51e640345bd385c", 0, "NULL"),
        ("/fx/empty.pdf", "NULL", 1,
         "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855", 2, "NULL"),
        ("/fx/notes.docx", "'Notes'", 1,
         "5c9c3bf11ad90833a0d0cd347f03f32d287d2c0e7f925417343a8f6ae483dc1d", 0, "NULL"),
        ("/fx/raw.pdf", "NULL", 1,
         "3352612730d50e8884db10858308c527ccd4bf90366047b61c9f8f5f55f29a1c", 0, "NULL"),
        ("/fx/report.pdf", "'Q3 Report'", 2,
         "13ea15b0c7e2229cdd90b7de4011608ec77045ee0efba8b4165d3b439dc8fa79", 0, "NULL"),
        ("/fx/ruined.docx", "NULL", 0,
         "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855", 1, "'BadZipFile'"),
        ("/fx/unknown.bin", "NULL", 0,
         "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855", 1, "'UnsupportedFormat'"),
    ]
    values = ",\n  ".join(
        f"('{p}', {t}, {n}, '{sha}', {w}, {e})" for p, t, n, sha, w, e in rows
    )
    return f"""
SELECT path, CAST(title AS VARCHAR) AS title, CAST(n_pages AS INTEGER) AS n_pages,
       content_sha, CAST(n_warnings AS INTEGER) AS n_warnings,
       CAST(parse_error AS VARCHAR) AS parse_error
FROM (VALUES
  {values}
) AS t(path, title, n_pages, content_sha, n_warnings, parse_error)
ORDER BY path
""".strip()


def q_parse_warc(spark, sf_dir):
    """WARC ingest (sources/warc.py — the Common Crawl stage-one path the
    reference's parser family lacks): parse the deterministic fixture
    archives (gzip-member + plain layouts, warcinfo/request/response
    types, non-200, non-text, latin-1 charset, a bad-Content-Length
    record to skip over, a truncated tail, and HTTP payload codings —
    Transfer-Encoding: chunked, Content-Encoding: gzip/deflate, and
    gzip-inside-chunked, each pinned to decode byte-identically to the
    plain twin) and project the full record surface. The oracle pins the
    expected outputs of the pure parser as literals, the
    ``parse_binary`` discipline."""
    from connapse_spark.sources import warc as _warc

    blobs = spark.createDataFrame(_warc.fixture_warc(), "path string, content binary")
    recs = _warc.warc_records(blobs)
    return recs.select(
        "warc_file",
        "record_idx",
        "warc_type",
        "target_uri",
        "http_status",
        "content_type",
        F.substring(F.sha2(F.col("payload"), 256), 1, 16).alias("payload_sha"),
        F.substring(F.sha2(F.col("text").cast("binary"), 256), 1, 16).alias("text_sha"),
        F.col("warning").isNotNull().alias("has_warning"),
    ).orderBy("warc_file", "record_idx")


def _sql_parse_warc() -> str:
    # pinned outputs of the pure WARC parser over the fixture bytes;
    # regenerate with tests/test_warc_html.py::test_parse_warc_oracle_constants
    rows = [
        ("/fx/good.warc", 0, "'warcinfo'", "NULL", "NULL",
         "'application/warc-fields'", "70e6e9bcb686d6cc", "NULL", "false"),
        ("/fx/good.warc", 1, "'request'", "'https://a.example/'", "NULL",
         "'application/http; msgtype=request'", "093d5adc97678383", "NULL", "false"),
        ("/fx/good.warc", 2, "'response'", "'https://a.example/'", 200,
         "'text/html; charset=utf-8'", "caf73b9e3e76ec9e", "'caf73b9e3e76ec9e'", "false"),
        ("/fx/good.warc", 3, "'response'", "'https://a.example/missing'", 404,
         "'text/plain'", "283bb9deef02e684", "'283bb9deef02e684'", "false"),
        ("/fx/good.warc", 4, "'response'", "'https://a.example/doc.pdf'", 200,
         "'application/pdf'", "932d2676c1e461ba", "NULL", "false"),
        ("/fx/good.warc", 5, "'response'", "'https://b.example/latin'", 200,
         "'text/html; charset=iso-8859-1'", "0230b0c519322940", "'4fe8ae2ecdb0a611'", "false"),
        ("/fx/good.warc", 6, "'response'", "'https://b.example/sniff'", 200,
         "'text/html'", "591e56cd9f73856c", "'591e56cd9f73856c'", "false"),
        ("/fx/good.warc", 7, "'response'", "'https://b.example/meta-charset'", 200,
         "'text/html'", "f6162e02e03d4cec", "'6692046f924c336b'", "false"),
        # rows 8-11: Transfer-Encoding/Content-Encoding payloads — each
        # decodes to the SAME payload/text sha as plain row 2 (round-trip)
        ("/fx/good.warc", 8, "'response'", "'https://c.example/chunked'", 200,
         "'text/html; charset=utf-8'", "caf73b9e3e76ec9e", "'caf73b9e3e76ec9e'", "false"),
        ("/fx/good.warc", 9, "'response'", "'https://c.example/gzipped'", 200,
         "'text/html; charset=utf-8'", "caf73b9e3e76ec9e", "'caf73b9e3e76ec9e'", "false"),
        ("/fx/good.warc", 10, "'response'", "'https://c.example/chunked-gzip'", 200,
         "'text/html; charset=utf-8'", "caf73b9e3e76ec9e", "'caf73b9e3e76ec9e'", "false"),
        ("/fx/good.warc", 11, "'response'", "'https://c.example/deflated'", 200,
         "'text/html; charset=utf-8'", "caf73b9e3e76ec9e", "'caf73b9e3e76ec9e'", "false"),
        ("/fx/mixed.warc", 0, "'response'", "'https://a.example/'", 200,
         "'text/html; charset=utf-8'", "caf73b9e3e76ec9e", "'caf73b9e3e76ec9e'", "false"),
        ("/fx/mixed.warc", 1, "'response'", "'https://a.example/missing'", 404,
         "'text/plain'", "283bb9deef02e684", "'283bb9deef02e684'", "true"),
        ("/fx/trunc.warc", 0, "'response'", "'https://a.example/'", 200,
         "'text/html; charset=utf-8'", "d948af4674bba925", "'d948af4674bba925'", "true"),
    ]
    # the gzip-member layout parses byte-identically to the plain one
    gz_twin = [
        (p.replace("/fx/good.warc", "/fx/good.warc.gz"), *rest)
        for p, *rest in rows
        if p == "/fx/good.warc"
    ]
    values = ",\n  ".join(
        f"('{p}', {i}, {t}, {u}, {s if s is not None else 'NULL'}, {c}, '{ps}', {ts}, {w})"
        for p, i, t, u, s, c, ps, ts, w in rows + gz_twin
    )
    return f"""
SELECT warc_file, CAST(record_idx AS INTEGER) AS record_idx,
       warc_type, CAST(target_uri AS VARCHAR) AS target_uri,
       CAST(http_status AS INTEGER) AS http_status, content_type,
       payload_sha, CAST(text_sha AS VARCHAR) AS text_sha, has_warning
FROM (VALUES
  {values}
) AS t(warc_file, record_idx, warc_type, target_uri, http_status,
       content_type, payload_sha, text_sha, has_warning)
ORDER BY warc_file, record_idx
""".strip()


def q_cdx_index(spark, sf_dir):
    """CDX capture index over the WARC fixtures (sources/warc.py
    cdx_index — the random-access structure Common Crawl publishes as its
    url index): one row per response/revisit capture, keyed by SURT
    urlkey + 14-digit timestamp, addressing the record by (filename,
    offset, length). The parse facts (offsets, digests) are pinned
    literals — the parse_warc discipline — but the urlkey and timestamp
    are COMPUTED on both engines (web.surt_key_expr vs its DuckDB
    mirror), so the canonicalization math is genuinely cross-checked.
    A unit test (tests/test_warc_html.py) seeks every (offset, length)
    back into the archive bytes and re-parses exactly one record."""
    from connapse_spark.sources import warc as _warc

    blobs = spark.createDataFrame(
        _warc.fixture_warc_cdx(), "path string, content binary"
    )
    return _warc.cdx_index(blobs)


# pinned raw facts of the pure located parser over the fixture bytes;
# regenerate with tests/test_warc_html.py::test_cdx_oracle_constants
_CDX_PINNED_ROWS = [
        ("/fx/good.warc.gz", 409, 293, "https://a.example/", "2024-01-01T00:00:00Z", 200, "'text/html'", "NULL", "caf73b9e3e76ec9e"),
        ("/fx/good.warc.gz", 702, 240, "https://a.example/missing", "2024-01-01T00:00:00Z", 404, "'text/plain'", "NULL", "283bb9deef02e684"),
        ("/fx/good.warc.gz", 942, 243, "https://a.example/doc.pdf", "2024-01-01T00:00:00Z", 200, "'application/pdf'", "NULL", "932d2676c1e461ba"),
        ("/fx/good.warc.gz", 1185, 252, "https://b.example/latin", "2024-01-01T00:00:00Z", 200, "'text/html'", "NULL", "0230b0c519322940"),
        ("/fx/good.warc.gz", 1437, 250, "https://b.example/sniff", "2024-01-01T00:00:00Z", 200, "NULL", "NULL", "591e56cd9f73856c"),
        ("/fx/good.warc.gz", 1687, 266, "https://b.example/meta-charset", "2024-01-01T00:00:00Z", 200, "'text/html'", "NULL", "f6162e02e03d4cec"),
        ("/fx/good.warc.gz", 1953, 331, "https://c.example/chunked", "2024-01-01T00:00:00Z", 200, "'text/html'", "NULL", "caf73b9e3e76ec9e"),
        ("/fx/good.warc.gz", 2284, 366, "https://c.example/gzipped", "2024-01-01T00:00:00Z", 200, "'text/html'", "NULL", "caf73b9e3e76ec9e"),
        ("/fx/good.warc.gz", 2650, 391, "https://c.example/chunked-gzip", "2024-01-01T00:00:00Z", 200, "'text/html'", "NULL", "caf73b9e3e76ec9e"),
        ("/fx/good.warc.gz", 3041, 357, "https://c.example/deflated", "2024-01-01T00:00:00Z", 200, "'text/html'", "NULL", "caf73b9e3e76ec9e"),
        ("/fx/good.warc", 487, 396, "https://a.example/", "2024-01-01T00:00:00Z", 200, "'text/html'", "NULL", "caf73b9e3e76ec9e"),
        ("/fx/good.warc", 887, 316, "https://a.example/missing", "2024-01-01T00:00:00Z", 404, "'text/plain'", "NULL", "283bb9deef02e684"),
        ("/fx/good.warc", 1207, 324, "https://a.example/doc.pdf", "2024-01-01T00:00:00Z", 200, "'application/pdf'", "NULL", "932d2676c1e461ba"),
        ("/fx/good.warc", 1535, 325, "https://b.example/latin", "2024-01-01T00:00:00Z", 200, "'text/html'", "NULL", "0230b0c519322940"),
        ("/fx/good.warc", 1864, 298, "https://b.example/sniff", "2024-01-01T00:00:00Z", 200, "NULL", "NULL", "591e56cd9f73856c"),
        ("/fx/good.warc", 2166, 350, "https://b.example/meta-charset", "2024-01-01T00:00:00Z", 200, "'text/html'", "NULL", "f6162e02e03d4cec"),
        ("/fx/good.warc", 2520, 438, "https://c.example/chunked", "2024-01-01T00:00:00Z", 200, "'text/html'", "NULL", "caf73b9e3e76ec9e"),
        ("/fx/good.warc", 2962, 431, "https://c.example/gzipped", "2024-01-01T00:00:00Z", 200, "'text/html'", "NULL", "caf73b9e3e76ec9e"),
        ("/fx/good.warc", 3397, 460, "https://c.example/chunked-gzip", "2024-01-01T00:00:00Z", 200, "'text/html'", "NULL", "caf73b9e3e76ec9e"),
        ("/fx/good.warc", 3861, 423, "https://c.example/deflated", "2024-01-01T00:00:00Z", 200, "'text/html'", "NULL", "caf73b9e3e76ec9e"),
        ("/fx/mixed.warc", 0, 396, "https://a.example/", "2024-01-01T00:00:00Z", 200, "'text/html'", "NULL", "caf73b9e3e76ec9e"),
        ("/fx/mixed.warc", 724, 316, "https://a.example/missing", "2024-01-01T00:00:00Z", 404, "'text/plain'", "NULL", "283bb9deef02e684"),
        ("/fx/trunc.warc", 0, 380, "https://a.example/", "2024-01-01T00:00:00Z", 200, "'text/html'", "NULL", "d948af4674bba925"),
        ("/fx/surt.warc.gz", 0, 278, "https://www.Example.COM:8443/A/b?b=2&utm_source=x&a=1", "2025-03-04T05:06:07Z", 200, "'text/html'", "NULL", "df5ddd75e1e0e3fe"),
        ("/fx/surt.warc.gz", 278, 250, "http://example.com:80/", "2024-12-31T23:59:59Z", 200, "'text/html'", "NULL", "b8fa62ed9cd18a77"),
        ("/fx/surt.warc.gz", 528, 240, "https://www2.News.example/Path/", "2024-06-01T00:00:00Z", 301, "'text/html'", "NULL", "e3b0c44298fc1c14"),
        ("/fx/surt.warc.gz", 768, 234, "https://www.com/x", "2024-01-02T03:04:05Z", 200, "'text/plain'", "NULL", "2d711642b726b044"),
        ("/fx/surt.warc.gz", 1002, 284, "https://a.example/", "2024-02-02T02:02:02Z", 200, "'warc/revisit'", "'sha1:3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ'", "e3b0c44298fc1c14"),
]


def _sql_cdx_index() -> str:
    from connapse_spark.operators.web import sql_surt_key

    values = ",\n  ".join(
        f"('{p}', {off}, {ln}, '{u}', '{d}', {s}, {m}, {dg}, '{ps}')"
        for p, off, ln, u, d, s, m, dg, ps in _CDX_PINNED_ROWS
    )
    return f"""
WITH raw(filename, off, length, url, warc_date, http_status, mime, declared_digest, payload_sha) AS (
  VALUES
  {values}
)
SELECT {sql_surt_key('url')} AS urlkey,
       substr(regexp_replace(warc_date, '[^0-9]', '', 'g'), 1, 14) AS cdx_ts,
       url, mime, CAST(http_status AS INTEGER) AS status,
       COALESCE(declared_digest, 'sha256:' || payload_sha) AS digest,
       CAST(length AS BIGINT) AS length, CAST(off AS BIGINT) AS "offset", filename
FROM raw
ORDER BY urlkey, cdx_ts, filename, "offset"
""".strip()


def q_cdx_incremental(spark, sf_dir):
    """Incremental CDX maintenance (r9 — VERDICT r8 ask #7,
    sources/warc.py cdx_append): base index over 3 archives committed to
    the snapshot layer, then one crawl drop (the 2 remaining archives
    PLUS a byte-identical REPLAY of a base archive — which must append
    zero rows, the crash-replay idempotence contract) folds in as a
    by-reference append whose own files are range-clustered. The ORACLE
    is the full-rebuild cdx_index SQL over ALL archives — incremental
    must equal rebuild, the tf_postings_upsert contract shape."""
    import shutil
    import tempfile

    from connapse_spark.sources import warc as _warc

    tdir = os.path.join(
        tempfile.gettempdir(),
        f"connapse_cdx_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    shutil.rmtree(tdir, ignore_errors=True)
    fx = _warc.fixture_warc_cdx()
    base_files = {"/fx/good.warc.gz", "/fx/good.warc", "/fx/mixed.warc"}
    base = spark.createDataFrame(
        [r for r in fx if r[0] in base_files], "path string, content binary"
    )
    drop = spark.createDataFrame(
        [r for r in fx if r[0] not in base_files]
        + [r for r in fx if r[0] == "/fx/mixed.warc"],
        "path string, content binary",
    )
    _warc.cdx_append(spark, base, tdir)
    _warc.cdx_append(spark, drop, tdir)
    return snapshots.read_snapshot(spark, tdir).orderBy(
        "urlkey", "cdx_ts", "filename", "offset"
    )


def q_image_neardup(spark, sf_dir):
    """Perceptual image near-dup (operators/multimodal.py
    image_neardup_pairs — the multimodal half of the dedup story): real
    PNG decode → 64-bit average-hash → banded Hamming pairs
    (dedup.hash_neardup_pairs, the simhash kernel generalized). The
    fixture plants variants of each base image with exactly j+1 blocks
    flipped, so the expected pairs land at Hamming 1..6. The oracle pins
    the aHash values (the decode is not SQL) but MIRRORS the banding +
    XOR/bit_count math — a banding bug diverges the engines."""
    from connapse_spark.operators import multimodal as _mm

    media = spark.createDataFrame(
        _mm.fixture_near_dup_images(), "media_id long, content binary"
    )
    return _long(_mm.image_neardup_pairs(media, max_hamming=6), "hamming")


# pinned signed-64 aHash values of fixture_near_dup_images; regenerate with
# tests/test_round3.py::test_image_neardup_oracle_constants
_IMAGE_NEARDUP_PINNED = [
    (0, -136998427313824816),
    (1, -8174394161141101218),
    (2, -9051008759945720911),
    (3, 3051582096015079234),
    (4, 541663387646154536),
    (5, 2226213398553542699),
    (6, 1229435169259443149),
    (7, 7345740872873009954),
    (8, -7054133769192093213),
    (9, 8815222665885571401),
    (100, -1289919931920671792),
    (101, -7057501453553218210),
    (102, -7863184358226752591),
    (103, 4241623113175643970),
    (104, 1657464280187655976),
    (105, 1036171247521611819),
]


def _sql_image_neardup() -> str:
    values = ", ".join(
        f"(CAST({mid} AS BIGINT), CAST({v} AS BIGINT))"
        for mid, v in _IMAGE_NEARDUP_PINNED
    )
    return dedup.sql_hash_neardup_pairs(
        f"SELECT id, h FROM (VALUES {values}) t(id, h)", bits=64, max_hamming=6
    )


def q_html_extract(spark, sf_dir):
    """HTML → text with boilerplate stripping (operators/htmltext.py):
    wrap every document's text in a deterministic page template (title +
    nav/footer chrome + one escaped <p>) with JVM column math, then run
    the stdlib-parser extractor. Chrome must vanish, entities must decode,
    and the body must round-trip modulo the documented whitespace
    collapse — so the oracle is a pure projection of ``documents``
    (trim + single-space), no literals to drift."""
    from connapse_spark.operators import htmltext as _ht

    docs = _t(spark, sf_dir, "documents")
    page = F.concat(
        F.lit("<html><head><title>Doc "),
        F.col("doc_id").cast("string"),
        F.lit("</title><style>p{margin:0}</style></head><body>"
              "<nav><ul><li>Home</li><li>About</li></ul></nav><article><p>"),
        _ht.escape_html_expr(F.col("text")),
        F.lit("</p></article><footer>&copy; example</footer></body></html>"),
    )
    html = docs.select("doc_id", page.alias("text"))
    out = _ht.extract_html_text(html, "text", boilerplate=True)
    return out.select("doc_id", "title", "text").orderBy("doc_id")


def _sql_html_extract() -> str:
    # the whitespace class mirrors the extractor's _WS_RE exactly
    # (ASCII [ \t\n\r\f\x0b] on both engines — NOT Python \s, which
    # additionally eats NBSP/Unicode spaces that RE2's \s does not)
    return """
SELECT doc_id, 'Doc ' || CAST(doc_id AS VARCHAR) AS title,
       trim(regexp_replace(text, '[ \\t\\n\\r\\f\\x0b]+', ' ', 'g')) AS text
FROM documents
ORDER BY doc_id
""".strip()


def q_main_content(spark, sf_dir):
    """Density-based main-content extraction (htmltext.extract_main_text
    — the boilerpipe/Arc90 tier above the tag-name chrome strip): each
    page wraps the document text in an UNNAMED link-farm div (no chrome
    tag to strip), the prose paragraph, and a related-links div. Only
    the prose may survive, so the oracle is the same pure projection of
    ``documents`` as html_extract (trim + single-space) — no literals to
    drift."""
    from connapse_spark.operators import htmltext as _ht

    docs = _t(spark, sf_dir, "documents")
    page = F.concat(
        F.lit('<html><head><title>Doc '),
        F.col("doc_id").cast("string"),
        F.lit('</title></head><body>'
              '<div><a href="/">Home</a> | <a href="/n">News</a> | '
              '<a href="/s">Sport</a> | <a href="/w">Weather</a></div><p>'),
        _ht.escape_html_expr(F.col("text")),
        F.lit('</p><div>Read next: <a href="/r1">story one</a> '
              '<a href="/r2">story two</a> <a href="/r3">story three</a>'
              '</div></body></html>'),
    )
    html = docs.select("doc_id", page.alias("text"))
    out = _ht.extract_main_text_df(html, "text")
    return out.select("doc_id", "title", "text").orderBy("doc_id")


def _sql_main_content() -> str:
    # identical mirror discipline to _sql_html_extract: the only block
    # that survives the density gate is the document's own prose
    return """
SELECT doc_id, 'Doc ' || CAST(doc_id AS VARCHAR) AS title,
       trim(regexp_replace(text, '[ \\t\\n\\r\\f\\x0b]+', ' ', 'g')) AS text
FROM documents
ORDER BY doc_id
""".strip()


def q_warc_roundtrip(spark, sf_dir):
    """Full-stack web pipeline: documents → HTML pages (JVM template) →
    distributed WARC shard export (gzip members, one archive per task —
    sources/warc.export_warc_shards) → re-ingest through warc_records →
    web_documents → boilerplate-stripped extraction. The corpus must
    survive the disk format byte-exactly, so the oracle is again a pure
    projection of ``documents`` — writer, gzip framing, record parser,
    HTTP split, charset decode, and extractor all sit on the verified
    path."""
    from connapse_spark.operators import htmltext as _ht
    from connapse_spark.sources import warc as _warc

    docs = _t(spark, sf_dir, "documents")
    page = F.concat(
        F.lit("<html><head><title>Doc "),
        F.col("doc_id").cast("string"),
        F.lit("</title></head><body><header>site chrome</header><main><p>"),
        _ht.escape_html_expr(F.col("text")),
        F.lit("</p></main><footer>foot</footer></body></html>"),
    )
    pages = docs.select(
        F.concat(F.lit("https://ex.com/doc/"), F.col("doc_id").cast("string")).alias("url"),
        page.alias("text"),
    )
    shards = _warc.export_warc_shards(pages, n_shards=8)
    recs = _warc.warc_records(
        shards.select(F.col("shard").cast("string").alias("path"), "content")
    )
    out = _ht.extract_html_text(_warc.web_documents(recs), "text", boilerplate=True)
    return out.select("url", "title", "text").orderBy("url")


def _sql_warc_roundtrip() -> str:
    return """
SELECT 'https://ex.com/doc/' || CAST(doc_id AS VARCHAR) AS url,
       'Doc ' || CAST(doc_id AS VARCHAR) AS title,
       trim(regexp_replace(text, '[ \\t\\n\\r\\f\\x0b]+', ' ', 'g')) AS text
FROM documents
ORDER BY url
""".strip()


def q_wet_roundtrip(spark, sf_dir):
    """WET (extracted-text conversion records — the CC companion format):
    documents → conversion-record shard export → re-ingest →
    wet_documents. No HTTP envelope and no HTML carrier, so the text
    must survive byte-exactly; the oracle is the raw projection."""
    from connapse_spark.sources import warc as _warc

    docs = _t(spark, sf_dir, "documents")
    pages = docs.select(
        F.concat(F.lit("https://ex.com/doc/"), F.col("doc_id").cast("string")).alias("url"),
        "text",
    )
    shards = _warc.export_warc_shards(pages, n_shards=8, conversion=True)
    recs = _warc.warc_records(
        shards.select(F.col("shard").cast("string").alias("path"), "content")
    )
    return _warc.wet_documents(recs).orderBy("url")


def _sql_wet_roundtrip() -> str:
    return """
SELECT 'https://ex.com/doc/' || CAST(doc_id AS VARCHAR) AS url, text
FROM documents
ORDER BY url
""".strip()


def q_wat_roundtrip(spark, sf_dir):
    """WAT metadata export (r9 — VERDICT r8 ask #8, the third Common
    Crawl artifact): documents → HTML pages with a title and TWO anchors
    (one absolute, one relative — the resolver must join it against the
    page url) → WARC shard export → WAT export (per-response JSON
    metadata records built by the SAME title/link extractors the engine
    pipelines run) → re-ingest → wat_documents projection. The oracle is
    a pure projection of ``documents``: title, status, link count, and
    the resolved link list must all survive the double disk format."""
    from connapse_spark.operators import htmltext as _ht
    from connapse_spark.sources import warc as _warc

    docs = _t(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    page = F.concat(
        F.lit("<html><head><title>Doc "), sid,
        F.lit("</title></head><body><p>"),
        _ht.escape_html_expr(F.col("text")),
        F.lit('</p><a href="https://ex.com/doc/'),
        (F.col("doc_id") + 1).cast("string"),
        F.lit('">next doc</a> <a href="/rel/'), sid,
        F.lit('">rel link</a></body></html>'),
    )
    pages = docs.select(
        F.concat(F.lit("https://ex.com/doc/"), sid).alias("url"),
        page.alias("text"),
    )
    shards = _warc.export_warc_shards(pages, n_shards=8)
    wat = _warc.export_wat_shards(
        shards.select(F.col("shard").cast("string").alias("path"), "content")
    )
    recs = _warc.warc_records(
        wat.select(F.col("shard").cast("string").alias("path"), "content")
    )
    return _warc.wat_documents(recs).orderBy("url")


def _sql_wat_roundtrip() -> str:
    return """
SELECT 'https://ex.com/doc/' || CAST(doc_id AS VARCHAR) AS url,
       'Doc ' || CAST(doc_id AS VARCHAR) AS title,
       200 AS status,
       CAST(2 AS BIGINT) AS n_links,
       'https://ex.com/doc/' || CAST(doc_id + 1 AS VARCHAR)
         || '|https://ex.com/rel/' || CAST(doc_id AS VARCHAR) AS links
FROM documents
ORDER BY url
""".strip()


def q_warc_images(spark, sf_dir):
    """WARC × multimodal: real PNG payloads (encoded by the stdlib codec)
    ride WARC response records; the pipeline parses the archive, keeps
    image/png 200s, and runs the REAL decoder — binary payloads must
    survive record framing bit-exact for dims/luma/ahash to reproduce,
    and the corrupt payload must degrade to an error row, not a crash."""
    from connapse_spark.operators import multimodal as _mm
    from connapse_spark.sources import warc as _warc

    blobs = spark.createDataFrame(
        _warc.fixture_warc_images(), "path string, content binary"
    )
    recs = _warc.warc_records(blobs).filter(
        (F.col("warc_type") == "response")
        & (F.col("http_status") == 200)
        & (F.col("content_type") == "image/png")
    )
    # the feature extractor keys on a LONG media_id — derive one from the
    # record position, keep the url alongside, and re-attach it after
    keyed = recs.select(
        F.col("record_idx").cast("long").alias("media_id"),
        F.col("target_uri").alias("url"),
        F.col("payload").alias("content"),
    )
    feats = _mm.extract_image_features(keyed)
    out = feats.join(keyed.select("media_id", "url"), "media_id")
    return out.select(
        "url", "width", "height",
        F.round("mean_luma", 9).alias("mean_luma"), "phash", "decode_error",
    ).orderBy("url")


def _sql_warc_images() -> str:
    # pinned outputs of parse+decode over the fixture archive; regenerate
    # with tests/test_warc_html.py::test_warc_images_oracle_constants
    return """
SELECT url, CAST(width AS INTEGER) AS width, CAST(height AS INTEGER) AS height,
       CAST(mean_luma AS DOUBLE) AS mean_luma, phash,
       CAST(decode_error AS VARCHAR) AS decode_error
FROM (VALUES
  ('https://img.example/checker.png', 8, 8, 0.5, 'aa55aa55aa55aa55', NULL),
  ('https://img.example/corrupt.png', 0, 0, 0.0, '', 'PngParseError:TypeError'),
  ('https://img.example/flat.png', 8, 8, 0.301960784, '0000000000000000', NULL),
  ('https://img.example/grad.png', 12, 8, 0.410921569, '000001071f7fffff', NULL)
) AS t(url, width, height, mean_luma, phash, decode_error)
ORDER BY url
""".strip()


def q_web_curate(spark, sf_dir):
    """The crawl-to-corpus flagship composition: documents → HTML pages
    (body inside <pre>, which the extractor keeps VERBATIM — the C4
    code-block convention) → WARC shard export → re-ingest → extraction →
    the full curate() verdict pipeline (exact dedup → MinHash near-dup →
    decontamination → Gopher quality). Because <pre> round-trips the text
    byte-exactly, the oracle is ``sql_curate`` over raw ``documents``
    UNCHANGED — the whole web front (writer, gzip, record parse, HTTP
    split, extractor) must be transparent for the verdicts to match."""
    from connapse_spark.operators import htmltext as _ht
    from connapse_spark.sources import warc as _warc

    docs = _t(spark, sf_dir, "documents")
    page = F.concat(
        F.lit("<html><head><title>Doc "),
        F.col("doc_id").cast("string"),
        F.lit("</title></head><body><nav>chrome</nav><pre>"),
        _ht.escape_html_expr(F.col("text")),
        F.lit("</pre><footer>foot</footer></body></html>"),
    )
    pages = docs.select(
        F.concat(F.lit("https://ex.com/doc/"), F.col("doc_id").cast("string")).alias("url"),
        page.alias("text"),
    )
    shards = _warc.export_warc_shards(pages, n_shards=8)
    recs = _warc.warc_records(
        shards.select(F.col("shard").cast("string").alias("path"), "content")
    )
    web = _ht.extract_html_text(_warc.web_documents(recs), "text", boilerplate=True)
    crawled = web.select(
        F.regexp_extract("url", r"/doc/(\d+)$", 1).cast("long").alias("doc_id"),
        "text",
    )
    # an ASCII-whitespace-only document is the ONE lossy case of the <pre>
    # carrier (the extractor drops an all-ASCII-whitespace block; NBSP-only
    # survives verbatim) — exclude such blanks with the extractor's OWN
    # whitespace class on both sides so the transparency contract is total,
    # not corpus-lucky (F.trim strips 0x20 only and would miss '\t' docs)
    crawled = crawled.filter(
        F.regexp_replace(F.col("text"), r"[ \t\n\r\f\x0b]+", "") != ""
    )
    held_out = crawled.filter(F.col("doc_id") % 97 == 0)
    blocklist = held_out.select(
        F.explode(dedup.shingles_expr(F.col("text"), 3)).alias("s")
    )
    return curate.curate(crawled, blocklist, neardup_threshold=0.4, contam_n=3)


def _sql_web_curate() -> str:
    # the web front is transparent by construction for every non-blank
    # document, so the oracle is corpus_curate's statement with the same
    # blank-row exclusion the Spark side applies (every table reference in
    # the composed mirror is a bare `FROM documents` — asserted so a future
    # `JOIN documents` can't silently skip the rewrite)
    sql = _sql_corpus_curate()
    # every occurrence must be exactly the bare form — an aliased
    # `FROM documents d` / `AS d`, or a comma-join, would make the
    # blanket replace produce invalid or wrong SQL (ADVICE r6): the word
    # after each occurrence must be a clause keyword, not an alias
    assert "JOIN documents" not in sql
    _clause_kw = {"where", "group", "order", "union", "having", "limit",
                  "window", "qualify", "intersect", "except"}
    for m in re.finditer(r"FROM documents\s*(,)?\s*(\w+)?", sql):
        assert not m.group(1), f"comma-join after FROM documents: {m.group(0)!r}"
        nxt = (m.group(2) or "").lower()
        assert nxt in _clause_kw or not nxt, f"aliased FROM documents: {m.group(0)!r}"
    return sql.replace(
        "FROM documents",
        "FROM (SELECT * FROM documents "
        "WHERE regexp_replace(text, '[ \\t\\n\\r\\f\\x0b]+', '', 'g') <> '') documents",
    )


def q_link_graph(spark, sf_dir):
    """Out-link extraction (operators/links.py): pages carry a relative
    href (resolved against the page url), an absolute one with a fragment
    (stripped), and a mailto: (dropped) — the oracle regenerates the two
    surviving edges per page arithmetically."""
    from connapse_spark.operators import links as _links

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    page = F.concat(
        F.lit('<p>see <a href="p/'), (F.col("doc_id") * 2).cast("string"),
        F.lit('">rel</a> and <a href="https://out.example/'),
        (F.col("doc_id") + 7).cast("string"),
        F.lit('#sec">abs</a> <a href="mailto:x@y">no</a></p>'),
    )
    pages = docs.select(
        F.concat(F.lit("https://ex.com/doc/"), did).alias("url"), page.alias("text")
    )
    return _links.link_edges(pages, "url", "text").orderBy("src", "dst")


def _sql_link_graph() -> str:
    return """
SELECT src, dst FROM (
  SELECT 'https://ex.com/doc/' || CAST(doc_id AS VARCHAR) AS src,
         'https://ex.com/doc/p/' || CAST(doc_id * 2 AS VARCHAR) AS dst
  FROM documents
  UNION ALL
  SELECT 'https://ex.com/doc/' || CAST(doc_id AS VARCHAR) AS src,
         'https://out.example/' || CAST(doc_id + 7 AS VARCHAR) AS dst
  FROM documents
) ORDER BY src, dst
""".strip()


def q_html_meta(spark, sf_dir):
    """Head-metadata curation signals (htmltext.extract_html_meta):
    rel=canonical (many-to-one — the dedup key), meta-robots noindex
    (every 3rd page opts out), description; a second canonical that must
    lose (first wins) and a meta inside <svg> that must be ignored."""
    from connapse_spark.operators import htmltext as _ht

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    robots = F.when(
        F.col("doc_id") % 3 == 0, F.lit("noindex, follow")
    ).otherwise(F.lit("index, follow"))
    lang = F.element_at(
        F.array(F.lit("en"), F.lit("fr"), F.lit("de"), F.lit("ja")),
        (F.col("doc_id") % 4 + 1).cast("int"),
    )
    page = F.concat(
        F.lit('<html lang="'), lang,
        F.lit('"><head><title>Doc '), did,
        F.lit('</title><link rel="canonical" href="https://ex.com/c/'),
        (F.col("doc_id") % 7).cast("string"),
        F.lit('"><meta name="robots" content="'), robots,
        F.lit('"><meta name="description" content="Desc '), did,
        F.lit('"><link rel="canonical" href="https://loser/"></head>'
              '<body><svg><meta name="robots" content="noindex"></svg><p>b</p></body>'),
    )
    html = docs.select("doc_id", page.alias("text"))
    out = _ht.extract_html_meta(html, "text")
    return out.select(
        "doc_id", "title", "canonical", "noindex", "description", "lang"
    ).orderBy("doc_id")


def _sql_html_meta() -> str:
    return """
SELECT doc_id,
       'Doc ' || CAST(doc_id AS VARCHAR) AS title,
       'https://ex.com/c/' || CAST(doc_id % 7 AS VARCHAR) AS canonical,
       doc_id % 3 = 0 AS noindex,
       'Desc ' || CAST(doc_id AS VARCHAR) AS description,
       ['en','fr','de','ja'][(doc_id % 4 + 1)::INT] AS lang
FROM documents
ORDER BY doc_id
""".strip()


def q_canonical_dedup(spark, sf_dir):
    """Canonical-URL dedup — the curation move the rel=canonical signal
    exists for: pages sharing a canonical collapse to ONE representative
    (lowest url wins deterministically); pages without a canonical stand
    alone. Built on the REAL extractor: 7 canonical groups per the
    html_meta template, every 5th page canonical-less."""
    from connapse_spark.operators import htmltext as _ht

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    canon_part = F.when(F.col("doc_id") % 5 == 4, F.lit("")).otherwise(
        F.concat(
            F.lit('<link rel="canonical" href="https://ex.com/c/'),
            (F.col("doc_id") % 7).cast("string"), F.lit('">'),
        )
    )
    page = F.concat(
        F.lit("<head><title>Doc "), did, F.lit("</title>"), canon_part,
        F.lit("</head><body><p>b</p></body>"),
    )
    pages = docs.select(
        F.concat(F.lit("https://ex.com/p/"), did).alias("url"), page.alias("text")
    )
    meta = _ht.extract_html_meta(pages, "text", keep_cols=["url"])
    from pyspark.sql import Window

    key = F.coalesce(F.col("canonical"), F.col("url"))
    w = Window.partitionBy(key).orderBy(F.col("url"))
    return (
        meta.select("url", "canonical")
        .withColumn("dedup_key", key)
        .withColumn("is_kept", F.row_number().over(w) == 1)
        .orderBy("url")
    )


def _sql_canonical_dedup() -> str:
    return """
WITH pages AS (
  SELECT 'https://ex.com/p/' || CAST(doc_id AS VARCHAR) AS url,
         CASE WHEN doc_id % 5 = 4 THEN NULL
              ELSE 'https://ex.com/c/' || CAST(doc_id % 7 AS VARCHAR) END AS canonical
  FROM documents
)
SELECT url, canonical,
       COALESCE(canonical, url) AS dedup_key,
       row_number() OVER (PARTITION BY COALESCE(canonical, url) ORDER BY url) = 1 AS is_kept
FROM pages
ORDER BY url
""".strip()


def q_link_anchors(spark, sf_dir):
    """Anchor-text capture (links.link_edges(anchors=True)): the anchor
    is the classic query-document training pair; markup inside the
    anchor contributes its text, whitespace collapses with the ASCII
    class, and empty anchors stay ''. Oracle regenerates arithmetically."""
    from connapse_spark.operators import links as _links

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    page = F.concat(
        F.lit('<a href="p/'), (F.col("doc_id") * 2).cast("string"),
        F.lit('">see   <b>doc</b>\n'), did,
        F.lit('</a><a href="https://out.example/'), (F.col("doc_id") + 7).cast("string"),
        F.lit('"></a>'),
    )
    pages = docs.select(
        F.concat(F.lit("https://ex.com/doc/"), did).alias("url"), page.alias("text")
    )
    return _links.link_edges(pages, "url", "text", anchors=True).orderBy("src", "dst")


def _sql_link_anchors() -> str:
    return """
SELECT src, dst, anchor FROM (
  SELECT 'https://ex.com/doc/' || CAST(doc_id AS VARCHAR) AS src,
         'https://ex.com/doc/p/' || CAST(doc_id * 2 AS VARCHAR) AS dst,
         'see doc ' || CAST(doc_id AS VARCHAR) AS anchor
  FROM documents
  UNION ALL
  SELECT 'https://ex.com/doc/' || CAST(doc_id AS VARCHAR),
         'https://out.example/' || CAST(doc_id + 7 AS VARCHAR),
         ''
  FROM documents
) ORDER BY src, dst
""".strip()


_ROBOTS_BODY = (
    "User-agent: *\n"
    "Disallow: /private\n"
    "Allow: /private/ok\n"
    "Disallow: /*.tmp$\n"
    "Allow: /\n"
)


def q_robots_gate(spark, sf_dir):
    """RFC 9309 robots evaluation (operators/robots.py) over five URL
    shapes per document: plain path (allowed by the catch-all Allow),
    /private (longest-match disallow), /private/ok (longer allow wins),
    a ``$``-anchored ``*.tmp`` disallow, and the same path with a query
    string the anchor must NOT match. The oracle pins the five verdicts
    of the fixed rule set — the parse_warc discipline: expected outputs
    of a pure evaluator, exercised across the corpus."""
    from connapse_spark.operators import robots as _robots

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    path = (
        F.when(F.col("doc_id") % 5 == 0, F.concat(F.lit("/public/"), did))
        .when(F.col("doc_id") % 5 == 1, F.concat(F.lit("/private/"), did))
        .when(F.col("doc_id") % 5 == 2, F.concat(F.lit("/private/ok/"), did))
        .when(F.col("doc_id") % 5 == 3, F.concat(F.lit("/files/"), did, F.lit(".tmp")))
        .otherwise(F.concat(F.lit("/files/"), did, F.lit(".tmp?x=1")))
    )
    urls = docs.select(F.concat(F.lit("https://ex.com"), path).alias("url"))
    out = _robots.robots_filter(urls, {"ex.com": _ROBOTS_BODY}, user_agent="connapse-bot")
    return out.orderBy("url")


def _sql_robots_gate() -> str:
    return """
SELECT 'https://ex.com' ||
       CASE doc_id % 5
         WHEN 0 THEN '/public/' || CAST(doc_id AS VARCHAR)
         WHEN 1 THEN '/private/' || CAST(doc_id AS VARCHAR)
         WHEN 2 THEN '/private/ok/' || CAST(doc_id AS VARCHAR)
         WHEN 3 THEN '/files/' || CAST(doc_id AS VARCHAR) || '.tmp'
         ELSE '/files/' || CAST(doc_id AS VARCHAR) || '.tmp?x=1'
       END AS url,
       CASE doc_id % 5
         WHEN 1 THEN false  -- Disallow /private outweighs Allow /
         WHEN 3 THEN false  -- /*.tmp$ anchors and matches
         ELSE true          -- catch-all Allow / Allow /private/ok / unanchored query
       END AS allowed
FROM documents
ORDER BY url
""".strip()


def q_sitemap_urls(spark, sf_dir):
    """Sitemap URL discovery (operators/links.py parse_sitemap): one
    namespaced urlset per document with lastmod/changefreq cycling and
    priority derived from doc_id (absent every 4th row — NULL handling);
    the oracle regenerates the rows arithmetically."""
    from connapse_spark.operators import links as _links

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    prio_part = F.when(
        F.col("doc_id") % 4 == 3, F.lit("")
    ).otherwise(
        F.concat(
            F.lit("<priority>0."), (F.col("doc_id") % 10).cast("string"),
            F.lit("</priority>"),
        )
    )
    xml = F.concat(
        F.lit('<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
              "<url><loc>https://ex.com/p/"),
        did,
        F.lit("</loc><lastmod>2024-01-0"),
        (F.col("doc_id") % 9 + 1).cast("string"),
        F.lit("</lastmod>"),
        prio_part,
        F.lit("</url><url><loc>https://ex.com/q/"),
        did,
        F.lit("</loc></url></urlset>"),
    )
    maps = docs.select(
        F.concat(F.lit("https://ex.com/sm/"), did).alias("url"), xml.alias("text")
    )
    out = _links.sitemap_urls(maps, "url", "text")
    return out.orderBy("sitemap_url", "loc")


def _sql_sitemap_urls() -> str:
    return """
SELECT * FROM (
  SELECT 'https://ex.com/sm/' || CAST(doc_id AS VARCHAR) AS sitemap_url,
         'url' AS kind,
         'https://ex.com/p/' || CAST(doc_id AS VARCHAR) AS loc,
         '2024-01-0' || CAST(doc_id % 9 + 1 AS VARCHAR) AS lastmod,
         CAST(NULL AS VARCHAR) AS changefreq,
         CASE WHEN doc_id % 4 = 3 THEN NULL
              ELSE CAST(doc_id % 10 AS DOUBLE) / 10 END AS priority
  FROM documents
  UNION ALL
  SELECT 'https://ex.com/sm/' || CAST(doc_id AS VARCHAR),
         'url',
         'https://ex.com/q/' || CAST(doc_id AS VARCHAR),
         NULL, NULL, NULL
  FROM documents
) ORDER BY sitemap_url, loc
""".strip()


def q_frontier_delta(spark, sf_dir):
    """Incremental frontier (operators/links.frontier_delta): discovered
    URLs screened against the crawl ledger on the CANONICAL key — ledger
    entries carry different tracking params than today's discovery, so a
    raw-url comparison would re-crawl every page; the canonical anti-join
    must see through them. The batch also plants same-page variants of
    its own (doc_id % 7 == 1 twice with different click params) so the
    within-batch collapse is exercised. Oracle: the same canonicalize +
    group + ANTI JOIN arithmetic in SQL."""
    from connapse_spark.operators import links as _links

    docs = _t(spark, sf_dir, "documents")
    discovered = docs.select(_url_col().alias("url")).unionByName(
        docs.filter(F.col("doc_id") % 7 == 1).select(
            F.concat(
                _url_col(),
                F.when(F.col("doc_id") % 5 == 3, F.lit("?gclid=dup"))
                .otherwise(F.lit("&gclid=dup")),
            ).alias("url")
        )
    )
    seen = docs.filter(F.col("doc_id") % 3 == 0).select(
        F.concat(
            _url_col(),
            F.when(F.col("doc_id") % 5 == 3, F.lit("?fbclid=zz"))
            .otherwise(F.lit("&utm_campaign=w")),
        ).alias("url")
    )
    return _links.frontier_delta(discovered, seen).orderBy("canonical_url")


def _sql_frontier_delta() -> str:
    from connapse_spark.operators.web import sql_canonical_url

    dup_suffix = "CASE WHEN doc_id % 5 = 3 THEN '?gclid=dup' ELSE '&gclid=dup' END"
    seen_suffix = "CASE WHEN doc_id % 5 = 3 THEN '?fbclid=zz' ELSE '&utm_campaign=w' END"
    return f"""
WITH discovered AS (
  SELECT {_SQL_URL} AS url FROM documents
  UNION ALL
  SELECT ({_SQL_URL} || {dup_suffix}) AS url FROM documents WHERE doc_id % 7 = 1
),
seen AS (
  SELECT ({_SQL_URL} || {seen_suffix}) AS url FROM documents WHERE doc_id % 3 = 0
),
d AS (
  SELECT {sql_canonical_url('url')} AS canonical_url, min(url) AS url
  FROM discovered GROUP BY 1
),
s AS (SELECT DISTINCT {sql_canonical_url('url')} AS canonical_url FROM seen)
SELECT url, canonical_url
FROM d ANTI JOIN s USING (canonical_url)
ORDER BY canonical_url
""".strip()


def q_crawl_frontier(spark, sf_dir):
    """Crawl-scheduling capstone (operators/links.crawl_frontier): URL
    discovery runs through the REAL extractors (sitemap XML parse + href
    extraction), then dedup → robots gate (Disallow /q on ex.com;
    out.example has no robots) → deterministic per-domain cap. The oracle
    regenerates the candidate set arithmetically and applies the same
    verdict + hash-window logic in SQL — extraction, RFC 9309 evaluation,
    PSL domains, and the cap's hash order all have to agree."""
    from connapse_spark.operators import links as _links

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    sm_xml = F.concat(
        F.lit("<urlset><url><loc>https://ex.com/p/"), did,
        F.lit("</loc></url><url><loc>https://ex.com/q/"), did,
        F.lit("</loc></url></urlset>"),
    )
    sitemaps = docs.select(
        F.concat(F.lit("https://ex.com/sm/"), did).alias("url"), sm_xml.alias("text")
    )
    from_sitemaps = _links.sitemap_urls(sitemaps, "url", "text").select(
        F.col("loc").alias("url")
    )
    page = F.concat(
        F.lit('<a href="p/'), (F.col("doc_id") * 2).cast("string"),
        F.lit('">r</a><a href="https://out.example/'),
        (F.col("doc_id") + 7).cast("string"), F.lit('">a</a>'),
    )
    pages = docs.select(
        F.concat(F.lit("https://ex.com/doc/"), did).alias("url"), page.alias("text")
    )
    from_links = _links.link_edges(pages, "url", "text").select(
        F.col("dst").alias("url")
    )
    discovered = from_sitemaps.unionByName(from_links)
    frontier = _links.crawl_frontier(
        discovered,
        {"ex.com": "User-agent: *\nDisallow: /q\nAllow: /\n"},
        max_per_domain=150,
        user_agent="connapse-bot",
    )
    return frontier.orderBy("url")


def _sql_crawl_frontier() -> str:
    from connapse_spark.operators.sampling import sql_hash_bucket

    domain = web.sql_registered_domain(web.sql_host("url"))
    bucket = sql_hash_bucket("url", "frontier")
    return f"""
WITH discovered AS (
  SELECT DISTINCT url FROM (
    SELECT 'https://ex.com/p/' || CAST(doc_id AS VARCHAR) AS url FROM documents
    UNION ALL
    SELECT 'https://ex.com/q/' || CAST(doc_id AS VARCHAR) FROM documents
    UNION ALL
    SELECT 'https://ex.com/doc/p/' || CAST(doc_id * 2 AS VARCHAR) FROM documents
    UNION ALL
    SELECT 'https://out.example/' || CAST(doc_id + 7 AS VARCHAR) FROM documents
  )
),
gated AS (
  -- the fixed ruleset's verdicts: Disallow /q outweighs Allow / on ex.com;
  -- hosts without a robots body are allowed
  SELECT url FROM discovered
  WHERE NOT ({web.sql_host('url')} = 'ex.com' AND url LIKE 'https://ex.com/q/%')
),
d AS (SELECT url, {domain} AS domain, {bucket} AS _b FROM gated),
r AS (
  SELECT url, domain,
         (row_number() OVER (PARTITION BY domain ORDER BY _b, url))::INT AS domain_rank
  FROM d
)
SELECT url, domain, domain_rank FROM r WHERE domain_rank <= 150
ORDER BY url
""".strip()


def q_html_adversarial(spark, sf_dir):
    """Real-web failure modes through the FULL warc → decode → extract
    pipeline (VERDICT r6 ask #4): mislabeled charset (latin-1 bytes under
    a utf-8 header → fallback, not mojibake), unclosed <b>/<td> soup,
    numeric-entity edges (NUL / surrogate / past-U+10FFFF → U+FFFD per
    WHATWG §13.2.5.80), commented-out markup inside <script> (invisible),
    and a UTF-8 BOM conflicting with <meta charset> (BOM wins). Fixture
    bytes are deterministic (operators/htmltext.fixture_adversarial_pages)
    so the oracle pins the extracted surface as literals."""
    from connapse_spark.operators import htmltext as _ht
    from connapse_spark.sources import warc as _warc

    recs = [
        _warc.make_warc_record(
            "response",
            _warc.make_http_response(200, raw, content_type=ct),
            target_uri=f"https://adv.example/{case}",
        )
        for case, raw, ct in _ht.fixture_adversarial_pages()
    ]
    blobs = spark.createDataFrame(
        [("/fx/adv.warc.gz", _warc.make_warc(recs, gzip_members=True))],
        "path string, content binary",
    )
    pages = _warc.warc_records(blobs).select(
        F.element_at(F.split("target_uri", "/"), -1).alias("case_name"), "text"
    )
    out = _ht.extract_html_meta(pages, "text", keep_cols=["case_name"])
    return out.select(
        "case_name", "title", "text", "canonical", "noindex", "description", "lang"
    ).orderBy("case_name")


def _sql_html_adversarial() -> str:
    # pinned outputs of the full pipeline over the adversarial fixture;
    # regenerate with tests/test_warc_html.py::test_html_adversarial_constants
    return """
SELECT case_name, CAST(title AS VARCHAR) AS title, text,
       CAST(canonical AS VARCHAR) AS canonical, noindex,
       CAST(description AS VARCHAR) AS description, CAST(lang AS VARCHAR) AS lang
FROM (VALUES
  ('bom-meta-conflict', NULL, 'café', 'https://e/x', false, NULL, NULL),
  ('entity-edges', 'E�T', 'a�b � � &ok', NULL, false, NULL, NULL),
  ('mislabeled-charset', NULL, 'olé café', NULL, true, NULL, 'es'),
  ('script-comment', 'T', 'real <tag>', NULL, false, NULL, NULL),
  ('tag-soup', NULL, 'bold cell' || chr(10) || 'para', NULL, false, 'd ésc', NULL)
) AS t(case_name, title, text, canonical, noindex, description, lang)
ORDER BY case_name
""".strip()


def q_resolve_revisits(spark, sf_dir):
    """Revisit-record resolution (sources/warc.resolve_revisits — the
    Common Crawl deduplicated-crawl mechanism): per document, a response
    capture with a WARC-Payload-Digest, a revisit resolving BY DIGEST, an
    every-other-doc revisit resolving by the WARC-Refers-To-Target-URI
    fallback (no digest), and an every-third-doc unresolvable revisit
    that must keep a NULL text. Archives ride the real writer/parser; the
    oracle regenerates the resolved surface arithmetically."""
    from connapse_spark.sources import warc as _warc

    docs = _t(spark, sf_dir, "documents").select("doc_id")

    def _gen(batches):
        import pandas as _pd

        for pdf in batches:
            out = []
            for did in pdf["doc_id"]:
                url_a = f"https://v{did}.com/a"
                http_head_only = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                recs = [
                    _warc.make_warc_record(
                        "response",
                        _warc.make_http_response(200, f"<p>capture {did}</p>".encode()),
                        target_uri=url_a,
                        extra_headers={"WARC-Payload-Digest": f"sha1:D{did}"},
                    ),
                    _warc.make_warc_record(
                        "revisit", http_head_only, target_uri=url_a,
                        extra_headers={
                            "WARC-Payload-Digest": f"sha1:D{did}",
                            "WARC-Profile": "identical-payload-digest",
                        },
                    ),
                ]
                if did % 2 == 0:
                    recs.append(_warc.make_warc_record(
                        "revisit", http_head_only,
                        target_uri=f"https://v{did}.com/b",
                        extra_headers={"WARC-Refers-To-Target-URI": url_a},
                    ))
                if did % 3 == 0:
                    recs.append(_warc.make_warc_record(
                        "revisit", http_head_only,
                        target_uri=f"https://v{did}.com/c",
                        extra_headers={"WARC-Payload-Digest": f"sha1:MISSING{did}"},
                    ))
                out.append((f"/gen/v{did}.warc.gz", _warc.make_warc(recs)))
            yield _pd.DataFrame(out, columns=["path", "content"])

    blobs = docs.mapInPandas(_gen, "path string, content binary")
    out = _warc.resolve_revisits(_warc.warc_records(blobs))
    return out.orderBy("url", "was_revisit")


def _sql_resolve_revisits() -> str:
    return """
SELECT url, text, source_url, was_revisit FROM (
  SELECT 'https://v' || CAST(doc_id AS VARCHAR) || '.com/a' AS url,
         '<p>capture ' || CAST(doc_id AS VARCHAR) || '</p>' AS text,
         'https://v' || CAST(doc_id AS VARCHAR) || '.com/a' AS source_url,
         false AS was_revisit
  FROM documents
  UNION ALL
  SELECT 'https://v' || CAST(doc_id AS VARCHAR) || '.com/a',
         '<p>capture ' || CAST(doc_id AS VARCHAR) || '</p>',
         'https://v' || CAST(doc_id AS VARCHAR) || '.com/a', true
  FROM documents
  UNION ALL
  SELECT 'https://v' || CAST(doc_id AS VARCHAR) || '.com/b',
         '<p>capture ' || CAST(doc_id AS VARCHAR) || '</p>',
         'https://v' || CAST(doc_id AS VARCHAR) || '.com/a', true
  FROM documents WHERE doc_id % 2 = 0
  UNION ALL
  SELECT 'https://v' || CAST(doc_id AS VARCHAR) || '.com/c',
         CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), true
  FROM documents WHERE doc_id % 3 = 0
)
ORDER BY url, was_revisit
""".strip()


def q_web_noindex(spark, sf_dir):
    """Indexability gate (sources/warc.noindex_verdicts): X-Robots-Tag
    header ∪ <meta robots> — either channel's noindex drops the page.
    Per document the generated capture cycles through: an unscoped header
    noindex, a googlebot-scoped one (must NOT bind our 'ccbot' UA), a
    value-carrying non-noindex header (max-snippet + nofollow), TWO
    header occurrences (folding must not drop the first), and no header;
    every 7th page also carries <meta name=robots content=noindex>. The
    oracle regenerates the union verdict arithmetically."""
    from connapse_spark.sources import warc as _warc

    docs = _t(spark, sf_dir, "documents").select("doc_id")

    def _gen(batches):
        import pandas as _pd

        for pdf in batches:
            out = []
            for did in pdf["doc_id"]:
                meta = (
                    '<meta name="robots" content="noindex">' if did % 7 == 0 else ""
                )
                html = f"<html><body>{meta}<p>page {did}</p></body></html>".encode()
                kind = did % 5
                raw = _warc.make_http_response(200, html)
                if kind == 0:
                    raw = _warc.make_http_response(
                        200, html, extra_headers={"X-Robots-Tag": "noindex"})
                elif kind == 1:
                    raw = _warc.make_http_response(
                        200, html,
                        extra_headers={"X-Robots-Tag": "googlebot: noindex"})
                elif kind == 2:
                    raw = _warc.make_http_response(
                        200, html,
                        extra_headers={"X-Robots-Tag": "max-snippet: 20, nofollow"})
                elif kind == 3:
                    # two occurrences of the header — folding must keep both
                    head, body = raw.split(b"\r\n\r\n", 1)
                    head += b"\r\nX-Robots-Tag: nofollow\r\nX-Robots-Tag: noindex"
                    raw = head + b"\r\n\r\n" + body
                rec = _warc.make_warc_record(
                    "response", raw, target_uri=f"https://n{did}.com/p")
                out.append((f"/gen/n{did}.warc.gz", _warc.make_warc([rec])))
            yield _pd.DataFrame(out, columns=["path", "content"])

    blobs = docs.mapInPandas(_gen, "path string, content binary")
    out = _warc.noindex_verdicts(_warc.warc_records(blobs), user_agent="ccbot")
    return out.orderBy("url")


def _sql_web_noindex() -> str:
    # hdr: kinds 0 and 3 are noindex for ccbot (kind 1 is googlebot-scoped);
    # meta: every 7th doc; indexable = NOT (hdr OR meta)
    return """
SELECT url, hdr_noindex, meta_noindex, NOT (hdr_noindex OR meta_noindex) AS indexable
FROM (
  SELECT 'https://n' || CAST(doc_id AS VARCHAR) || '.com/p' AS url,
         (doc_id % 5) IN (0, 3) AS hdr_noindex,
         doc_id % 7 = 0 AS meta_noindex
  FROM documents
)
ORDER BY url
""".strip()


def q_redirect_edges(spark, sf_dir):
    """Redirect-edge extraction (sources/warc.redirect_edges): per
    document, a generated archive carries a 301 with an absolute
    Location, a 302 with a RELATIVE Location (resolved against the
    request URI per RFC 9110 §10.2.2), and a 200 (no edge) — built with
    the real writer, parsed by the real record parser, so the Location
    header rides the full warc path. The oracle regenerates the two
    expected edges per document arithmetically."""
    from connapse_spark.sources import warc as _warc

    docs = _t(spark, sf_dir, "documents").select("doc_id")

    def _gen(batches):
        import pandas as _pd

        for pdf in batches:
            out = []
            for did in pdf["doc_id"]:
                src = f"https://r{did}.com/start"
                recs = [
                    _warc.make_warc_record(
                        "response",
                        _warc.make_http_response(
                            301, b"", reason="Moved Permanently",
                            extra_headers={"Location": f"https://r{did}.com/final"},
                        ),
                        target_uri=src,
                    ),
                    _warc.make_warc_record(
                        "response",
                        _warc.make_http_response(
                            302, b"", reason="Found",
                            extra_headers={"Location": f"next?p={did}"},
                        ),
                        target_uri=src,
                    ),
                    _warc.make_warc_record(
                        "response", _warc.make_http_response(200, b"<p>ok</p>"),
                        target_uri=src,
                    ),
                ]
                out.append((f"/gen/{did}.warc.gz", _warc.make_warc(recs)))
            yield _pd.DataFrame(out, columns=["path", "content"])

    blobs = docs.mapInPandas(_gen, "path string, content binary")
    edges = _warc.redirect_edges(_warc.warc_records(blobs))
    return edges.orderBy("src", "http_status")


def _sql_redirect_edges() -> str:
    return """
SELECT src, dst, http_status FROM (
  SELECT 'https://r' || CAST(doc_id AS VARCHAR) || '.com/start' AS src,
         'https://r' || CAST(doc_id AS VARCHAR) || '.com/final' AS dst,
         301 AS http_status
  FROM documents
  UNION ALL
  SELECT 'https://r' || CAST(doc_id AS VARCHAR) || '.com/start',
         'https://r' || CAST(doc_id AS VARCHAR) || '.com/next?p=' || CAST(doc_id AS VARCHAR),
         302
  FROM documents
)
ORDER BY src, http_status
""".strip()


def q_robots_sitemaps(spark, sf_dir):
    """Sitemap discovery from robots bodies (operators/robots.
    sitemap_declarations — the seam between the robots fetch and
    links.sitemap_urls): bodies are generated arithmetically with the
    edge shapes (comment after the value, lowercase/uppercase keys,
    leading whitespace, an empty-value SITEMAP: line to drop, hosts
    declaring none emit nothing), the oracle regenerates the expected
    (host, sitemap_url, decl_idx) rows arithmetically."""
    from connapse_spark.operators import robots as _robots

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    host = F.concat(F.lit("h"), did, F.lit(".com"))
    kind = F.col("doc_id") % 3
    body = F.concat(
        F.lit("User-agent: *\nDisallow: /q\n"),
        F.when(
            kind == 0,
            F.concat(
                F.lit("Sitemap: https://h"), did, F.lit(".com/sm-a.xml # primary\n"),
                F.lit("  sitemap: https://h"), did, F.lit(".com/sm-b.xml\nSITEMAP:\n"),
            ),
        ).when(
            kind == 1,
            F.concat(F.lit("sitemap: https://h"), did,
                     F.lit(".com/only.xml\nCrawl-delay: 2\n")),
        ).otherwise(F.lit("Crawl-delay: 1\n")),
    )
    robots_df = docs.select(host.alias("host"), body.alias("robots_txt"))
    out = _robots.sitemap_declarations(robots_df)
    return _long(out, "decl_idx").orderBy("host", "decl_idx")


def _sql_robots_sitemaps() -> str:
    return """
SELECT host, sitemap_url, decl_idx FROM (
  SELECT 'h' || CAST(doc_id AS VARCHAR) || '.com' AS host,
         'https://h' || CAST(doc_id AS VARCHAR) || '.com/sm-a.xml' AS sitemap_url,
         CAST(0 AS BIGINT) AS decl_idx
  FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT 'h' || CAST(doc_id AS VARCHAR) || '.com',
         'https://h' || CAST(doc_id AS VARCHAR) || '.com/sm-b.xml', 1
  FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT 'h' || CAST(doc_id AS VARCHAR) || '.com',
         'https://h' || CAST(doc_id AS VARCHAR) || '.com/only.xml', 0
  FROM documents WHERE doc_id % 3 = 1
)
ORDER BY host, decl_idx
""".strip()


_FRONTIER_ROBOTS_BODY = "User-agent: *\nDisallow: /q\nAllow: /\nCrawl-delay: 2\n"
_FRONTIER_CHANGEFREQS = [
    "always", "hourly", "daily", "weekly", "monthly", "yearly", "never",
    "sometimes",  # present-but-unknown → default rank, like absent
]


def _frontier_discovered(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    return docs.select(
        F.concat(F.lit("https://ex.com/p/"), did).alias("url")
    ).unionByName(
        docs.select(F.concat(F.lit("https://ex.com/q/"), did).alias("url"))
    ).unionByName(
        docs.select(
            F.concat(F.lit("https://out.example/"), (F.col("doc_id") + 7).cast("string")).alias("url")
        )
    )


def _frontier_freshness(spark, sf_dir):
    """Planted sitemap freshness for the /p URLs (r8 — VERDICT r7 missing
    #2): priority cycles 0.0–0.9 with every 4th absent, lastmod cycles 9
    ISO dates with every 3rd absent, changefreq cycles all 7 protocol
    values plus an unknown one. /q and out.example rows get no freshness
    (the coalesce-to-default path)."""
    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    prio = F.when(
        F.col("doc_id") % 4 != 3, (F.col("doc_id") % 10).cast("double") / 10
    )
    lastmod = F.when(
        F.col("doc_id") % 3 != 2,
        F.concat(F.lit("2024-01-0"), (F.col("doc_id") % 9 + 1).cast("string")),
    )
    cf = F.element_at(
        F.array(*[F.lit(c) for c in _FRONTIER_CHANGEFREQS]),
        (F.col("doc_id") % len(_FRONTIER_CHANGEFREQS) + 1).cast("int"),
    )
    return docs.select(
        F.concat(F.lit("https://ex.com/p/"), did).alias("loc"),
        lastmod.alias("lastmod"),
        cf.alias("changefreq"),
        prio.alias("priority"),
    )


def q_frontier_schedule(spark, sf_dir):
    """Politeness scheduling (operators/links.crawl_schedule — VERDICT r6
    ask #2): the crawl_frontier candidate set plus per-host fetch pacing
    derived from the robots bodies' own Crawl-delay. ex.com declares
    Crawl-delay: 2 → one URL per wave, not_before = wave × 2 s;
    out.example has no robots → default burst of 8 per wave at 1 s
    spacing. r8: the within-host wave order now consumes the planted
    sitemap freshness signals (priority desc → changefreq rank →
    lastmod desc → hash) — VERDICT r7 missing #2. The oracle mirrors
    the gate, the cap's hash window, the freshness coalesce/ordering,
    AND the wave arithmetic over the same pinned rule set."""
    from connapse_spark.operators import links as _links

    sched = _links.crawl_schedule(
        _frontier_discovered(spark, sf_dir),
        {"ex.com": _FRONTIER_ROBOTS_BODY},
        max_per_domain=150,
        user_agent="connapse-bot",
        default_delay=1.0,
        burst=8,
        freshness=_frontier_freshness(spark, sf_dir),
    )
    return sched.orderBy("url")


def q_frontier_schedule_join(spark, sf_dir):
    """The SAME pinned fixture through the distributed tier (r8 — VERDICT
    r7 "what's wrong" #1): crawl_schedule_df gates via robots_filter_join
    and derives the Crawl-delay table with robots.robots_delays — one
    distributed Arrow pass over the (host, robots_txt) table, no
    driver-side dict or Python loop. Oracle-equal to the dict tier BY THE
    SAME SQL: the two tiers must be row-identical on the same rule set."""
    from connapse_spark.operators import links as _links

    robots_df = spark.createDataFrame(
        [("ex.com", _FRONTIER_ROBOTS_BODY)], "host string, robots_txt string"
    )
    sched = _links.crawl_schedule_df(
        _frontier_discovered(spark, sf_dir),
        robots_df,
        max_per_domain=150,
        user_agent="connapse-bot",
        default_delay=1.0,
        burst=8,
        freshness=_frontier_freshness(spark, sf_dir),
    )
    return sched.orderBy("url")


def _sql_frontier_schedule() -> str:
    from connapse_spark.operators import links as _links
    from connapse_spark.operators.sampling import sql_hash_bucket

    host = web.sql_host("url")
    domain = web.sql_registered_domain(host)
    bucket = sql_hash_bucket("url", "frontier")
    cf_list = ", ".join(f"'{c}'" for c in _FRONTIER_CHANGEFREQS)
    n_cf = len(_FRONTIER_CHANGEFREQS)
    return f"""
WITH discovered AS (
  SELECT DISTINCT url FROM (
    SELECT 'https://ex.com/p/' || CAST(doc_id AS VARCHAR) AS url FROM documents
    UNION ALL
    SELECT 'https://ex.com/q/' || CAST(doc_id AS VARCHAR) FROM documents
    UNION ALL
    SELECT 'https://out.example/' || CAST(doc_id + 7 AS VARCHAR) FROM documents
  )
),
gated AS (
  SELECT url FROM discovered
  WHERE NOT ({host} = 'ex.com' AND url LIKE 'https://ex.com/q/%')
),
-- planted sitemap freshness for the /p URLs (mirror of _frontier_freshness)
freshness AS (
  SELECT 'https://ex.com/p/' || CAST(doc_id AS VARCHAR) AS loc,
         CASE WHEN doc_id % 3 != 2
              THEN '2024-01-0' || CAST(doc_id % 9 + 1 AS VARCHAR) END AS lastmod,
         ([{cf_list}])[CAST(doc_id % {n_cf} + 1 AS INT)] AS changefreq,
         CASE WHEN doc_id % 4 != 3
              THEN CAST(doc_id % 10 AS DOUBLE) / 10 END AS priority
  FROM documents
),
fresh AS (
  SELECT loc AS url,
         max(priority) AS _prio,
         min({_links.sql_changefreq_rank('changefreq')}) AS _cfr,
         max(lastmod) AS _lastmod
  FROM freshness GROUP BY loc
),
d AS (SELECT url, {host} AS host, {domain} AS domain, {bucket} AS _b FROM gated),
r AS (
  SELECT url, host, domain, _b,
         (row_number() OVER (PARTITION BY domain ORDER BY _b, url))::INT AS domain_rank
  FROM d
),
-- host_rank ranks the CAPPED survivors (the Spark path windows the
-- frontier output), not the pre-cap candidate set; r8: the within-host
-- order is the sitemap recrawl-priority order, defaults coalesced first
capped AS (
  SELECT r.url, host, domain, domain_rank,
         coalesce(_prio, 0.5) AS _p,
         coalesce(_cfr, 3) AS _c,
         coalesce(_lastmod, '') AS _l,
         _b
  FROM r LEFT JOIN fresh ON r.url = fresh.url
  WHERE domain_rank <= 150
),
ranked AS (
  SELECT url, host, domain, domain_rank, _p,
         (row_number() OVER (PARTITION BY host
            ORDER BY _p DESC, _c ASC, _l DESC, _b ASC, url ASC))::INT AS host_rank
  FROM capped
),
sched AS (
  SELECT *,
         CASE WHEN host = 'ex.com' THEN 2.0 ELSE 1.0 END AS delay_s,
         CASE WHEN host = 'ex.com' THEN 1 ELSE 8 END AS _burst
  FROM ranked
)
SELECT url, host, domain, domain_rank, host_rank,
       round(_p, 9) AS revisit_priority,
       round(delay_s, 9) AS delay_s,
       CAST(floor((host_rank - 1) / _burst) AS INTEGER) AS fetch_wave,
       round(CAST(floor((host_rank - 1) / _burst) AS INTEGER) * delay_s, 9) AS not_before_s
FROM sched
ORDER BY url
""".strip()


_PR_ITER, _PR_DAMP, _PR_NODES = 5, 0.85, 50


def _pr_edges(docs, weighted: bool):
    """The corpus-derived 50-node multigraph both pagerank variants rank —
    one definition, mirrored by _PR_EDGES_SQL."""
    cols = [
        F.concat(F.lit("n"), (F.col("doc_id") % _PR_NODES).cast("string")).alias("src"),
        F.concat(
            F.lit("n"), ((F.col("doc_id") * 13 + 7) % (2 * _PR_NODES)).cast("string")
        ).alias("dst"),
    ]
    if weighted:
        cols.append(((F.col("doc_id") % 5) + 1).cast("double").alias("n_links"))
    return docs.select(*cols)


def _pr_edges_sql(weighted: bool) -> str:
    w = ",\n             CAST(doc_id % 5 + 1 AS DOUBLE) AS w" if weighted else ""
    return (
        f"""SELECT 'n' || CAST(doc_id % {_PR_NODES} AS VARCHAR) AS src,
             'n' || CAST((doc_id * 13 + 7) % {2 * _PR_NODES} AS VARCHAR) AS dst{w}
      FROM documents"""
    )


def q_hits(spark, sf_dir):
    """HITS hub/authority power iteration (operators/links.hits —
    Kleinberg 1999, L1-normalized half-steps, L1 totals folded in as
    broadcast one-row aggregates, score vector localCheckpoint'ed per
    half-step so the twice-referenced plan can't compound). Same
    corpus-derived 50-node multigraph as pagerank (parallel edges,
    self-loops, dangling nodes); the oracle unrolls the identical 3
    iterations as chained CTEs."""
    from connapse_spark.operators import links as _links

    edges = _pr_edges(_t(spark, sf_dir, "documents"), weighted=False)
    return _links.hits(edges, n_iter=_HITS_ITER, round_to=9).orderBy("node")


_HITS_ITER = 3


def _sql_hits_unrolled() -> str:
    parts = [f"""
e AS MATERIALIZED ({_pr_edges_sql(weighted=False)}),
nodes AS MATERIALIZED (SELECT DISTINCT node FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
nn AS (SELECT count(*) AS n FROM nodes),
s0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS a, 1.0 / (SELECT n FROM nn) AS h FROM nodes)"""]
    for k in range(1, _HITS_ITER + 1):
        p = f"s{k - 1}"
        parts.append(f"""
ar{k} AS MATERIALIZED (SELECT e.dst AS node, sum(s.h) AS raw FROM e JOIN {p} s ON e.src = s.node GROUP BY e.dst),
at{k} AS (SELECT coalesce(sum(raw), 0.0) AS t FROM ar{k}),
sa{k} AS MATERIALIZED (
  SELECT n.node,
         CASE WHEN (SELECT t FROM at{k}) > 0
              THEN coalesce(r.raw, 0.0) / (SELECT t FROM at{k}) ELSE 0.0 END AS a,
         s.h
  FROM nodes n LEFT JOIN ar{k} r ON n.node = r.node JOIN {p} s ON n.node = s.node),
hr{k} AS MATERIALIZED (SELECT e.src AS node, sum(s.a) AS raw FROM e JOIN sa{k} s ON e.dst = s.node GROUP BY e.src),
ht{k} AS (SELECT coalesce(sum(raw), 0.0) AS t FROM hr{k}),
s{k} AS MATERIALIZED (
  SELECT n.node, s.a,
         CASE WHEN (SELECT t FROM ht{k}) > 0
              THEN coalesce(r.raw, 0.0) / (SELECT t FROM ht{k}) ELSE 0.0 END AS h
  FROM nodes n LEFT JOIN hr{k} r ON n.node = r.node JOIN sa{k} s ON n.node = s.node)""")
    return (
        "WITH " + ",".join(parts)
        + f"""
SELECT node, round(a, 9) AS authority, round(h, 9) AS hub
FROM s{_HITS_ITER} ORDER BY node
""".rstrip()
    )


def q_anchor_text_agg(spark, sf_dir):
    """Anchor-text aggregation (operators/links.anchor_text_agg — the
    document-expansion / query-document training signal): arithmetic
    edges with 25 destinations × up to 12 anchor classes plus empty
    anchors (counted as links, never as anchors); top-10 per dst by
    count desc then lexically. The oracle regenerates counts and the
    rank-ordered join arithmetically."""
    from connapse_spark.operators import links as _links

    docs = _t(spark, sf_dir, "documents")
    edges = docs.select(
        F.concat(F.lit("https://s/"), F.col("doc_id").cast("string")).alias("src"),
        F.concat(F.lit("https://t/"), (F.col("doc_id") % 25).cast("string")).alias("dst"),
        F.when(F.col("doc_id") % 5 == 0, F.lit("")).otherwise(
            F.concat(F.lit("ref "), (F.col("doc_id") % 12).cast("string"))
        ).alias("anchor"),
    )
    out = _links.anchor_text_agg(edges, k=10)
    return _long(out, "n_links", "n_anchor_kinds").orderBy("url")


def _sql_anchor_text_agg() -> str:
    return """
WITH e AS MATERIALIZED (
  SELECT 'https://t/' || CAST(doc_id % 25 AS VARCHAR) AS url,
         CASE WHEN doc_id % 5 = 0 THEN ''
              ELSE 'ref ' || CAST(doc_id % 12 AS VARCHAR) END AS anchor
  FROM documents
),
counts AS (
  SELECT url, anchor, count(*) AS cnt FROM e WHERE anchor <> '' GROUP BY url, anchor
),
ranked AS (
  SELECT url, anchor, cnt,
         row_number() OVER (PARTITION BY url ORDER BY cnt DESC, anchor) AS rk
  FROM counts
),
agg AS (
  SELECT url, string_agg(anchor, '|' ORDER BY rk) AS top_anchors
  FROM ranked WHERE rk <= 10 GROUP BY url
),
totals AS (
  SELECT url, CAST(count(*) AS BIGINT) AS n_links,
         CAST(count(DISTINCT CASE WHEN anchor <> '' THEN anchor END) AS BIGINT) AS n_anchor_kinds
  FROM e GROUP BY url
)
SELECT t.url, t.n_links, t.n_anchor_kinds, coalesce(a.top_anchors, '') AS top_anchors
FROM totals t LEFT JOIN agg a ON t.url = a.url
ORDER BY t.url
""".strip()


def q_pagerank(spark, sf_dir):
    """Damped PageRank by distributed power iteration (operators/links.py
    — one edges⋈ranks shuffle + one aggregate per iteration, rank vector
    localCheckpoint'ed so the twice-referenced plan can't compound,
    dangling mass folded into the teleport term as a broadcast one-row
    aggregate). The corpus-derived 50-node multigraph has
    parallel edges, self-loops and dangling nodes; the oracle unrolls the
    exact same 5 iterations as chained CTEs."""
    from connapse_spark.operators import links as _links

    edges = _pr_edges(_t(spark, sf_dir, "documents"), weighted=False)
    pr = _links.pagerank(edges, n_iter=_PR_ITER, damping=_PR_DAMP, round_to=9)
    return pr.orderBy("node")


def q_pagerank_warm(spark, sf_dir):
    """Incremental rank maintenance (links.pagerank_warm — VERDICT r7
    ask #6): warm-starting from a prior rank vector must be the
    arithmetic IDENTITY with continuing the cold iteration — warm(cold_3,
    2 more) on the pinned 50-node graph equals cold_5, so the oracle is
    the SAME unrolled 5-iteration SQL the cold entry pins. The prior
    vector rides in UNrounded (a real deployment persists it full-width
    in the snapshot layer and rounds only at serving)."""
    from connapse_spark.operators import links as _links

    edges = _pr_edges(_t(spark, sf_dir, "documents"), weighted=False)
    prior = _links.pagerank(edges, n_iter=3, damping=_PR_DAMP, round_to=None)
    warm = _links.pagerank_warm(
        edges, prior, n_iter=_PR_ITER - 3, damping=_PR_DAMP, round_to=9
    )
    return warm.orderBy("node")


def _sql_pagerank_unrolled(edges_sql: str, weighted: bool) -> str:
    """The k-iteration power loop as chained CTEs over an arbitrary
    (src, dst[, w]) edge query — the shared mirror for the unweighted and
    weighted (domain-graph) variants."""
    d, k = _PR_DAMP, _PR_ITER
    teleport = f"(1 - {d}) / (SELECT n FROM nn)"
    w = "w" if weighted else "1.0"
    parts = [f"""
e AS ({edges_sql}),
nodes AS (SELECT DISTINCT node FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
deg AS (SELECT src, sum({w}) AS deg FROM e GROUP BY src),
base AS (SELECT node, deg FROM nodes LEFT JOIN deg ON node = src),
nn AS (SELECT count(*) AS n FROM base),
r0 AS (SELECT node, deg, 1.0 / (SELECT n FROM nn) AS rank FROM base)"""]
    for i in range(1, k + 1):
        prev = f"r{i - 1}"
        parts.append(f"""
r{i} AS (
  SELECT b.node, b.deg,
         {teleport} + {d} * (
           coalesce(c.contrib, 0)
           + (SELECT coalesce(sum(rank), 0) FROM {prev} WHERE deg IS NULL)
             / (SELECT n FROM nn)
         ) AS rank
  FROM base b
  LEFT JOIN (SELECT e.dst, sum(r.rank * {'e.w' if weighted else '1.0'} / r.deg) AS contrib
             FROM e JOIN {prev} r ON e.src = r.node GROUP BY e.dst) c
    ON b.node = c.dst
)""")
    return (
        "WITH " + ",".join(parts)
        + f"\nSELECT node, round(rank, 9) AS rank FROM r{k} ORDER BY node"
    )


def _sql_pagerank() -> str:
    return _sql_pagerank_unrolled(_pr_edges_sql(weighted=False), weighted=False)


def q_pagerank_weighted(spark, sf_dir):
    """Weighted PageRank (links.pagerank(weight_col=...)) — the
    domain-graph crawl-priority form: a node splits rank across
    out-edges proportionally to weight. Same corpus-derived multigraph
    as `pagerank` but with arithmetic weights 1..5; the oracle reuses
    the shared unrolled-CTE mirror with weighted sums."""
    from connapse_spark.operators import links as _links

    edges = _pr_edges(_t(spark, sf_dir, "documents"), weighted=True)
    pr = _links.pagerank(
        edges, n_iter=_PR_ITER, damping=_PR_DAMP, round_to=9, weight_col="n_links"
    )
    return pr.orderBy("node")


def _sql_pagerank_weighted() -> str:
    return _sql_pagerank_unrolled(_pr_edges_sql(weighted=True), weighted=True)


# deterministic URL synthesis for the web-operator queries (the corpus has
# no url column): scheme/host/port/query each cycle through literal pools
# keyed on doc_id, exercising case-folding, default+explicit ports, eTLD+1
# grouping (two co.uk hosts collapse to one registered domain), tracking
# params, and param reordering
_URL_SCHEMES = ["https", "HTTP", "https"]
_URL_HOSTS = [
    "www.Example.COM", "blog.example.co.uk", "news.example.co.uk",
    "Docs.Widgets.ORG", "cdn.media.net", "shop.store.com",
]
_URL_PORTS = ["", ":443", ":8080", ""]
_URL_QUERIES = [
    "?utm_source=feed&id=7", "?gclid=x&q=spark&a=1", "?b=2&a=1", "",
    "?ref=home&x=9",
]


def _pool(pool, k):
    return F.element_at(
        F.array(*[F.lit(v) for v in pool]), (F.col("doc_id") % k + 1).cast("int")
    )


def _url_col():
    return F.concat(
        _pool(_URL_SCHEMES, 3), F.lit("://"), _pool(_URL_HOSTS, 6),
        _pool(_URL_PORTS, 4), F.lit("/p/"), F.col("doc_id").cast("string"),
        _pool(_URL_QUERIES, 5),
    )


def _sql_pool(pool, k):
    lits = ", ".join(f"'{v}'" for v in pool)
    return f"([{lits}][(doc_id % {k} + 1)::INT])"


_SQL_URL = (
    f"({_sql_pool(_URL_SCHEMES, 3)} || '://' || {_sql_pool(_URL_HOSTS, 6)} || "
    f"{_sql_pool(_URL_PORTS, 4)} || '/p/' || doc_id || {_sql_pool(_URL_QUERIES, 5)})"
)


def q_url_canonicalize(spark, sf_dir):
    """Web ops: canonical URL (case-fold, default-port strip, tracking-param
    strip, param sort) + registered domain (eTLD+1) as pure column math."""
    docs = _t(spark, sf_dir, "documents").withColumn("url", _url_col())
    return web.canonicalize_urls(docs).select(
        "doc_id", "url", "canonical_url", "domain"
    ).orderBy("doc_id")


def _sql_url_canonicalize() -> str:
    return f"""
WITH d AS (SELECT doc_id, {_SQL_URL} AS url FROM documents)
SELECT doc_id, url,
       {web.sql_canonical_url('url')} AS canonical_url,
       {web.sql_registered_domain(web.sql_host('url'))} AS domain
FROM d ORDER BY doc_id
""".strip()


def q_domain_caps(spark, sf_dir):
    """Per-registered-domain contribution cap (RefinedWeb-style): hash-order
    row_number per domain, keep the first 20 — survivor set is a pure
    function of the row keys."""
    docs = _t(spark, sf_dir, "documents").withColumn("url", _url_col())
    return web.domain_caps(docs, max_per_domain=20).select(
        "doc_id", "domain", "domain_rank"
    ).orderBy("doc_id")


def _sql_domain_caps() -> str:
    inner = web.sql_domain_caps(
        "url", max_per_domain=20,
        table="(SELECT doc_id, " + _SQL_URL + " AS url FROM documents)",
    )
    return f"SELECT doc_id, domain, domain_rank FROM ({inner}) ORDER BY doc_id"


def q_domain_stats(spark, sf_dir):
    """Per-domain corpus profile: doc count, char totals, distinct paths."""
    docs = _t(spark, sf_dir, "documents").withColumn("url", _url_col())
    return web.domain_stats(docs).orderBy("domain")


def _sql_domain_stats() -> str:
    return (
        web.sql_domain_stats(
            "url",
            table="(SELECT doc_id, text, " + _SQL_URL + " AS url FROM documents)",
        )
        + " ORDER BY domain"
    )


# deterministic dirty-text synthesis for the normalization query: the
# corpus text is clean, so each doc gets a suffix drawn from pools of
# mojibake (generated from the same cp1252 round-trip the repair map
# uses), NBSP/zero-width/control chars, and CRLF — never hand-typed
def _moji(s: str) -> str:
    return s.encode("utf-8").decode("cp1252")


_DIRT_POOL = [
    " " + _moji("café") + " r" + _moji("é") + "sum" + _moji("é"),
    " " + _moji("“") + "quoted" + _moji("…") + " text",
    "   spaced​ out\t\ttabs  ",
    " ctrl\x07chars\x01here\r\nnext line",
    "",
]


def q_normalize_text(spark, sf_dir):
    """Normalization pass: mojibake repair + control/zero-width strip +
    unicode-space folding + whitespace collapse, with before/after gauges.
    Pure JVM replace/regexp chain — map-side, rides the scan at 100 TB."""
    docs = _t(spark, sf_dir, "documents").withColumn(
        "text", F.concat(F.col("text"), _pool(_DIRT_POOL, 5))
    )
    return normalize.normalize_documents(docs).select(
        "doc_id",
        "n_mojibake",
        "chars_removed",
        F.sha2(F.col("text_norm"), 256).alias("norm_sha"),
    ).orderBy("doc_id")


def _sql_normalize_text() -> str:
    lits = ", ".join(normalize._sql_lit(d) for d in _DIRT_POOL)
    dirty = f"(text || [{lits}][(doc_id % 5 + 1)::INT])"
    return f"""
WITH d AS (SELECT doc_id, {dirty} AS text FROM documents)
SELECT doc_id,
       {normalize.sql_mojibake_count('text')} AS n_mojibake,
       (length(text) - length({normalize.sql_normalize_text('text')}))::INT AS chars_removed,
       sha256({normalize.sql_normalize_text('text')}) AS norm_sha
FROM d ORDER BY doc_id
""".strip()


_PROFILE_COLS = [
    "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
    "o_orderdate", "o_orderpriority",
]
_PROFILE_STABLE = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]


def q_shard_manifest(spark, sf_dir):
    """Training-export integrity manifest: per-shard doc/char counts and a
    key-ordered content hash for the deterministic JSONL shard writer
    (``sinks.write_training_shards``) — two exports match iff manifests
    match, no byte comparison needed."""
    return sinks.shard_manifest(_t(spark, sf_dir, "documents"), n_shards=8)


def _sql_shard_manifest() -> str:
    return sinks.sql_shard_manifest(n_shards=8)


def q_table_stats(spark, sf_dir):
    """ANALYZE-style column profile of orders: row/null/distinct counts +
    min/max/avg-len for render-stable types — ONE scan (multi-distinct
    Expand aggregate), unpivoted to a row per column."""
    return profile.column_profile(_t(spark, sf_dir, "orders"), _PROFILE_COLS)


def _sql_table_stats() -> str:
    return profile.sql_column_profile("orders", _PROFILE_COLS, _PROFILE_STABLE)


def q_markdown_sections(spark, sf_dir):
    """T4 native section walker over synthesized markdown."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", _markdown_col().alias("md")
    )
    out = chunking.markdown_sections(docs, text_col="md")
    return _long(out, "section_index", "depth")


def _sql_markdown_sections() -> str:
    md_docs = f"(SELECT doc_id, {_SQL_MARKDOWN} AS md FROM documents)"
    return chunking.sql_markdown_sections(table=md_docs, text_col="md")


def q_chunk_doc_aware(spark, sf_dir):
    """C4 native tier: one chunk per markdown section, breadcrumb prefix,
    oversize sections sub-split by char windows."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", _markdown_col().alias("md")
    )
    out = chunking.chunk_doc_aware(docs, size=120, text_col="md")
    return _long(out, "section_index", "sub_index")


def _sql_chunk_doc_aware() -> str:
    md_docs = f"(SELECT doc_id, {_SQL_MARKDOWN} AS md FROM documents)"
    return chunking.sql_chunk_doc_aware(size=120, table=md_docs, text_col="md")


def q_chunk_recursive(spark, sf_dir):
    """C2 native tier: separator split → greedy char pack → oversize
    sub-split. Paragraph breaks are synthesized (corpus text is one line)."""
    para = F.concat_ws(
        "\n\n",
        F.substring("text", 1, 150),
        F.substring("text", 151, 150),
        F.expr("substring(text, 301)"),
    )
    docs = _t(spark, sf_dir, "documents").select("doc_id", para.alias("ptext"))
    out = chunking.chunk_recursive_native(docs, max_chars=120, text_col="ptext")
    return _long(out, "pack_index", "sub_index")


_SQL_PARA = (
    "concat_ws(chr(10) || chr(10), substr(text, 1, 150), substr(text, 151, 150), "
    "substr(text, 301))"
)


def _sql_chunk_recursive() -> str:
    para_docs = f"(SELECT doc_id, {_SQL_PARA} AS ptext FROM documents)"
    return chunking.sql_chunk_recursive_native(
        max_chars=120, table=para_docs, text_col="ptext"
    )


def q_chunk_sentence_aware(spark, sf_dir):
    """C6 native tier: whole-sentence greedy pack (sentences synthesized —
    corpus text carries no punctuation)."""
    sent = F.concat(
        F.concat_ws(
            ". ",
            F.substring("text", 1, 80),
            F.substring("text", 81, 90),
            F.substring("text", 171, 70),
            F.expr("substring(text, 241)"),
        ),
        F.lit("."),
    )
    docs = _t(spark, sf_dir, "documents").select("doc_id", sent.alias("stext"))
    out = chunking.chunk_sentence_aware_native(docs, max_chars=180, text_col="stext")
    return _long(out, "chunk_index", "n_chars")


_SQL_SENT = (
    "concat_ws('. ', substr(text, 1, 80), substr(text, 81, 90), substr(text, 171, 70), "
    "substr(text, 241)) || '.'"
)


def _sql_chunk_sentence_aware() -> str:
    sent_docs = f"(SELECT doc_id, {_SQL_SENT} AS stext FROM documents)"
    return chunking.sql_chunk_sentence_aware_native(
        max_chars=180, table=sent_docs, text_col="stext"
    )


def q_ingest_stats(spark, sf_dir):
    """Full §3.3 pipeline (UDF chunker → embed-cache anti-join → hash
    embed), HASH-CHECKED via its invariant projection (r5 ask #8 — was
    rows-only): the pandas-UDF chunker's per-chunk output is not
    SQL-expressible, but its OFFSET CONTRACT is — chunks tile the stripped
    document exactly, so per document min(start_offset) must equal the
    leading-whitespace length and max(end_offset) the rstripped length,
    both computable by DuckDB from the raw text. The boolean invariants
    pin the vector side (one vector per chunk, nothing cache-served
    without a cache) and token coverage (chunk token_count sums to at
    least the document's own BPE-token count — chunks cover every token,
    overlap only adds). This doubles as the pipeline-level regression
    test for the r5 chunk_recursive offset bug: a single corrupted
    start_offset=-1 flips cover_start and the hash.

    Whitespace contract: Python str.strip()/re \\s are Unicode-aware while
    DuckDB RE2 classes are ASCII — so BOTH sides deterministically exclude
    documents containing any non-ASCII whitespace (or the \\x1c-\\x1f
    separators Python also strips), and the ASCII class itself includes
    \\x0b/\\x0c to match Python/Java exactly. On the all-ASCII driver
    corpus the filter excludes nothing; on exotic input it keeps the gate
    sound instead of flipping on semantics the chunker never promised."""
    docs = _t(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & ~F.col("text").rlike(_EXOTIC_WS_CLASS)
    )
    chunks, vectors = ingest(docs)
    stats = ingest_stats(chunks, vectors)
    cover = chunks.groupBy("document_id").agg(
        F.min("start_offset").cast("long").alias("cover_start"),
        F.max("end_offset").cast("long").alias("cover_end"),
    )
    doc_tokens = docs.select(
        F.col("doc_id").alias("document_id"),
        F.size(
            F.regexp_extract_all(
                F.col("text"), F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), 0
            )
        ).alias("_doc_tokens"),
    )
    return (
        stats.join(cover, "document_id")
        .join(doc_tokens, "document_id")
        .select(
            "document_id",
            "cover_start",
            "cover_end",
            (F.col("total_vectors") == F.col("chunk_count")).alias("vectors_complete"),
            (F.col("cached_vectors") == F.lit(0)).alias("all_embedded"),
            (F.col("token_sum") >= F.col("_doc_tokens")).alias("token_sum_covers"),
            "status",
        )
        .orderBy("document_id")
    )


# Unicode whitespace + \x1c-\x1f separators: chars Python strip()/\s treat
# as whitespace but ASCII regex classes do not. Built as LITERAL chars so
# the Spark (Java) and DuckDB (RE2) patterns are byte-identical.
_EXOTIC_WS_CLASS = "[" + "".join(
    chr(c)
    for c in (
        [0x1C, 0x1D, 0x1E, 0x1F, 0x85, 0xA0, 0x1680]
        + list(range(0x2000, 0x200B))
        + [0x2028, 0x2029, 0x202F, 0x205F, 0x3000]
    )
) + "]"
# the ASCII whitespace class, matching Python/Java semantics exactly
# (\x0b vertical tab and \x0c form feed included)
_ASCII_WS = " \\t\\n\\r\\f\\x0b"


def _sql_ingest_stats() -> str:
    """DuckDB mirror of the UDF-tier invariants, computed from the raw
    text alone: the chunker must tile [leading-ws, rstrip-length). Docs
    with exotic (non-ASCII) whitespace are excluded on BOTH sides — see
    q_ingest_stats."""
    ws = _ASCII_WS
    return f"""
SELECT doc_id AS document_id,
       CAST(length(text) - length(regexp_replace(text, '^[{ws}]+', '')) AS BIGINT)
         AS cover_start,
       CAST(length(regexp_replace(text, '[{ws}]+$', '')) AS BIGINT) AS cover_end,
       TRUE AS vectors_complete,
       TRUE AS all_embedded,
       TRUE AS token_sum_covers,
       'Ready' AS status
FROM documents
WHERE text IS NOT NULL
  AND NOT regexp_matches(text, '{_EXOTIC_WS_CLASS}')
  AND regexp_matches(text, '[^{ws}]')
ORDER BY document_id
""".strip()


def q_ingest_stats_native(spark, sf_dir):
    """Fully ORACLE-CHECKED ingest-pipeline twin: native recursive
    chunker → content hash → JVM hash-embedder → per-document summary.
    This twin puts the chunk→hash→embed→summarize COMPOSITION under the
    value-hash gate with exact per-chunk values (embedding inclusion is
    pinned by an order-free integer micro-sum of each vector's head
    component); the UDF-tier ingest_stats is hash-checked too since r6,
    via its offset/coverage invariant projection."""
    from connapse_spark.functions.embed import embed_expr

    para = F.concat_ws(
        "\n\n",
        F.substring("text", 1, 150),
        F.substring("text", 151, 150),
        F.expr("substring(text, 301)"),
    )
    docs = _t(spark, sf_dir, "documents").select("doc_id", para.alias("ptext"))
    chunks = chunking.chunk_recursive_native(docs, max_chars=120, text_col="ptext")
    enriched = chunks.select(
        "document_id",
        F.sha2("content", 256).alias("content_hash"),
        F.length("content").alias("n_chars"),
        embed_expr(F.col("content"), 64).alias("emb"),
    )
    return (
        enriched.groupBy("document_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("chunk_count"),
            F.sum("n_chars").cast("long").alias("char_sum"),
            F.countDistinct("content_hash").cast("long").alias("n_unique_chunks"),
            F.sum(
                F.round(F.element_at("emb", 1) * 1000000).cast("long")
            ).alias("emb_head_microsum"),
        )
        .orderBy("document_id")
    )


def _sql_ingest_stats_native() -> str:
    from connapse_spark.functions.embed import sql_embed

    emb_head = f"({sql_embed('content', 64)})[1]"
    return f"""
WITH chunks AS ({_sql_chunk_recursive()})
SELECT document_id,
       CAST(count(*) AS BIGINT) AS chunk_count,
       CAST(sum(length(content)) AS BIGINT) AS char_sum,
       CAST(count(DISTINCT sha256(content)) AS BIGINT) AS n_unique_chunks,
       CAST(sum(CAST(round({emb_head} * 1000000) AS BIGINT)) AS BIGINT) AS emb_head_microsum
FROM chunks GROUP BY document_id ORDER BY document_id
""".strip()


def q_postings_upsert(spark, sf_dir):
    """Incremental keyword-index maintenance (keyword_index.upsert_postings):
    base postings built WITHOUT the batch docs' new text, then a batch of
    updated docs (doc_id%9==0, text + ' updated') and deletions
    (doc_id%31==0, non-batch) fold in. The ORACLE rebuilds the postings
    from scratch over the post-upsert corpus — incremental must equal
    rebuild, the strongest possible contract for index maintenance."""
    from connapse_spark.operators.keyword_index import (
        build_postings,
        build_token_table,
        upsert_postings,
    )

    docs = _t(spark, sf_dir, "documents")
    base_postings = build_postings(build_token_table(docs))
    batch_docs = docs.filter(F.col("doc_id") % 9 == 0).select(
        "doc_id", F.concat(F.col("text"), F.lit(" updated")).alias("text")
    )
    deleted = [
        r["doc_id"]
        for r in docs.filter((F.col("doc_id") % 31 == 0) & (F.col("doc_id") % 9 != 0))
        .select("doc_id")
        .collect()
    ]
    out = upsert_postings(
        base_postings, build_token_table(batch_docs), deleted_ids=deleted
    )
    return (
        out.select("term", F.explode("ids").alias("id"), "df")
        .orderBy("term", "id")
    )


def q_tf_postings_upsert(spark, sf_dir):
    """Incremental tf-postings maintenance (keyword_index.upsert_tf_postings)
    — the write side of the r6 postings-SERVED query tiers, same fixture
    as postings_upsert: base (term, id, tf) built over the original
    corpus, then doc_id%9==0 upserts (text + ' updated') and %31 deletes
    fold in with a broadcast anti-join (no driver collect). The oracle
    rebuilds from the post-upsert corpus — incremental must equal
    rebuild."""
    from connapse_spark.operators.keyword_index import (
        build_tf_postings,
        build_token_table,
        upsert_tf_postings,
    )

    docs = _t(spark, sf_dir, "documents")
    base = build_tf_postings(build_token_table(docs))
    batch_docs = docs.filter(F.col("doc_id") % 9 == 0).select(
        "doc_id", F.concat(F.col("text"), F.lit(" updated")).alias("text")
    )
    deleted = [
        r["doc_id"]
        for r in docs.filter((F.col("doc_id") % 31 == 0) & (F.col("doc_id") % 9 != 0))
        .select("doc_id")
        .collect()
    ]
    out = upsert_tf_postings(
        base, build_token_table(batch_docs), deleted_ids=deleted
    )
    return out.orderBy("term", "id")


def q_positions_upsert(spark, sf_dir):
    """Incremental positions-postings maintenance (r10 — VERDICT r9 ask
    #2, keyword_index.upsert_positions_postings): the write side of the
    r9 positions-SERVED phrase and proximity tiers, same fixture as
    tf_postings_upsert — base (term, id, positions) built over the
    original corpus, then doc_id%9==0 upserts (text + ' updated') and
    %31 deletes fold in with ONE anti-join (no corpus re-posexplode, no
    driver collect of postings). The oracle rebuilds position arrays
    from the post-change corpus — incremental must equal rebuild
    POSITION FOR POSITION, which the exploded (term, id, pos) output
    pins cell-for-cell (the driver canonicalizer can't hash array
    columns, so the explode IS the strongest checkable form)."""
    from connapse_spark.operators.keyword_index import (
        build_positions_postings,
        build_token_table,
        upsert_positions_postings,
    )

    docs = _t(spark, sf_dir, "documents")
    base = build_positions_postings(build_token_table(docs))
    batch_docs = docs.filter(F.col("doc_id") % 9 == 0).select(
        "doc_id", F.concat(F.col("text"), F.lit(" updated")).alias("text")
    )
    deleted = [
        r["doc_id"]
        for r in docs.filter((F.col("doc_id") % 31 == 0) & (F.col("doc_id") % 9 != 0))
        .select("doc_id")
        .collect()
    ]
    out = upsert_positions_postings(
        base, build_token_table(batch_docs), deleted_ids=deleted
    )
    return (
        out.select("term", "id", F.explode("positions").alias("pos"))
        .withColumn("pos", F.col("pos").cast("bigint"))
        .orderBy("term", "id", "pos")
    )


def q_tf_pending_resolve(spark, sf_dir):
    """Pending-list keyword index END TO END on disk (keyword_index.
    tf_pending_append → tf_resolve): batch 0 commits the original corpus
    to the delta, batch 1 appends the postings_upsert fixture's updates
    (doc_id%9) and deletes (%31) as tombstones, then the SERVE-time
    resolution reads both committed versions back. Same oracle as
    tf_postings_upsert (rebuild over the post-change corpus) — what is
    hash-checked is the whole fastupdate regime: append-only commits,
    tombstone clock, latest-batch resolution."""
    import shutil
    import tempfile

    from connapse_spark.operators.keyword_index import (
        tf_pending_append,
        tf_resolve,
    )

    root = os.path.join(
        tempfile.gettempdir(),
        f"connapse_tfpend_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    shutil.rmtree(root, ignore_errors=True)
    base_dir, delta_dir = os.path.join(root, "base"), os.path.join(root, "delta")
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    tf_pending_append(docs, delta_dir, batch=0)
    upd = docs.filter(F.col("doc_id") % 9 == 0).select(
        "doc_id", F.concat(F.col("text"), F.lit(" updated")).alias("text")
    )
    deleted = [
        r["doc_id"]
        for r in docs.filter((F.col("doc_id") % 31 == 0) & (F.col("doc_id") % 9 != 0))
        .select("doc_id")
        .collect()
    ]
    tf_pending_append(upd, delta_dir, deleted_ids=deleted, batch=1)
    out = tf_resolve(spark, base_dir, delta_dir).filter(F.col("kind") == "exact")
    return out.select("term", "id", "tf").orderBy("term", "id")


def q_positions_pending_resolve(spark, sf_dir):
    """Pending-list POSITIONS index end to end on disk (r10 —
    keyword_index.positions_pending_append → positions_resolve): the
    fastupdate regime extended to the phrase/proximity serving
    structure, where the O(index)-per-batch overwrite hurts most. Batch
    0 commits the original corpus's position lists to the delta, batch 1
    appends the postings_upsert fixture's updates (doc_id%9) and deletes
    (%31) as tombstones, then serve-time resolution reads both committed
    versions back. Shares positions_upsert's oracle (rebuild over the
    post-change corpus, exploded position for position) — what is
    hash-checked is append-only commits + tombstone clock + latest-batch
    resolution over the ARRAY payload."""
    import shutil
    import tempfile

    from connapse_spark.operators.keyword_index import (
        positions_pending_append,
        positions_resolve,
    )

    root = os.path.join(
        tempfile.gettempdir(),
        f"connapse_pospend_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    shutil.rmtree(root, ignore_errors=True)
    base_dir, delta_dir = os.path.join(root, "base"), os.path.join(root, "delta")
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    positions_pending_append(docs, delta_dir, batch=0)
    upd = docs.filter(F.col("doc_id") % 9 == 0).select(
        "doc_id", F.concat(F.col("text"), F.lit(" updated")).alias("text")
    )
    deleted = [
        r["doc_id"]
        for r in docs.filter((F.col("doc_id") % 31 == 0) & (F.col("doc_id") % 9 != 0))
        .select("doc_id")
        .collect()
    ]
    positions_pending_append(upd, delta_dir, deleted_ids=deleted, batch=1)
    out = positions_resolve(spark, base_dir, delta_dir).filter(
        F.col("kind") == "exact"
    )
    return (
        out.select("term", "id", F.explode("positions").alias("pos"))
        .withColumn("pos", F.col("pos").cast("bigint"))
        .orderBy("term", "id", "pos")
    )


def q_bm25_upsert(spark, sf_dir):
    """Incremental BM25-serving maintenance END TO END (r10 —
    keyword_index.upsert_doclen closes the family's last gap: tf
    postings upserted since r6, but the doclen table BM25 mixes them
    with forced a corpus re-tokenize per crawl drop, silently staling
    the served avgdl/N otherwise). Same fixture as tf_postings_upsert:
    base tf_stemmed + doclen built over the original corpus, doc_id%9
    updates and %31 deletes fold into BOTH tables with the anti-join
    twins (no corpus re-tokenize, no driver collect on the postings
    path), then keyword_search_bm25_indexed SERVES the query from the
    upserted pair. The oracle scores the scan-tier BM25 SQL over the
    post-change corpus — what is hash-checked is the full claim:
    incrementally-maintained serving structures produce bit-equal
    ranked scores to a from-scratch rebuild."""
    from connapse_spark.operators.keyword_index import (
        build_doclen_table,
        build_tf_postings,
        build_token_table,
        keyword_search_bm25_indexed,
        upsert_doclen,
        upsert_tf_postings,
    )

    docs = _t(spark, sf_dir, "documents")
    tokens = build_token_table(docs)
    base_tf = build_tf_postings(tokens, "tokens_stemmed")
    base_dl = build_doclen_table(tokens)
    batch_docs = docs.filter(F.col("doc_id") % 9 == 0).select(
        "doc_id", F.concat(F.col("text"), F.lit(" updated")).alias("text")
    )
    deleted = [
        r["doc_id"]
        for r in docs.filter((F.col("doc_id") % 31 == 0) & (F.col("doc_id") % 9 != 0))
        .select("doc_id")
        .collect()
    ]
    batch_tokens = build_token_table(batch_docs).persist()
    tf_up = upsert_tf_postings(
        base_tf, batch_tokens, deleted_ids=deleted, token_col="tokens_stemmed"
    )
    dl_up = upsert_doclen(base_dl, batch_tokens, deleted_ids=deleted)
    return _scoped_cache_result(
        spark,
        batch_tokens,
        keyword_search_bm25_indexed(tf_up, dl_up, SEARCH_QUERY, k=20)
        .withColumnRenamed("id", "doc_id"),
    )


def q_serving_compact(spark, sf_dir):
    """Serving-layout compaction END TO END (r11 — compact_serving is
    the only correct fold for an ingest_serving layout: it resolves the
    pending deltas at the PINNED versions, truncates them, and
    republishes the repinned cut; raw tf_compact would leave the
    manifest pinning the old base and the next pending wave's cut would
    silently lose every folded change). Fixture: bootstrap the keyword
    serving tables + manifest over the original corpus, fold the
    postings_upsert batch (doc_id%9 updates, %31 deletes) through a
    PENDING-mode keyword_serving_wave, compact, then serve the tf rows
    from the repinned cut with NO delta resolution. Oracle: rebuild
    over the post-change corpus — the tf_postings_upsert SQL — so the
    hash pins append + tombstone clock + pinned-version fold + repin."""
    import shutil
    import tempfile

    from connapse_spark.operators import keyword_index as ki
    from connapse_spark.operators.ingest import (
        compact_serving,
        keyword_serving_wave,
        publish_serving,
    )
    from connapse_spark.sources import snapshots as snaps

    base = os.path.join(
        tempfile.gettempdir(),
        f"connapse_servcompact_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    shutil.rmtree(base, ignore_errors=True)
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    toks = ki.build_token_table(docs)
    tables = {
        "tokens": snaps.commit_snapshot(toks, os.path.join(base, "tokens")),
        "postings": snaps.commit_snapshot(
            ki.build_postings(toks, "tokens_exact")
            .withColumn("kind", F.lit("exact"))
            .unionByName(
                ki.build_postings(toks, "tokens_stemmed").withColumn(
                    "kind", F.lit("stemmed")
                )
            )
            .select("kind", "term", "ids", "df"),
            os.path.join(base, "postings"),
            partition_by=["kind"],
        ),
        "tf_postings": snaps.commit_snapshot(
            ki.build_tf_postings(toks, "tokens_exact")
            .withColumn("kind", F.lit("exact"))
            .unionByName(
                ki.build_tf_postings(toks, "tokens_stemmed").withColumn(
                    "kind", F.lit("stemmed")
                )
            )
            .select("kind", "term", "id", "tf")
            .unionByName(ki.doclen_partition_rows(ki.build_doclen_table(toks))),
            os.path.join(base, "tf_postings"),
            partition_by=["kind"],
        ),
        "positions_postings": snaps.commit_snapshot(
            ki.build_positions_all(toks),
            os.path.join(base, "positions_postings"),
            partition_by=["kind"],
        ),
    }
    publish_serving(base, tables, stemmer="suffix")

    batch = docs.filter(F.col("doc_id") % 9 == 0).select(
        "doc_id", F.concat(F.col("text"), F.lit(" updated")).alias("text")
    )
    affected = docs.filter(
        (F.col("doc_id") % 9 == 0) | (F.col("doc_id") % 31 == 0)
    ).select(F.col("doc_id").alias("id"))
    pinned = snaps.load_manifest(os.path.join(base, "_serving"))["tables"]
    out = keyword_serving_wave(
        spark, base, batch, affected, pinned,
        tf_mode="pending", id_col="doc_id", text_col="text",
    )
    publish_serving(base, out, stemmer="suffix")
    compact_serving(spark, base)
    cut = snaps.load_manifest(os.path.join(base, "_serving"))["tables"]
    assert "tf_pending" not in cut and "positions_pending" not in cut
    served = snaps.read_snapshot(
        spark, os.path.join(base, "tf_postings"), version=cut["tf_postings"]
    )
    return (
        served.filter(F.col("kind") == "exact")
        .select("term", "id", "tf")
        .orderBy("term", "id")
    )


def q_porter2_vocab(spark, sf_dir):
    """Full Snowball English stemmer (r10 — VERDICT r9 missing #4: the
    weight-B stemmed config's declared simplification; functions/porter2.py
    implements the published Porter2 algorithm, selectable via
    build_token_table(stemmer='porter2')). No ANSI-SQL mirror of the
    algorithm exists (DuckDB's stem() needs the offline-unavailable fts
    extension), so THIS entry is the gate pin: Spark stems the fixed
    spec-vector vocabulary through the SAME Arrow-batched pandas UDF the
    corpus path uses, while the oracle returns the hand-derived expected
    stems from a VALUES table — implementation drift breaks the hash.
    Vector derivation discipline is documented at SPEC_VECTORS."""
    from connapse_spark.functions.porter2 import SPEC_VECTORS, porter2_tokens_udf

    words = spark.createDataFrame([(w,) for w, _ in SPEC_VECTORS], "word string")
    return (
        words.withColumn(
            "stem", F.element_at(porter2_tokens_udf()(F.array(F.col("word"))), 1)
        )
        .orderBy("word")
    )


def _sql_porter2_vocab() -> str:
    from connapse_spark.functions.porter2 import SPEC_VECTORS

    def esc(s: str) -> str:
        return s.replace("'", "''")

    rows = ", ".join(f"('{esc(w)}', '{esc(st)}')" for w, st in SPEC_VECTORS)
    return (
        f"SELECT word, stem FROM (VALUES {rows}) AS t(word, stem) ORDER BY word"
    )


def _porter2_bm25_fixture():
    """The shared fixture behind ``keyword_bm25_porter2``: a deterministic
    corpus of overlapping windows over the hand-derived SPEC_VECTORS
    vocabulary (plain lowercase-ASCII words only, so the tokenizer yields
    exactly the word list on both engines). Returns (docs, stemmed_docs,
    query) where stemmed_docs carries the HAND-DERIVED stems — the oracle
    never runs the stemmer."""
    from connapse_spark.functions.porter2 import SPEC_VECTORS

    pairs = [
        (w, s)
        for w, s in SPEC_VECTORS
        if w.isascii() and w.isalpha() and w == w.lower()
    ]
    docs = []
    stemmed = []
    for i in range(12):
        window = pairs[i * 8 : i * 8 + 20]
        docs.append((i, " ".join(w for w, _ in window)))
        stemmed.append((i, [s for _, s in window]))
    # query words drawn from the vocabulary so their stems are the
    # hand-derived expectations too: runs→run, rational→ration,
    # generalization→general — each stem unifies several surface forms
    # spread across the overlapping windows
    return docs, stemmed, "runs rational generalization"


def q_keyword_bm25_porter2(spark, sf_dir):
    """BM25 SERVED through a porter2-built index end to end (r11 —
    VERDICT r10 ask #4: ``porter2_vocab`` pins the stemmer function, but
    no registry query served a SEARCH through a porter2-built index, and
    composition seams are where the r10 silent-0 bug lived). Spark builds
    the index with build_token_table(stemmer='porter2') — the same
    Arrow-batched UDF the committed serving layout now threads (ask #3)
    — and scores with keyword_search_bm25_indexed(stem_fn=porter2_stem).
    The oracle computes the identical fixed-order BM25 arithmetic in SQL
    over a VALUES table of HAND-DERIVED stems (the porter2_vocab
    technique, lifted from vocabulary to retrieval): any drift in the
    stemmer, the analyzer threading, or the serving tier breaks the
    hash."""
    from connapse_spark.functions.porter2 import porter2_stem
    from connapse_spark.operators.keyword_index import (
        build_doclen_table,
        build_tf_postings,
        build_token_table,
        keyword_search_bm25_indexed,
    )

    docs, _, query = _porter2_bm25_fixture()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    toks = build_token_table(df, stemmer="porter2")
    tf = build_tf_postings(toks, "tokens_stemmed")
    dl = build_doclen_table(toks)
    return keyword_search_bm25_indexed(
        tf, dl, query, k=12, stem_fn=porter2_stem
    ).withColumnRenamed("id", "doc_id")


def _sql_keyword_bm25_porter2() -> str:
    from connapse_spark.functions.porter2 import SPEC_VECTORS
    from connapse_spark.operators.search import BM25_B, BM25_K1

    _, stemmed, query = _porter2_bm25_fixture()
    lookup = dict(SPEC_VECTORS)
    terms = sorted({lookup[w] for w in query.split()})
    k1, b = BM25_K1, BM25_B
    rows = ", ".join(f"({i}, '{' '.join(st)}')" for i, st in stemmed)
    df_cols = ", ".join(
        f"sum(CASE WHEN list_contains(ts, '{t}') THEN 1 ELSE 0 END) AS df_{i}"
        for i, t in enumerate(terms)
    )
    norm = f"({k1!r} * (1.0 - {b!r} + {b!r} * (CAST(dl AS DOUBLE) / avgdl)))"
    parts = []
    for i, t in enumerate(terms):
        tf = f"CAST(len(list_filter(ts, x -> x = '{t}')) AS DOUBLE)"
        idf = (
            f"ln(1.0 + (CAST(n AS DOUBLE) - CAST(df_{i} AS DOUBLE) + 0.5) / "
            f"(CAST(df_{i} AS DOUBLE) + 0.5))"
        )
        parts.append(f"{idf} * ({tf} * {k1 + 1.0!r}) / ({tf} + {norm})")
    score = "(" + " + ".join(parts) + ")"
    return f"""
WITH base AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, string_split(stems, ' ') AS ts,
         len(string_split(stems, ' ')) AS dl
  FROM (VALUES {rows}) AS v(doc_id, stems)
),
stats AS (
  SELECT count(*) AS n, sum(dl) AS sumdl, {df_cols} FROM base
),
scored AS (
  SELECT doc_id, round({score}, 9) AS score
  FROM base, (SELECT *, CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE) AS avgdl FROM stats)
)
SELECT doc_id, score FROM scored WHERE score > 0.0
ORDER BY score DESC, doc_id LIMIT 12
""".strip()


def _sql_bm25_upsert() -> str:
    from connapse_spark.operators.search import sql_keyword_bm25

    corpus = (
        "(SELECT doc_id, CASE WHEN doc_id % 9 = 0 THEN text || ' updated' "
        "ELSE text END AS text FROM documents "
        "WHERE doc_id % 31 != 0 OR doc_id % 9 = 0)"
    )
    return sql_keyword_bm25(SEARCH_QUERY, k=20, table=corpus)


def q_token_shards(spark, sf_dir):
    """Seeded global shuffle + token-budget sharding (sampling.
    token_budget_shards): the training-export op — every doc takes a
    deterministic pseudorandom position (md5 of seed||doc_id) and shards
    chop at 4000-token boundaries, so shards balance by TOKEN mass. The
    Spark side runs the distributed two-pass prefix sum (range partition
    + per-partition window + broadcast offsets); the oracle runs DuckDB's
    single-stream global window — hash equality proves the distributed
    prefix is exact, boundary for boundary."""
    from connapse_spark.functions.text import tokens_exact_expr
    from connapse_spark.operators.sampling import token_budget_shards

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(tokens_exact_expr(F.col("text"))).cast("bigint").alias("n_tokens"),
    )
    out = token_budget_shards(
        docs, budget_tokens=4000, key_col="doc_id",
        token_count_col="n_tokens", seed="r6",
    )
    return out.orderBy("doc_id")


def _sql_token_shards() -> str:
    from connapse_spark.functions.text import sql_tokens_exact
    from connapse_spark.operators.sampling import sql_token_budget_shards

    return (
        sql_token_budget_shards(
            4000, "doc_id", f"len({sql_tokens_exact('text')})", seed="r6"
        )
        + "\nORDER BY doc_id"
    )


def _sql_tf_postings_upsert() -> str:
    from connapse_spark.functions.text import sql_tokens_exact

    return f"""
WITH corpus AS (
  SELECT doc_id,
         CASE WHEN doc_id % 9 = 0 THEN text || ' updated' ELSE text END AS text
  FROM documents
  WHERE doc_id % 31 != 0 OR doc_id % 9 = 0
),
tok AS (
  SELECT doc_id AS id, unnest({sql_tokens_exact('text')}) AS term
  FROM corpus
)
SELECT term, id, CAST(count(*) AS BIGINT) AS tf
FROM tok GROUP BY term, id
ORDER BY term, id
""".strip()


def _sql_positions_upsert() -> str:
    from connapse_spark.functions.text import sql_tokens_exact

    return f"""
WITH corpus AS (
  SELECT doc_id,
         CASE WHEN doc_id % 9 = 0 THEN text || ' updated' ELSE text END AS text
  FROM documents
  WHERE doc_id % 31 != 0 OR doc_id % 9 = 0
),
tokarr AS (
  SELECT doc_id AS id, {sql_tokens_exact('text')} AS arr FROM corpus
)
SELECT term, id, pos FROM (
  SELECT id, unnest(arr) AS term, CAST(unnest(range(len(arr))) AS BIGINT) AS pos
  FROM tokarr
)
ORDER BY term, id, pos
""".strip()


def _sql_postings_upsert() -> str:
    from connapse_spark.functions.text import sql_tokens_exact

    return f"""
WITH corpus AS (
  SELECT doc_id,
         CASE WHEN doc_id % 9 = 0 THEN text || ' updated' ELSE text END AS text
  FROM documents
  WHERE doc_id % 31 != 0 OR doc_id % 9 = 0
),
tok AS (
  SELECT DISTINCT doc_id AS id, unnest({sql_tokens_exact('text')}) AS term
  FROM corpus
),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tok GROUP BY term)
SELECT tok.term, tok.id, df.df
FROM tok JOIN df ON tok.term = df.term
ORDER BY tok.term, tok.id
""".strip()


def q_simhash_pairs(spark, sf_dir):
    """SimHash banded near-dup pairs (pigeonhole bands + bit_count verify)."""
    docs = _t(spark, sf_dir, "documents")
    return _long(dedup.simhash_neardup_pairs(docs, max_hamming=3), "hamming")


def q_rag_answer(spark, sf_dir):
    """LLM answer stage (ILlmProvider surface, §2.9): deterministic hit set →
    prompt assembly → fake-provider completion; fully oracle-checkable
    because the fake provider is sha256-of-prompt."""
    docs = _t(spark, sf_dir, "documents")
    hits = docs.select(
        F.concat(F.lit("q"), (F.col("doc_id") % 3).cast("string")).alias("query"),
        F.substring("text", 1, 120).alias("content"),
        ((F.col("doc_id") * 37 % 101).cast("double") / 100.0).alias("score"),
    )
    out = rag.rag_answer(hits, max_context=5)
    return _long(
        out.select(
            "query", "n_context", F.length("prompt").alias("prompt_chars"), "answer"
        ).orderBy("query"),
        "n_context",
        "prompt_chars",
    )


_SQL_RAG_HITS = """
SELECT 'q' || CAST(doc_id % 3 AS VARCHAR) AS query,
       substr(text, 1, 120) AS content,
       CAST((doc_id * 37) % 101 AS DOUBLE) / 100.0 AS score
FROM documents
""".strip()


def q_media_stats(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    media = multimodal.synthesize_media(docs.filter(F.col("doc_id") % 2 == 0), "image").unionByName(
        multimodal.synthesize_media(docs.filter(F.col("doc_id") % 2 == 1), "video")
    )
    return _long(multimodal.media_stats(media), "n_items", "total_bytes")


_SQL_MEDIA_STATS = """
WITH h AS (
  SELECT doc_id, text,
         CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'video' END AS modality,
         ('0x' || substr(sha256(text), 1, 8))::BIGINT AS hv
  FROM documents
),
media AS (
  SELECT doc_id AS media_id, modality, modality || '/x-stub' AS media_type,
         octet_length(encode(text)) AS n_bytes,
         (hv % 1920 + 64)::INT AS width, (hv % 1080 + 64)::INT AS height
  FROM h
)
SELECT modality, media_type, count(*) AS n_items, CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
       avg(width) AS avg_width, avg(height) AS avg_height
FROM media GROUP BY modality, media_type ORDER BY modality, media_type
""".strip()


# ---------------------------------------------------------------------------
# Analytics (A1-A4)
# ---------------------------------------------------------------------------


def q_batch_progress(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select(
        (F.col("doc_id") % 20).alias("batch_id"),
        F.when(F.col("doc_id") % 7 == 0, "Failed")
        .when(F.col("doc_id") % 3 == 0, "Processing")
        .otherwise("Ready")
        .alias("status"),
    )
    return analytics.batch_progress(docs)


_SQL_BATCH_SRC = """
  SELECT doc_id % 20 AS batch_id,
         CASE WHEN doc_id % 7 = 0 THEN 'Failed'
              WHEN doc_id % 3 = 0 THEN 'Processing'
              ELSE 'Ready' END AS status
  FROM documents
"""


def q_delete_cascade(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select(F.col("doc_id").alias("document_id"))
    chunks = chunking.chunk_fixed_char(_t(spark, sf_dir, "documents")).select(
        "document_id", "chunk_index"
    )
    vectors = _t(spark, sf_dir, "embeddings").select(F.col("vec_id").alias("document_id"))
    from connapse_spark.operators.maintenance import delete_cascade

    deleted = docs.filter(F.col("document_id") % 10 == 0).select("document_id")
    d2, c2, v2 = delete_cascade(docs, chunks, vectors, deleted)
    return (
        d2.agg(F.count(F.lit(1)).alias("n")).select(F.lit("documents").alias("tbl"), "n")
        .unionByName(c2.agg(F.count(F.lit(1)).alias("n")).select(F.lit("chunks").alias("tbl"), "n"))
        .unionByName(v2.agg(F.count(F.lit(1)).alias("n")).select(F.lit("vectors").alias("tbl"), "n"))
        .orderBy("tbl")
    )


def _sql_delete_cascade() -> str:
    inner = chunking.sql_chunk_fixed_char().replace("ORDER BY document_id, chunk_index", "")
    return f"""
WITH deleted AS (SELECT doc_id AS document_id FROM documents WHERE doc_id % 10 = 0)
SELECT 'chunks' AS tbl, count(*) AS n FROM ({inner}) c
WHERE c.document_id NOT IN (SELECT document_id FROM deleted)
UNION ALL
SELECT 'documents', count(*) FROM documents WHERE doc_id NOT IN (SELECT document_id FROM deleted)
UNION ALL
SELECT 'vectors', count(*) FROM embeddings WHERE vec_id NOT IN (SELECT document_id FROM deleted)
ORDER BY tbl
""".strip()


def q_corpus_stats(spark, sf_dir):
    df = analytics.corpus_stats(_t(spark, sf_dir, "documents")).orderBy("source")
    return _long(df, "n_docs", "n_en")


def q_model_discovery(spark, sf_dir):
    df = analytics.model_discovery(_t(spark, sf_dir, "embeddings"))
    return _long(df, "dimensions")


def q_doc_list_paged(spark, sf_dir):
    return analytics.document_list_paged(_t(spark, sf_dir, "documents"))


def q_file_browser(spark, sf_dir):
    return analytics.file_browser(_t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Events (windowed / sessionized / last-writer-wins)
# ---------------------------------------------------------------------------


def q_events_tumbling(spark, sf_dir):
    return events.tumbling_agg(events.load_events(spark, sf_dir))


def q_events_sliding(spark, sf_dir):
    return events.sliding_agg(events.load_events(spark, sf_dir))


def q_asof_attribution(spark, sf_dir):
    """As-of join (union + keyed-sort + last-non-null window): each purchase
    event attributed to the user's latest prior-or-simultaneous view.
    Oracle is DuckDB's NATIVE ASOF JOIN — an independent implementation."""
    return temporal.purchase_view_attribution(events.load_events(spark, sf_dir))


def q_range_join_orders(spark, sf_dir):
    """Banded range join through the TIME-BIN BUCKETED path (equi on
    (customer, bin) + 30-day band): per order, count and exact cents of
    the same customer's orders in the preceding window. The bucketed plan
    is the production shape — per-key history spreads across time bins,
    so a hot key cannot go quadratic."""
    return temporal.repeat_orders_window_bucketed(_t(spark, sf_dir, "orders"))


def q_events_rollup(spark, sf_dir):
    """Hypertable-style rollup: (day, type) leaves + per-day + grand totals
    in ONE aggregation pass via ROLLUP grouping sets."""
    return temporal.events_rollup(events.load_events(spark, sf_dir))


def q_events_top_types(spark, sf_dir):
    df = events.top_event_types(events.load_events(spark, sf_dir))
    return _long(df, "rank")


def q_events_sessionize(spark, sf_dir):
    df = events.sessionize(events.load_events(spark, sf_dir))
    return _long(df, "n_sessions")


def q_latest_event(spark, sf_dir):
    return events.latest_event_per_user(events.load_events(spark, sf_dir))


# ---------------------------------------------------------------------------
# Maintenance (M1/M2/S6)
# ---------------------------------------------------------------------------


def _paths(docs):
    return F.concat(F.lit("/"), F.col("source"), F.lit("/doc_"), F.col("doc_id").cast("string"))


def q_reindex_decisions(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    catalog = docs.select(
        _paths(docs).alias("path"),
        F.sha2("text", 256).alias("content_hash"),
        F.when(F.col("doc_id") % 11 == 0, "old").otherwise("cur").alias("settings_key"),
        F.when(F.col("doc_id") % 13 == 0, None).otherwise(F.lit("2026-01-01")).alias(
            "last_indexed_at"
        ),
        F.when(F.col("doc_id") % 13 == 0, "Pending").otherwise("Ready").alias("status"),
    )
    listing = docs.filter(F.col("doc_id") % 23 != 0).select(
        _paths(docs).alias("path"),
        F.when(F.col("doc_id") % 17 == 0, F.sha2(F.concat(F.col("text"), F.lit("x")), 256))
        .otherwise(F.sha2("text", 256))
        .alias("content_hash"),
    )
    return reindex_decisions(catalog, listing, "cur").orderBy("path")


_SQL_REINDEX = """
WITH catalog AS (
  SELECT concat('/', source, '/doc_', doc_id) AS path,
         sha256(text) AS content_hash,
         CASE WHEN doc_id % 11 = 0 THEN 'old' ELSE 'cur' END AS settings_key,
         CASE WHEN doc_id % 13 = 0 THEN NULL ELSE '2026-01-01' END AS last_indexed_at,
         CASE WHEN doc_id % 13 = 0 THEN 'Pending' ELSE 'Ready' END AS status
  FROM documents
),
listing AS (
  SELECT concat('/', source, '/doc_', doc_id) AS path,
         CASE WHEN doc_id % 17 = 0 THEN sha256(concat(text, 'x')) ELSE sha256(text) END AS new_hash
  FROM documents WHERE doc_id % 23 != 0
),
joined AS (
  SELECT c.path AS path,
         CASE WHEN l.path IS NULL THEN 'FileNotFound'
              WHEN c.content_hash != l.new_hash THEN 'ContentChanged'
              WHEN c.settings_key != 'cur' THEN 'ChunkingSettingsChanged'
              WHEN c.last_indexed_at IS NULL OR c.status != 'Ready' THEN 'NeverIndexed'
              ELSE 'Unchanged' END AS reason
  FROM catalog c LEFT JOIN listing l ON c.path = l.path
)
SELECT path, reason,
       CASE WHEN reason = 'FileNotFound' THEN 'Fail'
            WHEN reason = 'Unchanged' THEN 'Skip'
            ELSE 'Enqueue' END AS action
FROM joined ORDER BY path
""".strip()


def q_sync_delta(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    remote = docs.filter(F.col("doc_id") % 23 != 0).select(
        _paths(docs).alias("path"),
        (
            F.col("n_chars") + F.when(F.col("doc_id") % 17 == 0, 1).otherwise(0)
        ).alias("size_bytes"),
        F.timestamp_seconds(F.col("doc_id") * 60).alias("last_modified"),
    )
    catalog = docs.filter(F.col("doc_id") % 29 != 0).select(_paths(docs).alias("path"))
    snapshot = docs.select(
        _paths(docs).alias("path"),
        F.col("n_chars").alias("size_bytes"),
        F.timestamp_seconds(F.col("doc_id") * 60).alias("last_modified"),
    )
    return sync_delta(remote, catalog, snapshot).orderBy("path")


_SQL_SYNC_DELTA = """
WITH remote AS (
  SELECT concat('/', source, '/doc_', doc_id) AS path,
         n_chars + CASE WHEN doc_id % 17 = 0 THEN 1 ELSE 0 END AS r_size,
         to_timestamp(doc_id * 60) AS r_mtime
  FROM documents WHERE doc_id % 23 != 0
),
catalog AS (
  SELECT concat('/', source, '/doc_', doc_id) AS path, TRUE AS in_catalog
  FROM documents WHERE doc_id % 29 != 0
),
snapshot AS (
  SELECT concat('/', source, '/doc_', doc_id) AS path,
         n_chars AS s_size, to_timestamp(doc_id * 60) AS s_mtime
  FROM documents
),
j AS (
  SELECT coalesce(r.path, c.path) AS path, r.r_size, r.r_mtime, c.in_catalog, s.s_size, s.s_mtime
  FROM remote r FULL OUTER JOIN catalog c ON r.path = c.path
  LEFT JOIN snapshot s ON coalesce(r.path, c.path) = s.path
)
SELECT path,
       CASE WHEN r_size IS NOT NULL AND in_catalog IS NULL THEN 'create'
            WHEN r_size IS NULL AND in_catalog IS NOT NULL THEN 'delete'
            WHEN r_size != s_size OR r_mtime != s_mtime OR s_size IS NULL THEN 'update'
            ELSE 'none' END AS action
FROM j ORDER BY path
""".strip()


def q_upsert_lww(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    existing = docs.select("doc_id", "text", F.lit(1).alias("version"))
    incoming = docs.filter(F.col("doc_id") % 7 == 0).select(
        "doc_id", F.concat(F.col("text"), F.lit(" v2")).alias("text"), F.lit(2).alias("version")
    )
    out = upsert_last_writer_wins(existing, incoming, ["doc_id"], "version")
    return _long(
        out.select(
            "doc_id", "version", "generation", F.sha2("text", 256).alias("content_hash")
        ).orderBy("doc_id"),
        "version",
        "generation",
    )


_SQL_UPSERT_LWW = """
WITH unioned AS (
  SELECT doc_id, text, 1 AS version FROM documents
  UNION ALL
  SELECT doc_id, concat(text, ' v2') AS text, 2 AS version FROM documents WHERE doc_id % 7 = 0
),
ranked AS (
  SELECT doc_id, text, version,
         row_number() OVER (PARTITION BY doc_id ORDER BY version DESC) AS rn,
         count(*) OVER (PARTITION BY doc_id) AS generation
  FROM unioned
)
SELECT doc_id, CAST(version AS BIGINT) AS version, generation, sha256(text) AS content_hash
FROM ranked WHERE rn = 1 ORDER BY doc_id
""".strip()


# ---------------------------------------------------------------------------
# Contract functions
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full hybrid search (CC fusion) over sf0.001 documents."""
    return q_hybrid_cc(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    base = {
        "positions_upsert": q_positions_upsert,
        "positions_pending_resolve": q_positions_pending_resolve,
        "keyword_bm25_indexed": q_keyword_bm25_indexed,
        "hybrid_many_websearch_fast": q_hybrid_many_websearch_fast,
        "keyword_snippets_indexed": q_keyword_snippets_indexed,
        "gopher_multi": q_gopher_multi,
        "hits_warm": q_hits_warm,
        "keyword_unicode": q_keyword_unicode,
        "gopher_unicode": q_gopher_unicode,
        "minhash_unicode": q_minhash_unicode,
        "frontier_schedule_join": q_frontier_schedule_join,
        "pagerank_warm": q_pagerank_warm,
        "keyword_indexed_phrase": q_keyword_indexed_phrase,
        "frontier_schedule": q_frontier_schedule,
        "robots_sitemaps": q_robots_sitemaps,
        "redirect_edges": q_redirect_edges,
        "resolve_revisits": q_resolve_revisits,
        "hits": q_hits,
        "anchor_text_agg": q_anchor_text_agg,
        "web_noindex": q_web_noindex,
        "main_content": q_main_content,
        "html_adversarial": q_html_adversarial,
        "parse_binary": q_parse_binary,
        "chunk_semantic": q_chunk_semantic,
        "chunk_semantic_stddev": q_chunk_semantic_stddev,
        "chunk_semantic_gradient": q_chunk_semantic_gradient,
        "chunk_token_window": q_chunk_token_window,
        "language_id_multi": q_language_id_multi,
        "parse_warc": q_parse_warc,
        "cdx_index": q_cdx_index,
        "cdx_incremental": q_cdx_incremental,
        "image_neardup": q_image_neardup,
        "html_extract": q_html_extract,
        "html_meta": q_html_meta,
        "canonical_dedup": q_canonical_dedup,
        "warc_roundtrip": q_warc_roundtrip,
        "wet_roundtrip": q_wet_roundtrip,
        "wat_roundtrip": q_wat_roundtrip,
        "warc_images": q_warc_images,
        "web_curate": q_web_curate,
        "link_graph": q_link_graph,
        "link_anchors": q_link_anchors,
        "pagerank": q_pagerank,
        "pagerank_weighted": q_pagerank_weighted,
        "robots_gate": q_robots_gate,
        "sitemap_urls": q_sitemap_urls,
        "crawl_frontier": q_crawl_frontier,
        "frontier_delta": q_frontier_delta,
        "parser_dispatch": q_parser_dispatch,
        "hybrid_ann": q_hybrid_ann,
        "hybrid_ann_probe": q_hybrid_ann_probe,
        "hybrid_many_ann": q_hybrid_many_ann,
        "ann_router": q_ann_router,
        "hybrid_indexed": q_hybrid_indexed,
        "hybrid_dbsf_indexed": q_hybrid_dbsf_indexed,
        "hybrid_rrf_indexed": q_hybrid_rrf_indexed,
        "keyword_many_indexed": q_keyword_many_indexed,
        "hybrid_many_indexed": q_hybrid_many_indexed,
        "tf_postings_upsert": q_tf_postings_upsert,
        "bm25_upsert": q_bm25_upsert,
        "porter2_vocab": q_porter2_vocab,
        "keyword_bm25_porter2": q_keyword_bm25_porter2,
        "serving_compact": q_serving_compact,
        "tf_pending_resolve": q_tf_pending_resolve,
        "token_shards": q_token_shards,
        "ingest_stats": q_ingest_stats,
        "ann_ivf": q_ann_ivf,
        "chunk_recursive": q_chunk_recursive,
        "chunk_sentence_aware": q_chunk_sentence_aware,
        "chunk_doc_aware": q_chunk_doc_aware,
        "salted_agg": q_salted_agg,
        "hybrid_cc": q_hybrid_cc,
        "hybrid_websearch": q_hybrid_websearch,
        "keyword_many": q_keyword_many,
        "keyword_many_phrase": q_keyword_many_phrase,
        "hybrid_many": q_hybrid_many,
        "hybrid_many_websearch": q_hybrid_many_websearch,
        "hybrid_many_filtered": q_hybrid_many_filtered,
        "hybrid_many_fast": q_hybrid_many_fast,
        "pq_topk": q_pq_topk,
        "bloom_contamination": q_bloom_contamination,
        "ann_ivfpq": q_ann_ivfpq,
        "quality_sample": q_quality_sample,
        "cdc_chunks": q_cdc_chunks,
        "cms_hitters": q_cms_hitters,
        "distinct_sketch": q_distinct_sketch,
        "retention": q_retention,
        "value_percentiles": q_value_percentiles,
        "neardup_incremental": q_neardup_incremental,
        "props_extract": q_props_extract,
        "embedding_hygiene": q_embedding_hygiene,
        "bpe_merges": q_bpe_merges,
        "zorder_key": q_zorder_key,
        "quality_logit": q_quality_logit,
        "quality_classifier": q_quality_classifier,
        "curate_classified": q_curate_classified,
        "asof_attribution": q_asof_attribution,
        "events_rollup": q_events_rollup,
        "url_canonicalize": q_url_canonicalize,
        "normalize_text": q_normalize_text,
        "table_stats": q_table_stats,
        "shard_manifest": q_shard_manifest,
        "chunk_fixed_char": q_chunk_fixed_char,
        "corpus_stats": q_corpus_stats,
        "batch_progress": q_batch_progress,
        "delete_cascade": q_delete_cascade,
        "model_discovery": q_model_discovery,
        "doc_list_paged": q_doc_list_paged,
        "events_tumbling": q_events_tumbling,
        "latest_event": q_latest_event,
        "reindex_decisions": q_reindex_decisions,
        "sync_delta": q_sync_delta,
        "upsert_lww": q_upsert_lww,
        "ann_lsh": q_ann_lsh,
        "keyword_indexed": q_keyword_indexed,
        "hybrid_rerank": q_hybrid_rerank,
        "simhash_pairs": q_simhash_pairs,
        "parse_text": q_parse_text,
        # --- past the ~50-query window: r4/r5-greens, freshest last
        "keyword_websearch": q_keyword_websearch,
        "keyword_proximity": q_keyword_proximity,
        "keyword_proximity_indexed": q_keyword_proximity_indexed,
        "keyword_bm25": q_keyword_bm25,
        "semantic_topk": q_semantic_topk,
        "semantic_cross_model": q_semantic_cross_model,
        "mean_pool": q_mean_pool,
        "exact_dedup": q_exact_dedup,
        "neardup_cosine": q_neardup_cosine,
        "neardup_cosine_lsh": q_neardup_cosine_lsh,
        "neardup_groups": q_neardup_groups,
        "minhash_lsh": q_minhash_lsh,
        "ngram_jaccard": q_ngram_jaccard,
        "ngram_jaccard_prefix": q_ngram_jaccard_prefix,
        "simhash": q_simhash,
        "line_dedup": q_line_dedup,
        "dup_spans": q_dup_spans,
        "quality_stats": q_quality,
        "repetition_stats": q_repetition_stats,
        "fingerprint": q_fingerprint,
        "language_id": q_langid,
        "lang_mismatch": q_lang_mismatch,
        "tfidf_top_terms": q_tfidf_top_terms,
        "token_entropy": q_token_entropy,
        "top_bigrams": q_top_bigrams,
        "dsir_weights": q_dsir,
        "gopher_filter": q_gopher_filter,
        "redact_pii": q_redact_pii,
        "contamination": q_contamination,
        "cosine_adjacent": q_cosine_adjacent,
        "cache_misses": q_cache_misses,
        "embed_cached": q_embed_cached,
        "embed_quantized": q_embed_quantized,
        "sample_mix": q_sample_mix,
        "pack_sequences": q_pack_sequences,
        "markdown_sections": q_markdown_sections,
        "hybrid_window": q_hybrid_window,
        "ann_ivf_seeded": q_ann_ivf_seeded,
        "ivf_upsert": q_ivf_upsert,
        "events_sliding": q_events_sliding,
        "events_top_types": q_events_top_types,
        "random_projection": q_random_projection,
        "pq_encode": q_pq_encode,
        "media_stats": q_media_stats,
        "rag_answer": q_rag_answer,
        "events_sessionize": q_events_sessionize,
        "file_browser": q_file_browser,
        "funnel": q_funnel,
        "corpus_curate": q_corpus_curate,
        "dataset_card": q_dataset_card,
        "keyword_snippets": q_keyword_snippets,
        "range_join_orders": q_range_join_orders,
        "pq_recall": q_pq_recall,
        "domain_caps": q_domain_caps,
        "domain_stats": q_domain_stats,
        "ivf_drift": q_ivf_drift,
        "ingest_stats_native": q_ingest_stats_native,
        "postings_upsert": q_postings_upsert,
        "leakage_split": q_leakage_split,
        "snapshot_merge": q_snapshot_merge,
        "hybrid_onepass": q_hybrid_onepass,
        "semdedup": q_semdedup,
        "knn_join": q_knn_join,
        "cluster_assign": q_cluster_assign,
        "cluster_sizes": q_cluster_sizes,
        "perplexity": q_perplexity,
        "hybrid_rrf": q_hybrid_rrf,
        "hybrid_dbsf": q_hybrid_dbsf,
        "hybrid_autocut": q_hybrid_autocut,
        "hybrid_minscore": q_hybrid_minscore,
        "hybrid_filtered": q_hybrid_filtered,
        "keyword_search": q_keyword_search,
        "knn_vector": q_knn_vector,
        "mmr_diversify": q_mmr_diversify,
        "keyword_facets": q_keyword_facets,
        "temperature_mix": q_temperature_mix,
        "image_neardup_dct": q_image_neardup_dct,
        "audio_neardup": q_audio_neardup,
        "video_neardup": q_video_neardup,
        "perplexity_bigram": q_perplexity_bigram,
        "remove_dup_spans": q_remove_dup_spans,
        "knn_vector_filtered": q_knn_vector_filtered,
    }
    # --- Rotation invariant: the driver checks the FIRST ~50 entries,
    # --- so this list is kept at EXACTLY 50 (a unit pins it). Window =
    # --- the r8 NEW seats (the second wave's CDX index / image near-dup
    # --- / frontier delta, the Unicode-tokenizer fixtures, the
    # --- distributed frontier tier, the warm-start rank refresh, the
    # --- index-served phrase websearch), then the r8 CODE-CHANGED
    # --- families — the crawl front (two-phase cap, freshness waves,
    # --- enforced revisit persist, checkpoint release), the banded
    # --- Hamming kernel consumers (simhash), and every tokenizer
    # --- consumer (keyword/quality/dedup/chunk: the r8 Unicode split +
    # --- CJK bigrams + U+0130 fold change all their expressions,
    # --- identically on both engines) — families keep ONE
    # --- representative each where variants share the changed code
    # --- path (chunk_semantic for the stddev/gradient variants,
    # --- language_id_multi for lang_mismatch, ngram_jaccard_prefix for
    # --- ngram_jaccard, pagerank for pagerank_weighted). Everything
    # --- past the window keeps its previous relative order and is
    # --- covered by the committed full-gate run (CORRECTNESS_SELF.json).
    # r11 rotation (VERDICT r10 ask #8): rotate IN the families the
    # driver has NEVER hash-checked in-window — temporal/events
    # (asof_attribution, events_rollup, events_sessionize, latest_event),
    # snapshots/MERGE/CDC (snapshot_merge, cdc_chunks), PQ (pq_topk,
    # ann_ivfpq), skew (salted_agg) — plus this round's new entries
    # (keyword_bm25_porter2, serving_compact) and the two phrase-kernel
    # consumers whose plan changed this round (keyword_many_phrase,
    # keyword_proximity_indexed). Rotated out (all multi-round green,
    # all still in the full gate / CORRECTNESS_SELF): cdx_index,
    # mmr_diversify, keyword_facets, temperature_mix, perplexity_bigram,
    # remove_dup_spans, keyword_search, keyword_websearch, keyword_bm25,
    # keyword_many, domain_caps, hits, frontier_schedule — family
    # representatives stay (parse_warc/resolve_revisits for the archive
    # trio, crawl_frontier/frontier_schedule_join/pagerank for the crawl
    # front, keyword_proximity/keyword_indexed/keyword_many_indexed/
    # keyword_snippets for the keyword scan+indexed families).
    window = [
        "keyword_bm25_porter2", "serving_compact", "keyword_many_phrase",
        "keyword_proximity_indexed", "asof_attribution",
        "events_rollup", "events_sessionize", "latest_event",
        "snapshot_merge", "cdc_chunks", "pq_topk", "ann_ivfpq",
        "salted_agg",
        "bm25_upsert", "porter2_vocab", "positions_upsert",
        "positions_pending_resolve", "keyword_bm25_indexed",
        "keyword_snippets_indexed", "hybrid_dbsf_indexed",
        "hybrid_many_websearch_fast",
        "image_neardup", "frontier_delta",
        "keyword_unicode", "minhash_unicode",
        "gopher_multi",
        "frontier_schedule_join", "pagerank_warm", "keyword_indexed_phrase",
        "crawl_frontier",
        "pagerank",
        "resolve_revisits", "parse_warc", "web_noindex",
        "keyword_proximity",
        "keyword_indexed",
        "keyword_many_indexed", "keyword_snippets",
        "tf_postings_upsert", "tf_pending_resolve",
        "gopher_filter", "quality_stats", "token_entropy",
        "tfidf_top_terms", "dsir_weights",
        "language_id",
        "minhash_lsh", "simhash_pairs",
        "contamination",
        "chunk_semantic",
    ]
    assert len(window) == 50, f"driver window must stay at 50 seats, got {len(window)}"
    out = {k: base[k] for k in window}
    out.update({k: v for k, v in base.items() if k not in out})
    return out


def oracle_sql() -> dict[str, str]:
    return {
        "knn_vector": _SQL_KNN_BASE.format(where="").strip(),
        "mmr_diversify": _sql_mmr_diversify(),
        "keyword_facets": oracle.sql_keyword_facets(SEARCH_QUERY, "lang"),
        "temperature_mix": sampling.sql_temperature_mix(
            "lang", "doc_id", alpha=0.3, budget_frac=0.5,
            select="t.doc_id, t.lang",
        ) + "\nORDER BY doc_id",
        "image_neardup_dct": _sql_image_neardup_dct(),
        "audio_neardup": _sql_audio_neardup(),
        "video_neardup": _sql_video_neardup(),
        "perplexity_bigram": textstats.sql_bigram_perplexity() + "\nORDER BY doc_id",
        "remove_dup_spans": dedup.sql_remove_dup_spans(n=8) + "\nORDER BY doc_id",
        "knn_vector_filtered": _SQL_KNN_BASE.format(where="WHERE label != 2").strip(),
        "keyword_search": oracle.keyword_sql(SEARCH_QUERY, k=20),
        # r8 Unicode-tokenizer fixtures: four-script query / non-ASCII
        # quality + near-dup rows over corpus ∪ planted docs
        "keyword_unicode": oracle.keyword_sql(
            UNICODE_QUERY, k=20, table=_sql_unicode_table()
        ),
        "gopher_unicode": textstats.sql_gopher_filter(table=_sql_unicode_table()),
        "gopher_multi": textstats.sql_gopher_filter_multi(
            min_tokens=8, table=_sql_unicode_table()
        ),
        "minhash_unicode": dedup.sql_minhash_lsh_pairs(
            threshold=0.2, table=_sql_unicode_table()
        ),
        "keyword_websearch": sql_keyword_websearch(WEBSEARCH_QUERY, k=20),
        "keyword_proximity": sql_keyword_proximity(SEARCH_QUERY, k=20),
        # the served tier must equal the scan tier row-for-row — same SQL
        "keyword_proximity_indexed": sql_keyword_proximity(SEARCH_QUERY, k=20),
        "keyword_bm25": sql_keyword_bm25(SEARCH_QUERY, k=20),
        # index-served BM25 is bit-equal to the scan tier — same oracle
        "keyword_bm25_indexed": sql_keyword_bm25(SEARCH_QUERY, k=20),
        "hybrid_rrf": oracle.rrf_sql(SEARCH_QUERY),
        "hybrid_onepass": oracle.hybrid_onepass_sql(SEARCH_QUERY, top_k=10),
        "hybrid_cc": oracle.hybrid_sql(SEARCH_QUERY, stored_vectors=True),
        "hybrid_websearch": oracle.hybrid_websearch_sql(WEBSEARCH_QUERY, stored_vectors=True),
        # the index is a physical structure: the indexed serving path must
        # produce EXACTLY the full-scan hybrid rows
        "hybrid_indexed": oracle.hybrid_sql(SEARCH_QUERY, stored_vectors=True),
        # full probe ⇒ row-equal to the scan pipeline (same oracle as hybrid_cc)
        "hybrid_ann": oracle.hybrid_sql(SEARCH_QUERY, stored_vectors=True),
        # probed regime has its own exact mirror (seeded assignment + probe CTEs)
        "hybrid_ann_probe": oracle.hybrid_ann_sql(SEARCH_QUERY, nprobe=3, n_lists=8),
        # per-model routed KNN == per-label brute window
        "ann_router": _sql_ann_router(),
        "hybrid_dbsf": oracle.hybrid_sql(SEARCH_QUERY, method="Dbsf", stored_vectors=True),
        # fusion × serving composition twins: index serving is a physical
        # structure, so each fused indexed tier shares its scan twin's oracle
        "hybrid_dbsf_indexed": oracle.hybrid_sql(
            SEARCH_QUERY, method="Dbsf", stored_vectors=True
        ),
        "hybrid_rrf_indexed": oracle.rrf_sql(SEARCH_QUERY),
        "hybrid_autocut": oracle.hybrid_sql(SEARCH_QUERY, autocut=True, stored_vectors=True),
        "hybrid_filtered": oracle.hybrid_sql(
            SEARCH_QUERY, where=_HYBRID_WHERE, stored_vectors=True
        ),
        "hybrid_minscore": oracle.hybrid_sql(SEARCH_QUERY, min_score=0.3, stored_vectors=True),
        "semantic_topk": _sql_semantic_topk(),
        "semantic_cross_model": oracle.hybrid_sql(SEARCH_QUERY, stored_vectors=True),
        "mean_pool": (
            f"SELECT label, n_vectors, {sql_array_digest('centroid', 'centroid')} "
            f"FROM ({similarity.sql_mean_pool_by()}) ORDER BY label"
        ),
        "knn_join": similarity.sql_knn_join(),
        "neardup_cosine": similarity.sql_neardup_cosine_pairs(threshold=0.5),
        "neardup_cosine_lsh": similarity.sql_neardup_cosine_pairs_lsh(threshold=0.3, n_planes=4),
        "neardup_groups": similarity.sql_neardup_components_lsh(threshold=0.3, n_planes=4),
        "snapshot_merge": _SQL_SNAPSHOT_MERGE,
        "leakage_split": sampling.sql_leakage_safe_split(
            similarity.sql_neardup_components_lsh(threshold=0.3, n_planes=4),
            test_fraction=0.1,
        ),
        "sample_mix": _sql_sample_mix(),
        "pack_sequences": _sql_pack_sequences(),
        "cosine_adjacent": _SQL_COSINE_ADJACENT,
        "cache_misses": _SQL_CACHE_MISSES,
        "embed_cached": _sql_embed_cached(),
        "exact_dedup": dedup.sql_exact_dedup() + " ORDER BY doc_id",
        "ngram_jaccard": dedup.sql_ngram_jaccard_pairs(threshold=0.2),
        "ngram_jaccard_prefix": dedup.sql_ngram_jaccard_pairs(threshold=0.6),
        "minhash_lsh": dedup.sql_minhash_lsh_pairs(threshold=0.2),
        "simhash": dedup.sql_simhash_fingerprints(),
        "quality_stats": textstats.sql_quality_stats() + " ORDER BY doc_id",
        "repetition_stats": textstats.sql_repetition_stats(),
        "contamination": _sql_contamination(),
        "redact_pii": _sql_redact_pii(),
        "language_id_multi": _sql_language_id_multi(),
        "embed_quantized": _sql_embed_quantized(),
        "language_id": textstats.sql_language_id() + " ORDER BY doc_id",
        "fingerprint": textstats.sql_fingerprint() + " ORDER BY doc_id",
        "line_dedup": dedup.sql_line_dedup(min_docs=3, delimiter=LINE_DELIM),
        "gopher_filter": textstats.sql_gopher_filter(),
        "token_entropy": textstats.sql_token_entropy(),
        "tfidf_top_terms": textstats.sql_tfidf_top_terms(k=5),
        "perplexity": textstats.sql_perplexity_score() + " ORDER BY doc_id",
        "lang_mismatch": textstats.sql_lang_mismatch() + " ORDER BY doc_id",
        "dsir_weights": textstats.sql_dsir_weights() + " ORDER BY doc_id",
        "dup_spans": dedup.sql_dup_span_stats(n=16) + " ORDER BY doc_id",
        "top_bigrams": textstats.sql_top_ngrams(n=2, k=20),
        "cluster_assign": similarity.sql_cluster_assign(k=8),
        "cluster_sizes": similarity.sql_cluster_sizes(k=8),
        "semdedup": similarity.sql_semdedup(
            k=max(8, similarity.semdedup_n_clusters(_parquet_rows(ORACLE_SF_DIR, "embeddings"))),
            threshold=0.3,
        )
        + " ORDER BY vec_id",
        "random_projection": similarity.sql_random_projection(out_dims=16)
        + " ORDER BY vec_id, component",
        "pq_encode": pq.sql_pq_encode() + " ORDER BY vec_id",
        "pq_topk": pq.sql_pq_topk(k=10),
        "bloom_contamination": _sql_bloom_contamination(),
        "bpe_merges": textstats.sql_bpe_merge_candidates(k=20),
        "corpus_curate": _sql_corpus_curate(),
        "zorder_key": _sql_zorder_key(),
        "quality_logit": textstats.sql_quality_score_linear() + " ORDER BY doc_id",
        "quality_classifier": _sql_quality_classifier_entry(),
        "curate_classified": _sql_curate_classified(),
        "chunk_semantic": _sql_chunk_semantic("Percentile"),
        "chunk_semantic_stddev": _sql_chunk_semantic("StandardDeviation"),
        "chunk_semantic_gradient": _sql_chunk_semantic("Gradient"),
        "chunk_fixed_char": chunking.sql_chunk_fixed_char(),
        "chunk_token_window": chunking.sql_chunk_token_window(),
        "corpus_stats": analytics.sql_corpus_stats() + " ORDER BY source",
        "batch_progress": analytics.sql_batch_progress(_SQL_BATCH_SRC),
        "delete_cascade": _sql_delete_cascade(),
        "model_discovery": analytics.sql_model_discovery(),
        "doc_list_paged": analytics.sql_document_list_paged(),
        "file_browser": analytics.sql_file_browser(),
        "asof_attribution": temporal.sql_purchase_view_attribution(),
        "range_join_orders": temporal.sql_repeat_orders_window(),
        "events_rollup": temporal.sql_events_rollup(),
        "events_tumbling": events.sql_tumbling_agg(),
        "events_sliding": events.sql_sliding_agg(),
        "events_top_types": events.sql_top_event_types(),
        "events_sessionize": events.sql_sessionize(),
        "latest_event": events.sql_latest_event_per_user(),
        "reindex_decisions": _SQL_REINDEX,
        "sync_delta": _SQL_SYNC_DELTA,
        "upsert_lww": _SQL_UPSERT_LWW,
        "ann_lsh": ivf.sql_ann_lsh_topk(_embed_query(), k=10, n_planes=4),
        "ann_ivf_seeded": ivf.sql_ann_ivf_seeded(_embed_query(), k=10, nprobe=3, n_lists=8),
        "ivf_drift": ivf.sql_ivf_drift_seeded(n_lists=8),
        "ingest_stats_native": _sql_ingest_stats_native(),
        "ingest_stats": _sql_ingest_stats(),
        "postings_upsert": _sql_postings_upsert(),
        "positions_upsert": _sql_positions_upsert(),
        "positions_pending_resolve": _sql_positions_upsert(),
        "tf_postings_upsert": _sql_tf_postings_upsert(),
        "bm25_upsert": _sql_bm25_upsert(),
        "porter2_vocab": _sql_porter2_vocab(),
        "keyword_bm25_porter2": _sql_keyword_bm25_porter2(),
        "serving_compact": _sql_tf_postings_upsert(),
        "tf_pending_resolve": _sql_tf_postings_upsert(),
        "token_shards": _sql_token_shards(),
        "ann_ivfpq": pq.sql_ann_ivfpq(_embed_query(), k=10, nprobe=3, n_lists=8),
        "pq_recall": pq.sql_pq_recall(k=10),
        "quality_sample": sampling.sql_quality_stratified_sample(keep_fraction=0.5),
        "cdc_chunks": dedup.sql_cdc_chunks(
            table="(SELECT * FROM documents WHERE doc_id < 200)"
        ),
        "cms_hitters": textstats.sql_cms_heavy_hitters(k=20),
        "distinct_sketch": textstats.sql_distinct_sketch_by(),
        "funnel": events.sql_funnel_analysis(),
        "retention": events.sql_retention_cohorts(),
        "value_percentiles": events.sql_value_percentiles(),
        "dataset_card": _sql_dataset_card(),
        "neardup_incremental": dedup.sql_incremental_neardup(threshold=0.2),
        "keyword_many": sql_keyword_search_many(BATCH_QUERIES, k=5),
        "keyword_many_phrase": _sql_keyword_many_phrase(),
        # tf-postings-served batch tier: physically different, row-identical
        "keyword_many_indexed": sql_keyword_search_many(BATCH_QUERIES, k=5),
        "hybrid_many": sql_hybrid_search_many(BATCH_QUERIES, top_k=5),
        "hybrid_many_websearch": sql_hybrid_search_many(WEBSEARCH_BATCH_QUERIES, top_k=5, websearch=True),
        # websearch through the BLAS fast tier: keyword doubles bit-equal
        # to the oracle tier, vector branch carries the round-9 contract
        "hybrid_many_websearch_fast": (
            "SELECT qid, doc_id, round(score, 9) AS score, "
            "round(vector_score, 9) AS vector_score, "
            "round(keyword_score, 9) AS keyword_score, source FROM ("
            + sql_hybrid_search_many(WEBSEARCH_BATCH_QUERIES, top_k=5, websearch=True)
            + ") ORDER BY qid, score DESC, doc_id"
        ),
        "hybrid_many_filtered": sql_hybrid_search_many(
            BATCH_QUERIES, top_k=5, wheres=_BATCH_FILTERS_SQL
        ),
        "hybrid_many_fast": (
            "SELECT qid, doc_id, round(score, 9) AS score, "
            "round(vector_score, 9) AS vector_score, "
            "round(keyword_score, 9) AS keyword_score, source FROM ("
            + sql_hybrid_search_many(BATCH_QUERIES, top_k=5)
            + ") ORDER BY qid, score DESC, doc_id"
        ),
        # tf-postings-served batched hybrid: same round-9 contract as the
        # fast tier it is bit-equal to (BLAS vector branch on both)
        "hybrid_many_indexed": (
            "SELECT qid, doc_id, round(score, 9) AS score, "
            "round(vector_score, 9) AS vector_score, "
            "round(keyword_score, 9) AS keyword_score, source FROM ("
            + sql_hybrid_search_many(BATCH_QUERIES, top_k=5)
            + ") ORDER BY qid, score DESC, doc_id"
        ),
        # fully index-served batch tier (tf-postings + full-probe IVF):
        # bit-equal to hybrid_many_fast, same round-9 contract
        "hybrid_many_ann": (
            "SELECT qid, doc_id, round(score, 9) AS score, "
            "round(vector_score, 9) AS vector_score, "
            "round(keyword_score, 9) AS keyword_score, source FROM ("
            + sql_hybrid_search_many(BATCH_QUERIES, top_k=5)
            + ") ORDER BY qid, score DESC, doc_id"
        ),
        "salted_agg": skew.sql_salted_agg(
            ["event_type"],
            {
                "total_cents": ("sum_long", "cents"),
                "n_events": ("count", "cents"),
                "min_cents": ("min", "cents"),
                "max_cents": ("max", "cents"),
                "n_users": ("count_distinct", "user_id"),
            },
            table=_SQL_SALTED_AGG_TABLE,
        ),
        "props_extract": events.sql_props_extract_agg(),
        "embedding_hygiene": similarity.sql_embedding_hygiene(),
        "keyword_snippets": sql_keyword_search_snippets(SEARCH_QUERY, k=10),
        # index-served ranking is row-identical to the scan tier — same oracle
        "keyword_snippets_indexed": sql_keyword_search_snippets(SEARCH_QUERY, k=10),
        "ivf_upsert": ivf.sql_ivf_index_upsert_seeded(n_lists=8, shift=10_000, n_new=20),
        # ann_ivf / ingest_stats: iterative KMeans fit / pandas-UDF chunker —
        # not SQL-expressible; driver records the rows-only check.
        "keyword_indexed": keyword_index.sql_keyword_indexed(SEARCH_QUERY, k=20),
        "hybrid_rerank": _sql_hybrid_rerank(),
        "hybrid_window": _sql_hybrid_window(),
        "parse_text": _sql_parse_text(),
        "parser_dispatch": _sql_parser_dispatch(),
        "parse_binary": _sql_parse_binary(),
        "frontier_schedule": _sql_frontier_schedule(),
        # the distributed tier must be row-identical to the dict tier on
        # the same pinned rule set — same oracle by construction
        "frontier_schedule_join": _sql_frontier_schedule(),
        # warm(cold_3, 2) ≡ cold_5: the warm-start identity pins against
        # the SAME unrolled 5-iteration SQL as the cold entry
        "pagerank_warm": _sql_pagerank(),
        # warm(cold_1, 2) ≡ cold_3: same unrolled SQL as the cold hits entry
        "hits_warm": _sql_hits_unrolled(),
        # index-served websearch must be row-identical to the scan tier —
        # the scan tier's own SQL is the oracle (id-aliased layout)
        "keyword_indexed_phrase": sql_keyword_websearch(
            WEBSEARCH_QUERY, k=20,
            table="(SELECT doc_id AS id, text FROM documents)", id_col="id",
        ),
        "robots_sitemaps": _sql_robots_sitemaps(),
        "redirect_edges": _sql_redirect_edges(),
        "resolve_revisits": _sql_resolve_revisits(),
        "hits": _sql_hits_unrolled(),
        "anchor_text_agg": _sql_anchor_text_agg(),
        "web_noindex": _sql_web_noindex(),
        "main_content": _sql_main_content(),
        "html_adversarial": _sql_html_adversarial(),
        "parse_warc": _sql_parse_warc(),
        "cdx_index": _sql_cdx_index(),
        # incremental == rebuild: the committed base+append table must
        # equal the one-shot index over ALL archives
        "cdx_incremental": _sql_cdx_index(),
        "image_neardup": _sql_image_neardup(),
        "html_extract": _sql_html_extract(),
        "html_meta": _sql_html_meta(),
        "canonical_dedup": _sql_canonical_dedup(),
        "warc_roundtrip": _sql_warc_roundtrip(),
        "wet_roundtrip": _sql_wet_roundtrip(),
        "wat_roundtrip": _sql_wat_roundtrip(),
        "warc_images": _sql_warc_images(),
        "web_curate": _sql_web_curate(),
        "link_graph": _sql_link_graph(),
        "link_anchors": _sql_link_anchors(),
        "pagerank": _sql_pagerank(),
        "pagerank_weighted": _sql_pagerank_weighted(),
        "robots_gate": _sql_robots_gate(),
        "sitemap_urls": _sql_sitemap_urls(),
        "crawl_frontier": _sql_crawl_frontier(),
        "frontier_delta": _sql_frontier_delta(),
        "url_canonicalize": _sql_url_canonicalize(),
        "domain_caps": _sql_domain_caps(),
        "domain_stats": _sql_domain_stats(),
        "normalize_text": _sql_normalize_text(),
        "table_stats": _sql_table_stats(),
        "shard_manifest": _sql_shard_manifest(),
        "markdown_sections": _sql_markdown_sections(),
        "chunk_doc_aware": _sql_chunk_doc_aware(),
        "chunk_recursive": _sql_chunk_recursive(),
        "chunk_sentence_aware": _sql_chunk_sentence_aware(),
        "media_stats": _SQL_MEDIA_STATS,
        "rag_answer": rag.sql_rag_answer(_SQL_RAG_HITS, max_context=5),
        "simhash_pairs": dedup.sql_simhash_neardup_pairs(max_hamming=3),
    }


def _sql_chunk_semantic(method):
    from connapse_spark.operators.semantic_chunking import sql_semantic_chunks

    inner = sql_semantic_chunks(
        method=method, table="(SELECT * FROM documents WHERE doc_id % 5 = 0)"
    )
    return f"""
SELECT document_id, chunk_index, content, n_sentences, token_count,
       {sql_array_digest('embedding', 'emb')}
FROM ({inner})
ORDER BY document_id, chunk_index
""".strip()


def _embed_query():
    from connapse_spark.functions.embed import embed_py

    return embed_py(SEARCH_QUERY, 64)
