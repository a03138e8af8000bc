"""Property-based tests (hypothesis) over the pure-Python tiers — the
invariants that must hold for ANY input, not just fixtures. Spark-free so
hypothesis can run hundreds of examples cheaply."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from connapse_spark.functions.text import stem_py, tokenize_py
from connapse_spark.operators.chunkers import (
    ChunkingSettings,
    chunk_document_aware,
    chunk_fixed_size,
    chunk_recursive,
    chunk_sentence_aware,
    count_tokens,
    walk_markdown_sections,
)
from connapse_spark.operators.search import parse_websearch

TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=400
)


@given(TEXT)
@settings(max_examples=200, deadline=None)
def test_parse_websearch_never_raises_and_shape_holds(q):
    groups = parse_websearch(q)
    assert isinstance(groups, list)
    for g in groups:
        assert g  # no empty AND-groups survive
        for term in g:
            assert term.tokens  # no empty terms
            assert all(t == t.lower() for t in term.tokens)


@given(TEXT)
@settings(max_examples=200, deadline=None)
def test_tokenize_stem_closed_under_lowercase_alnum(s):
    toks = tokenize_py(s)
    for t in toks:
        assert t and t == t.lower()
        assert stem_py(t)  # stemming never empties a token


@given(TEXT)
@settings(max_examples=100, deadline=None)
def test_chunk_recursive_offsets_roundtrip(text):
    s = ChunkingSettings(max_chunk_size=16, min_chunk_size=2, overlap=4)
    chunks = chunk_recursive(text, s)
    for c in chunks:
        # every chunk's offsets must slice its own content out of the source
        assert text[c["start_offset"] : c["end_offset"]] == c["content"]
        assert c["content"].strip() == c["content"]
    # indices are dense
    assert [c["chunk_index"] for c in chunks] == list(range(len(chunks)))


@given(TEXT)
@settings(max_examples=100, deadline=None)
def test_chunk_fixed_size_offsets_roundtrip(text):
    s = ChunkingSettings(max_chunk_size=12, min_chunk_size=1, overlap=3)
    for c in chunk_fixed_size(text, s):
        assert text[c["start_offset"] : c["end_offset"]] == c["content"]


@given(TEXT)
@settings(max_examples=100, deadline=None)
def test_chunk_sentence_aware_offsets_roundtrip(text):
    s = ChunkingSettings(max_chunk_size=16, min_chunk_size=2, overlap=4)
    chunks = chunk_sentence_aware(text, s)
    for c in chunks:
        assert text[c["start_offset"] : c["end_offset"]] == c["content"]
        assert c["content"].strip() == c["content"]
    assert [c["chunk_index"] for c in chunks] == list(range(len(chunks)))


@given(TEXT)
@settings(max_examples=100, deadline=None)
def test_chunk_document_aware_offsets_roundtrip(text):
    # breadcrumb-prefixed chunks carry OffsetEstimated=true by design
    # (content = HeaderPath + body, offsets point at the body span);
    # every chunk NOT so flagged must round-trip exactly.
    s = ChunkingSettings(max_chunk_size=16, min_chunk_size=2, overlap=4)
    chunks = chunk_document_aware(text, s)
    for c in chunks:
        if c["metadata"].get("OffsetEstimated") == "true":
            continue
        assert text[c["start_offset"] : c["end_offset"]] == c["content"]
    assert [c["chunk_index"] for c in chunks] == list(range(len(chunks)))


@given(TEXT)
@settings(max_examples=100, deadline=None)
def test_markdown_sections_tile_and_nest(text):
    secs = walk_markdown_sections(text)
    for i, sec in enumerate(secs):
        assert 0 <= sec.start <= sec.body_start <= sec.end <= len(text)
        if i + 1 < len(secs):
            assert sec.end == secs[i + 1].start  # sections tile contiguously
        assert 1 <= sec.depth <= 6
        assert sec.header_path  # breadcrumb never empty


@given(st.text(max_size=200))
@settings(max_examples=100, deadline=None)
def test_count_tokens_nonnegative_and_concat_superadditive(s):
    # token counts never negative; splitting text never loses tokens
    n = count_tokens(s)
    assert n >= 0
    mid = len(s) // 2
    assert count_tokens(s[:mid]) + count_tokens(s[mid:]) >= n


# ---------------------------------------------------------------------------
# Websearch semantics fuzz (VERDICT r2 ask #10): quoted-phrase × negation ×
# OR combinations, checked against the DuckDB oracle mirror. The reference
# evaluator below restates the DOCUMENTED semantics (OR-of-AND-groups,
# per-config exact/stemmed presence, non-overlapping phrase counts, TF
# score raw/(raw+1)) in plain Python; sql_keyword_websearch must agree on
# every generated query over a fixed corpus.
# ---------------------------------------------------------------------------


def _ws_occurrences(tokens, words):
    s = " " + "  ".join(tokens) + " "
    p = " " + "  ".join(words) + " "
    return (len(s) - len(s.replace(p, ""))) // len(p)


def _ws_presence(te, ts, term):
    stems = [stem_py(t) for t in term.tokens]
    if term.phrase:
        return _ws_occurrences(te, term.tokens) > 0 or _ws_occurrences(ts, stems) > 0
    return term.tokens[0] in te or stems[0] in ts


def _ws_match(te, ts, groups):
    return any(
        all(
            (not _ws_presence(te, ts, t)) if t.negated else _ws_presence(te, ts, t)
            for t in g
        )
        for g in groups
    )


def _ws_score(te, ts, groups):
    from connapse_spark.operators.search import (
        WEIGHT_EXACT,
        WEIGHT_STEMMED,
        _positive_terms,
    )

    singles, phrases = _positive_terms(groups)
    raw = 0.0
    if singles:
        stems = sorted({stem_py(t) for t in singles})
        raw += WEIGHT_EXACT * sum(1 for t in te if t in singles)
        raw += WEIGHT_STEMMED * sum(1 for t in ts if t in set(stems))
    for ph in phrases:
        ph_stems = [stem_py(t) for t in ph]
        raw += float(len(ph)) * (
            WEIGHT_EXACT * _ws_occurrences(te, ph)
            + WEIGHT_STEMMED * _ws_occurrences(ts, ph_stems)
        )
    return raw / (raw + 1.0)


_WS_DOCS = [
    (0, "table scan goes fast, merge follows"),
    (1, "the tables were scanning and merged quickly"),
    (2, "fast fast fast merge merge"),
    (3, "a scan of the table; fast-merge hybrid"),
    (4, "nothing relevant here at all"),
    (5, "merge table scan fast scan table merge"),
    (6, "OR or or OR"),
    (7, "index scan beats table scan"),
    (8, ""),
    (9, "fast. merge! scan? table... index"),
]

_WS_VOCAB = ["table", "scan", "fast", "merge", "index", "tables", "scanning", "merged", "or"]

_ws_word = st.sampled_from(_WS_VOCAB)
_ws_phrase = st.lists(_ws_word, min_size=1, max_size=3).map(
    lambda ws: '"' + " ".join(ws) + '"'
)
_ws_unit = st.one_of(_ws_word, _ws_phrase, st.sampled_from(["fast-merge", "OR"]))
_ws_term = st.tuples(st.booleans(), _ws_unit).map(
    lambda t: ("-" if t[0] else "") + t[1]
)
_WS_QUERY = st.lists(_ws_term, min_size=0, max_size=6).map(" ".join)


def _ws_duck():
    import duckdb
    import pandas as pd

    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame(_WS_DOCS, columns=["doc_id", "text"])
    )
    return con


_WS_CON = _ws_duck()


@pytest.mark.slow
@given(_WS_QUERY)
@settings(max_examples=1000, deadline=None)
def test_websearch_sql_mirror_matches_reference_semantics(q):
    from connapse_spark.operators.search import sql_keyword_websearch

    groups = parse_websearch(q)
    expected = {}
    for doc_id, text in _WS_DOCS:
        te, ts = tokenize_py(text), [stem_py(t) for t in tokenize_py(text)]
        if groups and _ws_match(te, ts, groups):
            expected[doc_id] = round(_ws_score(te, ts, groups), 9)

    sql = sql_keyword_websearch(q, k=len(_WS_DOCS))
    got = {r[0]: round(r[1], 9) for r in _WS_CON.execute(sql).fetchall()}
    assert got == expected, (q, groups)


# ---------------------------------------------------------------------------
# Union-find components (driver tier of dedup.neardup_components)
# ---------------------------------------------------------------------------

_EDGE_LISTS = st.lists(
    st.tuples(st.integers(0, 40), st.integers(0, 40)), max_size=120
)


@given(_EDGE_LISTS)
@settings(max_examples=500, deadline=None)
def test_union_find_matches_bfs_reachability(edges):
    """Union-find (path compression, union-by-min-root) must label every
    vertex with the MINIMUM reachable id — checked against a brute-force
    BFS over the undirected graph, including self-loops, duplicate edges,
    and reversed duplicates."""
    from collections import deque

    from connapse_spark.operators.dedup import union_find_components

    got = union_find_components(edges)

    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = []
    for v in adj:
        seen = {v}
        dq = deque([v])
        while dq:
            x = dq.popleft()
            for y in adj[x]:
                if y not in seen:
                    seen.add(y)
                    dq.append(y)
        want.append((v, min(seen)))
    assert got == sorted(want)
