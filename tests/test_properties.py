"""Property-based tests (hypothesis) over the pure-Python tiers — the
invariants that must hold for ANY input, not just fixtures. Spark-free so
hypothesis can run hundreds of examples cheaply."""

from hypothesis import given, settings
from hypothesis import strategies as st

from connapse_spark.functions.text import stem_py, tokenize_py
from connapse_spark.operators.chunkers import (
    ChunkingSettings,
    chunk_fixed_size,
    chunk_recursive,
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
