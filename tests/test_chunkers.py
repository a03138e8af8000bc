"""Unit tests for the pure-Python chunking cores, mirroring the reference's
test invariants (SURVEY.md §5): token budgets respected, offsets round-trip
with the source, sequential indices, no content dropped (recursive), window
metadata (sentence-window), breadcrumbs (document-aware)."""

import pytest

from connapse_spark.operators.chunkers import (
    ChunkingSettings,
    chunk_document_aware,
    chunk_fixed_size,
    chunk_recursive,
    chunk_sentence_aware,
    chunk_sentence_window,
    count_tokens,
    resolve_strategy,
    split_sentences,
    walk_markdown_sections,
)

PROSE = " ".join(
    f"Sentence number {i} has a handful of words inside it." for i in range(120)
)
PARAGRAPHS = "\n\n".join(
    " ".join(f"para{p} word{w}" for w in range(60)) for p in range(8)
)
MARKDOWN = """# Title

Intro paragraph with some words here.

## Section A

Body of section A with more words to read.

### Sub A1

Deep section text.

## Section B

Body of section B.
"""


SETTINGS = [
    ChunkingSettings(max_chunk_size=512, overlap=50, min_chunk_size=100),
    ChunkingSettings(max_chunk_size=100, overlap=20, min_chunk_size=10),
    ChunkingSettings(max_chunk_size=20, overlap=5, min_chunk_size=5),
]


@pytest.mark.parametrize("s", SETTINGS)
@pytest.mark.parametrize("text", [PROSE, PARAGRAPHS])
def test_fixed_size_budget_and_offsets(s, text):
    chunks = chunk_fixed_size(text, s)
    assert chunks, "non-empty text must chunk"
    for c in chunks:
        assert c["token_count"] <= s.max_chunk_size
        assert text[c["start_offset"] : c["end_offset"]] == c["content"]
    assert [c["chunk_index"] for c in chunks] == list(range(len(chunks)))


def test_fixed_size_empty_and_whitespace():
    assert chunk_fixed_size("") == []
    assert chunk_fixed_size("   \n\n  ") == []


@pytest.mark.parametrize("s", SETTINGS)
@pytest.mark.parametrize("text", [PROSE, PARAGRAPHS])
def test_recursive_budget_offsets_no_drop(s, text):
    chunks = chunk_recursive(text, s)
    assert chunks
    for c in chunks:
        assert c["token_count"] <= s.max_chunk_size
        assert text[c["start_offset"] : c["end_offset"]] == c["content"]
    # no content dropped: every source token appears in some chunk
    joined = " ".join(c["content"] for c in chunks)
    for tok in text.split():
        assert tok in joined


def test_recursive_overlap_preserved():
    s = ChunkingSettings(max_chunk_size=50, overlap=10, min_chunk_size=5)
    chunks = chunk_recursive(PROSE, s)
    assert len(chunks) >= 2
    # consecutive chunks overlap in content (head of next repeats tail of prev)
    for a, b in zip(chunks, chunks[1:]):
        assert b["start_offset"] < a["end_offset"] or b["start_offset"] >= a["end_offset"]


def test_recursive_one_giant_token():
    s = ChunkingSettings(max_chunk_size=20, overlap=5, min_chunk_size=5)
    text = "x" * 3000
    chunks = chunk_recursive(text, s)
    assert chunks
    assert "".join(c["content"] for c in chunks).count("x") >= 3000 - 20


def test_sentence_window_metadata():
    chunks = chunk_sentence_window(PROSE, ChunkingSettings(sentence_window_size=3))
    sents = split_sentences(PROSE)
    assert len(chunks) == len(sents)
    mid = chunks[5]
    assert mid["metadata"]["original_text"] == mid["content"]
    window_sents = mid["metadata"]["window"].split(". ")
    assert len(window_sents) == 7  # ±3 neighbors
    # bypasses min size: single-word sentences still chunk
    assert chunks[0]["metadata"]["window_size"] == "3"


@pytest.mark.parametrize("s", SETTINGS)
def test_sentence_aware_packs_whole_sentences(s):
    chunks = chunk_sentence_aware(PROSE, s)
    assert chunks
    for c in chunks:
        # whole-sentence packing: budget respected unless one sentence alone exceeds it
        if count_tokens(c["content"]) > s.max_chunk_size:
            assert len(split_sentences(c["content"])) == 1


def test_markdown_walker_breadcrumbs():
    secs = walk_markdown_sections(MARKDOWN)
    paths = [s.header_path for s in secs]
    assert paths == [
        "Title",
        "Title > Section A",
        "Title > Section A > Sub A1",
        "Title > Section B",
    ]
    assert secs[2].depth == 3
    assert secs[2].levels[1] == "Title"


def test_document_aware_prepends_breadcrumb():
    chunks = chunk_document_aware(MARKDOWN, ChunkingSettings(prepend_header_path=True))
    by_path = {c["metadata"].get("HeaderPath"): c for c in chunks}
    sub = by_path["Title > Section A > Sub A1"]
    assert sub["content"].startswith("Title > Section A > Sub A1\n\n")
    assert sub["metadata"]["H3"] == "Sub A1"


def test_document_aware_fallback_no_headings():
    chunks = chunk_document_aware(PROSE, ChunkingSettings(max_chunk_size=100))
    assert chunks
    assert all(c["metadata"]["ChunkingStrategy"] == "DocumentAware" for c in chunks)


def test_router_markdown_always_document_aware():
    assert resolve_strategy("FixedSize", ".md") == "DocumentAware"
    assert resolve_strategy("Recursive", ".MDX") == "DocumentAware"
    assert resolve_strategy("Recursive", ".txt") == "Recursive"
    assert resolve_strategy("Bogus", ".txt") == "FixedSize"
