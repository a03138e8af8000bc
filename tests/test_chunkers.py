"""Unit tests for the pure-Python chunking cores, mirroring the reference's
test invariants (SURVEY.md §5): token budgets respected, offsets round-trip
with the source, sequential indices, no content dropped (recursive), window
metadata (sentence-window), breadcrumbs (document-aware)."""

import math

import pytest

from connapse_spark.operators.chunkers import (
    ChunkingSettings,
    breakpoint_threshold,
    chunk_document_aware,
    chunk_fixed_size,
    chunk_recursive,
    chunk_semantic,
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


def test_router_semantic_routes_to_semantic():
    # regression: 'Semantic' used to silently fall back to FixedSize
    assert resolve_strategy("Semantic", ".txt") == "Semantic"


# ---------------------------------------------------------------------------
# C3 UDF tier — mirrors SemanticChunkerTests.cs invariants
# ---------------------------------------------------------------------------


def _fixed_embedder(vectors):
    """Embedder stub returning explicit per-sentence vectors verbatim
    (SemanticChunkerTests.cs SetupExplicitEmbeddings)."""

    def fn(texts):
        assert len(texts) == len(vectors), (len(texts), len(vectors))
        return [list(v) for v in vectors]

    return fn


def test_semantic_empty_and_whitespace():
    assert chunk_semantic("") == []
    assert chunk_semantic("   \n  ") == []


def test_semantic_single_sentence_skips_embedder():
    def boom(texts):  # pragma: no cover - must not run
        raise AssertionError("single sentence must not call the embedder")

    chunks = chunk_semantic("One lonely sentence.", embedder=boom)
    assert len(chunks) == 1
    assert chunks[0]["content"] == "One lonely sentence."
    assert chunks[0]["chunk_index"] == 0


def test_semantic_min_size_merges_tiny_first_chunk():
    # SemanticChunkerTests.cs ChunkAsync_MinChunkSizeFiltering_SkipsTinyChunks
    content = (
        "Hi. This is a significantly longer sentence that should exceed the "
        "minimum chunk size threshold easily. "
    )
    emb = _fixed_embedder([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    s = ChunkingSettings(max_chunk_size=500, overlap=0, min_chunk_size=5)
    chunks = chunk_semantic(content, s, embedder=emb)
    assert chunks
    assert all(c["token_count"] >= s.min_chunk_size for c in chunks)


def test_semantic_all_below_min_merges_into_single_chunk():
    # SemanticChunkerTests.cs ChunkAsync_AllChunksBelowMinSize_MergesIntoSingleChunk
    content = "Apple. Banana. Cherry. "
    emb = _fixed_embedder([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
    s = ChunkingSettings(max_chunk_size=500, overlap=0, min_chunk_size=50)
    chunks = chunk_semantic(content, s, embedder=emb)
    assert len(chunks) == 1
    for word in ("Apple", "Banana", "Cherry"):
        assert word in chunks[0]["content"]
    assert chunks[0]["chunk_index"] == 0


def test_semantic_oversize_group_redelegates_to_recursive():
    # SemanticChunker.cs:173-205 — one huge all-similar group sub-splits
    # along structural boundaries, respecting the token budget
    text = " ".join(f"Sentence number {i} has several words inside it." for i in range(40))
    const = lambda texts: [[1.0, 0.0]] * len(texts)  # noqa: E731
    s = ChunkingSettings(max_chunk_size=50, overlap=0, min_chunk_size=5)
    chunks = chunk_semantic(text, s, embedder=const)
    assert len(chunks) > 1
    assert all(c["token_count"] <= s.max_chunk_size for c in chunks)
    assert [c["chunk_index"] for c in chunks] == list(range(len(chunks)))


def test_semantic_offsets_roundtrip_when_exact():
    content = (
        "First thought about apples here. Second thought about bridges there. "
        "Third thought about circuits everywhere. Fourth idea about dragons. "
        "Fifth idea about engines. Sixth idea about forests. Seventh idea about gears."
    )
    chunks = chunk_semantic(content, ChunkingSettings(max_chunk_size=500, min_chunk_size=1))
    assert chunks
    for c in chunks:
        if c["metadata"].get("OffsetEstimated") != "true":
            assert content[c["start_offset"] : c["end_offset"]].strip() == c["content"]


def test_semantic_gradient_splits_at_gradient_peak_only():
    # SemanticChunkerTests.cs ChunkAsync_BreakpointMethod_Gradient_SplitsAt
    # GradientPeak_NotEveryHighDistance — 8 sentences on a unit circle with
    # target distances [.01,.02,.03,.04,.40,.60,.62]: the gradient peaks
    # uniquely at index 4, so exactly one split (sentences 1-5 | 6-8)
    content = (
        "Sentence one body. Sentence two body. Sentence three body. "
        "Sentence four body. Sentence five body. Sentence six body. "
        "Sentence seven body. Sentence eight body."
    )
    target = [0.01, 0.02, 0.03, 0.04, 0.40, 0.60, 0.62]
    vecs = [[1.0, 0.0, 0.0]]
    angle = 0.0
    for d in target:
        angle += math.acos(1.0 - d)
        vecs.append([math.cos(angle), math.sin(angle), 0.0])
    s = ChunkingSettings(
        max_chunk_size=500, overlap=0, min_chunk_size=1, breakpoint_method="Gradient"
    )
    chunks = chunk_semantic(content, s, embedder=_fixed_embedder(vecs))
    assert len(chunks) == 2, "one gradient peak must produce one split"
    assert "Sentence one" in chunks[0]["content"] and "Sentence five" in chunks[0]["content"]
    assert "Sentence six" in chunks[1]["content"] and "Sentence eight" in chunks[1]["content"]


def test_breakpoint_threshold_methods():
    dists = [0.01, 0.02, 0.03, 0.04, 0.40, 0.60, 0.62]
    thr, arr = breakpoint_threshold(dists, "Percentile")
    assert arr is dists and 0.60 < thr < 0.62
    thr, arr = breakpoint_threshold(dists, "StandardDeviation")
    mean = sum(dists) / len(dists)
    assert arr is dists and thr > mean
    thr, arr = breakpoint_threshold(dists, "InterQuartile")
    assert arr is dists
    thr, grad = breakpoint_threshold(dists, "Gradient")
    assert len(grad) == len(dists)
    assert grad[0] == pytest.approx(0.01)
    assert grad[4] == pytest.approx(0.28)
    assert grad[-1] == pytest.approx(0.02)
    assert sum(1 for g in grad if g > thr) == 1


def test_split_sentences_golden_rules():
    """The reference's PragmaticSentenceSegmenterTests.cs cases, plus the
    guard classes the rule table adds (VERDICT r6 ask #8)."""
    def sents(t):
        return [s for s, _, _ in split_sentences(t)]

    assert sents("") == []
    assert sents("   \n  \t  ") == []
    assert len(sents("Hello world. How are you?")) == 2
    # abbreviations: the naive regex yields 4 fragments; golden keeps 1
    assert len(sents("Dr. Smith works for the U.S. government.")) == 1
    assert len(sents("The value is 3.14 and the price is $1.99.")) == 1
    assert len(sents("He paused... then walked away. The room was silent.")) == 2
    assert len(sents("What now? Run! Then he stopped.")) == 3
    # guard classes beyond the reference's cases
    assert len(sents("See No. 5 for details. Then stop.")) == 2   # No.+digit joins
    assert len(sents("Apples, pears, etc. were cheap.")) == 1      # etc.+lower joins
    assert len(sents("Apples, pears, etc. Then we left.")) == 2    # etc.+Upper splits
    assert len(sents("John F. Kennedy spoke. He was brief.")) == 2 # initial joins
    assert len(sents("Mr. and Mrs. Smith arrived. Prof. Jones left.")) == 2
    # r8 over-join fixes: the cased pronoun 'I' is not an initial, and an
    # opening quote before an uppercase letter is sentence-initial
    assert len(sents("It was I. He knew.")) == 2
    assert len(sents('Apples, etc. "Then we left."')) == 2
    assert len(sents("He said i. e. style markers stay joined.")) == 1
    # ...but 'I.' followed by another dotted initial is a NAME, not the
    # pronoun — the initials sequence stays joined
    assert len(sents("I. M. Pei designed it. He was famous.")) == 2
    # spans still tile the text in order (the C5/C6 offset contract)
    spans = split_sentences("A cat sat. It purred... then slept. Done!")
    assert [s for s, _, _ in spans] == ["A cat sat.", "It purred... then slept.", "Done!"]
    for (s, a, b) in spans:
        assert s == "A cat sat. It purred... then slept. Done!"[a:b]
