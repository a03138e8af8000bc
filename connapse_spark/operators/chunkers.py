"""Pure-Python per-document chunking cores (SURVEY.md §2.4 C1-C6).

These re-express the semantics of the reference's chunking strategies
(file:line cites per function). The default token counter is the PINNED
BPE-ish regex (letter runs / digit runs / single symbols — the same
pattern as textstats.BPE_RE), a far closer proxy for the reference's
cl100k budgets (TiktokenTokenCounter.cs:10-30) than whitespace counting:
punctuation and numbers cost tokens, exactly where real BPE diverges from
word counts. The real tiktoken counter slots in when the library is
present (import-guarded); the whitespace counter remains available as
``count_tokens_ws`` and is what the ORACLE-tier column chunkers
(operators/chunking.py, semantic_chunking.py) use, since those mirror
their SQL twins. Exact token ids are not the contract;
budget/overlap/offset behavior is.

Documents are the unit of parallelism: each function is text → [chunk dict],
executed inside an Arrow-batched pandas UDF (operators/chunking.py). The
sequential merge loops stay in here, per document — fine at 100 TB because
no chunker ever crosses a document boundary (SURVEY.md §7 hard-part c).

Chunk dict fields: content, chunk_index, token_count, start_offset,
end_offset, metadata (str→str).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field


@dataclass
class ChunkingSettings:
    """Mirror of SettingsModels.cs:78-156 defaults."""

    max_chunk_size: int = 512
    overlap: int = 50
    min_chunk_size: int = 100
    separators: tuple[str, ...] = ("\n\n", "\n", ". ", " ")
    sentence_window_size: int = 3
    prepend_header_path: bool = True
    semantic_threshold: float = 0.5
    semantic_buffer_size: int = 1
    breakpoint_method: str = "Percentile"  # StandardDeviation | InterQuartile | Gradient
    # None → per-method default (Percentile/Gradient 95, StdDev 3, IQR 1.5 —
    # SettingsModels.cs:128-134's documented per-method semantics)
    breakpoint_value: float | None = None
    strategy: str = "Recursive"


# ---------------------------------------------------------------------------
# Tokenizer (T1 proxy for TiktokenTokenCounter.cs:10-30)
#
# PINNED default: the BPE-ish pretokenizer regex (keep identical to
# textstats.BPE_RE). Whitespace counting stays as count_tokens_ws for the
# oracle-tier mirrors.
# ---------------------------------------------------------------------------

_WS_TOKEN_RE = re.compile(r"\S+")
_BPE_TOKEN_RE = re.compile(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]")


def count_tokens_ws(text: str) -> int:
    return len(_WS_TOKEN_RE.findall(text))


def count_tokens(text: str) -> int:
    """Default chunk-budget counter: BPE-ish regex tokens."""
    return len(_BPE_TOKEN_RE.findall(text))


def index_at_token_count(text: str, n: int) -> int:
    """Char index just past the n-th token (GetIndexAtTokenCount), in the
    same BPE-ish token units as count_tokens."""
    for i, m in enumerate(_BPE_TOKEN_RE.finditer(text)):
        if i == n - 1:
            return m.end()
    return len(text)


try:  # optional real BPE counter (not present in this container)
    import tiktoken  # type: ignore

    _ENC = tiktoken.get_encoding("cl100k_base")

    def count_tokens_bpe(text: str) -> int:
        return len(_ENC.encode(text))
except Exception:  # pragma: no cover
    count_tokens_bpe = count_tokens


# ---------------------------------------------------------------------------
# Sentence segmentation (T2 proxy for PragmaticSentenceSegmenter.cs)
# ---------------------------------------------------------------------------

_SENTENCE_RE = re.compile(r"(?<=[.!?])\s+")

# Golden-rules guards (r7 — the public pragmatic_segmenter rule classes the
# reference wraps, PragmaticSentenceSegmenter.cs:10-18; its test cases are
# pinned in tests/test_chunkers.py::test_split_sentences_golden_rules).
# Periods after these tokens are NEVER sentence boundaries (prepositive
# titles + mid-sentence Latin markers):
_ABBREV_ALWAYS = frozenset(
    "mr mrs ms dr prof rev hon sgt capt lt col gen sen gov pres supt det "
    "insp messrs mmes msgr fr pvt cmdr adm maj brig mt ft e.g i.e cf vs v "
    "viz resp ca al seq".split()
)
# boundaries after these split only when the next word is capitalized
# (sentence-final 'etc.' is common, mid-list 'etc.' more so):
_ABBREV_UNLESS_UPPER = frozenset(
    "etc est approx min max jr sr inc ltd co corp dept univ assn bros "
    "jan feb mar apr jun jul aug sep sept oct nov dec mon tue wed thu fri "
    "sat sun".split()
)
# after these, a following DIGIT continues the sentence ("No. 5", "p. 12"):
_ABBREV_BEFORE_NUMBER = frozenset("no nos fig figs eq art pp p vol vols ch sec pt".split())
# a single letter or dotted-acronym tail ("A.", "U.S.") — initials and
# acronyms never end a sentence here (over-joining beats splitting a name)
_ACRONYM_RE = re.compile(r"^(?:[a-z]\.)*[a-z]$")
_LAST_WORD_RE = re.compile(r"(\S+)\Z")


# the guards only inspect the last whitespace-delimited word before the
# gap and the first char after it — bound both lookups so segmentation
# stays O(n) per document (a full text[:m.start()] slice per candidate
# would be O(n²) inside the per-document chunker hot path)
_GUARD_WINDOW = 256


def _is_boundary(text: str, gap_start: int, gap_end: int) -> bool:
    """Is the whitespace gap text[gap_start:gap_end] a sentence boundary?
    text[gap_start-1] is one of [.!?]."""
    if text[gap_start - 1] in "!?":
        return True
    before = text[max(0, gap_start - _GUARD_WINDOW) : gap_start]
    after = text[gap_end : gap_end + 1]
    m = _LAST_WORD_RE.search(before)
    if not m:
        return True
    word = m.group(1)
    # an opening quote/bracket before an uppercase letter IS sentence-
    # initial ('Apples, etc. "Then we left."' splits before the quote)
    nxt2 = text[gap_end : gap_end + 2]
    if nxt2 and nxt2[0] in "\"'“‘([" and len(nxt2) > 1:
        next_upper = nxt2[1].isupper()
    else:
        next_upper = bool(after) and after.isupper()
    if word.endswith("..."):  # ellipsis continues unless a new sentence starts
        return next_upper
    if m.start() == 0 and gap_start > _GUARD_WINDOW:
        # window cut mid-word: a ≥256-char token can't be an abbreviation,
        # initial, or acronym — only the (already handled) ellipsis applies
        return True
    raw = word.strip("'\"()[]“”‘’").rstrip(".")
    tok = raw.lower()
    if tok in _ABBREV_BEFORE_NUMBER and after.isdigit():
        return False
    if tok in _ABBREV_ALWAYS:
        return False
    if tok in _ABBREV_UNLESS_UPPER and not next_upper:
        return False
    # the cased pronoun 'I' is not an initial ('It was I. He knew.'
    # splits) — UNLESS the next word is itself a dotted initial
    # ('I. M. Pei' stays joined; over-joining beats splitting a name);
    # a lowercase or dotted single letter still guards
    if raw == "I" and not re.match(r"[A-Z]\.", text[gap_end : gap_end + 2]):
        return True
    if _ACRONYM_RE.match(tok):
        return False
    return True


def split_sentences(text: str) -> list[tuple[str, int, int]]:
    """(sentence, start, end) spans with pragmatic-segmenter golden-rule
    guards: no split after titles/latin abbreviations ("Dr.", "e.g."),
    initials/acronyms ("U.S."), number markers before digits ("No. 5"),
    or a mid-sentence ellipsis; "etc."-class tokens split only before a
    capitalized word. A full engine (pysbd) can be swapped in behind the
    same signature; these rules cover the reference's golden test cases
    (PragmaticSentenceSegmenterTests.cs)."""
    out: list[tuple[str, int, int]] = []
    start = 0
    for m in _SENTENCE_RE.finditer(text):
        if not _is_boundary(text, m.start(), m.end()):
            continue
        seg = text[start : m.start()]
        if seg.strip():
            out.append((seg, start, m.start()))
        start = m.end()
    if text[start:].strip():
        out.append((text[start:], start, len(text)))
    return out


def _mk(content: str, idx: int, start: int, end: int, strategy: str, **meta: str) -> dict:
    md = {"ChunkingStrategy": strategy, "ChunkIndex": str(idx)}
    md.update(meta)
    return {
        "content": content,
        "chunk_index": idx,
        "token_count": count_tokens(content),
        "start_offset": start,
        "end_offset": end,
        "metadata": md,
    }


# ---------------------------------------------------------------------------
# C1 — FixedSizeChunker (FixedSizeChunker.cs:9-166)
# ---------------------------------------------------------------------------

_BREAKPOINTS = ("\n\n", "\n", ". ", " ")


def chunk_fixed_size(text: str, s: ChunkingSettings | None = None) -> list[dict]:
    """Token-budget windows with trailing-token overlap and a backward
    natural-breakpoint search (para → line → sentence → space) within
    min(100, window_chars/4) of the window end; drops sub-min chunks except
    the final one."""
    s = s or ChunkingSettings()
    if not text or not text.strip():
        return []
    overlap = min(s.overlap, max(s.max_chunk_size - 1, 0))
    chunks: list[dict] = []
    pos = 0
    idx = 0
    n = len(text)
    while pos < n:
        window = text[pos:]
        if count_tokens(window) <= s.max_chunk_size:
            end = n
        else:
            cut = index_at_token_count(window, s.max_chunk_size)
            search = min(100, max(cut // 4, 1))
            best = -1
            for bp in _BREAKPOINTS:
                cand = window.rfind(bp, max(0, cut - search), cut)
                if cand > 0:
                    best = cand + len(bp)
                    break
            end = pos + (best if best > 0 else cut)
        raw = text[pos:end]
        content = raw.strip()
        is_last = end >= n
        if content and (count_tokens(content) >= s.min_chunk_size or is_last or not chunks):
            cstart = pos + raw.index(content[0]) if content else pos
            chunks.append(_mk(content, idx, cstart, cstart + len(content), "FixedSize"))
            idx += 1
        if is_last:
            break
        # trailing-token overlap: back up by the last `overlap` tokens
        consumed = text[pos:end]
        toks = list(_BPE_TOKEN_RE.finditer(consumed))
        if overlap > 0 and len(toks) > overlap:
            pos = pos + toks[len(toks) - overlap].start()
        else:
            pos = end
        if pos >= n:
            break
    return chunks


# ---------------------------------------------------------------------------
# C2 — RecursiveChunker (RecursiveChunker.cs:13-256)
# ---------------------------------------------------------------------------


def _hard_split(text: str, max_tokens: int) -> list[str]:
    """Final fallback: split at the token budget by characters."""
    parts = []
    rest = text
    while rest:
        if count_tokens(rest) <= max_tokens:
            parts.append(rest)
            break
        cut = index_at_token_count(rest, max_tokens)
        parts.append(rest[:cut])
        rest = rest[cut:]
    return parts


def _split_recursive(text: str, seps: tuple[str, ...], max_tokens: int) -> list[str]:
    if count_tokens(text) <= max_tokens:
        return [text]
    if not seps:
        return _hard_split(text, max_tokens)
    sep, rest_seps = seps[0], seps[1:]
    if sep not in text:
        return _split_recursive(text, rest_seps, max_tokens)
    pieces = []
    segments = text.split(sep)
    for i, seg in enumerate(segments):
        frag = seg + (sep if i < len(segments) - 1 else "")
        if not frag:
            continue
        if count_tokens(frag) > max_tokens:
            pieces.extend(_split_recursive(frag, rest_seps, max_tokens))
        else:
            pieces.append(frag)
    return pieces


def chunk_recursive(text: str, s: ChunkingSettings | None = None) -> list[dict]:
    """LangChain-style recursive split with merge-buffer + head-pop overlap;
    sub-min chunks merge into a neighbor (never dropped); offsets round-trip
    with the source.

    Offsets are THREADED, never re-discovered: ``_split_recursive`` emits
    pieces that concatenate exactly back to the source, so every piece has a
    known (start, end) span; the merge buffer holds consecutive piece indices
    (the head-pop overlap keeps a suffix, so consecutiveness is preserved) and
    each merged chunk is a source span. The sub-min fold extends the
    neighbor's span (``end = max(prev_end, cur_end)``) instead of
    concatenating overlap-bearing strings — the r5 bug where fold duplicated
    the overlap region and produced content not present in the source
    (reference invariant: RecursiveChunker.cs:194-255 tracks offsets through
    merge, never searches)."""
    s = s or ChunkingSettings()
    if not text or not text.strip():
        return []
    pieces = _split_recursive(text, tuple(s.separators), s.max_chunk_size)
    # piece spans: pieces concatenate exactly to text (split keeps separators)
    spans: list[tuple[int, int]] = []
    pos = 0
    for p in pieces:
        spans.append((pos, pos + len(p)))
        pos += len(p)
    # merge buffer holds consecutive piece indices; overlap keeps a suffix
    merged: list[tuple[int, int]] = []  # (start, end) spans into text
    buf: list[int] = []

    def buf_tokens() -> int:
        return count_tokens(text[spans[buf[0]][0] : spans[buf[-1]][1]]) if buf else 0

    for i, piece in enumerate(pieces):
        if buf and buf_tokens() + count_tokens(piece) > s.max_chunk_size:
            merged.append((spans[buf[0]][0], spans[buf[-1]][1]))
            # head-pop: retain trailing pieces totalling ≤ overlap tokens
            keep: list[int] = []
            total = 0
            for j in reversed(buf):
                pt = count_tokens(pieces[j])
                if total + pt > s.overlap:
                    break
                keep.insert(0, j)
                total += pt
            buf = keep
        buf.append(i)
    if buf:
        merged.append((spans[buf[0]][0], spans[buf[-1]][1]))
    # post-pass: fold sub-min chunks into the previous (or next) chunk by
    # extending the neighbor's span — overlap regions are never duplicated
    folded: list[tuple[int, int]] = []
    for cs, ce in merged:
        if folded and count_tokens(text[cs:ce].strip()) < s.min_chunk_size:
            ps, pe = folded[-1]
            folded[-1] = (ps, max(pe, ce))
        else:
            folded.append((cs, ce))
    if len(folded) >= 2:
        cs, ce = folded[0]
        if count_tokens(text[cs:ce].strip()) < s.min_chunk_size:
            ns, ne = folded[1]
            folded[1] = (min(cs, ns), max(ce, ne))
            folded.pop(0)

    chunks: list[dict] = []
    for cs, ce in folded:
        seg = text[cs:ce]
        lead = len(seg) - len(seg.lstrip())
        trail = len(seg) - len(seg.rstrip())
        start, end = cs + lead, ce - trail
        if start >= end:
            continue
        chunks.append(_mk(text[start:end], len(chunks), start, end, "Recursive"))
    return chunks


# ---------------------------------------------------------------------------
# C5 — SentenceWindowChunker (SentenceWindowChunker.cs:15-101)
# ---------------------------------------------------------------------------


def chunk_sentence_window(text: str, s: ChunkingSettings | None = None) -> list[dict]:
    """Each sentence is one chunk (embedded precisely); metadata carries the
    ±window_size neighbor join for post-rerank substitution (Q11). Bypasses
    min_chunk_size."""
    s = s or ChunkingSettings()
    sents = split_sentences(text)
    w = s.sentence_window_size
    out = []
    for i, (sent, start, end) in enumerate(sents):
        lo, hi = max(0, i - w), min(len(sents), i + w + 1)
        window = " ".join(x[0].strip() for x in sents[lo:hi])
        content = sent.strip()
        cstart = start + sent.index(content[0]) if content else start
        out.append(
            _mk(
                content,
                i,
                cstart,
                cstart + len(content),
                "SentenceWindow",
                window=window,
                original_text=content,
                window_size=str(w),
            )
        )
    return out


# ---------------------------------------------------------------------------
# C6 — SentenceAwareFixedSizeChunker (SentenceAwareFixedSizeChunker.cs:13-198)
# ---------------------------------------------------------------------------


def chunk_sentence_aware(text: str, s: ChunkingSettings | None = None) -> list[dict]:
    """Pack whole sentences into the token budget (never splitting one);
    head-pop sentence overlap; a single oversize sentence falls back to the
    recursive splitter; small trailing chunks merge forward."""
    s = s or ChunkingSettings()
    sents = split_sentences(text)
    if not sents:
        return []
    groups: list[list[tuple[str, int, int]]] = []
    cur: list[tuple[str, int, int]] = []
    cur_tokens = 0
    for sent in sents:
        st = count_tokens(sent[0])
        if st > s.max_chunk_size:
            if cur:
                groups.append(cur)
                cur, cur_tokens = [], 0
            # oversize sentence → recursive sub-split, re-anchored
            for sub in chunk_recursive(sent[0], s):
                groups.append([(sub["content"], sent[1] + sub["start_offset"], sent[1] + sub["end_offset"])])
            continue
        if cur and cur_tokens + st > s.max_chunk_size:
            groups.append(cur)
            # head-pop overlap: carry trailing sentences ≤ overlap tokens
            keep: list[tuple[str, int, int]] = []
            total = 0
            for p in reversed(cur):
                pt = count_tokens(p[0])
                if total + pt > s.overlap:
                    break
                keep.insert(0, p)
                total += pt
            cur = list(keep)
            cur_tokens = sum(count_tokens(p[0]) for p in cur)
        cur.append(sent)
        cur_tokens += st
    if cur:
        groups.append(cur)
    # merge-forward small groups
    merged: list[list[tuple[str, int, int]]] = []
    for g in groups:
        tok = sum(count_tokens(x[0]) for x in g)
        if merged and tok < s.min_chunk_size:
            merged[-1] = merged[-1] + g
        else:
            merged.append(g)
    out = []
    for g in merged:
        # sentence spans are exact source slices, so the group span is too;
        # strip by arithmetic (never re-find — the r5 chunk_recursive lesson)
        start, end = g[0][1], g[-1][2]
        seg = text[start:end]
        lead = len(seg) - len(seg.lstrip())
        trail = len(seg) - len(seg.rstrip())
        cs, ce = start + lead, end - trail
        if cs >= ce:
            continue
        out.append(_mk(text[cs:ce], len(out), cs, ce, "SentenceAwareFixedSize"))
    return out


# ---------------------------------------------------------------------------
# T4 + C4 — Markdown section walker + DocumentAwareChunker
# (MarkdownSectionWalker.cs:22-118, DocumentAwareChunker.cs:14-182)
# ---------------------------------------------------------------------------

_HEADING_RE = re.compile(r"^(#{1,6})\s+(.*)$", re.MULTILINE)
_FENCE_RE = re.compile(r"^```", re.MULTILINE)


@dataclass
class Section:
    header_path: str
    levels: dict[int, str]
    depth: int
    start: int
    end: int
    body_start: int


def walk_markdown_sections(text: str) -> list[Section]:
    """Heading-stack walk: pop on level ≤ current, breadcrumb 'A > B > C'."""
    headings = [
        (m.start(), m.end(), len(m.group(1)), m.group(2).strip())
        for m in _HEADING_RE.finditer(text)
    ]
    sections: list[Section] = []
    stack: list[tuple[int, str]] = []
    for i, (hs, he, level, title) in enumerate(headings):
        while stack and stack[-1][0] >= level:
            stack.pop()
        stack.append((level, title))
        end = headings[i + 1][0] if i + 1 < len(headings) else len(text)
        sections.append(
            Section(
                header_path=" > ".join(t for _, t in stack),
                levels={lv: t for lv, t in stack},
                depth=level,
                start=hs,
                end=end,
                body_start=he,
            )
        )
    return sections


def chunk_document_aware(text: str, s: ChunkingSettings | None = None) -> list[dict]:
    """One chunk per markdown heading section with HeaderPath breadcrumb
    prepended (the retrieval win, SettingsModels.cs:141-148); no-heading &
    no-fence docs fall back to the recursive chunker; oversize sections
    sub-split recursively with the breadcrumb re-prepended. No small-chunk
    merging (semantic boundaries preserved)."""
    s = s or ChunkingSettings()
    sections = walk_markdown_sections(text)
    if not sections and not _FENCE_RE.search(text or ""):
        chunks = chunk_recursive(text, s)
        for c in chunks:
            c["metadata"]["ChunkingStrategy"] = "DocumentAware"
        return chunks
    out: list[dict] = []
    preamble = text[: sections[0].start] if sections else text
    if preamble.strip():
        for c in chunk_recursive(preamble, s):
            c["metadata"]["ChunkingStrategy"] = "DocumentAware"
            c["chunk_index"] = len(out)
            c["metadata"]["ChunkIndex"] = str(len(out))
            out.append(c)
    for sec in sections:
        body = text[sec.start : sec.end]
        meta = {
            "HeaderPath": sec.header_path,
            "HeaderDepth": str(sec.depth),
            **{f"H{lv}": t for lv, t in sec.levels.items()},
        }
        prefix = sec.header_path + "\n\n" if s.prepend_header_path else ""
        if count_tokens(body) > s.max_chunk_size:
            for sub in chunk_recursive(body, s):
                content = prefix + sub["content"]
                out.append(
                    _mk(
                        content,
                        len(out),
                        sec.start + sub["start_offset"],
                        sec.start + sub["end_offset"],
                        "DocumentAware",
                        OffsetEstimated="true" if prefix else "false",
                        **meta,
                    )
                )
        else:
            stripped = body.strip()
            bstart = sec.start + body.index(stripped[0]) if stripped else sec.start
            content = prefix + stripped
            out.append(
                _mk(
                    content,
                    len(out),
                    bstart,
                    bstart + len(stripped),
                    "DocumentAware",
                    OffsetEstimated="true" if prefix else "false",
                    **meta,
                )
            )
    return out


# ---------------------------------------------------------------------------
# C3 — SemanticChunker, per-document tier (SemanticChunker.cs:26-283)
#
# The native-DataFrame pipeline (operators/semantic_chunking.py) is the
# corpus-scale path and carries the PrecomputedEmbedding column; this tier is
# the faithful sequential core behind the C7 strategy router — oversize
# groups re-delegate to chunk_recursive (SemanticChunker.cs:173-205) and
# sub-min chunks merge forward (SemanticChunker.cs:435-489), neither of
# which is worth a window-function contortion at per-document size.
# ---------------------------------------------------------------------------

_BP_AMOUNT_DEFAULTS = {
    "Percentile": 95.0,
    "Gradient": 95.0,
    "StandardDeviation": 3.0,
    "InterQuartile": 1.5,
}


def _percentile(sorted_vals: list[float], p: float) -> float:
    """Linear-interpolated percentile over an ascending list
    (SemanticChunker.cs:413-424)."""
    if not sorted_vals:
        return 0.0
    if p <= 0:
        return sorted_vals[0]
    if p >= 100:
        return sorted_vals[-1]
    rank = p / 100.0 * (len(sorted_vals) - 1)
    lower = math.floor(rank)
    upper = math.ceil(rank)
    if lower == upper:
        return sorted_vals[lower]
    frac = rank - lower
    return sorted_vals[lower] * (1 - frac) + sorted_vals[upper] * frac


def breakpoint_threshold(
    distances: list[float], method: str, amount: float | None = None
) -> tuple[float, list[float]]:
    """(threshold, breakpoint_array) per SemanticChunker.cs:358-411. For
    Gradient the returned array is the forward/central-difference gradient
    series — the splits loop must iterate THAT array (same units as the
    threshold), not the distances (the reference's documented regression)."""
    method = (method or "Percentile").strip()
    if amount is None:
        amount = _BP_AMOUNT_DEFAULTS.get(method, 95.0)
    if not distances:
        return 0.0, distances
    if method == "StandardDeviation":
        mean = sum(distances) / len(distances)
        std = math.sqrt(sum((d - mean) ** 2 for d in distances) / len(distances))
        return mean + amount * std, distances
    if method == "InterQuartile":
        srt = sorted(distances)
        mean = sum(srt) / len(srt)
        q1, q3 = _percentile(srt, 25), _percentile(srt, 75)
        return mean + amount * (q3 - q1), distances
    if method == "Gradient":
        if len(distances) < 2:
            return 0.0, distances
        grad = [0.0] * len(distances)
        grad[0] = distances[1] - distances[0]
        grad[-1] = distances[-1] - distances[-2]
        for i in range(1, len(distances) - 1):
            grad[i] = (distances[i + 1] - distances[i - 1]) / 2.0
        return _percentile(sorted(grad), amount), grad
    srt = sorted(distances)
    return _percentile(srt, amount), distances


def _cosine(a: list[float], b: list[float]) -> float:
    dot = mag_a = mag_b = 0.0
    for x, y in zip(a, b):
        dot += x * y
        mag_a += x * x
        mag_b += y * y
    if mag_a == 0.0 or mag_b == 0.0:
        return 0.0
    return dot / (math.sqrt(mag_a) * math.sqrt(mag_b))


def _mean_pool_py(embs: list[list[float]], start: int, end: int) -> list[float]:
    count = end - start
    dims = len(embs[start])
    out = [0.0] * dims
    for i in range(start, end):
        for d in range(dims):
            out[d] += embs[i][d]
    return [v / count for v in out]


def chunk_semantic(
    text: str, s: ChunkingSettings | None = None, embedder=None
) -> list[dict]:
    """Semantic boundary chunking (SemanticChunker.cs:26-283): sentences →
    ±buffer context windows → batch embed → adjacent-pair cosine distances →
    adaptive breakpoint threshold (4 methods) → split → oversize groups
    re-delegated to chunk_recursive → merge-forward of sub-min chunks.
    ``embedder`` maps list[str] → list[list[float]]; defaults to the
    deterministic hash embedder."""
    s = s or ChunkingSettings()
    if not text or not text.strip():
        return []
    sentences = [t[0].strip() for t in split_sentences(text) if t[0].strip()]
    if not sentences:
        return []
    if len(sentences) == 1:
        sent = sentences[0]
        return [_mk(sent, 0, 0, len(sent), "Semantic")]

    if embedder is None:
        from connapse_spark.functions.embed import embed_py

        embedder = lambda texts: [embed_py(t) for t in texts]  # noqa: E731

    buffer = max(0, s.semantic_buffer_size)
    combined = [
        " ".join(sentences[max(0, i - buffer) : min(len(sentences), i + buffer + 1)])
        for i in range(len(sentences))
    ]
    embeddings = embedder(combined)
    distances = [
        1.0 - _cosine(embeddings[i], embeddings[i + 1]) for i in range(len(embeddings) - 1)
    ]
    if not distances:
        content = text.strip()
        return [_mk(content, 0, 0, len(text), "Semantic")]

    # < 5 distances → fall back to the configured similarity threshold,
    # converted to distance units (SemanticChunker.cs:107-128)
    effective_threshold = 1.0 - s.semantic_threshold
    bp_array = distances
    if len(distances) >= 5:
        effective_threshold, bp_array = breakpoint_threshold(
            distances, s.breakpoint_method, s.breakpoint_value
        )

    split_indices = [0]
    split_indices += [i + 1 for i, v in enumerate(bp_array) if v > effective_threshold]
    split_indices.append(len(sentences))

    # raw chunks with IndexOf-style offset hint (SemanticChunker.cs:141-222);
    # fields: (text, offset, tokens, embedding|None, offset_estimated)
    raw: list[tuple[str, int, int, list[float] | None, bool]] = []
    prev_start = prev_len = 0
    for i in range(len(split_indices) - 1):
        start, end = split_indices[i], split_indices[i + 1]
        chunk_text = " ".join(sentences[start:end])
        tokens = count_tokens(chunk_text)
        hint = max(0, prev_start + prev_len - min(prev_len, 256))
        start_offset = text.find(chunk_text, hint)
        offset_exact = start_offset >= 0
        if not offset_exact:
            start_offset = min(hint, max(0, len(text) - len(chunk_text)))
        if tokens > s.max_chunk_size:
            # oversize semantic group → hierarchical sub-split; sub-chunks have
            # no clean sentence-embedding mapping, so no precomputed embedding
            for sub in chunk_recursive(chunk_text, s):
                sub_len = sub["end_offset"] - sub["start_offset"]
                abs_start = start_offset + sub["start_offset"]
                if abs_start < 0 or abs_start >= len(text):
                    continue
                sub_len = min(sub_len, len(text) - abs_start)
                if sub_len <= 0:
                    continue
                raw.append(
                    (
                        text[abs_start : abs_start + sub_len],
                        abs_start,
                        sub["token_count"],
                        None,
                        not offset_exact,
                    )
                )
        else:
            raw.append(
                (
                    chunk_text,
                    start_offset,
                    tokens,
                    _mean_pool_py(embeddings, start, end),
                    not offset_exact,
                )
            )
        prev_start, prev_len = start_offset, len(chunk_text)

    merged = _merge_forward_small(raw, s.min_chunk_size, text)
    if not merged:
        content = text.strip()
        return [_mk(content, 0, 0, len(text), "Semantic")]

    chunks: list[dict] = []
    for ctext, offset, tokens, _emb, estimated in merged:
        trimmed = ctext.strip()
        if not trimmed:
            continue
        meta = {"ChunkingStrategy": "Semantic", "ChunkIndex": str(len(chunks))}
        if estimated:
            meta["OffsetEstimated"] = "true"
        chunks.append(
            {
                "content": trimmed,
                "chunk_index": len(chunks),
                "token_count": tokens,
                "start_offset": offset,
                "end_offset": offset + len(ctext),
                "metadata": meta,
            }
        )
    return chunks


def _merge_forward_small(
    raw: list[tuple[str, int, int, list[float] | None, bool]],
    min_tokens: int,
    content: str,
) -> list[tuple[str, int, int, list[float] | None, bool]]:
    """Sub-min chunks merge into the preceding chunk (first merges into the
    following); the merged span re-slices the source so separators are
    preserved, and drops the precomputed embedding
    (SemanticChunker.cs:435-489)."""
    if len(raw) <= 1 or min_tokens <= 0:
        return raw

    def merge(a, b):
        a_text, a_off, _a_tok, _a_emb, a_est = a
        b_text, b_off, _b_tok, _b_emb, b_est = b
        slice_len = b_off + len(b_text) - a_off
        slice_valid = a_off >= 0 and slice_len > 0 and a_off + slice_len <= len(content)
        merged_text = content[a_off : a_off + slice_len] if slice_valid else a_text + " " + b_text
        return (
            merged_text,
            a_off,
            count_tokens(merged_text),
            None,
            a_est or b_est or not slice_valid,
        )

    out: list[tuple[str, int, int, list[float] | None, bool]] = []
    for c in raw:
        if c[2] >= min_tokens or not out:
            out.append(c)
        else:
            out[-1] = merge(out[-1], c)
    if len(out) >= 2 and out[0][2] < min_tokens:
        out[1] = merge(out[0], out[1])
        out.pop(0)
    return out


# ---------------------------------------------------------------------------
# C7 — strategy router (IngestionPipeline.cs:520-533,466-487)
# ---------------------------------------------------------------------------

STRATEGIES = {
    "FixedSize": chunk_fixed_size,
    "Recursive": chunk_recursive,
    "SentenceWindow": chunk_sentence_window,
    "SentenceAwareFixedSize": chunk_sentence_aware,
    "DocumentAware": chunk_document_aware,
    "Semantic": chunk_semantic,
}

_MD_EXTS = {".md", ".markdown", ".mdx"}


def resolve_strategy(configured: str, file_ext: str) -> str:
    """Markdown always routes to DocumentAware; unknown → FixedSize."""
    if file_ext.lower() in _MD_EXTS:
        return "DocumentAware"
    return configured if configured in STRATEGIES else "FixedSize"


def chunk_document(
    text: str, strategy: str = "Recursive", file_ext: str = "", s: ChunkingSettings | None = None
) -> list[dict]:
    resolved = resolve_strategy(strategy, file_ext)
    return STRATEGIES[resolved](text, s)
