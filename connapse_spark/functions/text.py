"""Tokenization for keyword search — the Spark re-expression of the
reference's weighted dual-config tsvector (KnowledgeDbContext.cs:232-235:
``setweight(to_tsvector('simple', content),'A') ||
setweight(to_tsvector('english', content),'B')``).

Postgres keeps exact tokens (weight A) and stemmed tokens (weight B) in one
generated column; we keep two array columns computed at write time — the same
"pay at write" trade. The DEFAULT stemmer is a documented simplification (a
small suffix-stripper, not full Snowball): exact Postgres rank values are not
the contract, ranking behavior is (SURVEY.md §7 hard-part a) — it stays the
default because it is expressible in all THREE engines (Spark JVM exprs,
Python, DuckDB SQL), keeping every stemmed-config oracle bit-strict. Full
Snowball parity is the opt-in tier: functions/porter2.py implements the
published Porter2 algorithm (Postgres 'english' dictionary), selected via
``build_token_table(..., stemmer="porter2")`` and pinned by the
``porter2_vocab`` oracle entry + golden units (r10).

Unicode-aware (r8, parity with ``to_tsvector('simple', ...)`` which is
locale/Unicode-aware): the split class is ``[^\\p{L}\\p{N}]+`` — general
categories, identical semantics in Java regex (Spark) and RE2 (DuckDB);
the Python mirror uses ``[\\W_]+`` which is the same set (Unicode
alphanumerics minus underscore). Unsegmented scripts (Han + kana — no
word boundaries to split on) get a character-bigram tier: each pure-CJK
run is isolated and expanded into overlapping 2-char grams, the standard
CJK recall fallback when no dictionary segmenter ships (what Postgres'
'simple' config also cannot do — this engine is WIDER there). Hangul,
Cyrillic, Arabic, accented Latin are space-separated scripts and tokenize
whole-word. All ranges are raw BMP characters (never ``\\p{IsHan}`` /
``\\x{...}`` script syntax, which Java and RE2 spell differently — the
same portability rule as textstats.SCRIPT_RANGES).

Every function has a DuckDB SQL mirror so the oracle computes identical
token arrays; a 3-way parity test (Spark expr / Spark SQL surface /
DuckDB / Python) pins the agreement on CJK, Cyrillic, Arabic and accented
fixtures. Case-mapping corners between utf8proc (DuckDB — simple,
per-codepoint) and Java/Python (full Unicode case mapping):

- U+0130 'İ' (the one one-to-many lowercase in the full mapping:
  'i'+U+0307 vs simple 'i') is NEUTRALIZED by an explicit pre-fold to
  'i'+U+0307 before lower() in every mirror, so all engines then split
  identically (U+0307 is Mn — not a letter — so the combining dot
  separates; Turkish text tokenizes the same everywhere).
- Greek contextual final-sigma (uppercase 'Σ' at word end → 'ς' in the
  full mapping, 'σ' in the simple one) has no such one-line fold and
  stays a documented divergence corner — deliberately absent from
  fixtures.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Java regex and RE2 both support one-letter general categories in classes.
TOKEN_SPLIT_RE = r"[^\p{L}\p{N}]+"
# Python re has no \p{...}: [\W_] == NOT(Unicode alphanumeric) plus '_',
# which equals the complement of \p{L}\p{N} (Python \w = L* + Nd/Nl/No + _).
TOKEN_SPLIT_RE_PY = r"[\W_]+"
# Unsegmented-script runs, raw BMP chars (RE2 ∩ Java ∩ Python-safe):
# Hiragana+Katakana U+3040-30FF, Katakana phonetic ext U+31F0-31FF,
# CJK ext A U+3400-4DBF, CJK unified U+4E00-9FFF, compat ideographs
# U+F900-FAFF. Hangul is NOT here (Korean spaces between words).
CJK_CLASS = "[぀-ヿㇰ-ㇿ㐀-䶿一-鿿豈-﫿]"
# U+0130 pre-fold (see module docstring): applied BEFORE lower() so
# utf8proc's simple mapping and Java/Python's full mapping converge.
_I_DOT_FOLD = ("İ", "i̇")  # U+0130 → U+0069 U+0307
# Applied once, leftmost alternative first (same in Java regex and RE2).
STEM_SUFFIX_RE = "(ing|ed|ies|es|s)$"
STEM_MIN_LEN = 4  # only stem tokens longer than 3 chars


def _expand_cjk(t: Column) -> Column:
    """Pure-CJK token → overlapping char bigrams; anything else → [t].
    After run isolation a token is pure-CJK iff its first char is (the
    spacing step guarantees runs never mix with other scripts)."""
    bigrams = F.transform(
        F.sequence(F.lit(1), F.length(t) - 1), lambda i: t.substr(i, F.lit(2))
    )
    return F.when(t.rlike("^" + CJK_CLASS) & (F.length(t) >= 2), bigrams).otherwise(
        F.array(t)
    )


def tokens_exact_expr(text: Column) -> Column:
    """Lowercase Unicode-alphanumeric tokens (weight-A 'simple' config
    analogue) with the CJK bigram tier. Pure column math — on ASCII text
    this is byte-for-byte the r7 ``[^a-z0-9]+`` behavior (no CJK runs →
    the bigram branch never fires), so ASCII corpora are unchanged.

    The CJK machinery (run-spacing regexp_replace + per-token rlike +
    bigram flatten) is gated behind ONE whole-text rlike per row (r9 —
    the r8 drift root cause: `hybrid_ann_probe`/`keyword_index_build`
    rose ~1.7×/1.35× because every tokenize-scan paid the per-token
    branch even on pure-ASCII corpora; measured at sf0.1 the gate cuts
    a tokenize-scan 0.50s → 0.30s vs the r7 ASCII tokenizer's 0.24s).
    CaseWhen evaluates lazily per row, so non-CJK rows never run the
    expansion; rows with any CJK char take the full tier. lower() never
    introduces or removes CJK chars, so gating on the lowered text is
    exact."""
    folded = F.replace(text, F.lit(_I_DOT_FOLD[0]), F.lit(_I_DOT_FOLD[1]))
    lowered = F.lower(folded)
    fast = F.filter(F.split(lowered, TOKEN_SPLIT_RE), lambda t: F.length(t) > 0)
    spaced = F.regexp_replace(lowered, "(" + CJK_CLASS + "+)", " $1 ")
    toks = F.filter(F.split(spaced, TOKEN_SPLIT_RE), lambda t: F.length(t) > 0)
    slow = F.flatten(F.transform(toks, _expand_cjk))
    return F.when(lowered.rlike(CJK_CLASS), slow).otherwise(fast)


def stem_expr(tok: Column) -> Column:
    return F.when(
        F.length(tok) >= STEM_MIN_LEN, F.regexp_replace(tok, STEM_SUFFIX_RE, "")
    ).otherwise(tok)


def tokens_stemmed_expr(text: Column) -> Column:
    """Suffix-stripped tokens (weight-B 'english' config analogue). The
    suffixes are ASCII so non-Latin tokens and CJK bigrams pass through."""
    return F.transform(tokens_exact_expr(text), stem_expr)


def stem_py(tok: str) -> str:
    """Pure-Python mirror (for pandas-UDF chunking metadata and tests)."""
    import re

    if len(tok) >= STEM_MIN_LEN:
        return re.sub(STEM_SUFFIX_RE, "", tok)
    return tok


def tokenize_py(text: str) -> list[str]:
    import re

    folded = (text or "").replace(*_I_DOT_FOLD)
    spaced = re.sub(f"({CJK_CLASS}+)", r" \1 ", folded.lower())
    toks = [t for t in re.split(TOKEN_SPLIT_RE_PY, spaced) if t]
    out: list[str] = []
    for t in toks:
        if len(t) >= 2 and re.match(CJK_CLASS, t):
            out.extend(t[i : i + 2] for i in range(len(t) - 1))
        else:
            out.append(t)
    return out


# ---------------------------------------------------------------------------
# DuckDB-oracle SQL mirrors
# ---------------------------------------------------------------------------


def sql_tokens_exact(c: str) -> str:
    # DuckDB regexp_replace needs the 'g' flag (Spark replaces all by
    # default); the rewrite backreference is \1 (RE2), not Java's $1.
    folded = f"replace({c}, '{_I_DOT_FOLD[0]}', '{_I_DOT_FOLD[1]}')"
    spaced = f"regexp_replace(lower({folded}), '({CJK_CLASS}+)', ' \\1 ', 'g')"
    base = f"list_filter(string_split_regex({spaced}, '{TOKEN_SPLIT_RE}'), t -> len(t) > 0)"
    big = "list_transform(range(1, len(t)), i -> substring(t, CAST(i AS INT), 2))"
    expand = (
        f"CASE WHEN regexp_matches(t, '^{CJK_CLASS}') AND len(t) >= 2 "
        f"THEN {big} ELSE [t] END"
    )
    return f"flatten(list_transform({base}, t -> {expand}))"


def sql_stem(t: str) -> str:
    return (
        f"CASE WHEN length({t}) >= {STEM_MIN_LEN} "
        f"THEN regexp_replace({t}, '{STEM_SUFFIX_RE}', '') ELSE {t} END"
    )


def sql_tokens_stemmed(c: str) -> str:
    return f"list_transform({sql_tokens_exact(c)}, t -> {sql_stem('t')})"


def spark_sql_tokens_exact(c: str) -> str:
    """The same tokenizer as a Spark-SQL string expression (for the SQL
    surface's ck_tokens temp function — Spark SQL literals eat one level
    of backslash, so the split class is escape-doubled)."""
    split_sql = TOKEN_SPLIT_RE.replace(chr(92), chr(92) * 2)
    folded = f"replace({c}, '{_I_DOT_FOLD[0]}', '{_I_DOT_FOLD[1]}')"
    lowered = f"lower({folded})"
    fast = f"filter(split({lowered}, '{split_sql}'), x -> length(x) > 0)"
    slow = (
        f"flatten(transform(filter(split(regexp_replace({lowered}, "
        f"'({CJK_CLASS}+)', ' $1 '), '{split_sql}'), x -> length(x) > 0), "
        f"x -> CASE WHEN x RLIKE '^{CJK_CLASS}' AND length(x) >= 2 "
        f"THEN transform(sequence(1, length(x) - 1), i -> substring(x, i, 2)) "
        f"ELSE array(x) END))"
    )
    # same whole-text CJK gate as tokens_exact_expr (r9)
    return f"CASE WHEN {lowered} RLIKE '{CJK_CLASS}' THEN {slow} ELSE {fast} END"
