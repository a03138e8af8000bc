"""Tokenization for keyword search — the Spark re-expression of the
reference's weighted dual-config tsvector (KnowledgeDbContext.cs:232-235:
``setweight(to_tsvector('simple', content),'A') ||
setweight(to_tsvector('english', content),'B')``).

Postgres keeps exact tokens (weight A) and stemmed tokens (weight B) in one
generated column; we keep two array columns computed at write time — the same
"pay at write" trade. The stemmer is a documented simplification (a small
suffix-stripper, not full Snowball): exact Postgres rank values are not the
contract, ranking behavior is (SURVEY.md §7 hard-part a).

Every function has a DuckDB SQL mirror so the oracle computes identical
token arrays.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"
# Applied once, leftmost alternative first (same in Java regex and RE2).
STEM_SUFFIX_RE = "(ing|ed|ies|es|s)$"
STEM_MIN_LEN = 4  # only stem tokens longer than 3 chars


def tokens_exact_expr(text: Column) -> Column:
    """Lowercase alphanumeric tokens (weight-A 'simple' config analogue)."""
    return F.filter(
        F.split(F.lower(text), TOKEN_SPLIT_RE),
        lambda t: F.length(t) > 0,
    )


def stem_expr(tok: Column) -> Column:
    return F.when(
        F.length(tok) >= STEM_MIN_LEN, F.regexp_replace(tok, STEM_SUFFIX_RE, "")
    ).otherwise(tok)


def tokens_stemmed_expr(text: Column) -> Column:
    """Suffix-stripped tokens (weight-B 'english' config analogue)."""
    return F.transform(tokens_exact_expr(text), stem_expr)


def stem_py(tok: str) -> str:
    """Pure-Python mirror (for pandas-UDF chunking metadata and tests)."""
    import re

    if len(tok) >= STEM_MIN_LEN:
        return re.sub(STEM_SUFFIX_RE, "", tok)
    return tok


def tokenize_py(text: str) -> list[str]:
    import re

    return [t for t in re.split(TOKEN_SPLIT_RE, text.lower()) if t]


# ---------------------------------------------------------------------------
# DuckDB-oracle SQL mirrors
# ---------------------------------------------------------------------------


def sql_tokens_exact(c: str) -> str:
    return f"list_filter(string_split_regex(lower({c}), '{TOKEN_SPLIT_RE}'), t -> len(t) > 0)"


def sql_stem(t: str) -> str:
    return (
        f"CASE WHEN length({t}) >= {STEM_MIN_LEN} "
        f"THEN regexp_replace({t}, '{STEM_SUFFIX_RE}', '') ELSE {t} END"
    )


def sql_tokens_stemmed(c: str) -> str:
    return f"list_transform({sql_tokens_exact(c)}, t -> {sql_stem('t')})"
