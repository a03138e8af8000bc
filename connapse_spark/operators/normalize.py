"""Text normalization for web-scale corpora: mojibake repair, control and
zero-width character stripping, unicode-space folding, and whitespace
collapse — the cleanup pass that runs before tokenization/dedup in every
real pipeline (the ftfy/CCNet-style steps, restricted to the deterministic
subset both Spark and the DuckDB oracle can express as column math).

Order matters and is part of the contract:
  1. mojibake repair FIRST (the broken sequences contain NBSP-adjacent
     chars that later steps would fold away),
  2. control + zero-width strip,
  3. unicode spaces → ASCII space, CRLF → LF,
  4. horizontal-run collapse, trailing-space strip, blank-run collapse,
  5. trim.

Everything is a regexp_replace / replace chain — whole-stage codegen,
map-side, no shuffle, no UDF. Unicode NFC (which needs the full
decomposition tables) is available as an OPT-IN Arrow-batched pass
(``nfc_normalize``) and is deliberately outside the oracle contract.

The reference has no normalization module — this extends the engine in
the training-data direction the brief asks for.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# UTF-8 bytes mis-decoded as cp1252 — the dominant mojibake family.
# Derived, not hand-typed: bad = good.encode('utf-8').decode('cp1252').
# Chars whose UTF-8 bytes hit cp1252's undefined slots (0x81 0x8D 0x8F
# 0x90 0x9D — e.g. RIGHT DOUBLE QUOTATION MARK) don't round-trip and are
# left out. Longest bad-sequence first so three-char sequences win over
# any two-char prefix rule.
_MOJIBAKE_CHARS = (
    "’‘“—–…•"  # ’ ‘ “ — – … •
    "éèêáàâä"  # é è ê á à â ä
    "öôüûñçóòúíìï"
)


def _cp1252_mojibake(ch: str) -> str | None:
    try:
        return ch.encode("utf-8").decode("cp1252")
    except UnicodeDecodeError:
        return None


MOJIBAKE_MAP: list[tuple[str, str]] = sorted(
    ((bad, ch) for ch in _MOJIBAKE_CHARS if (bad := _cp1252_mojibake(ch))),
    key=lambda p: (-len(p[0]), p[0]),
)

# detection (not repair): 'â€' + anything is a mis-decoded
# U+2000-block char; 'Ã' followed by a char in U+00A0-U+00BF is a
# mis-decoded Latin-1 letter (UTF-8 second byte A0-BF seen through cp1252)
MOJIBAKE_DETECT_RE = "(â€.|Ã[ -¿])"

CONTROL_RE = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]"
ZERO_WIDTH_RE = "[" + "".join(chr(c) for c in (0x200B, 0x200C, 0x200D, 0xFEFF, 0x00AD)) + "]"
UNICODE_SPACE_RE = ("[" + chr(0x00A0) + chr(0x1680) + chr(0x2000) + "-" + chr(0x200A)
                    + chr(0x202F) + chr(0x205F) + chr(0x3000) + "]")


def repair_mojibake_expr(text: Column) -> Column:
    for bad, good in MOJIBAKE_MAP:
        text = F.replace(text, F.lit(bad), F.lit(good))
    return text


def mojibake_count_expr(text: Column) -> Column:
    """How many mojibake-shaped sequences the raw text contains — a cheap
    corpus-health gauge (score > 0 → some upstream decode was wrong)."""
    return F.regexp_count(text, F.lit(MOJIBAKE_DETECT_RE))


def normalize_text_expr(text: Column) -> Column:
    t = repair_mojibake_expr(text)
    t = F.regexp_replace(t, CONTROL_RE, "")
    t = F.regexp_replace(t, ZERO_WIDTH_RE, "")
    t = F.regexp_replace(t, UNICODE_SPACE_RE, " ")
    t = F.regexp_replace(t, "\\r\\n?", "\n")
    t = F.regexp_replace(t, "[ \\t]+", " ")
    t = F.regexp_replace(t, " +\\n", "\n")
    t = F.regexp_replace(t, "\\n{3,}", "\n\n")
    return F.trim(t)


def _sql_lit(s: str) -> str:
    """A DuckDB string literal for ``s`` built portably: printable ASCII
    stays quoted, everything else becomes chr(codepoint) concatenation —
    no escape-dialect assumptions, no invisible chars in generated SQL."""
    parts: list[str] = []
    buf = ""
    for ch in s:
        if 32 <= ord(ch) < 127 and ch != "'":
            buf += ch
        else:
            if buf:
                parts.append(f"'{buf}'")
                buf = ""
            parts.append(f"chr({ord(ch)})")
    if buf:
        parts.append(f"'{buf}'")
    if not parts:
        return "''"
    return "(" + " || ".join(parts) + ")" if len(parts) > 1 else parts[0]


def sql_repair_mojibake(text: str) -> str:
    for bad, good in MOJIBAKE_MAP:
        text = f"replace({text}, {_sql_lit(bad)}, {_sql_lit(good)})"
    return text


def sql_mojibake_count(text: str) -> str:
    return f"len(regexp_extract_all({text}, {_sql_lit(MOJIBAKE_DETECT_RE)}))::INT"


def sql_normalize_text(text: str) -> str:
    nl = _sql_lit("\n")
    t = sql_repair_mojibake(text)
    t = f"regexp_replace({t}, '{CONTROL_RE}', '', 'g')"
    t = f"regexp_replace({t}, {_sql_lit(ZERO_WIDTH_RE)}, '', 'g')"
    t = f"regexp_replace({t}, {_sql_lit(UNICODE_SPACE_RE)}, ' ', 'g')"
    t = f"regexp_replace({t}, '\\r\\n?', {nl}, 'g')"
    t = f"regexp_replace({t}, '[ \\t]+', ' ', 'g')"
    t = f"regexp_replace({t}, ' +\\n', {nl}, 'g')"
    t = f"regexp_replace({t}, '\\n{{3,}}', {nl} || {nl}, 'g')"
    return f"trim({t})"


def normalize_documents(
    df: DataFrame, text_col: str = "text", out_col: str = "text_norm"
) -> DataFrame:
    """Adds the normalized text plus before/after gauges. Map-side only —
    at 100 TB this is a free rider on whatever scan feeds it."""
    text = F.col(text_col)
    return (
        df.withColumn("n_mojibake", mojibake_count_expr(text))
        .withColumn(out_col, normalize_text_expr(text))
        .withColumn("chars_removed", F.length(text) - F.length(F.col(out_col)))
    )


def nfc_normalize(df: DataFrame, text_col: str = "text", form: str = "NFC") -> DataFrame:
    """OPT-IN unicode normalization (NFC/NFKC/NFD/NFKD) — needs the full
    decomposition tables, so this is an Arrow-batched pass rather than
    column math, and is outside the SQL-oracle contract. Schema is
    preserved; only ``text_col`` changes."""
    import unicodedata

    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normalization form: {form}")
    schema = df.schema

    def _norm(batches):
        for pdf in batches:
            pdf[text_col] = pdf[text_col].map(
                lambda s: unicodedata.normalize(form, s) if isinstance(s, str) else s
            )
            yield pdf

    return df.mapInPandas(_norm, schema)
