"""r8 Unicode tokenizer: 3-way parity (Spark expr / Spark SQL surface /
DuckDB mirror / Python mirror) plus the behavioral contracts the VERDICT
r7 ask pins — CJK bigrams, whole-word non-Latin scripts, and exact ASCII
backward-compatibility with the r7 ``[^a-z0-9]+`` split."""

from __future__ import annotations

import re

import duckdb
import pytest
from pyspark.sql import functions as F

from connapse_spark.functions.text import (
    CJK_CLASS,
    TOKEN_SPLIT_RE,
    spark_sql_tokens_exact,
    sql_tokens_exact,
    sql_tokens_stemmed,
    tokenize_py,
    tokens_exact_expr,
    tokens_stemmed_expr,
)

CASES = [
    "Hello, World_123 foo-bar",
    "café über Füße déjà-vu",
    "Привет мир ЭТО тест",
    "هذا اختبار عربي",
    "これはテストです",
    "日本語のテキスト処理",
    "中文分词测试",
    "한국어 텍스트 처리",
    "mixed 中文 and English 日本語abc",
    "3日で学ぶSpark",
    "",
    "!!! --- ???",
    "一",
    "中a文",
    # U+0130 'İ' — the one one-to-many lowercase in the full Unicode case
    # mapping; neutralized by the pre-fold so utf8proc (simple mapping)
    # and Java/Python (full mapping) tokenize identically
    "İstanbul ŞEHİR ılık",
    "Diyarbakır İZMİR",
]


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


def _duck_tokens(duck, s: str, stemmed: bool = False) -> list[str]:
    expr = sql_tokens_stemmed("?::VARCHAR") if stemmed else sql_tokens_exact("?::VARCHAR")
    r = duck.execute(f"select {expr}", [s]).fetchone()[0]
    return list(r) if r is not None else []


def test_three_way_parity_exact(spark, duck):
    df = spark.createDataFrame(list(enumerate(CASES)), "i int, t string")
    sp = {
        r["i"]: list(r["toks"])
        for r in df.select("i", tokens_exact_expr(F.col("t")).alias("toks")).collect()
    }
    df.createOrReplaceTempView("tok_cases")
    spsql = {
        r["i"]: list(r["toks"])
        for r in spark.sql(
            f"select i, {spark_sql_tokens_exact('t')} as toks from tok_cases"
        ).collect()
    }
    for i, s in enumerate(CASES):
        py = tokenize_py(s)
        dk = _duck_tokens(duck, s)
        assert py == dk == sp[i] == spsql[i], f"case {i}: {s!r}"


def test_three_way_parity_stemmed(spark, duck):
    df = spark.createDataFrame(list(enumerate(CASES)), "i int, t string")
    sp = {
        r["i"]: list(r["toks"])
        for r in df.select("i", tokens_stemmed_expr(F.col("t")).alias("toks")).collect()
    }
    for i, s in enumerate(CASES):
        assert sp[i] == _duck_tokens(duck, s, stemmed=True), f"case {i}: {s!r}"


def test_ascii_behavior_unchanged():
    """On pure-ASCII text the Unicode split must equal the r7 ASCII split
    exactly (no CJK runs → the bigram tier never fires) — this is what
    keeps every pre-r8 oracle green without re-pinning."""
    old = lambda s: [t for t in re.split("[^a-z0-9]+", s.lower()) if t]
    for s in [
        "Hello, World_123 foo-bar",
        "the quick brown fox: jumps! over 42 lazy-dogs",
        "a_b__c 0x1f  (parens) [brackets]",
    ]:
        assert tokenize_py(s) == old(s)


def test_cjk_bigrams():
    assert tokenize_py("中文分词") == ["中文", "文分", "分词"]
    assert tokenize_py("一") == ["一"]  # single ideograph stays whole
    # kana and Han bigram together inside one unsegmented run
    assert tokenize_py("これは日本") == ["これ", "れは", "は日", "日本"]
    # Hangul is a spaced script: whole words, never bigrams
    assert tokenize_py("한국어 텍스트") == ["한국어", "텍스트"]


def test_interleaved_scripts_split_at_run_boundaries():
    assert tokenize_py("日本語abc") == ["日本", "本語", "abc"]
    assert tokenize_py("3日で学ぶSpark") == ["3", "日で", "で学", "学ぶ", "spark"]
    assert tokenize_py("中a文") == ["中", "a", "文"]


def test_split_class_is_general_category_not_script():
    """The split regex must stay on general categories (\\p{L}/\\p{N}) —
    Java and RE2 spell SCRIPT classes differently (IsHan vs Han), so a
    script class here would silently diverge engines."""
    assert "\\p{L}" in TOKEN_SPLIT_RE and "\\p{N}" in TOKEN_SPLIT_RE
    assert "Is" not in CJK_CLASS and "\\x{" not in CJK_CLASS
