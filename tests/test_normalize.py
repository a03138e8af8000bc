"""Normalization units: mojibake repair correctness (via the cp1252
round-trip that generated the map), whitespace/control cleanup, pipeline
idempotence, and the opt-in NFC pass."""

from __future__ import annotations

from pyspark.sql import functions as F

from connapse_spark.operators import normalize as N


def _norm_one(spark, s: str) -> dict:
    row = (
        spark.range(1)
        .select(F.lit(s).alias("text"))
        .select(
            N.normalize_text_expr(F.col("text")).alias("norm"),
            N.mojibake_count_expr(F.col("text")).alias("n_moji"),
        )
        .first()
    )
    return {"norm": row["norm"], "n_moji": row["n_moji"]}


def _moji(s: str) -> str:
    return s.encode("utf-8").decode("cp1252")


def test_mojibake_map_is_cp1252_roundtrip():
    for bad, good in N.MOJIBAKE_MAP:
        assert bad == good.encode("utf-8").decode("cp1252")
    # longest-first ordering so 3-char sequences beat 2-char prefixes
    lens = [len(b) for b, _ in N.MOJIBAKE_MAP]
    assert lens == sorted(lens, reverse=True)


def test_repair_and_detect(spark):
    dirty = _moji("café") + " says " + _moji("“") + "hi" + _moji("…")
    out = _norm_one(spark, dirty)
    assert out["norm"] == "café says “hi…"
    assert out["n_moji"] == 3


def test_control_zero_width_and_spaces(spark):
    dirty = "a\x00b\x07c​d e　f"
    out = _norm_one(spark, dirty)
    assert out["norm"] == "abcd e f"
    assert out["n_moji"] == 0


def test_whitespace_collapse_and_crlf(spark):
    dirty = "line one   end \r\nline two\t\tx\n\n\n\n\nlast  "
    out = _norm_one(spark, dirty)
    assert out["norm"] == "line one end\nline two x\n\nlast"


def test_normalize_idempotent(spark):
    dirty = _moji("café—…") + "  x\u200b \r\n\r\n\r\n y\x01 "
    once = _norm_one(spark, dirty)["norm"]
    twice = _norm_one(spark, once)["norm"]
    assert once == twice


def test_nfc_normalize_pass(spark):
    # e + COMBINING ACUTE (NFD) → precomposed é under NFC
    df = spark.createDataFrame([(1, "café")], "id long, text string")
    out = N.nfc_normalize(df).collect()[0]
    assert out["text"] == "café"
    assert [f.name for f in df.schema.fields] == ["id", "text"]
