"""Trained quality-classifier tier (r9 — VERDICT r8 ask #2): training
determinism against the shipped pin, planted-label separation, and the
curate composition stage."""

import pytest
from pyspark.sql import functions as F

from connapse_spark.operators import classifier


@pytest.fixture(scope="module")
def labeled(spark):
    return spark.createDataFrame(
        classifier.fixture_quality_labels(), "doc_id long, label double, text string"
    ).persist()


def test_training_reproduces_pinned_model(spark, labeled):
    """Single-partition L-BFGS with zero init and no sampling is bit
    deterministic: retraining on the fixture must reproduce the shipped
    QC_PINNED_MODEL exactly (regenerate with tools/pin_classifier.py if
    the fixture/recipe changes)."""
    m = classifier.train_quality_classifier(labeled)
    assert m["n_features"] == classifier.QC_PINNED_MODEL["n_features"]
    assert m["bias_q"] == classifier.QC_PINNED_MODEL["bias_q"]
    assert m["weights_q"] == classifier.QC_PINNED_MODEL["weights_q"]


def test_pinned_model_separates_planted_labels(spark, labeled):
    """Every good fixture doc must out-score every bad one with a wide
    margin (the fixture is linearly separable by construction)."""
    sc = classifier.quality_classifier_scores(labeled).collect()
    good = [r["logit"] for r in sc if r["doc_id"] < 10_000]
    bad = [r["logit"] for r in sc if r["doc_id"] >= 10_000]
    assert min(good) > 0 > max(bad)
    assert min(good) - max(bad) > 5.0


def test_scores_empty_doc_gets_bias(spark):
    docs = spark.createDataFrame([(1, ""), (2, None)], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in classifier.quality_classifier_scores(docs).collect()}
    for i in (1, 2):
        assert rows[i]["n_feats"] == 0
        assert rows[i]["logit_q"] == classifier.QC_PINNED_MODEL["bias_q"]


@pytest.mark.slow
def test_curate_model_stage_composes(spark):
    """A doc that PASSES every heuristic stage but scores below the
    threshold gets model_low_quality; clean prose stays kept; precedence
    of the earlier stages is unchanged."""
    from connapse_spark.operators import curate

    good_text = (
        "The committee explains the results of the experiment in plain words. "
        "Each section ends with a short summary and the conclusion follows "
        "from the data. It is written for a general audience and the argument "
        "builds slowly. Nothing here requires prior knowledge of the field."
    )
    # gopher-passing shape (42 tokens, mean len 5.8, distinct 1.0, two
    # stopwords, alpha 0.95 — gate-verified keep=True) but gibberish-heavy
    # vocabulary the trained model marks down (logit −4.3)
    import random

    rng = random.Random(5)
    hexes = [f"{rng.getrandbits(24):06x}" for _ in range(40)]
    sneaky_text = (
        "the " + " ".join(hexes[:20]) + " of " + " ".join(hexes[20:])
    )
    docs = spark.createDataFrame(
        [(1, good_text), (2, sneaky_text)], "doc_id long, text string"
    )
    blocklist = spark.createDataFrame([("zz yy xx",)], "s string")
    base = {
        r["id"]: r["reason"]
        for r in curate.curate(docs, blocklist).collect()
    }
    assert base == {1: "kept", 2: "kept"}  # heuristics alone pass both
    out = {
        r["id"]: r["reason"]
        for r in curate.curate(
            docs, blocklist,
            classifier_model=classifier.QC_PINNED_MODEL, min_logit_q=0,
        ).collect()
    }
    assert out[1] == "kept"
    assert out[2] == "model_low_quality"


def test_scores_match_duckdb_on_fixture(spark, labeled):
    """Cross-engine: the integer micro-logit sums agree bit-exactly on
    the fixture corpus (the sf-table parity is the oracle entry)."""
    import duckdb

    pdf = labeled.select("doc_id", "text").toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    du = con.sql(
        classifier.sql_quality_classifier() + " ORDER BY doc_id"
    ).fetchall()
    sp = [
        (r["doc_id"], r["n_feats"], r["logit_q"], r["logit"])
        for r in classifier.quality_classifier_scores(labeled).orderBy("doc_id").collect()
    ]
    assert sp == [tuple(r) for r in du]


def test_scoring_tiers_bit_equal_and_map_side(spark, labeled):
    """The opt-in ≤4096-bin literal-array tier must be bit-equal to the
    default broadcast-join tier on the same model, and its plan must be
    pure map-side: zero Exchange, zero Join, zero Python. (The broadcast
    tier is the DEFAULT because it measured 3.4× faster at sf0.1 —
    higher-order functions run interpreted; see the docstring.)"""
    fold = classifier.quality_classifier_scores(labeled, map_side=True)
    join = classifier.quality_classifier_scores(labeled)
    rows_f = sorted(tuple(r) for r in fold.collect())
    rows_j = sorted(tuple(r) for r in join.collect())
    assert rows_f == rows_j
    plan = fold._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan


def test_map_side_rejects_large_models(spark):
    """map_side=True is an explicit shuffle-capacity request — a model
    past the 4096-bin literal cap must raise, never silently fall back
    to the two-shuffle join tier."""
    big = {"n_features": 8192, "bias_q": 0, "weights_q": {1: 5}}
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="4096"):
        classifier.quality_classifier_scores(docs, model=big, map_side=True)

def test_distributed_tier_agrees_to_tolerance(spark, labeled):
    """deterministic=False keeps the labeled frame partitioned and lets
    MLlib's treeAggregate L-BFGS reduce gradients in parallel (r10 —
    VERDICT r9 ask #5: the scale tier for label sets that outgrow one
    partition). The L2-regularized objective is strictly convex (unique
    optimum), so the two tiers converge to the SAME weights up to
    optimizer tolerance: micro-quantized exports agree within a few
    hundred micro-units and the downstream keep/junk separation is
    unchanged."""
    det = classifier.QC_PINNED_MODEL
    dist = classifier.train_quality_classifier(
        labeled.repartition(8), deterministic=False
    )
    assert dist["n_features"] == det["n_features"]
    assert abs(dist["bias_q"] - det["bias_q"]) <= 500
    keys = set(det["weights_q"]) | set(dist["weights_q"])
    worst = max(
        abs(det["weights_q"].get(k, 0) - dist["weights_q"].get(k, 0)) for k in keys
    )
    assert worst <= 500, f"micro-weight divergence {worst} > 500"
    # downstream: the distributed model still separates the planted labels
    sc = classifier.quality_classifier_scores(labeled, model=dist).collect()
    good = [r["logit"] for r in sc if r["doc_id"] < 10_000]
    bad = [r["logit"] for r in sc if r["doc_id"] >= 10_000]
    assert min(good) > 0 > max(bad)
