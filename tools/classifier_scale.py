"""Measure the quality-classifier TRAINING ceiling (r10 — VERDICT r9 ask
#5): wall time of ``train_quality_classifier`` at growing labeled-set
sizes, for both tiers — ``deterministic=True`` (single-partition L-BFGS,
bit-reproducible exports) and ``deterministic=False`` (MLlib's stock
treeAggregate reduction, tolerance-reproducible). Results land as the
SCALING.md §classifier-train rows.

Synthetic labeled corpus: label-correlated vocab plus id-salted filler so
the hashed uni+bigram features vary per row (~60 tokens/doc — the shape
that matters is rows × tokens, both reported). Usage:

    python tools/classifier_scale.py [sizes...]     # default 10000 100000 400000
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402


def labeled_frame(spark, n: int):
    good = (
        "the measured experiment reports a clear result with careful method "
        "and the discussion cites prior work before drawing a modest conclusion "
        "section that readers can verify against the published appendix tables "
    )
    junk = (
        "click here buy now free offer winner casino bonus deal deal deal "
        "subscribe like share spam spam spam cheap pills lottery jackpot now "
        "limited time act fast zero cost miracle secret trick exposed today "
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 2).cast("double").alias("label"),
        F.concat(
            F.when(F.col("id") % 2 == 1, F.lit(good * 2)).otherwise(F.lit(junk * 2)),
            F.lit(" topic"),
            (F.col("id") % 9973).cast("string"),
            F.lit(" region"),
            (F.col("id") % 997).cast("string"),
            F.lit(" shard"),
            (F.col("id") % 97).cast("string"),
        ).alias("text"),
    )


def main() -> None:
    from connapse_spark.operators.classifier import train_quality_classifier
    from connapse_spark.session import get_spark

    sizes = [int(a) for a in sys.argv[1:]] or [10_000, 100_000, 400_000]
    spark = get_spark(
        app_name="connapse-classifier-scale",
        cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"),
    )
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        lab = labeled_frame(spark, n).persist()
        lab.count()  # labeled input pinned — the timed region is training only
        for det in (True, False):
            t0 = time.time()
            m = train_quality_classifier(lab, deterministic=det)
            dt = time.time() - t0
            tier = "deterministic(1-part)" if det else "distributed(treeAgg)"
            print(
                f"rows={n:>7} tier={tier:<22} train={dt:7.1f}s "
                f"nonzero_weights={len(m['weights_q'])}",
                flush=True,
            )
        lab.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
