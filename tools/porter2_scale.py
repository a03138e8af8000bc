"""Measure the opt-in Porter2 analyzer's write-time cost across the SF
decade against the default JVM suffix tier — the honest price of full
Snowball parity (UDFs are the slow path; this quantifies how slow, and
that it stays LINEAR, for the one place the stemmer touches Spark:
corpus tokenization at ingest).

Usage: python tools/porter2_scale.py
Prints one markdown table row per SF for SCALING.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = ["0.001", "0.01", "0.1"]


def main() -> None:
    from connapse_spark.operators import keyword_index as ki
    from connapse_spark.session import get_spark

    spark = get_spark(app_name="porter2-scale")
    spark.sparkContext.setLogLevel("ERROR")
    print("| sf | docs | suffix (JVM) s | porter2 (mapInPandas) s | ratio |")
    print("|---|---|---|---|---|")
    from pyspark.sql import functions as F

    def measure(docs, label, n):
        best = {}
        for stemmer in ("suffix", "porter2"):
            b = float("inf")
            for _ in range(3):
                t0 = time.time()
                # sum(size(...)) forces every stemmed array to materialize
                # without collecting the corpus to the driver
                ki.build_token_table(docs, stemmer=stemmer).selectExpr(
                    "sum(size(tokens_stemmed))"
                ).collect()
                b = min(b, time.time() - t0)
            best[stemmer] = b
        print(
            f"| {label} | {n} | {best['suffix']:.2f} | {best['porter2']:.2f} "
            f"| {best['porter2'] / best['suffix']:.1f}x |",
            flush=True,
        )

    for sf in SFS:
        docs = spark.read.parquet(f"/root/testdata/sf{sf}/documents.parquet")
        measure(docs, sf, docs.count())

    # synthesized decade past the toy SFs: replicate sf0.1 with a per-copy
    # salt token so texts are not byte-identical. Honesty note: replication
    # raises the per-executor LRU memo hit rate above even a Zipfian
    # corpus, so the porter2 column is a BEST case at these sizes; the
    # suffix tier has no memo, so the ratio is a lower bound.
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "text"
    )
    for mult in (10, 100):
        big = base.crossJoin(
            spark.range(mult).withColumnRenamed("id", "_copy")
        ).select(
            (F.col("doc_id") * mult + F.col("_copy")).alias("doc_id"),
            F.concat(
                F.col("text"), F.lit(" copysalt"), F.col("_copy").cast("string")
            ).alias("text"),
        ).repartition(32).persist()
        n = big.count()
        measure(big, f"0.1 x{mult}", n)
        big.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
