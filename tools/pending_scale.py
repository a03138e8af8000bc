"""Measure per-micro-batch maintenance cost for the positions postings:
the overwrite regime (upsert_positions_postings + snapshot re-commit,
O(index) per batch) against the r10 pending regime
(positions_pending_append, O(batch) per commit) — the fastupdate
justification, measured. A fixed 50-doc batch folds into bases of
growing size; the overwrite column should grow with the BASE, the
append column should stay flat.

Usage: python tools/pending_scale.py
Prints one markdown table row per base size for SCALING.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from connapse_spark.operators import keyword_index as ki
    from connapse_spark.session import get_spark
    from connapse_spark.sources import snapshots

    spark = get_spark(app_name="pending-scale")
    spark.sparkContext.setLogLevel("ERROR")
    base_docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "text"
    )
    batch = base_docs.limit(50).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
    ).persist()
    batch.count()
    # absorb JVM/codegen/committer first-run cost before any timed region
    warm = tempfile.mkdtemp(prefix="pending_warm_")
    try:
        snapshots.commit_snapshot(
            ki.build_positions_postings(ki.build_token_table(batch)),
            os.path.join(warm, "w"),
        )
        ki.positions_pending_append(batch, os.path.join(warm, "d"), batch=0)
    finally:
        shutil.rmtree(warm, ignore_errors=True)

    print("| base corpus | base rows (term,id) | overwrite+commit s | pending append s |")
    print("|---|---|---|---|")
    for mult in (1, 10, 100):
        docs = (
            base_docs
            if mult == 1
            else base_docs.crossJoin(
                spark.range(mult).withColumnRenamed("id", "_c")
            ).select(
                (F.col("doc_id") * mult + F.col("_c")).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" salt"), F.col("_c")).alias("text"),
            )
        )
        root = tempfile.mkdtemp(prefix="pending_scale_")
        try:
            pos_dir = os.path.join(root, "pos")
            delta_dir = os.path.join(root, "delta")
            # SAME workload on both sides: maintain BOTH configs (exact +
            # stemmed), exactly what the streaming positions path commits
            pos = ki.build_positions_all(ki.build_token_table(docs))
            snapshots.commit_snapshot(pos, pos_dir, partition_by=["kind"])
            n = snapshots.read_snapshot(spark, pos_dir).count()

            best_ow = float("inf")
            for _ in range(2):
                stored = snapshots.read_snapshot(spark, pos_dir)
                t0 = time.time()
                btoks = ki.build_token_table(batch)
                parts = []
                for kind, col in (
                    ("exact", "tokens_exact"),
                    ("stemmed", "tokens_stemmed"),
                ):
                    cur_k = stored.filter(F.col("kind") == kind).select(
                        "term", "id", "positions"
                    )
                    parts.append(
                        ki.upsert_positions_postings(
                            cur_k, btoks, token_col=col
                        ).withColumn("kind", F.lit(kind))
                    )
                snapshots.commit_snapshot(
                    parts[0]
                    .unionByName(parts[1])
                    .select("kind", "term", "id", "positions"),
                    pos_dir,
                    partition_by=["kind"],
                )
                best_ow = min(best_ow, time.time() - t0)

            best_ap = float("inf")
            for b in range(2):
                t0 = time.time()
                ki.positions_pending_append(batch, delta_dir, batch=b)
                best_ap = min(best_ap, time.time() - t0)
            print(
                f"| sf0.1 x{mult} | {n:,} | {best_ow:.2f} | {best_ap:.2f} |",
                flush=True,
            )
        finally:
            shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
