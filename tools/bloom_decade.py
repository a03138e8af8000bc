"""Measure per-file Bloom skipping across a DECADE of store growth (r10 —
VERDICT r9 ask #7): the r9 SCALING row measured files-opened on an sf0.1
chunk store (32 files); this script adds the 10× store so the ≤|keys|-files
claim has the same measured-decade footing as the postings tiers.

For each store size: commit a hash-keyed (sha256 chunk ids) table with
``bloom_cols``, then report files opened by a 10-key point fetch under
(a) footer stats alone and (b) stats + per-file blooms, plus the manifest
overhead. The scalable quantity is the FILE COUNT — stats keep O(all
files) on hash keys at any size, blooms keep ≤|keys| (+ ~0.8%
false-positive opens at the shipped 10 bits/row, k=7 sizing).

Usage: python tools/bloom_decade.py
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from connapse_spark.session import get_spark
    from connapse_spark.sources import snapshots

    spark = get_spark(
        app_name="connapse-bloom-decade", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="connapse_bloom_decade_")
    try:
        for label, n_rows, n_files in (("sf0.1", 11_772, 32), ("sf1", 117_720, 320)):
            df = spark.range(n_rows).select(
                F.sha2(F.col("id").cast("string"), 256).alias("chunk_id"),
                F.col("id").alias("payload"),
            ).repartition(n_files)
            tdir = os.path.join(root, label)
            t0 = time.time()
            snapshots.commit_snapshot(df, tdir, bloom_cols=["chunk_id"])
            commit_s = time.time() - t0
            m = snapshots.load_manifest(tdir)
            keys = [
                hashlib.sha256(str(i).encode()).hexdigest()
                for i in range(0, n_rows, max(1, n_rows // 10))
            ][:10]
            stats_keep = {
                e["path"]
                for k in keys
                for e in snapshots.prune_files(m, "chunk_id", k, k)
            }
            bloom_keep = snapshots.prune_files_keys(m, "chunk_id", keys)
            got = snapshots.scan_pruned_keys(spark, tdir, "chunk_id", keys).count()
            mf = sorted(
                f for f in os.listdir(tdir) if f.startswith("manifest-")
            )[-1]
            manifest_kb = os.path.getsize(os.path.join(tdir, mf)) / 1024
            print(
                json.dumps(
                    {
                        "store": label,
                        "rows": n_rows,
                        "files": len(m["files"]),
                        "keys": len(keys),
                        "rows_fetched": got,
                        "files_stats_only": len(stats_keep),
                        "files_with_blooms": len(bloom_keep),
                        "commit_s": round(commit_s, 1),
                        "manifest_kb": round(manifest_kb, 1),
                    }
                ),
                flush=True,
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
