"""Interleaved A/B timing harness for the r12 optimization round.

Times named operator scenarios with the noop sink (guide §1.4 — full
computation of every column, no sink cost, no count() pruning) in ONE
Spark session, printing one JSON line per scenario. Run it alternately
from the current repo and a baseline worktree (same box window) to get a
cross-process interleaved A/B — the only comparison methodology that
survives this box's documented steal dispersion (BENCH_NOTES.md).

Usage:
    python tools/ab_time.py SCENARIO [SCENARIO ...] [--repeats N]

$SPARK_GRAFT_SF_DIR picks the data (default sf0.1), $SPARK_GRAFT_CPUS the
core count. Scratch tables (postings, corpus joins) are pinned BEFORE the
timed region, exactly like bench.py's serve-only rows.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


BATCH_WORDS = [
    "hash", "sort", "merge", "filter", "group", "window", "agg", "column",
    "row", "batch", "spark", "index", "vector", "token", "stream", "cache",
    "shuffle", "partition", "codegen", "parquet",
]


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    repeats = 3
    for a in sys.argv[1:]:
        if a.startswith("--repeats"):
            repeats = int(a.split("=", 1)[1])

    from pyspark.sql import functions as F

    from connapse_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="ab-time", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    docs.count()  # warm FS/JVM

    def scen_dup_spans():
        from connapse_spark.operators import dedup

        return dedup.dup_span_stats(docs, n=16)

    def scen_remove_dup_spans():
        from connapse_spark.operators import dedup

        return dedup.remove_dup_spans(docs, n=16)

    def scen_ngram_jaccard_prefix():
        from connapse_spark.operators import dedup

        return dedup.ngram_jaccard_pairs(docs, threshold=0.6)

    def scen_frontier_delta():
        import __spark_entry__ as entry

        return entry.queries()["frontier_delta"](spark, sf_dir)

    def scen_keyword_many():
        from connapse_spark.operators.search import keyword_search_many

        qs = [(i, f"{w} table scan") for i, w in enumerate(BATCH_WORDS)]
        return keyword_search_many(docs, qs, k=10)

    def scen_dataset_card():
        import __spark_entry__ as entry

        return entry.queries()["dataset_card"](spark, sf_dir)

    # serve-tier scenarios pin their index tables outside the timed region
    pinned: dict = {}

    def _tf_tables():
        if "tf" not in pinned:
            from connapse_spark.operators import keyword_index as ki

            tokens = ki.build_token_table(docs).persist()
            tfe = ki.build_tf_postings(tokens, "tokens_exact").persist()
            tfs = ki.build_tf_postings(tokens, "tokens_stemmed").persist()
            tfe.count(), tfs.count()
            pinned["tf"] = (tokens, tfe, tfs)
        return pinned["tf"]

    def _pos_tables():
        if "pos" not in pinned:
            from connapse_spark.operators import keyword_index as ki

            tokens, _, _ = _tf_tables()
            ppe = ki.build_positions_postings(tokens, "tokens_exact").persist()
            pps = ki.build_positions_postings(tokens, "tokens_stemmed").persist()
            ppe.count(), pps.count()
            pinned["pos"] = (ppe, pps)
        return pinned["pos"]

    def _corpus():
        if "corpus" not in pinned:
            c = docs.join(
                emb.select(F.col("vec_id").alias("doc_id"), "embedding"), "doc_id"
            ).persist()
            c.count()
            pinned["corpus"] = c
        return pinned["corpus"]

    def scen_kw_batch20_indexed():
        from connapse_spark.operators import keyword_index as ki

        _, tfe, tfs = _tf_tables()
        qs = [(i, f"{w} table scan") for i, w in enumerate(BATCH_WORDS)]
        return ki.keyword_search_many_indexed(tfe, tfs, qs, k=10)

    def scen_hybrid_batch20_fast():
        from connapse_spark.operators.search import hybrid_search_many_fast

        qs = [(i, f"query {w} table scan join") for i, w in enumerate(BATCH_WORDS)]
        return hybrid_search_many_fast(_corpus(), qs, top_k=10)

    def scen_hybrid_batch20_indexed():
        from connapse_spark.operators.search import hybrid_search_many_fast

        _, tfe, tfs = _tf_tables()
        qs = [(i, f"query {w} table scan join") for i, w in enumerate(BATCH_WORDS)]
        return hybrid_search_many_fast(
            _corpus(), qs, top_k=10, tf_postings=(tfe, tfs)
        )

    def scen_hybrid_batch20_websearch():
        from connapse_spark.operators.search import hybrid_search_many_fast

        _, tfe, tfs = _tf_tables()
        ppe, pps = _pos_tables()
        forms = [
            lambda w: f'"{w} table" scan',
            lambda w: f"{w} -merge",
            lambda w: f'{w} OR "table scan"',
            lambda w: f"query {w} join",
        ]
        qs = [(i, forms[i % 4](w)) for i, w in enumerate(BATCH_WORDS)]
        return hybrid_search_many_fast(
            _corpus(), qs, top_k=10, websearch=True,
            tf_postings=(tfe, tfs), positions_postings=(ppe, pps),
        )

    scenarios = {
        "dup_spans": scen_dup_spans,
        "remove_dup_spans": scen_remove_dup_spans,
        "ngram_jaccard_prefix": scen_ngram_jaccard_prefix,
        "frontier_delta": scen_frontier_delta,
        "keyword_many": scen_keyword_many,
        "dataset_card": scen_dataset_card,
        "kw_batch20_indexed": scen_kw_batch20_indexed,
        "hybrid_batch20_fast": scen_hybrid_batch20_fast,
        "hybrid_batch20_indexed": scen_hybrid_batch20_indexed,
        "hybrid_batch20_websearch": scen_hybrid_batch20_websearch,
    }
    def _registry(qname: str):
        import __spark_entry__ as entry

        return lambda: entry.queries()[qname](spark, sf_dir)

    for name in args:
        # "q:<registry name>" times any declared query without a
        # dedicated scenario (noop sink, same repeats)
        fn = scenarios[name] if name in scenarios else _registry(name[2:])
        spark.sparkContext.setJobDescription(f"ab:{name}")
        fn().write.format("noop").mode("overwrite").save()  # untimed warm
        times = [round(noop(fn()), 3) for _ in range(repeats)]
        print(json.dumps({"scenario": name, "times": times, "min": min(times)}),
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
