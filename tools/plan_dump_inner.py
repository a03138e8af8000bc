"""Dump formatted physical plans of the KERNELS behind the wrapped
registry entries (``_scoped_cache_result`` collects and re-creates the
result, so ``plan_dump.py`` on those entries only shows a Scan
ExistingRDD). This builds the same frames the entries build and dumps
the plan of the frame the collect would execute.

Usage: python tools/plan_dump_inner.py OUTDIR SUFFIX kernel [kernel ...]
Kernels: keyword_many_phrase, hybrid_many_websearch_fast.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.plan_dump import plan_text  # noqa: E402


def _corpus(spark, sf_dir):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    vecs = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
        F.col("vec_id").alias("doc_id"), F.col("embedding")
    )
    return docs, vecs


def build(spark, sf_dir, name):
    import __spark_entry__ as entry_mod
    from connapse_spark.operators import keyword_index
    from connapse_spark.operators.search import hybrid_search_many_fast

    docs, vecs = _corpus(spark, sf_dir)
    if name == "keyword_many_phrase":
        tokens = keyword_index.build_token_table(docs).persist()
        pe = keyword_index.build_positions_postings(tokens, "tokens_exact")
        ps = keyword_index.build_positions_postings(tokens, "tokens_stemmed")
        return keyword_index.keyword_search_many_phrase_indexed(
            pe, ps, entry_mod.PHRASE_BATCH_QUERIES, k=5
        )
    if name == "hybrid_many_websearch_fast":
        tokens = keyword_index.build_token_table(docs).persist()
        tfe = keyword_index.build_tf_postings(tokens, "tokens_exact")
        tfs = keyword_index.build_tf_postings(tokens, "tokens_stemmed")
        pe = keyword_index.build_positions_postings(tokens, "tokens_exact")
        ps = keyword_index.build_positions_postings(tokens, "tokens_stemmed")
        return hybrid_search_many_fast(
            docs.join(vecs, "doc_id"),
            entry_mod.WEBSEARCH_BATCH_QUERIES,
            top_k=5,
            websearch=True,
            tf_postings=(tfe, tfs),
            positions_postings=(pe, ps),
        )
    raise SystemExit(f"unknown kernel {name}")


def main() -> None:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    os.makedirs(outdir, exist_ok=True)
    from connapse_spark.session import get_spark

    spark = get_spark(app_name="plan-dump-inner", cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = build(spark, sf_dir, name)
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan_text(df))
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
