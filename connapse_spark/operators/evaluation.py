"""Retrieval evaluation: nDCG@k / MRR / recall@k over (query, ranked hits)
runs against a qrels table — the measurement loop behind fusion choices
(the reference justifies Convex Combination over RRF by 1-5 nDCG@10,
docs/architecture.md:444 citing Bruch et al., TOIS 2023; this module is
what lets a deployment re-verify that claim on ITS corpus).

Inputs:
* runs:  (query_id, doc_id, rank)  — rank 1-based, one row per retrieved hit
* qrels: (query_id, doc_id, rel)   — graded relevance (binary works too)

Output: one row per query + a macro-average row (query_id = NULL), columns
(n_rel, hits_at_k, recall_at_k, mrr, dcg, idcg, ndcg).

Determinism: DCG folds over hits in RANK order (collect_list sorted by the
struct's leading rank field), IDCG over rel-sorted grades — fixed FP
order; log2 is exactly-rounded per IEEE on both JVM and C runtimes for
these magnitudes, and everything else is division/addition of small
integers.

Scale: one join on (query_id, doc_id), two grouped aggregates — query
cardinality drives cost, never corpus size; evaluation sets are small by
construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def retrieval_metrics(
    runs: DataFrame,
    qrels: DataFrame,
    k: int = 10,
) -> DataFrame:
    hits = (
        runs.filter(F.col("rank") <= k)
        .join(qrels, ["query_id", "doc_id"], "left")
        .select(
            "query_id",
            "rank",
            F.coalesce(F.col("rel"), F.lit(0)).cast("double").alias("rel"),
        )
    )
    per_q = hits.groupBy("query_id").agg(
        F.array_sort(F.collect_list(F.struct("rank", "rel"))).alias("_hits")
    )
    dcg = F.aggregate(
        "_hits",
        F.lit(0.0),
        lambda acc, h: acc + h["rel"] / F.log2(h["rank"].cast("double") + 1),
    )
    first_rel = F.filter("_hits", lambda h: h["rel"] > 0)
    mrr = F.when(F.size(first_rel) > 0, 1.0 / F.element_at(first_rel, 1)["rank"]).otherwise(0.0)
    n_hits = F.size(first_rel).cast("long")

    rel_sets = qrels.filter(F.col("rel") > 0).groupBy("query_id").agg(
        F.reverse(F.array_sort(F.collect_list(F.col("rel").cast("double")))).alias("_grades"),
        F.count(F.lit(1)).alias("n_rel"),
    )
    ideal = F.slice("_grades", 1, k)
    idcg = F.aggregate(
        F.zip_with(
            ideal,
            F.sequence(F.lit(1), F.size(ideal)),
            lambda g, r: F.struct(r.alias("rank"), g.alias("rel")),
        ),
        F.lit(0.0),
        lambda acc, h: acc + h["rel"] / F.log2(h["rank"].cast("double") + 1),
    )

    per_query = (
        per_q.join(rel_sets, "query_id", "full_outer")
        .select(
            "query_id",
            F.coalesce(F.col("n_rel"), F.lit(0)).cast("long").alias("n_rel"),
            F.coalesce(n_hits, F.lit(0)).alias("hits_at_k"),
            F.when(
                F.coalesce(F.col("n_rel"), F.lit(0)) > 0,
                F.coalesce(n_hits, F.lit(0))
                / F.least(F.col("n_rel"), F.lit(k)).cast("double"),
            )
            .otherwise(0.0)
            .alias("recall_at_k"),
            F.coalesce(mrr, F.lit(0.0)).alias("mrr"),
            F.coalesce(dcg, F.lit(0.0)).alias("dcg"),
            F.coalesce(idcg, F.lit(0.0)).alias("idcg"),
        )
        .withColumn(
            "ndcg",
            F.when(F.col("idcg") > 0, F.col("dcg") / F.col("idcg")).otherwise(0.0),
        )
    )
    macro = per_query.agg(
        F.lit(None).cast(dict(per_query.dtypes)["query_id"]).alias("query_id"),
        F.sum("n_rel").alias("n_rel"),
        F.sum("hits_at_k").alias("hits_at_k"),
        F.avg("recall_at_k").alias("recall_at_k"),
        F.avg("mrr").alias("mrr"),
        F.avg("dcg").alias("dcg"),
        F.avg("idcg").alias("idcg"),
        F.avg("ndcg").alias("ndcg"),
    )
    return per_query.unionByName(macro).orderBy(F.col("query_id").asc_nulls_last())
