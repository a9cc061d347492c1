"""Relevance evaluation — ES's _rank_eval API.

Search teams regression-test ranking with judged query sets; ES ships
precision@k / recall@k / MRR / (N)DCG as the `_rank_eval` metrics.
Implemented over the engine's standard result contract
(query_id, rank, doc_id, ...) as pure DataFrame ops — at scale the
evaluation joins are tiny (k rows per query vs the judgment list) and
fully parallel per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rank_eval(
    results: DataFrame, judgments: DataFrame, k: int = 10
) -> DataFrame:
    """-> per query: (query_id, n_rel, hits, precision, recall, mrr,
    ndcg) — binary relevance, all rounded 4dp.

    `results` = (query_id, rank, doc_id, ...) top-k lists;
    `judgments` = (query_id, doc_id) relevant pairs.
    Queries with no relevant docs score 0 on every metric (ES reports
    them as unrated; 0 keeps the output total and hash-stable).
    DCG uses the binary form sum 1/log2(rank+1); IDCG places the
    min(n_rel, k) relevant docs at the top ranks.
    """
    judgments = judgments.select("query_id", "doc_id").distinct()
    per_q = results.select("query_id").distinct()
    nrel = (
        judgments.groupBy("query_id")
        .agg(F.countDistinct("doc_id").cast("long").alias("n_rel"))
    )
    hits = (
        results.join(judgments, ["query_id", "doc_id"])
        .groupBy("query_id")
        .agg(
            F.count("*").cast("long").alias("hits"),
            F.min("rank").alias("first_rank"),
            F.sum(1.0 / F.log2(F.col("rank") + 1.0)).alias("dcg"),
        )
    )
    idcg = F.aggregate(
        F.sequence(F.lit(1), F.least(F.col("n_rel"), F.lit(k)).cast("int")),
        F.lit(0.0),
        lambda acc, i: acc + 1.0 / F.log2(i.cast("double") + 1.0),
    )
    out = (
        per_q.join(nrel, "query_id", "left")
        .join(hits, "query_id", "left")
        .withColumn("n_rel", F.coalesce("n_rel", F.lit(0)))
        .withColumn("hits", F.coalesce("hits", F.lit(0)))
        .withColumn(
            "idcg",
            F.when(F.col("n_rel") > 0, idcg).otherwise(F.lit(0.0)),
        )
    )
    return out.select(
        "query_id",
        "n_rel",
        "hits",
        F.round(F.col("hits") / F.lit(float(k)), 4).alias("precision"),
        F.round(
            F.when(
                F.col("n_rel") > 0, F.col("hits") / F.col("n_rel")
            ).otherwise(F.lit(0.0)),
            4,
        ).alias("recall"),
        F.round(
            F.when(
                F.col("first_rank").isNotNull(), 1.0 / F.col("first_rank")
            ).otherwise(F.lit(0.0)),
            4,
        ).alias("mrr"),
        F.round(
            F.when(
                F.col("idcg") > 0,
                F.coalesce("dcg", F.lit(0.0)) / F.col("idcg"),
            ).otherwise(F.lit(0.0)),
            4,
        ).alias("ndcg"),
    )
