"""ES parent/child join-field queries (has_child / has_parent).

ES models a parent/child relation inside one index with a `join` field
type; `has_child` returns PARENT docs having >=min_children matching
children (child scores folded into the parent per score_mode), and
`has_parent` returns CHILD docs whose parent matches an inner query.
Lucene executes these with a per-shard ordinal join (parents and
children are routed to the same shard — the join never crosses shards).

The Spark-first expression is the same locality argument made explicit:

- has_child = filter children -> ONE hash agg keyed by the parent key
  (map-side partial combine, shuffle carries (key, count, partial
  score) only — never child payloads) -> join the reduced per-parent
  table to the parent side. The aggregated side is bounded by the
  number of MATCHING parents, so at 100 TB it is usually the small,
  broadcastable side; we leave the join strategy to AQE because that
  bound is data-dependent.
- has_parent = filter the parent dim -> broadcast -> inner join to the
  children. Parents are dimension-sized relative to children by
  construction (ES requires parent cardinality << child cardinality for
  the feature to make sense), so the broadcast is forced explicitly.

Reference tie-in: mario's record model is single-level (nested objects,
record.go:39-134) and delegates any cross-doc relation to the search
tier; this module is that delegated capability, re-expressed as
Catalyst joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column


def has_child(
    parents: DataFrame,
    children: DataFrame,
    parent_key: str,
    child_fk: str,
    child_pred: Column,
    score_col: Column,
    score_mode: str = "sum",
    min_children: int = 1,
    k: int = 10,
) -> DataFrame:
    """Top-k parents by folded child score.

    Args mirror the ES has_child body: `child_pred` is the inner query,
    `score_col` the per-child score expression, `score_mode` one of
    sum/max/min/avg/none (ES semantics: none scores every parent 0 and
    ranking falls back to the parent key), `min_children` the matching-
    children floor. Output: parent key, n_children, score, rank.
    """
    agg = {
        "sum": F.sum(score_col),
        "max": F.max(score_col),
        "min": F.min(score_col),
        "avg": F.avg(score_col),
        "none": F.lit(0.0),
    }[score_mode]
    per_parent = (
        children.filter(child_pred)
        .groupBy(F.col(child_fk).alias("_pk"))
        .agg(
            F.count("*").cast("long").alias("n_children"),
            F.round(agg.cast("double"), 2).alias("score"),
        )
        .filter(F.col("n_children") >= min_children)
    )
    joined = parents.join(
        per_parent, parents[parent_key] == per_parent["_pk"]
    ).drop("_pk")
    # TakeOrderedAndProject, never a global sort.
    from pyspark.sql.window import Window

    top = joined.orderBy(
        F.desc("score"), F.asc(parent_key)
    ).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc(parent_key))
    return top.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).select("rank", parent_key, "n_children", "score")


def has_parent(
    parents: DataFrame,
    children: DataFrame,
    parent_key: str,
    child_fk: str,
    parent_pred: Column,
    parent_fields: list[str] | None = None,
) -> DataFrame:
    """Children whose parent matches `parent_pred`, with selected parent
    fields propagated onto each child row (ES returns the child hit;
    `parent_fields` plays the role of inner_hits on the parent side).
    The filtered parent side is broadcast — it is the dimension."""
    p = parents.filter(parent_pred).select(
        F.col(parent_key).alias("_pk"), *(parent_fields or [])
    )
    return children.join(
        F.broadcast(p), children[child_fk] == p["_pk"]
    ).drop("_pk")


def children_agg(
    parents: DataFrame,
    children: DataFrame,
    parent_key: str,
    child_fk: str,
    bucket_col: str,
    metric_col: str,
) -> DataFrame:
    """ES `children` aggregation: a terms bucket on a PARENT field whose
    sub-aggregations run over each bucket's CHILD documents (the
    inverse direction of has_child — buckets come from parents, metrics
    from children).

    Spark-first shape: project the parent dim to (key, bucket) only,
    join it onto the children (the projected dim is small — AQE
    broadcasts it; forcing broadcast here would be wrong for genuinely
    large parent tables), then ONE hash agg by bucket. The shuffle
    carries (bucket, partial count, partial sum) — map-side combine
    reduces each task to O(#buckets) rows regardless of child count.
    """
    dim = parents.select(
        F.col(parent_key).alias("_pk"), F.col(bucket_col).alias("bucket")
    )
    joined = children.join(dim, children[child_fk] == dim["_pk"])
    return (
        joined.groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("doc_count"),
            F.round(F.sum(metric_col), 4).alias("sum_metric"),
        )
    )
