"""Search-response shaping: ES terms aggregations (facets) and
search_after pagination.

Mario's delegated engine serves both on every query (TIMDEX's UI
facets are ES terms aggs over keyword fields; result paging is
from/size / search_after). Re-expressed Spark-first:

- terms_agg: groupBy(key) partial+final hash agg, then top-`size`
  buckets via orderBy().limit() — plans as TakeOrderedAndProject, never
  a single-partition global window (the repo's documented top-k rule).
- search_after: cursor pagination as a pushable PREDICATE on the total
  order (strictly-after the cursor row), then orderBy().limit(size).
  This is exactly why ES recommends search_after over from+size at
  depth: each page is an independent top-`size` over a shrinking
  predicate, O(size) state, no global offset scan. A from+size deep
  page would need offset+size rows collected; the cursor form stays
  TakeOrderedAndProject at every depth.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def terms_agg(
    df: DataFrame,
    key_col: str,
    size: int = 10,
    metric_col: str | None = None,
    metric_decimals: int = 4,
) -> DataFrame:
    """ES terms aggregation: top-`size` buckets of `key_col` by
    doc_count desc (ties: key asc), with an optional avg metric
    sub-aggregation — (key, doc_count[, avg_metric])."""
    aggs = [F.count("*").cast("long").alias("doc_count")]
    if metric_col is not None:
        aggs.append(
            F.round(F.avg(metric_col), metric_decimals).alias(
                f"avg_{metric_col}"
            )
        )
    g = df.groupBy(F.col(key_col).alias("key")).agg(*aggs)
    return g.orderBy(F.desc("doc_count"), F.asc("key")).limit(size)


def search_after(
    df: DataFrame,
    sort_col: str,
    size: int,
    cursor: tuple | None = None,
    tiebreak_col: str = "doc_id",
    ascending: bool = False,
) -> DataFrame:
    """One page of (sort_col desc|asc, tiebreak asc) with an ES
    search_after cursor = (sort_value, tiebreak_value) of the previous
    page's last row; None = first page. The cursor predicate is a plain
    comparison — it pushes into the scan, so deep pages don't rescan
    already-returned rows' columns."""
    s, t = F.col(sort_col), F.col(tiebreak_col)
    if cursor is not None:
        cs, ct = cursor
        after: Column = (s < cs) if not ascending else (s > cs)
        df = df.filter(after | ((s == cs) & (t > ct)))
    order = [s.asc() if ascending else s.desc(), t.asc()]
    return df.orderBy(*order).limit(size)


def paginate(
    df: DataFrame,
    sort_col: str,
    size: int,
    n_pages: int,
    tiebreak_col: str = "doc_id",
    ascending: bool = False,
) -> list[DataFrame]:
    """Materialize `n_pages` consecutive search_after pages (each page's
    last row becomes the next cursor — one tiny collect per page, the
    coordinating-node handoff ES does between page requests)."""
    pages: list[DataFrame] = []
    cursor: tuple | None = None
    for _ in range(n_pages):
        page = search_after(
            df, sort_col, size, cursor, tiebreak_col, ascending
        )
        pages.append(page)
        tail = page.collect()
        if len(tail) < size:
            break
        last = tail[-1]
        cursor = (last[sort_col], last[tiebreak_col])
    return pages
