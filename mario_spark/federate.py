"""Federated (multi-index) search — ES's `index1,index2/_search`.

ES fans a query out to every shard of every targeted index, each shard
returns a local top-k, and the coordinating node merges by score. The
subtlety is WHICH statistics score the shards:

- query_then_fetch (ES default): every shard scores with its OWN
  df/docCount — scores across indexes are not strictly comparable (the
  well-known relevance quirk on skewed multi-index layouts).
- dfs_query_then_fetch: a pre-phase gathers GLOBAL term/collection
  statistics, distributes them to the shards, and only then does each
  shard compute its local top-k — merged ranking equals what ONE
  combined index would produce.

Both modes map exactly onto this engine: an Index is the shard, its
dictionary is the term-stats source, and search_wand already takes
(dictionary, n_docs, avgdl) as INPUTS — so dfs mode is just "call every
index with the merged dictionary and summed collection stats". The
merge is a per-query rank over |indexes| x k rows — coordinator-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mario_spark.wand import search_wand


def search_indexes(
    catalog,
    names: list[str],
    query_terms: DataFrame,
    k: int = 10,
    mode: str = "dfs_query_then_fetch",
    filter_terms: list[str] | None = None,
    indices_boost: dict[str, float] | None = None,
) -> DataFrame:
    """-> (query_id, rank, index, doc_id, score) across `names`.

    mode="dfs_query_then_fetch": global df (summed dictionaries) +
    global n_docs/avgdl score every index — rank-identical to a single
    combined index (tested). mode="query_then_fetch": per-index stats,
    ES's default trade-off.

    indices_boost = ES's `indices_boost` search option: each index's
    hit scores multiply by its boost BEFORE the coordinator merge, so a
    preferred index (the fresh crawl, say) outranks equal-relevance
    hits from the others. Applied coordinator-side on the |indexes| x k
    candidate rows — zero extra distributed work.
    """
    if mode not in ("dfs_query_then_fetch", "query_then_fetch"):
        raise ValueError(f"unknown mode {mode!r}")
    idxs = [(n, catalog.open(n)) for n in names]
    return _search_opened(idxs, query_terms, k, mode, filter_terms,
                          indices_boost)


def search_clusters(
    targets: list[tuple[object, str]],
    query_terms: DataFrame,
    k: int = 10,
    mode: str = "dfs_query_then_fetch",
) -> DataFrame:
    """Cross-cluster search (ES `remote:index` targets): identical
    merge to search_indexes but the targets span CATALOGS — separate
    roots standing in for separate clusters. `targets` =
    [(catalog, index_name)]; result index labels are
    "<root-basename>:<name>" so hits are attributable to their
    cluster, like ES's `_index` with the remote prefix."""
    import os

    if mode not in ("dfs_query_then_fetch", "query_then_fetch"):
        raise ValueError(f"unknown mode {mode!r}")
    idxs = [
        (f"{os.path.basename(cat.root)}:{n}", cat.open(n))
        for cat, n in targets
    ]
    return _search_opened(idxs, query_terms, k, mode)


def _search_opened(
    idxs,
    query_terms: DataFrame,
    k: int,
    mode: str,
    filter_terms: list[str] | None = None,
    indices_boost: dict[str, float] | None = None,
) -> DataFrame:
    # empty members (fresh rollover targets) contribute nothing —
    # exactly an empty ES index in a multi-index search
    idxs = [
        (n, idx) for n, idx in idxs if idx.paths.committed_segments()
    ]
    if not idxs:
        spark = query_terms.sparkSession
        return spark.createDataFrame(
            [],
            "query_id long, rank long, index string, doc_id long, score double",
        )
    if mode == "dfs_query_then_fetch":
        merged_dic = None
        tot_docs, tot_len = 0, 0.0
        for _, idx in idxs:
            d = idx.dictionary()
            merged_dic = d if merged_dic is None else merged_dic.unionByName(d)
            st = idx.stats()
            tot_docs += st["n_docs"]
            tot_len += st["avgdl"] * st["n_docs"]
        merged_dic = merged_dic.groupBy("term").agg(
            F.sum("df").cast("long").alias("df")
        )
        g_n, g_avgdl = tot_docs, (tot_len / tot_docs if tot_docs else 0.0)
    parts = []
    for name, idx in idxs:
        if mode == "dfs_query_then_fetch":
            dic, n_docs, avgdl = merged_dic, g_n, g_avgdl
        else:
            st = idx.stats()
            dic, n_docs, avgdl = idx.dictionary(), st["n_docs"], st["avgdl"]
        local = search_wand(
            idx.postings(), dic, query_terms, n_docs, avgdl, k=k,
            deleted_docs=idx.deleted_ids(), filter_terms=filter_terms,
        )
        boost = float((indices_boost or {}).get(name, 1.0))
        parts.append(
            local.select(
                "query_id",
                F.lit(name).alias("index"),
                "doc_id",
                F.round(F.col("score") * F.lit(boost), 4).alias("score"),
            )
        )
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("index"), F.asc("doc_id")
    )
    return (
        allp.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "index", "doc_id", "score")
    )
