"""Block-max WAND top-k over the compressed postings (B7).

Re-implements, from scratch, the query evaluation mario delegates to
OpenSearch/Lucene (block-max WAND is the Lucene 8 default top-k path;
mario's search contract is the mapping file — see SURVEY §3.3).

Distributed shape = exactly the reference engine's: the index is
document-partitioned (postings.dbucket == an ES shard); each task runs
block-max-pruned scoring over ONE (query, dbucket) slice and emits a
local top-k; the global answer is TakeOrderedAndProject over the tiny
per-bucket candidates. No stage ever materializes a full posting list.

Pruning kernel (sound, fully vectorized — no per-doc Python loop):
 1. Bootstrap a threshold θ: exactly score the candidate docs of the
    rarest (highest-idf) query term only; θ = its k-th best total upper
    bound... conservatively, the k-th best *exact partial* score. Any
    later-dropped doc provably scores < θ.
 2. Block pruning: drop block B of term t iff
       max_score(B) + Σ_{t'≠t} max_score_bucket(t')  <  θ - ε.
    Every doc in a dropped block has total score below θ, hence below
    the true k-th score, so it cannot enter the top-k; docs that keep
    at least one live block may get an underestimated score, but that
    score stays < θ, so they cannot displace a true top-k doc either.
 3. Exact vectorized BM25 (numpy bincount-style groupby) over surviving
    blocks; local top-k.
Tests assert rank identity (ids AND scores) vs the exhaustive scorer
for every query in the fixed query set.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mario_spark import codec
from mario_spark.postings import idf as _idf
from mario_spark.query import B, K1, SCORE_DECIMALS

_EPS = 1e-9


def _score_bucket(
    pdf: pd.DataFrame, n_docs: float, avgdl: float, k: int, k1: float, b: float
) -> pd.DataFrame:
    """Block-max-pruned exact BM25 for one (query_id, dbucket) slice."""
    query_id = int(pdf["query_id"].iloc[0])

    # Per-term bucket-level upper bounds.
    per_term_max = pdf.groupby("term")["max_score"].max()
    total_ub = float(per_term_max.sum())

    # 1. Bootstrap θ from the rarest term (min df => max idf).
    rare_term = pdf.loc[pdf["df"].idxmin(), "term"]
    theta = -np.inf
    rare_rows = pdf[pdf["term"] == rare_term]
    r_df = float(rare_rows["df"].iloc[0])
    r_idf = _idf(n_docs, r_df)
    ids_l, sc_l = [], []
    for r in rare_rows.itertuples(index=False):
        ids = codec.decode_doc_ids(r.doc_ids)
        tfs = codec.vbyte_decode(r.tfs).astype(np.float64)
        lens = codec.vbyte_decode(r.lens).astype(np.float64)
        ids_l.append(ids)
        sc_l.append(r_idf * tfs * (k1 + 1.0) / (tfs + k1 * (1.0 - b + b * lens / avgdl)))
    if ids_l:
        boot = np.concatenate(sc_l)
        if boot.size >= k:
            theta = float(np.partition(boot, boot.size - k)[boot.size - k])

    # 2. Prune blocks that cannot reach θ.
    ub_other = total_ub - pdf["term"].map(per_term_max).to_numpy()
    live = (pdf["max_score"].to_numpy() + ub_other) >= (theta - _EPS)
    pdf = pdf[live]
    if pdf.empty:
        return pd.DataFrame({"query_id": [], "doc_id": [], "score": []}).astype(
            {"query_id": "int64", "doc_id": "int64", "score": "float64"}
        )

    # 3. Exact scoring of surviving blocks, vectorized groupby-sum.
    all_ids, all_contrib = [], []
    for term, grp in pdf.groupby("term", sort=False):
        t_idf = _idf(n_docs, float(grp["df"].iloc[0]))
        for r in grp.itertuples(index=False):
            ids = codec.decode_doc_ids(r.doc_ids)
            tfs = codec.vbyte_decode(r.tfs).astype(np.float64)
            lens = codec.vbyte_decode(r.lens).astype(np.float64)
            all_ids.append(ids)
            all_contrib.append(
                t_idf * tfs * (k1 + 1.0) / (tfs + k1 * (1.0 - b + b * lens / avgdl))
            )
    ids = np.concatenate(all_ids)
    contrib = np.concatenate(all_contrib)
    uniq, inv = np.unique(ids, return_inverse=True)
    totals = np.bincount(inv, weights=contrib)

    # Local top-k (score desc, doc_id asc) — keep only what can matter globally.
    if uniq.size > k:
        order = np.lexsort((uniq, -totals))[:k]
    else:
        order = np.lexsort((uniq, -totals))
    return pd.DataFrame(
        {
            "query_id": np.full(order.size, query_id, dtype=np.int64),
            "doc_id": uniq[order].astype(np.int64),
            "score": totals[order],
        }
    )


def search_wand(
    postings: DataFrame,
    query_terms: DataFrame,
    n_docs: int,
    avgdl: float,
    k: int = 10,
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """postings x (query_id, term) -> (query_id, rank, doc_id, score).

    Plan: filter postings to queried terms (pushed to the scan; at scale
    the postings table is laid out so `term` predicates prune files),
    broadcast-join the tiny query-term table, group by (query_id,
    dbucket) -> pruned scoring kernel -> per-query rank window over the
    small candidate union.
    """
    terms = [r["term"] for r in query_terms.select("term").distinct().collect()]
    cand = postings.filter(F.col("term").isin(terms)).join(
        F.broadcast(query_terms), "term"
    )
    nd, ad = float(n_docs), float(avgdl)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        return _score_bucket(pdf, nd, ad, k, k1, b)

    local = cand.groupBy("query_id", "dbucket").applyInPandas(
        kernel, "query_id long, doc_id long, score double"
    )
    s = local.withColumn("score", F.round("score", SCORE_DECIMALS))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        s.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )
