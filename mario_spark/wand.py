"""Block-max WAND top-k over the compressed postings (B7).

Re-implements, from scratch, the query evaluation mario delegates to
OpenSearch/Lucene (block-max WAND is the Lucene 8 default top-k path;
mario's search contract is the mapping file — see SURVEY §3.3).

Distributed shape = exactly the reference engine's: the index is
document-partitioned (postings.dbucket == an ES shard); each task runs
block-max-pruned scoring over ONE dbucket for the WHOLE query batch and
emits local top-k per query; the global answer is a tiny per-query rank
over the union of bucket candidates. No stage ever materializes a full
posting list, and posting blocks are shipped to exactly one task each
(the query set travels in the task closure, never joined against the
postings — a postings x queries join would replicate head-term blocks
once per query).

Per-bucket kernel (sound pruning, fully vectorized):
 1. Each term's blocks are decoded AT MOST once per task and shared by
    every query that contains the term; per-(term,doc) BM25 contribs
    are likewise computed once.
 2. Bootstrap a threshold θ_q per query: exact partial scores of the
    query's rarest (max-idf) term; θ_q = k-th best partial. The true
    k-th best total is >= θ_q.
 3. Block pruning: drop block B of term t for query q iff
       max_score(B) + Σ_{t'∈q, t'≠t} max_score_bucket(t') < θ_q - ε.
    Every doc of a dropped block totals < θ_q <= true k-th score, so it
    cannot enter the top-k; a doc with some blocks dropped can only be
    underestimated, and its bound keeps it below θ_q, so it cannot
    displace a true top-k doc either. Tests assert rank identity
    (ids AND scores) vs the exhaustive scorer.
 4. Exact vectorized scoring (np.unique + bincount groupby) over the
    surviving blocks; local top-k (score desc, doc_id asc).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mario_spark import codec
from mario_spark.postings import block_upper_bound
from mario_spark.postings import idf as _idf
from mario_spark.query import B, K1, SCORE_DECIMALS

_EPS = 1e-9


class _TermData:
    """Decoded postings of one term within one dbucket."""

    __slots__ = ("ids", "contrib", "block_max", "block_lens")

    def __init__(self, rows: pd.DataFrame, t_idf: float, avgdl: float, k1: float, b: float):
        ids_l, tf_l, ln_l = [], [], []
        for r in rows.itertuples(index=False):
            ids_l.append(codec.decode_doc_ids(r.doc_ids))
            tf_l.append(codec.vbyte_decode(r.tfs))
            ln_l.append(codec.vbyte_decode(r.lens))
        ids = np.concatenate(ids_l)
        tfs = np.concatenate(tf_l).astype(np.float64)
        lens = np.concatenate(ln_l).astype(np.float64)
        self.ids = ids
        self.contrib = (
            t_idf * tfs * (k1 + 1.0) / (tfs + k1 * (1.0 - b + b * lens / avgdl))
        )
        # block-max bound from stored impacts + CURRENT collection stats
        self.block_max = block_upper_bound(
            t_idf,
            rows["max_tf"].to_numpy(),
            rows["min_len"].to_numpy(),
            avgdl,
            k1,
            b,
        )
        self.block_lens = rows["n"].to_numpy(np.int64)


def _conjunctive_scores(
    tds: list["_TermData"],
) -> tuple[np.ndarray, np.ndarray]:
    """AND semantics: docs present in EVERY term's postings, scored.

    Classic rarest-first sorted-list intersection (doc ids are sorted
    within a bucket), then per-term contrib lookup via searchsorted.
    """
    tds = sorted(tds, key=lambda t: t.ids.size)
    ids = tds[0].ids
    for td in tds[1:]:
        ids = ids[np.isin(ids, td.ids, assume_unique=True)]
        if ids.size == 0:
            return ids, np.empty(0)
    total = np.zeros(ids.size)
    for td in tds:
        pos = np.searchsorted(td.ids, ids)
        total += td.contrib[pos]
    return ids, total


def _bucket_kernel(
    pdf: pd.DataFrame,
    queries: list[tuple[int, list[str]]],
    idf_map: dict[str, float],
    avgdl: float,
    k: int,
    k1: float,
    b: float,
    conjunctive: bool = False,
) -> pd.DataFrame:
    """Score every query against one dbucket's candidate blocks."""
    by_term: dict[str, pd.DataFrame] = {
        t: g.sort_values("block_id") for t, g in pdf.groupby("term", sort=False)
    }
    cache: dict[str, _TermData] = {}

    def term_data(t: str) -> _TermData:
        if t not in cache:
            cache[t] = _TermData(by_term[t], idf_map[t], avgdl, k1, b)
        return cache[t]

    bucket_max = {
        t: float(
            block_upper_bound(
                idf_map[t],
                g["max_tf"].to_numpy(),
                g["min_len"].to_numpy(),
                avgdl,
                k1,
                b,
            ).max()
        )
        for t, g in by_term.items()
    }

    out_q, out_d, out_s = [], [], []
    for qid, qterms in queries:
        terms = [t for t in qterms if t in by_term]
        if not terms:
            continue
        if conjunctive:
            # a doc needs EVERY term; all its postings live in this
            # bucket, so a term absent here rules out the whole bucket
            if len(terms) < len(qterms):
                continue
            ids, totals = _conjunctive_scores([term_data(t) for t in terms])
            if ids.size == 0:
                continue
            order = np.lexsort((ids, -totals))[:k]
            out_q.append(np.full(order.size, qid, dtype=np.int64))
            out_d.append(ids[order].astype(np.int64))
            out_s.append(totals[order])
            continue
        # 2. bootstrap θ from the rarest term present in this bucket
        # (max idf == min df, so pick by idf)
        rare = max(terms, key=lambda t: idf_map[t])
        boot = term_data(rare).contrib
        theta = (
            float(np.partition(boot, boot.size - k)[boot.size - k])
            if boot.size >= k
            else -np.inf
        )
        total_ub = sum(bucket_max[t] for t in terms)
        ids_parts, contrib_parts = [], []
        for t in terms:
            td = term_data(t)
            ub_other = total_ub - bucket_max[t]
            live = (td.block_max + ub_other) >= (theta - _EPS)
            if live.all():
                ids_parts.append(td.ids)
                contrib_parts.append(td.contrib)
            elif live.any():
                m = np.repeat(live, td.block_lens)
                ids_parts.append(td.ids[m])
                contrib_parts.append(td.contrib[m])
        if not ids_parts:
            continue
        ids = np.concatenate(ids_parts)
        contrib = np.concatenate(contrib_parts)
        uniq, inv = np.unique(ids, return_inverse=True)
        totals = np.bincount(inv, weights=contrib)
        order = np.lexsort((uniq, -totals))[:k]
        out_q.append(np.full(order.size, qid, dtype=np.int64))
        out_d.append(uniq[order].astype(np.int64))
        out_s.append(totals[order])
    if not out_q:
        return pd.DataFrame(
            {"query_id": [], "doc_id": [], "score": []}
        ).astype({"query_id": "int64", "doc_id": "int64", "score": "float64"})
    return pd.DataFrame(
        {
            "query_id": np.concatenate(out_q),
            "doc_id": np.concatenate(out_d),
            "score": np.concatenate(out_s),
        }
    )


def search_wand(
    postings: DataFrame,
    dictionary: DataFrame,
    query_terms: DataFrame,
    n_docs: int,
    avgdl: float,
    k: int = 10,
    k1: float = K1,
    b: float = B,
    conjunctive: bool = False,
) -> DataFrame:
    """postings x (query_id, term) -> (query_id, rank, doc_id, score).

    conjunctive=True = ES bool-must: rarest-first sorted intersection
    per bucket (and whole-bucket skip when any term is absent there).

    Plan: collect the tiny query-term table driver-side (it IS the
    query), filter postings to queried terms (predicate pushed into the
    scan — at scale the postings layout prunes whole files by term),
    group by dbucket -> batch scoring kernel -> per-query rank window
    over the small candidate union.
    """
    qrows = query_terms.collect()
    qmap: dict[int, list[str]] = {}
    for r in qrows:
        qmap.setdefault(int(r["query_id"]), []).append(r["term"])
    queries = sorted(qmap.items())
    terms = sorted({t for _, ts in queries for t in ts})

    # tiny driver-side dictionary lookup for just the queried terms;
    # terms absent from the dictionary (OOV) simply have no postings
    df_rows = dictionary.filter(F.col("term").isin(terms)).collect()
    nd, ad = float(n_docs), float(avgdl)
    idf_map = {r["term"]: _idf(nd, float(r["df"])) for r in df_rows}

    cand = postings.filter(F.col("term").isin(terms))

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        return _bucket_kernel(pdf, queries, idf_map, ad, k, k1, b, conjunctive)

    local = cand.groupBy("dbucket").applyInPandas(
        kernel, "query_id long, doc_id long, score double"
    )
    s = local.withColumn("score", F.round("score", SCORE_DECIMALS))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        s.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )
