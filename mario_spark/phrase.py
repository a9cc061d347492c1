"""Phrase queries (ES match_phrase) over positional postings.

Lucene text fields answer match_phrase out of the box; mario's mapping
(every `"type":"text"` field in
/root/reference/config/es_record_mappings.json) therefore contractually
exposes it. Round 1's block format stored no positions; this module
pairs with postings.POSTINGS_POS_SCHEMA (the parallel `poss` VByte
stream — Lucene's .pos file analogue) to answer phrases exactly.

Semantics (Lucene PhraseQuery, slop=0):
- A doc matches iff the terms occur at consecutive positions in order.
- phrase_tf = number of distinct start positions of the phrase.
- score = (Σ_t idf(t)) * tf_sat(phrase_tf, doc_len) — the phrase is
  scored as one pseudo-term whose idf is the sum of member idfs and
  whose tf is the phrase frequency, exactly Lucene's PhraseWeight.

Distributed shape = search_wand's: document-partitioned postings,
per-dbucket batch kernel (a phrase's candidate docs need ALL member
terms in the same dbucket — postings of one doc never straddle
buckets), tiny per-query rank over bucket-local top-k. The postings
scan is pruned to the phrase's terms (pushed filter), and the position
intersection runs only over docs that survive the doc-id intersection
of every member term — the classic prox-evaluation order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mario_spark import codec
from mario_spark.analyze import tokenize_positions_udf
from mario_spark.docs import assign_doc_ids
from mario_spark.postings import decode_block_positions
from mario_spark.postings import idf as _idf
from mario_spark.query import B, K1, SCORE_DECIMALS


def positional_tf(documents: DataFrame) -> DataFrame:
    """documents(doc_id, text) -> (doc_id, term, tf, len, positions).

    One fused pandas-UDF pass; the map explode is JVM-side (no extra
    shuffle), mirroring docs.build_doc_table/query.term_frequencies.
    """
    d = documents
    if "doc_id" not in d.columns:
        d = assign_doc_ids(d)
    base = d.select(
        "doc_id", tokenize_positions_udf("text").alias("pm")
    ).withColumn(
        "len",
        F.aggregate(
            F.map_values("pm"),
            F.lit(0).cast("long"),
            lambda acc, x: acc + F.size(x).cast("long"),
        ),
    )
    return base.select(
        "doc_id", "len", F.explode("pm").alias("term", "positions")
    ).select(
        "doc_id",
        "term",
        F.size("positions").cast("double").alias("tf"),
        "len",
        "positions",
    )


class _PosTermData:
    """Fully decoded positional postings of one term in one dbucket."""

    __slots__ = ("ids", "lens", "pos_flat", "pos_starts")

    def __init__(self, rows: pd.DataFrame):
        ids_l, lens_l, pflat_l = [], [], []
        counts_l = []
        for r in rows.itertuples(index=False):
            tfs = codec.vbyte_decode(r.tfs).astype(np.int64)
            ids_l.append(codec.decode_doc_ids(r.doc_ids))
            lens_l.append(codec.vbyte_decode(r.lens).astype(np.float64))
            flat, _ = decode_block_positions(r.poss, tfs)
            pflat_l.append(flat)
            counts_l.append(tfs)
        self.ids = np.concatenate(ids_l)
        self.lens = np.concatenate(lens_l)
        self.pos_flat = np.concatenate(pflat_l)
        counts = np.concatenate(counts_l)
        self.pos_starts = np.concatenate(([0], np.cumsum(counts)))

    def positions_of(self, row_idx: int) -> np.ndarray:
        return self.pos_flat[
            self.pos_starts[row_idx] : self.pos_starts[row_idx + 1]
        ]


def _chain_match_count(
    term_pos: list[np.ndarray], n_terms: int, slop: int
) -> int:
    """Ordered-proximity matches: count start positions p0 of term 0
    from which a strictly-increasing chain p0 < p1 < ... < p_{n-1}
    (p_j a position of term j) exists with total displacement
    (p_{n-1} - p0) - (n-1) <= slop.

    Greedy minimal successors are optimal: picking the SMALLEST valid
    p_j at each step minimizes p_{n-1}, so a start matches iff the
    greedy chain satisfies the window. slop=0 reduces exactly to
    consecutive-positions phrase matching. Vectorized over all starts.
    """
    p0 = term_pos[0]
    cur = p0.astype(np.int64)
    alive = np.ones(cur.size, dtype=bool)
    for j in range(1, n_terms):
        pj = term_pos[j]
        idx = np.searchsorted(pj, cur + 1)
        ok = idx < pj.size
        alive &= ok
        cur = np.where(ok, pj[np.minimum(idx, pj.size - 1)], cur)
    win = (cur - p0 - (n_terms - 1)) <= slop
    return int(np.count_nonzero(alive & win))


def _collect_deleted(deleted_docs) -> np.ndarray | None:
    """DataFrame of tombstoned doc_ids -> sorted unique np array (or
    None); rides in the task closure like the WAND kernel's set."""
    if deleted_docs is None:
        return None
    arr = np.array(
        [r["doc_id"] for r in deleted_docs.select("doc_id").collect()],
        dtype=np.int64,
    )
    return np.unique(arr) if arr.size else None


def _phrase_kernel(
    pdf: pd.DataFrame,
    queries: list[tuple[int, list[str]]],
    idf_map: dict[str, float],
    avgdl: float,
    k: int,
    k1: float,
    b: float,
    slop: int = 0,
    deleted: np.ndarray | None = None,
) -> pd.DataFrame:
    """Score every phrase query against one dbucket. `deleted` =
    global tombstone set (sorted unique) — masked out of the candidate
    intersection BEFORE local top-k, so a tombstoned doc is replaced by
    the next-best, never just dropped from the page."""
    tds: dict[str, _PosTermData] = {
        t: _PosTermData(g.sort_values("block_id"))
        for t, g in pdf.groupby("term", sort=False)
    }
    out_q, out_d, out_s = [], [], []
    for qid, qterms in queries:
        if any(t not in tds for t in qterms):
            continue  # phrase needs every term; none of it is in here
        term_tds = [tds[t] for t in qterms]
        # doc-id intersection, rarest member first
        order = np.argsort([td.ids.size for td in term_tds])
        cand = term_tds[order[0]].ids
        for oi in order[1:]:
            cand = cand[np.isin(cand, term_tds[oi].ids, assume_unique=True)]
            if cand.size == 0:
                break
        if cand.size == 0:
            continue
        if deleted is not None and cand.size:
            cand = cand[~np.isin(cand, deleted, assume_unique=True)]
            if cand.size == 0:
                continue
        sum_idf = sum(idf_map[t] for t in qterms)
        rows_per_term = [
            np.searchsorted(td.ids, cand) for td in term_tds
        ]
        doc_out, ptf_out, len_out = [], [], []
        n_terms = len(term_tds)
        for ci in range(cand.size):
            term_pos = [
                td.positions_of(int(rows_per_term[j][ci]))
                for j, td in enumerate(term_tds)
            ]
            ptf = _chain_match_count(term_pos, n_terms, slop)
            if ptf:
                doc_out.append(int(cand[ci]))
                ptf_out.append(ptf)
                len_out.append(
                    float(term_tds[0].lens[int(rows_per_term[0][ci])])
                )
        if not doc_out:
            continue
        ids = np.asarray(doc_out, dtype=np.int64)
        ptf = np.asarray(ptf_out, dtype=np.float64)
        dl = np.asarray(len_out, dtype=np.float64)
        scores = (
            sum_idf * ptf * (k1 + 1.0)
            / (ptf + k1 * (1.0 - b + b * dl / avgdl))
        )
        top = np.lexsort((ids, -scores))[:k]
        out_q.append(np.full(top.size, qid, dtype=np.int64))
        out_d.append(ids[top])
        out_s.append(scores[top])
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


def _phrase_prefix_kernel(
    pdf: pd.DataFrame,
    queries: list[tuple[int, list[str], list[str], float]],
    avgdl: float,
    k: int,
    k1: float,
    b: float,
    deleted: np.ndarray | None = None,
) -> pd.DataFrame:
    """Score match_phrase_prefix queries against one dbucket. Each
    query is (qid, fixed_terms, expansion_terms, sum_idf): a doc
    matches at start p iff the fixed terms occur consecutively from p
    and the NEXT position holds any expansion term (the last-slot
    position set is the sorted union across expansion terms —
    Lucene MultiPhraseQuery's union postings view)."""
    tds: dict[str, _PosTermData] = {
        t: _PosTermData(g.sort_values("block_id"))
        for t, g in pdf.groupby("term", sort=False)
    }
    out_q, out_d, out_s = [], [], []
    for qid, fixed, exps, sum_idf in queries:
        if any(t not in tds for t in fixed):
            continue
        exp_tds = [tds[t] for t in exps if t in tds]
        if not exp_tds:
            continue
        fixed_tds = [tds[t] for t in fixed]
        cand = fixed_tds[0].ids
        for td in fixed_tds[1:]:
            cand = cand[np.isin(cand, td.ids, assume_unique=True)]
            if cand.size == 0:
                break
        if cand.size == 0:
            continue
        exp_union = np.unique(np.concatenate([td.ids for td in exp_tds]))
        cand = cand[np.isin(cand, exp_union, assume_unique=True)]
        if deleted is not None and cand.size:
            cand = cand[~np.isin(cand, deleted, assume_unique=True)]
        if cand.size == 0:
            continue
        rows_fixed = [np.searchsorted(td.ids, cand) for td in fixed_tds]
        n_fixed = len(fixed_tds)
        doc_out, ptf_out, len_out = [], [], []
        for ci in range(cand.size):
            d = int(cand[ci])
            term_pos = [
                td.positions_of(int(rows_fixed[j][ci]))
                for j, td in enumerate(fixed_tds)
            ]
            last = []
            for td in exp_tds:
                i = int(np.searchsorted(td.ids, d))
                if i < td.ids.size and td.ids[i] == d:
                    last.append(td.positions_of(i))
            lp = np.sort(np.concatenate(last)) if last else None
            if lp is None or lp.size == 0:
                continue
            ptf = _chain_match_count(term_pos + [lp], n_fixed + 1, 0)
            if ptf:
                doc_out.append(d)
                ptf_out.append(ptf)
                len_out.append(float(fixed_tds[0].lens[int(rows_fixed[0][ci])]))
        if not doc_out:
            continue
        ids = np.asarray(doc_out, dtype=np.int64)
        ptf = np.asarray(ptf_out, dtype=np.float64)
        dl = np.asarray(len_out, dtype=np.float64)
        scores = (
            sum_idf * ptf * (k1 + 1.0)
            / (ptf + k1 * (1.0 - b + b * dl / avgdl))
        )
        top = np.lexsort((ids, -scores))[:k]
        out_q.append(np.full(top.size, qid, dtype=np.int64))
        out_d.append(ids[top])
        out_s.append(scores[top])
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


def search_phrase_prefix(
    postings: DataFrame,
    dictionary: DataFrame,
    queries: list[tuple[int, list[str], str]],
    n_docs: int,
    avgdl: float,
    k: int = 10,
    k1: float = K1,
    b: float = B,
    max_expansions: int = 50,
) -> DataFrame:
    """ES match_phrase_prefix: `queries` is [(query_id, fixed_terms,
    last_prefix)]. The last position expands to the `max_expansions`
    alphabetically-first dictionary terms with the prefix (ES caps at
    50, selected in term-dictionary order — deterministic on both
    engines); a doc matches where the fixed terms run consecutively
    and the next token is any expansion. Scored as one pseudo-term
    (Lucene MultiPhraseWeight): idf = Σ idf(fixed) + Σ idf(expansions),
    tf = admitting-start count. Expansion is ONE pruned dictionary
    pass; the kernel runs per dbucket like search_phrase."""
    prefixes = sorted({p for _, _, p in queries if p})
    fixed_all = sorted({t for _, ts, _ in queries for t in ts})
    pcond = None
    for p in prefixes:
        c = F.col("term").startswith(p)
        pcond = c if pcond is None else (pcond | c)
    exp_rows = (
        dictionary.filter(pcond).select("term", "df").collect()
        if pcond is not None
        else []
    )
    fixed_rows = dictionary.filter(F.col("term").isin(fixed_all)).collect()
    nd = float(n_docs)
    idf_map = {r["term"]: _idf(nd, float(r["df"])) for r in fixed_rows}
    idf_map.update({r["term"]: _idf(nd, float(r["df"])) for r in exp_rows})
    exp_terms_sorted = sorted({r["term"] for r in exp_rows})
    kq: list[tuple[int, list[str], list[str], float]] = []
    for qid, fixed, prefix in queries:
        if any(t not in idf_map for t in fixed):
            continue  # OOV fixed member -> matches nothing
        exps = [t for t in exp_terms_sorted if t.startswith(prefix)]
        exps = exps[:max_expansions]
        if not exps:
            continue  # no expansion -> matches nothing (ES semantics)
        sum_idf = sum(idf_map[t] for t in fixed) + sum(idf_map[t] for t in exps)
        kq.append((qid, list(fixed), exps, sum_idf))
    needed = sorted(
        {t for _, fx, ex, _ in kq for t in fx}
        | {t for _, fx, ex, _ in kq for t in ex}
    )
    cand = postings.filter(F.col("term").isin(needed))
    ad = float(avgdl)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        return _phrase_prefix_kernel(pdf, kq, ad, k, k1, b)

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


def search_phrase(
    postings: DataFrame,
    dictionary: DataFrame,
    phrase_queries: list[tuple[int, list[str]]],
    n_docs: int,
    avgdl: float,
    k: int = 10,
    k1: float = K1,
    b: float = B,
    slop: int = 0,
    deleted_docs: DataFrame | None = None,
) -> DataFrame:
    """positional postings x phrases -> (query_id, rank, doc_id, score).

    deleted_docs = tombstoned doc ids (Index delete-by-query), applied
    with Lucene live-docs semantics (excluded from results, stats
    stale until compaction).

    `phrase_queries` is [(query_id, [ordered terms])]; terms must be in
    analyzer-output form (use analyze.py_tokenize on raw text). Plan is
    search_wand's: term-pruned scan -> per-dbucket kernel -> per-query
    rank window over the tiny candidate union.

    slop > 0 = ordered proximity (ES span_near in_order=true; NOTE this
    deliberately deviates from match_phrase's sloppy-freq semantics,
    which also admits REORDERED terms once slop >= 2 — order is
    enforced here): terms must appear in query order within a window of
    len(terms) + slop positions; ptf counts the admitting starts.
    """
    terms = sorted({t for _, ts in phrase_queries for t in ts})
    df_rows = dictionary.filter(F.col("term").isin(terms)).collect()
    idf_map = {r["term"]: _idf(float(n_docs), float(r["df"])) for r in df_rows}
    # a phrase containing an OOV term matches nothing — drop it now
    queries = [
        (qid, ts)
        for qid, ts in phrase_queries
        if all(t in idf_map for t in ts)
    ]
    cand = postings.filter(F.col("term").isin(terms))
    ad = float(avgdl)
    deleted = _collect_deleted(deleted_docs)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        return _phrase_kernel(
            pdf, queries, idf_map, ad, k, k1, b, slop, deleted
        )

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


# --------------------------------------------------------- span queries
def _chain_match_spans(
    term_pos: list[np.ndarray], n_terms: int
) -> tuple[np.ndarray, np.ndarray]:
    """Consecutive-position (slop=0) chain matches -> (starts, ends)
    position arrays. Same greedy-minimal argument as _chain_match_count
    specialized to exact phrases: p_j must equal p0 + j."""
    p0 = term_pos[0].astype(np.int64)
    alive = np.ones(p0.size, dtype=bool)
    for j in range(1, n_terms):
        pj = term_pos[j]
        idx = np.searchsorted(pj, p0 + j)
        ok = (idx < pj.size) & (pj[np.minimum(idx, pj.size - 1)] == p0 + j)
        alive &= ok
    starts = p0[alive]
    return starts, starts + (n_terms - 1)


def _chain_doc_ptfs(
    tds: dict, qterms: list[str], deleted: np.ndarray | None
) -> tuple[np.ndarray, np.ndarray, np.ndarray, list]:
    """One chain against one dbucket: -> (doc_ids, ptf, len, row_idx
    per term) for candidate docs (doc-id intersection of every member
    term, tombstones masked). ptf is NOT yet filtered to > 0 — span
    composition needs the span positions, so callers that only need
    counts filter themselves."""
    empty = (
        np.array([], dtype=np.int64),
        np.array([], dtype=np.float64),
        np.array([], dtype=np.float64),
        [],
    )
    if any(t not in tds for t in qterms):
        return empty
    term_tds = [tds[t] for t in qterms]
    order = np.argsort([td.ids.size for td in term_tds])
    cand = term_tds[order[0]].ids
    for oi in order[1:]:
        cand = cand[np.isin(cand, term_tds[oi].ids, assume_unique=True)]
        if cand.size == 0:
            return empty
    if deleted is not None:
        cand = cand[~np.isin(cand, deleted, assume_unique=True)]
        if cand.size == 0:
            return empty
    rows_per_term = [np.searchsorted(td.ids, cand) for td in term_tds]
    n_terms = len(term_tds)
    ptf = np.zeros(cand.size, dtype=np.float64)
    lens = np.zeros(cand.size, dtype=np.float64)
    for ci in range(cand.size):
        term_pos = [
            td.positions_of(int(rows_per_term[j][ci]))
            for j, td in enumerate(term_tds)
        ]
        starts, _ = _chain_match_spans(term_pos, n_terms)
        ptf[ci] = starts.size
        lens[ci] = float(term_tds[0].lens[int(rows_per_term[0][ci])])
    return cand, ptf, lens, rows_per_term


def _score_and_topk(qid, ids, ptf, dl, sum_idf, avgdl, k, k1, b):
    """Shared PhraseWeight scoring tail: saturated pseudo-term tf."""
    keep = ptf > 0
    ids, ptf, dl = ids[keep], ptf[keep], dl[keep]
    if ids.size == 0:
        return None
    scores = (
        sum_idf * ptf * (k1 + 1.0)
        / (ptf + k1 * (1.0 - b + b * dl / avgdl))
    )
    top = np.lexsort((ids, -scores))[:k]
    return (
        np.full(top.size, qid, dtype=np.int64),
        ids[top],
        scores[top],
    )


def search_span_or(
    postings: DataFrame,
    dictionary: DataFrame,
    span_queries: list[tuple[int, list[list[str]]]],
    n_docs: int,
    avgdl: float,
    k: int = 10,
    k1: float = K1,
    b: float = B,
    deleted_docs: DataFrame | None = None,
) -> DataFrame:
    """Lucene SpanOrQuery over positional postings: a doc matches if
    ANY alternative phrase chain occurs; freq = total span count across
    alternatives; weight idf = Σ idf over the DISTINCT present terms of
    ALL alternatives (SpanWeight.buildSimWeight collects every clause's
    terms with df > 0, including clauses whose other member is OOV).

    `span_queries` = [(query_id, [[chain terms], ...])]. Plan shape is
    search_phrase's: term-pruned scan -> per-dbucket kernel -> tiny
    per-query rank window."""
    all_terms = sorted(
        {t for _, chains in span_queries for ch in chains for t in ch}
    )
    df_rows = dictionary.filter(F.col("term").isin(all_terms)).collect()
    idf_map = {r["term"]: _idf(float(n_docs), float(r["df"])) for r in df_rows}
    queries = []
    for qid, chains in span_queries:
        sidf = sum(
            idf_map[t]
            for t in {t for ch in chains for t in ch}
            if t in idf_map
        )
        live = [ch for ch in chains if all(t in idf_map for t in ch)]
        if live and sidf > 0:
            queries.append((qid, live, sidf))
    cand = postings.filter(F.col("term").isin(all_terms))
    ad = float(avgdl)
    deleted = _collect_deleted(deleted_docs)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        tds = {
            t: _PosTermData(g.sort_values("block_id"))
            for t, g in pdf.groupby("term", sort=False)
        }
        out_q, out_d, out_s = [], [], []
        for qid, chains, sidf in queries:
            freq: dict[int, float] = {}
            dlen: dict[int, float] = {}
            for ch in chains:
                ids, ptf, lens, _ = _chain_doc_ptfs(tds, ch, deleted)
                for i in range(ids.size):
                    if ptf[i] > 0:
                        d = int(ids[i])
                        freq[d] = freq.get(d, 0.0) + float(ptf[i])
                        dlen[d] = float(lens[i])
            if not freq:
                continue
            ids = np.array(sorted(freq), dtype=np.int64)
            ptf = np.array([freq[int(d)] for d in ids], dtype=np.float64)
            dl = np.array([dlen[int(d)] for d in ids], dtype=np.float64)
            r = _score_and_topk(qid, ids, ptf, dl, sidf, ad, k, k1, b)
            if r:
                out_q.append(r[0]); out_d.append(r[1]); out_s.append(r[2])
        if not out_q:
            return pd.DataFrame(
                {"query_id": [], "doc_id": [], "score": []}
            ).astype(
                {"query_id": "int64", "doc_id": "int64", "score": "float64"}
            )
        return pd.DataFrame(
            {
                "query_id": np.concatenate(out_q),
                "doc_id": np.concatenate(out_d),
                "score": np.concatenate(out_s),
            }
        )

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


def search_span_near_unordered(
    postings: DataFrame,
    dictionary: DataFrame,
    pair_queries: list[tuple[int, list[str]]],
    n_docs: int,
    avgdl: float,
    slop: int = 2,
    k: int = 10,
    k1: float = K1,
    b: float = B,
    deleted_docs: DataFrame | None = None,
) -> DataFrame:
    """Lucene span_near in_order=false over a term PAIR: a doc matches
    where the two terms occur within `slop` intervening positions in
    EITHER order — NearSpansUnordered's accounting for two unit-length
    subspans reduces to |pa - pb| - 1 <= slop. freq = count of first-
    term positions with a qualifying partner (the same per-start
    counting convention as the ordered path); scored as PhraseWeight
    (idf = sum of member idfs, saturated pseudo-term tf); an OOV member
    empties the query like match_phrase. Plan shape is search_phrase's:
    term-pruned scan -> per-dbucket kernel -> tiny per-query rank
    window."""
    all_terms = sorted({t for _, ts in pair_queries for t in ts})
    df_rows = dictionary.filter(F.col("term").isin(all_terms)).collect()
    idf_map = {
        r["term"]: _idf(float(n_docs), float(r["df"])) for r in df_rows
    }
    queries = []
    for qid, ts in pair_queries:
        if len(ts) != 2:
            raise ValueError(
                "unordered span_near supports term pairs "
                f"(got {len(ts)} terms for query {qid})"
            )
        if all(t in idf_map for t in ts):
            queries.append(
                (int(qid), ts[0], ts[1], sum(idf_map[t] for t in ts))
            )
    cand = postings.filter(F.col("term").isin(all_terms))
    ad, w = float(avgdl), int(slop) + 1
    deleted = _collect_deleted(deleted_docs)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        tds = {
            t: _PosTermData(g.sort_values("block_id"))
            for t, g in pdf.groupby("term", sort=False)
        }
        out_q, out_d, out_s = [], [], []
        for qid, t0, t1, sidf in queries:
            if t0 not in tds or t1 not in tds:
                continue
            ta, tb = tds[t0], tds[t1]
            ids = ta.ids[np.isin(ta.ids, tb.ids, assume_unique=True)]
            if deleted is not None:
                ids = ids[~np.isin(ids, deleted, assume_unique=True)]
            if ids.size == 0:
                continue
            ra = np.searchsorted(ta.ids, ids)
            rb = np.searchsorted(tb.ids, ids)
            ptf = np.zeros(ids.size, dtype=np.float64)
            dl = np.zeros(ids.size, dtype=np.float64)
            for ci in range(ids.size):
                pa = ta.positions_of(int(ra[ci]))
                pb = tb.positions_of(int(rb[ci]))
                # distinct terms never share a position, so the window
                # [pa - w, pa + w] can't self-match
                lo = np.searchsorted(pb, pa - w, side="left")
                hi = np.searchsorted(pb, pa + w, side="right")
                ptf[ci] = float(np.count_nonzero(hi > lo))
                dl[ci] = float(ta.lens[int(ra[ci])])
            r = _score_and_topk(qid, ids, ptf, dl, sidf, ad, k, k1, b)
            if r:
                out_q.append(r[0]); out_d.append(r[1]); out_s.append(r[2])
        if not out_q:
            return pd.DataFrame(
                {"query_id": [], "doc_id": [], "score": []}
            ).astype(
                {"query_id": "int64", "doc_id": "int64", "score": "float64"}
            )
        return pd.DataFrame(
            {
                "query_id": np.concatenate(out_q),
                "doc_id": np.concatenate(out_d),
                "score": np.concatenate(out_s),
            }
        )

    local = cand.groupBy("dbucket").applyInPandas(
        kernel, "query_id long, doc_id long, score double"
    )
    s = local.withColumn("score", F.round("score", SCORE_DECIMALS))
    w_ = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        s.withColumn("rank", F.row_number().over(w_).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def search_span_not(
    postings: DataFrame,
    dictionary: DataFrame,
    span_queries: list[tuple[int, list[str], str]],
    n_docs: int,
    avgdl: float,
    k: int = 10,
    pre: int = 1,
    post: int = 1,
    k1: float = K1,
    b: float = B,
    deleted_docs: DataFrame | None = None,
) -> DataFrame:
    """Lucene SpanNotQuery over positional postings: matches of the
    include phrase chain whose span, widened by `pre` positions before
    and `post` after, contains NO occurrence of the exclude term.
    freq = surviving span count; weight idf covers the INCLUDE terms
    only (the exclusion is match-time filtering, exactly Lucene).
    An OOV/absent exclude term excludes nothing (pure phrase).

    `span_queries` = [(query_id, [include terms], exclude_term)]."""
    inc_terms = sorted({t for _, ts, _ in span_queries for t in ts})
    exc_terms = sorted({x for _, _, x in span_queries})
    scan_terms = sorted(set(inc_terms) | set(exc_terms))
    df_rows = dictionary.filter(F.col("term").isin(inc_terms)).collect()
    idf_map = {r["term"]: _idf(float(n_docs), float(r["df"])) for r in df_rows}
    queries = [
        (qid, ts, x, sum(idf_map[t] for t in ts))
        for qid, ts, x in span_queries
        if all(t in idf_map for t in ts)
    ]
    cand = postings.filter(F.col("term").isin(scan_terms))
    ad = float(avgdl)
    deleted = _collect_deleted(deleted_docs)
    pre_i, post_i = int(pre), int(post)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        tds = {
            t: _PosTermData(g.sort_values("block_id"))
            for t, g in pdf.groupby("term", sort=False)
        }
        out_q, out_d, out_s = [], [], []
        for qid, qterms, xterm, sidf in queries:
            if any(t not in tds for t in qterms):
                continue
            term_tds = [tds[t] for t in qterms]
            ids_all, _, lens, rows_per_term = _chain_doc_ptfs(
                tds, qterms, deleted
            )
            if ids_all.size == 0:
                continue
            xtd = tds.get(xterm)
            n_terms = len(term_tds)
            ptf = np.zeros(ids_all.size, dtype=np.float64)
            for ci in range(ids_all.size):
                term_pos = [
                    td.positions_of(int(rows_per_term[j][ci]))
                    for j, td in enumerate(term_tds)
                ]
                starts, ends = _chain_match_spans(term_pos, n_terms)
                if starts.size == 0:
                    continue
                if xtd is not None:
                    xi = np.searchsorted(xtd.ids, ids_all[ci])
                    if xi < xtd.ids.size and xtd.ids[xi] == ids_all[ci]:
                        xpos = xtd.positions_of(int(xi))
                        lo = np.searchsorted(xpos, starts - pre_i, "left")
                        hi = np.searchsorted(xpos, ends + post_i, "right")
                        starts = starts[hi == lo]  # no overlap survives
                ptf[ci] = starts.size
            r = _score_and_topk(
                qid, ids_all, ptf, lens, sidf, ad, k, k1, b
            )
            if r:
                out_q.append(r[0]); out_d.append(r[1]); out_s.append(r[2])
        if not out_q:
            return pd.DataFrame(
                {"query_id": [], "doc_id": [], "score": []}
            ).astype(
                {"query_id": "int64", "doc_id": "int64", "score": "float64"}
            )
        return pd.DataFrame(
            {
                "query_id": np.concatenate(out_q),
                "doc_id": np.concatenate(out_d),
                "score": np.concatenate(out_s),
            }
        )

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


def search_span_first(
    postings: DataFrame,
    dictionary: DataFrame,
    span_queries: list[tuple[int, list[str], int]],
    n_docs: int,
    avgdl: float,
    k: int = 10,
    k1: float = K1,
    b: float = B,
    deleted_docs: DataFrame | None = None,
) -> DataFrame:
    """Lucene SpanFirstQuery(SpanNearQuery(chain, slop=0), end) over
    positional postings: a chain match counts only if its span lies
    entirely within the first `end` token positions — i.e. its
    EXCLUSIVE end (0-based start + chain length) is <= `end`. freq =
    qualifying span count; weight idf = Σ idf over the chain terms
    (SpanWeight), scored as one saturated pseudo-term like every
    span/phrase query here ("title-like prominence without a separate
    field" is the classic use).

    `span_queries` = [(query_id, [chain terms], end)]. Plan shape =
    search_phrase's: term-pruned scan -> per-dbucket kernel -> tiny
    per-query rank window.
    """
    all_terms = sorted({t for _, ts, _ in span_queries for t in ts})
    df_rows = dictionary.filter(F.col("term").isin(all_terms)).collect()
    idf_map = {r["term"]: _idf(float(n_docs), float(r["df"])) for r in df_rows}
    queries = [
        (qid, ts, int(end), sum(idf_map[t] for t in ts))
        for qid, ts, end in span_queries
        if all(t in idf_map for t in ts)
    ]
    cand = postings.filter(F.col("term").isin(all_terms))
    ad = float(avgdl)
    deleted = _collect_deleted(deleted_docs)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        tds = {
            t: _PosTermData(g.sort_values("block_id"))
            for t, g in pdf.groupby("term", sort=False)
        }
        out_q, out_d, out_s = [], [], []
        for qid, qterms, end, sidf in queries:
            ids, _, lens, rows_per_term = _chain_doc_ptfs(
                tds, qterms, deleted
            )
            if ids.size == 0:
                continue
            term_tds = [tds[t] for t in qterms]
            n_terms = len(qterms)
            ptf = np.zeros(ids.size, dtype=np.float64)
            for ci in range(ids.size):
                term_pos = [
                    td.positions_of(int(rows_per_term[j][ci]))
                    for j, td in enumerate(term_tds)
                ]
                _, ends = _chain_match_spans(term_pos, n_terms)
                # ends are inclusive last positions; exclusive = +1
                ptf[ci] = float(np.count_nonzero(ends + 1 <= end))
            r = _score_and_topk(qid, ids, ptf, lens, sidf, ad, k, k1, b)
            if r:
                out_q.append(r[0]); out_d.append(r[1]); out_s.append(r[2])
        if not out_q:
            return pd.DataFrame(
                {"query_id": [], "doc_id": [], "score": []}
            ).astype(
                {"query_id": "int64", "doc_id": "int64", "score": "float64"}
            )
        return pd.DataFrame(
            {
                "query_id": np.concatenate(out_q),
                "doc_id": np.concatenate(out_d),
                "score": np.concatenate(out_s),
            }
        )

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


def search_intervals_match(
    docs_pos: DataFrame,
    queries: list[tuple[int, str, str, int]],
    k: int = 10,
) -> DataFrame:
    """ES intervals query — `match` source with ordered:true and
    max_gaps (the two-term form; longer chains nest the same rule):
    doc matches when term1 is followed by term2 with at most max_gaps
    intervening tokens. Returns per (query, doc) the number of valid
    anchor positions (`matches`, ES's interval iterator count), top-k
    by matches desc / doc_id asc.

    Execution shape is deliberately DIFFERENT from the span_* kernels:
    intervals are evaluated as pure Catalyst nested higher-order
    functions over the pos_map arrays — zero Python, zero kernel, full
    whole-stage codegen:

        matches = size(filter(P1, p1 -> exists(P2, p2 ->
                      p2 > p1 AND p2 - p1 - 1 <= g)))

    Per-doc work is bounded by |P1|x|P2| of the two queried terms
    (tiny), embarrassingly parallel, no shuffle before the final
    per-query top-k window.
    """
    # all queries evaluate in ONE pass over the positional doc table
    # (array-of-structs explode) — one scan total, not one per query
    structs = []
    for qid, t1, t2, g in queries:
        p1 = F.col("pos_map").getItem(t1)
        p2 = F.col("pos_map").getItem(t2)
        matches = F.when(
            p1.isNotNull() & p2.isNotNull(),
            F.size(
                F.filter(
                    p1,
                    lambda a: F.exists(
                        p2,
                        lambda b: (b > a) & (b - a - 1 <= F.lit(int(g))),
                    ),
                )
            ),
        ).otherwise(F.lit(0))
        structs.append(
            F.struct(
                F.lit(qid).cast("long").alias("query_id"),
                matches.cast("long").alias("matches"),
            )
        )
    out = (
        docs_pos.select("doc_id", F.explode(F.array(*structs)).alias("q"))
        .filter(F.col("q.matches") > 0)
        .select("q.query_id", "doc_id", F.col("q.matches").alias("matches"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("matches"), F.asc("doc_id")
    )
    return (
        out.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "matches")
    )

def search_span_contain(
    postings: DataFrame,
    dictionary: DataFrame,
    span_queries: list[tuple[int, str, str, int, str]],
    n_docs: int,
    avgdl: float,
    mode: str = "containing",
    k: int = 10,
    k1: float = K1,
    b: float = B,
    deleted_docs: DataFrame | None = None,
) -> DataFrame:
    """Lucene SpanContainingQuery / SpanWithinQuery over positional
    postings. big = an ORDERED span_near pair (t1 then t2 within
    max_gaps intervening tokens, greedy-minimal end per start — the
    SpanNearQuery ordered iterator), little = a single term.

    mode="containing": matches are BIG spans [s, e] holding a little
    occurrence (s <= z <= e); freq = surviving big spans, weight idf =
    t1 + t2 (Lucene scores the big side).
    mode="within": matches are LITTLE occurrences inside some big
    span; freq = surviving little positions, weight idf = little.

    `span_queries` = [(query_id, t1, t2, max_gaps, little)]. Same
    term-pruned scan -> per-dbucket kernel plan as every span query.
    """
    if mode not in ("containing", "within"):
        raise ValueError(f"mode must be containing|within, got {mode!r}")
    big_terms = sorted({t for _, t1, t2, _, _ in span_queries for t in (t1, t2)})
    lit_terms = sorted({x for *_, x in span_queries})
    scan_terms = sorted(set(big_terms) | set(lit_terms))
    need = big_terms if mode == "containing" else lit_terms
    df_rows = dictionary.filter(F.col("term").isin(need)).collect()
    idf_map = {r["term"]: _idf(float(n_docs), float(r["df"])) for r in df_rows}
    queries = []
    for qid, t1, t2, g, x in span_queries:
        sidf = (
            idf_map.get(t1, 0.0) + idf_map.get(t2, 0.0)
            if mode == "containing"
            else idf_map.get(x, 0.0)
        )
        queries.append((qid, t1, t2, int(g), x, sidf))
    cand = postings.filter(F.col("term").isin(scan_terms))
    ad = float(avgdl)
    deleted = _collect_deleted(deleted_docs)
    containing = mode == "containing"

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        tds = {
            t: _PosTermData(g.sort_values("block_id"))
            for t, g in pdf.groupby("term", sort=False)
        }
        out_q, out_d, out_s = [], [], []
        for qid, t1, t2, g, xterm, sidf in queries:
            if any(t not in tds for t in (t1, t2, xterm)):
                continue
            td1, td2, xtd = tds[t1], tds[t2], tds[xterm]
            cand_ids = td1.ids
            for other in (td2.ids, xtd.ids):
                cand_ids = cand_ids[
                    np.isin(cand_ids, other, assume_unique=True)
                ]
            if deleted is not None and cand_ids.size:
                cand_ids = cand_ids[
                    ~np.isin(cand_ids, deleted, assume_unique=True)
                ]
            if cand_ids.size == 0:
                continue
            r1 = np.searchsorted(td1.ids, cand_ids)
            r2 = np.searchsorted(td2.ids, cand_ids)
            rx = np.searchsorted(xtd.ids, cand_ids)
            ptf = np.zeros(cand_ids.size, dtype=np.float64)
            lens = np.zeros(cand_ids.size, dtype=np.float64)
            for ci in range(cand_ids.size):
                p1 = td1.positions_of(int(r1[ci]))
                p2 = td2.positions_of(int(r2[ci]))
                xpos = xtd.positions_of(int(rx[ci]))
                lens[ci] = float(td1.lens[int(r1[ci])])
                # greedy-minimal ordered pair spans: for each start,
                # the first t2 strictly after it within the gap budget
                idx = np.searchsorted(p2, p1 + 1, "left")
                ok = idx < p2.size
                idxc = np.minimum(idx, p2.size - 1)
                ok &= p2[idxc] <= p1 + g + 1
                starts, ends = p1[ok], p2[idxc[ok]]
                if starts.size == 0:
                    continue
                if containing:
                    lo = np.searchsorted(xpos, starts, "left")
                    hi = np.searchsorted(xpos, ends, "right")
                    ptf[ci] = float(np.count_nonzero(hi > lo))
                else:
                    # ends are non-decreasing with starts (greedy
                    # minimal), so z is covered iff the LAST span
                    # starting at or before z ends at or after z
                    i1 = np.searchsorted(starts, xpos, "right") - 1
                    cov = i1 >= 0
                    i1c = np.maximum(i1, 0)
                    cov &= ends[i1c] >= xpos
                    ptf[ci] = float(np.count_nonzero(cov))
            r = _score_and_topk(qid, cand_ids, ptf, lens, sidf, ad, k, k1, b)
            if r:
                out_q.append(r[0]); out_d.append(r[1]); out_s.append(r[2])
        if not out_q:
            return pd.DataFrame(
                {"query_id": [], "doc_id": [], "score": []}
            ).astype(
                {"query_id": "int64", "doc_id": "int64", "score": "float64"}
            )
        return pd.DataFrame(
            {
                "query_id": np.concatenate(out_q),
                "doc_id": np.concatenate(out_d),
                "score": np.concatenate(out_s),
            }
        )

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


# ---------------------------------------------------------------------------
# index_phrases fast path (ES mapping option, Lucene 2-shingle sub-field)
# ---------------------------------------------------------------------------


def shingle_tf(documents: DataFrame) -> DataFrame:
    """ES `index_phrases: true`: the hidden `<field>._index_phrase`
    sub-field indexes word 2-shingles ("w1 w2") as ordinary terms so a
    two-term match_phrase needs no positions at query time
    (es_record_mappings.json's text fields could opt in per field).

    documents(doc_id?, text) -> (doc_id, term, tf, len) where term is
    the shingle, tf its count, and len = token_count - 1 — the shingle
    field's OWN length. Docs with < 2 tokens emit no shingles and stay
    out of the shingle field's docCount/avgFieldLength, matching
    Lucene's per-field norms.

    Plan shape: tokenize (pandas UDF, the pinned NFC path) -> JVM-side
    transform+explode (no extra Python hop) -> one hash agg keyed on
    (doc_id, term) — the same single-shuffle shape as term_frequencies;
    shingles roughly double the token stream but nothing else changes
    at 100TB.
    """
    from mario_spark.analyze import tokenize_expr

    d = documents
    if "doc_id" not in d.columns:
        d = assign_doc_ids(d)
    base = d.select("doc_id", tokenize_expr("text").alias("arr")).filter(
        F.size("arr") >= 2
    )
    sh = base.select(
        "doc_id",
        (F.size("arr") - 1).cast("double").alias("len"),
        F.explode(
            F.expr(
                "transform(slice(arr, 1, size(arr) - 1),"
                " (x, i) -> concat(x, ' ', element_at(arr, i + 2)))"
            )
        ).alias("term"),
    )
    return sh.groupBy("doc_id", "term", "len").agg(
        F.count("*").cast("double").alias("tf")
    )


def search_phrase_shingle(
    documents: DataFrame,
    query_set: list[tuple[int, str]],
    k: int = 10,
) -> DataFrame:
    """2-term match_phrase on an index_phrases field: Lucene rewrites
    the phrase to a TermQuery on the shingle sub-field, so scoring uses
    the shingle field's own stats (df over shingles, its docCount and
    avgFieldLength). That is why index_phrases returns the same match
    set as positional match_phrase but slightly different scores — and
    why it is the scale path: no positions stream is ever decoded.

    query_set: [(query_id, phrase_text)], each phrase exactly 2 tokens
    (ES takes this fast path only then; longer phrases fall back to
    mario_spark.phrase.search_phrase).
    """
    from mario_spark.analyze import py_tokenize
    from mario_spark.query import bm25_scores, doc_frequencies, topk

    rows = []
    for qid, text in query_set:
        toks = py_tokenize(text)
        if len(toks) != 2:
            raise ValueError(f"index_phrases serves 2-term phrases: {text!r}")
        rows.append((int(qid), f"{toks[0]} {toks[1]}"))
    spark = documents.sparkSession
    q = spark.createDataFrame(rows, "query_id long, term string")
    tf = shingle_tf(documents)
    dl = tf.select("doc_id", "len").distinct()
    stats = dl.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("len").alias("avgdl"),
    )
    scored = bm25_scores(tf, doc_frequencies(tf), stats, q)
    return topk(scored, k)


# ---------------------------------------------------------------------------
# Multi-word synonyms (ES synonym_graph at query time)
# ---------------------------------------------------------------------------


def search_synonym_graph(
    documents: DataFrame,
    query_set: list[tuple[int, str, str]],
    k: int = 10,
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """ES match with a query-time synonym_graph filter mapping a single
    term to a multi-word phrase (e.g. "ml" => "machine learning"):
    Lucene builds a graph query whose paths become BooleanQuery SHOULD
    clauses — a TermQuery for the single-token path and a PhraseQuery
    for the multi-token path — and a doc's score is the SUM of its
    matching clauses (multi-token synonyms can NOT use SynonymQuery's
    blended df, per Lucene's own docs; they fall back to boolean sum).

    query_set: (query_id, term, phrase_text with exactly 2+ tokens).
    Both paths are exhaustive DataFrame plans: the term path is plain
    BM25; the phrase path scores PhraseWeight (idf-sum pseudo-term on
    the phrase frequency) with the phrase_tf computed by a codegen
    adjacency scan over the token array — no positions stream, no UDF
    beyond the shared tokenizer, both hash-agg shaped.
    """
    from mario_spark.analyze import py_tokenize, tokenize_expr
    from mario_spark.docs import assign_doc_ids
    from mario_spark.query import topk

    d = documents
    if "doc_id" not in d.columns:
        d = assign_doc_ids(d)
    arr = d.select("doc_id", tokenize_expr("text").alias("arr")).filter(
        F.size("arr") > 0
    )
    arr = arr.withColumn("len", F.size("arr").cast("double")).persist()
    stats = arr.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("len").alias("avgdl"),
    )
    toks = arr.select("doc_id", "len", F.explode("arr").alias("term"))
    tf = toks.groupBy("doc_id", "term", "len").agg(
        F.count("*").cast("double").alias("tf")
    )
    dfreq = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))

    term_rows, phrase_terms = [], {}
    for qid, term, phrase in query_set:
        ptoks = py_tokenize(phrase)
        if len(ptoks) < 2:
            raise ValueError(f"synonym phrase needs >= 2 tokens: {phrase!r}")
        term_rows.append((int(qid), py_tokenize(term)[0]))
        phrase_terms[int(qid)] = ptoks
    spark = documents.sparkSession
    q_term = spark.createDataFrame(term_rows, "query_id long, term string")

    # --- term path: standard BM25 contribution for the single token
    from mario_spark.query import bm25_scores

    term_scored = bm25_scores(tf, dfreq, stats, q_term, k1=k1, b=b)

    # --- phrase path: adjacency-scan phrase_tf (codegen lambda over the
    # token array), PhraseWeight scoring with idf summed over members
    member_rows = [
        (qid, t) for qid, ptoks in phrase_terms.items() for t in set(ptoks)
    ]
    q_members = spark.createDataFrame(member_rows, "query_id long, term string")
    idf_sum = (
        q_members.join(dfreq, "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .groupBy("query_id")
        .agg(
            F.sum("idf").alias("sidf"),
            F.count("*").alias("n_found"),
            F.first("avgdl").alias("avgdl"),
        )
    )
    phrase_parts = []
    for qid, ptoks in phrase_terms.items():
        m = len(ptoks) - 1
        conds = " AND ".join(
            f"arr[p + {j - 1}] = '{t}'" for j, t in enumerate(ptoks)
        )
        ptf_expr = (
            f"CAST(size(filter(sequence(1, int(size(arr)) - {m}), "
            f"p -> {conds})) AS DOUBLE)"
        )
        phrase_parts.append(
            arr.select(
                F.lit(qid).cast("long").alias("query_id"),
                "doc_id",
                "len",
                F.expr(ptf_expr).alias("ptf"),
            ).filter(F.col("ptf") > 0)
        )
    ptf_df = phrase_parts[0]
    for p in phrase_parts[1:]:
        ptf_df = ptf_df.unionByName(p)
    n_members = spark.createDataFrame(
        [(qid, len(set(ts))) for qid, ts in phrase_terms.items()],
        "query_id long, n_terms long",
    )
    phrase_scored = (
        ptf_df.join(F.broadcast(idf_sum), "query_id")
        .join(F.broadcast(n_members), "query_id")
        # an OOV member zeroes the phrase path (it can never match, and
        # idf_sum would silently under-count otherwise)
        .filter(F.col("n_found") == F.col("n_terms"))
        .withColumn(
            "score",
            F.col("sidf")
            * (F.col("ptf") * (k1 + 1.0))
            / (F.col("ptf") + k1 * (1.0 - b + b * F.col("len") / F.col("avgdl"))),
        )
        .select("query_id", "doc_id", "score")
    )

    combined = (
        term_scored.withColumnRenamed("score", "s_term")
        .join(
            phrase_scored.withColumnRenamed("score", "s_phrase"),
            ["query_id", "doc_id"],
            "full_outer",
        )
        .withColumn(
            "score",
            F.coalesce(F.col("s_term"), F.lit(0.0))
            + F.coalesce(F.col("s_phrase"), F.lit(0.0)),
        )
        .select("query_id", "doc_id", "score")
    )
    return topk(combined, k)
