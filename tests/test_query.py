"""Exhaustive BM25 vs a pure-pandas oracle on the synthetic pages corpus,
plus doc-id assignment determinism."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from mario_spark import docs, query
from mario_spark.analyze import py_tokenize
from mario_spark.fixtures import make_pages_query_set, pages_df, pages_pdf, query_terms_df

N_DOCS = 300
K1, B = 1.2, 0.75


def pandas_bm25_topk(pdf: pd.DataFrame, query_set, k=10) -> pd.DataFrame:
    """Independent oracle: dict-of-lists inverted index + exhaustive score."""
    pdf = pdf.sort_values("url", ignore_index=True)
    pdf["doc_id"] = np.arange(len(pdf), dtype=np.int64)
    toks = pdf["text"].map(py_tokenize)
    lens = toks.map(len).to_numpy(dtype=np.float64)
    n_docs = float(len(pdf))
    avgdl = lens.mean()
    index: dict[str, dict[int, int]] = {}
    for did, ts in enumerate(toks):
        for t in ts:
            index.setdefault(t, {}).setdefault(did, 0)
            index[t][did] += 1
    rows = []
    for qid, qtext in query_set:
        scores: dict[int, float] = {}
        for t in dict.fromkeys(py_tokenize(qtext)):
            post = index.get(t)
            if not post:
                continue
            df_t = float(len(post))
            idf = math.log(1.0 + (n_docs - df_t + 0.5) / (df_t + 0.5))
            for did, tf in post.items():
                w = tf * (K1 + 1.0) / (tf + K1 * (1 - B + B * lens[did] / avgdl))
                scores[did] = scores.get(did, 0.0) + idf * w
        ranked = sorted(
            ((round(s, 4), did) for did, s in scores.items()),
            key=lambda x: (-x[0], x[1]),
        )[:k]
        for r, (s, did) in enumerate(ranked, 1):
            rows.append((qid, r, did, s))
    return pd.DataFrame(rows, columns=["query_id", "rank", "doc_id", "score"])


@pytest.fixture(scope="module")
def corpus(spark):
    return docs.build_doc_table(pages_df(spark, N_DOCS)).persist()


def test_doc_id_assignment_dense_and_deterministic(spark, corpus):
    ids = [r.doc_id for r in corpus.select("doc_id").collect()]
    assert sorted(ids) == list(range(N_DOCS))
    # re-run with different partitioning -> identical (url, doc_id) map
    again = docs.build_doc_table(pages_df(spark, N_DOCS, partitions=3))
    m1 = {r.url: r.doc_id for r in corpus.select("url", "doc_id").collect()}
    m2 = {r.url: r.doc_id for r in again.select("url", "doc_id").collect()}
    assert m1 == m2


def test_bm25_rank_identical_to_pandas_oracle(spark, corpus):
    qset = make_pages_query_set()[:25]
    got = (
        query.search_exhaustive(corpus, query_terms_df(spark, qset))
        .toPandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    want = pandas_bm25_topk(pages_pdf(N_DOCS), qset).sort_values(
        ["query_id", "rank"], ignore_index=True
    )
    pd.testing.assert_frame_equal(
        got.astype({"query_id": "int64", "rank": "int64", "doc_id": "int64"}),
        want.astype({"query_id": "int64", "rank": "int64", "doc_id": "int64"}),
    )


def test_oov_query_empty(spark, corpus):
    q = query_terms_df(spark, [(0, "qqqxyz zzzoov")])
    assert query.search_exhaustive(corpus, q).count() == 0


def test_terms_set_semantics(spark):
    """min_should_match gates matches: an OOV member can never count,
    and m == |terms| degenerates to conjunctive AND."""
    from mario_spark import query as q
    from mario_spark.docs import build_doc_table

    pages = spark.createDataFrame(
        [(0, "join hash merge sort"), (1, "join hash"), (2, "merge")],
        "doc_id long, text string",
    )
    d = build_doc_table(pages)
    out = q.search_terms_set(
        d,
        [
            (0, ["join", "hash", "merge"], 2),   # docs 0, 1
            (1, ["zzz", "join"], 2),             # unsatisfiable -> empty
            (2, ["join", "hash"], 2),            # AND: docs 0, 1
            (3, ["merge", "sort"], 1),           # docs 0, 2
        ],
        k=10,
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], set()).add(r["doc_id"])
    assert by_q[0] == {0, 1}
    assert 1 not in by_q
    assert by_q[2] == {0, 1}
    assert by_q[3] == {0, 2}


def test_percolate_must_semantics(spark):
    """A stored query fires only when the doc covers ALL its terms."""
    from mario_spark import query as q
    from mario_spark.docs import build_doc_table

    pages = spark.createDataFrame(
        [(0, "join hash merge"), (1, "join"), (2, "hash join hash")],
        "doc_id long, text string",
    )
    d = build_doc_table(pages)
    out = q.percolate(d, [(0, "join hash"), (1, "merge"), (2, "zzz")])
    got = {(r["doc_id"], r["query_id"]) for r in out.collect()}
    assert got == {(0, 0), (2, 0), (0, 1)}


def test_combined_fields_weighted_merge(spark):
    """BM25F merge: a term split across fields scores as one combined
    occurrence stream — combined tf = 2*tf_title + tf_contents and a
    SINGLE idf (df over any-field occurrence)."""
    from mario_spark import fields as fieldsmod
    from pyspark.sql import functions as F

    pages = spark.createDataFrame(
        [(0, "join hash"), (1, "join join merge"), (2, "merge sort")],
        "doc_id long, text string",
    )
    fdocs = fieldsmod.build_field_doc_table(
        pages,
        {"title": F.substring("text", 1, 4), "contents": F.col("text")},
    )
    q = spark.createDataFrame(
        [(0, "join"), (1, "merge")], "query_id long, term string"
    )
    out = fieldsmod.search_combined_fields(
        fdocs, q, {"title": 2.0, "contents": 1.0}, k=10
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"]))
    # 'join' appears in title+contents of docs 0,1 -> both match; doc 1
    # has higher combined tf (title 'join' w=2 + contents tf=2 -> 4 vs 3)
    # but also a longer combined len; ranking must be deterministic.
    assert {d for _, d in by_q[0]} == {0, 1}
    # 'merge' is in contents of 1,2 and title of 2 only
    assert {d for _, d in by_q[1]} == {1, 2}


def test_boosted_terms_reorder_and_neutral_boost(spark):
    """boost=1 on every clause must equal the plain OR query; raising
    one clause's boost must promote docs rich in that term."""
    texts = [
        "alpha alpha alpha beta",   # 0: alpha-heavy
        "beta beta beta alpha",     # 1: beta-heavy
        "alpha beta",               # 2
    ]
    d = docs.build_doc_table(
        spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
    )
    q_plain = spark.createDataFrame(
        [(0, "alpha"), (0, "beta")], "query_id long, term string"
    )
    neutral = spark.createDataFrame(
        [(0, "alpha", 1.0), (0, "beta", 1.0)],
        "query_id long, term string, boost double",
    )
    got_plain = query.search_exhaustive(d, q_plain, k=10).collect()
    got_neutral = query.search_boosted_terms(d, neutral, k=10).collect()
    assert [tuple(r) for r in got_plain] == [tuple(r) for r in got_neutral]

    boosted = spark.createDataFrame(
        [(0, "alpha", 5.0), (0, "beta", 1.0)],
        "query_id long, term string, boost double",
    )
    top = query.search_boosted_terms(d, boosted, k=1).collect()[0]
    assert top["doc_id"] == 0  # alpha-heavy doc wins under the 5x boost


def test_synonym_graph_paths_sum(spark):
    """A doc matching only the phrase path, one matching only the term
    path, and one matching both — the both-doc must outrank either
    single-path doc of comparable length."""
    from mario_spark.phrase import search_synonym_graph

    texts = [
        "ml systems rock",                  # 0: term path only
        "machine learning systems rock",    # 1: phrase path only
        "ml machine learning rock",         # 2: both paths
        "nothing relevant",                 # 3
        "machine without its pair",         # 4: members, no adjacency
    ]
    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = search_synonym_graph(d, [(0, "ml", "machine learning")], k=10)
    rows = {r["doc_id"]: r for r in got.collect()}
    assert set(rows) == {0, 1, 2}
    assert rows[2]["rank"] == 1  # both clauses matched -> summed score
