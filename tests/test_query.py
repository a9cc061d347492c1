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
