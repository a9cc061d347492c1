"""BM25 scoring + top-k: the exhaustive (oracle-grade) query path.

Implements Okapi BM25 exactly as OpenSearch 1.2.4 / Lucene 8 defaults
(the similarity mario's config contractually relies on — every
`"type":"text"` field in /root/reference/config/es_record_mappings.json):

    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    w(t, d) = tf * (k1+1) / (tf + k1 * (1 - b + b * len/avgdl))
    score   = sum_t idf(t) * w(t, d)        k1=1.2, b=0.75

This module is pure DataFrame ops — Catalyst plans it; the candidate set
is pruned by a broadcast semi-join on the (small) query-term table before
any per-doc work, so at 100TB only postings rows for queried terms ever
leave the scan (predicate pushdown on `term`).

Ranking determinism: ranks are assigned on round(score, 4) DESC,
doc_id ASC. Rounding makes ranking robust to float summation-order
differences between engines (Spark agg vs DuckDB vs pandas), which is
what lets the driver's value-hash comparison pass bit-for-bit.

The compressed-postings fast path (block-max WAND) lives in
mario_spark.wand; tests assert it is rank-identical to this scorer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75
SCORE_DECIMALS = 4


def term_frequencies(docs: DataFrame) -> DataFrame:
    """docs(doc_id, tf_map, len) -> tf(doc_id, term, tf, len).

    The doc table's tf_map is already per-doc aggregated (fused
    tokenize+count UDF), so this is a pure JVM-side map explode —
    NO shuffle. `len` rides along so the query path never needs a join
    back to the doc table (Lucene stores norms with postings for the
    same reason). Falls back to explode+hash-agg for a raw `tokens`
    array column.
    """
    if "pos_map" in docs.columns:
        # positional doc table: tf = positions count; the positions
        # column rides along so the encoder emits the poss stream
        return docs.select(
            "doc_id", "len", F.explode("pos_map").alias("term", "positions")
        ).select(
            "doc_id",
            "term",
            F.size("positions").cast("double").alias("tf"),
            "len",
            "positions",
        )
    if "tf_map" in docs.columns:
        return docs.select(
            "doc_id", "len", F.explode("tf_map").alias("term", "tf")
        ).withColumn("tf", F.col("tf").cast("double"))
    return (
        docs.select("doc_id", "len", F.explode("tokens").alias("term"))
        .groupBy("doc_id", "term", "len")
        .agg(F.count("*").cast("double").alias("tf"))
    )


def doc_frequencies(tf: DataFrame) -> DataFrame:
    """tf -> df(term, df) — document frequency per term."""
    return tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))


def bm25_scores(
    tf: DataFrame,
    dfreq: DataFrame,
    stats: DataFrame,
    query_terms: DataFrame,
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """-> (query_id, doc_id, score). Disjunctive (OR) semantics.

    Plan shape (scale-critical):
      query_terms (tiny, broadcast) ⋈ dfreq -> per-term idf (tiny, broadcast)
      ⋈ tf on term  -> candidates only for queried terms
      cross-join 1-row stats (broadcast)
      groupBy(query_id, doc_id) partial+final sum.
    """
    q_idf = (
        query_terms.join(dfreq, "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)),
        )
        .select("query_id", "term", "idf", "avgdl")
    )
    scored = (
        tf.join(F.broadcast(q_idf), "term")
        .withColumn(
            "contrib",
            F.col("idf")
            * (F.col("tf") * (k1 + 1.0))
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("len") / F.col("avgdl"))),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("contrib").alias("score"))
    )
    return scored


def topk(scored: DataFrame, k: int = 10) -> DataFrame:
    """-> (query_id, rank, doc_id, score) with deterministic tie-breaks.

    Window is partitioned by query_id (parallel across queries; never a
    global sort). Rank on rounded score DESC, doc_id ASC.
    """
    s = scored.withColumn("score", F.round("score", SCORE_DECIMALS))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        s.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def search_exhaustive(
    docs: DataFrame, query_terms: DataFrame, k: int = 10, conjunctive: bool = False
) -> DataFrame:
    """End-to-end exhaustive BM25 top-k from a tokenized doc table.

    conjunctive=True gives ES bool-must semantics (a doc must contain
    EVERY query term; still BM25-summed and ranked identically) — the
    filter is a HAVING count(distinct matched term) == |query| on the
    same aggregation, so it adds no extra shuffle.
    """
    from mario_spark.docs import corpus_stats

    tf = term_frequencies(docs)
    dfreq = doc_frequencies(tf)
    stats = corpus_stats(docs)
    if not conjunctive:
        return topk(bm25_scores(tf, dfreq, stats, query_terms), k)
    q_idf = (
        query_terms.join(dfreq, "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)),
        )
        .select("query_id", "term", "idf", "avgdl")
    )
    qn = query_terms.groupBy("query_id").agg(
        F.countDistinct("term").alias("qn")
    )
    scored = (
        tf.join(F.broadcast(q_idf), "term")
        .withColumn(
            "contrib",
            F.col("idf")
            * (F.col("tf") * (K1 + 1.0))
            / (F.col("tf") + K1 * (1.0 - B + B * F.col("len") / F.col("avgdl"))),
        )
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum("contrib").alias("score"),
            F.countDistinct("term").alias("nt"),
        )
        .join(F.broadcast(qn), "query_id")
        .filter(F.col("nt") == F.col("qn"))
        .select("query_id", "doc_id", "score")
    )
    return topk(scored, k)
