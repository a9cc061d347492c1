"""Fuzzy term queries (ES match + fuzziness / Lucene FuzzyQuery).

Mario's delegated engine answers `"fuzziness": N` matches out of the
box on every text field; this module re-expresses them Spark-first.

Semantics (documented precisely because engines differ):
- A query term expands to every DICTIONARY term within classic
  Levenshtein distance <= max_edits that shares its first
  `prefix_length` characters (ES `prefix_length`; Lucene counts a
  transposition as ONE edit — Damerau — while Spark's F.levenshtein
  and DuckDB's levenshtein are classic, so a transposition costs 2
  here on BOTH the engine and the oracle side).
- The expanded set is scored as a disjunctive bool query, each
  variant with its own idf (Lucene MultiTermQuery
  SCORING_BOOLEAN_REWRITE); expansions are deduped per query.

Distributed shape: Lucene walks an FST automaton per shard; the
Spark-first equivalent is ONE pruned pass over the term dictionary —
an equi-join on the `prefix_length`-char prefix against the broadcast
query-term table (the prefix key prunes the scan the way the
automaton's first transition does), then a levenshtein filter. The
dictionary is ~vocab-sized (millions of rows at 10^12 docs), so this
is a metadata-scale job, never a corpus-scale one; the expansion
result is a handful of rows collected driver-side. Scoring then runs
the standard block-max WAND kernel over the expanded terms — postings
scan pruned to the expansion, per-dbucket batch kernel, tiny rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mario_spark.postings import idf as _idf
from mario_spark.query import B, K1
from mario_spark.wand import _run_kernel


def expand_terms(
    dictionary: DataFrame,
    query_terms: DataFrame,
    max_edits: int = 1,
    prefix_length: int = 1,
) -> DataFrame:
    """(query_id, term) -> (query_id, term, df) over dictionary terms
    within `max_edits` (classic Levenshtein) sharing the first
    `prefix_length` chars. prefix_length=0 degrades to a full-vocab
    scan per term (ES's default, costlier — the join key becomes '').
    """
    pfx = lambda c: F.substring(c, 1, prefix_length)  # noqa: E731
    q = query_terms.select(
        "query_id", F.col("term").alias("qterm"), pfx("term").alias("pfx")
    )
    d = dictionary.withColumn("pfx", pfx("term"))
    return (
        d.join(F.broadcast(q), "pfx")
        .filter(F.levenshtein("term", "qterm") <= max_edits)
        .select("query_id", "term", "df")
        .dropDuplicates(["query_id", "term"])
    )


def search_fuzzy(
    postings: DataFrame,
    dictionary: DataFrame,
    query_terms: DataFrame,
    n_docs: int,
    avgdl: float,
    k: int = 10,
    max_edits: int = 1,
    prefix_length: int = 1,
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Fuzzy BM25 top-k: expansion join (one dictionary pass) ->
    standard WAND kernel over the expanded disjunction. Returns
    (query_id, rank, doc_id, score) like search_wand."""
    exp = expand_terms(dictionary, query_terms, max_edits, prefix_length)
    rows = exp.collect()  # tiny: queries x bounded expansion fan-out
    qmap: dict[int, list[str]] = {}
    nd = float(n_docs)
    idf_map: dict[str, float] = {}
    for r in rows:
        qmap.setdefault(int(r["query_id"]), []).append(r["term"])
        idf_map[r["term"]] = _idf(nd, float(r["df"]))
    queries = sorted((qid, sorted(ts)) for qid, ts in qmap.items())
    return _run_kernel(
        postings, queries, idf_map, float(avgdl), k, k1, b, conjunctive=False
    )
