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
# listed first so a prefix sample exercises NEW operators each round
# (rounds 1-2 drove the bm25/fuzzy/phrase/field families; round 3
# surfaces geo grids, pipeline aggs, suggesters, ES|QL, ANN, dedup).
_R3_ROTATION = [
    "highlight_best_passage", "knn_graph_exact", "knn_graph_ivf",
    "agg_ip_prefix", "esql_fuse", "gopher_quality",
    "agg_geotile_grid", "agg_geohash_grid", "agg_geo_distance_rings",
    "geo_bbox", "agg_geo_centroid", "agg_geo_bounds", "geo_sort_topk",
    "geo_polygon_query", "agg_pipeline_monthly", "agg_bucket_selector",
    "agg_max_bucket", "agg_bucket_sort", "agg_serial_diff",
    "agg_cumulative_cardinality", "agg_moving_percentiles",
    "agg_normalize", "agg_rate", "agg_stats_bucket", "term_suggest",
    "term_suggest_popular", "phrase_suggest", "completion_suggest_fuzzy",
    "completion_suggest_context", "terms_enum", "esql_stats",
    "esql_enrich", "esql_fork", "esql_lookup_join", "esql_inlinestats",
    "esql_change_point", "esql_grok", "esql_dissect", "ann_ivf_topk",
    "ann_pq_topk", "ann_ivfpq_topk", "ann_bit_rescore",
    "ann_maxsim_topk", "ann_filtered_topk", "incremental_minhash_dedup",
    "dedup_components", "dedup_keep_best", "exact_substring_dedup",
    "url_dedup", "semdedup_keep", "ccnet_buckets", "pii_redact",
    "rank_eval_bm25",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from mario_spark.suite import SUITE

    out = {n: SUITE[n] for n in _R3_ROTATION if n in SUITE}
    out.update(SUITE)
    return out


def oracle_sql() -> dict[str, str]:
    from mario_spark.oracles import ORACLES

    return dict(ORACLES)
