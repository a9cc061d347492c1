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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from mario_spark.suite import SUITE

    return dict(SUITE)


def oracle_sql() -> dict[str, str]:
    from mario_spark.oracles import ORACLES

    return dict(ORACLES)
