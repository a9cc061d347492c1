"""Physical-plan audit across every suite query: flag scale
anti-patterns mechanically.

For each SUITE entry (built at sf0.001, plan-only), greps the executed
plan for:
  - CartesianProduct        (unbounded pair blowup)
  - Exchange SinglePartition (global funnel)

Interpretation: a SinglePartition exchange is CORRECT when it carries
reduced data — the final step of a partial+final global aggregation
(corpus stats: one row per upstream partition) or a pipeline-agg window
over an already-reduced bucket table (ES coordinating-node semantics,
O(#buckets) rows). It is a bug when raw rows flow through it (a global
row_number over documents, say) — tests/test_plans.py pins the known
cases; this audit catches regressions query-wide.

Usage: python scripts/plan_audit.py   # prints flagged queries + count
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mario_spark.session import get_spark  # noqa: E402
from mario_spark.suite import SUITE  # noqa: E402


def main() -> None:
    spark = get_spark("audit", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.001"
    bad: dict[str, list[str]] = {}
    for name, fn in sorted(SUITE.items()):
        try:
            df = fn(spark, sf)
            plan = df._jdf.queryExecution().executedPlan().toString()
            flags = []
            if "CartesianProduct" in plan:
                flags.append("CARTESIAN")
            sp = plan.count("Exchange SinglePartition")
            if sp:
                flags.append(f"SINGLEPART x{sp}")
            if flags:
                bad[name] = flags
        except Exception as e:  # pragma: no cover - diagnostic path
            bad[name] = [f"ERR {type(e).__name__}: {str(e)[:80]}"]
    for k, v in bad.items():
        print(k, v)
    print(f"-- {len(bad)} flagged of {len(SUITE)}")


if __name__ == "__main__":
    main()
