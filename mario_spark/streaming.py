"""Custom stateful streaming operators (SURVEY §2.3).

mario is finite-batch, so streaming is a declared non-goal — but the
engine's operators must be streaming-READY (the windowed-agg and
foreachBatch-ingest smokes live in tests/test_streaming.py). This
module adds the third shape the 100TB catch-up story needs: a CUSTOM
stateful operator via applyInPandasWithState — arbitrary per-key state
the built-in window/agg operators can't express (running profiles,
session carts, dedup-seen sets), maintained incrementally across
micro-batches with exactly Spark's GroupState contract.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stateful_user_stats(stream: DataFrame) -> DataFrame:
    """Per-user running (n_events, sum_value) maintained in GroupState
    across micro-batches; emits the updated totals for every user seen
    in each batch (outputMode=update semantics downstream).

    State is two scalars per key — the partial-agg shape, so state
    size is O(keys) regardless of stream length, and a real deployment
    would add a timeout eviction policy on the same API.
    """

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, sv = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            sv += float(pdf["value"].sum())
        state.update((n, sv))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_value": [round(sv, 4)],
            }
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType="user_id long, n_events long, sum_value double",
        stateStructType="n long, sv double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
