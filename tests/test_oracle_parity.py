"""Local replica of the driver's correctness gate: every suite query must
match its DuckDB oracle (row count + values) on the testdata parquet."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from mario_spark.oracles import ORACLES
from mario_spark.suite import SUITE

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), ignore_index=True)


@pytest.mark.parametrize("name", sorted(SUITE))
def test_parity(spark, ddb, name):
    assert name in ORACLES, f"missing oracle for {name}"
    got = _canon(SUITE[name](spark, SF_DIR).toPandas())
    want = _canon(ddb.execute(ORACLES[name]).df())
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    assert list(got.columns) == list(want.columns), (
        f"{name}: cols {list(got.columns)} != {list(want.columns)}"
    )
    for c in got.columns:
        g, w = got[c], want[c]
        if g.dtype.kind == "f" or w.dtype.kind == "f":
            assert (g.astype(float) - w.astype(float)).abs().max() <= 1e-9, (
                f"{name}.{c} value mismatch"
            )
        else:
            assert g.astype(str).tolist() == w.astype(str).tolist(), (
                f"{name}.{c} value mismatch"
            )
