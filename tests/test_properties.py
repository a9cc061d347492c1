"""Property tests for the round-2 driver-side kernels: the banded
Levenshtein, the greedy proximity chain matcher, and the KMV sketch's
accuracy (deterministic given the md5 hash — the assertion is a real
bound, not a flaky tolerance)."""

from __future__ import annotations

import itertools

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


def _lev_ref(a: str, b: str) -> int:
    """Textbook full-matrix Levenshtein (no banding, no early exit)."""
    m, n = len(a), len(b)
    dp = list(range(n + 1))
    for i in range(1, m + 1):
        prev = dp[0]
        dp[0] = i
        for j in range(1, n + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return dp[n]


@settings(max_examples=300, deadline=None)
@given(
    st.text(alphabet="abcde", max_size=8),
    st.text(alphabet="abcde", max_size=8),
    st.integers(min_value=0, max_value=4),
)
def test_levenshtein_le_matches_reference(a, b, limit):
    from mario_spark.fuzzy import levenshtein_le

    assert levenshtein_le(a, b, limit) == (_lev_ref(a, b) <= limit)


def _chain_ref(term_pos: list[np.ndarray], n_terms: int, slop: int) -> int:
    """Brute-force: a start p0 matches iff ANY strictly-increasing
    chain (p0 < p1 < ... < p_{n-1}) fits the slop window."""
    count = 0
    for p0 in term_pos[0]:
        found = False
        for combo in itertools.product(*[list(p) for p in term_pos[1:]]):
            chain = [int(p0), *[int(c) for c in combo]]
            if all(chain[i] < chain[i + 1] for i in range(len(chain) - 1)) and (
                chain[-1] - chain[0] - (n_terms - 1) <= slop
            ):
                found = True
                break
        if found:
            count += 1
    return count


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=12), min_size=1, max_size=5),
        min_size=2,
        max_size=3,
    ),
    st.integers(min_value=0, max_value=3),
)
def test_chain_match_count_matches_bruteforce(poss, slop):
    from mario_spark.phrase import _chain_match_count

    term_pos = [np.array(sorted(set(p)), dtype=np.int64) for p in poss]
    n = len(term_pos)
    assert _chain_match_count(term_pos, n, slop) == _chain_ref(term_pos, n, slop)


def test_kmv_estimate_accuracy(spark):
    """KMV with k=256 has relative std error ~1/sqrt(k-2) ≈ 6.3%. The
    md5-derived estimate is deterministic, so a 20% (~3σ) band is a
    stable assertion, not a flaky one. Exact below k is contractual."""
    from mario_spark.ops.aggs import cardinality_kmv

    rows = [(f"g{i % 3}", f"v{i}") for i in range(6000)] + [
        ("small", f"v{i}") for i in range(100)
    ]
    df = spark.createDataFrame(rows, "key string, val string")
    out = {r["key"]: r["est_distinct"] for r in
           cardinality_kmv(df, "key", "val", k=256).collect()}
    assert out["small"] == 100.0  # below k -> exact
    for kk in ("g0", "g1", "g2"):
        assert abs(out[kk] - 2000) / 2000 < 0.20, (kk, out[kk])
