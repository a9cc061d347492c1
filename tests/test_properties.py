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


def _pair_spans(p1: np.ndarray, p2: np.ndarray, g: int):
    """The greedy-minimal ordered-pair span rule used by
    search_span_contain (copied semantics, pure reference)."""
    idx = np.searchsorted(p2, p1 + 1, "left")
    ok = idx < p2.size
    idxc = np.minimum(idx, p2.size - 1)
    ok &= p2[idxc] <= p1 + g + 1
    return p1[ok], p2[idxc[ok]]


@settings(max_examples=300, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=8),
    st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=8),
    st.integers(min_value=0, max_value=6),
    st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=8),
)
def test_span_within_monotone_coverage_shortcut(p1s, p2s, g, zs):
    """The O(log n) coverage check in search_span_contain (last span
    starting at or before z ends at or after z) relies on greedy span
    ends being non-decreasing — verify both the monotonicity and the
    shortcut against brute force."""
    p1 = np.array(sorted(set(p1s)), dtype=np.int64)
    p2 = np.array(sorted(set(p2s)), dtype=np.int64)
    starts, ends = _pair_spans(p1, p2, g)
    assert list(ends) == sorted(ends)  # greedy ends are non-decreasing
    for z in zs:
        brute = any(s <= z <= e for s, e in zip(starts, ends))
        i1 = int(np.searchsorted(starts, z, "right")) - 1
        fast = i1 >= 0 and ends[i1] >= z
        assert fast == brute


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet='ab c|-"*+()~/\\', max_size=30))
def test_simple_qs_parser_total(s):
    """SimpleQueryParser contract: never raises, every clause has
    terms, every emitted disjunct has at least one positive clause."""
    from mario_spark.qs import parse_simple_query_string

    for clauses in parse_simple_query_string(s):
        assert any(not neg for _, neg, _ in clauses)
        for typ, _, terms in clauses:
            assert typ in ("chain", "prefix") and terms
            assert all(t for t in terms)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-10, max_value=10, allow_nan=False),
        min_size=64,
        max_size=64,
    )
)
def test_pq_integer_scaling_is_order_free(vec):
    """round(td*1e6) per sub-space then integer sum == the same value
    in any accumulation order (the property the PQ oracle relies on)."""
    v = np.array(vec, dtype=np.float64).reshape(8, 8)
    tds = [((v[m] - (v[m] + 0.5)) ** 2).sum() for m in range(8)]
    scaled = [int(np.floor(t * 1e6 + 0.5)) for t in tds]
    assert sum(scaled) == sum(reversed(scaled))


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet='FROM documents|WHERE ==<>"123 abc()%{}*+-', max_size=60))
def test_esql_parser_raises_only_valueerror(q):
    """ES|QL never dies with anything but a named ValueError at parse
    time (execution is never reached for malformed input). Planner
    exceptions can only arise AFTER a structurally valid parse."""
    from mario_spark.esql import run_esql

    class _FakeSpark:  # parse-only: any table access explodes loudly
        class read:  # noqa: N801
            @staticmethod
            def parquet(path):
                raise RuntimeError("reached execution")

    try:
        run_esql(_FakeSpark, "/nowhere", q)
    except ValueError:
        pass  # the contract
    except RuntimeError as e:
        # structurally valid FROM reached table resolution — also fine
        assert "reached execution" in str(e)


def test_esql_splitters_pure():
    """Paren-aware splitters: pipes inside FORK branches and commas
    inside BUCKET() stay with their construct; imbalance raises."""
    import pytest as _pytest

    from mario_spark.esql import _paren_groups, _split_commas, _split_stages

    assert _split_stages("FROM t | WHERE a == 1") == [
        "FROM t", "WHERE a == 1"
    ]
    assert _split_stages("FROM t | FORK ( WHERE a == 1 | LIMIT 2 ) ( LIMIT 3 )") == [
        "FROM t", "FORK ( WHERE a == 1 | LIMIT 2 ) ( LIMIT 3 )"
    ]
    assert _paren_groups("( A | B ) ( C )") == ["A | B", "C"]
    assert _split_commas("n = COUNT(*), d = BUCKET(ts, 1 day)") == [
        "n = COUNT(*)", " d = BUCKET(ts, 1 day)"
    ]
    for bad in ["FROM t | FORK ( A", "FROM t )"]:
        with _pytest.raises(ValueError):
            _split_stages(bad)
    for bad in ["( A", "A )", "( A ) junk ( B )"]:
        with _pytest.raises(ValueError):
            _paren_groups(bad)


def test_esql_cond_split_quote_aware():
    """WHERE's OR/AND splits must not fire inside string literals or
    IN-lists: `title == "cats OR dogs"` is one comparison, not a
    disjunction."""
    from mario_spark.esql import _split_cond_kw

    assert _split_cond_kw('a == "cats OR dogs"', "OR") == [
        'a == "cats OR dogs"'
    ]
    assert _split_cond_kw('a == "x" OR b == "y"', "OR") == [
        'a == "x"', 'b == "y"'
    ]
    assert _split_cond_kw('a IN ("p AND q", "r") AND b == 1', "AND") == [
        'a IN ("p AND q", "r")', "b == 1"
    ]
    # AND binds tighter: the OR split sees only the top level
    assert _split_cond_kw("a == 1 AND b == 2 OR c == 3", "OR") == [
        "a == 1 AND b == 2", "c == 3"
    ]
