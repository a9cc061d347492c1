"""Analyzer golden cases (FIXTURES.md F5) + extraction byte-identity."""

from __future__ import annotations

import pandas as pd
import pytest

from mario_spark.analyze import (
    pd_extract_text,
    pd_tokenize,
    py_extract_text,
    py_lower_keyword,
    py_normalize_keyword,
    py_tokenize,
)
from mario_spark.fixtures import pages_pdf


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("Peanut science.", "peanut science"),
        ("a,b,", "a,b"),
        ("x?", "x"),
        ("y!", "y!"),      # '!' not in class — unchanged
        ("z..", "z."),     # strip applies exactly once
        ("MIT Alma.", "mit alma"),
        # char_filter runs BEFORE trim (ES analyzer order): a trailing
        # space defeats the punct strip, faithful to the reference.
        ("  MIT Alma. ", "mit alma."),
    ],
)
def test_keyword_no_trailing_punct(raw, expected):
    assert py_normalize_keyword(raw) == expected


def test_lowercase_normalizer():
    assert py_lower_keyword("MIT Alma") == "mit alma"
    assert py_lower_keyword(None) is None


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("D'Rivera, Paquito (1948-)", ["d", "rivera", "paquito", "1948"]),
        ("Pérez 東京 Zürich", ["pérez", "東京", "zürich"]),
        ("snake_case under", ["snake", "case", "under"]),
        ("", []),
        (None, []),
        ("école", ["école"]),  # NFC: decomposed é folds to one token char
    ],
)
def test_tokenizer_goldens(raw, expected):
    assert py_tokenize(raw) == expected


def test_pandas_tokenizer_matches_pure():
    texts = ["Hello, World!", "Pérez  東京", None, "", "a_b c1 42"]
    got = pd_tokenize(pd.Series(texts)).tolist()
    want = [py_tokenize(t) for t in texts]
    assert got == want


def test_extraction_byte_identity():
    pdf = pages_pdf(100, seed=42)
    for _, row in pdf.iterrows():
        assert py_extract_text(row["html"]) == row["text"]
    # vectorized twin agrees
    got = pd_extract_text(pdf["html"]).tolist()
    assert got == pdf["text"].tolist()


def test_extraction_edge_cases():
    assert py_extract_text(None) == ""
    assert py_extract_text(b"<html><body>no article</body></html>") == ""
    assert (
        py_extract_text(b"<article> a  <em>b</em>\n c </article>") == "a b c"
    )
