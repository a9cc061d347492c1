"""Text analysis: extraction, tokenization, keyword normalizers.

Re-implements (from scratch, Spark-first) the analyzer semantics mario
delegates to OpenSearch via config/es_record_mappings.json (reference:
/root/reference/config/es_record_mappings.json):

- B1 standard text analysis  (`"type":"text"`, e.g. title :390-398):
  Unicode word tokenization + lowercase. Our spec: NFC-normalize,
  lowercase, then extract maximal runs of Unicode letters/digits
  (underscore excluded). Pinned identically in three places: the pure
  Python twin (oracles), the pandas UDF (engine hot path), and the
  RE2/Java pattern (DuckDB oracle SQL + optional JVM fast path).
- B2 `keyword_no_trailing_punctuation` analyzer (:5-22): whole value one
  token; strip exactly ONE trailing char of [./;=,?]; lowercase; trim.
- B3 `lowercase` keyword normalizer (:23-30).
- HTML extraction: mario has no extractor (its input is already-parsed
  JSON); the new engine's input is Common-Crawl-style pages with an
  `html` binary column. Extraction spec: take the inner content of the
  first <article>...</article> element, strip any nested tags, collapse
  whitespace runs to single spaces, strip ends. The synthetic corpus is
  constructed so extract(html) == text byte-identically (the per-row
  fidelity invariant).

All Spark entry points are vectorized pandas UDFs (Arrow exchange); the
per-element lambdas below exist only for oracle twins and unit tests.
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType, MapType, StringType

# Token = maximal run of Unicode letters or digits (no underscore).
# Python regex class [^\W_] == letters+digits; RE2/Java: [\p{L}\p{N}]+.
TOKEN_RE = re.compile(r"[^\W_]+", re.UNICODE)
SQL_TOKEN_PATTERN = r"[\p{L}\p{N}]+"  # for DuckDB oracles / JVM regexp path

TRAILING_PUNCT_RE = re.compile(r"[./;=,?]$")

_ARTICLE_PAT = r"<article>(.*?)</article>"
_ARTICLE_RE = re.compile(_ARTICLE_PAT, re.S)
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")


# ---------------------------------------------------------------- pure twins
def py_tokenize(text: str | None) -> list[str]:
    """Pure-Python twin of tokenize_udf (oracle for tests)."""
    if text is None:
        return []
    return TOKEN_RE.findall(unicodedata.normalize("NFC", text).lower())


def py_normalize_keyword(value: str | None) -> str | None:
    """B2: strip ONE trailing [./;=,?], lowercase, trim."""
    if value is None:
        return None
    return TRAILING_PUNCT_RE.sub("", value).lower().strip()


def py_lower_keyword(value: str | None) -> str | None:
    """B3 lowercase normalizer."""
    return None if value is None else value.lower()


def py_extract_text(html: bytes | str | None) -> str:
    """Pure-Python twin of extract_udf (byte-identity oracle)."""
    if html is None:
        return ""
    s = html.decode("utf-8") if isinstance(html, (bytes, bytearray)) else html
    m = _ARTICLE_RE.search(s)
    inner = m.group(1) if m else ""
    inner = _TAG_RE.sub("", inner)
    return _WS_RE.sub(" ", inner).strip()


# ------------------------------------------------------------- pandas series
def pd_tokenize(s: pd.Series) -> pd.Series:
    """Vectorized tokenizer over a pandas string Series."""
    return (
        s.fillna("")
        .str.normalize("NFC")
        .str.lower()
        .str.findall(TOKEN_RE)
    )


def pd_extract_text(html: pd.Series) -> pd.Series:
    """Vectorized HTML->text extraction over a Series of bytes/str."""
    if len(html) and isinstance(html.dropna().iloc[0] if html.notna().any() else "", (bytes, bytearray)):
        s = html.str.decode("utf-8")
    else:
        s = html
    s = s.fillna("")
    s = s.str.extract(_ARTICLE_PAT, flags=re.S, expand=False).fillna("")
    s = s.str.replace(_TAG_RE, "", regex=True)
    s = s.str.replace(_WS_RE, " ", regex=True).str.strip()
    return s


# ----------------------------------------------------------------- spark UDFs
@F.pandas_udf(ArrayType(StringType()))
def tokenize_udf(s: pd.Series) -> pd.Series:
    return pd_tokenize(s)


@F.pandas_udf(StringType())
def extract_udf(html: pd.Series) -> pd.Series:
    return pd_extract_text(html)


@F.pandas_udf(MapType(StringType(), IntegerType()))
def tokenize_count_udf(s: pd.Series) -> pd.Series:
    """Fused tokenize + per-doc term count: text -> map<term, tf>.

    One Arrow round-trip produces the tf map directly, so the postings
    build needs NO (doc_id, term) hash-aggregation shuffle at all — the
    map explodes JVM-side into pre-aggregated (term, tf) rows. At 100TB
    this removes the single largest shuffle of the pipeline (raw token
    explode is ~170 rows/doc; the map is ~0.6x that and already final).
    """
    from collections import Counter

    out = []
    findall = TOKEN_RE.findall
    normalize = unicodedata.normalize
    for v in s:
        if v is None:
            out.append({})
        else:
            # NFC is the identity on ASCII — skipping it for ASCII rows
            # (the overwhelming majority of web text) and counting with
            # the C-accelerated Counter is ~25% faster than the dict
            # loop, with identical output
            t = v if v.isascii() else normalize("NFC", v)
            out.append(dict(Counter(findall(t.lower()))))
    return pd.Series(out)


def py_shingles(text: str | None) -> list[str]:
    """Word 2-shingles of the standard token stream (Lucene
    ShingleFilter with min=max=2, no unigram output) — the analyzer
    behind ES `index_phrases: true`."""
    toks = py_tokenize(text)
    return [f"{a} {b}" for a, b in zip(toks, toks[1:])]


@F.pandas_udf(MapType(StringType(), IntegerType()))
def shingle_count_udf(s: pd.Series) -> pd.Series:
    """Fused shingle + per-doc count: text -> map<"w1 w2", tf> — the
    shingle-field twin of tokenize_count_udf (same fused-map shape, so
    a shingle field adds no extra shuffle to the build either)."""
    from collections import Counter

    out = []
    findall = TOKEN_RE.findall
    normalize = unicodedata.normalize
    for v in s:
        if v is None:
            out.append({})
            continue
        t = v if v.isascii() else normalize("NFC", v)
        toks = findall(t.lower())
        out.append(
            dict(Counter(f"{a} {b}" for a, b in zip(toks, toks[1:])))
        )
    return pd.Series(out)


@F.pandas_udf(MapType(StringType(), ArrayType(IntegerType())))
def tokenize_positions_udf(s: pd.Series) -> pd.Series:
    """Fused tokenize + positional index: text -> map<term, [positions]>.

    Positions are 0-based token ordinals (Lucene's position increments
    with the default analyzer). tf == len(positions), so the postings
    builder derives both streams from this ONE Arrow round-trip — same
    no-shuffle property as tokenize_count_udf.
    """
    out = []
    findall = TOKEN_RE.findall
    normalize = unicodedata.normalize
    for v in s:
        if v is None:
            out.append({})
        else:
            t = v if v.isascii() else normalize("NFC", v)  # NFC(ASCII) = id
            d: dict[str, list[int]] = {}
            for i, tok in enumerate(findall(t.lower())):
                d.setdefault(tok, []).append(i)
            out.append(d)
    return pd.Series(out)


# ------------------------------------------------------- JVM-side expressions
def tokenize_expr(col, use_sql: bool = False):
    """Tokenization as a Column expression.

    use_sql=True keeps tokenization JVM-side (whole-stage codegen, no
    Python worker round-trip) via Java regex — ~3-5x faster; identical
    output for NFC-normalized input. Default False = pandas UDF path,
    which is the pinned reference-fidelity path (NFC handling included).
    """
    c = F.col(col) if isinstance(col, str) else col
    if use_sql:
        return F.regexp_extract_all(F.lower(c), F.lit(SQL_TOKEN_PATTERN), F.lit(0))
    return tokenize_udf(c)


def normalize_keyword_expr(col):
    """B2 analyzer as a native Column expression (Catalyst, no UDF)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.lower(F.regexp_replace(c, r"[./;=,?]$", "")))


def lower_keyword_expr(col):
    """B3 normalizer as a native Column expression."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(c)
