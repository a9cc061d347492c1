"""Highlighting (ES `highlight`): first-match fragment extraction.

ES's unified highlighter re-analyzes the stored field and returns the
best-scoring passage with matched terms wrapped in <em> tags. The
passage-BM25 "best fragment" choice is Lucene-internal and not worth
bit-matching; the contract implemented here is the deterministic
subset every highlighter supports and real clients rely on:

- match position = the FIRST boundary-safe occurrence of any query
  term in the lowered text, earliest-wins across terms;
- fragment = a fixed-width character window starting a little before
  the match, with THAT occurrence wrapped in <em>…</em>.

Everything is whole-stage-codegen Spark SQL expressions (instr /
substr / concat folds — no UDF, no shuffle beyond the caller's own),
so highlighting N docs is a map over the hits, exactly as cheap as it
is in the engine being replaced. Boundary safety pads the haystack
and needle with spaces, which is exact for the analyzer's
space-separated token stream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def first_match(text: Column, terms: list[str]) -> tuple[Column, Column]:
    """(position, matched_term) of the earliest boundary-safe
    occurrence of any term (1-based position in `text`; 0 = no match).
    Fold keeps the FIRST-minimal position; ties keep the earlier term
    in `terms` order, which cannot happen at equal positions anyway
    (two different tokens can't start at the same offset)."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    pos: Column = F.lit(0)
    term: Column = F.lit("")
    for t in terms:
        # match of ' t ' in ' '+text starts the term at text offset p
        p = F.instr(padded, f" {t} ")
        better = (p > 0) & ((pos == 0) | (p < pos))
        pos = F.when(better, p).otherwise(pos)
        term = F.when(better, F.lit(t)).otherwise(term)
    return pos, term


def highlight_fragment(
    df: DataFrame,
    text_col: str,
    terms: list[str],
    frag_len: int = 60,
    lead: int = 20,
) -> DataFrame:
    """Add (pos, term, snippet) for the first match of any query term;
    rows with no match are dropped. snippet = frag_len chars starting
    `lead` before the match, the matched occurrence wrapped in <em>."""
    text = F.col(text_col)
    pos, term = first_match(text, terms)
    d = (
        df.withColumn("pos", pos.cast("long"))
        .withColumn("term", term)
        .filter(F.col("pos") > 0)
    )
    fs = F.greatest(F.lit(1), F.col("pos") - lead)
    frag = text.substr(fs, F.lit(frag_len))
    s = F.col("pos") - fs + 1  # term start within the fragment
    tlen = F.length("term")
    snippet = F.concat(
        frag.substr(F.lit(1), s - 1),
        F.lit("<em>"),
        frag.substr(s, tlen),
        F.lit("</em>"),
        frag.substr(s + tlen, F.lit(frag_len)),
    )
    return d.withColumn("snippet", snippet)


def highlight_best_passage(
    df: DataFrame,
    text_col: str,
    term_weights: dict[str, float],
    passage_words: int = 30,
) -> DataFrame:
    """ES/Lucene unified-highlighter contract: split the field into
    passages, score each passage by the SUM OF MATCHED-TERM WEIGHTS
    (the caller passes BM25 idf per term — Lucene's passage scorer),
    return the BEST passage with every matched term wrapped in <em>.

    Deterministic pinned subset of Lucene's BreakIterator behavior:
    passages are consecutive `passage_words`-word windows over the
    whitespace token stream; a word matches a term iff lower(word) ==
    term; ties pick the EARLIEST passage (array_position returns the
    first maximum). Whitespace inside the snippet is normalized to
    single spaces (the words are re-joined).

    Adds (passage, score, snippet); rows with no match are dropped.
    Everything is whole-stage-codegen higher-order array functions —
    no UDF, no shuffle, so it scales as a map over the hits exactly
    like the first-match variant.
    """
    terms = sorted(term_weights)
    W = int(passage_words)
    words = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda w: w != F.lit("")
    )
    n_pass = F.greatest(
        F.lit(1), F.ceil(F.size(words) / F.lit(W)).cast("int")
    )
    passages = F.transform(
        F.sequence(F.lit(0), n_pass - F.lit(1)),
        lambda i: F.slice(words, i * W + F.lit(1), W),
    )

    def _pscore(pw: Column) -> Column:
        s = F.lit(0.0)
        for t in terms:
            s = s + F.when(
                F.exists(pw, lambda w: F.lower(w) == F.lit(t)),
                F.lit(float(term_weights[t])),
            ).otherwise(F.lit(0.0))
        return F.round(s, 4)

    scores = F.transform(passages, _pscore)
    best = F.array_position(scores, F.array_max(scores))
    pw = F.element_at(passages, best.cast("int"))
    snippet = F.array_join(
        F.transform(
            pw,
            lambda w: F.when(
                F.lower(w).isin(terms),
                F.concat(F.lit("<em>"), w, F.lit("</em>")),
            ).otherwise(w),
        ),
        " ",
    )
    return (
        df.withColumn("passage", best.cast("long"))
        .withColumn("score", F.element_at(scores, best.cast("int")))
        .withColumn("snippet", snippet)
        .filter(F.col("score") > 0)
    )
