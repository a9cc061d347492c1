"""Text analysis for training-data pipelines: language ID, quality
scoring, document fingerprinting (winnowing).

All three are deliberately pure Catalyst expressions (whole-stage
codegen, zero Python in the hot path) and have exact DuckDB oracles.
Token counting (the fourth op of this family) lives in
suite.token_count_bpe.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# n-gram-heuristic language ID: tiny per-language stopword lists.
# Sorted langs give the deterministic tie-break (first max wins).
STOPWORDS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "ein"],
    "en": ["the", "a", "and", "of", "to", "in", "is", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "una"],
    "fr": ["le", "la", "les", "et", "des", "un", "une", "est"],
}

_TOKENS = r"regexp_extract_all(lower(text), '[\\p{L}\\p{N}]+', 0)"


def lang_id(documents: DataFrame) -> DataFrame:
    """-> (doc_id, pred_lang, hits): argmax stopword-hit count.

    Ties break to the alphabetically-first language; hits counts token
    OCCURRENCES (not distinct), matching the oracle's list_filter.
    """
    counts = []
    for lang in sorted(STOPWORDS):
        arr = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
        counts.append(
            f"size(filter({_TOKENS}, t -> array_contains(array({arr}), t)))"
            f" as c_{lang}"
        )
    d = documents.selectExpr("doc_id", *counts)
    langs = sorted(STOPWORDS)
    best = F.greatest(*[F.col(f"c_{lg}") for lg in langs])
    pred = F.lit(None).cast("string")
    for lg in reversed(langs):  # first max wins -> evaluate in order
        pred = F.when(F.col(f"c_{lg}") == best, F.lit(lg)).otherwise(pred)
    return d.select(
        "doc_id", pred.alias("pred_lang"), best.cast("long").alias("hits")
    )


def quality_score(documents: DataFrame) -> DataFrame:
    """-> (doc_id, n_tokens, punct_ratio, stop_ratio, mean_wlen, quality).

    Composite heuristic used to filter training text: length band +
    punctuation density + stopword density + mean word length. All
    ratios rounded 4dp; quality rounded 4dp.
    """
    en = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    d = documents.selectExpr(
        "doc_id",
        f"size({_TOKENS}) as n_tokens",
        f"size(filter({_TOKENS}, t -> array_contains(array({en}), t))) as n_stop",
        "length(text) as n_chars",
        r"length(regexp_replace(text, '[\\p{L}\\p{N}\\s]+', '')) as n_punct",
        f"aggregate({_TOKENS}, 0L, (a, t) -> a + length(t)) as sum_wlen",
    )
    nt = F.greatest(F.col("n_tokens"), F.lit(1))
    punct = F.round(F.col("n_punct") / F.greatest(F.col("n_chars"), F.lit(1)), 4)
    stop = F.round(F.col("n_stop") / nt, 4)
    wlen = F.round(F.col("sum_wlen") / nt, 4)
    # quality in [0,1]: reward 50..1024 tokens, some stopwords, low punct
    len_ok = (F.col("n_tokens") >= 50) & (F.col("n_tokens") <= 1024)
    q = (
        F.when(len_ok, F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when(stop >= 0.01, F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(punct <= 0.1, F.lit(0.3)).otherwise(F.lit(0.0))
    )
    return d.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        punct.alias("punct_ratio"),
        stop.alias("stop_ratio"),
        wlen.alias("mean_wlen"),
        F.round(q, 4).alias("quality"),
    )


def py_repetition(text: str | None) -> tuple[float, float, float]:
    """Pure twin of repetition_udf (oracle for unit tests).
    Rounding is HALF-UP (floor(x*1e6 + 0.5) / 1e6) to match Spark's
    F.round and DuckDB's round — Python's built-in round is banker's
    and CAN differ on exact 7-decimal ties (e.g. k/1280 token counts)."""
    import math

    from collections import Counter

    from mario_spark.analyze import py_tokenize

    def r6(x: float) -> float:
        return math.floor(x * 1e6 + 0.5) / 1e6

    toks = py_tokenize(text)
    n = len(toks)
    if n == 0:
        return (0.0, 0.0, 0.0)
    ttr = r6(len(set(toks)) / n)
    tb = 0.0
    if n >= 2:
        c2 = Counter(zip(toks, toks[1:]))
        tb = r6(max(c2.values()) * 2.0 / n)
    dt = 0.0
    if n >= 3:
        c3 = Counter(zip(toks, toks[1:], toks[2:]))
        dup = sum(v for v in c3.values() if v > 1)
        dt = r6(dup * 3.0 / n)
    return (tb, dt, ttr)


def repetition_stats(documents: DataFrame) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1), adapted
    to word n-grams (the synthetic corpus has no line structure):
    -> (doc_id, top_bigram_frac, dup_trigram_frac, ttr) where
      top_bigram_frac  = 2 * count(most frequent word 2-gram) / n_tokens
      dup_trigram_frac = 3 * Σ counts of word 3-grams occurring >1 / n_tokens
      ttr              = distinct tokens / n_tokens (type-token ratio)

    This op is a fused per-doc pandas UDF, NOT a gram explode: per-doc
    n-gram counting needs no cross-doc state, so exploding (doc, gram)
    rows through a hash shuffle (O(corpus tokens) shuffle bytes at
    100TB) would be pure waste — the same rationale as
    analyze.tokenize_count_udf. One Arrow round-trip, O(n) per doc."""
    @F.pandas_udf(
        "top_bigram_frac double, dup_trigram_frac double, ttr double"
    )
    def rep_udf(s: pd.Series) -> pd.DataFrame:
        rows = [py_repetition(v) for v in s]
        return pd.DataFrame(
            rows, columns=["top_bigram_frac", "dup_trigram_frac", "ttr"]
        )

    return documents.select("doc_id", rep_udf("text").alias("r")).select(
        "doc_id", "r.*"
    )


WINNOW_K = 8  # char-gram size
WINNOW_W = 4  # window of consecutive gram hashes


def winnow_fingerprints(documents: DataFrame) -> DataFrame:
    """Winnowing (rolling-hash document fingerprinting):
    -> (doc_id, n_fp, fp_min) where fingerprints are the distinct
    per-window minima of md5 over char 8-grams (window=4).

    The sliding-window min is a bounded rank window per doc — parallel
    across docs, never global.
    """
    # texts shorter than K are dropped before the sequence: Spark's
    # sequence(1, 0) is a DESCENDING [1, 0] (DuckDB's generate_series
    # is empty), so the guard keeps short docs from emitting bogus grams
    grams = documents.filter(F.length("text") >= WINNOW_K).select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(1), F.length("text") - (WINNOW_K - 1))
        ).alias("p"),
        "text",
    ).select("doc_id", "p", F.expr(f"md5(substr(text, p, {WINNOW_K}))").alias("g"))
    w = (
        Window.partitionBy("doc_id")
        .orderBy("p")
        .rowsBetween(Window.currentRow, WINNOW_W - 1)
    )
    mins = grams.withColumn("wm", F.min("g").over(w))
    return mins.groupBy("doc_id").agg(
        F.countDistinct("wm").cast("long").alias("n_fp"),
        F.min("wm").alias("fp_min"),
    )


def importance_scores(tf: DataFrame, target_ids: DataFrame) -> DataFrame:
    """Data-selection importance score (the DSIR / Moore-Lewis family):
    per-doc length-normalized log-likelihood ratio between a unigram LM
    of a TARGET slice and the corpus LM —
    score(d) = Σ_t tf_d(t)·[ln p_target(t) − ln p_corpus(t)] / len(d),
    add-one smoothing over the corpus vocabulary. Docs scoring high
    look like the target domain; a training pipeline resamples by this
    weight (Xie et al. 2023; Moore & Lewis 2010).

    `tf` = (doc_id, term, tf, len) (query.term_frequencies output),
    `target_ids` = (doc_id) rows defining the target slice.

    Scale shape: both LMs are term-keyed aggs (vocab-sized, carries
    counts only); the log-ratio dim joins back term-keyed onto the tf
    stream, then ONE doc_id agg. Three bounded hash shuffles, text
    never moves; the only collects are three 1-row scalar aggs.
    """
    corpus = tf.groupBy("term").agg(F.sum("tf").alias("ctf"))
    target_tf = (
        tf.join(F.broadcast(target_ids.select("doc_id")), "doc_id", "leftsemi")
        .groupBy("term")
        .agg(F.sum("tf").alias("ttf"))
    )
    row = corpus.agg(
        F.sum("ctf").alias("nc"), F.count("*").alias("v")
    ).collect()[0]
    nc, v = float(row["nc"]), float(row["v"])
    nt = float(
        target_tf.agg(F.sum("ttf").alias("nt")).collect()[0]["nt"] or 0.0
    )
    lr = (
        corpus.join(target_tf, "term", "left")
        .select(
            "term",
            (
                F.log((F.coalesce(F.col("ttf"), F.lit(0.0)) + 1.0) / (nt + v))
                - F.log((F.col("ctf") + 1.0) / (nc + v))
            ).alias("lr"),
        )
    )
    return (
        tf.join(lr, "term")
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(F.col("tf") * F.col("lr")) / F.first("len"), 4
            ).alias("imp_score")
        )
    )


# PII scrubbing patterns — written in the common subset of Java regex
# (Spark) and RE2 (DuckDB): no backrefs, no lookaround, \b supported by
# both. Email first (an address contains digit runs an IP pattern could
# otherwise nibble), then IPv4, then international-ish phone runs.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{1,3}[ -]\d{2,4}[ -]\d{3,4}[ -]\d{3,4}\b", "<PHONE>"),
]


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Training-pipeline PII scrub (the standard pre-training step —
    e.g. BigScience/ROOTS, FineWeb): emails, IPv4s, and phone-shaped
    runs replaced by typed placeholder tokens, with per-doc match
    counts for audit. Pure codegen: one regexp_count + one
    regexp_replace per pattern, fused into the scan by whole-stage
    codegen — the text never shuffles, no Python in the path.

    Order matters and is fixed: emails first (addresses embed digit
    runs), then IPs, then phones. -> original columns with `text_col`
    redacted + (n_emails, n_ips, n_phones).
    """
    out = df
    counts = []
    redacted = F.col(text_col)
    for name, pat, repl in PII_PATTERNS:
        counts.append(
            F.regexp_count(redacted, F.lit(pat)).cast("long").alias(f"n_{name}s")
        )
        redacted = F.regexp_replace(redacted, pat, repl)
    others = [c for c in df.columns if c != text_col]
    return out.select(
        *others, *counts, redacted.alias(text_col)
    )


def bpe_pair_counts(documents: DataFrame, k: int = 20) -> DataFrame:
    """ONE merge-step of BPE tokenizer training (Sennrich et al. 2016):
    corpus-wide frequency of every ADJACENT CHARACTER PAIR inside
    words, top-k by count — the argmax of this table is the pair a BPE
    trainer would merge next. The real trainer loops this; one step is
    the distributed primitive (each subsequent step re-runs it over the
    re-segmented corpus).

    Shape: word tokenization + per-word pair explosion are pure codegen
    (transform over a guarded sequence — Spark's sequence(1, 0) is
    descending, not empty, so 1-char words are filtered before the
    gram expr); ONE (pair)-keyed hash agg with map-side combine; top-k
    via orderBy().limit() = TakeOrderedAndProject. Shuffle rows are
    bounded by the pair alphabet (<= |charset|^2), not the corpus.
    """
    pair_expr = F.expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"
    )
    words = documents.select(
        F.explode(
            F.regexp_extract_all(
                F.lower("text"), F.lit(r"[\p{L}\p{N}]+"), F.lit(0)
            )
        ).alias("w")
    ).filter(F.length("w") >= 2)
    return (
        words.select(F.explode(pair_expr).alias("pair"))
        .groupBy("pair")
        .agg(F.count("*").cast("long").alias("count"))
        .orderBy(F.desc("count"), F.asc("pair"))
        .limit(k)
    )


def lm_cross_entropy(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """CCNet-style LM quality signal (Wenzek et al. 2020 use a KenLM
    5-gram; the distributed primitive is the same at any order): score
    every doc by its cross-entropy under an add-one-smoothed word
    BIGRAM model trained on the corpus itself —

        ce(d) = -(1/T) * sum_i ln( (c2(w_{i-1}, w_i) + 1)
                                 / (c1(w_{i-1}) + V) )

    Low ce = fluent/templated text, high ce = rare word sequences;
    CCNet buckets docs into head/middle/tail on this signal. Docs with
    fewer than 2 tokens emit no row (no bigram evidence).

    Plan shape: tokenize once (JVM regexp), bigram expansion via a
    guarded sequence transform (sequence(2, 1) is descending, not
    empty — the ADVICE.md trap), then the token stream is REDUCED
    FIRST: one (doc_id, prev, w) count agg (map-side combinable — the
    only shuffle the raw stream ever takes). The corpus bigram table
    derives from that reduced frame by a second, bigram-keyed agg; the
    log-prob table is c2 x uni joined at BIGRAM-VOCAB size (never the
    token stream), and the per-doc score is a weighted avg
    sum(n*lp)/sum(n) over each doc's DISTINCT bigrams. Unigram counts
    take their own map-side-combined agg; V rides in as a broadcast
    1-row frame, no collect. Versus joining the raw bigram stream
    against the count tables (the naive shape), the stream is shuffled
    once instead of three times and both joins shrink to
    vocab^2-bounded inputs.
    """
    arr = F.regexp_extract_all(
        F.lower(text_col), F.lit(r"[\p{L}\p{N}]+"), F.lit(0)
    )
    toks = documents.select("doc_id", arr.alias("arr"))
    # NB: Spark's arr[i] is 0-based; i ranges over 1-based positions
    bigram_expr = F.expr(
        "transform(sequence(2, size(arr)), i -> struct(arr[i-2] AS prev, arr[i-1] AS w))"
    )
    bg = (
        toks.filter(F.size("arr") >= 2)
        .select("doc_id", F.explode(bigram_expr).alias("b"))
        .select("doc_id", F.col("b.prev").alias("prev"), F.col("b.w").alias("w"))
    )
    uni = (
        toks.select(F.explode("arr").alias("prev"))
        .groupBy("prev")
        .agg(F.count("*").cast("double").alias("c1"))
    )
    vocab = uni.agg(F.count("*").cast("double").alias("v"))
    db = bg.groupBy("doc_id", "prev", "w").agg(
        F.count("*").cast("double").alias("n")
    )
    c2 = db.groupBy("prev", "w").agg(F.sum("n").alias("c2"))
    lp_tab = (
        c2.join(uni, "prev")
        .crossJoin(F.broadcast(vocab))
        .select(
            "prev",
            "w",
            F.log((F.col("c2") + 1.0) / (F.col("c1") + F.col("v"))).alias("lp"),
        )
    )
    return (
        db.join(lp_tab, ["prev", "w"])
        .groupBy("doc_id")
        .agg(
            F.round(
                -(F.sum(F.col("n") * F.col("lp")) / F.sum("n")), 4
            ).alias("ce")
        )
    )


def ccnet_buckets(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al. 2020): docs are
    bucketed by corpus-level terciles of the LM cross-entropy signal —
    head = most fluent third, tail = least. Downstream pipelines keep
    head+middle for pretraining and route tail to re-filtering.

    Plan shape: lm_cross_entropy (two count aggs + one join), then ONE
    1-row exact-percentile agg for the two cut points (algebraic
    partial agg — value->count map state, bounded because ce is rounded
    4dp), broadcast back onto the per-doc frame as a codegen CASE. No
    sort, no collect of doc rows.
    """
    ce = lm_cross_entropy(documents, text_col)
    cuts = ce.agg(
        F.percentile("ce", F.lit(1.0 / 3.0)).alias("c1"),
        F.percentile("ce", F.lit(2.0 / 3.0)).alias("c2"),
    )
    return (
        ce.crossJoin(F.broadcast(cuts))
        .select(
            "doc_id",
            "ce",
            F.when(F.col("ce") <= F.col("c1"), F.lit("head"))
            .when(F.col("ce") <= F.col("c2"), F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("bucket"),
        )
    )


def categorize_text(
    df: DataFrame, text_col: str, k_tokens: int = 3, size: int = 10
) -> DataFrame:
    """ES categorize_text agg (log-message categorization): bucket
    texts by a drain-style token signature — the first `k_tokens`
    analyzer tokens with digit runs normalized to '#'. ES's version
    learns categories with an online tree; the deterministic signature
    is the distributable core (and what its category_key output looks
    like). Top-`size` categories by doc_count.

    One projection + hash agg + TakeOrderedAndProject; the signature is
    pure codegen (no UDF).
    """
    arr = F.regexp_extract_all(
        F.regexp_replace(F.lower(text_col), r"\d+", "#"),
        F.lit(r"[\p{L}\p{N}#]+"),
        F.lit(0),
    )
    key = F.concat_ws(" ", F.slice(arr, 1, k_tokens))
    return (
        df.select(key.alias("category"))
        .filter(F.col("category") != "")
        .groupBy("category")
        .agg(F.count("*").cast("long").alias("doc_count"))
        .orderBy(F.desc("doc_count"), F.asc("category"))
        .limit(size)
    )


def hashed_linear_quality(
    documents: DataFrame, text_col: str = "text", dims: int = 1024
) -> DataFrame:
    """Model-based quality filter plumbing (the fastText/CCNet-classifier
    shape used by LLaMA/RefinedWeb data pipelines): tokens are hashed
    into `dims` feature buckets, a LINEAR model scores the normalized
    bag, sigmoid squashes to [0, 1]:

        h(t)  = int(md5(t)[:6], 16) % dims
        w_b   = 2 * (int(md5(str(b))[:13], 16) / 16^13) - 1   in (-1, 1)
        score = sigmoid( sum_tokens w_{h(t)} / n_tokens )

    The weights are PINNED md5-derived pseudo-weights — the honest
    stand-in for trained parameters (a real classifier swaps the w_b
    expression for a broadcast weight array; the hashing, normalization
    and scoring plumbing is identical). Everything is pure codegen: the
    weight is computed FROM the bucket id, so there is no weight-table
    join at all — one explode + one per-doc agg.
    """
    toks = documents.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(
                F.lower(text_col), F.lit(r"[\p{L}\p{N}]+"), F.lit(0)
            )
        ).alias("t"),
    )
    bucket = (
        F.conv(F.substring(F.md5("t"), 1, 6), 16, 10).cast("long")
        % dims
    )
    w = (
        F.conv(
            F.substring(F.md5(bucket.cast("string")), 1, 13), 16, 10
        ).cast("double")
        / F.lit(float(16**13))
        * 2.0
        - 1.0
    )
    return (
        toks.select("doc_id", w.alias("w"))
        .groupBy("doc_id")
        .agg(
            F.round(
                1.0 / (1.0 + F.exp(-(F.sum("w") / F.count("*")))), 4
            ).alias("clf_score"),
            F.count("*").cast("long").alias("n_tokens"),
        )
    )


# ----------------------------------------------------------- BPE training
def bpe_train(
    documents: DataFrame, n_merges: int = 5, top_guard: int = 1
) -> list[tuple[str, str]]:
    """Train `n_merges` BPE merge rules over the corpus (Sennrich et al.
    2016) — the full iterative loop, where bpe_pair_counts is one step.

    Each iteration: re-tokenize every doc under the merges learned so
    far (an Arrow-batched pandas UDF — the merge list broadcasts with
    the closure), count adjacent symbol pairs corpus-wide in ONE hash
    agg (shuffle bounded by the pair alphabet, never documents), take
    the argmax on the driver (a 1-row collect — the only driver-side
    data is the winning pair), append it to the rule list. O(n_merges)
    Spark jobs; each job's shuffle is alphabet-sized, so the loop costs
    n_merges scans — the canonical distributed-BPE shape (the scan is
    the irreducible cost; at 10^12 docs you train on a sample).

    Ties break lexicographically (count desc, pair asc) so the learned
    rules are deterministic across runs, partitionings, and engines.
    Returns the merge rules in learned order.
    """
    import pandas as pd

    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, StringType

    merges: list[tuple[str, str]] = []

    def _apply_merges(texts: pd.Series, rules: list[tuple[str, str]]) -> pd.Series:
        def one(t: str) -> list[str]:
            syms = list(t)
            for a, b in rules:
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            return syms
        return texts.map(lambda t: one(t or ""))

    base = documents.select("text")
    for _ in range(n_merges):
        rules = list(merges)  # bind current rules into the UDF closure
        tok = F.pandas_udf(
            lambda s: _apply_merges(s, rules), ArrayType(StringType())
        )
        syms = base.select(tok("text").alias("syms")).filter(
            F.size("syms") >= 2
        )
        pairs = syms.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(syms) - 1), "
                    "p -> struct(syms[p - 1] AS a, syms[p] AS b))"
                )
            ).alias("pr")
        )
        top = (
            pairs.groupBy("pr.a", "pr.b")
            .agg(F.count("*").alias("c"))
            .orderBy(F.desc("c"), F.asc("a"), F.asc("b"))
            .limit(top_guard)
            .collect()
        )
        if not top:
            break
        merges.append((top[0]["a"], top[0]["b"]))
    return merges


# ---------------------------------------------------------------------------
# BPE tokenizer APPLICATION (encode) at corpus scale — pure codegen
# ---------------------------------------------------------------------------

# Pinned merge rules in learned order (a prior bpe_train run's output,
# frozen the way a production tokenizer's merges.txt is). Each merged
# symbol is re-encoded as ONE private-use character, which makes a BPE
# merge pass IDENTICAL to leftmost-non-overlapping string replace():
# both scan left to right and consume the pair. Rule 5 references rule
# 1's symbol — a chained merge, exactly how real BPE vocabularies
# compose. With that encoding the whole encode is a chain of replace()
# calls: whole-stage codegen in Spark, plain replace() in the oracle,
# no Python in the hot path and nothing but the text column scanned.
BPE_APPLY_RULES: list[tuple[str, str]] = [
    ("er", "\ue000"),
    ("th", "\ue001"),
    ("an", "\ue002"),
    ("in", "\ue003"),
    ("\ue000s", "\ue004"),  # ("er", "s") on the encoded stream
]


def py_bpe_encode(text: str) -> list[str]:
    """Pure-Python symbol-pass twin of the replace() chain (the
    classical BPE apply loop) — pytest asserts the equivalence."""
    syms = list(text or "")
    for pair, sym in BPE_APPLY_RULES:
        a, b = pair[0], pair[1:]
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(sym)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_encode_stats(documents: DataFrame) -> DataFrame:
    """Encode every document with the pinned BPE merges and report
    (doc_id, n_syms, fertility = chars per symbol).

    This is the APPLY side of ops.textstats.bpe_train: a trained
    tokenizer run over the corpus (the token-count step every training
    pipeline does before packing). Fertility is the standard
    tokenizer-quality metric (chars compressed per emitted symbol).
    The encode itself is a chain of replace() expressions — stays in
    whole-stage codegen, shuffles nothing, and fuses into the scan.
    """
    e = F.col("text")
    for search, sym in BPE_APPLY_RULES:
        e = F.replace(e, F.lit(search), F.lit(sym))
    return documents.select(
        "doc_id",
        F.length(e).cast("long").alias("n_syms"),
        F.coalesce(
            F.round(
                F.length("text").cast("double")
                / F.nullif(F.length(e), F.lit(0)),
                4,
            ),
            F.lit(0.0),
        ).alias("fertility"),
    )


GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_filter(documents: DataFrame) -> DataFrame:
    """Gopher quality rules (Rae et al. 2021, Appendix A — the named
    document-level filter most open web corpora reuse: Dolma,
    RefinedWeb, FineWeb all start from it):

      R1  50 <= word count <= 100,000            (whitespace words)
      R2  3 <= mean word length <= 10
      R3  symbol-to-word ratio <= 0.1            ('#' and '...')
      R4  <= 90% of lines start with a bullet    (-, *, •)
      R5  <= 30% of lines end with an ellipsis
      R6  >= 80% of words contain an alphabetic character
      R7  >= 2 of the 8 Gopher stop words occur

    -> (doc_id, n_words, mean_word_len, symbol_ratio, bullet_frac,
        ellipsis_frac, alpha_frac, stop_hits, keep). All ratios 4dp;
    `keep` is evaluated on the ROUNDED values so the DuckDB oracle
    agrees bit-for-bit at rule boundaries. Pure whole-stage codegen
    (regexp + higher-order array functions) fusing into the scan —
    text never crosses a shuffle, so the filter runs at scan bandwidth
    at any corpus size.
    """
    stops = " + ".join(
        f"int(array_contains({_TOKENS}, '{w}'))" for w in GOPHER_STOPS
    )
    d = documents.selectExpr(
        "doc_id",
        r"size(regexp_extract_all(text, '\\S+', 0)) as n_words",
        r"aggregate(regexp_extract_all(text, '\\S+', 0), 0L,"
        r" (a, w) -> a + length(w)) as sum_wlen",
        r"size(filter(regexp_extract_all(text, '\\S+', 0),"
        r" w -> w rlike '[A-Za-z]')) as n_alpha",
        r"regexp_count(text, '#') + regexp_count(text, '\\.\\.\\.') as n_sym",
        r"size(filter(split(text, '\n'), l -> ltrim(l) rlike '^[-*•]'))"
        r" as n_bullet",
        r"size(filter(split(text, '\n'),"
        r" l -> rtrim(l) rlike '(\\.\\.\\.|…)$')) as n_ell",
        r"greatest(size(split(text, '\n')), 1) as nl",
        f"({stops}) as stop_hits",
    )
    nw = F.greatest(F.col("n_words"), F.lit(1))
    mean_wlen = F.round(F.col("sum_wlen") / nw, 4)
    sym = F.round(F.col("n_sym") / nw, 4)
    bullet = F.round(F.col("n_bullet") / F.col("nl"), 4)
    ell = F.round(F.col("n_ell") / F.col("nl"), 4)
    alpha = F.round(F.col("n_alpha") / nw, 4)
    keep = (
        (F.col("n_words") >= 50)
        & (F.col("n_words") <= 100_000)
        & (mean_wlen >= 3.0)
        & (mean_wlen <= 10.0)
        & (sym <= 0.1)
        & (bullet <= 0.9)
        & (ell <= 0.3)
        & (alpha >= 0.8)
        & (F.col("stop_hits") >= 2)
    )
    return d.select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        mean_wlen.alias("mean_word_len"),
        sym.alias("symbol_ratio"),
        bullet.alias("bullet_frac"),
        ell.alias("ellipsis_frac"),
        alpha.alias("alpha_frac"),
        F.col("stop_hits").cast("long").alias("stop_hits"),
        keep.alias("keep"),
    )
