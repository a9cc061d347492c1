"""Near-duplicate detection: MinHash+LSH, SimHash, n-gram Jaccard.

These are the scale-path dedup operators of a training-data pipeline
(exact dedup lives in suite.exact_dedup_* as a hash-groupBy). All
hashing is built from md5 so the DuckDB oracles compute bit-identical
values — `min(md5(token || '#' || i))` is a valid min-wise hash family
(lexicographic order on the hex digest), and SimHash nibbles come from
hex-digit parsing available in both engines.

Scale notes (the 100TB story):
- MinHash signatures: one explode + one partial/final min-agg per hash;
  shuffle is by doc_id and carries 8 x 32-byte digests per doc, never
  token lists.
- LSH banding: candidate generation is a self-equi-join on the band
  key — Catalyst plans a shuffled hash join keyed on tiny digests; only
  same-bucket pairs are ever materialized (quadratic blowup is confined
  to buckets, which banding keeps small).
- Verification joins (exact Jaccard) touch candidate pairs only.
- SimHash: fully JVM-side generated SQL (no Python), one agg per doc;
  the O(pairs) hamming join here is the sandbox demo — at scale you
  band on simhash prefixes exactly like MinHash-LSH.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mario_spark.analyze import tokenize_udf

N_MINHASH = 8
N_BANDS = 4  # rows-per-band = 2
JACCARD_THRESHOLD = 0.5
NGRAM_K = 5
NGRAM_JACCARD_THRESHOLD = 0.8
SIMHASH_HAMMING_MAX = 6

_POPCOUNT4 = "0112122312232334"  # popcount lookup for a nibble


def distinct_terms(documents: DataFrame) -> DataFrame:
    """(doc_id, term) distinct pairs via the pinned tokenizer."""
    return (
        documents.select(
            "doc_id", F.explode(tokenize_udf("text")).alias("term")
        ).distinct()
    )


def minhash_signatures(documents: DataFrame, n_hashes: int = N_MINHASH) -> DataFrame:
    """-> (doc_id, mh0..mh{n-1}): lexicographic-min md5 per salt."""
    t = distinct_terms(documents)
    aggs = [
        F.min(F.md5(F.concat_ws("#", "term", F.lit(str(i))))).alias(f"mh{i}")
        for i in range(n_hashes)
    ]
    return t.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(
    documents: DataFrame,
    n_hashes: int = N_MINHASH,
    n_bands: int = N_BANDS,
    threshold: float = JACCARD_THRESHOLD,
) -> DataFrame:
    """Banded-LSH candidates, verified by exact Jaccard.

    -> (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard >= threshold,
    jaccard rounded to 4dp.
    """
    rows_per_band = n_hashes // n_bands
    sigs = minhash_signatures(documents, n_hashes)
    bands = None
    for b in range(n_bands):
        cols = [f"mh{b * rows_per_band + r}" for r in range(rows_per_band)]
        part = sigs.select(
            "doc_id", F.md5(F.concat_ws("|", *cols)).alias("band_key")
        )
        bands = part if bands is None else bands.unionByName(part)
    l, r = bands.alias("l"), bands.alias("r")
    cand = (
        l.join(r, F.col("l.band_key") == F.col("r.band_key"))
        .filter(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(
            F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b")
        )
        .distinct()
    )
    return _verify_jaccard(distinct_terms(documents), cand, threshold)


def _verify_jaccard(
    terms: DataFrame, cand: DataFrame, threshold: float
) -> DataFrame:
    sizes = terms.groupBy("doc_id").agg(F.count("*").alias("sz"))
    ta = terms.select(F.col("doc_id").alias("doc_a"), "term")
    tb = terms.select(F.col("doc_id").alias("doc_b"), "term")
    inter = (
        cand.join(ta, "doc_a")
        .join(tb, ["doc_b", "term"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("szb"))
    return (
        inter.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")), 4
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# ------------------------------------------------------------------ SimHash
def _nib(expr: str, p: int, dialect: str) -> str:
    """Hex digit p of md5(expr) as an int, per SQL dialect."""
    if dialect == "spark":
        return f"cast(conv(substr({expr}, {p}, 1), 16, 10) as int)"
    return f"('0x' || substr({expr}, {p}, 1))::INT"


def simhash_sql(term_col: str, tf_col: str, dialect: str = "spark") -> str:
    """Generated SQL for a tf-weighted 64-bit SimHash as 16 hex chars.

    The SAME generator emits the Spark expression and the DuckDB oracle
    (only the hex-digit parse differs), so the two engines compute
    bit-identical hashes: for each md5 nibble position p and bit b, sum
    tf * (+1/-1); output nibble = majority bits re-packed. Runs entirely
    in whole-stage codegen (no UDF).
    """
    outs = []
    for p in range(1, 17):
        nib = _nib(f"md5({term_col})", p, dialect)
        bits = []
        for b in range(4):
            bit = f"mod(cast(floor({nib} / {1 << b}) as int), 2)"
            s = f"sum({tf_col} * (2 * {bit} - 1))"
            bits.append(f"(case when {s} > 0 then {1 << b} else 0 end)")
        outs.append(
            f"substr('0123456789abcdef', ({' + '.join(bits)}) + 1, 1)"
        )
    return "concat(" + ", ".join(outs) + ")"


def simhash64(documents: DataFrame) -> DataFrame:
    """-> (doc_id, simhash hex-16), tf-weighted over tokens."""
    tf = (
        documents.select("doc_id", F.explode(tokenize_udf("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    return (
        tf.groupBy("doc_id")
        .agg(F.expr(simhash_sql("term", "tf")).alias("simhash"))
    )


def hamming_sql(a: str, b: str, dialect: str = "spark") -> str:
    """Generated SQL: hamming distance of two 16-hex simhashes."""
    parts = []
    for p in range(1, 17):
        na = _nib(a, p, dialect)
        nb = _nib(b, p, dialect)
        x = f"({na} ^ {nb})" if dialect == "spark" else f"xor({na}, {nb})"
        parts.append(
            f"cast(substr('{_POPCOUNT4}', {x} + 1, 1) as int)"
        )
    return " + ".join(parts)


def simhash_pairs(
    documents: DataFrame, max_hamming: int = SIMHASH_HAMMING_MAX
) -> DataFrame:
    """-> (doc_a, doc_b, hamming) for pairs within max_hamming bits."""
    sh = simhash64(documents)
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sa"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sb"))
    return (
        a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", F.expr(hamming_sql("sa", "sb")).cast("long"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


# ------------------------------------------------------------ n-gram Jaccard
def char_ngrams(documents: DataFrame, k: int = NGRAM_K) -> DataFrame:
    """(doc_id, gram) distinct character k-grams, JVM-side."""
    return (
        documents.select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(1), F.greatest(F.length("text") - (k - 1), F.lit(0)))
            ).alias("p"),
            "text",
        )
        .select("doc_id", F.expr(f"substr(text, p, {k})").alias("gram"))
        .distinct()
    )


def ngram_jaccard_pairs(
    documents: DataFrame,
    k: int = NGRAM_K,
    threshold: float = NGRAM_JACCARD_THRESHOLD,
) -> DataFrame:
    """1-band min-wise LSH on char k-grams + exact Jaccard verify.

    Candidate pairs share the minimum md5(gram) (valid min-wise
    collision: P[min-hash equal] = Jaccard); verified exactly.
    -> (doc_a, doc_b, jaccard) rounded 4dp, >= threshold.
    """
    grams = char_ngrams(documents, k)
    mins = grams.groupBy("doc_id").agg(F.min(F.md5("gram")).alias("mg"))
    a = mins.select(F.col("doc_id").alias("doc_a"), F.col("mg").alias("ma"))
    b = mins.select(F.col("doc_id").alias("doc_b"), F.col("mg").alias("mb"))
    cand = (
        a.join(b, F.col("ma") == F.col("mb"))
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
    )
    g = grams.withColumnRenamed("gram", "term")
    return _verify_jaccard(g, cand, threshold)
