"""C4-style training-corpus cleanup cascade: one composed pass that
every LLM-data pipeline runs before training — language filter,
quality filter, exact-dedup keeper selection, and benchmark
decontamination — emitting a per-doc decision table.

Composition is where a pipeline engine earns its keep at 100TB: each
stage here is an already-verified operator (ops.textstats.lang_id,
ops.textstats.quality_score, the md5 hash-groupBy dedup,
ops.dedup.ngram_decontaminate), and the cascade is pure DataFrame
joins on doc_id, so Catalyst fuses the scans (documents is read once
per independent aggregation shape, not once per flag) and every join
key is the 8-byte doc_id — text never crosses a shuffle."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mario_spark.ops.dedup import ngram_decontaminate
from mario_spark.ops.textstats import lang_id, quality_score

# quality in {0, .3, .4, .6, .7, 1.0}; 0.65 keeps the top two tiers
# without sitting on a float boundary
QUALITY_MIN = 0.65


def clean_corpus(
    documents: DataFrame, quality_min: float = QUALITY_MIN
) -> DataFrame:
    """-> (doc_id, is_en, quality, dup_loser, contaminated, keep).

    keep = predicted-English AND quality > quality_min AND not an
    exact-duplicate loser (doc_id != min doc_id of its text-md5 group)
    AND not sharing an 8-gram with the benchmark stand-in. Flags are
    0/1 BIGINTs (engine-portable hashing).
    """
    li = lang_id(documents).select(
        "doc_id", (F.col("pred_lang") == "en").alias("is_en")
    )
    qs = quality_score(documents).select("doc_id", "quality")
    h = F.md5(F.encode("text", "utf-8"))
    keepers = documents.groupBy(h.alias("h")).agg(
        F.min("doc_id").alias("keeper")
    )
    dup = (
        documents.select("doc_id", h.alias("h"))
        .join(keepers, "h")
        .select("doc_id", (F.col("doc_id") != F.col("keeper")).alias("dup_loser"))
    )
    contam = ngram_decontaminate(documents).select(
        "doc_id", F.lit(True).alias("contaminated")
    )
    out = (
        documents.select("doc_id")
        .join(li, "doc_id")
        .join(qs, "doc_id")
        .join(dup, "doc_id")
        .join(contam, "doc_id", "left")
        .withColumn("contaminated", F.coalesce("contaminated", F.lit(False)))
        .withColumn(
            "keep",
            F.col("is_en")
            & (F.col("quality") > quality_min)
            & ~F.col("dup_loser")
            & ~F.col("contaminated"),
        )
    )
    return out.select(
        "doc_id",
        F.col("is_en").cast("long").alias("is_en"),
        "quality",
        F.col("dup_loser").cast("long").alias("dup_loser"),
        F.col("contaminated").cast("long").alias("contaminated"),
        F.col("keep").cast("long").alias("keep"),
    )


def c4_line_filter(documents: DataFrame) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020): split the doc
    into lines, keep only lines that end in terminal punctuation AND
    have >= 5 words, keep only docs with >= 3 surviving lines, and
    rewrite the doc from the survivors.

    The synthetic corpus has no newlines or punctuation, so the line
    structure is constructed deterministically (8-token chunks; a chunk
    "ends in terminal punctuation" iff its first token sorts < 'm') —
    the operator's SHAPE is the real C4 pass: line split -> per-line
    predicate -> doc-level min-lines gate -> rewrite. Everything is
    higher-order-function codegen over the token array: one scan, no
    UDF, no shuffle; the rewritten text never leaves the row.

    -> (doc_id, n_lines, n_kept, kept_doc 0/1, clean_hash).
    """
    arr = F.split(F.col("text"), " ")
    nchunks = F.ceil(F.size(arr) / F.lit(8.0)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), nchunks - 1),
        lambda i: F.slice(arr, i * 8 + 1, 8),
    )
    kept = F.filter(
        chunks,
        lambda c: (F.element_at(c, 1) < F.lit("m")) & (F.size(c) >= 5),
    )
    clean = F.array_join(
        F.transform(
            kept, lambda c: F.concat(F.array_join(c, " "), F.lit("."))
        ),
        " ",
    )
    return documents.select(
        "doc_id",
        F.size(chunks).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        (F.size(kept) >= 3).cast("long").alias("kept_doc"),
        F.md5(F.encode(clean, "utf-8")).alias("clean_hash"),
    )
