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
