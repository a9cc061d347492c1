"""Doc registry: deterministic dense doc_ids, doc lengths, collection stats.

Lucene analogue: the doc store + norms + collection statistics that feed
BM25 (mario delegates all of this to OpenSearch; the `_id` it assigns is
the record's TimdexRecordId, /root/reference/pkg/client/elastic.go:103-107).

Scale notes:
- doc_id assignment uses the partition-offset technique: range-partition
  by the natural key (url), sort within partitions, then add per-partition
  base offsets computed from a small driver-side count. This avoids the
  classic `row_number().over(Window.orderBy(...))` trap, which collapses
  the whole table into ONE partition for the global sort.
- Result is deterministic for a given dataset + partition count (ids
  follow url order), which is what makes index builds reproducible and
  resumable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mario_spark.analyze import extract_udf, tokenize_count_udf, tokenize_expr


def assign_doc_ids(
    df: DataFrame, order_col: str = "url", num_partitions: int | None = None
) -> DataFrame:
    """Add a dense, deterministic `doc_id` (long, 0-based, url-ordered).

    Ids are a pure function of the dataset + partition count (NOT of
    cluster size or task scheduling), which keeps index builds
    reproducible and resumable. Callers should project away heavy
    columns (html!) before calling — the range shuffle and the window
    sort move whole rows.
    """
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # no sortWithinPartitions here: the row_number window below performs
    # the per-partition sort; sorting twice was pure waste.
    # Tie-break: duplicate order_col values (equal range keys land in one
    # partition) get a deterministic content-hash tiebreaker, so ids are
    # stable across runs even with duplicate urls — the pinned-id
    # guarantee resume and byte-identical rebuilds depend on.
    tiebreak = F.xxhash64(*[c for c in df.columns if c != order_col])
    d = df.repartitionByRange(parts, order_col).withColumn(
        "_pid", F.spark_partition_id()
    )
    d = d.persist()
    counts = {r["_pid"]: r["cnt"] for r in d.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    w = Window.partitionBy("_pid").orderBy(F.col(order_col), tiebreak)
    if len(offsets) <= 65536:
        # The per-partition offsets are already ON THE DRIVER, so inline
        # them as a Catalyst map literal — zero extra stages, no
        # createDataFrame round trip (a local-list DataFrame costs a
        # PythonRDD materialization + a broadcast exchange; measured as
        # a multi-second SERIAL stage per build under local-cluster),
        # and the lookup fuses into the window projection.
        mapping = F.create_map(
            *[F.lit(x) for pid, off in offsets.items() for x in (pid, off)]
        )
        return (
            d.withColumn(
                "doc_id",
                (
                    F.element_at(mapping, F.col("_pid"))
                    + F.row_number().over(w)
                    - 1
                ).cast("long"),
            )
            .drop("_pid")
        )
    # A plan literal with >64k entries risks Catalyst bloat (a 10^12-doc
    # build with ~10^5+ range partitions); fall back to a broadcast dim.
    off_df = df.sparkSession.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "_pid int, _offset long"
    ).coalesce(1)
    out = (
        d.join(F.broadcast(off_df), "_pid")
        .withColumn("doc_id", (F.col("_offset") + F.row_number().over(w) - 1).cast("long"))
        .drop("_pid", "_offset")
    )
    return out


def build_doc_table(
    pages: DataFrame, extract_html: bool = False, positions: bool = False
) -> DataFrame:
    """pages -> docs(doc_id, url, lang, len, tf_map | pos_map).

    Stages: (optional) html->text extraction; slim projection (html and
    any other heavy columns are dropped BEFORE the doc-id range shuffle);
    dense doc_id assignment (kept if the source already has one); fused
    tokenize+count pandas UDF producing tf_map; len = sum(tf) (the
    Lucene norm input) computed JVM-side from the map.

    positions=True swaps the fused UDF for the positional one: pos_map =
    map<term, [token ordinals]> (tf = array size). Downstream
    (term_frequencies -> encode) auto-detects the column and emits the
    positional block schema, which serves BOTH plain BM25/WAND queries
    and match_phrase — Lucene's indexed-with-positions field, exactly.
    """
    from mario_spark.analyze import tokenize_positions_udf

    d = pages
    if extract_html:
        d = d.withColumn("text", extract_udf("html"))
    keep = [c for c in ("doc_id", "url", "lang", "text") if c in d.columns]
    d = d.select(*keep)
    if "doc_id" not in d.columns:
        d = assign_doc_ids(d)
    if positions:
        d = d.withColumn("pos_map", tokenize_positions_udf("text")).drop("text")
        return d.withColumn(
            "len",
            F.aggregate(
                F.map_values("pos_map"),
                F.lit(0).cast("long"),
                lambda acc, x: acc + F.size(x).cast("long"),
            ),
        )
    d = d.withColumn("tf_map", tokenize_count_udf("text")).drop("text")
    return d.withColumn(
        "len",
        F.aggregate(
            F.map_values("tf_map"),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x.cast("long"),
        ),
    )


def corpus_stats(docs: DataFrame) -> DataFrame:
    """Collection stats feeding BM25: (n_docs, avgdl). Single global agg."""
    return docs.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.avg("len").alias("avgdl"),
    )
