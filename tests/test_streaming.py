"""Structured Streaming smoke (SURVEY §2.3: mario is finite-batch, so
streaming is a declared non-goal — but the engine's windowed-agg plan
must be streaming-READY: the same F.window + agg expression, fed by
readStream with a watermark, has to produce the batch answer when the
stream drains). availableNow processes the backlog incrementally in
bounded batches — exactly how the 100TB ingest would catch up."""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_events_windowed_streaming_matches_batch(spark, tmp_path):
    e = spark.read.parquet(f"{SF_DIR}/events.parquet")
    src = str(tmp_path / "events_stream")
    # multiple files so availableNow actually exercises incremental
    # micro-batches rather than one degenerate batch
    e.repartition(4).write.parquet(src)

    stream = spark.readStream.schema(e.schema).parquet(src)
    agg = (
        stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sv"))
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = spark.sql(
        "SELECT count(*) AS c, sum(n) AS s, round(sum(sv), 2) AS v "
        "FROM win_stream"
    ).collect()[0]
    batch = (
        e.withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sv"))
        .agg(
            F.count("*").alias("c"),
            F.sum("n").alias("s"),
            F.round(F.sum("sv"), 2).alias("v"),
        )
        .collect()[0]
    )
    assert got["c"] == batch["c"] > 0
    assert got["s"] == batch["s"]
    assert abs(float(got["v"]) - float(batch["v"])) < 1e-6


def test_streaming_ingest_foreachbatch(spark, tmp_path):
    """Streaming INGEST: pages arrive as a file stream; foreachBatch
    appends each micro-batch into a persistent Index (the 100TB
    catch-up shape: availableNow + bounded batches + idempotent
    per-segment commits). The drained streamed index must score
    queries identically to a one-shot batch build over the same pages
    (compared on (score, url) — doc ids legitimately differ because
    each batch gets its own id block)."""
    import pandas as pd

    from mario_spark.fixtures import (
        make_pages_query_set,
        pages_df,
        query_terms_df,
    )
    from mario_spark.index import Catalog

    pages = pages_df(spark, 400, seed=7, partitions=4)
    src = str(tmp_path / "pages_stream")
    pages.write.parquet(src)

    cat = Catalog(spark, str(tmp_path / "cat"))
    idx = cat.create("pages-2026-01-01t00-00-00z")

    stream = (
        spark.readStream.schema(pages.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )

    def fb(batch_df, batch_id):
        if batch_df.count():
            idx.append(batch_df)

    q = (
        stream.writeStream.foreachBatch(fb)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert idx.stats()["n_docs"] == 400
    assert idx.stats()["segments"] >= 2  # really incremental

    ref = cat.create("ref-2026-01-01t00-00-00z")
    ref.ingest(pages)
    qs = query_terms_df(spark, make_pages_query_set(seed=7, n=6))

    def canon(ix):
        # FULL ranking (k = corpus size): a top-10 cut can legitimately
        # admit different members of an equal-score tie block because
        # the tie-break is doc_id and the two indexes id docs
        # differently; the full result set is id-independent
        res = ix.search(qs, k=400)
        urls = ix.docs().select("doc_id", "url")
        return (
            res.join(urls, "doc_id")
            .select("query_id", "score", "url")
            .toPandas()
            .sort_values(
                ["query_id", "score", "url"],
                ascending=[True, False, True],
                ignore_index=True,
            )
        )

    pd.testing.assert_frame_equal(
        canon(idx), canon(ref), check_exact=False, atol=1e-9
    )


def test_stateful_custom_operator_matches_batch(spark, tmp_path):
    """applyInPandasWithState: per-user running totals accumulated in
    GroupState across bounded micro-batches equal the batch groupBy
    when the stream drains (the custom-stateful-operator escape hatch
    the brief names for semantics window/agg can't express)."""
    from mario_spark.streaming import stateful_user_stats

    e = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "user_id", "value"
    )
    src = str(tmp_path / "ev_state_stream")
    e.repartition(4).write.parquet(src)

    stream = spark.readStream.schema(e.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        stateful_user_stats(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("state_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    # update mode emits one row per (key, batch); totals are monotone,
    # so the FINAL state per key is the max
    got = spark.sql(
        "SELECT user_id, max(n_events) AS n, max(sum_value) AS sv "
        "FROM state_stream GROUP BY user_id"
    )
    batch = e.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 4).alias("sv"),
    )
    g = {r["user_id"]: (r["n"], r["sv"]) for r in got.collect()}
    b = {r["user_id"]: (r["n"], r["sv"]) for r in batch.collect()}
    assert set(g) == set(b) and len(b) > 0
    for k in b:
        assert g[k][0] == b[k][0]
        assert abs(g[k][1] - b[k][1]) < 1e-6


def test_streaming_upsert_cdc_shape(spark, tmp_path):
    """CDC-style streaming ingest: a later micro-batch RE-SENDS some
    urls with changed text; foreachBatch(upsert) must leave exactly one
    live version per url — the latest — and searches must reflect it."""
    import pyspark.sql.functions as F

    from mario_spark.fixtures import pages_df, query_terms_df
    from mario_spark.index import Catalog

    base = pages_df(spark, 300, seed=9, partitions=2)
    updated = (
        base.orderBy("url")
        .limit(30)
        .withColumn("text", F.concat(F.lit("zzzcdc marker "), F.col("text")))
    )
    src = str(tmp_path / "cdc_stream")
    # batch files arrive in order: full corpus, then the update wave
    base.coalesce(1).write.parquet(src)
    updated.coalesce(1).write.mode("append").parquet(src)

    cat = Catalog(spark, str(tmp_path / "cat"))
    idx = cat.create("cdc-2026-01-01t00-00-00z")

    stream = (
        spark.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )

    def fb(batch_df, batch_id):
        if batch_df.count():
            idx.upsert(batch_df)

    q = (
        stream.writeStream.foreachBatch(fb)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    # one live version per url
    live = idx.docs()
    dele = idx.deleted_ids()
    if dele is not None:
        live = live.join(dele, "doc_id", "left_anti")
    assert live.count() == 300
    assert live.select("url").distinct().count() == 300

    # the update wave is searchable; exactly the 30 re-sent urls match
    hits = idx.search(
        query_terms_df(spark, [(0, "zzzcdc")]), k=100
    ).join(idx.docs(), "doc_id")
    upd_urls = {r["url"] for r in updated.select("url").collect()}
    assert {r["url"] for r in hits.collect()} == upd_urls
