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
