"""Training-data export sinks.

A 100TB pipeline ends in a WRITE: sharded parquet/JSONL the trainer's
data loader streams. The writer here produces size-balanced,
deterministically-assigned shards plus a manifest the loader (and a
resume) can trust — the same marker-file commit discipline as the
index segments.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_shards(
    df: DataFrame,
    out_dir: str,
    n_shards: int,
    key_col: str = "doc_id",
    fmt: str = "parquet",
) -> list[dict]:
    """Write `df` as exactly `n_shards` deterministic shards:
    shard = crc32(key) % n_shards — stable across runs and engines, so
    re-exports land every row in the same shard (resume/diff-ability),
    unlike Spark's nondeterministic round-robin repartition. Each
    shard is one output task (repartition BY the shard column), sized
    ~|df|/n_shards by the hash balance.

    Returns (and writes as _manifest.json, atomically, LAST) the shard
    manifest: [{shard, rows, bytes, path}] — written only after every
    shard committed, so a crashed export is invisible to loaders.
    """
    shard = (F.crc32(F.col(key_col).cast("string")) % n_shards).cast("int")
    tmp = df.withColumn("_shard", shard).repartition(n_shards, "_shard")
    (
        tmp.write.mode("overwrite")
        .partitionBy("_shard")
        .format(fmt)
        .save(out_dir)
    )
    manifest = []
    for s in range(n_shards):
        p = os.path.join(out_dir, f"_shard={s}")
        if not os.path.isdir(p):
            manifest.append({"shard": s, "rows": 0, "bytes": 0, "path": p})
            continue
        size = sum(
            os.path.getsize(os.path.join(p, f))
            for f in os.listdir(p)
            if not f.startswith(("_", "."))
        )
        rows = df.sparkSession.read.format(fmt).load(p).count()
        manifest.append({"shard": s, "rows": rows, "bytes": size, "path": p})
    mpath = os.path.join(out_dir, "_manifest.json")
    tmp_path = mpath + ".tmp"
    with open(tmp_path, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp_path, mpath)
    return manifest
