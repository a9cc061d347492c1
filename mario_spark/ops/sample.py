"""Corpus shaping for training-data pipelines: deterministic
stratified sampling and GPT-style sequence packing.

Both are the last-mile ops between a cleaned corpus (ops.pipeline) and
a tokenized training run:

- stratified_sample: per-stratum (e.g. per-language) Bernoulli sampling
  with a DETERMINISTIC hash coin — u = first 13 hex chars of
  md5(doc_id) / 16^13, keep iff u < rate(stratum). Deterministic means
  reproducible runs, engine-portable oracles, and — crucial at 100TB —
  a pure map-side filter: no RNG state, no shuffle, pushes right after
  the scan.
- pack_sequences: the document-concatenation packing GPT-style
  pretraining uses — docs are laid head-to-tail per shard in doc_id
  order and the byte stream is cut every `seq_len` tokens; a doc's
  chunk is floor(start_offset / seq_len). One running-sum window per
  shard (shard = doc_id % n_shards), parallel across shards — never a
  global sort. Token counts use the same BPE-ish JVM regexp as
  suite.token_count_bpe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 16^13 = 2^52: largest power of 16 exactly representable in a double
# (same constant as ops.aggs.cardinality_kmv)
_DENOM = float(16**13)

_BPE_PAT = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def hash_unit(col):
    """Deterministic u in [0, 1) from any column (md5-based)."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.conv(
            F.substring(F.md5(F.encode(c.cast("string"), "utf-8")), 1, 13),
            16,
            10,
        ).cast("double")
        / _DENOM
    )


def stratified_sample(
    documents: DataFrame,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """-> (doc_id, stratum, u) for kept docs. rates maps stratum value
    -> keep probability; unlisted strata use default_rate. The filter
    is a pure projection predicate (codegen, zero shuffle), so at 100TB
    it fuses into the scan."""
    u = hash_unit("doc_id")
    rate = F.lit(float(default_rate))
    for k, v in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == k, F.lit(float(v))).otherwise(rate)
    return (
        documents.select(
            "doc_id",
            F.col(stratum_col).alias("stratum"),
            F.round(u, 8).alias("u"),
            rate.alias("_rate"),
        )
        .filter(F.col("u") < F.col("_rate"))
        .drop("_rate")
    )


def pack_sequences(
    documents: DataFrame, seq_len: int = 2048, n_shards: int = 8
) -> DataFrame:
    """-> (doc_id, shard, n_tokens, start_offset, chunk_id): the
    concat-then-chunk layout of GPT-style pretraining. Within a shard,
    docs concatenate in doc_id order; start_offset is the running token
    sum before the doc; chunk_id = start_offset // seq_len (the
    training sequence whose window the doc starts in)."""
    toks = F.size(
        F.regexp_extract_all(F.lower("text"), F.lit(_BPE_PAT), F.lit(0))
    ).cast("long")
    d = documents.select(
        "doc_id",
        (F.col("doc_id") % n_shards).cast("long").alias("shard"),
        toks.alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return d.select(
        "doc_id",
        "shard",
        "n_tokens",
        (cum - F.col("n_tokens")).cast("long").alias("start_offset"),
        F.floor((cum - F.col("n_tokens")) / seq_len).cast("long").alias("chunk_id"),
    )


def cap_per_host(
    documents_with_host: DataFrame,
    n_per_host: int,
    quality_col: str = "quality",
) -> DataFrame:
    """Per-host document cap (the Dolma/RefinedWeb curation rule: no
    single domain may dominate the training mix): keep the top
    `n_per_host` docs of each host by quality, deterministic doc_id
    tie-break. The rank window partitions BY HOST — embarrassingly
    parallel, no global sort; hosts are the natural unit of skew, and a
    mega-host's window is still bounded by that host's docs within its
    hash partition (salting is unnecessary because the output is capped
    at n_per_host rows per host anyway — rank beyond the cap is
    filtered before any downstream shuffle)."""
    w = Window.partitionBy("host").orderBy(
        F.desc(quality_col), F.asc("doc_id")
    )
    return (
        documents_with_host.withColumn(
            "host_rank", F.row_number().over(w).cast("long")
        )
        .filter(F.col("host_rank") <= n_per_host)
    )


def host_reputation(
    documents_with_host: DataFrame,
    quality_col: str = "quality",
    drop_quantile: float = 0.25,
) -> DataFrame:
    """Host-level reputation filter (the domain-granularity half of
    RefinedWeb/Dolma curation, complementing the per-host doc cap):
    aggregate each host's mean quality and doc count, then mark every
    host whose mean falls below the corpus-wide `drop_quantile` of
    host means as dropped — removing a spammy DOMAIN outright rather
    than scoring its docs one by one.
    -> (host, n_docs, mean_q, keep).

    Scale shape: one host-keyed hash agg (map-side combinable; the
    host table at web scale is ~1e8 rows — far too big to broadcast,
    and nothing here needs to), one 1-row exact-percentile agg over
    the host MEANS broadcast back as a literal-sized crossJoin, one
    codegen comparison. Docs never re-shuffle; callers semi-join kept
    hosts against the corpus on the host key.
    """
    hosts = documents_with_host.groupBy("host").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.round(F.avg(quality_col), 4).alias("mean_q"),
    )
    cut = hosts.agg(
        F.percentile("mean_q", F.lit(drop_quantile)).alias("cut")
    )
    return hosts.crossJoin(F.broadcast(cut)).select(
        "host",
        "n_docs",
        "mean_q",
        (F.col("mean_q") >= F.col("cut")).alias("keep"),
    )


PACK_SCHEMA = (
    "doc_id long, shard long, piece_idx long, n_tokens long, "
    "bin_id long, bin_fill long"
)


def pack_best_fit(
    documents: DataFrame, seq_len: int = 2048, n_shards: int = 8
) -> DataFrame:
    """Best-fit sequence packing (Ding et al. 2024, the Llama-3 layout;
    contrast pack_sequences' concat-then-chunk, which truncates ~one
    doc at every sequence boundary): a doc shorter than `seq_len` is
    NEVER split — docs are bin-packed first-fit-decreasing into
    sequences per shard. Docs longer than seq_len first shed
    floor(n/L) full-sequence pieces (each its own bin); the remainder
    joins the FFD pool. -> one row per piece:
    (doc_id, shard, piece_idx, n_tokens, bin_id, bin_fill), bin ids
    dense per shard, full-piece bins first.

    Scale shape: ONE hash shuffle on shard (shard = doc_id % n_shards —
    size n_shards to keep each group's piece list task-sized, e.g.
    corpus_docs / 1e5 at 10^12 docs), then an Arrow-batched
    applyInPandas kernel per shard. The kernel carries (doc_id,
    n_tokens) pairs only — text never leaves the scan. FFD here is the
    simple O(pieces x bins) scan (fine at task size); swap in the
    segment-tree best-fit for multi-million-piece shards. Deterministic:
    ties break on (len desc, doc_id, piece_idx), so reruns and engines
    agree bit-for-bit.
    """
    import pandas as pd

    L = int(seq_len)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0]) if len(pdf) else 0
        pieces = []  # (len, doc_id, piece_idx, is_full)
        for doc_id, n in sorted(
            zip(pdf["doc_id"].tolist(), pdf["n_tokens"].tolist())
        ):
            n = int(n)
            full, rem = divmod(n, L)
            for i in range(full):
                pieces.append((L, int(doc_id), i, True))
            if rem > 0 or n == 0:
                pieces.append((rem, int(doc_id), full, False))
        out = []  # rows: doc_id, piece_idx, len, bin_id
        next_bin = 0
        for ln, doc_id, idx, _ in (p for p in pieces if p[3]):
            out.append((doc_id, idx, ln, next_bin))
            next_bin += 1
        bins: list[int] = []  # remaining capacity by (bin_id - base)
        base = next_bin
        ffd = sorted(
            (p for p in pieces if not p[3]),
            key=lambda p: (-p[0], p[1], p[2]),
        )
        for ln, doc_id, idx, _ in ffd:
            for b, cap in enumerate(bins):
                if cap >= ln:
                    bins[b] = cap - ln
                    out.append((doc_id, idx, ln, base + b))
                    break
            else:
                bins.append(L - ln)
                out.append((doc_id, idx, ln, base + len(bins) - 1))
        res = pd.DataFrame(
            out, columns=["doc_id", "piece_idx", "n_tokens", "bin_id"]
        )
        res["shard"] = shard
        res["bin_fill"] = res.groupby("bin_id")["n_tokens"].transform("sum")
        return res[
            ["doc_id", "shard", "piece_idx", "n_tokens", "bin_id", "bin_fill"]
        ]

    toks = F.size(
        F.regexp_extract_all(F.lower("text"), F.lit(_BPE_PAT), F.lit(0))
    ).cast("long")
    d = documents.select(
        "doc_id",
        (F.col("doc_id") % n_shards).cast("long").alias("shard"),
        toks.alias("n_tokens"),
    )
    return d.groupBy("shard").applyInPandas(pack, PACK_SCHEMA)
