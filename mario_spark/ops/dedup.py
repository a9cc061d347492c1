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
  pair generation is banded on band-pair keys (exact recall for the
  hamming threshold by pigeonhole — see simhash_pairs), never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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


def minhash_signatures(
    documents: DataFrame,
    n_hashes: int = N_MINHASH,
    terms: DataFrame | None = None,
) -> DataFrame:
    """-> (doc_id, mh0..mh{n-1}): lexicographic-min md5 per salt.

    Pass `terms` (a precomputed, ideally persisted (doc_id, term)
    frame) to skip re-tokenizing — the tokenize UDF + explode +
    distinct is the expensive stage, and callers that need the terms
    again (LSH verify) should compute it once and thread it through.
    """
    t = terms if terms is not None else distinct_terms(documents)
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
    prefetch_sizes: bool | None = None,
    max_candidate_pairs: int | None = None,
) -> DataFrame:
    """Banded-LSH candidates, verified by exact Jaccard.

    -> (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard >= threshold,
    jaccard rounded to 4dp.

    prefetch_sizes (default: auto — on when threshold >= 0.7): run the
    int-only size-ratio prune before the array-carrying verify joins;
    see _verify_jaccard for the disk/throughput trade it flips.

    max_candidate_pairs: refuse (ValueError, pre-generation — see
    _salted_band_join's gate) when the exact candidate-pair total
    exceeds it; None = unbounded (the default for pair LISTING, whose
    consumers stream the output).
    """
    if prefetch_sizes is None:
        prefetch_sizes = threshold >= 0.7
    # tokenize ONCE: signatures and the Jaccard verify share the same
    # (doc_id, term) frame instead of re-running the pandas tokenizer;
    # band keys come from the single-pass posexplode (one signature agg
    # total, not one per band)
    terms = distinct_terms(documents).persist()
    bands = minhash_band_keys(
        documents, n_hashes, n_bands, terms=terms
    ).select("doc_id", "band_key")
    cand = (
        _salted_band_join(
            bands.select(F.col("doc_id").alias("doc_a"), "band_key"),
            bands.select(F.col("doc_id").alias("doc_b"), "band_key"),
            ["band_key"],
            max_pairs=max_candidate_pairs,
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    return _verify_jaccard(terms, cand, threshold, prefetch_sizes)


def minhash_band_keys(
    documents: DataFrame,
    n_hashes: int = N_MINHASH,
    n_bands: int = N_BANDS,
    terms: DataFrame | None = None,
) -> DataFrame:
    """-> (doc_id, band, band_key): a corpus's persistable LSH state.

    This is the cross-snapshot dedup contract: persist this table for
    the accepted corpus (one 32-byte digest per doc per band) and each
    incoming snapshot joins its own band keys against it — the old
    corpus TEXT is only touched to verify candidate pairs. At 10^12
    docs the state is append-only and bucketable by band_key prefix, so
    the monthly-snapshot join stays a digest-keyed shuffled hash join.
    """
    rpb = n_hashes // n_bands
    sigs = minhash_signatures(documents, n_hashes, terms=terms)
    # ONE pass: a union-of-selects would re-run the signature agg (the
    # expensive groupBy over the token stream) once per band; building
    # all band digests as an array and posexploding computes the
    # signatures exactly once
    band_arr = F.array(
        *[
            F.md5(
                F.concat_ws(
                    "|", *[f"mh{b * rpb + r}" for r in range(rpb)]
                )
            )
            for b in range(n_bands)
        ]
    )
    return sigs.select(
        "doc_id", F.posexplode(band_arr).alias("band", "band_key")
    )


def incremental_near_dup(
    new_docs: DataFrame,
    old_docs: DataFrame,
    n_hashes: int = N_MINHASH,
    n_bands: int = N_BANDS,
    threshold: float = JACCARD_THRESHOLD,
) -> DataFrame:
    """Cross-snapshot near-dup: flag NEW docs that near-duplicate the
    accepted OLD corpus (the incremental form of minhash_lsh_pairs — a
    monthly Common-Crawl snapshot deduped against everything already
    ingested without re-pairing the old corpus with itself).

    -> (new_doc, old_doc, jaccard >= threshold, 4dp). Candidates come
    from an equi-join of the snapshot's band keys against the old
    corpus's persisted band table (minhash_band_keys); old-vs-old pairs
    are never generated. Verification computes exact Jaccard on
    candidate pairs only.
    """
    # tokenize BOTH halves in one tagged pass and persist: the
    # (doc_id, term) frame feeds the band-key build of each half AND
    # the Jaccard verify (doc ids must be disjoint across halves —
    # they are two filters of one corpus). One Spark job materializes
    # the cache with both halves' tokenization running concurrently,
    # instead of two half-parallel jobs + re-derived verify input.
    tagged = new_docs.select(
        F.lit(True).alias("_new"), "doc_id", "text"
    ).unionByName(
        old_docs.select(F.lit(False).alias("_new"), "doc_id", "text")
    )
    terms = (
        tagged.select(
            "_new", "doc_id", F.explode(tokenize_udf("text")).alias("term")
        )
        .distinct()
        .persist()
    )
    tn = terms.filter(F.col("_new")).select("doc_id", "term")
    to = terms.filter(~F.col("_new")).select("doc_id", "term")
    nb = minhash_band_keys(new_docs, n_hashes, n_bands, terms=tn).select(
        F.col("doc_id").alias("doc_a"), "band", "band_key"
    )
    ob = minhash_band_keys(old_docs, n_hashes, n_bands, terms=to).select(
        F.col("doc_id").alias("doc_b"), "band", "band_key"
    )
    cand = (
        _salted_band_join(nb, ob, ["band", "band_key"])
        .select("doc_a", "doc_b")
        .distinct()
    )
    return _verify_jaccard(
        terms.select("doc_id", "term"), cand, threshold
    ).select(
        F.col("doc_a").alias("new_doc"),
        F.col("doc_b").alias("old_doc"),
        "jaccard",
    )


# candidate pairs one join task may emit before the band join is salted
_PAIR_TASK_CAP = 2_000_000


def _salted_band_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    cap: int | None = None,
    max_pairs: int | None = None,
) -> DataFrame:
    """Equi-join on `keys`, result-identical to `left.join(right, keys)`,
    with oversized key groups split across tasks.

    Why: LSH band buckets are power-law. On real web data boilerplate
    clusters (empty pages, templates, error pages) put 10^4-10^5 docs
    behind ONE band_key, so a plain equi-join emits na*nb (10^8+) pair
    rows from a single task. AQE's skew split cannot help: it triggers
    on shuffle-READ bytes, and the hot bucket's join INPUT is
    kilobytes — the explosion is in the join OUTPUT. The classic fix
    (salting): count pairs per key first (two linear aggs over the
    digest tables, joined — only keys whose output exceeds `cap`
    survive, a handful of boilerplate buckets), split the left side of
    each hot key into s = ceil(na*nb/cap) salt groups by doc-id hash,
    replicate the right side s times, join on keys+salt. Non-hot keys
    get salt 0 on both sides and join exactly as before. Measured on
    the degenerate sf1 stretch corpus (one bucket = 251M of 1.04B pair
    rows): pair generation 126 s -> 46 s.

    The hot-key table is materialized EAGERLY (one collect) and the
    salting rewrite applied only when it is non-empty. Three reasons:
    (a) on corpora with no hot buckets — most real shards, and every
    small snapshot — the whole salt machinery (two broadcast left
    joins + an explode on the probe side) is pure constant-factor
    overhead on top of the plain equi-join; skipping it restored the
    sf0.1 incremental-dedup bench to its pre-salting line while the
    sf1 degenerate corpus keeps the 46 s salted path. (b) The driver
    copy is bounded by construction: |hot| <= total_pairs/cap rows of
    (keys, int) — the exact table the lazy version BROADCAST anyway,
    so any corpus that fits the old plan fits this one (10^12 output
    pairs at the default cap -> <=500k rows, a few MB). (c) Collected
    hot keys become a local relation, so the salt plan no longer
    re-runs the two count aggs inside the join job. Both inputs are
    persisted first: the counts job and the join job share one
    materialization of the band digests (at 10^12 docs the band table
    is persistent state anyway — see minhash_band_keys).
    """
    cap = cap or _PAIR_TASK_CAP
    lid = next(c for c in left.columns if c not in keys)
    rid = next(c for c in right.columns if c not in keys)
    left = left.persist()
    right = right.persist()
    cnt = (
        left.groupBy(*keys).agg(F.count("*").alias("_na"))
        .join(right.groupBy(*keys).agg(F.count("*").alias("_nb")), keys)
        .persist()
    )
    if max_pairs is not None:
        # output-volume gate (same philosophy as knn_graph's count
        # gate): the per-key counts are already computed, so the EXACT
        # ordered candidate-pair total is one agg away — refuse with a
        # designed error BEFORE a single pair row is generated, rather
        # than run a quadratic-output join out of cluster spill disk.
        total = cnt.agg(
            F.sum(F.col("_na") * F.col("_nb")).alias("t")
        ).collect()[0]["t"] or 0
        if total > max_pairs:
            raise ValueError(
                f"banded join would generate ~{total:,} candidate "
                f"pairs (cap {max_pairs:,}): the corpus is dup-dense "
                "enough that the pair/edge volume is quadratic in "
                "cluster size. Scale paths: incremental_near_dup "
                "(snapshot-vs-corpus, never old-vs-old), per-shard "
                "dedup_components over bounded partitions, or raise "
                "max_candidate_pairs explicitly if the spill budget "
                "allows."
            )
    hot_plan = (
        cnt.withColumn(
            "_s",
            F.ceil((F.col("_na") * F.col("_nb")) / F.lit(cap)).cast("int"),
        )
        .filter(F.col("_s") > 1)
        .select(*keys, "_s")
    )
    hot_rows = hot_plan.collect()
    cnt.unpersist()
    if not hot_rows:
        # no bucket can exceed cap pairs: the plain digest-keyed join
        # IS the salted plan with s=1 everywhere — skip the rewrite.
        # SHUFFLE_HASH for the same reason as below: band tables are
        # never broadcastable at scale and need no sort.
        return (
            left.hint("SHUFFLE_HASH")
            .join(right, keys)
            .select(*keys, lid, rid)
        )
    hot = left.sparkSession.createDataFrame(hot_rows, hot_plan.schema)
    l2 = (
        left.join(F.broadcast(hot), keys, "left")
        .withColumn(
            "_salt",
            F.coalesce(
                F.pmod(F.xxhash64(lid), F.col("_s")), F.lit(0)
            ).cast("int"),
        )
        .drop("_s")
    )
    r2 = (
        right.join(F.broadcast(hot), keys, "left")
        .withColumn(
            "_salt",
            F.explode(
                F.sequence(F.lit(0), F.coalesce(F.col("_s") - 1, F.lit(0)))
            ),
        )
        .drop("_s")
    )
    # SHUFFLE_HASH, build = left: after the (keys, salt) shuffle a hot
    # key's partition holds ~na/s left rows vs nb replicated right rows,
    # so the left build map stays tiny. The hint also stops Spark from
    # BROADCASTING the replicated right side — its size estimate
    # predates the explode (s copies of every hot-bucket row), which
    # measured as a driver OOM on the sf1 stretch corpus; and at 10^12
    # docs no band table is broadcastable anyway.
    return (
        l2.hint("SHUFFLE_HASH")
        .join(r2, keys + ["_salt"])
        .select(*keys, lid, rid)
    )


def _verify_jaccard(
    terms: DataFrame,
    cand: DataFrame,
    threshold: float,
    prefetch_sizes: bool = False,
) -> DataFrame:
    """Exact Jaccard on candidate pairs via per-doc term-HASH arrays.

    Shape (the part that survives 100x): instead of exploding every
    candidate pair into |pair| x |terms| rows and re-shuffling on
    (doc, term) — O(candidates x doc_len) rows through two exchanges —
    we collect each doc's distinct terms ONCE into an array of 64-bit
    hashes (one agg keyed on doc_id), join each side of the candidate
    table against that compact table (two doc_id-keyed joins carrying
    digests-only arrays), and intersect the two small arrays inside
    whole-stage codegen (`array_intersect`). xxhash64 stands in for
    the term string: collisions at web vocab (2^-64 birthday term) are
    negligible and deterministic.

    Join strategy matters when candidates are dense (a degenerate or
    boilerplate-heavy corpus makes |cand| quadratic): both joins are
    SHUFFLE_HASH-hinted so the candidate stream is STREAMED against a
    per-partition hash map of the doc-digest table. The sort-merge
    plan Spark picks by default must sort the candidate table twice —
    with the fetched arrays aboard — which measured 14x slower and
    OOMed executors on the sf1 stretch corpus (467M candidates); the
    build side is one row per doc and always fits. The size-ratio
    prune (jaccard <= min(|A|,|B|)/max(|A|,|B|), slack 1e-4 preserving
    the round-to-4dp-then-filter contract) filters BEFORE the intersect
    expression, so ruled-out pairs never pay for the intersection. An
    A/B against a 4-join variant that joined (doc_id, size) first to
    keep pruned pairs' arrays out of the second exchange measured
    SLOWER at both 5k and 50k docs (two extra int exchanges cost more
    than the array bytes they saved), so sizes ride the build table —
    at the DEFAULT threshold, on non-degenerate candidate densities.

    prefetch_sizes=True flips that trade for the high-threshold /
    dense-candidate regime (dedup_components at jaccard >= 0.8 on a
    dup-dense corpus): the size-ratio prune runs FIRST over int-only
    (doc_a, doc_b, sz) exchanges and the term-hash arrays are fetched
    only for pairs the prune cannot rule out. Semantics are identical
    (the prune is the same inequality either way — pinned by a
    parametrized identity test); what changes is DISK, not results:
    with arrays aboard every candidate, the round-5 sf1 stretch
    measured the verify shuffle of the quadratic-candidate corpus
    exceeding the sandbox's ~90 GB spill quota, while at 0.8 the size
    filter kills most cross-cluster candidates before their ~KB-sized
    arrays ever enter an exchange. At 10^12 docs this is the
    difference between shuffling O(|survivors|) and O(|candidates|)
    array payloads.
    """
    doc_terms = terms.groupBy("doc_id").agg(
        F.collect_set(F.xxhash64("term")).alias("hset")
    ).select("doc_id", F.size("hset").alias("sz"), "hset")
    sza, szb = F.col("sza"), F.col("szb")
    size_ok = F.least(sza, szb) >= (threshold - 1e-4) * F.greatest(sza, szb)
    if prefetch_sizes:
        sizes = doc_terms.select("doc_id", "sz")
        cand = (
            cand.join(
                sizes.select(
                    F.col("doc_id").alias("doc_a"), F.col("sz").alias("sza")
                ).hint("SHUFFLE_HASH"),
                "doc_a",
            )
            .join(
                sizes.select(
                    F.col("doc_id").alias("doc_b"), F.col("sz").alias("szb")
                ).hint("SHUFFLE_HASH"),
                "doc_b",
            )
            .filter(size_ok)
            .select("doc_a", "doc_b")
        )
    a = doc_terms.select(
        F.col("doc_id").alias("doc_a"),
        F.col("sz").alias("sza"),
        F.col("hset").alias("ha"),
    )
    b = doc_terms.select(
        F.col("doc_id").alias("doc_b"),
        F.col("sz").alias("szb"),
        F.col("hset").alias("hb"),
    )
    inter = F.size(F.array_intersect("ha", "hb"))
    return (
        cand.join(a.hint("SHUFFLE_HASH"), "doc_a")
        .join(b.hint("SHUFFLE_HASH"), "doc_b")
        .filter(size_ok)
        .withColumn("jaccard", F.round(inter / (sza + szb - inter), 4))
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
    """-> (doc_id, simhash hex-16), tf-weighted over tokens.

    Factored evaluation (identical bits to simhash_sql, which the
    DuckDB oracle still runs un-factored): the 16 md5-nibble parses are
    computed ONCE per distinct term in a dictionary dim table — O(vocab)
    hashing instead of O(doc x term) — broadcast-joined onto the tf
    stream; the per-doc agg then sums plain ints. At web scale the
    vocabulary table is exactly the index dictionary: tiny next to the
    posting stream.
    """
    tf = (
        documents.select("doc_id", F.explode(tokenize_udf("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    nibs = tf.select("term").distinct().selectExpr(
        "term",
        *[
            f"cast(conv(substr(md5(term), {p}, 1), 16, 10) as int) as nib{p}"
            for p in range(1, 17)
        ],
    )
    j = tf.join(F.broadcast(nibs), "term")
    # per (nibble p, bit b): sum tf * (+1/-1); repack majority bits
    outs = []
    for p in range(1, 17):
        bits = []
        for b in range(4):
            bit = f"mod(cast(floor(nib{p} / {1 << b}) as int), 2)"
            s = f"sum(tf * (2 * {bit} - 1))"
            bits.append(f"(case when {s} > 0 then {1 << b} else 0 end)")
        outs.append(f"substr('0123456789abcdef', ({' + '.join(bits)}) + 1, 1)")
    return j.groupBy("doc_id").agg(
        F.expr("concat(" + ", ".join(outs) + ")").alias("simhash")
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


SIMHASH_BANDS = 8  # 8 bands x 8 bits (2 hex chars) over the 64-bit hash


def simhash_pairs(
    documents: DataFrame, max_hamming: int = SIMHASH_HAMMING_MAX
) -> DataFrame:
    """-> (doc_a, doc_b, hamming) for pairs within max_hamming bits.

    Banded candidate generation (Manku et al., WWW'07 block-permutation
    scheme) — NO cross join, identical output to the exhaustive
    all-pairs scan, which is what the DuckDB oracle still computes:

    - Split the 64-bit simhash into 8 bands of 8 bits. Each of the
      <= max_hamming differing bits falls in exactly one band, so a pair
      within hamming 6 has >= 8 - 6 = 2 identical bands.
    - Join key = a PAIR of bands (i<j, 16 bits): any qualifying pair
      shares two clean bands, hence collides on at least one of the
      C(8,2)=28 combo keys. Exact recall by pigeonhole; 16-bit keys keep
      buckets ~N/65536 per combo, confining the quadratic verify.
    - Exact hamming (generated codegen SQL, no UDF) filters candidates.

    Shuffle carries (doc_id, 16-hex simhash) x28 — never text. At 100TB
    the same shape holds; for tighter buckets raise the band count and
    combo order r (guarantee needs n_bands - max_hamming >= r).
    """
    # combo order r=2 needs >= max_hamming + 2 bands; fall back to
    # single-band keys (coarser buckets, same recall guarantee) if a
    # caller raises max_hamming past 6
    r = 2 if SIMHASH_BANDS - max_hamming >= 2 else 1
    if SIMHASH_BANDS - max_hamming < 1:
        raise ValueError(
            f"max_hamming={max_hamming} needs > {SIMHASH_BANDS} bands"
        )
    sh = simhash64(documents)
    # pre-split the 64-bit hash into two signed-safe 32-bit words ONCE
    # per doc: the verify is then 2 xors + 2 bit_counts per candidate
    # (vs 16 hex-nibble parses), and the join shuffles 2 longs, not a
    # 16-char string. Values identical to hamming_sql (popcount of the
    # same 64 bits), which the un-factored oracle still computes.
    words = sh.select(
        "doc_id",
        "simhash",
        F.expr("cast(conv(substr(simhash, 1, 8), 16, 10) as bigint)").alias("hi"),
        F.expr("cast(conv(substr(simhash, 9, 8), 16, 10) as bigint)").alias("lo"),
    )
    band = [F.substring("simhash", 1 + 2 * i, 2) for i in range(SIMHASH_BANDS)]
    if r == 2:
        keys = [
            F.concat_ws("", F.lit(f"{i}.{j}:"), band[i], band[j])
            for i in range(SIMHASH_BANDS)
            for j in range(i + 1, SIMHASH_BANDS)
        ]
    else:
        keys = [
            F.concat_ws("", F.lit(f"{i}:"), band[i])
            for i in range(SIMHASH_BANDS)
        ]
    e = words.select(
        "doc_id", "hi", "lo", F.explode(F.array(*keys)).alias("band_key")
    )
    a = e.select(
        F.col("doc_id").alias("doc_a"),
        F.col("hi").alias("hia"),
        F.col("lo").alias("loa"),
        "band_key",
    )
    b = e.select(
        F.col("doc_id").alias("doc_b"),
        F.col("hi").alias("hib"),
        F.col("lo").alias("lob"),
        "band_key",
    )
    cand = (
        a.join(b, "band_key")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "hia", "loa", "hib", "lob")
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming",
            (
                F.bit_count(F.col("hia").bitwiseXOR(F.col("hib")))
                + F.bit_count(F.col("loa").bitwiseXOR(F.col("lob")))
            ).cast("long"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


# ------------------------------------------------------ duplicate clusters
CLUSTER_THRESHOLD = 0.8


# candidate-pair ceiling for the MATERIALIZING consumers (connected
# components must hold the whole verified edge list as executor
# storage for the duration of the fixpoint): the round-5 sf1 stretch
# measured the adversarially dup-dense 50k-doc corpus generating
# ~1.04e9 candidates whose verify + edge storage exceeded a ~90 GB
# spill budget, twice, with every streaming mitigation already on
# (salted join, sizes-first prune, lineage cut). Quadratic OUTPUT is
# an algorithm-class property, not a plan defect — so above this bound
# the operator refuses with the scale paths named, exactly like
# knn_graph's broadcast count gate.
MAX_COMPONENT_CANDIDATES = 500_000_000


def dedup_components(
    documents: DataFrame,
    threshold: float = CLUSTER_THRESHOLD,
    max_candidate_pairs: int | None = MAX_COMPONENT_CANDIDATES,
) -> DataFrame:
    """Connected components of the verified near-duplicate graph:
    -> (doc_id, comp) where comp = min doc_id reachable through
    minhash-LSH pairs with jaccard >= threshold (singletons map to
    themselves). This is the "keep one per duplicate cluster" step a
    training-data pipeline runs after pair generation.

    Algorithm: iterative min-label propagation to a fixpoint — each
    round is one neighbor-min agg + one label join (two bounded
    shuffles), converging in O(component diameter) rounds; dedup
    graphs are near-cliques, so 2-3 rounds in practice. Lineage is cut
    per round (localCheckpoint) so the plan stays flat at any round
    count. The DuckDB oracle computes the same components via a
    recursive transitive-closure CTE.

    The edge table is EAGERLY lineage-cut (localCheckpoint) before the
    loop, not merely persisted: a persisted-but-lineaged edge frame
    keeps the whole pair-generation DAG — the banded join and the
    digest verify, tens of GB of shuffle files on a dup-dense corpus —
    referenced for the lifetime of the fixpoint, so nothing upstream
    can be cleaned while rounds run. The round-5 sf1 stretch measured
    this directly: with lineage aboard the propagation ran the box out
    of shuffle disk; after the cut only the verified EDGE ROWS (the
    graph itself) stay stored and every upstream shuffle is
    collectable. At 10^12 docs this is the difference between holding
    the dedup graph (output-sized) and holding the LSH machinery
    (corpus-sized) for the whole iteration.
    """
    pairs = minhash_lsh_pairs(
        documents,
        threshold=threshold,
        max_candidate_pairs=max_candidate_pairs,
    ).select(
        "doc_a", "doc_b"
    )
    edges = pairs.unionByName(
        pairs.select(
            F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
        )
    ).localCheckpoint()
    labels = documents.select(
        "doc_id", F.col("doc_id").alias("comp")
    ).localCheckpoint()
    for _ in range(30):  # cap >> any real diameter; loop exits on fixpoint
        nmin = (
            edges.join(
                labels.select(
                    F.col("doc_id").alias("doc_b"),
                    F.col("comp").alias("ncomp"),
                ),
                "doc_b",
            )
            .groupBy("doc_a")
            .agg(F.min("ncomp").alias("nmin"))
        )
        new_labels = (
            labels.join(
                nmin, labels["doc_id"] == nmin["doc_a"], "left"
            )
            .select(
                "doc_id",
                F.least(
                    F.col("comp"), F.coalesce(F.col("nmin"), F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


# ------------------------------------------------------------ n-gram Jaccard
def char_ngrams(documents: DataFrame, k: int = NGRAM_K) -> DataFrame:
    """(doc_id, gram) distinct character k-grams, JVM-side.

    Texts shorter than k are filtered out BEFORE the sequence: Spark's
    sequence(1, 0) yields a DESCENDING [1, 0] (unlike DuckDB's empty
    generate_series(1, 0)), which would emit spurious grams for
    near-empty docs. The filter matches the oracle exactly (short docs
    produce zero gram rows either way).
    """
    return (
        documents.filter(F.length("text") >= k)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(1), F.length("text") - (k - 1))
            ).alias("p"),
            "text",
        )
        .select("doc_id", F.expr(f"substr(text, p, {k})").alias("gram"))
        .distinct()
    )


# --------------------------------------------------- decontamination
DECON_N = 8  # token n-gram width (GPT-3 used 13-grams; 8 suits short docs)


def ngram_decontaminate(
    documents: DataFrame,
    benchmark_docs: DataFrame | None = None,
    bench_mod: int = 10,
    bench_rem: int = 7,
    n: int = DECON_N,
) -> DataFrame:
    """Training-set decontamination (the GPT-3/C4 protocol): flag every
    training doc sharing at least one token n-gram with the benchmark
    set. Returns (doc_id, n_overlap) for contaminated docs only —
    n_overlap = distinct shared grams.

    `benchmark_docs` is the held-out eval set; when None, a
    deterministic stand-in (doc_id % bench_mod == bench_rem) is carved
    from the corpus so the op is testable without external data — the
    residue is chosen to intersect the fixture's near-duplicate chains
    (doc i duplicates root i % 100), so the flagged set is non-empty at
    every scale factor.

    Scale shape: grams are md5 digests (shuffle never carries text);
    the benchmark gram set is tiny relative to the corpus (eval suites
    are thousands of docs vs 10^12), so it BROADCASTS into a semi join
    — the training side streams through map-side, one aggregation on
    doc_id after. Docs shorter than n tokens emit no grams (explicit
    length guard — Spark's sequence(1, 0) is descending, not empty).
    """
    gram_expr = F.expr(
        f"transform(sequence(1, size(arr) - {n - 1}), "
        f"p -> md5(concat_ws(' ', slice(arr, p, {n}))))"
    )
    arrs = documents.select(
        "doc_id",
        F.regexp_extract_all(
            F.lower("text"), F.lit(r"[\p{L}\p{N}]+"), F.lit(0)
        ).alias("arr"),
    ).filter(F.size("arr") >= n)
    grams = arrs.select(
        "doc_id", F.explode(gram_expr).alias("g")
    ).distinct()
    if benchmark_docs is None:
        bench_g = grams.filter(F.col("doc_id") % bench_mod == bench_rem).select("g")
        train_g = grams.filter(F.col("doc_id") % bench_mod != bench_rem)
    else:
        bench_ids = benchmark_docs.select("doc_id")
        bench_g = grams.join(F.broadcast(bench_ids), "doc_id", "leftsemi").select("g")
        train_g = grams.join(F.broadcast(bench_ids), "doc_id", "leftanti")
    out = train_g.join(F.broadcast(bench_g.distinct()), "g", "leftsemi")
    return out.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_overlap")
    )


NGRAM_BANDS = 4  # r independent min-hashes; recall = 1 - (1-J)^r


def ngram_jaccard_pairs(
    documents: DataFrame,
    k: int = NGRAM_K,
    threshold: float = NGRAM_JACCARD_THRESHOLD,
    n_bands: int = NGRAM_BANDS,
) -> DataFrame:
    """Multi-band min-wise LSH on char k-grams + exact Jaccard verify.

    r independent min-hashes (salted md5); candidates = pairs sharing
    ANY band's minimum (P[collision on band] = Jaccard, so candidate
    recall = 1 - (1-J)^r — at J=0.8, r=4 that is 0.9984 vs 0.8 for the
    single-band variant). Verified by exact Jaccard; 4dp, >= threshold.
    """
    grams = char_ngrams(documents, k)
    aggs = [
        F.min(F.md5(F.concat_ws("#", "gram", F.lit(str(i))))).alias(f"mg{i}")
        for i in range(n_bands)
    ]
    mins = grams.groupBy("doc_id").agg(*aggs)
    bands = None
    for i in range(n_bands):
        part = mins.select(
            "doc_id",
            F.concat_ws(":", F.lit(str(i)), F.col(f"mg{i}")).alias("band_key"),
        )
        bands = part if bands is None else bands.unionByName(part)
    a = bands.select(F.col("doc_id").alias("doc_a"), "band_key")
    b = bands.select(F.col("doc_id").alias("doc_b"), "band_key")
    cand = (
        a.join(b, "band_key")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    g = grams.withColumnRenamed("gram", "term")
    return _verify_jaccard(g, cand, threshold)


# ------------------------------------------------------------ URL dedup
def url_canonical_expr(url_col):
    """URL canonicalization for web-corpus dedup (the Common-Crawl
    preprocessing step before any content hashing): lowercase
    scheme+host, drop the port (synthetic corpus uses default ports
    only), drop the fragment, drop utm_*/ref tracking params (other
    params kept in original order), collapse a lone trailing slash,
    empty path -> '/'. Pure codegen regex/array expressions — the same
    patterns run verbatim as RE2 in the DuckDB oracle (common Java/RE2
    subset: anchors, classes, optional groups)."""
    u = F.col(url_col) if isinstance(url_col, str) else url_col
    proto = F.lower(F.regexp_extract(u, r"^([A-Za-z]+)://", 1))
    host = F.lower(F.regexp_extract(u, r"^[A-Za-z]+://([^/:?#]+)", 1))
    path = F.regexp_extract(u, r"^[A-Za-z]+://[^/?#]*(/[^?#]*)?", 1)
    path = F.when(
        (path == "") | (path == "/"), F.lit("/")
    ).otherwise(F.regexp_replace(path, r"/$", ""))
    q = F.regexp_extract(u, r"\?([^#]*)", 1)
    q2 = F.array_join(
        F.filter(
            F.split(q, "&"),
            lambda x: ~(x.startswith("utm_") | x.startswith("ref=")),
        ),
        "&",
    )
    return F.concat(
        proto,
        F.lit("://"),
        host,
        path,
        F.when(q2 == "", F.lit("")).otherwise(F.concat(F.lit("?"), q2)),
    )


def url_dedup(documents_with_url: DataFrame) -> DataFrame:
    """URL-based dedup: -> (doc_id, canon_url, keeper_doc_id,
    group_size). Keeper = min doc_id per canonical URL. The group
    window partitions by the canonical key (parallel; at 100TB swap
    the raw canon string for md5(canon) as the shuffle key, exactly
    like exact_dedup_groups shuffles digests, never text)."""
    d = documents_with_url.withColumn(
        "canon_url", url_canonical_expr("url")
    )
    w = Window.partitionBy("canon_url")
    return d.select(
        "doc_id",
        "canon_url",
        F.min("doc_id").over(w).alias("keeper_doc_id"),
        F.count("*").over(w).cast("long").alias("group_size"),
    )


def dup_ngram_stats(documents: DataFrame, n: int = 8) -> DataFrame:
    """Cross-document duplicated n-gram fraction — the doc-level signal
    behind exact-substring dedup (Lee et al. 2022) and RefinedWeb's
    dup_ngram_frac filters: for each doc, the fraction of its token
    n-gram occurrences whose gram also appears in at least one OTHER
    document. -> (doc_id, n_grams, dup_frac); docs shorter than n
    tokens emit (0, 0.0).

    Scale shape: gram occurrences reduce per (doc_id, digest) FIRST
    (map-side combine; the shuffle carries md5 digests + counts, never
    text), per-digest doc-frequency is a second digest-keyed agg, and
    grams occurring in >1 doc join back digest-keyed before ONE final
    doc_id agg. No broadcast of the gram table (it is corpus-sized),
    no all-pairs anything — three bounded hash shuffles total.
    """
    gram_expr = F.expr(
        f"transform(sequence(1, size(arr) - {n - 1}), "
        f"p -> md5(concat_ws(' ', slice(arr, p, {n}))))"
    )
    base = documents.select(
        "doc_id",
        F.regexp_extract_all(
            F.lower("text"), F.lit(r"[\p{L}\p{N}]+"), F.lit(0)
        ).alias("arr"),
    ).select(
        "doc_id",
        F.greatest(F.size("arr") - (n - 1), F.lit(0))
        .cast("long")
        .alias("n_grams"),
        "arr",
    )
    grams = (
        base.filter(F.col("n_grams") > 0)
        .select("doc_id", F.explode(gram_expr).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    gdf = grams.groupBy("g").agg(F.count("*").alias("doc_df"))
    dup = (
        grams.join(gdf.filter(F.col("doc_df") > 1).select("g"), "g")
        .groupBy("doc_id")
        .agg(F.sum("cnt").alias("dup_occ"))
    )
    return base.select("doc_id", "n_grams").join(dup, "doc_id", "left").select(
        "doc_id",
        "n_grams",
        F.round(
            F.coalesce(F.col("dup_occ"), F.lit(0))
            / F.greatest(F.col("n_grams"), F.lit(1)),
            4,
        ).alias("dup_frac"),
    )


def chunk_dedup_stats(documents: DataFrame, window: int = 20) -> DataFrame:
    """C4/RefinedWeb-style duplicate-span ("line") dedup, adapted to a
    corpus with no newlines: the unit is a NON-overlapping window of
    `window` tokens (chunk i = tokens[i*W, (i+1)*W); the final partial
    chunk counts). An occurrence of a chunk is DROPPED iff an earlier
    occurrence of the same chunk exists anywhere in the corpus —
    earlier = smaller (doc_id, chunk_idx), the same first-occurrence
    rule C4 applies to its 3-sentence spans. -> (doc_id, n_chunks,
    n_dropped, dropped_frac): the per-doc removal signal a cleanup
    cascade thresholds on.

    Scale shape: chunk occurrences carry md5 DIGESTS across the
    shuffle, never text; the first-occurrence reduction is one
    digest-keyed min-agg (map-side combinable) with (doc_id, idx)
    packed into a single BIGINT order key, joined back digest-keyed,
    then ONE doc_id agg. Same three-bounded-shuffles shape as
    dup_ngram_stats. Docs with no tokens emit (0, 0, 0.0).
    """
    w = int(window)
    # idx < 2^20 tokens/doc packed under doc_id: key = doc_id<<20 | idx
    chunk_expr = F.expr(
        f"transform(sequence(0, cast(ceil(size(arr) / {w}.0) as int) - 1), "
        f"i -> struct(i AS idx, "
        f"md5(concat_ws(' ', slice(arr, i * {w} + 1, {w}))) AS digest))"
    )
    base = documents.select(
        "doc_id",
        F.regexp_extract_all(
            F.lower("text"), F.lit(r"[\p{L}\p{N}]+"), F.lit(0)
        ).alias("arr"),
    )
    chunks = (
        base.filter(F.size("arr") > 0)
        .select("doc_id", F.explode(chunk_expr).alias("c"))
        .select(
            "doc_id",
            F.col("c.digest").alias("digest"),
            (F.shiftleft(F.col("doc_id"), 20) + F.col("c.idx"))
            .cast("long")
            .alias("okey"),
        )
    )
    first = chunks.groupBy("digest").agg(F.min("okey").alias("first_okey"))
    marked = chunks.join(first, "digest").select(
        "doc_id", (F.col("okey") > F.col("first_okey")).alias("is_dup")
    )
    stats = marked.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_chunks"),
        F.sum(F.col("is_dup").cast("long")).cast("long").alias("n_dropped"),
    )
    return (
        base.select("doc_id")
        .join(stats, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_chunks", F.lit(0)).cast("long").alias("n_chunks"),
            F.coalesce("n_dropped", F.lit(0)).cast("long").alias("n_dropped"),
            F.when(
                F.coalesce("n_chunks", F.lit(0)) > 0,
                F.round(
                    F.col("n_dropped") / F.col("n_chunks"), 4
                ),
            ).otherwise(F.lit(0.0)).alias("dropped_frac"),
        )
    )


def lsh_audit(
    documents: DataFrame,
    sample_max_id: int = 200,
    n_hashes: int = N_MINHASH,
    n_bands: int = N_BANDS,
    threshold: float = JACCARD_THRESHOLD,
) -> DataFrame:
    """Measure-don't-guess audit of the MinHash-LSH candidate stage:
    on a BOUNDED sample (doc_id < sample_max_id — at 100TB exact
    all-pairs ground truth only ever exists on a sample), compute
    truth = all pairs with exact Jaccard >= threshold,
    cand  = the banded-LSH candidate pairs (pre-verification),
    and report -> 1 row (n_true, n_cand, n_hit, recall, precision).
    This is the recall audit the VERDICT demanded analytically
    (recall = 1-(1-J^r)^b), measured empirically per corpus.

    Plan note: the truth join is pairs-sharing-a-term (zero-overlap
    pairs have J=0 and can't reach any positive threshold), so even
    the "all-pairs" side is term-bounded, not a cartesian.
    """
    sample = documents.filter(F.col("doc_id") < sample_max_id)
    terms = distinct_terms(sample).persist()
    ta = terms.select(F.col("doc_id").alias("doc_a"), "term")
    tb = terms.select(F.col("doc_id").alias("doc_b"), "term")
    share = (
        ta.join(tb, "term")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    truth = _verify_jaccard(terms, share, threshold).select(
        "doc_a", "doc_b"
    )
    bands = minhash_band_keys(
        sample, n_hashes, n_bands, terms=terms
    ).select("doc_id", "band_key")
    l, r = bands.alias("l"), bands.alias("r")
    cand = (
        l.join(r, F.col("l.band_key") == F.col("r.band_key"))
        .filter(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(
            F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b")
        )
        .distinct()
    )
    # ONE evaluation of each side: a separate agg per count would
    # re-run the verify and the band join once per branch (truth and
    # cand were each computed twice); the full outer join + single agg
    # computes all three counts in one pass
    j = truth.withColumn("t", F.lit(1)).join(
        cand.withColumn("c", F.lit(1)), ["doc_a", "doc_b"], "full"
    )
    return j.agg(
        F.sum("t").cast("long").alias("n_true"),
        F.sum("c").cast("long").alias("n_cand"),
        F.sum(
            F.coalesce(F.col("t"), F.lit(0))
            * F.coalesce(F.col("c"), F.lit(0))
        ).cast("long").alias("n_hit"),
    ).select(
        "n_true",
        "n_cand",
        "n_hit",
        F.round(
            F.when(
                F.col("n_true") > 0, F.col("n_hit") / F.col("n_true")
            ).otherwise(F.lit(0.0)),
            4,
        ).alias("recall"),
        F.round(
            F.when(
                F.col("n_cand") > 0, F.col("n_hit") / F.col("n_cand")
            ).otherwise(F.lit(0.0)),
            4,
        ).alias("precision"),
    )


# --------------------------------------------------------- Bloom membership
BLOOM_K = 3  # hash probes per doc
BLOOM_M = 65536  # bit-array size


def _bloom_positions(
    documents: DataFrame, k: int, m: int
) -> DataFrame:
    """(doc_id, pos) — the k Bloom probe positions of each doc's text.
    Probe i = md5("i#" || text) folded to [0, m): independent-enough
    hash family, deterministic across runs AND engines (the oracle
    computes the identical positions), pure codegen."""
    probes = [
        F.pmod(
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"{i}#"), F.col("text"))), 1, 13),
                16,
                10,
            ).cast("long"),
            F.lit(m),
        ).alias(f"_p{i}")
        for i in range(k)
    ]
    return documents.select("doc_id", *probes).select(
        "doc_id",
        F.explode(F.array(*[F.col(f"_p{i}") for i in range(k)])).alias("pos"),
    )


def bloom_membership(
    documents: DataFrame,
    ref_pred,
    k: int = BLOOM_K,
    m: int = BLOOM_M,
) -> DataFrame:
    """Bloom-filter membership dedup: flag candidate docs whose every
    probe position is set by the reference corpus (`ref_pred` rows).
    Returns (doc_id, n_hits, bloom_dup) for every NON-reference doc —
    bloom_dup true iff all k probes hit (exact duplicates of a
    reference doc always flag; false-positive rate ~(n_ref*k/m)^k).

    Scale shape: the filter itself is the reduced artifact — the
    reference corpus collapses to <= m distinct bit positions (a 8KB
    bitmap at m=2^16; even m=2^32 is a 512MB broadcast, the standard
    production size), explicitly broadcast into the probe join, so the
    candidate side streams map-side with ONE doc_id aggregation after.
    Text never crosses a shuffle — positions are 8-byte longs. This is
    the Bloom shape CCNet/Dolma use for cross-snapshot URL/content
    dedup where a sorted join over 10^12 keys per snapshot would
    dominate the pipeline.
    """
    bits = (
        _bloom_positions(documents.filter(ref_pred), k, m)
        .select("pos")
        .distinct()
    )
    cand = _bloom_positions(documents.filter(~ref_pred), k, m)
    hits = cand.join(F.broadcast(bits), "pos", "leftsemi")
    per_doc = cand.select("doc_id").distinct().join(
        hits.groupBy("doc_id").agg(F.count("*").cast("long").alias("n_hits")),
        "doc_id",
        "left",
    )
    return per_doc.select(
        "doc_id",
        F.coalesce("n_hits", F.lit(0).cast("long")).alias("n_hits"),
        (F.coalesce("n_hits", F.lit(0)) == k).alias("bloom_dup"),
    )


# ----------------------------------- exact-substring dedup (span removal)
def exact_substring_dedup(documents: DataFrame, n: int = DECON_N) -> DataFrame:
    """Exact-substring deduplication WITH span removal (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better" — the
    rewrite step; `dup_ngram_stats` is only the doc-level signal): a
    token n-gram occurrence is cut iff its digest appears more than
    once in the corpus AND it is not the globally FIRST occurrence
    (smallest (doc_id, pos) — the suffix-array implementation's
    keep-one rule; within-doc repeats count too). Tokens covered by any
    cut gram are removed, contiguous removals merge into maximal spans,
    and the doc is rewritten from the surviving tokens.
    -> (doc_id, n_tokens, n_removed, n_spans, clean_hash) where
    clean_hash = md5 of the space-joined surviving token stream
    (md5('') for token-less or fully-cut docs).

    Scale shape: the GRAM stream (the n-times-corpus-sized part) crosses
    shuffles as md5 digests + packed int keys only — one first-occurrence
    min-agg, one digest-keyed join-back, one doc_id agg of cut positions.
    The token array then crosses exactly ONE exchange: the doc_id rewrite
    join, which is irreducible for a rewrite op (its OUTPUT is
    corpus-sized; any engine must re-unite text with the globally-decided
    cut list once — the positions side is the small one). The span/rewrite
    math is per-doc array algebra over SORTED cut positions: coverage via
    fixed-width interval union, survivors via complement intervals between
    shifted borders — O(tokens + cuts) per doc inside whole-stage codegen,
    no per-token membership scan.
    """
    gram_expr = F.expr(
        f"transform(sequence(1, size(arr) - {n - 1}), "
        f"p -> md5(concat_ws(' ', slice(arr, p, {n}))))"
    )
    base = documents.select(
        "doc_id",
        F.regexp_extract_all(
            F.lower("text"), F.lit(r"[\p{L}\p{N}]+"), F.lit(0)
        ).alias("arr"),
    )
    occ = (
        base.filter(F.size("arr") >= n)
        .select("doc_id", F.posexplode(gram_expr).alias("p0", "digest"))
        .select(
            "doc_id",
            (F.col("p0") + 1).alias("p"),
            "digest",
            # same packing as chunk_dedup_stats: pos < 2^20 under doc_id
            (F.shiftleft(F.col("doc_id"), 20) + F.col("p0") + 1)
            .cast("long")
            .alias("okey"),
        )
    )
    first = occ.groupBy("digest").agg(
        F.min("okey").alias("first_okey"), F.count("*").alias("occ_cnt")
    )
    cuts = (
        occ.join(first, "digest")
        .filter((F.col("occ_cnt") > 1) & (F.col("okey") > F.col("first_okey")))
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_set("p")).alias("ps"))
    )
    joined = (
        base.join(cuts, "doc_id", "left")
        .withColumn(
            "ps2", F.coalesce(F.col("ps"), F.expr("array_repeat(1, 0)"))
        )
        .withColumn(
            "cov",
            F.expr(
                "sort_array(array_distinct(flatten("
                f"transform(ps2, p -> sequence(p, p + {n - 1})))))"
            ),
        )
        .withColumn(
            "borders", F.expr("concat(array(0), cov, array(size(arr) + 1))")
        )
        .withColumn(
            "kept",
            F.expr(
                "flatten(zip_with("
                "slice(borders, 1, size(borders) - 1), "
                "slice(borders, 2, size(borders) - 1), "
                "(a, b) -> CASE WHEN b - a > 1 THEN sequence(a + 1, b - 1) "
                "ELSE array_repeat(1, 0) END))"
            ),
        )
    )
    spans_expr = (
        "CASE WHEN size(cov) = 0 THEN 0 ELSE 1 + size(filter("
        "zip_with(slice(cov, 2, size(cov) - 1), slice(cov, 1, size(cov) - 1),"
        " (a, b) -> a - b), d -> d > 1)) END"
    )
    return joined.select(
        "doc_id",
        F.size("arr").cast("long").alias("n_tokens"),
        F.size("cov").cast("long").alias("n_removed"),
        F.expr(spans_expr).cast("long").alias("n_spans"),
        F.md5(
            F.concat_ws(
                " ", F.expr("transform(kept, i -> element_at(arr, i))")
            )
        ).alias("clean_hash"),
    )
