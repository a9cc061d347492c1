"""Search-response shaping: ES terms aggregations (facets) and
search_after pagination.

Mario's delegated engine serves both on every query (TIMDEX's UI
facets are ES terms aggs over keyword fields; result paging is
from/size / search_after). Re-expressed Spark-first:

- terms_agg: groupBy(key) partial+final hash agg, then top-`size`
  buckets via orderBy().limit() — plans as TakeOrderedAndProject, never
  a single-partition global window (the repo's documented top-k rule).
- search_after: cursor pagination as a pushable PREDICATE on the total
  order (strictly-after the cursor row), then orderBy().limit(size).
  This is exactly why ES recommends search_after over from+size at
  depth: each page is an independent top-`size` over a shrinking
  predicate, O(size) state, no global offset scan. A from+size deep
  page would need offset+size rows collected; the cursor form stays
  TakeOrderedAndProject at every depth.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def terms_agg(
    df: DataFrame,
    key_col: str,
    size: int = 10,
    metric_col: str | None = None,
    metric_decimals: int = 4,
) -> DataFrame:
    """ES terms aggregation: top-`size` buckets of `key_col` by
    doc_count desc (ties: key asc), with an optional avg metric
    sub-aggregation — (key, doc_count[, avg_metric])."""
    aggs = [F.count("*").cast("long").alias("doc_count")]
    if metric_col is not None:
        aggs.append(
            F.round(F.avg(metric_col), metric_decimals).alias(
                f"avg_{metric_col}"
            )
        )
    g = df.groupBy(F.col(key_col).alias("key")).agg(*aggs)
    return g.orderBy(F.desc("doc_count"), F.asc("key")).limit(size)


def terms_agg_filtered(
    df: DataFrame,
    key_col: str,
    size: int = 10,
    include: str | None = None,
    exclude: str | None = None,
    missing: str | None = None,
) -> DataFrame:
    """ES terms agg bucket filters: `include`/`exclude` are anchored
    regexes applied to the BUCKET KEY (not the documents — doc_count
    semantics are untouched for surviving buckets), and `missing`
    assigns docs with a NULL key to a named bucket instead of dropping
    them. The key predicates are pure codegen and sit BEFORE the hash
    agg, so excluded buckets never shuffle."""
    key = F.col(key_col)
    if missing is not None:
        key = F.coalesce(key, F.lit(missing))
    out = df.select(key.alias("key"))
    if missing is None:
        out = out.filter(F.col("key").isNotNull())
    if include is not None:
        out = out.filter(F.col("key").rlike(f"^(?:{include})$"))
    if exclude is not None:
        out = out.filter(~F.col("key").rlike(f"^(?:{exclude})$"))
    g = out.groupBy("key").agg(F.count("*").cast("long").alias("doc_count"))
    return g.orderBy(F.desc("doc_count"), F.asc("key")).limit(size)


def stats_agg(
    df: DataFrame, key_col: str, metric_col: str
) -> DataFrame:
    """ES stats sub-aggregation under a terms bucket: per key —
    (key, count, min, max, avg, sum). One partial+final hash agg;
    every metric is algebraic, so the map-side combine carries five
    scalars per bucket regardless of data size."""
    return df.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").cast("long").alias("count"),
        F.min(metric_col).cast("long").alias("min"),
        F.max(metric_col).cast("long").alias("max"),
        F.round(F.avg(metric_col), 4).alias("avg"),
        F.sum(metric_col).cast("long").alias("sum"),
    )


def date_histogram(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    interval: str = "month",
) -> DataFrame:
    """ES date_histogram (calendar_interval) with a sub-agg per
    (bucket, key): unlike a fixed-width tumbling window, calendar
    buckets have variable length (months), so the bucket key is
    date_trunc — still a pure projection, so the groupBy is ONE hash
    shuffle and partial aggregation stays map-side."""
    b = F.date_format(
        F.date_trunc(interval, F.col(ts_col).cast("timestamp")), "yyyy-MM-dd"
    )
    return df.groupBy(
        b.alias("bucket"), F.col(key_col).alias("key")
    ).agg(
        F.count("*").cast("long").alias("doc_count"),
        F.round(F.sum(value_col), 2).alias("sum_value"),
    )


def range_agg(
    df: DataFrame,
    metric_col: str,
    ranges: list[tuple[str, float | None, float | None]],
) -> DataFrame:
    """ES range aggregation: buckets are [from, to) half-open; EMPTY
    buckets are still emitted with doc_count 0 (ES contract), which is
    why this is a broadcast join against a tiny ranges dim table rather
    than a groupBy of a bucket expression (a groupBy cannot produce
    empty groups). `ranges` = [(label, lo|None, hi|None)]."""
    spark = df.sparkSession
    dim = spark.createDataFrame(
        [
            (
                lbl,
                float(lo) if lo is not None else float("-inf"),
                float(hi) if hi is not None else float("inf"),
            )
            for lbl, lo, hi in ranges
        ],
        "key string, lo double, hi double",
    )
    m = F.col(metric_col).cast("double")
    j = F.broadcast(dim).join(
        df, (m >= F.col("lo")) & (m < F.col("hi")), "left"
    )
    return j.groupBy("key").agg(
        F.count(metric_col).cast("long").alias("doc_count"),
        # empty bucket -> avg 0.0 (not NULL) so the value-hash contract
        # stays engine-stable; doc_count 0 marks emptiness
        F.coalesce(F.round(F.avg(metric_col), 4), F.lit(0.0)).alias("avg"),
    )


def histogram_agg(
    df: DataFrame, metric_col: str, interval: int
) -> DataFrame:
    """ES histogram aggregation (fixed numeric interval,
    min_doc_count=0): bucket key = floor(v/interval)*interval, and —
    the ES contract — EMPTY buckets between the min and max observed
    keys are emitted. A groupBy cannot produce empty groups, so the
    observed buckets left-join a generated bucket spine. The spine
    bounds come from one 1-row collect (min/max of the metric — an
    algebraic agg, no sort); the spine itself is
    sequence(lo, hi, interval) exploded on the driver side of a
    broadcast, O(#buckets) rows regardless of corpus size."""
    spark = df.sparkSession
    m = F.col(metric_col).cast("double")
    b = (F.floor(m / interval) * interval).cast("long")
    got = df.groupBy(b.alias("key")).agg(
        F.count("*").cast("long").alias("n")
    )
    lo, hi = df.agg(F.min(m), F.max(m)).collect()[0]
    lo_b = int(lo // interval) * interval
    hi_b = int(hi // interval) * interval
    spine = spark.range(1).select(
        F.explode(
            F.sequence(F.lit(lo_b), F.lit(hi_b), F.lit(interval))
        ).alias("key")
    )
    return F.broadcast(spine).join(got, "key", "left").select(
        "key", F.coalesce("n", F.lit(0)).cast("long").alias("doc_count")
    )


def extended_stats_agg(
    df: DataFrame, key_col: str, metric_col: str
) -> DataFrame:
    """ES extended_stats: stats + sum_of_squares, population variance
    and std deviation. Every moment is algebraic — the map-side combine
    carries (n, sum, sum_sq, min, max) per bucket, so the shuffle is
    O(buckets) at any corpus size (also covers ES value_count = count).
    Variance/stddev derive from the raw moments (ss/n - mean^2) rather
    than var_pop so both engines run literally the same arithmetic on
    exact integer sums — engine-private streaming variants (Welford)
    could differ in the last ulp across engines."""
    m = F.col(metric_col).cast("double")
    g = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").cast("long").alias("count"),
        F.min(metric_col).cast("long").alias("min"),
        F.max(metric_col).cast("long").alias("max"),
        F.sum(metric_col).cast("long").alias("sum"),
        F.sum(m * m).alias("ss"),
    )
    n = F.col("count").cast("double")
    mean = F.col("sum").cast("double") / n
    var = F.col("ss") / n - mean * mean
    return g.select(
        "key",
        "count",
        "min",
        "max",
        F.round(mean, 4).alias("avg"),
        "sum",
        F.round("ss", 2).alias("sum_of_squares"),
        F.round(var, 4).alias("variance"),
        F.round(F.sqrt(var), 4).alias("std_deviation"),
    )


def filters_agg(
    df: DataFrame, buckets: list[tuple[str, Column]]
) -> DataFrame:
    """ES filters aggregation: one named bucket per filter, all
    evaluated in a SINGLE pass as conditional sums (no per-bucket
    rescan — exactly how ES runs sibling filter buckets in one
    collector pass), then unpivoted to (key, doc_count) rows via
    stack(). Also expresses the ES `missing` agg: pass an isNull()
    condition as a bucket."""
    row = df.agg(
        *[
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(name)
            for name, cond in buckets
        ]
    )
    n = len(buckets)
    cells = ", ".join(f"'{name}', {name}" for name, _ in buckets)
    return row.select(
        F.expr(f"stack({n}, {cells}) as (key, doc_count)")
    )


def pipeline_date_histogram(
    df: DataFrame, ts_col: str, value_col: str, interval: str = "month"
) -> DataFrame:
    """ES pipeline aggregations over a date_histogram:
    cumulative_sum, derivative, and moving_fn(avg, window=3) of the
    per-bucket doc_count. The parent histogram is a normal distributed
    hash agg; the pipeline window then runs over the REDUCED bucket
    table (rows = #calendar buckets, dozens), which is exactly where ES
    computes pipeline aggs — on the coordinating node after the shard
    reduce. The unpartitioned window is therefore O(#buckets), not a
    data-scale global sort. ES emits NO derivative key for the first
    bucket; a NULL float is engine-hash-hazardous (Spark NaN vs DuckDB
    None), so the first bucket's derivative is pinned to 0 on both
    engines."""
    from pyspark.sql import Window

    b = F.date_format(
        F.date_trunc(interval, F.col(ts_col).cast("timestamp")), "yyyy-MM-dd"
    )
    g = df.groupBy(b.alias("bucket")).agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.sum(value_col), 2).alias("sum_value"),
    )
    w = Window.orderBy("bucket")
    mv = Window.orderBy("bucket").rowsBetween(-2, 0)
    return g.select(
        "bucket",
        "n",
        "sum_value",
        F.sum("n").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("long").alias("cum_n"),
        F.coalesce(F.col("n") - F.lag("n").over(w), F.lit(0))
        .cast("long")
        .alias("deriv_n"),
        F.round(F.avg("n").over(mv), 4).alias("mavg_n"),
    )


def bucket_ks_test(
    df: DataFrame, ts_col: str, interval: str = "month"
) -> DataFrame:
    """ES bucket_count_ks_test (alternative=two_sided vs the uniform
    null): over the ORDERED date_histogram buckets, the KS statistic
    D = max |ecdf(doc_count) - uniform_cdf| where ecdf is the running
    doc-count fraction and uniform_cdf = bucket_rank / n_buckets.

    -> one row (n_buckets, total_docs, ks_stat 4dp). Like every
    pipeline agg this runs over the REDUCED bucket table
    (coordinating-node semantics): the window and the 1-row reduction
    see O(#buckets) rows, never the raw events."""
    from pyspark.sql import Window

    b = F.date_format(
        F.date_trunc(interval, F.col(ts_col).cast("timestamp")), "yyyy-MM-dd"
    )
    g = df.groupBy(b.alias("bucket")).agg(
        F.count("*").cast("double").alias("n")
    )
    w = Window.orderBy("bucket")
    s = g.select(
        F.row_number().over(w).cast("double").alias("r"),
        F.sum("n")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum"),
    )
    return (
        s.crossJoin(
            F.broadcast(
                g.agg(
                    F.count("*").cast("double").alias("nb"),
                    F.sum("n").alias("tot"),
                )
            )
        )
        .agg(
            F.max(F.col("nb")).cast("long").alias("n_buckets"),
            F.max(F.col("tot")).cast("long").alias("total_docs"),
            F.round(
                F.max(F.abs(F.col("cum") / F.col("tot") - F.col("r") / F.col("nb"))),
                4,
            ).alias("ks_stat"),
        )
    )


def bucket_correlation(
    df: DataFrame, ts_col: str, value_col: str, interval: str = "month"
) -> DataFrame:
    """ES bucket_correlation (count_correlation function): Pearson r
    between the per-bucket doc_count series and the per-bucket
    sum(value) series of a date_histogram. Computed from explicit
    moments (n*Sxy - Sx*Sy over the root-product of variances) so the
    DuckDB oracle reproduces the arithmetic bit-for-bit; one row, 4dp.
    Runs over the reduced bucket table like every pipeline agg."""
    b = F.date_format(
        F.date_trunc(interval, F.col(ts_col).cast("timestamp")), "yyyy-MM-dd"
    )
    g = df.groupBy(b.alias("bucket")).agg(
        F.count("*").cast("double").alias("x"),
        F.sum(value_col).alias("y"),
    )
    m = g.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    # a degenerate series (one bucket, or zero variance) has no defined
    # r — pin to 0.0 on both engines rather than NULL/NaN
    return m.select(
        F.col("n").cast("long").alias("n_buckets"),
        F.when(den > 0, F.round(num / den, 4))
        .otherwise(F.lit(0.0))
        .alias("correlation"),
    )


def percentiles_agg(
    df: DataFrame,
    key_col: str,
    metric_col: str,
    qs: list[float] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """ES percentiles aggregation, exact linear-interpolation variant
    (rank = q*(n-1)): per key, one column per requested percentile.
    ES itself serves t-digest approximations; the exact form is the
    oracle-checkable contract. Spark's exact percentile is a partial
    aggregate (no global sort), but its per-group state is a
    value->count map — O(distinct metric values per group) memory. For
    bounded-domain metrics (lengths, counts, scores rounded to fixed
    precision) that is small at any corpus size; for an unbounded
    continuous metric at 100TB, swap F.percentile for
    F.percentile_approx (t-digest-style sketch, O(1/accuracy) state) —
    same call shape, no longer exactly oracle-matchable."""
    aggs = [
        F.round(F.percentile(F.col(metric_col), F.lit(q)), 4).alias(
            f"p{int(q * 100)}"
        )
        for q in qs
    ]
    return df.groupBy(F.col(key_col).alias("key")).agg(*aggs)


# 16^13 = 2^52 — the largest power of 16 exactly representable in a
# double; 13 hex chars of md5 give a uniform u in [0, 1).
_KMV_DENOM = float(16**13)


def cardinality_kmv(
    df: DataFrame, key_col: str, value_col: str, k: int = 256
) -> DataFrame:
    """ES cardinality aggregation as a K-Minimum-Values sketch (the
    theta-sketch family ES's HLL belongs to), made DETERMINISTIC and
    engine-portable: u = first 13 hex chars of md5(value) / 16^13;
    keep the k smallest distinct u per key; estimate = (k-1)/u_(k)
    (exact count when fewer than k distinct values exist).

    Distributed shape: distinct on (key, u) then a per-key top-k —
    per-partition heads merge at the reducer, which IS the KMV union
    operation, so the sketch scales like any partial agg: no state
    beyond k doubles per key ever crosses the shuffle."""
    u = (
        F.conv(
            F.substring(F.md5(F.encode(F.col(value_col).cast("string"), "utf-8")), 1, 13),
            16,
            10,
        ).cast("double")
        / _KMV_DENOM
    )
    h = df.select(F.col(key_col).alias("key"), u.alias("u")).distinct()
    from pyspark.sql import Window

    w = Window.partitionBy("key").orderBy("u")
    top = h.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    return top.groupBy("key").agg(
        F.count("*").alias("c"), F.max("u").alias("mu")
    ).select(
        "key",
        F.when(F.col("c") < k, F.round(F.col("c").cast("double"), 4))
        .otherwise(F.round((k - 1) / F.col("mu"), 4))
        .alias("est_distinct"),
    )


def top_hits_agg(
    df: DataFrame,
    key_col: str,
    sort_col: str,
    size: int = 3,
    tiebreak_col: str = "doc_id",
) -> DataFrame:
    """ES top_hits sub-aggregation: the top-`size` documents per
    bucket by `sort_col` desc (tiebreak asc). A per-key rank window —
    parallel across buckets, never a global sort."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(
        F.desc(sort_col), F.asc(tiebreak_col)
    )
    return (
        df.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= size)
        .select(F.col(key_col).alias("key"), "rank", tiebreak_col, sort_col)
    )


def composite_agg(
    df: DataFrame,
    keys: list[str],
    size: int,
    after: tuple | None = None,
) -> DataFrame:
    """ES composite aggregation: buckets over a multi-key group,
    ordered by the key tuple, paged `size` at a time with an
    `after`-key cursor. Like search_after, the cursor is a PREDICATE
    over the key order (strictly-after), so every page is an
    independent top-`size` — the plan stays TakeOrderedAndProject at
    any depth, and bucket state never accumulates on the driver."""
    g = df.groupBy(*keys).agg(F.count("*").cast("long").alias("doc_count"))
    if after is not None:
        cond = None
        prefix_eq = None
        for kcol, aval in zip(keys, after):
            gt = F.col(kcol) > F.lit(aval)
            this = gt if prefix_eq is None else (prefix_eq & gt)
            cond = this if cond is None else (cond | this)
            eq = F.col(kcol) == F.lit(aval)
            prefix_eq = eq if prefix_eq is None else (prefix_eq & eq)
        g = g.filter(cond)
    return g.orderBy(*[F.asc(k) for k in keys]).limit(size)


def search_after(
    df: DataFrame,
    sort_col: str,
    size: int,
    cursor: tuple | None = None,
    tiebreak_col: str = "doc_id",
    ascending: bool = False,
) -> DataFrame:
    """One page of (sort_col desc|asc, tiebreak asc) with an ES
    search_after cursor = (sort_value, tiebreak_value) of the previous
    page's last row; None = first page. The cursor predicate is a plain
    comparison — it pushes into the scan, so deep pages don't rescan
    already-returned rows' columns."""
    s, t = F.col(sort_col), F.col(tiebreak_col)
    if cursor is not None:
        cs, ct = cursor
        after: Column = (s < cs) if not ascending else (s > cs)
        df = df.filter(after | ((s == cs) & (t > ct)))
    order = [s.asc() if ascending else s.desc(), t.asc()]
    return df.orderBy(*order).limit(size)


def paginate(
    df: DataFrame,
    sort_col: str,
    size: int,
    n_pages: int,
    tiebreak_col: str = "doc_id",
    ascending: bool = False,
) -> list[DataFrame]:
    """Materialize `n_pages` consecutive search_after pages (each page's
    last row becomes the next cursor — one tiny collect per page, the
    coordinating-node handoff ES does between page requests)."""
    pages: list[DataFrame] = []
    cursor: tuple | None = None
    for _ in range(n_pages):
        page = search_after(
            df, sort_col, size, cursor, tiebreak_col, ascending
        )
        pages.append(page)
        tail = page.collect()
        if len(tail) < size:
            break
        last = tail[-1]
        cursor = (last[sort_col], last[tiebreak_col])
    return pages


def nested_terms_agg(
    df: DataFrame,
    parent_col: str,
    child_col: str,
    parent_size: int = 3,
    child_size: int = 2,
) -> DataFrame:
    """ES nested terms aggregation (terms > terms sub-agg): the top
    `parent_size` parent buckets by doc_count (key asc tiebreak), each
    carrying its top `child_size` child buckets. ONE hash agg over
    (parent, child) feeds both levels (parent counts = re-aggregation
    of the pairs — no second corpus scan); ranking is two windows, the
    child one partitioned by parent (parallel)."""
    from pyspark.sql import Window

    pairs = df.groupBy(
        F.col(parent_col).alias("parent_key"),
        F.col(child_col).alias("child_key"),
    ).agg(F.count("*").cast("long").alias("child_count"))
    parents = pairs.groupBy("parent_key").agg(
        F.sum("child_count").cast("long").alias("parent_count")
    )
    wp = Window.orderBy(F.desc("parent_count"), F.asc("parent_key"))
    top_parents = (
        parents.withColumn("prank", F.row_number().over(wp).cast("long"))
        .filter(F.col("prank") <= parent_size)
    )
    wc = Window.partitionBy("parent_key").orderBy(
        F.desc("child_count"), F.asc("child_key")
    )
    ranked = pairs.withColumn(
        "crank", F.row_number().over(wc).cast("long")
    ).filter(F.col("crank") <= child_size)
    return (
        ranked.join(F.broadcast(top_parents), "parent_key")
        .select(
            "parent_key",
            "parent_count",
            "prank",
            "child_key",
            "child_count",
            "crank",
        )
    )


def rare_terms_agg(
    df: DataFrame, key_col: str, max_doc_count: int = 2
) -> DataFrame:
    """ES rare_terms aggregation: the buckets of `key_col` whose
    doc_count is <= max_doc_count — the long-tail complement of
    terms_agg. ES approximates this with a CuckooFilter because its
    per-shard coordinator cannot hold every bucket; a distributed hash
    agg CAN (the bucket table is spread over the cluster, never
    collected), so the Spark-first form is exact: one partial+final
    hash agg, then a post-agg filter on the tiny bucket table. No sort,
    no limit — rarity is a predicate, not a top-k."""
    g = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").cast("long").alias("doc_count")
    )
    return g.filter(F.col("doc_count") <= max_doc_count)


def multi_terms_agg(
    df: DataFrame, key_cols: list[str], size: int = 10
) -> DataFrame:
    """ES multi_terms aggregation: terms buckets over a composite key
    (every key combination that occurs), top-`size` by doc_count desc
    with the key tuple asc as tiebreak. One hash agg on the tuple;
    ranking is orderBy().limit() = TakeOrderedAndProject — same top-k
    rule as terms_agg, never a global window."""
    g = df.groupBy(*[F.col(c) for c in key_cols]).agg(
        F.count("*").cast("long").alias("doc_count")
    )
    order = [F.desc("doc_count")] + [F.asc(c) for c in key_cols]
    return g.orderBy(*order).limit(size)


def adjacency_matrix_agg(
    df: DataFrame, filters: dict[str, Column]
) -> DataFrame:
    """ES adjacency_matrix aggregation: for N named filters, the doc
    count of every filter and every pairwise intersection (keys "a",
    "a&b" with names in sorted order — the ES key convention). All
    N + N*(N-1)/2 cells are conditional sums in ONE aggregation pass
    (no joins, no explode, no second scan); the 1-row result is
    unpivoted with stack(). Partial aggregation keeps the map-side
    combine at one long per cell."""
    names = sorted(filters)
    cells: list[tuple[str, Column]] = []
    for i, a in enumerate(names):
        cells.append((a, filters[a]))
        for b in names[i + 1:]:
            cells.append((f"{a}&{b}", filters[a] & filters[b]))
    aggs = [
        F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"_c{i}")
        for i, (_, cond) in enumerate(cells)
    ]
    row = df.agg(*aggs)
    stack_args = ", ".join(f"'{n}', _c{i}" for i, (n, _) in enumerate(cells))
    return row.selectExpr(
        f"stack({len(cells)}, {stack_args}) AS (key, doc_count)"
    )


def auto_date_histogram(
    df: DataFrame, ts_col: str, target_buckets: int = 40
) -> DataFrame:
    """ES auto_date_histogram: picks the smallest calendar interval
    from the ladder day -> month -> year whose bucket count stays
    <= target_buckets, then runs a normal calendar date_histogram.
    The choice needs only (min, max) of the timestamp — an algebraic
    1-row agg collected to the driver (O(1) rows regardless of corpus
    size), after which the interval is a plan-time literal and the
    histogram is ONE hash agg. The chosen interval is emitted as a
    column so the oracle verifies the choice, not just the buckets."""
    r = df.agg(
        F.min(F.col(ts_col).cast("timestamp")).alias("mn"),
        F.max(F.col(ts_col).cast("timestamp")).alias("mx"),
    ).collect()[0]
    mn, mx = r["mn"], r["mx"]
    # identical arithmetic to DuckDB date_diff on truncated bounds
    days = (mx.date() - mn.date()).days + 1
    months = (mx.year - mn.year) * 12 + (mx.month - mn.month) + 1
    if days <= target_buckets:
        iv = "day"
    elif months <= target_buckets:
        iv = "month"
    else:
        iv = "year"
    b = F.date_format(
        F.date_trunc(iv, F.col(ts_col).cast("timestamp")), "yyyy-MM-dd"
    )
    return (
        df.groupBy(b.alias("bucket"))
        .agg(F.count("*").cast("long").alias("doc_count"))
        .withColumn("interval_chosen", F.lit(iv))
    )


def bucket_selector_daily(
    df: DataFrame, ts_col: str, value_col: str, threshold: float
) -> DataFrame:
    """ES bucket_script + bucket_selector pipeline over a daily
    date_histogram: the script metric (avg_value = sum/count) and the
    selector predicate both run on the REDUCED bucket table —
    coordinating-node semantics, O(#buckets) work after one corpus
    hash agg, exactly like pipeline_date_histogram."""
    b = F.date_format(
        F.date_trunc("day", F.col(ts_col).cast("timestamp")), "yyyy-MM-dd"
    )
    g = df.groupBy(b.alias("bucket")).agg(
        F.count("*").cast("long").alias("doc_count"),
        F.round(F.sum(value_col), 2).alias("sum_value"),
    )
    g = g.withColumn(
        "avg_value", F.round(F.col("sum_value") / F.col("doc_count"), 4)
    )
    return g.filter(F.col("avg_value") > threshold)


def max_bucket_daily(
    df: DataFrame, ts_col: str, value_col: str
) -> DataFrame:
    """ES max_bucket sibling pipeline agg: the daily bucket with the
    largest sum_value (earliest bucket on ties — ES returns ALL tied
    keys; the deterministic min-key form keeps the contract hashable).
    orderBy().limit(1) over the bucket table = TakeOrderedAndProject
    on O(#buckets) rows."""
    b = F.date_format(
        F.date_trunc("day", F.col(ts_col).cast("timestamp")), "yyyy-MM-dd"
    )
    g = df.groupBy(b.alias("bucket")).agg(
        F.round(F.sum(value_col), 2).alias("sum_value")
    )
    return g.orderBy(F.desc("sum_value"), F.asc("bucket")).limit(1)


def percentile_ranks_agg(
    df: DataFrame, key_col: str, metric_col: str, values: list[float]
) -> DataFrame:
    """ES percentile_ranks aggregation: for each given value v, the
    percent of observations <= v, per bucket. Each rank is an algebraic
    conditional mean (avg of an indicator * 100) — the whole set of
    ranks rides ONE partial+final hash agg, one double per (bucket,
    value) across the shuffle. Exact, not TDigest: the sketch exists in
    ES because coordinating nodes merge per-shard digests; a
    distributed agg computes the true fraction directly."""
    m = F.col(metric_col).cast("double")
    aggs = [
        F.round(
            F.avg(F.when(m <= float(v), 1.0).otherwise(0.0)) * 100.0, 4
        ).alias(f"pr_{int(v)}")
        for v in values
    ]
    return df.groupBy(F.col(key_col).alias("key")).agg(*aggs)


def weighted_avg_agg(
    df: DataFrame, key_col: str, value_col, weight_col
) -> DataFrame:
    """ES weighted_avg aggregation: sum(value*weight)/sum(weight) per
    bucket — two algebraic sums in one hash agg. Rows with NULL value
    or weight are skipped (the ES contract for missing-less configs):
    the product is NULL and sum() ignores NULLs on both engines."""
    v = value_col if not isinstance(value_col, str) else F.col(value_col)
    w = weight_col if not isinstance(weight_col, str) else F.col(weight_col)
    v, w = v.cast("double"), w.cast("double")
    return df.groupBy(F.col(key_col).alias("key")).agg(
        F.round(
            F.sum(v * w) / F.sum(F.when(v.isNotNull(), w)), 4
        ).alias("weighted_avg")
    )


def stats_bucket_daily(
    df: DataFrame, ts_col: str, value_col: str
) -> DataFrame:
    """ES stats_bucket + percentiles_bucket sibling aggregations over a
    daily date_histogram's sum_value metric: ONE row with bucket count,
    min/max/avg/sum, and exact interpolated p50/p90 of the per-bucket
    sums. The parent histogram is a distributed hash agg; the sibling
    reduce then runs over the REDUCED bucket table (rows = #days) —
    ES computes sibling aggs on the coordinating node after the shard
    reduce for the same reason, so the final single-partition agg is
    O(#buckets), not a data-scale collapse."""
    b = F.date_format(
        F.date_trunc("day", F.col(ts_col).cast("timestamp")), "yyyy-MM-dd"
    )
    g = df.groupBy(b.alias("bucket")).agg(
        F.round(F.sum(value_col), 2).alias("sum_value")
    )
    return g.agg(
        F.count("*").cast("long").alias("n_buckets"),
        F.round(F.min("sum_value"), 4).alias("min_v"),
        F.round(F.max("sum_value"), 4).alias("max_v"),
        F.round(F.avg("sum_value"), 4).alias("avg_v"),
        F.round(F.sum("sum_value"), 4).alias("sum_v"),
        F.round(F.percentile(F.col("sum_value"), F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile(F.col("sum_value"), F.lit(0.9)), 4).alias("p90"),
    )


def bucket_sort_daily(
    df: DataFrame, ts_col: str, value_col: str, size: int = 5
) -> DataFrame:
    """ES bucket_sort pipeline agg: the daily buckets re-sorted by
    their sum_value metric DESC (bucket ASC tie-break) and truncated to
    `size`. orderBy().limit() over the reduced bucket table plans as
    TakeOrderedAndProject; the rank is then assigned on the <= size
    surviving rows (tiny)."""
    from pyspark.sql import Window

    b = F.date_format(
        F.date_trunc("day", F.col(ts_col).cast("timestamp")), "yyyy-MM-dd"
    )
    g = (
        df.groupBy(b.alias("bucket"))
        .agg(
            F.count("*").cast("long").alias("doc_count"),
            F.round(F.sum(value_col), 2).alias("sum_value"),
        )
        .orderBy(F.desc("sum_value"), F.asc("bucket"))
        .limit(size)
    )
    w = Window.orderBy(F.desc("sum_value"), F.asc("bucket"))
    return g.withColumn("rank", F.row_number().over(w).cast("long"))


def serial_diff_daily(
    df: DataFrame, ts_col: str, lag: int = 7
) -> DataFrame:
    """ES serial_diff pipeline agg: doc_count minus the doc_count `lag`
    buckets earlier (lag=7 = week-over-week seasonality removal on a
    daily histogram). ES emits no value for the first `lag` buckets; a
    NULL float/int is engine-hash-hazardous, so those are pinned to 0
    on both engines (same convention as pipeline_date_histogram's
    derivative). Window over the reduced bucket table — O(#days)."""
    from pyspark.sql import Window

    b = F.date_format(
        F.date_trunc("day", F.col(ts_col).cast("timestamp")), "yyyy-MM-dd"
    )
    g = df.groupBy(b.alias("bucket")).agg(
        F.count("*").cast("long").alias("doc_count")
    )
    w = Window.orderBy("bucket")
    return g.select(
        "bucket",
        "doc_count",
        F.coalesce(
            F.col("doc_count") - F.lag("doc_count", lag).over(w), F.lit(0)
        ).cast("long").alias("sdiff"),
    )


def cumulative_cardinality_daily(
    df: DataFrame, ts_col: str, id_col: str
) -> DataFrame:
    """ES cumulative_cardinality pipeline agg: per daily bucket, the
    number of DISTINCT ids seen in the stream up to and including that
    bucket (plus new_users, the per-bucket increment ES derives from
    it). Computed exactly and distributively via first-seen reduction:
    min(day) per id is one id-keyed hash agg (each id's rows combine
    map-side), the daily counts of first appearances are a second tiny
    agg, and the running sum over the reduced day spine IS the
    cumulative distinct count — no per-bucket HLL union, no rescan.
    Days with no NEW ids still emit (left join onto the day spine)."""
    from pyspark.sql import Window

    day = F.date_format(
        F.date_trunc("day", F.col(ts_col).cast("timestamp")), "yyyy-MM-dd"
    )
    first_seen = (
        df.select(day.alias("day"), F.col(id_col).alias("u"))
        .groupBy("u")
        .agg(F.min("day").alias("day"))
    )
    new_per_day = first_seen.groupBy("day").agg(
        F.count("*").cast("long").alias("new_users")
    )
    days = df.select(day.alias("day")).distinct()
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        days.join(new_per_day, "day", "left")
        .select(
            F.col("day").alias("bucket"),
            F.coalesce("new_users", F.lit(0)).cast("long").alias("new_users"),
        )
        .withColumn(
            "cum_users", F.sum("new_users").over(w).cast("long")
        )
    )


def matrix_stats_agg(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """ES matrix_stats aggregation over a two-field matrix: per-field
    mean + population variance, covariance, and Pearson correlation —
    all algebraic moments (one distributed hash agg, partial+final;
    ES's own implementation streams the same running moments per
    shard). Skewness/kurtosis omitted: higher moments are the same
    call shape and nothing downstream here consumes them."""
    a, b = F.col(col_a).cast("double"), F.col(col_b).cast("double")
    return df.agg(
        F.count("*").cast("long").alias("doc_count"),
        F.round(F.avg(a), 4).alias("mean_a"),
        F.round(F.avg(b), 4).alias("mean_b"),
        F.round(F.var_pop(a), 4).alias("variance_a"),
        F.round(F.var_pop(b), 4).alias("variance_b"),
        F.round(F.covar_pop(a, b), 4).alias("covariance"),
        F.round(F.corr(a, b), 4).alias("correlation"),
    )


def t_test_agg(
    df: DataFrame, value_col: str, group_col, metric_alias: str = "t_value"
) -> DataFrame:
    """ES t_test aggregation (type=heteroscedastic, i.e. Welch's):
    t = (m1 - m2) / sqrt(s1^2/n1 + s2^2/n2) with SAMPLE variances,
    between the rows where `group_col` (boolean Column) is true vs
    false. Both branches reduce in ONE conditional hash agg (no second
    scan, no join): conditional sums give n/mean/var per side."""
    v = F.col(value_col).cast("double")
    g = group_col
    agg = df.agg(
        F.sum(F.when(g, 1).otherwise(0)).cast("double").alias("n1"),
        F.sum(F.when(~g, 1).otherwise(0)).cast("double").alias("n2"),
        F.avg(F.when(g, v)).alias("m1"),
        F.avg(F.when(~g, v)).alias("m2"),
        F.var_samp(F.when(g, v)).alias("v1"),
        F.var_samp(F.when(~g, v)).alias("v2"),
    )
    t = (F.col("m1") - F.col("m2")) / F.sqrt(
        F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2")
    )
    return agg.select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        F.round(t, 4).alias(metric_alias),
    )


def boxplot_agg(df: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """ES boxplot aggregation: per bucket min, q1, q2, q3, max of the
    metric (exact interpolated quantiles — same contract as
    percentiles_agg; ES serves TDigest approximations of the same
    definition). One hash agg, no sort."""
    v = F.col(value_col).cast("double")
    return df.groupBy(F.col(key_col).alias("key")).agg(
        F.round(F.min(v), 4).alias("min_v"),
        F.round(F.percentile(v, F.lit(0.25)), 4).alias("q1"),
        F.round(F.percentile(v, F.lit(0.5)), 4).alias("q2"),
        F.round(F.percentile(v, F.lit(0.75)), 4).alias("q3"),
        F.round(F.max(v), 4).alias("max_v"),
    )


def top_metrics_agg(
    df: DataFrame, key_col: str, sort_col: str, metric_col: str
) -> DataFrame:
    """ES top_metrics aggregation: per bucket, the metric value taken
    from the row that sorts FIRST (sort_col desc, metric_col asc
    tie-break — deterministic where ES leaves ties to shard order).
    Per-key rank window (parallel across keys), rn=1 projection."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(
        F.desc(sort_col), F.asc(metric_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col(key_col).alias("key"),
            F.col(sort_col).alias("top_sort"),
            F.col(metric_col).alias("metric"),
        )
    )


def moving_percentiles_daily(
    events: DataFrame,
    ts_col: str,
    value_col: str,
    window: int = 7,
    q: float = 0.5,
) -> DataFrame:
    """ES moving_percentiles pipeline agg: per daily bucket, the exact
    interpolated q-percentile of sum_value over the trailing `window`
    buckets (inclusive). ES wraps a percentiles agg in a moving window
    on the coordinating node; here the window runs over the REDUCED
    daily table — O(#days) rows, never the raw events.

    Spark's `percentile` is usable as a window aggregate, so the whole
    pipeline is two aggs and one window — no collect, no UDF.
    """
    daily = events.groupBy(
        F.to_date(ts_col).alias("d")
    ).agg(F.sum(value_col).alias("sum_value"))
    w = (
        Window.orderBy("d").rowsBetween(-(window - 1), 0)
    )
    return (
        daily.withColumn(
            "mp", F.round(F.percentile(F.col("sum_value"), F.lit(q)).over(w), 4)
        )
        .select(F.col("d").cast("string").alias("key"), "mp")
    )


def frequent_item_sets_pairs(
    presence: DataFrame,
    min_support: float = 0.1,
    k: int = 10,
) -> DataFrame:
    """ES frequent_item_sets agg (8.4+), the size-2 level of its
    Apriori/ECLAT mining: item pairs co-occurring in at least
    `min_support` of the docs. `presence` is (doc_id, item) DISTINCT
    rows (ES feeds keyword arrays; tokens work the same).

    Classic Apriori pruning keeps this scale-safe: items below
    min_support are eliminated BEFORE pair generation (a frequent pair
    needs two frequent members), so the within-doc self-join fan-out is
    bounded by each doc's count of FREQUENT items, not its vocabulary.
    The pair table then hash-aggregates on the (a, b) key. Output:
    top-k pairs by doc_count (ties: item names asc), with support.
    """
    n_docs = presence.select("doc_id").distinct().count()
    thresh = float(min_support) * n_docs
    item_df = presence.groupBy("item").agg(
        F.countDistinct("doc_id").alias("idf")
    )
    frequent = item_df.filter(F.col("idf") >= thresh).select("item")
    pruned = presence.join(F.broadcast(frequent), "item")
    a = pruned.select("doc_id", F.col("item").alias("a"))
    bcol = pruned.select("doc_id", F.col("item").alias("b"))
    pairs = (
        a.join(bcol, "doc_id")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.countDistinct("doc_id").cast("long").alias("doc_count"))
        .filter(F.col("doc_count") >= thresh)
        .withColumn(
            "support", F.round(F.col("doc_count") / F.lit(float(n_docs)), 4)
        )
    )
    return pairs.orderBy(
        F.desc("doc_count"), F.asc("a"), F.asc("b")
    ).limit(k)


def normalize_daily(
    events: DataFrame, ts_col: str, value_col: str, method: str = "percent_of_sum"
) -> DataFrame:
    """ES normalize pipeline agg: rescale a metric across the daily
    bucket table. method = percent_of_sum (value / Σ values) or mean
    (z-score-free (v - min) / (max - min), ES's 'range' normalizer is
    rescale_0_1). Runs over the REDUCED bucket table with ONE window
    (no partition key — O(#days) rows, coordinating-node semantics like
    every pipeline agg here).
    """
    daily = events.groupBy(F.to_date(ts_col).alias("d")).agg(
        F.sum(value_col).alias("sum_value")
    )
    w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    if method == "percent_of_sum":
        norm = F.col("sum_value") / F.sum("sum_value").over(w)
    elif method == "rescale_0_1":
        lo = F.min("sum_value").over(w)
        hi = F.max("sum_value").over(w)
        norm = (F.col("sum_value") - lo) / (hi - lo)
    else:
        raise ValueError(f"unknown method {method!r}")
    return daily.select(
        F.col("d").cast("string").alias("key"),
        F.round(norm, 6).alias("norm"),
    )


def rate_weekly(events: DataFrame, ts_col: str) -> DataFrame:
    """ES rate agg (unit=day) inside a weekly date_histogram: events
    per DAY within each ISO-week bucket — doc_count / 7 (ES divides by
    the bucket's span in the rate unit; calendar weeks are always 7
    days). One hash agg, divisor is pure codegen, no join.
    """
    b = F.date_trunc("week", F.col(ts_col).cast("timestamp"))
    return (
        events.groupBy(F.date_format(b, "yyyy-MM-dd").alias("key"))
        .agg(F.count("*").cast("long").alias("doc_count"))
        .withColumn("rate", F.round(F.col("doc_count") / 7.0, 4))
    )


def eql_sequence(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    first_type: str,
    second_type: str,
    maxspan_sec: int,
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """ES EQL `sequence by <key> with maxspan=Ns [t1] [t2]` — the
    overlap-permitting variant: every t1 event anchors its NEAREST
    following t2 event of the same key within maxspan. (Full EQL also
    consumes matched events; the anchor rule is the deterministic,
    engine-comparable core both share.) Returns one row per matched
    anchor: (key, first_id, second_id); ties on the follower timestamp
    break on the lower event id.

    Plan shape: both sides are scan-side filtered to their event type
    (pushed to parquet), hash-joined on the key, range predicate as a
    post-join filter, then min_by picks the nearest follower per
    anchor in ONE hash agg — no window over the raw stream, no sort.
    At scale, key+coarse-time-bucket salting bounds join fan-out for
    hot keys exactly like the dedup band joins.
    """
    a = events.filter(F.col(type_col) == first_type).select(
        F.col(key_col).alias("k"),
        F.col(id_col).alias("first_id"),
        F.col(ts_col).cast("timestamp").alias("a_ts"),
    )
    bs = events.filter(F.col(type_col) == second_type).select(
        F.col(key_col).alias("k"),
        F.col(id_col).alias("second_id"),
        F.col(ts_col).cast("timestamp").alias("b_ts"),
    )
    gap = F.col("b_ts").cast("double") - F.col("a_ts").cast("double")
    return (
        a.join(bs, "k")
        .filter((F.col("b_ts") > F.col("a_ts")) & (gap <= maxspan_sec))
        .groupBy("k", "first_id")
        .agg(
            F.min_by(
                F.struct("b_ts", "second_id"), F.struct("b_ts", "second_id")
            ).alias("m")
        )
        .select(
            F.col("k").alias(key_col),
            "first_id",
            F.col("m.second_id").alias("second_id"),
        )
    )


def eql_sequence_until(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    first_type: str,
    second_type: str,
    until_type: str,
    maxspan_sec: int,
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """ES EQL `sequence by K with maxspan=Ns [t1] [t2] until [u]`:
    EQL's expiry rule — a matched (t1 -> nearest t2) pair is DISCARDED
    when an until-event of the same key fires strictly between the two
    (the pending sequence state expires before completing).

    Plan shape: the eql_sequence core (scan-filtered sides, key hash
    join, min_by nearest follower) keeps both timestamps, then the
    expiry check is ONE more key-equi join with the range predicate as
    a post-join filter — run AFTER the pair table is reduced to
    <= |t1| rows, so the until join's left side is already small."""
    a = events.filter(F.col(type_col) == first_type).select(
        F.col(key_col).alias("k"),
        F.col(id_col).alias("first_id"),
        F.col(ts_col).cast("timestamp").alias("a_ts"),
    )
    bs = events.filter(F.col(type_col) == second_type).select(
        F.col(key_col).alias("k"),
        F.col(id_col).alias("second_id"),
        F.col(ts_col).cast("timestamp").alias("b_ts"),
    )
    gap = F.col("b_ts").cast("double") - F.col("a_ts").cast("double")
    pairs = (
        a.join(bs, "k")
        .filter((F.col("b_ts") > F.col("a_ts")) & (gap <= maxspan_sec))
        .groupBy("k", "first_id", "a_ts")
        .agg(
            F.min_by(
                F.struct("b_ts", "second_id"), F.struct("b_ts", "second_id")
            ).alias("m")
        )
        .select(
            "k",
            "first_id",
            "a_ts",
            F.col("m.second_id").alias("second_id"),
            F.col("m.b_ts").alias("b_ts"),
        )
    )
    u = events.filter(F.col(type_col) == until_type).select(
        F.col(key_col).alias("uk"),
        F.col(ts_col).cast("timestamp").alias("u_ts"),
    )
    cond = (
        (pairs["k"] == u["uk"])
        & (u["u_ts"] > pairs["a_ts"])
        & (u["u_ts"] < pairs["b_ts"])
    )
    return pairs.join(u, cond, "left_anti").select(
        F.col("k").alias(key_col), "first_id", "second_id"
    )


def transform_pivot(
    events: DataFrame, key_col: str, ts_col: str, value_col: str
) -> DataFrame:
    """ES Transform API (pivot): continuously materialize an
    ENTITY-CENTRIC table from an event stream — per key: event count,
    value sum/avg, and the latest event's timestamp (ES `latest` is
    the sibling transform; max(ts) is its batch expression). One hash
    agg, all metrics algebraic, so the transform checkpoint at scale
    is an incremental partial-agg merge, exactly ES's continuous mode.
    """
    return events.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").cast("long").alias("n_events"),
        F.round(F.sum(value_col), 4).alias("sum_value"),
        F.round(F.avg(value_col), 4).alias("avg_value"),
        F.date_format(F.max(ts_col), "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
    )


def string_stats_agg(
    df: DataFrame, str_col: str
) -> DataFrame:
    """ES string_stats agg (show_distribution=false): one row of
    count, min/max/avg length, and the Shannon entropy of the field's
    CHARACTER distribution (ES computes entropy over all bytes of all
    values; characters here are ascii-safe in the fixture corpus).

    Two aggs: length moments in one pass, plus a char-keyed count agg
    for the entropy sum — the char alphabet bounds the shuffle
    regardless of corpus size (same argument as bpe_pair_counts).
    """
    lens = df.select(F.length(str_col).alias("l")).agg(
        F.count("*").cast("long").alias("count"),
        F.min("l").cast("long").alias("min_length"),
        F.max("l").cast("long").alias("max_length"),
        F.round(F.avg("l"), 4).alias("avg_length"),
    )
    chars = (
        df.select(
            F.explode(F.split(F.col(str_col), "")).alias("ch")
        )
        .filter(F.col("ch") != "")
        .groupBy("ch")
        .agg(F.count("*").cast("double").alias("n"))
    )
    tot = chars.agg(F.sum("n").alias("t"))
    entropy = (
        chars.crossJoin(F.broadcast(tot))
        .select((F.col("n") / F.col("t")).alias("p"))
        .agg(
            F.round(
                -F.sum(F.col("p") * F.log2("p")), 4
            ).alias("entropy")
        )
    )
    return lens.crossJoin(F.broadcast(entropy))


def eql_sequence3(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    types: tuple[str, str, str],
    maxspan_sec: int,
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Three-step EQL sequence (same anchor rule as eql_sequence,
    composed): t1 anchors its nearest following t2 within maxspan, and
    that t2 anchors its nearest following t3 within maxspan of ITSELF
    — the chained greedy-minimal iterator. Returns (key, first_id,
    second_id, third_id). Each step is one type-filtered join + min_by
    agg, so an n-step sequence is n-1 bounded joins, never a window
    over the raw stream.
    """
    t1, t2, t3 = types
    step1 = eql_sequence(
        events, key_col, ts_col, t1, t2, maxspan_sec, type_col, id_col
    )
    step2 = eql_sequence(
        events, key_col, ts_col, t2, t3, maxspan_sec, type_col, id_col
    ).select(
        F.col(key_col),
        F.col("first_id").alias("second_id"),
        F.col("second_id").alias("third_id"),
    )
    return step1.join(step2, [key_col, "second_id"]).select(
        key_col, "first_id", "second_id", "third_id"
    )


def change_point_daily(
    events: DataFrame, ts_col: str, value_col: str
) -> DataFrame:
    """ES change_point agg (deterministic core): over the daily
    sum_value series, the bucket with the maximum absolute deviation
    from the series mean, typed spike/dip by sign. ES runs a battery
    of statistical tests; the max-deviation candidate is the
    deterministic, engine-comparable kernel all of them start from.
    One agg over the reduced bucket table + one 1-row reduce.
    """
    daily = events.groupBy(F.to_date(ts_col).alias("d")).agg(
        F.sum(value_col).alias("sum_value")
    )
    stats = daily.agg(F.avg("sum_value").alias("mu"))
    dev = daily.crossJoin(F.broadcast(stats)).select(
        F.col("d").cast("string").alias("key"),
        "sum_value",
        F.abs(F.col("sum_value") - F.col("mu")).alias("dev"),
        F.when(F.col("sum_value") >= F.col("mu"), F.lit("spike"))
        .otherwise(F.lit("dip"))
        .alias("type"),
    )
    return (
        dev.orderBy(F.desc("dev"), F.asc("key"))
        .limit(1)
        .select("key", F.round("sum_value", 4).alias("sum_value"), "type")
    )


def date_range_agg(
    df: DataFrame, ts_col: str, ranges: list[tuple[str, str | None, str | None]]
) -> DataFrame:
    """ES date_range agg: one bucket per (key, from, to) range — from
    inclusive, to exclusive, open ends allowed; ranges may overlap so a
    doc can land in several buckets (which is why this is NOT a
    date_histogram). Compiled as one conditional sum per range inside a
    SINGLE 1-row hash agg (map-side partials, one scan regardless of
    range count), then unpivoted with stack — the bucket table is
    O(len(ranges))."""
    t = F.col(ts_col).cast("timestamp")
    sums = []
    for i, (_, lo, hi) in enumerate(ranges):
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (t >= F.lit(lo).cast("timestamp"))
        if hi is not None:
            cond = cond & (t < F.lit(hi).cast("timestamp"))
        sums.append(
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"_b{i}")
        )
    row = df.agg(*sums)
    stack = ", ".join(f"'{key}', _b{i}" for i, (key, _, _) in enumerate(ranges))
    return row.select(
        F.expr(f"stack({len(ranges)}, {stack}) AS (key, doc_count)")
    )


def random_sampler_agg(
    df: DataFrame, id_col: str, metric_col: str, probability: float
) -> DataFrame:
    """ES random_sampler agg: metrics computed over a Bernoulli
    subsample, doc_count scaled back up by 1/p. The coin is the
    engine's deterministic md5 unit hash (ops.sample.hash_unit) —
    reproducible across runs and engines, and a pure map-side filter
    that fuses into the scan, so the whole agg reduces only ~p of the
    corpus (at 100TB that is the entire point of the agg)."""
    from mario_spark.ops.sample import hash_unit

    s = df.filter(hash_unit(id_col) < float(probability))
    return s.agg(
        F.count("*").cast("long").alias("doc_count_sampled"),
        F.round(F.count("*") / float(probability))
        .cast("long")
        .alias("doc_count_scaled"),
        F.round(F.avg(metric_col), 4).alias("avg_metric"),
    )


def bucket_script_daily(
    df: DataFrame, ts_col: str, type_col: str, match_value: str
) -> DataFrame:
    """ES bucket_script pipeline agg: per daily bucket, a script-computed
    metric from sibling sub-aggregation values — here
    error_rate = matching_count / doc_count over a filters sub-agg.
    Spark-first shape: the "sub-aggregations" are conditional sums in
    ONE distributed hash agg (single scan, map-side combine); the
    "script" is then a pure-codegen projection over the reduced bucket
    table — exactly where ES evaluates bucket_script (coordinating node,
    after the shard reduce). Buckets with doc_count 0 cannot occur (the
    histogram only emits observed days), so the division is total."""
    b = F.date_format(
        F.date_trunc("day", F.col(ts_col).cast("timestamp")), "yyyy-MM-dd"
    )
    g = df.groupBy(b.alias("bucket")).agg(
        F.count("*").cast("long").alias("doc_count"),
        F.sum(
            F.when(F.col(type_col) == match_value, 1).otherwise(0)
        ).cast("long").alias("n_match"),
    )
    return g.select(
        "bucket",
        "doc_count",
        "n_match",
        F.round(F.col("n_match") / F.col("doc_count"), 4).alias("rate"),
    )


# --------------------------------------------------------------- ip_range
def ipv4_to_long(col) -> "F.Column":
    """Dotted-quad IPv4 string -> numeric (long) form, pure codegen —
    the comparable representation ES's `ip` field type indexes."""
    c = F.col(col) if isinstance(col, str) else col
    p = F.split(c, r"\.")
    return (
        p[0].cast("long") * 16777216
        + p[1].cast("long") * 65536
        + p[2].cast("long") * 256
        + p[3].cast("long")
    )


def _cidr_bounds(cidr: str) -> tuple[int, int]:
    """CIDR "a.b.c.d/p" -> [lo, hi) numeric bounds (python-side: range
    literals fold into the plan as constants)."""
    net, prefix = cidr.split("/")
    a, b, c, d = (int(x) for x in net.split("."))
    lo = a * 16777216 + b * 65536 + c * 256 + d
    span = 1 << (32 - int(prefix))
    if lo % span:
        raise ValueError(f"CIDR {cidr!r} not aligned to /{prefix}")
    return lo, lo + span


def ip_prefix_agg(
    df: DataFrame, ip_col: str, prefix_length: int, min_doc_count: int = 1
) -> DataFrame:
    """ES ip_prefix agg (8.1+): one bucket per network prefix of
    `prefix_length` bits — key = the masked dotted-quad address,
    plus the prefix_length ES echoes into every bucket. One hash agg
    over the codegen numeric form (mask = integer floor-div/multiply,
    no UDF); buckets sort by the numeric prefix ascending, ES's order.
    min_doc_count mirrors the agg's bucket-pruning knob (default 1,
    as in ES).
    -> (key, prefix_length, doc_count)
    """
    if not 0 <= prefix_length <= 32:
        raise ValueError(f"prefix_length must be in [0, 32]: {prefix_length}")
    span = 1 << (32 - prefix_length)
    ipl = ipv4_to_long(ip_col)
    pfx = (F.floor(ipl / span) * span).cast("long")
    key = F.concat_ws(
        ".",
        (F.floor(F.col("_pfx") / 16777216) % 256).cast("int"),
        (F.floor(F.col("_pfx") / 65536) % 256).cast("int"),
        (F.floor(F.col("_pfx") / 256) % 256).cast("int"),
        (F.col("_pfx") % 256).cast("int"),
    )
    return (
        df.select(pfx.alias("_pfx"))
        .groupBy("_pfx")
        .agg(F.count("*").cast("long").alias("doc_count"))
        .filter(F.col("doc_count") >= min_doc_count)
        .orderBy("_pfx")
        .select(
            key.alias("key"),
            F.lit(prefix_length).cast("int").alias("prefix_length"),
            "doc_count",
        )
    )


def ip_range_agg(
    df: DataFrame,
    ip_col: str,
    ranges: list[tuple[str, str | None, str | None]],
    masks: list[str] = (),
) -> DataFrame:
    """ES ip_range agg: one bucket per (key, from, to) — from inclusive,
    to exclusive, open ends allowed — plus CIDR `mask` buckets (keyed by
    the mask itself, ES's convention). Ranges may overlap, so like
    date_range this is conditional sums in ONE single-scan hash agg,
    unpivoted with stack; the numeric comparisons run on the codegen
    ipv4_to_long form."""
    ipl = ipv4_to_long(ip_col)
    entries: list[tuple[str, int | None, int | None]] = []
    for key, lo, hi in ranges:
        entries.append(
            (
                key,
                None if lo is None else _cidr_bounds(lo + "/32")[0],
                None if hi is None else _cidr_bounds(hi + "/32")[0],
            )
        )
    for cidr in masks:
        lo, hi = _cidr_bounds(cidr)
        entries.append((cidr, lo, hi))
    sums = []
    for i, (_, lo, hi) in enumerate(entries):
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (ipl >= lo)
        if hi is not None:
            cond = cond & (ipl < hi)
        sums.append(
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"_b{i}")
        )
    row = df.agg(*sums)
    stack = ", ".join(f"'{key}', _b{i}" for i, (key, _, _) in enumerate(entries))
    return row.select(
        F.expr(f"stack({len(entries)}, {stack}) AS (key, doc_count)")
    )


def variable_width_histogram(
    df: DataFrame, value_col: str, buckets: int = 8
) -> DataFrame:
    """ES variable_width_histogram: cluster a numeric field into at most
    `buckets` variable-width buckets, each reporting min/max/centroid
    (avg) and doc_count (search-aggregations-bucket-variablewidthhistogram;
    reference stack feature, no mario file — the delegated engine owns aggs).

    ES's implementation is an order-dependent approximate 1-D clusterer
    (per-shard nearest-cluster assignment + merges), which is not
    reproducible across engines. This uses the deterministic equivalent:
    single-linkage largest-gap clustering — split the sorted DISTINCT
    value domain at the (buckets-1) widest gaps; contiguous runs form
    the clusters. Deterministic tie-break: wider gap first, then lower
    value, so both engines pick identical boundaries.

    Scale shape: the clustering input is the DISTINCT value domain, not
    the corpus — for real histogram metrics (doc length, score, size)
    that domain is orders of magnitude smaller than the row count and
    is what ES's own in-memory clusterer is bounded by anyway. The gap
    window runs on that reduced table; boundary selection is a top-(b-1)
    TakeOrderedAndProject; the per-row bucket assignment broadcasts the
    <= b-1 boundaries as inline literals (pure codegen comparisons, no
    join, no second shuffle of the corpus).
    """
    from pyspark.sql import Window

    vals = df.select(F.col(value_col).cast("double").alias("v")).where(
        F.col(value_col).isNotNull()
    ).distinct()
    w = Window.orderBy("v")
    gaps = vals.withColumn("gap", F.col("v") - F.lag("v").over(w)).where(
        F.col("gap").isNotNull()
    )
    # top (buckets-1) widest gaps; each gap's right endpoint starts a bucket
    bounds = [
        r["v"]
        for r in gaps.orderBy(F.desc("gap"), F.asc("v"))
        .limit(buckets - 1)
        .collect()
    ]
    v = F.col(value_col).cast("double")
    bucket = F.lit(0)
    for b in sorted(bounds):
        bucket = bucket + F.when(v >= F.lit(b), 1).otherwise(0)
    return (
        df.where(F.col(value_col).isNotNull())
        .groupBy(bucket.cast("long").alias("bucket"))
        .agg(
            F.min(v).alias("min"),
            F.max(v).alias("max"),
            F.round(F.avg(v), 4).alias("centroid"),
            F.count("*").alias("doc_count"),
        )
        .orderBy("bucket")
    )


def terms_agg_sharded(
    df: DataFrame,
    key_col: str,
    size: int = 5,
    shard_size: int = 3,
    n_shards: int = 4,
    shard_col: str = "doc_id",
) -> DataFrame:
    """ES terms agg TWO-PHASE distributed semantics, including
    `doc_count_error_upper_bound`: each shard returns only its top
    `shard_size` buckets by local count, the coordinator sums what was
    reported, and a term's error bound is the sum — over full shards
    that did NOT report it — of that shard's smallest reported count
    (the term could have been hiding just below each cutoff).

    Shards are deterministic (`shard_col % n_shards` — the stand-in for
    ES's routing hash). This is the real ES approximation contract:
    reported doc_counts can UNDERCOUNT, and the bound quantifies by how
    much; shard_size >= the true cardinality makes the error 0.

    Plan shape: one (shard, key) hash agg; per-shard top-N is a window
    over the REDUCED (shard, key) table partitioned BY SHARD (parallel,
    never global); the error join crosses <= size*n_shards candidate
    keys with an n_shards-row broadcast dim. At scale every post-agg
    row count is bounded by shard_size * n_shards.
    """
    shard = (F.col(shard_col) % n_shards).cast("long")
    per = df.select(shard.alias("shard"), F.col(key_col).alias("key")).groupBy(
        "shard", "key"
    ).agg(F.count("*").cast("long").alias("cnt"))
    w = Window.partitionBy("shard").orderBy(F.desc("cnt"), F.asc("key"))
    ranked = per.withColumn("r", F.row_number().over(w))
    reported = ranked.filter(F.col("r") <= shard_size)
    # a shard that reported fewer than shard_size buckets reported ALL
    # its buckets — nothing can hide below its cutoff
    shard_stats = reported.groupBy("shard").agg(
        F.min("cnt").alias("cutoff"), F.count("*").alias("n_rep")
    ).withColumn(
        "cutoff",
        F.when(F.col("n_rep") >= shard_size, F.col("cutoff")).otherwise(
            F.lit(0)
        ),
    )
    summed = reported.groupBy("key").agg(
        F.sum("cnt").cast("long").alias("doc_count")
    )
    top = summed.orderBy(F.desc("doc_count"), F.asc("key")).limit(size)
    # error bound: for each top key, sum the cutoffs of full shards
    # that did not report it
    missing = (
        top.crossJoin(F.broadcast(shard_stats.select("shard", "cutoff")))
        .join(
            reported.select("key", "shard").withColumn(
                "rep", F.lit(1)
            ),
            ["key", "shard"],
            "left",
        )
        .withColumn(
            "err",
            F.when(F.col("rep").isNull(), F.col("cutoff")).otherwise(F.lit(0)),
        )
        .groupBy("key", "doc_count")
        .agg(F.sum("err").cast("long").alias("doc_count_error_upper_bound"))
    )
    return missing.orderBy(F.desc("doc_count"), F.asc("key")).select(
        "key", "doc_count", "doc_count_error_upper_bound"
    )
