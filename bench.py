"""Benchmark harness (driver contract): one JSON line on stdout.

Times the engine's headline paths at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]:

  index_build      tokenize -> doc table -> compressed postings (B4/B5)
                   over a deterministic synthetic pages corpus sized to
                   the scale factor (docs_per_sec reported alongside)
  bm25_wand        block-max WAND top-10, full query set, vs postings
  bm25_exhaustive  exhaustive scorer on the driver documents table
  plus representative suite queries (aggs, joins, dedup).

Scaling-efficiency evidence (local[8] vs local[32], same input) is
produced by scripts/scaling_bench.py and recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0

    # box telemetry (self-calibrating artifact): single-core cpu/mem
    # probes BEFORE Spark starts plus the CPU-steal share over the
    # whole run, so cross-round comparisons can normalize for box
    # regime (this box's throughput drifts ~1.5-2x on co-tenant noise)
    # without archaeology. The probes are the same kernels
    # scripts/box_calibration.py uses for the scaling ceiling.
    sys.path.insert(0, str(Path(__file__).resolve().parent / "scripts"))
    import box_calibration as _boxcal

    box: dict = dict(_boxcal.quick_probe())
    _steal0 = _boxcal.steal_jiffies()

    from mario_spark import docs, query
    from mario_spark.fixtures import (
        DOCUMENTS_QUERY_SET,
        make_pages_query_set,
        pages_df,
        query_terms_df,
    )
    from mario_spark.postings import build_postings
    from mario_spark.session import get_spark
    from mario_spark.suite import SUITE
    from mario_spark.wand import search_wand

    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    extra: dict[str, float] = {}

    def timed(name: str, fn) -> None:
        t0 = time.perf_counter()
        fn()
        timings[name] = round(time.perf_counter() - t0, 3)

    # --- index build over synthetic pages, sized to sf (sf0.1 -> 50k docs)
    n_docs = max(2000, int(500_000 * sf)) if sf > 0 else 5000
    pages = pages_df(spark, n_docs, seed=42).persist()
    pages.count()  # materialize generation outside the timed section

    # warm-up: a miniature build+query spins up the Python worker pool
    # and compiles codegen/JIT once, so the timed sections measure the
    # engine, not session cold-start (cost amortized to ~0 in any real
    # long-running job)
    wd = docs.build_doc_table(pages_df(spark, 2000, seed=1)).persist()
    wst = docs.corpus_stats(wd).collect()[0]
    wpost, wdic, _ = build_postings(wd, wst["n_docs"])
    search_wand(
        wpost, wdic, query_terms_df(spark, make_pages_query_set(seed=1, n=5)),
        wst["n_docs"], wst["avgdl"], k=10,
    ).count()
    wd.unpersist()

    built = {}

    def _build() -> None:
        d = docs.build_doc_table(pages).persist()
        st = docs.corpus_stats(d).collect()[0]
        post, dic, rw = build_postings(d, st["n_docs"])
        post, dic = post.persist(), dic.persist()
        built["n_postings"] = post.count()
        built["d"], built["st"], built["post"], built["dic"] = d, st, post, dic

    timed("index_build", _build)
    extra["index_docs"] = n_docs
    extra["docs_per_sec"] = round(n_docs / timings["index_build"], 1)
    # NOTE: steady-state build throughput (fixed costs amortized over an
    # 800k-doc corpus, warm-up discarded, A-B interleaved across noise)
    # is measured by scripts/scaling_bench.py and recorded in
    # BENCH/BASELINE.md — this per-round number includes ~2s of fixed
    # cost on a 50k corpus and the box's documented ±2x bimodal noise.

    qset = make_pages_query_set(seed=42, n=50)
    qdf = query_terms_df(spark, qset)

    timed(
        "bm25_wand",
        lambda: search_wand(
            built["post"], built["dic"], qdf,
            built["st"]["n_docs"], built["st"]["avgdl"], k=10,
        ).count(),
    )
    extra["sec_per_query_wand"] = round(timings["bm25_wand"] / len(qset), 4)

    # warm serving path (QuerySession: dbucket-partitioned cached
    # postings, driver-side term dictionary — no shuffle, no per-query
    # dictionary job). Batch amortizes Spark's job floor; the single-
    # query line is that floor plus the kernel.
    from mario_spark.wand import QuerySession

    sess = QuerySession(
        built["post"], built["dic"],
        built["st"]["n_docs"], built["st"]["avgdl"],
    ).warm()
    sess.search(qset[:3]).count()  # plan/codegen warm-up

    t0 = time.perf_counter()
    sess.search(qset, k=10).count()
    timings["bm25_wand_session"] = round(time.perf_counter() - t0, 3)
    extra["sec_per_query_session"] = round(
        timings["bm25_wand_session"] / len(qset), 4
    )

    # sharded-dictionary serving (the 100x-vocab mode, forced on by a
    # tiny threshold): same query batch with the driver holding only a
    # bounded LRU instead of the vocabulary — the line that prices the
    # warm-session scale fix
    sh = QuerySession(
        built["post"], built["dic"],
        built["st"]["n_docs"], built["st"]["avgdl"],
        vocab_cache_max=10,
    ).warm()
    sh.search(qset[:3]).count()  # plan/codegen + first LRU fill warm-up
    t0 = time.perf_counter()
    sh.search(qset, k=10).count()
    timings["bm25_wand_session_sharded"] = round(time.perf_counter() - t0, 3)
    extra["sec_per_query_session_sharded"] = round(
        timings["bm25_wand_session_sharded"] / len(qset), 4
    )
    sh.close()

    singles = [qset[i] for i in (0, 5, 21, 30, 45)]
    t0 = time.perf_counter()
    for qid, qtext in singles:
        sess.search([(qid, qtext)], k=10, driver_limit=0).count()
    timings["bm25_wand_single"] = round(time.perf_counter() - t0, 3)
    extra["sec_per_query_single"] = round(
        timings["bm25_wand_single"] / len(singles), 4
    )

    # coordinator fast path: rare-term singles collected + scored
    # driver-side (one job); head terms exceed driver_limit and route
    # to the distributed path automatically
    t0 = time.perf_counter()
    for qid, qtext in singles:
        sess.search([(qid, qtext)], k=10).count()
    timings["bm25_wand_single_fast"] = round(time.perf_counter() - t0, 3)
    extra["sec_per_query_single_fast"] = round(
        timings["bm25_wand_single_fast"] / len(singles), 4
    )

    timed(
        "bm25_exhaustive",
        lambda: query.search_exhaustive(built["d"], qdf, k=10).count(),
    )

    # --- representative suite queries on driver testdata
    for name in [
        "bm25_topk",
        "term_df",
        "exact_dedup_groups",
        "q1_pricing_summary",
        "q3_top_orders",
        "phrase_topk",
        "phrase_shingle_topk",  # index_phrases fast path vs phrase_topk
        "bpe_encode_tokens",
        "bm25_topk_title",
        "simhash_pairs",
        "fuzzy_topk",        # incl. one shared _wand_index build
        "facet_terms_lang",
        "search_after_page",
        "phrase_prefix_topk",
        "more_like_this_topk",
        "agg_cardinality_users",
        "query_string_topk",
        "query_string_fields_topk",
        "span_near_unordered_topk",  # shared pos index
        "gopher_quality",
        "incremental_minhash_dedup",
        "url_dedup",
        "repetition_stats",
        "combined_fields_topk",
        "rrf_hybrid_topk",
        "lm_cross_entropy",
        "intervals_topk",
        "simple_qs_topk",
        "ann_pq_topk",
        "ann_int8_rescore",
        "ann_ivfpq_topk",
        "ann_bit_rescore",
        "esql_stats",
        "lsh_recall_audit",
        "clf_quality_score",
        "bm25_topk_wand_filtered",  # filter-context WAND (shared index)
        "span_multi_topk",          # prefix rewrite -> SpanOr (shared pos index)
        "esql_bucket_stats",
        "agg_geo_line",
        "mixture_resample",
        "exact_substring_dedup",
        "knn_graph_exact",          # batch k-NN graph (HNSW twin)
        "knn_graph_ivf",            # cell-bucketed 10^9-vector shape
        "ivf_recall_audit",         # measured IVF recall/probe curve
        "highlight_best_passage",   # unified-highlighter passage scorer
    ]:
        if name in SUITE:
            timed(name, lambda n=name: SUITE[n](spark, sf_dir).count())

    total = round(sum(timings.values()), 3)
    b1, s1 = _boxcal.steal_jiffies()
    b0, s0 = _steal0
    box["steal_pct"] = round(
        100.0 * (s1 - s0) / max(b1 - b0 + s1 - s0, 1), 3
    )
    print(
        json.dumps(
            {
                "metric": "suite_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": cpus,
                "extra": extra,
                "box": box,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
