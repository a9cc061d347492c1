"""Physical-plan assertions: the optimizations we rely on at 100TB must
be visible in .explain output, not just hoped for (SURVEY §4.2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_parquet_filter_pushdown(spark):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(d.filter(F.col("lang") == "en").select("doc_id"))
    assert "PushedFilters" in plan
    assert "EqualTo(lang,en)" in plan.replace(" ", "")
    # column pruning: scan must read only what the query needs
    assert "ReadSchema" in plan
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "text" not in read_schema and "doc_id" in read_schema


def test_postings_term_filter_pushes_to_scan(spark, tmp_path):
    from mario_spark import docs
    from mario_spark.fixtures import documents_as_pages
    from mario_spark.postings import build_postings

    d = docs.build_doc_table(documents_as_pages(spark, SF_DIR))
    post, dic, _ = build_postings(d, 500, range_width=256)
    path = str(tmp_path / "postings")
    post.write.parquet(path)
    stored = spark.read.parquet(path)
    plan = _plan(stored.filter(F.col("term").isin(["join", "scan"])))
    flat = plan.replace(" ", "")
    assert "PushedFilters" in plan and "In(term" in flat


def test_q3_broadcasts_customer_dim(spark):
    from mario_spark.suite import q3_top_orders

    plan = _plan(q3_top_orders(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan


def test_bm25_broadcasts_query_side(spark):
    """The per-term idf table (tiny) must broadcast into the tf join —
    never a shuffle of the full tf stream against it."""
    from mario_spark.suite import bm25_topk

    plan = _plan(bm25_topk(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_codegen_covers_jvm_token_count(spark):
    from mario_spark.suite import token_count_bpe

    plan = _plan(token_count_bpe(spark, SF_DIR))
    # formatted mode marks codegen stages with a leading '*'
    assert "* Project" in plan


def test_topk_uses_take_ordered(spark):
    """Global top-k must plan as TakeOrderedAndProject, not a full sort."""
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    plan = _plan(li.orderBy(F.desc("l_extendedprice")).limit(5))
    assert "TakeOrderedAndProject" in plan


def test_terms_agg_and_search_after_use_take_ordered(spark):
    """Facet buckets and cursor pages are global top-k: they must plan
    as TakeOrderedAndProject (never Sort over Exchange SinglePartition),
    and the search_after cursor predicate must push into the scan."""
    from mario_spark.ops import aggs

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(aggs.terms_agg(d, "lang", size=10, metric_col="n_chars"))
    assert "TakeOrderedAndProject" in plan

    page = aggs.search_after(
        d.select("doc_id", "n_chars"), "n_chars", 10, cursor=(350, 17)
    )
    plan = _plan(page)
    assert "TakeOrderedAndProject" in plan
    assert "PushedFilters: [" in plan and "n_chars" in plan.split(
        "PushedFilters"
    )[1].split("]")[0]


def test_simhash_pairs_no_cross_join(spark):
    """Banded simhash pair generation must plan as an equi-join on the
    band key — never CartesianProduct / BroadcastNestedLoopJoin."""
    from mario_spark.suite import simhash_pairs

    plan = _plan(simhash_pairs(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ngram_pairs_no_cross_join(spark):
    from mario_spark.suite import ngram_jaccard_pairs

    plan = _plan(ngram_jaccard_pairs(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ann_lsh_topk_uses_take_ordered(spark):
    """The global top-pairs finish must be TakeOrderedAndProject (each
    partition keeps k rows), not a single-partition global rank window
    over every candidate pair."""
    from mario_spark.ops import ann

    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    plan = _plan(ann.lsh_nearest_pairs(e, top_pairs=20))
    assert "TakeOrderedAndProject" in plan


def test_query_session_no_dbucket_shuffle(spark):
    """QuerySession's postings are cached pre-partitioned on dbucket,
    so the groupBy(dbucket).applyInPandas must NOT plan an Exchange
    between the cache scan and the kernel (the cold path does)."""
    from mario_spark import docs
    from mario_spark.fixtures import documents_as_pages
    from mario_spark.postings import build_postings
    from mario_spark.wand import QuerySession, search_wand

    d = docs.build_doc_table(documents_as_pages(spark, SF_DIR))
    st = docs.corpus_stats(d).collect()[0]
    post, dic, _ = build_postings(d, st["n_docs"], range_width=256)
    sess = QuerySession(post, dic, st["n_docs"], st["avgdl"]).warm()
    # driver_limit=0 forces the distributed path (the coordinator fast
    # path would otherwise serve this rare-term query driver-side)
    plan = _plan(sess.search([(0, "join scan")], driver_limit=0))

    def exchange_between_scan_and_kernel(plan_text: str) -> bool:
        # walk the tree section below the kernel node until the first
        # scan (cache or parquet); an Exchange on that path is the
        # per-query dbucket shuffle. Exchanges deeper than the scan
        # belong to the cached build plan and don't count.
        lines = plan_text.splitlines()
        kernel = next(
            i for i, l in enumerate(lines) if "FlatMapGroupsInPandas" in l
        )
        for l in lines[kernel + 1 :]:
            if "InMemoryTableScan" in l or "Scan parquet" in l:
                return False
            if "Exchange" in l:
                return True
        return False

    assert not exchange_between_scan_and_kernel(plan)
    # and the cold path DOES have that exchange (sanity for the matcher)
    from mario_spark.fixtures import query_terms_df

    cold = _plan(
        search_wand(
            post, dic, query_terms_df(spark, [(0, "join scan")]),
            st["n_docs"], st["avgdl"],
        )
    )
    assert exchange_between_scan_and_kernel(cold)
    sess.close()


def test_filtered_search_semi_join_no_extra_shuffle(spark):
    """Filter context must plan the doc_id restriction as a (LeftSemi)
    join after aggregation — and the filter side's predicate must push
    into its parquet scan."""
    from mario_spark.suite import bm25_topk_filtered

    plan = _plan(bm25_topk_filtered(spark, SF_DIR))
    assert "LeftSemi" in plan
    flat = plan.replace(" ", "")
    assert "PushedFilters" in plan and "lang" in flat


def test_range_agg_broadcasts_dim_and_emits_empty_buckets(spark):
    """The ranges dim is tiny: the non-equi join must broadcast (never
    shuffle the fact side against 4 rows), and the empty tail bucket
    must still be emitted with doc_count 0."""
    from mario_spark.suite import agg_range_nchars

    out = agg_range_nchars(spark, SF_DIR)
    plan = _plan(out)
    assert "BroadcastNestedLoopJoin" in plan  # non-equi + broadcast dim
    rows = {r["key"]: r for r in out.collect()}
    assert rows["1000000-"]["doc_count"] == 0
    assert rows["1000000-"]["avg"] == 0.0


def test_cardinality_kmv_partitions_by_key(spark):
    """The KMV top-k window partitions by the agg key — the plan must
    never collapse to a single partition."""
    from mario_spark.suite import agg_cardinality_users

    plan = _plan(agg_cardinality_users(spark, SF_DIR))
    assert "SinglePartition" not in plan


def test_regexp_expansion_broadcasts_query_side(spark):
    """The regexp dictionary pass must broadcast the (tiny) pattern
    table — never shuffle or nested-loop the vocabulary against it on
    a non-broadcast side."""
    from mario_spark import docs
    from mario_spark.fixtures import documents_as_pages
    from mario_spark.fuzzy import expand_regexp
    from mario_spark.postings import build_postings

    d = docs.build_doc_table(documents_as_pages(spark, SF_DIR))
    _, dic, _ = build_postings(d, 500, range_width=256)
    q = spark.createDataFrame([(0, "jo.n")], "query_id long, term string")
    plan = _plan(expand_regexp(dic, q))
    assert "BroadcastNestedLoopJoin" in plan  # theta join, broadcast side
    assert "CartesianProduct" not in plan


def test_doc_id_assignment_never_single_partitions(spark):
    """The classic row_number-over-global-Window trap collapses to ONE
    partition; our partition-offset technique must not."""
    from mario_spark import docs
    from mario_spark.fixtures import pages_df

    pages = pages_df(spark, 400, seed=2, partitions=4)
    ids = docs.assign_doc_ids(pages.select("url", "lang", "text"))
    plan = _plan(ids)
    # a global Window would show 'Window' with no partition spec and a
    # preceding Exchange SinglePartition
    assert "SinglePartition" not in plan


def test_suggest_terms_broadcasts_inputs(spark):
    """The did-you-mean dictionary pass must broadcast the tiny input
    list (BroadcastNestedLoopJoin over the length-band theta join),
    never shuffle the dictionary."""
    from mario_spark.suite import term_suggest

    plan = _plan(term_suggest(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_histogram_spine_broadcasts(spark):
    """The empty-bucket spine is dozens of rows — it must broadcast
    into the left join against the hash agg."""
    from mario_spark.suite import agg_histogram_nchars

    plan = _plan(agg_histogram_nchars(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan


def test_stratified_sample_is_scan_side_filter(spark):
    """The hash-coin sample is a pure Filter over the scan: no
    Exchange (shuffle) anywhere in the plan."""
    from mario_spark.suite import stratified_sample

    plan = _plan(stratified_sample(spark, SF_DIR))
    assert "Exchange" not in plan


def test_boosting_broadcasts_negative_set(spark):
    from mario_spark.suite import boosting_topk

    plan = _plan(boosting_topk(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_pack_sequences_windows_by_shard(spark):
    """The running-sum window partitions by shard — a global
    (SinglePartition) window would serialize the whole corpus."""
    from mario_spark.suite import pack_sequences

    plan = _plan(pack_sequences(spark, SF_DIR))
    assert "Window" in plan
    assert "Exchange SinglePartition" not in plan
    assert "hashpartitioning(shard" in plan.replace(" ", "")


def test_adjacency_matrix_single_pass_no_join(spark):
    """All singles + pairwise intersections must come from ONE
    conditional-sum aggregation over one scan — no joins, no union of
    per-filter scans."""
    from mario_spark.suite import agg_adjacency_matrix

    plan = _plan(agg_adjacency_matrix(spark, SF_DIR))
    assert "Join" not in plan and "Union" not in plan
    # tree section lists each scan once as "Scan parquet  (n)"
    assert plan.count("Scan parquet  (") == 1


def test_geo_rings_broadcast_dim(spark):
    """The rings dim must broadcast (empty-ring LEFT join); the doc
    side must not shuffle into the join."""
    from mario_spark.suite import agg_geo_distance_rings

    plan = _plan(agg_geo_distance_rings(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_multi_terms_take_ordered(spark):
    from mario_spark.suite import agg_multi_terms

    plan = _plan(agg_multi_terms(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan


def test_match_count_broadcasts_queries_no_window(spark):
    """_count is a pure agg: query terms broadcast, no rank window,
    no sort anywhere."""
    from mario_spark.suite import match_count

    plan = _plan(match_count(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan and "Sort" not in plan.replace(
        "SortAggregate", ""
    )


def test_bucket_pipeline_aggs_single_scan(spark):
    """bucket_script + bucket_selector run on the reduced bucket
    table: one scan of events, no join, no window."""
    from mario_spark.suite import agg_bucket_selector

    plan = _plan(agg_bucket_selector(spark, SF_DIR))
    assert plan.count("Scan parquet  (") == 1
    assert "Join" not in plan and "Window" not in plan


def test_pinned_broadcasts_pins_no_cartesian(spark):
    """Pin dim joins must broadcast (pins are a literal list) and the
    union of pinned + organic must not introduce a cartesian or a
    global (unpartitioned) sort."""
    from mario_spark.suite import pinned_topk

    plan = _plan(pinned_topk(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_bucket_sort_take_ordered(spark):
    """ES bucket_sort = orderBy().limit() over the reduced bucket
    table -> TakeOrderedAndProject, not a global Sort+Exchange."""
    from mario_spark.suite import agg_bucket_sort

    plan = _plan(agg_bucket_sort(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan


def test_semdedup_broadcasts_centroids(spark):
    """Centroid assignment is the broadcast-matrix mapInPandas argmin
    (_assign_cells): no per-vector rank window (a Window keyed on
    vec_id would shuffle N x n_cells rows) and no cartesian — the
    centroid matrix rides the task closure, not a join."""
    from mario_spark.suite import semdedup_keep

    plan = _plan(semdedup_keep(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    # no Window operator may be keyed on vec_id (per-vector rank)
    for frag in plan.split("\n"):
        if "Window" in frag and "partition" in frag.lower():
            assert "vec_id" not in frag


def test_chunk_dedup_shuffles_digests_not_text(spark):
    """chunk_dedup's exchanges must carry md5 digests and packed order
    keys only — the text/token-array column never crosses a shuffle."""
    from mario_spark.suite import chunk_dedup

    plan = _plan(chunk_dedup(spark, SF_DIR))
    import re

    lines = plan.splitlines()
    inputs = [
        lines[i + 1]
        for i, l in enumerate(lines)
        if re.fullmatch(r"\(\d+\) Exchange", l.strip())
    ]
    assert inputs, "expected hash exchanges in the chunk_dedup plan"
    for l in inputs:
        assert "text" not in l and "arr" not in l, l


def test_terms_set_broadcasts_query_dim_no_cartesian(spark):
    """terms_set: the (query, term, idf, min_match) dim must broadcast
    onto tf; the min_match filter rides the same agg — no extra join,
    no cartesian."""
    from mario_spark.suite import terms_set_topk

    plan = _plan(terms_set_topk(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_percolate_broadcasts_registry(spark):
    """percolate: the stored-query registry is the dim — it must
    broadcast; the corpus itself never becomes a join build side."""
    from mario_spark.suite import percolate_match

    plan = _plan(percolate_match(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_combined_fields_single_idf_no_cartesian(spark):
    """combined_fields: per-field tf unions feed ONE (doc, term) agg;
    the query/idf dim broadcasts; no cartesian anywhere."""
    from mario_spark.suite import combined_fields_topk

    plan = _plan(combined_fields_topk(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_distance_feature_joins_after_agg(spark):
    """distance_feature: the decay join is on doc_id AFTER the BM25
    agg (HashAggregate appears before the value join in the plan tree),
    and the plan stays cartesian-free."""
    from mario_spark.suite import distance_feature_topk

    plan = _plan(distance_feature_topk(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "HashAggregate" in plan


def test_intervals_pure_codegen_no_python(spark):
    """intervals must run as Catalyst array HOFs — no Python eval node
    (the span kernels are mapInPandas; this path must not be)."""
    from mario_spark.suite import intervals_topk

    plan = _plan(intervals_topk(spark, SF_DIR))
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_rrf_fuses_small_windows(spark):
    """RRF fusion joins two already-top-k frames: no cartesian and no
    global (unpartitioned) sort anywhere in the fused plan."""
    from mario_spark.suite import rrf_hybrid_topk

    plan = _plan(rrf_hybrid_topk(spark, SF_DIR))
    assert "CartesianProduct" not in plan


def test_lm_cross_entropy_broadcasts_vocab_scalar(spark):
    """The vocab-size frame is 1 row — it must broadcast; count tables
    join hash-side; no cartesian beyond that broadcast."""
    from mario_spark.suite import lm_cross_entropy

    plan = _plan(lm_cross_entropy(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_ids_query_pushes_in_filter_to_scan(spark):
    """ids query must be a pushed-down In filter on the parquet scan."""
    from mario_spark.suite import ids_query

    plan = _plan(ids_query(spark, SF_DIR))
    assert "PushedFilters" in plan and "In(doc_id" in plan.replace(" ", "")


def test_ann_filtered_pushes_label_filter(spark):
    """kNN pre-filtering: the label predicate must reach the candidate
    parquet scan, pruning before any distance math."""
    from mario_spark.suite import ann_filtered_topk

    plan = _plan(ann_filtered_topk(spark, SF_DIR))
    assert "EqualTo(label,3)" in plan.replace(" ", "")


def test_bool_prefix_broadcasts_prefix_dim(spark):
    """match_bool_prefix: the startswith theta-join must be a broadcast
    nested loop of the tiny prefix dim — never a CartesianProduct."""
    from mario_spark.suite import bool_prefix_topk

    plan = _plan(bool_prefix_topk(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_frequent_item_sets_apriori_prune_broadcast(spark):
    """frequent_item_sets: the frequent-item dim (post-support-prune)
    must broadcast into the presence frame before pair generation."""
    from mario_spark.suite import agg_frequent_item_sets

    plan = _plan(agg_frequent_item_sets(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_runtime_field_folds_into_scan(spark):
    """A runtime field is a projection — the terms agg over it must
    stay one scan + hash agg + TakeOrderedAndProject (no join, no
    window)."""
    from mario_spark.suite import runtime_field_terms

    plan = _plan(runtime_field_terms(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan
    assert "Join" not in plan


def test_eql_sequence_pushes_type_filters(spark):
    """EQL sequence: both event-type filters must reach the parquet
    scans; the key join must not be a cartesian."""
    from mario_spark.suite import eql_sequence_vp

    plan = _plan(eql_sequence_vp(spark, SF_DIR))
    flat = plan.replace(" ", "")
    assert "EqualTo(event_type,view)" in flat
    assert "EqualTo(event_type,purchase)" in flat
    assert "CartesianProduct" not in plan


def test_transform_pivot_single_agg_no_join(spark):
    """Transform pivot: one hash agg over the scan, no join anywhere
    (all metrics algebraic)."""
    from mario_spark.suite import transform_pivot_users

    plan = _plan(transform_pivot_users(spark, SF_DIR))
    assert "HashAggregate" in plan
    assert "Join" not in plan


def test_categorize_text_take_ordered(spark):
    """categorize_text: signature projection + hash agg +
    TakeOrderedAndProject — no window, no join."""
    from mario_spark.suite import categorize_text_docs

    plan = _plan(categorize_text_docs(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan
    assert "Join" not in plan


def test_linear_hybrid_no_cartesian(spark):
    """linear retriever fusion: min-max dims broadcast; no cartesian."""
    from mario_spark.suite import linear_hybrid_topk

    plan = _plan(linear_hybrid_topk(spark, SF_DIR))
    assert "CartesianProduct" not in plan


def test_sparse_vector_broadcast_single_agg(spark):
    """sparse_vector: query terms broadcast onto the weight stream,
    one (query, doc) hash agg, no cartesian."""
    from mario_spark.suite import sparse_vector_topk

    plan = _plan(sparse_vector_topk(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_global_bucket_single_pass(spark):
    """global agg: filtered + global metrics in ONE aggregation pass
    (conditional sums), no join, no second scan."""
    from mario_spark.suite import agg_global_bucket

    plan = _plan(agg_global_bucket(spark, SF_DIR))
    assert "Join" not in plan
    # exactly one scan (each scan prints one Location line)
    assert plan.count("Location: InMemoryFileIndex") == 1


def test_esql_pipeline_one_plan_pushdown_takeordered(spark):
    """ES|QL pipeline compiles to ONE Catalyst plan: the WHERE folds
    into the parquet scan and SORT+LIMIT fuse to
    TakeOrderedAndProject."""
    from mario_spark.suite import esql_stats

    plan = _plan(esql_stats(spark, SF_DIR))
    assert "EqualTo(lang,en)" in plan.replace(" ", "")
    assert "TakeOrderedAndProject" in plan


def test_esql_enrich_broadcasts_dim(spark):
    """ES|QL ENRICH = broadcast lookup join of the policy dim."""
    from mario_spark.suite import esql_enrich

    plan = _plan(esql_enrich(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_has_parent_broadcasts_parent_dim(spark):
    """has_parent = broadcast of the filtered parent dim; the child
    side must stay a scan-side probe (no shuffle of children to join)."""
    from mario_spark.suite import has_parent_match

    plan = _plan(has_parent_match(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_has_child_pushes_child_filter(spark):
    """has_child's inner query must reach the child parquet scan, and
    the final top-k must be TakeOrderedAndProject, not a global sort."""
    from mario_spark.suite import has_child_topk

    plan = _plan(has_child_topk(spark, SF_DIR))
    assert "EqualTo(o_orderpriority,1-URGENT)" in plan.replace(" ", "")
    assert "TakeOrderedAndProject" in plan


def test_inlinestats_broadcasts_group_table(spark):
    """ES|QL INLINESTATS joins the reduced group table back to the fact
    rows as a broadcast — the fact side must never shuffle."""
    from mario_spark.suite import esql_inlinestats

    plan = _plan(esql_inlinestats(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_geo_polygon_is_pure_scan_predicate(spark):
    """The unrolled ray-cast must fuse into the scan: no join, no UDF,
    no exchange before the filter."""
    from mario_spark.suite import geo_polygon_query

    plan = _plan(geo_polygon_query(spark, SF_DIR))
    assert "Join" not in plan
    assert "Python" not in plan  # no UDF of any kind
    assert "codegen id" in plan  # filter runs inside whole-stage codegen
    assert "Exchange" not in plan  # single scan, zero shuffles


def test_geo_sort_topk_is_take_ordered(spark):
    """Sort-by-_geo_distance top-10 must plan as TakeOrderedAndProject,
    never a global sort of the corpus."""
    from mario_spark.suite import geo_sort_topk

    plan = _plan(geo_sort_topk(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan


def test_mixture_resample_broadcasts_rates(spark):
    """The O(#domains) rate table must broadcast into the doc scan; the
    keep decision is a filter, not a shuffle of the docs."""
    from mario_spark.suite import mixture_resample

    plan = _plan(mixture_resample(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_esql_sample_fuses_into_scan(spark):
    """SAMPLE's md5 coin is a pure projection predicate — single scan,
    one hash agg, nothing else."""
    from mario_spark.esql import run_esql

    plan = _plan(
        run_esql(
            spark, SF_DIR,
            'FROM documents | SAMPLE 0.25 | STATS n = COUNT(*) BY lang',
        )
    )
    assert "Join" not in plan
    assert plan.count("Exchange") <= 2  # agg partial->final only


def test_bit_hamming_local_topk_bounds_exchange(spark):
    """Bit-vector kNN: each partition pre-selects its local top-k per
    query, so the frame entering the global rank window is bounded by
    batches x |queries| x k — NEVER corpus-sized — and no cartesian
    appears anywhere."""
    from mario_spark.ops.ann import _bit_hamming_local, bit_hamming_topk
    from mario_spark.suite import ann_bit_hamming_topk

    plan = _plan(ann_bit_hamming_topk(spark, SF_DIR))
    assert "CartesianProduct" not in plan

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n = emb.count()
    qids = [0, 7, 21]
    k = 10
    local = _bit_hamming_local(emb, qids, k)
    pre_window = local.count()
    # arrow batches cap at 10k rows -> a generous upper bound on
    # batches; the real point is pre_window << n * len(qids)
    n_parts = emb.rdd.getNumPartitions()
    max_batches = n_parts + n // 10_000 + 1
    assert pre_window <= max_batches * len(qids) * k
    assert pre_window < n * len(qids) / 10
    # and the global result is still exactly k per query
    res = bit_hamming_topk(emb, qids, k=k)
    assert res.count() == len(qids) * k


def test_collapse_inner_hits_broadcasts_groups(spark):
    """collapse+inner_hits: the 5-groups-per-query survivor list joins
    back as a broadcast; no global (unpartitioned) sort appears."""
    from mario_spark.suite import collapse_inner_hits

    plan = _plan(collapse_inner_hits(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_bloom_and_training_order_plan_shapes(spark):
    """Bloom membership must broadcast the bit set into a left-semi
    join (the candidate side streams map-side); the training-order rank
    window must partition by shard — never Exchange SinglePartition."""
    from mario_spark.suite import bloom_decontaminate, training_order

    plan = _plan(bloom_decontaminate(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan

    plan = _plan(training_order(spark, SF_DIR))
    assert "SinglePartition" not in plan
    assert "hashpartitioning(shard" in plan


def test_exact_substring_dedup_gram_shuffles_carry_digests(spark):
    """The gram stream (n x corpus volume) must cross exchanges as md5
    digests + packed int keys only; the token array may appear in at
    most ONE exchange — the irreducible doc_id rewrite join."""
    import re

    from mario_spark.suite import exact_substring_dedup

    plan = _plan(exact_substring_dedup(spark, SF_DIR))
    lines = plan.splitlines()
    inputs = [
        lines[i + 1]
        for i, l in enumerate(lines)
        if re.fullmatch(r"\(\d+\) Exchange", l.strip())
    ]
    assert inputs, "expected hash exchanges in the exact_substring plan"
    with_arr = [l for l in inputs if "arr" in l or "text" in l]
    assert len(with_arr) <= 1, with_arr
    assert "CartesianProduct" not in plan


def test_bpe_encode_is_pure_codegen(spark):
    """The BPE apply chain must stay JVM-side: no Python evaluation node
    of any kind in the plan (the whole point of the replace() encoding)."""
    from mario_spark.ops.textstats import bpe_encode_stats

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(bpe_encode_stats(d))
    assert "EvalPython" not in plan  # catches Batch- and ArrowEvalPython
    assert "codegen id" in plan  # formatted mode's WholeStageCodegen marker


def test_synonym_graph_no_cartesian(spark):
    """Both synonym paths join on keys (term / query_id / doc_id); the
    only cross joins are 1-row broadcast stats."""
    from mario_spark.fixtures import SYNONYM_GRAPH_SET
    from mario_spark.phrase import search_synonym_graph

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(search_synonym_graph(d, SYNONYM_GRAPH_SET, k=10))
    assert "CartesianProduct" not in plan


def test_knn_graph_plans_are_matmul_shaped(spark):
    """knn_graph: one MapInPandas over the candidate scan (broadcast
    query matrix rides the closure), no cartesian/NLJ, and the only
    wide operators are the per-src rank window's exchange. The IVF
    variant groups by cell (FlatMapGroupsInPandas) — again no
    cartesian product anywhere."""
    from mario_spark.ops import ann

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    p = _plan(ann.knn_graph(e, k=5))
    assert "MapInPandas" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    # local top-k bounds the window input: the plan sorts AFTER the
    # python stage, never the raw N x N pair stream
    p2 = _plan(ann.knn_graph_ivf(e, k=5))
    assert "FlatMapGroupsInPandas" in p2
    assert "CartesianProduct" not in p2
    assert "BroadcastNestedLoopJoin" not in p2


def test_ip_prefix_single_hash_agg(spark):
    """ip_prefix agg: exactly one aggregation pair (partial+final) over
    the scan — the mask is codegen arithmetic, no UDF, no join."""
    from mario_spark.ops import aggs

    from pyspark.sql import functions as F

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").withColumn(
        "ip",
        F.concat_ws(
            ".", F.lit(10),
            F.pmod(F.col("user_id"), F.lit(64)).cast("string"),
            F.pmod(F.floor(F.col("event_id") / 256), F.lit(256)).cast("string"),
            F.pmod(F.col("event_id"), F.lit(256)).cast("string"),
        ),
    )
    p = _plan(aggs.ip_prefix_agg(ev, "ip", 20))
    # formatted mode prints each node in the tree AND in the details
    # section; count tree nodes only
    assert p.count(") HashAggregate") == 2  # partial + final
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "Join" not in p


def test_lsh_verify_joins_are_shuffled_hash(spark):
    """Jaccard verify must stream the candidate table through
    SHUFFLE_HASH joins against the per-doc digest tables — the default
    sort-merge plan sorts the (possibly quadratic) candidate stream
    twice with fetched arrays aboard, which measured 14x slower and
    OOMed executors on the sf1 stretch corpus. Both digest joins are
    hinted and the salted pair join adds a 3rd."""
    from mario_spark.suite import minhash_lsh_pairs

    plan = _plan(minhash_lsh_pairs(spark, SF_DIR))
    assert plan.count("ShuffledHashJoin") >= 3
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
