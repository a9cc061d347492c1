"""Incremental append (mario's default ingest path): appended segments
must be grid-aligned, doc-disjoint, and the combined index must score
exactly like an exhaustive scorer over the combined doc table."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from mario_spark import query
from mario_spark.docs import build_doc_table
from mario_spark.fixtures import make_pages_query_set, pages_df, query_terms_df
from mario_spark.index import Catalog


def _canon(df):
    return df.toPandas().sort_values(["query_id", "rank"], ignore_index=True)


def test_append_matches_exhaustive(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "cat"))
    pages = pages_df(spark, 600, seed=21, partitions=4).persist()
    doc_num = F.regexp_extract("url", r"(\d+)$", 1).cast("long")
    first = pages.filter(doc_num < 400)
    second = pages.filter(doc_num >= 400)

    idx = cat.create("app-2026-01-01t00-00-00z")
    idx.ingest(first, segment_docs=256)
    st1 = idx.stats()
    assert st1["n_docs"] == 400

    st2 = idx.append(second)
    assert st2["n_docs"] == 600
    assert st2["segments"] > st1["segments"]

    # appended segments are doc-disjoint and grid-aligned with the old
    meta_rw = 256  # segment_docs aligned to range_width picked at create
    docs_tbl = idx.docs()
    assert docs_tbl.count() == 600
    assert docs_tbl.select("doc_id").distinct().count() == 600

    # search through the combined index == exhaustive over the SAME
    # doc table (ids taken from the index's own doc store)
    q = query_terms_df(spark, make_pages_query_set(seed=21, n=12))
    got = _canon(idx.search(q, k=10))

    combined = (
        idx.docs()
        .select("doc_id", "url")
        .join(pages.select("url", "lang", "text"), "url")
    )
    d = build_doc_table(combined).persist()
    # exhaustive scorer must use the index's own global stats
    st = idx.stats()
    from mario_spark.docs import corpus_stats

    want = _canon(query.search_exhaustive(d, q, k=10))
    pd.testing.assert_frame_equal(got, want, check_exact=False, atol=1e-9)
    d.unpersist()
    pages.unpersist()


def test_append_to_empty_is_ingest(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "cat"))
    pages = pages_df(spark, 150, seed=22, partitions=2)
    idx = cat.create("fresh-2026-01-01t00-00-00z")
    st = idx.append(pages)
    assert st["n_docs"] == 150


def test_ingest_from_html_extraction_matches_text(spark, tmp_path):
    """The per-row fidelity invariant end-to-end: building the index
    from the html column (extract_html=True) must produce the exact
    index built from the ground-truth text column, because
    extract(html) == text byte-identically on the synthetic corpus."""
    cat = Catalog(spark, str(tmp_path / "cat"))
    pages = pages_df(spark, 300, seed=31, partitions=4).persist()

    a = cat.create("text-2026-01-01t00-00-00z")
    a.ingest(pages.drop("html"))
    b = cat.create("html-2026-01-01t00-00-00z")
    b.ingest(pages.drop("text"), extract_html=True)

    pa = a.postings().toPandas().sort_values(
        ["term", "dbucket", "block_id"], ignore_index=True
    )
    pb = b.postings().toPandas().sort_values(
        ["term", "dbucket", "block_id"], ignore_index=True
    )
    pd.testing.assert_frame_equal(pa, pb)
    pages.unpersist()


def test_tiered_merge_policy(spark, tmp_path):
    """Tiered merge selection: four small appended segments in the same
    size tier merge into one (the big base segment stays untouched);
    results are rank-identical before/after; a second round is a no-op."""
    from mario_spark.merge import maybe_merge, select_tiered_merge

    cat = Catalog(spark, str(tmp_path / "cat"))
    pages = pages_df(spark, 680, seed=27, partitions=4).persist()
    doc_num = F.regexp_extract("url", r"(\d+)$", 1).cast("long")

    idx = cat.create("tier-2026-01-01t00-00-00z")
    idx.ingest(pages.filter(doc_num < 600), segment_docs=1024)
    for i in range(4):  # four ~20-doc appends -> same low tier
        idx.append(
            pages.filter((doc_num >= 600 + 20 * i) & (doc_num < 620 + 20 * i))
        )
    segs_before = idx.paths.committed_segments()
    assert len(segs_before) == 5

    sel = select_tiered_merge(idx, max_per_tier=4, tier_factor=10.0)
    assert sel is not None and len(sel) == 4
    big = segs_before[0]
    assert big not in sel  # the 600-doc segment is in a higher tier

    q = query_terms_df(spark, make_pages_query_set(seed=27, n=10))
    before = _canon(idx.search(q, k=10))

    new_id = maybe_merge(idx, max_per_tier=4, tier_factor=10.0)
    assert new_id is not None
    segs_after = idx.paths.committed_segments()
    assert len(segs_after) == 2 and big in segs_after

    idx2 = cat.open("tier-2026-01-01t00-00-00z")
    after = _canon(idx2.search(q, k=10))
    pd.testing.assert_frame_equal(before, after)

    # no tier is over-full any more
    assert select_tiered_merge(idx2, max_per_tier=4, tier_factor=10.0) is None


def test_pit_search_is_snapshot_stable(spark, tmp_path):
    """ES point-in-time contract: a search through a PIT handle opened
    before an append + delete returns the exact pre-mutation results,
    while a plain search sees the mutations."""
    cat = Catalog(spark, str(tmp_path / "cat"))
    pages = pages_df(spark, 400, seed=31, partitions=4).persist()
    doc_num = F.regexp_extract("url", r"(\d+)$", 1).cast("long")
    idx = cat.create("pit-2026-01-01t00-00-00z")
    idx.ingest(pages.filter(doc_num < 300), segment_docs=256)

    q = query_terms_df(spark, make_pages_query_set(seed=31, n=8))
    pit = idx.open_pit()
    before = _canon(idx.search(q, k=10))

    # mutate: append 100 docs, then tombstone every doc holding the
    # first query's first term (delete_by_query)
    idx.append(pages.filter(doc_num >= 300))
    qset = make_pages_query_set(seed=31, n=8)
    victim_term = qset[0][1].split()[0].lower()
    idx.delete_by_query([victim_term])

    pinned = _canon(idx.search(q, k=10, pit=pit))
    pd.testing.assert_frame_equal(pinned, before, check_exact=False, atol=1e-9)

    live = _canon(idx.search(q, k=10))
    assert not live.equals(before)
    pages.unpersist()


def test_warm_session_snapshot_across_append_and_merge(spark, tmp_path):
    """A warmed QuerySession keeps serving its open-time snapshot while
    a segment append AND a tiered merge (which deletes the session's
    source segment files) land between two warm queries — byte-identical
    results, never a torn mix. Seeing the new data is an explicit
    refresh: a session opened after the merge serves exactly what the
    post-merge index serves (ES PIT semantics for warm serving)."""
    from mario_spark.merge import maybe_merge

    cat = Catalog(spark, str(tmp_path / "cat"))
    pages = pages_df(spark, 680, seed=31, partitions=4).persist()
    doc_num = F.regexp_extract("url", r"(\d+)$", 1).cast("long")

    idx = cat.create("sess-2026-01-01t00-00-00z")
    idx.ingest(pages.filter(doc_num < 600), segment_docs=1024)
    for i in range(3):  # three small same-tier appends (one shy of merge)
        idx.append(
            pages.filter((doc_num >= 600 + 20 * i) & (doc_num < 620 + 20 * i))
        )

    sess = idx.open_session().warm()
    queries = make_pages_query_set(seed=31, n=10)
    before = _canon(sess.search(queries, k=10))
    assert len(before) > 0

    # append + tiered merge land between the two warm queries; the
    # merge rewrites the four small segments and DELETES their files
    segs_before = idx.paths.committed_segments()
    idx.append(pages.filter((doc_num >= 660) & (doc_num < 680)))
    assert maybe_merge(idx, max_per_tier=4, tier_factor=10.0) is not None
    assert idx.paths.committed_segments() != segs_before

    again = _canon(sess.search(queries, k=10))
    pd.testing.assert_frame_equal(before, again)  # old snapshot, intact

    # the driver fast path and the distributed path agree on the
    # snapshot too (driver_limit=0 forces the distributed kernel)
    dist = _canon(sess.search(queries, k=10, driver_limit=0))
    pd.testing.assert_frame_equal(before, dist)

    # refresh: a session opened NOW serves the post-merge truth
    idx2 = cat.open("sess-2026-01-01t00-00-00z")
    fresh = idx2.open_session().warm()
    want = _canon(
        idx2.search(query_terms_df(spark, queries), k=10)
    )
    got = _canon(fresh.search(queries, k=10))
    pd.testing.assert_frame_equal(got, want)
    # the appended docs are visible only through the refreshed session
    assert not before.equals(got)
    sess.postings.unpersist()
    fresh.postings.unpersist()
    pages.unpersist()
