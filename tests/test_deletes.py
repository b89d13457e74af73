"""Document deletion: tombstones (ES delete/delete-by-query analog) +
physical purge (Lucene merge semantics).

Contract under test:
- a tombstoned doc disappears from EVERY search path (coordinator taat/
  wand, distributed, dataframe) immediately on the next Searcher open;
- survivor scores are byte-identical after a delete (df/avgdl unchanged
  until purge — Lucene semantics);
- ``purge_deleted`` rewrites segments/docs/docs_meta/stats without the
  tombstoned docs (no re-tokenize), clears tombstones, refreshes stats;
- ``reindex`` of a tombstoned index drops the deleted docs (merge = purge).
"""

from __future__ import annotations

import os

import pytest

from deluge_spark.index.build import BuildConfig, build_index
from deluge_spark.index.search import Searcher
from deluge_spark.plans.admin import (
    delete_docs,
    index_summary,
    purge_deleted,
    reindex,
)

Q = "import return table"


def _build(spark, corpus_df, tmp_path_factory, name):
    d = str(tmp_path_factory.mktemp(name))
    build_index(spark, corpus_df, d,
                BuildConfig(num_shards=2, tokenize_groups=1,
                            shard_batches=1))
    return d


def test_delete_excludes_from_all_paths_scores_unchanged(
        spark, corpus_df, tmp_path_factory):
    d = _build(spark, corpus_df, tmp_path_factory, "del_idx")
    s = Searcher(spark, d)
    base = s.search_local(Q, 10)
    assert len(base) == 10
    victim = base[2][0]

    out = delete_docs(spark, d, doc_ids=[victim])
    assert out == {"deleted": 1, "total_tombstoned": 1}
    # idempotent: re-deleting the same doc tombstones nothing new
    out2 = delete_docs(spark, d, doc_ids=[victim])
    assert out2 == {"deleted": 0, "total_tombstoned": 1}
    # nonexistent ids are not counted
    assert delete_docs(spark, d, doc_ids=[10**12])["deleted"] == 0

    s2 = Searcher(spark, d)
    expect = [x for x in base if x[0] != victim]  # 9 survivors, same scores
    for algo in ("taat", "wand", "auto"):
        got = s2.search_local(Q, 10, algo=algo)
        assert victim not in [doc for doc, _ in got]
        # survivor docs identical in order; scores agree to float-
        # summation-order tolerance (range-at-a-time WAND sums a doc's
        # term contributions in chunk order — same cross-algo contract
        # as the fuzz suite)
        assert [doc for doc, _ in got[:len(expect)]] \
            == [doc for doc, _ in expect]
        for (_, s1), (_, s2_) in zip(got, expect):
            assert s1 == pytest.approx(s2_, rel=1e-12)
    dist = [(r["doc_id"], round(r["score"], 9)) for r in
            s2.search(Q, 10, mode="distributed").collect()]
    assert victim not in [doc for doc, _ in dist]
    assert dist[:len(expect)] == [(doc, round(sc, 9)) for doc, sc in expect]
    dfp = [r["doc_id"] for r in s2.search_dataframe(Q, 10).collect()]
    assert victim not in dfp

    assert index_summary(spark, d)["tombstoned"] == 1


def test_delete_by_where_and_purge_refreshes_stats(
        spark, corpus_df, tmp_path_factory):
    d = _build(spark, corpus_df, tmp_path_factory, "purge_idx")
    s = Searcher(spark, d)
    n0 = s.stats["n_docs"]

    # find the owners of a planted rare term, delete them by predicate
    owners = [doc for doc, _ in s.search_local("rareterm2", 10)]
    assert owners
    out = delete_docs(
        spark, d, where=f"doc_id in ({','.join(map(str, owners))})")
    assert out["deleted"] == len(owners)
    assert Searcher(spark, d).search_local("rareterm2", 10) == []

    purged = purge_deleted(spark, d)
    assert purged["purged"] == len(owners)
    assert purged["n_docs"] == n0 - len(owners)
    assert not os.path.isdir(os.path.join(d, "tombstones"))

    s3 = Searcher(spark, d)
    assert s3.stats["n_docs"] == n0 - len(owners)
    assert s3.search_local("rareterm2", 10) == []
    assert index_summary(spark, d)["tombstoned"] == 0
    # the purged index's term dictionary no longer carries the rare term
    assert "rareterm2" not in (s3._df_map or {})
    # cross-path agreement on the purged index (stats recomputed coherently)
    loc = s3.search_local(Q, 10)
    dfp = [(r["doc_id"], round(r["score"], 9))
           for r in s3.search_dataframe(Q, 10).collect()]
    assert [(doc, round(sc, 9)) for doc, sc in loc] == dfp
    # second purge is a no-op
    assert purge_deleted(spark, d)["purged"] == 0


def test_reindex_drops_tombstoned_docs(spark, corpus_df, tmp_path_factory):
    d = _build(spark, corpus_df, tmp_path_factory, "del_reidx")
    s = Searcher(spark, d)
    n0 = s.stats["n_docs"]
    victim = s.search_local(Q, 5)[0][0]
    delete_docs(spark, d, doc_ids=[victim])

    out_dir = str(tmp_path_factory.mktemp("del_reidx_out"))
    m = reindex(spark, d, out_dir, BuildConfig(num_shards=3))
    assert m["n_docs"] == n0 - 1
    s2 = Searcher(spark, out_dir)
    assert victim not in [doc for doc, _ in s2.search_local(Q, 10)]
    assert index_summary(spark, out_dir)["tombstoned"] == 0


def test_delete_requires_selector(spark, corpus_df, tmp_path_factory):
    d = _build(spark, corpus_df, tmp_path_factory, "del_args")
    with pytest.raises(ValueError, match="where"):
        delete_docs(spark, d)


def test_purge_clears_stale_tombstones_without_rewrite(
        spark, corpus_df, tmp_path_factory):
    """Crash-recovery convergence (review finding): tombstones referencing
    docs that no longer exist (a crash after the purge swap but before the
    tombstone cleanup) must not trigger a pointless full rewrite or double
    count — purge detects staleness, clears the set, reports purged=0."""
    d = _build(spark, corpus_df, tmp_path_factory, "stale_tomb")
    import os as _os
    n0 = Searcher(spark, d).stats["n_docs"]
    spark.createDataFrame([(10**12,), (10**12 + 1,)], "doc_id long") \
        .write.parquet(_os.path.join(d, "tombstones"))
    out = purge_deleted(spark, d)
    assert out["purged"] == 0 and out["n_docs"] == n0
    assert not _os.path.isdir(_os.path.join(d, "tombstones"))


def test_open_searcher_is_a_consistent_snapshot(
        spark, corpus_df, tmp_path_factory):
    """All four search paths of ONE open Searcher answer from the same
    open-time tombstone snapshot (review finding: search_dataframe used to
    re-read the tombstone dir at query time, diverging from the others and
    crashing after purge)."""
    d = _build(spark, corpus_df, tmp_path_factory, "snap_idx")
    s0 = Searcher(spark, d)
    base = s0.search_local(Q, 10)
    victim = base[0][0]
    delete_docs(spark, d, doc_ids=[victim])

    # the handle opened BEFORE the delete still serves the old snapshot,
    # consistently on every path
    assert s0.search_local(Q, 10) == base
    assert [r["doc_id"] for r in s0.search_dataframe(Q, 10).collect()] == \
        [doc for doc, _ in base]

    s1 = Searcher(spark, d)  # opened after the delete: excludes everywhere
    assert victim not in [doc for doc, _ in s1.search_local(Q, 10)]
    assert victim not in [r["doc_id"]
                          for r in s1.search_dataframe(Q, 10).collect()]

    purge_deleted(spark, d)
    # s1's snapshot still references the (now absent) victim id — queries
    # must keep working against the purged index, not crash on a vanished
    # tombstones dir
    assert victim not in [r["doc_id"]
                          for r in s1.search_dataframe(Q, 10).collect()]
    assert victim not in [doc for doc, _ in s1.search_local(Q, 10)]


def test_update_stored_fields_rejects_existing_column(
        spark, corpus_df, tmp_path_factory):
    """Review finding: add= of a column that already exists would silently
    overwrite stored data — must be rejected (drop it first to re-derive)."""
    from deluge_spark.plans.admin import update_stored_fields

    d = _build(spark, corpus_df, tmp_path_factory, "map_guard")
    with pytest.raises(ValueError, match="exist"):
        update_stored_fields(spark, d, add={"lang": "'go'"})
