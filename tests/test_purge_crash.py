"""purge_deleted crash recovery (round-4 ADVICE, high): a crash mid-swap
must never mix generations — recovery rolls FORWARD from .purge_tmp once
the swap-commit marker exists, so docs/segments/stats always end up from
the same (new) generation and deleted docs can never silently reappear.

Scenarios:
- marker + partial swap (docs new, segments/stats/docs_meta old) → next
  purge_deleted() call completes the swap; results byte-identical to a
  clean purge on a twin index;
- tombstones added AFTER the crash survive recovery and are purged by the
  retry (not silently cleared by the staleness-convergence path);
- .purge_tmp without a marker (crash before the swap started) → rolled
  back and retried cleanly.
"""

from __future__ import annotations

import json
import os
import shutil

from deluge_spark.index.build import (
    BuildConfig,
    read_global_stats,
    read_tombstones,
)
from deluge_spark.index.search import Searcher
from deluge_spark.plans.admin import delete_docs, purge_deleted, reindex

Q = "import return table"


def _build(spark, corpus_df, tmp_path_factory, name):
    from deluge_spark.index.build import build_index

    d = str(tmp_path_factory.mktemp(name))
    build_index(spark, corpus_df, d,
                BuildConfig(num_shards=2, tokenize_groups=1,
                            shard_batches=1))
    return d


def _crash_mid_swap(spark, d: str) -> None:
    """Reproduce purge_deleted's exact on-disk state for a crash after the
    swap-commit marker with only the 'docs' dir swapped."""
    stats = read_global_stats(d)
    cfg = BuildConfig(num_shards=int(stats["num_shards"]))
    tmp = os.path.join(d, ".purge_tmp")
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    reindex(spark, d, tmp, cfg)
    n_tomb = read_tombstones(spark, d).count()
    with open(os.path.join(d, ".purge_swap_commit"), "w") as f:
        json.dump({"n_tomb": n_tomb}, f)
    retired = os.path.join(d, ".purge_retired")
    os.makedirs(retired, exist_ok=True)
    os.rename(os.path.join(d, "docs"), os.path.join(retired, "docs"))
    os.rename(os.path.join(tmp, "docs"), os.path.join(d, "docs"))
    # "crash": segments / docs_meta / stats still old generation


def test_purge_crash_mid_swap_rolls_forward(spark, corpus_df,
                                            tmp_path_factory):
    d = _build(spark, corpus_df, tmp_path_factory, "pcrash")
    twin = _build(spark, corpus_df, tmp_path_factory, "pcrash_twin")
    victims = [doc for doc, _ in Searcher(spark, d).search_local(Q, 3)]
    for idx in (d, twin):
        delete_docs(spark, idx, doc_ids=victims)

    _crash_mid_swap(spark, d)
    out = purge_deleted(spark, d)          # recovery path
    clean = purge_deleted(spark, twin)     # clean purge on the twin
    assert out["recovered_purged"] == len(victims)
    assert out["n_docs"] == clean["n_docs"]
    assert not os.path.exists(os.path.join(d, ".purge_swap_commit"))
    assert not os.path.exists(os.path.join(d, ".purge_tmp"))
    assert not os.path.exists(os.path.join(d, ".purge_retired"))
    assert not os.path.exists(os.path.join(d, "tombstones"))

    s, st = Searcher(spark, d), Searcher(spark, twin)
    skip = {"migrated_from"}               # records the source path, differs
    assert {k: v for k, v in s.stats.items() if k not in skip} == \
           {k: v for k, v in st.stats.items() if k not in skip}
    for algo in ("taat", "wand"):
        got = s.search_local(Q, 10, algo=algo)
        assert got == st.search_local(Q, 10, algo=algo)
        assert not set(victims) & {doc for doc, _ in got}
    dist = [(r["doc_id"], round(r["score"], 9))
            for r in s.search(Q, 10, mode="distributed").collect()]
    assert dist == [(r["doc_id"], round(r["score"], 9))
                    for r in st.search(Q, 10, mode="distributed").collect()]


def test_post_crash_deletes_survive_recovery(spark, corpus_df,
                                             tmp_path_factory):
    d = _build(spark, corpus_df, tmp_path_factory, "pcrash2")
    base = Searcher(spark, d).search_local(Q, 10)
    victims = [doc for doc, _ in base[:2]]
    delete_docs(spark, d, doc_ids=victims)
    _crash_mid_swap(spark, d)
    # a delete issued between the crash and the recovery call
    late_victim = base[5][0]
    delete_docs(spark, d, doc_ids=[late_victim])

    out = purge_deleted(spark, d)
    assert out["recovered_purged"] == len(victims)
    assert out["purged"] == 1              # the late delete, purged by retry
    got = {doc for doc, _ in Searcher(spark, d).search_local(Q, 20)}
    assert not ({late_victim} | set(victims)) & got
    assert not os.path.exists(os.path.join(d, "tombstones"))


def test_purge_tmp_without_marker_rolls_back(spark, corpus_df,
                                             tmp_path_factory):
    d = _build(spark, corpus_df, tmp_path_factory, "pcrash3")
    victims = [doc for doc, _ in Searcher(spark, d).search_local(Q, 2)]
    delete_docs(spark, d, doc_ids=victims)
    # crash BEFORE the marker: tmp (possibly partial) exists, no marker
    stats = read_global_stats(d)
    reindex(spark, d, os.path.join(d, ".purge_tmp"),
            BuildConfig(num_shards=int(stats["num_shards"])))
    shutil.rmtree(os.path.join(d, ".purge_tmp", "stats"))  # partial tmp

    out = purge_deleted(spark, d)
    assert "recovered_purged" not in out
    assert out["purged"] == len(victims)
    got = {doc for doc, _ in Searcher(spark, d).search_local(Q, 20)}
    assert not set(victims) & got
