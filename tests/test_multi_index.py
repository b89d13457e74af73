"""Multi-index search (ES index-pattern / dfs_query_then_fetch parity).

The correctness contract is the split invariant: a corpus partitioned
into K independently-built indexes, searched through MultiSearcher with
dfs-merged stats, scores every doc EXACTLY as the single merged index
does — identity is the stored ``path`` (member indexes assign their own
doc ids)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deluge_spark.index.build import BuildConfig, build_index
from deluge_spark.index.multi import MultiSearcher
from deluge_spark.index.search import Searcher

Q = "import return"
CFG = dict(tokenize_groups=1, shard_batches=1)


@pytest.fixture(scope="module")
def tri(spark, corpus_df, tmp_path_factory):
    """(full index, [half index dirs]) over the same corpus."""
    base = tmp_path_factory.mktemp("multi_idx")
    full = str(base / "full")
    build_index(spark, corpus_df, full, BuildConfig(num_shards=4, **CFG))
    halves = []
    for i in range(2):
        part = corpus_df.filter(
            F.pmod(F.xxhash64("repo", "path"), F.lit(2)) == i)
        d = str(base / f"half{i}")
        # different shard counts on purpose: members are independent
        build_index(spark, part, d, BuildConfig(num_shards=2 + i, **CFG))
        halves.append(d)
    return full, halves


def _by_path(rows, dp=6):
    return sorted((r["path"], round(r["score"], dp)) for r in rows)


def test_split_equals_single_index(spark, tri):
    full, halves = tri
    single = Searcher(spark, full)
    ms = MultiSearcher(spark, halves)
    # merged stats are the single index's stats
    assert ms.n_docs == single.stats["n_docs"]
    assert ms.avgdl == pytest.approx(single.stats["avgdl"], rel=1e-12)
    # the ENTIRE match set scores identically (k covers every match)
    want = single.search(Q, k=10**6, mode="distributed",
                         fetch=True).collect()
    got = ms.search(Q, k=10**6, fetch=True).collect()
    assert len(got) == len(want) > 0
    assert _by_path(got) == _by_path(want)


def test_multi_small_k_score_multiset(spark, tri):
    full, halves = tri
    want = Searcher(spark, full).search(Q, k=10, mode="distributed") \
        .collect()
    got = MultiSearcher(spark, halves).search(Q, k=10).collect()
    # tie order at the cutoff may pick different equal-score docs; the
    # score multiset is deterministic
    assert sorted(round(r["score"], 6) for r in got) \
        == sorted(round(r["score"], 6) for r in want)


def test_single_member_is_plain_search(spark, tri):
    full, _ = tri
    s = Searcher(spark, full)
    ms = MultiSearcher(spark, [full])
    got = ms.search(Q, k=10).collect()
    want = s.search(Q, k=10, mode="distributed").collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in got] \
        == [(r["doc_id"], round(r["score"], 9)) for r in want]
    assert all(r["index"] == 0 for r in got)


def test_multi_count_filters_and_empty(spark, tri):
    full, halves = tri
    single = Searcher(spark, full)
    ms = MultiSearcher(spark, halves)
    assert ms.count(Q) == single.count(Q)
    assert ms.count(Q, filters={"lang": "go"}) \
        == single.count(Q, filters={"lang": "go"})
    assert ms.search("zzzabsentterm").count() == 0
    got = ms.search(Q, k=10**6, filters={"lang": "go"}, fetch=True)
    want = single.search(Q, k=10**6, mode="distributed",
                         filters={"lang": "go"}, fetch=True)
    assert _by_path(got.collect()) == _by_path(want.collect())


def test_multi_respects_member_tombstones(spark, tri, tmp_path_factory):
    from deluge_spark.plans.admin import delete_docs

    _, halves = tri
    ms = MultiSearcher(spark, halves)
    top = ms.search(Q, k=5, fetch=True).collect()
    victim = top[0]
    delete_docs(spark, halves[victim["index"]],
                doc_ids=[victim["doc_id"]])
    ms2 = MultiSearcher(spark, halves)
    after = ms2.search(Q, k=5, fetch=True).collect()
    assert victim["path"] not in [r["path"] for r in after]
    # survivor scores unchanged (dfs stats are never touched by deletes)
    assert [round(r["score"], 9) for r in after][:3] \
        == [round(r["score"], 9) for r in top[1:4]]


def test_multi_validates_inputs(spark, tri):
    with pytest.raises(ValueError, match="at least one"):
        MultiSearcher(spark, [])


def test_cli_multi_index_search(spark, tri):
    import json
    import subprocess
    import sys

    full, halves = tri
    p = subprocess.run([sys.executable, "-m", "deluge_spark.cli",
                        "--cores", "4", "search",
                        "--index", halves[0], "--index", halves[1],
                        "--query", Q, "-k", "5"],
                       capture_output=True, text=True, timeout=600,
                       cwd="/root/repo")
    assert p.returncode == 0, p.stderr[-2000:]
    rows = [json.loads(x) for x in p.stdout.splitlines()
            if x.startswith("{")]
    api = MultiSearcher(spark, halves).search(Q, k=5).collect()
    assert [(r["index"], r["doc_id"]) for r in rows] \
        == [(r["index"], r["doc_id"]) for r in api]
