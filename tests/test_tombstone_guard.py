"""Tombstone scale guard (round-4 VERDICT #6): above
``tombstone_driver_cap`` the tombstone set is never materialized on the
driver — distributed searches resolve it executor-side (per-shard cogroup
banned set / anti-join into the filter's allowed set), coordinator mode
raises ``TombstonesTooLarge`` and auto-mode falls back to distributed.
Below the cap nothing changes.
"""

from __future__ import annotations

import pytest

from deluge_spark.index.build import BuildConfig, build_index
from deluge_spark.index.search import Searcher, TombstonesTooLarge
from deluge_spark.plans.admin import delete_docs

Q = "import return table"


@pytest.fixture(scope="module")
def tomb_idx(spark, corpus_df, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tombcap_idx"))
    build_index(spark, corpus_df, d,
                BuildConfig(num_shards=4, tokenize_groups=2,
                            shard_batches=1))
    victims = [doc for doc, _ in Searcher(spark, d).search_local(Q, 12)[:6]]
    delete_docs(spark, d, doc_ids=victims)
    return d, victims


def _rows(df):
    return [(r["doc_id"], round(r["score"], 9)) for r in df.collect()]


def test_over_cap_distributed_matches_under_cap(spark, tomb_idx):
    d, victims = tomb_idx
    s_small = Searcher(spark, d, tombstone_driver_cap=2)   # forces oversize
    s_big = Searcher(spark, d)                             # driver path
    assert s_small._tomb_oversize and s_small._tombstones is None
    assert not s_big._tomb_oversize and s_big._tombstones is not None

    want = _rows(s_big.search(Q, 10, mode="distributed"))
    got = _rows(s_small.search(Q, 10, mode="distributed"))
    assert got == want
    assert not set(victims) & {doc for doc, _ in got}

    # filters: tombstones anti-joined out of the allowed set
    wantf = _rows(s_big.search(Q, 10, filters={"lang": "python"},
                               mode="distributed"))
    gotf = _rows(s_small.search(Q, 10, filters={"lang": "python"},
                                mode="distributed"))
    assert gotf == wantf and wantf

    # dataframe path: distributed anti-join
    assert _rows(s_small.search_dataframe(Q, 10)) == \
        _rows(s_big.search_dataframe(Q, 10))


def test_over_cap_coordinator_raises_auto_falls_back(spark, tomb_idx):
    d, victims = tomb_idx
    s_small = Searcher(spark, d, tombstone_driver_cap=2)
    s_big = Searcher(spark, d)
    with pytest.raises(TombstonesTooLarge):
        s_small.search_local(Q, 10)
    with pytest.raises(TombstonesTooLarge):
        s_small.search(Q, 10, mode="coordinator")
    got = _rows(s_small.search(Q, 10, mode="auto"))
    assert got == _rows(s_big.search(Q, 10, mode="distributed"))
    assert not set(victims) & {doc for doc, _ in got}


def test_over_cap_search_many_matches(spark, tomb_idx):
    d, victims = tomb_idx
    s_small = Searcher(spark, d, tombstone_driver_cap=2)
    s_big = Searcher(spark, d)
    queries = {"a": Q, "b": "data value", "c": "getHTTPResponse"}
    filters = {"b": {"lang": "go"}}

    def by_q(df):
        out: dict[str, list] = {}
        for r in df.collect():
            out.setdefault(r["query"], []).append(
                (r["doc_id"], round(r["score"], 9)))
        return out

    got = by_q(s_small.search_many(queries, k=10, filters=filters))
    want = by_q(s_big.search_many(queries, k=10, filters=filters))
    assert got == want
    hit_docs = {doc for rows in got.values() for doc, _ in rows}
    assert not set(victims) & hit_docs
