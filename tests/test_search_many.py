"""search_many: M queries in ONE distributed job, per-query ranking
identical to the single-query distributed path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deluge_spark.index.build import BuildConfig, build_index
from deluge_spark.index.search import Searcher
from deluge_spark.plans.admin import delete_docs

QUERIES = {
    "multi": "import return table",
    "hot": "data",
    "rare": "rareterm1",
    "pair": "buffer client error",
    "missing": "zzzabsentterm",
    "empty": "",
}


@pytest.fixture(scope="module")
def many_idx(spark, corpus_df, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("many_idx"))
    build_index(spark, corpus_df, d,
                BuildConfig(num_shards=4, tokenize_groups=2,
                            shard_batches=1))
    return d


def _by_query(df):
    out: dict[str, list[tuple[int, float]]] = {}
    for r in df.collect():
        out.setdefault(r["query"], []).append(
            (r["doc_id"], round(r["score"], 9)))
    return out


def test_search_many_matches_single_query_path(spark, many_idx):
    s = Searcher(spark, many_idx)
    got = _by_query(s.search_many(QUERIES, k=10))
    assert "missing" not in got and "empty" not in got
    for name in ("multi", "hot", "rare", "pair"):
        want = [(r["doc_id"], round(r["score"], 9)) for r in
                s.search(QUERIES[name], 10, mode="distributed").collect()]
        assert got[name] == want, name
    # ordering contract: per query, (rounded score desc, doc_id asc)
    df = s.search_many(QUERIES, k=10)
    rows = df.collect()
    assert rows == sorted(
        rows, key=lambda r: (r["query"], -round(r["score"], 9), r["doc_id"]))


def test_search_many_job_count_independent_of_m(spark, many_idx):
    """The batch path's Spark-job count (AQE stages of one scan + one
    window merge) must NOT grow with the number of queries — that is the
    whole point vs. M single-query calls."""
    s = Searcher(spark, many_idx)
    tracker = spark.sparkContext.statusTracker()

    def jobs():
        return len(tracker.getJobIdsForGroup(None) or [])

    s.search_many({"warm": "data"}, k=5).collect()  # warm AQE/codegen
    before = jobs()
    s.search_many({"one": "data"}, k=5).collect()
    one = jobs() - before
    mid = jobs()
    s.search_many(QUERIES, k=5).collect()           # 6 queries
    many = jobs() - mid
    assert many <= one + 1, f"jobs grew with M: {one} -> {many}"


def test_search_many_respects_tombstones(spark, corpus_df,
                                         tmp_path_factory):
    d = str(tmp_path_factory.mktemp("many_del"))
    build_index(spark, corpus_df, d,
                BuildConfig(num_shards=2, tokenize_groups=1,
                            shard_batches=1))
    s = Searcher(spark, d)
    base = _by_query(s.search_many({"q": "import return table"}, k=10))["q"]
    victim = base[0][0]
    delete_docs(spark, d, doc_ids=[victim])
    got = _by_query(Searcher(spark, d)
                    .search_many({"q": "import return table"}, k=10))["q"]
    assert victim not in [doc for doc, _ in got]
    assert got[:len(base) - 1] == base[1:]
