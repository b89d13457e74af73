"""Incremental append: build on a prefix, append the rest, get an index
whose stats and EVERY search result are exactly those of a full build.

The split respects natural-key order, so the appended docs receive the
same doc_ids the full build would assign — making exact (doc_id, score)
equality the oracle, not just rank agreement.
"""

from __future__ import annotations

import pytest

from deluge_spark.index.build import BuildConfig, build_index
from deluge_spark.index.search import Searcher
from deluge_spark.operators.doc_ids import assign_doc_ids, unpersist_assigned
from deluge_spark.plans.admin import append_docs, compact_segments, index_summary

QUERIES = ["import return table", "data value", "rareterm1",
           "getHTTPResponse", "zzzabsentterm"]


@pytest.fixture(scope="module")
def split_corpus(spark, corpus_df):
    keyed = assign_doc_ids(corpus_df)
    n = keyed.count()
    n1 = int(n * 0.8)
    first = keyed.filter(f"doc_id < {n1}").toPandas()
    second = keyed.filter(f"doc_id >= {n1}").drop("doc_id").toPandas()
    unpersist_assigned(keyed)
    return (spark.createDataFrame(first),
            spark.createDataFrame(second), n)


def test_append_matches_full_build(spark, corpus_df, split_corpus,
                                   tmp_path_factory):
    first, second, n = split_corpus
    cfg = lambda: BuildConfig(num_shards=4, tokenize_groups=2,  # noqa: E731
                              shard_batches=1)

    full_dir = str(tmp_path_factory.mktemp("full_idx"))
    build_index(spark, corpus_df, full_dir, cfg())
    inc_dir = str(tmp_path_factory.mktemp("inc_idx"))
    build_index(spark, first, inc_dir, cfg())

    out = append_docs(spark, inc_dir, second)
    s_full = Searcher(spark, full_dir)
    s_inc = Searcher(spark, inc_dir)
    assert out["n_docs"] == s_full.stats["n_docs"]
    assert s_inc.stats["n_docs"] == s_full.stats["n_docs"]
    assert abs(s_inc.stats["avgdl"] - s_full.stats["avgdl"]) < 1e-9
    # identical term dictionary (df per term) — the global stats contract
    assert s_inc._df_map == s_full._df_map

    for q in QUERIES:
        assert s_inc.search_local(q, 10) == s_full.search_local(q, 10), q
    got = [(r["doc_id"], round(r["score"], 9)) for r in
           s_inc.search(QUERIES[0], 10, mode="distributed").collect()]
    want = [(r["doc_id"], round(r["score"], 9)) for r in
            s_full.search(QUERIES[0], 10, mode="distributed").collect()]
    assert got == want

    summ = index_summary(spark, inc_dir)
    assert summ["total_postings"] == \
        index_summary(spark, full_dir)["total_postings"]

    # Lucene lifecycle: compaction squashes the append batch; results hold
    compact_segments(spark, inc_dir, files_per_shard=1)
    s_c = Searcher(spark, inc_dir)
    for q in QUERIES:
        assert s_c.search_local(q, 10) == s_full.search_local(q, 10), q


def test_append_empty_is_noop(spark, corpus_df, split_corpus,
                              tmp_path_factory):
    first, second, _ = split_corpus
    d = str(tmp_path_factory.mktemp("empty_app"))
    build_index(spark, first, d,
                BuildConfig(num_shards=2, tokenize_groups=1,
                            shard_batches=1))
    n0 = Searcher(spark, d).stats["n_docs"]
    out = append_docs(spark, d, second.limit(0))
    assert out == {"appended": 0, "n_docs": n0}
