"""Physical-plan audits: the properties that make the engine survive 100×.

These assert on the optimized/physical plan text, not on results:
- query-term predicates reach the segment parquet scan (PushedFilters),
- the scan reads only the columns the stage needs (ReadSchema pruning),
- keyword-filter predicates reach the docs scan in the distributed
  filtered path,
- the BM25 dataframe path broadcasts the (tiny) idf side.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deluge_spark.index.build import BuildConfig, build_index, read_segments
from deluge_spark.index.search import Searcher


@pytest.fixture(scope="module")
def index_dir(spark, corpus_df, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("plan_idx"))
    build_index(spark, corpus_df, d,
                BuildConfig(num_shards=4, tokenize_groups=1, shard_batches=1))
    return d


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_term_filter_pushed_to_segment_scan(spark, index_dir):
    seg = read_segments(spark, index_dir).filter(
        F.col("term").isin(["import", "return"]))
    plan = _physical(seg)
    assert "PushedFilters" in plan
    assert "In(term" in plan or "EqualTo(term" in plan, plan


def test_segment_scan_prunes_columns(spark, index_dir):
    # the WAND fetch needs the skip table + data, never the stats columns
    seg = (read_segments(spark, index_dir)
           .select("shard", "term", "block_first", "block_last",
                   "block_count", "block_off", "block_max_tf",
                   "block_min_dl", "data")
           .filter(F.col("term") == "import"))
    plan = _physical(seg)
    rs = plan.split("ReadSchema:", 1)[1].split("\n", 1)[0]
    # Spark truncates the schema string; the pruned scan must START at the
    # needed columns — stats columns (df_local/cf_local/n_postings/max_tf/
    # min_dl) come first in the file schema, so their absence at the front
    # proves pruning
    assert rs.lstrip().startswith("struct<term:string,block_first"), rs
    assert "cf_local" not in rs and "n_postings" not in rs, rs


def test_keyword_filter_pushed_to_docs_scan(spark, index_dir):
    s = Searcher(spark, index_dir)
    out = s.search("import return", 5, filters={"lang": "python"},
                   mode="distributed")
    plan = _physical(out)
    # the docs side of the cogroup scans only (shard, doc_id) + pushed lang
    assert "EqualTo(lang,python)" in plan, plan
    docs_scan = [ln for ln in plan.splitlines()
                 if "docs]" in ln or ("docs" in ln and "ReadSchema" in ln)]
    assert any("content" not in ln for ln in docs_scan)


def test_dataframe_path_broadcasts_idf(spark, index_dir):
    s = Searcher(spark, index_dir)
    plan = _physical(s.search_dataframe("import return", 5))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


def test_search_many_filter_pushed_and_no_cartesian(spark, index_dir):
    """The batch path's per-query filters must reach the docs parquet scan
    as pushed predicates (one tagged scan per filtered query, cogrouped on
    shard) — and the plan must contain no cartesian/nested-loop join."""
    s = Searcher(spark, index_dir)
    out = s.search_many({"a": "import return", "b": "data value"},
                        k=5, filters={"a": {"lang": "python"},
                                      "b": {"lang": "go"}})
    plan = _physical(out)
    assert "EqualTo(lang,python)" in plan, plan
    assert "EqualTo(lang,go)" in plan, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    docs_scan = [ln for ln in plan.splitlines()
                 if "docs" in ln and "ReadSchema" in ln]
    assert any("content" not in ln for ln in docs_scan)


def test_oversize_tombstone_path_no_driver_materialization(spark, index_dir,
                                                           corpus_df):
    """Forced over-cap tombstones: the distributed plan reads the
    tombstone parquet and cogroups it — no driver collect happens at open
    (asserted structurally: _tombstones is None, and the plan references
    the tombstones scan)."""
    import tempfile

    from deluge_spark.plans.admin import delete_docs

    d = str(tempfile.mkdtemp(prefix="plan_tomb_"))
    build_index(spark, corpus_df, d,
                BuildConfig(num_shards=2, tokenize_groups=1,
                            shard_batches=1))
    delete_docs(spark, d, doc_ids=[1, 2, 3, 4, 5])
    s = Searcher(spark, d, tombstone_driver_cap=2)
    assert s._tombstones is None and s._tomb_oversize
    plan = _physical(s.search("import return", 5, mode="distributed"))
    assert "tombstones" in plan, plan
    assert "CartesianProduct" not in plan


def test_fetch_and_highlight_never_rescore_twice(spark, index_dir):
    """fetch=True / highlight reference the top-k result in two plan
    branches; without the driver-side pin the whole FlatMapGroupsInPandas
    scoring subtree executes twice. The returned plan must contain ZERO
    scoring nodes (the single scoring pass already ran inside the pin)."""
    s = Searcher(spark, index_dir)
    for df in (s.search("import return", 5, mode="distributed",
                        fetch=True),
               s.highlight("import return", k=5, mode="distributed")):
        assert "FlatMapGroupsInPandas" not in _physical(df)
