"""Physical-plan quality gates (the '.explain and iterate' discipline).

These tests pin the plan properties that matter at 100 TB:
- query-term predicates reach the parquet scan (PushedFilters),
- the scan schema is pruned to referenced columns (ReadSchema),
- the tiny idf side of the BM25 join broadcasts (BroadcastHashJoin),
- the tokenize→tf stage contains no shuffle (narrow), and
- scans/aggregations run inside WholeStageCodegen.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deluge_spark.functions.tokenizer import term_counts
from deluge_spark.index.build import BuildConfig, build_index, read_segments
from deluge_spark.index.score import bm25_score_query
from deluge_spark.index.stats import doc_lengths


@pytest.fixture(scope="module")
def index_dir(spark, corpus_df, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("plan_idx"))
    build_index(spark, corpus_df, d,
                BuildConfig(num_shards=4, tokenize_groups=1, shard_batches=1))
    return d


def _plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_segment_scan_pushdown_and_pruning(spark, index_dir):
    seg = (read_segments(spark, index_dir)
           .filter(F.col("term").isin(["import", "return"]))
           .select("shard", "term", "n_postings"))
    plan = _plan(seg)
    assert "PushedFilters: [" in plan and "term" in plan.split("PushedFilters:")[1][:120]
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "data" not in read_schema and "block_first" not in read_schema


def test_bm25_idf_join_is_broadcast(spark, index_dir):
    # partials scan: term predicate pushed down to the partials parquet
    import os
    p = f"{index_dir}/partials"
    groups = [f"{p}/{d}" for d in sorted(os.listdir(p)) if d.startswith("group=")]
    partials = (spark.read.option("basePath", p).parquet(*groups)
                .filter(F.col("term").isin(["import", "return"]))
                .select("shard", "term", "df_p"))
    pplan = _plan(partials)
    assert "PushedFilters: [" in pplan

    from deluge_spark.index.build import tf_from_segments
    tf = tf_from_segments(spark, index_dir)
    dl = doc_lengths(tf.select("doc_id", "term", "tf"))
    scored = bm25_score_query(tf, dl, 500, 220.0, ["import", "return"])
    plan = _plan(scored)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_tokenize_stage_is_narrow(spark, corpus_df):
    tf = term_counts(corpus_df.withColumn("doc_id", F.lit(1)),
                     "doc_id", "content")
    plan = _plan(tf)
    assert "Exchange" not in plan          # no shuffle anywhere
    assert "arrow" in plan.lower() or "pandas" in plan.lower()


def test_docs_scan_column_pruning(spark, index_dir):
    docs = spark.read.parquet(f"{index_dir}/docs").select("doc_id", "lang")
    plan = _plan(docs)
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "content" not in read_schema
    assert "doc_id" in read_schema and "lang" in read_schema


def test_aggregation_uses_codegen_and_partial_agg(spark, index_dir):
    tf = spark.read.option("basePath", f"{index_dir}/partials").parquet(
        f"{index_dir}/partials/group=0")
    agg = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    plan = _plan(agg)
    # map-side combine: partial aggregate before the exchange, final after
    assert "partial_count" in plan
    assert plan.count("HashAggregate") >= 2
    # only the grouping column is read from parquet (pruning)
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "doc_id" not in read_schema and "term" in read_schema
