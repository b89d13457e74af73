"""M1: DataFrame BM25 path is rank-identical to the pure-Python oracle
on the deterministic corpus, over the full reference query set."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deluge_spark.functions.tokenizer import term_counts, tokenize_py
from deluge_spark.index.score import bm25_top_k
from deluge_spark.index.stats import corpus_stats, doc_lengths
from deluge_spark.operators.doc_ids import assign_doc_ids

from tests.oracle import OracleIndex, reference_queries


@pytest.fixture(scope="module")
def indexed(spark, corpus_df):
    docs = assign_doc_ids(corpus_df).cache()
    tf = term_counts(docs, "doc_id", "content").cache()
    dl = doc_lengths(tf).cache()
    n, avgdl = corpus_stats(dl)
    oracle_docs = {
        r["doc_id"]: r["content"]
        for r in docs.select("doc_id", "content").collect()
    }
    oracle = OracleIndex(oracle_docs)
    return docs, tf, dl, n, avgdl, oracle


def test_stats_match_oracle(indexed):
    _, _, _, n, avgdl, oracle = indexed
    assert n == oracle.n
    assert avgdl == pytest.approx(oracle.avgdl, rel=1e-12)


@pytest.mark.parametrize("q", reference_queries(), ids=lambda q: q["query"])
def test_rank_identical_to_oracle(indexed, q):
    _, tf, dl, n, avgdl, oracle = indexed
    terms = tokenize_py(q["query"], "code")
    want = oracle.top_k(terms, q["k"], round_dp=9)
    got = bm25_top_k(tf, dl, n, avgdl, terms, q["k"], round_dp=9).collect()
    assert [r.doc_id for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert r.score == pytest.approx(s, rel=1e-9)


def test_missing_term_empty(indexed):
    _, tf, dl, n, avgdl, _ = indexed
    assert bm25_top_k(tf, dl, n, avgdl, ["zzzmissingterm"], 10).count() == 0
