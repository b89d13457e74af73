"""Randomized WAND stress: many random multi-term queries (mixed df terms,
random k, random lang filters) must be rank-identical to the oracle."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from deluge_spark.index.build import BuildConfig, build_index
from deluge_spark.index.search import Searcher

from tests.oracle import OracleIndex


@pytest.fixture(scope="module")
def setup(spark, corpus_df, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("fuzz_idx"))
    build_index(spark, corpus_df, d,
                BuildConfig(num_shards=5, tokenize_groups=2, shard_batches=2))
    docs = spark.read.parquet(f"{d}/docs")
    oracle = OracleIndex({r["doc_id"]: r["content"]
                          for r in docs.select("doc_id", "content").collect()})
    lang_ids = {
        lang: {r["doc_id"] for r in docs.filter(F.col("lang") == lang)
               .select("doc_id").collect()}
        for lang in ("python", "go", "java")
    }
    return Searcher(spark, d), oracle, lang_ids


def test_fuzz_rank_identity(setup):
    searcher, oracle, lang_ids = setup
    rnd = random.Random(1234)
    vocab = list(oracle.df)
    vocab.sort()
    # stratify: hot terms, mid terms, rare terms, absent terms
    by_df = sorted(vocab, key=lambda t: (-oracle.df[t], t))
    hot = by_df[:20]
    mid = by_df[len(by_df) // 4: len(by_df) // 4 + 200]
    rare = [t for t in by_df if oracle.df[t] <= 2][:200]
    absent = ["qqzzyy", "notaterm9", "zzqp"]

    for trial in range(50):
        n_terms = rnd.randint(1, 5)
        pool = rnd.choice([hot, mid, rare, hot + mid + rare + absent])
        terms = rnd.sample(pool, min(n_terms, len(pool)))
        k = rnd.choice([1, 3, 10, 50])
        lang = rnd.choice([None, "python", "go", "java"])
        filters = {"lang": lang} if lang else None
        fids = lang_ids[lang] if lang else None

        got = searcher.search_local(" ".join(terms), k, filters)
        want = oracle.top_k(terms, k, filter_ids=fids, round_dp=9)
        assert [d for d, _ in got] == [d for d, _ in want], \
            f"trial={trial} terms={terms} k={k} lang={lang}"
        for (d1, s1), (d2, s2) in zip(got, want):
            assert s1 == pytest.approx(s2, rel=1e-9)
        # the vectorized exhaustive scorer must agree on every trial
        # (rank-identical; scores to float-summation-order tolerance)
        got_taat = searcher.search_local(" ".join(terms), k, filters,
                                         algo="taat")
        assert [d for d, _ in got_taat] == [d for d, _ in got], \
            f"taat diverged: trial={trial} terms={terms}"
        for (_, s1), (_, s2) in zip(got_taat, got):
            assert s1 == pytest.approx(s2, rel=1e-12)
        if trial % 10 == 0:
            # periodically push the same query through the distributed
            # executor (per-shard cost pick + cogroup filters)
            got_dist = searcher.search(" ".join(terms), k, filters,
                                       mode="distributed").collect()
            assert [r.doc_id for r in got_dist] == [d for d, _ in want], \
                f"distributed diverged: trial={trial} terms={terms}"
