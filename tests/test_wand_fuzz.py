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

        # pin WAND: the default is now cost-based 'auto', which would pick
        # taat at this corpus size and leave the DAAT path unfuzzed
        got = searcher.search_local(" ".join(terms), k, filters, algo="wand")
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


def test_shallow_advance_skips_decodes():
    """A hot term driven by rare-term pivots must jump most of its blocks
    without varint-decoding them: the skip table alone (block_first/last)
    answers every bound-only visit. Uniform tf/dl make every hot posting
    score exactly term_max, so once a hot+rare doc sets the heap floor the
    hot list can never win alone and pivots come from the rare list.
    Counter-verified, and ranks stay identical to exhaustive TAAT."""
    import numpy as np

    from deluge_spark.index.codec import encode_postings
    from deluge_spark.index.wand import PostingIterator, taat_top_k, wand_top_k

    n_docs = 200_000
    hot_docs = np.arange(0, n_docs, 2, dtype=np.int64)          # 100k postings
    rare_docs = np.array([10, 77_000, 155_008], dtype=np.int64)  # all even →
    # every rare doc also appears in the hot list (pivot alignment)

    def row(term, docs):
        tf = np.ones(len(docs), dtype=np.int64)
        dl = np.full(len(docs), 200, dtype=np.int64)
        enc = encode_postings(docs, tf, dl)
        return {"term": term, "shard": 0, "n_postings": len(docs), **enc}

    hot = row("hot", hot_docs)
    rare = row("rare", rare_docs)
    idfs = {"hot": 0.05, "rare": 9.0}
    avgdl = 200.0

    its = [PostingIterator(hot, idfs["hot"], avgdl),
           PostingIterator(rare, idfs["rare"], avgdl)]
    got = wand_top_k(its, k=1, round_dp=4)
    want = taat_top_k([hot, rare], idfs, avgdl, k=1, round_dp=4)
    assert [d for d, _ in got] == [d for d, _ in want] == [10]

    hot_blocks = len(hot["block_off"])
    assert hot_blocks > 500
    assert its[0].n_decoded <= 6, (its[0].n_decoded, hot_blocks)


def test_advance_to_block_head_does_not_decode():
    """advance() landing exactly on a block's first doc (or before it) must
    not decode: cur_doc comes from the skip table."""
    import numpy as np

    from deluge_spark.index.codec import encode_postings
    from deluge_spark.index.wand import PostingIterator

    docs = np.arange(0, 12_800, 10, dtype=np.int64)  # 10 blocks of 128
    enc = encode_postings(docs, np.ones(len(docs), np.int64),
                          np.full(len(docs), 100, np.int64))
    it = PostingIterator({"term": "t", **enc}, 1.0, 100.0)
    assert it.n_decoded == 0                      # construction is shallow
    head3 = int(enc["block_first"][3])
    it.advance(head3)                             # exact block head
    assert it.cur_doc == head3 and it.n_decoded == 0
    it.advance(head3 + 5)                         # strictly inside block 3
    assert it.cur_doc == head3 + 10 and it.n_decoded == 1
    it.cur_score()                                # already decoded: no extra
    assert it.n_decoded == 1
