"""Recall gates for the approximate (rows-only / no-oracle) paths at the
BENCH scale (sf0.1) — round-4 VERDICT #7: the six LSH-family queries were
pytest-verified at sf0.01 only; these pin their quality where the bench
runs, against their exact twins, so an approximate-path regression cannot
hide behind a rows-only driver check.

Gates (same parameters as the __spark_entry__ driver queries):
- MinHash-LSH (n=2, 64 hashes, 16 bands, verify_exact): precision 1.0 by
  construction (asserted as a subset of the exact twin) + recall floors on
  the exact n-gram-Jaccard pair set, overall and on the high-similarity
  (j ≥ 0.7) stratum where the banding S-curve must be near 1.
- SimHash (d ≤ 3, Manku pigeonhole): EXACT set equality with a numpy
  all-pairs Hamming sweep over the fingerprints — completeness is a
  theorem, so the gate is equality, not a floor.
- Embedding-cosine LSH: subset of the exact all-pairs twin (precision 1.0)
  + recall floor.
- RP-LSH top-k vs brute-force cosine: recall@10 floor.
"""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"bench-scale dir {SF_DIR} absent")


@pytest.fixture(scope="module")
def docs01(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def emb01(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _pair_set(rows):
    return {(r["doc_a"], r["doc_b"]) for r in rows}


def test_minhash_lsh_recall_vs_exact(spark, docs01):
    from deluge_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )

    exact = ngram_jaccard_pairs(docs01, n=2, threshold=0.35, mode="simple")
    exact_rows = exact.collect()
    exact.unpersist()
    want = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in exact_rows}
    assert want, "exact twin found no pairs — fixture drifted"

    got = _pair_set(minhash_lsh_pairs(
        docs01, n=2, num_hashes=64, bands=16, threshold=0.35).collect())
    # verify_exact makes every reported pair truly ≥ threshold → subset
    assert got <= set(want), "minhash reported a pair the exact twin lacks"
    recall_all = len(got) / len(want)
    hi = {p for p, j in want.items() if j >= 0.7}
    recall_hi = len(got & hi) / len(hi) if hi else 1.0
    assert recall_hi >= 0.95, (recall_hi, len(hi))
    assert recall_all >= 0.5, (recall_all, len(want))


def test_simhash_exact_equality_at_bench_scale(spark, docs01):
    from deluge_spark.operators.dedup import simhash, simhash_near_pairs

    fps = simhash(docs01.select("doc_id", "text")).collect()
    ids = np.array([r["id"] for r in fps], dtype=np.int64)
    hs = np.array([r["simhash"] for r in fps], dtype=np.uint64)
    order = np.argsort(ids)
    ids, hs = ids[order], hs[order]
    pop8 = np.array([bin(v).count("1") for v in range(256)], dtype=np.int64)

    def popcount64(x: np.ndarray) -> np.ndarray:
        out = np.zeros(len(x), dtype=np.int64)
        for _ in range(8):
            out += pop8[(x & np.uint64(0xFF)).astype(np.intp)]
            x = x >> np.uint64(8)
        return out

    want = set()
    for i in range(len(ids)):                      # numpy row-vs-rest sweep
        ham = popcount64(hs[i] ^ hs[i + 1:])
        for j in np.nonzero(ham <= 3)[0]:
            want.add((int(ids[i]), int(ids[i + 1 + j])))

    got = _pair_set(simhash_near_pairs(
        docs01.select("doc_id", "text"), max_hamming=3).collect())
    assert got == want, (len(got), len(want))
    assert want, "no Hamming-close pairs at bench scale — fixture drifted"


def test_embedding_cosine_lsh_recall(spark, emb01):
    from deluge_spark.operators.similarity import (
        cosine_near_pairs,
        cosine_near_pairs_lsh,
    )

    want = {(r["id_a"], r["id_b"])
            for r in cosine_near_pairs(emb01, threshold=0.35).collect()}
    got = {(r["id_a"], r["id_b"])
           for r in cosine_near_pairs_lsh(
               emb01, threshold=0.35, n_planes=16, bands=8).collect()}
    assert want
    assert got <= want                     # exact re-rank → precision 1.0
    assert len(got) / len(want) >= 0.9, (len(got), len(want))


def test_rp_lsh_topk_recall_vs_brute(spark, emb01):
    from deluge_spark.operators.similarity import cosine_top_k, rp_lsh_top_k

    qv = emb01.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    brute = {r["vec_id"] for r in
             cosine_top_k(emb01, list(qv), 10, exclude_id=0).collect()}
    approx = {r["vec_id"] for r in
              rp_lsh_top_k(emb01, list(qv), 10, n_planes=16, bands=8,
                           exclude_id=0).collect()}
    assert len(brute & approx) / 10 >= 0.9
