"""Per-leg isolation harness used for the round-6 optimization work.

NOT the graded bench (bench.py is frozen); this exists so per-operator
numbers in OPTIMIZATION_r06.md are reproducible: noop-sink isolation
(guide §1.4), repeat loops with best-of (this box has documented ~2×
hypervisor-steal spread — BENCH/ADJUDICATION_r5.md), and job labels.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py [section]
sections: dedup, ann, serve, all (default). The serve section builds (or
reuses) an index under /tmp/bench_extra_idx_<sf>.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def _best_of(spark, name, fn, n=3):
    best = float("inf")
    for _ in range(n):
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    spark.sparkContext.setJobDescription(None)
    print(f"{name:34s} {best:8.3f}s  (best of {n})", flush=True)
    return best


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    section = sys.argv[1] if len(sys.argv) > 1 else "all"
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from pyspark.sql import functions as F

    from deluge_spark.session import get_spark

    spark = get_spark("bench_extra", cores=cpus, shuffle_partitions=2 * cpus)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.count()

    if section in ("dedup", "all"):
        from deluge_spark.operators.dedup import (
            _shingles,
            exact_dedup,
            minhash_lsh_pairs,
            minhash_signatures,
        )

        _best_of(spark, "shingles.noop", lambda: _shingles(
            docs, "doc_id", "text", 2).write.format("noop")
            .mode("overwrite").save())
        _best_of(spark, "minhash_sig.noop", lambda: minhash_signatures(
            docs, n=2).write.format("noop").mode("overwrite").save())
        _best_of(spark, "exact_dedup.count",
                 lambda: exact_dedup(docs).count())
        _best_of(spark, "minhash_cand.count", lambda: minhash_lsh_pairs(
            docs, n=2, num_hashes=64, bands=16, verify_exact=False).count())
        _best_of(spark, "minhash_full.count", lambda: minhash_lsh_pairs(
            docs, n=2, num_hashes=64, bands=16, threshold=0.5).count())
        _best_of(spark, "minhash_collapsed.count", lambda: minhash_lsh_pairs(
            docs, n=2, num_hashes=64, bands=16, threshold=0.5,
            collapse_exact=True).count())

    if section in ("ann", "all"):
        import shutil
        import tempfile

        from deluge_spark.operators.similarity import (
            AnnIndex,
            build_ann_index,
            cosine_top_k,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        qv = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
        _best_of(spark, "cosine_top_k.collect", lambda: cosine_top_k(
            emb, list(qv), 10, exclude_id=0).collect())
        d = tempfile.mkdtemp(prefix="bench_extra_ann_")
        _best_of(spark, "build_ann_index", lambda: build_ann_index(
            emb, d, n_planes=16, bands=8), n=2)
        srv = AnnIndex(spark, d, persist=True)
        _best_of(spark, "ann_indexed.collect", lambda: srv.top_k(
            list(qv), 10, exclude_id=0).collect())
        srv.close()
        shutil.rmtree(d, ignore_errors=True)

    if section in ("serve", "all"):
        from deluge_spark.corpus import documents_as_corpus
        from deluge_spark.index.build import BuildConfig, build_index
        from deluge_spark.index.search import Searcher

        idx = f"/tmp/bench_extra_idx_{sf}"
        if not os.path.exists(os.path.join(idx, "stats", "global.json")):
            build_index(spark, documents_as_corpus(spark, sf_dir), idx,
                        BuildConfig(num_shards=8, tokenize_groups=1,
                                    shard_batches=1, store_content=False,
                                    shuffle_partitions=2 * cpus))
        s = Searcher(spark, idx, cache_stats=True, cache_segments=True,
                     term_cache_size=512)
        s.search_local("warmup query", 10)
        content = docs.select("doc_id", "text")
        _best_of(spark, "search_local auto",
                 lambda: s.search_local("spark join table", 10))
        _best_of(spark, "search_local wand", lambda: s.search_local(
            "spark join table", 10, algo="wand"))
        _best_of(spark, "search_local taat", lambda: s.search_local(
            "spark join table", 10, algo="taat"))
        _best_of(spark, "search_fuzzy", lambda: s.search_fuzzy(
            "valu", 10, max_edits=1).collect())
        _best_of(spark, "facet_stats dl", lambda: s.facet_stats(
            "data value", "dl").collect())
        _best_of(spark, "facet_top_hits", lambda: s.facet_top_hits(
            "data value", by="lang", sort_by="n_chars",
            hits_per_bucket=3, buckets=5).collect())
        _best_of(spark, "highlight", lambda: s.highlight(
            "data value", 10, content_df=content,
            content_col="text").collect())
        _best_of(spark, "suggest (empty at big sf)", lambda: s.suggest_terms(
            "improt retrn tabel", size=5).collect())

    spark.stop()


if __name__ == "__main__":
    main()
