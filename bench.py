"""Benchmark harness — index build throughput + BM25 query latency.

Runs the full engine (pandas-UDF tokenize → sharded segment build → WAND
queries) on $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) at
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., ...extras}

Extras: build_docs_per_sec, query_p50_ms / p95_ms, plus timings for the
training-data ops (minhash dedup, ANN). BENCH/run_scaling.py wraps this at
two parallelism levels for the N-vs-4N scaling evidence.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import zipfile

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BENCH_QUERIES = [
    ("q_multi", "spark join table", 10),
    ("q_hot", "data", 10),
    ("q_hot_k100", "data value", 100),
    ("q_tri", "window order fast", 10),
    ("q_pair", "batch value", 10),
    ("q_rare", "hash scan slow", 10),
    ("q_missing", "zzzabsentterm", 10),
    ("q_single", "column", 10),
]


def _add_pyfiles(spark) -> None:
    """Ship deluge_spark to executors (spark-submit --py-files stand-in)."""
    z = os.path.join(tempfile.gettempdir(), "deluge_spark_pkg.zip")
    with zipfile.ZipFile(z, "w") as zf:
        pkg = os.path.join(REPO, "deluge_spark")
        for root, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    zf.write(p, os.path.relpath(p, REPO))
    spark.sparkContext.addPyFile(z)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from deluge_spark.session import get_spark
    from deluge_spark.corpus import documents_as_corpus
    from deluge_spark.index.build import BuildConfig, build_index
    from deluge_spark.index.search import Searcher

    # explicit shuffle sizing (north rule): 2× cores at this scale
    spark = get_spark("deluge_spark_bench", cores=cpus,
                      shuffle_partitions=2 * cpus)
    _add_pyfiles(spark)

    corpus = documents_as_corpus(spark, sf_dir)
    n_docs = corpus.count()

    idx = tempfile.mkdtemp(prefix="deluge_bench_idx_")
    timings: dict[str, float] = {}
    t_total = time.time()

    t0 = time.time()
    # num_shards is an index-layout property (data-size driven), NOT a
    # parallelism knob — fixed so the job is identical across core counts
    bm = build_index(spark, corpus, idx, BuildConfig(
        num_shards=8, tokenize_groups=1, shard_batches=1,
        store_content=False, shuffle_partitions=2 * cpus))
    build_s = time.time() - t0
    timings["index_build"] = round(build_s, 4)
    build_stages = bm.get("stages", {})

    searcher = Searcher(spark, idx, cache_stats=True, cache_segments=True,
                        term_cache_size=512)
    searcher.search_local("warmup query", 10)  # JIT/cache warm
    lat = []
    for name, qtext, k in BENCH_QUERIES:
        t0 = time.time()
        searcher.search_local(qtext, k)
        dt = time.time() - t0
        timings[name] = round(dt, 4)
        lat.append(dt)
    # repeat of the first query: all terms now in the driver LRU → zero
    # Spark jobs (the ES/Lucene query-cache serving profile)
    t0 = time.time()
    searcher.search_local(BENCH_QUERIES[0][1], BENCH_QUERIES[0][2])
    timings["q_multi_cached"] = round(time.time() - t0, 4)
    # cached + vectorized TAAT: the full in-memory serving profile
    t0 = time.time()
    searcher.search_local(BENCH_QUERIES[0][1], BENCH_QUERIES[0][2],
                          algo="taat")
    timings["q_multi_cached_taat"] = round(time.time() - t0, 4)
    # DataFrame-materialization path timed once for reference
    t0 = time.time()
    searcher.search(BENCH_QUERIES[0][1], 10, mode="distributed").collect()
    timings["q_distributed_df"] = round(time.time() - t0, 4)
    # distributed + keyword filter (executor-side cogroup path)
    t0 = time.time()
    searcher.search("data value", 10, filters={"lang": "en"},
                    mode="distributed").collect()
    timings["q_distributed_filtered"] = round(time.time() - t0, 4)
    lat.sort()
    p50 = lat[len(lat) // 2]
    p95 = lat[min(len(lat) - 1, int(len(lat) * 0.95))]

    # training-data ops at bench scale
    from deluge_spark.operators.dedup import minhash_lsh_pairs
    from deluge_spark.operators.similarity import cosine_top_k
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t0 = time.time()
    minhash_lsh_pairs(docs, n=2, num_hashes=64, bands=16, threshold=0.5).count()
    timings["op_minhash_lsh"] = round(time.time() - t0, 4)
    t0 = time.time()
    minhash_lsh_pairs(docs, n=2, num_hashes=64, bands=16, threshold=0.5,
                      collapse_exact=True).count()
    timings["op_minhash_lsh_collapsed"] = round(time.time() - t0, 4)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    t0 = time.time()
    cosine_top_k(emb, list(qv), 10, exclude_id=0).collect()
    timings["op_ann_cosine"] = round(time.time() - t0, 4)

    total = time.time() - t_total
    out = {
        "metric": "index_build_plus_bm25_query_wall",
        "value": round(total, 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "n_docs": n_docs,
        "build_docs_per_sec": round(n_docs / build_s, 2),
        "build_stages": build_stages,
        "query_p50_ms": round(p50 * 1000, 2),
        "query_p95_ms": round(p95 * 1000, 2),
    }
    shutil.rmtree(idx, ignore_errors=True)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
