"""Sharded inverted-index build — the engine's primary entry point.

The Spark re-expression of the reference's ``Ingestor.Ingest()``
(/root/reference/ingestor.go:160-244): where deluge walks files with a
goroutine pool, parses line-by-line, batches 20 MB bulks and POSTs them to
Elasticsearch behind a backpressure equalizer, our build is three Spark
stages over a columnar source table — tokenize (narrow, Arrow-vectorized),
segment assembly (one wide shuffle, hash by (shard, term)), stats (plain
aggregates). Worker pools / equalizer / bulk batching all collapse into the
Spark scheduler + Arrow batch sizing (SURVEY.md §2A rows 13–18).

Sharding model (≙ Elasticsearch ``number_of_shards``, the constructor-
mandated partitioning of /root/reference/elastic/v7/client.go:124-136,166):
``shard = pmod(doc_id, num_shards)`` — *document* sharding. Every term's
postings split across all shards, which is exactly the hot-term salting the
north rule demands: a Zipfian term ("import", "the") never concentrates in
one shuffle key because its key is (shard, term); sublists are disjoint,
sorted, independently delta-encoded, and merged by the query executor. At
1000 executors, num_shards scales to O(cluster width) and the (shard, term)
shuffle stays balanced regardless of term skew.

Resumability (north-star B10): tokenize checkpoints per source group,
segments per shard batch, each unit committed to the manifest atomically;
a killed build re-runs only missing units — never re-tokenizes committed
groups (asserted by the kill-test).

Index layout under ``index_dir``:
  docs/                parquet: doc_id, repo, path, commit, lang,
                       content_sha256, doc_len, shard[, content]
  tf/group=G/          parquet: doc_id, term, tf, shard   (checkpoint)
  segments/shard=S/    parquet: term, df_local, cf_local, n_postings,
                       max_tfnorm, block_* arrays, data binary
  stats/global.json    {n_docs, avgdl, total_postings, ...}
  stats/terms/         parquet: term, df, cf   (query-time idf lookup)
  manifest/            one JSON per committed unit
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Iterator
from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deluge_spark.functions.tokenizer import term_counts
from deluge_spark.index.codec import encode_postings
from deluge_spark.index.manifest import Manifest
from deluge_spark.operators.doc_ids import assign_doc_ids

SEGMENT_SCHEMA = (
    "shard int, term string, df_local long, cf_local long, n_postings long, "
    "max_tfnorm double, block_first array<long>, block_last array<long>, "
    "block_count array<int>, block_off array<long>, block_max array<double>, "
    "data binary"
)


@dataclass
class BuildConfig:
    num_shards: int = 8
    tokenizer_mode: str = "code"
    tokenize_groups: int = 4          # checkpoint granularity, tokenize stage
    shard_batches: int = 2            # checkpoint granularity, segment stage
    term_buckets: int = 32            # pandas groups per shard in segment build
    manifest_counts: bool = True      # row-count jobs per manifest unit (lineage)
    store_content: bool = True
    shuffle_partitions: int | None = None  # explicit sizing (north rule)
    # fault injection for the resumability kill-test:
    fail_after: dict = field(default_factory=dict)  # {"tokenize": n, "segments": n}


class FaultInjected(RuntimeError):
    pass


def _fingerprint(corpus: DataFrame) -> str:
    """Cheap lineage fingerprint: schema + source files if file-backed."""
    files = []
    try:
        files = sorted(corpus.inputFiles())[:64]
    except Exception:
        pass
    return json.dumps({"schema": corpus.schema.simpleString(),
                       "files": files})[:4000]


def build_index(spark: SparkSession, corpus: DataFrame, index_dir: str,
                config: BuildConfig | None = None) -> dict:
    """Build (or resume) the full index; returns summary metrics."""
    cfg = config or BuildConfig()
    if cfg.shuffle_partitions:
        spark.conf.set("spark.sql.shuffle.partitions", str(cfg.shuffle_partitions))
    os.makedirs(index_dir, exist_ok=True)
    man = Manifest(index_dir)
    fp = _fingerprint(corpus)
    t0 = time.time()
    metrics = {"retokenized_groups": 0, "rebuilt_shard_batches": 0}
    stage_t: dict[str, float] = {}
    _last = [time.time()]

    def _mark(stage: str) -> None:
        now = time.time()
        stage_t[stage] = round(stage_t.get(stage, 0.0) + now - _last[0], 3)
        _last[0] = now

    docs_path = os.path.join(index_dir, "docs")
    tf_path = os.path.join(index_dir, "tf")
    seg_path = os.path.join(index_dir, "segments")
    stats_dir = os.path.join(index_dir, "stats")

    # ---- stage 0: doc ids + grouping key -------------------------------
    # Deterministic dense ids (operators/doc_ids.py); group = hash of the
    # natural key → stable tokenize-checkpoint units independent of layout.
    docs_with_ids = assign_doc_ids(corpus)
    base_cols = [c for c in ("repo", "path", "commit", "lang") if c in corpus.columns]
    docs_with_ids = docs_with_ids.withColumn(
        "shard", F.pmod(F.col("doc_id"), F.lit(cfg.num_shards)).cast("int")
    ).withColumn(
        "grp", F.pmod(F.col("doc_id"), F.lit(cfg.tokenize_groups)).cast("int")
    )

    # assign_doc_ids caches its range-partitioned input; downstream stages
    # (tokenize groups, docs table) are cheap projections over that cache
    need_docs = not man.is_done("docs", fp)

    # ---- stage 1: tokenize, checkpointed per group ----------------------
    _mark("setup")
    done_tok = 0
    for g in range(cfg.tokenize_groups):
        unit = f"tokenize_g{g}"
        if man.is_done(unit, fp):
            continue
        if cfg.fail_after.get("tokenize") is not None and \
                done_tok >= cfg.fail_after["tokenize"]:
            raise FaultInjected(f"injected failure before {unit}")
        part = docs_with_ids.filter(F.col("grp") == g)
        tf = term_counts(part, "doc_id", "content", cfg.tokenizer_mode)
        # shard derives from doc_id — no join; shard dirs → pruning later
        tf = tf.withColumn(
            "shard", F.pmod(F.col("doc_id"), F.lit(cfg.num_shards)).cast("int"))
        out = os.path.join(tf_path, f"group={g}")
        tf.write.mode("overwrite").partitionBy("shard").parquet(out)
        n_rows = spark.read.parquet(out).count() if cfg.manifest_counts else -1
        man.commit(unit, fp, rows=n_rows, group=g)
        metrics["retokenized_groups"] += 1
        done_tok += 1
        _mark("tokenize")

    tf_all = spark.read.option("basePath", tf_path).parquet(
        *[os.path.join(tf_path, f"group={g}") for g in range(cfg.tokenize_groups)]
    )

    # ---- stage 2: docs table (sha256 invariant + doc_len) ----------------
    if need_docs:
        dl = tf_all.groupBy("doc_id").agg(F.max("dl").cast("long").alias("doc_len"))
        keep = ["doc_id", *base_cols,
                F.sha2(F.col("content"), 256).alias("content_sha256"),
                "shard"]
        if cfg.store_content:
            keep.append("content")
        docs_out = (
            docs_with_ids.select(*keep)
            .join(dl, "doc_id", "left")
            .withColumn("doc_len", F.coalesce("doc_len", F.lit(0)))
        )
        docs_out.write.mode("overwrite").parquet(docs_path)
        n_docs_total = (spark.read.parquet(docs_path).count()
                        if cfg.manifest_counts else -1)
        man.commit("docs", fp, rows=n_docs_total)
        _mark("docs_table")

    # ---- stage 3: segments, checkpointed per shard batch -----------------
    # dl rides on every posting row (computed batch-locally in term_counts)
    # so the segment build needs NO doc-level join — its only exchange is
    # the (shard, term-bucket) shuffle.
    dl_df = tf_all.groupBy("doc_id").agg(F.max("dl").cast("long").alias("dl"))
    n_docs, avgdl = _stats_from_dl(dl_df)
    _mark("corpus_stats")

    postings = tf_all

    batches = _shard_batches(cfg.num_shards, cfg.shard_batches)
    done_seg = 0
    for bi, batch in enumerate(batches):
        unit = f"segments_b{bi}"
        if man.is_done(unit, fp):
            continue
        if cfg.fail_after.get("segments") is not None and \
                done_seg >= cfg.fail_after["segments"]:
            raise FaultInjected(f"injected failure before {unit}")
        part = postings.filter(F.col("shard").isin(list(batch)))
        seg = _build_segments(part, avgdl, cfg.term_buckets)
        # one directory per shard → partition pruning at query time
        seg.write.mode("overwrite").partitionBy("shard").parquet(
            os.path.join(seg_path, f"batch={bi}"))
        man.commit(unit, fp, shards=list(batch), avgdl=avgdl)
        metrics["rebuilt_shard_batches"] += 1
        done_seg += 1
        _mark("segments")

    # ---- stage 4: stats ---------------------------------------------------
    if not man.is_done("stats", fp):
        seg_all = read_segments(spark, index_dir)
        terms = seg_all.groupBy("term").agg(
            F.sum("df_local").alias("df"), F.sum("cf_local").alias("cf"))
        terms.write.mode("overwrite").parquet(os.path.join(stats_dir, "terms"))
        total_postings = int(
            seg_all.agg(F.sum("n_postings")).collect()[0][0] or 0)
        os.makedirs(stats_dir, exist_ok=True)
        glob = {
            "n_docs": n_docs, "avgdl": avgdl,
            "total_postings": total_postings,
            "num_shards": cfg.num_shards,
            "tokenizer_mode": cfg.tokenizer_mode,
        }
        with open(os.path.join(stats_dir, "global.json"), "w") as f:
            json.dump(glob, f)
        man.commit("stats", fp, **glob)
        _mark("term_stats")

    man.seal(wall_s=time.time() - t0)
    metrics.update(n_docs=n_docs, avgdl=avgdl, wall_s=time.time() - t0,
                   stages=stage_t)
    return metrics


def _stats_from_dl(dl_df: DataFrame) -> tuple[int, float]:
    row = dl_df.agg(F.count(F.lit(1)).alias("n"),
                    F.avg("dl").alias("avgdl")).collect()[0]
    n = int(row["n"] or 0)
    return n, (float(row["avgdl"]) if n else 0.0)


def _shard_batches(num_shards: int, n_batches: int) -> list[list[int]]:
    n_batches = max(1, min(n_batches, num_shards))
    return [list(range(num_shards))[i::n_batches] for i in range(n_batches)]


def _build_segments(postings: DataFrame, avgdl: float,
                    term_buckets: int = 32) -> DataFrame:
    """(doc_id, term, tf, dl, shard) → one packed posting list per
    (shard, term) — the single wide shuffle of the build.

    The shuffle key is (shard, term-bucket), not (shard, term): one Arrow
    call encodes a whole bucket of terms, amortizing per-group overhead when
    the vocabulary is large and posting lists are short. Skew stays bounded:
    a hot term's postings are already split across shards by doc-sharding,
    and xxhash64 spreads terms uniformly over buckets.

    applyInArrow + dictionary-encode keeps term strings in Arrow C++ —
    only the (few) unique terms of a bucket ever materialize, and postings
    flow numpy-to-numpy into the codec (the applyInPandas formulation
    converted every posting's term to a Python object, which was the
    segment stage's bandwidth ceiling)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def _encode_bucket(tbl: pa.Table) -> pa.Table:
        term_idx_arr = pc.dictionary_encode(tbl.column("term").combine_chunks())
        terms = term_idx_arr.dictionary.to_pylist()
        idx = term_idx_arr.indices.to_numpy(zero_copy_only=False)
        doc = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        tf = tbl.column("tf").to_numpy(zero_copy_only=False)
        dl = tbl.column("dl").to_numpy(zero_copy_only=False)
        shard = int(tbl.column("shard")[0].as_py())

        order = np.lexsort((doc, idx))
        idx, doc, tf, dl = idx[order], doc[order], tf[order], dl[order]
        bounds = np.flatnonzero(np.diff(idx)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(idx)]])

        out = {k: [] for k in ("shard", "term", "df_local", "cf_local",
                               "n_postings", "max_tfnorm", "block_first",
                               "block_last", "block_count", "block_off",
                               "block_max", "data")}
        for s, e in zip(starts, ends):
            enc = encode_postings(doc[s:e], tf[s:e], dl[s:e], avgdl)
            out["shard"].append(shard)
            out["term"].append(terms[int(idx[s])])
            out["df_local"].append(e - s)
            out["cf_local"].append(int(tf[s:e].sum()))
            out["n_postings"].append(enc["n_postings"])
            out["max_tfnorm"].append(float(enc["block_max"].max()))
            out["block_first"].append(enc["block_first"])
            out["block_last"].append(enc["block_last"])
            out["block_count"].append(enc["block_count"])
            out["block_off"].append(enc["block_off"])
            out["block_max"].append(enc["block_max"])
            out["data"].append(enc["data"])
        return pa.table({
            "shard": pa.array(out["shard"], pa.int32()),
            "term": pa.array(out["term"], pa.string()),
            "df_local": pa.array(out["df_local"], pa.int64()),
            "cf_local": pa.array(out["cf_local"], pa.int64()),
            "n_postings": pa.array(out["n_postings"], pa.int64()),
            "max_tfnorm": pa.array(out["max_tfnorm"], pa.float64()),
            "block_first": pa.array(out["block_first"], pa.list_(pa.int64())),
            "block_last": pa.array(out["block_last"], pa.list_(pa.int64())),
            "block_count": pa.array(out["block_count"], pa.list_(pa.int32())),
            "block_off": pa.array(out["block_off"], pa.list_(pa.int64())),
            "block_max": pa.array(out["block_max"], pa.list_(pa.float64())),
            "data": pa.array(out["data"], pa.binary()),
        })

    bucketed = postings.withColumn(
        "tbucket", F.pmod(F.xxhash64("term"), F.lit(term_buckets)).cast("int"))
    return bucketed.groupBy("shard", "tbucket").applyInArrow(
        _encode_bucket, schema=SEGMENT_SCHEMA)


def read_segments(spark: SparkSession, index_dir: str) -> DataFrame:
    seg_path = os.path.join(index_dir, "segments")
    paths = [os.path.join(seg_path, d) for d in sorted(os.listdir(seg_path))
             if d.startswith("batch=")]
    return spark.read.option("basePath", seg_path).parquet(*paths)


def read_global_stats(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "stats", "global.json")) as f:
        return json.load(f)
