"""Structured-Streaming ingest — the continuous analog of the batch build.

The reference is a one-shot batch ingester; its closest long-running mode is
repeatedly pointing it at new input directories. Structured Streaming
subsumes that: ``readStream`` over an arriving-files directory, with
``foreachBatch`` running the same tokenize → tf-append path as the batch
build (exactly-once per micro-batch via the streaming checkpoint +
idempotent per-batch manifest units). Segments are built/refreshed by a
periodic compaction call (``finalize_segments``) — the classic
near-real-time search pattern (in-memory/batch deltas + periodic merge).

Also provides the watermarked windowed aggregation over an event stream
(late-data handling) — the standard streaming-analytics surface.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deluge_spark.functions.tokenizer import term_counts
from deluge_spark.index.build import BuildConfig
from deluge_spark.index.manifest import Manifest


def stream_ingest_corpus(spark: SparkSession, source_dir: str,
                         index_dir: str, schema: str,
                         config: BuildConfig | None = None,
                         checkpoint_dir: str | None = None):
    """Start a streaming query appending per-micro-batch tf checkpoints.

    Returns the StreamingQuery; call ``finalize_segments`` after (or
    periodically) to fold accumulated tf into searchable segments.
    Each micro-batch writes ``tf/group=stream_<epoch>/`` plus a manifest
    unit — the same resumable layout as the batch build.
    """
    cfg = config or BuildConfig()
    man = Manifest(index_dir)
    tf_path = os.path.join(index_dir, "tf")

    src = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", "16")
           .parquet(source_dir))

    def _per_batch(batch_df: DataFrame, epoch: int) -> None:
        unit = f"stream_tokenize_e{epoch}"
        if man.is_done(unit):      # idempotent re-delivery guard
            return
        if "doc_id" not in batch_df.columns:
            raise ValueError("streaming source must carry doc_id")
        tf = term_counts(batch_df, "doc_id", "content", cfg.tokenizer_mode)
        tf = tf.withColumn(
            "shard", F.pmod(F.col("doc_id"), F.lit(cfg.num_shards)).cast("int"))
        out = os.path.join(tf_path, f"group=stream_{epoch}")
        tf.write.mode("overwrite").partitionBy("shard").parquet(out)
        man.commit(unit, rows=spark.read.parquet(out).count(), epoch=epoch)

    q = (src.writeStream.foreachBatch(_per_batch)
         .option("checkpointLocation",
                 checkpoint_dir or os.path.join(index_dir, "_stream_ckpt"))
         .trigger(availableNow=True)
         .start())
    return q


def finalize_segments(spark: SparkSession, index_dir: str,
                      num_shards: int | None = None) -> dict:
    """Fold the streaming tf checkpoints into searchable segments + stats —
    the periodic compaction of the near-real-time pattern. Returns summary.
    """
    from deluge_spark.index.build import _build_segments

    tf_path = os.path.join(index_dir, "tf")
    groups = [os.path.join(tf_path, d) for d in sorted(os.listdir(tf_path))
              if d.startswith("group=")]
    tf = spark.read.option("basePath", tf_path).parquet(*groups)
    if num_shards is None:
        num_shards = 1 + int(tf.agg(F.max("shard")).collect()[0][0] or 0)

    dl_df = tf.groupBy("doc_id").agg(F.max("dl").cast("long").alias("dl"))
    dl_df.write.mode("overwrite").parquet(os.path.join(index_dir, "docs_meta"))
    dl_df = spark.read.parquet(os.path.join(index_dir, "docs_meta"))
    row = dl_df.agg(F.count(F.lit(1)).alias("n"),
                    F.avg("dl").alias("avgdl")).collect()[0]
    n_docs, avgdl = int(row["n"] or 0), float(row["avgdl"] or 0.0)

    seg = _build_segments(tf)
    seg.write.mode("overwrite").partitionBy("shard").parquet(
        os.path.join(index_dir, "segments", "batch=stream"))

    import json

    from deluge_spark.index.build import read_segments
    # authoritative batch list = whatever a prior build recorded + the
    # stream batch (never a glob — see read_segments)
    stats_dir = os.path.join(index_dir, "stats")
    gpath = os.path.join(stats_dir, "global.json")
    batch_names: list[str] = []
    if os.path.exists(gpath):
        with open(gpath) as f:
            batch_names = list(json.load(f).get("segment_batches", []))
    if "batch=stream" not in batch_names:
        batch_names.append("batch=stream")
    seg_all = read_segments(spark, index_dir, batches=batch_names)
    terms = seg_all.groupBy("term").agg(F.sum("df_local").alias("df"),
                                        F.sum("cf_local").alias("cf"))
    terms.write.mode("overwrite").parquet(os.path.join(stats_dir, "terms"))
    total = int(seg_all.agg(F.sum("n_postings")).collect()[0][0] or 0)
    glob = {"n_docs": n_docs, "avgdl": avgdl, "total_postings": total,
            "num_shards": num_shards, "tokenizer_mode": "code",
            "segment_batches": batch_names}
    os.makedirs(stats_dir, exist_ok=True)
    with open(os.path.join(stats_dir, "global.json"), "w") as f:
        json.dump(glob, f)
    Manifest(index_dir).commit("stream_finalize", **glob)
    return glob


def stream_events_windowed(spark: SparkSession, source_dir: str,
                           schema: str, window: str = "5 minutes",
                           watermark: str = "10 minutes",
                           query_name: str = "events_windowed"):
    """Watermarked tumbling-window aggregation over an event stream →
    in-memory sink (smoke/serving surface). Late rows beyond the watermark
    are dropped — the streaming analog of the reference's progress
    accounting, with correctness under disorder."""
    src = (spark.readStream.schema(schema).parquet(source_dir))
    agg = (src.withWatermark("ts", watermark)
           .groupBy(F.window("ts", window).alias("w"), "event_type")
           .agg(F.count(F.lit(1)).alias("n"),
                F.round(F.sum("value"), 4).alias("sum_value"))
           .select(F.col("w.start").alias("window_start"),
                   F.col("w.end").alias("window_end"),
                   "event_type", "n", "sum_value"))
    return (agg.writeStream.outputMode("append").format("memory")
            .queryName(query_name).trigger(availableNow=True).start())
