"""Structured-Streaming ingest — the continuous analog of the batch build.

The reference is a one-shot batch ingester; its closest long-running mode is
repeatedly pointing it at new input directories. Structured Streaming
subsumes that: ``readStream`` over an arriving-files directory, with
``foreachBatch`` running the SAME single-pass tokenize+encode as the batch
build (``_tokenize_encode_partials``): each micro-batch checkpoints
compressed partial posting lists (~5 B/posting on disk and across the Arrow
boundary — not 30 B raw tf rows), exactly-once via the streaming checkpoint
+ idempotent per-batch manifest units. ``finalize_segments`` periodically
compacts the accumulated partials into searchable segments — the classic
near-real-time pattern (delta runs + periodic merge).

Merge semantics: unlike the batch build, whose tokenize groups are doc-RANGE
buckets (partials concatenate by byte append), micro-batches see doc_ids in
ARRIVAL order, so per-batch partials of one (shard, term) can interleave in
doc range. The finalize therefore uses ``_merge_partials_reencode`` —
decode the self-contained blocks, merge-sort, re-encode (LSM compaction) —
which is correct for any arrival order.

Also provides the watermarked windowed aggregation over an event stream
(late-data handling) — the standard streaming-analytics surface.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deluge_spark.index.build import BuildConfig
from deluge_spark.index.manifest import Manifest


def stream_ingest_corpus(spark: SparkSession, source_dir: str,
                         index_dir: str, schema: str,
                         config: BuildConfig | None = None,
                         checkpoint_dir: str | None = None):
    """Start a streaming query appending per-micro-batch compressed partial
    posting lists (plus per-doc meta rows) under
    ``partials/group=stream_<epoch>/``.

    Returns the StreamingQuery; call ``finalize_segments`` after (or
    periodically) to compact accumulated partials into searchable segments.
    """
    from deluge_spark.index.build import _tokenize_encode_partials

    cfg = config or BuildConfig()
    man = Manifest(index_dir)
    partials_path = os.path.join(index_dir, "partials")

    src = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", "16")
           .parquet(source_dir))

    def _per_batch(batch_df: DataFrame, epoch: int) -> None:
        unit = f"stream_tokenize_e{epoch}"
        if man.is_done(unit):      # idempotent re-delivery guard
            return
        if "doc_id" not in batch_df.columns:
            raise ValueError("streaming source must carry doc_id")
        partials = _tokenize_encode_partials(
            batch_df, "content", cfg.tokenizer_mode, cfg.num_shards)
        out = os.path.join(partials_path, f"group=stream_{epoch}")
        partials.write.mode("overwrite").partitionBy("shard").parquet(out)
        man.commit(unit, rows=spark.read.parquet(out).count(), epoch=epoch)

    q = (src.writeStream.foreachBatch(_per_batch)
         .option("checkpointLocation",
                 checkpoint_dir or os.path.join(index_dir, "_stream_ckpt"))
         .trigger(availableNow=True)
         .start())
    return q


def finalize_segments(spark: SparkSession, index_dir: str,
                      num_shards: int | None = None) -> dict:
    """Compact the streaming partial checkpoints into searchable segments +
    stats — the periodic merge of the near-real-time pattern. Correct for
    overlapping per-batch doc ranges (see module doc). Returns summary.
    """
    from deluge_spark.index.build import _merge_partials_reencode

    partials_path = os.path.join(index_dir, "partials")
    groups = [os.path.join(partials_path, d)
              for d in sorted(os.listdir(partials_path))
              if d.startswith("group=stream_")]
    partials = spark.read.option("basePath", partials_path).parquet(*groups)
    if num_shards is None:
        num_shards = 1 + int(partials.agg(F.max("shard")).collect()[0][0] or 0)

    # per-doc meta rows (term IS NULL, first_doc=doc_id, df_p=dl) came out
    # of the same single tokenize pass; a doc lives in exactly one batch
    dl_df = (partials.filter(F.col("term").isNull())
             .select(F.col("first_doc").alias("doc_id"),
                     F.col("df_p").cast("long").alias("dl")))
    dl_df.write.mode("overwrite").parquet(os.path.join(index_dir, "docs_meta"))
    dl_df = spark.read.parquet(os.path.join(index_dir, "docs_meta"))
    row = dl_df.agg(F.count(F.lit(1)).alias("n"),
                    F.avg("dl").alias("avgdl")).collect()[0]
    n_docs, avgdl = int(row["n"] or 0), float(row["avgdl"] or 0.0)

    seg = _merge_partials_reencode(partials.filter(F.col("term").isNotNull()))
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
