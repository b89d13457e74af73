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
    """Compact streaming partial checkpoints into searchable segments +
    stats — TIERED: each finalize merges only the stream groups that
    arrived since the last finalize with the previous ``batch=stream``
    output (L0 partials into the L1 segment tier), instead of recompacting
    every accumulated group from scratch. Both sides are the same
    self-contained block format, so the LSM re-encode merge
    (``_merge_partials_reencode``) accepts the union directly; per-finalize
    read cost is O(delta + current segments), not O(sum of all historical
    deltas). ``docs_meta`` grows by append-only per-delta partitions (a doc
    lives in exactly one micro-batch, so deltas never overlap).

    Crash safety: the merged tier is written to a temp dir and swapped in;
    the manifest's ``compacted_groups`` list is committed only after the
    swap, so any interrupted finalize is retried from its inputs (and a
    missing/partial ``batch=stream`` triggers a full recompaction of all
    groups — the partial groups are never deleted).

    Returns the stats summary plus ``merged_groups`` (the delta actually
    read this pass) and ``input_files`` (every parquet file the merge
    input scanned — test hook proving old groups are not re-read).
    """
    import hashlib
    import json
    import shutil

    from deluge_spark.index.build import (
        _merge_partials_reencode,
        read_segments,
    )

    man = Manifest(index_dir)
    partials_path = os.path.join(index_dir, "partials")
    all_groups = sorted(d for d in os.listdir(partials_path)
                        if d.startswith("group=stream_"))
    seg_root = os.path.join(index_dir, "segments")
    stream_seg = os.path.join(seg_root, "batch=stream")
    tmp_seg = os.path.join(seg_root, ".stream_compact_tmp")
    meta_dir = os.path.join(index_dir, "docs_meta")
    if os.path.exists(tmp_seg):
        # a finished merge whose swap never committed to the manifest —
        # its input groups are still uncompacted, so just re-merge
        shutil.rmtree(tmp_seg)

    prev = man.get("stream_finalize") or {}
    compacted = list(prev.get("compacted_groups", []))
    have_prev = bool(compacted) and os.path.exists(stream_seg)
    if not have_prev:
        compacted = []          # first finalize, or recovery: full compaction
    new_groups = [g for g in all_groups if g not in set(compacted)]

    if not new_groups and have_prev:
        glob = dict(prev)
        for k in ("unit", "status", "fingerprint", "committed_at"):
            glob.pop(k, None)
        glob.update(merged_groups=[], input_files=[])
        return glob

    new_p = spark.read.option("basePath", partials_path).parquet(
        *[os.path.join(partials_path, g) for g in new_groups])
    if num_shards is None:
        hi = new_p.agg(F.max("shard")).collect()[0][0]
        num_shards = max(1 + int(hi or 0),
                         int(prev.get("num_shards", 0) or 0))

    # ---- docs_meta: append-only delta partitions --------------------------
    # per-doc meta rows (term IS NULL, first_doc=doc_id, df_p=dl) came out
    # of the same single tokenize pass; the delta dir name is a digest of
    # the group list it covers, so a crashed-then-retried finalize
    # overwrites its own delta instead of duplicating rows.
    if not have_prev and os.path.exists(meta_dir):
        shutil.rmtree(meta_dir)     # full recompaction owns the whole table
    delta_key = hashlib.sha1(
        "\n".join(new_groups).encode()).hexdigest()[:12]
    dl_new = (new_p.filter(F.col("term").isNull())
              .select(F.col("first_doc").alias("doc_id"),
                      F.col("df_p").cast("long").alias("dl")))
    dl_new.write.mode("overwrite").parquet(
        os.path.join(meta_dir, f"delta={delta_key}"))
    dl_df = spark.read.parquet(meta_dir).select("doc_id", "dl")
    row = dl_df.agg(F.count(F.lit(1)).alias("n"),
                    F.avg("dl").alias("avgdl")).collect()[0]
    n_docs, avgdl = int(row["n"] or 0), float(row["avgdl"] or 0.0)

    # ---- tier merge: new partials ∪ previous stream segments --------------
    merge_cols = ["shard", "term", "block_first", "block_last",
                  "block_count", "block_off", "data"]
    merge_in = new_p.filter(F.col("term").isNotNull()).select(*merge_cols)
    if have_prev:
        prev_seg = (spark.read.option("basePath", seg_root)
                    .parquet(stream_seg)
                    .withColumn("shard", F.col("shard").cast("int"))
                    .select(*merge_cols))
        merge_in = merge_in.unionByName(prev_seg)
    input_files = sorted(merge_in.inputFiles())
    seg = _merge_partials_reencode(merge_in)
    seg.write.mode("overwrite").partitionBy("shard").parquet(tmp_seg)
    if os.path.exists(stream_seg):
        shutil.rmtree(stream_seg)
    os.rename(tmp_seg, stream_seg)

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
    with open(gpath, "w") as f:
        json.dump(glob, f)
    man.commit("stream_finalize", compacted_groups=all_groups, **glob)
    return {**glob, "merged_groups": new_groups, "input_files": input_files}


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
