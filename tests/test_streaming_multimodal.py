from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from deluge_spark.index.build import BuildConfig
from deluge_spark.index.manifest import Manifest
from deluge_spark.sources.multimodal import (
    extract_features,
    fake_decode_batch,
    frame_sample_plan,
    real_decode_batch,
    synthesize_media,
)
from deluge_spark.streaming.ingest import (
    stream_events_windowed,
    stream_ingest_corpus,
)


def test_stream_ingest_builds_partials(spark, corpus_pdf, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("stream_src"))
    idx = str(tmp_path_factory.mktemp("stream_idx"))
    pdf = corpus_pdf.copy().reset_index(drop=True)
    pdf["doc_id"] = range(len(pdf))
    df = spark.createDataFrame(pdf)
    schema = ("repo string, path string, commit string, lang string, "
              "content string, doc_id long")
    df.limit(100).repartition(4).write.mode("overwrite").parquet(src)

    q = stream_ingest_corpus(spark, src, idx, schema,
                             BuildConfig(num_shards=4))
    q.awaitTermination(120)
    man = Manifest(idx)
    units = [e["unit"] for e in man.entries()]
    assert any(u.startswith("stream_tokenize_e") for u in units)
    # micro-batches checkpoint COMPRESSED partials (posting bytes), not raw
    # tf rows — the partials schema with per-doc meta rows (term IS NULL)
    parts = (spark.read.option("basePath", f"{idx}/partials")
             .parquet(f"{idx}/partials/*"))
    assert parts.count() > 0
    assert set(parts.columns) >= {"term", "first_doc", "df_p", "data", "shard"}
    # one meta row per doc that has >=1 token (same contract as the batch
    # build's docs_meta — tokenless docs carry no dl)
    from deluge_spark.operators.dedup import tokens_col
    n_tokenful = (spark.read.parquet(src)
                  .filter(F.size(tokens_col("content", "code")) > 0).count())
    assert parts.filter(F.col("term").isNull()).count() == n_tokenful
    assert not os.path.exists(f"{idx}/tf")  # raw tf path is gone


def test_stream_finalize_searchable(spark, corpus_pdf, tmp_path_factory):
    """Stream-ingested partials compacted into segments must answer queries
    identically to a batch-built index over the same docs — across MULTIPLE
    triggers whose doc ranges deliberately interleave (docs shuffled across
    many small files, maxFilesPerTrigger=16 → several micro-batches), the
    case the concat merge cannot handle and the re-encode compaction must."""
    from deluge_spark.index.build import BuildConfig as BC, build_index
    from deluge_spark.index.search import Searcher
    from deluge_spark.streaming.ingest import finalize_segments

    src = str(tmp_path_factory.mktemp("sf_src"))
    sidx = str(tmp_path_factory.mktemp("sf_sidx"))
    bidx = str(tmp_path_factory.mktemp("sf_bidx"))
    pdf = corpus_pdf.copy().reset_index(drop=True).head(150)
    pdf["doc_id"] = range(len(pdf))
    # shuffle rows so every file (→ every micro-batch) spans the full doc
    # range: per-batch partials of one term overlap maximally
    pdf = pdf.sample(frac=1.0, random_state=7).reset_index(drop=True)
    df = spark.createDataFrame(pdf)
    df.repartition(40).write.mode("overwrite").parquet(src)
    schema = ("repo string, path string, commit string, lang string, "
              "content string, doc_id long")

    q = stream_ingest_corpus(spark, src, sidx, schema,
                             BuildConfig(num_shards=4))
    q.awaitTermination(120)
    man = Manifest(sidx)
    tok_units = [e for e in man.entries()
                 if e["unit"].startswith("stream_tokenize_e")]
    assert len(tok_units) >= 2          # genuinely multi-trigger
    finalize_segments(spark, sidx, num_shards=4)

    # posting lists must come out doc-sorted despite interleaved batches
    from deluge_spark.index.build import read_segments
    from deluge_spark.index.codec import decode_list
    import numpy as np
    for r in read_segments(spark, sidx).limit(50).collect():
        d, _, _ = decode_list(bytes(r["data"]), r["block_off"],
                              r["block_count"], r["block_first"],
                              r["block_last"])
        assert np.all(np.diff(d) > 0), r["term"]

    build_index(spark, df, bidx, BC(num_shards=4, tokenize_groups=2,
                                    shard_batches=1))
    s_stream = Searcher(spark, sidx)
    s_batch = Searcher(spark, bidx)
    for query in ["import return table", "getHTTPResponse", "rareterm0"]:
        a = s_stream.search_local(query, 10)
        b = s_batch.search_local(query, 10)
        assert [x[0] for x in a] == [x[0] for x in b], query
        for (d1, s1), (d2, s2) in zip(a, b):
            assert abs(s1 - s2) < 1e-9


def test_stream_finalize_tiered_two_pass(spark, corpus_pdf, tmp_path_factory):
    """VERDICT r3 task #2: the second finalize must read ONLY the delta
    stream groups plus the previous batch=stream tier — never the already
    compacted groups — and the result must stay score-identical to a batch
    build over the full corpus. A third finalize with no new data is a
    no-op."""
    from deluge_spark.index.build import BuildConfig as BC, build_index
    from deluge_spark.index.search import Searcher
    from deluge_spark.streaming.ingest import finalize_segments

    src = str(tmp_path_factory.mktemp("t2_src"))
    sidx = str(tmp_path_factory.mktemp("t2_sidx"))
    bidx = str(tmp_path_factory.mktemp("t2_bidx"))
    pdf = corpus_pdf.copy().reset_index(drop=True).head(150)
    pdf["doc_id"] = range(len(pdf))
    df_all = spark.createDataFrame(pdf)
    schema = ("repo string, path string, commit string, lang string, "
              "content string, doc_id long")

    # wave 1: docs 0..99 → ingest → finalize (full compaction)
    df_all.filter("doc_id < 100").repartition(20).write.mode(
        "overwrite").parquet(src)
    stream_ingest_corpus(spark, src, sidx, schema,
                         BuildConfig(num_shards=4)).awaitTermination(120)
    r1 = finalize_segments(spark, sidx, num_shards=4)
    assert r1["n_docs"] > 0 and r1["merged_groups"]
    wave1_groups = set(r1["merged_groups"])

    # wave 2: docs 100..149 arrive as NEW files; same checkpoint → only the
    # delta is tokenized into new stream groups
    df_all.filter("doc_id >= 100").repartition(10).write.mode(
        "append").parquet(src)
    stream_ingest_corpus(spark, src, sidx, schema,
                         BuildConfig(num_shards=4)).awaitTermination(120)
    r2 = finalize_segments(spark, sidx, num_shards=4)

    # the delta pass merged only the NEW groups...
    assert r2["merged_groups"] and not (set(r2["merged_groups"])
                                        & wave1_groups)
    # ...and (size-tiered: no cascade due at 2 runs) its scan touched ONLY
    # the delta partials — neither already-compacted groups nor wave 1's run
    for f in r2["input_files"]:
        assert not any(f"/{g}/" in f for g in wave1_groups), f
        assert "/partials/" in f, f
    assert len(r2["runs"]) == 2 and r2["tier_merges"] == []

    # tiered result == batch build over the full 150 docs
    build_index(spark, df_all, bidx,
                BC(num_shards=4, tokenize_groups=2, shard_batches=1))
    s_stream, s_batch = Searcher(spark, sidx), Searcher(spark, bidx)
    for query in ["import return table", "getHTTPResponse", "rareterm0"]:
        a = s_stream.search_local(query, 10)
        b = s_batch.search_local(query, 10)
        assert [x[0] for x in a] == [x[0] for x in b], query
        for (d1, s1), (d2, s2) in zip(a, b):
            assert abs(s1 - s2) < 1e-9

    # idempotent tail: nothing new → no-op
    r3 = finalize_segments(spark, sidx, num_shards=4)
    assert r3["merged_groups"] == [] and r3["n_docs"] == r2["n_docs"]


def test_stream_events_windowed(spark, sf_dir):
    q = stream_events_windowed(
        spark, f"{sf_dir}",
        schema=("event_id long, ts timestamp, user_id long, "
                "event_type string, value double, props string"),
        window="1 hour", watermark="2 hours",
        query_name="ev_win_test")
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM ev_win_test")
    # append-mode with watermark: only closed windows are emitted
    assert set(out.columns) == {"window_start", "window_end", "event_type",
                                "n", "sum_value"}
    batch = (spark.read.parquet(f"{sf_dir}/events.parquet")
             .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
             .count())
    assert out.count() <= batch.count()
    assert out.count() > 0


def test_multimodal_features(spark):
    media = synthesize_media(spark, n=24)
    feats = extract_features(media).collect()
    assert len(feats) == 24
    for r in feats:
        assert len(r.features) == 8
        assert r.n_bytes > 0 and len(r.sha256) == 64
    # determinism across partitionings
    a = {r.media_id: r.features for r in feats}
    b = {r.media_id: r.features
         for r in extract_features(synthesize_media(spark, n=24)
                                   .repartition(7)).collect()}
    assert a == b


def test_multimodal_real_decode_is_stubbed():
    import pandas as pd
    with pytest.raises(NotImplementedError):
        real_decode_batch(pd.Series([b"x"]), pd.Series(["image"]))


def test_frame_sample_plan(spark):
    media = synthesize_media(spark, n=9)
    plan = frame_sample_plan(media, every_ms=500)
    rows = plan.collect()
    assert rows and all(r.frame_ts_ms % 500 == 0 for r in rows)
    vids = media.filter("kind = 'video'").select("media_id").collect()
    assert {r.media_id for r in rows} == {r.media_id for r in vids}
