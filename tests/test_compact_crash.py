"""compact_segments ↔ streaming tier state crash consistency.

A full compaction swallows the stream runs into one base batch and must
update THREE things: the merged dir, stats/global.json's batch list, and
the stream_state runs. The ``compact_intent`` WAL (plans/admin.py)
guarantees a crash anywhere in that sequence converges at the next admin
entry point:

- crash after the global.json repoint but before the tier-state reset →
  without recovery the next finalize would read run dirs the sweep deleted
  (or double-count swallowed runs);
- crash right after the intent commit (nothing else durable) → full
  roll-forward;
- a later commit landing before recovery → the intent is abandoned, never
  clobbering the newer batch list;
- a merge's input dirs left behind by a crash after its done-mark →
  swept as orphans by the next finalize.
"""

from __future__ import annotations

import json
import os

import pytest

from deluge_spark.index.build import _tokenize_encode_partials
from deluge_spark.index.manifest import Manifest
from deluge_spark.index.search import Searcher
from deluge_spark.plans import admin as admin_mod
from deluge_spark.plans.admin import compact_segments, recover_compact_intent
from deluge_spark.streaming.ingest import finalize_segments

NUM_SHARDS = 4
QUERIES = ["import return table", "data value", "rareterm0"]


def _write_group(spark, idx: str, pdf_slice, epoch: int) -> None:
    df = spark.createDataFrame(pdf_slice)
    partials = _tokenize_encode_partials(df, "content", "code", NUM_SHARDS)
    out = os.path.join(idx, "partials", f"group=stream_{epoch:04d}")
    partials.write.mode("overwrite").partitionBy("shard").parquet(out)


def _stream_index(spark, corpus_pdf, tmp_path_factory, name: str,
                  waves: int = 3) -> tuple[str, dict]:
    idx = str(tmp_path_factory.mktemp(name))
    pdf = corpus_pdf.copy().reset_index(drop=True).head(90)
    pdf["doc_id"] = range(len(pdf))
    per = len(pdf) // waves
    for w in range(waves):
        _write_group(spark, idx, pdf.iloc[w * per:(w + 1) * per], w)
        finalize_segments(spark, idx, num_shards=NUM_SHARDS, tier_factor=2)
    base = {q: Searcher(spark, idx).search_local(q, 10) for q in QUERIES}
    return idx, base


def _assert_results(spark, idx: str, base: dict) -> None:
    s = Searcher(spark, idx)
    for q, want in base.items():
        got = s.search_local(q, 10)
        assert [x[0] for x in got] == [x[0] for x in want], q
        for (_, a), (_, b) in zip(got, want):
            assert abs(a - b) < 1e-9, q


def test_crash_between_repoint_and_state_reset(spark, corpus_pdf,
                                               tmp_path_factory,
                                               monkeypatch):
    idx, base = _stream_index(spark, corpus_pdf, tmp_path_factory,
                              "cc_repoint")

    def boom(man):
        raise RuntimeError("injected crash before state reset")

    monkeypatch.setattr(admin_mod, "_reset_stream_runs", boom)
    with pytest.raises(RuntimeError, match="injected"):
        compact_segments(spark, idx, files_per_shard=1)
    monkeypatch.undo()

    it = Manifest(idx).get("compact_intent")
    assert it and not it.get("done")
    # global.json already points at the compacted batch, the tier state
    # still lists the swallowed runs, nothing swept
    gpath = os.path.join(idx, "stats", "global.json")
    with open(gpath) as f:
        assert json.load(f)["segment_batches"] == [it["batch"]]
    assert Manifest(idx).get("stream_state")["runs"]

    # next finalize recovers: state reset, replaced dirs swept, stats sane
    r = finalize_segments(spark, idx, num_shards=NUM_SHARDS, tier_factor=2)
    assert Manifest(idx).get("compact_intent")["done"]
    assert Manifest(idx).get("stream_state")["runs"] == []
    seg_dirs = [d for d in os.listdir(os.path.join(idx, "segments"))
                if d.startswith("batch=")]
    assert seg_dirs == [it["batch"]]
    assert r["runs"] == []
    _assert_results(spark, idx, base)


def test_crash_right_after_intent_commit_rolls_forward(spark, corpus_pdf,
                                                       tmp_path_factory,
                                                       monkeypatch):
    idx, base = _stream_index(spark, corpus_pdf, tmp_path_factory,
                              "cc_intent")

    def boom(index_dir, man, glob_stats, new_name):
        raise RuntimeError("injected crash before swap")

    monkeypatch.setattr(admin_mod, "_finish_compact_swap", boom)
    with pytest.raises(RuntimeError, match="injected"):
        compact_segments(spark, idx, files_per_shard=1)
    monkeypatch.undo()

    it = Manifest(idx).get("compact_intent")
    assert it and not it.get("done")
    # nothing visible changed yet: old batch list still valid
    gpath = os.path.join(idx, "stats", "global.json")
    with open(gpath) as f:
        assert it["batch"] not in json.load(f)["segment_batches"]

    assert recover_compact_intent(idx) is True   # full roll-forward
    with open(gpath) as f:
        assert json.load(f)["segment_batches"] == [it["batch"]]
    assert Manifest(idx).get("stream_state")["runs"] == []
    _assert_results(spark, idx, base)
    # idempotent / no-op afterwards
    assert recover_compact_intent(idx) is False


def test_later_commit_abandons_stale_intent(spark, corpus_pdf,
                                            tmp_path_factory, monkeypatch):
    idx, base = _stream_index(spark, corpus_pdf, tmp_path_factory,
                              "cc_abandon")

    def boom(index_dir, man, glob_stats, new_name):
        raise RuntimeError("injected crash before swap")

    monkeypatch.setattr(admin_mod, "_finish_compact_swap", boom)
    with pytest.raises(RuntimeError, match="injected"):
        compact_segments(spark, idx, files_per_shard=1)
    monkeypatch.undo()
    it = Manifest(idx).get("compact_intent")

    # a later commit changes the batch list before recovery runs
    gpath = os.path.join(idx, "stats", "global.json")
    with open(gpath) as f:
        glob = json.load(f)
    newer = glob["segment_batches"] + ["batch=append_xyz"]
    glob["segment_batches"] = newer
    with open(gpath, "w") as f:
        json.dump(glob, f)
    os.makedirs(os.path.join(idx, "segments", "batch=append_xyz"),
                exist_ok=True)

    assert recover_compact_intent(idx) is False  # abandoned
    done = Manifest(idx).get("compact_intent")
    assert done["done"] and done.get("abandoned")
    with open(gpath) as f:
        assert json.load(f)["segment_batches"] == newer  # not clobbered


def test_orphan_run_dirs_swept_by_finalize(spark, corpus_pdf,
                                           tmp_path_factory):
    idx, base = _stream_index(spark, corpus_pdf, tmp_path_factory,
                              "cc_orphan")
    seg_root = os.path.join(idx, "segments")
    orphan = os.path.join(seg_root, "batch=stream_r9999")
    os.makedirs(orphan, exist_ok=True)
    with open(os.path.join(orphan, "junk"), "w") as f:
        f.write("x")

    finalize_segments(spark, idx, num_shards=NUM_SHARDS, tier_factor=2)
    assert not os.path.exists(orphan)
    _assert_results(spark, idx, base)
