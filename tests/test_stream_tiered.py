"""Size-tiered streaming compaction (round-4 VERDICT #1 + ADVICE #2).

Contract under test, over N finalizes:
- total postings rewritten across N finalizes is O(total · log_K total),
  NOT the O(N · total) a single rewritten tier costs — asserted directly
  against both bounds;
- most finalizes touch ONLY their delta partials (no older run is read);
- the final index answers queries score-identical to a batch build;
- a crash between a run's rename and its state commit is rolled FORWARD on
  the next finalize — the delta is never merged twice (postings/df can't
  silently double);
- a pre-tiering index (legacy single ``batch=stream`` tier) is migrated in
  place as one run.

Partials groups are written directly (the exact on-disk shape
``stream_ingest_corpus``'s micro-batches produce) so the N-wave loop stays
fast; streaming-query end-to-end coverage lives in
test_streaming_multimodal.py.
"""

from __future__ import annotations

import json
import math
import os

import pytest

from deluge_spark.index.build import (
    BuildConfig,
    _tokenize_encode_partials,
    build_index,
)
from deluge_spark.index.manifest import Manifest
from deluge_spark.index.search import Searcher
from deluge_spark.streaming.ingest import finalize_segments

QUERIES = ["import return table", "getHTTPResponse", "rareterm0",
           "data value"]
NUM_SHARDS = 4


def _write_group(spark, idx: str, pdf_slice, epoch: int) -> None:
    df = spark.createDataFrame(pdf_slice)
    partials = _tokenize_encode_partials(df, "content", "code", NUM_SHARDS)
    out = os.path.join(idx, "partials", f"group=stream_{epoch:04d}")
    partials.write.mode("overwrite").partitionBy("shard").parquet(out)


def _run_postings_map(idx: str) -> dict[str, int]:
    st = Manifest(idx).get("stream_state")
    return {r["name"]: int(r["postings"]) for r in (st or {}).get("runs", [])}


def _assert_matches_batch(spark, sidx: str, bidx: str) -> None:
    s_stream, s_batch = Searcher(spark, sidx), Searcher(spark, bidx)
    assert s_stream.stats["n_docs"] == s_batch.stats["n_docs"]
    assert s_stream.stats["total_postings"] == \
        s_batch.stats["total_postings"]
    for q in QUERIES:
        a = s_stream.search_local(q, 10)
        b = s_batch.search_local(q, 10)
        assert [x[0] for x in a] == [x[0] for x in b], q
        for (_, s1), (_, s2) in zip(a, b):
            assert abs(s1 - s2) < 1e-9, q


def test_n_finalizes_rewrite_o_total_log(spark, corpus_pdf,
                                         tmp_path_factory):
    K, N = 4, 16
    sidx = str(tmp_path_factory.mktemp("tier_sidx"))
    bidx = str(tmp_path_factory.mktemp("tier_bidx"))
    pdf = corpus_pdf.copy().reset_index(drop=True).head(160)
    pdf["doc_id"] = range(len(pdf))
    per = len(pdf) // N

    written = 0                 # Σ postings of every run ever created
    delta_only = 0              # finalizes that read nothing but partials
    prev_runs: dict[str, int] = {}
    for w in range(N):
        _write_group(spark, sidx, pdf.iloc[w * per:(w + 1) * per], w)
        r = finalize_segments(spark, sidx, num_shards=NUM_SHARDS,
                              tier_factor=K)
        assert r["merged_groups"] == [f"group=stream_{w:04d}"]
        runs = _run_postings_map(sidx)
        written += sum(p for name, p in runs.items()
                       if name not in prev_runs)
        prev_runs = runs
        if all("/partials/" in f for f in r["input_files"]):
            delta_only += 1

    total = Searcher(spark, sidx).stats["total_postings"]
    # tiered bound: every posting is rewritten once per level it passes
    # through — ≤ (1 + ceil(log_K N)) times (deltas are near-equal here)
    assert written <= total * (1 + math.ceil(math.log(N, K)) + 1), \
        (written, total)
    # and clearly below the single-tier cost N·total/2 (old design)
    assert written < total * N / 4, (written, total)
    # bounded live run count; most finalizes read only their delta
    assert len(prev_runs) <= 2 * K
    assert delta_only >= N // 2, delta_only

    build_index(spark, spark.createDataFrame(pdf), bidx,
                BuildConfig(num_shards=NUM_SHARDS, tokenize_groups=2,
                            shard_batches=1))
    _assert_matches_batch(spark, sidx, bidx)


def test_finalize_crash_between_rename_and_state_commit(
        spark, corpus_pdf, tmp_path_factory, monkeypatch):
    """Round-4 ADVICE #2: the run dir is renamed in, then the crash hits
    before the state commit. The retry must detect the durable run via the
    intent's generation id and roll forward — NOT re-merge the delta
    (which would double postings/df for those docs)."""
    from deluge_spark.index import manifest as manifest_mod

    sidx = str(tmp_path_factory.mktemp("tcrash_sidx"))
    bidx = str(tmp_path_factory.mktemp("tcrash_bidx"))
    pdf = corpus_pdf.copy().reset_index(drop=True).head(80)
    pdf["doc_id"] = range(len(pdf))

    _write_group(spark, sidx, pdf.iloc[:40], 0)
    finalize_segments(spark, sidx, num_shards=NUM_SHARDS)

    real_commit = manifest_mod.Manifest.commit

    def boom(self, unit, *a, **k):
        if unit == "stream_state":
            raise RuntimeError("injected crash before state commit")
        return real_commit(self, unit, *a, **k)

    _write_group(spark, sidx, pdf.iloc[40:], 1)
    monkeypatch.setattr(manifest_mod.Manifest, "commit", boom)
    with pytest.raises(RuntimeError, match="injected"):
        finalize_segments(spark, sidx, num_shards=NUM_SHARDS)
    monkeypatch.setattr(manifest_mod.Manifest, "commit", real_commit)
    # crashed state: the run dir exists, the intent is open
    it = Manifest(sidx).get("stream_intent")
    assert it and not it.get("done")
    assert os.path.exists(os.path.join(sidx, "segments", it["out"]))

    r = finalize_segments(spark, sidx, num_shards=NUM_SHARDS)  # roll forward
    assert r["merged_groups"] == []        # delta NOT merged a second time
    assert Manifest(sidx).get("stream_intent")["done"]

    build_index(spark, spark.createDataFrame(pdf), bidx,
                BuildConfig(num_shards=NUM_SHARDS, tokenize_groups=2,
                            shard_batches=1))
    _assert_matches_batch(spark, sidx, bidx)


def test_legacy_single_tier_migrates_as_one_run(spark, corpus_pdf,
                                                tmp_path_factory):
    sidx = str(tmp_path_factory.mktemp("leg_sidx"))
    bidx = str(tmp_path_factory.mktemp("leg_bidx"))
    pdf = corpus_pdf.copy().reset_index(drop=True).head(90)
    pdf["doc_id"] = range(len(pdf))

    _write_group(spark, sidx, pdf.iloc[:60], 0)
    finalize_segments(spark, sidx, num_shards=NUM_SHARDS)
    # reshape to the pre-tiering layout: one batch=stream tier, no state
    os.rename(os.path.join(sidx, "segments", "batch=stream_r0"),
              os.path.join(sidx, "segments", "batch=stream"))
    os.remove(os.path.join(sidx, "manifest", "stream_state.json"))
    gpath = os.path.join(sidx, "stats", "global.json")
    with open(gpath) as f:
        glob = json.load(f)
    glob["segment_batches"] = ["batch=stream"]
    with open(gpath, "w") as f:
        json.dump(glob, f)

    _write_group(spark, sidx, pdf.iloc[60:], 1)
    r = finalize_segments(spark, sidx, num_shards=NUM_SHARDS)
    assert r["merged_groups"] == ["group=stream_0001"]
    # the legacy tier was adopted as a run, not re-read for the delta
    assert "batch=stream" in r["runs"]
    assert all("/partials/" in f for f in r["input_files"])

    build_index(spark, spark.createDataFrame(pdf), bidx,
                BuildConfig(num_shards=NUM_SHARDS, tokenize_groups=2,
                            shard_batches=1))
    _assert_matches_batch(spark, sidx, bidx)


def test_gc_groups_releases_partials_results_hold(spark, corpus_pdf,
                                                  tmp_path_factory):
    """gc_groups deletes compacted partial groups (steady-state storage
    halves); searches stay identical and later waves finalize normally."""
    sidx = str(tmp_path_factory.mktemp("gc_sidx"))
    bidx = str(tmp_path_factory.mktemp("gc_bidx"))
    pdf = corpus_pdf.copy().reset_index(drop=True).head(90)
    pdf["doc_id"] = range(len(pdf))

    _write_group(spark, sidx, pdf.iloc[:45], 0)
    r1 = finalize_segments(spark, sidx, num_shards=NUM_SHARDS,
                           gc_groups=True)
    assert r1["gc_groups"] == ["group=stream_0000"]
    partials = os.path.join(sidx, "partials")
    assert not any(d.startswith("group=") for d in os.listdir(partials))

    _write_group(spark, sidx, pdf.iloc[45:], 1)
    r2 = finalize_segments(spark, sidx, num_shards=NUM_SHARDS,
                           gc_groups=True)
    assert r2["merged_groups"] == ["group=stream_0001"]
    # (n_docs counts docs with tokens — the fixture plants empty docs;
    # exact equality with the batch build is asserted below)
    assert r2["n_docs"] > r1["n_docs"]

    build_index(spark, spark.createDataFrame(pdf), bidx,
                BuildConfig(num_shards=NUM_SHARDS, tokenize_groups=2,
                            shard_batches=1))
    _assert_matches_batch(spark, sidx, bidx)


def test_first_finalize_crash_preserves_num_shards(spark, corpus_pdf,
                                                   tmp_path_factory,
                                                   monkeypatch):
    """Self-review (r5): a crash during the VERY FIRST finalize (no prior
    state commit) must not recover into a state claiming num_shards=0 —
    the intent carries num_shards. The retry runs WITHOUT an explicit
    num_shards and with no new groups (nothing left to infer from)."""
    from deluge_spark.index import manifest as manifest_mod

    sidx = str(tmp_path_factory.mktemp("ns_sidx"))
    pdf = corpus_pdf.copy().reset_index(drop=True).head(40)
    pdf["doc_id"] = range(len(pdf))
    _write_group(spark, sidx, pdf, 0)

    real_commit = manifest_mod.Manifest.commit

    def boom(self, unit, *a, **k):
        if unit == "stream_state":
            raise RuntimeError("injected crash before state commit")
        return real_commit(self, unit, *a, **k)

    monkeypatch.setattr(manifest_mod.Manifest, "commit", boom)
    with pytest.raises(RuntimeError, match="injected"):
        finalize_segments(spark, sidx, num_shards=NUM_SHARDS)
    monkeypatch.setattr(manifest_mod.Manifest, "commit", real_commit)

    r = finalize_segments(spark, sidx)          # no explicit num_shards
    assert r["merged_groups"] == []             # rolled forward, not redone
    assert r["num_shards"] == NUM_SHARDS
    assert Searcher(spark, sidx).stats["num_shards"] == NUM_SHARDS


def test_stream_cli_ingest_finalize_search(spark, corpus_pdf,
                                           tmp_path_factory):
    """CLI e2e for the streaming surface: stream-ingest --finalize drains
    an arriving-files dir into searchable runs; a second wave goes through
    stream-finalize; search answers through the CLI."""
    import subprocess
    import sys

    def run(*args):
        p = subprocess.run(
            [sys.executable, "-m", "deluge_spark.cli", *args],
            capture_output=True, text=True, timeout=600)
        assert p.returncode == 0, p.stderr[-3000:]
        return [json.loads(ln) for ln in p.stdout.splitlines()
                if ln.startswith("{")]

    src = str(tmp_path_factory.mktemp("cli_stream_src"))
    sidx = str(tmp_path_factory.mktemp("cli_stream_idx"))
    pdf = corpus_pdf.copy().reset_index(drop=True).head(80)
    pdf["doc_id"] = range(len(pdf))
    schema = ("repo string, path string, commit string, lang string, "
              "content string, doc_id long")

    spark.createDataFrame(pdf.iloc[:50]).repartition(8).write.mode(
        "overwrite").parquet(src)
    out1 = run("stream-ingest", "--source", src, "--index", sidx,
               "--schema", schema, "--shards", str(NUM_SHARDS),
               "--finalize", "--gc-groups")[-1]
    assert out1["merged_groups"] and out1["num_shards"] == NUM_SHARDS

    spark.createDataFrame(pdf.iloc[50:]).repartition(4).write.mode(
        "append").parquet(src)
    run("stream-ingest", "--source", src, "--index", sidx,
        "--schema", schema, "--shards", str(NUM_SHARDS))
    out2 = run("stream-finalize", "--index", sidx, "--gc-groups")[-1]
    assert out2["merged_groups"]

    hits = run("search", "--index", sidx, "--query", "import return table",
               "-k", "5")
    want = Searcher(spark, sidx).search_local("import return table", 5)
    assert [(h["doc_id"], round(h["score"], 9)) for h in hits] == \
        [(d, round(s, 9)) for d, s in want]
