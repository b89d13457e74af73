"""M5: resumability kill-test (SURVEY §5.4).

Build with fault injection killing the job mid-way; re-run; assert
(a) committed units are NOT re-executed (no re-tokenization),
(b) the resumed index is byte-identical in content to a clean build.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deluge_spark.index.build import (
    BuildConfig,
    FaultInjected,
    StaleIndexError,
    build_index,
    read_segments,
)
from deluge_spark.index.manifest import Manifest


def _segment_checksums(spark, index_dir):
    seg = read_segments(spark, index_dir)
    return {
        (r["shard"], r["term"]): (r["n_postings"], bytes(r["data"]))
        for r in seg.collect()
    }


def test_kill_and_resume_identical(spark, corpus_df, tmp_path_factory):
    clean_dir = str(tmp_path_factory.mktemp("idx_clean"))
    kill_dir = str(tmp_path_factory.mktemp("idx_killed"))
    cfg = BuildConfig(num_shards=4, tokenize_groups=4, shard_batches=4)

    build_index(spark, corpus_df, clean_dir, cfg)

    # killed run: 2 tokenize groups commit, then crash
    cfg_kill = BuildConfig(num_shards=4, tokenize_groups=4, shard_batches=4,
                           fail_after={"tokenize": 2})
    with pytest.raises(FaultInjected):
        build_index(spark, corpus_df, kill_dir, cfg_kill)
    man = Manifest(kill_dir)
    done = {e["unit"] for e in man.entries() if e["status"] == "done"}
    # docs stage precedes tokenize in the partials build
    assert done == {"docs", "tokenize_g0", "tokenize_g1"}

    # second crash mid-segments
    cfg_kill2 = BuildConfig(num_shards=4, tokenize_groups=4, shard_batches=4,
                            fail_after={"segments": 2})
    with pytest.raises(FaultInjected):
        build_index(spark, corpus_df, kill_dir, cfg_kill2)
    m2 = build_index(spark, corpus_df, kill_dir, cfg)  # resume to completion

    # no re-tokenization of committed groups, no rebuild of committed batches
    assert m2["retokenized_groups"] == 0
    assert m2["rebuilt_shard_batches"] == 2
    assert Manifest(kill_dir).is_sealed()

    # resumed index content-identical to the clean build
    assert _segment_checksums(spark, kill_dir) == _segment_checksums(spark, clean_dir)
    docs_a = spark.read.parquet(f"{clean_dir}/docs")
    docs_b = spark.read.parquet(f"{kill_dir}/docs")
    assert docs_a.count() == docs_b.count()
    assert (docs_a.select("doc_id", "content_sha256")
            .exceptAll(docs_b.select("doc_id", "content_sha256")).count()) == 0


def test_idempotent_rerun_is_noop(spark, corpus_df, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_noop"))
    cfg = BuildConfig(num_shards=2, tokenize_groups=2, shard_batches=1)
    build_index(spark, corpus_df, d, cfg)
    m = build_index(spark, corpus_df, d, cfg)
    assert m["retokenized_groups"] == 0
    assert m["rebuilt_shard_batches"] == 0


def test_legacy_fingerprint_auto_migrates(spark, corpus_df, tmp_path_factory):
    """r3 ADVICE: round 3 changed the fingerprint encoding (files list →
    sha digest); a manifest written under the OLD encoding for the SAME
    corpus must resume as a no-op (entries rewritten in place), not raise
    StaleIndexError over a format change."""
    import json as _json
    import os

    d = str(tmp_path_factory.mktemp("idx_legacy"))
    cfg = BuildConfig(num_shards=2, tokenize_groups=2, shard_batches=1)
    build_index(spark, corpus_df, d, cfg)

    # rewrite every manifest entry with the round-2 legacy encoding
    files = sorted(corpus_df.inputFiles())[:64]
    legacy = _json.dumps({"schema": corpus_df.schema.simpleString(),
                          "files": files})[:4000]
    mdir = os.path.join(d, "manifest")
    for name in os.listdir(mdir):
        if not name.endswith(".json"):
            continue
        p = os.path.join(mdir, name)
        with open(p) as f:
            e = _json.load(f)
        if e.get("fingerprint"):
            e["fingerprint"] = legacy
            with open(p, "w") as f:
                _json.dump(e, f)

    m = build_index(spark, corpus_df, d, cfg)   # overwrite_stale=False
    assert m["retokenized_groups"] == 0
    assert m["rebuilt_shard_batches"] == 0

    # a genuinely different corpus under legacy encoding still trips the gate
    for name in os.listdir(mdir):
        if name.endswith(".json"):
            p = os.path.join(mdir, name)
            with open(p) as f:
                e = _json.load(f)
            if e.get("fingerprint"):
                e["fingerprint"] = _json.dumps(
                    {"schema": "struct<other:int>", "files": ["x"]})
                with open(p, "w") as f:
                    _json.dump(e, f)
    with pytest.raises(StaleIndexError, match="overwrite_stale"):
        build_index(spark, corpus_df, d, cfg)


def test_fingerprint_change_invalidates(spark, corpus_df, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_fp"))
    cfg = BuildConfig(num_shards=2, tokenize_groups=2, shard_batches=1)
    build_index(spark, corpus_df, d, cfg)
    # different source (schema change) → fingerprint differs → the build
    # must NOT silently wipe a possibly expensive index: it raises unless
    # the caller explicitly opts in with overwrite_stale=True
    changed = corpus_df.withColumn("extra", F.lit(1))
    with pytest.raises(StaleIndexError, match="overwrite_stale"):
        build_index(spark, changed, d, cfg)
    # … and the original index is untouched by the refused build
    assert Manifest(d).is_sealed()
    cfg_ow = BuildConfig(num_shards=2, tokenize_groups=2, shard_batches=1,
                         overwrite_stale=True)
    m = build_index(spark, changed, d, cfg_ow)
    assert m["retokenized_groups"] == 2
