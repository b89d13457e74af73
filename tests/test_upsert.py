"""Document update by re-ingest (upsert) + Searcher.refresh.

Upsert = tombstone every live doc matching the new corpus's natural keys,
then append the new versions — the reference's point-at-changed-files
workflow / ES overwrite-by-_id, composed from the two crash-safe
primitives. refresh() makes all of it visible on an already-open handle.
"""

from __future__ import annotations

import pytest

from deluge_spark.index.build import BuildConfig, build_index
from deluge_spark.index.search import Searcher
from deluge_spark.plans.admin import purge_deleted, upsert_docs


@pytest.fixture()
def small_known_index(spark, tmp_path_factory):
    rows = [(f"org/r{i}", f"src/p{i}.py", "c0", "python",
             f"alpha shared text oldmarker{i}") for i in range(30)]
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string")
    d = str(tmp_path_factory.mktemp("ups_idx"))
    build_index(spark, corpus, d,
                BuildConfig(num_shards=2, tokenize_groups=1,
                            shard_batches=1))
    return d, rows


def test_upsert_replaces_matching_docs(spark, small_known_index):
    d, rows = small_known_index
    s = Searcher(spark, d, cache_stats=True, term_cache_size=64)
    assert len(s.search_local("oldmarker5", 10)) == 1
    assert len(s.search_local("shared", 50)) == 30

    updated = spark.createDataFrame(
        [(rows[5][0], rows[5][1], "c1", "python",
          "alpha shared text newmarker"),
         (rows[7][0], rows[7][1], "c1", "python",
          "alpha shared text newmarker")],
        "repo string, path string, commit string, lang string, "
        "content string")
    out = upsert_docs(spark, d, updated)
    assert out["replaced"] == 2 and out["appended"] == 2

    # refresh() surfaces the update on the SAME open handle (stats, term
    # dictionary, tombstones, term-LRU all reloaded)
    s.refresh()
    assert s.search_local("oldmarker5", 10) == []
    assert s.search_local("oldmarker7", 10) == []
    assert len(s.search_local("newmarker", 10)) == 2
    assert len(s.search_local("oldmarker4", 10)) == 1   # untouched doc
    # one live version per doc: old copies tombstoned, new ones appended
    assert len(s.search_local("shared", 50)) == 30

    # purge reclaims the old versions physically
    purged = purge_deleted(spark, d)
    assert purged["purged"] == 2
    s2 = Searcher(spark, d)
    assert s2.stats["n_docs"] == 30
    assert len(s2.search_local("shared", 50)) == 30
    assert s2.search_local("oldmarker5", 10) == []


def test_upsert_pure_insert_and_bad_keys(spark, small_known_index):
    d, _ = small_known_index
    brand_new = spark.createDataFrame(
        [("org/new", "src/new.py", "c0", "python",
          "alpha shared text freshdoc")],
        "repo string, path string, commit string, lang string, "
        "content string")
    out = upsert_docs(spark, d, brand_new)   # no key matches: pure insert
    assert out["replaced"] == 0 and out["appended"] == 1
    assert len(Searcher(spark, d).search_local("freshdoc", 5)) == 1

    with pytest.raises(ValueError, match="key columns"):
        upsert_docs(spark, d, brand_new, key_cols=("repo", "nope"))


def test_upsert_cli(spark, small_known_index, tmp_path_factory):
    import json
    import subprocess
    import sys

    d, rows = small_known_index
    changed = str(tmp_path_factory.mktemp("ups_cli_src"))
    (spark.createDataFrame(
        [(rows[3][0], rows[3][1], "c9", "python",
          "alpha shared text climarker")],
        "repo string, path string, commit string, lang string, "
        "content string").write.mode("overwrite").parquet(changed))
    p = subprocess.run(
        [sys.executable, "-m", "deluge_spark.cli", "--cores", "4",
         "upsert", "--index", d, "--corpus", changed],
        capture_output=True, text=True, timeout=600, cwd="/root/repo")
    assert p.returncode == 0, p.stderr[-2000:]
    out = [json.loads(ln) for ln in p.stdout.splitlines()
           if ln.startswith("{")][-1]
    assert out["replaced"] == 1 and out["appended"] == 1
    s = Searcher(spark, d)
    assert len(s.search_local("climarker", 5)) == 1
    assert s.search_local("oldmarker3", 5) == []


def test_full_lifecycle_chain(spark, tmp_path_factory):
    """Capstone: every lifecycle op in one chain on one index — build →
    append → upsert → update-mapping → delete → purge → compact → reindex
    — with invariants checked at each step. Guards cross-feature
    interactions none of the per-op tests exercise together."""
    from deluge_spark.plans.admin import (
        append_docs,
        compact_segments,
        delete_docs,
        index_summary,
        purge_deleted,
        reindex,
        update_stored_fields,
        upsert_docs,
    )

    mk = lambda i, v: (f"org/r{i}", f"p{i}.py", f"c{v}", "python",  # noqa: E731
                       f"gamma corpus text v{v}marker doc{i}")
    schema = ("repo string, path string, commit string, lang string, "
              "content string")
    d = str(tmp_path_factory.mktemp("lifecycle"))
    build_index(spark, spark.createDataFrame([mk(i, 0) for i in range(20)],
                                             schema),
                d, BuildConfig(num_shards=2, tokenize_groups=1,
                               shard_batches=1))

    out = append_docs(spark, d, spark.createDataFrame(
        [mk(i, 0) for i in range(20, 30)], schema))
    assert out["n_docs"] == 30

    out = upsert_docs(spark, d, spark.createDataFrame(
        [mk(3, 1), mk(25, 1)], schema))          # one per segment batch
    assert out["replaced"] == 2

    update_stored_fields(spark, d, add={"n_chars": "length(content)"})

    assert delete_docs(spark, d, where="path = 'p10.py'")["deleted"] == 1

    s = Searcher(spark, d)
    assert len(s.search_local("v1marker", 10)) == 2
    assert s.search_local("doc10", 10) == []
    assert len(s.search_local("gamma", 50)) == 30 - 1  # 29 live docs

    purged = purge_deleted(spark, d)
    assert purged["purged"] == 3                 # 2 upsert-replaced + 1
    assert purged["n_docs"] == 29

    compact_segments(spark, d, files_per_shard=1)
    s2 = Searcher(spark, d)
    assert len(s2.search_local("gamma", 50)) == 29
    assert len(s2.search_local("v1marker", 10)) == 2
    # evolved column survived purge?  NOTE: purge rewrites docs via
    # reindex, which projects the live docs schema — n_chars must persist
    docs_cols = spark.read.parquet(f"{d}/docs").columns
    assert "n_chars" in docs_cols

    out_dir = str(tmp_path_factory.mktemp("lifecycle_re"))
    reindex(spark, d, out_dir, BuildConfig(num_shards=3))
    s3 = Searcher(spark, out_dir)
    assert len(s3.search_local("gamma", 50)) == 29
    assert index_summary(spark, out_dir)["n_docs"] == 29


def test_upsert_retry_after_mid_append_crash(spark, small_known_index,
                                             monkeypatch):
    """Review finding: a crashed upsert (append died after docs rows were
    written) must NOT tombstone the ids the rolled-back re-append reuses —
    the retry rolls back FIRST, then key-matches. The upserted docs stay
    visible and survive purge."""
    from deluge_spark.index import build as buildmod
    from deluge_spark.plans.admin import purge_deleted

    d, rows = small_known_index
    upd = spark.createDataFrame(
        [(rows[5][0], rows[5][1], "c1", "python",
          "alpha shared text crashver")],
        "repo string, path string, commit string, lang string, "
        "content string")

    real_merge = buildmod._merge_partials

    def boom(*a, **k):
        raise RuntimeError("injected upsert crash")

    monkeypatch.setattr(buildmod, "_merge_partials", boom)
    with pytest.raises(RuntimeError, match="injected"):
        upsert_docs(spark, d, upd)
    monkeypatch.setattr(buildmod, "_merge_partials", real_merge)

    out = upsert_docs(spark, d, upd)            # retry converges
    # the first attempt's tombstone already committed (idempotent delete),
    # so the retry legitimately reports replaced=0; what matters is the
    # re-append lands and its ids are NOT tombstoned
    assert out["appended"] == 1 and out["replaced"] in (0, 1)
    s = Searcher(spark, d)
    assert len(s.search_local("crashver", 5)) == 1
    assert s.search_local("oldmarker5", 5) == []
    purge_deleted(spark, d)
    s2 = Searcher(spark, d)
    assert len(s2.search_local("crashver", 5)) == 1   # new version LIVE
    assert len(s2.search_local("shared", 50)) == 30


def test_upsert_rejects_bad_inputs(spark, small_known_index):
    d, rows = small_known_index
    schema = ("repo string, path string, commit string, lang string, "
              "content string")
    dup = spark.createDataFrame(
        [(rows[2][0], rows[2][1], "c1", "python", "dup one"),
         (rows[2][0], rows[2][1], "c2", "python", "dup two")], schema)
    with pytest.raises(ValueError, match="duplicate"):
        upsert_docs(spark, d, dup)
    with pytest.raises(ValueError, match="non-empty"):
        upsert_docs(spark, d, dup.limit(1), key_cols=())
