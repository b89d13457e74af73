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
