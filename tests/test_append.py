"""Incremental append: build on a prefix, append the rest, get an index
whose stats and EVERY search result are exactly those of a full build.

The split respects natural-key order, so the appended docs receive the
same doc_ids the full build would assign — making exact (doc_id, score)
equality the oracle, not just rank agreement.
"""

from __future__ import annotations

import pytest

from deluge_spark.index.build import BuildConfig, build_index
from deluge_spark.index.search import Searcher
from deluge_spark.operators.doc_ids import assign_doc_ids, unpersist_assigned
from deluge_spark.plans.admin import append_docs, compact_segments, index_summary

QUERIES = ["import return table", "data value", "rareterm1",
           "getHTTPResponse", "zzzabsentterm"]


@pytest.fixture(scope="module")
def split_corpus(spark, corpus_df):
    keyed = assign_doc_ids(corpus_df)
    n = keyed.count()
    n1 = int(n * 0.8)
    first = keyed.filter(f"doc_id < {n1}").toPandas()
    second = keyed.filter(f"doc_id >= {n1}").drop("doc_id").toPandas()
    unpersist_assigned(keyed)
    return (spark.createDataFrame(first),
            spark.createDataFrame(second), n)


def test_append_matches_full_build(spark, corpus_df, split_corpus,
                                   tmp_path_factory):
    first, second, n = split_corpus
    cfg = lambda: BuildConfig(num_shards=4, tokenize_groups=2,  # noqa: E731
                              shard_batches=1)

    full_dir = str(tmp_path_factory.mktemp("full_idx"))
    build_index(spark, corpus_df, full_dir, cfg())
    inc_dir = str(tmp_path_factory.mktemp("inc_idx"))
    build_index(spark, first, inc_dir, cfg())

    out = append_docs(spark, inc_dir, second)
    s_full = Searcher(spark, full_dir)
    s_inc = Searcher(spark, inc_dir)
    assert out["n_docs"] == s_full.stats["n_docs"]
    assert s_inc.stats["n_docs"] == s_full.stats["n_docs"]
    assert abs(s_inc.stats["avgdl"] - s_full.stats["avgdl"]) < 1e-9
    # identical term dictionary (df per term) — the global stats contract
    assert s_inc._df_map == s_full._df_map

    for q in QUERIES:
        assert s_inc.search_local(q, 10) == s_full.search_local(q, 10), q
    got = [(r["doc_id"], round(r["score"], 9)) for r in
           s_inc.search(QUERIES[0], 10, mode="distributed").collect()]
    want = [(r["doc_id"], round(r["score"], 9)) for r in
            s_full.search(QUERIES[0], 10, mode="distributed").collect()]
    assert got == want

    summ = index_summary(spark, inc_dir)
    assert summ["total_postings"] == \
        index_summary(spark, full_dir)["total_postings"]

    # Lucene lifecycle: compaction squashes the append batch; results hold
    compact_segments(spark, inc_dir, files_per_shard=1)
    s_c = Searcher(spark, inc_dir)
    for q in QUERIES:
        assert s_c.search_local(q, 10) == s_full.search_local(q, 10), q


def test_append_empty_is_noop(spark, corpus_df, split_corpus,
                              tmp_path_factory):
    first, second, _ = split_corpus
    d = str(tmp_path_factory.mktemp("empty_app"))
    build_index(spark, first, d,
                BuildConfig(num_shards=2, tokenize_groups=1,
                            shard_batches=1))
    n0 = Searcher(spark, d).stats["n_docs"]
    out = append_docs(spark, d, second.limit(0))
    assert out == {"appended": 0, "n_docs": n0}


def test_append_crash_rollback_then_retry(spark, corpus_df, split_corpus,
                                          tmp_path_factory, monkeypatch):
    """Review finding: a mid-append crash (docs/docs_meta already appended)
    must not duplicate docs on retry. The inflight marker rolls the index
    back to the id watermark, and the retried append converges to the
    clean result."""
    import deluge_spark.plans.admin as admin

    first, second, _ = split_corpus
    cfgf = lambda: BuildConfig(num_shards=4, tokenize_groups=2,  # noqa: E731
                               shard_batches=1)
    full_dir = str(tmp_path_factory.mktemp("crash_full"))
    build_index(spark, corpus_df, full_dir, cfgf())
    d = str(tmp_path_factory.mktemp("crash_inc"))
    build_index(spark, first, d, cfgf())

    from deluge_spark.index import build as buildmod
    real_merge = buildmod._merge_partials

    def boom(*a, **k):
        raise RuntimeError("injected append crash")

    monkeypatch.setattr(buildmod, "_merge_partials", boom)
    with pytest.raises(RuntimeError, match="injected"):
        admin.append_docs(spark, d, second)
    monkeypatch.setattr(buildmod, "_merge_partials", real_merge)

    out = admin.append_docs(spark, d, second)   # retry converges
    s_full, s_inc = Searcher(spark, full_dir), Searcher(spark, d)
    assert out["n_docs"] == s_full.stats["n_docs"]
    assert s_inc._df_map == s_full._df_map
    for q in QUERIES:
        assert s_inc.search_local(q, 10) == s_full.search_local(q, 10), q
    # docs table holds exactly one copy of every doc
    docs = spark.read.parquet(f"{d}/docs")
    assert docs.count() == docs.select("doc_id").distinct().count()
    assert docs.count() == spark.read.parquet(f"{full_dir}/docs").count()


def test_append_all_empty_docs_and_legacy_batch_list(
        spark, corpus_df, split_corpus, tmp_path_factory):
    """Review findings: (a) an append whose docs tokenize to zero terms
    must not crash on schema inference or corrupt stats; (b) a legacy
    global.json without segment_batches must fall back to the dir glob,
    not repoint the index at only the new batch."""
    import json as _json

    from deluge_spark.plans.admin import append_docs

    first, _, _ = split_corpus
    d = str(tmp_path_factory.mktemp("edge_app"))
    build_index(spark, first, d,
                BuildConfig(num_shards=2, tokenize_groups=1,
                            shard_batches=1))
    s0 = Searcher(spark, d)
    base = s0.search_local(QUERIES[0], 10)
    n0 = s0.stats["n_docs"]

    # (b) strip the authoritative batch list first — the glob fallback
    # must keep the existing segments visible through the append
    gpath = f"{d}/stats/global.json"
    with open(gpath) as f:
        glob = _json.load(f)
    del glob["segment_batches"]
    with open(gpath, "w") as f:
        _json.dump(glob, f)

    # (a) punctuation-only docs: zero tokens
    empty = spark.createDataFrame(
        [(f"r{i}", f"p{i}", "c", "en", "!!! ??? ...") for i in range(5)],
        "repo string, path string, commit string, lang string, "
        "content string")
    out = append_docs(spark, d, empty)
    assert out["appended"] == 5

    s1 = Searcher(spark, d)
    assert s1.stats["n_docs"] == n0          # no postings → n_docs holds
    assert s1.search_local(QUERIES[0], 10) == base  # old corpus intact
    with open(gpath) as f:
        assert _json.load(f)["segment_batches"]  # restored, non-empty


def test_append_aligns_to_evolved_docs_schema(spark, corpus_df,
                                              split_corpus,
                                              tmp_path_factory):
    """Review finding: appending after update_stored_fields must keep the
    docs table schema uniform — evolved columns are NULL-filled on the
    appended rows (and reported), never silently absent."""
    from deluge_spark.plans.admin import append_docs, update_stored_fields

    first, second, _ = split_corpus
    d = str(tmp_path_factory.mktemp("schema_app"))
    build_index(spark, first, d,
                BuildConfig(num_shards=2, tokenize_groups=1,
                            shard_batches=1))
    update_stored_fields(spark, d, add={"n_chars": "length(content)"})

    out = append_docs(spark, d, second)
    assert out["null_filled"] == ["n_chars"]
    docs = spark.read.parquet(f"{d}/docs")
    assert "n_chars" in docs.columns
    # filters over the evolved column still execute against appended rows
    s = Searcher(spark, d)
    s.search(QUERIES[0], 5, filters={"n_chars": "40"},
             mode="distributed").collect()


def test_append_crash_after_stats_rolls_back_stats(
        spark, corpus_df, split_corpus, tmp_path_factory, monkeypatch):
    """Round-4 ADVICE (medium): a crash AFTER the terms-table swap and the
    global.json rewrite — but before the append unit commits — must not
    let the retry merge the batch's df/cf or total_postings a second time.
    The begin marker snapshots global.json and the pre-append terms table
    is retained; rollback restores both, so the retry converges exactly to
    a clean single append."""
    import json
    import os

    import deluge_spark.plans.admin as admin
    from deluge_spark.index import manifest as manifest_mod

    first, second, _ = split_corpus
    cfgf = lambda: BuildConfig(num_shards=4, tokenize_groups=2,  # noqa: E731
                               shard_batches=1)
    full_dir = str(tmp_path_factory.mktemp("scrash_full"))
    build_index(spark, corpus_df, full_dir, cfgf())
    d = str(tmp_path_factory.mktemp("scrash_inc"))
    build_index(spark, first, d, cfgf())
    with open(os.path.join(d, "stats", "global.json")) as f:
        base_postings = json.load(f)["total_postings"]

    real_commit = manifest_mod.Manifest.commit

    def boom(self, unit, *a, **k):
        if unit.startswith("append_") and unit != "append_inflight":
            raise RuntimeError("injected crash before append unit commit")
        return real_commit(self, unit, *a, **k)

    monkeypatch.setattr(manifest_mod.Manifest, "commit", boom)
    with pytest.raises(RuntimeError, match="injected"):
        admin.append_docs(spark, d, second)
    monkeypatch.setattr(manifest_mod.Manifest, "commit", real_commit)

    # the crash landed AFTER the stats mutation (that's the window under
    # test): global.json already carries the new batch's postings
    with open(os.path.join(d, "stats", "global.json")) as f:
        crashed = json.load(f)
    assert crashed["total_postings"] > base_postings

    out = admin.append_docs(spark, d, second)   # rollback + clean retry
    s_full, s_inc = Searcher(spark, full_dir), Searcher(spark, d)
    assert out["n_docs"] == s_full.stats["n_docs"]
    # df per term NOT inflated — the exact defect this guards against
    assert s_inc._df_map == s_full._df_map
    assert s_inc.stats["total_postings"] == s_full.stats["total_postings"]
    assert abs(s_inc.stats["avgdl"] - s_full.stats["avgdl"]) < 1e-9
    for q in QUERIES:
        assert s_inc.search_local(q, 10) == s_full.search_local(q, 10), q
    docs = spark.read.parquet(f"{d}/docs")
    assert docs.count() == docs.select("doc_id").distinct().count()


def test_many_small_appends_auto_compact(spark, corpus_df,
                                         tmp_path_factory):
    """Round-4 VERDICT #2: a loop of 20 small appends must end with a
    BOUNDED batch count and bounded per-term segment rows (auto-compaction
    = Lucene merge policy), with searches identical to one full build."""
    import json
    import os

    from deluge_spark.index.build import read_segments
    from pyspark.sql import functions as F

    keyed = assign_doc_ids(corpus_df)
    pdf = (keyed.filter("doc_id < 60").toPandas()
           .sort_values("doc_id").reset_index(drop=True))
    unpersist_assigned(keyed)

    num_shards = 2
    d = str(tmp_path_factory.mktemp("autocompact"))
    full_dir = str(tmp_path_factory.mktemp("autocompact_full"))
    cfg = lambda: BuildConfig(num_shards=num_shards, tokenize_groups=1,  # noqa: E731
                              shard_batches=1)
    build_index(spark, spark.createDataFrame(pdf.iloc[:20]), d, cfg())
    build_index(spark, spark.createDataFrame(pdf), full_dir, cfg())

    compactions = 0
    for i in range(20, 60, 2):
        sl = pdf.iloc[i:i + 2].drop(columns=["doc_id"])
        out = append_docs(spark, d, spark.createDataFrame(sl),
                          auto_compact_batches=5)
        compactions += int(out["auto_compacted"])
    assert compactions >= 2          # the policy actually fired

    with open(os.path.join(d, "stats", "global.json")) as f:
        batches = json.load(f)["segment_batches"]
    assert len(batches) <= 6         # bounded, not 21
    seg = read_segments(spark, d)
    max_rows_per_term = (seg.groupBy("term").count()
                         .agg(F.max("count")).collect()[0][0])
    # per (shard, term) ≤ 1 row per live batch — compaction collapses them
    assert max_rows_per_term <= num_shards * len(batches)

    s_inc, s_full = Searcher(spark, d), Searcher(spark, full_dir)
    assert s_inc.stats["n_docs"] == s_full.stats["n_docs"]
    assert s_inc._df_map == s_full._df_map
    for q in QUERIES:
        assert s_inc.search_local(q, 10) == s_full.search_local(q, 10), q

    # amortized cost: the policy is a PARTIAL merge of the smallest
    # batches — total postings remerged across every trigger must stay far
    # below what full compaction per trigger would have rewritten
    # (compactions × total_postings)
    from deluge_spark.index.manifest import Manifest
    merged_total = sum(int(e.get("postings_merged", 0))
                       for e in Manifest(d).entries()
                       if e["unit"].startswith("merge_small_"))
    full_cost = compactions * s_full.stats["total_postings"]
    assert 0 < merged_total < 0.5 * full_cost, (merged_total, full_cost)


def test_stale_retired_terms_not_restored_by_later_rollback(
        spark, corpus_df, split_corpus, tmp_path_factory, monkeypatch):
    """Self-review (r5): a .terms_append_retired leftover from a COMPLETED
    append (crash between its done-commit and cleanup) must not be
    restored by the rollback of a LATER append that crashed before its
    stats phase — that would silently drop the completed append's df/cf.
    The leftover is cleared at the next append's begin."""
    import os
    import shutil

    import deluge_spark.plans.admin as admin

    first, second, _ = split_corpus
    cfgf = lambda: BuildConfig(num_shards=4, tokenize_groups=2,  # noqa: E731
                               shard_batches=1)
    full_dir = str(tmp_path_factory.mktemp("stale_full"))
    build_index(spark, corpus_df, full_dir, cfgf())
    d = str(tmp_path_factory.mktemp("stale_inc"))
    build_index(spark, first, d, cfgf())

    # natural-key-ordered split so the two appends assign the same ids the
    # full build would (same contract as split_corpus)
    keyed2 = assign_doc_ids(second)
    m2 = keyed2.count()
    half = spark.createDataFrame(
        keyed2.filter(f"doc_id < {m2 // 2}").drop("doc_id").toPandas())
    rest = spark.createDataFrame(
        keyed2.filter(f"doc_id >= {m2 // 2}").drop("doc_id").toPandas())
    unpersist_assigned(keyed2)
    # append_0 completes, but "crashes" between done-commit and the
    # retired-dir cleanup: recreate the leftover by snapshotting terms
    # before the append and restoring the snapshot dir afterwards
    terms = os.path.join(d, "stats", "terms")
    snap = os.path.join(d, "stats", ".terms_snapshot_for_test")
    shutil.copytree(terms, snap)
    append_docs(spark, d, half)
    shutil.move(snap, os.path.join(d, "stats", ".terms_append_retired"))

    # append_1 crashes BEFORE its stats phase (during the segment merge)
    from deluge_spark.index import build as buildmod
    real_merge = buildmod._merge_partials

    def boom(*a, **k):
        raise RuntimeError("injected append crash")

    monkeypatch.setattr(buildmod, "_merge_partials", boom)
    with pytest.raises(RuntimeError, match="injected"):
        admin.append_docs(spark, d, rest)
    monkeypatch.setattr(buildmod, "_merge_partials", real_merge)

    out = admin.append_docs(spark, d, rest)    # rollback + retry
    s_full, s_inc = Searcher(spark, full_dir), Searcher(spark, d)
    assert out["n_docs"] == s_full.stats["n_docs"]
    # append_0's df/cf survived — the exact loss this guards against
    assert s_inc._df_map == s_full._df_map
    for q in QUERIES:
        assert s_inc.search_local(q, 10) == s_full.search_local(q, 10), q


def test_merge_small_batches_direct(spark, corpus_df, split_corpus,
                                    tmp_path_factory):
    """Direct contract of the partial merge: smallest batches fold until
    ``keep`` remain, searches unchanged, repeat call is a no-op, replaced
    dirs swept."""
    import json
    import os

    from deluge_spark.plans.admin import merge_small_batches

    first, second, _ = split_corpus
    d = str(tmp_path_factory.mktemp("msb"))
    build_index(spark, first, d,
                BuildConfig(num_shards=2, tokenize_groups=1,
                            shard_batches=1))
    keyed2 = assign_doc_ids(second)
    pdf2 = keyed2.toPandas().sort_values("doc_id").reset_index(drop=True)
    unpersist_assigned(keyed2)
    third = len(pdf2) // 3
    for i in range(3):
        sl = pdf2.iloc[i * third:(i + 1) * third if i < 2 else len(pdf2)]
        append_docs(spark, d, spark.createDataFrame(
            sl.drop(columns=["doc_id"])), auto_compact_batches=None)

    s_before = Searcher(spark, d)
    before = {q: s_before.search_local(q, 10) for q in QUERIES}
    with open(os.path.join(d, "stats", "global.json")) as f:
        assert len(json.load(f)["segment_batches"]) == 4

    out = merge_small_batches(spark, d, keep=2)
    assert out["merged_batches"] == 3 and out["batches"] == 2
    with open(os.path.join(d, "stats", "global.json")) as f:
        live = json.load(f)["segment_batches"]
    assert len(live) == 2
    on_disk = {x for x in os.listdir(os.path.join(d, "segments"))
               if x.startswith("batch=")}
    assert on_disk == set(live)          # replaced dirs swept

    s_after = Searcher(spark, d)
    for q in QUERIES:
        assert s_after.search_local(q, 10) == before[q], q
    assert merge_small_batches(spark, d, keep=2)["merged_batches"] == 0
