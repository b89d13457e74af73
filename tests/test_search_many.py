"""search_many: M queries in ONE distributed job, per-query ranking
identical to the single-query distributed path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deluge_spark.index.build import BuildConfig, build_index
from deluge_spark.index.search import Searcher
from deluge_spark.plans.admin import delete_docs

QUERIES = {
    "multi": "import return table",
    "hot": "data",
    "rare": "rareterm1",
    "pair": "buffer client error",
    "missing": "zzzabsentterm",
    "empty": "",
}


@pytest.fixture(scope="module")
def many_idx(spark, corpus_df, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("many_idx"))
    build_index(spark, corpus_df, d,
                BuildConfig(num_shards=4, tokenize_groups=2,
                            shard_batches=1))
    return d


def _by_query(df):
    out: dict[str, list[tuple[int, float]]] = {}
    for r in df.collect():
        out.setdefault(r["query"], []).append(
            (r["doc_id"], round(r["score"], 9)))
    return out


def test_search_many_matches_single_query_path(spark, many_idx):
    s = Searcher(spark, many_idx)
    got = _by_query(s.search_many(QUERIES, k=10))
    assert "missing" not in got and "empty" not in got
    for name in ("multi", "hot", "rare", "pair"):
        want = [(r["doc_id"], round(r["score"], 9)) for r in
                s.search(QUERIES[name], 10, mode="distributed").collect()]
        assert got[name] == want, name
    # ordering contract: per query, (rounded score desc, doc_id asc)
    df = s.search_many(QUERIES, k=10)
    rows = df.collect()
    assert rows == sorted(
        rows, key=lambda r: (r["query"], -round(r["score"], 9), r["doc_id"]))


def test_search_many_job_count_independent_of_m(spark, many_idx):
    """The batch path's Spark-job count (AQE stages of one scan + one
    window merge) must NOT grow with the number of queries — that is the
    whole point vs. M single-query calls."""
    s = Searcher(spark, many_idx)
    tracker = spark.sparkContext.statusTracker()

    def jobs():
        return len(tracker.getJobIdsForGroup(None) or [])

    s.search_many({"warm": "data"}, k=5).collect()  # warm AQE/codegen
    before = jobs()
    s.search_many({"one": "data"}, k=5).collect()
    one = jobs() - before
    mid = jobs()
    s.search_many(QUERIES, k=5).collect()           # 6 queries
    many = jobs() - mid
    assert many <= one + 1, f"jobs grew with M: {one} -> {many}"


def test_search_many_respects_tombstones(spark, corpus_df,
                                         tmp_path_factory):
    d = str(tmp_path_factory.mktemp("many_del"))
    build_index(spark, corpus_df, d,
                BuildConfig(num_shards=2, tokenize_groups=1,
                            shard_batches=1))
    s = Searcher(spark, d)
    base = _by_query(s.search_many({"q": "import return table"}, k=10))["q"]
    victim = base[0][0]
    delete_docs(spark, d, doc_ids=[victim])
    got = _by_query(Searcher(spark, d)
                    .search_many({"q": "import return table"}, k=10))["q"]
    assert victim not in [doc for doc, _ in got]
    assert got[:len(base) - 1] == base[1:]


def test_search_many_per_query_filters_match_single_path(spark, many_idx):
    """Round-4 VERDICT #4: per-query keyword filters in the batch path must
    reproduce the single-query distributed cogroup path exactly — including
    a mixed batch where only SOME queries are filtered."""
    s = Searcher(spark, many_idx)
    filters = {"multi": {"lang": "python"}, "hot": {"lang": "go"}}
    got = _by_query(s.search_many(QUERIES, k=10, filters=filters))
    for name in ("multi", "hot"):
        want = [(r["doc_id"], round(r["score"], 9)) for r in
                s.search(QUERIES[name], 10, filters=filters[name],
                         mode="distributed").collect()]
        assert got[name] == want, name
        assert want                      # the filter actually selects docs
    # unfiltered queries in the same batch are untouched
    for name in ("rare", "pair"):
        want = [(r["doc_id"], round(r["score"], 9)) for r in
                s.search(QUERIES[name], 10, mode="distributed").collect()]
        assert got[name] == want, name
    # a filter matching nothing yields zero rows for that query only
    got2 = _by_query(s.search_many(
        {"multi": QUERIES["multi"], "hot": QUERIES["hot"]}, k=10,
        filters={"multi": {"lang": "zz-nonexistent"}}))
    assert "multi" not in got2 and got2["hot"]

    with pytest.raises(ValueError, match="unknown query names"):
        s.search_many(QUERIES, filters={"nope": {"lang": "go"}})


def test_search_many_fetch_joins_stored_fields(spark, many_idx):
    s = Searcher(spark, many_idx)
    rows = s.search_many({"multi": QUERIES["multi"]}, k=5,
                         fetch=True).collect()
    assert rows
    assert {"query", "doc_id", "score", "repo", "path", "lang"} <= \
        set(rows[0].asDict())
    plain = {r["doc_id"]: round(r["score"], 9)
             for r in s.search_many({"multi": QUERIES["multi"]},
                                    k=5).collect()}
    assert {r["doc_id"]: round(r["score"], 9) for r in rows} == plain


def test_search_many_cli(spark, many_idx, tmp_path_factory):
    import json
    import subprocess
    import sys

    qfile = str(tmp_path_factory.mktemp("smcli") / "queries.json")
    with open(qfile, "w") as f:
        json.dump({
            "plain": QUERIES["multi"],
            "filtered": {"query": QUERIES["hot"],
                         "filters": {"lang": "go"}},
        }, f)
    p = subprocess.run(
        [sys.executable, "-m", "deluge_spark.cli", "search-many",
         "--index", many_idx, "--queries", qfile, "-k", "3"],
        capture_output=True, text=True, timeout=600)
    assert p.returncode == 0, p.stderr[-2000:]
    rows = [json.loads(ln) for ln in p.stdout.splitlines()
            if ln.startswith("{")]
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query"], []).append((r["doc_id"],
                                                round(r["score"], 9)))
    s = Searcher(spark, many_idx)
    assert by_q["plain"] == [
        (r["doc_id"], round(r["score"], 9)) for r in
        s.search(QUERIES["multi"], 3, mode="distributed").collect()]
    assert by_q["filtered"] == [
        (r["doc_id"], round(r["score"], 9)) for r in
        s.search(QUERIES["hot"], 3, filters={"lang": "go"},
                 mode="distributed").collect()]


def test_search_many_query_groups_parity(spark, many_idx):
    """query_groups changes ONLY the scoring-task granularity
    ((shard, group) keys instead of shard): results must be exactly
    identical for any G — mixed filtered/unfiltered batch, G spanning
    1 (the legacy single-group plan), a divisor, the query count, and
    over-asking (G > live queries is clamped)."""
    s = Searcher(spark, many_idx)
    filters = {"multi": {"lang": "python"}, "hot": {"lang": "go"}}
    base = _by_query(s.search_many(QUERIES, k=10, filters=filters))
    assert base
    for g in (2, 3, len(QUERIES), 64):
        got = _by_query(s.search_many(QUERIES, k=10, filters=filters,
                                      query_groups=g))
        assert got == base, f"query_groups={g}"
    # per-task parallelism actually grew: the grouped plan keys on
    # (shard, grp), so distinct scoring groups > num_shards
    grouped = s.search_many(QUERIES, k=10, query_groups=3)
    assert _by_query(grouped) == _by_query(s.search_many(QUERIES, k=10))


def test_search_many_query_groups_with_oversize_tombstones(
        spark, corpus_df, tmp_path_factory):
    """The over-cap tombstone sentinel must reach EVERY group's tasks
    (it is replicated per group) — survivor sets identical to the
    driver-broadcast path at any G."""
    d = str(tmp_path_factory.mktemp("qg_tomb"))
    build_index(spark, corpus_df, d,
                BuildConfig(num_shards=2, tokenize_groups=1,
                            shard_batches=1))
    s0 = Searcher(spark, d)
    base = _by_query(s0.search_many(QUERIES, k=10))
    victims = [doc for doc, _ in base["multi"][:2]]
    delete_docs(spark, d, doc_ids=victims)
    s_small = Searcher(spark, d, tombstone_driver_cap=1)  # forces oversize
    s_big = Searcher(spark, d)
    assert s_small._tomb_oversize and not s_big._tomb_oversize
    filters = {"hot": {"lang": "go"}}
    want = _by_query(s_big.search_many(QUERIES, k=10, filters=filters))
    for g in (1, 2, 4):
        got = _by_query(s_small.search_many(QUERIES, k=10, filters=filters,
                                            query_groups=g))
        assert got == want, f"query_groups={g}"
        hit = {doc for rows in got.values() for doc, _ in rows}
        assert not set(victims) & hit
