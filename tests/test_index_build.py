"""M2/M3: full index build + three-way query agreement + invariants."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from deluge_spark.functions.tokenizer import tokenize_py
from deluge_spark.index.build import (
    BuildConfig,
    build_index,
    read_global_stats,
    read_segments,
)
from deluge_spark.index.search import Searcher

from tests.oracle import OracleIndex, reference_queries


@pytest.fixture(scope="module")
def index_dir(spark, corpus_df, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("index"))
    build_index(spark, corpus_df, d,
                BuildConfig(num_shards=4, tokenize_groups=3, shard_batches=2))
    return d


@pytest.fixture(scope="module")
def oracle(spark, index_dir):
    docs = spark.read.parquet(f"{index_dir}/docs")
    return OracleIndex({r["doc_id"]: r["content"]
                        for r in docs.select("doc_id", "content").collect()})


def test_sha256_invariant(spark, corpus_df, index_dir):
    """north rule: per-row content sha256 equality vs the source table."""
    docs = spark.read.parquet(f"{index_dir}/docs")
    src = corpus_df.select(
        "repo", "path", "commit", F.sha2("content", 256).alias("src_sha"))
    joined = docs.join(src, ["repo", "path", "commit"])
    assert joined.count() == corpus_df.count() == docs.count()
    assert joined.filter(F.col("content_sha256") != F.col("src_sha")).count() == 0
    # and in python, independent of Spark's sha2:
    row = docs.select("content", "content_sha256").first()
    assert hashlib.sha256(row["content"].encode()).hexdigest() == row["content_sha256"]


def test_index_invariants(spark, index_dir, oracle):
    seg = read_segments(spark, index_dir)
    stats = read_global_stats(index_dir)
    docs = spark.read.parquet(f"{index_dir}/docs")
    # N == docs with ≥1 token; avgdl matches oracle
    assert stats["n_docs"] == oracle.n
    assert stats["avgdl"] == pytest.approx(oracle.avgdl, rel=1e-12)
    # sum(df_local) per term == oracle df; total postings == vocabulary mass
    df_by_term = {r["term"]: r["df"] for r in
                  spark.read.parquet(f"{index_dir}/stats/terms").collect()}
    assert df_by_term == dict(oracle.df)
    # every posting doc_id exists in docs and lands in its shard
    n_shards = stats["num_shards"]
    bad = (seg.select("shard", F.explode("block_first").alias("d"))
           .filter(F.pmod("d", F.lit(n_shards)) != F.col("shard")).count())
    assert bad == 0
    meta = spark.read.parquet(f"{index_dir}/docs_meta")
    assert meta.count() == stats["n_docs"]
    # meta dl matches the oracle's per-doc token counts
    got_dl = {r["doc_id"]: r["dl"] for r in meta.collect()}
    assert got_dl == dict(oracle.dl)


@pytest.mark.parametrize("q", reference_queries(), ids=lambda q: q["query"])
def test_three_way_agreement(spark, index_dir, oracle, q):
    s = Searcher(spark, index_dir)
    terms = tokenize_py(q["query"], "code")
    want = oracle.top_k(terms, q["k"], round_dp=9)
    got_coord = s.search(q["query"], q["k"], mode="coordinator").collect()
    got_dist = s.search(q["query"], q["k"], mode="distributed").collect()
    got_df = s.search_dataframe(q["query"], q["k"]).collect()
    for name, got in [("coordinator", got_coord), ("distributed", got_dist),
                      ("dataframe", got_df)]:
        assert [r.doc_id for r in got] == [d for d, _ in want], name
        for r, (_, sc) in zip(got, want):
            assert r.score == pytest.approx(sc, rel=1e-6), name


def test_keyword_filter(spark, index_dir, oracle):
    s = Searcher(spark, index_dir)
    docs = spark.read.parquet(f"{index_dir}/docs")
    py_ids = {r["doc_id"] for r in
              docs.filter(F.col("lang") == "python").select("doc_id").collect()}
    want = oracle.top_k(["import", "return"], 10, filter_ids=py_ids, round_dp=9)
    got = s.search("import return", 10, filters={"lang": "python"}).collect()
    assert [r.doc_id for r in got] == [d for d, _ in want]
    got_df = s.search_dataframe("import return", 10,
                                filters={"lang": "python"}).collect()
    assert [r.doc_id for r in got_df] == [d for d, _ in want]


def test_keyword_filter_distributed_no_driver_cap(spark, index_dir, oracle):
    """A filter selecting far more ids than filter_ids_cap must still work:
    auto mode falls back to the distributed cogroup path (executor-side
    allowed sets), and explicit distributed mode never touches the cap."""
    docs = spark.read.parquet(f"{index_dir}/docs")
    py_ids = {r["doc_id"] for r in
              docs.filter(F.col("lang") == "python").select("doc_id").collect()}
    assert len(py_ids) > 5
    s = Searcher(spark, index_dir, filter_ids_cap=5)
    want = oracle.top_k(["import", "return"], 10, filter_ids=py_ids, round_dp=9)
    for mode in ("auto", "distributed"):
        got = s.search("import return", 10, filters={"lang": "python"},
                       mode=mode).collect()
        assert [r.doc_id for r in got] == [d for d, _ in want], mode
    # coordinator requested explicitly → the cap must still guard the driver
    with pytest.raises(ValueError, match="coordinator"):
        s.search("import return", 10, filters={"lang": "python"},
                 mode="coordinator").collect()


def test_auto_mode_decides_without_spark_job(spark, index_dir):
    """mode='auto' derives matched-posting volume from the driver-cached
    dictionary: a coordinator-auto search runs exactly ONE job (the segment
    fetch), not an extra sum(n_postings) aggregate."""
    s = Searcher(spark, index_dir, cache_stats=True)  # dict pulled here
    tracker = spark.sparkContext.statusTracker()

    def _jobs(group: str, mode: str) -> int:
        spark.sparkContext.setJobGroup(group, mode)
        try:
            s.search("import return", 10, mode=mode)  # eager jobs only
        finally:
            spark.sparkContext.setJobGroup("", "")
        return len(tracker.getJobIdsForGroup(group) or [])

    n_coord = _jobs("probe_coord", "coordinator")
    n_auto = _jobs("probe_auto", "auto")
    assert n_auto <= n_coord, (
        f"auto mode ran {n_auto} jobs vs {n_coord} for explicit coordinator "
        "— the mode decision must not launch its own aggregate job")


@pytest.mark.parametrize("q", reference_queries(), ids=lambda q: q["query"])
def test_taat_matches_wand(spark, index_dir, oracle, q):
    """The vectorized exhaustive scorer must rank identically to block-max
    WAND (and hence the oracle) — scores exact to float tolerance."""
    s = Searcher(spark, index_dir)
    want = oracle.top_k(tokenize_py(q["query"], "code"), q["k"], round_dp=9)
    got = s.search_local(q["query"], q["k"], algo="taat")
    assert [d for d, _ in got] == [d for d, _ in want]
    for (d1, s1), (_, s2) in zip(got, want):
        assert s1 == pytest.approx(s2, rel=1e-9)
    auto = s.search_local(q["query"], q["k"], algo="auto")
    assert auto == got


def test_taat_with_filter(spark, index_dir, oracle):
    s = Searcher(spark, index_dir)
    docs = spark.read.parquet(f"{index_dir}/docs")
    py_ids = {r["doc_id"] for r in
              docs.filter(F.col("lang") == "python").select("doc_id").collect()}
    want = oracle.top_k(["import", "return"], 10, filter_ids=py_ids, round_dp=9)
    got = s.search_local("import return", 10, filters={"lang": "python"},
                         algo="taat")
    assert [d for d, _ in got] == [d for d, _ in want]


def test_term_cache_identical_results_and_zero_job_hits(spark, index_dir):
    """The driver-side term LRU must never change results (including under
    eviction churn with cache smaller than the query) and a fully-cached
    query must run without any Spark job."""
    plain = Searcher(spark, index_dir, term_cache_size=0)
    cached = Searcher(spark, index_dir, term_cache_size=2)
    queries = ["import return table", "getHTTPResponse", "import return",
               "rareterm0 import", "import return table"]  # churn + repeats
    for q in queries:
        assert cached.search_local(q, 10) == plain.search_local(q, 10), q
    # warm exactly one query's terms, then re-ask: zero jobs
    big = Searcher(spark, index_dir, term_cache_size=8)
    big.search_local("import return", 10)
    want = plain.search_local("import return", 10)
    tracker = spark.sparkContext.statusTracker()
    spark.sparkContext.setJobGroup("cache_probe", "cached repeat")
    try:
        got = big.search_local("import return", 10)
    finally:
        spark.sparkContext.setJobGroup("", "")
    assert got == want
    assert len(tracker.getJobIdsForGroup("cache_probe") or []) == 0


def test_fetch_fields(spark, index_dir):
    s = Searcher(spark, index_dir)
    got = s.search("rareterm0", 5, fetch=True).collect()
    assert got and set(got[0].asDict()) >= {"doc_id", "score", "repo", "path", "lang"}


def test_hot_term_split_across_shards(spark, index_dir):
    """The skew test (SURVEY §5.5): a >50%-df term must be spread over all
    shards with no shard owning a disproportionate share."""
    seg = read_segments(spark, index_dir)
    rows = seg.filter(F.col("term") == "import").select(
        "shard", "df_local").collect()
    stats = read_global_stats(index_dir)
    assert len(rows) == stats["num_shards"]
    counts = [r["df_local"] for r in rows]
    assert max(counts) <= 2 * (sum(counts) / len(counts))


def test_taat_cap_single_source(spark, index_dir):
    """r3 VERDICT task #7: the TAAT/WAND switch point lives in ONE place —
    Searcher.taat_cap — honored by both the coordinator path and the
    distributed per-shard pick, and rankings agree on either side of it."""
    from deluge_spark.index.search import Searcher as S

    s_wand = S(spark, index_dir, taat_cap=0)       # force WAND
    s_taat = S(spark, index_dir, taat_cap=10**12)  # force TAAT
    s_def = S(spark, index_dir)
    assert s_def.taat_cap == S.DEFAULT_TAAT_CAP
    for q in ("import return", "getHTTPResponse"):
        got_w = s_wand.search_local(q, 10)
        got_t = s_taat.search_local(q, 10)
        # rank-identical; exact scores agree to float-summation-order
        # tolerance (range-at-a-time WAND sums a doc's term contributions
        # in chunk order, TAAT in row order — same contract as the fuzz
        # suite's cross-algo check)
        assert [d for d, _ in got_w] == [d for d, _ in got_t]
        for (_, s1), (_, s2) in zip(got_w, got_t):
            assert s1 == pytest.approx(s2, rel=1e-12)


def test_typed_filters_terms_in_and_range(spark, index_dir, oracle):
    """ES filter-context grammar: terms (IN) + range specs resolve through
    every mode and match the brute-force oracle with the same id set."""
    s = Searcher(spark, index_dir)
    rows = spark.read.parquet(f"{index_dir}/docs").select(
        "doc_id", "lang", "path").collect()
    in_ids = {r["doc_id"] for r in rows if r["lang"] in ("go", "java")}
    want = oracle.top_k(["import", "return"], 10, filter_ids=in_ids,
                        round_dp=9)
    got = s.search("import return", 10, filters={"lang": ["go", "java"]},
                   mode="distributed").collect()
    assert [r.doc_id for r in got] == [d for d, _ in want]

    # range over a lexicographic field, conjoined with a term filter
    rng_ids = {r["doc_id"] for r in rows
               if r["lang"] == "python" and "src/pkg1" <= r["path"] < "src/pkg4"}
    want = oracle.top_k(["import", "return"], 10, filter_ids=rng_ids,
                        round_dp=9)
    got = s.search("import return", 10,
                   filters={"lang": "python",
                            "path": {"gte": "src/pkg1", "lt": "src/pkg4"}},
                   mode="distributed").collect()
    assert [r.doc_id for r in got] == [d for d, _ in want]
    # dataframe mode shares the same condition builder
    got_df = s.search_dataframe(
        "import return", 10,
        filters={"lang": "python",
                 "path": {"gte": "src/pkg1", "lt": "src/pkg4"}}).collect()
    assert [r.doc_id for r in got_df] == [d for d, _ in want]

    with pytest.raises(ValueError, match="empty range"):
        Searcher._filter_cond({"path": {}})
    with pytest.raises(ValueError, match="unknown range operator"):
        Searcher._filter_cond({"path": {"between": 1}})


def test_cli_filter_grammar():
    from deluge_spark.cli import _parse_filters
    assert _parse_filters([]) is None
    assert _parse_filters(["lang=go"]) == {"lang": "go"}
    assert _parse_filters(["lang=go,java"]) == {"lang": ["go", "java"]}
    assert _parse_filters(["n_chars>=200", "n_chars<700"]) == {
        "n_chars": {"gte": 200, "lt": 700}}
    assert _parse_filters(["score>1.5"]) == {"score": {"gt": 1.5}}
    import pytest as p
    with p.raises(SystemExit):
        _parse_filters(["lang=go", "lang>=a"])
    with p.raises(SystemExit):
        _parse_filters(["nonsense"])
