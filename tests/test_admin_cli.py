from __future__ import annotations

import json
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from deluge_spark.index.build import BuildConfig, build_index
from deluge_spark.index.search import Searcher
from deluge_spark.plans.admin import (
    format_bytes,
    index_summary,
    reindex,
    summarize_source,
)


@pytest.fixture(scope="module")
def small_index(spark, corpus_df, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("admin_idx"))
    build_index(spark, corpus_df, d, BuildConfig(num_shards=4,
                                                 tokenize_groups=2,
                                                 shard_batches=1))
    return d


def test_format_bytes():
    assert format_bytes(512) == "512B"
    assert format_bytes(20 * 1024 * 1024) == "20.0MB"


def test_summarize_source(spark, corpus_df):
    s = summarize_source(corpus_df)
    assert s["docs"] == corpus_df.count()
    assert s["bytes"] > 0 and "docs" in s["pretty"]


def test_index_summary(spark, small_index):
    s = index_summary(spark, small_index)
    assert s["sealed"] is True
    assert s["num_shards"] == 4 and len(s["shards"]) == 4
    assert s["total_postings"] == sum(v["postings"] for v in s["shards"].values())
    assert s["vocabulary"] > 0 and s["index_bytes"] > 0


def test_reindex_preserves_results(spark, small_index, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("migrated"))
    m = reindex(spark, small_index, out, BuildConfig(num_shards=7))
    assert m["num_shards"] == 7
    a = Searcher(spark, small_index).search_local("import return table", 10)
    b = Searcher(spark, out).search_local("import return table", 10)
    assert a == b
    s = index_summary(spark, out)
    assert len(s["shards"]) == 7
    assert s["total_postings"] == index_summary(spark, small_index)["total_postings"]


def test_cli_end_to_end(spark, corpus_df, tmp_path_factory):
    """Drive the CLI surface in a subprocess: build → summary → search."""
    src = str(tmp_path_factory.mktemp("cli_src"))
    idx = str(tmp_path_factory.mktemp("cli_idx"))
    corpus_df.limit(120).write.mode("overwrite").parquet(src)

    def run(*args):
        p = subprocess.run([sys.executable, "-m", "deluge_spark.cli",
                            "--cores", "4", *args],
                           capture_output=True, text=True, timeout=600,
                           cwd="/root/repo")
        assert p.returncode == 0, p.stderr[-2000:]
        return [json.loads(line) for line in p.stdout.splitlines()
                if line.startswith("{")]

    out = run("build", "--corpus", src, "--out", idx, "--shards", "2",
              "--groups", "1")
    assert out[-1]["n_docs"] > 0
    summ = run("summary", "--index", idx)[-1]
    assert summ["sealed"] and summ["num_shards"] == 2
    hits = run("search", "--index", idx, "--query", "import return", "-k", "3")
    assert 0 < len(hits) <= 3 and all("doc_id" in h for h in hits)
    srcsum = run("source-summary", "--corpus", src)[-1]
    assert srcsum["docs"] == summ["n_docs"] and srcsum["bytes"] > 0
    comp = run("compact", "--index", idx, "--files-per-shard", "1")[-1]
    assert comp["files"] == 2  # one file per shard
    hits2 = run("search", "--index", idx, "--query", "import return",
                "-k", "3")
    assert hits2 == hits  # compaction preserves results through the CLI
    upd = run("update-mapping", "--index", idx,
              "--add", "n_chars=length(content)")[-1]
    assert "n_chars" in upd["columns"] and upd["updates_applied"] == 1
    hits3 = run("search", "--index", idx, "--query", "import return",
                "-k", "3")
    assert hits3 == hits  # mapping evolution preserves results too
    # delete → tombstoned out of results; purge → physical removal + stats
    victim = hits3[0]["doc_id"]
    assert run("delete", "--index", idx, "--ids",
               str(victim))[-1]["deleted"] == 1
    hits4 = run("search", "--index", idx, "--query", "import return",
                "-k", "3")
    assert victim not in [h["doc_id"] for h in hits4]
    assert run("purge", "--index", idx)[-1]["purged"] == 1
    summ2 = run("summary", "--index", idx)[-1]
    assert summ2["n_docs"] == summ["n_docs"] - 1
    assert summ2["tombstoned"] == 0
    # incremental append through the CLI: new docs searchable, no rebuild
    more = str(tmp_path_factory.mktemp("cli_more"))
    (corpus_df.limit(140).exceptAll(corpus_df.limit(120))
     .withColumn("content", F.concat(F.col("content"),
                                     F.lit(" appendmarker")))
     .write.mode("overwrite").parquet(more))
    app = run("append", "--index", idx, "--corpus", more)[-1]
    assert app["appended"] == 20
    assert len(run("search", "--index", idx, "--query", "appendmarker",
                   "-k", "25")) == 20


def test_cli_ingest_raw_jsonl(tmp_path_factory):
    """The reference's end-to-end workflow through the CLI: point at raw
    JSONL (with a corrupt line under the error budget and an excluded
    file), get a searchable index."""
    src = tmp_path_factory.mktemp("ing_src")
    idx = str(tmp_path_factory.mktemp("ing_idx"))
    lines = [json.dumps({"id": f"d{i}", "content":
                         f"alpha document number {i}"}) for i in range(30)]
    lines.insert(5, '{"id": "bad" BROKEN')          # corrupt, 1/31 < 5%
    (src / "docs.jsonl").write_text("\n".join(lines) + "\n")
    (src / "skipme.jsonl").write_text(
        json.dumps({"id": "x", "content": "poison zzz"}) + "\n")

    def run(*args):
        p = subprocess.run([sys.executable, "-m", "deluge_spark.cli",
                            "--cores", "4", *args],
                           capture_output=True, text=True, timeout=600,
                           cwd="/root/repo")
        assert p.returncode == 0, p.stderr[-2000:]
        return [json.loads(line) for line in p.stdout.splitlines()
                if line.startswith("{")]

    out = run("ingest", "--input", str(src), "--format", "jsonl",
              "--schema", "id string, content string",
              "--exclude", "skipme.jsonl", "--shards", "2",
              "--out", idx)[-1]
    assert out["n_docs"] == 30                      # corrupt + excluded dropped
    assert out["gate"]["errors"] == 1
    hits = run("search", "--index", idx, "--query", "number", "-k", "5")
    assert len(hits) == 5
    assert not run("search", "--index", idx, "--query", "poison")

    # bare-flate lines ingest (codec Spark cannot decode by extension)
    import zlib
    fsrc = src / "fl"
    fsrc.mkdir()
    body = "\n".join(f"flateline doc {i}" for i in range(8)) + "\n"
    co = zlib.compressobj(wbits=-15)
    (fsrc / "a.flate").write_bytes(co.compress(body.encode()) + co.flush())
    fidx = str(tmp_path_factory.mktemp("fl_idx"))
    out = run("ingest", "--input", str(fsrc), "--format", "lines",
              "--codec", "flate", "--shards", "2", "--out", fidx)[-1]
    assert out["n_docs"] == 8
    assert len(run("search", "--index", fidx, "--query", "flateline")) == 8


def test_cli_ingest_content_col_collision(tmp_path_factory):
    """r3 ADVICE: --content-col naming a column while the input ALSO has a
    literal `content` column must not leave two ambiguous content columns —
    the named column wins, the pre-existing one is dropped."""
    src = tmp_path_factory.mktemp("cc_src")
    idx = str(tmp_path_factory.mktemp("cc_idx"))
    lines = [json.dumps({"id": f"d{i}", "content": "decoy ignored",
                         "body": f"realtext document {i}"})
             for i in range(12)]
    (src / "docs.jsonl").write_text("\n".join(lines) + "\n")

    def run(*args):
        p = subprocess.run([sys.executable, "-m", "deluge_spark.cli",
                            "--cores", "4", *args],
                           capture_output=True, text=True, timeout=600,
                           cwd="/root/repo")
        assert p.returncode == 0, p.stderr[-2000:]
        return [json.loads(line) for line in p.stdout.splitlines()
                if line.startswith("{")]

    out = run("ingest", "--input", str(src), "--format", "jsonl",
              "--schema", "id string, content string, body string",
              "--content-col", "body", "--shards", "2", "--out", idx)[-1]
    assert out["n_docs"] == 12
    assert len(run("search", "--index", idx, "--query", "realtext")) > 0
    assert not run("search", "--index", idx, "--query", "decoy")


def test_cli_fuzzy_sort_facet(spark, small_index):
    """Round-5 search/aggs surface through the CLI: --fuzzy, --sort with
    --from paging, and the facet subcommand — each checked against the
    in-process API on the same index."""
    def run(*args):
        p = subprocess.run([sys.executable, "-m", "deluge_spark.cli",
                            "--cores", "4", *args],
                           capture_output=True, text=True, timeout=600,
                           cwd="/root/repo")
        assert p.returncode == 0, p.stderr[-2000:]
        return [json.loads(line) for line in p.stdout.splitlines()
                if line.startswith("{")]

    s = Searcher(spark, small_index)
    hits = run("search", "--index", small_index, "--fuzzy", "retur",
               "--max-edits", "1", "-k", "3")
    api = s.search_fuzzy("retur", k=3, max_edits=1).collect()
    assert [h["doc_id"] for h in hits] == [r["doc_id"] for r in api]

    rows = run("search", "--index", small_index, "--query",
               "import return", "--sort", "path", "--asc", "-k", "5",
               "--from", "2")
    api = s.search_sorted("import return", "path", k=5, ascending=True,
                          from_=2).collect()
    assert [(r["doc_id"], r["path"]) for r in rows] \
        == [(r["doc_id"], r["path"]) for r in api]

    st = run("facet", "--index", small_index, "--query", "import return",
             "--stats", "dl")[-1]
    want = s.facet_stats("import return", "dl").collect()[0].asDict()
    assert st == want

    card = run("facet", "--index", small_index, "--query",
               "import return", "--cardinality", "lang")[-1]
    assert card["n_values"] \
        == s.facet_cardinality("import return", "lang").collect()[0][0]

    terms = run("facet", "--index", small_index, "--query",
                "import return", "--terms", "lang", "--size", "3")
    assert [t["value"] for t in terms] \
        == [r["value"] for r in
            s.facet_terms("import return", by="lang", size=3).collect()]


def test_cli_highlight_and_mlt(spark, small_index):
    """--highlight and --like through the CLI, vs the in-process API."""
    def run(*args):
        p = subprocess.run([sys.executable, "-m", "deluge_spark.cli",
                            "--cores", "4", *args],
                           capture_output=True, text=True, timeout=600,
                           cwd="/root/repo")
        assert p.returncode == 0, p.stderr[-2000:]
        return [json.loads(line) for line in p.stdout.splitlines()
                if line.startswith("{")]

    s = Searcher(spark, small_index)
    hi = run("search", "--index", small_index, "--query", "import return",
             "--highlight", "-k", "3")
    api = s.highlight("import return", k=3).collect()
    assert [(h["doc_id"], h["snippet"]) for h in hi] \
        == [(r["doc_id"], r["snippet"]) for r in api]
    assert all("<em>" in h["snippet"] for h in hi)

    src = api[0]["doc_id"]
    ml = run("search", "--index", small_index, "--like", str(src), "-k", "3")
    api_ml = s.more_like_this(src, k=3).collect()
    assert [m["doc_id"] for m in ml] == [r["doc_id"] for r in api_ml]
    assert src not in [m["doc_id"] for m in ml]


def test_cli_count_and_explain(spark, small_index):
    """count and explain subcommands vs the in-process API."""
    def run(*args):
        p = subprocess.run([sys.executable, "-m", "deluge_spark.cli",
                            "--cores", "4", *args],
                           capture_output=True, text=True, timeout=600,
                           cwd="/root/repo")
        assert p.returncode == 0, p.stderr[-2000:]
        return [json.loads(line) for line in p.stdout.splitlines()
                if line.startswith("{")]

    s = Searcher(spark, small_index)
    n = run("count", "--index", small_index, "--query", "import return",
            "--filter", "lang=go")[-1]
    assert n["n_matches"] == s.count("import return",
                                     filters={"lang": "go"})
    doc = s.search_local("import return", 1)[0][0]
    ex = run("explain", "--index", small_index, "--query",
             "import return", "--doc", str(doc))
    api = s.explain_score("import return", doc).collect()
    assert [(e["term"], e["tf"], e["df"]) for e in ex] \
        == [(r["term"], r["tf"], r["df"]) for r in api]


def test_cli_mget_and_search_after(spark, small_index):
    """mget subcommand and search --sort --after vs the in-process API."""
    def run(*args):
        p = subprocess.run([sys.executable, "-m", "deluge_spark.cli",
                            "--cores", "4", *args],
                           capture_output=True, text=True, timeout=600,
                           cwd="/root/repo")
        assert p.returncode == 0, p.stderr[-2000:]
        return [json.loads(line) for line in p.stdout.splitlines()
                if line.startswith("{")]

    s = Searcher(spark, small_index)
    ids = [r["doc_id"] for r in spark.read.parquet(f"{small_index}/docs")
           .select("doc_id").limit(3).collect()]
    got = run("mget", "--index", small_index,
              "--ids", ",".join(map(str, ids)), "--fields", "lang")
    api = s.get_docs(ids, fields=["lang"]).collect()
    assert [(g["doc_id"], g["lang"]) for g in got] \
        == [(r["doc_id"], r["lang"]) for r in api]

    p1 = s.search_sorted("import return", "dl", k=4).collect()
    cursor = f"{p1[-1]['dl']},{p1[-1]['doc_id']}"
    got = run("search", "--index", small_index, "--query", "import return",
              "--sort", "dl", "-k", "4", "--after", cursor)
    api2 = s.search_sorted("import return", "dl", k=4,
                           search_after=(p1[-1]["dl"],
                                         p1[-1]["doc_id"])).collect()
    assert [g["doc_id"] for g in got] == [r["doc_id"] for r in api2]

    # bool msm through the CLI
    got = run("search", "--index", small_index, "--query", "import return",
              "--must", "data", "--min-should-match", "1")
    api3 = s.search_bool(must="data", should="import return", k=10,
                         minimum_should_match=1).collect()
    assert [g["doc_id"] for g in got] == [r["doc_id"] for r in api3]


def test_cli_suggest(spark, small_index):
    """suggest subcommand vs the in-process term suggester."""
    def run(*args):
        p = subprocess.run([sys.executable, "-m", "deluge_spark.cli",
                            "--cores", "4", *args],
                           capture_output=True, text=True, timeout=600,
                           cwd="/root/repo")
        assert p.returncode == 0, p.stderr[-2000:]
        return [json.loads(line) for line in p.stdout.splitlines()
                if line.startswith("{")]

    s = Searcher(spark, small_index)
    got = run("suggest", "--index", small_index, "--text", "improt tabel",
              "--size", "3")
    api = s.suggest_terms("improt tabel", size=3).collect()
    assert [(g["token"], g["suggestion"], g["df"], g["distance"])
            for g in got] \
        == [(r["token"], r["suggestion"], r["df"], r["distance"])
            for r in api]
    assert any(g["suggestion"] == "import" for g in got)
