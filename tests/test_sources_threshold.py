from __future__ import annotations

import gzip
import os

import pytest
from pyspark.sql import functions as F

from deluge_spark.sources.readers import (
    exclude_paths,
    project_documents,
    read_delimited,
    read_json_lines,
    read_lines,
    typed_field,
)
from deluge_spark.operators.threshold import (
    ErrorThresholdGate,
    ThresholdExceeded,
    check_corrupt_ratio,
)


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("src")
    (d / "a.csv").write_text('1,alice,3.5\n2,"bob,jr",null\n3,,9.1\n')
    (d / "b.csv").write_text("4,dave,2.0\n")
    (d / "skipme.csv").write_text("9,evil,0.0\n")
    (d / "c.jsonl").write_text(
        '{"id": 1, "name": "x"}\n{"id": 2 BROKEN\n{"id": 3, "name": "z"}\n')
    with gzip.open(d / "z.txt.gz", "wt") as f:
        f.write("line one\nline two\n")
    (d / "plain.txt").write_text("alpha\nbeta\ngamma\n")
    return str(d)


def test_read_lines_with_gzip_and_excludes(spark, data_dir):
    df = read_lines(spark, [f"{data_dir}/z.txt.gz", f"{data_dir}/plain.txt"])
    lines = {r.line for r in df.collect()}
    assert lines == {"line one", "line two", "alpha", "beta", "gamma"}
    df2 = read_lines(spark, [f"{data_dir}/z.txt.gz", f"{data_dir}/plain.txt"],
                     excludes=["plain.txt"])
    assert {r.line for r in df2.collect()} == {"line one", "line two"}


def test_read_lines_hadoop_fs_scheme_uri(spark, data_dir):
    """SURVEY §2A row 3 (HDFS scan source): paths resolve through the
    Hadoop FileSystem API, so an explicit scheme URI must behave exactly
    like a bare path. ``file://`` is the scheme testable in this sandbox;
    ``hdfs://host:port/...`` takes the identical resolution path (only the
    FileSystem implementation bound to the scheme differs)."""
    bare = read_lines(spark, [f"{data_dir}/plain.txt"])
    uri = read_lines(spark, [f"file://{data_dir}/plain.txt"])
    assert ({r.line for r in uri.collect()}
            == {r.line for r in bare.collect()}
            == {"alpha", "beta", "gamma"})
    # excludes key on basename, which survives scheme-qualified paths
    none = read_lines(spark, [f"file://{data_dir}/plain.txt"],
                      excludes=["plain.txt"])
    assert none.count() == 0


def test_read_delimited_null_semantics(spark, data_dir):
    df = read_delimited(spark, [f"{data_dir}/a.csv", f"{data_dir}/b.csv"],
                        schema="id string, name string, score string")
    rows = {r.id: (r.name, r.score) for r in df.collect()}
    assert rows["1"] == ("alice", "3.5")
    assert rows["2"] == ("bob,jr", None)      # quoted comma; literal null → NULL
    assert rows["3"] == (None, "9.1")         # empty → NULL
    assert rows["4"] == ("dave", "2.0")


def test_exclude_is_exact_basename(spark, data_dir):
    df = read_delimited(spark, data_dir + "/", excludes=["skipme.csv"],
                        schema="id string, name string, score string")
    # glob dir picks csvs; jsonl/txt parse as single-col rows are absent
    # due to schema; just assert 9/evil is gone and others present
    ids = {r.id for r in df.collect() if r.id is not None}
    assert "9" not in ids and {"1", "2", "3", "4"} <= ids


def test_typed_field_lenient(spark):
    df = spark.createDataFrame(
        [("1.5", "7", "true", "2024-01-02 03:04:05", "notanum")],
        "f string, i string, b string, ts string, bad string")
    row = df.select(
        typed_field("f", "double").alias("f"),
        typed_field("i", "long").alias("i"),
        typed_field("b", "bool").alias("b"),
        typed_field("ts", "timestamp").alias("ts"),
        typed_field("bad", "double").alias("bad"),
    ).collect()[0]
    assert row.f == 1.5 and row.i == 7 and row.b is True
    assert row.ts is not None and row.bad is None


def test_project_documents_skips_empty(spark):
    df = spark.createDataFrame(
        [("1", "t", "s"), ("", "t", "s"), (None, "t", "s"),
         ("4", "", "s"), ("5", "t", None)],
        "i string, t string, s string")
    out = project_documents(df, "i", "t", "s").collect()
    assert [r.id for r in out] == ["1"]


def test_json_corrupt_feeds_threshold(spark, data_dir):
    df = read_json_lines(spark, f"{data_dir}/c.jsonl",
                         schema="id long, name string")
    stats = check_corrupt_ratio(df, F.col("_corrupt").isNotNull(),
                                threshold=0.5, minimum_to_check=1)
    assert stats["errors"] == 1 and stats["total"] == 3
    with pytest.raises(ThresholdExceeded):
        check_corrupt_ratio(df, F.col("_corrupt").isNotNull(),
                            threshold=0.2, minimum_to_check=1,
                            sample_col="_corrupt")


def test_threshold_below_minimum_never_fires(spark):
    df = spark.createDataFrame([(1,), (2,)], "x long")
    # 100% errors but only 2 rows < minimum 10 → pass (reference semantics)
    stats = check_corrupt_ratio(df, F.lit(True), threshold=0.01,
                                minimum_to_check=10)
    assert stats["errors"] == 2


def test_accumulator_gate(spark):
    gate = ErrorThresholdGate(spark, threshold=0.05, minimum_to_check=10)
    rdd = spark.sparkContext.parallelize(range(100), 4)

    def work(x):
        if x % 10 == 0:
            gate.errors.add(1)
        else:
            gate.successes.add(1)
        return x
    rdd.map(work).count()
    with pytest.raises(ThresholdExceeded):
        gate.check()   # 10% > 5%
    gate2 = ErrorThresholdGate(spark, threshold=0.5, minimum_to_check=10)
    gate2.errors.add(1)
    gate2.successes.add(99)
    gate2.check()      # 1% < 50% → ok


def test_corpus_malformed_fixture_semantics(spark, corpus_pdf):
    """FIXTURES.md §3: p=0.005 bad rows → build proceeds; p=0.05 → abort."""
    import pandas as pd
    pdf = corpus_pdf.copy()
    n = len(pdf)
    bad_low = pdf.copy(); bad_low.loc[: max(1, int(0.005 * n)) - 1, "content"] = None
    bad_high = pdf.copy(); bad_high.loc[: int(0.05 * n) - 1, "content"] = None
    low = spark.createDataFrame(bad_low)
    high = spark.createDataFrame(bad_high)
    check_corrupt_ratio(low, F.col("content").isNull(), threshold=0.01)
    with pytest.raises(ThresholdExceeded):
        check_corrupt_ratio(high, F.col("content").isNull(), threshold=0.01)


def test_json_blank_lines_skipped_like_native_reader(spark, tmp_path):
    """The native JSON datasource skips blank lines; the schema'd
    text+from_json path must too — phantom all-null/corrupt rows would skew
    counts and falsely trip the error-threshold gate."""
    p = tmp_path / "blanks.jsonl"
    p.write_text('{"id": 1, "name": "a"}\n\n   \n{"id": 2, "name": "b"}\n\n')
    df = read_json_lines(spark, str(p), schema="id long, name string")
    rows = df.collect()
    assert len(rows) == 2
    assert all(r["_corrupt"] is None for r in rows)
    assert sorted(r["id"] for r in rows) == [1, 2]
