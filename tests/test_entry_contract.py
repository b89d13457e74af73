"""Local replica of the driver's correctness gate: run every queries() entry
on Spark AND its oracle_sql() twin on DuckDB at sf0.01, compare row count,
column names, and values exactly (rows sorted, column order normalized)."""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return c


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf):
        pdf = pdf.sort_values(list(pdf.columns)).reset_index(drop=True)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    return pdf


ORACLE = entrymod.oracle_sql()
QUERIES = entrymod.queries()


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["doc_id", "score"]


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, con, name):
    got = QUERIES[name](spark, SF_DIR).toPandas()
    if name not in ORACLE:
        # rows-only check (hash-based ops): just verify it runs & has rows
        assert got is not None
        return
    want = con.execute(ORACLE[name]).df()
    g, w = _normalize(got), _normalize(want)
    assert list(g.columns) == list(w.columns), f"{name}: column mismatch"
    assert len(g) == len(w), f"{name}: row count {len(g)} != {len(w)}"
    pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=True)
