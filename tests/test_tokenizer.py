from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from deluge_spark.functions.tokenizer import (
    _tokenize_pandas,
    duckdb_tokens_expr,
    term_counts,
    tokenize_py,
)

CASES = [
    ("getHTTPResponse", ["get", "http", "response"]),
    ("parseJSONBody", ["parse", "json", "body"]),
    ("snake_case_ident", ["snake", "case", "ident"]),
    ("getHTTPResponse2", ["get", "http", "response2"]),
    ("maxDocFrequency", ["max", "doc", "frequency"]),
    ("XMLHttpRequest", ["xml", "http", "request"]),
    ("foo_bar BazQux", ["foo", "bar", "baz", "qux"]),
    ("x2y", ["x2y"]),
    ("2fast", ["2", "fast"]),
    ("", []),
    (None, []),
    ("    \n\t ", []),
    ("UPPER lower Mixed", ["upper", "lower", "mixed"]),
]


@pytest.mark.parametrize("text,expected", CASES)
def test_code_tokenizer_py(text, expected):
    assert tokenize_py(text, "code") == expected


def test_simple_tokenizer_py():
    assert tokenize_py("Foo_bar baz-qux 12ab", "simple") == [
        "foo", "bar", "baz", "qux", "12ab"]


@pytest.mark.parametrize("mode", ["simple", "code"])
def test_pandas_matches_py(mode):
    texts = [c[0] for c in CASES] + ["def fooBar(x): return x_y + 1"]
    got = _tokenize_pandas(pd.Series(texts), mode).tolist()
    want = [tokenize_py(t, mode) for t in texts]
    assert got == want


@pytest.mark.parametrize("mode", ["simple", "code"])
def test_duckdb_matches_py(mode):
    texts = [c[0] for c in CASES if c[0] is not None]
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"s": texts}))
    got = con.execute(
        f"SELECT {duckdb_tokens_expr('s', mode)} FROM t").fetchall()
    want = [tokenize_py(t, mode) for t in texts]
    assert [g[0] for g in got] == want


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(codec="ascii"), max_size=200))
def test_duckdb_matches_py_property(s):
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"s": [s]}))
    got = con.execute(
        f"SELECT {duckdb_tokens_expr('s', 'code')} FROM t").fetchone()[0]
    assert got == tokenize_py(s, "code")


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=200))
def test_pandas_matches_py_property(s):
    got = _tokenize_pandas(pd.Series([s]), "code").tolist()[0]
    assert got == tokenize_py(s, "code")


@pytest.mark.parametrize("mode", ["simple", "code"])
def test_arrow_matches_py(mode):
    import pyarrow as pa
    from deluge_spark.functions.tokenizer import _tokenize_arrow

    texts = [c[0] for c in CASES] + [
        "def fooBar(x): return x_y + 1", "2fast 2a3b x2y ab2cd 22ab",
        "a2fast _2a ß2x 2a2b",
    ]
    arr = pa.array(texts, pa.string())
    got = [
        [t for t in row if t != ""] if row is not None else []
        for row in _tokenize_arrow(arr, mode).to_pylist()
    ]
    want = [tokenize_py(t, mode) for t in texts]
    assert got == want


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=200))
def test_arrow_matches_py_property(s):
    import pyarrow as pa
    from deluge_spark.functions.tokenizer import _tokenize_arrow

    row = _tokenize_arrow(pa.array([s], pa.string()), "code").to_pylist()[0]
    got = [t for t in (row or []) if t != ""]
    assert got == tokenize_py(s, "code")


def test_term_counts_spark(spark):
    df = spark.createDataFrame(
        [(1, "fooBar fooBar baz"), (2, ""), (3, None), (4, "one two one")],
        "doc_id long, content string",
    )
    rows = term_counts(df).collect()
    got = {(r.doc_id, r.term): r.tf for r in rows}
    assert got == {
        (1, "foo"): 2, (1, "bar"): 2, (1, "baz"): 1,
        (4, "one"): 2, (4, "two"): 1,
    }
    dls = {(r.doc_id): r.dl for r in rows}
    assert dls == {1: 5, 4: 3}
