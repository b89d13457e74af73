"""Sliced-scroll connector vs a deterministic fake paged server, and the
end-to-end migration story: scroll-export an external corpus → build a
searchable index from it (the reference's ES→ingest path,
input/elastic/input.go:36-58)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deluge_spark.sources.scroll import read_sliced_scroll, scroll_summary

N_DOCS = 257          # deliberately not divisible by slices or page size
PAGE = 10


def make_fake_fetch_page(n_docs: int, page: int):
    """Deterministic in-memory 'server' factory: doc i belongs to slice
    i % n_slices (the ES sliced-scroll contract); token = offset within the
    slice. A closure so cloudpickle ships it by value to executors."""
    def fetch(slice_id: int, n_slices: int, token):
        ids = [i for i in range(n_docs) if i % n_slices == slice_id]
        start = int(token or 0)
        pg = ids[start:start + page]
        rows = [{"doc_id": i, "lang": ["en", "de"][i % 2],
                 "text": f"document number {i} body"} for i in pg]
        return rows, (start + page if pg else None)
    return fetch


def make_bad_fetch_page():
    def fetch(slice_id, n_slices, token):
        return ([{"doc_id": 0, "lang": "en", "text": "x"}], 0)  # stuck token
    return fetch


@pytest.fixture(scope="module")
def exported(spark):
    return read_sliced_scroll(
        spark, make_fake_fetch_page(N_DOCS, PAGE), n_slices=4,
        schema="doc_id long, lang string, text string").cache()


def test_scroll_exports_every_row_exactly_once(spark, exported):
    rows = exported.collect()
    assert len(rows) == N_DOCS
    assert sorted(r["doc_id"] for r in rows) == list(range(N_DOCS))
    assert all(r["_corrupt"] is None for r in rows)
    # slice ownership respected (parallel cursors did not overlap)
    assert all(r["doc_id"] % 4 == r["slice_id"] for r in rows)
    summ = scroll_summary(exported)
    assert summ["rows"] == N_DOCS and len(summ["slices"]) == 4


def test_runaway_cursor_guard(spark):
    df = read_sliced_scroll(spark, make_bad_fetch_page(), n_slices=1,
                            schema="doc_id long, lang string, text string",
                            max_pages_per_slice=5)
    with pytest.raises(Exception, match="runaway|max_pages"):
        df.collect()


def test_scroll_to_searchable_index(spark, exported, tmp_path):
    """Migration e2e: external scroll export → build_index → WAND search."""
    from deluge_spark.index.build import BuildConfig, build_index
    from deluge_spark.index.search import Searcher

    corpus = (exported.select(
        F.col("doc_id"), F.lit("ext").alias("repo"),
        F.concat(F.lit("doc/"), F.col("doc_id")).alias("path"),
        F.lit("c0").alias("commit"), "lang",
        F.col("text").alias("content")))
    d = str(tmp_path / "scroll_idx")
    build_index(spark, corpus, d, BuildConfig(
        num_shards=2, tokenize_groups=1, shard_batches=1))
    s = Searcher(spark, d)
    got = s.search_local("document number 42", 3)
    assert got and got[0][0] == 42  # its own number term ranks doc 42 first


def make_none_terminal_fetch_page(n_docs: int, page: int):
    """Server that returns the FINAL page's rows together with token=None —
    the (rows, None) terminal shape from the FetchPage contract. A naive
    loop that only stops on empty rows would restart from the initial None
    token and duplicate the slice forever."""
    def fetch(slice_id: int, n_slices: int, token):
        ids = [i for i in range(n_docs) if i % n_slices == slice_id]
        start = int(token or 0)
        pg = ids[start:start + page]
        nxt = start + page
        return rows_for(pg), (None if nxt >= len(ids) else nxt)

    def rows_for(pg):
        return [{"doc_id": i, "lang": "en", "text": f"d {i}"} for i in pg]
    return fetch


def test_none_token_with_rows_terminates_slice(spark):
    df = read_sliced_scroll(
        spark, make_none_terminal_fetch_page(N_DOCS, PAGE), n_slices=4,
        schema="doc_id long, lang string, text string",
        max_pages_per_slice=50)  # tight: a restart loop would blow this
    rows = df.collect()
    assert sorted(r["doc_id"] for r in rows) == list(range(N_DOCS))
