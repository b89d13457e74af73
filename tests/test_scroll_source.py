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


def test_es_fetch_page_request_shapes(spark):
    """es_fetch_page against a fake ES HTTP server: validates the exact
    sliced-scroll request shapes (_search?scroll first page with slice
    body, _search/scroll continuations, DELETE cleanup) and that the
    connector exports every doc exactly once through real HTTP."""
    import json as _json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from deluge_spark.sources.scroll import es_fetch_page

    N, PAGE_SZ, SLICES = 57, 10, 3
    state = {"cursors": {}, "next": 0, "deletes": [], "firsts": [],
             "conts": []}
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _reply(self, obj):
            b = _json.dumps(obj).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(b)))
            self.end_headers()
            self.wfile.write(b)

        def _body(self):
            n = int(self.headers.get("Content-Length", 0))
            return _json.loads(self.rfile.read(n)) if n else {}

        def do_POST(self):
            body = self._body()
            with lock:
                if self.path.startswith("/docs/_search?scroll="):
                    # first page: slice + size + sort in the body
                    assert body["size"] == PAGE_SZ
                    assert body["sort"] == ["_doc"]
                    assert body["query"] == {"match_all": {}}
                    sl = body["slice"]
                    assert sl["max"] == SLICES and 0 <= sl["id"] < SLICES
                    state["firsts"].append(sl["id"])
                    ids = [i for i in range(N) if i % SLICES == sl["id"]]
                    sid = f"cur{state['next']}"
                    state["next"] += 1
                    state["cursors"][sid] = (ids, 0)
                elif self.path == "/_search/scroll":
                    assert body["scroll"] == "5m"
                    sid = body["scroll_id"]
                    state["conts"].append(sid)
                    ids, off = state["cursors"][sid]
                    state["cursors"][sid] = (ids, off + PAGE_SZ)
                else:
                    raise AssertionError(self.path)
                ids, off = state["cursors"][sid]
                page = ids[off:off + PAGE_SZ]
                self._reply({
                    "_scroll_id": sid,
                    "hits": {"hits": [
                        {"_id": str(i),
                         "_source": {"doc_id": i, "lang": "en",
                                     "text": f"doc {i}"}} for i in page]},
                })

        def do_DELETE(self):
            body = self._body()
            with lock:
                state["deletes"].append(body["scroll_id"])
            self._reply({"succeeded": True})

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        fetch = es_fetch_page(f"http://127.0.0.1:{srv.server_port}", "docs",
                              page_size=PAGE_SZ)
        df = read_sliced_scroll(
            spark, fetch, n_slices=SLICES,
            schema="doc_id long, lang string, text string")
        rows = df.collect()
        assert sorted(r["doc_id"] for r in rows) == list(range(N))
        with lock:
            assert sorted(state["firsts"]) == list(range(SLICES))
            assert len(state["deletes"]) == SLICES  # cleanup per slice
    finally:
        srv.shutdown()
