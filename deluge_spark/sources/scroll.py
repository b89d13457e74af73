"""Live external paged/scroll source connector (SURVEY §2A row 4, the part
``reindex`` does not cover).

The reference's Elasticsearch input walks a server-side scroll cursor and
yields newline-delimited JSON batches (/root/reference/input/elastic/
input.go:36-58, /root/reference/elastic/v7/reader.go:18-40) — a single
sequential token chain. The scalable Spark re-expression is the *sliced
scroll* pattern (the public ES parallel-export API: ``slice: {id, max}``):
the export fans out over N independent slice cursors, each walked entirely
on one executor inside ``mapInPandas`` — page payloads never touch the
driver, and N slices ≙ N-way parallel ingest on a 1000-executor cluster.

``fetch_page(slice_id, n_slices, page_token) -> (rows, next_token)`` is the
only integration point — an ES implementation binds it to
``POST index/_search?scroll=...`` with a slice body; this sandbox has no
live cluster, so tests bind it to a deterministic in-memory server. The
connector contract (per the reference reader):

- a page with no rows ends the slice (``io.EOF`` analog);
- rows are JSON objects (dicts) → parsed against an explicit schema with
  the same lenient semantics as ``read_json_lines``;
- per-slice page counts surface as accumulator-style columns for the
  progress/threshold machinery.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# rows, next_token. Termination: an empty rows list ends the slice, AND a
# returned next_token of None ends the slice (after its rows are consumed) —
# either signal suffices, so implementations that return the final page as
# (rows, None) terminate cleanly instead of restarting from the initial
# None token.
FetchPage = Callable[[int, int, object], tuple[list[dict], object]]


def read_sliced_scroll(spark: SparkSession, fetch_page: FetchPage,
                       n_slices: int, schema: str,
                       max_pages_per_slice: int = 1_000_000) -> DataFrame:
    """Parallel export of a paged/scroll source → DataFrame[schema].

    ``fetch_page`` must be picklable (executors call it) and deterministic
    per (slice_id, token). Each task owns one slice's full token chain, so
    ordering within a slice is the server's scroll order; across slices
    there is no order (same as any parallel scan).

    ``max_pages_per_slice`` is a runaway-cursor guard (a server that keeps
    returning the same token would otherwise loop forever)."""
    slices = spark.range(0, n_slices, 1, n_slices).select(
        F.col("id").cast("int").alias("slice_id"))

    def _walk(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for sid in pdf["slice_id"]:
                sid = int(sid)
                token: object = None
                for _ in range(max_pages_per_slice):
                    rows, token = fetch_page(sid, n_slices, token)
                    if rows:
                        yield pd.DataFrame(
                            {"slice_id": sid,
                             "line": [json.dumps(r) for r in rows]})
                    # empty page OR a None next_token ends the slice; None
                    # is also the *initial* token, so looping on it would
                    # re-walk the scroll from the start
                    if not rows or token is None:
                        break
                else:
                    raise RuntimeError(
                        f"slice {sid}: exceeded max_pages_per_slice "
                        f"({max_pages_per_slice}) — runaway scroll cursor?")

    lines = slices.mapInPandas(_walk, schema="slice_id int, line string")
    parsed = lines.select(
        "slice_id",
        F.from_json("line", schema + ", _corrupt string",
                    {"mode": "PERMISSIVE",
                     "columnNameOfCorruptRecord": "_corrupt"}).alias("_r"))
    return parsed.select("slice_id", "_r.*")


class es_fetch_page:
    """Reference ``FetchPage`` implementation for a live Elasticsearch
    cluster over plain HTTP (stdlib urllib — no client dependency), binding
    the public sliced-scroll API exactly as the reference walks its scroll
    cursor (/root/reference/elastic/v7/reader.go:18-40 issues scroll.Do
    until zero hits = io.EOF; /root/reference/elastic/v7/client.go:245-249
    opens the scroll with a page size). UNTESTED against a live cluster in
    this sandbox (none available) — exercised by tests against a fake HTTP
    server that validates the exact request shapes.

    Request shapes (public ES API):
      first page  → POST {base}/{index}/_search?scroll={keep_alive}
                    {"size": N, "sort": ["_doc"],
                     "slice": {"id": sid, "max": n_slices},   # if slices>1
                     "query": ...}
      next pages  → POST {base}/_search/scroll
                    {"scroll": keep_alive, "scroll_id": token}
      exhaustion  → DELETE {base}/_search/scroll {"scroll_id": token}

    Rows are each hit's ``_source`` (with ``_id`` injected when
    ``include_id``); termination is the empty-hits page, matching the
    reference's io.EOF contract. Instances are picklable (plain attrs), so
    executors can call them inside ``read_sliced_scroll``."""

    def __init__(self, base_url: str, index: str, page_size: int = 1000,
                 keep_alive: str = "5m", query: dict | None = None,
                 include_id: bool = False, timeout_s: float = 60.0):
        self.base_url = base_url.rstrip("/")
        self.index = index
        self.page_size = page_size
        self.keep_alive = keep_alive
        self.query = query or {"match_all": {}}
        self.include_id = include_id
        self.timeout_s = timeout_s

    def _http(self, method: str, url: str, body: dict) -> dict:
        import urllib.request

        req = urllib.request.Request(
            url, data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"}, method=method)
        with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
            return json.loads(resp.read())

    def __call__(self, slice_id: int, n_slices: int,
                 token: object) -> tuple[list[dict], object]:
        if token is None:
            body: dict = {"size": self.page_size, "sort": ["_doc"],
                          "query": self.query}
            if n_slices > 1:
                body["slice"] = {"id": slice_id, "max": n_slices}
            res = self._http(
                "POST",
                f"{self.base_url}/{self.index}/_search"
                f"?scroll={self.keep_alive}", body)
        else:
            res = self._http(
                "POST", f"{self.base_url}/_search/scroll",
                {"scroll": self.keep_alive, "scroll_id": token})
        hits = res.get("hits", {}).get("hits", [])
        scroll_id = res.get("_scroll_id")
        if not hits:
            if scroll_id:  # free server-side scroll state
                try:
                    self._http("DELETE", f"{self.base_url}/_search/scroll",
                               {"scroll_id": scroll_id})
                except Exception:
                    pass  # best-effort cleanup; the cursor expires anyway
            return [], None
        rows = []
        for h in hits:
            src = dict(h.get("_source", {}))
            if self.include_id:
                src["_id"] = h.get("_id")
            rows.append(src)
        return rows, scroll_id


def scroll_summary(df: DataFrame) -> dict:
    """Per-slice row counts + total — the reference's pre-ingest summary
    (input.go:60-66) computed post-hoc from the exported frame."""
    rows = df.groupBy("slice_id").agg(
        F.count(F.lit(1)).alias("rows")).collect()
    per_slice = {int(r["slice_id"]): int(r["rows"]) for r in rows}
    return {"slices": per_slice, "rows": sum(per_slice.values())}
