"""Multi-index search — ES's multi-index / index-pattern query surface
(``GET idx-2024-*/_search``), the standard way a 100 TB corpus is actually
served: many time- or tenant-partitioned indexes, each built and compacted
independently, searched together.

Semantics = ES ``dfs_query_then_fetch`` taken as the contract (not the
default per-shard-idf approximation): document frequencies, doc counts,
and average doc length are merged across the member indexes BEFORE
scoring, so a corpus split into K indexes scores every doc exactly as the
single merged index would. That invariant — split-and-search ==
build-one-big-index — is the correctness oracle
(`tests/test_multi_index.py`) and is what makes index partitioning a pure
operational choice instead of a ranking change.

Execution: scoring runs per member index through the SAME distributed
per-shard kernels as `Searcher.search` (posting bytes never leave
executors), each member contributing its local top-k under the merged
idf/avgdl; the K small top-k frames union lazily and one global
TakeOrderedAndProject keeps the final k. Nothing is ever collected per
index, and a member whose dictionary lacks every query term contributes
an empty frame without running a job (driver dictionary check, same as
single-index auto mode).

Doc ids are NOT assumed unique across members (each index assigns its
own); results carry an ``index`` ordinal column, and ties order
(score desc, index asc, doc_id asc).

Reference parity: the reference migrates between live ES indexes
(`/root/reference/elastic/v7/reader.go:18-40`); queries over both the old
and new index during a migration are exactly this surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deluge_spark.functions.tokenizer import tokenize_py
from deluge_spark.index.search import _empty_frame, Searcher, idf

__all__ = ["MultiSearcher"]


class MultiSearcher:
    """Search K independently-built indexes as one logical corpus."""

    def __init__(self, spark: SparkSession, index_dirs: list[str]):
        if not index_dirs:
            raise ValueError("MultiSearcher needs at least one index dir")
        self.spark = spark
        self.searchers = [Searcher(spark, d) for d in index_dirs]
        modes = {s.mode for s in self.searchers}
        if len(modes) > 1:
            raise ValueError(
                f"member indexes disagree on tokenizer mode: {modes} — "
                "cross-index scoring needs one analysis chain")
        self.mode = self.searchers[0].mode
        # dfs-merged global stats: exact n, avgdl as the doc-weighted mean
        # of member means (float64 algebra; members store avgdl at full
        # precision, so the recombination error is ~1 ulp — far below the
        # rounded-score ranking dp)
        self.n_docs = sum(s.stats["n_docs"] for s in self.searchers)
        total_dl = sum(float(s.stats["avgdl"]) * s.stats["n_docs"]
                       for s in self.searchers)
        self.avgdl = (total_dl / self.n_docs) if self.n_docs else 0.0

    def merged_dfs(self, terms: list[str]) -> dict[str, int]:
        """Per-term document frequency summed across member dictionaries
        (driver-side: each member's term dictionary is already cached —
        no Spark job)."""
        out: dict[str, int] = {}
        for s in self.searchers:
            for t, d in s._term_dfs(terms).items():
                out[t] = out.get(t, 0) + int(d)
        return out

    def search(self, query: str, k: int = 10,
               filters: dict | None = None,
               round_dp: int = 9, fetch: bool = False) -> DataFrame:
        """Top-k across all member indexes → DataFrame(index, doc_id,
        score[, stored fields]), ranking identical to a single index
        built over the union of the members' corpora (dfs-merged stats).
        ``fetch`` joins each member's stored fields onto its own top-k
        (broadcast semi-join per member, before the union)."""
        terms = list(dict.fromkeys(tokenize_py(query, self.mode)))
        if not terms:
            return self._empty()
        dfs = self.merged_dfs(terms)
        if not dfs:
            return self._empty()
        idfs = {t: idf(self.n_docs, d) for t, d in dfs.items()}

        parts = []
        for i, s in enumerate(self.searchers):
            local_terms = [t for t in idfs if t in s._term_dfs(terms)]
            if not local_terms:
                continue  # dictionary says: no postings here, no job
            seg = s._segments().filter(F.col("term").isin(list(idfs)))
            top = s._distributed(seg, idfs, self.avgdl, k, round_dp,
                                 filters)
            if fetch:
                top = s._fetch_fields(top)
            parts.append(top.select(F.lit(i).alias("index"), "*"))
        if not parts:
            return self._empty()
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return (out.orderBy(F.round("score", round_dp).desc(),
                            F.col("index").asc(), F.col("doc_id").asc())
                .limit(k))

    def count(self, query: str, filters: dict | None = None) -> int:
        """ES ``_count`` over the index pattern: sum of member counts
        (members never share doc ids, so the union count is the sum)."""
        return sum(s.count(query, filters) for s in self.searchers)

    def _empty(self) -> DataFrame:
        return _empty_frame(self.spark, "index int, doc_id long, score double")
