"""Searcher — the engine's query entry point (SURVEY.md §3.4).

Execution mirrors a distributed search engine's scatter/gather: the query's
terms select segment rows (parquet predicate pushdown on ``term`` inside
each shard directory), each shard runs block-max WAND locally, and the tiny
per-shard top-k lists merge globally. Two physical strategies, same
semantics:

- **distributed** (`groupBy(shard).applyInPandas`): one narrow-ish Spark job
  whose tasks each own one shard — the 1000-executor path; posting bytes
  never leave the executors.
- **coordinator** (driver-side): when the matched posting volume is small
  (≤ ``local_postings_cap``), the filtered segment rows are collected and
  WAND runs in-process per shard — interactive-latency path, exactly how an
  ES coordinating node hits its local shards. Same numpy code either way.

A third mode, ``dataframe``, is the pure-DataFrame BM25 scoring join
(index/score.py) over the tf checkpoints — the correctness cross-check used
in three-way agreement tests.

Keyword filters (north-star B7: the ES bool-filter on lang/repo/...):
coordinator mode collects a sorted allowed-doc_id array (capped — the set
must live where WAND runs); distributed mode cogroups the filtered docs
table with the segments on ``shard`` so each executor task builds its own
shard's allowed set — no driver round-trip, no cap. ``mode='auto'`` decides
from the driver-cached term dictionary (Σ df over query terms) without
launching a Spark job, and falls back coordinator→distributed when a filter
exceeds the driver cap.
"""

from __future__ import annotations

import math
import os
from collections import OrderedDict

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from deluge_spark.functions.tokenizer import tokenize_py
from deluge_spark.index.build import read_global_stats, read_segments
from deluge_spark.index.wand import PostingIterator, taat_top_k, wand_top_k

RESULT_SCHEMA = "doc_id long, score double"


class FilterTooUnselective(ValueError):
    """A keyword filter matched more doc_ids than the coordinator-mode cap
    — the allowed set cannot live on the driver. auto-mode catches exactly
    this (and nothing broader) to fall back to the distributed path."""


class TombstonesTooLarge(ValueError):
    """The index's tombstone set exceeds ``tombstone_driver_cap`` — it is
    not materialized on the driver (a delete-heavy 100 TB corpus can carry
    10⁹+ tombstones), so coordinator-mode WAND cannot run. auto-mode falls
    back to the distributed path, which resolves tombstones executor-side
    (per-shard cogroup / anti-join); the durable fix is purge_deleted()."""


def idf(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def _score_shard_rows(rows: list[dict], idfs: dict[str, float],
                      avgdl: float, k: int, round_dp: int,
                      allowed: np.ndarray | None,
                      banned: np.ndarray | None,
                      taat_cap: int) -> list[tuple[int, float]]:
    """One shard's segment rows → local top-k. THE per-shard cost-based
    TAAT/WAND pick (matched postings ≤ taat_cap → vectorized exhaustive,
    else block-max DAAT) shared by the single-query distributed path and
    the batch path — same ranking either way. (The coordinator makes the
    same pick query-globally in ``search_local``.)"""
    if sum(int(r["n_postings"]) for r in rows) <= taat_cap:
        return taat_top_k(rows, idfs, avgdl, k, round_dp, allowed, banned)
    its = [PostingIterator(r, idfs[r["term"]], avgdl) for r in rows]
    return wand_top_k(its, k, round_dp, allowed, banned)



def _empty_frame(spark, schema) -> DataFrame:
    """Typed EMPTY DataFrame as a pruned LocalRelation.

    ``createDataFrame([], schema)`` builds an RDD-backed empty frame over
    cluster-default partitions, so a downstream orderBy still plans a full
    exchange (~0.7 s per call on this box). A one-null-row pandas frame
    filtered by ``lit(False)`` collapses via PropagateEmptyRelation into an
    empty LocalRelation instead (~40 ms), same schema, zero rows."""
    names = (schema.names if hasattr(schema, "names")
             else [f.strip().split()[0] for f in schema.split(",")])
    pdf = pd.DataFrame({c: pd.Series([None], dtype=object) for c in names})
    return spark.createDataFrame(pdf, schema=schema).where(F.lit(False))


class Searcher:
    #: cost-based TAAT/WAND switch point (matched postings): below it the
    #: vectorized exhaustive scorer beats the DAAT loop. ONE source of
    #: truth for the coordinator path and the per-shard distributed pick.
    #: Calibrated r6: vectorized TAAT runs ~0.35 µs/posting, range-at-a-
    #: time block-max WAND ~3 µs/posting when pruning cannot skip, so
    #: WAND only wins once it prunes >~8× — which Σdf alone cannot
    #: promise below ~10^6. 10^6 postings decode to ~16 MB of per-task
    #: numpy state, safely inside executor task memory, so the exhaustive
    #: path is both faster AND memory-bounded up to this cap; above it
    #: WAND's lazy block decode keeps memory flat and pruning gets room
    #: to pay off.
    DEFAULT_TAAT_CAP = 1_000_000

    #: above this many tombstones the set is NOT materialized on the
    #: driver (≈8 B/id; 50M ≈ 400 MB driver+broadcast) — distributed
    #: searches resolve it executor-side, coordinator mode raises
    #: TombstonesTooLarge (purge_deleted is the durable fix)
    DEFAULT_TOMBSTONE_DRIVER_CAP = 50_000_000

    def __init__(self, spark: SparkSession, index_dir: str,
                 local_postings_cap: int = 5_000_000,
                 filter_ids_cap: int = 2_000_000,
                 cache_stats: bool = True,
                 cache_segments: bool = False,
                 term_cache_size: int = 0,
                 taat_cap: int | None = None,
                 tombstone_driver_cap: int | None = None):
        """``cache_stats`` pulls the (small) term→df table to the driver once
        — the coordinating-node dictionary. ``cache_segments`` persists the
        segment DataFrame in cluster memory (interactive serving mode; leave
        off for one-shot batch queries over huge indexes).
        ``term_cache_size`` > 0 enables a driver-side LRU over per-term
        segment rows (the Lucene/ES query-cache analog): coordinator-mode
        queries whose terms are cached run with ZERO Spark jobs. Memory is
        ~5 B/posting per cached term (compressed blocks, skip arrays) —
        size it by term count against the expected hot-term df.

        Snapshot semantics: a Searcher answers from the index state at
        open time (stats, dictionary, tombstones, batch list). Additive
        changes (append, delete, stream finalize) are simply invisible
        until ``refresh()``/reopen; structural rewrites that DELETE old
        batch dirs (compact_segments, merge_small_batches via append
        auto-compaction, purge_deleted) invalidate open handles — unlike
        Lucene, parquet files aren't held open, so refresh()/reopen after
        such ops (single-writer discipline, same as the rest of the
        admin surface)."""
        self.spark = spark
        self.index_dir = index_dir
        self.stats = read_global_stats(index_dir)
        self.mode = self.stats.get("tokenizer_mode", "code")
        self.local_postings_cap = local_postings_cap
        self.filter_ids_cap = filter_ids_cap
        self.term_cache_size = term_cache_size
        self.taat_cap = (self.DEFAULT_TAAT_CAP if taat_cap is None
                         else taat_cap)
        self.tombstone_driver_cap = (
            self.DEFAULT_TOMBSTONE_DRIVER_CAP
            if tombstone_driver_cap is None else tombstone_driver_cap)
        self._term_cache: OrderedDict[str, list[dict]] = OrderedDict()
        self._terms_path = os.path.join(index_dir, "stats", "terms")
        self._docs_path = os.path.join(index_dir, "docs")
        self._meta_path = os.path.join(index_dir, "docs_meta")
        self._tombstones_path = os.path.join(index_dir, "tombstones")
        # deletes (ES/Lucene semantics): tombstoned docs never appear in
        # results; df/avgdl stay as-built until purge/merge, so survivor
        # scores are byte-identical. ~8 B/id on the driver — the scale
        # path for huge delete sets is purge_deleted(). Loaded at open;
        # reopen (or a new Searcher) after further deletes, like an ES
        # refresh.
        self._tombstones = self._load_tombstones()
        self._tomb_bcast = None  # lazily broadcast on first distributed use
        self._df_map: dict[str, int] | None = None
        self._seg: DataFrame | None = None
        if cache_stats:
            self._df_map = {
                r["term"]: int(r["df"])
                for r in self.spark.read.parquet(self._terms_path)
                .select("term", "df").collect()
            }
        if cache_segments:
            self._seg = read_segments(spark, index_dir).cache()
            self._seg.count()

    # -- helpers ----------------------------------------------------------
    def _empty(self) -> DataFrame:
        return _empty_frame(self.spark, RESULT_SCHEMA)

    def _local_df(self, rows, schema) -> DataFrame:
        """Small driver-side result rows → DataFrame through the Arrow
        pandas path — ~10× cheaper than createDataFrame(list), which
        type-verifies row by row over py4j (measured 353 → 34 ms for a
        10-row frame on this box; every coordinator-mode query and pinned
        top-k pays this constructor). None-bearing columns are built as
        object Series so integers never degrade to float NaN."""
        if not rows:
            return _empty_frame(self.spark, schema)
        names = (schema.names if hasattr(schema, "names")
                 else [f.strip().split()[0] for f in schema.split(",")])
        cols = {}
        for i, c in enumerate(names):
            vals = [r[i] for r in rows]
            cols[c] = (pd.Series(vals, dtype=object)
                       if any(v is None for v in vals) else vals)
        return self.spark.createDataFrame(pd.DataFrame(cols), schema=schema)

    def _load_tombstones(self) -> np.ndarray | None:
        from deluge_spark.index.build import read_tombstones

        self._tomb_oversize = False
        self._tomb_files: list[str] = []
        df = read_tombstones(self.spark, self.index_dir)
        if df is None:
            return None
        if df.count() > self.tombstone_driver_cap:
            # scale guard: keep the set distributed (anti-join / per-shard
            # cogroup in the executor paths); snapshot the FILE list so
            # every query still answers from the open-time set even if
            # deletes append afterwards
            self._tomb_oversize = True
            self._tomb_files = sorted(df.inputFiles())
            return None
        arr = np.unique(df.toPandas()["doc_id"].to_numpy(np.int64))
        return arr if len(arr) else None

    def _tombstones_df(self) -> DataFrame | None:
        """The open-time tombstone SNAPSHOT as a DataFrame — every search
        path answers from the same snapshot (never a re-read of the
        tombstones dir, which may have grown or been purged since open).
        Above the driver cap this is the distributed form (read from the
        snapshotted file list, deduped, never collected)."""
        if self._tomb_oversize:
            return (self.spark.read.parquet(*self._tomb_files)
                    .select("doc_id").distinct())
        if self._tombstones is None:
            return None
        return self.spark.createDataFrame(
            pd.DataFrame({"doc_id": self._tombstones}))

    def refresh(self) -> "Searcher":
        """ES refresh analog: re-read stats, the term dictionary, the
        tombstone set, and the segment cache so index changes made since
        open (append/delete/purge/update-mapping) become visible on THIS
        handle — the alternative to constructing a new Searcher. Returns
        self for chaining."""
        self.stats = read_global_stats(self.index_dir)
        self.mode = self.stats.get("tokenizer_mode", self.mode)
        if self._df_map is not None:
            self._df_map = {
                r["term"]: int(r["df"])
                for r in self.spark.read.parquet(self._terms_path)
                .select("term", "df").collect()
            }
        if self._seg is not None:
            self._seg.unpersist()
            self._seg = read_segments(self.spark, self.index_dir).cache()
            self._seg.count()
        self._term_cache.clear()
        if self._tomb_bcast is not None:
            self._tomb_bcast.unpersist()
            self._tomb_bcast = None
        self._tombstones = self._load_tombstones()
        return self

    def _tomb_broadcast(self):
        """Broadcast the (open-time, query-invariant) tombstone array once
        and reuse it for every distributed/batch query; None when the
        index has no tombstones."""
        if self._tombstones is not None and self._tomb_bcast is None:
            self._tomb_bcast = self.spark.sparkContext.broadcast(
                self._tombstones)
        return self._tomb_bcast

    def _segments(self) -> DataFrame:
        if self._seg is not None:
            return self._seg
        return read_segments(self.spark, self.index_dir)

    def _term_dfs(self, terms: list[str]) -> dict[str, int]:
        """term → df for the query's terms: free from the driver-cached
        dictionary, one tiny filtered parquet read otherwise."""
        if self._df_map is not None:
            return {t: self._df_map[t] for t in terms if t in self._df_map}
        rows = (self.spark.read.parquet(self._terms_path)
                .filter(F.col("term").isin(terms)).collect())
        return {r["term"]: int(r["df"]) for r in rows}

    def _term_idfs(self, terms: list[str]) -> dict[str, float]:
        n = self.stats["n_docs"]
        return {t: idf(n, d) for t, d in self._term_dfs(terms).items()}

    @staticmethod
    def _filter_cond(filters: dict):
        """ES-filter-context condition over stored doc fields. Each entry
        maps field -> spec:

        - scalar -> ``term`` filter (equality)
        - list/tuple/set -> ``terms`` filter (IN)
        - ``{"gte"/"gt"/"lte"/"lt": v, ...}`` -> ``range`` filter
          (bounds conjoin)

        Entries conjoin (ES bool.filter semantics). Everything stays a
        Column expression, so Catalyst pushes every clause down to the
        docs parquet scan."""
        cond = None
        for col, spec in filters.items():
            c = F.col(col)
            if isinstance(spec, dict):
                if not spec:
                    raise ValueError(f"empty range spec for field {col!r}")
                e = None
                for op, val in spec.items():
                    if op == "gte":
                        clause = c >= val
                    elif op == "gt":
                        clause = c > val
                    elif op == "lte":
                        clause = c <= val
                    elif op == "lt":
                        clause = c < val
                    else:
                        raise ValueError(
                            f"unknown range operator {op!r} for {col!r} "
                            "(expected gte/gt/lte/lt)")
                    e = clause if e is None else (e & clause)
            elif isinstance(spec, (list, tuple, set, frozenset)):
                e = c.isin(list(spec))
            else:
                e = c == spec
            cond = e if cond is None else (cond & e)
        return cond

    def _allowed_ids(self, filters: dict[str, str] | None) -> np.ndarray | None:
        """Coordinator-mode filter resolution: the allowed-id set must live
        where WAND runs (the driver here), so it is collected — capped. The
        distributed path never does this (per-shard cogroup instead)."""
        if not filters:
            return None
        docs = self.spark.read.parquet(self._docs_path)
        ids = docs.filter(self._filter_cond(filters)).select("doc_id").limit(
            self.filter_ids_cap + 1).collect()
        if len(ids) > self.filter_ids_cap:
            raise FilterTooUnselective(
                "filter too unselective for coordinator-mode WAND; "
                "use mode='distributed' (executor-side filter cogroup) "
                "or mode='dataframe'")
        return np.sort(np.array([r["doc_id"] for r in ids], dtype=np.int64))

    def _fetch_term_rows(self, terms: list[str]) -> list[dict]:
        """Segment rows for ``terms``, through the LRU term cache when
        enabled: only cache-miss terms hit Spark (one filtered collect),
        fully-cached queries run with no job at all."""
        if self.term_cache_size <= 0:
            seg = self._segments().filter(F.col("term").isin(terms))
            return [r.asDict() for r in seg.collect()]
        missing = [t for t in terms if t not in self._term_cache]
        fetched: dict[str, list[dict]] = {}
        if missing:
            seg = self._segments().filter(F.col("term").isin(missing))
            fetched = {t: [] for t in missing}
            for r in seg.collect():
                fetched[r["term"]].append(r.asDict())
        # answer from cache+fetched FIRST — results never depend on eviction
        rows: list[dict] = []
        for t in terms:
            if t in fetched:
                rows.extend(fetched[t])
            elif t in self._term_cache:
                self._term_cache.move_to_end(t)
                rows.extend(self._term_cache[t])
        for t, rs in fetched.items():
            self._term_cache[t] = rs
        while len(self._term_cache) > self.term_cache_size:
            self._term_cache.popitem(last=False)
        return rows

    # -- public API -------------------------------------------------------
    def search_local(self, query: str, k: int = 10,
                     filters: dict[str, str] | None = None,
                     round_dp: int = 9,
                     algo: str = "auto") -> list[tuple[int, float]]:
        """Coordinator-mode search returning a driver-side list — the
        serving-path latency (one Spark job: fetch matched segment rows).
        Same results as ``search(mode='coordinator')`` without the
        result-DataFrame materialization round-trip.

        ``algo``: 'auto' (default — taat when Σdf ≤ ``self.taat_cap``, else
        wand; Lucene's cost-based pick, same as the distributed path's
        per-shard choice), 'taat' (vectorized exhaustive — faster when
        matched postings are few), or 'wand' (block-max DAAT — the
        pruning path once matched volume is large). All produce the
        identical ranking."""
        if self._tomb_oversize:
            raise TombstonesTooLarge(
                "tombstone set exceeds tombstone_driver_cap — coordinator-"
                "mode WAND cannot hold it; use mode='distributed' (executor-"
                "side anti-join) or purge_deleted()")
        terms = list(dict.fromkeys(tokenize_py(query, self.mode)))
        if not terms:
            return []
        dfs = self._term_dfs(terms)
        if not dfs:
            return []
        idfs = {t: idf(self.stats["n_docs"], d) for t, d in dfs.items()}
        avgdl = float(self.stats["avgdl"])
        allowed = self._allowed_ids(filters)
        rows = self._fetch_term_rows(list(idfs))
        if algo == "auto":
            algo = "taat" if sum(dfs.values()) <= self.taat_cap else "wand"
        if algo == "taat":
            return taat_top_k(rows, idfs, avgdl, k, round_dp, allowed,
                              self._tombstones)
        if algo != "wand":
            raise ValueError(f"unknown algo: {algo}")
        by_shard: dict[int, list[dict]] = {}
        for r in rows:
            by_shard.setdefault(int(r["shard"]), []).append(r)
        merged: list[tuple[int, float]] = []
        for shard_rows in by_shard.values():
            its = [PostingIterator(r, idfs[r["term"]], avgdl)
                   for r in shard_rows]
            merged.extend(wand_top_k(its, k, round_dp, allowed,
                                     self._tombstones))
        merged.sort(key=lambda x: (-round(x[1], round_dp), x[0]))
        return merged[:k]

    def search(self, query: str, k: int = 10,
               filters: dict[str, str] | None = None,
               mode: str = "auto", round_dp: int = 9,
               fetch: bool = False) -> DataFrame:
        """Top-k BM25 search → DataFrame(doc_id, score[, doc fields])."""
        terms = list(dict.fromkeys(tokenize_py(query, self.mode)))
        if not terms:
            return self._empty()
        dfs = self._term_dfs(terms)
        if not dfs:
            return self._empty()
        n = self.stats["n_docs"]
        idfs = {t: idf(n, d) for t, d in dfs.items()}
        avgdl = float(self.stats["avgdl"])

        seg = self._segments().filter(F.col("term").isin(list(idfs)))

        auto = mode == "auto"
        if auto:
            # matched posting volume = Σ df over the query's terms — known
            # from the driver-cached dictionary, NO extra Spark job (df is
            # exactly n_postings summed over a term's shards)
            mode = ("coordinator" if sum(dfs.values()) <= self.local_postings_cap
                    else "distributed")

        if mode not in ("coordinator", "distributed"):
            raise ValueError(f"unknown mode: {mode}")
        if mode == "coordinator":
            try:
                top = self.search_local(query, k, filters, round_dp)
                out = self._local_df(
                    [(int(d), float(s)) for d, s in top], RESULT_SCHEMA)
            except (FilterTooUnselective, TombstonesTooLarge):
                # ONLY the cap rejections trigger the fallback — any other
                # ValueError is a real bug and must surface, not silently
                # rerun distributed
                if not auto:
                    raise
                mode = "distributed"
        if mode == "distributed":
            out = self._distributed(seg, idfs, avgdl, k, round_dp, filters)

        if fetch:
            out = self._fetch_fields(out)
        return out.orderBy(F.round("score", round_dp).desc(),
                           F.col("doc_id").asc())

    def search_many(self, queries: dict[str, str], k: int = 10,
                    round_dp: int = 9,
                    filters: dict[str, dict[str, str]] | None = None,
                    fetch: bool = False,
                    query_groups: int = 1) -> DataFrame:
        """Batch top-k for MANY queries in ONE distributed job →
        DataFrame(query, doc_id, score[, doc fields]), per-query ranking
        identical to ``search(mode='distributed')``.

        The cluster-serving shape for query-set evaluation over a huge
        index: per-shard tasks receive the union of all queries' matched
        segment rows ONCE, score every query locally (per-query cost-based
        TAAT/WAND, same pick as the single-query path), and one per-query
        global merge takes each top-k — M queries cost one filtered
        segments scan instead of M Spark jobs. Queries whose terms are all
        unknown simply produce no rows.

        ``filters``: per-query keyword filters, ``{query_name: {col:
        val}}`` — resolved EXECUTOR-SIDE exactly like the single-query
        distributed path (the filtered docs table, tagged per query, is
        cogrouped with the segments on shard; no driver collect, no size
        cap). Unlisted queries run unfiltered. ``fetch`` joins the stored
        doc fields onto the top-k rows (broadcast semi-join, B6).

        ``query_groups``: scoring-task granularity. The scoring stage is
        keyed on (shard, query group); with the default 1 group it runs
        ``num_shards`` tasks, which caps the usable parallelism of a big
        batch at the shard count — fine for one query, wasteful for a
        1000-executor cluster evaluating thousands. G > 1 splits the
        QUERY SET into G cost-balanced groups (greedy bin-pack on Σdf),
        giving ``num_shards × G`` tasks. Results are exactly identical
        for any G (each query is scored in exactly one group; per-query
        decode work is unchanged — a term shared by two groups ships its
        posting bytes to both, the only cost of finer granularity). This
        is the batch analog of ES serving a query set across replicas."""
        from pyspark.sql import Window

        filters = dict(filters or {})
        unknown = set(filters) - set(queries)
        if unknown:
            raise ValueError(f"filters reference unknown query names: "
                             f"{sorted(unknown)}")
        qterms = {name: [t for t in dict.fromkeys(tokenize_py(q, self.mode))]
                  for name, q in queries.items()}
        all_terms = sorted({t for ts in qterms.values() for t in ts})
        out_schema = "query string, doc_id long, score double"
        if not all_terms:
            return _empty_frame(self.spark, out_schema)
        dfs = self._term_dfs(all_terms)
        n = self.stats["n_docs"]
        idfs = {t: idf(n, d) for t, d in dfs.items()}
        avgdl = float(self.stats["avgdl"])
        qterms = {name: [t for t in ts if t in idfs]
                  for name, ts in qterms.items()}
        live = sorted({t for ts in qterms.values() for t in ts})
        if not live:
            return _empty_frame(self.spark, out_schema)

        # query → scoring group: greedy bin-pack on Σdf (hot query sets
        # balance across groups), deterministic (cost desc, name asc;
        # ties to the lowest-loaded, lowest-index group)
        live_names = [n for n, ts in qterms.items() if ts]
        n_groups = max(1, min(int(query_groups), len(live_names)))
        grp_of: dict[str, int] = {}
        if n_groups > 1:
            load = [0] * n_groups
            cost = {n: sum(dfs[t] for t in qterms[n]) for n in live_names}
            for n in sorted(live_names, key=lambda x: (-cost[x], x)):
                g = min(range(n_groups), key=lambda i: (load[i], i))
                grp_of[n] = g
                load[g] += max(1, cost[n])
            term_grps = sorted({(t, grp_of[n])
                                for n in live_names for t in qterms[n]})

        seg = self._segments().filter(F.col("term").isin(live))
        if n_groups > 1:
            gmap = self.spark.createDataFrame(term_grps,
                                              "term string, grp int")
            seg = seg.join(F.broadcast(gmap), "term")
        sc = self.spark.sparkContext
        b_idfs = sc.broadcast(idfs)
        b_qterms = sc.broadcast(qterms)
        b_grp_of = sc.broadcast(grp_of)
        b_tomb = self._tomb_broadcast()
        b_filtered = sc.broadcast(frozenset(filters))
        taat_cap = self.taat_cap

        def _score_queries(seg_pdf: pd.DataFrame,
                           allowed_by_query: dict,
                           extra_banned: np.ndarray | None = None
                           ) -> pd.DataFrame:
            rows = seg_pdf.to_dict("records")
            by_term: dict[str, list[dict]] = {}
            for r in rows:
                by_term.setdefault(r["term"], []).append(r)
            banned = b_tomb.value if b_tomb is not None else extra_banned
            filtered_names = b_filtered.value
            grp_map = b_grp_of.value
            task_grp = (int(seg_pdf["grp"].iloc[0])
                        if grp_map and len(seg_pdf) else None)
            names, docs_out, scores = [], [], []
            for name, ts in b_qterms.value.items():
                if task_grp is not None and grp_map.get(name) != task_grp:
                    continue   # scored by its own group's task
                qrows = [r for t in ts for r in by_term.get(t, [])]
                if not qrows:
                    continue
                if name in filtered_names:
                    # a filtered query whose filter matches nothing in
                    # this shard gets an EMPTY allowed set, never None
                    allowed = allowed_by_query.get(
                        name, np.empty(0, dtype=np.int64))
                else:
                    allowed = None
                top = _score_shard_rows(qrows, b_idfs.value, avgdl, k,
                                        round_dp, allowed, banned, taat_cap)
                for doc, sco in top:
                    names.append(name)
                    docs_out.append(doc)
                    scores.append(sco)
            return pd.DataFrame({"query": names, "doc_id": docs_out,
                                 "score": scores})

        # over-cap tombstones ride the same cogroup: filtered queries get
        # them anti-joined out of their allowed sets; unfiltered queries
        # receive the shard's banned ids under a reserved sentinel tag
        BANNED_TAG = "\x00__tombstones__"
        if BANNED_TAG in queries:
            raise ValueError("query name collides with the reserved "
                             "tombstone sentinel")
        fd = None
        if filters:
            docs = self.spark.read.parquet(self._docs_path)
            for name, flt in filters.items():
                part = (docs.filter(self._filter_cond(flt))
                        .select("shard", "doc_id")
                        .withColumn("query", F.lit(name)))
                if n_groups > 1:
                    part = part.withColumn(
                        "grp", F.lit(grp_of.get(name, 0)))
                fd = part if fd is None else fd.unionByName(part)
        if self._tomb_oversize:
            tomb_ids = self._tombstones_df()
            if fd is not None:
                fd = fd.join(tomb_ids, "doc_id", "left_anti")
            tagged = (tomb_ids
                      .withColumn("shard",
                                  F.pmod(F.col("doc_id"),
                                         F.lit(int(self.stats["num_shards"])))
                                  .cast("int"))
                      .select("shard", "doc_id")
                      .withColumn("query", F.lit(BANNED_TAG)))
            if n_groups > 1:
                # every group's tasks need the shard's banned ids
                tagged = tagged.withColumn(
                    "grp", F.explode(F.array(
                        *[F.lit(g) for g in range(n_groups)])))
            fd = tagged if fd is None else fd.unionByName(tagged)

        keys = ["shard", "grp"] if n_groups > 1 else ["shard"]
        if fd is not None:
            def _cogrouped_many(seg_pdf: pd.DataFrame,
                                ids_pdf: pd.DataFrame) -> pd.DataFrame:
                if not len(seg_pdf):
                    return pd.DataFrame(
                        {"query": [], "doc_id": [], "score": []})
                allowed_by_query = {
                    str(name): np.sort(grp["doc_id"].to_numpy(
                        dtype=np.int64, copy=False))
                    for name, grp in ids_pdf.groupby("query")}
                extra_banned = allowed_by_query.pop(BANNED_TAG, None)
                return _score_queries(seg_pdf, allowed_by_query,
                                      extra_banned)

            per_shard = (seg.groupBy(*keys)
                         .cogroup(fd.groupBy(*keys))
                         .applyInPandas(_cogrouped_many, schema=out_schema))
        else:
            per_shard = seg.groupBy(*keys).applyInPandas(
                lambda pdf: _score_queries(pdf, {}), schema=out_schema)
        w = Window.partitionBy("query").orderBy(
            F.round("score", round_dp).desc(), F.col("doc_id").asc())
        out = (per_shard.withColumn("rn", F.row_number().over(w))
               .filter(F.col("rn") <= k).drop("rn"))
        if fetch:
            # pin the (M·k)-row result first — the batch scoring subtree
            # must not execute once per plan branch (see _pin_small)
            out = self._pin_small(out)
            docs = self.spark.read.parquet(self._docs_path)
            cols = [c for c in ("repo", "path", "commit", "lang", "doc_len")
                    if c in docs.columns]
            out = out.join(F.broadcast(
                docs.select("doc_id", *cols)
                .join(out.select("doc_id").distinct(), "doc_id",
                      "left_semi")), "doc_id")
        return out.orderBy("query", F.round("score", round_dp).desc(),
                           F.col("doc_id").asc())

    def _per_shard_apply(self, seg: DataFrame,
                         filters: dict[str, str] | None,
                         score_fn) -> DataFrame:
        """Run ``score_fn(seg_pdf, allowed, extra_banned) -> pd.DataFrame``
        once per shard, with keyword filters and over-cap tombstones
        resolved EXECUTOR-SIDE — the shared scaffolding of every
        distributed query shape (single-query WAND, boolean, phrase).

        Keyword filters: the filtered docs table is cogrouped with the
        segment rows on ``shard``, so each task receives exactly its
        shard's allowed-id set — no driver collect, no size cap (the docs
        scan prunes to (doc_id, shard) + pushed filter predicates). An
        over-cap tombstone set resolves executor-side the same way:
        anti-joined out of the allowed set when filtering, else cogrouped
        per shard as the banned set — never materialized on the driver."""
        if filters:
            docs = (self.spark.read.parquet(self._docs_path)
                    .filter(self._filter_cond(filters))
                    .select("shard", "doc_id"))
            if self._tomb_oversize:
                docs = docs.join(self._tombstones_df(), "doc_id",
                                 "left_anti")

            def _cogrouped(seg_pdf: pd.DataFrame,
                           ids_pdf: pd.DataFrame) -> pd.DataFrame:
                if not len(seg_pdf):
                    return pd.DataFrame({"doc_id": [], "score": []})
                allowed = np.sort(
                    ids_pdf["doc_id"].to_numpy(dtype=np.int64, copy=False))
                return score_fn(seg_pdf, allowed, None)

            return (seg.groupBy("shard")
                    .cogroup(docs.groupBy("shard"))
                    .applyInPandas(_cogrouped, schema=RESULT_SCHEMA))
        if self._tomb_oversize:
            tomb = (self._tombstones_df()
                    .withColumn("shard",
                                F.pmod(F.col("doc_id"),
                                       F.lit(int(self.stats["num_shards"])))
                                .cast("int")))

            def _cogrouped_banned(seg_pdf: pd.DataFrame,
                                  tomb_pdf: pd.DataFrame) -> pd.DataFrame:
                if not len(seg_pdf):
                    return pd.DataFrame({"doc_id": [], "score": []})
                banned = np.sort(
                    tomb_pdf["doc_id"].to_numpy(dtype=np.int64, copy=False))
                return score_fn(seg_pdf, None, banned)

            return (seg.groupBy("shard")
                    .cogroup(tomb.groupBy("shard"))
                    .applyInPandas(_cogrouped_banned,
                                   schema=RESULT_SCHEMA))
        return seg.groupBy("shard").applyInPandas(
            lambda pdf: score_fn(pdf, None, None), schema=RESULT_SCHEMA)

    def _distributed(self, seg: DataFrame, idfs: dict[str, float],
                     avgdl: float, k: int, round_dp: int,
                     filters: dict[str, str] | None) -> DataFrame:
        """Per-shard WAND via applyInPandas, tiny global merge (see
        ``_per_shard_apply`` for how filters/tombstones resolve)."""
        sc = self.spark.sparkContext
        b_idfs = sc.broadcast(idfs)
        b_tomb = self._tomb_broadcast()
        taat_cap = self.taat_cap

        def _shard_wand(seg_pdf: pd.DataFrame,
                        allowed: np.ndarray | None,
                        extra_banned: np.ndarray | None
                        ) -> pd.DataFrame:
            rows = seg_pdf.to_dict("records")
            banned = (b_tomb.value if b_tomb is not None
                      else extra_banned)
            top = _score_shard_rows(rows, b_idfs.value, avgdl, k,
                                    round_dp, allowed, banned, taat_cap)
            return pd.DataFrame(
                {"doc_id": [d for d, _ in top],
                 "score": [s for _, s in top]})

        per_shard = self._per_shard_apply(seg, filters, _shard_wand)
        return (per_shard
                .orderBy(F.round("score", round_dp).desc(),
                         F.col("doc_id").asc())
                .limit(k))

    # -- boolean / phrase / prefix queries (ES query-DSL parity) ----------
    def _norm_clause(self, clause) -> list[str]:
        """A bool-query clause → ordered distinct token list. Strings run
        through the index's analyzer (ES ``match`` semantics); lists are
        taken as pre-analyzed terms verbatim (ES ``terms`` semantics —
        the prefix path feeds its expansions through here)."""
        if clause is None:
            return []
        if isinstance(clause, str):
            return list(dict.fromkeys(tokenize_py(clause, self.mode)))
        return list(dict.fromkeys(clause))

    @staticmethod
    def _union_docs(rows_by_term: dict[str, list[dict]],
                    terms: list[str]) -> np.ndarray:
        """Sorted unique doc_ids appearing in ANY of ``terms``' posting
        lists (vectorized whole-list decode; a term split across segment
        batches unions its batches)."""
        from deluge_spark.index.codec import decode_postings

        arrs = [decode_postings(r)[0]
                for t in terms for r in rows_by_term.get(t, [])]
        if not arrs:
            return np.empty(0, dtype=np.int64)
        return np.unique(np.concatenate(arrs))

    @classmethod
    def _bool_sets(cls, rows: list[dict], must: list[str],
                   must_not: list[str],
                   allowed: np.ndarray | None,
                   banned: np.ndarray | None,
                   should: list[str] | None = None,
                   msm: int = 0
                   ) -> tuple[np.ndarray | None, np.ndarray | None, bool]:
        """Resolve a bool query's candidate/exclusion sets against one
        scope's segment rows (a shard in distributed mode, the whole index
        in coordinator mode — doc_ids are shard-partitioned, so per-shard
        resolution is complete). Returns (allowed, banned, dead): the
        must-conjunction intersected into ``allowed``, must_not unioned
        into ``banned``; ``dead`` short-circuits an empty conjunction.

        ``msm`` > 0 (ES ``minimum_should_match``) additionally requires
        each candidate to contain at least ``msm`` distinct ``should``
        terms — a per-doc clause count over the already-decoded should
        postings (each term's doc set is unique, so concatenated
        multiplicity = matched-clause count), same O(Σ df) work class as
        the must resolution."""
        by_term: dict[str, list[dict]] = {}
        for r in rows:
            by_term.setdefault(r["term"], []).append(r)
        for t in must:
            dt = cls._union_docs(by_term, [t])
            allowed = dt if allowed is None else np.intersect1d(
                allowed, dt, assume_unique=True)
            if not len(allowed):
                return allowed, banned, True
        if msm > 0:
            present = [t for t in dict.fromkeys(should or [])
                       if t in by_term]
            if len(present) < msm:
                return allowed, banned, True
            cat = np.concatenate([cls._union_docs(by_term, [t])
                                  for t in present])
            ids, counts = np.unique(cat, return_counts=True)
            ok = ids[counts >= msm]
            allowed = ok if allowed is None else np.intersect1d(
                allowed, ok, assume_unique=True)
            if not len(allowed):
                return allowed, banned, True
        if must_not:
            mb = cls._union_docs(by_term, must_not)
            if len(mb):
                banned = mb if banned is None else np.union1d(banned, mb)
        return allowed, banned, False

    @staticmethod
    def _boosted(idfs: dict[str, float],
                 boosts: dict[str, float] | None) -> dict[str, float]:
        """Apply ES ``term^boost`` multipliers to the idf table (scores
        AND WAND upper bounds scale together, so pruning stays exact)."""
        if not boosts:
            return idfs
        bad = {t: b for t, b in boosts.items() if b <= 0}
        if bad:
            raise ValueError(f"boosts must be positive: {bad}")
        return {t: v * float(boosts.get(t, 1.0)) for t, v in idfs.items()}

    def _bool_terms(self, must, should, must_not):
        """Shared clause normalization + dictionary lookup for the bool
        paths. Returns (must, should, must_not token lists, dfs over all
        present involved terms, idfs over scoring terms) — or None when
        the query provably matches nothing (a must term absent from the
        dictionary, ES conjunction semantics)."""
        m = self._norm_clause(must)
        s = self._norm_clause(should)
        mn = set(self._norm_clause(must_not))
        if not m and not s:
            raise ValueError("bool query needs at least one must or "
                             "should clause (must_not alone matches "
                             "nothing scorable)")
        # a term in must/should AND must_not can never contribute: the doc
        # would be excluded — drop it from scoring (ES resolves identically)
        m = [t for t in m if t not in mn]
        s = [t for t in s if t not in mn]
        if isinstance(must, (str, list)) and self._norm_clause(must) and not m:
            return None  # every must term is also excluded → matches nothing
        involved = list(dict.fromkeys(m + s + list(mn)))
        dfs = self._term_dfs(involved)
        if any(t not in dfs for t in m):
            return None  # unknown must term → empty conjunction
        scoring = [t for t in m + s if t in dfs]
        if not scoring:
            return None
        n = self.stats["n_docs"]
        idfs = {t: idf(n, dfs[t]) for t in scoring}
        return m, scoring, sorted(t for t in mn if t in dfs), dfs, idfs

    def search_bool_local(self, must=None, should=None, must_not=None,
                          k: int = 10,
                          filters: dict[str, str] | None = None,
                          round_dp: int = 9,
                          minimum_should_match: int = 0,
                          boosts: dict[str, float] | None = None
                          ) -> list[tuple[int, float]]:
        """Coordinator-mode boolean search (ES ``bool`` query semantics):
        docs must contain EVERY ``must`` token, may contain ``should``
        tokens (both contribute BM25 score), and are excluded if they
        contain ANY ``must_not`` token. Scores are plain BM25 sums over
        the matched must+should terms — exclusion never changes survivor
        scores (ES/Lucene semantics, same contract as tombstones).

        Clauses are strings (analyzed) or pre-analyzed token lists. Cost:
        beyond scoring, the must/must_not posting lists are decoded once
        to resolve the candidate sets — O(Σ df) over those clauses, the
        same work ES does for its filter/exclusion contexts."""
        if self._tomb_oversize:
            raise TombstonesTooLarge(
                "tombstone set exceeds tombstone_driver_cap — use "
                "mode='distributed' or purge_deleted()")
        bt = self._bool_terms(must, should, must_not)
        if bt is None:
            return []
        m, scoring, mn, dfs, idfs = bt
        idfs = self._boosted(idfs, boosts)
        avgdl = float(self.stats["avgdl"])
        allowed = self._allowed_ids(filters)
        rows = self._fetch_term_rows(list(dict.fromkeys(
            m + scoring + mn)))
        allowed, banned, dead = self._bool_sets(
            rows, m, mn, allowed, self._tombstones,
            self._norm_clause(should), minimum_should_match)
        if dead:
            return []
        srows = [r for r in rows if r["term"] in set(scoring)]
        if sum(dfs[t] for t in scoring) <= self.taat_cap:
            return taat_top_k(srows, idfs, avgdl, k, round_dp, allowed,
                              banned)
        by_shard: dict[int, list[dict]] = {}
        for r in srows:
            by_shard.setdefault(int(r["shard"]), []).append(r)
        merged: list[tuple[int, float]] = []
        for shard_rows in by_shard.values():
            its = [PostingIterator(r, idfs[r["term"]], avgdl)
                   for r in shard_rows]
            merged.extend(wand_top_k(its, k, round_dp, allowed, banned))
        merged.sort(key=lambda x: (-round(x[1], round_dp), x[0]))
        return merged[:k]

    def _distributed_bool(self, seg: DataFrame, idfs: dict[str, float],
                          scoring: list[str], must: list[str],
                          must_not: list[str], avgdl: float, k: int,
                          round_dp: int,
                          filters: dict[str, str] | None,
                          exhaustive: bool = False,
                          should: list[str] | None = None,
                          msm: int = 0) -> DataFrame:
        """Distributed bool execution: per-shard candidate-set resolution
        (conjunction/exclusion over decoded postings) + scoring in ONE
        applyInPandas pass — posting bytes never leave the executors.
        ``exhaustive=True`` returns EVERY candidate with its score (no
        per-shard top-k) — the phrase path needs the full candidate set
        because verification prunes it afterwards."""
        sc = self.spark.sparkContext
        b_idfs = sc.broadcast(idfs)
        b_tomb = self._tomb_broadcast()
        taat_cap = self.taat_cap
        scoring_set = frozenset(scoring)

        def _shard_bool(seg_pdf: pd.DataFrame,
                        allowed: np.ndarray | None,
                        extra_banned: np.ndarray | None) -> pd.DataFrame:
            rows = seg_pdf.to_dict("records")
            banned = (b_tomb.value if b_tomb is not None
                      else extra_banned)
            allowed2, banned2, dead = Searcher._bool_sets(
                rows, must, must_not, allowed, banned, should, msm)
            if dead:
                return pd.DataFrame({"doc_id": [], "score": []})
            srows = [r for r in rows if r["term"] in scoring_set]
            if exhaustive:
                kk = (len(allowed2) if allowed2 is not None
                      else sum(int(r["n_postings"]) for r in srows))
                top = taat_top_k(srows, b_idfs.value, avgdl, max(kk, 1),
                                 round_dp, allowed2, banned2)
            else:
                top = _score_shard_rows(srows, b_idfs.value, avgdl, k,
                                        round_dp, allowed2, banned2,
                                        taat_cap)
            return pd.DataFrame(
                {"doc_id": [d for d, _ in top],
                 "score": [s for _, s in top]})

        per_shard = self._per_shard_apply(seg, filters, _shard_bool)
        if exhaustive:
            return per_shard
        return (per_shard
                .orderBy(F.round("score", round_dp).desc(),
                         F.col("doc_id").asc())
                .limit(k))

    def search_bool(self, must=None, should=None, must_not=None,
                    k: int = 10,
                    filters: dict[str, str] | None = None,
                    mode: str = "auto", round_dp: int = 9,
                    fetch: bool = False,
                    minimum_should_match: int = 0,
                    boosts: dict[str, float] | None = None) -> DataFrame:
        """Boolean top-k BM25 search → DataFrame(doc_id, score[, fields]).

        ES ``bool`` query parity (B5/B7 extension): ``must`` tokens are a
        conjunctive gate AND score; ``should`` tokens score; ``must_not``
        tokens exclude. Keyword ``filters`` compose (the ES filter
        context). mode='auto' picks coordinator vs distributed from the
        dictionary like ``search`` (Σ df over ALL involved terms, since
        must/must_not lists are decoded for set resolution).

        ``minimum_should_match`` (ES semantics): candidates must contain
        at least that many distinct ``should`` terms; 0 keeps the default
        (should-optional with a must, any-should without one). Scores are
        unchanged — the constraint only gates candidacy.

        ``boosts`` (ES ``term^boost``): per-analyzed-token multiplier on
        that term's score contribution — applied to the term's idf, so
        WAND's per-term upper bounds scale with it and pruning stays
        exact."""
        if minimum_should_match < 0:
            raise ValueError("minimum_should_match must be >= 0")
        bt = self._bool_terms(must, should, must_not)
        if bt is None:
            return self._empty()
        m, scoring, mn, dfs, idfs = bt
        idfs = self._boosted(idfs, boosts)
        avgdl = float(self.stats["avgdl"])
        seg = self._segments().filter(
            F.col("term").isin(list(dict.fromkeys(m + scoring + mn))))
        auto = mode == "auto"
        if auto:
            mode = ("coordinator"
                    if sum(dfs.values()) <= self.local_postings_cap
                    else "distributed")
        if mode not in ("coordinator", "distributed"):
            raise ValueError(f"unknown mode: {mode}")
        if mode == "coordinator":
            try:
                top = self.search_bool_local(must, should, must_not, k,
                                             filters, round_dp,
                                             minimum_should_match, boosts)
                out = self._local_df(
                    [(int(d), float(s)) for d, s in top], RESULT_SCHEMA)
            except (FilterTooUnselective, TombstonesTooLarge):
                if not auto:
                    raise
                mode = "distributed"
        if mode == "distributed":
            out = self._distributed_bool(seg, idfs, scoring, m, mn,
                                         avgdl, k, round_dp, filters,
                                         should=self._norm_clause(should),
                                         msm=minimum_should_match)
        if fetch:
            out = self._fetch_fields(out)
        return out.orderBy(F.round("score", round_dp).desc(),
                           F.col("doc_id").asc())

    def search_phrase(self, phrase: str, k: int = 10,
                      filters: dict[str, str] | None = None,
                      round_dp: int = 9, fetch: bool = False,
                      content_df: DataFrame | None = None,
                      content_col: str = "content") -> DataFrame:
        """Exact-phrase top-k search (ES ``match_phrase``, slop 0) →
        DataFrame(doc_id, score[, fields]).

        Two distributed stages, both executor-side:

        1. **Candidates**: docs containing ALL the phrase's tokens — the
           bool conjunction over the postings (exhaustive scores, since
           verification prunes afterwards). The index stores no
           positions, so adjacency can't resolve here.
        2. **Verify**: candidates join the stored ``content`` and the
           JVM-side tokenizer twin re-analyzes ONLY those docs; adjacency
           is a contiguous-subsequence check on the token stream
           (space-joined contains — tokens never contain spaces). The
           re-analyze cost is O(candidate content bytes), the classic
           positions-free phrase plan; candidates are already conjunction
           -pruned, so selective phrases touch few docs.

        Scoring: BM25 over the phrase's distinct terms with full-document
        tf (NOT phrase frequency — documented divergence from ES, chosen
        so scores stay oracle-checkable in ANSI SQL). ``content_df``
        overrides the content source (doc_id + ``content_col``) for
        indexes built with ``store_content=False``."""
        toks = tokenize_py(phrase, self.mode)
        if not toks:
            return self._empty()
        uniq = list(dict.fromkeys(toks))
        dfs = self._term_dfs(uniq)
        if any(t not in dfs for t in uniq):
            return self._empty()
        n = self.stats["n_docs"]
        idfs = {t: idf(n, dfs[t]) for t in uniq}
        avgdl = float(self.stats["avgdl"])
        seg = self._segments().filter(F.col("term").isin(uniq))
        cand = self._distributed_bool(seg, idfs, uniq, uniq, [], avgdl,
                                      k, round_dp, filters,
                                      exhaustive=True)
        content_df = self._content_source(content_df, content_col,
                                          "phrase verification")
        from deluge_spark.operators.dedup import tokens_col

        needle = " " + " ".join(toks) + " "
        hay = F.concat(F.lit(" "),
                       F.array_join(tokens_col(content_col, self.mode),
                                    " "),
                       F.lit(" "))
        out = (cand.join(content_df, "doc_id")
               .filter(hay.contains(needle))
               .select("doc_id", "score"))
        out = (out.orderBy(F.round("score", round_dp).desc(),
                           F.col("doc_id").asc())
               .limit(k))
        if fetch:
            out = self._fetch_fields(out)
        return out.orderBy(F.round("score", round_dp).desc(),
                           F.col("doc_id").asc())

    def expand_prefix(self, prefix: str,
                      max_expansions: int = 50) -> list[str]:
        """Dictionary expansion for prefix queries: terms starting with
        ``prefix`` (literal, after lowercasing), highest-df first then
        lexicographic — ES ``max_expansions``-style deterministic cap.
        Free from the driver-cached dictionary; one pushed-predicate
        parquet scan of the (tiny) terms table otherwise."""
        p = prefix.lower()
        if not p:
            raise ValueError("empty prefix")
        if self._df_map is not None:
            cand = [(t, d) for t, d in self._df_map.items()
                    if t.startswith(p)]
            cand.sort(key=lambda x: (-x[1], x[0]))
            return [t for t, _ in cand[:max_expansions]]
        rows = (self.spark.read.parquet(self._terms_path)
                .filter(F.col("term").startswith(p))
                .select("term", "df")
                .orderBy(F.col("df").desc(), F.col("term").asc())
                .limit(max_expansions).collect())
        return [r["term"] for r in rows]

    def search_prefix(self, prefix: str, k: int = 10,
                      max_expansions: int = 50,
                      filters: dict[str, str] | None = None,
                      mode: str = "auto", round_dp: int = 9,
                      fetch: bool = False) -> DataFrame:
        """Prefix top-k search (ES ``prefix`` query with
        ``rewrite=scoring_boolean``): expand against the dictionary
        (df-desc, capped at ``max_expansions``), then score the expanded
        terms as a disjunction with each term's own idf."""
        terms = self.expand_prefix(prefix, max_expansions)
        if not terms:
            return self._empty()
        return self.search_bool(should=terms, k=k, filters=filters,
                                mode=mode, round_dp=round_dp, fetch=fetch)

    def expand_wildcard(self, pattern: str,
                        max_expansions: int = 50) -> list[str]:
        """Dictionary expansion for ES ``wildcard`` queries: ``*`` = any
        run, ``?`` = one char, anchored at both ends; highest-df first
        then lexicographic, capped at ``max_expansions``. The scan is one
        pass over the driver-cached dictionary (or a pushed startswith
        prefix scan of the tiny terms table) — a leading wildcard costs
        the same dictionary pass, not the index walk it costs Lucene."""
        import fnmatch

        p = pattern.lower()
        if not p.strip("*?"):
            raise ValueError("wildcard pattern needs at least one "
                             "literal character")
        if self._df_map is not None:
            cand = [(t, d) for t, d in self._df_map.items()
                    if fnmatch.fnmatchcase(t, p)]
            cand.sort(key=lambda x: (-x[1], x[0]))
            return [t for t, _ in cand[:max_expansions]]
        terms = self.spark.read.parquet(self._terms_path)
        lead = p.split("*", 1)[0].split("?", 1)[0]
        if lead:  # anchor a literal prefix so the scan prunes
            terms = terms.filter(F.col("term").startswith(lead))
        # analyzed terms are [a-z0-9]+ (no literal % or _), so the LIKE
        # translation needs no escaping
        like = p.replace("*", "%").replace("?", "_")
        rows = (terms.filter(F.col("term").like(like))
                .select("term", "df")
                .orderBy(F.col("df").desc(), F.col("term").asc())
                .limit(max_expansions).collect())
        return [r["term"] for r in rows]

    def search_wildcard(self, pattern: str, k: int = 10,
                        max_expansions: int = 50,
                        filters: dict | None = None,
                        mode: str = "auto", round_dp: int = 9,
                        fetch: bool = False) -> DataFrame:
        """Wildcard top-k search (ES ``wildcard`` query with
        ``rewrite=scoring_boolean``): expand against the dictionary, then
        score the expansions as a disjunction with per-term idf — the
        same rewrite/scoring path as prefix and fuzzy."""
        terms = self.expand_wildcard(pattern, max_expansions)
        if not terms:
            return self._empty()
        return self.search_bool(should=terms, k=k, filters=filters,
                                mode=mode, round_dp=round_dp, fetch=fetch)

    @staticmethod
    def _auto_fuzziness(term: str) -> int:
        """ES ``fuzziness: AUTO``: 0 edits under 3 chars, 1 for 3-5,
        2 above."""
        n = len(term)
        return 0 if n < 3 else (1 if n <= 5 else 2)

    @staticmethod
    def _edit_distance(a: str, b: str, cap: int) -> int:
        """Banded Levenshtein with early exit: returns min(distance,
        cap + 1). O(len·cap) — the dictionary pre-filter keeps calls
        cheap."""
        if abs(len(a) - len(b)) > cap:
            return cap + 1
        if len(a) > len(b):
            a, b = b, a
        prev = list(range(len(a) + 1))
        for j, cb in enumerate(b, 1):
            cur = [j]
            best = j
            for i, ca in enumerate(a, 1):
                d = min(prev[i] + 1, cur[i - 1] + 1,
                        prev[i - 1] + (ca != cb))
                cur.append(d)
                best = min(best, d)
            if best > cap:
                return cap + 1
            prev = cur
        return prev[-1]

    def _fuzzy_scan(self, q: str, e: int,
                    pre: str) -> list[tuple[int, int, str]]:
        """(distance, df, term) triples within ``e`` edits of ``q`` from
        the driver-cached dictionary; length band + optional exact prefix
        prune before any edit-distance work."""
        lo, hi = len(q) - e, len(q) + e
        out = []
        for t, d in self._df_map.items():
            if not (lo <= len(t) <= hi):
                continue
            if pre and not t.startswith(pre):
                continue
            dist = self._edit_distance(t, q, e)
            if dist <= e:
                out.append((dist, d, t))
        return out

    def expand_fuzzy(self, term: str, max_edits: int | str = "auto",
                     max_expansions: int = 50,
                     prefix_length: int = 0) -> list[str]:
        """Dictionary expansion for fuzzy queries (ES ``fuzzy`` /
        ``match`` with ``fuzziness``): dictionary terms within
        ``max_edits`` Levenshtein edits of the analyzed ``term``,
        ordered (distance asc, df desc, term asc), capped at
        ``max_expansions``. ``prefix_length`` pins the first chars exact
        (the ES knob that keeps the candidate set tiny at scale: a
        pinned prefix becomes a pushed ``startswith`` predicate on the
        terms parquet, and the length band prunes the rest before any
        edit-distance work). ``max_edits="auto"`` is ES AUTO fuzziness.

        Driver-cached dictionary → pure-Python banded DP; otherwise one
        pushed-predicate scan of the (tiny) terms table with JVM-side
        ``levenshtein``."""
        q = term.lower()
        if not q:
            raise ValueError("empty fuzzy term")
        e = self._auto_fuzziness(q) if max_edits == "auto" else int(max_edits)
        if e < 0:
            raise ValueError("max_edits must be >= 0")
        if e == 0:
            return [q] if self._term_dfs([q]) else []
        pre = q[:prefix_length] if prefix_length > 0 else ""
        lo, hi = len(q) - e, len(q) + e
        if self._df_map is not None:
            cand = [(dist, -d, t)
                    for dist, d, t in self._fuzzy_scan(q, e, pre)]
            cand.sort()
            return [t for _, _, t in cand[:max_expansions]]
        tdf = self.spark.read.parquet(self._terms_path)
        cond = F.length("term").between(lo, hi)
        if pre:
            cond = cond & F.col("term").startswith(pre)
        rows = (tdf.filter(cond)
                .withColumn("dist", F.levenshtein(F.col("term"), F.lit(q)))
                .filter(F.col("dist") <= e)
                .orderBy(F.col("dist").asc(), F.col("df").desc(),
                         F.col("term").asc())
                .limit(max_expansions).collect())
        return [r["term"] for r in rows]

    def search_fuzzy(self, term: str, k: int = 10,
                     max_edits: int | str = "auto",
                     max_expansions: int = 50, prefix_length: int = 0,
                     filters: dict | None = None,
                     mode: str = "auto", round_dp: int = 9,
                     fetch: bool = False) -> DataFrame:
        """Fuzzy top-k search (ES ``fuzzy`` query with
        ``rewrite=scoring_boolean``): expand against the dictionary
        within the edit budget, then score the expanded terms as a
        disjunction with each term's own idf — the same rewrite as
        ``search_prefix``, so the scoring path (cost-based TAAT/WAND,
        distributed per-shard cogroup) is shared."""
        terms = self.expand_fuzzy(term, max_edits, max_expansions,
                                  prefix_length)
        if not terms:
            return self._empty()
        return self.search_bool(should=terms, k=k, filters=filters,
                                mode=mode, round_dp=round_dp, fetch=fetch)

    def suggest_terms(self, text: str, size: int = 5,
                      max_edits: int | str = "auto",
                      prefix_length: int = 1,
                      suggest_mode: str = "missing") -> DataFrame:
        """ES ``term`` suggester (did-you-mean): for each analyzed token
        of ``text``, dictionary terms within the edit budget ranked
        (distance asc, df desc, term asc), ``size`` per token →
        DataFrame(token, suggestion, df, distance).

        ``suggest_mode`` (ES semantics): ``missing`` (default) suggests
        only for tokens absent from the dictionary, ``popular`` only
        suggestions with higher df than the token's own, ``always`` for
        every token. ``prefix_length=1`` is the ES default — the pinned
        first character keeps the candidate scan tiny. Driver-cached
        dictionary → banded-DP scan (the coordinating-node dictionary,
        zero Spark jobs); otherwise one pushed-predicate pass over the
        tiny terms table with JVM ``levenshtein``."""
        if suggest_mode not in ("missing", "popular", "always"):
            raise ValueError(f"unknown suggest_mode: {suggest_mode}")
        schema = "token string, suggestion string, df long, distance long"
        toks = list(dict.fromkeys(tokenize_py(text, self.mode)))
        dfs = self._term_dfs(toks)
        work = []                       # (token, edit budget, own df)
        for tok in toks:
            e = (self._auto_fuzziness(tok) if max_edits == "auto"
                 else int(max_edits))
            if e <= 0:
                continue
            if suggest_mode == "missing" and tok in dfs:
                continue
            work.append((tok, e, int(dfs.get(tok, 0))))
        if not work:
            return _empty_frame(self.spark, schema)
        order = [F.col("token").asc(), F.col("distance").asc(),
                 F.col("df").desc(), F.col("suggestion").asc()]
        if self._df_map is not None:
            rows = []
            for tok, e, own in work:
                pre = tok[:prefix_length] if prefix_length > 0 else ""
                cand = [(d, df, t) for d, df, t in
                        self._fuzzy_scan(tok, e, pre) if t != tok]
                if suggest_mode == "popular":
                    cand = [c for c in cand if c[1] > own]
                cand.sort(key=lambda c: (c[0], -c[1], c[2]))
                rows += [(tok, t, int(df), int(d))
                         for d, df, t in cand[:size]]
            return self._local_df(rows, schema).orderBy(*order)
        toks_df = F.broadcast(self.spark.createDataFrame(
            work, "token string, e int, own_df long"))
        tdf = self.spark.read.parquet(self._terms_path)
        cand = (tdf.join(toks_df,
                         (F.length("term")
                          .between(F.length("token") - F.col("e"),
                                   F.length("token") + F.col("e")))
                         & (F.col("term") != F.col("token"))
                         & ((F.lit(prefix_length) <= 0)
                            | (F.substring("term", 1, prefix_length)
                               == F.substring("token", 1, prefix_length))))
                .withColumn("distance",
                            F.levenshtein(F.col("term"), F.col("token"))
                            .cast("long"))
                .filter(F.col("distance") <= F.col("e")))
        if suggest_mode == "popular":
            cand = cand.filter(F.col("df") > F.col("own_df"))
        w = Window.partitionBy("token").orderBy(
            F.col("distance").asc(), F.col("df").desc(),
            F.col("term").asc())
        return (cand.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") <= size)
                .select("token", F.col("term").alias("suggestion"),
                        F.col("df").cast("long").alias("df"), "distance")
                .orderBy(*order))

    def _content_source(self, content_df: DataFrame | None,
                        content_col: str, what: str) -> DataFrame:
        """Stored-content frame (doc_id + ``content_col``) for operators
        that must read document text; ``content_df`` overrides for
        indexes built with ``store_content=False``."""
        if content_df is None:
            docs = self.spark.read.parquet(self._docs_path)
            if content_col not in docs.columns:
                raise ValueError(
                    f"{what} needs stored content: the index was built "
                    "with store_content=False — pass content_df="
                    "(doc_id, content) explicitly")
            content_df = docs
        return content_df.select("doc_id", content_col)

    def highlight(self, query: str, k: int = 10, frag_size: int = 100,
                  pre_tag: str = "<em>", post_tag: str = "</em>",
                  filters: dict | None = None, mode: str = "auto",
                  round_dp: int = 9,
                  content_df: DataFrame | None = None,
                  content_col: str = "content") -> DataFrame:
        """ES ``highlight``: top-k search, then a snippet of the stored
        content around the matched term → DataFrame(doc_id, score,
        snippet).

        Deterministic contract (so the result is oracle-checkable in
        ANSI SQL): the highlighted term is the FIRST term in analyzed
        query order whose lowercase substring occurs in the lowercased
        content (every analyzed token is a contiguous run of the
        lowercased text, so a scoring term always occurs); the fragment
        is ``frag_size`` chars starting ``frag_size/2`` before the first
        occurrence (clamped to the start), with that occurrence wrapped
        in ``pre_tag``/``post_tag``. One fragment per doc (ES
        ``number_of_fragments: 1``).

        Cost: the snippet stage touches only the k result docs — a
        broadcast-size join against the docs table with every string op
        JVM-side (locate/substring inside whole-stage codegen), no
        Python UDFs."""
        terms = list(dict.fromkeys(tokenize_py(query, self.mode)))
        if not terms:
            return _empty_frame(self.spark, "doc_id long, score double, snippet string")
        out = self._pin_small(self.search(query, k, filters=filters,
                                          mode=mode, round_dp=round_dp))
        content = self._content_source(content_df, content_col,
                                       "highlight")
        # the k result ids are already driver-side (pinned): push them
        # into the content scan as an IN predicate — parquet row-group
        # skipping serves the point lookups, no semi-join subtree
        ids = [int(r["doc_id"]) for r in out.collect()]
        joined = out.join(F.broadcast(
            content.filter(F.col("doc_id").isin(ids))), "doc_id")
        low = F.lower(F.col(content_col))
        matched = F.coalesce(*[F.when(F.locate(t, low) > 0, F.lit(t))
                               for t in terms], F.lit(terms[0]))
        pos = F.coalesce(*[F.when(F.locate(t, low) > 0, F.locate(t, low))
                           for t in terms], F.lit(1))
        start = F.greatest(F.lit(1), pos - F.lit(frag_size // 2))
        rel = pos - start + F.lit(1)
        raw = F.substring(F.col(content_col), start, F.lit(frag_size))
        tlen = F.length(matched)
        snippet = F.concat(
            F.substring(raw, F.lit(1), rel - 1),
            F.lit(pre_tag),
            F.substring(raw, rel, tlen),
            F.lit(post_tag),
            F.substring(raw, rel + tlen, F.lit(frag_size)))
        return (joined.select("doc_id", "score",
                              snippet.alias("snippet"))
                .orderBy(F.round("score", round_dp).desc(),
                         F.col("doc_id").asc()))

    def more_like_this(self, doc_id: int, k: int = 10,
                       max_query_terms: int = 25, min_term_freq: int = 2,
                       min_doc_freq: int = 5,
                       filters: dict | None = None, mode: str = "auto",
                       round_dp: int = 9, fetch: bool = False,
                       content_df: DataFrame | None = None,
                       content_col: str = "content") -> DataFrame:
        """ES ``more_like_this`` for one stored document: re-analyze the
        source doc (one pushed-predicate point lookup — exactly ES's
        _source re-analysis), keep terms with tf >= ``min_term_freq``
        and dictionary df >= ``min_doc_freq``, rank by tf·idf (tie:
        term asc), take ``max_query_terms``, and run them as a scored
        disjunction excluding the source doc. Defaults mirror ES
        (max_query_terms 25, min_term_freq 2, min_doc_freq 5)."""
        from collections import Counter

        content = self._content_source(content_df, content_col,
                                       "more_like_this")
        row = (content.filter(F.col("doc_id") == doc_id)
               .select(content_col).first())
        if row is None:
            raise ValueError(f"doc_id {doc_id} not found")
        c = Counter(tokenize_py(row[0], self.mode))
        dfs = self._term_dfs(list(c))
        n = self.stats["n_docs"]
        cand = [(-tf * idf(n, dfs[t]), t)
                for t, tf in c.items()
                if tf >= min_term_freq and dfs.get(t, 0) >= min_doc_freq]
        cand.sort()
        sel = [t for _, t in cand[:max_query_terms]]
        if not sel:
            return self._empty()
        out = self.search_bool(should=sel, k=k + 1, filters=filters,
                               mode=mode, round_dp=round_dp)
        # top-(k+1) then drop the source = exact top-k excluding it
        # (the ordering is a strict total order: rounded score desc,
        # doc_id asc)
        out = (out.filter(F.col("doc_id") != doc_id)
               .orderBy(F.round("score", round_dp).desc(),
                        F.col("doc_id").asc())
               .limit(k))
        if fetch:
            out = self._fetch_fields(out)
            out = out.orderBy(F.round("score", round_dp).desc(),
                              F.col("doc_id").asc())
        return out

    # -- aggregations over the match set (ES aggs parity) -----------------
    def _match_ids(self, query: str,
                   filters: dict[str, str] | None = None,
                   distinct: bool = True) -> DataFrame | None:
        """Distinct doc_ids matching ANY of the query's analyzed terms —
        the ES query-context match SET (not top-k). Decodes only the
        matched terms' postings (pushed ``term`` predicate on the segment
        scan, vectorized whole-batch decode), applies keyword filters via
        a semi-join, and anti-joins the open-time tombstone snapshot.
        Returns None for a query with no known terms."""
        from deluge_spark.index.build import tf_from_segments

        terms = list(dict.fromkeys(tokenize_py(query, self.mode)))
        terms = [t for t in self._term_dfs(terms)]
        if not terms:
            return None
        ids = tf_from_segments(self.spark, self.index_dir, terms=terms,
                               seg_df=self._seg).select("doc_id")
        if distinct:
            # count() needs the set; LEFT SEMI consumers pass
            # distinct=False — semi-join semantics dedup for free, saving
            # the distinct exchange (guide §2.4)
            ids = ids.distinct()
        if filters:
            docs = self.spark.read.parquet(self._docs_path)
            ids = ids.join(docs.filter(self._filter_cond(filters))
                           .select("doc_id"), "doc_id", "left_semi")
        tomb = self._tombstones_df()
        if tomb is not None:
            ids = ids.join(tomb, "doc_id", "left_anti")
        return ids

    def count(self, query: str, filters: dict | None = None) -> int:
        """ES ``_count`` API: size of the query-context match set (any
        analyzed term present) under optional filters — one distributed
        count over the pushed-predicate postings decode, no scoring, no
        top-k."""
        ids = self._match_ids(query, filters)
        return 0 if ids is None else ids.count()

    def explain_score(self, query: str, doc_id: int,
                      round_dp: int = 9) -> DataFrame:
        """ES ``_explain`` API: the per-term BM25 breakdown of one doc's
        score for a query → DataFrame(term, tf, df, idf, contribution)
        ordered term asc. Terms the doc lacks contribute rows with
        tf=0/contribution=0 (ES shows the full query structure).

        The tf lookup is a pushed (term IN …) segment decode filtered to
        one doc_id — postings for other docs never leave the executors."""
        from deluge_spark.index.build import tf_from_segments
        from deluge_spark.index.score import B, K1

        terms = list(dict.fromkeys(tokenize_py(query, self.mode)))
        dfs = self._term_dfs(terms)
        terms = [t for t in terms if t in dfs]
        schema = ("term string, tf long, df long, idf double, "
                  "contribution double")
        if not terms:
            return _empty_frame(self.spark, schema)
        n = self.stats["n_docs"]
        avgdl = float(self.stats["avgdl"])
        tf = (tf_from_segments(self.spark, self.index_dir, terms=terms)
              .filter(F.col("doc_id") == doc_id)
              .select("term", "tf", "dl"))
        base = self._local_df(
            [(t, int(dfs[t])) for t in terms], "term string, df long")
        joined = base.join(tf, "term", "left")
        idf_col = F.log(F.lit(1.0)
                        + (F.lit(float(n)) - F.col("df") + 0.5)
                        / (F.col("df") + 0.5))
        tf_c = F.coalesce(F.col("tf"), F.lit(0)).cast("long")
        norm = (tf_c.cast("double") * (K1 + 1.0)
                / (tf_c.cast("double")
                   + K1 * (1.0 - B + B * F.col("dl") / F.lit(avgdl))))
        contrib = F.when(tf_c > 0, F.round(idf_col * norm, round_dp)) \
                   .otherwise(F.lit(0.0))
        return (joined.select(
                    "term", tf_c.alias("tf"), "df",
                    F.round(idf_col, round_dp).alias("idf"),
                    contrib.alias("contribution"))
                .orderBy(F.col("term").asc()))

    def facet_terms(self, query: str, by: str = "lang", size: int = 10,
                    filters: dict[str, str] | None = None) -> DataFrame:
        """ES ``terms`` aggregation: matching-doc counts per value of a
        stored keyword field → DataFrame(value, n_docs), count desc then
        value asc, top ``size``. Counts cover the WHOLE match set (every
        doc containing ≥1 query term), not the top-k — one distributed
        plan: pushed-predicate postings decode → distinct ids → semi-join
        facet column → hash aggregate. All exact, no sketching."""
        ids = self._match_ids(query, filters, distinct=False)
        if ids is None:
            return _empty_frame(self.spark, "value string, n_docs long")
        docs = self.spark.read.parquet(self._docs_path)
        return (docs.select("doc_id", F.col(by).cast("string")
                            .alias("value"))
                .join(ids, "doc_id", "left_semi")
                .groupBy("value")
                .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
                .orderBy(F.col("n_docs").desc(), F.col("value").asc())
                .limit(size))

    def facet_histogram(self, query: str, interval: int,
                        filters: dict[str, str] | None = None
                        ) -> DataFrame:
        """ES ``histogram`` aggregation over document length: bucket =
        floor(dl / interval) * interval over the match set →
        DataFrame(bucket, n_docs) ordered by bucket. dl comes from the
        per-doc meta table (no re-tokenize)."""
        if interval <= 0:
            raise ValueError("interval must be positive")
        mv = self._match_field(query, "dl", filters)
        if mv is None:
            return _empty_frame(self.spark, "bucket long, n_docs long")
        return (mv.select((F.floor(F.col("v") / interval)
                           * interval).cast("long").alias("bucket"))
                .groupBy("bucket")
                .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
                .orderBy(F.col("bucket").asc()))

    def _match_field(self, query: str, field: str,
                     filters: dict | None) -> DataFrame | None:
        """(doc_id, v) for one stored field over the match set — ``dl``
        resolves from the per-doc meta table, everything else from the
        docs table. Returns None when no query term is known."""
        if field == "dl":
            # dl rides on every decoded posting row (the single-analysis-
            # pass invariant), so the match set's dl values come straight
            # out of the postings decode — no docs_meta scan, no semi-join
            # (guide §2.4). Identical values: docs_meta was written FROM
            # these same rows.
            from deluge_spark.index.build import tf_from_segments

            terms = list(dict.fromkeys(tokenize_py(query, self.mode)))
            terms = [t for t in self._term_dfs(terms)]
            if not terms:
                return None
            mv = (tf_from_segments(self.spark, self.index_dir, terms=terms,
                                   seg_df=self._seg)
                  .groupBy("doc_id")
                  .agg(F.max("dl").cast("long").alias("v")))
            if filters:
                docs = self.spark.read.parquet(self._docs_path)
                mv = mv.join(docs.filter(self._filter_cond(filters))
                             .select("doc_id"), "doc_id", "left_semi")
            tomb = self._tombstones_df()
            if tomb is not None:
                mv = mv.join(tomb, "doc_id", "left_anti")
            return mv.select("doc_id", "v")
        ids = self._match_ids(query, filters, distinct=False)
        if ids is None:
            return None
        src = self.spark.read.parquet(self._docs_path)
        return (src.select("doc_id", F.col(field).alias("v"))
                .join(ids, "doc_id", "left_semi"))

    def facet_stats(self, query: str, field: str,
                    filters: dict | None = None,
                    round_dp: int = 6) -> DataFrame:
        """ES ``stats`` aggregation over a numeric stored field for the
        match set → one row (n_docs, min_v, max_v, avg_v, sum_v). One
        distributed plan: pushed-predicate postings decode → distinct ids
        → semi-join the field column (column-pruned scan) → a single
        map-side-combinable aggregate. The sum runs in the field's exact
        integer type when integral, so avg = sum/count is deterministic
        across partitionings (no float reduction-order drift); ``avg_v``
        is rounded to ``round_dp``."""
        mv = self._match_field(query, field, filters)
        if mv is None:
            return _empty_frame(self.spark, "n_docs long, min_v double, max_v double, "
                    "avg_v double, sum_v double")
        agg = mv.agg(
            F.count("v").cast("long").alias("n_docs"),
            F.min("v").cast("double").alias("min_v"),
            F.max("v").cast("double").alias("max_v"),
            F.sum("v").alias("_sum"))
        return agg.select(
            "n_docs", "min_v", "max_v",
            F.round(F.col("_sum").cast("double") / F.col("n_docs"),
                    round_dp).alias("avg_v"),
            F.col("_sum").cast("double").alias("sum_v"))

    def facet_cardinality(self, query: str, field: str,
                          filters: dict | None = None,
                          exact: bool = True, rsd: float = 0.05
                          ) -> DataFrame:
        """ES ``cardinality`` aggregation: distinct values of a stored
        field over the match set → one row (n_values). ``exact=True``
        is a distinct-shuffle count (oracle-checkable); ``exact=False``
        is HyperLogLog++ (``approx_count_distinct`` at relative error
        ``rsd``) — fixed sketch memory per partition, merge-combinable,
        the 100 TB path exactly as ES's own HLL cardinality."""
        mv = self._match_field(query, field, filters)
        if mv is None:
            return _empty_frame(self.spark, "n_values long")
        c = (F.countDistinct("v") if exact
             else F.approx_count_distinct("v", rsd))
        return mv.agg(c.cast("long").alias("n_values"))

    def facet_percentiles(self, query: str, field: str,
                          percents: list[float] = (25.0, 50.0, 75.0,
                                                   95.0, 99.0),
                          filters: dict | None = None,
                          exact: bool = True, accuracy: int = 10000,
                          round_dp: int = 6) -> DataFrame:
        """ES ``percentiles`` aggregation over a numeric stored field for
        the match set → DataFrame(percent, value) ordered percent asc,
        linear interpolation (SQL ``percentile``/``quantile_cont``
        semantics — documented divergence from ES's TDigest estimates,
        chosen so exact mode is ANSI-oracle-checkable).

        ``exact=True`` runs Spark's exact ``percentile`` (one sort-based
        aggregate over the matched values). ``exact=False`` is the 100 TB
        path: ``approx_percentile`` (Greenwald-Khanna, fixed memory per
        partition, merge-combinable) at the given ``accuracy`` — the same
        bounded-sketch trade ES makes with TDigest."""
        ps = [float(p) for p in percents]
        if not ps or any(not 0.0 <= p <= 100.0 for p in ps):
            raise ValueError("percents must be within [0, 100]")
        mv = self._match_field(query, field, filters)
        if mv is None:
            return _empty_frame(self.spark, "percent double, value double")
        frac = ", ".join(repr(p / 100.0) for p in ps)
        fn = "percentile" if exact else "approx_percentile"
        extra = "" if exact else f", {int(accuracy)}"
        agg = mv.select(F.expr(
            f"{fn}(v, array({frac}){extra})").alias("q"))
        pairs = F.arrays_zip(
            F.array(*[F.lit(p) for p in ps]).alias("percent"),
            F.col("q").cast("array<double>").alias("value"))
        return (agg.select(F.explode(pairs).alias("pv"))
                .select(F.col("pv.percent").alias("percent"),
                        F.round(F.col("pv.value"), round_dp).alias("value"))
                .orderBy("percent"))

    def facet_top_hits(self, query: str, by: str, sort_by: str,
                       hits_per_bucket: int = 3, buckets: int = 10,
                       ascending: bool = False,
                       filters: dict | None = None) -> DataFrame:
        """ES ``top_hits`` sub-aggregation under a ``terms`` bucket (also
        the shape of ES field collapsing): for the ``buckets`` largest
        values of ``by`` over the match set, the top ``hits_per_bucket``
        docs ranked by the ``sort_by`` stored field → DataFrame(value,
        doc_id, <sort_by>) ordered (value asc, rank).

        The match set is decoded and shuffled exactly once: pushed
        postings decode → semi-join the two stored columns → a single
        shuffle on ``value`` feeding BOTH per-bucket windows (bucket size
        via a count window, per-bucket rank via ``row_number``) → rank
        filter → that (distinct-values × hits)-row frame is persisted and
        materialized ONCE, then referenced twice against the cache:
        bucket selection runs as a parallel ``TakeOrderedAndProject``
        over the one-row-per-bucket ``_rk == 1`` slice (NOT a global
        unpartitioned window, which would funnel every bucket through a
        single task at high facet cardinality), and the winners
        broadcast-semi-join back. The final buckets × hits rows are
        pinned driver-side so the returned frame holds no reference to
        the decode subtree (see ``_pin_small``)."""
        ids = self._match_ids(query, filters, distinct=False)
        if ids is None:
            return _empty_frame(self.spark, f"value string, doc_id long, {sort_by} long")
        docs = self.spark.read.parquet(self._docs_path)
        if sort_by == "dl":  # dl lives in the per-doc meta table
            meta = self.spark.read.parquet(self._meta_path) \
                .select("doc_id", "dl")
            base = (docs.select("doc_id", F.col(by).alias("value"))
                    .join(meta, "doc_id"))
        else:
            base = docs.select("doc_id", F.col(by).alias("value"),
                               F.col(sort_by))
        mv = base.join(ids, "doc_id", "left_semi")
        key = (F.col(sort_by).asc() if ascending
               else F.col(sort_by).desc())
        w_rank = Window.partitionBy("value").orderBy(
            key, F.col("doc_id").asc())
        w_size = Window.partitionBy("value")
        ranked = (mv.withColumn("_n", F.count(F.lit(1)).over(w_size))
                  .withColumn("_rk", F.row_number().over(w_rank))
                  .filter(F.col("_rk") <= hits_per_bucket)
                  .persist())
        try:
            # job 1 ALSO materializes the persisted ranked frame, so the
            # second job reads the cache instead of re-running the decode
            # (previously a separate count() paid a third job for this);
            # the collected bucket list is <= ``buckets`` rows — driver-
            # safe at any facet cardinality
            top_rows = (ranked.filter(F.col("_rk") == 1)
                        .select("value", "_n")
                        .orderBy(F.col("_n").desc(), F.col("value").asc())
                        .limit(buckets).collect())
            vals = [r["value"] for r in top_rows]
            if not vals:
                return _empty_frame(self.spark, f"value string, doc_id long, {sort_by} long")
            out = (ranked.filter(F.col("value").isin(vals))
                   .select("value", "doc_id", sort_by, "_rk")
                   .orderBy(F.col("value").asc(), F.col("_rk").asc())
                   .drop("_rk"))
            return self._pin_small(out)
        finally:
            ranked.unpersist(blocking=False)

    def search_sorted(self, query: str, sort_by: str, k: int = 10,
                      ascending: bool = False, from_: int = 0,
                      filters: dict | None = None,
                      fetch: bool = False,
                      search_after: tuple | None = None) -> DataFrame:
        """Field-sorted search with pagination (ES ``sort`` without
        ``_score`` + ``from``/``size``): the query selects the match set,
        ranking is a stored field — scores are never computed, exactly
        ES's skip-scoring fast path for field sorts. Ties break on
        doc_id asc. Returns DataFrame(doc_id, <sort_by>).

        The plan is a global top-(from+k) (Spark rewrites
        sort+offset+limit to TakeOrderedAndProject), so cost scales with
        the match set, not with a full corpus sort; deep paging
        (from ≫ k) degrades like ES's — bounded by the same
        top-(from+size) heap.

        ``search_after=(last_sort_value, last_doc_id)`` is the scale path
        for deep paging (ES ``search_after``): rows strictly after the
        cursor in (sort key, doc_id) order are filtered BEFORE the top-k,
        so every page costs one size-k heap — page N of a 10⁹-doc match
        set is O(k), not the O(N·k) a from+size heap pays. Mutually
        exclusive with ``from_``."""
        if from_ < 0:
            raise ValueError("from_ must be >= 0")
        if search_after is not None and from_:
            raise ValueError("search_after and from_ are mutually "
                             "exclusive (ES contract)")
        mv = self._match_field(query, sort_by, filters)
        if mv is None:
            return _empty_frame(self.spark, f"doc_id long, {sort_by} string")
        out = mv.select("doc_id", F.col("v").alias(sort_by))
        if search_after is not None:
            av, ad = search_after
            key_col = F.col(sort_by)
            strict = key_col > F.lit(av) if ascending else key_col < F.lit(av)
            out = out.filter(
                strict | ((key_col == F.lit(av))
                          & (F.col("doc_id") > F.lit(int(ad)))))
        key = F.col(sort_by).asc() if ascending else F.col(sort_by).desc()
        out = (out.orderBy(key, F.col("doc_id").asc())
               .offset(from_).limit(k))
        if fetch:
            out = self._fetch_fields(out)
            out = out.orderBy(key, F.col("doc_id").asc())
        return out

    def _pin_small(self, out: DataFrame) -> DataFrame:
        """Materialize a provably-small (top-k) result frame driver-side.

        Plans that reference the search result TWICE — stored-field fetch
        (result join + semi-join id list) and highlight's snippet join —
        would otherwise execute the entire scoring subtree twice: Spark
        does not deduplicate a repeated FlatMapGroupsInPandas subtree
        (plan-audited in tests/test_plan_audit.py). Collecting the k rows
        costs one job over the tiny frame and makes every downstream
        reference a local relation."""
        rows = out.collect()
        return self._local_df(rows, out.schema)

    def _fetch_fields(self, out: DataFrame) -> DataFrame:
        """B6 stored-field fetch: broadcast semi-join of the doc fields
        onto a (small) result frame. Pins the result driver-side first —
        see ``_pin_small`` (the scoring subtree must not run twice)."""
        out = self._pin_small(out)
        docs = self.spark.read.parquet(self._docs_path)
        cols = [c for c in ("repo", "path", "commit", "lang", "doc_len")
                if c in docs.columns and c not in out.columns]
        ids = [int(r["doc_id"]) for r in out.select("doc_id").collect()]
        side = docs.select("doc_id", *cols)
        if len(ids) <= 10_000:
            # small result: IN predicate pushed to the parquet scan
            # (row-group min/max skip) instead of a semi-join subtree
            side = side.filter(F.col("doc_id").isin(ids))
        else:
            # huge-k fetch: an IN literal this size would bloat the plan —
            # keep the broadcast semi-join
            side = side.join(out.select("doc_id"), "doc_id", "left_semi")
        return out.join(F.broadcast(side), "doc_id")

    def get_docs(self, doc_ids: list[int],
                 fields: list[str] | None = None) -> DataFrame:
        """ES ``_mget``: fetch stored documents by id → one row per id
        found (missing ids are simply absent, tombstoned ids excluded),
        ordered doc_id asc. ``fields`` projects a column subset
        (column-pruned parquet scan); default all stored fields.

        The id set is an ``isin`` literal pushed to the parquet scan —
        at 100 TB this is a min/max row-group skip + dictionary filter,
        never a full docs-table read."""
        ids = sorted({int(d) for d in doc_ids})
        docs = self.spark.read.parquet(self._docs_path)
        if fields:
            missing = [c for c in fields if c not in docs.columns]
            if missing:
                raise ValueError(f"unknown stored fields: {missing}")
            docs = docs.select("doc_id", *[c for c in fields
                                           if c != "doc_id"])
        out = docs.filter(F.col("doc_id").isin(ids))
        tomb = self._tombstones_df()
        if tomb is not None:
            out = out.join(tomb, "doc_id", "left_anti")
        return out.orderBy(F.col("doc_id").asc())

    def search_dataframe(self, query: str, k: int = 10,
                         filters: dict[str, str] | None = None,
                         round_dp: int = 9) -> DataFrame:
        """Pure-DataFrame BM25 path over the tf checkpoints (cross-check)."""
        from deluge_spark.index.build import tf_from_segments
        from deluge_spark.index.score import bm25_score_query

        terms = list(dict.fromkeys(tokenize_py(query, self.mode)))
        if not terms:
            return self._empty()
        tf = tf_from_segments(self.spark, self.index_dir)
        dl = self.spark.read.parquet(self._meta_path).select("doc_id", "dl")
        # idf stays corpus-global (ES semantics: filters never change scores),
        # so score first, filter candidates after.
        scored = bm25_score_query(tf, dl, self.stats["n_docs"],
                                  self.stats["avgdl"], terms)
        if filters:
            docs = self.spark.read.parquet(self._docs_path)
            scored = scored.join(
                docs.filter(self._filter_cond(filters)).select("doc_id"),
                "doc_id", "left_semi")
        tomb = self._tombstones_df()
        if tomb is not None:
            scored = scored.join(tomb, "doc_id", "left_anti")
        return (scored
                .select("doc_id", F.round("score", round_dp).alias("score"))
                .orderBy(F.col("score").desc(), F.col("doc_id").asc())
                .limit(k))
