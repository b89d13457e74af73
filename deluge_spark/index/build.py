"""Sharded inverted-index build — the engine's primary entry point.

The Spark re-expression of the reference's ``Ingestor.Ingest()``
(/root/reference/ingestor.go:160-244): where deluge walks files with a
goroutine pool, parses line-by-line, batches 20 MB bulks and POSTs them to
Elasticsearch behind a backpressure equalizer, our build is a map-side-
partials pipeline over a columnar source table:

  1. doc-id assignment (JVM, one range exchange of the corpus — the total
     order (repo, path, commit) defines dense ids),
  2. docs table: per-row sha256 invariant (JVM sha2 intrinsic) + stored
     fields — a cheap projection, NO tokenization,
  3. tokenize + encode: the corpus's ONE analysis pass. Per source
     partition it produces compressed per-(shard, term) PARTIAL posting
     lists for that partition's contiguous doc range — analysis (RE2
     kernels, C++ group-by) and block compression (numpy varint codec) in
     the same pass, so only ~5 bytes/posting ever cross the JVM↔Python
     boundary or the shuffle — plus per-doc (doc_id, dl) meta rows. Block
     bounds are stored as Lucene-style impact pairs (max_tf, min_dl), so
     encoding needs NO corpus stats: avgdl is derived from the meta rows
     AFTER this pass (a 100 TB corpus is scanned and tokenized exactly
     once; the earlier two-pass design re-tokenized everything JVM-side
     just to learn avgdl before encoding),
  4. merge: pure JVM SQL — groupBy(shard, term) over the small partial
     rows, sort_array by first_doc, binary concat + HOF offset rebase
     (self-contained blocks make merging a byte append),
  5. stats (plain aggregates over the tiny meta/segment tables). Worker
     pools / equalizer / bulk batching of the reference collapse into the
     Spark scheduler + Arrow batching (SURVEY.md §2A rows 13–18).

Sharding model (≙ Elasticsearch ``number_of_shards``, the constructor-
mandated partitioning of /root/reference/elastic/v7/client.go:124-136,166):
``shard = pmod(doc_id, num_shards)`` — *document* sharding. Every term's
postings split across all shards, which is exactly the hot-term salting the
north rule demands: a Zipfian term ("import", "the") never concentrates in
one shuffle key because its key is (shard, term); sublists are disjoint,
sorted, independently delta-encoded, and merged by the query executor. At
1000 executors, num_shards scales to O(cluster width) and the (shard, term)
shuffle stays balanced regardless of term skew.

Resumability (north-star B10): tokenize groups (doc-range buckets) and
shard batches each commit an atomic manifest unit; a killed build re-runs
only missing units — never re-tokenizes committed groups (kill-tested).

Index layout under ``index_dir``:
  docs/                parquet: doc_id, repo, path, commit, lang,
                       content_sha256, shard[, content]
  docs_meta/           parquet: doc_id, dl (docs with ≥1 token)
  partials/group=G/shard=S/  compressed partial posting lists (checkpoint;
                       rows with term IS NULL are per-doc meta rows)
  segments/batch=B/shard=S/  term, df_local, cf_local, n_postings,
                       max_tf, min_dl, block_* skip arrays, data binary
  stats/global.json    {n_docs, avgdl, total_postings, segment_batches, ...}
  stats/terms/         parquet: term, df, cf   (query-time idf lookup)
  manifest/            one JSON per committed unit
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deluge_spark.index.manifest import Manifest
from deluge_spark.operators.doc_ids import assign_doc_ids, unpersist_assigned

SEGMENT_SCHEMA = (
    "shard int, term string, df_local long, cf_local long, n_postings long, "
    "max_tf long, min_dl long, block_first array<long>, "
    "block_last array<long>, block_count array<int>, block_off array<long>, "
    "block_max_tf array<long>, block_min_dl array<long>, data binary"
)


@dataclass
class BuildConfig:
    num_shards: int = 8
    tokenizer_mode: str = "code"
    tokenize_groups: int = 4          # checkpoint granularity, tokenize stage
    shard_batches: int = 2            # checkpoint granularity, segment stage
    term_buckets: int = 32            # pandas groups per shard in segment build
    manifest_counts: bool = True      # row-count jobs per manifest unit (lineage)
    store_content: bool = True
    overwrite_stale: bool = False     # allow wiping an index built from a
                                      # different source fingerprint (else raise)
    shuffle_partitions: int | None = None  # explicit sizing (north rule)
    # tokenize/source task granularity: partitions of the range-keyed
    # corpus (None = cluster default parallelism). At cluster scale this
    # is a DATA-SIZE property (~100s of MB per task), not a core-count
    # one — a 1-core local run left at the default would tokenize the
    # whole corpus as ONE giant Arrow task (allocator pressure, >2 GiB
    # string offsets), which no real deployment does
    source_partitions: int | None = None
    # fault injection for the resumability kill-test:
    fail_after: dict = field(default_factory=dict)  # {"tokenize": n, "segments": n}


class FaultInjected(RuntimeError):
    pass


def _fingerprint(corpus: DataFrame) -> str:
    """Cheap lineage fingerprint: schema + source-file lineage if
    file-backed. Hashing the full sorted file list (plus its length) means
    any added/removed/renamed input file changes the fingerprint — not just
    the first 64 — while the stored string stays bounded."""
    import hashlib
    files: list[str] = []
    try:
        files = sorted(corpus.inputFiles())
    except Exception:
        pass
    fh = hashlib.sha256("\n".join(files).encode()).hexdigest() if files else ""
    return json.dumps({"schema": corpus.schema.simpleString(),
                       "n_files": len(files), "files_sha": fh,
                       "head": files[:8]})[:4000]


def _migrate_legacy_fingerprints(man: Manifest, corpus: DataFrame,
                                 fp: str) -> int:
    """Round 3 changed ``_fingerprint``'s encoding (truncated ``files``
    list → full-list sha256). A manifest written by an older build on the
    SAME unchanged corpus would otherwise mismatch the new encoding and
    force a full wipe via overwrite_stale. Detect legacy-format entries
    (JSON with a ``files`` key), recompute the legacy encoding for the
    current corpus, and rewrite matching entries in place — a one-time
    auto-migration; genuinely different corpora still mismatch."""
    stale = [e for e in man.entries()
             if e.get("fingerprint") not in (None, fp)]
    if not stale:
        return 0
    legacy: str | None = None
    migrated = 0
    for e in stale:
        old = e.get("fingerprint")
        try:
            if "files" not in json.loads(old):
                continue
        except (TypeError, ValueError):
            continue
        if legacy is None:
            files: list[str] = []
            try:
                files = sorted(corpus.inputFiles())[:64]
            except Exception:
                pass
            legacy = json.dumps({"schema": corpus.schema.simpleString(),
                                 "files": files})[:4000]
        if old == legacy:
            extras = {k: v for k, v in e.items()
                      if k not in ("unit", "status", "fingerprint",
                                   "committed_at")}
            man.commit(e["unit"], fp, **extras)
            migrated += 1
    return migrated


def build_index(spark: SparkSession, corpus: DataFrame, index_dir: str,
                config: BuildConfig | None = None) -> dict:
    """Build (or resume) the full index; returns summary metrics."""
    cfg = config or BuildConfig()
    if cfg.shuffle_partitions:
        spark.conf.set("spark.sql.shuffle.partitions", str(cfg.shuffle_partitions))
    os.makedirs(index_dir, exist_ok=True)
    man = Manifest(index_dir)
    fp = _fingerprint(corpus)
    _migrate_legacy_fingerprints(man, corpus, fp)
    _reset_stale_index(index_dir, man, fp, allow=cfg.overwrite_stale)
    t0 = time.time()
    metrics = {"retokenized_groups": 0, "rebuilt_shard_batches": 0}
    stage_t: dict[str, float] = {}
    _last = [time.time()]

    def _mark(stage: str) -> None:
        now = time.time()
        stage_t[stage] = round(stage_t.get(stage, 0.0) + now - _last[0], 3)
        _last[0] = now

    docs_path = os.path.join(index_dir, "docs")
    meta_path = os.path.join(index_dir, "docs_meta")
    partials_path = os.path.join(index_dir, "partials")
    seg_path = os.path.join(index_dir, "segments")
    stats_dir = os.path.join(index_dir, "stats")

    # ---- stage 0: doc ids + corpus size --------------------------------
    # Deterministic dense ids (operators/doc_ids.py). Tokenize-checkpoint
    # groups are doc-RANGE buckets (not modulo): each group's partial
    # posting lists then cover disjoint contiguous doc ranges, which is
    # what lets the merge stage concatenate them without re-encoding.
    docs_with_ids, n_total = assign_doc_ids(
        corpus, num_partitions=cfg.source_partitions, return_count=True)
    cached_corpus = docs_with_ids  # carries the cache handle; keep pre-withColumn
    # every non-content corpus column is a stored field (ES _source parity):
    # keyword/typed filters and facets run against whatever the corpus
    # carried, not a fixed whitelist
    base_cols = [c for c in corpus.columns
                 if c not in ("doc_id", "content", "shard", "content_sha256")]
    grp_step = max(1, -(-n_total // cfg.tokenize_groups))
    docs_with_ids = docs_with_ids.withColumn(
        "shard", F.pmod(F.col("doc_id"), F.lit(cfg.num_shards)).cast("int")
    ).withColumn(
        "grp", (F.col("doc_id") / F.lit(grp_step)).cast("int")
    )

    # ---- stage 1: docs table (sha256 invariant + stored fields) ----------
    # A pure JVM projection — sha2 is a codegen intrinsic; no tokenization
    # here (doc lengths come out of the single analysis pass below). The
    # parquet write is IO-bound and independent of the tokenize stage, so
    # it runs CONCURRENTLY with it (separate driver thread → separate Spark
    # job) — at 2-vs-8-core scaling the single-disk commit was a per-node
    # constant that dragged raw efficiency; overlapped, it hides behind the
    # CPU-bound tokenize pass. Row count comes from an Observation attached
    # to the write job (no re-read count job).
    import threading

    from pyspark.sql import Observation

    docs_exc: list[BaseException] = []
    docs_thread: threading.Thread | None = None
    if not man.is_done("docs", fp):
        keep = ["doc_id", *base_cols,
                F.sha2(F.col("content"), 256).alias("content_sha256"),
                "shard"]
        if cfg.store_content:
            keep.append("content")
        frame = docs_with_ids.select(*keep)

        def _write_docs() -> None:
            t0d = time.time()
            try:
                if cfg.manifest_counts:
                    obs = Observation()
                    (frame.observe(obs, F.count(F.lit(1)).alias("n"))
                     .write.mode("overwrite").parquet(docs_path))
                    n_docs_total = int(obs.get["n"])
                else:
                    frame.write.mode("overwrite").parquet(docs_path)
                    n_docs_total = -1
                man.commit("docs", fp, rows=n_docs_total)
            except BaseException as e:  # surfaced after join
                docs_exc.append(e)
            finally:
                stage_t["docs_table"] = round(time.time() - t0d, 3)

        docs_thread = threading.Thread(target=_write_docs,
                                       name="deluge-docs-write", daemon=True)
        docs_thread.start()

    def _join_docs() -> None:
        if docs_thread is None:
            return
        docs_thread.join()
        if docs_exc:
            import sys
            if sys.exc_info()[0] is not None:
                # the tokenize stage already raised and we're inside its
                # finally — that primary exception must keep propagating;
                # the concurrent docs-write failure is secondary context
                import logging
                logging.getLogger(__name__).warning(
                    "concurrent docs write also failed: %r", docs_exc[0])
                return
            raise docs_exc[0]

    # ---- stage 2: tokenize + encode partial postings, per group ---------
    # THE corpus pass: ONE Python stage does analysis AND block compression;
    # only compressed partial posting lists (+tiny per-doc meta rows) cross
    # the Arrow boundary (~5 bytes/posting instead of a 30-byte tf row —
    # the JVM<->Python pipe is the scaling bottleneck in this sandbox, and
    # shuffle volume shrinks the same way). Impact-pair block bounds mean
    # no avgdl is needed here.
    done_tok = 0
    try:
        for g in range(cfg.tokenize_groups):
            unit = f"tokenize_g{g}"
            if man.is_done(unit, fp):
                continue
            if cfg.fail_after.get("tokenize") is not None and \
                    done_tok >= cfg.fail_after["tokenize"]:
                raise FaultInjected(f"injected failure before {unit}")
            part = docs_with_ids.filter(F.col("grp") == g)
            partials = _tokenize_encode_partials(
                part, "content", cfg.tokenizer_mode, cfg.num_shards)
            out = os.path.join(partials_path, f"group={g}")
            if cfg.manifest_counts:
                obs = Observation()
                (partials.observe(obs, F.count(F.lit(1)).alias("n"))
                 .write.mode("overwrite").partitionBy("shard").parquet(out))
                n_rows = int(obs.get["n"])
            else:
                partials.write.mode("overwrite").partitionBy(
                    "shard").parquet(out)
                n_rows = -1
            man.commit(unit, fp, rows=n_rows, group=g)
            metrics["retokenized_groups"] += 1
            done_tok += 1
            _mark("tokenize_encode")
    finally:
        # the docs write must be settled before we return OR raise — the
        # manifest view at any exit point reflects completed units only
        _join_docs()

    # release the corpus cache via the handle assign_doc_ids pinned —
    # docs_with_ids was reassigned through withColumns, so unpersisting it
    # directly would be a plan-mismatch no-op
    unpersist_assigned(cached_corpus)

    partials_all = spark.read.option("basePath", partials_path).parquet(
        *[os.path.join(partials_path, f"group={g}")
          for g in range(cfg.tokenize_groups)])

    # ---- stage 2b: per-doc meta (doc_id, dl) → corpus stats --------------
    # n_docs/avgdl are observed ON the docmeta write job (one job, no
    # re-read) and recorded in the manifest; resumes read them from lineage
    if not man.is_done("docmeta", fp):
        meta_df = (partials_all.filter(F.col("term").isNull())
                   .select(F.col("first_doc").alias("doc_id"),
                           F.col("df_p").alias("dl")))
        obs = Observation()
        (meta_df.observe(obs, F.count(F.lit(1)).alias("n"),
                         F.avg("dl").alias("avgdl"))
         .write.mode("overwrite").parquet(meta_path))
        got = obs.get
        n_docs = int(got["n"] or 0)
        avgdl = float(got["avgdl"]) if n_docs else 0.0
        man.commit("docmeta", fp, n_docs=n_docs, avgdl=avgdl)
    else:
        entry = man.get("docmeta") or {}
        if "n_docs" in entry:
            n_docs, avgdl = int(entry["n_docs"]), float(entry["avgdl"])
        else:  # manifest from an older build: fall back to one agg job
            n_docs, avgdl = _stats_from_dl(
                spark.read.parquet(meta_path).select("dl"))
    _mark("corpus_stats")

    partials_all = partials_all.filter(F.col("term").isNotNull())

    # ---- stage 3: merge partials into segments, per shard batch ----------
    # Pure JVM: one (shard, term) shuffle of the SMALL partial rows, then
    # higher-order-function concatenation (binary concat + offset rebase).
    # Self-contained blocks (codec) make this a byte-level append.
    batches = _shard_batches(cfg.num_shards, cfg.shard_batches)
    done_seg = 0
    for bi, batch in enumerate(batches):
        unit = f"segments_b{bi}"
        if man.is_done(unit, fp):
            continue
        if cfg.fail_after.get("segments") is not None and \
                done_seg >= cfg.fail_after["segments"]:
            raise FaultInjected(f"injected failure before {unit}")
        part = partials_all.filter(F.col("shard").isin(list(batch)))
        seg = _merge_partials(part)
        seg.write.mode("overwrite").partitionBy("shard").parquet(
            os.path.join(seg_path, f"batch={bi}"))
        man.commit(unit, fp, shards=list(batch), avgdl=avgdl)
        metrics["rebuilt_shard_batches"] += 1
        done_seg += 1
        _mark("segments_merge")

    # ---- stage 4: stats ---------------------------------------------------
    if not man.is_done("stats", fp):
        batch_names = [f"batch={bi}" for bi in range(len(batches))]
        # term stats come from the PARTIAL rows (term, df_p, cf_p — tiny
        # pruned columns, no segment binary read), and total_postings is
        # observed on the same write job: one job for the whole stage
        # instead of two passes over the merged segments
        terms = partials_all.groupBy("term").agg(
            F.sum("df_p").alias("df"), F.sum("cf_p").alias("cf"))
        obs = Observation()
        (terms.observe(obs, F.sum("df").alias("tp"))
         .write.mode("overwrite").parquet(os.path.join(stats_dir, "terms")))
        total_postings = int(obs.get["tp"] or 0)
        os.makedirs(stats_dir, exist_ok=True)
        glob = {
            "n_docs": n_docs, "avgdl": avgdl,
            "total_postings": total_postings,
            "num_shards": cfg.num_shards,
            "tokenizer_mode": cfg.tokenizer_mode,
            # authoritative batch-dir list: readers must not glob (a stale
            # batch=* dir from an older layout would silently double-count)
            "segment_batches": batch_names,
        }
        write_global_stats(index_dir, glob)
        man.commit("stats", fp, **glob)
        _mark("term_stats")

    man.seal(wall_s=time.time() - t0)
    metrics.update(n_docs=n_docs, avgdl=avgdl, wall_s=time.time() - t0,
                   stages=stage_t)
    return metrics


PARTIALS_SCHEMA = (
    "shard int, term string, first_doc long, df_p long, cf_p long, "
    "max_tf long, min_dl long, block_first array<long>, "
    "block_last array<long>, block_count array<int>, block_off array<long>, "
    "block_max_tf array<long>, block_min_dl array<long>, data binary"
)


def _tokenize_encode_partials(df: DataFrame, text_col: str, mode: str,
                              num_shards: int) -> DataFrame:
    """One Python pass per source partition: tokenize every doc, then build
    per-(shard, term) PARTIAL posting lists (sorted, blocked, compressed)
    for the partition's contiguous doc range, PLUS one per-doc meta row
    (term=NULL, first_doc=doc_id, df_p=dl) — the single corpus scan yields
    both postings and doc lengths. The classic map-side combine of MapReduce
    index building — shuffle and Arrow-boundary volume shrink to the
    compressed size."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from deluge_spark.functions.tokenizer import batch_term_counts
    from deluge_spark.index.codec import encode_group

    src = df.select("doc_id", text_col)

    def _empty_list(n, patype):
        return pa.ListArray.from_arrays(
            pa.array(np.zeros(n + 1, dtype=np.int32), pa.int32()),
            pa.array([], patype))

    def _meta_batch(doc, dl):
        udoc, uidx = np.unique(doc, return_index=True)
        nm = len(udoc)
        return pa.RecordBatch.from_pydict({
            "shard": pa.array((udoc % num_shards).astype(np.int32),
                              pa.int32()),
            "term": pa.nulls(nm, pa.string()),
            "first_doc": pa.array(udoc, pa.int64()),
            "df_p": pa.array(dl[uidx].astype(np.int64), pa.int64()),
            "cf_p": pa.array(np.zeros(nm, np.int64), pa.int64()),
            "max_tf": pa.array(np.zeros(nm, np.int64), pa.int64()),
            "min_dl": pa.array(np.zeros(nm, np.int64), pa.int64()),
            "block_first": _empty_list(nm, pa.int64()),
            "block_last": _empty_list(nm, pa.int64()),
            "block_count": _empty_list(nm, pa.int32()),
            "block_off": _empty_list(nm, pa.int64()),
            "block_max_tf": _empty_list(nm, pa.int64()),
            "block_min_dl": _empty_list(nm, pa.int64()),
            "data": pa.Array.from_buffers(
                pa.binary(), nm,
                [None,
                 pa.py_buffer(np.zeros(nm + 1, dtype=np.int32).tobytes()),
                 pa.py_buffer(b"")]),
        })

    def _partition(it):
        docs_l, terms_l, tf_l, dl_l = [], [], [], []
        for batch in it:
            res = batch_term_counts(batch, "doc_id", text_col, mode)
            if res is None:
                continue
            d, t, tf, dl = res
            docs_l.append(d); terms_l.append(t); tf_l.append(tf); dl_l.append(dl)
        if not docs_l:
            return
        doc = np.concatenate(docs_l)
        tf = np.concatenate(tf_l)
        dl = np.concatenate(dl_l)
        # accumulate term text with 64-bit offsets: one partition can carry
        # >2 GiB of term bytes (at 1 core shuffle_partitions=2 puts half the
        # corpus in one range partition; cluster partitions are bounded by
        # maxPartitionBytes, but the engine must not die on a fat one) —
        # pa.string()'s int32 offsets overflow there. Found by the 2.5M-doc
        # scaling run; per-chunk outputs cast back to string below.
        terms = pa.concat_arrays([
            (t.combine_chunks() if isinstance(t, pa.ChunkedArray) else t)
            .cast(pa.large_string())
            for t in terms_l])
        denc = pc.dictionary_encode(terms)
        if isinstance(denc, pa.ChunkedArray):
            denc = denc.combine_chunks()
        tidx = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        dictionary = denc.dictionary
        shard = (doc % num_shards).astype(np.int64)
        key = tidx * num_shards + shard
        order = np.lexsort((doc, key))
        key, doc, tf, dl = key[order], doc[order], tf[order], dl[order]

        # chunk the encode at term boundaries (~100k postings per chunk):
        # whole-partition temporaries (10^8-element scatters) thrash the
        # allocator/TLB when N workers run concurrently — chunked, the
        # same work runs ~25× faster under concurrency, and output memory
        # is bounded per yielded batch.
        n = len(key)
        step = 100_000
        bounds = [0]
        pos = step
        while pos < n:
            e = int(np.searchsorted(key, key[pos], side="right"))
            bounds.append(e)
            pos = e + step
        bounds.append(n)

        yield _meta_batch(doc, dl)

        for s, e in zip(bounds[:-1], bounds[1:]):
            if e <= s:
                continue
            g = encode_group(key[s:e], doc[s:e], tf[s:e], dl[s:e])
            nt = g["n_terms"]
            k = key[s:e][g["term_pos"]]
            shard_out = (k % num_shards).astype(np.int32)
            term_out = pc.take(dictionary,
                               pa.array(k // num_shards, pa.int64())
                               ).cast(pa.string())  # chunk-sized: no wrap
            first_doc = g["block_first"][g["term_block_offsets"][:-1]]
            list_offsets = pa.array(g["term_block_offsets"].astype("int32"),
                                    pa.int32())

            def _list(flat, patype):
                return pa.ListArray.from_arrays(list_offsets,
                                                pa.array(flat, patype))

            buf = pa.py_buffer(g["data"].tobytes())
            if nt and int(g["term_byte_end"][-1]) >= 2**31:
                raise ValueError(
                    "encoded chunk exceeds 2 GiB — pa.binary() int32 offsets "
                    "would wrap; lower the encode chunk step")
            bin_offsets = np.empty(nt + 1, dtype=np.int32)
            bin_offsets[:-1] = g["term_byte_start"]
            bin_offsets[-1] = g["term_byte_end"][-1] if nt else 0
            data_arr = pa.Array.from_buffers(
                pa.binary(), nt,
                [None, pa.py_buffer(bin_offsets.tobytes()), buf])

            yield pa.RecordBatch.from_pydict({
                "shard": pa.array(shard_out, pa.int32()),
                "term": term_out,
                "first_doc": pa.array(first_doc, pa.int64()),
                "df_p": pa.array(g["df_local"], pa.int64()),
                "cf_p": pa.array(g["cf_local"], pa.int64()),
                "max_tf": pa.array(g["max_tf"], pa.int64()),
                "min_dl": pa.array(g["min_dl"], pa.int64()),
                "block_first": _list(g["block_first"], pa.int64()),
                "block_last": _list(g["block_last"], pa.int64()),
                "block_count": _list(g["block_count"], pa.int32()),
                "block_off": _list(g["block_off"], pa.int64()),
                "block_max_tf": _list(g["block_max_tf"], pa.int64()),
                "block_min_dl": _list(g["block_min_dl"], pa.int64()),
                "data": data_arr,
            })

    return src.mapInArrow(_partition, schema=PARTIALS_SCHEMA)


def _merge_partials(partials: DataFrame) -> DataFrame:
    """Merge partial posting lists into final segments — linear copy.

    Partials of one (shard, term) cover disjoint contiguous doc ranges
    (tokenize groups are doc-range buckets), so the merged list is just the
    partials sorted by first_doc with byte buffers concatenated, skip arrays
    appended, and block offsets rebased by the running byte length. The
    shuffle + per-term ordering stay JVM-side (hash aggregate with
    ``sort_array(collect_list(struct(first_doc, ...)))`` — struct ordering
    is field order, first_doc leads, fd values are unique per term). The
    byte/offset concatenation is an Arrow stage of pure offset arithmetic:
    within one Arrow batch every partial's bytes already sit back-to-back in
    the list child's values buffer in sorted order, so the merged ``data``
    column REUSES that buffer (zero copy) and block arrays flatten one list
    level by indexing inner offsets at outer boundaries — O(P) per term in
    the number of partials P, vs the previous SQL ``aggregate``
    binary-concat fold that copied the accumulator every step (O(P²)
    bytes; at 10⁵ map tasks per corpus pass that is tens of GB of copying
    per hot (shard, term))."""
    import pyarrow as pa

    grouped = partials.groupBy("shard", "term").agg(
        F.sort_array(F.collect_list(F.struct(
            F.col("first_doc").alias("fd"),
            F.col("df_p").alias("df_p"),
            F.col("cf_p").alias("cf_p"),
            F.col("max_tf").alias("mt"),
            F.col("min_dl").alias("md"),
            F.col("block_first").alias("bf"),
            F.col("block_last").alias("bl"),
            F.col("block_count").alias("bc"),
            F.col("block_off").alias("bo"),
            F.col("block_max_tf").alias("bmt"),
            F.col("block_min_dl").alias("bmd"),
            F.col("data").alias("data"),
        ))).alias("ps"))

    def _concat_merge(it):
        for batch in it:
            n = batch.num_rows
            if n == 0:
                continue
            ps = batch.column("ps")
            # list offsets are slice-aware and index the UNSLICED child
            # (pyarrow semantics, probed); struct .field() children are
            # likewise unsliced, so outer offsets index them directly.
            outer = np.asarray(ps.offsets, dtype=np.int64)
            pv = ps.values
            base, end = int(outer[0]), int(outer[-1])
            starts = (outer[:-1] - base).astype(np.int64)
            counts = np.diff(outer)

            def _red(fname, op):
                a = np.asarray(pv.field(fname))[base:end]
                return op.reduceat(a, starts)

            df_local = _red("df_p", np.add)
            cf_local = _red("cf_p", np.add)
            max_tf = _red("mt", np.maximum)
            min_dl = _red("md", np.minimum)

            # merged data: per-term byte range in the shared values buffer
            d = pv.field("data")
            if d.type == pa.binary():
                d_off_all = np.frombuffer(d.buffers()[1], dtype=np.int32)
            else:  # large_binary from a future Spark arrow config
                d_off_all = np.frombuffer(d.buffers()[1], dtype=np.int64)
            d_off = d_off_all[d.offset:d.offset + len(d) + 1].astype(np.int64)
            new_d_off = d_off[outer]  # byte start of each term's first partial
            if new_d_off[-1] >= 2**31:
                raise ValueError(
                    "merged batch exceeds 2 GiB of posting bytes — "
                    "pa.binary() int32 offsets would wrap; lower "
                    "spark.sql.execution.arrow.maxRecordsPerBatch")
            data_arr = pa.Array.from_buffers(
                pa.binary(), n,
                [None, pa.py_buffer(new_d_off.astype(np.int32).tobytes()),
                 d.buffers()[2]])

            # block arrays: flatten one list level — inner offsets indexed
            # at outer boundaries give the merged per-term offsets.
            def _flat(fname, patype):
                f = pv.field(fname)
                io = np.asarray(f.offsets, dtype=np.int64)
                mo = io[outer]
                return pa.ListArray.from_arrays(
                    pa.array(mo, pa.int32()), f.values)

            # block_off needs a rebase: each partial's offsets shift by the
            # byte length of the partials before it within its term.
            bo = pv.field("bo")
            bo_io = np.asarray(bo.offsets, dtype=np.int64)
            term_of_partial = np.repeat(np.arange(n, dtype=np.int64), counts)
            rebase = d_off[base:end] - d_off[outer[:-1][term_of_partial]]
            bo_lens = np.diff(bo_io[base:end + 1])
            bo_vals = (np.asarray(bo.values)[bo_io[base]:bo_io[end]]
                       + np.repeat(rebase, bo_lens))
            bo_mo = (bo_io[outer] - bo_io[base])
            bo_arr = pa.ListArray.from_arrays(
                pa.array(bo_mo, pa.int32()), pa.array(bo_vals, pa.int64()))

            yield pa.RecordBatch.from_pydict({
                "shard": batch.column("shard"),
                "term": batch.column("term"),
                "df_local": pa.array(df_local, pa.int64()),
                "cf_local": pa.array(cf_local, pa.int64()),
                "n_postings": pa.array(df_local, pa.int64()),
                "max_tf": pa.array(max_tf, pa.int64()),
                "min_dl": pa.array(min_dl, pa.int64()),
                "block_first": _flat("bf", pa.int64()),
                "block_last": _flat("bl", pa.int64()),
                "block_count": _flat("bc", pa.int32()),
                "block_off": bo_arr,
                "block_max_tf": _flat("bmt", pa.int64()),
                "block_min_dl": _flat("bmd", pa.int64()),
                "data": data_arr,
            })

    return grouped.mapInArrow(_concat_merge, schema=SEGMENT_SCHEMA)


def _merge_partials_reencode(partials: DataFrame) -> DataFrame:
    """Merge partial posting lists whose doc ranges may OVERLAP — the
    streaming-ingest case, where micro-batches see doc_ids in arrival order
    so per-batch partials of one (shard, term) interleave. The batch build's
    concat merge (``_merge_partials``) requires disjoint ranges; here each
    partial's self-contained blocks are decoded, the postings merge-sorted
    by doc_id, and the list re-encoded — LSM-style compaction. The shuffle
    and the Arrow boundary still carry only compressed partials (~5
    B/posting); decode/re-encode is vectorized numpy per term."""
    import pyarrow as pa

    grouped = partials.groupBy("shard", "term").agg(
        F.collect_list(F.struct(
            F.col("block_first").alias("bf"),
            F.col("block_last").alias("bl"),
            F.col("block_count").alias("bc"),
            F.col("block_off").alias("bo"),
            F.col("data").alias("data"),
        )).alias("ps"))

    def _reenc(it):
        from deluge_spark.index.codec import decode_list, encode_group

        for batch in it:
            n_rows = batch.num_rows
            if n_rows == 0:
                continue
            ps_col = batch.column("ps")
            docs_l, tfs_l, dls_l = [], [], []
            lens = np.empty(n_rows, dtype=np.int64)
            for r in range(n_rows):
                parts = ps_col[r].as_py()
                segs = [decode_list(p["data"], p["bo"], p["bc"],
                                    p["bf"], p["bl"]) for p in parts]
                d = np.concatenate([s[0] for s in segs])
                t = np.concatenate([s[1] for s in segs])
                l = np.concatenate([s[2] for s in segs])
                order = np.argsort(d, kind="stable")
                docs_l.append(d[order]); tfs_l.append(t[order])
                dls_l.append(l[order]); lens[r] = len(d)
            doc = np.concatenate(docs_l)
            tf = np.concatenate(tfs_l)
            dl = np.concatenate(dls_l)
            idx = np.repeat(np.arange(n_rows, dtype=np.int64), lens)
            g = encode_group(idx, doc, tf, dl)

            nt = g["n_terms"]
            if nt != n_rows:  # every (shard, term) group has postings;
                # data-integrity check must survive python -O (no assert)
                raise RuntimeError(
                    f"re-encode group mismatch: {nt} terms from "
                    f"{n_rows} (shard, term) rows")
            list_offsets = pa.array(
                g["term_block_offsets"].astype("int32"), pa.int32())

            def _list(flat, patype):
                return pa.ListArray.from_arrays(list_offsets,
                                                pa.array(flat, patype))

            buf = pa.py_buffer(g["data"].tobytes())
            if nt and int(g["term_byte_end"][-1]) >= 2**31:
                raise ValueError(
                    "re-encoded batch exceeds 2 GiB — pa.binary() int32 "
                    "offsets would wrap; lower arrow.maxRecordsPerBatch")
            bin_offsets = np.empty(nt + 1, dtype=np.int32)
            bin_offsets[:-1] = g["term_byte_start"]
            bin_offsets[-1] = g["term_byte_end"][-1] if nt else 0
            data_arr = pa.Array.from_buffers(
                pa.binary(), nt,
                [None, pa.py_buffer(bin_offsets.tobytes()), buf])

            yield pa.RecordBatch.from_pydict({
                "shard": batch.column("shard"),
                "term": batch.column("term"),
                "df_local": pa.array(g["df_local"], pa.int64()),
                "cf_local": pa.array(g["cf_local"], pa.int64()),
                "n_postings": pa.array(g["df_local"], pa.int64()),
                "max_tf": pa.array(g["max_tf"], pa.int64()),
                "min_dl": pa.array(g["min_dl"], pa.int64()),
                "block_first": _list(g["block_first"], pa.int64()),
                "block_last": _list(g["block_last"], pa.int64()),
                "block_count": _list(g["block_count"], pa.int32()),
                "block_off": _list(g["block_off"], pa.int64()),
                "block_max_tf": _list(g["block_max_tf"], pa.int64()),
                "block_min_dl": _list(g["block_min_dl"], pa.int64()),
                "data": data_arr,
            })

    return grouped.mapInArrow(_reenc, schema=SEGMENT_SCHEMA)


def tf_from_segments(spark: SparkSession, index_dir: str,
                     terms: list[str] | None = None,
                     seg_df: DataFrame | None = None) -> DataFrame:
    """Reconstruct the long-form (doc_id, term, tf, dl) table by decoding
    segments — the input for the DataFrame-scoring cross-check path and for
    re-index migrations (replaces persisted tf checkpoints, which the
    partials build no longer writes).

    ``terms`` restricts the decode to those terms' segment rows (parquet
    predicate pushdown on ``term``) — the facet path decodes only a
    query's matched postings, never the whole index."""
    import pyarrow as pa

    # ``seg_df`` lets a Searcher with cache_segments=True decode from its
    # pinned in-memory segment table instead of a fresh parquet read
    seg = (seg_df if seg_df is not None
           else read_segments(spark, index_dir)).select(
        "term", "block_first", "block_last", "block_count", "block_off",
        "data")
    if terms is not None:
        seg = seg.filter(F.col("term").isin(list(terms)))

    def _dec(it):
        from deluge_spark.index.codec import varint_decode

        # whole-BATCH decode, zero per-row Python: every posting list in the
        # batch is a packed varint stream and binary cells are stored
        # back-to-back in the Arrow values buffer, so ONE varint_decode
        # covers all rows; block/list structure is then pure index
        # arithmetic (the exact inverse of encode_group's scatter), and the
        # term column is an Arrow take by repeated row index — no
        # row-at-a-time .as_py() anywhere (the old loop made a reindex of a
        # real index crawl).
        for batch in it:
            n_rows = batch.num_rows
            if n_rows == 0:
                continue
            import pyarrow.compute as pc
            cnt_list = batch.column("block_count")
            cnt = cnt_list.flatten().to_numpy(
                zero_copy_only=False).astype(np.int64)
            blocks_per_row = pc.list_value_length(cnt_list).to_numpy(
                zero_copy_only=False).astype(np.int64)
            first = batch.column("block_first").flatten().to_numpy(
                zero_copy_only=False).astype(np.int64)
            last = batch.column("block_last").flatten().to_numpy(
                zero_copy_only=False).astype(np.int64)
            n_blocks = len(cnt)
            if n_blocks == 0:
                continue
            total = int(cnt.sum())

            data_arr = batch.column("data")
            # binary layout: values buffer is the rows' byte streams packed
            # contiguously in row order — offsets[0]..offsets[-1] is one
            # uninterrupted varint stream across all posting lists
            bin_offsets = np.frombuffer(
                data_arr.buffers()[1], dtype=np.int32)[
                data_arr.offset: data_arr.offset + n_rows + 1]
            buf = np.frombuffer(data_arr.buffers()[2], dtype=np.uint8)
            n_vals = 3 * total - n_blocks
            vals, consumed = varint_decode(buf, count=n_vals,
                                           offset=int(bin_offsets[0]))
            if consumed != int(bin_offsets[-1] - bin_offsets[0]):
                # integrity check, not a debug assert: stripped asserts
                # under python -O would turn this into corrupt postings
                raise RuntimeError(
                    "posting byte stream not contiguous across rows: "
                    f"decoded {consumed} bytes, offsets span "
                    f"{int(bin_offsets[-1] - bin_offsets[0])}")
            vals = vals.astype(np.int64)

            vstart = np.zeros(n_blocks, dtype=np.int64)
            np.cumsum(3 * cnt[:-1] - 1, out=vstart[1:])
            pstart = np.zeros(n_blocks, dtype=np.int64)
            np.cumsum(cnt[:-1], out=pstart[1:])
            bid = np.repeat(np.arange(n_blocks, dtype=np.int64), cnt)
            ordb = np.arange(total, dtype=np.int64) - pstart[bid]

            tfs = vals[vstart[bid] + (cnt[bid] - 1) + ordb]
            dls = vals[vstart[bid] + (2 * cnt[bid] - 1) + ordb]

            # one GLOBAL doc cumsum across every list in the batch: the
            # delta at any block start is first[b] − last[b−1] — the same
            # formula within a list (gap from the previous block) and
            # across list boundaries (it cancels the running prefix of the
            # previous list exactly, so each list re-bases to its absolute
            # first doc)
            delta = np.empty(total, dtype=np.int64)
            nz = ordb > 0
            delta[nz] = vals[(vstart[bid] + ordb - 1)[nz]]
            base = np.empty(n_blocks, dtype=np.int64)
            base[0] = first[0]
            base[1:] = first[1:] - last[:-1]
            delta[pstart] = base
            docs = np.cumsum(delta)
            row_block_start = np.zeros(n_rows, dtype=np.int64)
            np.cumsum(blocks_per_row[:-1], out=row_block_start[1:])

            postings_per_row = np.add.reduceat(
                np.append(cnt, 0), np.append(row_block_start, n_blocks)
            )[:-1] * (blocks_per_row > 0)
            row_idx = np.repeat(np.arange(n_rows, dtype=np.int64),
                                postings_per_row)
            term_out = pc.take(batch.column("term"),
                               pa.array(row_idx, pa.int64()))
            yield pa.RecordBatch.from_pydict({
                "doc_id": pa.array(docs, pa.int64()),
                "term": term_out,
                "tf": pa.array(tfs.astype(np.int32), pa.int32()),
                "dl": pa.array(dls.astype(np.int32), pa.int32()),
            })

    return seg.mapInArrow(_dec, schema="doc_id long, term string, tf int, dl int")


def _stats_from_dl(dl_df: DataFrame) -> tuple[int, float]:
    row = dl_df.agg(F.count(F.lit(1)).alias("n"),
                    F.avg("dl").alias("avgdl")).collect()[0]
    n = int(row["n"] or 0)
    return n, (float(row["avgdl"]) if n else 0.0)


def _shard_batches(num_shards: int, n_batches: int) -> list[list[int]]:
    n_batches = max(1, min(n_batches, num_shards))
    return [list(range(num_shards))[i::n_batches] for i in range(n_batches)]


def _build_segments(postings: DataFrame,
                    term_buckets: int = 32) -> DataFrame:
    """(doc_id, term, tf, dl, shard) → one packed posting list per
    (shard, term) — the single wide shuffle of the build.

    The shuffle key is (shard, term-bucket), not (shard, term): one Arrow
    call encodes a whole bucket of terms, amortizing per-group overhead when
    the vocabulary is large and posting lists are short. Skew stays bounded:
    a hot term's postings are already split across shards by doc-sharding,
    and xxhash64 spreads terms uniformly over buckets.

    The posting rows are aggregated into per-term sorted struct arrays
    JVM-SIDE (collect_list + sort_array inside the hash aggregate), so the
    Python boundary carries one row per (shard, term) — 100-1000× fewer
    rows than the raw postings. In this sandbox the JVM→Arrow→Python pipe
    costs ~5-10 µs/row independent of core count (a shared-resource floor),
    so shrinking boundary rows, not speeding the UDF, is what makes the
    stage scale. Inside Python the list buffers map zero-copy into numpy
    and the whole batch encodes in one vectorized ``encode_group`` call."""
    import pyarrow as pa

    def _encode_batches(it):
        from deluge_spark.index.codec import encode_group

        for batch in it:
            if batch.num_rows == 0:
                continue
            plists = batch.column("plist")
            if isinstance(plists, pa.ChunkedArray):
                plists = plists.combine_chunks()
            offsets = plists.offsets.to_numpy(zero_copy_only=False)
            structs = plists.values
            doc = structs.field("doc_id").to_numpy(zero_copy_only=False)
            tf = structs.field("tf").to_numpy(zero_copy_only=False)
            dl = structs.field("dl").to_numpy(zero_copy_only=False)
            lens = np.diff(offsets)
            idx = np.repeat(np.arange(batch.num_rows, dtype=np.int64), lens)
            # lists arrive doc-sorted (sort_array) and terms are distinct
            # rows → (idx, doc) is already the encoder's required order
            g = encode_group(idx, doc, tf, dl)

            nt = g["n_terms"]
            list_offsets = pa.array(
                g["term_block_offsets"].astype("int32"), pa.int32())

            def _list(flat, patype):
                return pa.ListArray.from_arrays(
                    list_offsets, pa.array(flat, patype))

            buf = pa.py_buffer(g["data"].tobytes())
            if nt and int(g["term_byte_end"][-1]) >= 2**31:
                raise ValueError(
                    "encoded batch exceeds 2 GiB — pa.binary() int32 offsets "
                    "would wrap; lower arrow.maxRecordsPerBatch / term_buckets")
            bin_offsets = np.empty(nt + 1, dtype=np.int32)
            bin_offsets[:-1] = g["term_byte_start"]
            bin_offsets[-1] = g["term_byte_end"][-1] if nt else 0
            data_arr = pa.Array.from_buffers(
                pa.binary(), nt,
                [None, pa.py_buffer(bin_offsets.tobytes()), buf])

            yield pa.RecordBatch.from_pydict({
                "shard": batch.column("shard"),
                "term": batch.column("term"),
                "df_local": pa.array(g["df_local"], pa.int64()),
                "cf_local": pa.array(g["cf_local"], pa.int64()),
                "n_postings": pa.array(g["df_local"], pa.int64()),
                "max_tf": pa.array(g["max_tf"], pa.int64()),
                "min_dl": pa.array(g["min_dl"], pa.int64()),
                "block_first": _list(g["block_first"], pa.int64()),
                "block_last": _list(g["block_last"], pa.int64()),
                "block_count": _list(g["block_count"], pa.int32()),
                "block_off": _list(g["block_off"], pa.int64()),
                "block_max_tf": _list(g["block_max_tf"], pa.int64()),
                "block_min_dl": _list(g["block_min_dl"], pa.int64()),
                "data": data_arr,
            })

    grouped = (postings
               .groupBy("shard", "term")
               .agg(F.sort_array(F.collect_list(F.struct(
                   F.col("doc_id").alias("doc_id"),
                   F.col("tf").cast("long").alias("tf"),
                   F.col("dl").cast("long").alias("dl")))).alias("plist")))
    return grouped.mapInArrow(_encode_batches, schema=SEGMENT_SCHEMA)


def read_tombstones(spark: SparkSession, index_dir: str) -> DataFrame | None:
    """The index's tombstone set as DataFrame(doc_id) — None when absent or
    empty. THE single owner of the tombstone-directory layout check: both
    the query side (Searcher) and the admin side (delete/purge/reindex/
    summary) resolve tombstones through here."""
    p = os.path.join(index_dir, "tombstones")
    try:
        if not os.path.isdir(p) or not any(
                f.endswith(".parquet") for f in os.listdir(p)):
            return None
    except OSError:
        return None
    return spark.read.parquet(p).select("doc_id").distinct()


def read_segments(spark: SparkSession, index_dir: str,
                  batches: list[str] | None = None) -> DataFrame:
    """Read segment rows. The batch-dir list comes from stats/global.json
    (written by the build) — never from a directory glob, so batch dirs left
    behind by an older layout (smaller shard_batches, an aborted rebuild)
    cannot silently merge into query results. ``batches`` overrides for
    callers mid-build, before global.json exists."""
    seg_path = os.path.join(index_dir, "segments")
    if batches is None:
        gpath = os.path.join(index_dir, "stats", "global.json")
        if os.path.exists(gpath):
            with open(gpath) as f:
                batches = json.load(f).get("segment_batches")
    if batches is None:
        batches = sorted(d for d in os.listdir(seg_path)
                         if d.startswith("batch="))
    paths = [os.path.join(seg_path, d) for d in batches]
    return spark.read.option("basePath", seg_path).parquet(*paths)


class StaleIndexError(RuntimeError):
    """Raised when ``index_dir`` holds an index built from a different
    source fingerprint and ``BuildConfig.overwrite_stale`` is False."""


def _reset_stale_index(index_dir: str, man: Manifest, fp: str,
                       allow: bool = False) -> bool:
    """If the manifest holds units committed under a DIFFERENT source
    fingerprint, the on-disk artifacts belong to another corpus/layout —
    resume logic must not skip-and-mix (stale partials/segment dirs would
    silently merge into results). The fingerprint is schema + first source
    files, so a path rename alone trips it: destroying a possibly expensive
    index needs explicit consent (``overwrite_stale=True``); otherwise raise
    with the mismatch so the caller can decide."""
    stale = [e for e in man.entries()
             if e.get("fingerprint") not in (None, fp)]
    if not stale:
        return False
    if not allow:
        raise StaleIndexError(
            f"index at {index_dir} was built from a different source "
            f"(fingerprint mismatch on units "
            f"{sorted({e['unit'] for e in stale})[:8]}): pass "
            "BuildConfig(overwrite_stale=True) to wipe and rebuild, or "
            "point the build at a fresh index_dir")
    for sub in ("docs", "partials", "segments", "stats", "tf", "manifest"):
        shutil.rmtree(os.path.join(index_dir, sub), ignore_errors=True)
    os.makedirs(man.dir, exist_ok=True)
    return True


def read_global_stats(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "stats", "global.json")) as f:
        return json.load(f)


def write_global_stats(index_dir: str, glob: dict) -> None:
    """Atomic (tmp + rename) rewrite of the index's authoritative state
    file — global.json carries the segment-batch list every reader trusts,
    so a crash mid-write must never leave a truncated file."""
    stats_dir = os.path.join(index_dir, "stats")
    os.makedirs(stats_dir, exist_ok=True)
    tmp = os.path.join(stats_dir, ".global.json.tmp")
    with open(tmp, "w") as f:
        json.dump(glob, f)
    os.replace(tmp, os.path.join(stats_dir, "global.json"))
