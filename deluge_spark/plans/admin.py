"""Admin operations: source summary, index stats, migration/re-index.

Reference counterparts:
- ``summarize_source`` ≙ the pre-scan Summary (files+bytes / docs+bytes,
  /root/reference/input/file/input.go:95-104, elastic/v7/client.go:204-242).
- ``index_summary`` ≙ GetIndexSummary — NOTE the reference's
  ``NumDocs()`` actually returns the byte size (elastic/v7/summary.go:15-17,
  identical in v2/v5); we return both, correctly.
- ``reindex`` ≙ the ES→ES migration/clone path (scroll source → re-ingest,
  /root/reference/input.go:18-20, input/elastic/input.go:36-58): rebuilds
  segments under a new layout (different shard count / block size) from the
  persisted tf checkpoints — without re-tokenizing, the cheap path the
  reference cannot take (it re-parses every document through the full
  pipeline).
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deluge_spark.index.build import (
    BuildConfig,
    _build_segments,
    read_global_stats,
    read_segments,
    read_tombstones,
    write_global_stats,
)
from deluge_spark.index.manifest import Manifest


def format_bytes(n: int) -> str:
    """Human-readable byte count (≙ /root/reference/util/format.go:18-28)."""
    for unit in ("B", "KB", "MB", "GB", "TB", "PB"):
        if abs(n) < 1024.0:
            return f"{n:.1f}{unit}" if unit != "B" else f"{n:.0f}B"
        n /= 1024.0
    return f"{n:.1f}EB"


def summarize_source(df: DataFrame, text_col: str = "content") -> dict:
    """Pre-scan stats: doc count + byte volume (one aggregate pass)."""
    row = df.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(F.length(text_col)).alias("bytes"),
    ).collect()[0]
    docs, nbytes = int(row["docs"] or 0), int(row["bytes"] or 0)
    return {"docs": docs, "bytes": nbytes,
            "pretty": f"{docs} docs, {format_bytes(nbytes)}"}


def _segment_bytes_by_shard(index_dir: str) -> dict[int, int]:
    """Per-shard ON-DISK parquet bytes from a filesystem metadata walk of
    the authoritative batch dirs — O(files), never a scan of the posting
    blobs (a summary must not read the index; at 100 TB summing
    length(data) IS a full index scan)."""
    seg_root = os.path.join(index_dir, "segments")
    gpath = os.path.join(index_dir, "stats", "global.json")
    batches = None
    if os.path.exists(gpath):
        with open(gpath) as f:
            batches = json.load(f).get("segment_batches")
    if batches is None:
        batches = [d for d in sorted(os.listdir(seg_root))
                   if d.startswith("batch=")]
    out: dict[int, int] = {}
    for b in batches:
        bdir = os.path.join(seg_root, b)
        if not os.path.isdir(bdir):
            continue
        for d in os.listdir(bdir):
            if not d.startswith("shard="):
                continue
            s = int(d.split("=", 1)[1])
            sdir = os.path.join(bdir, d)
            out[s] = out.get(s, 0) + sum(
                e.stat().st_size for e in os.scandir(sdir)
                if e.name.endswith(".parquet"))
    return out


def index_summary(spark: SparkSession, index_dir: str) -> dict:
    """Index stats: corpus stats + per-shard segment rollup + manifest.
    ``bytes`` are on-disk parquet sizes (metadata walk); terms/postings
    come from pruned-column aggregates — the posting blobs are never
    read."""
    stats = read_global_stats(index_dir)
    seg = read_segments(spark, index_dir)
    disk = _segment_bytes_by_shard(index_dir)
    shards = {
        int(r["shard"]): {"terms": int(r["terms"]),
                          "postings": int(r["postings"]),
                          "bytes": disk.get(int(r["shard"]), 0)}
        for r in seg.groupBy("shard").agg(
            F.count(F.lit(1)).alias("terms"),
            F.sum("n_postings").alias("postings")).collect()
    }
    man = Manifest(index_dir)
    tomb = read_tombstones(spark, index_dir)
    return {
        "n_docs": stats["n_docs"],
        "tombstoned": 0 if tomb is None else tomb.count(),
        "avgdl": stats["avgdl"],
        "total_postings": stats["total_postings"],
        "num_shards": stats["num_shards"],
        "vocabulary": sum(s["terms"] for s in shards.values()),
        "index_bytes": sum(s["bytes"] for s in shards.values()),
        "shards": shards,
        "sealed": man.is_sealed(),
        "units": len(man.entries()),
    }


def _reset_stream_runs(man: Manifest) -> None:
    """Drop the streaming tier state's live runs (they were just swallowed
    into a compacted base batch; future deltas restart tiering from
    empty), preserving the compacted-groups ledger and seq counter."""
    st = man.get("stream_state")
    if st and st.get("runs"):
        man.commit("stream_state", runs=[],
                   next_seq=int(st.get("next_seq", 0)),
                   compacted_groups=list(st.get("compacted_groups", [])),
                   num_shards=int(st.get("num_shards", 0) or 0))


def _finish_compact_swap(index_dir: str, man: Manifest,
                         glob_stats: dict | None, new_name: str) -> None:
    """The commit sequence of a full compaction, idempotent so crash
    recovery can re-run it: repoint the authoritative batch list, reset
    the streaming tier state (its runs are inside ``new_name`` now), then
    sweep every batch dir the new list no longer references. Sweep is
    LAST — in every crash prefix either the old list is fully valid with
    all its dirs intact, or the new list is."""
    seg_root = os.path.join(index_dir, "segments")
    if glob_stats is not None:
        glob_stats["segment_batches"] = [new_name]
        write_global_stats(index_dir, glob_stats)
    live = {new_name}
    _reset_stream_runs(man)
    for d in sorted(os.listdir(seg_root)):   # replaced batches + orphans
        if d.startswith("batch=") and d not in live:
            shutil.rmtree(os.path.join(seg_root, d))


def recover_compact_intent(index_dir: str) -> bool:
    """Roll a crashed ``compact_segments`` swap forward (or abandon it).

    ``compact_segments`` commits a ``compact_intent`` (new batch name +
    the batch list it replaces) once the merged dir is durable, BEFORE the
    global.json repoint / stream-state reset / sweep. Every admin entry
    point that depends on batch-list ↔ tier-state consistency calls this
    first:

    - global.json still equals the replaced list, or already points at the
      new batch → roll FORWARD (finish repoint + state reset + sweep —
      without this, a crash between the repoint and the state reset leaves
      ``stream_state`` naming run dirs the sweep deleted, and the next
      ``finalize_segments`` would read nonexistent paths);
    - global.json moved on (e.g. an append committed between the crash and
      recovery, so the replaced list is stale) → ABANDON: repointing now
      would clobber that later commit; the merged dir is left as an orphan
      for the next compaction's sweep."""
    man = Manifest(index_dir)
    it = man.get("compact_intent")
    if not it or it.get("done"):
        return False
    new_name = it["batch"]
    replaced = list(it.get("replaced", []))
    gpath = os.path.join(index_dir, "stats", "global.json")
    glob_stats = None
    if os.path.exists(gpath):
        with open(gpath) as f:
            glob_stats = json.load(f)
    cur = list(glob_stats.get("segment_batches", [])) if glob_stats else []
    seg_root = os.path.join(index_dir, "segments")
    if new_name in cur:
        # the repoint already landed (possibly followed by further commits
        # — e.g. an append batch now alongside new_name): the replaced
        # runs' postings live inside new_name, so finish the remaining
        # steps — tier-state reset + sweep of exactly the replaced dirs —
        # or the next finalize double-counts the swallowed stream runs
        _reset_stream_runs(man)
        for d in replaced:
            p = os.path.join(seg_root, d)
            if d not in cur and os.path.exists(p):
                shutil.rmtree(p)
        man.commit("compact_intent", done=True, batch=new_name)
        return True
    if (os.path.exists(os.path.join(seg_root, new_name))
            and set(cur) <= set(replaced)):
        # crash before the repoint and nothing else committed since (the
        # intent may cover MORE than global — state-only stream runs it
        # swallowed): run the full swap sequence
        _finish_compact_swap(index_dir, man, glob_stats, new_name)
        man.commit("compact_intent", done=True, batch=new_name)
        return True
    # a later commit (append/merge) landed after the crash and before the
    # repoint: repointing now would clobber it — abandon; the merged dir
    # is an orphan the next compaction sweeps
    man.commit("compact_intent", done=True, batch=new_name, abandoned=True)
    return False


def compact_segments(spark: SparkSession, index_dir: str,
                     files_per_shard: int = 1) -> dict:
    """Squash every segment batch into ONE — the Lucene segment merge
    behind ES ``_forcemerge`` (the reference defers write amplification
    the same way: replicas 0→N post-ingest,
    /root/reference/ingestor.go:226-231). Two effects at once: many small
    shuffle-output files become ``files_per_shard`` scan-friendly ones,
    AND per-(shard, term) rows accumulated across batches (one per append
    / stream run) are decode→merge-sort→re-encoded into a single posting
    list each, so query-time rows per term return to 1 regardless of how
    many appends preceded the compaction.

    Crash-safe ordering: the merged batch lands under a NEW unique name,
    then a ``compact_intent`` is committed (WAL) before the global.json
    repoint → tier-state reset → sweep sequence, so a crash anywhere in
    that sequence is rolled forward by ``recover_compact_intent`` at the
    next admin entry point — the batch list and the streaming tier state
    can never disagree about which run dirs exist."""
    import uuid

    from deluge_spark.index.build import _merge_partials_reencode

    recover_compact_intent(index_dir)
    seg_root = os.path.join(index_dir, "segments")
    gpath = os.path.join(index_dir, "stats", "global.json")
    glob_stats = None
    if os.path.exists(gpath):
        with open(gpath) as f:
            glob_stats = json.load(f)
    old = (list(glob_stats.get("segment_batches", [])) if glob_stats
           else None)
    if not old:    # legacy global.json: same glob fallback as read_segments
        old = [d for d in sorted(os.listdir(seg_root))
               if d.startswith("batch=")]
    # a mid-finalize crash can leave a committed stream run in the tier
    # state that global.json doesn't list yet — swallow it too, or the
    # sweep would delete its postings
    man = Manifest(index_dir)
    st = man.get("stream_state")
    for r in (st or {}).get("runs", []):
        if (r["name"] not in old
                and os.path.exists(os.path.join(seg_root, r["name"]))):
            old.append(r["name"])
    seg = read_segments(spark, index_dir, batches=old)
    merged = _merge_partials_reencode(
        seg.withColumn("shard", F.col("shard").cast("int"))
        .select("shard", "term", "block_first", "block_last",
                "block_count", "block_off", "data"))
    new_name = f"batch=compacted_{uuid.uuid4().hex[:8]}"
    tmp = os.path.join(seg_root, ".compact_tmp")
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    (merged.repartition(files_per_shard, "shard")
        .write.mode("overwrite").partitionBy("shard").parquet(tmp))
    os.rename(tmp, os.path.join(seg_root, new_name))
    man.commit("compact_intent", batch=new_name, replaced=old)
    _finish_compact_swap(index_dir, man, glob_stats, new_name)
    man.commit("compact_intent", done=True, batch=new_name)
    man.commit("compaction", files_per_shard=files_per_shard,
               replaced=old, batch=new_name)
    n_files = sum(
        len([f for f in files if f.endswith(".parquet")])
        for _, _, files in os.walk(os.path.join(seg_root, new_name)))
    return {"files": n_files, "replaced_batches": len(old),
            "batch": new_name}


def merge_small_batches(spark: SparkSession, index_dir: str,
                        keep: int) -> dict:
    """Lucene-style PARTIAL merge: re-encode-merge the smallest segment
    batches so at most ``keep`` remain — the big base batches are never
    rewritten (unlike ``compact_segments``, whose full rewrite costs
    O(index) every trigger; repeated smallest-first merges amortize to
    O(total · log N) across N appends, each doc rewritten O(log N) times).
    Crash-safe with the same new-name → repoint → sweep ordering as
    ``compact_segments``; the sweep touches only append/merged batch dirs,
    never pending streaming run dirs."""
    import uuid

    from deluge_spark.index.build import _merge_partials_reencode

    recover_compact_intent(index_dir)
    glob = read_global_stats(index_dir)
    batches = list(glob.get("segment_batches", []))
    if len(batches) <= keep:
        return {"merged_batches": 0, "batches": len(batches)}
    seg_root = os.path.join(index_dir, "segments")
    sizes = {f"batch={r['batch']}": int(r["p"] or 0)
             for r in read_segments(spark, index_dir, batches=batches)
             .groupBy("batch").agg(F.sum("n_postings").alias("p"))
             .collect()}
    # streaming run dirs belong to the finalize tier state — merging them
    # here would leave that state pointing at deleted dirs; they have
    # their own size-tiered policy (streaming/ingest.py)
    order = sorted((b for b in batches if not b.startswith("batch=stream")),
                   key=lambda b: sizes.get(b, 0))
    inputs = order[:len(batches) - keep + 1]
    if len(inputs) < 2:
        return {"merged_batches": 0, "batches": len(batches)}
    merged = _merge_partials_reencode(
        read_segments(spark, index_dir, batches=inputs)
        .withColumn("shard", F.col("shard").cast("int"))
        .select("shard", "term", "block_first", "block_last",
                "block_count", "block_off", "data"))
    new_name = f"batch=merged_{uuid.uuid4().hex[:8]}"
    tmp = os.path.join(seg_root, ".merge_small_tmp")
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    merged.write.mode("overwrite").partitionBy("shard").parquet(tmp)
    os.rename(tmp, os.path.join(seg_root, new_name))
    glob["segment_batches"] = \
        [b for b in batches if b not in set(inputs)] + [new_name]
    write_global_stats(index_dir, glob)
    live = set(glob["segment_batches"])
    for d in sorted(os.listdir(seg_root)):   # inputs + crash orphans
        if (d.startswith("batch=append_") or d.startswith("batch=merged_")) \
                and d not in live:
            shutil.rmtree(os.path.join(seg_root, d))
    for d in inputs:                          # e.g. a swallowed batch=0
        p = os.path.join(seg_root, d)
        if os.path.exists(p):
            shutil.rmtree(p)
    Manifest(index_dir).commit(
        f"merge_small_{new_name.split('_', 1)[1]}",
        inputs=inputs, batch=new_name,
        postings_merged=sum(sizes.get(b, 0) for b in inputs))
    return {"merged_batches": len(inputs), "batch": new_name,
            "batches": len(glob["segment_batches"])}


#: stored-field columns the engine itself depends on: doc_id/shard key the
#: segment postings, content_sha256 is the dedup/identity invariant
PROTECTED_STORED_FIELDS = frozenset({"doc_id", "shard", "content_sha256"})


def update_stored_fields(spark: SparkSession, index_dir: str,
                         add: dict | None = None,
                         drop: list[str] | None = None) -> dict:
    """Mapping-update analog: evolve an existing index's stored-field
    (docs) schema IN PLACE — add columns derived from existing stored
    fields (SQL expressions or Columns) and/or drop non-core columns —
    without re-tokenizing or touching segments (≙ the reference's
    ``SetUpdateMapping`` PutMapping path, /root/reference/options.go:122-127,
    ingestor.go:125-132: update the mapping of an index that already
    exists instead of rebuilding it).

    Searches are byte-identical afterwards (scoring never reads docs);
    added columns are immediately usable as keyword filters
    (``Searcher.search(filters={...})``). Each evolution is recorded as a
    ``mapping_update_<n>`` manifest unit. Cost: one rewrite of the docs
    table — O(corpus stored fields), zero tokenization, zero shuffle
    (narrow projection).
    """
    add = dict(add or {})
    drop = list(drop or [])
    bad = (set(drop) | set(add)) & PROTECTED_STORED_FIELDS
    if bad:
        raise ValueError(f"cannot add/drop protected stored fields: "
                         f"{sorted(bad)}")
    if not add and not drop:
        raise ValueError("nothing to update: pass add= and/or drop=")

    docs_path = os.path.join(index_dir, "docs")
    tmp_path = os.path.join(index_dir, ".docs_update_tmp")
    retired = os.path.join(index_dir, ".docs_retired")
    # crash recovery: an interrupted swap left the new table in retired's
    # place-holder window — restore the last complete table
    if not os.path.exists(docs_path) and os.path.exists(retired):
        os.rename(retired, docs_path)
    for leftover in (tmp_path, retired):
        if os.path.exists(leftover):
            shutil.rmtree(leftover)

    docs = spark.read.parquet(docs_path)
    missing = [c for c in drop if c not in docs.columns]
    if missing:
        raise ValueError(f"cannot drop absent columns: {missing}")
    clash = [c for c in add if c in docs.columns]
    if clash:
        raise ValueError(
            f"columns already exist: {clash} — add= must not silently "
            f"overwrite stored data; drop them (in a prior call) to "
            f"re-derive")
    for name, expr in add.items():
        docs = docs.withColumn(
            name, F.expr(expr) if isinstance(expr, str) else expr)
    if drop:
        docs = docs.drop(*drop)
    docs.write.mode("overwrite").parquet(tmp_path)

    os.rename(docs_path, retired)
    os.rename(tmp_path, docs_path)
    shutil.rmtree(retired)

    cols = spark.read.parquet(docs_path).columns
    man = Manifest(index_dir)
    n_prior = sum(1 for e in man.entries()
                  if e["unit"].startswith("mapping_update_"))
    man.commit(f"mapping_update_{n_prior}",
               added=sorted(add), dropped=sorted(drop), columns=cols)
    return {"added": sorted(add), "dropped": sorted(drop), "columns": cols,
            "updates_applied": n_prior + 1}


def delete_docs(spark: SparkSession, index_dir: str,
                where: str | None = None,
                doc_ids: list[int] | None = None,
                ids_df: DataFrame | None = None) -> dict:
    """Delete documents from a built index — tombstones, not a rebuild
    (ES delete/delete-by-query semantics; the reference's users have this
    through ES while deluge itself is ingest-only).

    ``where`` is a SQL predicate over the ``docs`` stored fields (e.g.
    ``"lang = 'go'"``); ``doc_ids`` an explicit id list; ``ids_df`` a
    DataFrame(doc_id) for distributed-scale selections (never collected
    to the driver). Any combination. Matched doc_ids append to
    ``index_dir/tombstones`` (parquet). Tombstoned docs disappear from
    every search path immediately on the next ``Searcher`` open; df/avgdl
    stay as-built until ``purge_deleted`` / ``reindex`` (Lucene
    semantics: survivor scores unchanged by a delete). Each call commits
    a ``delete_<n>`` manifest unit."""
    if where is None and doc_ids is None and ids_df is None:
        raise ValueError("pass where=, doc_ids= and/or ids_df=")
    docs = spark.read.parquet(os.path.join(index_dir, "docs"))
    matched = None
    if where is not None:
        matched = docs.filter(F.expr(where)).select("doc_id")
    if doc_ids is not None:
        ex = spark.createDataFrame(
            [(int(i),) for i in doc_ids], "doc_id long")
        ids_df = ex if ids_df is None else ids_df.select("doc_id").union(ex)
    if ids_df is not None:
        # resolve through the docs table: nonexistent ids are not counted
        explicit = docs.select("doc_id").join(
            ids_df.select("doc_id"), "doc_id", "left_semi")
        matched = explicit if matched is None else matched.union(explicit)
    matched = matched.distinct()
    prior = read_tombstones(spark, index_dir)
    n_prior = 0 if prior is None else prior.count()
    if prior is not None:
        matched = matched.join(prior, "doc_id", "left_anti")
    # count BEFORE the append: a post-append re-read would see the new files
    n_deleted = matched.count()
    if n_deleted:
        matched.write.mode("append").parquet(
            os.path.join(index_dir, "tombstones"))
    total = n_prior + n_deleted
    man = Manifest(index_dir)
    n_units = sum(1 for e in man.entries()
                  if e["unit"].startswith("delete_"))
    man.commit(f"delete_{n_units}", deleted=n_deleted,
               total_tombstoned=total, where=where)
    return {"deleted": n_deleted, "total_tombstoned": total}


def _rollback_inflight_append(spark: SparkSession, index_dir: str,
                              man: Manifest) -> None:
    """Crash recovery for ``append_docs``: if a prior append committed its
    begin marker but never its end, roll the index back to the recorded
    ``base_id`` watermark — rewrite docs/docs_meta without ids >= base_id
    (retired-dir swap) and drop the partial/segment dirs the dead append
    may have left — so the retry starts from the exact pre-append state
    instead of duplicating the new docs under fresh ids."""
    st = man.get("append_inflight")
    if not st or st.get("done"):
        return
    base_id = int(st["base_id"])
    unit = st["append_unit"]
    # stats are part of the rollback contract (round-4 ADVICE): a crash
    # after the terms-table swap or the global.json rewrite must not let
    # the retry merge the batch's df/cf or total_postings a second time —
    # restore terms from the retained retired dir and global.json from the
    # snapshot the begin marker carries.
    stats_dir = os.path.join(index_dir, "stats")
    terms_path = os.path.join(stats_dir, "terms")
    retired_terms = os.path.join(stats_dir, ".terms_append_retired")
    tmp_terms = os.path.join(stats_dir, ".terms_append_tmp")
    if os.path.exists(retired_terms):
        if os.path.exists(terms_path):
            shutil.rmtree(terms_path)
        os.rename(retired_terms, terms_path)
    if os.path.exists(tmp_terms):
        shutil.rmtree(tmp_terms)
    if st.get("prev_global"):
        gtmp = os.path.join(stats_dir, ".global.json.tmp")
        with open(gtmp, "w") as f:
            json.dump(st["prev_global"], f)
        os.replace(gtmp, os.path.join(stats_dir, "global.json"))
    for name in ("docs", "docs_meta"):
        live = os.path.join(index_dir, name)
        retired = os.path.join(index_dir, f".append_retired_{name}")
        tmp = os.path.join(index_dir, f".append_tmp_{name}")
        if not os.path.exists(live) and os.path.exists(retired):
            os.rename(retired, live)      # earlier rollback died mid-swap
        for leftover in (tmp, retired):
            if os.path.exists(leftover):
                shutil.rmtree(leftover)
        (spark.read.parquet(live).filter(F.col("doc_id") < base_id)
         .write.mode("overwrite").parquet(tmp))
        os.rename(live, retired)
        os.rename(tmp, live)
        shutil.rmtree(retired)
    for d in (os.path.join(index_dir, "partials", f"group={unit}"),
              os.path.join(index_dir, "segments", f"batch={unit}")):
        if os.path.exists(d):
            shutil.rmtree(d)
    man.commit("append_inflight", done=True, rolled_back=unit,
               base_id=base_id)


#: auto-compaction trigger: when an append leaves more than this many
#: segment batches, squash them (Lucene merge-policy analog — without it a
#: term's query-time segment rows grow linearly with append count)
DEFAULT_AUTO_COMPACT_BATCHES = 16


def append_docs(spark: SparkSession, index_dir: str,
                new_corpus: DataFrame,
                auto_compact_batches: int | None =
                DEFAULT_AUTO_COMPACT_BATCHES) -> dict:
    """Incrementally add documents to a BUILT index — no rebuild, no touch
    of existing segments (the batch analog of the streaming delta path;
    an ES user's ``_bulk`` onto an existing index).

    New docs get dense doc_ids continuing above the current max doc_id
    (ids are engine-owned: any ``doc_id`` column on ``new_corpus`` is
    dropped and re-keyed in natural-key order), are tokenized+encoded in
    one pass (the same map-side-partials stage as the build), and land in
    their OWN segment batch dir — every search path already sums a term's
    postings across segment batches, and ``compact_segments`` squashes
    batches later (Lucene's add-then-merge lifecycle). The appended docs
    rows are projected onto the LIVE docs schema (columns evolved via
    ``update_stored_fields`` that cannot be derived here are NULL-filled
    and reported in the return dict — re-derive them with a follow-up
    ``update_stored_fields`` drop+add). Stats refresh incrementally:
    terms df/cf merge the old terms table with the new batch only, and
    total_postings adds the new batch's count — O(vocabulary + new docs),
    never a rescan of existing segment bytes.

    Crash-safe: a begin marker (``append_inflight`` manifest unit) records
    the id watermark AND a global.json snapshot before any mutation (the
    pre-append terms table is retained through the stats swap); an
    interrupted append is rolled back to that watermark — docs, docs_meta,
    terms and global stats alike — on the next call, so retries never
    duplicate docs or inflate df/total_postings.

    ``auto_compact_batches``: when the append leaves more than this many
    segment batches, ``merge_small_batches`` folds the smallest ones
    together (Lucene's merge policy behind ES ``_bulk`` — bounds batch
    count and per-term query rows under many small appends WITHOUT a full
    index rewrite: big base batches are never touched, so N appends
    amortize to O(total · log N) bytes rewritten; None disables;
    ``compact_segments`` remains the explicit full force-merge)."""
    from deluge_spark.index.build import (
        PARTIALS_SCHEMA,
        _merge_partials,
        _tokenize_encode_partials,
    )
    from deluge_spark.operators.doc_ids import (
        assign_doc_ids,
        unpersist_assigned,
    )

    recover_compact_intent(index_dir)
    stats = read_global_stats(index_dir)
    num_shards = int(stats["num_shards"])
    mode = stats.get("tokenizer_mode", "code")
    man = Manifest(index_dir)
    _rollback_inflight_append(spark, index_dir, man)
    n_prior = sum(1 for e in man.entries()
                  if e["unit"].startswith("append_") and
                  e["unit"] != "append_inflight")
    unit = f"append_{n_prior}"

    # id offset = max existing doc_id + 1 (NOT n_docs: n_docs counts only
    # docs with postings, while empty docs still own ids in the docs table
    # — offsetting by n_docs could collide with a live id)
    docs_path = os.path.join(index_dir, "docs")
    live_docs = spark.read.parquet(docs_path)
    hi = live_docs.agg(F.max("doc_id").alias("hi")).collect()[0]["hi"]
    base_id = int(hi) + 1 if hi is not None else 0

    if "doc_id" in new_corpus.columns:
        new_corpus = new_corpus.drop("doc_id")
    assigned, n_new = assign_doc_ids(new_corpus, return_count=True)
    if n_new == 0:
        unpersist_assigned(assigned)
        return {"appended": 0, "n_docs": int(stats["n_docs"])}
    # shift the dense 0..M-1 ids above the existing corpus — monotone, so
    # the range-disjoint partitioning (which the concat merge relies on)
    # is preserved
    shifted = assigned.withColumn(
        "doc_id", (F.col("doc_id") + F.lit(base_id)).cast("long"))

    # clear any retired-terms leftover of a COMPLETED append (crash between
    # its done-commit and cleanup) BEFORE this append's begin marker: the
    # rollback contract is that .terms_append_retired, when present with an
    # open marker, always belongs to THAT marker's append — restoring an
    # older leftover would silently drop the completed append's df/cf
    stale_retired = os.path.join(index_dir, "stats",
                                 ".terms_append_retired")
    if os.path.exists(stale_retired):
        shutil.rmtree(stale_retired)
    # the begin marker carries a snapshot of global.json so rollback can
    # restore stats exactly (terms are restored from the retained retired
    # dir — see _rollback_inflight_append)
    with open(os.path.join(index_dir, "stats", "global.json")) as f:
        prev_global = json.load(f)
    man.commit("append_inflight", base_id=base_id, append_unit=unit,
               prev_global=prev_global)
    try:
        # docs table: project onto the LIVE schema so appended files never
        # diverge from columns evolved via update_stored_fields
        computed = {
            "doc_id": F.col("doc_id"),
            "content_sha256": F.sha2(F.col("content"), 256),
            "shard": F.pmod(F.col("doc_id"),
                            F.lit(num_shards)).cast("int"),
        }
        null_filled = []
        keep = []
        for f in live_docs.schema.fields:
            if f.name in computed:
                keep.append(computed[f.name].alias(f.name))
            elif f.name in shifted.columns:
                keep.append(F.col(f.name).cast(f.dataType).alias(f.name))
            else:
                null_filled.append(f.name)
                keep.append(F.lit(None).cast(f.dataType).alias(f.name))
        shifted.select(*keep).write.mode("append").parquet(docs_path)

        # one tokenize+encode pass → own partials group → own segment batch
        partials = _tokenize_encode_partials(shifted, "content", mode,
                                             num_shards)
        pdir = os.path.join(index_dir, "partials", f"group={unit}")
        partials.write.mode("overwrite").partitionBy("shard").parquet(pdir)
        # explicit schema: an all-empty-docs append writes no parquet
        # files, and schema inference would throw on the bare directory
        p_all = (spark.read.schema(PARTIALS_SCHEMA)
                 .option("basePath",
                         os.path.join(index_dir, "partials"))
                 .parquet(pdir))

        (p_all.filter(F.col("term").isNull())
         .select(F.col("first_doc").alias("doc_id"),
                 F.col("df_p").cast("long").alias("dl"))
         .write.mode("append").parquet(
             os.path.join(index_dir, "docs_meta")))

        new_postings = 0
        seg_batch = None
        term_rows = p_all.filter(F.col("term").isNotNull())
        if term_rows.limit(1).count():
            seg = _merge_partials(term_rows)
            seg_batch = f"batch={unit}"
            seg_dir = os.path.join(index_dir, "segments", seg_batch)
            seg.write.mode("overwrite").partitionBy("shard").parquet(
                seg_dir)
            seg_new = spark.read.option(
                "basePath",
                os.path.join(index_dir, "segments")).parquet(seg_dir)
            new_postings = int(seg_new.agg(
                F.sum("n_postings")).collect()[0][0] or 0)
    except BaseException:
        unpersist_assigned(assigned)
        raise   # inflight marker stays; next append rolls back
    unpersist_assigned(assigned)

    # ---- incremental stats refresh: old terms table ⊕ new batch only ----
    stats_dir = os.path.join(index_dir, "stats")
    gpath = os.path.join(stats_dir, "global.json")
    with open(gpath) as f:
        glob = json.load(f)
    batches = glob.get("segment_batches")
    if batches is None:
        # legacy global.json without the key: same glob fallback as
        # read_segments — NOT [] (which would repoint the index at only
        # the new batch and lose every existing segment)
        batches = sorted(
            d for d in os.listdir(os.path.join(index_dir, "segments"))
            if d.startswith("batch="))
    batches = list(batches)
    if seg_batch is not None and seg_batch not in batches:
        batches.append(seg_batch)
        terms_path = os.path.join(stats_dir, "terms")
        new_terms = (term_rows.groupBy("term")
                     .agg(F.sum("df_p").alias("df"),
                          F.sum("cf_p").alias("cf")))
        merged = (spark.read.parquet(terms_path).unionByName(new_terms)
                  .groupBy("term").agg(F.sum("df").alias("df"),
                                       F.sum("cf").alias("cf")))
        tmp_terms = os.path.join(stats_dir, ".terms_append_tmp")
        merged.write.mode("overwrite").parquet(tmp_terms)
        # the retired dir is RETAINED until the done-commit so an
        # interrupted append can restore the pre-append terms table
        retired_terms = os.path.join(stats_dir, ".terms_append_retired")
        if os.path.exists(retired_terms):   # leftover of a done append
            shutil.rmtree(retired_terms)
        os.rename(terms_path, retired_terms)
        os.rename(tmp_terms, terms_path)
    dl_df = spark.read.parquet(os.path.join(index_dir, "docs_meta"))
    row = dl_df.agg(F.count(F.lit(1)).alias("n"),
                    F.avg("dl").alias("avgdl")).collect()[0]
    glob.update(n_docs=int(row["n"] or 0),
                avgdl=float(row["avgdl"] or 0.0),
                total_postings=int(glob.get("total_postings", 0))
                + new_postings,
                segment_batches=batches)
    write_global_stats(index_dir, glob)
    man.commit(unit, appended=n_new, n_docs=glob["n_docs"],
               segment_batch=seg_batch, null_filled=null_filled)
    man.commit("append_inflight", done=True, append_unit=unit,
               base_id=base_id)
    # best-effort: the retained pre-append terms snapshot is now dead
    # weight (a leftover is cleaned by the next append's swap)
    retired_terms = os.path.join(stats_dir, ".terms_append_retired")
    if os.path.exists(retired_terms):
        shutil.rmtree(retired_terms)
    compacted = False
    if auto_compact_batches is not None and \
            len(batches) > auto_compact_batches:
        # PARTIAL merge of the smallest batches (Lucene merge policy):
        # bounds batch count at the threshold without compact_segments'
        # full O(index) rewrite every trigger — N appends amortize to
        # O(total · log N) rewritten, each doc remerged O(log N) times
        merge_small_batches(spark, index_dir, keep=auto_compact_batches)
        compacted = True
    return {"appended": n_new, "n_docs": glob["n_docs"],
            "null_filled": null_filled, "auto_compacted": compacted}


def upsert_docs(spark: SparkSession, index_dir: str,
                new_corpus: DataFrame,
                key_cols: tuple[str, ...] = ("repo", "path")) -> dict:
    """Document UPDATE by re-ingest — the reference's actual change
    workflow (point the ingester at changed files again; ES overwrites by
    ``_id``): every live doc whose ``key_cols`` tuple appears in
    ``new_corpus`` is tombstoned, then ``new_corpus`` is appended as the
    new version. Old versions stop matching immediately (tombstones);
    their bytes and stats are reclaimed at ``purge_deleted`` /
    ``compact``-time, exactly like an ES update awaiting segment merge.
    Composes the two crash-safe primitives — an interrupted upsert is an
    interrupted delete (idempotent re-run) or an interrupted append
    (rolled back on retry)."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    # roll back any append interrupted mid-flight BEFORE key-matching:
    # half-appended rows would otherwise be selected for deletion here,
    # tombstoning the very ids the rolled-back re-append is about to
    # reuse — permanently hiding the new versions
    _rollback_inflight_append(spark, index_dir, Manifest(index_dir))
    docs = spark.read.parquet(os.path.join(index_dir, "docs"))
    missing = [c for c in key_cols if c not in docs.columns
               or c not in new_corpus.columns]
    if missing:
        raise ValueError(
            f"key columns absent from docs table or new corpus: {missing}")
    n_dups = (new_corpus.groupBy(*key_cols).count()
              .filter(F.col("count") > 1).count())
    if n_dups:
        raise ValueError(
            f"new_corpus has {n_dups} duplicate {key_cols} keys — ES "
            f"overwrite-by-_id semantics need one version per key; dedupe "
            f"upstream (keep the intended version) before upserting")
    keys = new_corpus.select(*key_cols).distinct()
    ids = (docs.join(keys, on=list(key_cols), how="left_semi")
           .select("doc_id"))
    replaced = delete_docs(spark, index_dir, ids_df=ids)["deleted"]
    out = append_docs(spark, index_dir, new_corpus)
    return {"replaced": replaced, **out}


#: data dirs swapped atomically-per-dir during a purge
_PURGE_SWAP = ("docs", "docs_meta", "segments", "stats")


def _recover_purge(spark: SparkSession, index_dir: str) -> int | None:
    """Crash recovery for ``purge_deleted``. Two regimes, decided by the
    swap-commit marker (written only once ``.purge_tmp`` holds the COMPLETE
    new generation, immediately before the first rename):

    - marker present → roll FORWARD: finish moving every remaining dir out
      of ``.purge_tmp`` so docs/segments/stats all come from the same (new)
      generation — never restore individual dirs from retired, which would
      mix generations (deleted docs reappearing in segments while their
      stored fields are gone). Tombstones are NOT cleared here: deletes
      issued after the crash must survive; the caller's live-tombstone
      filter decides what is stale.
    - no marker → the swap never started: roll BACK (restore any dir an
      old-version crash left in retired, drop tmp) and retry from scratch.

    Returns the recovered purge's tombstone count (for lineage) or None."""
    retired = os.path.join(index_dir, ".purge_retired")
    tmp = os.path.join(index_dir, ".purge_tmp")
    marker = os.path.join(index_dir, ".purge_swap_commit")
    if os.path.exists(marker):
        with open(marker) as f:
            info = json.load(f)
        for name in _PURGE_SWAP:
            live = os.path.join(index_dir, name)
            new = os.path.join(tmp, name)
            old = os.path.join(retired, name)
            if os.path.exists(new):
                if os.path.exists(live):
                    os.makedirs(retired, exist_ok=True)
                    if os.path.exists(old):
                        shutil.rmtree(old)
                    os.rename(live, old)
                os.rename(new, live)
        for d in (retired, tmp):
            if os.path.exists(d):
                shutil.rmtree(d)
        man = Manifest(index_dir)
        n_units = sum(1 for e in man.entries()
                      if e["unit"].startswith("purge_"))
        man.commit(f"purge_{n_units}", purged=int(info.get("n_tomb", 0)),
                   n_docs=read_global_stats(index_dir)["n_docs"],
                   recovered=True)
        os.remove(marker)
        return int(info.get("n_tomb", 0))
    for name in _PURGE_SWAP:
        live = os.path.join(index_dir, name)
        old = os.path.join(retired, name)
        if not os.path.exists(live) and os.path.exists(old):
            os.rename(old, live)
    for d in (retired, tmp):
        if os.path.exists(d):
            shutil.rmtree(d)
    return None


def purge_deleted(spark: SparkSession, index_dir: str) -> dict:
    """Physically remove tombstoned docs: rewrite segments/docs/docs_meta/
    stats without them (one decode→filter→re-encode pass over the index —
    no re-tokenization) and clear the tombstone set. After purge, df/avgdl/
    n_docs reflect the live corpus, so scores change exactly as an ES
    segment merge changes them.

    Crash-safe via a roll-forward swap: the new generation is fully built
    in ``.purge_tmp`` first, a swap-commit marker is written, then each dir
    is swapped; any crash after the marker is rolled FORWARD from tmp on
    the next call (all four dirs always end up from the same generation —
    see ``_recover_purge``), any crash before it is rolled back and
    retried. Tombstones added between a crash and its recovery are
    preserved and purged by the retry."""
    retired = os.path.join(index_dir, ".purge_retired")
    recover_compact_intent(index_dir)   # resolve a crashed compaction
    # swap first: purge trusts global.json's batch list below
    recovered = _recover_purge(spark, index_dir)

    tomb = read_tombstones(spark, index_dir)
    stats = read_global_stats(index_dir)
    extra = {} if recovered is None else {"recovered_purged": recovered}
    if tomb is None:
        return {"purged": 0, "n_docs": stats["n_docs"], **extra}
    # staleness convergence: only ids that still exist in docs count. A
    # rolled-forward recovery (or a crash after the tombstone cleanup of a
    # completed purge) leaves already-purged ids in the set — detected
    # here as zero live tombstones, resolved by clearing the set. Safe
    # ONLY because _recover_purge guarantees docs/segments/stats are one
    # generation by the time this runs.
    docs_ids = spark.read.parquet(
        os.path.join(index_dir, "docs")).select("doc_id")
    n_tomb = tomb.join(docs_ids, "doc_id", "left_semi").count()
    if n_tomb == 0:
        shutil.rmtree(os.path.join(index_dir, "tombstones"))
        return {"purged": 0, "n_docs": stats["n_docs"], **extra}
    cfg = BuildConfig(num_shards=int(stats["num_shards"]))

    tmp = os.path.join(index_dir, ".purge_tmp")
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    reindex(spark, index_dir, tmp, cfg)  # reindex drops tombstoned docs

    # swap-commit point: tmp is complete; from here recovery rolls FORWARD
    marker = os.path.join(index_dir, ".purge_swap_commit")
    mtmp = marker + ".tmp"
    with open(mtmp, "w") as f:
        json.dump({"n_tomb": n_tomb}, f)
    os.replace(mtmp, marker)
    os.makedirs(retired, exist_ok=True)
    for name in _PURGE_SWAP:
        os.rename(os.path.join(index_dir, name),
                  os.path.join(retired, name))
        os.rename(os.path.join(tmp, name), os.path.join(index_dir, name))
    shutil.rmtree(retired)
    shutil.rmtree(tmp)  # leftover tmp manifest
    shutil.rmtree(os.path.join(index_dir, "tombstones"))
    os.remove(marker)

    new_stats = read_global_stats(index_dir)
    man = Manifest(index_dir)
    n_units = sum(1 for e in man.entries()
                  if e["unit"].startswith("purge_"))
    man.commit(f"purge_{n_units}", purged=n_tomb,
               n_docs=new_stats["n_docs"])
    return {"purged": n_tomb, "n_docs": new_stats["n_docs"], **extra}


def reindex(spark: SparkSession, index_dir: str, out_dir: str,
            config: BuildConfig | None = None) -> dict:
    """Clone/migrate an index to a new layout from its tf checkpoints —
    no re-tokenization (the docs table is copied, segments rebuilt)."""
    from deluge_spark.index.build import tf_from_segments

    recover_compact_intent(index_dir)
    cfg = config or BuildConfig()
    os.makedirs(out_dir, exist_ok=True)
    t0 = time.time()

    # decode the source index's segments back to long form (no persisted tf
    # checkpoints in the partials build; no re-tokenization either way)
    tf = (tf_from_segments(spark, index_dir)
          .withColumn("shard", F.pmod(F.col("doc_id"),
                                      F.lit(cfg.num_shards)).cast("int")))
    # rebuild = the natural purge point (Lucene merge semantics): the new
    # index is born without the source's tombstoned docs, and stats reflect
    # the live corpus
    tomb = read_tombstones(spark, index_dir)
    if tomb is not None:
        tf = tf.join(tomb, "doc_id", "left_anti")

    import threading

    from pyspark.sql import Observation

    man = Manifest(out_dir)
    # the docs_meta write and the docs copy are independent of the
    # segments rebuild — run both on a side thread (guide §2.6: overlap
    # independent jobs; the manifest units still commit only after their
    # own writes finish, and the final stats/seal step joins the thread
    # first, so crash-visibility of each unit is unchanged)
    side_exc: list[BaseException] = []
    side_out: dict = {}

    def _side_writes() -> None:
        try:
            dl_df = tf.groupBy("doc_id").agg(
                F.max("dl").cast("long").alias("dl"))
            # n_docs/avgdl observed ON the write job — no re-read pass
            obs = Observation()
            (dl_df.observe(obs, F.count(F.lit(1)).alias("n"),
                           F.avg("dl").alias("avgdl"))
             .write.mode("overwrite")
             .parquet(os.path.join(out_dir, "docs_meta")))
            row = obs.get
            side_out["n_docs"] = int(row["n"] or 0)
            side_out["avgdl"] = float(row["avgdl"] or 0.0)
            # copy docs (lineage preserved), recompute shard col
            src_docs = spark.read.parquet(os.path.join(index_dir, "docs"))
            if tomb is not None:
                src_docs = src_docs.join(tomb, "doc_id", "left_anti")
            (src_docs.drop("shard")
             .withColumn("shard", F.pmod(F.col("doc_id"),
                                         F.lit(cfg.num_shards)).cast("int"))
             .write.mode("overwrite")
             .parquet(os.path.join(out_dir, "docs")))
            man.commit("docs")
        except BaseException as ex:  # surfaced after join
            side_exc.append(ex)

    th = threading.Thread(target=_side_writes, name="deluge-reindex-side",
                          daemon=True)
    th.start()
    seg = _build_segments(tf, cfg.term_buckets)
    seg.write.mode("overwrite").partitionBy("shard").parquet(
        os.path.join(out_dir, "segments", "batch=0"))
    man.commit("segments_b0", shards=list(range(cfg.num_shards)))
    th.join()
    if side_exc:
        raise side_exc[0]
    n_docs, avgdl = side_out["n_docs"], side_out["avgdl"]

    seg_all = read_segments(spark, out_dir)
    terms = seg_all.groupBy("term").agg(F.sum("df_local").alias("df"),
                                        F.sum("cf_local").alias("cf"))
    stats_dir = os.path.join(out_dir, "stats")
    # total_postings observed on the terms write (same one-job pattern as
    # the batch build's stats stage)
    obs2 = Observation()
    (terms.observe(obs2, F.sum("df").alias("tp"))
     .write.mode("overwrite").parquet(os.path.join(stats_dir, "terms")))
    total_postings = int(obs2.get["tp"] or 0)
    glob = {"n_docs": n_docs, "avgdl": avgdl,
            "total_postings": total_postings,
            "num_shards": cfg.num_shards,
            "tokenizer_mode": read_global_stats(index_dir).get(
                "tokenizer_mode", cfg.tokenizer_mode),
            "segment_batches": ["batch=0"],
            "migrated_from": index_dir}
    write_global_stats(out_dir, glob)
    man.commit("stats", **{k: v for k, v in glob.items()
                           if k != "migrated_from"})
    man.seal(wall_s=time.time() - t0, migrated_from=index_dir)
    return {"n_docs": n_docs, "num_shards": cfg.num_shards,
            "wall_s": time.time() - t0}
