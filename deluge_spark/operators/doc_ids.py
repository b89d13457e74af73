"""Dense, deterministic int64 doc_id assignment — scalable two-pass, all JVM.

The reference keys documents by a user-extracted string ``_id``
(/root/reference/document.go:8); posting lists need dense integers. The naive
``row_number() OVER (ORDER BY repo, path, commit)`` collapses to a single
partition at 10^12 rows, so we use the classic two-pass scheme:

  1. range-repartition on the natural key (one range exchange; Spark samples
     split points),
  2. count rows per physical partition (cheap),
  3. prefix-sum the counts on the driver (P integers),
  4. doc_id = partition_offset + within-partition ordinal, where the
     ordinal comes from ``monotonically_increasing_id()`` over the
     range-sorted cached partitions (low 33 bits = consecutive record
     number within a partition). No window function — a window keyed by
     partition id would re-shuffle the full corpus (content included) in
     every downstream pass; this formulation is entirely narrow. And no
     Python pass: content never crosses the JVM↔Arrow boundary here (an
     earlier mapInPandas variant shipped the corpus through Python twice
     and dominated build wall-time).

The result equals the global row_number over the total order
``(repo, path, commit)`` — stable across runs and cluster layouts.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NATURAL_KEY = ("repo", "path", "commit")


def assign_doc_ids(
    df: DataFrame,
    key_cols: tuple[str, ...] = NATURAL_KEY,
    num_partitions: int | None = None,
    return_count: bool = False,
):
    """Add a dense ``doc_id`` = rank in the total order over ``key_cols``.

    If the input already has a ``doc_id`` column (e.g. the driver's
    documents fixture) the ids are kept — but the index build downstream
    requires (a) DENSE ids 0..N-1 (tokenize groups are ``doc_id // step``
    buckets: sparse/offset ids would silently fall outside every group) and
    (b) doc-range-disjoint partitions (the segment merge concatenates
    partials by first_doc; interleaved ranges would break block
    monotonicity). So pre-assigned ids are validated for density and the
    frame is range-repartitioned on doc_id. Otherwise ids are assigned and
    the returned DataFrame is cached (the partition layout must stay pinned
    to the offsets computed from it).

    Both paths cache: downstream the build runs several actions over the
    frame (docs write, G tokenize groups), and without the cache each one
    re-runs the full range exchange of the corpus.

    ``return_count=True`` returns ``(df, n_rows)`` — both paths already
    know the exact count from their one validation/offset job, so callers
    (build_index) skip a redundant count action over the corpus."""
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    if "doc_id" in df.columns:
        row = df.agg(F.count(F.lit(1)).alias("n"),
                     F.countDistinct("doc_id").alias("nd"),
                     F.min("doc_id").alias("lo"),
                     F.max("doc_id").alias("hi")).collect()[0]
        n = int(row["n"] or 0)
        if n and not (int(row["nd"]) == n and int(row["lo"]) == 0
                      and int(row["hi"]) == n - 1):
            raise ValueError(
                f"pre-assigned doc_id must be dense 0..N-1: got n={n}, "
                f"distinct={row['nd']}, min={row['lo']}, max={row['hi']} — "
                "drop the column to let assign_doc_ids re-key")
        out = (df.repartitionByRange(num_partitions, F.col("doc_id"))
               .sortWithinPartitions("doc_id"))
        out.cache()
        # the handle a caller must .unpersist() when done — derived frames
        # (withColumn etc.) have different plans, so unpersist(cascade=false)
        # on them is a silent no-op and the corpus-sized cache stays pinned
        out._dsg_cached_handle = out
        return (out, n) if return_count else out

    keys = [F.col(c) for c in key_cols]
    ranged = (df.repartitionByRange(num_partitions, *keys)
              .sortWithinPartitions(*keys)
              .withColumn("_pid", F.spark_partition_id()))
    ranged.cache()

    counts = {
        r["_pid"]: r["cnt"]
        for r in ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    off_map = F.create_map(*[
        F.lit(x) for x in chain.from_iterable(offsets.items())
    ]) if offsets else F.create_map()
    # monotonically_increasing_id = (pid << 33) + consecutive ordinal;
    # recover the ordinal and add the global prefix-sum offset — narrow.
    ordinal = (F.monotonically_increasing_id()
               - F.shiftleft(F.col("_pid").cast("long"), 33))
    out = (ranged
           .withColumn("doc_id",
                       (F.element_at(off_map, F.col("_pid")) + ordinal)
                       .cast("long"))
           .drop("_pid"))
    # the cache lives on `ranged` (it must: the offsets above were computed
    # from ranged's materialized partition layout) — expose it so callers
    # can actually release it; unpersisting `out` would be a no-op
    out._dsg_cached_handle = ranged
    return (out, acc) if return_count else out


def unpersist_assigned(df) -> None:
    """Release the cache pinned by ``assign_doc_ids``. Accepts the frame as
    returned (before any reassignment); falls back to ``df.unpersist()`` if
    the handle attribute is absent."""
    getattr(df, "_dsg_cached_handle", df).unpersist()
