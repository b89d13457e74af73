"""Dense, deterministic int64 doc_id assignment — scalable two-pass.

The reference keys documents by a user-extracted string ``_id``
(/root/reference/document.go:8); posting lists need dense integers. The naive
``row_number() OVER (ORDER BY repo, path, commit)`` collapses to a single
partition at 10^12 rows, so we use the classic two-pass scheme:

  1. range-repartition + sort within partitions on the natural key
     (one range-exchange; Spark samples split points),
  2. count rows per physical partition (cheap scan of the sorted data),
  3. prefix-sum the counts on the driver (P integers),
  4. doc_id = partition_offset + local ordinal (narrow mapInPandas).

The result equals the global row_number over the total order
``(repo, path, commit)`` — stable across runs and cluster layouts — while
the only wide operation is the range exchange itself.
"""

from __future__ import annotations

import itertools
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NATURAL_KEY = ("repo", "path", "commit")


def assign_doc_ids(
    df: DataFrame,
    key_cols: tuple[str, ...] = NATURAL_KEY,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add a dense ``doc_id`` = rank in the total order over ``key_cols``.

    If the input already has a ``doc_id`` column (e.g. the driver's
    documents fixture) it is kept untouched.
    """
    if "doc_id" in df.columns:
        return df
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism

    keys = [F.col(c) for c in key_cols]
    sorted_df = df.repartitionByRange(num_partitions, *keys).sortWithinPartitions(*keys)
    sorted_df = sorted_df.withColumn("_pid", F.spark_partition_id())
    sorted_df.cache()

    counts = {
        r["_pid"]: r["cnt"]
        for r in sorted_df.groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    boff = spark.sparkContext.broadcast(offsets)

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in sorted_df.schema.fields
        if f.name != "_pid"
    ) + ", doc_id long"

    def _assign(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seen = 0
        base = None
        for pdf in it:
            if pdf.empty:
                continue
            if base is None:
                base = boff.value[int(pdf["_pid"].iloc[0])]
            n = len(pdf)
            out = pdf.drop(columns=["_pid"])
            out["doc_id"] = range(base + seen, base + seen + n)
            seen += n
            yield out

    return sorted_df.mapInPandas(_assign, schema=out_schema)
