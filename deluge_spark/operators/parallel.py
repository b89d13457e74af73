"""Scale-adaptive input parallelization.

The sandbox's test corpora are single-file, single-row-group parquet —
unsplittable inputs, so every narrow stage downstream of the scan runs as
ONE task no matter how many cores the cluster has (guide §2.5 "input
skew: one huge unsplittable file"). ``spread_input`` repartitions
immediately after the read ONLY when the scan's parallelism is below the
cluster's (a cheap exchange of the raw rows); on a real deployment whose
inputs already split into >= defaultParallelism partitions it is a no-op,
so no corpus-sized shuffle is ever added at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_input(df: DataFrame, min_factor: int = 1) -> DataFrame:
    """Round-robin repartition ``df`` up to cluster parallelism when its
    current partitioning cannot feed every core; identity otherwise.

    ``min_factor`` asks for that many waves of tasks per core (1 is right
    for CPU-bound Arrow stages). Results are unaffected: every caller is
    an unordered set/aggregation pipeline.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * min_factor
    try:
        cur = df.rdd.getNumPartitions()
    except Exception:
        return df
    if cur >= target:
        return df
    return df.repartition(target)
