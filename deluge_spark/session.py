"""SparkSession factory with engine defaults.

Local-mode settings follow the sandbox (single JVM, N threads); on a real
cluster the same builder is used minus the master/memory overrides — the
shuffle-partition count is the one knob that must scale with the data
(north-rule: explicit shuffle sizing).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "deluge_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str = "48g",
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    ``cores`` defaults to $SPARK_GRAFT_CPUS or all local cores. Shuffle
    partitions default to 2× cores locally; at cluster scale callers size
    them to data volume (see index.build.BuildConfig.num_shards).
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 8
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * cores, 8)
    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # joins (guide §3.1/§9): let the planner pick shuffled-hash over
        # sort-merge when the per-partition build side fits, and let AQE
        # rewrite SMJ→SHJ at runtime from observed sizes — same results,
        # no sort. 64 MB per-partition build state is safe in both this
        # sandbox and a production executor.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
                "64m")
        # scan parallelism floor (guide §6): splittable inputs must feed
        # every core even when small; on a cluster whose inputs already
        # split wider this is a no-op. Unsplittable single-row-group
        # files are handled by operators/parallel.spread_input instead.
        .config("spark.sql.files.minPartitionNum", str(cores))
        .config("spark.driver.memory", driver_memory)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
