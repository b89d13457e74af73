"""Custom stateful streaming operator: event sessionization.

Demonstrates the engine's stateful-streaming surface
(``applyInPandasWithState``): groups a keyed event stream into sessions
closed by an inactivity gap, with processing-time timeouts flushing idle
state. Batch twin (``sessionize_batch``) uses the classic lag/cumsum window
formulation so results are oracle-checkable in SQL.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = ("user_id long, session_start timestamp, "
                  "session_end timestamp, n_events long, sum_value double")
STATE_SCHEMA = "start long, last long, n long, sv double"


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch sessionization: a session breaks where the gap from the previous
    event of the same user exceeds ``gap_minutes`` (lag + cumulative sum)."""
    # gap compare in MICROSECONDS (Spark timestamp precision): whole-second
    # unix_timestamp truncation could flip a break decision right at the
    # boundary vs the fractional-epoch oracle and the ns streaming path
    gap_us = gap_minutes * 60 * 1_000_000
    w = Window.partitionBy("user_id").orderBy("ts")
    tagged = (events
              .withColumn("_prev", F.lag("ts").over(w))
              .withColumn("_new", F.when(
                  F.col("_prev").isNull()
                  | ((F.unix_micros(F.col("ts").cast("timestamp"))
                      - F.unix_micros(F.col("_prev").cast("timestamp")))
                     > gap_us), 1).otherwise(0))
              .withColumn("_sid", F.sum("_new").over(
                  w.rowsBetween(Window.unboundedPreceding, 0))))
    return (tagged.groupBy("user_id", "_sid")
            .agg(F.min("ts").alias("session_start"),
                 F.max("ts").alias("session_end"),
                 F.count(F.lit(1)).cast("long").alias("n_events"),
                 F.round(F.sum("value"), 4).alias("sum_value"))
            .drop("_sid"))


def sessionize_stream(spark, source_dir: str, schema: str,
                      gap_minutes: int = 30,
                      query_name: str = "sessions"):
    """Streaming sessionization via applyInPandasWithState.

    State per user = (session start, last event, count, value sum); a
    micro-batch extends or closes sessions; ProcessingTimeTimeout flushes
    sessions idle across batches. Emits closed sessions (append mode)."""
    gap_s = gap_minutes * 60

    def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (user_id,) = key
        out = []
        if state.hasTimedOut:
            if state.exists:
                s, last, n, sv = state.get
                out.append((user_id, s, last, n, sv))
                state.remove()
        else:
            rows = pd.concat(list(pdfs)).sort_values("ts")
            # state carries epoch NANOSECONDS — second truncation would
            # corrupt session boundaries vs the batch/oracle formulation
            ts = rows["ts"].astype("int64").to_numpy()
            gap_ns = gap_s * 1_000_000_000
            vals = rows["value"].to_numpy()
            if state.exists:
                s, last, n, sv = state.get
            else:
                s, last, n, sv = int(ts[0]), int(ts[0]), 0, 0.0
            for t, v in zip(ts, vals):
                if t - last > gap_ns and n > 0:
                    out.append((user_id, s, last, n, sv))
                    s, n, sv = int(t), 0, 0.0
                last = int(t)
                n += 1
                sv += float(v)
            state.update((s, last, n, sv))
            state.setTimeoutDuration(gap_s * 1000)
        if out:
            yield pd.DataFrame(
                [{"user_id": u,
                  "session_start": pd.Timestamp(s0, unit="ns"),
                  "session_end": pd.Timestamp(l0, unit="ns"),
                  "n_events": n0, "sum_value": round(sv0, 4)}
                 for u, s0, l0, n0, sv0 in out])
        else:
            yield pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                                "session_start": pd.Series([], dtype="datetime64[ns]"),
                                "session_end": pd.Series([], dtype="datetime64[ns]"),
                                "n_events": pd.Series([], dtype="int64"),
                                "sum_value": pd.Series([], dtype="float64")})

    src = spark.readStream.schema(schema).parquet(source_dir)
    sessions = (src.groupBy("user_id").applyInPandasWithState(
        _update, SESSION_SCHEMA, STATE_SCHEMA, "append",
        GroupStateTimeout.ProcessingTimeTimeout))
    return (sessions.writeStream.outputMode("append").format("memory")
            .queryName(query_name).trigger(availableNow=True).start())
