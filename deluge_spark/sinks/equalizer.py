"""Sink admission control — the backpressure equalizer, re-expressed.

The reference throttles its ES bulk POSTs with a global goroutine gate:
``size`` concurrent requests max, plus an adaptive pause matching the
producer's build time to the sink's rolling-average ingest time
(/root/reference/equalizer/equalizer.go:32-119). Our default sinks
(parquet/files) need none of this — the filesystem IS the backpressure —
but writing to a rate-limited live service (an HTTP API, a search cluster,
a feature store) from 1000 executors without admission control melts the
service. This module is that missing utility:

- ``Equalizer``: per-task bounded-inflight + adaptive-throttle gate
  (semaphore ≙ the ``ready`` channel; rolling mean of send durations ≙
  ``rates``/``getAvg``; ``throttle`` sleeps the positive difference between
  sink pace and producer pace — same control law as the reference).
- ``equalized_foreach_partitions``: drives a DataFrame through per-partition
  byte-budgeted bulks (≙ the reference's 20 MB bulk assembly,
  ingestor.go:188-210) sent through an Equalizer.

Cluster math (the part Spark changes): the gate is PER TASK — there is no
cross-executor shared semaphore. Size it as
``max_inflight = ceil(global_limit / max_concurrent_tasks)`` and cap
concurrent tasks with ``df.coalesce(n)`` / ``spark.dynamicAllocation`` so
global inflight ≤ limit. That keeps admission control fully distributed —
no coordinator bottleneck at 1000 executors.
"""

from __future__ import annotations

import threading
import time
from collections import deque
from collections.abc import Callable, Iterable, Iterator

from pyspark.sql import DataFrame

DEFAULT_BULK_BYTES = 20 * 1024 * 1024  # the reference's bulk budget


class Equalizer:
    """Bounded-inflight, rate-matched request gate (one per task)."""

    def __init__(self, max_inflight: int = 4, max_rates: int = 32):
        if max_inflight < 1:
            raise ValueError("max_inflight must be >= 1")
        self._sem = threading.Semaphore(max_inflight)
        self._rates: deque[float] = deque(maxlen=max_rates)
        self._lock = threading.Lock()
        self._errors: list[Exception] = []
        self._threads: list[threading.Thread] = []
        self.max_inflight = max_inflight

    def _avg_rate(self) -> float:
        with self._lock:
            return (sum(self._rates) / len(self._rates)) if self._rates else 0.0

    def _throttle(self, build_took_s: float) -> None:
        # producer faster than the sink's recent pace → sleep the difference
        delta = self._avg_rate() - build_took_s
        if delta > 0:
            time.sleep(delta)

    def send(self, request: Callable[[], None], build_took_s: float = 0.0,
             callback: Callable[[Exception | None], None] | None = None) -> None:
        """Dispatch ``request`` asynchronously: blocks while ``max_inflight``
        sends are pending, then throttles to the sink's measured pace."""
        self._sem.acquire()
        with self._lock:
            if self._errors:
                err = self._errors[0]
                self._sem.release()
                raise err

        def _run() -> None:
            try:
                self._throttle(build_took_s)
                t0 = time.monotonic()
                try:
                    request()
                    err: Exception | None = None
                except Exception as e:  # noqa: BLE001 — forwarded to caller
                    err = e
                    with self._lock:
                        self._errors.append(e)
                else:
                    with self._lock:
                        self._rates.append(time.monotonic() - t0)
                if callback is not None:
                    callback(err)
            finally:
                self._sem.release()

        t = threading.Thread(target=_run, daemon=True)
        # bounded bookkeeping: drop finished threads before tracking a new
        # one — a long partition must hold at most max_inflight entries,
        # not one Thread object per bulk ever sent
        self._threads = [x for x in self._threads if x.is_alive()]
        self._threads.append(t)
        t.start()

    def close(self) -> list[Exception]:
        """Wait for all pending sends; return any errors."""
        for t in self._threads:
            t.join()
        self._threads.clear()
        with self._lock:
            errs, self._errors = self._errors, []
            return errs


def assemble_bulks(rows: Iterable, size_fn: Callable[[object], int],
                   max_bytes: int = DEFAULT_BULK_BYTES) -> Iterator[list]:
    """Greedy byte-budgeted bulk assembly (≙ ingestor.go:188-210: cut a bulk
    when adding the next doc would exceed the budget; oversized single rows
    still ship alone rather than stall)."""
    bulk: list = []
    bulk_bytes = 0
    for row in rows:
        b = size_fn(row)
        if bulk and bulk_bytes + b > max_bytes:
            yield bulk
            bulk, bulk_bytes = [], 0
        bulk.append(row)
        bulk_bytes += b
    if bulk:
        yield bulk


def equalized_foreach_partitions(
    df: DataFrame,
    send_bulk: Callable[[list], None],
    size_fn: Callable[[object], int] | None = None,
    max_bytes: int = DEFAULT_BULK_BYTES,
    max_inflight: int = 4,
) -> None:
    """Write ``df`` to an external rate-limited sink: per partition, rows are
    assembled into ≤``max_bytes`` bulks and pushed through an Equalizer with
    ``max_inflight`` concurrent ``send_bulk`` calls and adaptive pacing.

    ``send_bulk`` runs on executors — it must be picklable and must do its
    own connection setup (per partition, not per row).
    """
    if size_fn is None:
        size_fn = lambda row: max(1, len(str(row)))  # noqa: E731

    def _partition(rows: Iterator) -> None:
        eq = Equalizer(max_inflight=max_inflight)
        t_build = time.monotonic()
        for bulk in assemble_bulks(rows, size_fn, max_bytes):
            took = time.monotonic() - t_build
            eq.send((lambda b: lambda: send_bulk(b))(bulk), took)
            t_build = time.monotonic()
        errs = eq.close()
        if errs:
            raise errs[0]

    df.foreachPartition(_partition)
