"""Error-budget threshold gate (SURVEY §2A row 12).

The reference accumulates per-row errors and aborts only when the error
ratio crosses a threshold (default 1%) after ≥10 rows
(/root/reference/threshold/threshold.go:28-43; defaults ingestor.go:29).
NOTE: the reference's ratio formula is buggy — it computes
``1 − success/errors``; the *intended* semantics per its README and option
docs is ``errors / (errors + success)``, which is what we implement.

Spark realization: error and success counts come from accumulators updated
inside the parse/tokenize stage (or from a corrupt-record column count);
the gate is checked after each action/micro-batch — job-level, not
mid-task, which is the idiomatic Spark failure boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_THRESHOLD = 0.01   # reference defaultThreshold, ingestor.go:29
MINIMUM_TO_CHECK = 10      # reference minimumToCheck, threshold.go:10-12


class ThresholdExceeded(RuntimeError):
    def __init__(self, errors: int, total: int, threshold: float,
                 samples: list[str] | None = None):
        self.errors, self.total, self.threshold = errors, total, threshold
        self.samples = samples or []
        super().__init__(
            f"error ratio {errors}/{total} = {errors / total:.4f} "
            f"exceeds threshold {threshold}"
            + (f"; samples: {self.samples[:3]}" if self.samples else ""))


class ErrorThresholdGate:
    """Accumulator-backed error budget for custom (pandas-UDF) stages."""

    def __init__(self, spark: SparkSession,
                 threshold: float = DEFAULT_THRESHOLD,
                 minimum_to_check: int = MINIMUM_TO_CHECK):
        self.threshold = threshold
        self.minimum = minimum_to_check
        self.errors = spark.sparkContext.accumulator(0)
        self.successes = spark.sparkContext.accumulator(0)

    def check(self) -> None:
        """Raise ThresholdExceeded if the budget is blown (call after an
        action; accumulator values are only final then)."""
        e, s = self.errors.value, self.successes.value
        total = e + s
        if total < self.minimum:
            return
        if total and (e / total) > self.threshold:
            raise ThresholdExceeded(e, total, self.threshold)

    def ratio(self) -> float:
        e, s = self.errors.value, self.successes.value
        return e / (e + s) if (e + s) else 0.0


def check_corrupt_ratio(df: DataFrame, error_cond,
                        threshold: float = DEFAULT_THRESHOLD,
                        minimum_to_check: int = MINIMUM_TO_CHECK,
                        sample_errors: int = 5,
                        sample_col: str | None = None) -> dict:
    """Declarative gate: count rows matching ``error_cond`` (a Column) in one
    aggregate pass; raise ThresholdExceeded above budget. Returns
    {errors, total, ratio} on success. ``sample_col`` collects N example bad
    values (the reference's strided error sampling, threshold.go:56-67)."""
    row = df.agg(
        F.sum(F.when(error_cond, 1).otherwise(0)).alias("errors"),
        F.count(F.lit(1)).alias("total"),
    ).collect()[0]
    errors, total = int(row["errors"] or 0), int(row["total"] or 0)
    if total >= minimum_to_check and total and errors / total > threshold:
        samples = []
        if sample_col is not None:
            samples = [str(r[0]) for r in
                       df.filter(error_cond).select(sample_col)
                       .limit(sample_errors).collect()]
        raise ThresholdExceeded(errors, total, threshold, samples)
    return {"errors": errors, "total": total,
            "ratio": errors / total if total else 0.0}
