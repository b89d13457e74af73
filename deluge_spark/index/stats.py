"""Corpus-level statistics — plain DataFrame aggregates (north-star B3).

The reference exposes only an index summary delegated to ES
(/root/reference/elastic/v7/client.go:204-242 — and its ``NumDocs()``
actually returns the byte size, elastic/v7/summary.go:15-17, a latent bug we
do not reproduce). Here df/N/avgdl are first-class DataFrame aggregates:
map-side partial aggregation, one shuffle each, no UDFs.

Definitions (mirrored exactly in the DuckDB oracle SQL):
- ``dl``: per-doc token count = sum(tf); docs with zero tokens have no row.
- ``N``: count of docs with ≥1 token.  ``avgdl``: mean dl over those docs.
- ``df``: number of docs containing the term.  ``cf``: total occurrences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def doc_lengths(tf: DataFrame) -> DataFrame:
    """(doc_id, term, tf) → (doc_id, dl)."""
    return tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))


def term_doc_freq(tf: DataFrame) -> DataFrame:
    """(doc_id, term, tf) → (term, df, cf)."""
    return tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("tf").cast("long").alias("cf"),
    )


def corpus_stats(dl: DataFrame) -> tuple[int, float]:
    """(doc_id, dl) → (N, avgdl) as driver-side scalars (tiny result)."""
    row = dl.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    n = row["n"] or 0
    return int(n), float(row["avgdl"]) if n else 0.0
