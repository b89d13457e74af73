"""BM25 scoring — the pure-DataFrame path (north-star B4).

The reference never scores: BM25 lives inside Elasticsearch. This module is
our native implementation of the Lucene/ES default similarity:

    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
    tfnorm(t,d) = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    score(q,d)  = Σ_{t∈q}  idf(t) * tfnorm(t,d)          k1=1.2, b=0.75

This DataFrame composition (query-term semi-join → broadcast stats join →
groupBy doc) is the *correctness* path: it validates the fast block-max WAND
executor (index/wand.py) by three-way agreement, and it is directly
expressible in the DuckDB oracle. All math in float64.

Scale notes: the query-term filter ``term IN (...)`` is a pushed-down
predicate on the tf/postings table (parquet min/max + dictionary pruning);
``df``/``dl`` sides are broadcast (query terms ≤ dozens ⇒ df rows ≤ dozens);
the groupBy(doc_id) shuffles only the few matching postings, never the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75


def bm25_score_query(
    tf: DataFrame,
    dl: DataFrame,
    n_docs: int,
    avgdl: float,
    query_terms: list[str],
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Score every doc matching ≥1 query term → (doc_id, score).

    ``tf``: (doc_id, term, tf); ``dl``: (doc_id, dl). Returns unsorted;
    callers add ``ORDER BY score DESC, doc_id LIMIT k`` (TakeOrdered).
    """
    terms = list(dict.fromkeys(query_terms))
    if not terms:
        return tf.sparkSession.createDataFrame([], "doc_id long, score double")

    # project first: tf checkpoints also carry a per-posting dl column,
    # which would collide with the dl join below
    matches = (tf.select("doc_id", "term", "tf")
               .filter(F.col("term").isin(terms)))
    dfreq = matches.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = dfreq.select(
        "term",
        F.log(
            F.lit(1.0)
            + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
        ).alias("idf"),
    )
    scored = (
        matches.join(F.broadcast(idf), "term")
        .join(dl, "doc_id")
        .withColumn(
            "part_score",
            F.col("idf")
            * (F.col("tf") * (k1 + 1.0))
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("dl") / F.lit(float(avgdl)))
            ),
        )
    )
    return scored.groupBy("doc_id").agg(F.sum("part_score").alias("score"))


def bm25_top_k(
    tf: DataFrame,
    dl: DataFrame,
    n_docs: int,
    avgdl: float,
    query_terms: list[str],
    k: int = 10,
    round_dp: int | None = None,
) -> DataFrame:
    """Top-k by (score desc, doc_id asc) — deterministic tie-break.

    ``round_dp`` rounds the score *before* ordering (both here and in the
    oracle SQL) so float summation-order noise cannot flip ranks at the
    k-boundary between engines.
    """
    scored = bm25_score_query(tf, dl, n_docs, avgdl, query_terms)
    score_col = (
        F.round(F.col("score"), round_dp) if round_dp is not None else F.col("score")
    )
    return (
        scored.select("doc_id", score_col.alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )
