"""Similarity search over embedding columns (array<float>).

Two paths, one semantics (cosine top-k):

- ``cosine_top_k``: brute-force, pure JVM expressions (zip_with product +
  aggregate fold — sequential fold gives deterministic summation order, so
  results are oracle-reproducible bit-for-bit in float64). The correctness
  baseline; O(n·d) per query — fine for one query over 100 TB when the scan
  is columnar and pruned, the scale path for batch all-pairs is LSH below.
- ``rp_lsh_top_k``: random-hyperplane LSH (sign sketch) — bucket candidates
  on any matching band of hyperplane signs, exact cosine re-rank inside the
  candidate set. Approximate; recall grows with bands.

Vectors are cast to double before any arithmetic (float32 storage, float64
math — matches the DuckDB oracle exactly).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _as_double(col):
    return F.col(col).cast("array<double>")


def cosine_top_k(df: DataFrame, query_vec: list[float], k: int = 10,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 exclude_id: int | None = None, round_dp: int = 6) -> DataFrame:
    """Brute-force cosine top-k → (vec_id, sim), deterministic order."""
    q = [float(x) for x in query_vec]
    qnorm = float(np.sqrt(np.dot(q, q)))
    qarr = F.array(*[F.lit(x) for x in q])
    v = _as_double(vec_col)
    sim = _dot(v, qarr) / (F.sqrt(_dot(v, v)) * F.lit(qnorm))
    out = df.select(F.col(id_col).alias("vec_id"),
                    F.round(sim, round_dp).alias("sim"))
    if exclude_id is not None:
        out = out.filter(F.col("vec_id") != exclude_id)
    return out.orderBy(F.col("sim").desc(), F.col("vec_id").asc()).limit(k)


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def rp_lsh_top_k(df: DataFrame, query_vec: list[float], k: int = 10,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 n_planes: int = 16, bands: int = 4, seed: int = 42,
                 exclude_id: int | None = None, round_dp: int = 6) -> DataFrame:
    """LSH-bucketed approximate cosine top-k.

    Signs against ``n_planes`` random hyperplanes, grouped into ``bands``;
    a vector is a candidate if ANY band's sign-pattern matches the query's.
    Exact cosine re-rank on candidates. At scale the sign computation is a
    narrow JVM stage and the bucket filter prunes the scan before the
    expensive re-rank.
    """
    q = np.asarray(query_vec, dtype=np.float64)
    planes = _hyperplanes(len(q), n_planes, seed)
    rows = n_planes // bands
    q_signs = (planes @ q > 0).astype(int)

    v = _as_double(vec_col)
    sign_cols = []
    for p in planes:
        parr = F.array(*[F.lit(float(x)) for x in p])
        sign_cols.append(F.when(_dot(v, parr) > 0, 1).otherwise(0))
    signs = F.array(*sign_cols)

    band_match = None
    for b in range(bands):
        expr = None
        for j in range(rows):
            i = b * rows + j
            c = F.element_at(signs, i + 1) == int(q_signs[i])
            expr = c if expr is None else (expr & c)
        band_match = expr if band_match is None else (band_match | expr)

    cand = df.filter(band_match)
    return cosine_top_k(cand, query_vec, k, id_col, vec_col, exclude_id,
                        round_dp)


def cosine_near_pairs(df: DataFrame, threshold: float,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      round_dp: int = 6) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, EXACT all-pairs baseline →
    (id_a, id_b, sim) with sim ≥ threshold and id_a < id_b.

    Quadratic by construction — this is the SQL-oracle-able baseline (norms
    precomputed once per row, one fold per pair); ``cosine_near_pairs_lsh``
    is the scale path."""
    v = _as_double(vec_col)
    base = df.select(F.col(id_col).alias("id"), v.alias("v")).withColumn(
        "nrm", F.sqrt(_dot(F.col("v"), F.col("v"))))
    a, b = base.alias("a"), base.alias("b")
    sim = (_dot(F.col("a.v"), F.col("b.v"))
           / (F.col("a.nrm") * F.col("b.nrm")))
    return (a.join(b, F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                    sim.alias("sim"))
            .filter(F.col("sim") >= threshold)
            .select("id_a", "id_b", F.round("sim", round_dp).alias("sim")))


def cosine_near_pairs_lsh(df: DataFrame, threshold: float,
                          id_col: str = "vec_id", vec_col: str = "embedding",
                          n_planes: int = 16, bands: int = 8, seed: int = 42,
                          round_dp: int = 6) -> DataFrame:
    """Embedding-cosine near-dup pairs via random-hyperplane LSH blocking.

    Sign-sketch each vector against ``n_planes`` hyperplanes (one narrow JVM
    stage), band the signs; vectors sharing ANY band bucket become candidate
    pairs (never an all-pairs stage), then candidates are verified with the
    exact cosine ≥ threshold. Recall follows the sign-agreement S-curve
    (P[sign match] = 1 − θ/π per plane) — raise ``bands`` / lower rows per
    band for higher recall at lower thresholds."""
    if n_planes % bands:
        raise ValueError("n_planes must be divisible by bands")
    rows = n_planes // bands
    # dim from one row (driver-side peek; schemas with fixed-size arrays
    # could supply this statically)
    first = df.select(F.size(_as_double(vec_col)).alias("d")).first()
    if first is None:
        return df.sparkSession.createDataFrame(
            [], "id_a long, id_b long, sim double")
    planes = _hyperplanes(int(first["d"]), n_planes, seed)

    base = (df.select(F.col(id_col).alias("id"),
                      _as_double(vec_col).alias("v"))
            .withColumn("nrm", F.sqrt(_dot(F.col("v"), F.col("v")))))
    sign_cols = []
    for p in planes:
        parr = F.array(*[F.lit(float(x)) for x in p])
        sign_cols.append(F.when(_dot(F.col("v"), parr) > 0, 1).otherwise(0))
    base = base.withColumn("_signs", F.array(*sign_cols))
    keyed = base.select(
        "id",
        F.explode(F.array(*[
            F.hash(F.slice("_signs", b * rows + 1, rows).cast("string"),
                   F.lit(b))
            for b in range(bands)
        ])).alias("bkey"))
    cand = (keyed.alias("x").join(
        keyed.alias("y"),
        (F.col("x.bkey") == F.col("y.bkey")) & (F.col("x.id") < F.col("y.id")))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct())
    va = base.select(F.col("id").alias("id_a"), F.col("v").alias("va"),
                     F.col("nrm").alias("na"))
    vb = base.select(F.col("id").alias("id_b"), F.col("v").alias("vb"),
                     F.col("nrm").alias("nb"))
    sim = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (cand.join(va, "id_a").join(vb, "id_b")
            .select("id_a", "id_b", sim.alias("sim"))
            .filter(F.col("sim") >= threshold)
            .select("id_a", "id_b", F.round("sim", round_dp).alias("sim")))
