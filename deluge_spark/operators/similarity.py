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
