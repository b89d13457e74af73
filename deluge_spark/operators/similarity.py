"""Similarity search over embedding columns (array<float>).

Paths, one semantics (cosine):

- ``cosine_top_k``: brute-force, pure JVM expressions (zip_with product +
  aggregate fold — sequential fold gives deterministic summation order, so
  results are oracle-reproducible bit-for-bit in float64). The correctness
  baseline; O(n·d) per query — fine for one query over 100 TB when the scan
  is columnar and pruned, the scale path for batch all-pairs is LSH below.
- ``rp_lsh_top_k``: random-hyperplane LSH (sign sketch) — bucket candidates
  on any matching band of hyperplane signs, exact cosine re-rank inside the
  candidate set. Approximate; recall grows with bands. Batch-mode (signs
  recomputed per call).
- ``build_ann_index`` / ``AnnIndex`` / ``ann_index_top_k``: the SERVING
  path — the sign sketch is computed once and persisted as a (id, band,
  bucket) parquet table (partitioned by band, bucket-sorted for row-group
  pruning) next to a (id, vector, norm) table; a query touches only its own
  buckets plus the candidate re-rank, never the full corpus. ``AnnIndex``
  is the open-once handle for repeated queries (cached table handles,
  optional in-memory pinning).

Sign computation runs in ONE Arrow stage (``mapInArrow``): the plane matrix
is regenerated deterministically from (dim, n_planes, seed) inside each
task and applied as a numpy matmul per batch — no n_planes×dim literal
expression trees (8k+ literals at dim 512 made codegen cost grow with dim)
and no driver ``first()`` peek to learn the dimension.

Vectors are cast to double before any arithmetic (float32 storage, float64
math — matches the DuckDB oracle exactly).
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deluge_spark.operators.parallel import spread_input


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
    out = spread_input(df).select(F.col(id_col).alias("vec_id"),
                                  F.round(sim, round_dp).alias("sim"))
    if exclude_id is not None:
        out = out.filter(F.col("vec_id") != exclude_id)
    return out.orderBy(F.col("sim").desc(), F.col("vec_id").asc()).limit(k)


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def _band_buckets(signs: np.ndarray, bands: int) -> np.ndarray:
    """(n, n_planes) bool sign matrix → (n, bands) int64 bucket ids: each
    band's bucket is the exact bit pattern of its sign rows (no hash — two
    vectors share a bucket iff their band signs are identical)."""
    n, n_planes = signs.shape
    rows = n_planes // bands
    weights = (np.int64(1) << np.arange(rows, dtype=np.int64))
    return signs.reshape(n, bands, rows).astype(np.int64) @ weights


def sign_sketch(df: DataFrame, id_col: str = "vec_id",
                vec_col: str = "embedding", n_planes: int = 16,
                bands: int = 4, seed: int = 42) -> DataFrame:
    """(id, vector) → exploded (id, band, bucket) sign sketch — ONE Arrow
    stage, numpy matmul per batch, planes regenerated from (dim, n_planes,
    seed) inside each task (deterministic, nothing broadcast, no driver
    peek for the dimension)."""
    if n_planes % bands:
        raise ValueError("n_planes must be divisible by bands")
    src = spread_input(
        df.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("v")))
    # carry the id through with its SOURCE type (string/long/...): the
    # sketch must not implicitly cast ids the caller joins back on
    id_type = src.schema["id"].dataType.simpleString()

    def _stage(it):
        import pyarrow as pa
        import pyarrow.compute as pc

        planes_t = None
        for batch in it:
            n = batch.num_rows
            if n == 0:
                continue
            varr = batch.column("v")
            lens = pc.list_value_length(varr).to_numpy(zero_copy_only=False)
            dim = int(lens[0])
            if not (lens == dim).all():
                raise ValueError("embedding column has ragged dimensions")
            if planes_t is None:
                planes_t = _hyperplanes(dim, n_planes, seed).T  # dim×planes
            m = varr.flatten().to_numpy(
                zero_copy_only=False).reshape(n, dim)
            buckets = _band_buckets(m @ planes_t > 0, bands)
            rep = pa.array(np.repeat(np.arange(n, dtype=np.int64), bands))
            yield pa.RecordBatch.from_pydict({
                "id": batch.column("id").take(rep),  # type-preserving
                "band": pa.array(
                    np.tile(np.arange(bands, dtype=np.int32), n), pa.int32()),
                "bucket": pa.array(buckets.reshape(-1), pa.int64()),
            })

    return src.mapInArrow(_stage,
                          schema=f"id {id_type}, band int, bucket long")


def _query_buckets(query_vec, n_planes: int, bands: int,
                   seed: int) -> np.ndarray:
    q = np.asarray(query_vec, dtype=np.float64)
    planes = _hyperplanes(len(q), n_planes, seed)
    return _band_buckets((planes @ q > 0)[None, :], bands)[0]


def rp_lsh_top_k(df: DataFrame, query_vec: list[float], k: int = 10,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 n_planes: int = 16, bands: int = 4, seed: int = 42,
                 exclude_id: int | None = None, round_dp: int = 6) -> DataFrame:
    """LSH-bucketed approximate cosine top-k, batch mode (the corpus sketch
    is computed in this call — for repeated queries persist it once with
    ``build_ann_index`` and serve with ``ann_index_top_k``).

    Signs against ``n_planes`` random hyperplanes, grouped into ``bands``;
    a vector is a candidate if ANY band's sign-pattern matches the query's.
    Exact cosine re-rank on candidates.
    """
    qb = _query_buckets(query_vec, n_planes, bands, seed)
    sk = sign_sketch(df, id_col, vec_col, n_planes, bands, seed)
    match = None
    for b in range(bands):
        c = (F.col("band") == b) & (F.col("bucket") == int(qb[b]))
        match = c if match is None else (match | c)
    cand_ids = sk.filter(match).select("id")  # LEFT SEMI dedups for free
    cand = df.join(cand_ids.withColumnRenamed("id", id_col), id_col,
                   "left_semi")
    return cosine_top_k(cand, query_vec, k, id_col, vec_col, exclude_id,
                        round_dp)


def build_ann_index(df: DataFrame, index_dir: str, id_col: str = "vec_id",
                    vec_col: str = "embedding", n_planes: int = 16,
                    bands: int = 4, seed: int = 42) -> dict:
    """Persist the ANN serving index: ``sketch/`` (id, bucket) partitioned
    by band and bucket-sorted (parquet row-group pruning serves a bucket
    lookup without scanning the band), ``vectors/`` (id, v, nrm) for the
    exact re-rank, and ``meta.json`` (n_planes, bands, seed, dim) so queries
    reproduce the exact same hyperplanes. Build cost: one corpus pass."""
    import threading

    from pyspark.sql import Observation

    os.makedirs(index_dir, exist_ok=True)
    spark = df.sparkSession
    # the sketch and vectors writes are independent jobs over the same
    # source — run them CONCURRENTLY (guide §2.6: overlap independent
    # jobs) so the second job's tasks back-fill executors freed by the
    # first's tail; meta.json (the index's commit point) is written only
    # after BOTH finish, so crash semantics are unchanged (a dir without
    # meta.json is an unfinished build, exactly as before)
    sk = sign_sketch(df, id_col, vec_col, n_planes, bands, seed)
    sk_exc: list[BaseException] = []

    def _write_sketch() -> None:
        try:
            (sk.repartition("band").sortWithinPartitions("bucket", "id")
             .write.mode("overwrite").partitionBy("band")
             .parquet(os.path.join(index_dir, "sketch")))
        except BaseException as ex:  # surfaced after join
            sk_exc.append(ex)

    th = threading.Thread(target=_write_sketch,
                          name="deluge-ann-sketch-write", daemon=True)
    th.start()
    vecs = spread_input(df.select(F.col(id_col).alias("id"),
                                  _as_double(vec_col).alias("v")))
    vecs = vecs.withColumn("nrm", F.sqrt(_dot(F.col("v"), F.col("v"))))
    # n_vectors/dim observed ON the write job — no re-read count pass.
    # Output-file sizing (guide §6): the norm compute runs at full spread
    # parallelism, then ONE exchange packs the table into a few files so
    # every later query scan doesn't pay per-file open cost for dozens of
    # task-sized shards.
    n_files = max(1, df.sparkSession.sparkContext.defaultParallelism // 8)
    obs = Observation()
    (vecs.repartition(n_files)
     .observe(obs, F.count(F.lit(1)).alias("n"),
              F.max(F.size("v")).alias("dim"))
     .write.mode("overwrite").parquet(os.path.join(index_dir, "vectors")))
    row = obs.get
    th.join()
    if sk_exc:
        raise sk_exc[0]
    meta = {"n_planes": n_planes, "bands": bands, "seed": seed,
            "dim": int(row["dim"] or 0), "n_vectors": int(row["n"])}
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def append_ann_index(df: DataFrame, index_dir: str, id_col: str = "vec_id",
                     vec_col: str = "embedding") -> dict:
    """Incrementally add vectors to a persisted ANN index — no rebuild.

    The sketch is a band-partitioned parquet table, so appended files just
    add (bucket-sorted) row groups under each band dir; queries see
    old + new on the next open. Hyperplanes are regenerated from the
    index's recorded (dim, n_planes, bands, seed), so appended buckets are
    globally consistent with the original build and ``AnnIndex.top_k`` is
    exactly what a from-scratch rebuild over the union would return.

    Ordering: vectors first, then sketch rows, then meta counts — the two
    table appends are not one atomic commit, so repair a crashed append by
    rebuilding (re-running it would duplicate the ids). ``AnnIndex``
    handles opened before the append keep serving the pre-append snapshot;
    reopen to see the new vectors. Duplicate-id screening is the caller's
    responsibility (same as build)."""
    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    vecs = df.select(F.col(id_col).alias("id"),
                     _as_double(vec_col).alias("v"))
    vecs = vecs.withColumn("nrm", F.sqrt(_dot(F.col("v"), F.col("v"))))
    row = vecs.agg(F.count(F.lit(1)).alias("n"),
                   F.min(F.size("v")).alias("lo"),
                   F.max(F.size("v")).alias("hi")).collect()[0]
    n_new = int(row["n"] or 0)
    if n_new == 0:
        return meta
    if int(row["lo"]) != meta["dim"] or int(row["hi"]) != meta["dim"]:
        raise ValueError(
            f"appended vectors must have dim {meta['dim']}, got "
            f"[{row['lo']}, {row['hi']}]")
    vecs.write.mode("append").parquet(os.path.join(index_dir, "vectors"))
    sk = sign_sketch(df, id_col, vec_col, meta["n_planes"], meta["bands"],
                     meta["seed"])
    (sk.repartition("band").sortWithinPartitions("bucket", "id")
     .write.mode("append").partitionBy("band")
     .parquet(os.path.join(index_dir, "sketch")))
    meta["n_vectors"] = int(meta["n_vectors"]) + n_new
    mtmp = os.path.join(index_dir, ".meta.json.tmp")
    with open(mtmp, "w") as f:
        json.dump(meta, f)
    os.replace(mtmp, os.path.join(index_dir, "meta.json"))
    return meta


class AnnIndex:
    """Open-once SERVING handle over a persisted ANN index: ``meta.json``
    and the sketch/vectors DataFrame handles are resolved at open time and
    reused across queries (no per-query file listing / schema inference);
    with ``persist=True`` both tables are additionally pinned in cluster
    memory, so repeated queries never touch parquet at all — the profile a
    long-lived ANN service runs (VERDICT r3 task #6: cache the vectors-side
    read across queries in serving mode).

    One-shot convenience: ``ann_index_top_k`` (opens, queries, no pinning).
    """

    def __init__(self, spark: SparkSession, index_dir: str,
                 persist: bool = False):
        self.spark = spark
        self.index_dir = index_dir
        with open(os.path.join(index_dir, "meta.json")) as f:
            self.meta = json.load(f)
        self._sketch = spark.read.parquet(os.path.join(index_dir, "sketch"))
        self._vectors = spark.read.parquet(
            os.path.join(index_dir, "vectors"))
        self._persisted = persist
        if persist:
            self._sketch = self._sketch.persist()
            self._vectors = self._vectors.persist()

    def top_k(self, query_vec: list[float], k: int = 10,
              exclude_id: int | None = None,
              round_dp: int = 6) -> DataFrame:
        """Bucket lookup on the sketch (band partition pruning + bucket
        predicate pushdown — the corpus is never rescanned), exact float64
        re-rank over the candidates. → (vec_id, sim), same deterministic
        ordering as ``cosine_top_k``."""
        meta = self.meta
        q = [float(x) for x in query_vec]
        if len(q) != meta["dim"]:
            raise ValueError(
                f"query dim {len(q)} != index dim {meta['dim']}")
        qb = _query_buckets(q, meta["n_planes"], meta["bands"],
                            meta["seed"])
        match = None
        for b in range(meta["bands"]):
            c = (F.col("band") == b) & (F.col("bucket") == int(qb[b]))
            match = c if match is None else (match | c)
        # no distinct: the LEFT SEMI probe dedups matches for free, so
        # the candidate-id exchange disappears (guide §2.4)
        cand_ids = self._sketch.filter(match).select("id")
        cand = self._vectors.join(cand_ids, "id", "left_semi")
        qnorm = float(np.sqrt(np.dot(q, q)))
        qarr = F.array(*[F.lit(x) for x in q])
        sim = _dot(F.col("v"), qarr) / (F.col("nrm") * F.lit(qnorm))
        out = cand.select(F.col("id").alias("vec_id"),
                          F.round(sim, round_dp).alias("sim"))
        if exclude_id is not None:
            out = out.filter(F.col("vec_id") != exclude_id)
        return out.orderBy(F.col("sim").desc(),
                           F.col("vec_id").asc()).limit(k)

    def close(self) -> None:
        """Release pinned storage (no-op when opened without persist)."""
        if self._persisted:
            self._sketch.unpersist()
            self._vectors.unpersist()
            self._persisted = False

    def __enter__(self) -> "AnnIndex":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def ann_index_top_k(spark: SparkSession, index_dir: str,
                    query_vec: list[float], k: int = 10,
                    exclude_id: int | None = None,
                    round_dp: int = 6) -> DataFrame:
    """One-shot serve from a persisted ANN index (open + single query; for
    repeated queries hold an ``AnnIndex`` — it caches the table handles and
    can pin them in memory)."""
    return AnnIndex(spark, index_dir).top_k(query_vec, k, exclude_id,
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
    base = spread_input(
        df.select(F.col(id_col).alias("id"), v.alias("v"))).withColumn(
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

    Sign-sketch each vector against ``n_planes`` hyperplanes (one Arrow
    matmul stage), band the signs; vectors sharing ANY band bucket become candidate
    pairs (never an all-pairs stage), then candidates are verified with the
    exact cosine ≥ threshold. Recall follows the sign-agreement S-curve
    (P[sign match] = 1 − θ/π per plane) — raise ``bands`` / lower rows per
    band for higher recall at lower thresholds."""
    keyed = sign_sketch(df, id_col, vec_col, n_planes, bands, seed)
    cand = (keyed.alias("x").join(
        keyed.alias("y"),
        (F.col("x.band") == F.col("y.band"))
        & (F.col("x.bucket") == F.col("y.bucket"))
        & (F.col("x.id") < F.col("y.id")))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct())
    base = (spread_input(df.select(F.col(id_col).alias("id"),
                                   _as_double(vec_col).alias("v")))
            .withColumn("nrm", F.sqrt(_dot(F.col("v"), F.col("v")))))
    va = base.select(F.col("id").alias("id_a"), F.col("v").alias("va"),
                     F.col("nrm").alias("na"))
    vb = base.select(F.col("id").alias("id_b"), F.col("v").alias("vb"),
                     F.col("nrm").alias("nb"))
    sim = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (cand.join(va, "id_a").join(vb, "id_b")
            .select("id_a", "id_b", sim.alias("sim"))
            .filter(F.col("sim") >= threshold)
            .select("id_a", "id_b", F.round("sim", round_dp).alias("sim")))
