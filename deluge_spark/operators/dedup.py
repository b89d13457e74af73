"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's scope (deluge never dedups — ES doc `_id` overwrite
is its only dedup story), these are first-class citizens of a 100 TB corpus
pipeline. All are pure DataFrame compositions (JVM-side, codegen'd) except
where hashing math needs numpy (MinHash), which runs in Arrow-batched pandas.

Scale notes per operator:
- exact: one hash-groupBy shuffle; hash first so the shuffle key is 32 B,
  not the document.
- minhash_lsh: shingle explode → per-doc signature (single groupBy via
  positional min-aggregation) → band explode → bucket groupBy. Candidate
  pairs verified with exact Jaccard; no O(n²) stage anywhere.
- simhash: per-doc 64-bit fingerprint via weighted bit-vote, bucket join on
  rotated prefixes for Hamming-neighbor candidates.
- ngram_jaccard: exact all-pairs via shingle equi-join — quadratic in the
  worst case; the LSH variants are the scale path, this is the oracle-able
  exact baseline (cap with a shingle-df ceiling to kill stopword-shingle
  blowup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Spark-SQL code tokenizer (JVM-side twin of functions/tokenizer.py; same
# token language, usable where no Python worker is wanted).
SQL_TOKENS_CODE = (
    "regexp_extract_all(lower(regexp_replace(regexp_replace({col}, "
    "'([a-z0-9])([A-Z])', '$1 $2'), '([A-Z]+)([A-Z][a-z])', '$1 $2')), "
    "'[a-z][a-z0-9]*|[0-9]+', 0)"
)
SQL_TOKENS_SIMPLE = "regexp_extract_all(lower({col}), '[a-z0-9]+', 0)"


def tokens_col(col: str, mode: str = "simple"):
    expr = SQL_TOKENS_CODE if mode == "code" else SQL_TOKENS_SIMPLE
    return F.expr(expr.format(col=col))


def _eager_release(out: DataFrame, handles: list[DataFrame]) -> DataFrame:
    """Materialize ``out`` once, then release the transient ``.cache()``
    handles its plan reused — the corpus-sized intermediate (shingle table,
    fingerprint table) must not stay pinned in cluster memory for the rest
    of a long-lived session. The small RESULT table is persisted so callers
    can collect/reuse it without recomputing through the now-released
    caches; they may ``.unpersist()`` it when done."""
    out = out.persist()
    try:
        out.count()
    except BaseException:
        out.unpersist(blocking=False)
        raise
    finally:
        for h in handles:
            h.unpersist(blocking=False)
    return out


def exact_dedup_groups(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Group identical texts → (content_hash, n_docs, min_doc_id)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), id_col)
        .groupBy("content_hash")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
             F.min(id_col).cast("long").alias("min_doc_id"))
    )


def exact_dedup(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Keep one representative (min id) per identical text.

    Decide on small rows, move big rows once (guide §8): the winner per
    content hash is ``min(id)`` over a (md5, id) projection — a ~40 B/row
    shuffle — and the full representative ROWS come back via a LEFT SEMI
    join on id. The previous row_number window shuffled every document's
    full text by md5; now the text column never crosses an exchange when
    the representative-id set broadcasts (AQE decides from its observed
    size; at larger scale the semi join costs the same one full shuffle
    the window did)."""
    reps = (df.select(F.md5(F.col(text_col)).alias("_h"), F.col(id_col))
            .groupBy("_h").agg(F.min(id_col).alias(id_col))
            .select(id_col))
    return df.join(reps, id_col, "left_semi")



def _batch_shingles(col, mode: str, n: int):
    """One Arrow batch's text column → (doc-row index array, shingle
    StringArray), NOT deduped; None when the batch yields no shingles.
    Shared by the shingle-table stage and the MinHash signature stage."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from deluge_spark.functions.tokenizer import _tokenize_arrow

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    toks = _tokenize_arrow(col, mode)
    parents = pc.list_parent_indices(toks)
    flat = pc.list_flatten(toks)
    mask = pc.not_equal(flat, "")
    flat = flat.filter(mask)
    parents = parents.filter(mask)
    if len(flat) == 0:
        return None
    pn = parents.to_numpy(zero_copy_only=False)
    if n == 1:
        return pn, flat
    if len(pn) < n:
        return None
    valid = pn[: -(n - 1)] == pn[n - 1:]
    idx = np.flatnonzero(valid)
    if not len(idx):
        return None
    parts = [flat.take(pa.array(idx + j, pa.int64())) for j in range(n)]
    # variadic join: (s_0, s_1, ..., separator)
    return pn[idx], pc.binary_join_element_wise(*parts, " ")


def _shingles(df: DataFrame, id_col: str, text_col: str, n: int,
              mode: str = "simple", with_size: bool = False) -> DataFrame:
    """(id, text) → distinct (id, shingle) word n-grams.

    ONE narrow Arrow stage (guide §4.2): tokenization runs through the
    same RE2 kernels as the index build (``_tokenize_arrow``, property-
    tested token-identical to the SQL ``tokens_col`` twin), n-grams are a
    vectorized shifted-take + ``binary_join_element_wise``, and the
    (id, shingle) DISTINCT is resolved per doc inside the stage — a doc's
    shingles all live in its own row, so batch-local dedup IS the global
    distinct and the previous corpus-wide ``distinct()`` exchange
    disappears entirely (guide §2.4: remove shuffles outright). The old
    JVM formulation (regexp_extract_all + per-position interpreted
    slice/concat HOFs + explode + distinct) spent ~4× longer on the same
    50k-doc corpus before the first downstream operator ran.
    """
    from deluge_spark.operators.parallel import spread_input

    src = spread_input(
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("_t")))
    id_type = src.schema["id"].dataType.simpleString()

    def _stage(it):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in it:
            if batch.num_rows == 0:
                continue
            got = _batch_shingles(batch.column("_t"), mode, n)
            if got is None:
                continue
            pid, sh = got
            ids = batch.column("id").take(pa.array(pid, pa.int64()))
            tbl = (pa.table({"id": ids, "shingle": sh})
                   .group_by(["id", "shingle"], use_threads=False)
                   .aggregate([]))
            out = {
                "id": tbl.column("id").combine_chunks(),
                "shingle": tbl.column("shingle").combine_chunks()
                .cast(pa.string()),
            }
            if with_size:
                # per-doc DISTINCT shingle count, attached to every row:
                # the exact-Jaccard verify reads |A|,|B| straight off the
                # joined rows instead of two extra sizes joins
                idn = pc.dictionary_encode(out["id"])
                codes = idn.indices.to_numpy(
                    zero_copy_only=False).astype(np.int64)
                cnt = np.bincount(codes)
                out["sz"] = pa.array(cnt[codes], pa.int64())
            yield pa.RecordBatch.from_pydict(out)

    schema = f"id {id_type}, shingle string"
    if with_size:
        schema += ", sz long"
    return src.mapInArrow(_stage, schema=schema)


def ngram_jaccard_pairs(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 1,
                        threshold: float = 0.5, mode: str = "simple",
                        max_shingle_df: int | None = None) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs → (doc_a, doc_b, jaccard), a<b.

    ``max_shingle_df`` drops shingles present in more than that many docs
    before pairing (stopword-shingle blowup guard at scale; None = exact).

    EAGER + PERSISTED result: the returned DataFrame is materialized
    inside this call (the corpus-sized shingle intermediate is cached for
    plan reuse, then released — it must not stay pinned for the session's
    lifetime), so the call itself pays the full computation and the small
    result table stays persisted. ``.unpersist()`` it when done; don't
    compose this into a lazy pipeline expecting deferred execution.
    """
    handle = _shingles(df, id_col, text_col, n, mode).cache()
    sh = handle
    if max_shingle_df is not None:
        hot = (sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("sdf"))
               .filter(F.col("sdf") > max_shingle_df).select("shingle"))
        sh = sh.join(hot, "shingle", "left_anti")
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.alias("a"); b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("id", "doc_a")
                   .withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("id", "doc_b")
              .withColumnRenamed("sz", "sz_b"), "doc_b")
        .withColumn("jaccard",
                    F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return _eager_release(out, [handle])


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

# 31-bit Mersenne prime: a·h stays < 2^62, no long overflow under ANSI mode
MERSENNE = (1 << 31) - 1


def _minhash_params(num_hashes: int, seed: int = 42) -> tuple[list[int], list[int]]:
    import random

    rnd = random.Random(seed)
    a = [rnd.randrange(1, MERSENNE) for _ in range(num_hashes)]
    b = [rnd.randrange(0, MERSENNE) for _ in range(num_hashes)]
    return a, b


def minhash_signatures(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", n: int = 2,
                       num_hashes: int = 64, seed: int = 42,
                       mode: str = "simple") -> DataFrame:
    """(id, text) → (id, sig array<long>) MinHash signatures.

    ONE narrow Arrow stage, zero shuffle: a doc's shingles all live in its
    own input row, so sig[i] = min over the doc's shingles of
    ``(a_i·h + b_i) mod M`` resolves entirely batch-locally — tokenize +
    n-gram (shared ``_batch_shingles`` kernels), base hash h =
    |xxhash64(shingle, 42)| mod M via the bit-exact numpy XXH64 twin
    (``functions/xxh.py``, property-tested against Spark's expression),
    then a vectorized permutation×shingle min-reduce per doc. Replaces the
    r5 exploded-shingle groupBy whose 64 positional min-aggregates paid a
    shuffle AND a multi-second whole-stage-codegen compile on every fresh
    JVM. Values are bit-identical to the JVM formula (same hash, same
    int64 arithmetic — no wrap below 2^62; remainder via C-semantics fmod
    exactly like Java's %).
    """
    from deluge_spark.operators.parallel import spread_input

    a, b = _minhash_params(num_hashes, seed)
    src = spread_input(
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("_t")))
    id_type = src.schema["id"].dataType.simpleString()

    def _stage(it):
        import numpy as np
        import pyarrow as pa

        from deluge_spark.functions.xxh import xxhash64_arrow

        A = np.asarray(a, dtype=np.int64)[:, None]
        B = np.asarray(b, dtype=np.int64)[:, None]
        M = np.int64(MERSENNE)
        for batch in it:
            if batch.num_rows == 0:
                continue
            got = _batch_shingles(batch.column("_t"), mode, n)
            if got is None:
                continue
            pid, sh = got
            h = np.fmod(np.abs(xxhash64_arrow(sh)), M)
            # doc boundaries in the (doc-ordered) shingle stream
            starts = np.flatnonzero(np.diff(pid, prepend=pid[0] - 1))
            n_docs = len(starts)
            sig = np.empty((n_docs, num_hashes), dtype=np.int64)
            # chunk at doc boundaries, ~100k shingles per chunk, so the
            # num_hashes × shingles permutation temporary stays ~50 MB
            ci = 0
            while ci < n_docs:
                cj = int(np.searchsorted(starts, starts[ci] + 100_000,
                                         side="right"))
                cj = max(cj, ci + 1)
                lo = int(starts[ci])
                hi = int(starts[cj]) if cj < n_docs else len(h)
                perms = (A * h[lo:hi][None, :] + B) % M
                seg = starts[ci:cj] - lo
                sig[ci:cj, :] = np.minimum.reduceat(
                    perms, seg, axis=1).T
                ci = cj
            ids = batch.column("id").take(pa.array(pid[starts], pa.int64()))
            offs = pa.array(
                np.arange(0, (n_docs + 1) * num_hashes, num_hashes,
                          dtype=np.int32), pa.int32())
            yield pa.RecordBatch.from_pydict({
                "id": ids,
                "sig": pa.ListArray.from_arrays(
                    offs, pa.array(sig.reshape(-1), pa.int64())),
            })

    return src.mapInArrow(_stage, schema=f"id {id_type}, sig array<long>")


def minhash_lsh_pairs(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", n: int = 2,
                      num_hashes: int = 64, bands: int = 16,
                      threshold: float = 0.5, seed: int = 42,
                      mode: str = "simple",
                      verify_exact: bool = True,
                      collapse_exact: bool = False,
                      bucket_cap: int | None = None) -> DataFrame:
    """MinHash-LSH near-dup candidates → (doc_a, doc_b[, jaccard]).

    bands×rows = num_hashes; docs sharing any full band bucket become
    candidates (banding S-curve); with verify_exact each candidate pair is
    checked with true shingle Jaccard ≥ threshold (pairs-only join — no
    all-pairs blowup).

    Scale guards (the within-bucket pairing is quadratic, and real corpora
    have giant byte-identical clusters — boilerplate licenses, vendored
    files — that collapse every band into one bucket):

    - ``collapse_exact``: run LSH over one representative (min id) per
      identical text; pairs are then between distinct-text representatives
      only. A 10^6-copy cluster costs one row instead of 10^12 pairs;
      ``exact_dedup_groups`` recovers the cluster membership. This is the
      100 TB configuration.
    - ``bucket_cap``: hard ceiling on ids considered per (band, bucket)
      (deterministic: smallest ids kept). A safety valve against residual
      near-identical floods; trades bounded recall loss for bounded work.

    LAZY result (unchanged contract): every action recomputes from the
    source — nothing is pinned in cluster memory by this call. The shingle
    stage is a narrow Arrow pass (see ``_shingles``) cheap enough to
    recompute per reference, and the candidate table's three references
    below share one physical computation through Spark's ReusedExchange
    (identical distinct-exchange subtrees).
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    if collapse_exact:
        df = exact_dedup(df, id_col, text_col)
    rows = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, n, num_hashes, seed,
                             mode)
    banded = sig.select(
        "id",
        F.posexplode(F.array(*[
            F.hash(F.slice("sig", i * rows + 1, rows).cast("array<string>")
                   .cast("string"), F.lit(i))
            for i in range(bands)
        ])).alias("band", "bucket"),
    )
    # explicit (band, bucket) exchange BEFORE the self-join: both join
    # branches then share it via ReusedExchange, so the signature stage
    # runs once — without an exchange anchor the (shuffle-free) Arrow sig
    # stage would be recomputed per branch (guide §2.4: two operations
    # keyed the same way share one exchange)
    banded = banded.repartition("band", "bucket")
    if bucket_cap is not None:
        wb = Window.partitionBy("band", "bucket").orderBy("id")
        banded = (banded.withColumn("_bn", F.row_number().over(wb))
                  .filter(F.col("_bn") <= bucket_cap).drop("_bn"))
    cand = (
        banded.alias("x").join(
            banded.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.id") < F.col("y.id")))
        .select(F.col("x.id").alias("doc_a"), F.col("y.id").alias("doc_b"))
        .distinct()
    )
    if not verify_exact:
        return cand
    # per-doc set sizes ride on the shingle rows (with_size), so the
    # exact-Jaccard verify is TWO shingle references and zero sizes
    # joins: |A| and |B| come off the joined rows themselves
    sh = _shingles(df, id_col, text_col, n, mode, with_size=True)
    sh_a = sh.select(F.col("id").alias("doc_a"), "shingle",
                     F.col("sz").alias("sz_a"))
    sh_b = sh.select(F.col("id").alias("doc_b"), "shingle",
                     F.col("sz").alias("sz_b"))
    inter = (cand.join(sh_a, "doc_a").join(sh_b, ["doc_b", "shingle"])
             .groupBy("doc_a", "doc_b")
             .agg(F.count(F.lit(1)).alias("inter"),
                  F.min("sz_a").alias("sz_a"),
                  F.min("sz_b").alias("sz_b")))
    return (
        inter
        .withColumn("jaccard",
                    F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
            mode: str = "simple") -> DataFrame:
    """(id, text) → (id, simhash long): 64-bit weighted bit-vote fingerprint.

    Pure DataFrame: explode tokens with tf weights, xxhash64 each token,
    per-bit vote = Σ tf·(bit ? +1 : −1), fingerprint bit = vote > 0.
    One groupBy(id) shuffle.
    """
    from deluge_spark.operators.parallel import spread_input

    toks = (spread_input(df.select(F.col(id_col).alias("id"),
                                   F.col(text_col).alias("_t")))
            .select("id", F.explode(tokens_col("_t", mode)).alias("tok"))
            .groupBy("id", "tok").agg(F.count(F.lit(1)).alias("tf")))
    h = F.xxhash64("tok")
    # positional sum aggregates: 64 independent F.sum expressions (fixed
    # 64-long agg state per doc, map-side combinable) instead of
    # collect_list of per-token 64-long vote arrays (state O(distinct
    # tokens) — an executor OOM at web scale).
    votes = [
        F.sum(F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1,
                     F.col("tf")).otherwise(-F.col("tf")).cast("long"))
        .alias(f"_v{i}")
        for i in range(64)
    ]
    agg = toks.groupBy("id").agg(*votes)
    bits = F.lit(0).cast("long")
    for i in range(64):
        val = (1 << i) if i < 63 else -(1 << 63)  # bit 63 = sign bit
        bits = bits.bitwiseOR(
            F.when(F.col(f"_v{i}") > 0, F.lit(val).cast("long"))
            .otherwise(F.lit(0).cast("long")))
    return agg.select("id", bits.alias("simhash"))


def simhash_near_pairs(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", max_hamming: int = 3,
                       mode: str = "simple",
                       n_chunks: int | None = None) -> DataFrame:
    """Candidate near-dup pairs with Hamming(simhash) ≤ max_hamming.

    Blocking = the multi-chunk pigeonhole scheme of Manku et al. 2007
    (WWW, "Detecting near-duplicates for web crawling"): split the 64-bit
    fingerprint into C = ``n_chunks`` pieces. A pair differing in ≤ d bits
    differs in ≤ d chunks, so it AGREES on some (C−d)-subset — keying every
    doc by each of its C(C,d) (C−d)-chunk-subset values guarantees candidate
    completeness. The win over single-chunk blocking (C = d+1): the key is
    (C−d)/C × 64 bits wide, e.g. d=3, C=6 → 32-bit keys vs 16-bit, shrinking
    expected bucket size from n/2^16 (quadratic pain at 10^8-10^9 docs) to
    n/2^32, for 20 key rows per doc instead of 4. Key = xxhash64(subset_id,
    chunk values...) — hash collisions only add false candidates, which the
    exact popcount filter removes; completeness is never lost.

    Default C = d+3 (d=3 → C=6, 20 keys/doc, 32-bit effective keys).

    EAGER + PERSISTED result: materialized inside this call (the
    fingerprint table is cached for plan reuse, then released), so the
    returned (small) pair table is persisted — ``.unpersist()`` it when
    done; don't compose into a lazy pipeline expecting deferred execution.
    """
    from itertools import combinations

    if n_chunks is None:
        n_chunks = max_hamming + 3
    if not (max_hamming < n_chunks <= 64):
        raise ValueError("need max_hamming < n_chunks <= 64")

    sh = simhash(df, id_col, text_col, mode).cache()  # reused by both join sides
    # chunk boundaries: 64 bits split as evenly as possible
    base, rem = divmod(64, n_chunks)
    widths = [base + (1 if i < rem else 0) for i in range(n_chunks)]
    offs = [sum(widths[:i]) for i in range(n_chunks)]
    chunk_cols = [
        F.shiftright(F.col("simhash"), offs[i])
        .bitwiseAND(F.lit((1 << widths[i]) - 1))  # masks sign extension too
        for i in range(n_chunks)
    ]
    combos = list(combinations(range(n_chunks), n_chunks - max_hamming))
    keys = F.array(*[
        F.xxhash64(F.lit(ci), *[chunk_cols[j] for j in combo])
        for ci, combo in enumerate(combos)
    ])
    keyed = sh.select("id", "simhash", F.explode(keys).alias("bkey"))
    cand = (keyed.alias("x").join(
        keyed.alias("y"),
        (F.col("x.bkey") == F.col("y.bkey")) & (F.col("x.id") < F.col("y.id")))
        .select(F.col("x.id").alias("doc_a"), F.col("x.simhash").alias("h_a"),
                F.col("y.id").alias("doc_b"), F.col("y.simhash").alias("h_b"))
        .distinct())
    ham = F.expr("bit_count(h_a ^ h_b)")
    out = (cand.withColumn("hamming", ham)
           .filter(F.col("hamming") <= max_hamming)
           .select("doc_a", "doc_b", "hamming"))
    return _eager_release(out, [sh])
