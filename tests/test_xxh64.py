"""xxh.py must be bit-identical to Spark's xxhash64 (seed 42) — the MinHash
signature stage depends on it for result-identity with the r5 JVM formula."""

from __future__ import annotations

import random
import string

import numpy as np
import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from deluge_spark.functions.xxh import xxhash64_arrow, xxhash64_bytes


def _spark_xxh(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "s string")
    return [r["h"] for r in
            df.select(F.xxhash64("s").alias("h")).collect()]


def test_xxh64_matches_spark_all_lengths(spark):
    rnd = random.Random(7)
    vals = [""]
    # every length 0..100 (crosses the 4/8-byte tail and >=32 stripe paths)
    for ln in range(1, 101):
        vals.append("".join(rnd.choice(string.ascii_lowercase + "0123456789 ")
                            for _ in range(ln)))
    # multi-byte UTF-8 (hash is over UTF-8 bytes)
    vals += ["héllo wörld", "日本語のテキスト", "emoji 🎉 mix", "aé" * 40]
    got = xxhash64_arrow(pa.array(vals, pa.string()))
    want = _spark_xxh(spark, vals)
    assert got.tolist() == want


def test_xxh64_matches_spark_random_fuzz(spark):
    rnd = random.Random(1234)
    vals = []
    for _ in range(500):
        ln = rnd.randint(0, 64)
        vals.append("".join(chr(rnd.randint(32, 0x2FF))
                            for _ in range(ln)))
    got = xxhash64_arrow(pa.array(vals, pa.string()))
    want = _spark_xxh(spark, vals)
    assert got.tolist() == want


def test_xxh64_bytes_interface():
    rows = [b"spark join", b"", b"table" * 20]
    flat = np.frombuffer(b"".join(rows), dtype=np.uint8)
    offs = np.cumsum([0] + [len(r) for r in rows])
    got = xxhash64_bytes(flat, offs)
    via_arrow = xxhash64_arrow(pa.array([r.decode() for r in rows]))
    assert got.tolist() == via_arrow.tolist()


def test_xxh64_seed_chain_matches_spark(spark):
    """Spark's multi-column xxhash64 chains: hash(col2, seed=hash(col1, 42))
    — exercises the seed parameter against non-42 values."""
    pairs = [("alpha", "beta"), ("x" * 40, "y"), ("", "tail bytes here")]
    df = spark.createDataFrame(pairs, "a string, b string")
    want = [r["h"] for r in
            df.select(F.xxhash64("a", "b").alias("h")).collect()]
    got = []
    for a, b in pairs:
        s1 = int(xxhash64_arrow(pa.array([a]))[0])
        got.append(int(xxhash64_arrow(pa.array([b]), seed=s1 & (2**64 - 1))[0]))
    assert got == want


_ = pytest  # parametrize import kept for future cases
