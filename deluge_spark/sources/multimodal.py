"""Multimodal column plumbing — binary payloads with typed metadata.

Images/audio/video ride as opaque ``binary`` columns plus a metadata struct;
all Spark-side plumbing (schema, partition sizing, Arrow batch shape,
mapInPandas signatures) is real and tested. The actual media decode is
STUBBED: the container ships no image/audio libraries, so ``decode_fn``
defaults to a deterministic fake (byte-statistics "features") and the
library-backed implementation raises NotImplementedError with a clear
message. Swap ``decode_fn`` for a PIL/libav-backed callable in a real
deployment — signatures are batch-shaped for exactly that.

Scale notes: binary payloads dominate row size, so operators here cap
Arrow batch records (bytes-per-batch, not rows-per-batch, is the limit) and
repartition by size before decode — the 100 TB path is
``maxPartitionBytes``-bounded file splits → mapInPandas with small batches.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, duration_ms:int, "
    "codec:string>"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha256 string, "
    "features array<float>"
)


def synthesize_media(spark: SparkSession, n: int = 64,
                     seed: int = 42) -> DataFrame:
    """Deterministic fake media table (for tests/benches — no external data)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=int(rng.integers(256, 4096)),
                               dtype=np.uint8).tobytes()
        meta = {
            "width": int(rng.integers(16, 1024)) if kind != "audio" else None,
            "height": int(rng.integers(16, 1024)) if kind != "audio" else None,
            "sample_rate": 16000 if kind != "image" else None,
            "duration_ms": int(rng.integers(100, 60000)) if kind != "image" else None,
            "codec": {"image": "png", "audio": "pcm16", "video": "h264"}[kind],
        }
        rows.append((i, kind, bytearray(payload), meta))
    pdf = pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])
    return spark.createDataFrame(pdf, schema=MEDIA_SCHEMA)


def fake_decode_batch(payloads: pd.Series, kinds: pd.Series) -> pd.Series:
    """Deterministic stand-in for a real decoder: 8 byte-statistics per
    payload (mean/std/quantile of raw bytes) as float32 'features'."""
    feats = []
    for b in payloads:
        a = np.frombuffer(bytes(b), dtype=np.uint8).astype(np.float32)
        if a.size == 0:
            feats.append([0.0] * 8)
            continue
        qs = np.quantile(a, [0.1, 0.25, 0.5, 0.75, 0.9])
        feats.append([float(a.mean()), float(a.std())] + [float(x) for x in qs]
                     + [float(a.size % 251)])
    return pd.Series(feats)


def real_decode_batch(payloads: pd.Series, kinds: pd.Series) -> pd.Series:
    """Library-backed decode — intentionally unimplemented in this image."""
    raise NotImplementedError(
        "media decode requires PIL/torchaudio/PyAV, not present in this "
        "container; pass decode_fn=fake_decode_batch or a library-backed "
        "callable with the same (payloads, kinds) -> Series[list[float]] "
        "signature")


def extract_features(df: DataFrame,
                     decode_fn: Callable[[pd.Series, pd.Series], pd.Series]
                     = fake_decode_batch,
                     records_per_batch: int = 256) -> DataFrame:
    """media table → per-item feature vectors via mapInPandas.

    The Arrow batch size is capped low because payload bytes, not row
    count, bound executor memory."""
    spark = df.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                   str(records_per_batch))

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = decode_fn(pdf["payload"], pdf["kind"])
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "sha256": pdf["payload"].map(
                    lambda b: hashlib.sha256(bytes(b)).hexdigest()),
                "features": feats,
            })

    return df.mapInPandas(_batches, schema=FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expands each video row into the frame
    timestamps a decoder would extract — pure JVM (sequence/explode); the
    decode itself is the stubbed stage."""
    return (df.filter(F.col("kind") == "video")
            .select("media_id",
                    F.explode(F.sequence(
                        F.lit(0),
                        F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                        F.lit(every_ms))).alias("frame_ts_ms")))
