"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schemas, Arrow batch shapes, partitioning, UDF
signatures) is real and tested; the actual media DECODE is stubbed behind
deterministic fakes because no image/audio libraries exist in this container
(clearly marked below — swap `_fake_decode_*` for PIL/ffmpeg calls on a real
cluster; nothing else changes).

Design: media rides as `content: binary` with a `media_meta` struct column.
Feature extraction is mapInPandas over Arrow batches — batch-shaped exactly
like a production decode (iterator of pandas DataFrames, bounded batch
memory via spark.sql.execution.arrow.maxRecordsPerBatch), so the operator
cost model at 100 TB is the real one even while the kernel is fake.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "media_meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("mime", T.StringType()),
                ]
            ),
        ),
    ]
)


def _fake_decode_image(content: bytes) -> np.ndarray:
    """STUB — deterministic fake decode. Production: PIL.Image.open(BytesIO).
    Derives an 8x8 grayscale 'thumbnail' from the content hash so the
    pipeline has real, deterministic bytes to aggregate."""
    h = hashlib.sha256(content or b"").digest()
    return np.frombuffer((h * 2)[:64], dtype=np.uint8).reshape(8, 8)


def decode_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: content -> (thumbnail stats, phash).
    Real Arrow batch shape; fake kernel (see module docstring)."""

    out_schema = (
        "media_id long, kind string, mean_luma double, std_luma double, phash long"
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = [_fake_decode_image(c) for c in pdf["content"]]
            mean = np.array([t.mean() for t in thumbs])
            std = np.array([t.std() for t in thumbs])
            # perceptual-hash-style bits: pixel > median
            ph = []
            for t in thumbs:
                bits = (t.flatten() > np.median(t)).astype(np.uint64)
                val = int((bits * (np.uint64(1) << np.arange(64, dtype=np.uint64))).sum())
                ph.append(val & 0x7FFFFFFFFFFFFFFF)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "mean_luma": mean,
                    "std_luma": std,
                    "phash": ph,
                }
            )

    return df.mapInPandas(extract, schema=out_schema)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling PLAN: one row per (media_id, frame_ts_ms) —
    the explode is real Spark (sequence + explode); the frame grab itself
    would run inside decode_features on a real cluster."""
    n_frames = F.greatest(
        (F.col("media_meta.duration_ms") / F.lit(every_ms)).cast("int"), F.lit(1)
    )
    return (
        df.where(F.col("kind") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(F.sequence(F.lit(0), (n_frames - 1) * every_ms, F.lit(every_ms))),
        )
        .select("media_id", "frame_ts_ms", "media_meta")
    )


def synth_media(spark, n: int = 200) -> DataFrame:
    """Deterministic fake media table (content = seeded bytes)."""
    rng = np.random.default_rng(77)
    kinds = np.array(["image", "audio", "video"])
    rows = []
    for i in range(n):
        kind = str(kinds[i % 3])
        content = rng.integers(0, 256, 128, dtype=np.uint8).tobytes()
        rows.append(
            (
                i,
                kind,
                bytearray(content),
                (
                    int(rng.integers(64, 4096)) if kind == "image" else 0,
                    int(rng.integers(64, 4096)) if kind == "image" else 0,
                    int(rng.integers(1000, 600_000)) if kind != "image" else 0,
                    {"image": "image/jpeg", "audio": "audio/ogg", "video": "video/mp4"}[kind],
                ),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
