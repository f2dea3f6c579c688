"""Multimodal column plumbing: binary payloads + typed metadata.

North-star operator family (BASELINE.json): image/audio/video as opaque
``binary`` columns with typed metadata structs; decode / feature-extract
/ resize / frame-sample as Arrow-batched ``mapInPandas`` stages.

The Spark-side plumbing here is real and tested (schemas, batch
iteration, partition sizing); the actual codecs are STUBBED — the
container has no image/audio libraries — behind ``decoder`` callables.
``fake_image_decoder`` provides a deterministic stand-in so pipelines
are end-to-end testable; swapping in a real decoder (PIL/librosa/ffmpeg)
changes only the callable, not the plumbing.

Scale notes: payloads stay in executor memory one Arrow batch at a time
(maxRecordsPerBatch bounds it); metadata-only operations (filtering by
width, sampling by duration) never touch the payload column thanks to
Parquet column pruning — keep metadata in separate top-level columns for
exactly this reason.
"""

from __future__ import annotations

from typing import Any, Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)


def fake_image_decoder(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real image decode: derives a tiny
    'pixel' array from the payload bytes. Replace with PIL in production."""
    if payload is None:
        raise ValueError("null payload")
    arr = np.frombuffer(payload[:48].ljust(48, b"\0"), dtype=np.uint8)
    return arr.reshape(4, 4, 3).astype(np.float32) / 255.0


def real_image_decoder(payload: bytes) -> np.ndarray:  # pragma: no cover
    """Real decode path — requires PIL, absent in this container."""
    raise NotImplementedError(
        "image decoding requires PIL/pillow which is not installed; "
        "inject fake_image_decoder for tests or install pillow"
    )


FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("feature", ArrayType(FloatType())),
        StructField("decode_ok", StringType()),
    ]
)


def extract_features(
    df: DataFrame,
    decoder: Callable[[bytes], Any] = fake_image_decoder,
    id_col: str = "media_id",
    payload_col: str = "payload",
    feature_dim: int = 12,
) -> DataFrame:
    """Decode payloads per Arrow batch and emit fixed-size feature vectors
    (mean/std/max per channel for the fake decoder). The plumbing —
    batch iteration, error capture per record, stable schema — is the
    production shape; only ``decoder`` is a stub."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats, oks = [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                ids.append(str(mid))
                try:
                    arr = decoder(bytes(payload) if payload is not None else None)
                    a = np.asarray(arr, dtype=np.float32).reshape(-1, 3)
                    feat = np.concatenate(
                        [a.mean(axis=0), a.std(axis=0), a.max(axis=0), a.min(axis=0)]
                    )[:feature_dim]
                    feats.append(feat.astype(np.float32))
                    oks.append("ok")
                except Exception as e:  # record-level failure isolation
                    feats.append(np.zeros(feature_dim, dtype=np.float32))
                    oks.append(f"error: {type(e).__name__}")
            yield pd.DataFrame(
                {"media_id": ids, "feature": list(feats), "decode_ok": oks}
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


def resize_array(arr: np.ndarray, height: int, width: int) -> np.ndarray:
    """Nearest-neighbour resize of an HxWxC array — pure numpy, no image
    libs needed; bilinear/real codecs swap in via the decoder hook."""
    a = np.asarray(arr)
    h, w = a.shape[0], a.shape[1]
    rows = (np.arange(height) * (h / height)).astype(int).clip(0, h - 1)
    cols = (np.arange(width) * (w / width)).astype(int).clip(0, w - 1)
    return a[rows][:, cols]


def decode_and_resize(
    df: DataFrame,
    height: int,
    width: int,
    decoder: Callable[[bytes], Any] = fake_image_decoder,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """[media_id, pixels (flattened float array), h, w, decode_ok]:
    decode + resize per Arrow batch (the brief's 'resize' stage; the
    resample itself is real numpy, only the codec is injected)."""
    schema = StructType(
        [
            StructField("media_id", StringType()),
            StructField("pixels", ArrayType(FloatType())),
            StructField("h", IntegerType()),
            StructField("w", IntegerType()),
            StructField("decode_ok", StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "pixels": [], "h": [], "w": [], "decode_ok": []}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                out["media_id"].append(str(mid))
                try:
                    arr = decoder(bytes(payload) if payload is not None else None)
                    resized = resize_array(np.asarray(arr, dtype=np.float32),
                                           height, width)
                    out["pixels"].append(resized.reshape(-1).astype(np.float32))
                    out["h"].append(height)
                    out["w"].append(width)
                    out["decode_ok"].append("ok")
                except Exception as e:
                    out["pixels"].append(np.zeros(height * width * 3, dtype=np.float32))
                    out["h"].append(height)
                    out["w"].append(width)
                    out["decode_ok"].append(f"error: {type(e).__name__}")
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema)


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    id_col: str = "media_id",
    duration_col: str = "duration_ms",
) -> DataFrame:
    """Frame-sampling plan: one row per (media, frame_ts). Metadata-only —
    never reads the payload column (column pruning keeps the scan thin);
    the decode of sampled frames is a later extract_features stage."""
    return df.select(
        F.col(id_col),
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col(duration_col).cast("long") - 1, F.lit(0)),
                F.lit(int(every_ms)),
            )
        ).alias("frame_ts_ms"),
    )


def media_stats(df: DataFrame) -> DataFrame:
    """Metadata aggregation (payload never read): counts + size stats per
    media_type."""
    return df.groupBy("media_type").agg(
        F.count("*").alias("n"),
        F.avg(F.length(F.col("payload"))).alias("avg_payload_bytes"),
        F.avg("width").alias("avg_width"),
        F.avg("duration_ms").alias("avg_duration_ms"),
    )
