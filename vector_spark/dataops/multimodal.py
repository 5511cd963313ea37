"""Multimodal column plumbing — image/audio/video as opaque binary.

Policy: media payloads are `binary` columns with a typed metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas functions over `mapInPandas` so each partition
streams batches through Python once. The decode kernels themselves
are STUBBED (no PIL/ffmpeg in this container): `decode=fake` yields
deterministic per-row features derived from the bytes, so the
Spark-side plumbing — schema, batch shape, partitioning — is fully
real and tested; `decode=real` raises NotImplementedError at the
exact seam where a codec library would plug in.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("content_hash", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a decoded-media embedding: bytes ->
    sha256 -> dim floats in [-1, 1]."""
    h = hashlib.sha256(payload).digest()
    return [
        (int.from_bytes(h[4 * i : 4 * i + 4], "big") % 2000003) / 1000001.0 - 1.0
        for i in range(dim)
    ]


def extract_features(
    df: DataFrame, decode: str = "fake", batch_dim: int = 8
) -> DataFrame:
    """Media feature extraction over mapInPandas (per-partition Arrow
    batch iterator — the real production shape)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg; plug the codec "
                    "in here — batch plumbing is already correct"
                )
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "content_hash": payloads.map(
                        lambda b: hashlib.sha256(b).hexdigest()
                    ),
                    "feature": payloads.map(
                        lambda b: _fake_feature(b, batch_dim)
                    ),
                }
            )

    return df.mapInPandas(run, FEATURES_SCHEMA)


def resize_images(
    df: DataFrame, width: int, height: int, decode: str = "fake"
) -> DataFrame:
    """Image resize over mapInPandas: same schema out, payload
    replaced by the resized encoding and meta.width/height updated.
    `fake` mode truncates/pads the payload to a deterministic size
    proportional to the target area (the real kernel would be
    PIL Image.resize at the marked seam) — schema, batching, and
    metadata rewriting are the real production shape."""

    target_len_per_kb = max(1, (width * height) // 1024)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                raise NotImplementedError(
                    "real resize requires PIL; plug Image.open/resize in "
                    "here — batch plumbing is already correct"
                )
            mask = pdf["kind"] == "image"
            out = pdf.copy()
            out.loc[mask, "payload"] = out.loc[mask, "payload"].map(
                lambda b: (b * (target_len_per_kb // max(len(b), 1) + 1))[
                    :target_len_per_kb
                ]
            )
            out.loc[mask, "meta"] = out.loc[mask, "meta"].map(
                lambda m: {**(m or {}), "width": width, "height": height}
            )
            yield out

    return df.mapInPandas(run, df.schema)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: explode (media_id, frame_ts_ms)
    rows from duration metadata — pure JVM; the decode of each frame
    would ride extract_features."""
    n_frames = F.greatest(
        (F.col("meta.duration_ms") / every_ms).cast("int"), F.lit(1)
    )
    return df.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_frames - 1), lambda i: i * every_ms
            )
        ).alias("frame_ts_ms"),
    )


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = (f"media-{i}-" + "x" * (i % 17)).encode()
        meta = {
            "width": 64 + i if kind == "image" else None,
            "height": 64 + i if kind == "image" else None,
            "duration_ms": 1000 * (1 + i % 5) if kind != "image" else None,
            "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
        }
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
