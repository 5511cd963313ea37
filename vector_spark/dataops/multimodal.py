"""Multimodal column plumbing — image/audio/video as opaque binary.

Policy: media payloads are `binary` columns with a typed metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas functions over `mapInPandas` so each partition
streams batches through Python once.

Decode tiers:
* `decode=real` — REAL kernels for the formats pure numpy/stdlib can
  handle (dataops/media_codecs.py): PPM / 24-bit BMP / baseline PNG
  images, WAV PCM16 audio, MP4 container parsing with raw-RGB24
  video decode; actual pixel/sample decode, nearest-neighbor resize,
  statistical/spectral feature vectors. Formats that genuinely need a
  codec library (JPEG pixels, compressed MP4 bitstreams — no
  PIL/ffmpeg in this container) raise NotImplementedError at the
  exact seam where the library would plug in.
* `decode=fake` — deterministic per-row features derived from the
  raw bytes; exercises the identical Spark-side plumbing (schema,
  batch shape, partitioning) without caring about payload format.
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


def _feature_from_digest(h: bytes, dim: int) -> list[float]:
    """sha256 digest (counter-extended past 8 dims) -> dim floats in
    [-1, 1]. One 32-byte digest covers 8 four-byte dims; larger dims
    chain sha256(digest || counter) so every dimension varies —
    silent constant -1.0 tails would poison downstream similarity."""
    while len(h) < 4 * dim:
        h += hashlib.sha256(h[-32:] + bytes([len(h) % 251])).digest()
    return [
        (int.from_bytes(h[4 * i : 4 * i + 4], "big") % 2000003) / 1000001.0 - 1.0
        for i in range(dim)
    ]


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a decoded-media embedding."""
    return _feature_from_digest(hashlib.sha256(payload).digest(), dim)


def _real_feature(payload: bytes, mime: str | None, dim: int) -> list[float]:
    """Dispatch to the numpy kernels by mime. Unlisted mimes (and
    compressed MP4 bitstreams inside decode_mp4_rawvideo) fail at
    this seam — the one place a codec library would plug in."""
    from vector_spark.dataops import media_codecs as mc

    if mime == "image/x-portable-pixmap":
        return mc.image_features(mc.decode_ppm(bytes(payload)), dim)
    if mime == "image/bmp":
        return mc.image_features(mc.decode_bmp24(bytes(payload)), dim)
    if mime == "image/png":
        arr = mc.decode_png(bytes(payload))
        if arr.shape[2] == 4:  # drop alpha for the RGB feature kernel
            arr = arr[:, :, :3]
        elif arr.shape[2] != 3:  # gray / gray+alpha -> replicate luma
            arr = np.repeat(arr[:, :, :1], 3, axis=2)
        return mc.image_features(arr, dim)
    if mime == "image/jpeg":
        arr = mc.decode_jpeg_baseline(bytes(payload))
        if arr.shape[2] == 1:
            arr = np.repeat(arr, 3, axis=2)
        return mc.image_features(arr, dim)
    if mime == "audio/wav":
        samples, rate = mc.decode_wav_pcm16(bytes(payload))
        return mc.audio_features(samples, rate, dim)
    if mime == "video/mp4":
        # container parsing is real (ISO BMFF sample tables); only
        # compressed bitstreams raise inside decode_mp4_rawvideo
        frames, _fps = mc.decode_mp4_rawvideo(bytes(payload))
        return mc.video_features(frames, dim)
    raise NotImplementedError(
        f"real decode for {mime!r} requires PIL/ffmpeg; plug the codec "
        "in here — batch plumbing is already correct"
    )


def extract_features(
    df: DataFrame, decode: str = "fake", batch_dim: int = 8
) -> DataFrame:
    """Media feature extraction over mapInPandas (per-partition Arrow
    batch iterator — the real production shape)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            if decode == "real":
                mimes = pdf["meta"].map(
                    lambda m: (m or {}).get("mime") if not isinstance(m, float) else None
                )
                feature = [
                    _real_feature(b, m, batch_dim)
                    for b, m in zip(payloads, mimes)
                ]
                content_hash = payloads.map(
                    lambda b: hashlib.sha256(b).hexdigest()
                )
            else:
                # hash each payload ONCE: feature and content_hash
                # both derive from the same digest
                digests = payloads.map(lambda b: hashlib.sha256(b).digest())
                feature = digests.map(
                    lambda h: _feature_from_digest(h, batch_dim)
                )
                content_hash = digests.map(lambda h: h.hex())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "content_hash": content_hash,
                    "feature": feature,
                }
            )

    return df.mapInPandas(run, FEATURES_SCHEMA)


def resize_images(
    df: DataFrame, width: int, height: int, decode: str = "fake"
) -> DataFrame:
    """Image resize over mapInPandas: same schema out, payload
    replaced by the resized encoding and meta.width/height updated.
    `real` mode decodes PPM/BMP pixels, nearest-neighbor-resamples
    with one numpy gather, and re-encodes as PPM; other image mimes
    fail at the seam. `fake` mode truncates/pads the payload to a
    deterministic size proportional to the target area — schema,
    batching, and metadata rewriting identical either way."""

    target_len_per_kb = max(1, (width * height) // 1024)

    def _real_resize(payload: bytes, mime: str | None) -> tuple[bytes, str]:
        from vector_spark.dataops import media_codecs as mc

        if mime == "image/x-portable-pixmap":
            arr = mc.decode_ppm(bytes(payload))
        elif mime == "image/bmp":
            arr = mc.decode_bmp24(bytes(payload))
        elif mime == "image/png":
            # PNG round-trips as PNG (alpha/grayscale preserved)
            arr = mc.decode_png(bytes(payload))
            return mc.encode_png(
                mc.resize_nearest(arr, width, height)
            ), "image/png"
        elif mime == "image/jpeg":
            arr = mc.decode_jpeg_baseline(bytes(payload))
            if arr.shape[2] == 1:
                arr = np.repeat(arr, 3, axis=2)
            return mc.encode_jpeg_baseline(
                mc.resize_nearest(arr, width, height)
            ), "image/jpeg"
        else:
            raise NotImplementedError(
                f"real resize for {mime!r} requires PIL; plug the codec "
                "in here — batch plumbing is already correct"
            )
        return mc.encode_ppm(mc.resize_nearest(arr, width, height)), \
            "image/x-portable-pixmap"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mask = pdf["kind"] == "image"
            out = pdf.copy()
            if decode == "real":
                for i in out.index[mask]:
                    meta = out.at[i, "meta"] or {}
                    payload, mime = _real_resize(
                        out.at[i, "payload"], meta.get("mime")
                    )
                    out.at[i, "payload"] = payload
                    out.at[i, "meta"] = {
                        **meta, "width": width, "height": height, "mime": mime,
                    }
            else:
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


def frame_sample_container(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling from the REAL container: parse each MP4's
    sample tables (ISO BMFF stts/stsc/stsz/stco) and emit one row per
    kept sample with its true timestamp and byte range — the shape a
    downstream bitstream decoder consumes. Arrow-batched mapInPandas;
    no bitstream decode happens here, so this works for compressed
    codecs too."""
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_ts_ms", T.LongType()),
        T.StructField("byte_offset", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("codec", T.StringType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from vector_spark.dataops import media_codecs as mc

        for pdf in batches:
            rows = []
            for mid, payload, kind in zip(
                pdf["media_id"], pdf["payload"], pdf["kind"]
            ):
                if kind != "video":
                    continue
                meta = mc.parse_mp4(bytes(payload))
                vids = [
                    t for t in meta["tracks"] if t["handler"] == "vide"
                ]
                if not vids:
                    continue
                t = vids[0]
                next_keep = 0
                for s in t["samples"]:
                    if s["ts_ms"] is None or s["ts_ms"] < next_keep:
                        continue
                    rows.append((
                        mid, s["ts_ms"], s["offset"], s["size"],
                        t["codec"],
                    ))
                    # anchor the next threshold to the KEPT sample's
                    # timestamp, not a free-running grid: after a gap
                    # in the sample timeline a grid-advanced threshold
                    # lags behind ts and every subsequent sample gets
                    # kept (denser than every_ms)
                    next_keep = s["ts_ms"] + every_ms
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "frame_ts_ms", "byte_offset",
                    "n_bytes", "codec",
                ],
            )

    return df.mapInPandas(run, out_schema)


PROBE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("format", T.StringType()),      # sniffed container
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_samples", T.LongType()),     # frames / pcm samples
    T.StructField("codec", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("probe_error", T.StringType()),
])


def probe_media(df: DataFrame) -> DataFrame:
    """Container-metadata extraction from the PAYLOAD bytes (not the
    caller's meta struct): sniff the format from magic bytes, then
    parse the container's own headers — the step a real ingestion
    pipeline runs before routing media. Arrow-batched mapInPandas;
    a malformed payload yields a probe_error row, never a task
    failure (poison-pill discipline: one bad file must not kill a
    100 TB scan)."""

    def probe_one(payload: bytes) -> dict:
        from vector_spark.dataops import media_codecs as mc

        out: dict = {
            "format": None, "width": None, "height": None,
            "duration_ms": None, "sample_rate": None,
            "n_samples": None, "codec": None, "probe_error": None,
        }
        b = bytes(payload)
        try:
            if b.startswith(b"\x89PNG"):
                arr = mc.decode_png(b)
                out.update(format="png", codec="png",
                           width=arr.shape[1], height=arr.shape[0])
            elif b.startswith(b"\xff\xd8"):
                arr = mc.decode_jpeg_baseline(b)
                mode = (
                    "progressive"
                    if mc.jpeg_is_progressive(b)
                    else "baseline"
                )
                out.update(format="jpeg", codec=f"jpeg-{mode}",
                           width=arr.shape[1], height=arr.shape[0])
            elif b.startswith(b"P6"):
                arr = mc.decode_ppm(b)
                out.update(format="ppm", codec="rgb24",
                           width=arr.shape[1], height=arr.shape[0])
            elif b.startswith(b"BM"):
                arr = mc.decode_bmp24(b)
                out.update(format="bmp", codec="rgb24",
                           width=arr.shape[1], height=arr.shape[0])
            elif b.startswith(b"RIFF") and b[8:12] == b"WAVE":
                samples, rate = mc.decode_wav_pcm16(b)
                out.update(
                    format="wav", codec=mc.wav_info(b)["codec"],
                    sample_rate=rate, n_samples=len(samples),
                    duration_ms=len(samples) * 1000 // max(rate, 1),
                )
            elif len(b) > 12 and b[4:8] == b"ftyp":
                meta = mc.parse_mp4(b)
                out.update(format="mp4", duration_ms=meta["duration_ms"])
                vids = [
                    t for t in meta["tracks"] if t["handler"] == "vide"
                ]
                if vids:
                    t = vids[0]
                    out.update(
                        codec=(t["codec"] or "").strip() or None,
                        width=t["width"], height=t["height"],
                        n_samples=t["sample_count"],
                    )
            else:
                out["probe_error"] = "unknown format"
        except Exception as e:  # malformed payload -> error row
            out["probe_error"] = f"{type(e).__name__}: {e}"[:200]
        return out

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            probed = [probe_one(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"].values,
                "kind": pdf["kind"].values,
                "format": [r["format"] for r in probed],
                "width": pd.array(
                    [r["width"] for r in probed], dtype="Int32"
                ),
                "height": pd.array(
                    [r["height"] for r in probed], dtype="Int32"
                ),
                "duration_ms": pd.array(
                    [r["duration_ms"] for r in probed], dtype="Int64"
                ),
                "sample_rate": pd.array(
                    [r["sample_rate"] for r in probed], dtype="Int32"
                ),
                "n_samples": pd.array(
                    [r["n_samples"] for r in probed], dtype="Int64"
                ),
                "codec": [r["codec"] for r in probed],
                "n_bytes": pdf["payload"].map(len).astype("int64").values,
                "probe_error": [r["probe_error"] for r in probed],
            })

    return df.mapInPandas(run, PROBE_SCHEMA)


def synthetic_media(spark, n: int = 64, real_payloads: bool = False) -> DataFrame:
    """Deterministic media table for tests. With real_payloads=True
    the images are actual PPM/PNG gradients, the audio actual WAV
    sine tones, and the video actual raw-RGB24 MP4 containers — all
    decodable by the `decode=real` kernels."""
    rows = []
    for i in range(n):
        dur_override = None
        kind = ["image", "audio", "video"][i % 3]
        if real_payloads and kind == "image":
            import numpy as np

            from vector_spark.dataops.media_codecs import encode_png, encode_ppm

            w = h = 8 + (i % 3) * 4
            yy, xx = np.mgrid[0:h, 0:w]
            arr = np.stack(
                [(xx * 255 // max(w - 1, 1)),
                 (yy * 255 // max(h - 1, 1)),
                 np.full((h, w), i % 256)], axis=2
            ).astype(np.uint8)
            # rotate real formats: PNG, PPM, baseline JPEG,
            # progressive JPEG (image rows land on i % 3 == 0, so
            # rotate on i // 3)
            fmt = (i // 3) % 4
            if fmt == 0:
                payload, mime = encode_png(arr), "image/png"
            elif fmt == 1:
                payload, mime = encode_ppm(arr), "image/x-portable-pixmap"
            else:
                from vector_spark.dataops.media_codecs import (
                    encode_jpeg_baseline,
                    encode_jpeg_progressive,
                )

                enc = (
                    encode_jpeg_baseline if fmt == 2
                    else encode_jpeg_progressive
                )
                payload = enc(arr, quality=92)
                mime = "image/jpeg"
            width, height = w, h
        elif real_payloads and kind == "audio":
            import numpy as np

            from vector_spark.dataops.media_codecs import encode_wav

            rate = 8000
            t = np.arange(rate // 10)  # 100 ms
            freq = 220.0 * (1 + i % 8)
            samples = (10000 * np.sin(2 * np.pi * freq * t / rate)).astype(
                np.int16
            )
            # rotate real-world sample encodings (audio rows land on
            # i % 3 == 1, so rotate on i // 3)
            fmt = ["pcm16", "pcm8", "pcm24", "float32"][(i // 3) % 4]
            payload = encode_wav(samples, rate, fmt)
            mime, width, height = "audio/wav", None, None
        elif real_payloads and kind == "video":
            import numpy as np

            from vector_spark.dataops.media_codecs import encode_mp4_rawvideo

            w = h = 8
            n_frames = 2 + i % 4
            yy, xx = np.mgrid[0:h, 0:w]
            frames = np.stack([
                np.stack(
                    [(xx * 255 // (w - 1)), (yy * 255 // (h - 1)),
                     np.full((h, w), (i + f * 16) % 256)], axis=2
                ).astype(np.uint8)
                for f in range(n_frames)
            ])
            payload = encode_mp4_rawvideo(frames, fps=2)
            mime, width, height = "video/mp4", w, h
            dur_override = n_frames * 500  # matches the container
        else:
            payload = (f"media-{i}-" + "x" * (i % 17)).encode()
            mime = {"image": "image/png", "audio": "audio/wav",
                    "video": "video/mp4"}[kind]
            width = height = (64 + i) if kind == "image" else None
        meta = {
            "width": width,
            "height": height,
            "duration_ms": dur_override or (
                1000 * (1 + i % 5) if kind != "image" else None
            ),
            "mime": mime,
        }
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
