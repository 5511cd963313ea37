"""Real media kernels (dataops/media_codecs.py): PPM/BMP/WAV
decode-encode round trips, nearest-neighbor resize exactness, feature
determinism, and the decode=real multimodal path end-to-end on Spark.
"""

from __future__ import annotations

import numpy as np
import pytest

from vector_spark.dataops.media_codecs import (
    audio_features,
    decode_bmp24,
    decode_ppm,
    decode_wav_pcm16,
    encode_bmp24,
    encode_ppm,
    encode_wav_pcm16,
    image_features,
    resize_nearest,
)


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [xx * 255 // max(w - 1, 1), yy * 255 // max(h - 1, 1),
         np.full((h, w), 42)], axis=2
    ).astype(np.uint8)


def test_ppm_roundtrip_and_header_quirks():
    arr = _gradient(5, 7)
    assert np.array_equal(decode_ppm(encode_ppm(arr)), arr)
    # spec allows comments + arbitrary whitespace in the header
    quirky = b"P6\n# a comment\n7\t5\n# more\n255\n" + arr.tobytes()
    assert np.array_equal(decode_ppm(quirky), arr)
    with pytest.raises(ValueError):
        decode_ppm(b"P5\n1 1\n255\n\x00")


def test_bmp24_roundtrip_row_padding():
    # width 3 -> 9-byte rows padded to 12: the stride path must hold
    arr = _gradient(4, 3)
    assert np.array_equal(decode_bmp24(encode_bmp24(arr)), arr)
    arr2 = _gradient(2, 4)  # already aligned
    assert np.array_equal(decode_bmp24(encode_bmp24(arr2)), arr2)


def test_wav_pcm16_roundtrip_and_mono_mixdown():
    t = np.arange(800)
    samples = (9000 * np.sin(2 * np.pi * 440 * t / 8000)).astype(np.int16)
    out, rate = decode_wav_pcm16(encode_wav_pcm16(samples, 8000))
    assert rate == 8000 and np.array_equal(out, samples)


def test_resize_nearest_exact():
    arr = _gradient(4, 4)
    half = resize_nearest(arr, 2, 2)
    # index map: ys = [0,2], xs = [0,2]
    assert np.array_equal(half, arr[[0, 2]][:, [0, 2]])
    up = resize_nearest(arr, 8, 8)
    assert up.shape == (8, 8, 3)
    assert np.array_equal(up[::2, ::2], arr)  # each source pixel kept


def test_feature_vectors_deterministic():
    arr = _gradient(8, 8)
    f1, f2 = image_features(arr, 8), image_features(arr, 8)
    assert f1 == f2 and len(f1) == 8
    assert 0.0 <= f1[0] <= 1.0  # channel mean in range
    t = np.arange(1600)
    s = (8000 * np.sin(2 * np.pi * 330 * t / 16000)).astype(np.int16)
    a1, a2 = audio_features(s, 16000, 8), audio_features(s, 16000, 8)
    assert a1 == a2 and len(a1) == 8
    assert a1[0] == pytest.approx(8000 / 32768 / np.sqrt(2), rel=1e-2)  # RMS
    # a louder signal has larger RMS
    loud = audio_features((2 * s).astype(np.int16), 16000, 8)
    assert loud[0] > a1[0]


def test_spark_real_decode_end_to_end(spark):
    from vector_spark.dataops.multimodal import (
        extract_features,
        resize_images,
        synthetic_media,
    )

    media = synthetic_media(spark, 12, real_payloads=True).filter(
        "kind != 'video'"
    )
    feats = extract_features(media, decode="real").toPandas()
    assert len(feats) == 8  # 4 images + 4 audios of 12
    assert feats.feature.map(len).eq(8).all()
    # image features differ across different gradients
    img_feats = feats[feats.kind == "image"].feature.map(tuple)
    assert img_feats.nunique() > 1

    resized = resize_images(
        media.filter("kind = 'image'"), 4, 4, decode="real"
    ).collect()
    from vector_spark.dataops.media_codecs import decode_ppm as dec

    for r in resized:
        arr = dec(bytes(r["payload"]))
        assert arr.shape == (4, 4, 3)
        assert r["meta"]["width"] == 4 and r["meta"]["height"] == 4
        assert r["meta"]["mime"] == "image/x-portable-pixmap"


def test_spark_real_decode_unsupported_mime_raises(spark):
    from vector_spark.dataops.multimodal import extract_features, synthetic_media

    png_like = synthetic_media(spark, 3).filter("kind = 'image'")  # image/png
    with pytest.raises(Exception, match="NotImplementedError|decode"):
        extract_features(png_like, decode="real").collect()
