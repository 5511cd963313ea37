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


def test_wav_real_world_encodings_roundtrip():
    import pytest

    from vector_spark.dataops.media_codecs import encode_wav, wav_info

    t = np.arange(800)
    s16 = (10000 * np.sin(2 * np.pi * 440 * t / 8000)).astype(np.int16)
    # widths >= 16 bits reconstruct int16 exactly; 8-bit loses the
    # low byte (quantization step 258 after the round-trip scaling)
    for fmt, codec, tol in [
        ("pcm16", "pcm_s16le", 0), ("pcm24", "pcm_s24le", 0),
        ("pcm32", "pcm_s32le", 0), ("float32", "pcm_f32le", 0),
        ("float64", "pcm_f64le", 0), ("pcm8", "pcm_u8", 258),
    ]:
        buf = encode_wav(s16, 8000, fmt)
        info = wav_info(buf)
        assert (info["codec"], info["sample_rate"], info["n_frames"]) == (
            codec, 8000, 800
        ), fmt
        out, rate = decode_wav_pcm16(buf)
        assert rate == 8000 and len(out) == 800
        err = np.abs(out.astype(int) - s16.astype(int)).max()
        assert err <= tol, (fmt, err)
    with pytest.raises(ValueError, match="unknown WAV encoding"):
        encode_wav(s16, 8000, "mp3")


def test_wav_extensible_and_stereo_and_compressed_seam():
    import struct

    import pytest

    from vector_spark.dataops.media_codecs import wav_info

    t = np.arange(800)
    s16 = (10000 * np.sin(2 * np.pi * 440 * t / 8000)).astype(np.int16)

    def riff(fmt_body: bytes, data: bytes) -> bytes:
        chunks = (
            b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
            + b"data" + struct.pack("<I", len(data)) + data
        )
        return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks

    # WAVE_FORMAT_EXTENSIBLE wrapping plain PCM16: SubFormat tag wins
    ext = (
        struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 16000, 2, 16)
        + struct.pack("<HHI", 22, 16, 1)
        + struct.pack("<H", 1) + b"\x00" * 14
    )
    buf = riff(ext, s16.astype("<i2").tobytes())
    out, rate = decode_wav_pcm16(buf)
    assert np.array_equal(out, s16) and wav_info(buf)["codec"] == "pcm_s16le"

    # stereo float32 with opposite-phase channels mixes down to ~0
    st = np.stack([s16 / 32768.0, -(s16 / 32768.0)], axis=1).astype("<f4")
    buf = riff(struct.pack("<HHIIHH", 3, 2, 8000, 64000, 8, 32), st.tobytes())
    out, _ = decode_wav_pcm16(buf)
    assert len(out) == 800 and np.abs(out).max() <= 1

    # compressed formats are the honest seam (ADPCM tag 2)
    buf = riff(struct.pack("<HHIIHH", 2, 1, 8000, 4000, 1, 4), b"\x00" * 64)
    with pytest.raises(NotImplementedError, match="format tag 2"):
        decode_wav_pcm16(buf)


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


def test_png_roundtrip_gray_rgb_rgba():
    from vector_spark.dataops.media_codecs import decode_png, encode_png

    rgb = _gradient(6, 9)
    assert np.array_equal(decode_png(encode_png(rgb)), rgb)
    rgba = np.dstack([rgb, np.arange(54).reshape(6, 9).astype(np.uint8)])
    assert np.array_equal(decode_png(encode_png(rgba)), rgba)
    gray = rgb[:, :, 0]
    out = decode_png(encode_png(gray))
    assert out.shape == (6, 9, 1)
    assert np.array_equal(out[:, :, 0], gray)


def test_png_all_five_filters_unfilter_exactly():
    """Hand-FORWARD-filter scanlines with each of the five PNG filter
    types and assert the decoder inverts them byte-exactly — this is
    the part a round-trip through our filter-0 encoder can't cover."""
    import struct
    import zlib

    from vector_spark.dataops.media_codecs import decode_png

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(5, 7, 3), dtype=np.uint8)
    h, w, bpp = img.shape
    body = img.reshape(h, w * bpp).astype(np.int32)
    raw = bytearray()
    prev = np.zeros(w * bpp, dtype=np.int32)
    for y in range(h):
        ftype = y % 5
        line = body[y]
        left = np.concatenate([np.zeros(bpp, np.int32), line[:-bpp]])
        up = prev
        upleft = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
        if ftype == 0:
            filt = line
        elif ftype == 1:
            filt = line - left
        elif ftype == 2:
            filt = line - up
        elif ftype == 3:
            filt = line - (left + up) // 2
        else:  # Paeth
            p = left + up - upleft
            pa, pb, pc = abs(p - left), abs(p - up), abs(p - upleft)
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, up, upleft))
            filt = line - pred
        raw += bytes([ftype]) + (filt % 256).astype(np.uint8).tobytes()
        prev = line

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    buf = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(bytes(raw)))
           + chunk(b"IEND", b""))
    assert np.array_equal(decode_png(buf), img)


def test_png_unsupported_features_raise():
    import struct
    import zlib

    from vector_spark.dataops.media_codecs import decode_png, encode_png

    with pytest.raises(ValueError, match="signature"):
        decode_png(b"not a png at all")

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    bogus_ctype = (b"\x89PNG\r\n\x1a\n"
                   + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 7, 0, 0, 0)))
    with pytest.raises(ValueError, match="color type"):
        decode_png(bogus_ctype)
    # palette stream without a PLTE chunk is malformed
    no_plte = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(b"\x00\x00")))
    with pytest.raises(ValueError, match="PLTE"):
        decode_png(no_plte)
    # corrupt: truncated scanline data
    good = encode_png(_gradient(3, 3))
    sixteen = good.replace(
        chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 3, 8, 2, 0, 0, 0)),
        chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 3, 16, 2, 0, 0, 0)),
    )
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(sixteen)


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
    from vector_spark.dataops.media_codecs import (
        decode_jpeg_baseline,
        decode_png,
        decode_ppm,
    )

    decoders = {
        "image/png": decode_png,  # PNG round-trips as PNG
        "image/x-portable-pixmap": decode_ppm,
        "image/jpeg": decode_jpeg_baseline,  # JPEG round-trips as JPEG
    }
    mimes = set()
    for r in resized:
        mimes.add(r["meta"]["mime"])
        arr = decoders[r["meta"]["mime"]](bytes(r["payload"]))
        assert arr.shape == (4, 4, 3)
        assert r["meta"]["width"] == 4 and r["meta"]["height"] == 4
    # synthetic real payloads rotate PNG / PPM / JPEG — all three ran
    assert mimes == set(decoders)


def test_spark_real_decode_unsupported_mime_raises(spark):
    from vector_spark.dataops.multimodal import extract_features, synthetic_media

    # corrupt payloads with a video/mp4 mime: the real container
    # parser must reject them (the fake tier stays payload-agnostic)
    mp4_like = synthetic_media(spark, 3).filter("kind = 'video'")
    with pytest.raises(Exception, match="malformed|decode"):
        extract_features(mp4_like, decode="real").collect()


# ---- MP4 / ISO BMFF container (ISO/IEC 14496-12) ----


def test_mp4_rawvideo_roundtrip():
    import numpy as np

    from vector_spark.dataops.media_codecs import (
        decode_mp4_rawvideo,
        encode_mp4_rawvideo,
        parse_mp4,
    )

    rng = np.random.default_rng(11)
    frames = rng.integers(0, 256, (6, 5, 7, 3), dtype=np.uint8)
    buf = encode_mp4_rawvideo(frames, fps=3)
    dec, fps = decode_mp4_rawvideo(buf)
    assert (dec == frames).all()
    assert fps == 3
    meta = parse_mp4(buf)
    assert meta["brand"] == "isom"
    assert meta["duration_ms"] == 2000  # 6 frames @ 3 fps
    (t,) = meta["tracks"]
    assert t["handler"] == "vide" and t["codec"] == "raw "
    assert (t["width"], t["height"]) == (7, 5)
    assert t["sample_count"] == 6
    # sample table: contiguous byte ranges inside mdat, 1/fps spacing
    sizes = {s["size"] for s in t["samples"]}
    assert sizes == {5 * 7 * 3}
    offs = [s["offset"] for s in t["samples"]]
    assert offs == sorted(offs)
    assert [s["ts_ms"] for s in t["samples"]] == [
        0, 333, 666, 1000, 1333, 1666
    ]


def test_mp4_compressed_codec_is_honest_seam():
    import numpy as np
    import pytest

    from vector_spark.dataops.media_codecs import (
        decode_mp4_rawvideo,
        encode_mp4_rawvideo,
        parse_mp4,
    )

    frames = np.zeros((2, 4, 4, 3), dtype=np.uint8)
    buf = bytearray(encode_mp4_rawvideo(frames, fps=2))
    # flip the stsd fourcc to avc1: container still parses, but the
    # bitstream decode must raise at the marked seam
    idx = bytes(buf).find(b"raw ", bytes(buf).find(b"stsd"))
    buf[idx : idx + 4] = b"avc1"
    meta = parse_mp4(bytes(buf))
    assert meta["tracks"][0]["codec"] == "avc1"
    assert meta["tracks"][0]["sample_count"] == 2  # sample map intact
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        decode_mp4_rawvideo(bytes(buf))


def test_mp4_video_features_deterministic():
    import numpy as np

    from vector_spark.dataops.media_codecs import video_features

    rng = np.random.default_rng(5)
    frames = rng.integers(0, 256, (4, 8, 8, 3), dtype=np.uint8)
    f1 = video_features(frames)
    f2 = video_features(frames.copy())
    assert f1 == f2 and len(f1) == 8
    # temporal-difference energy occupies the last slot
    static = video_features(np.repeat(frames[:1], 4, axis=0))
    assert static[-1] == 0.0


def test_mp4_multichunk_sample_expansion():
    """stsc chunk-run expansion with uneven chunks and co64 offsets."""
    import struct

    from vector_spark.dataops.media_codecs import parse_mp4

    def box(tag, payload):
        return struct.pack(">I", 8 + len(payload)) + tag + payload

    def full(tag, payload):
        return box(tag, b"\x00\x00\x00\x00" + payload)

    # 5 samples: chunk1 has 2, chunks 2..3 have at most 2 then 1
    stts = full(b"stts", struct.pack(">III", 1, 5, 10))
    stsc = full(
        b"stsc",
        struct.pack(">I", 2)
        + struct.pack(">III", 1, 2, 1)
        + struct.pack(">III", 2, 2, 1),
    )
    stsz = full(
        b"stsz",
        struct.pack(">II", 0, 5) + struct.pack(">5I", 10, 20, 30, 40, 50),
    )
    co64 = full(
        b"co64", struct.pack(">I", 3) + struct.pack(">3Q", 100, 200, 300)
    )
    mdhd = full(
        b"mdhd", struct.pack(">IIIIHH", 0, 0, 1000, 50, 0x55C4, 0)
    )
    hdlr = full(b"hdlr", struct.pack(">I", 0) + b"vide" + b"\x00" * 13)
    stbl = box(b"stbl", stts + stsc + stsz + co64)
    mdia = box(b"mdia", mdhd + hdlr + box(b"minf", stbl))
    moov = box(b"moov", box(b"trak", mdia))
    meta = parse_mp4(moov)
    (t,) = meta["tracks"]
    got = [(s["offset"], s["size"], s["ts_ms"]) for s in t["samples"]]
    assert got == [
        (100, 10, 0), (110, 20, 10),   # chunk 1 @100
        (200, 30, 20), (230, 40, 30),  # chunk 2 @200
        (300, 50, 40),                 # chunk 3 @300
    ]


# ---- JPEG (baseline sequential DCT, ITU-T T.81) ----


def _jpeg_gradient(h, w):
    import numpy as np

    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [xx * 255 // max(w - 1, 1), yy * 255 // max(h - 1, 1),
         ((xx + yy) * 255 // max(w + h - 2, 1))], axis=2
    ).astype(np.uint8)


def test_jpeg_roundtrip_444_lossy_bounded():
    import numpy as np

    from vector_spark.dataops.media_codecs import (
        decode_jpeg_baseline,
        encode_jpeg_baseline,
    )

    arr = _jpeg_gradient(24, 40)
    buf = encode_jpeg_baseline(arr, quality=95)
    assert buf[:2] == b"\xff\xd8" and buf[-2:] == b"\xff\xd9"
    dec = decode_jpeg_baseline(buf)
    assert dec.shape == arr.shape
    err = np.abs(dec.astype(int) - arr.astype(int))
    assert err.max() <= 8, err.max()  # smooth content at q95


def test_jpeg_roundtrip_420_subsampled():
    import numpy as np

    from vector_spark.dataops.media_codecs import (
        decode_jpeg_baseline,
        encode_jpeg_baseline,
    )

    # dims NOT multiples of 16: exercises MCU padding + crop
    arr = _jpeg_gradient(21, 35)
    buf = encode_jpeg_baseline(arr, quality=95, subsample=True)
    dec = decode_jpeg_baseline(buf)
    assert dec.shape == arr.shape
    err = np.abs(dec.astype(int) - arr.astype(int))
    assert err.mean() < 6, err.mean()  # chroma decimation is lossier


def test_jpeg_restart_markers_do_not_change_pixels():
    import numpy as np

    from vector_spark.dataops.media_codecs import (
        decode_jpeg_baseline,
        encode_jpeg_baseline,
    )

    arr = _jpeg_gradient(40, 56)
    base = decode_jpeg_baseline(encode_jpeg_baseline(arr, 92))
    for ri in (1, 3):
        buf = encode_jpeg_baseline(arr, 92, restart_interval=ri)
        assert b"\xff\xdd" in buf  # DRI present
        assert (decode_jpeg_baseline(buf) == base).all()


def test_jpeg_flat_image_near_exact():
    import numpy as np

    from vector_spark.dataops.media_codecs import (
        decode_jpeg_baseline,
        encode_jpeg_baseline,
    )

    flat = np.full((16, 16, 3), 130, np.uint8)
    dec = decode_jpeg_baseline(encode_jpeg_baseline(flat, 90))
    assert np.abs(dec.astype(int) - 130).max() <= 1


def test_jpeg_quality_trades_size_for_error():
    import numpy as np

    from vector_spark.dataops.media_codecs import (
        decode_jpeg_baseline,
        encode_jpeg_baseline,
    )

    rng = np.random.default_rng(9)
    arr = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    hi = encode_jpeg_baseline(arr, quality=95)
    lo = encode_jpeg_baseline(arr, quality=20)
    assert len(lo) < len(hi)
    err_hi = np.abs(decode_jpeg_baseline(hi).astype(int) - arr).mean()
    err_lo = np.abs(decode_jpeg_baseline(lo).astype(int) - arr).mean()
    assert err_hi < err_lo


def test_jpeg_progressive_matches_baseline_decode_exactly():
    import numpy as np

    from vector_spark.dataops.media_codecs import (
        decode_jpeg_baseline,
        encode_jpeg_baseline,
        encode_jpeg_progressive,
    )

    # same quantized coefficients -> progressive decode must be
    # byte-identical to baseline decode, not merely close
    for q in (95, 50):
        arr = _jpeg_gradient(24, 40)
        prog = encode_jpeg_progressive(arr, quality=q)
        assert b"\xff\xc2" in prog  # SOF2
        assert prog.count(b"\xff\xda") == 10  # the 10-scan script
        base = decode_jpeg_baseline(encode_jpeg_baseline(arr, quality=q))
        got = decode_jpeg_baseline(prog)
        assert got.shape == base.shape
        assert (got == base).all()


def test_jpeg_progressive_420_odd_dims():
    import numpy as np

    from vector_spark.dataops.media_codecs import (
        decode_jpeg_baseline,
        encode_jpeg_baseline,
        encode_jpeg_progressive,
    )

    # non-multiple-of-16 dims: interleaved DC covers MCU padding,
    # non-interleaved AC scans skip it; crop must hide the difference
    arr = _jpeg_gradient(21, 35)
    base = decode_jpeg_baseline(
        encode_jpeg_baseline(arr, quality=90, subsample=True)
    )
    got = decode_jpeg_baseline(
        encode_jpeg_progressive(arr, quality=90, subsample=True)
    )
    assert (got == base).all()


def test_jpeg_progressive_eob_runs_and_noise():
    import numpy as np

    from vector_spark.dataops.media_codecs import (
        decode_jpeg_baseline,
        encode_jpeg_baseline,
        encode_jpeg_progressive,
    )

    # flat-with-speckles maximises cross-block EOB runs with buffered
    # correction bits; dense noise maximises ZRL + refinement symbols
    flat = np.full((48, 64, 3), 120, np.uint8)
    flat[5, 7] = (250, 10, 10)
    flat[40, 60] = (0, 255, 0)
    rng = np.random.default_rng(17)
    noise = rng.integers(0, 256, (32, 40, 3), dtype=np.uint8)
    for arr in (flat, noise):
        for q in (90, 25):
            base = decode_jpeg_baseline(encode_jpeg_baseline(arr, quality=q))
            got = decode_jpeg_baseline(encode_jpeg_progressive(arr, quality=q))
            assert (got == base).all(), (arr.shape, q)


def test_jpeg_progressive_bad_scan_script_rejected():
    import pytest

    from vector_spark.dataops.media_codecs import (
        decode_jpeg_baseline,
        encode_jpeg_baseline,
    )

    # SOF0 flipped to SOF2 leaves a baseline scan header (Ss=0,
    # Se=63), which is malformed for progressive: DC scans are Se=0
    buf = bytearray(encode_jpeg_baseline(_jpeg_gradient(16, 16), 90))
    idx = bytes(buf).find(b"\xff\xc0")
    buf[idx + 1] = 0xC2
    with pytest.raises(ValueError, match="Se=0"):
        decode_jpeg_baseline(bytes(buf))


def test_jpeg_not_a_jpeg_rejected():
    import pytest

    from vector_spark.dataops.media_codecs import decode_jpeg_baseline

    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_baseline(b"\x89PNG\r\n\x1a\n")


def test_png_palette_decode_with_trns():
    import struct
    import zlib

    from vector_spark.dataops.media_codecs import decode_png

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    # 3x2 palette image: indices pick red/green/blue
    pal = bytes([255, 0, 0,  0, 255, 0,  0, 0, 255])
    idx = np.array([[0, 1, 2], [2, 1, 0]], np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
    buf = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0))
           + chunk(b"PLTE", pal)
           + chunk(b"IDAT", zlib.compress(raw))
           + chunk(b"IEND", b""))
    out = decode_png(buf)
    assert out.shape == (2, 3, 3)
    assert tuple(out[0, 0]) == (255, 0, 0)
    assert tuple(out[1, 0]) == (0, 0, 255)
    # tRNS adds per-palette-entry alpha (shorter than the palette:
    # missing entries default to opaque)
    buf_a = (b"\x89PNG\r\n\x1a\n"
             + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0))
             + chunk(b"PLTE", pal)
             + chunk(b"tRNS", bytes([128, 0]))
             + chunk(b"IDAT", zlib.compress(raw))
             + chunk(b"IEND", b""))
    out_a = decode_png(buf_a)
    assert out_a.shape == (2, 3, 4)
    assert out_a[0, 0, 3] == 128 and out_a[0, 1, 3] == 0
    assert out_a[0, 2, 3] == 255  # beyond tRNS -> opaque


def test_png_adam7_interlaced_decode():
    import struct
    import zlib

    from vector_spark.dataops.media_codecs import _ADAM7, decode_png

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    rng = np.random.RandomState(3)
    for (h, w) in ((9, 11), (8, 8), (3, 5), (1, 1), (2, 10)):
        img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        # forward Adam7 interlacer: emit each pass as filter-0 lines
        raw = bytearray()
        for x0, y0, xs, ys in _ADAM7:
            sub = img[y0::ys, x0::xs]
            ph, pw = sub.shape[:2]
            if ph == 0 or pw == 0:
                continue
            for y in range(ph):
                raw += b"\x00" + sub[y].tobytes()
        buf = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1))
               + chunk(b"IDAT", zlib.compress(bytes(raw)))
               + chunk(b"IEND", b""))
        assert np.array_equal(decode_png(buf), img), (h, w)


def test_jpeg_is_progressive_marker_walk():
    import numpy as np

    from vector_spark.dataops.media_codecs import (
        encode_jpeg_baseline,
        encode_jpeg_progressive,
        jpeg_is_progressive,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
    base = encode_jpeg_baseline(img)
    prog = encode_jpeg_progressive(img)
    assert not jpeg_is_progressive(base)
    assert jpeg_is_progressive(prog)
    # adversarial: a COM segment whose payload contains the raw pair
    # ff c2 must NOT flip a baseline stream to progressive (a
    # substring scan would)
    com = b"\xff\xfe" + (2 + 2).to_bytes(2, "big") + b"\xff\xc2"
    salted = base[:2] + com + base[2:]
    assert not jpeg_is_progressive(salted)
