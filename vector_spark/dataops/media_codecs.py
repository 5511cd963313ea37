"""Pure-python/numpy media kernels for the multimodal pipeline.

No PIL/ffmpeg exists in this environment, but several real media
formats need nothing beyond numpy and the stdlib:

* PPM (P6)           — header + raw RGB24 rows (image decode/encode)
* BMP (24-bit, BI_RGB) — fixed 54-byte header, bottom-up padded rows
* PNG (8-bit, gray/RGB/RGBA/palette+tRNS, non-interlaced AND
  Adam7) — stdlib zlib inflate + per-scanline unfiltering (all five
  filters), zlib/CRC32 encode
* JPEG (T.81: baseline SOF0 + progressive SOF2) — canonical Huffman
  entropy layer, einsum 8x8 DCT, JFIF YCbCr, 4:4:4 / 4:2:0, restart
  markers, spectral-selection/successive-approximation scan scripts
* WAV — RIFF chunk parser; PCM 8/16/24/32-bit, IEEE float32/64,
  WAVE_FORMAT_EXTENSIBLE; everything normalizes to mono int16
* MP4 (ISO BMFF container) — box framing, movie/track headers, full
  sample tables; 'raw ' RGB24 tracks decode end-to-end

plus real kernels over the decoded arrays: nearest-neighbor resize
(numpy index sampling — no per-pixel Python), image feature vectors
(per-channel statistics + coarse luminance grid), audio feature
vectors (RMS / zero-crossing rate / FFT band energies), and video
features (mean-frame stats + temporal-difference energy). These are
the `decode=real` path of dataops/multimodal.py; what genuinely
needs a codec library (progressive JPEG, compressed MP4 bitstreams
like avc1/hev1) still fails at the marked seam.

Everything here is deterministic: the same payload always yields the
same features, so results are testable byte-for-byte.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# PPM (P6)
# ---------------------------------------------------------------------------


def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary PPM (P6, maxval 255)."""
    h, w, c = arr.shape
    if c != 3:
        raise ValueError("PPM requires 3 channels")
    return f"P6\n{w} {h}\n255\n".encode("ascii") + arr.astype(np.uint8).tobytes()


def decode_ppm(buf: bytes) -> np.ndarray:
    """Binary PPM (P6) -> (h, w, 3) uint8. Handles comment lines and
    arbitrary whitespace in the header, per the netpbm spec."""
    if not buf.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(buf) and buf[pos : pos + 1].isspace():
            pos += 1
        if buf[pos : pos + 1] == b"#":
            while pos < len(buf) and buf[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(buf[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    data = np.frombuffer(buf, dtype=np.uint8, count=w * h * 3, offset=pos)
    return data.reshape(h, w, 3).copy()


# ---------------------------------------------------------------------------
# BMP (24-bit uncompressed)
# ---------------------------------------------------------------------------


def decode_bmp24(buf: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP -> (h, w, 3) uint8 RGB. BMP stores
    BGR bottom-up with rows padded to 4 bytes."""
    if buf[:2] != b"BM":
        raise ValueError("not a BMP")
    data_offset = struct.unpack_from("<I", buf, 10)[0]
    w = struct.unpack_from("<i", buf, 18)[0]
    h = struct.unpack_from("<i", buf, 22)[0]
    bpp = struct.unpack_from("<H", buf, 28)[0]
    compression = struct.unpack_from("<I", buf, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        buf, dtype=np.uint8, count=stride * h, offset=data_offset
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]  # BGR -> RGB
    return (rgb[::-1] if flip else rgb).copy()


def encode_bmp24(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> uncompressed 24-bit BMP."""
    h, w, _c = arr.shape
    stride = (w * 3 + 3) & ~3
    img_size = stride * h
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + img_size, 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    return header + body.tobytes()


# ---------------------------------------------------------------------------
# PNG (8-bit, incl. palette and Adam7) — stdlib zlib + struct, no PIL
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 array -> PNG bytes. (h, w) grayscale, (h, w, 3) RGB or
    (h, w, 4) RGBA; 8-bit, non-interlaced, filter 0 scanlines."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    body = arr.astype(np.uint8).reshape(h, w * c)
    raw = b"".join(b"\x00" + body[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


# Adam7 pass grid: (x_start, y_start, x_step, y_step) per pass
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def decode_png(buf: bytes) -> np.ndarray:
    """Baseline PNG -> (h, w, channels) uint8 (grayscale decodes to
    (h, w, 1)). Supports the common web baseline at bit depth 8:
    color types 0 (gray), 2 (RGB), 3 (palette, incl. tRNS alpha),
    4 (gray+alpha), 6 (RGBA); all five scanline filters
    (None/Sub/Up/Average/Paeth); both non-interlaced and Adam7
    interlaced layouts. 16-bit stays out of scope — it raises with
    the feature named."""
    if not buf.startswith(_PNG_SIG):
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idats = len(_PNG_SIG), None, []
    plte, trns = None, None
    while pos + 8 <= len(buf):
        (length,) = struct.unpack_from(">I", buf, pos)
        tag = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + data + crc
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = np.frombuffer(data, np.uint8)
        elif tag == b"IDAT":
            idats.append(data)
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"unsupported PNG bit depth {depth} (only 8)")
    if comp or filt:
        raise ValueError("unsupported PNG compression/filter method")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {ctype}")
    raw = zlib.decompress(b"".join(idats))
    if interlace == 1:
        # Adam7: seven independently-filtered sub-images scattered
        # onto the pixel grid
        out2d = np.zeros((h, w * channels), dtype=np.uint8)
        off = 0
        for x0, y0, xs, ys in _ADAM7:
            pw = max(0, -(-(w - x0) // xs))
            ph = max(0, -(-(h - y0) // ys))
            if pw == 0 or ph == 0:
                continue
            span = ph * (pw * channels + 1)
            sub = _png_unfilter(raw[off : off + span], pw, ph, channels)
            off += span
            cols = np.arange(x0, w, xs)
            sub3 = sub.reshape(ph, pw, channels)
            rows = np.arange(y0, h, ys)
            grid = out2d.reshape(h, w, channels)
            grid[np.ix_(rows, cols)] = sub3
        out = out2d
    elif interlace == 0:
        out = _png_unfilter(raw, w, h, channels)
    else:
        raise ValueError(f"bad PNG interlace method {interlace}")
    img = out.reshape(h, w, channels)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        idx = img[:, :, 0]
        rgb = plte[idx]
        if trns is not None:
            alpha = np.full(256, 255, np.uint8)
            alpha[: len(trns)] = trns
            return np.dstack([rgb, alpha[idx]])
        return rgb
    return img


def _png_unfilter(raw, w: int, h: int, channels: int) -> np.ndarray:
    """Invert the five PNG scanline filters over a (filter byte +
    scanline) stream -> (h, w*channels) uint8."""
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline data size mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    bpp = channels  # bytes per pixel at depth 8
    for y in range(h):
        off = y * (stride + 1)
        ftype = raw[off]
        line = np.frombuffer(raw, np.uint8, stride, off + 1).copy()
        if ftype == 0:  # None
            recon = line
        elif ftype == 1:  # Sub: recon[x] = line[x] + recon[x-bpp]
            # per-byte-lane cumulative sum mod 256 — vectorized, no
            # per-pixel Python
            lanes = line.reshape(w, bpp).astype(np.int64)
            recon = (lanes.cumsum(axis=0) % 256).astype(np.uint8).reshape(stride)
        elif ftype == 2:  # Up
            recon = line + prev  # uint8 add wraps mod 256 natively
        elif ftype == 3:  # Average
            recon = np.empty(stride, dtype=np.uint8)
            left = np.zeros(bpp, dtype=np.uint16)
            for x in range(w):
                s = slice(x * bpp, (x + 1) * bpp)
                left = (
                    line[s].astype(np.uint16)
                    + ((left + prev[s].astype(np.uint16)) >> 1)
                ) & 0xFF
                recon[s] = left.astype(np.uint8)
        elif ftype == 4:  # Paeth
            recon = np.empty(stride, dtype=np.uint8)
            left = np.zeros(bpp, dtype=np.int32)
            upleft = np.zeros(bpp, dtype=np.int32)
            for x in range(w):
                s = slice(x * bpp, (x + 1) * bpp)
                up = prev[s].astype(np.int32)
                p = left + up - upleft
                pa, pb, pc = (
                    np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
                )
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft)
                )
                left = (line[s].astype(np.int32) + pred) & 0xFF
                recon[s] = left.astype(np.uint8)
                upleft = up
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = recon
        prev = recon
    return out


# ---------------------------------------------------------------------------
# WAV (PCM16)
# ---------------------------------------------------------------------------


def encode_wav_pcm16(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 mono samples -> WAV bytes (stdlib wave framing)."""
    bio = io.BytesIO()
    with wave.open(bio, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return bio.getvalue()


_WAV_FMTS = {
    # fmt -> (format tag, bytes/sample, ffmpeg-style codec name)
    "pcm8": (1, 1, "pcm_u8"),
    "pcm16": (1, 2, "pcm_s16le"),
    "pcm24": (1, 3, "pcm_s24le"),
    "pcm32": (1, 4, "pcm_s32le"),
    "float32": (3, 4, "pcm_f32le"),
    "float64": (3, 8, "pcm_f64le"),
}


def encode_wav(
    samples: np.ndarray, rate: int = 16000, fmt: str = "pcm16"
) -> bytes:
    """Mono samples -> WAV bytes in one of the real-world encodings
    (pcm8/pcm16/pcm24/pcm32/float32/float64). int16 input is rescaled
    to the target width; float input must already be in [-1, 1]."""
    if fmt not in _WAV_FMTS:
        raise ValueError(f"unknown WAV encoding {fmt!r}")
    tag, width, _codec = _WAV_FMTS[fmt]
    x = np.asarray(samples)
    f = (
        np.clip(x.astype(np.float64), -1.0, 1.0)
        if x.dtype.kind == "f" else x.astype(np.float64) / 32768.0
    )
    if fmt == "pcm8":
        data = (np.round(f * 127.0) + 128).clip(0, 255).astype(
            np.uint8
        ).tobytes()
    elif fmt == "pcm16":
        data = np.round(f * 32767.0).clip(-32768, 32767).astype(
            "<i2"
        ).tobytes()
    elif fmt == "pcm24":
        v = np.round(f * 8388607.0).clip(
            -(1 << 23), (1 << 23) - 1
        ).astype("<i4")
        data = v.view(np.uint8).reshape(-1, 4)[:, :3].tobytes()
    elif fmt == "pcm32":
        data = np.round(f * 2147483647.0).clip(
            -(1 << 31), (1 << 31) - 1
        ).astype("<i4").tobytes()
    else:  # IEEE float
        data = f.astype("<f4" if fmt == "float32" else "<f8").tobytes()
    fmt_body = struct.pack(
        "<HHIIHH", tag, 1, rate, rate * width, width, width * 8
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
    if tag == 3:  # IEEE float requires a fact chunk (RIFF spec)
        chunks += b"fact" + struct.pack("<II", 4, len(f))
    chunks += b"data" + struct.pack("<I", len(data)) + data
    if len(data) % 2:
        chunks += b"\x00"  # chunks are word-aligned
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def wav_info(buf: bytes) -> dict:
    """Parse RIFF/WAVE headers without decoding samples: codec name,
    sample rate, channel count, bit depth, and frame count.
    WAVE_FORMAT_EXTENSIBLE unwraps to the SubFormat tag."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, fmt, data_len = 12, None, None
    while pos + 8 <= len(buf):
        tag = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        if tag == b"fmt ":
            fmt = list(struct.unpack_from("<HHIIHH", buf, pos + 8))
            if fmt[0] == 0xFFFE and size >= 40:  # EXTENSIBLE
                (fmt[0],) = struct.unpack_from("<H", buf, pos + 8 + 24)
        elif tag == b"data":
            data_len = min(size, len(buf) - pos - 8)
        pos += 8 + size + (size & 1)
    if fmt is None or data_len is None:
        raise ValueError("WAV missing fmt/data chunk")
    atag, ch, rate, _brate, balign, bits = fmt
    codec = {
        (1, 8): "pcm_u8", (1, 16): "pcm_s16le", (1, 24): "pcm_s24le",
        (1, 32): "pcm_s32le", (3, 32): "pcm_f32le", (3, 64): "pcm_f64le",
    }.get((atag, bits))
    return {
        "codec": codec, "format_tag": atag, "channels": ch,
        "sample_rate": rate, "bits": bits,
        "n_frames": data_len // max(balign, 1),
    }


def decode_wav_pcm16(buf: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (mono int16 samples, sample_rate). Accepts the
    real-world uncompressed encodings — PCM 8/16/24/32-bit, IEEE
    float32/64, and WAVE_FORMAT_EXTENSIBLE wrappers — normalizing
    everything to int16 (the engine's audio currency); compressed
    formats (ADPCM, mp3-in-wav) raise with the tag named.
    Multi-channel input is averaged down to mono."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(buf):
        tag = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        if tag == b"fmt ":
            fmt = list(struct.unpack_from("<HHIIHH", buf, pos + 8))
            if fmt[0] == 0xFFFE and size >= 40:
                (fmt[0],) = struct.unpack_from("<H", buf, pos + 8 + 24)
        elif tag == b"data":
            data = buf[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    atag, ch, rate, _brate, _balign, bits = fmt
    if atag == 1 and bits == 8:
        x = (
            np.frombuffer(data, np.uint8).astype(np.int16) - 128
        ) * np.int16(256)
    elif atag == 1 and bits == 16:
        x = np.frombuffer(data, "<i2")
    elif atag == 1 and bits == 24:
        b = np.frombuffer(data, np.uint8)
        b = b[: len(b) - len(b) % 3].reshape(-1, 3).astype(np.int32)
        v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        x = ((v << 8) >> 16).astype(np.int16)  # sign-extend, keep top 16
    elif atag == 1 and bits == 32:
        x = (np.frombuffer(data, "<i4") >> 16).astype(np.int16)
    elif atag == 3 and bits in (32, 64):
        f = np.frombuffer(data, "<f4" if bits == 32 else "<f8")
        x = np.round(np.clip(f, -1.0, 1.0) * 32767.0).astype(np.int16)
    else:
        raise NotImplementedError(
            f"unsupported WAV format tag {atag} ({bits}-bit) — plug an "
            "audio codec in at this seam"
        )
    if ch > 1:
        x = x[: len(x) - len(x) % ch].reshape(-1, ch).mean(axis=1).astype(
            np.int16
        )
    return np.ascontiguousarray(x), rate


# ---------------------------------------------------------------------------
# kernels over decoded arrays
# ---------------------------------------------------------------------------


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize via numpy index sampling (one gather,
    no per-pixel Python loop)."""
    h, w = arr.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return arr[ys][:, xs].copy()


def image_features(arr: np.ndarray, dim: int = 8) -> list[float]:
    """Real image descriptor: per-channel mean+std (6) then a coarse
    luminance grid filling the remaining dims. Deterministic."""
    a = arr.astype(np.float64) / 255.0
    feats = []
    for c in range(3):
        feats.append(float(a[:, :, c].mean()))
        feats.append(float(a[:, :, c].std()))
    lum = a.mean(axis=2)
    grid = max(1, int(np.ceil(np.sqrt(max(dim - 6, 1)))))
    small = resize_nearest((lum * 255).astype(np.uint8)[..., None], grid, grid)
    feats.extend((small[..., 0].astype(np.float64) / 255.0).ravel().tolist())
    return [round(f, 6) for f in feats[:dim]]


def audio_features(samples: np.ndarray, rate: int, dim: int = 8) -> list[float]:
    """Real audio descriptor: RMS, zero-crossing rate, spectral
    centroid, then FFT band energies. Deterministic."""
    x = samples.astype(np.float64) / 32768.0
    if len(x) == 0:
        return [0.0] * dim
    rms = float(np.sqrt((x**2).mean()))
    zcr = float((np.abs(np.diff(np.signbit(x)))).mean()) if len(x) > 1 else 0.0
    spec = np.abs(np.fft.rfft(x))
    freqs = np.fft.rfftfreq(len(x), d=1.0 / rate)
    total = spec.sum()
    centroid = float((freqs * spec).sum() / total / (rate / 2)) if total > 0 else 0.0
    feats = [rms, zcr, centroid]
    n_bands = max(dim - 3, 1)
    bands = np.array_split(spec, n_bands)
    denom = total if total > 0 else 1.0
    feats.extend(float(b.sum() / denom) for b in bands)
    return [round(f, 6) for f in feats[:dim]]


# ---------------------------------------------------------------------------
# MP4 / ISO BMFF (ISO/IEC 14496-12)
#
# The CONTAINER layer needs nothing beyond stdlib struct: box framing,
# movie/track headers, and the sample tables (stsd/stts/stsc/stsz/
# stco) that map every sample to a byte range and a timestamp. Only
# the compressed-bitstream decode (avc1/hev1/...) genuinely needs a
# codec library — that stays the marked seam. A 'raw ' (uncompressed
# RGB24) video track round-trips completely, which exercises the
# whole container path end-to-end.
# ---------------------------------------------------------------------------


def _box(tag: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + tag + payload


def _full(tag: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(tag, struct.pack(">I", (version << 24) | flags) + payload)


_UNITY_MATRIX = struct.pack(
    ">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
)


def encode_mp4_rawvideo(frames: np.ndarray, fps: int = 10) -> bytes:
    """(n, h, w, 3) uint8 -> a minimal valid MP4 with one 'raw '
    (uncompressed RGB24) video track: ftyp + mdat + moov, one chunk,
    constant sample size, constant frame duration. Box layout per
    ISO/IEC 14496-12; every offset in stco is exact."""
    n, h, w, c = frames.shape
    if c != 3:
        raise ValueError("raw video requires 3 channels")
    sample_size = h * w * 3
    media = frames.astype(np.uint8).tobytes()

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2mp41")
    mdat = _box(b"mdat", media)
    mdat_payload_off = len(ftyp) + 8  # first sample's absolute offset

    timescale = 1000
    duration = n * timescale // fps

    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">i", 0x00010000)  # rate 1.0
        + struct.pack(">hH", 0x0100, 0)  # volume, reserved
        + b"\x00" * 8
        + _UNITY_MATRIX
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next_track_ID
    )
    tkhd = _full(
        b"tkhd", 0, 7,  # enabled | in_movie | in_preview
        struct.pack(">IIIII", 0, 0, 1, 0, duration)
        + b"\x00" * 8
        + struct.pack(">hhhh", 0, 0, 0, 0)  # layer, group, volume, rsv
        + _UNITY_MATRIX
        + struct.pack(">II", w << 16, h << 16),  # 16.16 fixed
    )
    mdhd = _full(
        b"mdhd", 0, 0,
        struct.pack(">IIIIHH", 0, 0, fps, n, 0x55C4, 0),  # 'und'
    )
    hdlr = _full(
        b"hdlr", 0, 0,
        struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"raw video\x00",
    )
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full(
        b"dref", 0, 0,
        struct.pack(">I", 1) + _full(b"url ", 0, 1, b""),
    )
    dinf = _box(b"dinf", dref)
    entry = _box(
        b"raw ",
        b"\x00" * 6 + struct.pack(">H", 1)          # data_reference_index
        + b"\x00" * 16                                # pre_defined/reserved
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)                        # frame_count
        + b"\x00" * 32                                # compressorname
        + struct.pack(">Hh", 24, -1),                 # depth, pre_defined
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, 1))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full(b"stsz", 0, 0, struct.pack(">III", sample_size, n, 0))
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, mdat_payload_off))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _walk_boxes(buf: bytes, start: int, end: int):
    """Yield (tag, payload_start, payload_end) for each box in
    [start, end) — size==1 reads a 64-bit largesize, size==0 extends
    to the end of the enclosing box."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack_from(">I", buf, pos)[0]
        tag = buf[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            size = struct.unpack_from(">Q", buf, pos + 8)[0]
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError(f"malformed box {tag!r} at {pos}")
        yield tag, body, pos + size
        pos += size


def parse_mp4(buf: bytes) -> dict:
    """ISO BMFF container metadata: movie duration plus, per track,
    the handler/codec/dimensions and the full sample map (absolute
    byte offset, size, timestamp in ms) derived from
    stts + stsc + stsz + stco/co64. No bitstream decode."""
    out: dict = {"brand": None, "duration_ms": None, "tracks": []}
    containers = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}
    track: dict | None = None

    def walk(start: int, end: int) -> None:
        nonlocal track
        for tag, a, b in _walk_boxes(buf, start, end):
            if tag == b"ftyp":
                out["brand"] = buf[a : a + 4].decode("ascii", "replace")
            elif tag == b"mvhd":
                v = buf[a]
                if v == 1:
                    ts, dur = struct.unpack_from(">IQ", buf, a + 4 + 16)
                else:
                    ts, dur = struct.unpack_from(">II", buf, a + 4 + 8)
                out["duration_ms"] = int(dur * 1000 // max(ts, 1))
            elif tag == b"trak":
                track = {
                    "handler": None, "codec": None, "width": None,
                    "height": None, "timescale": None,
                    "duration_ms": None, "samples": [],
                    "_stts": [], "_stsc": [], "_stsz": (0, []),
                    "_stco": [],
                }
                walk(a, b)
                _finish_track(track)
                out["tracks"].append(track)
                track = None
                continue
            elif tag in containers:
                walk(a, b)
                continue
            elif track is not None:
                _track_leaf(buf, tag, a, b, track)

    walk(0, len(buf))
    return out


def _track_leaf(buf: bytes, tag: bytes, a: int, b: int, t: dict) -> None:
    if tag == b"mdhd":
        v = buf[a]
        if v == 1:
            ts, dur = struct.unpack_from(">IQ", buf, a + 4 + 16)
        else:
            ts, dur = struct.unpack_from(">II", buf, a + 4 + 8)
        t["timescale"] = ts
        t["duration_ms"] = int(dur * 1000 // max(ts, 1))
    elif tag == b"hdlr":
        t["handler"] = buf[a + 8 : a + 12].decode("ascii", "replace")
    elif tag == b"stsd":
        count = struct.unpack_from(">I", buf, a + 4)[0]
        if count >= 1:
            t["codec"] = buf[a + 12 : a + 16].decode("ascii", "replace")
            if t.get("handler") in (None, "vide"):
                # VisualSampleEntry width/height at fixed offsets
                ea = a + 16  # entry payload
                try:
                    w, h = struct.unpack_from(">HH", buf, ea + 24)
                    if 0 < w <= 16384 and 0 < h <= 16384:
                        t["width"], t["height"] = w, h
                except struct.error:
                    pass
    elif tag == b"stts":
        n = struct.unpack_from(">I", buf, a + 4)[0]
        t["_stts"] = [
            struct.unpack_from(">II", buf, a + 8 + 8 * i) for i in range(n)
        ]
    elif tag == b"stsc":
        n = struct.unpack_from(">I", buf, a + 4)[0]
        t["_stsc"] = [
            struct.unpack_from(">III", buf, a + 8 + 12 * i) for i in range(n)
        ]
    elif tag == b"stsz":
        const, n = struct.unpack_from(">II", buf, a + 4)
        sizes = [] if const else [
            struct.unpack_from(">I", buf, a + 12 + 4 * i)[0]
            for i in range(n)
        ]
        t["_stsz"] = (const, n, sizes)
    elif tag == b"stco":
        n = struct.unpack_from(">I", buf, a + 4)[0]
        t["_stco"] = [
            struct.unpack_from(">I", buf, a + 8 + 4 * i)[0] for i in range(n)
        ]
    elif tag == b"co64":
        n = struct.unpack_from(">I", buf, a + 4)[0]
        t["_stco"] = [
            struct.unpack_from(">Q", buf, a + 8 + 8 * i)[0] for i in range(n)
        ]


def _finish_track(t: dict) -> None:
    """Expand stts/stsc/stsz/stco into per-sample (offset, size,
    ts_ms) — the standard chunk-run expansion."""
    const, n_sizes, sizes = t.pop("_stsz", (0, 0, []))
    stts = t.pop("_stts", [])
    stsc = t.pop("_stsc", [])
    stco = t.pop("_stco", [])
    n_samples = n_sizes if not const else sum(c for c, _ in stts)
    if const:
        sizes = [const] * n_samples
    # per-sample decode timestamps from stts run-lengths
    ts_ms, clock = [], 0
    scale = max(t.get("timescale") or 1, 1)
    for count, delta in stts:
        for _ in range(count):
            ts_ms.append(clock * 1000 // scale)
            clock += delta
    # chunk-run expansion: stsc rows are (first_chunk, samples_per_
    # chunk, desc_idx) with the run extending to the next row
    samples = []
    si = 0
    for ri, (first, per, _desc) in enumerate(stsc):
        last = stsc[ri + 1][0] - 1 if ri + 1 < len(stsc) else len(stco)
        for chunk in range(first, last + 1):
            off = stco[chunk - 1]
            for _ in range(per):
                if si >= len(sizes):
                    break
                samples.append({
                    "offset": off,
                    "size": sizes[si],
                    "ts_ms": ts_ms[si] if si < len(ts_ms) else None,
                })
                off += sizes[si]
                si += 1
    t["samples"] = samples
    t["sample_count"] = len(samples)


def decode_mp4_rawvideo(buf: bytes) -> tuple[np.ndarray, int]:
    """MP4 with a 'raw ' RGB24 video track -> ((n, h, w, 3) uint8,
    fps). Compressed codecs (avc1/hev1/...) raise at the marked
    codec seam — the container metadata above still parses for them."""
    meta = parse_mp4(buf)
    vids = [t for t in meta["tracks"] if t["handler"] == "vide"]
    if not vids:
        raise ValueError("no video track")
    t = vids[0]
    if t["codec"] != "raw ":
        raise NotImplementedError(
            f"bitstream decode for codec {t['codec']!r} requires "
            "ffmpeg; plug the codec in here — container parsing and "
            "sample extraction are already correct"
        )
    w, h = t["width"], t["height"]
    frames = np.stack([
        np.frombuffer(
            buf[s["offset"] : s["offset"] + s["size"]], dtype=np.uint8
        ).reshape(h, w, 3)
        for s in t["samples"]
    ])
    n = len(t["samples"])
    dur_s = (t["duration_ms"] or 0) / 1000.0
    fps = int(round(n / dur_s)) if dur_s > 0 else 0
    return frames, fps


def video_features(frames: np.ndarray, dim: int = 8) -> list[float]:
    """Real video descriptor: image features of the mean frame plus
    temporal-difference energy folded into the last slot."""
    mean_frame = frames.astype(np.float64).mean(axis=0).astype(np.uint8)
    feats = image_features(mean_frame, dim)
    if len(frames) > 1:
        diff = np.abs(np.diff(frames.astype(np.float64), axis=0)) / 255.0
        feats[-1] = round(float(diff.mean()), 6)
    return feats


# ---------------------------------------------------------------------------
# JPEG (baseline sequential DCT, ITU-T T.81 / ISO 10918-1)
#
# Baseline JPEG needs no codec library either: the entropy layer is
# canonical Huffman over (run, size) symbols, the transform is an
# 8x8 DCT — one einsum over all blocks — and the color model is
# JFIF YCbCr. The encoder writes its tables into the stream (DQT/
# DHT), the decoder reads whatever tables the stream carries, so the
# pair is not tautological. Scope: baseline sequential (SOF0), 8-bit,
# interleaved scan, 4:4:4 and 4:2:0; progressive (SOF2) raises at
# the marked seam. The Huffman bit loop is per-symbol Python — a
# correctness kernel; a vectorized library plugs in at the same call
# sites if throughput ever matters here.
# ---------------------------------------------------------------------------

# Annex K.1 quantization tables (luminance, chrominance)
_JPEG_QL = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)
_JPEG_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

# Annex K.3 typical Huffman tables: (bits[1..16], huffval)
_DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
         list(range(12)))
_DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
         list(range(12)))
_AC_L = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_AC_C = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# orthonormal 8x8 DCT-II basis: blocks @ _DCT_B gives per-row DCT
_DCT_B = np.array([
    [np.sqrt((1.0 if k == 0 else 2.0) / 8.0)
     * np.cos((2 * n + 1) * k * np.pi / 16.0) for k in range(8)]
    for n in range(8)
])


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman per T.81 C.2: symbol -> (code, length)."""
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _magnitude(v: int) -> tuple[int, int]:
    """(size category, appended bits) for a DC diff / AC coefficient
    (T.81 F.1.2.1): negative values use the one's-complement bits."""
    if v == 0:
        return 0, 0
    size = int(v).bit_length() if v > 0 else int(-v).bit_length()
    return size, (v if v >= 0 else v + (1 << size) - 1)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (B.1.1.5)
                self.out.append(0x00)
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def marker(self, second: int) -> None:
        """Byte-align with 1-bits and emit a raw marker (RSTn) —
        markers bypass byte stuffing."""
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)
        self.out.append(0xFF)
        self.out.append(second)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.out)


def _rgb_to_ycbcr(arr: np.ndarray) -> np.ndarray:
    a = arr.astype(np.float64)
    r, g, b = a[..., 0], a[..., 1], a[..., 2]
    return np.stack([
        0.299 * r + 0.587 * g + 0.114 * b,
        -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
        0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
    ], axis=-1)


def _ycbcr_to_rgb(y, cb, cr) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def _blockify(plane: np.ndarray) -> np.ndarray:
    """(H, W) with H,W multiples of 8 -> (n, 8, 8) in raster order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


def _deblockify(blocks: np.ndarray, h8: int, w8: int) -> np.ndarray:
    return (
        blocks.reshape(h8 // 8, w8 // 8, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(h8, w8)
    )


def _scale_q(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-compatible quality scaling of a base table."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    t = (table * scale + 50) // 100
    return np.clip(t, 1, 255).astype(np.int32)


def _encode_plane_blocks(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    blocks = _blockify(plane) - 128.0
    coef = np.einsum("ni,bij,jk->bnk", _DCT_B.T, blocks, _DCT_B)
    quant = np.round(coef / qtab).astype(np.int32)
    return quant.reshape(-1, 64)[:, _ZIGZAG]


def _jpeg_prep(arr: np.ndarray, quality: int, subsample: bool):
    """Shared encoder front half: RGB -> per-component quantized
    zigzag coefficient grids on the padded MCU lattice. Returns
    (h, w, samp, qy, qc, mcus_x, mcus_y, comp_zz) where comp_zz[ci]
    is (blocks_high, blocks_wide, 64)."""
    h, w, c = arr.shape
    if c != 3:
        raise ValueError("JPEG encoder requires RGB")
    ycc = _rgb_to_ycbcr(arr)
    qy, qc = _scale_q(_JPEG_QL, quality), _scale_q(_JPEG_QC, quality)
    # component sampling factors (Hi, Vi)
    samp = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1), (1, 1), (1, 1)]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    comp_zz = []
    for ci in range(3):
        hi, vi = samp[ci]
        plane = ycc[..., ci]
        if (hi, vi) != (hmax, vmax):
            # box-average downsample by (vmax//vi, hmax//hi)
            fy, fx = vmax // vi, hmax // hi
            ph = -(-h // fy) * fy
            pw = -(-w // fx) * fx
            p = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
            plane = p.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        th = mcus_y * 8 * vi
        tw = mcus_x * 8 * hi
        p = np.pad(
            plane,
            ((0, th - plane.shape[0]), (0, tw - plane.shape[1])),
            mode="edge",
        )
        zz = _encode_plane_blocks(p, qy if ci == 0 else qc)
        comp_zz.append(zz.reshape(th // 8, tw // 8, 64))
    return h, w, samp, qy, qc, mcus_x, mcus_y, comp_zz


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _dqt_seg(tid: int, tab: np.ndarray) -> bytes:
    return _seg(
        0xFFDB,
        bytes([tid]) + bytes(int(x) for x in tab.reshape(-1)[_ZIGZAG]),
    )


def _dht_seg(cls: int, tid: int, bits, vals) -> bytes:
    return _seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))


def encode_jpeg_baseline(
    arr: np.ndarray, quality: int = 90, subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """(h, w, 3) uint8 RGB -> baseline sequential JFIF JPEG (SOF0),
    Annex K tables scaled by `quality`; 4:4:4 by default, 4:2:0 with
    subsample=True; restart_interval > 0 emits DRI + RSTn markers
    every N MCUs."""
    h, w, samp, qy, qc, mcus_x, mcus_y, comp_zz = _jpeg_prep(
        arr, quality, subsample
    )
    dc_tabs = [_huff_codes(*_DC_L), _huff_codes(*_DC_C)]
    ac_tabs = [_huff_codes(*_AC_L), _huff_codes(*_AC_C)]
    bw = _BitWriter()
    pred = [0, 0, 0]
    mcu_i = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                bw.marker(0xD0 + (mcu_i // restart_interval - 1) % 8)
                pred = [0, 0, 0]
            mcu_i += 1
            for ci in range(3):
                hi, vi = samp[ci]
                dct, act = dc_tabs[min(ci, 1)], ac_tabs[min(ci, 1)]
                for by in range(vi):
                    for bx in range(hi):
                        blk = comp_zz[ci][my * vi + by, mx * hi + bx]
                        diff = int(blk[0]) - pred[ci]
                        pred[ci] = int(blk[0])
                        size, bits = _magnitude(diff)
                        code, ln = dct[size]
                        bw.put(code, ln)
                        if size:
                            bw.put(bits, size)
                        run = 0
                        last_nz = int(np.max(np.nonzero(blk)[0])) if np.any(
                            blk[1:]
                        ) else 0
                        for k in range(1, 64):
                            v = int(blk[k])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                code, ln = act[0xF0]  # ZRL
                                bw.put(code, ln)
                                run -= 16
                            size, bits = _magnitude(v)
                            code, ln = act[(run << 4) | size]
                            bw.put(code, ln)
                            bw.put(bits, size)
                            run = 0
                        if last_nz < 63:
                            code, ln = act[0x00]  # EOB
                            bw.put(code, ln)
    entropy = bw.flush()

    sof = _seg(
        0xFFC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + b"".join(
            struct.pack(
                ">BBB", i + 1, (samp[i][0] << 4) | samp[i][1],
                0 if i == 0 else 1,
            )
            for i in range(3)
        ),
    )
    sos = _seg(
        0xFFDA,
        bytes([3])
        + b"".join(
            struct.pack(">BB", i + 1, (min(i, 1) << 4) | min(i, 1))
            for i in range(3)
        )
        + bytes([0, 63, 0]),
    )
    app0 = _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dri = (
        _seg(0xFFDD, struct.pack(">H", restart_interval))
        if restart_interval else b""
    )
    return (
        b"\xff\xd8" + app0 + _dqt_seg(0, qy) + _dqt_seg(1, qc)
        + sof
        + _dht_seg(0, 0, *_DC_L) + _dht_seg(1, 0, *_AC_L)
        + _dht_seg(0, 1, *_DC_C) + _dht_seg(1, 1, *_AC_C)
        + dri + sos + entropy + b"\xff\xd9"
    )


# near-flat canonical Huffman tables for the progressive encoder:
# every DC size category at 5 bits; AC symbols 0x00-0xFD at 8 bits
# plus 0xFE/0xFF at 9 (a DHT BITS count is one byte, so 256 codes
# can't share a length; the split also keeps the all-ones code
# unused, C.2). Valid-but-unoptimised tables keep the encoder
# single-pass while covering the EOB-run symbols (r<<4) that the
# Annex K tables lack.
_FLAT_DC = ([0, 0, 0, 0, 16] + [0] * 11, list(range(16)))
_FLAT_AC = ([0] * 7 + [254, 2] + [0] * 7, list(range(256)))

# libjpeg's standard 10-scan progression for YCbCr: DC first with one
# bit of successive approximation, per-component AC bands, then the
# refinement passes (jcparam.c jpeg_simple_progression).
_PROG_SCRIPT = [
    ((0, 1, 2), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((2,), 1, 63, 0, 1),
    ((1,), 1, 63, 0, 1),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0, 1, 2), 0, 0, 1, 0),
    ((2,), 1, 63, 1, 0),
    ((1,), 1, 63, 1, 0),
    ((0,), 1, 63, 1, 0),
]


def _nonint_blocks(ci, samp, h, w):
    """Block grid a single-component (non-interleaved) scan codes:
    just the blocks covering the image for that component (T.81
    A.2.2), excluding MCU padding columns/rows."""
    hi, vi = samp[ci]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    cw = -(-(w * hi) // hmax)
    ch = -(-(h * vi) // vmax)
    return -(-ch // 8), -(-cw // 8)


def _emit_eobrun(bw, act, state) -> None:
    """Flush a pending EOB run: symbol (nbits<<4), nbits appended
    low-order bits of the run length, then any correction bits
    buffered while the run accumulated (T.81 G.1.2.2-3)."""
    if state["eobrun"]:
        nbits = state["eobrun"].bit_length() - 1
        code, ln = act[nbits << 4]
        bw.put(code, ln)
        if nbits:
            bw.put(state["eobrun"] & ((1 << nbits) - 1), nbits)
        state["eobrun"] = 0
        for b in state["pend"]:
            bw.put(b, 1)
        state["pend"].clear()


def _enc_ac_first(bw, act, blocks, nbh, nbw, ss, se, al) -> None:
    """AC first pass for one band: baseline run/size coding on the
    point-transformed coefficients, with all-zero block tails folded
    into cross-block EOB runs (G.1.2.2)."""
    state = {"eobrun": 0, "pend": []}
    for row in range(nbh):
        for col in range(nbw):
            blk = blocks[row, col]
            run = 0
            for k in range(ss, se + 1):
                v = int(blk[k])
                t = (v >> al) if v >= 0 else -((-v) >> al)
                if t == 0:
                    run += 1
                    continue
                _emit_eobrun(bw, act, state)
                while run > 15:
                    code, ln = act[0xF0]
                    bw.put(code, ln)
                    run -= 16
                size, bits = _magnitude(t)
                code, ln = act[(run << 4) | size]
                bw.put(code, ln)
                bw.put(bits, size)
                run = 0
            if run > 0:
                state["eobrun"] += 1
                if state["eobrun"] == 0x7FFF:
                    _emit_eobrun(bw, act, state)
    _emit_eobrun(bw, act, state)


def _enc_ac_refine(bw, act, blocks, nbh, nbw, ss, se, al) -> None:
    """AC refinement pass (G.1.2.3, the jcphuff.c algorithm): one
    correction bit per already-nonzero coefficient, (run<<4)|1
    symbols + a sign bit for newly-significant ones; correction bits
    crossed while skipping are buffered and emitted after the symbol
    they precede (or with the EOB-run flush)."""
    state = {"eobrun": 0, "pend": []}
    for row in range(nbh):
        for col in range(nbw):
            blk = blocks[row, col]
            absv = [
                (abs(int(blk[k])) >> al) for k in range(ss, se + 1)
            ]
            eob_k = ss - 1
            for i, t in enumerate(absv):
                if t == 1:
                    eob_k = ss + i
            run = 0
            cur = []  # this block's buffered correction bits
            for k in range(ss, se + 1):
                t = absv[k - ss]
                if t == 0:
                    run += 1
                    continue
                while run > 15 and k <= eob_k:
                    _emit_eobrun(bw, act, state)
                    code, ln = act[0xF0]
                    bw.put(code, ln)
                    run -= 16
                    for b in cur:
                        bw.put(b, 1)
                    cur = []
                if t > 1:  # history coefficient: buffer its next bit
                    cur.append(t & 1)
                    continue
                _emit_eobrun(bw, act, state)
                code, ln = act[(run << 4) | 1]
                bw.put(code, ln)
                bw.put(1 if int(blk[k]) > 0 else 0, 1)
                for b in cur:
                    bw.put(b, 1)
                cur = []
                run = 0
            if run > 0 or cur:
                state["eobrun"] += 1
                state["pend"].extend(cur)
                if state["eobrun"] == 0x7FFF or len(state["pend"]) > 900:
                    _emit_eobrun(bw, act, state)
    _emit_eobrun(bw, act, state)


def encode_jpeg_progressive(
    arr: np.ndarray, quality: int = 90, subsample: bool = False,
) -> bytes:
    """(h, w, 3) uint8 RGB -> progressive JFIF JPEG (SOF2) using the
    standard 10-scan script (DC first/refine, per-component spectral
    bands with successive approximation; T.81 Annex G). Quantized
    coefficients are identical to encode_jpeg_baseline's at the same
    settings, so progressive decode must reproduce the baseline
    decode byte-exactly."""
    h, w, samp, qy, qc, mcus_x, mcus_y, comp_zz = _jpeg_prep(
        arr, quality, subsample
    )
    dct = _huff_codes(*_FLAT_DC)
    act = _huff_codes(*_FLAT_AC)
    scans = []
    for comps_in, ss, se, ah, al in _PROG_SCRIPT:
        bw = _BitWriter()
        if ss == 0:
            pred = {ci: 0 for ci in comps_in}

            def dc_block(ci, blk0):
                if ah == 0:
                    v = int(blk0) >> al
                    diff = v - pred[ci]
                    pred[ci] = v
                    size, bits = _magnitude(diff)
                    code, ln = dct[size]
                    bw.put(code, ln)
                    if size:
                        bw.put(bits, size)
                else:
                    bw.put((int(blk0) >> al) & 1, 1)

            if len(comps_in) > 1:  # interleaved MCU order
                for my in range(mcus_y):
                    for mx in range(mcus_x):
                        for ci in comps_in:
                            hi, vi = samp[ci]
                            for by in range(vi):
                                for bx in range(hi):
                                    dc_block(
                                        ci,
                                        comp_zz[ci][
                                            my * vi + by, mx * hi + bx, 0
                                        ],
                                    )
            else:
                ci = comps_in[0]
                nbh, nbw = _nonint_blocks(ci, samp, h, w)
                for row in range(nbh):
                    for col in range(nbw):
                        dc_block(ci, comp_zz[ci][row, col, 0])
        else:
            ci = comps_in[0]
            nbh, nbw = _nonint_blocks(ci, samp, h, w)
            enc = _enc_ac_first if ah == 0 else _enc_ac_refine
            enc(bw, act, comp_zz[ci], nbh, nbw, ss, se, al)
        scans.append((comps_in, ss, se, ah, al, bw.flush()))

    sof = _seg(
        0xFFC2,
        struct.pack(">BHHB", 8, h, w, 3)
        + b"".join(
            struct.pack(
                ">BBB", i + 1, (samp[i][0] << 4) | samp[i][1],
                0 if i == 0 else 1,
            )
            for i in range(3)
        ),
    )
    app0 = _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out = bytearray(
        b"\xff\xd8" + app0 + _dqt_seg(0, qy) + _dqt_seg(1, qc) + sof
        + _dht_seg(0, 0, *_FLAT_DC) + _dht_seg(1, 0, *_FLAT_AC)
    )
    for comps_in, ss, se, ah, al, entropy in scans:
        out += _seg(
            0xFFDA,
            bytes([len(comps_in)])
            + b"".join(
                struct.pack(">BB", ci + 1, 0) for ci in comps_in
            )
            + bytes([ss, se, (ah << 4) | al]),
        )
        out += entropy
    out += b"\xff\xd9"
    return bytes(out)


class _BitReader:
    """Entropy-segment bit reader: unstuffs 0xFF00, stops at markers,
    resets DC prediction at RSTn (T.81 B.1.1.5 / F.2.2.5)."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.pos >= len(self.buf):
                self.acc = (self.acc << 8) | 0xFF  # pad past the end
                self.nbits += 8
                continue
            b = self.buf[self.pos]
            if b == 0xFF:
                nxt = self.buf[self.pos + 1] if self.pos + 1 < len(
                    self.buf
                ) else 0xD9
                if nxt == 0x00:  # stuffed
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:  # RSTn handled by caller
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    continue
                else:  # real marker: pad without consuming
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def restart(self) -> None:
        """Align to byte and consume an RSTn marker."""
        self.nbits = 0
        self.acc = 0
        while self.pos + 1 < len(self.buf):
            if self.buf[self.pos] == 0xFF and 0xD0 <= self.buf[
                self.pos + 1
            ] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1


class _HuffDecode:
    """Canonical Huffman decode tables (T.81 F.2.2.3)."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code, k = 0, 0
        for ln in range(1, 17):
            if bits[ln - 1]:
                self.valptr[ln] = k
                self.mincode[ln] = code
                code += bits[ln - 1]
                k += bits[ln - 1]
                self.maxcode[ln] = code - 1
            code <<= 1
        self.vals = vals

    def decode(self, br: _BitReader) -> int:
        code = br.bits(1)
        ln = 1
        while code > self.maxcode[ln]:
            if ln >= 16:
                raise ValueError("corrupt JPEG Huffman stream")
            code = (code << 1) | br.bits(1)
            ln += 1
        return self.vals[self.valptr[ln] + code - self.mincode[ln]]


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map `size` received bits to a signed
    coefficient."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def jpeg_is_progressive(buf: bytes) -> bool:
    """True iff the stream's frame header is SOF2 (progressive),
    found by WALKING marker segments — a raw substring scan for
    b'\\xff\\xc2' misfires on quantization/Huffman table bytes
    (low-quality DQT values clip to 0xFF) and on embedded EXIF
    thumbnails."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            return False  # entered entropy data without a frame header
        marker = buf[pos + 1]
        if marker in (0xC0, 0xC1):
            return False
        if marker == 0xC2:
            return True
        if marker in (0xD9, 0xDA):  # EOI / SOS before any SOF
            return False
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", buf, pos + 2)
        pos += 2 + seglen
    return False


def decode_jpeg_baseline(buf: bytes) -> np.ndarray:
    """JPEG (baseline SOF0/1 + progressive SOF2) -> (h, w, 3) uint8
    RGB (or (h, w, 1) for grayscale streams). Reads DQT/DHT from the
    stream, supports interleaved scans, restart intervals, any
    sampling factors (4:4:4 / 4:2:2 / 4:2:0), and progressive scan
    scripts with spectral selection + successive approximation (T.81
    Annex G: DC first/refine, AC first/refine with EOB runs).
    Arithmetic coding, hierarchical mode, and 12-bit precision raise
    with the feature named."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, _HuffDecode] = {}
    ac_tabs: dict[int, _HuffDecode] = {}
    sof = None
    progressive = False
    prog = None  # progressive accumulation state
    restart_interval = 0
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = buf[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", buf, pos + 2)
        body = buf[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                n = 64 * (2 if pq else 1)
                raw = body[i + 1 : i + 1 + n]
                vals = (
                    np.frombuffer(raw, ">u2") if pq
                    else np.frombuffer(raw, np.uint8)
                ).astype(np.int32)
                tab = np.zeros(64, np.int32)
                tab[_ZIGZAG] = vals
                qtabs[tq] = tab.reshape(8, 8)
                i += 1 + n
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                (dc_tabs if cls == 0 else ac_tabs)[tid] = _HuffDecode(
                    bits, vals
                )
                i += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
            prec, fh, fw, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            comps = []
            for ci in range(nc):
                cid, sf, tq = struct.unpack_from(">BBB", body, 6 + 3 * ci)
                comps.append({
                    "id": cid, "h": sf >> 4, "v": sf & 0xF, "tq": tq,
                })
            sof = (fh, fw, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "unsupported JPEG mode (arithmetic/lossless/"
                "hierarchical) — plug libjpeg in at this seam"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if sof is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            scan = {}
            for si in range(ns):
                cid, tabs = struct.unpack_from(">BB", body, 1 + 2 * si)
                scan[cid] = (tabs >> 4, tabs & 0xF)
            if not progressive:
                return _decode_scan(
                    buf, pos + 2 + seglen, sof, scan, qtabs, dc_tabs,
                    ac_tabs, restart_interval,
                )
            ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            if prog is None:
                prog = _init_prog(sof)
            pos = _decode_scan_progressive(
                buf, pos + 2 + seglen, sof, scan,
                (ss, se, ahal >> 4, ahal & 0xF),
                dc_tabs, ac_tabs, restart_interval, prog,
            )
            continue
        pos += 2 + seglen
    if progressive and prog is not None and prog["scans"]:
        fh, fw, comps = sof
        return _render_planes(
            comps, qtabs, fh, fw,
            max(c["h"] for c in comps), max(c["v"] for c in comps),
        )
    raise ValueError("JPEG has no scan")


def _decode_scan(
    buf, pos, sof, scan, qtabs, dc_tabs, ac_tabs, restart_interval
) -> np.ndarray:
    fh, fw, comps = sof
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))
    for c in comps:
        c["bw"] = mcus_x * c["h"]  # blocks across
        c["bh"] = mcus_y * c["v"]
        c["zz"] = np.zeros((c["bh"] * c["bw"], 64), np.int32)
        c["dct"], c["act"] = scan[c["id"]]
    br = _BitReader(buf, pos)
    pred = [0] * len(comps)
    mcu_i = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                br.restart()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                dct = dc_tabs[c["dct"]]
                act = ac_tabs[c["act"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = c["zz"][
                            (my * c["v"] + by) * c["bw"] + mx * c["h"] + bx
                        ]
                        size = dct.decode(br)
                        diff = _extend(br.bits(size), size)
                        pred[ci] += diff
                        blk[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = act.decode(br)
                            run, size = rs >> 4, rs & 0xF
                            if size == 0:
                                if run == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            blk[k] = _extend(br.bits(size), size)
                            k += 1
            mcu_i += 1
    return _render_planes(comps, qtabs, fh, fw, hmax, vmax)


def _render_planes(comps, qtabs, fh, fw, hmax, vmax) -> np.ndarray:
    """Dequantize + IDCT each component's accumulated zigzag
    coefficients (one einsum over all blocks), upsample subsampled
    chroma to the MCU lattice, crop to frame dims, convert to RGB."""
    planes = []
    for c in comps:
        coef = np.zeros((len(c["zz"]), 64), np.float64)
        coef[:, _ZIGZAG] = c["zz"] * qtabs[c["tq"]].reshape(-1)[_ZIGZAG]
        blocks = coef.reshape(-1, 8, 8)
        spatial = np.einsum("in,bnk,kj->bij", _DCT_B, blocks, _DCT_B.T)
        plane = _deblockify(spatial + 128.0, c["bh"] * 8, c["bw"] * 8)
        # upsample to full MCU grid resolution
        fy, fx = vmax // c["v"], hmax // c["h"]
        if fy > 1 or fx > 1:
            plane = plane.repeat(fy, axis=0).repeat(fx, axis=1)
        planes.append(plane[:fh, :fw])
    if len(planes) == 1:
        return np.clip(planes[0], 0, 255).astype(np.uint8)[..., None]
    return _ycbcr_to_rgb(planes[0], planes[1], planes[2])


def _init_prog(sof) -> dict:
    """Allocate per-component coefficient accumulators for a
    progressive (SOF2) frame. Interleaved (DC) scans cover the full
    padded MCU lattice; single-component scans cover only the blocks
    needed for the image (`nbw` x `nbh`, T.81 A.2.2)."""
    fh, fw, comps = sof
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))
    for c in comps:
        c["bw"] = mcus_x * c["h"]
        c["bh"] = mcus_y * c["v"]
        c["zz"] = np.zeros((c["bh"] * c["bw"], 64), np.int32)
        cw = -(-(fw * c["h"]) // hmax)
        ch = -(-(fh * c["v"]) // vmax)
        c["nbw"] = -(-cw // 8)
        c["nbh"] = -(-ch // 8)
    return {"scans": 0, "mcus_x": mcus_x, "mcus_y": mcus_y}


def _decode_scan_progressive(
    buf, pos, sof, scan, spec, dc_tabs, ac_tabs, restart_interval, prog
) -> int:
    """Decode one progressive scan (T.81 G.2): DC first/refine
    (interleaved or single-component) or AC first/refine with EOB-run
    coding, accumulating into each component's coefficient array.
    Returns the offset of the next marker segment."""
    ss, se, ah, al = spec
    _fh, _fw, comps = sof
    scomps = [c for c in comps if c["id"] in scan]
    br = _BitReader(buf, pos)
    if ss == 0:
        if se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        _prog_dc_scan(br, scomps, scan, dc_tabs, ah, al,
                      restart_interval, prog)
    else:
        if len(scomps) != 1:
            raise ValueError("progressive AC scan must be one component")
        _prog_ac_scan(br, scomps[0], scan, ac_tabs, ss, se, ah, al,
                      restart_interval)
    prog["scans"] += 1
    # entropy bytes can't contain FF followed by a non-stuff/non-RST
    # byte, so the first such pair at/after br.pos is the next marker
    p = br.pos
    while p + 1 < len(buf):
        if buf[p] == 0xFF and buf[p + 1] != 0x00 and not (
            0xD0 <= buf[p + 1] <= 0xD7
        ):
            return p
        p += 1
    return len(buf)


def _prog_dc_scan(br, scomps, scan, dc_tabs, ah, al, ri, prog) -> None:
    """DC scan: first pass (Ah=0) decodes diffs shifted left by Al;
    refinement passes append one bit per block at position Al
    (G.2.1 / G.2.3; the |= works because prior passes leave bit Al
    clear in two's complement)."""
    pred = {c["id"]: 0 for c in scomps}

    def block(c, idx):
        blk = c["zz"][idx]
        if ah == 0:
            size = dc_tabs[scan[c["id"]][0]].decode(br)
            diff = _extend(br.bits(size), size)
            pred[c["id"]] += diff
            blk[0] = pred[c["id"]] << al
        elif br.bits(1):
            blk[0] |= 1 << al

    if len(scomps) > 1:  # interleaved: MCU order over all components
        n = 0
        for my in range(prog["mcus_y"]):
            for mx in range(prog["mcus_x"]):
                if ri and n and n % ri == 0:
                    br.restart()
                    for k in pred:
                        pred[k] = 0
                for c in scomps:
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            block(c, (my * c["v"] + by) * c["bw"]
                                  + mx * c["h"] + bx)
                n += 1
    else:  # non-interleaved: the component's own block raster
        c = scomps[0]
        n = 0
        for row in range(c["nbh"]):
            for col in range(c["nbw"]):
                if ri and n and n % ri == 0:
                    br.restart()
                    pred[c["id"]] = 0
                block(c, row * c["bw"] + col)
                n += 1


def _prog_ac_scan(br, c, scan, ac_tabs, ss, se, ah, al, ri) -> None:
    """AC scan over one component's block raster. First pass (Ah=0,
    G.2.2): run/size symbols place coefficients shifted by Al; size=0
    symbols encode EOB runs of 2^r (+r appended bits) blocks. Refine
    pass (G.2.3): one correction bit per already-nonzero coefficient,
    size=1 symbols introduce newly-significant +-2^Al coefficients."""
    act = ac_tabs[scan[c["id"]][1]]
    eobrun = 0
    p1, m1 = 1 << al, -(1 << al)
    n = 0
    for row in range(c["nbh"]):
        for col in range(c["nbw"]):
            if ri and n and n % ri == 0:
                br.restart()
                eobrun = 0
            n += 1
            blk = c["zz"][row * c["bw"] + col]
            if ah == 0:  # first pass for this band
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = act.decode(br)
                    r, s = rs >> 4, rs & 0xF
                    if s:
                        k += r
                        if k > se:
                            raise ValueError("JPEG AC band overflow")
                        blk[k] = _extend(br.bits(s), s) << al
                        k += 1
                    elif r != 15:
                        eobrun = (1 << r) - 1  # this block is a member
                        if r:
                            eobrun += br.bits(r)
                        break
                    else:
                        k += 16  # ZRL
                continue
            # refinement pass: correction bits for history coefficients
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = act.decode(br)
                    r, s = rs >> 4, rs & 0xF
                    sval = 0
                    if s:
                        if s != 1:
                            raise ValueError("bad refine symbol size")
                        sval = p1 if br.bits(1) else m1
                    elif r != 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += br.bits(r)
                        break  # tail below refines the rest of the band
                    # advance past r zero-history coefficients, reading
                    # a correction bit at each nonzero-history one
                    while k <= se:
                        v = int(blk[k])
                        if v != 0:
                            if br.bits(1) and (v & p1) == 0:
                                blk[k] = v + (p1 if v >= 0 else m1)
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if sval and k <= se:
                        blk[k] = sval
                    k += 1
            if eobrun > 0:
                while k <= se:  # EOB run still refines nonzero history
                    v = int(blk[k])
                    if v != 0 and br.bits(1) and (v & p1) == 0:
                        blk[k] = v + (p1 if v >= 0 else m1)
                    k += 1
                eobrun -= 1
