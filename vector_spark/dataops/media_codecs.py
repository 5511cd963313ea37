"""Pure-python/numpy media kernels for the multimodal pipeline.

No PIL/ffmpeg exists in this environment, but several real media
formats need nothing beyond numpy and the stdlib:

* PPM (P6)           — header + raw RGB24 rows (image decode/encode)
* BMP (24-bit, BI_RGB) — fixed 54-byte header, bottom-up padded rows
* PNG (8-bit, non-interlaced, gray/RGB/RGBA) — stdlib zlib inflate +
  per-scanline unfiltering (all five filters), zlib/CRC32 encode
* WAV (PCM16)        — stdlib `wave` module framing + numpy samples

plus real kernels over the decoded arrays: nearest-neighbor resize
(numpy index sampling — no per-pixel Python), image feature vectors
(per-channel statistics + coarse luminance grid), and audio feature
vectors (RMS / zero-crossing rate / FFT band energies). These are the
`decode=real` path of dataops/multimodal.py; formats that genuinely
need a codec library (JPEG/MP4) still fail at the marked seam.

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
# PNG (8-bit, non-interlaced) — stdlib zlib + struct, no PIL
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


def decode_png(buf: bytes) -> np.ndarray:
    """Baseline PNG -> (h, w, channels) uint8 (grayscale decodes to
    (h, w, 1)). Supports the common web baseline: bit depth 8,
    non-interlaced, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
    6 (RGBA); all five scanline filters (None/Sub/Up/Average/Paeth).
    Palette (3), 16-bit and Adam7 interlacing stay out of scope —
    they raise with the feature named."""
    if not buf.startswith(_PNG_SIG):
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idats = len(_PNG_SIG), None, []
    while pos + 8 <= len(buf):
        (length,) = struct.unpack_from(">I", buf, pos)
        tag = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + data + crc
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idats.append(data)
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"unsupported PNG bit depth {depth} (only 8)")
    if interlace:
        raise ValueError("unsupported PNG: Adam7 interlacing")
    if comp or filt:
        raise ValueError("unsupported PNG compression/filter method")
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {ctype} (palette?)")
    raw = zlib.decompress(b"".join(idats))
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
    return out.reshape(h, w, channels)


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


def decode_wav_pcm16(buf: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (mono int16 samples, sample_rate). Multi-channel
    input is averaged down to mono."""
    with wave.open(io.BytesIO(buf), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise ValueError(f"unsupported sample width {wf.getsampwidth()}")
        rate = wf.getframerate()
        n = wf.getnframes()
        raw = np.frombuffer(wf.readframes(n), dtype="<i2")
        ch = wf.getnchannels()
    if ch > 1:
        raw = raw.reshape(-1, ch).mean(axis=1).astype(np.int16)
    return raw.copy(), rate


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
