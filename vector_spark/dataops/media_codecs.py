"""Pure-python/numpy media kernels for the multimodal pipeline.

No PIL/ffmpeg exists in this environment, but several real media
formats need nothing beyond numpy and the stdlib:

* PPM (P6)           — header + raw RGB24 rows (image decode/encode)
* BMP (24-bit, BI_RGB) — fixed 54-byte header, bottom-up padded rows
* WAV (PCM16)        — stdlib `wave` module framing + numpy samples

plus real kernels over the decoded arrays: nearest-neighbor resize
(numpy index sampling — no per-pixel Python), image feature vectors
(per-channel statistics + coarse luminance grid), and audio feature
vectors (RMS / zero-crossing rate / FFT band energies). These are the
`decode=real` path of dataops/multimodal.py; formats that genuinely
need a codec library (PNG/JPEG/MP4) still fail at the marked seam.

Everything here is deterministic: the same payload always yields the
same features, so results are testable byte-for-byte.
"""

from __future__ import annotations

import io
import struct
import wave

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
