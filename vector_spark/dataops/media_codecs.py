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
