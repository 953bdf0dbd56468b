"""Pure-stdlib media codecs: 24-bit BMP + baseline PNG (image) and
PCM WAV (audio).

The container has no image/audio libraries, but these formats need
none — BMP is a fixed header plus raw padded pixel rows, WAV is a
RIFF header plus raw PCM, and baseline PNG (8-bit RGB/RGBA,
non-interlaced) is zlib-deflated scanlines behind CRC-stamped chunks,
all of which stdlib ``zlib`` + ``struct`` cover (r10: the earlier
"compressed formats need libraries" stance was too pessimistic for
PNG).  The multimodal pipeline gets REAL decode → transform → encode
paths for BMP/PNG/WAV (numpy for the pixel math), while JPEG/MP4
remain stubbed behind ``use_real_codecs`` with a clear error.

Everything here is deterministic and side-effect free; the Spark
operators in multimodal.py call these inside Arrow-batched
mapInPandas stages.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# BMP (Windows BITMAPINFOHEADER, 24 bpp, bottom-up, no compression)
# ---------------------------------------------------------------------------

_BMP_HEADER = struct.Struct("<2sIHHI")  # signature, file size, res, res, data offset
_BMP_INFO = struct.Struct("<IiiHHIIiiII")


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → 24-bit BMP bytes (rows bottom-up,
    4-byte padded, BGR byte order — the format's native layout)."""
    h, w, c = pixels.shape
    if c != 3:
        raise ValueError("encode_bmp expects (H, W, 3) RGB")
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    stride = row_bytes + pad
    data_size = stride * h
    offset = _BMP_HEADER.size + _BMP_INFO.size
    header = _BMP_HEADER.pack(b"BM", offset + data_size, 0, 0, offset)
    info = _BMP_INFO.pack(_BMP_INFO.size, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0)
    bgr = pixels[::-1, :, ::-1]  # bottom-up rows, RGB→BGR
    if pad:
        padded = np.zeros((h, stride), dtype=np.uint8)
        padded[:, :row_bytes] = bgr.reshape(h, row_bytes)
        body = padded.tobytes()
    else:
        body = bgr.tobytes()
    return header + info + body


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit BMP bytes → (H, W, 3) uint8 RGB."""
    sig, _, _, _, offset = _BMP_HEADER.unpack_from(data, 0)
    if sig != b"BM":
        raise ValueError("not a BMP payload")
    (
        hdr_size,
        w,
        h,
        _planes,
        bpp,
        compression,
        _img_size,
        _xp,
        _yp,
        _used,
        _important,
    ) = _BMP_INFO.unpack_from(data, _BMP_HEADER.size)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, compression={compression})")
    flipped = h > 0
    h = abs(h)
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    raw = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=offset)
    rows = raw.reshape(h, stride)[:, :row_bytes].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]  # BGR→RGB
    return rgb[::-1] if flipped else rgb


def resize_rgb_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize of (H, W, 3) → (height, width, 3) —
    the standard index-mapping definition (floor((i+0.5)*src/dst))."""
    h, w, _ = pixels.shape
    yi = np.minimum(((np.arange(height) + 0.5) * h / height).astype(np.int64), h - 1)
    xi = np.minimum(((np.arange(width) + 0.5) * w / width).astype(np.int64), w - 1)
    return pixels[yi][:, xi]


# ---------------------------------------------------------------------------
# PNG (baseline: 8-bit, RGB / RGBA, non-interlaced, filters 0-4)
#
# From-scratch per the public PNG format (W3C PNG spec / RFC 2083):
# signature, CRC-stamped chunks, IHDR geometry, IDAT = zlib-deflated
# scanlines each prefixed by a filter byte, the five scanline filters
# (None/Sub/Up/Average/Paeth).  Interlaced, paletted, and sub-8-bit
# variants raise — they are rare in data pipelines and would triple
# the surface; JPEG stays stubbed (a DCT codec is a different beast).
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (spec's tie-break order a, b, c)."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def encode_png(pixels: np.ndarray, filter_mode: str = "none") -> bytes:
    """(H, W, 3|4) uint8 → PNG bytes (8-bit RGB / RGBA,
    non-interlaced).  ``filter_mode='none'`` writes filter-0
    scanlines; ``'mixed'`` cycles filters 0..4 by row index so a
    decode of the output exercises every unfilter path."""
    h, w, c = pixels.shape
    if c not in (3, 4):
        raise ValueError("encode_png expects (H, W, 3|4) RGB/RGBA")
    color_type = 2 if c == 3 else 6
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.int64)
    zero_left = np.zeros(c, dtype=np.int64)
    for r in range(h):
        row = pixels[r].reshape(-1).astype(np.int64)
        f = (r % 5) if filter_mode == "mixed" else 0
        left = np.concatenate([zero_left, row[:-c]]) if w else row
        if f == 0:
            filt = row
        elif f == 1:  # Sub
            filt = row - left
        elif f == 2:  # Up
            filt = row - prev
        elif f == 3:  # Average
            filt = row - (left + prev) // 2
        else:  # Paeth
            upleft = np.concatenate([zero_left, prev[:-c]]) if w else prev
            filt = row - _paeth(left, prev, upleft)
        raw.append(f)
        raw.extend((filt % 256).astype(np.uint8).tobytes())
        prev = row
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """Baseline PNG bytes → (H, W, 3|4) uint8.  Verifies chunk CRCs;
    supports depth 8, color types 2 (RGB) / 6 (RGBA), non-interlaced,
    all five scanline filters (Sub unfilters as a per-lane cumulative
    sum; Average/Paeth walk pixels with the channel lane vectorized
    — images in this pipeline are thumbnails, rows are short)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos + 12 <= len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        ctype = bytes(data[pos + 4 : pos + 8])
        body = bytes(data[pos + 8 : pos + 8 + ln])
        if pos + 12 + ln > len(data):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", data, pos + 8 + ln)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT chunk")
    w, h, depth, color_type, comp, filt_method, interlace = ihdr
    if depth != 8 or color_type not in (2, 6) or comp != 0 or filt_method != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG variant (depth={depth}, color_type={color_type}, "
            f"interlace={interlace}) — baseline 8-bit RGB/RGBA only"
        )
    c = 3 if color_type == 2 else 4
    raw = zlib.decompress(bytes(idat))
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline data size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for r in range(h):
        f = raw[r * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=r * (stride + 1) + 1
        ).astype(np.int64)
        if f == 0:
            cur = line
        elif f == 1:  # Sub: per-lane cumulative sum
            cur = line.copy()
            for k in range(c):
                cur[k::c] = np.cumsum(cur[k::c])
        elif f == 2:  # Up
            cur = line + prev
        elif f == 3:  # Average
            cur = np.empty(stride, dtype=np.int64)
            cur[:c] = line[:c] + prev[:c] // 2
            for x in range(c, stride, c):
                cur[x : x + c] = line[x : x + c] + (
                    (cur[x - c : x] % 256) + prev[x : x + c]
                ) // 2
        elif f == 4:  # Paeth
            cur = np.empty(stride, dtype=np.int64)
            cur[:c] = line[:c] + _paeth(
                np.zeros(c, dtype=np.int64), prev[:c], np.zeros(c, dtype=np.int64)
            )
            for x in range(c, stride, c):
                cur[x : x + c] = line[x : x + c] + _paeth(
                    cur[x - c : x] % 256, prev[x : x + c], prev[x - c : x]
                )
        else:
            raise ValueError(f"PNG filter type {f} out of range")
        cur = cur % 256
        out[r] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(h, w, c)


# ---------------------------------------------------------------------------
# WAV (RIFF, uncompressed 16-bit PCM)
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """1-D int16 PCM samples → mono 16-bit WAV bytes."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    n = len(pcm)
    hdr = b"RIFF" + struct.pack("<I", 36 + n) + b"WAVE"
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16
    )
    return hdr + fmt + b"data" + struct.pack("<I", n) + pcm


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Mono/stereo 16-bit PCM WAV bytes → (samples int16 (N,) or
    (N, ch), sample_rate).  Walks RIFF chunks, so extra chunks
    (LIST/fact) are tolerated."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size % 2)
    if fmt is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, rate, _bps, _align, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"unsupported WAV variant (format={audio_format}, bits={bits})")
    samples = np.frombuffer(pcm, dtype="<i2")
    if channels > 1:
        samples = samples[: len(samples) - len(samples) % channels].reshape(
            -1, channels
        )
    return samples, rate


def wav_features(samples: np.ndarray) -> list[float]:
    """Real audio features from PCM: mean, RMS, peak, zero-crossing
    rate (mono-mixed first; normalized to [-1, 1])."""
    if samples.ndim > 1:
        samples = samples.mean(axis=1)
    x = samples.astype(np.float64) / 32768.0
    if len(x) == 0:
        return [0.0, 0.0, 0.0, 0.0]
    zc = float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8))))) if len(x) > 1 else 0.0
    return [
        float(np.mean(x)),
        float(np.sqrt(np.mean(x * x))),
        float(np.max(np.abs(x))),
        zc,
    ]


def resample_pcm(
    samples: np.ndarray, src_rate: int, dst_rate: int
) -> np.ndarray:
    """Linear-interpolation PCM resample (mono int16 → int16).
    Output length = floor(n * dst/src); sample t maps to source
    position t*src/dst and interpolates its two neighbors — the
    textbook definition, deterministic, no windowed filtering."""
    if samples.ndim > 1:
        samples = samples.mean(axis=1)
    n = len(samples)
    if n == 0 or src_rate == dst_rate:
        return samples.astype(np.int16)
    m = int(n * dst_rate / src_rate)
    pos = np.arange(m, dtype=np.float64) * src_rate / dst_rate
    i0 = np.minimum(pos.astype(np.int64), n - 1)
    i1 = np.minimum(i0 + 1, n - 1)
    frac = pos - i0
    x = samples.astype(np.float64)
    out = x[i0] * (1.0 - frac) + x[i1] * frac
    return np.clip(np.rint(out), -32768, 32767).astype(np.int16)


def crop_rgb(
    pixels: np.ndarray, x: int, y: int, width: int, height: int
) -> np.ndarray:
    """Crop (H, W, 3) to the [y:y+height, x:x+width] window; raises
    if the window leaves the image (no silent clamping)."""
    h, w, _ = pixels.shape
    if x < 0 or y < 0 or x + width > w or y + height > h:
        raise ValueError(f"crop window {x},{y},{width},{height} outside {w}x{h}")
    return pixels[y : y + height, x : x + width]


def letterbox_rgb(
    pixels: np.ndarray, width: int, height: int, fill: int = 0
) -> np.ndarray:
    """Aspect-preserving fit into (height, width): nearest-resize the
    longest-fitting scale, then center on a ``fill`` canvas — the
    standard model-input normalization that avoids distortion."""
    h, w, _ = pixels.shape
    scale = min(width / w, height / h)
    nw = max(int(w * scale), 1)
    nh = max(int(h * scale), 1)
    resized = resize_rgb_nearest(pixels, nw, nh)
    canvas = np.full((height, width, 3), fill, dtype=np.uint8)
    oy = (height - nh) // 2
    ox = (width - nw) // 2
    canvas[oy : oy + nh, ox : ox + nw] = resized
    return canvas
