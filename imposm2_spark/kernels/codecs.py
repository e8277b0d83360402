"""Pure-NumPy codecs for stdlib-decodable media byte layouts (T12 decode).

No image/audio libraries exist in this environment, so the engine ships its
own decoders for the two classic uncompressed formats whose byte layout is
public and trivial:

  * BMP — 24-bit uncompressed BITMAPINFOHEADER (BGR, bottom-up, rows padded
    to 4 bytes) -> (H, W, 3) uint8 RGB array.
  * WAV — RIFF/WAVE PCM mono 16-bit -> float64 samples in [-1, 1].

Encoders exist so tests and the synthetic media table can produce REAL
payloads and prove exact encode->decode round-trips. Everything is
vectorized NumPy over the payload buffer — these run inside Arrow batches
(functions.multimodal.media_features), never per-row Python in Spark.
"""

from __future__ import annotations

import struct

import numpy as np


# --------------------------------------------------------------------------
# BMP (24-bit, uncompressed)
# --------------------------------------------------------------------------
def encode_bmp(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> BMP file bytes (24bpp, bottom-up, BGR)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("pixels must be (H, W, 3)")
    h, w, _ = px.shape
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, RGB->BGR
    return header + info + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """BMP bytes -> (H, W, 3) uint8 RGB. Supports the layout encode_bmp emits
    (24bpp uncompressed BITMAPINFOHEADER); raises ValueError otherwise."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if hdr_size < 40 or bpp != 24 or compression != 0 or h <= 0 or w <= 0:
        raise ValueError("unsupported BMP variant (need 24bpp uncompressed)")
    row_size = (w * 3 + 3) & ~3
    data = np.frombuffer(payload, dtype=np.uint8, count=row_size * h, offset=offset)
    rows = data.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    return rows[::-1, :, ::-1].copy()  # bottom-up -> top-down, BGR -> RGB


# --------------------------------------------------------------------------
# WAV (RIFF PCM mono 16-bit)
# --------------------------------------------------------------------------
def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """int16 mono samples -> WAV file bytes (PCM, 16-bit)."""
    s = np.asarray(samples, dtype=np.int16)
    data = s.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(payload: bytes) -> np.ndarray:
    """WAV bytes -> float64 samples scaled to [-1, 1]. PCM mono 16-bit only."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, n = 12, len(payload)
    data = None
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, _rate, _, _, bits = struct.unpack_from("<HHIIHH", body, 0)
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError("unsupported WAV variant (need PCM mono 16-bit)")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if data is None:
        raise ValueError("WAV payload has no data chunk")
    return np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0


# --------------------------------------------------------------------------
# Feature extraction over decoded media (16 doubles each, matching
# functions.multimodal.N_FEATURES)
# --------------------------------------------------------------------------
def image_features(pixels: np.ndarray) -> np.ndarray:
    """(H, W, 3) uint8 -> [r/g/b mean, r/g/b std (all /255), 10-bucket
    luminance histogram] = 16 doubles."""
    px = pixels.astype(np.float64) / 255.0
    means = px.reshape(-1, 3).mean(axis=0)
    stds = px.reshape(-1, 3).std(axis=0)
    lum = px.reshape(-1, 3) @ np.array([0.299, 0.587, 0.114])
    hist = np.histogram(lum, bins=10, range=(0.0, 1.0))[0].astype(np.float64)
    hist = hist / max(lum.size, 1)
    return np.concatenate([means, stds, hist])


def audio_features(samples: np.ndarray) -> np.ndarray:
    """float samples in [-1,1] -> [mean, std, rms, zero-crossing rate,
    12-bucket |amplitude| histogram] = 16 doubles."""
    if samples.size == 0:
        return np.zeros(16, dtype=np.float64)
    mean = samples.mean()
    std = samples.std()
    rms = float(np.sqrt(np.mean(samples**2)))
    zcr = float(np.mean(np.signbit(samples[1:]) != np.signbit(samples[:-1])))
    hist = np.histogram(np.abs(samples), bins=12, range=(0.0, 1.0))[0].astype(np.float64)
    hist = hist / samples.size
    return np.concatenate([[mean, std, rms, zcr], hist])
