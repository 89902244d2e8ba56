"""Image payload functions: codecs, perceptual hash, PSNR, quality score.

The payload table is ``images(image_id, bytes:binary, w, h, fmt, caption,
phash)`` per BASELINE.json input_hint. Spark has no image type: ``bytes`` is
opaque BinaryType and every decode/feature step runs inside Arrow-batched
pandas UDFs over numpy arrays.

Codec availability in this container: PIL/opencv are NOT installed, so
- ``png`` rows use a REAL minimal PNG codec (zlib + struct, filter-0
  scanlines) — lossless, byte-exact round-trip;
- ``jpeg`` rows use a clearly-marked DETERMINISTIC FAKE lossy codec
  (6-bit quantization + zlib). Its reconstruction error is uniform in
  [-2, +1] per channel → PSNR ≈ 46 dB, comfortably above the ≥40 dB
  invariant the input_hint requires of lossy formats. Swap ``encode_jpeg``
  / ``decode_jpeg`` for a real libjpeg binding in production; every other
  stage (schema, partitioning, UDF batch shape) is real.

The BRISQUE gate of the reference (score ≤ 50 keeps the image,
/root/reference/src/newsutils/pipelines.py:189-205, threshold at
src/newsutils/conf/posts.py:154) is reproduced with a deterministic
contrast-statistics proxy — the real BRISQUE model is a library the
container lacks; the *filter semantics* (threshold, error policy) are real.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_FAKE_JPEG_MAGIC = b"FJPG"


# ---------------------------------------------------------------------------
# codecs (pure numpy; called from pandas UDF batches)

def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(rgb: np.ndarray) -> bytes:
    """Minimal real PNG (8-bit RGB, filter 0). Lossless."""
    h, w, _ = rgb.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), rgb.reshape(h, w * 3)], axis=1
    ).tobytes()
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    if not data.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    pos, w, h, idat = len(_PNG_SIG), 0, 0, b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, bit_depth, color = struct.unpack(">IIBB", payload[:10])
            if bit_depth != 8 or color != 2:
                raise ValueError("unsupported PNG variant")
        elif tag == b"IDAT":
            idat += payload
        pos += 12 + length
    rows = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, w * 3 + 1)
    if rows[:, 0].any():
        raise ValueError("unsupported PNG filter")
    return rows[:, 1:].reshape(h, w, 3).copy()


def encode_jpeg(rgb: np.ndarray) -> bytes:
    """DETERMINISTIC FAKE lossy codec (see module docstring): 6-bit
    quantization per channel + zlib. Stands in for libjpeg q85."""
    h, w, _ = rgb.shape
    q = (rgb >> 2).astype(np.uint8)
    return _FAKE_JPEG_MAGIC + struct.pack(">II", w, h) + zlib.compress(q.tobytes(), 6)


def decode_jpeg(data: bytes) -> np.ndarray:
    if not data.startswith(_FAKE_JPEG_MAGIC):
        raise ValueError("not a fake-jpeg payload")
    w, h = struct.unpack(">II", data[4:12])
    q = np.frombuffer(zlib.decompress(data[12:]), dtype=np.uint8).reshape(h, w, 3)
    return np.minimum(q.astype(np.uint16) * 4 + 2, 255).astype(np.uint8)


def encode_image(rgb: np.ndarray, fmt: str) -> bytes:
    return encode_png(rgb) if fmt == "png" else encode_jpeg(rgb)


def decode_image(data: bytes) -> np.ndarray:
    """Dispatch on magic bytes (fmt column is advisory, payload is truth)."""
    if data.startswith(_PNG_SIG):
        return decode_png(data)
    if data.startswith(_FAKE_JPEG_MAGIC):
        return decode_jpeg(data)
    raise ValueError("undecodable image payload")


# ---------------------------------------------------------------------------
# features

def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB (input_hint per-row invariant)."""
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


def phash64(rgb: np.ndarray) -> int:
    """Perceptual-hash-like 64-bit signature: 8x8 mean-pooled grayscale
    thresholded at its mean (deterministic function of the pixels)."""
    gray = rgb.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    grid = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            grid[i, j] = gray[ys[i] : max(ys[i + 1], ys[i] + 1),
                              xs[j] : max(xs[j + 1], xs[j] + 1)].mean()
    bits = (grid > grid.mean()).flatten()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return val - (1 << 64) if val >= (1 << 63) else val


def brisque_score_stub(rgb: np.ndarray) -> float:
    """Deterministic stand-in for BRISQUE (lower = more natural, 0-100).

    Uses MSCN-flavoured local-contrast statistics: natural images have
    moderate local variance; flat or pure-noise images score high. The
    reference keeps an image iff score <= 50
    (/root/reference/src/newsutils/pipelines.py:189-205).
    """
    gray = rgb.astype(np.float64).mean(axis=2)
    dx = np.diff(gray, axis=1)
    dy = np.diff(gray, axis=0)
    contrast = (np.abs(dx).mean() + np.abs(dy).mean()) / 2.0
    # natural-ish contrast band ~[2, 40]; distance from band → score
    if contrast < 2.0:
        return float(min(100.0, 50.0 + (2.0 - contrast) * 40.0))
    if contrast > 40.0:
        return float(min(100.0, 50.0 + (contrast - 40.0)))
    return float(50.0 * (1.0 - (min(contrast, 40.0) - 2.0) / 38.0) * 0.9)
