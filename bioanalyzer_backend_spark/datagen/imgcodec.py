"""Pure-numpy image codecs (no PIL in the sandbox — SURVEY.md section 7).

Two uncompressed formats:
  * BMP: 24-bit BI_RGB, bottom-up rows, 4-byte row padding;
  * PPM: binary P6.

Encode/decode round-trip exactly, so the pipeline's binary pass-through
invariant (decoded-pixel allclose / PSNR >= 40 dB, BASELINE.json
input_hint) is checkable without external imaging libs.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_bmp(pixels: np.ndarray) -> bytes:
    """pixels: (h, w, 3) uint8 RGB -> BMP bytes."""
    h, w, _ = pixels.shape
    row_bytes = w * 3
    pad = (4 - row_bytes % 4) % 4
    img_size = (row_bytes + pad) * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                       2835, 2835, 0, 0)
    # BGR, bottom-up, padded rows
    bgr = pixels[::-1, :, ::-1]
    if pad:
        rows = np.zeros((h, row_bytes + pad), dtype=np.uint8)
        rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
        body = rows.tobytes()
    else:
        body = bgr.tobytes()
    return header + info + body


def decode_bmp(data: bytes) -> np.ndarray:
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    offset = struct.unpack_from("<I", data, 10)[0]
    w = struct.unpack_from("<i", data, 18)[0]
    h = struct.unpack_from("<i", data, 22)[0]
    bpp = struct.unpack_from("<H", data, 28)[0]
    if bpp != 24:
        raise ValueError(f"unsupported bpp {bpp}")
    row_bytes = w * 3
    stride = row_bytes + (4 - row_bytes % 4) % 4
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=offset)
    rows = rows.reshape(h, stride)[:, :row_bytes].reshape(h, w, 3)
    return rows[::-1, :, ::-1].copy()


def encode_ppm(pixels: np.ndarray) -> bytes:
    h, w, _ = pixels.shape
    return f"P6\n{w} {h}\n255\n".encode() + pixels.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    parts = data.split(b"\n", 3)
    w, h = (int(x) for x in parts[1].split())
    body = parts[3]
    return np.frombuffer(body, dtype=np.uint8, count=h * w * 3).reshape(h, w, 3).copy()


def decode(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "bmp":
        return decode_bmp(data)
    if fmt == "ppm":
        return decode_ppm(data)
    raise ValueError(f"unknown fmt {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0 ** 2 / mse))
