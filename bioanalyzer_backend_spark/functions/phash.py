"""Deterministic 64-bit perceptual-hash stand-in (average hash).

8x8 block-mean grayscale -> bit per cell vs. global mean -> int64.
Used by the synth generator to stamp `phash` and by tests to re-derive
it from decoded bytes. Pure numpy; stable across platforms.
"""

from __future__ import annotations

import numpy as np


def average_hash(pixels: np.ndarray) -> int:
    """pixels: (h, w, 3) uint8 -> signed 64-bit average-hash."""
    gray = pixels.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    # block-mean downsample to 8x8 via index binning (works for any dims)
    yi = (np.arange(h) * 8 // max(h, 1)).clip(0, 7)
    xi = (np.arange(w) * 8 // max(w, 1)).clip(0, 7)
    acc = np.zeros((8, 8))
    cnt = np.zeros((8, 8))
    np.add.at(acc, (yi[:, None].repeat(w, 1), xi[None, :].repeat(h, 0)), gray)
    np.add.at(cnt, (yi[:, None].repeat(w, 1), xi[None, :].repeat(h, 0)), 1.0)
    cell = acc / np.maximum(cnt, 1.0)
    bits = (cell > cell.mean()).flatten()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    # to signed int64 (Spark LongType)
    if v >= 1 << 63:
        v -= 1 << 64
    return v
