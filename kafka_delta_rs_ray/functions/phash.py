"""Deterministic 64-bit perceptual hash (pure numpy).

Block-mean hash: grayscale → 8×8 block means → bit = (block mean >
global mean). Similar images (same pattern at any of our sizes) map to
the same or nearby hashes, which is what the Z-order clustering key
needs. Defined by us (the reference has no image concept); stable
across runs by construction.
"""

from __future__ import annotations

import numpy as np


def phash64(img: np.ndarray) -> int:
    """64-bit block-mean perceptual hash of an (h, w[, c]) uint8 image.

    Returned as a Python int in int64 two's-complement range so it can be
    stored in the table's ``phash:int64`` column directly.
    """
    a = np.asarray(img, dtype=np.float64)
    if a.ndim == 3:
        a = a.mean(axis=2)
    h, w = a.shape
    # 8×8 block means; crop to a multiple of 8 (all our sizes are already).
    bh, bw = (h // 8) * 8, (w // 8) * 8
    a = a[:bh, :bw].reshape(8, bh // 8, 8, bw // 8).mean(axis=(1, 3))
    bits = (a > a.mean()).ravel()
    packed = np.packbits(bits)  # 8 bytes, bit 0 of the hash = MSB of byte 0
    v = int(packed.view(">u8")[0])
    return v - (1 << 64) if v >= (1 << 63) else v  # two's-complement int64


def phash64_batch(imgs: list[np.ndarray]) -> np.ndarray:
    """phash64 over a list of images → int64 array."""
    return np.array([phash64(im) for im in imgs], dtype=np.int64)
