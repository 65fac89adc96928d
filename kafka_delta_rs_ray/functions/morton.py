"""Vectorized 64-bit Morton (Z-order) encoding.

The clustering key for the image table is a 63-bit interleave of three
21-bit dimensions: the top 21 bits of ``phash``, and ``w`` / ``h``
(north_star: "Z-order/Hilbert clustering via 64-bit Morton interleave
of (phash, w, h)"). All operations are numpy uint64 bit twiddling —
no Python loops — so this runs inside ``map_batches`` at full speed.
"""

from __future__ import annotations

import numpy as np

_M21 = np.uint64(0x1FFFFF)


def _spread3(x: np.ndarray) -> np.ndarray:
    """Spread the low 21 bits of each uint64 so consecutive bits land 3 apart."""
    x = x.astype(np.uint64) & _M21
    x = (x | (x << np.uint64(32))) & np.uint64(0x1F00000000FFFF)
    x = (x | (x << np.uint64(16))) & np.uint64(0x1F0000FF0000FF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x100F00F00F00F00F)
    x = (x | (x << np.uint64(4))) & np.uint64(0x10C30C30C30C30C3)
    x = (x | (x << np.uint64(2))) & np.uint64(0x1249249249249249)
    return x


def morton3_21(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Interleave three 21-bit uint arrays into one uint64 Morton code.

    Bit layout (LSB first): a0 b0 c0 a1 b1 c1 ... — 63 bits total, so the
    result always fits a non-negative int64 (safe as an Arrow int64 sort key).
    """
    return _spread3(a) | (_spread3(b) << np.uint64(1)) | (_spread3(c) << np.uint64(2))


def zcode_from_columns(phash: np.ndarray, w: np.ndarray, h: np.ndarray) -> np.ndarray:
    """zcode = morton3_21(top-21-bits(phash), w, h) as int64.

    ``phash`` arrives as int64 (two's-complement view of the 64-bit hash);
    its high bits carry the coarse perceptual structure, so we use the top
    21. ``w``/``h`` are small int32 pixel dims (<= 2^21 always).
    """
    p = phash.astype(np.int64).view(np.uint64) >> np.uint64(43)
    return morton3_21(p, w.astype(np.uint64), h.astype(np.uint64)).view(np.int64)
