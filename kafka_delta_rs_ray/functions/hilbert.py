"""Vectorized 63-bit 3D Hilbert-curve encoding.

The north_star names "Z-order/Hilbert clustering"; Morton (Z-order) is
the default key and this module provides the Hilbert alternative:
same 21-bit × 3 packing, but consecutive codes always differ by ONE
unit step in ONE coordinate (curve continuity), which yields tighter
per-fragment bounding boxes — measurably fewer fragments overlap a
range predicate on skewed keys than under Morton's diagonal jumps.

Algorithm: Skilling's axes→transpose transform (John Skilling,
"Programming the Hilbert curve", AIP Conf. Proc. 707, 2004 — public
method, reimplemented from the paper's description), vectorized over
rows with numpy: the per-bit loop runs 21 × 3 cheap array ops
regardless of row count; no per-row Python.
"""

from __future__ import annotations

import numpy as np

from .morton import _spread3

BITS = 21
_M21 = np.uint64((1 << BITS) - 1)


def _axes_to_transpose(x: np.ndarray, y: np.ndarray,
                       z: np.ndarray) -> list[np.ndarray]:
    """Skilling's AxesToTranspose, vectorized: coordinates → the
    'transpose' form whose bit-interleave is the Hilbert index."""
    X = [x.astype(np.uint64) & _M21,
         y.astype(np.uint64) & _M21,
         z.astype(np.uint64) & _M21]
    n = 3
    # inverse-undo excess work
    q = np.uint64(1) << np.uint64(BITS - 1)
    one = np.uint64(1)
    while q > one:
        p = q - one
        for i in range(n):
            hi = (X[i] & q) != 0
            # where bit set: invert low bits of X[0]; else exchange
            # low bits of X[0] and X[i]
            t = (X[0] ^ X[i]) & p
            X[0] = np.where(hi, X[0] ^ p, X[0] ^ t)
            X[i] = np.where(hi, X[i], X[i] ^ t)
        q >>= one
    # Gray encode
    for i in range(1, n):
        X[i] ^= X[i - 1]
    t2 = np.zeros_like(X[0])
    q = np.uint64(1) << np.uint64(BITS - 1)
    while q > one:
        t2 = np.where((X[n - 1] & q) != 0, t2 ^ (q - one), t2)
        q >>= one
    for i in range(n):
        X[i] ^= t2
    return X


def hilbert3_21(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Hilbert index of three 21-bit uint arrays → uint64 (63 bits).

    Bit layout matches Skilling's transpose order: within each bit
    triple the FIRST axis holds the most significant bit, so the
    interleave is morton(c', b', a') of the transposed coordinates.
    """
    X = _axes_to_transpose(a, b, c)
    return (_spread3(X[2]) | (_spread3(X[1]) << np.uint64(1))
            | (_spread3(X[0]) << np.uint64(2)))


def hcode_from_columns(phash: np.ndarray, w: np.ndarray,
                       h: np.ndarray) -> np.ndarray:
    """Hilbert analog of morton.zcode_from_columns: same
    (top-21-bits(phash), w, h) inputs, int64 sort key out."""
    p = phash.astype(np.int64).view(np.uint64) >> np.uint64(43)
    return hilbert3_21(p, w.astype(np.uint64),
                       h.astype(np.uint64)).view(np.int64)
