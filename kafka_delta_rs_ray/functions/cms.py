"""Mergeable count-min sketch over int64 keys, numpy-vectorized.

The frequency twin of the bloom filter (functions/bloom.py): d hash
rows × w counters, per-batch partial sketches are pure element-wise
SUMS — so they merge associatively through the same two-level reduce
tree the bloom build uses — and a point query is the MIN over the d
rows. Estimates only OVERCOUNT (est ≥ true, overcount ≤ e·N/w with
probability 1−e^−d), which is exactly the guarantee a
frequency-threshold prune needs: keys at/above the true threshold
are NEVER dropped, so a second exact pass over the survivors returns
the precise answer while the first pass's exchange shrank from
all-keys to near-qualifying keys.

Hashing reuses the Kirsch-Mitzenmacher double-hash construction from
the bloom module: row_i position = (h1 + i·h2) mod w in uint64 numpy
arithmetic, one vectorized pass per row.
"""

from __future__ import annotations

import numpy as np

from .bloom import _h1h2

D_ROWS = 4


def cms_width(n_rows: int, threshold: int, slack: int = 4) -> int:
    """Power-of-two counter width sized so the expected overcount
    (~n_rows/w per row, min over D_ROWS rows) stays well under
    ``threshold``: w ≥ slack·n_rows/threshold (min 1024). The sketch
    is D_ROWS × w int64 no matter how many keys exist."""
    w = 1024
    while w * threshold < n_rows * slack:
        w <<= 1
    return w


def cms_insert(counts: np.ndarray, keys: np.ndarray,
               weights: np.ndarray | None = None) -> None:
    """Add ``keys`` (optionally with int64 ``weights``) into the
    (D_ROWS, w) int64 sketch in place."""
    d, w = counts.shape
    h1, h2 = _h1h2(keys)
    if weights is None:
        weights = np.ones(len(keys), dtype=np.int64)
    for i in range(d):
        with np.errstate(over="ignore"):
            pos = ((h1 + np.uint64(i) * h2) % np.uint64(w))
        np.add.at(counts[i], pos.astype(np.int64), weights)


def cms_query(counts: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Point estimates for ``keys``: min over the d rows (≥ true)."""
    d, w = counts.shape
    h1, h2 = _h1h2(keys)
    est = np.full(len(keys), np.iinfo(np.int64).max, dtype=np.int64)
    for i in range(d):
        with np.errstate(over="ignore"):
            pos = ((h1 + np.uint64(i) * h2) % np.uint64(w))
        np.minimum(est, counts[i][pos.astype(np.int64)], out=est)
    return est
