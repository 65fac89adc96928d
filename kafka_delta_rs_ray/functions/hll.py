"""HyperLogLog sketch — the partial-aggregatable distinct-count
estimator (Flajolet et al. 2007, public algorithm).

The distributed shape is the whole point: every batch folds its keys
into a fixed 2^p-byte register array (map side), register arrays merge
by element-wise max (any tree/reduce order), and ONE tiny array on the
driver yields the estimate. Exact distinct-count needs an all-to-all
shuffle of every key; the sketch exchanges 2^p bytes per block no
matter how many rows — at 10^12 rows that is the difference between a
global shuffle and a metadata-sized reduce.

Pure numpy, vectorized per batch. Standard bias corrections: linear
counting below 2.5m, the 2^32 correction is omitted (we hash to 64
bits, collisions negligible).
"""

from __future__ import annotations

import numpy as np

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)
_C1 = np.uint64(0xBF58476D1CE4E5B9)
_C2 = np.uint64(0x94D049BB133111EB)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — avalanche int64 keys to uniform u64."""
    z = x.astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * _C1 & _MASK64
    z = (z ^ (z >> np.uint64(27))) * _C2 & _MASK64
    return z ^ (z >> np.uint64(31))


def empty_registers(p: int = 12) -> np.ndarray:
    return np.zeros(1 << p, np.uint8)


def add_hashed(regs: np.ndarray, keys: np.ndarray, p: int = 12) -> None:
    """Fold int64 keys into the register array, vectorized, in place."""
    if len(keys) == 0:
        return
    h = _mix64(np.asarray(keys, np.int64))
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) & _MASK64
    # rank = leading zeros of the remaining 64-p bits, +1 (capped)
    rank = np.full(len(h), 64 - p + 1, np.uint8)
    nz = rest != 0
    if nz.any():
        # position of highest set bit via float log2 is unsafe at 64
        # bits; use a halving loop (6 steps, fully vectorized)
        r = rest[nz]
        lz = np.zeros(len(r), np.uint8)
        for shift in (32, 16, 8, 4, 2, 1):
            m = r < (np.uint64(1) << np.uint64(64 - shift))
            lz[m] += np.uint8(shift)
            r[m] = (r[m] << np.uint64(shift)) & _MASK64
        rank[nz] = lz + 1
    np.maximum.at(regs, idx, rank)


def merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def estimate(regs: np.ndarray) -> float:
    m = float(len(regs))
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / float(np.sum(2.0 ** (-regs.astype(np.float64))))
    zeros = int(np.sum(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting regime
    return est
