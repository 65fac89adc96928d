"""Mergeable Bloom filter over int64 keys, numpy-vectorized.

The classic shuffle-pruning sidecar for distributed semi-joins: the
small (build) side reduces to a FIXED-SIZE bit array — per-batch
partial filters are pure unions, so they merge associatively through
one tiny exchange regardless of build-side row count — and the big
(probe) side tests membership batch-locally against the broadcast
array, so only probable matches enter the join exchange. False
positives are possible (callers must re-verify exactly), false
negatives are not.

Sizing: with m bits, k hashes and n keys the false-positive rate is
~(1 - e^(-kn/m))^k; m = 16n bits with k = 8 gives ~6e-4. The array is
m/8 bytes no matter how many keys are inserted — at 100 TB the build
side's filter is still one object-store put.

Hashing is double hashing over two odd multiplicative mixes (the
Kirsch-Mitzenmacher construction): pos_i = (h1 + i*h2) mod m, all in
uint64 numpy arithmetic, so insert and test are single vectorized
passes.
"""

from __future__ import annotations

import numpy as np

_MIX1 = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd mix
_MIX2 = np.uint64(0xC2B2AE3D27D4EB4F)  # xxhash64 prime-2
_SHIFT = np.uint64(29)


def _h1h2(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    k = keys.astype(np.uint64, copy=False)
    with np.errstate(over="ignore"):
        h1 = k * _MIX1
        h1 ^= h1 >> _SHIFT
        h2 = (k ^ (k >> np.uint64(33))) * _MIX2
        h2 |= np.uint64(1)  # odd => full-period stride for any m
    return h1, h2


def bloom_bits(n_keys: int, bits_per_key: int = 16) -> int:
    """Power-of-two bit count sized for ``n_keys`` (min 1024)."""
    m = 1024
    while m < n_keys * bits_per_key:
        m <<= 1
    return m


def bloom_insert(words: np.ndarray, keys: np.ndarray,
                 n_hashes: int = 8) -> None:
    """Set the bits for ``keys`` in ``words`` (uint64 array, m = 64*len)."""
    m = np.uint64(len(words) * 64)
    h1, h2 = _h1h2(keys)
    for i in range(n_hashes):
        with np.errstate(over="ignore"):
            pos = (h1 + np.uint64(i) * h2) % m
        np.bitwise_or.at(words, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))


def bloom_test(words: np.ndarray, keys: np.ndarray,
               n_hashes: int = 8) -> np.ndarray:
    """Boolean mask: True where ``keys`` MAY be in the filter."""
    m = np.uint64(len(words) * 64)
    h1, h2 = _h1h2(keys)
    out = np.ones(len(keys), dtype=bool)
    for i in range(n_hashes):
        with np.errstate(over="ignore"):
            pos = (h1 + np.uint64(i) * h2) % m
        bit = (words[(pos >> np.uint64(6)).astype(np.int64)]
               >> (pos & np.uint64(63))) & np.uint64(1)
        out &= bit.astype(bool)
    return out
