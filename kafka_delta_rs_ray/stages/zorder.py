"""Z-order key stage: add (zcode, salt) columns, fully vectorized.

``zcode`` = 63-bit Morton interleave of (phash top bits, w, h) —
the clustering key from the north_star. ``salt`` is a deterministic
high-cardinality tiebreaker (crc32 of image_id mod ``salt_buckets``):
hot phash buckets put many identical zcodes into the sort, and Ray's
range-partitioned sort samples key boundaries — identical keys cannot
be split, so a hot key would land one giant partition on one worker.
Sorting by (zcode, salt) lets the sampler cut WITHIN a hot key, which
is the salted-repartition skew handling the north_rule requires.

Generic tables: ``make_keyspec`` normalizes ANY 1-3 numeric columns
into the 21-bit/dim domain the curve kernels interleave (bounds from
fragment zone maps, affine map to [0, 2^21-1]); add_zorder_keys with a
keyspec then clusters arbitrary tables, not just the image schema.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hilbert import hcode_from_columns, hilbert3_21
from ..functions.morton import morton3_21, zcode_from_columns

CURVES = {"morton": zcode_from_columns, "hilbert": hcode_from_columns}
_RAW_CURVES = {"morton": morton3_21, "hilbert": hilbert3_21}
_DIM_MAX = (1 << 21) - 1


_B2S = np.uint64(56) - np.uint64(8) * np.arange(8, dtype=np.uint64)


def prefix64_scalar(s: str) -> int:
    """Order-preserving uint64 of a string's first 8 UTF-8 bytes."""
    b = str(s).encode("utf-8")[:8].ljust(8, b"\0")
    return int.from_bytes(b, "big")


def prefix64(col) -> np.ndarray:
    """Vectorized order-preserving uint64 of each string's first 8
    UTF-8 bytes (big-endian): v(a) < v(b) whenever a < b byte-wise in
    the first 8 bytes, so sorting by the prefix sorts by the string up
    to 8-byte granularity — exactly what a locality sort key needs.
    Nulls map to 0 (low edge). Pure buffer arithmetic: one fancy-index
    gather + one shift-sum over an (n, 8) byte matrix, no per-row
    Python."""
    if isinstance(col, pa.ChunkedArray):
        chunks = col.chunks
    else:
        chunks = [col]
    parts = []
    for ch in chunks:
        if len(ch) == 0:
            continue
        ch = ch.cast(pa.large_binary())
        off = np.frombuffer(ch.buffers()[1], dtype=np.int64)[
            ch.offset:ch.offset + len(ch) + 1]
        data = np.frombuffer(ch.buffers()[2], dtype=np.uint8)
        starts, ends = off[:-1], off[1:]
        idx = starts[:, None] + np.arange(8)[None, :]
        in_range = idx < ends[:, None]
        safe = np.minimum(idx, max(0, len(data) - 1))
        b8 = np.where(in_range, data[safe] if len(data) else 0, 0)
        v = (b8.astype(np.uint64) << _B2S).sum(axis=1, dtype=np.uint64)
        if ch.null_count:
            v[ch.is_null().to_numpy(zero_copy_only=False)] = 0
        parts.append(v)
    if not parts:
        return np.zeros(0, dtype=np.uint64)
    return np.concatenate(parts)


def make_keyspec(cols, mins, maxs, salt_col: str = "image_id") -> dict:
    """Affine per-column normalization spec for generic clustering.

    ``cols``: 1-3 column names, numeric or string; ``mins``/``maxs``:
    their global bounds (fragment zone maps — metadata, no data scan).
    Numeric values map affinely to [0, 2^21-1] per dimension; string
    values map through their order-preserving 8-byte prefix (see
    ``prefix64``) then affinely. Out-of-bounds values clamp to the
    edge (zcode is only a sort key, so clamping costs locality at the
    extremes, never correctness). Note int64 columns wider than 2^53
    (and string prefixes, which span up to 2^64) lose low bits to the
    float64 map — use the image-schema default path (top-bits
    transform) when exact bit structure matters."""
    if not 1 <= len(cols) <= 3:
        raise ValueError("key_cols must name 1-3 columns")
    kinds, lo_f, scales = [], [], []
    for lo, hi in zip(mins, maxs):
        if isinstance(lo, str) or isinstance(hi, str):
            kinds.append("str")
            lo, hi = prefix64_scalar(lo), prefix64_scalar(hi)
        else:
            kinds.append("num")
        span = float(hi) - float(lo)
        lo_f.append(float(lo))
        scales.append(_DIM_MAX / span if span > 0 else 0.0)
    return {"cols": list(cols), "mins": lo_f, "scales": scales,
            "kinds": kinds, "salt_col": salt_col}


def _keyspec_dims(batch: pa.Table, keyspec: dict, n: int) -> list:
    kinds = keyspec.get("kinds") or ["num"] * len(keyspec["cols"])
    dims = []
    for c, lo, sc, kind in zip(keyspec["cols"], keyspec["mins"],
                               keyspec["scales"], kinds):
        if kind == "str":
            v = prefix64(batch[c]).astype(np.float64)
        else:
            v = batch[c].to_numpy(zero_copy_only=False).astype(np.float64)
        # null key values arrive as NaN; NaN→uint64 is undefined
        # behavior (platform-dependent garbage zcodes), so pin nulls
        # to the domain's low edge — a DEFINED, deterministic
        # placement (zcode is only a sort key; nulls cluster together)
        scaled = np.nan_to_num((v - lo) * sc, nan=0.0)
        dims.append(np.clip(scaled, 0, _DIM_MAX).astype(np.uint64))
    while len(dims) < 3:
        dims.append(np.zeros(n, dtype=np.uint64))
    return dims


def zcode_for(batch: pa.Table, curve: str, keyspec: dict | None):
    """int64 curve key for a batch — legacy image-schema transform when
    ``keyspec`` is None, normalized generic columns otherwise."""
    if keyspec is None:
        return CURVES[curve](batch["phash"].to_numpy(zero_copy_only=False),
                             batch["w"].to_numpy(zero_copy_only=False),
                             batch["h"].to_numpy(zero_copy_only=False))
    d0, d1, d2 = _keyspec_dims(batch, keyspec, batch.num_rows)
    return _RAW_CURVES[curve](d0, d1, d2).view(np.int64)


def _crc32_batch(ids: pa.ChunkedArray | pa.Array) -> np.ndarray:
    import zlib

    arr = ids.to_pylist()
    return np.array([zlib.crc32(str(s).encode()) for s in arr],
                    dtype=np.uint32)


def add_zorder_keys(batch: pa.Table, salt_buckets: int = 4096,
                    curve: str = "morton",
                    keyspec: dict | None = None) -> pa.Table:
    """``curve``: "morton" (Z-order, default) or "hilbert" — both pack
    the key columns into one int64 sort key; the column is named
    ``zcode`` either way so zone maps / pruning / resume are
    curve-agnostic. Hilbert's unit-step continuity gives tighter
    fragment bounding boxes on skewed keys.

    ``keyspec`` (from make_keyspec): cluster arbitrary numeric columns
    instead of the image-schema (phash, w, h) default; its salt_col
    names the high-cardinality tiebreaker column."""
    z = zcode_for(batch, curve, keyspec)
    salt_col = (keyspec or {}).get("salt_col", "image_id")
    salt = (_crc32_batch(batch[salt_col]) % salt_buckets).astype(np.int32)
    return (batch.append_column("zcode", pa.array(z, pa.int64()))
                 .append_column("salt", pa.array(salt, pa.int32())))
