"""Z-order key stage: add (zcode, salt) columns, fully vectorized.

``zcode`` = 63-bit Morton interleave of (phash top bits, w, h) —
the clustering key from the north_star. ``salt`` is a deterministic
high-cardinality tiebreaker (crc32 of image_id mod ``salt_buckets``):
hot phash buckets put many identical zcodes into the sort, and Ray's
range-partitioned sort samples key boundaries — identical keys cannot
be split, so a hot key would land one giant partition on one worker.
Sorting by (zcode, salt) lets the sampler cut WITHIN a hot key, which
is the salted-repartition skew handling the north_rule requires.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hilbert import hcode_from_columns
from ..functions.morton import zcode_from_columns

CURVES = {"morton": zcode_from_columns, "hilbert": hcode_from_columns}


def _crc32_batch(ids: pa.ChunkedArray | pa.Array) -> np.ndarray:
    import zlib

    arr = ids.to_pylist()
    return np.array([zlib.crc32(s.encode()) for s in arr], dtype=np.uint32)


def add_zorder_keys(batch: pa.Table, salt_buckets: int = 4096,
                    curve: str = "morton") -> pa.Table:
    """``curve``: "morton" (Z-order, default) or "hilbert" — both pack
    (phash top bits, w, h) into one int64 sort key; the column is named
    ``zcode`` either way so zone maps / pruning / resume are
    curve-agnostic. Hilbert's unit-step continuity gives tighter
    fragment bounding boxes on skewed keys."""
    keyfn = CURVES[curve]
    z = keyfn(batch["phash"].to_numpy(zero_copy_only=False),
              batch["w"].to_numpy(zero_copy_only=False),
              batch["h"].to_numpy(zero_copy_only=False))
    salt = (_crc32_batch(batch["image_id"]) % salt_buckets).astype(np.int32)
    return (batch.append_column("zcode", pa.array(z, pa.int64()))
                 .append_column("salt", pa.array(salt, pa.int32())))
