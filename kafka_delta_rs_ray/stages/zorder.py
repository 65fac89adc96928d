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

from ..functions.morton import zcode_from_columns


def _crc32_batch(ids: pa.ChunkedArray | pa.Array) -> np.ndarray:
    import zlib

    arr = ids.to_pylist()
    return np.array([zlib.crc32(s.encode()) for s in arr], dtype=np.uint32)


def add_zorder_keys(batch: pa.Table, salt_buckets: int = 4096) -> pa.Table:
    z = zcode_from_columns(batch["phash"].to_numpy(zero_copy_only=False),
                           batch["w"].to_numpy(zero_copy_only=False),
                           batch["h"].to_numpy(zero_copy_only=False))
    salt = (_crc32_batch(batch["image_id"]) % salt_buckets).astype(np.int32)
    return (batch.append_column("zcode", pa.array(z, pa.int64()))
                 .append_column("salt", pa.array(salt, pa.int32())))
