"""Zero-copy access to Arrow binary columns.

``binary_views(col)`` returns per-row ``memoryview``s into the Arrow
data buffer — no per-row ``bytes`` materialization. Every codec path
(zlib, struct.unpack_from, np.frombuffer) accepts the buffer protocol,
so image stages can decode payloads without first copying the whole
column through ``to_pylist()`` (one avoided memcpy of every payload
per batch — material on a bandwidth-bound host).

Null entries come back as ``None`` (same contract as to_pylist).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def binary_views(col) -> list:
    a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_large_binary(a.type):
        off_dtype = np.int64
    elif pa.types.is_binary(a.type):
        off_dtype = np.int32
    else:  # unexpected type: preserve to_pylist behavior
        return a.to_pylist()
    bufs = a.buffers()
    offs = np.frombuffer(bufs[1], dtype=off_dtype)
    data = memoryview(bufs[2]) if bufs[2] is not None else memoryview(b"")
    base = a.offset  # slices share buffers at an element offset
    out = []
    if a.null_count:
        valid = a.is_valid().to_numpy(zero_copy_only=False)
        for i in range(len(a)):
            out.append(data[offs[base + i]:offs[base + i + 1]]
                       if valid[i] else None)
    else:
        for i in range(len(a)):
            out.append(data[offs[base + i]:offs[base + i + 1]])
    return out
