"""vraw — lossless raw-frame video container: header + zlib RGB frames.

Pure numpy/zlib "video" for the frame-sampling stage: a 16-byte header
(magic, n_frames, h, w) followed by zlib-compressed row-major uint8
RGB frames. Exact round-trip; frame access after one decompress is a
zero-copy reshape. Real containers add inter-frame codecs this
environment cannot ship — the DEMUX CONTRACT (random frame access by
index) is what the pipeline depends on, and it is fully real here.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from ..errors import FormatError

_MAGIC = b"VRW1"


def encode(frames: np.ndarray) -> bytes:
    """(n_frames, h, w, 3) uint8 → payload bytes."""
    f = np.ascontiguousarray(frames, dtype=np.uint8)
    if f.ndim != 4 or f.shape[3] != 3:
        raise FormatError(f"vraw: expected (n, h, w, 3), got {f.shape}")
    n, h, w, _ = f.shape
    return (_MAGIC + struct.pack("<III", n, h, w)
            + zlib.compress(f.tobytes(), 1))


def decode(buf: bytes) -> np.ndarray:
    """Payload bytes → (n_frames, h, w, 3) uint8 (exact)."""
    buf = bytes(buf)
    if len(buf) < 16 or buf[:4] != _MAGIC:
        raise FormatError("vraw: bad magic")
    n, h, w = struct.unpack("<III", buf[4:16])
    try:
        raw = zlib.decompress(buf[16:])
    except zlib.error as e:
        raise FormatError(f"vraw: corrupt stream: {e}") from None
    expect = n * h * w * 3
    if len(raw) != expect:
        raise FormatError(f"vraw: size mismatch: header says {expect} B, "
                          f"got {len(raw)}")
    return np.frombuffer(raw, np.uint8).reshape(n, h, w, 3)
