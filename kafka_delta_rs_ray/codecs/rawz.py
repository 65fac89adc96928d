"""Lossless codec: raw uint8 RGB + zlib (exact round-trip).

Layout: magic b"RWZ1" | u16 w | u16 h | u8 channels | zlib(raw bytes).
Little-endian header. zlib level 3 (throughput-biased; matches the reference table's ZSTD-3 posture, pipeline/mod.rs:120-122).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from ..errors import FormatError

MAGIC = b"RWZ1"
_HDR = struct.Struct("<4sHHB")


def encode(img: np.ndarray) -> bytes:
    a = np.ascontiguousarray(img, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    return _HDR.pack(MAGIC, w, h, c) + zlib.compress(a.tobytes(), 3)


def decode(buf: bytes) -> np.ndarray:
    if len(buf) < _HDR.size or buf[:4] != MAGIC:
        raise FormatError("rawz: bad magic")
    _, w, h, c = _HDR.unpack_from(buf)
    try:
        raw = zlib.decompress(buf[_HDR.size:])
    except zlib.error as e:
        raise FormatError(f"rawz: corrupt payload: {e}") from None
    if len(raw) != w * h * c:
        raise FormatError("rawz: size mismatch")
    a = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, c)
    return a[:, :, 0] if c == 1 else a
