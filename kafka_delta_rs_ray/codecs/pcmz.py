"""pcmz — lossless mono audio codec: int16 PCM samples + zlib.

Pure numpy/zlib, exact round-trip. The analog of the image codecs
(rawz/dctq) for the audio modality: a 4-byte magic + sample count
header, then zlib-compressed little-endian int16 samples. Sample rate
travels as a table COLUMN (like image w/h), not inside the payload.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from ..errors import FormatError

_MAGIC = b"PCZ1"


def encode(samples: np.ndarray) -> bytes:
    """int16 (or float in [-1, 1]) mono samples → payload bytes."""
    a = np.asarray(samples)
    if a.dtype != np.int16:
        a = np.clip(np.asarray(a, np.float64), -1.0, 1.0)
        a = (a * 32767.0).astype(np.int16)
    raw = a.astype("<i2").tobytes()
    return _MAGIC + struct.pack("<I", len(a)) + zlib.compress(raw, 1)


def decode(buf: bytes) -> np.ndarray:
    """Payload bytes → int16 mono samples (exact)."""
    buf = bytes(buf)
    if len(buf) < 8 or buf[:4] != _MAGIC:
        raise FormatError("pcmz: bad magic")
    (n,) = struct.unpack("<I", buf[4:8])
    try:
        raw = zlib.decompress(buf[8:])
    except zlib.error as e:
        raise FormatError(f"pcmz: corrupt stream: {e}") from None
    if len(raw) != 2 * n:
        raise FormatError(f"pcmz: length mismatch: header says {2 * n} B, "
                          f"got {len(raw)}")
    return np.frombuffer(raw, dtype="<i2").astype(np.int16)
