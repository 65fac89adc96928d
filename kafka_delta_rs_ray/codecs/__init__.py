"""Pure-numpy image codec registry, keyed by the table's ``fmt`` column.

The reference exposes a pluggable input-format seam (``MessageFormat``
enum + parser dispatch, reference src/config/mod.rs:43-50 and
src/utils/mod.rs:158-164); our analog is a codec registry keyed by
``fmt``. No PIL/opencv in this environment, so both codecs are numpy:

- ``rawz``  — lossless: raw interleaved uint8 RGB + zlib (exact round-trip)
- ``dctq``  — lossy: 8×8 block DCT + quantization + zlib (PSNR >= 40 dB)

Unknown fmt or corrupt payload raises :class:`FormatError`; the
validation stage routes those rows to quarantine (the reference's
dead-letter path, src/kafka/mod.rs:47-81).
"""

from __future__ import annotations

import numpy as np

from ..errors import FormatError
from . import dctq, pcmz, rawz, vraw

# One registry across modalities, keyed by the table's ``fmt`` column:
# rawz/dctq decode to (h, w, 3) images, pcmz to 1-D int16 samples, vraw
# to (n, h, w, 3) frame stacks — callers know their modality's shape;
# an image-validation stage rejects a 1-D pcmz array at the dimension
# check, so cross-modality rows still dead-letter cleanly.
_ENCODERS = {"rawz": rawz.encode, "dctq": dctq.encode,
             "pcmz": pcmz.encode, "vraw": vraw.encode}
_DECODERS = {"rawz": rawz.decode, "dctq": dctq.decode,
             "pcmz": pcmz.decode, "vraw": vraw.decode}

FORMATS = tuple(_ENCODERS)


def encode(img: np.ndarray, fmt: str) -> bytes:
    try:
        enc = _ENCODERS[fmt]
    except KeyError:
        raise FormatError(f"unknown image format: {fmt!r}") from None
    return enc(img)


def decode(buf: bytes, fmt: str) -> np.ndarray:
    try:
        dec = _DECODERS[fmt]
    except KeyError:
        raise FormatError(f"unknown image format: {fmt!r}") from None
    return dec(buf)
