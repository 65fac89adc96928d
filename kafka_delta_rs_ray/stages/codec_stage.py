"""Multimodal actor-pool stages over the image table.

These are the decode / feature-extract / resize / transcode stages a
training-data pipeline runs over binary media columns. Codec state
(DCT matrices, quantization tables, caches) lives in actor ``__init__``
— once per worker, not per batch (the reference's analog: schema +
writer built once at Pipeline::new, src/pipeline/mod.rs:106-159).

Usage::

    ds.map_batches(DecodeStats(), batch_format="pyarrow",
                   batch_size=64, concurrency=(2, 8), num_cpus=1)

Batch sizes stay SMALL for these stages: the ``bytes`` column dominates
(a 256×256 RGB image is ~200 KB decoded), so batch_size is a
bytes-budget decision, not a row-count one.

Video/audio frame-sampling is a declared stub: those container formats
need external libs this environment doesn't ship, so ``FrameSample``
raises NotImplementedError at construction while the Ray-side plumbing
(schema, actor signature, output layout) is real and tested.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..codecs import decode, encode
from ..errors import FormatError
from ..functions.binview import binary_views
from ..functions.phash import phash64


class DecodeStats:
    """Decode each image and emit numeric features (no pixels out):
    mean/std luminance, recomputed phash, decoded byte size."""

    def __init__(self):
        self._decode = decode  # codec tables bound once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        means, stds, phs, npix = [], [], [], []
        for buf, fmt in zip(binary_views(batch["bytes"]),
                            batch["fmt"].to_pylist()):
            img = self._decode(buf, fmt)
            g = img.astype(np.float32)
            means.append(float(g.mean()))
            stds.append(float(g.std()))
            phs.append(phash64(img))
            npix.append(int(img.shape[0] * img.shape[1]))
        return (batch.select(["image_id", "w", "h", "fmt"])
                .append_column("lum_mean", pa.array(means, pa.float64()))
                .append_column("lum_std", pa.array(stds, pa.float64()))
                .append_column("phash_decoded", pa.array(phs, pa.int64()))
                .append_column("n_pixels", pa.array(npix, pa.int64())))


def _block_mean_resize(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Integer-factor block-mean downscale; nearest-neighbor otherwise."""
    h, w = img.shape[:2]
    if h % out_h == 0 and w % out_w == 0:
        fh, fw = h // out_h, w // out_w
        return img.reshape(out_h, fh, out_w, fw, -1).mean(axis=(1, 3)).astype(np.uint8)
    yi = (np.arange(out_h) * h // out_h)
    xi = (np.arange(out_w) * w // out_w)
    return img[yi][:, xi]


class ResizeTranscode:
    """Decode → resize to a fixed thumbnail → re-encode (rawz).
    Output keeps the table schema, so it can be appended to a derived
    thumbnails table unchanged."""

    def __init__(self, out_w: int = 32, out_h: int = 32, out_fmt: str = "rawz"):
        self.out_w, self.out_h, self.out_fmt = out_w, out_h, out_fmt

    def __call__(self, batch: pa.Table) -> pa.Table:
        bufs, phs = [], []
        for buf, fmt in zip(binary_views(batch["bytes"]),
                            batch["fmt"].to_pylist()):
            thumb = _block_mean_resize(decode(buf, fmt), self.out_w, self.out_h)
            bufs.append(encode(thumb, self.out_fmt))
            phs.append(phash64(thumb))
        n = batch.num_rows
        return pa.table({
            "image_id": batch["image_id"],
            "bytes": pa.array(bufs, pa.large_binary()),
            "w": pa.array([self.out_w] * n, pa.int32()),
            "h": pa.array([self.out_h] * n, pa.int32()),
            "fmt": pa.array([self.out_fmt] * n, pa.string()),
            "caption": batch["caption"],
            "phash": pa.array(phs, pa.int64()),
        })


class ImageEmbed:
    """Feature-extract stage producing a NESTED column: per-image
    embedding = row-major ``grid × grid`` block-mean luminance,
    mean-centered — a real list<float32> producer exercising the format
    layer's nested-type path end to end (the reference builds recursive
    List columns via its builder factory, src/utils/mod.rs:168-206,
    208-334; ours flow through Arrow natively and the table format
    stores them like any other column, zone maps skipped).

    Output: (image_id, embedding list<float32>). Deterministic."""

    OUTPUT_SCHEMA = pa.schema([
        pa.field("image_id", pa.string()),
        pa.field("embedding", pa.list_(pa.float32())),
    ])

    def __init__(self, grid: int = 4):
        self.grid = grid
        self._decode = decode  # bound once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        embs = []
        g = self.grid
        for buf, fmt in zip(binary_views(batch["bytes"]),
                            batch["fmt"].to_pylist()):
            img = self._decode(buf, fmt).astype(np.float32)
            lum = img.mean(axis=2)
            e = _block_mean_resize(lum[:, :, None].astype(np.uint8), g, g)
            v = e.reshape(-1).astype(np.float32)
            embs.append((v - v.mean()).tolist())
        return pa.table({
            "image_id": batch["image_id"],
            "embedding": pa.array(embs, pa.list_(pa.float32())),
        })


class AudioFeatures:
    """STUB: audio feature extraction (e.g. log-mel frames) — audio
    codecs need external libraries not present here. The stage contract
    is the real one: input (media_id, bytes, fmt, sample_rate), output
    one row per window (media_id, window_idx, features list<float>).
    Like all media stages it belongs in an actor pool with a SMALL
    bytes-budgeted batch_size."""

    OUTPUT_SCHEMA = pa.schema([
        pa.field("media_id", pa.string()),
        pa.field("window_idx", pa.int32()),
        pa.field("features", pa.list_(pa.float32())),
    ])

    def __init__(self, window_ms: int = 25, hop_ms: int = 10):
        raise NotImplementedError(
            "audio decode requires external codec libraries; plumbing only")

    def __call__(self, batch: pa.Table) -> pa.Table:  # pragma: no cover
        raise NotImplementedError


class FrameSample:
    """STUB: video frame sampling — container demux needs external
    libraries not present here. The stage contract is the real one:
    input (media_id, bytes, fmt), output one row per sampled frame
    (media_id, frame_idx, bytes, w, h, fmt)."""

    OUTPUT_SCHEMA = pa.schema([
        pa.field("media_id", pa.string()),
        pa.field("frame_idx", pa.int32()),
        pa.field("bytes", pa.large_binary()),
        pa.field("w", pa.int32()),
        pa.field("h", pa.int32()),
        pa.field("fmt", pa.string()),
    ])

    def __init__(self, every_n: int = 30):
        raise NotImplementedError(
            "video demux requires external codec libraries; plumbing only")

    def __call__(self, batch: pa.Table) -> pa.Table:  # pragma: no cover
        raise NotImplementedError
