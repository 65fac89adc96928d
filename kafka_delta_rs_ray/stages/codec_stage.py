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

Audio and video run for REAL against the repo's own pure-numpy codecs
(``pcmz`` lossless PCM, ``vraw`` raw-frame container): commercial
container formats (mp3/aac/h264) need external libs this environment
doesn't ship, so only the innermost decode seam is repo-local — the
window framing, FFT filterbank, and frame demux/sample computations
are the real ones a production pipeline runs.
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
    """Audio feature extraction: decode pcmz payloads → frame into
    windows → Hann-windowed rFFT → log power pooled into ``n_bands``
    log-spaced triangular bands (a mel-style filterbank, pure numpy).
    One output row per window: (media_id, window_idx, features
    list<float32>). Commercial container codecs (mp3/aac) need external
    libs this environment doesn't ship, so the decode seam is the
    repo's own lossless ``pcmz`` codec — everything downstream of
    decode (framing, FFT, filterbank) is the real computation.

    Expensive per-(sample_rate) state — the filterbank matrix and Hann
    window — is built once and cached on the instance, which amortizes
    per worker process (task pool) exactly like actor ``__init__``.
    Input (media_id, bytes, fmt, sample_rate); batch_size stays small
    (bytes-budgeted): one second of 16 kHz PCM is ~32 KB compressed,
    ~100 windows out."""

    OUTPUT_SCHEMA = pa.schema([
        pa.field("media_id", pa.string()),
        pa.field("window_idx", pa.int32()),
        pa.field("features", pa.list_(pa.float32())),
    ])

    def __init__(self, window_ms: int = 25, hop_ms: int = 10,
                 n_bands: int = 16):
        self.window_ms = window_ms
        self.hop_ms = hop_ms
        self.n_bands = n_bands
        self._bank: dict = {}  # sample_rate -> (win, hop, hann, filters)

    def _plan(self, sr: int):
        plan = self._bank.get(sr)
        if plan is None:
            win = max(16, sr * self.window_ms // 1000)
            hop = max(1, sr * self.hop_ms // 1000)
            hann = 0.5 - 0.5 * np.cos(
                2 * np.pi * np.arange(win) / max(1, win - 1))
            n_bins = win // 2 + 1
            freqs = np.fft.rfftfreq(win, d=1.0 / sr)
            # log-spaced triangular filters, 50 Hz .. Nyquist
            edges = np.geomspace(50.0, sr / 2.0, self.n_bands + 2)
            filt = np.zeros((self.n_bands, n_bins), np.float64)
            for b in range(self.n_bands):
                lo, mid, hi = edges[b], edges[b + 1], edges[b + 2]
                up = (freqs - lo) / max(mid - lo, 1e-9)
                down = (hi - freqs) / max(hi - mid, 1e-9)
                filt[b] = np.clip(np.minimum(up, down), 0.0, None)
            plan = self._bank[sr] = (win, hop, hann, filt)
        return plan

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, feats = [], [], []
        for mid, buf, fmt, sr in zip(batch["media_id"].to_pylist(),
                                     binary_views(batch["bytes"]),
                                     batch["fmt"].to_pylist(),
                                     batch["sample_rate"].to_pylist()):
            win, hop, hann, filt = self._plan(int(sr))
            # registry dispatch on the row's fmt (P3 pluggable seam) —
            # unknown fmt raises FormatError for the dead-letter path
            x = decode(buf, fmt)
            if x.ndim != 1:
                # a decodable wrong-modality payload (image/video fmt)
                # must dead-letter too, not crash the framing below
                raise FormatError(
                    f"{fmt}: not an audio payload (shape {x.shape})")
            x = x.astype(np.float64) / 32768.0
            if len(x) < win:
                continue
            n_win = 1 + (len(x) - win) // hop
            # all windows of one clip as a strided matrix → ONE rFFT
            frames = np.lib.stride_tricks.sliding_window_view(
                x, win)[::hop][:n_win]
            spec = np.abs(np.fft.rfft(frames * hann, axis=1)) ** 2
            banded = np.log1p(spec @ filt.T).astype(np.float32)
            ids.extend([mid] * n_win)
            idxs.extend(range(n_win))
            feats.extend(banded.tolist())
        return pa.table({
            "media_id": pa.array(ids, pa.string()),
            "window_idx": pa.array(idxs, pa.int32()),
            "features": pa.array(feats, pa.list_(pa.float32())),
        })


class FrameSample:
    """Video frame sampling: demux ``vraw`` payloads and emit every
    ``every_n``-th frame re-encoded as a standalone rawz image row
    (media_id, frame_idx, bytes, w, h, fmt) — appendable to an image
    table as-is. Inter-frame commercial codecs need external libs this
    environment doesn't ship; the demux contract (random frame access
    by index) runs for real against the repo's own lossless container."""

    OUTPUT_SCHEMA = pa.schema([
        pa.field("media_id", pa.string()),
        pa.field("frame_idx", pa.int32()),
        pa.field("bytes", pa.large_binary()),
        pa.field("w", pa.int32()),
        pa.field("h", pa.int32()),
        pa.field("fmt", pa.string()),
    ])

    def __init__(self, every_n: int = 30, out_fmt: str = "rawz"):
        self.every_n = max(1, every_n)
        self.out_fmt = out_fmt

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, bufs, ws, hs = [], [], [], [], []
        for mid, buf, fmt in zip(batch["media_id"].to_pylist(),
                                 binary_views(batch["bytes"]),
                                 batch["fmt"].to_pylist()):
            frames = decode(buf, fmt)  # registry dispatch on fmt
            if frames.ndim != 4 or frames.shape[3] != 3:
                raise FormatError(
                    f"{fmt}: not a video payload (shape {frames.shape})")
            for i in range(0, frames.shape[0], self.every_n):
                ids.append(mid)
                idxs.append(i)
                bufs.append(encode(frames[i], self.out_fmt))
                hs.append(int(frames.shape[1]))
                ws.append(int(frames.shape[2]))
        return pa.table({
            "media_id": pa.array(ids, pa.string()),
            "frame_idx": pa.array(idxs, pa.int32()),
            "bytes": pa.array(bufs, pa.large_binary()),
            "w": pa.array(ws, pa.int32()),
            "h": pa.array(hs, pa.int32()),
            "fmt": pa.array([self.out_fmt] * len(ids), pa.string()),
        })


class SceneCuts:
    """Video scene-cut detection: per-clip mean-absolute frame deltas
    over the ``vraw`` container, cuts where the normalized delta
    exceeds ``threshold`` — the shot-boundary primitive a video
    curation pipeline samples keyframes from. One vectorized diff over
    the whole (T, H, W, 3) array per clip (no per-frame Python beyond
    the container demux); emits (media_id, n_frames, n_cuts,
    cut_idxs list<int32>, max_delta)."""

    OUTPUT_SCHEMA = pa.schema([
        pa.field("media_id", pa.string()),
        pa.field("n_frames", pa.int32()),
        pa.field("n_cuts", pa.int32()),
        pa.field("cut_idxs", pa.list_(pa.int32())),
        pa.field("max_delta", pa.float64()),
    ])

    def __init__(self, threshold: float = 0.18):
        self.threshold = float(threshold)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, nf, nc, cuts, mx = [], [], [], [], []
        for mid, buf, fmt in zip(batch["media_id"].to_pylist(),
                                 binary_views(batch["bytes"]),
                                 batch["fmt"].to_pylist()):
            frames = decode(buf, fmt)
            if frames.ndim != 4 or frames.shape[3] != 3:
                raise FormatError(
                    f"{fmt}: not a video payload (shape {frames.shape})")
            f = frames.astype(np.float32) / 255.0
            # mean |delta| per transition, normalized to [0, 1]
            d = np.abs(np.diff(f, axis=0)).mean(axis=(1, 2, 3)) \
                if frames.shape[0] > 1 else np.zeros(0, dtype=np.float32)
            idx = (np.flatnonzero(d > self.threshold) + 1).astype(np.int32)
            ids.append(mid)
            nf.append(int(frames.shape[0]))
            nc.append(int(len(idx)))
            cuts.append(idx.tolist())
            mx.append(float(d.max()) if len(d) else 0.0)
        return pa.table({
            "media_id": pa.array(ids, pa.string()),
            "n_frames": pa.array(nf, pa.int32()),
            "n_cuts": pa.array(nc, pa.int32()),
            "cut_idxs": pa.array(cuts, pa.list_(pa.int32())),
            "max_delta": pa.array(mx, pa.float64()),
        })


class SilenceTrim:
    """Audio silence trimming: locate the first/last sample whose
    |amplitude| exceeds ``threshold`` (int16 full-scale fraction) and
    re-encode only that span — the lead/tail cleanup an audio curation
    pipeline runs before feature extraction. One vectorized abs+argmax
    per clip; emits the trimmed pcmz payload plus span metadata, so it
    composes with AudioFeatures as-is."""

    OUTPUT_SCHEMA = pa.schema([
        pa.field("media_id", pa.string()),
        pa.field("bytes", pa.large_binary()),
        pa.field("fmt", pa.string()),
        pa.field("sample_rate", pa.int32()),
        pa.field("n_samples", pa.int32()),
        pa.field("kept_samples", pa.int32()),
        pa.field("lead", pa.int32()),
        pa.field("tail", pa.int32()),
    ])

    def __init__(self, threshold: float = 0.02):
        self.threshold = float(threshold)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {k.name: [] for k in self.OUTPUT_SCHEMA}
        thr = int(self.threshold * 32767)
        for mid, buf, fmt, sr in zip(batch["media_id"].to_pylist(),
                                     binary_views(batch["bytes"]),
                                     batch["fmt"].to_pylist(),
                                     batch["sample_rate"].to_pylist()):
            samples = decode(buf, fmt)
            if samples.ndim != 1:
                raise FormatError(
                    f"{fmt}: not an audio payload (shape {samples.shape})")
            loud = np.abs(samples.astype(np.int32)) > thr
            n = len(samples)
            if loud.any():
                lead = int(np.argmax(loud))
                tail = int(n - 1 - np.argmax(loud[::-1]))
                kept = samples[lead:tail + 1]
            else:
                lead, tail, kept = n, -1, samples[:0]  # all silence
            rows["media_id"].append(mid)
            rows["bytes"].append(encode(kept, fmt))
            rows["fmt"].append(fmt)
            rows["sample_rate"].append(int(sr))
            rows["n_samples"].append(n)
            rows["kept_samples"].append(int(len(kept)))
            rows["lead"].append(lead)
            rows["tail"].append(tail)
        return pa.Table.from_pydict(rows, schema=self.OUTPUT_SCHEMA)


class ImageAugment:
    """Deterministic per-image AUGMENTATION — the training-data
    transform stage (flip / crop-and-resize) between decode and embed
    in an image curation pipeline. The op per image is chosen by a
    seeded hash of its id (reproducible across runs and parallelism
    levels, never RNG state): hflip | vflip | center-crop to the
    middle 3/4 then block-mean back to (w, h). Output keeps the table
    schema (bytes re-encoded with the SOURCE fmt, phash recomputed)
    plus an ``aug`` column naming the op — appendable to a derived
    augmented table unchanged. Pure numpy; state bound in __init__
    (actor-pool posture, SURVEY §7.3)."""

    OPS = ("hflip", "vflip", "crop")

    def __init__(self, seed: int = 0):
        self.seed = seed
        self._decode, self._encode = decode, encode

    def op_for(self, image_id: str) -> str:
        import zlib

        return self.OPS[zlib.crc32(
            f"{self.seed}:{image_id}".encode()) % len(self.OPS)]

    def apply(self, img: np.ndarray, op: str) -> np.ndarray:
        if op == "hflip":
            return img[:, ::-1]
        if op == "vflip":
            return img[::-1]
        h, w = img.shape[:2]
        crop = img[h // 8: h - h // 8, w // 8: w - w // 8]
        return _block_mean_resize(crop, w, h)

    def __call__(self, batch: pa.Table) -> pa.Table:
        bufs, phs, ops = [], [], []
        ids = batch["image_id"].to_pylist()
        for iid, buf, fmt in zip(ids, binary_views(batch["bytes"]),
                                 batch["fmt"].to_pylist()):
            op = self.op_for(iid)
            aug = np.ascontiguousarray(
                self.apply(self._decode(buf, fmt), op))
            bufs.append(self._encode(aug, fmt))
            phs.append(phash64(aug))
            ops.append(op)
        return pa.table({
            "image_id": batch["image_id"],
            "bytes": pa.array(bufs, pa.large_binary()),
            "w": batch["w"], "h": batch["h"],
            "fmt": batch["fmt"],
            "caption": batch["caption"],
            "phash": pa.array(phs, pa.int64()),
            "aug": pa.array(ops, pa.string()),
        })
