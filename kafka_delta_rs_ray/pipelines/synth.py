"""Deterministic synthetic image+caption table generator.

The image table (BASELINE.json input_hint schema) cannot come from
external data — no network, no image libs — so it is synthesized:
seeded numpy patterns (flat / gradient / checker / noise) at sizes
{32,64,128,256}, encoded with our own codecs (FIXTURES.md F1).

Skew by construction: a configurable fraction of rows (default 20%)
are "hot" — they reuse one of a few fixed images, so a few ``phash``
values cover ~20% of the table. This exercises the salted-repartition
path in the Z-order cluster job (north_rule: explicit skew handling).

Everything derives from (seed, row id) only, so any batching /
parallelism produces identical rows — the generator is itself a
``map_batches`` stage over ``ray.data.range(n)``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..codecs import encode
from ..functions.phash import phash64
from ..tablefmt.schema import CHANGESET_SCHEMA, IMAGE_SCHEMA

PATTERNS = ("flat", "gradient", "checker", "noise")
SIZES = (32, 64, 128, 256)
_KNUTH = 2654435761  # multiplicative hash for a cheap per-row uniform


def _row_uniform(rid: int, salt: int) -> float:
    return ((rid * _KNUTH + salt * 97) % (1 << 32)) / float(1 << 32)


def make_pattern(pattern: str, w: int, h: int, rng: np.random.Generator) -> np.ndarray:
    if pattern == "flat":
        return np.full((h, w, 3), rng.integers(0, 256, 3, dtype=np.uint8), np.uint8)
    if pattern == "gradient":
        gx = np.linspace(0, 255, w)[None, :]
        gy = np.linspace(0, 255, h)[:, None]
        a = float(rng.random())
        g = np.clip(a * gx + (1 - a) * gy, 0, 255)
        return np.repeat(g[:, :, None], 3, axis=2).astype(np.uint8)
    if pattern == "checker":
        cell = int(rng.choice([4, 8, 16]))
        yy, xx = np.indices((h, w))
        m = ((yy // cell + xx // cell) % 2).astype(np.uint8)
        c0 = rng.integers(0, 256, 3, dtype=np.uint8)
        c1 = rng.integers(0, 256, 3, dtype=np.uint8)
        return np.where(m[:, :, None] == 0, c0, c1).astype(np.uint8)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)  # noise


def make_row(rid: int, seed: int, hot_fraction: float = 0.2,
             hot_buckets: int = 4) -> dict:
    """One deterministic table row (pre-encode form) for row id ``rid``."""
    if _row_uniform(rid, 1) < hot_fraction:
        bucket = rid % hot_buckets
        rng = np.random.default_rng([seed, 10_000_000 + bucket])
        pattern = PATTERNS[bucket % len(PATTERNS)]
        w = h = 64
    else:
        rng = np.random.default_rng([seed, rid])
        pattern = PATTERNS[int(rng.integers(len(PATTERNS)))]
        w = int(rng.choice(SIZES))
        h = int(rng.choice(SIZES))
    img = make_pattern(pattern, w, h, rng)
    fmt = "rawz" if rid % 2 == 0 else "dctq"
    return {"rid": rid, "img": img, "w": w, "h": h, "fmt": fmt,
            "pattern": pattern}


def image_id_for(rid: int) -> str:
    return f"img-{rid:010d}"


class SynthImages:
    """map_batches stage: ``id`` batches from ``ray.data.range`` →
    IMAGE_SCHEMA rows. Hot-bucket encodings are cached per actor (same
    image every time), so the 20% hot rows cost one encode per worker."""

    def __init__(self, seed: int = 42, hot_fraction: float = 0.2,
                 hot_buckets: int = 4):
        self.seed = seed
        self.hot_fraction = hot_fraction
        self.hot_buckets = hot_buckets
        self._hot_cache: dict = {}

    def _encode(self, rid: int, row: dict) -> tuple[bytes, int]:
        key = (row["pattern"], row["w"], row["h"], row["fmt"])
        if _row_uniform(rid, 1) < self.hot_fraction:
            hit = self._hot_cache.get(key)
            if hit is not None:
                return hit
            buf = encode(row["img"], row["fmt"])
            ph = phash64(row["img"])
            self._hot_cache[key] = (buf, ph)
            return buf, ph
        return encode(row["img"], row["fmt"]), phash64(row["img"])

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy()
        rows = {k: [] for k in IMAGE_SCHEMA.names}
        for rid in ids:
            rid = int(rid)
            r = make_row(rid, self.seed, self.hot_fraction, self.hot_buckets)
            buf, ph = self._encode(rid, r)
            rows["image_id"].append(image_id_for(rid))
            rows["bytes"].append(buf)
            rows["w"].append(r["w"])
            rows["h"].append(r["h"])
            rows["fmt"].append(r["fmt"])
            rows["caption"].append(
                f"A {r['pattern']} image {r['w']}x{r['h']} #{rid}")
            rows["phash"].append(ph)
        return pa.Table.from_pydict(rows, schema=IMAGE_SCHEMA)


def image_dataset(n_rows: int, seed: int = 42, hot_fraction: float = 0.2,
                  batch_size: int = 128, concurrency=None):
    """Lazy Dataset of n synthetic image rows.

    batch_size bounds task granularity (map_batches bundles range
    blocks up to batch_size, so smaller batches → more concurrent
    synth tasks); keep it well under n_rows / available CPUs.
    """
    import ray.data as rd

    kwargs = {}
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return rd.range(n_rows).map_batches(
        SynthImages(seed=seed, hot_fraction=hot_fraction),
        batch_format="pyarrow", batch_size=batch_size, **kwargs)


def stable_hash_str(s: str) -> int:
    """Deterministic non-negative 63-bit hash of a string (no PYTHONHASHSEED)."""
    import zlib

    return (zlib.crc32(s.encode()) * _KNUTH) & 0x7FFFFFFFFFFFFFFF


class SynthChanges:
    """map_batches stage producing a deterministic MERGE changeset.

    Change i (0-based global index, from ``ray.data.range``):
    - 50%: upsert of an EXISTING image_id (new caption + new image),
    - 40%: upsert of a NEW image_id (insert),
    - 10%: delete of an existing image_id.
    ``seq`` = start_seq + i (globally increasing ⇒ increasing within
    every partition — the reference's per-partition offset order,
    src/model/mod.rs:7-11); ``partition_id`` = hash(image_id) % P.
    """

    def __init__(self, n_base: int, seed: int = 43, n_partitions: int = 8,
                 start_seq: int = 0):
        self.n_base = n_base
        self.seed = seed
        self.n_partitions = n_partitions
        self.start_seq = start_seq

    def __call__(self, batch: pa.Table) -> pa.Table:
        idx = batch["id"].to_numpy()
        rows = {k: [] for k in CHANGESET_SCHEMA.names}
        for i in idx:
            i = int(i)
            u = _row_uniform(i, self.seed)
            rng = np.random.default_rng([self.seed, i])
            if u < 0.5:  # update existing
                rid = int(rng.integers(self.n_base))
                op = "upsert"
            elif u < 0.9:  # insert new
                rid = self.n_base + i
                op = "upsert"
            else:  # delete existing
                rid = int(rng.integers(self.n_base))
                op = "delete"
            iid = image_id_for(rid)
            if op == "upsert":
                r = make_row(rid, self.seed + 1)  # fresh content
                buf = encode(r["img"], r["fmt"])
                ph = phash64(r["img"])
                rows["bytes"].append(buf)
                rows["w"].append(r["w"])
                rows["h"].append(r["h"])
                rows["fmt"].append(r["fmt"])
                rows["caption"].append(f"updated {r['pattern']} #{rid} change {i}")
                rows["phash"].append(ph)
            else:
                rows["bytes"].append(None)
                rows["w"].append(None)
                rows["h"].append(None)
                rows["fmt"].append(None)
                rows["caption"].append(None)
                rows["phash"].append(None)
            rows["image_id"].append(iid)
            rows["partition_id"].append(stable_hash_str(iid) % self.n_partitions)
            rows["seq"].append(self.start_seq + i)
            rows["op"].append(op)
        return pa.Table.from_pydict(rows, schema=CHANGESET_SCHEMA)


def changeset_dataset(n_base: int, n_changes: int, seed: int = 43,
                      n_partitions: int = 8, start_seq: int = 0,
                      batch_size: int = 512):
    import ray.data as rd

    return rd.range(n_changes).map_batches(
        SynthChanges(n_base, seed, n_partitions, start_seq),
        batch_format="pyarrow", batch_size=batch_size)


# ------------------------------------------------------------- audio/video
def make_audio_row(rid: int, seed: int, sample_rate: int = 16000,
                   seconds: float = 1.0) -> dict:
    """One deterministic pcmz audio clip: a sum of 2-3 seeded sine
    tones + light noise. Pre-encode form (samples as int16)."""
    rng = np.random.default_rng([seed, 5_000_000 + rid])
    n = int(sample_rate * seconds)
    t = np.arange(n) / sample_rate
    x = np.zeros(n)
    for _ in range(int(rng.integers(2, 4))):
        f = float(rng.uniform(100, sample_rate / 2 * 0.8))
        x += float(rng.uniform(0.1, 0.4)) * np.sin(2 * np.pi * f * t)
    x += rng.normal(0, 0.01, n)
    x = np.clip(x, -1, 1)
    return {"media_id": f"aud-{rid:08d}", "samples": x,
            "sample_rate": sample_rate}


def audio_dataset(n_rows: int, seed: int = 42, sample_rate: int = 16000,
                  seconds: float = 1.0, batch_size: int = 32):
    """Lazy Dataset of pcmz-encoded clips:
    (media_id, bytes, fmt, sample_rate)."""
    import ray.data as rd

    from ..codecs import pcmz

    def synth(b: pa.Table) -> pa.Table:
        rows = [make_audio_row(int(i), seed, sample_rate, seconds)
                for i in b["id"].to_pylist()]
        return pa.table({
            "media_id": pa.array([r["media_id"] for r in rows]),
            "bytes": pa.array([pcmz.encode(r["samples"]) for r in rows],
                              pa.large_binary()),
            "fmt": pa.array(["pcmz"] * len(rows)),
            "sample_rate": pa.array([r["sample_rate"] for r in rows],
                                    pa.int32()),
        })

    return rd.range(n_rows).map_batches(synth, batch_format="pyarrow",
                                        batch_size=batch_size)


def make_video_row(rid: int, seed: int, n_frames: int = 60,
                   w: int = 32, h: int = 32) -> dict:
    """One deterministic vraw clip: a seeded pattern drifting one pixel
    per frame (frame i is frame 0 rolled by i)."""
    rng = np.random.default_rng([seed, 7_000_000 + rid])
    base = make_pattern(PATTERNS[rid % len(PATTERNS)], w, h, rng)
    frames = np.stack([np.roll(base, i, axis=1) for i in range(n_frames)])
    return {"media_id": f"vid-{rid:08d}", "frames": frames}


def video_dataset(n_rows: int, seed: int = 42, n_frames: int = 60,
                  w: int = 32, h: int = 32, batch_size: int = 8):
    """Lazy Dataset of vraw-encoded clips: (media_id, bytes, fmt)."""
    import ray.data as rd

    from ..codecs import vraw

    def synth(b: pa.Table) -> pa.Table:
        rows = [make_video_row(int(i), seed, n_frames, w, h)
                for i in b["id"].to_pylist()]
        return pa.table({
            "media_id": pa.array([r["media_id"] for r in rows]),
            "bytes": pa.array([vraw.encode(r["frames"]) for r in rows],
                              pa.large_binary()),
            "fmt": pa.array(["vraw"] * len(rows)),
        })

    return rd.range(n_rows).map_batches(synth, batch_format="pyarrow",
                                        batch_size=batch_size)
