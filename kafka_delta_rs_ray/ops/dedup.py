"""Deduplication family over the ``documents`` table.

All variants follow the same scale shape (ray_guide patterns):
vectorized signature computation in ``map_batches`` (no shuffle of the
text corpus beyond what the variant needs), hash-bucket ``groupby`` so
per-group work is vectorized over a BUCKET (thousands of docs), never
per-key Python, and candidate verification before any pair is emitted.

- exact_dedup:        content hash → bucket groupby → first-wins (min id)
- minhash_lsh_pairs:  shingle → minhash → band groupby → est-Jaccard verify
- simhash_pairs:      64-bit simhash → 4-band blocking → Hamming verify
- ngram_jaccard_pairs: LSH candidates verified with EXACT n-gram Jaccard
- embedding_near_dup: cosine >= threshold pairs via per-batch matmul
                      against a broadcast matrix (brute force baseline;
                      see similarity.py for the LSH-bucketed scale path)
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

_TOKEN_RE = re.compile(r"[A-Za-z0-9]+")


def _crc(s: str) -> int:
    return zlib.crc32(s.encode())


# ---------------------------------------------------------------- exact
def add_content_hash(batch: pa.Table, col: str = "text") -> pa.Table:
    h = [(_crc(t) if t is not None else 0) for t in batch[col].to_pylist()]
    return batch.append_column("content_hash",
                               pa.array(np.array(h, np.int64)))


def _first_wins_per_hash(g: pd.DataFrame) -> pd.DataFrame:
    return (g.sort_values(["content_hash", "doc_id"])
             .drop_duplicates("content_hash", keep="first"))


def exact_dedup(docs_ds, n_buckets: int = 64):
    """Exact dedup, first-wins by doc_id (the reference's offset-dedup
    D1 semantics, src/pipeline/mod.rs:58-80, content hash playing the
    key role). Returns surviving (doc_id, content_hash)."""
    def bucketize(b: pa.Table) -> pa.Table:
        b = add_content_hash(b)
        return b.append_column(
            "bucket", pa.array((b["content_hash"].to_numpy() % 64)
                               .astype(np.int32)))

    return (docs_ds.map_batches(bucketize, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(_first_wins_per_hash, batch_format="pandas")
            .select_columns(["doc_id", "content_hash"]))


# -------------------------------------------------------------- minhash
N_PERM = 64
N_BANDS = 16  # × 4 rows/band; LSH threshold ≈ (1/16)^(1/4) ≈ 0.5
_MERSENNE = np.uint64((1 << 61) - 1)
_rng = np.random.default_rng(20240516)
_A = _rng.integers(1, _MERSENNE, N_PERM, dtype=np.uint64)
_Bc = _rng.integers(0, _MERSENNE, N_PERM, dtype=np.uint64)


def shingles(text: str, k: int = 3) -> np.ndarray:
    toks = _TOKEN_RE.findall(text.lower())
    if len(toks) < k:
        joined = [" ".join(toks)] if toks else []
    else:
        joined = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    return np.unique(np.array([_crc(s) for s in joined], dtype=np.uint64))


def minhash_sig(text: str) -> np.ndarray:
    """64 minhashes via (a*x+b) mod p over the shingle set — one
    (n_shingles × 64) vectorized broadcast, no Python loop."""
    sh = shingles(text)
    if len(sh) == 0:
        return np.zeros(N_PERM, dtype=np.uint64)
    with np.errstate(over="ignore"):
        m = (sh[:, None] * _A[None, :] + _Bc[None, :]) % _MERSENNE
    return m.min(axis=0)


class ComputeSigs:
    """map_batches: doc → (doc_id, sig list<int64>[N_PERM])."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        sigs = [minhash_sig(t or "").view(np.int64).tolist()
                for t in batch["text"].to_pylist()]
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "sig": pa.array(sigs, pa.list_(pa.int64()))})


class MinhashBands:
    """map_batches over signatures: doc → N_BANDS rows
    (band_id, band_hash, doc_id). The band rows carry NO signature —
    shipping the 64-hash signature into every band row would multiply
    the shuffle volume ×N_BANDS; verification looks signatures up from
    a broadcast dict instead."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows_per = N_PERM // N_BANDS
        out = {"band_id": [], "band_hash": [], "doc_id": []}
        for did, sig_l in zip(batch["doc_id"].to_pylist(),
                              batch["sig"].to_pylist()):
            sig = np.asarray(sig_l, dtype=np.int64).view(np.uint64)
            for b in range(N_BANDS):
                band = sig[b * rows_per:(b + 1) * rows_per]
                out["band_id"].append(b)
                out["band_hash"].append(int(zlib.crc32(band.tobytes())))
                out["doc_id"].append(did)
        return pa.table({
            "band_id": pa.array(out["band_id"], pa.int32()),
            "band_hash": pa.array(out["band_hash"], pa.int64()),
            "doc_id": pa.array(out["doc_id"], pa.int64()),
        })


_PAIR_COLS = ["doc_a", "doc_b", "est_jaccard"]


class _BandPairs:
    """One map_groups call per band (N_BANDS total): inner vectorized
    pandas groupby over band_hash — never a Python call per key.
    Single-doc buckets (the vast majority) are mask-filtered up front;
    signatures for verification come from one ray.put broadcast
    (bounded: N_PERM int64 per doc)."""

    def __init__(self, sigs_ref, threshold: float):
        self.sigs_ref = sigs_ref
        self.threshold = threshold
        self._sigs = None

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("doc_id")
        g = g[g["band_hash"].duplicated(keep=False)]  # only shared buckets
        if g.empty:  # typed empty frame: schema must match non-empty groups
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                                 "doc_b": pd.Series([], dtype="int64"),
                                 "est_jaccard": pd.Series([], dtype="float64")})
        if self._sigs is None:
            import ray

            self._sigs = ray.get(self.sigs_ref)  # {doc_id: np.int64[64]}
        out = {c: [] for c in _PAIR_COLS}
        for _, grp in g.groupby("band_hash", sort=False):
            ids = np.sort(grp["doc_id"].to_numpy())
            sigs = np.stack([self._sigs[d] for d in ids])
            ai, bi = np.triu_indices(len(ids), k=1)
            est = (sigs[ai] == sigs[bi]).mean(axis=1)
            keep = est >= self.threshold
            out["doc_a"].extend(ids[ai][keep])
            out["doc_b"].extend(ids[bi][keep])
            out["est_jaccard"].extend(np.round(est[keep], 6))
        return pd.DataFrame(out)


def _dedup_pairs(ds, value_cols: list[str],
                 keys: tuple = ("doc_a", "doc_b")):
    """Drop duplicate pair rows. The pair set is OUTPUT-sized
    (near-dup pairs ≪ corpus), so one coalesced block + a vectorized
    drop_duplicates beats a groupby shuffle; if near-dup pairs ever
    approached corpus scale, swap this for a hash-bucketed groupby."""
    keys = list(keys)

    def dd(g: pd.DataFrame) -> pd.DataFrame:
        return (g.sort_values(keys).drop_duplicates(keys)
                 [keys + value_cols])

    return ds.repartition(1).map_batches(dd, batch_format="pandas",
                                         batch_size=None)


def minhash_lsh_pairs(docs_ds, threshold: float = 0.5):
    """Near-duplicate pairs (doc_a < doc_b, est_jaccard) via
    MinHash+LSH: signatures once per doc → slim band rows → per-band
    groupby (N_BANDS groups) → vectorized in-band bucket pairing with
    broadcast-signature verification → pair dedup (a pair can surface
    from several bands)."""
    import ray

    sigs = docs_ds.map_batches(ComputeSigs(), batch_format="pyarrow",
                               batch_size=None).materialize()
    sig_lookup = {}
    for b in sigs.iter_batches(batch_format="pyarrow", batch_size=8192):
        for d, s in zip(b["doc_id"].to_pylist(), b["sig"].to_pylist()):
            sig_lookup[d] = np.asarray(s, dtype=np.int64)
    sigs_ref = ray.put(sig_lookup)

    inst = _BandPairs(sigs_ref, threshold)

    def band_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return inst(g)

    pairs = (sigs
             .map_batches(MinhashBands(), batch_format="pyarrow",
                          batch_size=None)
             .groupby("band_id")
             .map_groups(band_pairs, batch_format="pandas"))
    return _dedup_pairs(pairs, ["est_jaccard"])


# -------------------------------------------------------------- simhash
def simhash64(text: str) -> int:
    toks = _TOKEN_RE.findall(text.lower())
    if not toks:
        return 0
    hs = np.array([_crc(t) * 0x9E3779B97F4A7C15 % (1 << 64) for t in toks],
                  dtype=np.uint64)
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int32)
    v = (2 * bits - 1).sum(axis=0)
    h = np.uint64(0)
    for i in np.nonzero(v > 0)[0]:
        h |= np.uint64(1) << np.uint64(int(i))
    return int(h.view(np.int64)) if hasattr(h, "view") else int(h)


class SimhashBlocks:
    """doc → 4 rows (block_id, block_val, doc_id, simhash): any pair
    within Hamming distance 3 shares at least one exact 16-bit block
    (pigeonhole), so blocking finds all near pairs."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"block_id": [], "block_val": [], "doc_id": [], "simhash": []}
        for did, text in zip(batch["doc_id"].to_pylist(),
                             batch["text"].to_pylist()):
            h = simhash64(text or "")
            hu = np.uint64(h).item() if h >= 0 else (h + (1 << 64))
            for b in range(4):
                out["block_id"].append(b)
                out["block_val"].append((hu >> (16 * b)) & 0xFFFF)
                out["doc_id"].append(did)
                out["simhash"].append(h)
        return pa.table({
            "block_id": pa.array(out["block_id"], pa.int32()),
            "block_val": pa.array(out["block_val"], pa.int32()),
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "simhash": pa.array(out["simhash"], pa.int64()),
        })


def _block_pairs(g: pd.DataFrame, max_dist: int) -> pd.DataFrame:
    """One BLOCK position's rows → Hamming-verified pairs (inner
    vectorized groupby over block_val; single-doc buckets filtered)."""
    g = g.drop_duplicates("doc_id")
    g = g[g["block_val"].duplicated(keep=False)]
    if g.empty:
        return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                             "doc_b": pd.Series([], dtype="int64"),
                             "hamming": pd.Series([], dtype="int64")})
    out = {"doc_a": [], "doc_b": [], "hamming": []}
    for _, grp in g.groupby("block_val", sort=False):
        grp = grp.sort_values("doc_id")
        hs = grp["simhash"].to_numpy().astype(np.int64).view(np.uint64)
        ids = grp["doc_id"].to_numpy()
        ai, bi = np.triu_indices(len(grp), k=1)
        x = hs[ai] ^ hs[bi]
        dist = np.array([bin(int(v)).count("1") for v in x], dtype=np.int64)
        keep = dist <= max_dist
        out["doc_a"].extend(ids[ai][keep])
        out["doc_b"].extend(ids[bi][keep])
        out["hamming"].extend(dist[keep])
    return pd.DataFrame(out)


def simhash_pairs(docs_ds, max_dist: int = 3):
    pairs = (docs_ds
             .map_batches(SimhashBlocks(), batch_format="pyarrow")
             .groupby("block_id")
             .map_groups(lambda g: _block_pairs(g, max_dist),
                         batch_format="pandas"))
    return _dedup_pairs(pairs, ["hamming"])


# ------------------------------------------------------- exact jaccard
class _ExactJaccard:
    """Verify candidate pairs with EXACT word-n-gram Jaccard. The
    candidate texts are broadcast once (ray.put) — candidates are a
    tiny fraction of the corpus by construction."""

    def __init__(self, texts_ref, threshold: float):
        self.texts_ref = texts_ref
        self.threshold = threshold
        self._sh: dict | None = None

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        import ray

        if self._sh is None:
            texts = ray.get(self.texts_ref)
            self._sh = {d: set(shingles(t).tolist())
                        for d, t in texts.items()}
        rows = {"doc_a": [], "doc_b": [], "jaccard": []}
        for a, b in zip(batch["doc_a"], batch["doc_b"]):
            sa, sb = self._sh.get(a, set()), self._sh.get(b, set())
            u = len(sa | sb)
            j = (len(sa & sb) / u) if u else 0.0
            if j >= self.threshold:
                rows["doc_a"].append(a)
                rows["doc_b"].append(b)
                rows["jaccard"].append(round(j, 6))
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"])


def ngram_jaccard_pairs(docs_ds, threshold: float = 0.5,
                        lsh_threshold: float = 0.35):
    """Exact n-gram-Jaccard near-dup pairs: LSH candidates (recall
    stage, lower threshold) verified exactly (precision stage)."""
    import ray

    cand = minhash_lsh_pairs(docs_ds, threshold=lsh_threshold).materialize()
    ids = set()
    for r in cand.select_columns(["doc_a", "doc_b"]).take_all():
        ids.add(r["doc_a"])
        ids.add(r["doc_b"])
    if not ids:
        import ray.data as rd

        return rd.from_pandas(pd.DataFrame(
            {"doc_a": pd.Series([], dtype="int64"),
             "doc_b": pd.Series([], dtype="int64"),
             "jaccard": pd.Series([], dtype="float64")}))
    texts = {}
    for b in docs_ds.iter_batches(batch_format="pyarrow", batch_size=4096):
        for d, t in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            if d in ids:
                texts[d] = t or ""
    ref = ray.put(texts)
    return cand.map_batches(_ExactJaccard(ref, threshold),
                            batch_format="pandas")


# ---------------------------------------------------- embedding cosine
class _CosinePairs:
    """Per-batch rows × ALL embeddings matmul against a broadcast,
    pre-normalized matrix. O(n²) overall — the brute-force baseline;
    the IVF/LSH path in similarity.py is the 10^12-scale variant."""

    def __init__(self, mat_ref, threshold: float):
        self.mat_ref = mat_ref
        self.threshold = threshold
        self._m = None
        self._ids = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        if self._m is None:
            self._ids, self._m = ray.get(self.mat_ref)
        q = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        q /= np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        sims = q @ self._m.T
        qids = batch["vec_id"].to_numpy()
        out = {"vec_a": [], "vec_b": [], "cosine": []}
        for i in range(len(qids)):
            hit = np.nonzero(sims[i] >= self.threshold)[0]
            for j in hit:
                a, b = int(qids[i]), int(self._ids[j])
                if a < b:  # emit each unordered pair once
                    out["vec_a"].append(a)
                    out["vec_b"].append(b)
                    out["cosine"].append(round(float(sims[i, j]), 6))
        return pa.table({"vec_a": pa.array(out["vec_a"], pa.int64()),
                         "vec_b": pa.array(out["vec_b"], pa.int64()),
                         "cosine": pa.array(out["cosine"], pa.float64())})


def embedding_near_dup(emb_ds, threshold: float = 0.95):
    import ray

    ids, mat = [], []
    for b in emb_ds.iter_batches(batch_format="pyarrow", batch_size=4096):
        ids.extend(b["vec_id"].to_pylist())
        mat.append(np.stack(b["embedding"].to_numpy(zero_copy_only=False)))
    m = np.concatenate(mat).astype(np.float64)
    m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    ref = ray.put((np.array(ids), m))
    return emb_ds.map_batches(_CosinePairs(ref, threshold),
                              batch_format="pyarrow", batch_size=1024)


# ------------------------------------------------- image phash near-dup
class PhashBlocks:
    """Image row → 4 rows (block_id, block_val, image_id, phash) —
    the SimHash 16-bit-block pigeonhole applied to the image table's
    perceptual hash column. Fully vectorized: phash is already an
    int64 column, so banding is numpy shifts, no per-row Python."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ph = batch["phash"].to_numpy(zero_copy_only=False).astype(np.int64)
        phu = ph.view(np.uint64)
        n = len(ph)
        ids = batch["image_id"]
        parts = []
        for b in range(4):
            bv = ((phu >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int32)
            parts.append(pa.table({
                "block_id": pa.array(np.full(n, b, dtype=np.int32)),
                "block_val": pa.array(bv),
                "image_id": ids,
                "phash": pa.array(ph, pa.int64()),
            }))
        return pa.concat_tables(parts)


def _phash_block_pairs(g: pd.DataFrame, max_dist: int) -> pd.DataFrame:
    g = g.drop_duplicates("image_id")
    g = g[g["block_val"].duplicated(keep=False)]
    empty = pd.DataFrame({"img_a": pd.Series([], dtype="object"),
                          "img_b": pd.Series([], dtype="object"),
                          "hamming": pd.Series([], dtype="int64")})
    if g.empty:
        return empty
    out = {"img_a": [], "img_b": [], "hamming": []}
    for _, grp in g.groupby("block_val", sort=False):
        grp = grp.sort_values("image_id")
        hs = grp["phash"].to_numpy().astype(np.int64).view(np.uint64)
        ids = grp["image_id"].to_numpy()
        ai, bi = np.triu_indices(len(grp), k=1)
        x = (hs[ai] ^ hs[bi]).astype(np.uint64)
        # vectorized popcount via 8-bit lookup over the 8 bytes
        bytes_ = x.view(np.uint8).reshape(-1, 8)
        dist = _POPCNT8[bytes_].sum(axis=1).astype(np.int64)
        keep = dist <= max_dist
        out["img_a"].extend(ids[ai][keep])
        out["img_b"].extend(ids[bi][keep])
        out["hamming"].extend(dist[keep])
    return pd.DataFrame(out) if out["img_a"] else empty


_POPCNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)


def phash_near_dup_pairs(image_ds, max_dist: int = 3):
    """Near-duplicate image pairs by perceptual-hash Hamming distance:
    16-bit block LSH (pigeonhole: distance <= 3 shares a block) →
    per-block candidate buckets → vectorized popcount verify. The
    all-pairs quadratic only ever runs inside one shared 16-bit bucket."""
    pairs = (image_ds
             .map_batches(PhashBlocks(), batch_format="pyarrow",
                          batch_size=None)
             .groupby("block_id")
             .map_groups(lambda g: _phash_block_pairs(g, max_dist),
                         batch_format="pandas"))
    return _dedup_pairs(pairs, ["hamming"], keys=("img_a", "img_b"))
