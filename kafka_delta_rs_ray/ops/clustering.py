"""Distributed k-means over an embedding column — the iterative-
algorithm shape (driver loop over distributed passes) behind IVF
bucketing, SemDeDup-style pruning, and corpus partitioning.

Each Lloyd iteration is ONE streaming pass: a map_batches stage
assigns rows to their nearest centroid and emits per-batch PARTIAL
(cluster, vec_sum, n) rows — the map-side combiner, so the exchange
carries <= C rows per batch regardless of batch size — and a C-row
groupby-sum reduce updates centroids on the driver (centroid state is
C x dim floats: broadcastable by construction because C scales with
target bucket size, not corpus size). Convergence = max centroid
shift < tol. Deterministic: seeded sample init, fixed iteration
order, no RNG in the loop.

similarity.train_centroids is the sampled small-C shortcut; this is
the full-data path its docstring points to for C past ~32k.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .similarity import _normalize


def kmeans(emb_ds, n_centroids: int, iters: int = 10, tol: float = 1e-4,
           seed: int = 7):
    """Lloyd k-means on unit-normalized vectors (cosine geometry).

    Returns (centroids ndarray [C, dim], assign_fn) where assign_fn is
    a map_batches-ready callable appending a ``cluster`` column —
    callers compose it into their own pipelines so assignment stays a
    streaming stage, never a materialized table."""
    import ray

    # deterministic init: k-means++-lite over a seeded sample (the
    # sample is O(C), never corpus-sized)
    sample = emb_ds.limit(max(8 * n_centroids, 1024))
    rows = sample.take_all()
    m = _normalize(np.stack([np.asarray(r["embedding"]) for r in rows])
                   .astype(np.float64))
    rng = np.random.default_rng(seed)
    cent = m[rng.choice(len(m), size=min(n_centroids, len(m)),
                        replace=False)]

    class _Partials:
        """Per-batch assign + combine: emits (cluster, vec_sum, n)."""

        def __init__(self, cent_ref):
            self.cent_ref = cent_ref
            self._c = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            import ray as _ray

            if self._c is None:
                self._c = _ray.get(self.cent_ref)
            v = _normalize(np.stack(
                batch["embedding"].to_numpy(zero_copy_only=False))
                .astype(np.float64))
            a = np.argmax(v @ self._c.T, axis=1)
            order = np.argsort(a, kind="stable")
            uniq, starts = np.unique(a[order], return_index=True)
            sums = np.add.reduceat(v[order], starts, axis=0)
            ns = np.diff(np.append(starts, len(a)))
            return pa.table({
                "cluster": pa.array(uniq.astype(np.int64)),
                "vec_sum": pa.array([s.tolist() for s in sums],
                                    pa.list_(pa.float64())),
                "n": pa.array(ns.astype(np.int64))})

    for _ in range(iters):
        cent_ref = ray.put(cent)
        parts = emb_ds.map_batches(_Partials(cent_ref),
                                   batch_format="pyarrow",
                                   batch_size=4096)

        def fold(g: pd.DataFrame) -> pd.DataFrame:
            s = np.sum(np.stack([np.asarray(x) for x in g["vec_sum"]]),
                       axis=0)
            return pd.DataFrame({"cluster": [int(g["cluster"].iloc[0])],
                                 "vec_sum": [s.tolist()],
                                 "n": [int(g["n"].sum())]})

        agg = parts.groupby("cluster").map_groups(
            fold, batch_format="pandas").take_all()  # <= C rows
        new = cent.copy()
        for r in agg:
            if r["n"] > 0:
                new[r["cluster"]] = np.asarray(r["vec_sum"]) / r["n"]
        new = _normalize(new)
        shift = float(np.max(np.linalg.norm(new - cent, axis=1)))
        cent = new
        if shift < tol:
            break

    final = cent

    class _Assign:
        def __init__(self, cent_ref):
            self.cent_ref = cent_ref
            self._c = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            import ray as _ray

            if self._c is None:
                self._c = _ray.get(self.cent_ref)
            v = _normalize(np.stack(
                batch["embedding"].to_numpy(zero_copy_only=False))
                .astype(np.float64))
            a = np.argmax(v @ self._c.T, axis=1).astype(np.int64)
            return batch.append_column("cluster", pa.array(a, pa.int64()))

    return final, _Assign(ray.put(final))


def semdedup(emb_ds, threshold: float = 0.95, n_centroids: int | None = None,
             iters: int = 5):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by k-means clustering + within-cluster cosine
    pruning — the corpus-pruning composition LLM data pipelines run
    before training.

    Rule (deterministic): within a cluster, a vector is DROPPED when
    some lower-vec_id member has cosine similarity > threshold to it
    ("dominated by an earlier row" — matmul + triangular mask, no
    sequential greedy chain). Cluster sizing is SEMDEDUP's OWN, not
    the IVF default: dominance is O(b²) in SIMS-MATRIX MEMORY, so
    buckets target ~4k rows (a 4k² chunk ≈ 128 MB transient; the IVF
    50k target would need 20 GB per cluster), and the kernel computes
    dominance in row chunks so peak memory is chunk × bucket, never
    bucket².

    Returns a Dataset of (vec_id, cluster, kept)."""
    import ray

    from .similarity import _normalize

    if n_centroids is None:
        n_centroids = int(max(16, -(-emb_ds.count() // 4096)))
    _, assign = kmeans(emb_ds, n_centroids=n_centroids, iters=iters)

    def prune(g: pa.Table) -> pa.Table:
        ids = np.asarray(g["vec_id"].to_pylist(), dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        m = _normalize(np.stack(
            g["embedding"].to_numpy(zero_copy_only=False))
            .astype(np.float64)[order])
        b = len(ids)
        dom = np.zeros(b, dtype=bool)
        chunk = 2048
        for i0 in range(0, b, chunk):  # rows vs all EARLIER rows only
            i1 = min(i0 + chunk, b)
            if i1 == 1:
                continue
            sims = m[i0:i1] @ m[:i1].T          # (chunk, i1)
            local = np.arange(i0, i1)            # global row index
            mask = np.arange(i1)[None, :] < local[:, None]
            dom[i0:i1] = ((sims > threshold) & mask).any(axis=1)
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "cluster": pa.array([int(g["cluster"][0].as_py())] * len(ids),
                                pa.int64()),
            "kept": pa.array(~dom, pa.bool_())})

    return (emb_ds.map_batches(assign, batch_format="pyarrow",
                               batch_size=4096)
            .groupby("cluster").map_groups(prune, batch_format="pyarrow"))
