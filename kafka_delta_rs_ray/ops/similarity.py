"""Approximate-nearest-neighbor search over an embedding column
(``embeddings`` table: vec_id, embedding list<float>, label).

- ``knn_bruteforce``: exact cosine top-k. Each map_batches task
  multiplies its batch against the broadcast (ray.put once) query
  matrix and emits only its batch-local top-k per query; a final
  small groupby reduces to global top-k. Work per task is a dense
  numpy matmul; driver never sees full score matrices.
- ``knn_ivf``: the scale path — deterministic k-means (few Lloyd
  iterations over a sample) builds C centroids; vectors are bucketed
  by nearest centroid (ONE pass, no shuffle of raw vectors beyond the
  bucket groupby); queries probe the ``nprobe`` nearest buckets only.
  At 10^12 scale this is the difference between scanning everything
  and scanning nprobe/C of it; tests check recall >= 0.9 vs brute force.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _collect_matrix(emb_ds, id_filter=None):
    ids, mats = [], []
    for b in emb_ds.iter_batches(batch_format="pyarrow", batch_size=4096):
        bid = b["vec_id"].to_pylist()
        m = np.stack(b["embedding"].to_numpy(zero_copy_only=False))
        if id_filter is not None:
            keep = [i for i, v in enumerate(bid) if v in id_filter]
            bid = [bid[i] for i in keep]
            m = m[keep]
        ids.extend(bid)
        mats.append(m)
    return np.array(ids), np.concatenate(mats).astype(np.float64)


def _query_matrix(emb_ds, n_queries: int):
    """The first ``n_queries`` vec_ids and their vectors, WITHOUT any
    corpus-sized driver materialization: (1) per-batch partial min-k on
    the id column (the union the driver sees is ≤ n_queries × blocks,
    tiny), (2) a distributed ``is_in`` filter pulls just the winners'
    vectors. Replaces the round-1 take_all + driver scan."""
    import ray

    def local_head(b: pa.Table) -> pa.Table:
        return b.select(["vec_id"]).sort_by("vec_id").slice(0, n_queries)

    heads = emb_ds.map_batches(local_head, batch_format="pyarrow",
                               batch_size=None).take_all()
    qids_sorted = sorted(r["vec_id"] for r in heads)[:n_queries]
    ids_ref = ray.put(sorted(qids_sorted))

    class _Pick:
        def __init__(self):
            self._ids = None

        def __call__(self, b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            if self._ids is None:
                self._ids = pa.array(ray.get(ids_ref), pa.int64())
            return b.filter(pc.is_in(b["vec_id"], value_set=self._ids))

    rows = emb_ds.map_batches(_Pick(), batch_format="pyarrow",
                              batch_size=None).take_all()
    ids = np.array([r["vec_id"] for r in rows])
    m = np.stack([np.asarray(r["embedding"]) for r in rows]).astype(np.float64)
    order = np.argsort(ids)
    return ids[order], _normalize(m[order])


class _BatchTopK:
    """Emit batch-local top-k per query: (query_id, neighbor_id, sim)."""

    def __init__(self, queries_ref, k: int):
        self.queries_ref = queries_ref
        self.k = k
        self._q = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        if self._q is None:
            self._q = ray.get(self.queries_ref)  # (qids, normalized matrix)
        qids, qm = self._q
        ids = np.asarray(batch["vec_id"].to_pylist())
        m = _normalize(np.stack(
            batch["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64))
        sims = qm @ m.T  # (n_queries, batch)
        out = {"query_id": [], "neighbor_id": [], "sim": []}
        for qi in range(len(qids)):
            s = sims[qi]
            mask = ids != qids[qi]  # exclude self-match
            cand = np.nonzero(mask)[0]
            if len(cand) == 0:
                continue
            top = cand[np.argsort(-s[cand], kind="stable")[:self.k]]
            out["query_id"].extend([int(qids[qi])] * len(top))
            out["neighbor_id"].extend(int(ids[t]) for t in top)
            out["sim"].extend(round(float(s[t]), 6) for t in top)
        return pa.table({"query_id": pa.array(out["query_id"], pa.int64()),
                         "neighbor_id": pa.array(out["neighbor_id"], pa.int64()),
                         "sim": pa.array(out["sim"], pa.float64())})


def _final_topk(g: pd.DataFrame, k: int) -> pd.DataFrame:
    g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
    g = g.reset_index(drop=True)
    g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
    return g[["query_id", "neighbor_id", "rank"]]


def knn_bruteforce(emb_ds, n_queries: int = 10, k: int = 10):
    """Exact cosine top-k of the first ``n_queries`` vec_ids against the
    whole table. Deterministic rank: sim rounded to 6dp desc, then
    neighbor_id asc (matches the DuckDB oracle's ORDER BY)."""
    import ray

    qids, qm = _query_matrix(emb_ds, n_queries)
    ref = ray.put((qids, qm))
    partial = emb_ds.map_batches(_BatchTopK(ref, k),
                                 batch_format="pyarrow", batch_size=2048)
    return (partial.groupby("query_id")
            .map_groups(lambda g: _final_topk(g, k), batch_format="pandas"))


# ------------------------------------------------------------------ IVF
def train_centroids(emb_ds, n_centroids: int = 16, iters: int = 5,
                    sample: int = 4096, seed: int = 7) -> np.ndarray:
    """Deterministic mini k-means on a driver-side sample (the sample is
    tiny; training is O(sample × C) — never touches the full table)."""
    ids, m = _collect_matrix(emb_ds.limit(sample))
    m = _normalize(m)
    rng = np.random.default_rng(seed)
    cent = m[rng.choice(len(m), size=min(n_centroids, len(m)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(m @ cent.T, axis=1)
        for c in range(len(cent)):
            mask = assign == c
            if mask.any():
                cent[c] = m[mask].mean(axis=0)
        cent = _normalize(cent)
    return cent


class _AssignBucket:
    def __init__(self, cent_ref):
        self.cent_ref = cent_ref
        self._c = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        if self._c is None:
            self._c = ray.get(self.cent_ref)
        m = _normalize(np.stack(
            batch["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64))
        b = np.argmax(m @ self._c.T, axis=1).astype(np.int32)
        return batch.append_column("bucket", pa.array(b, pa.int32()))


def knn_ivf(emb_ds, n_queries: int = 10, k: int = 10, n_centroids: int = 16,
            nprobe: int = 4):
    """IVF ANN: probe only the nprobe closest centroid buckets per
    query. Same output shape as knn_bruteforce; approximate."""
    import ray

    cent = train_centroids(emb_ds, n_centroids)
    cent_ref = ray.put(cent)
    bucketed = emb_ds.map_batches(_AssignBucket(cent_ref),
                                  batch_format="pyarrow", batch_size=2048)

    qids, qm = _query_matrix(emb_ds, n_queries)
    probes = np.argsort(-(qm @ cent.T), axis=1)[:, :nprobe]  # per-query buckets

    # a query participates only in its probed buckets
    probe_map = {int(q): set(int(b) for b in row)
                 for q, row in zip(qids, probes)}
    pm_ref = ray.put(probe_map)
    qref = ray.put((qids, qm))

    class _BucketTopK(_BatchTopK):
        def __init__(self):
            super().__init__(qref, k)
            self._pm = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            import ray as _r

            if self._pm is None:
                self._pm = _r.get(pm_ref)
            if batch.num_rows == 0:
                return pa.table({"query_id": pa.array([], pa.int64()),
                                 "neighbor_id": pa.array([], pa.int64()),
                                 "sim": pa.array([], pa.float64())})
            bucket = batch["bucket"][0].as_py()
            full = super().__call__(batch.drop_columns(["bucket"]))
            keep = [bucket in self._pm.get(q, ())
                    for q in full["query_id"].to_pylist()]
            return full.filter(pa.array(keep, pa.bool_()))

    inst = _BucketTopK()

    def bucket_topk(batch: pa.Table) -> pa.Table:  # map_groups needs __name__
        return inst(batch)

    partial = (bucketed.groupby("bucket")
               .map_groups(bucket_topk, batch_format="pyarrow"))
    return (partial.groupby("query_id")
            .map_groups(lambda g: _final_topk(g, k), batch_format="pandas"))
