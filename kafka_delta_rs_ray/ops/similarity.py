"""Approximate-nearest-neighbor search over an embedding column
(``embeddings`` table: vec_id, embedding list<float>, label).

- ``knn_bruteforce``: exact cosine top-k. Each map_batches task
  multiplies its batch against the broadcast (ray.put once) query
  matrix and emits only its batch-local top-k per query; a final
  small groupby reduces to global top-k. Work per task is a dense
  numpy matmul; driver never sees full score matrices.
- ``knn_ivf``: the scale path — deterministic k-means (few Lloyd
  iterations over a sample) builds C centroids (corpus-scaled:
  ~TARGET_BUCKET_ROWS rows per bucket); vectors are bucketed by
  nearest centroid (ONE pass, no shuffle of raw vectors beyond the
  bucket groupby); each bucket task multiplies ONLY the queries that
  probe it (non-probed buckets do zero similarity work), so total
  compute is ~nprobe/C of brute force. Tests check recall >= 0.9 vs
  brute force and that non-probed buckets are skipped.
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


def _empty_topk() -> pa.Table:
    return pa.table({"query_id": pa.array([], pa.int64()),
                     "neighbor_id": pa.array([], pa.int64()),
                     "sim": pa.array([], pa.float64())})


def _topk_rows(qids: np.ndarray, qm: np.ndarray, ids: np.ndarray,
               m: np.ndarray, k: int) -> pa.Table:
    """Dense (queries × rows) cosine top-k kernel shared by the brute,
    IVF, and graph paths — fully vectorized: one matmul, self-matches
    masked to -inf in bulk, argpartition + per-row sort over the k
    survivors (no per-query Python loop: the graph build calls this
    once per (batch × corpus block), so loop overhead multiplied)."""
    sims = qm @ m.T  # (n_queries, rows)
    sims[qids[:, None] == ids[None, :]] = -np.inf  # self-match mask
    n = sims.shape[1]
    kk = min(k, n)
    part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
    psims = np.take_along_axis(sims, part, axis=1)
    order = np.argsort(-psims, axis=1, kind="stable")
    top = np.take_along_axis(part, order, axis=1)       # (q, kk) col idx
    tsims = np.take_along_axis(psims, order, axis=1)
    # deterministic tie-break (matches the oracle's neighbor_id ASC):
    # output sims are rounded to 6dp and the oracle orders by ROUNDED
    # sim desc then id asc, so the boundary re-selection must trigger
    # whenever the excluded max is within rounding distance of the kth
    # kept sim (raw sims differing <1e-6 can round equal), and select
    # on rounded sims — rare, so the fast path stays vectorized
    if kk < n:
        kth = tsims[:, -1]
        rest_max = np.take_along_axis(
            sims, np.argpartition(-sims, kk, axis=1)[:, kk:kk + 1],
            axis=1)[:, 0]
        for qi in np.nonzero(rest_max >= kth - 5e-7)[0]:
            byid = np.lexsort((ids, -np.round(sims[qi], 6)))[:kk]
            top[qi] = byid
            tsims[qi] = sims[qi][byid]
    # in-row ties order by neighbor id ascending
    nbr_all = ids[top].astype(np.int64)
    row_order = np.lexsort((nbr_all, -tsims))  # per-row (sim desc, id asc)
    top = np.take_along_axis(top, row_order, axis=1)
    tsims = np.take_along_axis(tsims, row_order, axis=1)
    nbr_all = ids[top].astype(np.int64)
    valid = np.isfinite(tsims)                           # drop masked
    qrep = np.repeat(qids.astype(np.int64), kk).reshape(-1)[valid.ravel()]
    nbr = nbr_all.ravel()[valid.ravel()]
    sv = np.round(tsims.ravel()[valid.ravel()], 6)
    return pa.table({"query_id": pa.array(qrep, pa.int64()),
                     "neighbor_id": pa.array(nbr, pa.int64()),
                     "sim": pa.array(sv, pa.float64())})


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
        return _topk_rows(qids, qm, ids, m, self.k)


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
# Target rows per IVF bucket: centroid count must GROW with the corpus
# (a fixed 16 centroids puts ~corpus/16 rows in one map_groups task and
# makes intra-bucket work quadratic in corpus size). 50k vectors per
# bucket keeps a bucket's matmul in one worker's cache-friendly range.
TARGET_BUCKET_ROWS = 50_000


def n_centroids_for(n_rows: int, target_bucket: int = TARGET_BUCKET_ROWS) -> int:
    """Centroid count sized so buckets average ~target_bucket rows."""
    return int(max(16, -(-n_rows // target_bucket)))


# Past this centroid count the driver sample (≥8 points/centroid)
# would bust its 262k-row cap and centroid quality collapses — switch
# to the full-data distributed Lloyd loop instead. At a 10^10-vector
# corpus, n_centroids_for yields ~200k centroids: that path is the
# distributed one.
DISTRIBUTED_TRAIN_C = 32_768


def train_centroids(emb_ds, n_centroids: int = 16, iters: int = 5,
                    sample: int = 4096, seed: int = 7) -> np.ndarray:
    """Deterministic mini k-means on a driver-side sample (training is
    O(sample × C) — never touches the full table). The sample grows
    with the centroid count (≥8 points per centroid, capped at 256k
    rows ≈ tens of MB); past DISTRIBUTED_TRAIN_C centroids the sample
    can't feed the centroids and training AUTOMATICALLY delegates to
    the distributed k-means (ops/clustering.kmeans: map_batches
    partial sums + C-row reduce per Lloyd pass) — the assignment /
    probe machinery downstream is centroid-count-agnostic."""
    if n_centroids > DISTRIBUTED_TRAIN_C:
        from .clustering import kmeans

        cent, _ = kmeans(emb_ds, n_centroids=n_centroids, iters=iters,
                         seed=seed)
        return cent
    sample = min(max(sample, 8 * n_centroids), 262_144)
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


class _BucketTopK:
    """One IVF bucket's rows → top-k rows for the queries that PROBE
    this bucket. The probing query SUBSET is selected BEFORE the
    matmul, so a non-probed bucket does zero similarity work and a
    probed one multiplies only its own queries — total compute is
    ~nprobe/C of brute force (the round-2 version ran the full query
    matmul in every bucket and filtered afterward: brute-force compute
    wearing an IVF costume). ``stats`` instruments the skip behavior
    for the unit test."""

    def __init__(self, qref, bucket_queries_ref, k: int):
        self.qref = qref
        self.bq_ref = bucket_queries_ref  # {bucket: np.array(query idx)}
        self.k = k
        self._q = None
        self._bq = None
        self.stats = {"buckets_skipped": 0, "matmul_query_rows": 0}

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        if self._q is None:
            self._q = ray.get(self.qref)
            self._bq = ray.get(self.bq_ref)
        if batch.num_rows == 0:
            return _empty_topk()
        qids, qm = self._q
        bucket = int(batch["bucket"][0].as_py())
        qidx = self._bq.get(bucket)
        if qidx is None or len(qidx) == 0:
            self.stats["buckets_skipped"] += 1
            return _empty_topk()
        self.stats["matmul_query_rows"] += len(qidx)
        ids = np.asarray(batch["vec_id"].to_pylist())
        m = _normalize(np.stack(
            batch["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64))
        return _topk_rows(qids[qidx], qm[qidx], ids, m, self.k)


def knn_ivf(emb_ds, n_queries: int = 10, k: int = 10,
            n_centroids: int | None = None, nprobe: int = 4,
            n_rows: int | None = None):
    """IVF ANN: probe only the nprobe closest centroid buckets per
    query. Same output shape as knn_bruteforce; approximate.

    ``n_centroids`` defaults to corpus-scaled (~TARGET_BUCKET_ROWS rows
    per bucket) so bucket size stays bounded as the table grows;
    ``n_rows`` is the sizing hint (counted from the dataset if absent)."""
    import ray

    if n_centroids is None:
        if n_rows is None:
            n_rows = emb_ds.count()
        n_centroids = n_centroids_for(n_rows)
    cent = train_centroids(emb_ds, n_centroids)
    cent_ref = ray.put(cent)
    bucketed = emb_ds.map_batches(_AssignBucket(cent_ref),
                                  batch_format="pyarrow", batch_size=2048)

    qids, qm = _query_matrix(emb_ds, n_queries)
    probes = np.argsort(-(qm @ cent.T), axis=1)[:, :nprobe]  # per-query buckets

    # invert to bucket → query indices: the per-bucket task slices its
    # query subset in O(1) instead of scanning every query's probe set
    bucket_queries: dict[int, list] = {}
    for qi, row in enumerate(probes):
        for b in row:
            bucket_queries.setdefault(int(b), []).append(qi)
    bucket_queries = {b: np.asarray(v, dtype=np.int64)
                      for b, v in bucket_queries.items()}
    bq_ref = ray.put(bucket_queries)
    qref = ray.put((qids, qm))

    inst = _BucketTopK(qref, bq_ref, k)

    def bucket_topk(batch: pa.Table) -> pa.Table:  # map_groups needs __name__
        return inst(batch)

    partial = (bucketed.groupby("bucket")
               .map_groups(bucket_topk, batch_format="pyarrow"))
    return (partial.groupby("query_id")
            .map_groups(lambda g: _final_topk(g, k), batch_format="pandas"))


# ------------------------------------------------------------ kNN graph
def knn_graph(emb_ds, k: int = 5):
    """EXACT cosine kNN graph: top-k neighbors for EVERY vector — the
    SemDeDup / graph-clustering primitive.

    Exact all-pairs is inherently O(n²) compute and O(n·d) state; the
    Ray-idiomatic exact plan keeps both off the driver: the corpus is
    materialized once INTO THE OBJECT STORE (block refs, zero-copy to
    readers — never a driver matrix), and each batch task multiplies
    its rows against corpus blocks one at a time, folding a running
    top-k so task memory is batch_rows × (k × n_blocks) candidates,
    not batch_rows × corpus. Feasible to ~10M vectors; past that use
    knn_graph_ivf (same output shape, approximate)."""
    import ray

    # normalize ONCE into the object store so per-task work per corpus
    # block is just the matmul, then stream blocks one ray.get at a
    # time inside each task (peak task memory = its batch + ONE corpus
    # block, never the whole corpus)
    def prenorm(b: pa.Table) -> pa.Table:
        m = _normalize(np.stack(
            b["embedding"].to_numpy(zero_copy_only=False))
            .astype(np.float64))
        return pa.table({"vec_id": b["vec_id"],
                         "embedding": pa.array([r.tolist() for r in m],
                                               pa.list_(pa.float64()))})

    mat = emb_ds.map_batches(prenorm, batch_format="pyarrow",
                             batch_size=4096).materialize()
    block_refs = [r[0] if isinstance(r, tuple) else r
                  for r in mat.to_arrow_refs()]

    class _GraphTopK:
        def __call__(self, batch: pa.Table) -> pa.Table:
            import ray as _ray

            qids = np.asarray(batch["vec_id"].to_pylist())
            qm = np.stack(batch["embedding"].to_numpy(
                zero_copy_only=False)).astype(np.float64)
            parts = []
            for ref in block_refs:  # one block resident at a time
                t = _ray.get(ref)
                if t.num_rows == 0:
                    continue
                bids = np.asarray(t["vec_id"].to_pylist())
                bm = np.stack(t["embedding"].to_numpy(
                    zero_copy_only=False)).astype(np.float64)
                p = _topk_rows(qids, qm, bids, bm, k)
                if p.num_rows:
                    parts.append(p)
                del t, bm
            return pa.concat_tables(parts or [_empty_topk()])

    partial = mat.map_batches(_GraphTopK(), batch_format="pyarrow",
                              batch_size=1024)
    return (partial.groupby("query_id")
            .map_groups(lambda g: _final_topk(g, k),
                        batch_format="pandas"))


def knn_graph_ivf(emb_ds, k: int = 5, nprobe: int = 2,
                  n_centroids: int | None = None,
                  n_rows: int | None = None):
    """Approximate kNN graph, the 10^9-vector shape: every vector is a
    MEMBER of its nearest centroid bucket and a QUERY in its nprobe
    nearest buckets; one bucket exchange co-locates each bucket's
    members with the queries probing it (the exchange carries
    (nprobe+1)× the vectors — bounded, corpus-independent per bucket
    because centroids scale with rows); the per-bucket kernel is one
    dense queries×members matmul; a final per-query merge reduces the
    ≤ nprobe×k candidates. No corpus-sized state anywhere."""
    import ray

    if n_centroids is None:
        if n_rows is None:
            n_rows = emb_ds.count()
        n_centroids = n_centroids_for(n_rows)
    cent = train_centroids(emb_ds, n_centroids)
    cent_ref = ray.put(cent)

    class _Expand:
        """Each vector → 1 member row (its top bucket) + nprobe query
        rows (its probe buckets)."""

        def __init__(self):
            self._c = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            import ray as _ray

            if self._c is None:
                self._c = _ray.get(cent_ref)
            m = _normalize(np.stack(
                batch["embedding"].to_numpy(zero_copy_only=False))
                .astype(np.float64))
            order = np.argsort(-(m @ self._c.T), axis=1)
            n = batch.num_rows
            out = []
            for role, cols in (("member", order[:, :1]),
                               ("query", order[:, :nprobe])):
                reps = cols.shape[1]
                out.append(pa.table({
                    "vec_id": pa.concat_arrays(
                        [batch["vec_id"].combine_chunks()] * reps),
                    "embedding": pa.concat_arrays(
                        [batch["embedding"].combine_chunks()] * reps),
                    "bucket": pa.array(cols.T.reshape(-1), pa.int32()),
                    "role": pa.array([role] * (n * reps), pa.string())}))
            return pa.concat_tables(out)

    expanded = emb_ds.map_batches(_Expand(), batch_format="pyarrow",
                                  batch_size=2048)

    def bucket_graph(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mem = g.filter(pc.equal(g["role"], "member"))
        qry = g.filter(pc.equal(g["role"], "query"))
        if mem.num_rows == 0 or qry.num_rows == 0:
            return _empty_topk()
        mids = np.asarray(mem["vec_id"].to_pylist())
        mm = _normalize(np.stack(
            mem["embedding"].to_numpy(zero_copy_only=False))
            .astype(np.float64))
        qids = np.asarray(qry["vec_id"].to_pylist())
        qm = _normalize(np.stack(
            qry["embedding"].to_numpy(zero_copy_only=False))
            .astype(np.float64))
        return _topk_rows(qids, qm, mids, mm, k)

    partial = (expanded.groupby("bucket")
               .map_groups(bucket_graph, batch_format="pyarrow"))

    def merge_topk(g: pd.DataFrame) -> pd.DataFrame:
        # a vector probing 2 buckets may see a member twice
        g = g.drop_duplicates(["query_id", "neighbor_id"])
        return _final_topk(g, k)

    return (partial.groupby("query_id")
            .map_groups(merge_topk, batch_format="pandas"))
