"""Distributed PageRank — iterative graph analytics over an edge
Dataset (the curation use: importance/quality propagation over a
similarity graph, e.g. rank-weighted sampling of a near-dup corpus;
Page et al. 1999). Same execution shape as the engine's other
iterative operators (ops/dedup.py::cc_min_labels, clustering.kmeans):

- per-iteration state (the rank vector) lives as a DATASET, never a
  driver structure — the driver holds two scalars per round (the rank
  total, from which the dangling mass is recovered algebraically);
- each iteration is two scaled hash-bucket exchanges: ranks ⋈ edges
  cogrouped on src (emit contribution = rank × 1/outdeg per edge),
  then contributions + node rows cogrouped on dst (sum + damping +
  dangling share);
- per-edge weights (1/outdeg) and the per-node zero rows are computed
  ONCE up front with the same cogroup shape and reused every round;
- kernels sort before summing, so ranks are bit-deterministic across
  shuffles (float addition order pinned);
- marker vs payload rows are distinguished by an explicit ``side``
  column — node ids are unrestricted int64, negatives included.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .queries import hash_bucket, n_key_groups

DAMPING = 0.85

_EMPTY = pa.schema([pa.field("node", pa.int64()),
                    pa.field("rank", pa.float64())])


def _bucketize(df: pd.DataFrame, key: str, nb: int) -> pd.DataFrame:
    df = df.copy()
    df["bucket"] = hash_bucket(df[key].to_numpy(dtype=np.int64), nb)
    return df


def pagerank(edges, iters: int = 12, damping: float = DAMPING):
    """``edges``: Dataset with int64 ``src``/``dst`` columns (directed;
    any int64 ids, negatives allowed). Returns a Dataset (node, rank)
    over every node appearing as src or dst, ranks rounded to 12 dp
    (deterministic output). Fixed ``iters`` power-iteration rounds
    (12 ≈ 1e-3 residual at d=0.85 on well-connected graphs). Dangling
    nodes (no out-edges) redistribute their mass uniformly each round,
    so ranks always sum to 1."""
    import ray.data as rd

    n_edges = edges.count()
    nb = n_key_groups(max(1, n_edges))

    # ---- node set + out-degree weights (once) -------------------------
    def edge_sides(b: pd.DataFrame) -> pd.DataFrame:
        s = b["src"].to_numpy(dtype=np.int64)
        d = b["dst"].to_numpy(dtype=np.int64)
        return pd.DataFrame({"node": np.concatenate([s, d])})

    def distinct_nodes(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": np.unique(g["node"].to_numpy(dtype=np.int64))})

    nodes = (edges.map_batches(edge_sides, batch_format="pandas",
                               batch_size=None)
             .map_batches(lambda b: _bucketize(
                 b.drop_duplicates(), "node", nb), batch_format="pandas",
                 batch_size=None)
             .groupby("bucket").map_groups(distinct_nodes,
                                           batch_format="pandas")
             .materialize())
    n_nodes = nodes.count()
    if n_nodes == 0:
        return rd.from_arrow(_EMPTY.empty_table())

    def deg_partial(b: pd.DataFrame) -> pd.DataFrame:
        out = (pd.DataFrame({"src": b["src"].to_numpy(dtype=np.int64)})
               .groupby("src", as_index=False).size()
               .rename(columns={"size": "deg"}))
        return _bucketize(out, "src", nb)

    def deg_sum(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("src", as_index=False).agg(deg=("deg", "sum"))
        return out[["src", "deg"]]

    outdeg = (edges.map_batches(deg_partial, batch_format="pandas",
                                batch_size=None)
              .groupby("bucket").map_groups(deg_sum,
                                            batch_format="pandas"))

    # weighted edges (src, dst, w=1/outdeg(src)): one cogroup, reused
    # by every iteration. side 0 = edge row, side 1 = marker row.
    def e_norm(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "side": np.zeros(len(b), dtype=np.int8),
            "src": b["src"].to_numpy(dtype=np.int64),
            "dst": b["dst"].to_numpy(dtype=np.int64),
            "w": np.zeros(len(b))})
        return _bucketize(out, "src", nb)

    def d_norm(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "side": np.ones(len(b), dtype=np.int8),
            "src": b["src"].to_numpy(dtype=np.int64),
            "dst": np.zeros(len(b), dtype=np.int64),
            "w": 1.0 / b["deg"].to_numpy(dtype=np.float64)})
        return _bucketize(out, "src", nb)

    def attach_w(g: pd.DataFrame) -> pd.DataFrame:
        e = g[g["side"] == 0]
        d = g[g["side"] == 1]
        out = e.drop(columns=["w", "bucket"]).merge(
            d[["src", "w"]], on="src")
        return out[["side", "src", "dst", "w"]]

    wedges = (edges.map_batches(e_norm, batch_format="pandas",
                                batch_size=None)
              .union(outdeg.map_batches(d_norm, batch_format="pandas",
                                        batch_size=None))
              .groupby("bucket").map_groups(attach_w,
                                            batch_format="pandas")
              # re-bucketed by src so each iteration unions it with the
              # rank rows directly (same slim schema, no per-round work)
              .map_batches(lambda b: _bucketize(b, "src", nb),
                           batch_format="pandas", batch_size=None)
              .materialize())

    # per-node zero-contribution rows: identical every round, so built
    # and bucketized ONCE (side 1 = marker in the dst-keyed exchange)
    def n_side(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "side": np.ones(len(b), dtype=np.int8),
            "node": b["node"].to_numpy(dtype=np.int64),
            "src": np.zeros(len(b), dtype=np.int64),
            "c": np.zeros(len(b))})
        return _bucketize(out, "node", nb)

    node_rows = nodes.map_batches(n_side, batch_format="pandas",
                                  batch_size=None).materialize()

    # ---- power iteration ---------------------------------------------
    base = (1.0 - damping) / n_nodes
    r0 = 1.0 / n_nodes

    def init_rank(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": b["node"].to_numpy(dtype=np.int64),
                             "rank": np.full(len(b), r0)})

    ranks = nodes.map_batches(init_rank, batch_format="pandas",
                              batch_size=None).materialize()
    total = 1.0  # Σ ranks, maintained exactly on the driver

    def r_side(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "side": np.ones(len(b), dtype=np.int8),
            "src": b["node"].to_numpy(dtype=np.int64),
            "dst": np.zeros(len(b), dtype=np.int64),
            "w": b["rank"].to_numpy(dtype=np.float64)})
        return _bucketize(out, "src", nb)

    def contrib(g: pd.DataFrame) -> pd.DataFrame:
        """ranks ⋈ weighted edges on src → per-edge contribution."""
        r = g[g["side"] == 1]
        e = g[g["side"] == 0]
        out = e.drop(columns=["bucket"]).merge(
            r[["src", "w"]].rename(columns={"w": "rank"}), on="src")
        res = pd.DataFrame({
            "side": np.zeros(len(out), dtype=np.int8),
            "node": out["dst"].to_numpy(dtype=np.int64),
            "src": out["src"].to_numpy(dtype=np.int64),
            "c": out["rank"].to_numpy() * out["w"].to_numpy()})
        return res

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        """Sum contributions per node (sorted by (node, src) first —
        deterministic float addition order) + damping + base; the
        side-1 node rows guarantee every node emits a rank even with
        no in-edges."""
        g = g.sort_values(["node", "src"], kind="mergesort")
        s = g.groupby("node", as_index=False).agg(c=("c", "sum"))
        return pd.DataFrame({
            "node": s["node"].to_numpy(dtype=np.int64),
            "rank": base + damping * s["c"].to_numpy()})

    for _ in range(iters):
        pre = (ranks.map_batches(r_side, batch_format="pandas",
                                 batch_size=None)
               .union(wedges)
               .groupby("bucket").map_groups(contrib,
                                             batch_format="pandas")
               .map_batches(lambda b: _bucketize(b, "node", nb),
                            batch_format="pandas", batch_size=None)
               .union(node_rows)
               .groupby("bucket").map_groups(fold,
                                             batch_format="pandas")
               .materialize())
        # dangling mass, recovered algebraically on the driver: the
        # mass SENT this round is Σc = (Σpre − n·base)/d (nodes with
        # out-edges forward exactly their rank, weights sum to 1), so
        # what dangling nodes held is the shortfall vs the previous
        # total. Redistribute it uniformly — ranks stay a distribution.
        s_pre = float(pre.sum("rank"))
        sigma_c = (s_pre - n_nodes * base) / damping
        dangling = max(0.0, total - sigma_c)
        t = damping * dangling / n_nodes

        def add_t(b: pd.DataFrame, _t=t) -> pd.DataFrame:
            b = b.copy()
            b["rank"] = b["rank"].to_numpy() + _t
            return b

        ranks = pre.map_batches(add_t, batch_format="pandas",
                                batch_size=None).materialize()
        total = s_pre + n_nodes * t

    def final(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "node": b["node"].to_numpy(dtype=np.int64),
            "rank": np.round(b["rank"].to_numpy(), 12)})

    return ranks.map_batches(final, batch_format="pandas",
                             batch_size=None)


def pagerank_local(edge_list, iters: int = 12,
                   damping: float = DAMPING) -> dict:
    """Reference implementation for tests: plain numpy power iteration
    with uniform dangling-mass redistribution, over an in-memory edge
    list [(src, dst), ...]."""
    src = np.array([e[0] for e in edge_list], dtype=np.int64)
    dst = np.array([e[1] for e in edge_list], dtype=np.int64)
    nodes = np.unique(np.concatenate([src, dst]))
    n = len(nodes)
    idx = {int(v): i for i, v in enumerate(nodes)}
    si = np.array([idx[int(s)] for s in src])
    di = np.array([idx[int(d)] for d in dst])
    deg = np.bincount(si, minlength=n).astype(np.float64)
    w = 1.0 / np.where(deg > 0, deg, 1.0)[si]
    r = np.full(n, 1.0 / n)
    base = (1.0 - damping) / n
    for _ in range(iters):
        c = np.zeros(n)
        np.add.at(c, di, r[si] * w)
        dangling = float(r[deg == 0].sum())
        r = base + damping * c + damping * dangling / n
    return {int(v): float(x) for v, x in zip(nodes, r)}


# ------------------------------------------------- triangle counting

_PAIR_MIX = np.uint64(0x9E3779B97F4A7C15)


def _pair_key(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Mix an (u, v) id pair into one int64 partition key (collisions
    only co-locate extra rows; matching is always on the real ids)."""
    with np.errstate(over="ignore"):
        m = (u.astype(np.uint64) * _PAIR_MIX) ^ v.astype(np.uint64)
    return m.view(np.int64)


def triangle_count(edges, n_edges_hint: int | None = None):
    """Exact triangle count over a DIRECTED edge Dataset
    (``src``/``dst`` int64) treated as an undirected graph — the
    node-iterator++ algorithm (Suri & Vassilvitskii 2011, "Counting
    triangles and the curse of the last reducer"): orient every
    undirected edge from its (degree, id)-SMALLER endpoint, so each
    node's out-degree is O(sqrt(m)) even at hub nodes and each
    triangle is generated exactly once — from its (degree, id)-lowest
    vertex, whose two triangle edges both point away from it.

    Every stage is a scaled hash-bucket exchange with slim integer
    rows; the driver holds two scalars. Stages: (1) undirect +
    distinct on a pair-key bucket; (2) exact degrees per node;
    (3)+(4) attach deg to both endpoints; (5) wedge generation
    grouped by oriented source (the loop is over SOURCES, never rows,
    and the orientation bounds each source's pair fan-out); (6) wedge
    ⋈ edge semi-join on the pair key. Returns (n_edges, n_triangles)
    as a one-row pyarrow table."""
    nb = n_key_groups(n_edges_hint or edges.count())

    def undirect(b: pd.DataFrame) -> pd.DataFrame:
        s = b["src"].to_numpy(dtype=np.int64)
        d = b["dst"].to_numpy(dtype=np.int64)
        u, v = np.minimum(s, d), np.maximum(s, d)
        out = pd.DataFrame({"u": u, "v": v})
        out = out[out["u"] != out["v"]].drop_duplicates()
        out["bucket"] = hash_bucket(
            _pair_key(out["u"].to_numpy(), out["v"].to_numpy()), nb)
        return out

    def distinct_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["u", "v"])[["u", "v"]]

    E = (edges.map_batches(undirect, batch_format="pandas",
                           batch_size=None)
         .groupby("bucket").map_groups(distinct_pairs,
                                       batch_format="pandas"))

    # exact degree per node: per-batch partials, one node-bucket sum
    def deg_partial(b: pd.DataFrame) -> pd.DataFrame:
        nodes = np.concatenate([b["u"].to_numpy(), b["v"].to_numpy()])
        vals, cnts = np.unique(nodes, return_counts=True)
        return pd.DataFrame({"bucket": hash_bucket(vals, nb),
                             "node": vals,
                             "cnt": cnts.astype(np.int64)})

    def deg_sum(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("node", as_index=False)["cnt"].sum()
        return pd.DataFrame({"node": out["node"].to_numpy(dtype=np.int64),
                             "deg": out["cnt"].to_numpy(dtype=np.int64)})

    degs = (E.map_batches(deg_partial, batch_format="pandas",
                          batch_size=None)
            .groupby("bucket").map_groups(deg_sum,
                                          batch_format="pandas"))

    # attach deg to one endpoint per pass (side 0 = edge, 1 = degree)
    def mk_edge_side(key_col: str):
        def f(b: pd.DataFrame) -> pd.DataFrame:
            key = b[key_col].to_numpy(dtype=np.int64)
            out = b.copy()
            out["bucket"] = hash_bucket(key, nb)
            out["side"] = np.int8(0)
            return out
        return f

    def deg_side(b: pd.DataFrame) -> pd.DataFrame:
        out = b.copy()
        out["bucket"] = hash_bucket(out["node"].to_numpy(dtype=np.int64),
                                    nb)
        out["side"] = np.int8(1)
        return out

    def attach(key_col: str, deg_col: str):
        def f(g: pd.DataFrame) -> pd.DataFrame:
            e = g[g["side"] == 0]
            d = g[g["side"] == 1][["node", "deg"]].rename(
                columns={"node": key_col, "deg": deg_col})
            out = e.merge(d, on=key_col)
            return out.drop(columns=["bucket", "side", "node"],
                            errors="ignore")
        return f

    d_rows = degs.map_batches(deg_side, batch_format="pandas",
                              batch_size=None)
    E_du = (E.map_batches(mk_edge_side("u"), batch_format="pandas",
                          batch_size=None)
            .union(d_rows)
            .groupby("bucket").map_groups(attach("u", "deg_u"),
                                          batch_format="pandas"))
    E_d = (E_du.map_batches(mk_edge_side("v"), batch_format="pandas",
                            batch_size=None)
           .union(d_rows)
           .groupby("bucket").map_groups(attach("v", "deg_v"),
                                         batch_format="pandas"))

    # orient from the (deg, id)-smaller endpoint; wedges per source
    def orient(b: pd.DataFrame) -> pd.DataFrame:
        u = b["u"].to_numpy(dtype=np.int64)
        v = b["v"].to_numpy(dtype=np.int64)
        du = b["deg_u"].to_numpy(dtype=np.int64)
        dv = b["deg_v"].to_numpy(dtype=np.int64)
        u_first = (du < dv) | ((du == dv) & (u < v))
        src = np.where(u_first, u, v)
        dst = np.where(u_first, v, u)
        return pd.DataFrame({"bucket": hash_bucket(src, nb),
                             "src": src, "dst": dst})

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["src", "dst"], kind="stable")
        src = g["src"].to_numpy()
        dst = g["dst"].to_numpy()
        starts = np.flatnonzero(np.concatenate(
            ([True], src[1:] != src[:-1])))
        ends = np.append(starts[1:], len(src))
        aa, bb = [], []
        for s, e in zip(starts, ends):  # loop over SOURCES, not rows
            k = e - s
            if k < 2:
                continue
            i, j = np.triu_indices(k, k=1)
            nbrs = dst[s:e]
            aa.append(nbrs[i])
            bb.append(nbrs[j])
        if not aa:
            return pd.DataFrame({"wu": np.array([], dtype=np.int64),
                                 "wv": np.array([], dtype=np.int64)})
        a = np.concatenate(aa)
        b2 = np.concatenate(bb)
        return pd.DataFrame({"wu": np.minimum(a, b2),
                             "wv": np.maximum(a, b2)})

    W = (E_d.map_batches(orient, batch_format="pandas",
                         batch_size=None)
         .groupby("bucket").map_groups(wedges, batch_format="pandas"))

    # wedge ⋈ edge semi-join on the pair key; count matches per group
    def w_side(b: pd.DataFrame) -> pd.DataFrame:
        wu = b["wu"].to_numpy(dtype=np.int64)
        wv = b["wv"].to_numpy(dtype=np.int64)
        return pd.DataFrame({"bucket": hash_bucket(_pair_key(wu, wv), nb),
                             "side": np.int8(0), "u": wu, "v": wv})

    def e_side(b: pd.DataFrame) -> pd.DataFrame:
        u = b["u"].to_numpy(dtype=np.int64)
        v = b["v"].to_numpy(dtype=np.int64)
        return pd.DataFrame({"bucket": hash_bucket(_pair_key(u, v), nb),
                             "side": np.int8(1), "u": u, "v": v})

    def count_matches(g: pd.DataFrame) -> pd.DataFrame:
        w = g[g["side"] == 0]
        e = g[g["side"] == 1][["u", "v"]]
        n = int(w.merge(e, on=["u", "v"]).shape[0])
        return pd.DataFrame({"n": [n]})

    counts = (W.map_batches(w_side, batch_format="pandas",
                            batch_size=None)
              .union(E.map_batches(e_side, batch_format="pandas",
                                   batch_size=None))
              .groupby("bucket").map_groups(count_matches,
                                            batch_format="pandas"))
    n_tri = sum(r["n"] for r in counts.iter_rows())   # O(buckets) rows
    n_edges = E.count()
    return pa.table({"n_edges": pa.array([n_edges], pa.int64()),
                     "n_triangles": pa.array([n_tri], pa.int64())})


def triangle_count_local(edge_list) -> tuple[int, int]:
    """Reference implementation for tests: undirected distinct edges,
    brute-force triple check via adjacency sets."""
    E = set()
    for s, d in edge_list:
        if s != d:
            E.add((min(s, d), max(s, d)))
    adj = {}
    for u, v in E:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    tri = 0
    nodes = sorted(adj)
    for a in nodes:
        na = sorted(x for x in adj[a] if x > a)
        for i, b in enumerate(na):
            for c in na[i + 1:]:
                if c in adj[b]:
                    tri += 1
    return len(E), tri
