"""Grouped EXACT quantiles via iterative histogram refinement — the
per-group generalization of events_value_quantiles (same algorithm,
state keyed by group).

Shape: one pass computes per-group (n, min, max) from per-batch
partials; each refinement pass histograms every ACTIVE group's
surviving range (per-batch Python loop over groups, vectorized inside
— the exchange is G×4096 counts, metadata-sized for the bounded-G
dashboards this targets); duplicate-heavy and adjacent-double ranges
terminate exactly as the ungrouped path does. ``max_groups`` guards
the driver state: grouped order statistics over UNBOUNDED key
cardinality is a different problem (per-key sketches), not this
operator.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

_B = 4096


def grouped_quantile_disc(ds, group_col: str, value_col: str, q: float,
                          collect_threshold: int = 100_000,
                          max_groups: int = 10_000) -> pa.Table:
    """percentile_disc(q) per group: the smallest value whose
    cumulative in-group count reaches ceil(q * n_group). Returns
    (group_col, value)."""

    def mm(b: pd.DataFrame) -> pd.DataFrame:
        g = b.dropna(subset=[value_col]).groupby(group_col)[value_col]
        a = g.agg(["size", "min", "max"]).reset_index()
        a.columns = [group_col, "n", "lo", "hi"]
        return a

    parts = ds.map_batches(mm, batch_format="pandas",
                           batch_size=None).to_pandas()
    agg = parts.groupby(group_col).agg(
        n=("n", "sum"), lo=("lo", "min"), hi=("hi", "max"))
    if len(agg) > max_groups:
        raise ValueError(
            f"{len(agg)} groups exceeds max_groups={max_groups}; "
            f"grouped exact quantiles need bounded group cardinality")

    state = {g: {"k": max(1, int(math.ceil(q * r["n"]))),
                 "lo": float(r["lo"]), "hi": float(r["hi"]),
                 "done": None}
             for g, r in agg.iterrows()}

    for _ in range(8):
        active = {g: s for g, s in state.items() if s["done"] is None}
        for g, s in list(active.items()):
            if s["lo"] == s["hi"]:
                s["done"] = s["lo"]
                del active[g]
        if not active:
            break
        edges = {g: np.linspace(s["lo"], s["hi"], _B + 1)
                 for g, s in active.items()}
        glist = sorted(active)

        def hist(b: pd.DataFrame, _e=edges, _gs=glist) -> pd.DataFrame:
            b = b.dropna(subset=[value_col])
            rows = {"g": [], "counts": [], "below": [],
                    "rmin": [], "rmax": []}
            for g in _gs:
                v = b.loc[b[group_col] == g, value_col].to_numpy(
                    dtype=np.float64)
                e = _e[g]
                inr = v[(v >= e[0]) & (v <= e[-1])]
                idx = np.minimum(np.searchsorted(e, inr, side="right") - 1,
                                 _B - 1)
                rows["g"].append(g)
                rows["counts"].append(np.bincount(idx, minlength=_B)
                                      .astype(np.int64).tolist())
                rows["below"].append(int((v < e[0]).sum()))
                rows["rmin"].append(float(inr.min()) if len(inr)
                                    else np.inf)
                rows["rmax"].append(float(inr.max()) if len(inr)
                                    else -np.inf)
            return pd.DataFrame(rows)

        hp = ds.map_batches(hist, batch_format="pandas",
                            batch_size=None).to_pandas()
        for g in glist:
            s = active[g]
            sub = hp[hp["g"] == g]
            rmin = float(sub["rmin"].min())
            rmax = float(sub["rmax"].max())
            if rmin == rmax:
                s["done"] = rmin
                continue
            total = np.sum(np.stack([np.asarray(c)
                                     for c in sub["counts"]]), axis=0)
            below = int(sub["below"].sum())
            if np.nextafter(rmin, np.inf) >= rmax:
                # two adjacent doubles: resolve with one exact count
                def count_eq(b: pd.DataFrame, _g=g, _v=rmin) -> pd.DataFrame:
                    v = b.loc[b[group_col] == _g, value_col].to_numpy(
                        dtype=np.float64)
                    return pd.DataFrame({"c": pd.array([int((v == _v).sum())],
                                                       dtype="int64")})

                n_rmin = int(ds.map_batches(
                    count_eq, batch_format="pandas",
                    batch_size=None).to_pandas()["c"].sum())
                s["done"] = rmin if s["k"] - below <= n_rmin else rmax
                continue
            cum = below + np.cumsum(total)
            i = int(np.searchsorted(cum, s["k"]))
            e = edges[g]
            new_below = below + int(total[:i].sum())
            s["lo"], s["hi"] = float(e[i]), float(e[i + 1])
            if total[i] <= collect_threshold:
                rng = (s["lo"], s["hi"], i == _B - 1)

                def in_range(b: pd.DataFrame, _g=g, _r=rng) -> pd.DataFrame:
                    v = b.loc[b[group_col] == _g, value_col].to_numpy(
                        dtype=np.float64)
                    m = (v >= _r[0]) & ((v <= _r[1]) if _r[2]
                                        else (v < _r[1]))
                    return pd.DataFrame({value_col: v[m]})

                vals = np.sort(ds.map_batches(
                    in_range, batch_format="pandas",
                    batch_size=None).to_pandas()[value_col].to_numpy())
                s["done"] = float(vals[s["k"] - new_below - 1])

    not_done = [g for g, s in state.items() if s["done"] is None]
    if not_done:
        raise RuntimeError(
            f"grouped quantile refinement did not converge for "
            f"{not_done}")
    gs = sorted(state)
    return pa.table({group_col: pa.array(gs),
                     "value": pa.array([state[g]["done"] for g in gs],
                                       pa.float64())})
