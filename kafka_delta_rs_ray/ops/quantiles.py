"""Exact discrete quantiles (percentile_disc) by iterative histogram
refinement — ONE implementation for the global and grouped cases,
state keyed by (group, quantile).

Per refinement round, ONE streaming pass histograms every active
(group, q) pair's surviving [lo, hi] range into 4096 buckets
(vectorized searchsorted per batch; the exchange is
|active| × 4096 int64 counts — metadata-sized for bounded group
cardinality), shrinking each range ~4096× per round, so 10^12 rows
need ~3 rounds. Terminal paths, all resolved in BATCHED passes (one
per round, never one per group — a G-group median is O(rounds) scans,
not O(G)):

- single distinct value in range (rmin == rmax): answered directly;
- two adjacent doubles (linspace can't subdivide): one combined
  exact-count pass over every such pair resolves ranks;
- range count <= collect_threshold: one combined in-range collect
  (tagged by pair) finishes locally.

``max_groups`` guards driver state: grouped order statistics over
unbounded key cardinality is a different problem (per-key sketches),
not this operator. Never returns silent nulls — non-convergence
raises.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_B = 4096
_GLOBAL = ""  # synthetic group key for the ungrouped case


def quantiles_disc(ds, value_col: str, qs, group_col: str | None = None,
                   collect_threshold: int = 100_000,
                   max_groups: int = 10_000, rank_fn=None,
                   include_n: bool = False) -> pa.Table:
    """percentile_disc(q) per group (or globally when ``group_col`` is
    None): the smallest value whose cumulative in-group count reaches
    ceil(q * n_group). Returns (group_col?, q, value[, n]).

    ``rank_fn(q, n) -> 1-based rank`` overrides the percentile_disc
    rank — the hook that lets percentile_cont (quantiles_cont) select
    arbitrary order statistics through the same refinement engine.
    ``include_n`` appends each group's row count (needed by callers
    computing interpolation fractions)."""
    qs = [float(q) for q in qs]

    def _vals(b: pd.DataFrame, g):
        if group_col is None:
            v = b[value_col].to_numpy(dtype=np.float64)
        else:
            v = b.loc[b[group_col] == g, value_col].to_numpy(
                dtype=np.float64)
        return v[~np.isnan(v)]

    # pass 1: per-group (n, lo, hi) from per-batch partials
    def mm(b: pd.DataFrame) -> pd.DataFrame:
        b = b.dropna(subset=[value_col])
        if group_col is None:
            v = b[value_col].to_numpy(dtype=np.float64)
            v = v[~np.isnan(v)]
            return pd.DataFrame({
                "g": [_GLOBAL], "n": pd.array([len(v)], dtype="int64"),
                "lo": [float(v.min()) if len(v) else np.inf],
                "hi": [float(v.max()) if len(v) else -np.inf]})
        a = (b.groupby(group_col)[value_col]
              .agg(["size", "min", "max"]).reset_index())
        a.columns = ["g", "n", "lo", "hi"]
        return a

    parts = ds.map_batches(mm, batch_format="pandas",
                           batch_size=None).to_pandas()
    agg = parts.groupby("g").agg(n=("n", "sum"), lo=("lo", "min"),
                                 hi=("hi", "max"))
    agg = agg[agg["n"] > 0]
    if len(agg) > max_groups:
        raise ValueError(
            f"{len(agg)} groups exceeds max_groups={max_groups}; "
            f"grouped exact quantiles need bounded group cardinality")

    def _rank(q: float, n: int) -> int:
        # percentile_disc rank = ceil(q*n) computed EXACTLY: float
        # ceil overshoots when q*n lands just above an integer in
        # binary (0.07*100 == 7.000000000000001 → ceil 8). Fraction
        # over the decimal literal keeps e.g. q=0.07, n=100 at rank 7.
        from fractions import Fraction

        f = Fraction(str(q)) * n
        return max(1, -(-f.numerator // f.denominator))

    rank = rank_fn or _rank
    state = {(g, q): {"k": rank(q, int(r["n"])),
                      "lo": float(r["lo"]), "hi": float(r["hi"]),
                      "done": None}
             for g, r in agg.iterrows() for q in qs}

    for _ in range(8):
        active = {gq: s for gq, s in state.items() if s["done"] is None}
        for gq, s in list(active.items()):
            if s["lo"] == s["hi"]:
                s["done"] = s["lo"]
                del active[gq]
        if not active:
            break
        edges = {gq: np.linspace(s["lo"], s["hi"], _B + 1)
                 for gq, s in active.items()}
        keys = sorted(active)

        def hist(b: pd.DataFrame, _e=edges, _ks=keys) -> pd.DataFrame:
            rows = {"g": [], "q": [], "counts": [], "below": [],
                    "rmin": [], "rmax": []}
            cache: dict = {}
            for (g, q) in _ks:
                if g not in cache:
                    cache[g] = _vals(b, g)
                v = cache[g]
                e = _e[(g, q)]
                inr = v[(v >= e[0]) & (v <= e[-1])]
                idx = np.minimum(np.searchsorted(e, inr, side="right") - 1,
                                 _B - 1)
                rows["g"].append(g)
                rows["q"].append(q)
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
        need_count: dict = {}    # (g,q) -> (rmin, rmax, below)
        need_collect: dict = {}  # (g,q) -> (lo, hi, closed, below)
        for gq in keys:
            g, q = gq
            s = active[gq]
            sub = hp[(hp["g"] == g) & (hp["q"] == q)]
            rmin = float(sub["rmin"].min())
            rmax = float(sub["rmax"].max())
            if rmin == rmax:
                s["done"] = rmin
                continue
            total = np.sum(np.stack([np.asarray(c)
                                     for c in sub["counts"]]), axis=0)
            below = int(sub["below"].sum())
            if np.nextafter(rmin, np.inf) >= rmax:
                need_count[gq] = (rmin, rmax, below)
                continue
            cum = below + np.cumsum(total)
            i = int(np.searchsorted(cum, s["k"]))
            e = edges[gq]
            new_below = below + int(total[:i].sum())
            s["lo"], s["hi"] = float(e[i]), float(e[i + 1])
            if total[i] <= collect_threshold:
                need_collect[gq] = (s["lo"], s["hi"], i == _B - 1,
                                    new_below)

        if need_count:
            # ONE combined pass counts every adjacent-double pair's
            # low value exactly
            ck = sorted(need_count)

            def count_eq(b: pd.DataFrame, _ck=ck,
                         _nc=need_count) -> pd.DataFrame:
                cache: dict = {}
                out = []
                for gq in _ck:
                    g, _ = gq
                    if g not in cache:
                        cache[g] = _vals(b, g)
                    out.append(int((cache[g] == _nc[gq][0]).sum()))
                return pd.DataFrame({"i": np.arange(len(_ck)),
                                     "c": pd.array(out, dtype="int64")})

            cp = (ds.map_batches(count_eq, batch_format="pandas",
                                 batch_size=None).to_pandas()
                  .groupby("i")["c"].sum())
            for pos, gq in enumerate(ck):
                rmin, rmax, below = need_count[gq]
                s = state[gq]
                s["done"] = (rmin if s["k"] - below <= int(cp[pos])
                             else rmax)

        if need_collect:
            # ONE combined pass collects every resolving pair's range
            lk = sorted(need_collect)

            def in_range(b: pd.DataFrame, _lk=lk,
                         _rs=need_collect) -> pd.DataFrame:
                cache: dict = {}
                idx_out, val_out = [], []
                for pos, gq in enumerate(_lk):
                    g, _ = gq
                    if g not in cache:
                        cache[g] = _vals(b, g)
                    v = cache[g]
                    lo, hi, closed, _ = _rs[gq]
                    m = (v >= lo) & ((v <= hi) if closed else (v < hi))
                    hits = v[m]
                    idx_out.append(np.full(len(hits), pos, np.int64))
                    val_out.append(hits)
                return pd.DataFrame({
                    "i": np.concatenate(idx_out or [np.array([], np.int64)]),
                    "v": np.concatenate(val_out or [np.array([])])})

            cp = ds.map_batches(in_range, batch_format="pandas",
                                batch_size=None).to_pandas()
            for pos, gq in enumerate(lk):
                vals = np.sort(cp.loc[cp["i"] == pos, "v"].to_numpy())
                s = state[gq]
                s["done"] = float(vals[s["k"] - need_collect[gq][3] - 1])

    not_done = [gq for gq, s in state.items() if s["done"] is None]
    if not_done:
        raise RuntimeError(
            f"quantile refinement did not converge for {not_done} — "
            f"raise collect_threshold or the pass cap (never returns "
            f"a silent null)")

    out_g, out_q, out_v, out_n = [], [], [], []
    for g in sorted(agg.index):
        for q in qs:
            out_g.append(g)
            out_q.append(q)
            out_v.append(state[(g, q)]["done"])
            out_n.append(int(agg.loc[g, "n"]))
    cols = {}
    if group_col is not None:
        cols[group_col] = pa.array(out_g)
    cols["q"] = pa.array(out_q, pa.float64())
    cols["value"] = pa.array(out_v, pa.float64())
    if include_n:
        cols["n"] = pa.array(out_n, pa.int64())
    return pa.table(cols)


def _cont_pos(q: float, n: int):
    """percentile_cont's 1-based lower order-statistic index and exact
    interpolation fraction: pos = 1 + (n-1)·q computed in Fractions
    over the decimal literal (float arithmetic overshoots integers —
    the same failure mode _rank guards against)."""
    from fractions import Fraction

    f = 1 + Fraction(str(q)) * (n - 1)
    k = f.numerator // f.denominator
    return k, f - k


def quantiles_cont(ds, value_col: str, qs, group_col: str | None = None,
                   collect_threshold: int = 100_000,
                   max_groups: int = 10_000) -> pa.Table:
    """percentile_cont (linear interpolation between the two bracketing
    order statistics) per group or globally — still NO global sort:
    two runs of the histogram-refinement engine select the lower and
    upper order statistics for every (group, q), and the interpolation
    v_lo + frac·(v_hi − v_lo) happens on the (group × q)-sized result
    with exact fractions. Returns (group_col?, q, value); value rounded
    to 6 dp (the driver-hash convention for derived floats)."""
    qs = [float(q) for q in qs]
    lo = quantiles_disc(ds, value_col, qs, group_col=group_col,
                        collect_threshold=collect_threshold,
                        max_groups=max_groups,
                        rank_fn=lambda q, n: _cont_pos(q, n)[0],
                        include_n=True).to_pandas()
    hi = quantiles_disc(ds, value_col, qs, group_col=group_col,
                        collect_threshold=collect_threshold,
                        max_groups=max_groups,
                        rank_fn=lambda q, n: min(n, _cont_pos(q, n)[0] + 1)
                        ).to_pandas()
    vals = []
    for i in range(len(lo)):
        k, frac = _cont_pos(float(lo["q"].iloc[i]), int(lo["n"].iloc[i]))
        v1 = float(lo["value"].iloc[i])
        v2 = float(hi["value"].iloc[i])
        vals.append(round(v1 + float(frac) * (v2 - v1), 6))
    cols = {}
    if group_col is not None:
        cols[group_col] = pa.array(lo[group_col].tolist())
    cols["q"] = pa.array(lo["q"].to_numpy(), pa.float64())
    cols["value"] = pa.array(vals, pa.float64())
    return pa.table(cols)


def grouped_quantile_disc(ds, group_col: str, value_col: str, q: float,
                          collect_threshold: int = 100_000,
                          max_groups: int = 10_000) -> pa.Table:
    """Single-q grouped convenience wrapper: (group_col, value)."""
    t = quantiles_disc(ds, value_col, [q], group_col=group_col,
                       collect_threshold=collect_threshold,
                       max_groups=max_groups)
    return t.select([group_col, "value"])
