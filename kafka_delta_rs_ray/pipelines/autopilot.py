"""Maintenance autopilot: the policy loop an operator otherwise runs by
hand — read the table's METADATA health signals (state/tablestats), decide
which maintenance is due, run it, report what and why.

The reference's runtime is a single always-on loop whose flush policy
(size/time triggers, src/kafka/mod.rs:182-190) decides when work happens;
at-rest maintenance needs the same closed loop: signals → thresholds →
actions. Decisions are O(fragments) driver-side metadata reads — the data
path is only touched by the maintenance pipelines themselves.

Policy (each independently thresholded, evaluated on the LATEST snapshot):

- **cluster** when the primary cluster key's estimated point-scan
  selectivity exceeds ``max_point_selectivity`` (a point predicate would
  touch too many fragments) — covers both "never clustered" and "layout
  decayed under merges". Clustering rewrites everything (and materializes
  delete debt away), so when it fires, compaction is skipped as subsumed.
- **compact** when delete debt (``deleted_rows / rows``) exceeds
  ``max_delete_debt``, or when the REAL compaction planner
  (plan_compaction, metadata-only) finds a multi-input bin — the exact
  "would compacting change anything" signal, so the loop is quiescent by
  construction (a freshly compacted table plans zero multi-input bins; a
  naive small-fragment ratio re-fires forever on tables smaller than the
  target size).
- **expire** when more than ``keep_last`` versions are retained (the
  usual ``min_age_seconds`` in-flight guard still applies).

``dry_run=True`` returns the decisions without executing — the operator's
"what would you do?" probe.
"""

from __future__ import annotations

from ..state.tablestats import table_stats
from ..tablefmt.catalog import Table

DEFAULT_KEY_COLS = ("phash", "w", "h")  # the image schema's cluster key


def autopilot(table: Table, *, max_delete_debt: float = 0.05,
              max_point_selectivity: float = 0.25,
              min_cluster_fragments: int = 4,
              keep_last: int = 8, min_age_seconds: float = 3600.0,
              target_fragment_bytes: int | None = None,
              incremental_cluster_max_dirty: float = 0.3,
              dry_run: bool = False) -> dict:
    """One policy pass. Returns ``{signals, decisions, actions}`` where
    ``decisions`` lists every triggered job with its reason and
    ``actions`` the committed versions (empty when ``dry_run``)."""
    from ..config import DEFAULT_TARGET_FRAGMENT_BYTES

    tfb = target_fragment_bytes or DEFAULT_TARGET_FRAGMENT_BYTES
    stats = table_stats(table)
    n_frags = stats["fragments"]
    rows = stats["rows"]
    debt = stats["deleted_rows"] / rows if rows else 0.0

    from .compact import plan_compaction

    m = table.read_manifest()
    multi_bins = sum(1 for b in plan_compaction(m, target_bytes=tfb)
                     if len(b["fragment_ids"]) > 1)

    key_cols = stats.get("cluster_key_cols") or [
        c for c in DEFAULT_KEY_COLS if c in stats["columns"]]
    sel = None
    if key_cols and key_cols[0] in stats["columns"]:
        sel = stats["columns"][key_cols[0]]["est_point_selectivity"]

    n_versions = len(table.history())

    # tiered clustering: dirty = not zcode-sorted or carrying deletes.
    # A small dirty fraction on an otherwise-clustered table takes the
    # O(new data) incremental path; a large one — or pure overlap decay
    # with NOTHING dirty (incremental would be a no-op and the trigger
    # would re-fire forever) — takes the full rewrite.
    dirty_rows = sum(f.rows for f in m.fragments
                     if f.sorted_by != "zcode" or f.delete_paths)
    dirty_frac = dirty_rows / rows if rows else 0.0
    has_sorted = any(f.sorted_by == "zcode" and not f.delete_paths
                     for f in m.fragments)

    decisions = []
    if (sel is not None and n_frags >= min_cluster_fragments
            and sel > max_point_selectivity):
        inc = (dirty_rows > 0 and has_sorted
               and dirty_frac <= incremental_cluster_max_dirty)
        decisions.append({
            "job": "cluster",
            "mode": "incremental" if inc else "full",
            "reason": (f"est_point_selectivity({key_cols[0]}) = {sel} > "
                       f"{max_point_selectivity} over {n_frags} fragments; "
                       f"dirty_fraction = {round(dirty_frac, 4)} → "
                       f"{'incremental' if inc else 'full'} rewrite")})
    elif debt > max_delete_debt or multi_bins > 0:
        decisions.append({
            "job": "compact",
            "reason": (f"delete_debt = {round(debt, 4)} > {max_delete_debt}"
                       if debt > max_delete_debt else
                       f"{multi_bins} multi-input compaction bins planned")})
    if n_versions > keep_last:
        decisions.append({
            "job": "expire",
            "reason": f"{n_versions} versions retained > "
                      f"keep_last = {keep_last}"})

    signals = {"fragments": n_frags, "rows": rows,
               "delete_debt": round(debt, 6),
               "multi_input_bins": multi_bins,
               "point_selectivity": sel, "cluster_key": key_cols or None,
               "dirty_rows": dirty_rows,
               "dirty_fraction": round(dirty_frac, 6),
               "versions": n_versions}
    out = {"signals": signals, "decisions": decisions, "actions": [],
           "dry_run": dry_run}
    if dry_run:
        return out

    for d in decisions:
        if d["job"] == "cluster":
            from .cluster import cluster

            kw = {"target_fragment_bytes": tfb,
                  "incremental": d.get("mode") == "incremental"}
            if stats.get("cluster_key_cols"):
                kw["key_cols"] = stats["cluster_key_cols"]
            man = cluster(table, **kw)
            out["actions"].append({"job": "cluster",
                                   "mode": d.get("mode", "full"),
                                   "committed_version":
                                       None if man is None else man.version})
        elif d["job"] == "compact":
            from .compact import compact

            man = compact(table, target_bytes=tfb)
            out["actions"].append({"job": "compact",
                                   "committed_version":
                                       None if man is None else man.version})
        elif d["job"] == "expire":
            from .expire import expire

            rep = expire(table, keep_last=keep_last,
                         min_age_seconds=min_age_seconds)
            out["actions"].append({"job": "expire",
                                   "removed": len(rep["removed_files"])})
    return out
