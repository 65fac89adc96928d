"""Table layout statistics (ANALYZE-lite): clustering quality and
scan-pruning effectiveness, computed from the manifest's zone maps —
METADATA ONLY, no data I/O, so it runs on the driver in O(fragments)
regardless of table bytes.

Why it exists: compaction/cluster decisions and reader predicates all
lean on zone-map selectivity; an operator needs a one-call answer to
"is this table still well-clustered, or is it time to re-cluster?"
— the reference exposes the mirror-image health surface for its
stream (lag gauge, src/kafka/mod.rs:199-208); this is the at-rest
analog.
"""

from __future__ import annotations

import numpy as np

from ..tablefmt.catalog import Table


def table_stats(table: Table, columns: list | None = None) -> dict:
    """Per-column layout stats over the latest snapshot:

    - ``coverage``: fraction of fragments carrying a zone map;
    - ``avg_rel_width``: mean fragment (max-min)/global-width — small
      = well-clustered on that column;
    - ``overlap_ratio``: mean number of OTHER fragments overlapping a
      fragment's range (computed by sweep over sorted endpoints) —
      0 = perfectly disjoint, n-1 = useless zone maps;
    - ``est_point_selectivity``: expected fraction of fragments a
      random point predicate must scan (sum of rel widths / n).

    Plus table-level size/rows/delete-debt counters. ``columns``
    defaults to every column with numeric zone maps."""
    m = table.read_manifest()
    frags = m.fragments
    n = len(frags)
    report: dict = {
        "version": m.version,
        "fragments": n,
        "rows": int(m.total_rows()),
        "bytes": int(sum(f.bytes for f in frags)),
        "deleted_rows": int(sum(f.deleted_rows for f in frags)),
        "fragments_with_deletes": sum(1 for f in frags if f.delete_paths),
        "cluster_curve": m.properties.get("cluster_curve"),
        "cluster_key_cols": m.properties.get("cluster_key_cols"),
        "constraints": [c["name"] for c in
                        m.properties.get("constraints", [])],
        "branches": sorted(table.branches()),
        "columns": {},
    }
    if n == 0:
        return report

    if columns is None:
        columns = sorted({c for f in frags for c, s in f.stats.items()
                          if isinstance(s.get("min"), (int, float))
                          and not isinstance(s.get("min"), bool)})
    for c in columns:
        spans = [(float(f.stats[c]["min"]), float(f.stats[c]["max"]))
                 for f in frags
                 if c in f.stats and f.stats[c].get("min") is not None
                 and isinstance(f.stats[c]["min"], (int, float))
                 and not isinstance(f.stats[c]["min"], bool)]
        if not spans:
            continue
        lo = min(s[0] for s in spans)
        hi = max(s[1] for s in spans)
        width = hi - lo
        k = len(spans)
        rel = ([(s[1] - s[0]) / width for s in spans] if width > 0
               else [0.0] * k)
        # pairwise overlap count via endpoint sweep: at each span
        # start, the number of already-open spans = overlaps it joins
        events = sorted([(s[0], 0) for s in spans]
                        + [(s[1], 1) for s in spans])
        open_n = 0
        pair_overlaps = 0
        for _, kind in events:
            if kind == 0:
                pair_overlaps += open_n
                open_n += 1
            else:
                open_n -= 1
        report["columns"][c] = {
            "coverage": round(k / n, 4),
            "avg_rel_width": round(float(np.mean(rel)), 6),
            "overlap_ratio": round(2.0 * pair_overlaps / k, 4)
            if k else 0.0,
            "est_point_selectivity": round(float(np.sum(rel)) / k, 6)
            if width > 0 else 1.0,
        }
    return report
