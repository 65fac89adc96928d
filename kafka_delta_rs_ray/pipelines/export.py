"""Resumable consumer-facing export: snapshot → partitioned parquet.

The training-data hand-off: re-shard a table snapshot (deletes
applied, columns pruned) into plain parquet files a downstream
trainer/loader consumes without knowing the table format. Design per
the 100 TB brief's "resumable output" rule:

- one worker task per table fragment, shard name = fragment id
  (deterministic), written atomically (tmp + rename) — a failed run
  re-executed with the same ``out_dir`` SKIPS every finished shard
  and rewrites only the missing ones;
- the driver sees only per-shard metadata rows; row data moves
  worker→disk directly (ship-paths-not-data, same contract as the
  scan's dirty readers);
- an ``_MANIFEST.json`` (shard list + row counts + source version) is
  written LAST, so its presence marks a complete export.
"""

from __future__ import annotations

import json
import os
import time
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

from ..state.lineage import RunContext
from ..tablefmt.catalog import Table


class _ExportTask:
    """meta row (fragment id/path/delete_paths) → one shard file +
    one metadata row. Reuses the dirty-reader primitive so deletion
    vectors subtract worker-side."""

    def __init__(self, root: str, out_dir: str, columns, schema,
                 conform: bool):
        self.root = root
        self.out_dir = out_dir
        self.columns = columns
        self.schema = schema
        self.conform = conform

    def __call__(self, meta: pa.Table) -> pa.Table:
        from ..tablefmt.snapshot import _DirtyFragmentReader

        out_rows = []
        reader = _DirtyFragmentReader(
            self.root, self.columns,
            schema=self.schema if self.conform else None)
        for i in range(meta.num_rows):
            fid = meta["id"][i].as_py()
            dest = os.path.join(self.out_dir, f"shard-{fid}.parquet")
            if os.path.exists(dest):  # resume: finished shard
                out_rows.append({"shard": os.path.basename(dest),
                                 "rows": pq.read_metadata(dest).num_rows,
                                 "skipped": True})
                continue
            tbl = reader(meta.slice(i, 1))
            tmp = dest + f".tmp-{uuid.uuid4().hex[:8]}"
            pq.write_table(tbl, tmp, compression="zstd",
                           compression_level=3)
            os.replace(tmp, dest)  # atomic: readers never see partials
            out_rows.append({"shard": os.path.basename(dest),
                             "rows": tbl.num_rows, "skipped": False})
        return pa.Table.from_pylist(out_rows)


def export_shards(table: Table, out_dir: str, columns: list | None = None,
                  version: int | None = None, prune: dict | None = None,
                  run_id: str | None = None,
                  overwrite: bool = False) -> dict:
    """Export a snapshot as plain parquet shards (one per fragment).

    Re-running with the same ``out_dir`` skips finished shards —
    resume is free, but ONLY for the same (source version, columns,
    prune) generation: an ``_EXPORT_STATE.json`` marker written before
    any shard records the generation, and a re-run against a different
    one (or an out_dir with unidentified shard files) raises unless
    ``overwrite=True``, which first removes every prior shard — stale
    rows or orphaned shards from rewritten fragments can never mix
    into a 'complete' export. One writer per out_dir at a time (the
    same single-run contract as the table's maintenance jobs).

    Returns the export manifest (also written to
    ``out_dir/_MANIFEST.json`` as the completeness marker)."""
    import glob as _glob

    import ray.data as rd

    from ..errors import StateError

    t0 = time.time()
    run_id = run_id or uuid.uuid4().hex[:8]
    os.makedirs(out_dir, exist_ok=True)
    snap = table.snapshot(version=version)
    plan = snap.read_plan(columns=columns, prune=prune)
    frags, schema, conform = (plan["fragments"], plan["schema"],
                              plan["conform"])

    generation = {"source_version": snap.version,
                  "columns": list(columns) if columns else None,
                  "prune": {k: list(v) for k, v in (prune or {}).items()}
                           or None}
    state_path = os.path.join(out_dir, "_EXPORT_STATE.json")
    prior = None
    if os.path.exists(state_path):
        with open(state_path) as f:
            prior = json.load(f)
    existing = _glob.glob(os.path.join(out_dir, "shard-*.parquet"))
    if prior != generation and (prior is not None or existing):
        if not overwrite:
            raise StateError(
                f"{out_dir} holds a different export generation "
                f"({prior or 'no state marker'} vs {generation}); pass "
                f"overwrite=True to replace it, or use a fresh out_dir")
        for p in existing + [os.path.join(out_dir, "_MANIFEST.json")]:
            if os.path.exists(p):
                os.unlink(p)
    # crashed writers leave shard-*.tmp-* behind; single-writer
    # contract makes this sweep safe on every start
    for p in _glob.glob(os.path.join(out_dir, "shard-*.tmp-*")):
        os.unlink(p)
    tmp_state = state_path + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp_state, "w") as f:
        json.dump(generation, f)
    os.replace(tmp_state, state_path)

    result = {"source_version": snap.version, "shards": [], "rows": 0,
              "resumed_shards": 0}
    if frags:
        meta = rd.from_items(
            [{"id": f.id, "path": f.path,
              "delete_paths": list(f.delete_paths)} for f in frags],
            override_num_blocks=len(frags))
        rows = meta.map_batches(
            _ExportTask(table.root, out_dir, columns, schema, conform),
            batch_format="pyarrow", batch_size=1).take_all()
        rows.sort(key=lambda r: r["shard"])
        result["shards"] = [{"shard": r["shard"], "rows": int(r["rows"])}
                            for r in rows]
        result["rows"] = int(sum(r["rows"] for r in rows))
        result["resumed_shards"] = int(sum(bool(r["skipped"])
                                           for r in rows))
    tmp = os.path.join(out_dir, f"._manifest-{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as f:
        json.dump(result, f)
    os.replace(tmp, os.path.join(out_dir, "_MANIFEST.json"))
    RunContext(table.root, run_id, job="export").log_metric(
        "export_done", rows=result["rows"],
        shards=len(result["shards"]),
        resumed=result.get("resumed_shards", 0),
        seconds=time.time() - t0)
    return result
