"""DELETE FROM ... WHERE: predicate delete via zone maps + deletion
vectors — the manifest-rewrite member of the maintenance family.

Plan (driver, metadata only): zone maps split fragments into three
classes per the predicate ``{col: (lo, hi)}`` (inclusive bounds, None =
unbounded side, conditions ANDed):

- DISJOINT  — untouched (pruned before any I/O);
- CONTAINED — every row matches → the fragment is DROPPED from the
  manifest wholesale (the classic partition-drop path: no data I/O,
  no delete file);
- OVERLAP   — one task per fragment reads ONLY the predicate columns +
  the key, evaluates the mask vectorized, and emits (fragment_id,
  image_id) delete records.

Commit: one CAS attaching the delete file to touched fragments and
removing contained ones (kind="delete"). The builder requires touched
fragments to still be live — a concurrent compaction moved their rows,
so the delete must re-run against the new layout (CommitConflict).

Reference lineage: deletes are the inverse of the reference's insert
path, but the transaction discipline is the same write-then-CAS
ordering (src/kafka/mod.rs:187-231).
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..errors import CommitConflict
from ..state.lineage import RunContext
from ..tablefmt.catalog import Table
from ..tablefmt.fragments import write_delete_file
from ..tablefmt.manifest import Manifest


def _classify(frag, predicate: dict) -> str:
    """disjoint | contained | overlap, from the fragment's zone maps."""
    contained = True
    for col, (lo, hi) in predicate.items():
        s = frag.stats.get(col)
        if s is None or s["min"] is None:
            contained = False  # no stats → must scan
            continue
        if ((lo is not None and s["max"] < lo)
                or (hi is not None and s["min"] > hi)):
            return "disjoint"
        if ((lo is not None and s["min"] < lo)
                or (hi is not None and s["max"] > hi)):
            contained = False
    # a fragment with prior deletes can't be wholesale-dropped by
    # containment logic alone — its live set is already a subset, so
    # dropping it is still correct; deleted keys just vanish with it
    return "contained" if contained else "overlap"


class _ScanMatches:
    """Per-fragment task: read predicate columns + key, emit delete
    records for matching rows."""

    def __init__(self, root: str, predicate: dict):
        self.root = root
        self.predicate = predicate

    def __call__(self, meta: pa.Table) -> pa.Table:
        out_f, out_k = [], []
        cols = sorted(set(self.predicate) | {"image_id"})
        for row in meta.to_pylist():
            t = pq.read_table(f"{self.root}/{row['path']}", columns=cols)
            mask = np.ones(t.num_rows, dtype=bool)
            for col, (lo, hi) in self.predicate.items():
                v = t[col].to_numpy(zero_copy_only=False)
                if lo is not None:
                    mask &= v >= lo
                if hi is not None:
                    mask &= v <= hi
            keys = np.asarray(t["image_id"].to_pylist(), dtype=object)[mask]
            out_f.extend([row["id"]] * len(keys))
            out_k.extend(keys.tolist())
        return pa.table({"fragment_id": pa.array(out_f, pa.string()),
                         "image_id": pa.array(out_k, pa.string())})


def delete_where(table: Table, predicate: dict,
                 run_id: str | None = None) -> Manifest | None:
    """Delete every row matching ``predicate`` ({col: (lo, hi)}).
    Returns the committed manifest, or None when nothing matched."""
    import ray.data as rd

    ctx = RunContext(table.root, run_id, job="delete")
    t0 = time.time()
    snap = table.snapshot()

    contained, overlap = [], []
    for f in snap.manifest.fragments:
        cls = _classify(f, predicate)
        if cls == "contained":
            contained.append(f)
        elif cls == "overlap":
            overlap.append(f)

    del_tbl = pa.table({"fragment_id": pa.array([], pa.string()),
                        "image_id": pa.array([], pa.string())})
    if overlap:
        metas = rd.from_items([{"id": f.id, "path": f.path} for f in overlap],
                              override_num_blocks=len(overlap))
        parts = metas.map_batches(_ScanMatches(table.root, predicate),
                                  batch_format="pyarrow",
                                  batch_size=1).take_all()
        if parts:
            del_tbl = pa.Table.from_pylist(
                parts, schema=pa.schema([("fragment_id", pa.string()),
                                         ("image_id", pa.string())]))
        if del_tbl.num_rows:
            # subtract keys already dead under existing deletion
            # vectors, else a re-run re-deletes forever (driver-side:
            # the match set is output-sized)
            existing = {fid: set(keys) for fid, keys
                        in snap.read_deletes(overlap).items()}
            if existing:
                keep = [i for i, (fid, k) in enumerate(zip(
                            del_tbl["fragment_id"].to_pylist(),
                            del_tbl["image_id"].to_pylist()))
                        if k not in existing.get(fid, ())]
                del_tbl = del_tbl.take(pa.array(keep, pa.int64()))
    if not contained and del_tbl.num_rows == 0:
        ctx.log_metric("delete_noop", seconds=time.time() - t0)
        return None

    del_rel = None
    by_frag: dict[str, int] = {}
    if del_tbl.num_rows:
        del_rel = write_delete_file(table.root, ctx.run_id, del_tbl)
        for fid in del_tbl["fragment_id"].to_pylist():
            by_frag[fid] = by_frag.get(fid, 0) + 1
    dropped = {f.id for f in contained}

    def build(latest: Manifest) -> Manifest:
        live = latest.fragment_ids()
        for fid in set(by_frag) | dropped:
            if fid not in live:
                raise CommitConflict(
                    f"fragment {fid} was rewritten concurrently; "
                    f"rerun delete_where")
        frags = []
        for f in latest.fragments:
            if f.id in dropped:
                continue
            if f.id in by_frag:
                f = type(f)(**{**f.to_json()})
                f.delete_paths = list(f.delete_paths) + [del_rel]
                f.deleted_rows = f.deleted_rows + by_frag[f.id]
            frags.append(f)
        return Manifest(version=-1, parent=None, kind="delete",
                        schema=latest.schema, fragments=frags,
                        txn=latest.txn, properties=latest.properties)

    m = table.commit(build)
    ctx.log_metric("delete_done", predicate=str(predicate),
                   dropped_fragments=len(dropped),
                   deleted_rows=del_tbl.num_rows,
                   seconds=time.time() - t0,
                   committed_version=m.version)
    return m


def rollback(table: Table, version: int) -> Manifest:
    """Restore the table to an earlier snapshot by COMMITTING a new
    version that re-points to it (time-travel write; history is never
    rewritten, so concurrent readers of newer snapshots are unharmed
    and expire's reachability GC keeps every file the restored version
    needs)."""
    target = table.read_manifest(version)

    def build(latest: Manifest) -> Manifest:
        return Manifest(version=-1, parent=None, kind="rollback",
                        schema=target.schema,
                        fragments=list(target.fragments),
                        txn=latest.txn,  # writer watermarks are NOT
                        # rolled back: replayed changesets must stay
                        # no-ops (exactly-once outlives restore)
                        properties=dict(target.properties,
                                        restored_from=version))
    return table.commit(build)
