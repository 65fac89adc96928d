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
    """Per-fragment task: read predicate columns + key, evaluate the
    mask vectorized, subtract the fragment's already-dead keys (its
    delete files, paths shipped in the meta row), write the fragment's
    NEW delete file from the worker, and return one (fragment_id,
    del_rel, n) metadata row. Matches are per-fragment by construction
    so no shuffle is ever needed, and the driver sees O(fragments)
    metadata however many rows the predicate hits — a predicate
    deleting 30% of a 100 TB table costs the driver nothing."""

    def __init__(self, root: str, run_id: str, predicate: dict,
                 evolved: bool = False):
        self.root = root
        self.run_id = run_id
        self.predicate = predicate
        # only evolved tables can have fragments missing a predicate
        # column; the footer probe is skipped otherwise (one read per
        # overlap fragment on the hot delete path)
        self.evolved = evolved

    def __call__(self, meta: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..tablefmt.fragments import read_dead_keys

        out = {"fragment_id": [], "del_rel": [], "n": []}
        cols = sorted(set(self.predicate) | {"image_id"})
        for row in meta.to_pylist():
            # schema evolution: a fragment predating a merge_schema ADD
            # physically lacks the column — its rows are all NULL there,
            # and SQL comparison-with-NULL never matches, so the whole
            # fragment is skipped (same semantics as a scan + null mask)
            if self.evolved:
                have = set(pq.read_schema(
                    f"{self.root}/{row['path']}").names)
                if any(c not in have for c in self.predicate):
                    continue
            t = pq.read_table(f"{self.root}/{row['path']}", columns=cols)
            mask = np.ones(t.num_rows, dtype=bool)
            for col, (lo, hi) in self.predicate.items():
                v = t[col].to_numpy(zero_copy_only=False)
                if lo is not None:
                    mask &= v >= lo
                if hi is not None:
                    mask &= v <= hi
            hit = t.filter(pa.array(mask)).select(["image_id"])
            if hit.num_rows == 0:
                continue
            dead = read_dead_keys(self.root, row["id"],
                                  row.get("delete_paths"))
            if dead is not None and len(dead) > 0:
                hit = hit.filter(pc.invert(
                    pc.is_in(hit["image_id"], value_set=dead)))
            if hit.num_rows == 0:
                continue
            rec = pa.table({
                "fragment_id": pa.array([row["id"]] * hit.num_rows,
                                        pa.string()),
                "image_id": hit["image_id"].combine_chunks()})
            rel = write_delete_file(self.root,
                                    f"{self.run_id}-{row['id'][:12]}", rec)
            out["fragment_id"].append(row["id"])
            out["del_rel"].append(rel)
            out["n"].append(hit.num_rows)
        return pa.table({"fragment_id": pa.array(out["fragment_id"],
                                                 pa.string()),
                         "del_rel": pa.array(out["del_rel"], pa.string()),
                         "n": pa.array(out["n"], pa.int64())})


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

    by_frag: dict[str, int] = {}
    del_rel_by_frag: dict[str, str] = {}
    if overlap:
        metas = rd.from_items(
            [{"id": f.id, "path": f.path,
              "delete_paths": list(f.delete_paths)} for f in overlap],
            override_num_blocks=len(overlap))
        parts = metas.map_batches(
            _ScanMatches(table.root, ctx.run_id, predicate,
                         evolved=bool(snap.manifest.properties
                                      .get("schema_evolved"))),
            batch_format="pyarrow", batch_size=1).take_all()
        for r in parts:  # O(touched fragments) metadata rows
            by_frag[r["fragment_id"]] = int(r["n"])
            del_rel_by_frag[r["fragment_id"]] = r["del_rel"]
    n_deleted = sum(by_frag.values())
    if not contained and n_deleted == 0:
        ctx.log_metric("delete_noop", seconds=time.time() - t0)
        return None

    dropped = {f.id for f in contained}
    # delete-state fingerprints at SCAN time (compact.py discipline):
    # a concurrent update_where tombstones matching rows in F and
    # rewrites them into a NEW fragment — F stays live, so a liveness
    # check alone would commit this delete while the updated copies
    # survive. A changed fingerprint on any touched/contained
    # fragment conflicts instead.
    from .compact import _delete_fp

    scanned_fp = {f.id: _delete_fp(f) for f in contained + overlap}

    def build(latest: Manifest) -> Manifest:
        latest_by_id = {f.id: f for f in latest.fragments}
        for fid in set(by_frag) | dropped:
            if fid not in latest_by_id:
                raise CommitConflict(
                    f"fragment {fid} was rewritten concurrently; "
                    f"rerun delete_where")
            if _delete_fp(latest_by_id[fid]) != scanned_fp[fid]:
                raise CommitConflict(
                    f"fragment {fid}'s delete state changed "
                    f"concurrently; rerun delete_where")
        frags = []
        for f in latest.fragments:
            if f.id in dropped:
                continue
            if f.id in by_frag:
                f = type(f)(**{**f.to_json()})
                f.delete_paths = (list(f.delete_paths)
                                  + [del_rel_by_frag[f.id]])
                f.deleted_rows = f.deleted_rows + by_frag[f.id]
            frags.append(f)
        return Manifest(version=-1, parent=None, kind="delete",
                        schema=latest.schema, fragments=frags,
                        txn=latest.txn, properties=latest.properties)

    m = table.commit(build)
    ctx.log_metric("delete_done", predicate=str(predicate),
                   dropped_fragments=len(dropped),
                   deleted_rows=n_deleted,
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
