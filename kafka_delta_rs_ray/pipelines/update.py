"""UPDATE ... SET ... WHERE: predicate update via zone maps, deletion
vectors and rewrite fragments — the copy-on-write UPDATE member of the
maintenance family (Delta UPDATE / Iceberg copy-on-write row update).

Plan (driver, metadata only): zone maps prune DISJOINT fragments before
any I/O (same classifier as delete_where); every fragment that may hold
a matching row gets ONE rewrite task that

1. reads the full fragment (updates rewrite whole rows, so unlike
   delete no column projection applies),
2. evaluates the predicate mask vectorized and subtracts the
   fragment's already-dead keys,
3. applies the SET assignments to the matched rows (``pa.repeat``
   scalar columns — zero Python-per-row work),
4. enforces the table's CHECK constraints on the UPDATED form: a row
   whose updated values would violate a constraint keeps its ORIGINAL
   row live and dead-letters the attempted update to quarantine/ (the
   'violations never poison the commit' contract extended to UPDATE —
   Delta aborts the whole statement instead; our dead-letter posture
   follows the reference's per-record routing,
   src/kafka/mod.rs:288-300),
5. writes the fragment's delete file (tombstoning the old versions of
   surviving matched keys) and ONE new fragment holding the updated
   rows, both from the worker — the driver sees O(touched fragments)
   metadata however many rows the predicate hits.

Commit: one CAS attaching delete files to touched fragments and
appending the rewrite fragments (kind="update"). Touched fragments
must still be live at commit time — a concurrent compaction moved
their rows, so the update must re-run against the new layout
(CommitConflict), exactly like delete_where. Watermarks (txn ledger)
are untouched: UPDATE is not a changeset apply, so exactly-once replay
bookkeeping does not move.

The key column (``image_id``) cannot be assigned: deletion vectors
identify rows by key, so a key rewrite is semantically delete+insert —
use merge() with a changeset for that.
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..errors import CommitConflict, ConfigError
from ..state.lineage import RunContext
from ..tablefmt.catalog import Table
from ..tablefmt.fragments import write_delete_file, write_fragment_table
from ..tablefmt.manifest import Fragment, Manifest
from .delete import _classify

KEY_COLUMN = "image_id"


def _validate_assignments(assignments: dict, schema: pa.Schema) -> dict:
    """Validate-early (reference config posture, src/config/mod.rs:
    96-177): unknown column, key column, or a type-incompatible value
    fails at call time with a specific message, never inside a task."""
    if not assignments:
        raise ConfigError("update_where needs at least one assignment")
    out = {}
    for col, val in assignments.items():
        if col == KEY_COLUMN:
            raise ConfigError(
                f"cannot assign the key column {KEY_COLUMN!r}; a key "
                f"rewrite is delete+insert — use merge()")
        if col not in schema.names:
            raise ConfigError(
                f"assignment column {col!r} is not in the table schema "
                f"({sorted(schema.names)})")
        typ = schema.field(col).type
        try:
            out[col] = pa.scalar(val, type=typ)
        except (pa.ArrowInvalid, pa.ArrowTypeError, ValueError,
                TypeError, OverflowError) as e:
            raise ConfigError(
                f"assignment {col!r}={val!r} is not compatible with "
                f"column type {typ} ({e})") from None
    return out


class _RewriteMatches:
    """Per-fragment task: full read → predicate mask → dead-key
    subtraction → assignment application → CHECK enforcement on the
    updated form → delete file + rewrite fragment written worker-side.
    Returns one metadata row per touched fragment; matches stay
    per-fragment by construction so no shuffle is ever needed."""

    def __init__(self, root: str, run_id: str, predicate: dict,
                 assignments: dict, constraints: list[dict],
                 schema_b64: str | None = None):
        self.root = root
        self.run_id = run_id
        self.predicate = predicate
        # pa.Scalar doesn't pickle across all types; ship raw values +
        # type names and rebuild per task
        self.assignments = {c: (s.as_py(), str(s.type))
                            for c, s in assignments.items()}
        self.constraints = constraints
        # manifest schema for evolved tables: old fragments may lack
        # an assigned column physically — conform (null-fill) before
        # assigning so the rewrite fragment carries the full schema
        self.schema_b64 = schema_b64

    def __call__(self, meta: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..stages.constraints import constraint_violations
        from ..stages.validate import write_quarantine_table
        from ..tablefmt.fragments import read_dead_keys

        target_schema = None
        if self.schema_b64 is not None:
            from ..tablefmt.schema import schema_from_b64

            target_schema = schema_from_b64(self.schema_b64)
        out = {"fragment_id": [], "del_rel": [], "n": [],
               "frag_json": [], "quarantined": []}
        for row in meta.to_pylist():
            # schema evolution: fragment predating an ADD of a
            # predicate column → all-NULL there → never matches
            # (probe gated on evolution — schema_b64 is only shipped
            # for evolved tables)
            if target_schema is not None:
                have = set(pq.read_schema(
                    f"{self.root}/{row['path']}").names)
                if any(c not in have for c in self.predicate):
                    continue
            t = pq.read_table(f"{self.root}/{row['path']}")
            if target_schema is not None:
                from ..tablefmt.schema import conform_table

                t = conform_table(t, target_schema)
            mask = np.ones(t.num_rows, dtype=bool)
            for col, (lo, hi) in self.predicate.items():
                v = t[col].to_numpy(zero_copy_only=False)
                if lo is not None:
                    mask &= v >= lo
                if hi is not None:
                    mask &= v <= hi
            dead = read_dead_keys(self.root, row["id"],
                                  row.get("delete_paths"))
            if dead is not None and len(dead) > 0:
                alive = pc.invert(pc.is_in(
                    t[KEY_COLUMN], value_set=dead)).combine_chunks()
                mask &= alive.to_numpy(zero_copy_only=False)
            if not mask.any():
                continue
            matched = t.filter(pa.array(mask))
            updated = matched
            for col, (val, typname) in self.assignments.items():
                idx = updated.schema.get_field_index(col)
                fld = updated.schema.field(idx)
                updated = updated.set_column(
                    idx, fld,
                    pa.repeat(pa.scalar(val, type=fld.type),
                              updated.num_rows))
            n_quar = 0
            if self.constraints:
                bad, errors = constraint_violations(updated,
                                                    self.constraints)
                if bad.any():
                    quar = updated.filter(pa.array(bad)).append_column(
                        "error", pa.array(
                            [f"update rejected, original row kept: {e}"
                             for e, m in zip(errors, bad) if m],
                            pa.string()))
                    write_quarantine_table(self.root, self.run_id, quar)
                    n_quar = int(bad.sum())
                    updated = updated.filter(pa.array(~bad))
            if updated.num_rows == 0:
                # every matched row's update violated a constraint:
                # originals stay live, nothing to tombstone or rewrite
                out["fragment_id"].append(row["id"])
                out["del_rel"].append("")
                out["n"].append(0)
                out["frag_json"].append("")
                out["quarantined"].append(n_quar)
                continue
            rec = pa.table({
                "fragment_id": pa.array([row["id"]] * updated.num_rows,
                                        pa.string()),
                KEY_COLUMN: updated[KEY_COLUMN].combine_chunks()})
            rel = write_delete_file(self.root,
                                    f"{self.run_id}-{row['id'][:12]}", rec)
            frag = write_fragment_table(updated, self.root, self.run_id)
            out["fragment_id"].append(row["id"])
            out["del_rel"].append(rel)
            out["n"].append(updated.num_rows)
            import json as _json
            out["frag_json"].append(_json.dumps(frag.to_json()))
            out["quarantined"].append(n_quar)
        return pa.table({
            "fragment_id": pa.array(out["fragment_id"], pa.string()),
            "del_rel": pa.array(out["del_rel"], pa.string()),
            "n": pa.array(out["n"], pa.int64()),
            "frag_json": pa.array(out["frag_json"], pa.string()),
            "quarantined": pa.array(out["quarantined"], pa.int64())})


def update_where(table: Table, predicate: dict, assignments: dict,
                 run_id: str | None = None) -> Manifest | None:
    """Update every row matching ``predicate`` ({col: (lo, hi)},
    inclusive bounds, None = unbounded, conditions ANDed) by applying
    ``assignments`` ({col: scalar}). Returns the committed manifest,
    or None when nothing matched (or every attempted update was
    rejected by a CHECK constraint)."""
    import json as _json

    import ray.data as rd

    ctx = RunContext(table.root, run_id, job="update")
    t0 = time.time()
    snap = table.snapshot()
    scalars = _validate_assignments(assignments, snap.manifest.schema)
    cons = table.constraints()

    touched = [f for f in snap.manifest.fragments
               if _classify(f, predicate) != "disjoint"]

    by_frag: dict[str, int] = {}
    del_rel_by_frag: dict[str, str] = {}
    new_frags: list[Fragment] = []
    n_quarantined = 0
    if touched:
        metas = rd.from_items(
            [{"id": f.id, "path": f.path,
              "delete_paths": list(f.delete_paths)} for f in touched],
            override_num_blocks=len(touched))
        schema_b64 = None
        if snap.manifest.properties.get("schema_evolved"):
            from ..tablefmt.schema import schema_to_b64

            schema_b64 = schema_to_b64(snap.manifest.schema)
        parts = metas.map_batches(
            _RewriteMatches(table.root, ctx.run_id, predicate, scalars,
                            cons, schema_b64=schema_b64),
            batch_format="pyarrow", batch_size=1).take_all()
        for r in parts:  # O(touched fragments) metadata rows
            n_quarantined += int(r["quarantined"])
            if int(r["n"]) == 0:
                continue
            by_frag[r["fragment_id"]] = int(r["n"])
            del_rel_by_frag[r["fragment_id"]] = r["del_rel"]
            new_frags.append(Fragment.from_json(_json.loads(
                r["frag_json"])))
    n_updated = sum(by_frag.values())
    if n_updated == 0:
        ctx.log_metric("update_noop", quarantined=n_quarantined,
                       seconds=time.time() - t0)
        return None

    # delete-state fingerprints at SCAN time: the conflict check must
    # catch not only a fragment vanishing (compaction) but a fragment
    # gaining delete files (a concurrent delete_where/update_where/
    # merge tombstoned rows we read as live) — committing over that
    # would resurrect the concurrently-deleted rows with our updated
    # values (compact.py applies the same fingerprint discipline)
    from .compact import _delete_fp

    scanned_fp = {f.id: _delete_fp(f) for f in touched}

    def build(latest: Manifest) -> Manifest:
        latest_by_id = {f.id: f for f in latest.fragments}
        for fid in by_frag:
            if fid not in latest_by_id:
                raise CommitConflict(
                    f"fragment {fid} was rewritten concurrently; "
                    f"rerun update_where")
            if _delete_fp(latest_by_id[fid]) != scanned_fp[fid]:
                raise CommitConflict(
                    f"fragment {fid}'s delete state changed "
                    f"concurrently; rerun update_where")
        frags = []
        for f in latest.fragments:
            if f.id in by_frag:
                f = type(f)(**{**f.to_json()})
                f.delete_paths = (list(f.delete_paths)
                                  + [del_rel_by_frag[f.id]])
                f.deleted_rows = f.deleted_rows + by_frag[f.id]
            frags.append(f)
        return Manifest(version=-1, parent=None, kind="update",
                        schema=latest.schema,
                        fragments=frags + new_frags,
                        txn=latest.txn, properties=latest.properties)

    m = table.commit(build)
    ctx.log_metric("update_done", predicate=str(predicate),
                   assignments=str({c: s.as_py()
                                    for c, s in scalars.items()}),
                   updated_rows=n_updated,
                   quarantined_rows=n_quarantined,
                   rewrite_fragments=len(new_frags),
                   seconds=time.time() - t0,
                   committed_version=m.version)
    return m
