"""Append path: Dataset → fragments → one atomic manifest commit.

The reference's flush (drain buffer → pivot to RecordBatch → Delta
write → commit, src/pipeline/mod.rs:186-248) becomes: stream the input
Dataset through a FragmentWriter map_batches stage (each batch → one
immutable parquet fragment; only tiny metadata rows reach the driver),
then a single manifest CAS makes all fragments visible atomically.
A crash before the commit leaves only unreferenced files (invisible;
swept later by expire) — the write-then-commit ordering that gives the
reference its exactly-once anchor (src/kafka/mod.rs:187-231).
"""

from __future__ import annotations

import time
import uuid

from ..state.lineage import RunContext
from ..tablefmt.catalog import Table
from ..tablefmt.fragments import FragmentWriter, frags_from_meta
from ..tablefmt.manifest import Manifest
from ..tablefmt.schema import merge_schemas, validate_subset


def commit_fragments(table: Table, new_frags, incoming: "pa.Schema",
                     mode: str = "default", txn: dict | None = None,
                     kind: str = "append") -> Manifest:
    """One atomic append-style commit of already-written fragments:
    ledger watermark merge + optional schema evolution + CAS. Shared by
    ``append`` and ``TableDatasink`` so the commit semantics can't
    drift between the two write surfaces."""

    def build(latest: Manifest) -> Manifest:
        merged_txn = {k: dict(v) for k, v in latest.txn.items()}
        for app, parts in (txn or {}).items():
            cur = merged_txn.setdefault(app, {})
            for p, s in parts.items():
                cur[str(p)] = max(int(s), int(cur.get(str(p), -1)))
        schema = (merge_schemas(latest.schema, incoming)
                  if mode == "merge_schema" else latest.schema)
        props = dict(latest.properties)
        if schema != latest.schema:
            # older fragments now need null-fill at read time (see
            # Snapshot.dataset); a full re-cluster clears this
            props["schema_evolved"] = True
        return Manifest(version=-1, parent=None, kind=kind,
                        schema=schema,
                        fragments=list(latest.fragments) + new_frags,
                        txn=merged_txn, properties=props)

    return table.commit(build)


def append(table: Table, ds, run_id: str | None = None,
           target_fragment_rows: int = 4096, txn: dict | None = None,
           kind: str = "append", mode: str = "default") -> Manifest:
    """Append a Dataset's rows to the table as new fragments.

    ``txn``: optional {app_id: {partition: seq}} watermarks to merge
    into the ledger in the same commit (idempotent-writer identity).

    ``mode``: the reference's write-mode seam (config ``Insert`` →
    ``WriteMode::Default``, ``Upsert`` → ``WriteMode::MergeSchema``,
    src/pipeline/mod.rs:224-227 + src/config/mod.rs:52-57):
    ``"default"`` rejects columns missing from the table schema;
    ``"merge_schema"`` evolves the schema in the same commit — new
    columns are appended as nullable, and older fragments surface
    nulls for them at read time.
    """
    t0 = time.time()
    run_id = run_id or uuid.uuid4().hex[:8]
    incoming = ds.schema().base_schema  # Ray Dataset schema → pa.Schema
    if mode == "default":
        validate_subset(table.schema(), incoming)
    elif mode != "merge_schema":
        raise ValueError(f"unknown write mode {mode!r}")
    cons = table.constraints()
    if cons:
        # CHECK-constraint gate: violating rows dead-letter to
        # quarantine/ and never reach a fragment (stages/constraints.py)
        from ..stages.constraints import ConstraintFilter

        ds = ds.map_batches(ConstraintFilter(table.root, cons, run_id),
                            batch_format="pyarrow")
    meta = ds.map_batches(
        FragmentWriter(table.root, run_id),
        batch_format="pyarrow", batch_size=target_fragment_rows,
    ).take_all()  # tiny: one row per fragment
    new_frags = frags_from_meta(meta)
    m = commit_fragments(table, new_frags, incoming, mode=mode,
                         txn=txn, kind=kind)
    # monitoring surface (A1): rows/bytes landed + flush seconds — the
    # reference records the same counters per flush
    # (src/pipeline/mod.rs:186-248 + src/monitoring/mod.rs:150-202)
    RunContext(table.root, run_id, job="append").log_metric(
        "append_done",
        rows=sum(f.rows for f in new_frags),
        bytes_written=sum(f.bytes for f in new_frags),
        fragments=len(new_frags),
        seconds=time.time() - t0,
        committed_version=m.version)
    return m
