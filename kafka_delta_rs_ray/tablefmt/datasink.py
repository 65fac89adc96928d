"""Idiomatic Ray Data write surface: ``ds.write_datasink(
TableDatasink(table))`` lands any Dataset in the table as one atomic
commit, with the engine's full write contract (schema validation,
CHECK constraints → quarantine, ledger watermarks, optimistic CAS).

This is the Dataset-API face of the reference's flush path
(src/pipeline/mod.rs:186-248): Ray's write tasks play the fragment
writers (distributed, streaming — each task writes its blocks as
immutable fragments and returns only metadata), and
``on_write_complete`` plays ``flush_and_commit`` — the driver sees
O(fragments) metadata and publishes ONE manifest CAS. A failed write
leaves only unreferenced files (swept by expire), never a partial
commit — the same write-then-commit ordering every other pipeline
uses.
"""

from __future__ import annotations

import uuid
from typing import Iterable

import pyarrow as pa
from ray.data import Datasink
from ray.data.datasource.datasink import WriteResult

from .catalog import Table
from .fragments import FragmentWriter, frags_from_meta
from .schema import validate_subset


class TableDatasink(Datasink):
    """Write a Dataset into a table as one atomic commit.

    ``mode``: ``"default"`` rejects unknown columns (validated per
    write task — a bad block fails the write before any commit);
    ``"merge_schema"`` evolves the table schema in the commit.
    ``txn``: optional ``{app_id: {partition: seq}}`` watermarks for
    idempotent-writer identity, exactly as ``append(txn=)``.

    After ``ds.write_datasink(sink)``, ``sink.committed`` holds the
    published Manifest (None if the Dataset was empty — empty writes
    commit nothing, the reference's empty-flush skip).
    """

    def __init__(self, table: Table, run_id: str | None = None,
                 mode: str = "default", txn: dict | None = None,
                 target_fragment_rows: int = 4096):
        if mode not in ("default", "merge_schema"):
            raise ValueError(f"unknown write mode {mode!r}")
        self.table = table
        self.run_id = run_id or uuid.uuid4().hex[:8]
        self.mode = mode
        self.txn = txn
        self.target_fragment_rows = int(target_fragment_rows)
        self.table_schema = table.schema()
        self.constraint_list = table.constraints()
        self.committed = None

    @property
    def supports_distributed_writes(self) -> bool:
        return True

    def get_name(self) -> str:
        return f"Table({self.table.root.rsplit('/', 1)[-1]})"

    # -- worker side -------------------------------------------------------
    def write(self, blocks: Iterable, ctx) -> dict:
        from ..stages.constraints import ConstraintFilter

        writer = FragmentWriter(self.table.root, self.run_id)
        gate = (ConstraintFilter(self.table.root, self.constraint_list,
                                 run_id=self.run_id)
                if self.constraint_list else None)
        frag_json: list[str] = []
        schema: pa.Schema | None = None
        for block in blocks:
            if not isinstance(block, pa.Table):
                block = pa.Table.from_pandas(block)
            if block.num_rows == 0:
                continue
            if self.mode == "default":
                # fail the write task (→ no commit) on unknown columns
                validate_subset(self.table_schema, block.schema)
            schema = (block.schema if schema is None
                      else pa.unify_schemas([schema, block.schema]))
            if gate is not None:
                block = gate(block)
            for off in range(0, block.num_rows, self.target_fragment_rows):
                sub = block.slice(off, self.target_fragment_rows)
                if sub.num_rows:
                    meta = writer(sub)
                    frag_json.extend(meta["frag_json"].to_pylist())
        return {"frag_json": frag_json,
                "schema_ipc": (schema.serialize().to_pybytes()
                               if schema is not None else None)}

    # -- driver side -------------------------------------------------------
    def on_write_complete(self, write_result: "WriteResult") -> None:
        from ..pipelines.ingest import commit_fragments
        from ..state.lineage import RunContext

        from .schema import merge_schemas

        rows = [{"frag_json": j} for r in write_result.write_returns
                for j in r["frag_json"]]
        new_frags = frags_from_meta(rows)
        if not new_frags and not self.txn:
            # empty write with no watermark → no commit (reference
            # empty-flush skip). A fragment-less write that CARRIES
            # watermarks (e.g. every row dead-lettered by a CHECK
            # constraint) still commits them — append/merge advance the
            # watermark for quarantined rows too, so a replay stays a
            # no-op instead of re-quarantining forever.
            return
        # fold the per-task block schemas through the format layer's own
        # evolution rules (handles binary/large_binary width promotion)
        incoming = self.table_schema
        for r in write_result.write_returns:
            if r["schema_ipc"]:
                s = pa.ipc.read_schema(pa.py_buffer(r["schema_ipc"]))
                incoming = merge_schemas(incoming, s)
        self.committed = commit_fragments(
            self.table, new_frags, incoming, mode=self.mode,
            txn=self.txn, kind="append")
        RunContext(self.table.root, self.run_id, job="datasink").log_metric(
            "append_done",
            rows=sum(f.rows for f in new_frags),
            bytes_written=sum(f.bytes for f in new_frags),
            fragments=len(new_frags),
            committed_version=self.committed.version)

    def on_write_failed(self, error: Exception) -> None:
        # nothing to undo: fragments written by finished tasks are
        # unreferenced by any manifest → invisible, swept by expire
        return


def write_table(ds, table: Table, **kwargs):
    """Convenience: ``write_table(ds, table)`` = build a sink, run the
    write, return the committed Manifest (None for empty input — empty
    writes commit nothing)."""
    sink = TableDatasink(table, **kwargs)
    ds.write_datasink(sink)
    return sink.committed
