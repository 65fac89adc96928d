"""Flagship end-to-end pipeline: the full maintenance lifecycle on a
synthetic image+caption table, returning a per-stage summary.

This is the engine's `entry()` demonstration and a rows-only driver
query: deterministic (seeded synth), bounded (fixed row count), and it
exercises every operator: append → merge → compact → cluster → expire,
asserting the golden scan-identity invariant between stages.
"""

from __future__ import annotations

import shutil
import tempfile

import pyarrow as pa

from ..tablefmt import IMAGE_SCHEMA, Table
from .cluster import cluster
from .compact import compact
from .delete import delete_where, rollback
from .expire import expire
from .ingest import append
from .merge import merge
from .synth import changeset_dataset, image_dataset


def maintenance_lifecycle(n_rows: int = 300, n_changes: int = 80,
                          seed: int = 42, keep_root: str | None = None) -> pa.Table:
    root = keep_root or tempfile.mkdtemp(prefix="kdr-lifecycle-")
    rows = []
    try:
        t = Table.create(f"{root}/table", IMAGE_SCHEMA)

        def snap_counts(stage):
            m = t.read_manifest()
            rows.append({"stage": stage, "version": m.version,
                         "rows": int(m.total_rows()),
                         "fragments": len(m.fragments),
                         "delete_files": sum(len(f.delete_paths)
                                             for f in m.fragments)})

        append(t, image_dataset(n_rows, seed=seed, batch_size=64),
               target_fragment_rows=64)
        snap_counts("append")

        ch = changeset_dataset(n_rows, n_changes, seed=seed + 1,
                               n_partitions=8).materialize()
        merge(t, ch, app_id="lifecycle")
        snap_counts("merge")
        # idempotent replay: must not create a new version
        assert merge(t, ch, app_id="lifecycle") is None
        snap_counts("merge_replay")

        before = t.snapshot().to_arrow().sort_by("image_id")
        compact(t, target_bytes=64 << 20)
        snap_counts("compact")
        cluster(t, target_fragment_rows=128)
        snap_counts("cluster")
        after = t.snapshot().to_arrow().sort_by("image_id")
        assert before.equals(after), "maintenance changed table contents"

        # predicate delete (zone-map classified) then time-travel write
        v_pre_delete = t.latest_version()
        delete_where(t, {"w": (128, None)})
        snap_counts("delete")
        n_after_delete = t.snapshot().to_arrow().num_rows
        assert n_after_delete < after.num_rows
        rollback(t, v_pre_delete)
        snap_counts("rollback")
        restored = t.snapshot().to_arrow().sort_by("image_id")
        assert restored.equals(after), "rollback did not restore the snapshot"

        expire(t, keep_last=1, min_age_seconds=0)
        snap_counts("expire")
        return pa.Table.from_pylist(rows)
    finally:
        if keep_root is None:
            shutil.rmtree(root, ignore_errors=True)
