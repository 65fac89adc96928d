"""Z-order clustering: full-table sort by Morton code → re-fragment
with zone maps.

Pipeline (one lazy Dataset end to end; the sort is the only shuffle):

    snapshot scan (delete-aware)
      → map_batches(add (zcode, salt))          vectorized, no state
      → sort(["zcode", "salt"])                 Ray range-partitioned
                                                shuffle; salt splits hot
                                                zcodes across boundaries
      → map_batches(FragmentWriter)             one fragment per batch;
                                                zcode zone maps recorded,
                                                zcode/salt dropped from
                                                the files

Commit: full fragment-set swap (kind="cluster"). The builder requires
the table version to be unchanged since the scan — clustering rewrites
everything, so ANY concurrent commit is a conflict; the caller reruns.
``preserve_order`` is enabled for the write stage so each fragment
covers a contiguous zcode range — that's what makes the zone maps
selective (verified by test_cluster's pruned-scan assertions).

Scale: the sort is an all-to-all exchange of the full table — this is
inherent to clustering (same for Delta OPTIMIZE ZORDER). Everything
else streams. For 100 TB you'd cluster one phash key-range slice per
run (the planner's `prune` argument), never the whole table at once.
"""

from __future__ import annotations

import time

from ..stages.zorder import add_zorder_keys
from ..state.lineage import RunContext
from ..tablefmt.catalog import Table
from ..tablefmt.fragments import FragmentWriter, frags_from_meta
from ..tablefmt.manifest import Manifest


def cluster(table: Table, target_fragment_rows: int = 4096,
            salt_buckets: int = 4096, run_id: str | None = None,
            prune: dict | None = None) -> Manifest | None:
    """Cluster the live table (or a zone-map-pruned slice) by zcode."""
    import ray
    from ray.data import DataContext

    ctx = RunContext(table.root, run_id, job="cluster")
    snap = table.snapshot()
    if not snap.manifest.fragments:
        return None
    t0 = time.time()

    data_ctx = DataContext.get_current()
    prev_order = data_ctx.execution_options.preserve_order
    data_ctx.execution_options.preserve_order = True
    try:
        ds = snap.dataset(prune=prune)
        ds = ds.map_batches(lambda b: add_zorder_keys(b, salt_buckets),
                            batch_format="pyarrow")
        ds = ds.sort(["zcode", "salt"])
        meta = ds.map_batches(
            FragmentWriter(table.root, ctx.run_id, sorted_by="zcode",
                           drop_columns=("zcode", "salt")),
            batch_format="pyarrow", batch_size=target_fragment_rows,
        ).take_all()
    finally:
        data_ctx.execution_options.preserve_order = prev_order

    new_frags = frags_from_meta(meta)

    def build(latest: Manifest) -> Manifest:
        from ..errors import CommitConflict

        if latest.version != snap.version:
            raise CommitConflict(
                f"cluster scanned v{snap.version} but latest is "
                f"v{latest.version}; rerun the cluster job")
        if prune is None:
            frags = list(new_frags)
        else:  # only the scanned slice was rewritten
            scanned = {f.id for f in snap._select_fragments(prune)}
            frags = [f for f in latest.fragments if f.id not in scanned]
            frags += new_frags
        return Manifest(version=-1, parent=None, kind="cluster",
                        schema=latest.schema, fragments=frags,
                        txn=latest.txn, properties=latest.properties)

    m = table.commit(build, max_attempts=1)
    ctx.log_metric("cluster_done",
                   rows=sum(f.rows for f in new_frags),
                   fragments_out=len(new_frags),
                   salt_buckets=salt_buckets,
                   seconds=time.time() - t0,
                   committed_version=m.version)
    return m
