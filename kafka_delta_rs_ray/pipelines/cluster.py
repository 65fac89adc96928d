"""Z-order clustering: full-table sort by Morton code → re-fragment
with zone maps.

Pipeline (one lazy Dataset end to end; the sort is the only shuffle):

    snapshot scan (delete-aware)
      → map_batches(add (zcode, salt))          vectorized, no state
      → repartition(n_parts)                    explicit sort width
      → sort(["zcode", "salt"])                 Ray range-partitioned
                                                shuffle; salt splits hot
                                                zcodes across boundaries
      → map_batches(FragmentWriter)             fragments in sorted
                                                order; zcode zone maps
                                                recorded, zcode/salt
                                                dropped from the files

Sort width matters: Ray's sort exchanges p_in × p_out block slices, so
p blocks cost O(p²) object transfers — measured 4× slower at 75 blocks
than 16 for the same rows. We size partitions from the manifest row
count (≈ one fragment per partition, capped) instead of inheriting
whatever block count the scan produced. Each sort output partition is
a contiguous key range processed by a single writer task, so fragments
come out range-contiguous WITHOUT preserve_order (which serializes the
pipeline); only block-tail bundling can blur a boundary, and zone maps
stay exact either way.

Commit: full fragment-set swap (kind="cluster"); the builder requires
the table version to be unchanged since the scan — clustering rewrites
everything, so ANY concurrent commit is a conflict; the caller reruns.

Scale: the sort is an all-to-all exchange of the full table — inherent
to clustering (same for Delta OPTIMIZE ZORDER). Everything else
streams. For 100 TB you cluster one phash key-range slice per run (the
``prune`` argument), never the whole table at once.
"""

from __future__ import annotations

import time

from ..stages.zorder import add_zorder_keys
from ..state.lineage import RunContext
from ..tablefmt.catalog import Table
from ..tablefmt.fragments import FragmentWriter, frags_from_meta
from ..tablefmt.manifest import Manifest

MAX_SORT_PARTITIONS = 64  # single-node cap; p² exchange beyond this


def cluster(table: Table, target_fragment_rows: int = 4096,
            salt_buckets: int = 4096, run_id: str | None = None,
            prune: dict | None = None) -> Manifest | None:
    """Cluster the live table (or a zone-map-pruned slice) by zcode."""
    ctx = RunContext(table.root, run_id, job="cluster")
    snap = table.snapshot()
    if not snap.manifest.fragments:
        return None
    t0 = time.time()

    rows_est = max(1, snap.manifest.total_rows())
    n_parts = min(MAX_SORT_PARTITIONS,
                  max(8, rows_est // max(1, target_fragment_rows)))

    ds = snap.dataset(prune=prune)
    ds = ds.map_batches(lambda b: add_zorder_keys(b, salt_buckets),
                        batch_format="pyarrow", batch_size=None)
    ds = ds.repartition(int(n_parts))
    ds = ds.sort(["zcode", "salt"])
    meta = ds.map_batches(
        FragmentWriter(table.root, ctx.run_id, sorted_by="zcode",
                       drop_columns=("zcode", "salt")),
        batch_format="pyarrow", batch_size=target_fragment_rows,
    ).take_all()

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
                   sort_partitions=int(n_parts),
                   salt_buckets=salt_buckets,
                   seconds=time.time() - t0,
                   committed_version=m.version)
    return m
