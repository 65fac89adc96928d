"""Z-order clustering: range-partition by Morton code → per-range
local sort → re-fragment with zone maps.

Default strategy ("range") — an explicit range-partitioned sort, the
classic distributed-sort decomposition:

  1. BOUNDARIES (driver, metadata only): sample the tiny key columns
     (phash, w, h — never image bytes), compute zcode quantiles →
     K equal-frequency range buckets. Equal-frequency boundaries are
     the skew handling: a hot phash region gets MORE buckets, not one
     giant one. Buckets whose sampled share exceeds ``hot_factor``×
     the even share (identical zcodes — quantiles cannot split equal
     keys) are subdivided by the deterministic per-row ``salt``
     (north_rule: salted repartition before the cluster shuffle).
  2. ASSIGN (map_batches, vectorized searchsorted) → bucket id.
  3. SHUFFLE (hash-shuffle groupby on bucket) → each bucket lands on
     one aggregator; only the bounded bucket (≈ target fragment rows ×
     over-partition factor) is ever materialized per task.
  4. LOCAL SORT + WRITE (map_groups): sort the bucket by
     (zcode, salt), slice into fragments of ``target_fragment_rows``,
     record per-fragment zone maps (zcode/phash/w/h min-max), drop the
     derived sort keys from the files.

  Because bucket ranges are disjoint, fragments come out globally
  range-partitioned by zcode — the same invariant a full ``ds.sort``
  would give — while the shuffle is a plain hash exchange with
  controllable reducer concurrency (``DataContext
  .max_hash_shuffle_aggregators``). Measured 3-4x faster than the
  sort-shuffle path at 32 CPUs on binary-heavy rows (concurrent
  large-block sort merges stall on memory-allocation contention).

Alternative strategy ("sort"): one lazy ``ds.sort(["zcode","salt"])``
pipeline (Ray range-partitioned sort-shuffle). Same output invariant.

Commit: full fragment-set swap (kind="cluster"); the builder requires
the table version to be unchanged since the scan — clustering rewrites
everything, so ANY concurrent commit is a conflict; the caller reruns.

Scale: the shuffle is an all-to-all exchange of the full table —
inherent to clustering (same for Delta OPTIMIZE ZORDER). Everything
else streams; driver-side state is boundaries (K ints) + fragment
metadata. For 100 TB you cluster one phash key-range slice per run
(the ``prune`` argument), never the whole table at once.
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa

from ..stages.zorder import add_zorder_keys, make_keyspec, zcode_for
from ..state.lineage import RunContext
from ..tablefmt.catalog import Table
from ..tablefmt.fragments import (FRAG_META_SCHEMA, FragmentWriter,
                                  compute_stats, frag_meta_row,
                                  frags_from_meta, write_fragment_table)
from ..tablefmt.manifest import Manifest

MAX_SORT_PARTITIONS = 64  # sort path: p² exchange beyond this
MAX_BOUNDARY_SAMPLE = 200_000  # rows of (phash,w,h) read for quantiles


MAX_BOUNDARY_FRAGMENTS = 64  # fragments whose key columns are sampled


def _sample_boundaries(snap, prune, n_buckets: int,
                       hot_factor: float = 4.0,
                       salt_buckets: int = 4096,
                       curve: str = "morton",
                       keyspec: dict | None = None,
                       fragment_ids: set | None = None):
    """Equal-frequency zcode boundaries + hot-bucket split factors.

    I/O is bounded BY CONSTRUCTION, not by post-read sampling: at most
    ``MAX_BOUNDARY_FRAGMENTS`` fragments (deterministic stride over the
    fragment list ≈ uniform, since fragment order carries no zcode
    structure pre-cluster) contribute, and only their tiny key columns
    (phash, w, h) are read — a 10^12-row table costs the same sample as
    a 10^6-row one. Returns (boundaries asc int64, {bucket_id:
    split_factor} for buckets the sample says are hot).
    """
    import ray

    frags = snap._select_fragments(prune, ids=fragment_ids)
    stride = max(1, len(frags) // MAX_BOUNDARY_FRAGMENTS)
    chosen = frags[::stride][:MAX_BOUNDARY_FRAGMENTS]

    # one small Ray task per sampled fragment (key columns only) —
    # serial driver-side reads were a measurable Amdahl fraction of
    # the 32-CPU cluster stage
    key_cols = (keyspec["cols"] if keyspec is not None
                else ["phash", "w", "h"])

    @ray.remote(num_cpus=0.5)
    def _read_keys(path: str) -> pa.Table:
        import pyarrow.parquet as _pq

        return _pq.read_table(path, columns=key_cols)

    parts = ray.get([_read_keys.remote(snap.table.abspath(f.path))
                     for f in chosen])
    mt = pa.concat_tables(parts)
    if mt.num_rows > MAX_BOUNDARY_SAMPLE:  # bound the quantile compute
        idx = np.linspace(0, mt.num_rows - 1, MAX_BOUNDARY_SAMPLE,
                          dtype=np.int64)
        mt = mt.take(pa.array(idx))
    z = zcode_for(mt, curve, keyspec)
    zf = np.asarray(z, dtype=np.int64)
    qs = np.quantile(zf.astype(np.float64),
                     np.linspace(0, 1, n_buckets + 1)[1:-1])
    bounds = np.unique(qs).astype(np.int64)
    # hot detection: share of sample per bucket vs the even share
    bucket = np.searchsorted(bounds, zf, side="right")
    counts = np.bincount(bucket, minlength=len(bounds) + 1)
    even = max(1.0, len(zf) / (len(bounds) + 1))
    hot = {int(b): int(min(salt_buckets, np.ceil(c / even)))
           for b, c in enumerate(counts) if c > hot_factor * even}
    return bounds, hot


class _AssignBucket:
    """map_batches: add (zcode, salt, bucket). Boundaries + hot-split
    map arrive once per worker via ray.put broadcast."""

    def __init__(self, bounds_ref, salt_buckets: int,
                 curve: str = "morton", keyspec: dict | None = None):
        self.bounds_ref = bounds_ref
        self.salt_buckets = salt_buckets
        self.curve = curve
        self.keyspec = keyspec
        self._bh = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        if self._bh is None:
            self._bh = ray.get(self.bounds_ref)
        bounds, hot = self._bh
        b2 = add_zorder_keys(batch, self.salt_buckets, curve=self.curve,
                             keyspec=self.keyspec)
        z = b2["zcode"].to_numpy(zero_copy_only=False)
        base = np.searchsorted(bounds, z, side="right").astype(np.int64)
        if hot:
            # hot buckets subdivide by salt → bounded group size
            salt = b2["salt"].to_numpy(zero_copy_only=False)
            sub = np.zeros(len(base), dtype=np.int64)
            for hb, k in hot.items():
                m = base == hb
                if m.any():
                    sub[m] = salt[m] % k
            bucket = base * self.salt_buckets + sub
        else:
            bucket = base * self.salt_buckets
        return b2.append_column("bucket", pa.array(bucket, pa.int64()))


class _SortWriteBucket:
    """map_groups: local (zcode, salt) sort of one range bucket →
    fragments of target_fragment_rows (and, when ``target_bytes`` is
    set, bounded payload bytes) with zone maps; derived key columns
    are dropped from the files but kept in the zone maps.

    The bytes bound matters because zcode clusters rows by (phash,
    w, h): a bucket of 256x256 images packs ~25x the bytes per row of
    a 32x32 bucket, so row-count-only slicing emits 10-300 MB
    fragments from the same job. Uniform fragment bytes keep later
    compaction bins, scan tasks and reader memory predictable."""

    def __init__(self, root: str, run_id: str, target_rows: int,
                 target_bytes: int | None = None):
        self.root = root
        self.run_id = run_id
        self.target_rows = target_rows
        self.target_bytes = target_bytes

    def __call__(self, g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if g.num_rows == 0:
            return FRAG_META_SCHEMA.empty_table()
        g = g.sort_by([("zcode", "ascending"), ("salt", "ascending")])
        metas = []
        drop = [c for c in ("zcode", "salt", "bucket") if c in g.column_names]
        n = g.num_rows
        cum = None
        if self.target_bytes is not None and "bytes" in g.column_names:
            row_bytes = pc.binary_length(g["bytes"]).to_numpy(
                zero_copy_only=False).astype(np.int64)
            cum = np.cumsum(row_bytes + 256)  # ~fixed per-row overhead
        off = 0
        while off < n:
            hi = min(n, off + self.target_rows)
            if cum is not None:
                budget = (cum[off - 1] if off else 0) + self.target_bytes
                hi = min(hi, max(off + 1,
                                 int(np.searchsorted(cum, budget,
                                                     side="right"))))
            sl = g.slice(off, hi - off)
            stats = compute_stats(sl)  # includes zcode zone map
            stats.pop("bucket", None)
            frag = write_fragment_table(sl.drop_columns(drop), self.root,
                                        self.run_id, sorted_by="zcode",
                                        stats=stats)
            metas.append(frag_meta_row(frag))
            off = hi
        return pa.concat_tables(metas)


def cluster(table: Table, target_fragment_rows: int = 4096,
            salt_buckets: int = 4096, run_id: str | None = None,
            prune: dict | None = None, strategy: str = "range",
            over_partition: int = 2,
            curve: str = "morton",
            target_fragment_bytes: int | None = None,
            key_cols: list | None = None,
            salt_col: str = "image_id",
            incremental: bool = False) -> Manifest | None:
    """Cluster the live table (or a zone-map-pruned slice) by zcode.

    ``curve``: "morton" (Z-order) or "hilbert" — the space-filling
    curve packing the key columns into the sort key. Same machinery
    (boundaries, salt splits, zone maps) either way; the committed
    manifest records the curve in properties["cluster_curve"].

    ``key_cols``: cluster by ANY 1-3 numeric or string columns instead
    of the image-schema (phash, w, h) default — per-column bounds come
    from the fragment zone maps (metadata only) and normalize each
    column into the curve's 21-bit/dim domain (strings through their
    order-preserving 8-byte prefix, stages/zorder.py::prefix64);
    ``salt_col`` names the high-cardinality tiebreaker column for
    hot-key splits. This makes clustering usable on arbitrary tables
    (events by (ts, user), documents by (lang, length), ...).

    ``target_fragment_bytes``: when set, fragment slices are bounded
    by payload bytes as well as rows (see _SortWriteBucket) — use for
    tables whose row size varies widely (mixed image resolutions).

    ``incremental``: rewrite ONLY the fragments that violate the
    existing layout — not zcode-sorted (appends since the last
    cluster) or carrying delete files — into a fresh sorted run,
    leaving already-sorted clean fragments untouched. Work is
    O(new data), not O(table): the tiered strategy every 100-TB
    table needs between full reclusters (sorted runs may overlap in
    zcode range, which costs some scan-prune efficiency until the
    autopilot's selectivity signal triggers a full pass). Returns
    None (no commit) when the layout is already fully clustered."""
    ctx = RunContext(table.root, run_id, job="cluster")
    snap = table.snapshot()
    if not snap.manifest.fragments:
        return None
    sel_ids: set | None = None
    if incremental:
        dirty = [f for f in snap.manifest.fragments
                 if f.sorted_by != "zcode" or f.delete_paths]
        if not dirty:
            return None  # layout quiesced — nothing to rewrite
        sel_ids = {f.id for f in dirty}
    t0 = time.time()

    keyspec = None
    if key_cols is not None:
        frags_sel = snap._select_fragments(prune, ids=sel_ids)
        mins, maxs = [], []
        for c in key_cols:
            stats = [f.stats.get(c) for f in frags_sel]
            if any(s is None or s.get("min") is None for s in stats):
                raise ValueError(
                    f"key_cols column {c!r} lacks zone-map stats on some "
                    f"fragments (binary/nested columns can't be cluster "
                    f"keys; re-append with stats or pick a numeric column)")
            import pyarrow as _pa

            ftype = snap.manifest.schema.field(c).type
            is_num = all(isinstance(s["min"], (int, float))
                         and not isinstance(s["min"], bool) for s in stats)
            # stats for timestamp/date/decimal columns are STRINGIFIED
            # by the manifest's JSON layer, so "min is a str" alone
            # would route them into the string-prefix transform and
            # crash mid-shuffle — the SCHEMA type decides, not the
            # stats representation
            is_str = (all(isinstance(s["min"], str) for s in stats)
                      and (_pa.types.is_string(ftype)
                           or _pa.types.is_large_string(ftype)))
            if not (is_num or is_str):
                raise ValueError(
                    f"key_cols column {c!r} has type {ftype}; curve "
                    f"keys need numeric or string columns (timestamp/"
                    f"date keys: cast to epoch integers first)")
            mins.append(min(s["min"] for s in stats))
            maxs.append(max(s["max"] for s in stats))
        keyspec = make_keyspec(key_cols, mins, maxs, salt_col=salt_col)

    rows_est = max(1, (sum(f.rows for f in dirty) if incremental
                       else snap.manifest.total_rows()))

    if strategy == "range":
        import ray
        from ray.data import DataContext
        from ray.data.context import ShuffleStrategy

        n_buckets = int(min(4096, max(8, over_partition * rows_est
                                      // max(1, target_fragment_rows))))
        bounds, hot = _sample_boundaries(snap, prune, n_buckets,
                                         salt_buckets=salt_buckets,
                                         curve=curve, keyspec=keyspec,
                                         fragment_ids=sel_ids)
        bref = ray.put((bounds, hot))
        # hash exchange on bucket (scoped): a plain streaming shuffle —
        # no giant merge-sorted blocks. Reducer-side concurrency is
        # deliberately BOUNDED below the CPU count: bucket sort+write
        # tasks touch tens-of-MB buffers, and concurrent large-buffer
        # work saturates a node's memory bandwidth long before its
        # CPUs (measured: >8 concurrent big-buffer tasks on one node
        # REDUCES aggregate throughput) — so ~cpus/4 aggregators and
        # 2 CPUs per sort+write task, leaving the map side the rest.
        # NOTE: DataContext is captured at DATASET CREATION, so the
        # override must wrap the whole pipeline build, not just execute.
        dctx = DataContext.get_current()
        total_cpus = int(ray.cluster_resources().get("CPU", 8))
        saved = (dctx.shuffle_strategy, dctx.max_hash_shuffle_aggregators,
                 dctx.default_hash_shuffle_parallelism)
        dctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        dctx.max_hash_shuffle_aggregators = max(1, total_cpus // 4)
        # aggregator actors reserve CPU per shuffle PARTITION (not per
        # actor): the 200-partition default demands 12.5 CPUs and
        # deadlocks an 8-CPU cluster — scale partitions with the
        # cluster instead (~2x CPUs, the measured sweet spot; the
        # per-partition reservation is then ~cpus/8, which fits even
        # alongside a reducer task on a tiny cluster)
        dctx.default_hash_shuffle_parallelism = total_cpus * 2
        sw = _SortWriteBucket(table.root, ctx.run_id, target_fragment_rows,
                              target_bytes=target_fragment_bytes)

        def sort_write_bucket(g: pa.Table) -> pa.Table:  # map_groups needs __name__
            return sw(g)

        try:
            ds = snap.dataset(prune=prune, fragment_ids=sel_ids)
            # coalesce read blocks into ~2k-row blocks BEFORE the
            # shuffle: the hash exchange sends one slice per (block,
            # partition) pair, so many tiny read blocks turn into tens
            # of thousands of sub-100KB actor sends (measured 2x total
            # job cost); fewer larger blocks keep slices ~MB-sized
            assign_rows = max(256, min(int(target_fragment_rows), 2048))
            ds = ds.map_batches(_AssignBucket(bref, salt_buckets,
                                              curve=curve, keyspec=keyspec),
                                batch_format="pyarrow",
                                batch_size=assign_rows)
            # Reducer CPU reservation: sort+write tasks allocate and
            # write tens-of-MB buffers, and measured on this class of
            # node the kernel-side page-allocation cost under many
            # concurrent writers inflates per-task CPU far beyond the
            # useful work (19x at 32 writers on a 1 GB exchange) — so
            # the 2-CPU reservation throttling writers to cpus/2 is the
            # deliberate default regardless of codec config. Override
            # with KDR_CLUSTER_SORT_CPUS for probe experiments.
            import os as _os
            sort_cpus = int(_os.environ.get(
                "KDR_CLUSTER_SORT_CPUS",
                min(2, max(1, total_cpus // 4))))
            out_ds = (ds.groupby("bucket")
                      .map_groups(sort_write_bucket, batch_format="pyarrow",
                                  num_cpus=sort_cpus))
            meta = out_ds.take_all()
            ctx.log_dataset_stats("cluster_exchange", out_ds)
        finally:
            (dctx.shuffle_strategy, dctx.max_hash_shuffle_aggregators,
             dctx.default_hash_shuffle_parallelism) = saved
        n_parts = len(bounds) + 1
    else:
        n_parts = min(MAX_SORT_PARTITIONS,
                      max(8, rows_est // max(1, target_fragment_rows)))
        ds = snap.dataset(prune=prune, fragment_ids=sel_ids)
        ds = ds.map_batches(lambda b: add_zorder_keys(b, salt_buckets,
                                                      curve=curve,
                                                      keyspec=keyspec),
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
        props = dict(latest.properties)
        props["cluster_curve"] = curve
        if key_cols is not None:
            props["cluster_key_cols"] = list(key_cols)
        else:
            # a default-keys re-cluster re-orders the data by the
            # image-schema curve: a stale generic-keys claim from an
            # earlier run must not survive into this manifest
            props.pop("cluster_key_cols", None)
        if prune is None and sel_ids is None:
            frags = list(new_frags)
            # every fragment was rewritten at the current schema, so
            # old-fragment null-fill (schema_evolved) is no longer needed
            props.pop("schema_evolved", None)
        else:  # only the scanned slice was rewritten
            scanned = {f.id for f in
                       snap._select_fragments(prune, ids=sel_ids)}
            frags = [f for f in latest.fragments if f.id not in scanned]
            frags += new_frags
        return Manifest(version=-1, parent=None, kind="cluster",
                        schema=latest.schema, fragments=frags,
                        txn=latest.txn, properties=props)

    m = table.commit(build, max_attempts=1)
    ctx.log_metric("cluster_done",
                   rows=sum(f.rows for f in new_frags),
                   fragments_out=len(new_frags),
                   strategy=strategy,
                   curve=curve,
                   incremental=incremental,
                   sort_partitions=int(n_parts),
                   salt_buckets=salt_buckets,
                   seconds=time.time() - t0,
                   committed_version=m.version)
    return m
