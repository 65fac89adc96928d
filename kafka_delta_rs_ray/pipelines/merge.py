"""MERGE INTO: hash-partitioned upsert/delete of a changeset by
``image_id``, with the reference's dedup + exactly-once guarantees.

Semantics ported from the reference (not its architecture):

- **replay filter** — rows with ``seq <= txn[app_id][partition_id]``
  are dropped: a crashed-and-retried producer replays harmlessly
  (reference: offsets committed only post-flush, src/kafka/mod.rs:187-231;
  dedup absorbs redelivery, src/pipeline/mod.rs:58-80). A fully
  replayed changeset is a commit-level NO-OP (no new version).
- **first-wins dedup** — within one merge, duplicate ``image_id``s keep
  the lowest ``seq`` (the reference's BTreeMap-by-offset + skip-if-seen
  insert, src/pipeline/mod.rs:41-80), resolved per hash bucket with a
  vectorized kernel — no per-key Python.
- **matched rows** — via key-based deletion vectors: a matched upsert
  deletes the old row (delete record on its fragment) and inserts the
  new row into a fresh fragment; a matched delete only deletes.
  Unmatched deletes are no-ops.

Physical plan:
  1. changeset → map_batches(replay filter) fused with
     map_batches(decode-validation; corrupt → quarantine, watermark
     still advances) in ONE materialized pass          no shuffle
     ∥ watermark partial-max over the raw changeset's slim columns
     (replays can't raise a max'd watermark) runs in parallel
  2. seq-duplicate detection on slim identity columns (~20 B/row
     exchange + broadcast loser set), then add bucket =
     hash(image_id) % B → groupby(bucket)
     → map_groups(vectorized first-wins)               ONE full-payload
                                                       shuffle of the
                                                       (bounded)
                                                       changeset only
  3. changed-key min/max prunes base fragments via image_id zone maps;
     one task per touched fragment intersects its keys with the
     broadcast changed-key set (ray.put once)          no base shuffle
  4. upsert rows → FragmentWriter; delete records → one delete file.
     Steps 3 and 4 touch disjoint data and run CONCURRENTLY — merge
     pays max(intersect, write), not their sum.
  5. single manifest CAS: attach delete files, add fragments, advance
     watermarks. Builder revalidates touched fragments are still live
     (a concurrent compaction moved rows → CommitConflict → caller
     reruns the merge against the new snapshot).

The base table is never shuffled and never fully scanned: work is
proportional to the changeset + touched fragments (zone-map pruned),
which is what makes MERGE viable on a 10^12-row table.
"""

from __future__ import annotations

import os
import time
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..errors import CommitConflict
from ..state.lineage import RunContext
from ..tablefmt.catalog import Table
from ..tablefmt.fragments import (FragmentWriter, frags_from_meta,
                                  write_delete_file)
from ..tablefmt.manifest import Manifest

_EXTRA_COLS = ("partition_id", "seq", "op", "bucket")


def _polars():
    """Import polars with its rayon pool capped to ONE thread.

    Measured on the 48k lifecycle (interleaved A/B, 2 reps): letting
    polars spawn its default num_cpus-sized pool in every Ray worker
    (~32 workers x 32 threads) degraded the SUBSEQUENT cluster
    exchange ~25-30% (cluster 11.4/8.3 s vs 9.2/6.5 s without polars)
    — the hash kernel itself doesn't need the pool (single-threaded it
    still measures ~20M rows/s on 16-char ids, 3x the crc32 loop).
    Must run before the worker's FIRST polars import to take effect."""
    import os as _os

    _os.environ.setdefault("POLARS_MAX_THREADS", "1")
    import polars as pl

    return pl


class _ReplayFilter:
    """Drop rows already covered by the app's committed watermarks."""

    def __init__(self, watermarks: dict):
        # {partition(str): last committed seq}
        self.wm = {int(k): int(v) for k, v in watermarks.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.wm or batch.num_rows == 0:
            return batch
        part = batch["partition_id"].to_numpy(zero_copy_only=False)
        seq = batch["seq"].to_numpy(zero_copy_only=False)
        wm = np.full(len(part), -1, dtype=np.int64)
        for p, s in self.wm.items():
            wm[part == p] = s
        return batch.filter(pa.array(seq > wm))


def _add_bucket(batch: pa.Table, n_buckets: int) -> pa.Table:
    """Shuffle-bucket by image_id hash, vectorized end-to-end via
    polars' Rust hash over the zero-copy Arrow column. Measured on
    this host (1M 16-char ids, 6 interleaved reps): polars ~33 M
    rows/s median vs the prior zlib.crc32-per-row loop at ~6 M rows/s
    and a numpy offsets-buffer poly hash at ~4 M rows/s warm (and 10×
    worse cold — its ~28 B/char temporaries hit this VM's first-touch
    page faults). Bucket values only need within-run consistency
    (every worker ships the same polars build), so ahash's
    cross-version instability is irrelevant."""
    try:
        pl = _polars()

        h = pl.from_arrow(batch["image_id"]).hash(seed=0).to_numpy()
        b = (h % np.uint64(n_buckets)).astype(np.int32)
    except ImportError:  # pragma: no cover — polars is baked in
        import zlib

        b = np.array([zlib.crc32(s.encode()) % n_buckets
                      for s in batch["image_id"].to_pylist()],
                     dtype=np.int32)
    return batch.append_column("bucket", pa.array(b, pa.int32()))


def _first_wins(group: pa.Table) -> pa.Table:
    """Vectorized first-wins-by-seq per image_id within one hash
    bucket: sorted neighbor-equality via the Arrow compute kernel —
    no per-row Python, no to_pylist of the whole key column."""
    import pyarrow.compute as pc

    t = group.sort_by([("image_id", "ascending"), ("seq", "ascending")])
    n = t.num_rows
    if n <= 1:
        return t
    col = t["image_id"].combine_chunks()
    eq = pc.equal(col.slice(1), col.slice(0, n - 1))
    first = np.ones(n, dtype=bool)
    first[1:] = ~eq.to_numpy(zero_copy_only=False)
    return t.filter(pa.array(first))


def _seq_bucket(batch: pa.Table, n_buckets: int) -> pa.Table:
    b = (batch["seq"].to_numpy(zero_copy_only=False) % n_buckets).astype(np.int32)
    return batch.append_column("seq_bucket", pa.array(b, pa.int32()))


SEQ_LOSER_DRIVER_MAX = 2_000_000  # slim rows collected on the driver


def _dup_seq_rows(g: pa.Table) -> pa.Table:
    """Rows of ``g`` whose (partition_id, seq) repeats — every copy of
    a duplicated pair except the lowest-image_id one. Arrow sort +
    numpy neighbor compare, no per-row Python."""
    g = g.sort_by([("partition_id", "ascending"), ("seq", "ascending"),
                   ("image_id", "ascending")])
    p = g["partition_id"].to_numpy(zero_copy_only=False)
    s = g["seq"].to_numpy(zero_copy_only=False)
    dup = np.zeros(len(p), dtype=bool)
    dup[1:] = (p[1:] == p[:-1]) & (s[1:] == s[:-1])
    return g.select(["partition_id", "seq", "image_id"]).filter(
        pa.array(dup))


def _seq_losers(validated, n_buckets: int,
                n_rows: int | None = None) -> dict:
    """Rows violating the OFFSET uniqueness domain — the reference's
    HashSet<i64> over offsets (src/pipeline/mod.rs:58-80), scoped to
    (partition_id, seq) because independent sources own independent
    seq spaces (SURVEY §1.2). Returns {(partition_id, seq, image_id):
    n_losing_copies} — a COUNT per identity, not a set, because an
    exactly-redelivered row (same partition, seq AND key) produces
    copies that share the full triple; the count says how many copies
    lose while exactly one survives (the reference's skip-if-seen
    keeps the first copy).

    Scale shape: duplicate detection touches only the three slim
    identity columns (~20 B/row), never the image payloads. A
    micro-batch-sized changeset (<= SEQ_LOSER_DRIVER_MAX rows — the
    normal case; the driver already holds its changed-key set) takes
    the driver fast path: one streamed pass over the slim columns and
    a local sort, no shuffle execution at all. Larger changesets run
    the distributed bucketed groupby. The loser map itself is
    duplicate-sized, typically empty."""
    from collections import Counter

    slim = validated.select_columns(["partition_id", "seq", "image_id"])

    out: Counter = Counter()
    if n_rows is not None and n_rows <= SEQ_LOSER_DRIVER_MAX:
        parts = [b for b in slim.iter_batches(batch_format="pyarrow",
                                              batch_size=None) if b.num_rows]
        if not parts:
            return dict(out)
        dup = _dup_seq_rows(pa.concat_tables(parts))
        out.update(zip(dup["partition_id"].to_pylist(),
                       dup["seq"].to_pylist(), dup["image_id"].to_pylist()))
        return dict(out)

    bucketed = slim.map_batches(lambda b: _seq_bucket(b, n_buckets),
                                batch_format="pyarrow")
    # batch iteration, not take_all — take_all on pandas-block
    # map_groups output converts rows one-by-one at ~1 ms/row
    for b in (bucketed.groupby("seq_bucket")
              .map_groups(_dup_seq_rows, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow", batch_size=None)):
        out.update(zip(b["partition_id"].to_pylist(),
                       b["seq"].to_pylist(), b["image_id"].to_pylist()))
    return dict(out)


def _repair_seq_losers(validated, deduped, losers: dict, n_buckets: int):
    """Fix-up for the optimistic dual-domain dedup: the key-domain
    first-wins shuffle runs CONCURRENTLY with seq-duplicate detection
    (losers are normally empty, so the slim seq pass stays off the
    critical path). When losers DO exist, the sequential semantics —
    drop seq-domain losers FIRST, then keep the lowest surviving seq
    per key — may differ for exactly the keys that own a loser row, so
    those keys' winners are recomputed here in three bounded steps:

    1. collect the affected keys' SLIM identity rows (~20 B/row on the
       driver — never payloads, so a hot key redelivered millions of
       times costs megabytes, not its payload bytes);
    2. subtract the per-triple loser COUNTS (an exact-duplicate triple
       keeps ``copies - losses`` survivors, i.e. the one first-seen
       copy) and pick each key's winner identity = min (seq,
       partition_id) among survivors;
    3. fetch ONE full row per winner identity with a distributed
       filter and splice those over the optimistic output.
    """
    import ray
    import ray.data as rd
    import pyarrow.compute as pc

    affected = sorted({k for (_, _, k) in losers})
    aff_ref = ray.put(pa.array(affected, pa.string()))

    class _PickKeys:
        def __init__(self, invert: bool):
            self.invert = invert
            self._keys = None

        def __call__(self, b: pa.Table) -> pa.Table:
            if self._keys is None:
                self._keys = ray.get(aff_ref)
            m = pc.is_in(b["image_id"], value_set=self._keys)
            return b.filter(pc.invert(m) if self.invert else m)

    # 1: slim identities of affected keys only
    slim_parts = [b for b in (validated
                              .select_columns(["partition_id", "seq",
                                               "image_id"])
                              .map_batches(_PickKeys(invert=False),
                                           batch_format="pyarrow")
                              .iter_batches(batch_format="pyarrow",
                                            batch_size=None))
                  if b.num_rows]
    slim = pa.concat_tables(slim_parts)

    # 2: survivors per triple = copies - losses; winner per key
    from collections import Counter

    copies = Counter(zip(slim["partition_id"].to_pylist(),
                         slim["seq"].to_pylist(),
                         slim["image_id"].to_pylist()))
    winners: dict = {}  # image_id -> (seq, partition_id)
    for trip, n in copies.items():
        if n - losers.get(trip, 0) <= 0:
            continue  # every copy of this identity lost
        p, s, k = trip
        cur = winners.get(k)
        if cur is None or (s, p) < cur:
            winners[k] = (s, p)
    win_ref = ray.put(winners)

    class _PickWinners:
        """Distributed fetch of full rows matching winner identities;
        exact-duplicate copies are collapsed to one per batch here and
        across batches on the driver."""

        def __init__(self):
            self._w = None

        def __call__(self, b: pa.Table) -> pa.Table:
            if self._w is None:
                self._w = ray.get(win_ref)
            keep = np.zeros(b.num_rows, dtype=bool)
            seen = set()
            ks = b["image_id"].to_pylist()
            ss = b["seq"].to_numpy(zero_copy_only=False)
            ps = b["partition_id"].to_numpy(zero_copy_only=False)
            for i, k in enumerate(ks):
                ident = self._w.get(k)
                if (ident is not None and k not in seen
                        and ident == (ss[i], ps[i])):
                    keep[i] = True
                    seen.add(k)
            return b.filter(pa.array(keep))

    fetched = [b for b in (validated
                           .map_batches(_PickWinners(),
                                        batch_format="pyarrow")
                           .iter_batches(batch_format="pyarrow",
                                         batch_size=None))
               if b.num_rows]
    kept = deduped.map_batches(_PickKeys(invert=True),
                               batch_format="pyarrow")
    if fetched:
        repl = pa.concat_tables(fetched)
        # exact-duplicate winner copies may arrive from several blocks;
        # keep one per key (they share the full identity triple)
        repl = _first_wins(_add_bucket(repl, n_buckets))
        repl = repl.select(deduped.schema().names)
        kept = kept.union(rd.from_arrow(repl))
    return kept.materialize()


class _ValidateChanges:
    """Decode-validate incoming upsert payloads (the reference's
    per-message parse step, src/utils/mod.rs:122-153: every message is
    parsed against the schema BEFORE entering the dedup buffer; parse
    failures go to the dead-letter topic, src/kafka/mod.rs:288-300).
    Delete ops carry no payload and pass through untouched."""

    def __init__(self, root: str, run_id: str,
                 constraints: list | None = None):
        from ..stages.constraints import ConstraintFilter
        from ..stages.validate import ValidateImages

        self.inner = ValidateImages(root, run_id=run_id, check_pixels=True)
        self.cons = (ConstraintFilter(root, constraints, run_id=run_id)
                     if constraints else None)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        is_del = pc.equal(batch["op"], "delete")
        deletes = batch.filter(is_del)
        upserts = batch.filter(pc.invert(is_del))
        if upserts.num_rows == 0:
            return batch
        valid = self.inner(upserts)
        if self.cons is not None:
            # CHECK constraints ride the same dead-letter path as
            # decode failures (upserts only; deletes carry no payload)
            valid = self.cons(valid)
        if deletes.num_rows == 0:
            return valid
        return pa.concat_tables([valid, deletes])


class _IntersectKeys:
    """Per-touched-fragment task: which changed keys exist here?

    Reads ONLY the image_id column of its fragment; the changed-key set
    arrives once per worker via ray.put broadcast, not per batch.
    """

    def __init__(self, root: str, keys_ref):
        self.root = root
        self.keys_ref = keys_ref
        self._keys = None

    def __call__(self, meta: pa.Table) -> pa.Table:
        import bisect

        import pyarrow.compute as pc
        import ray

        if self._keys is None:
            self._keys = sorted(ray.get(self.keys_ref))
        out = {"fragment_id": [], "image_id": []}
        for row in meta.to_pylist():
            t = pq.read_table(f"{self.root}/{row['path']}", columns=["image_id"])
            if t.num_rows == 0:
                continue
            # subset the broadcast key set to this fragment's id range
            # before the is_in kernel: on clustered tables the slice is
            # a tiny fraction of the changeset
            mm = pc.min_max(t["image_id"])
            lo = bisect.bisect_left(self._keys, mm["min"].as_py())
            hi = bisect.bisect_right(self._keys, mm["max"].as_py())
            if lo == hi:
                continue
            vs = pa.array(self._keys[lo:hi], pa.string())
            hit = t.filter(pc.is_in(t["image_id"], value_set=vs))
            ids = hit["image_id"].to_pylist()
            out["fragment_id"].extend([row["id"]] * len(ids))
            out["image_id"].extend(ids)
        return pa.table({"fragment_id": pa.array(out["fragment_id"], pa.string()),
                         "image_id": pa.array(out["image_id"], pa.string())})


class _FragmentKeys:
    """Per-touched-fragment task (distributed changed-key path): read
    ONLY the fragment's image_id column and emit (fragment_id,
    image_id) rows for the semi-join shuffle."""

    def __init__(self, root: str):
        self.root = root

    def __call__(self, meta: pa.Table) -> pa.Table:
        frag_ids, key_cols = [], []
        for row in meta.to_pylist():
            t = pq.read_table(f"{self.root}/{row['path']}",
                              columns=["image_id"])
            if t.num_rows == 0:
                continue
            frag_ids.append(pa.array([row["id"]] * t.num_rows, pa.string()))
            key_cols.append(t["image_id"].combine_chunks())
        if not frag_ids:
            return pa.table({"fragment_id": pa.array([], pa.string()),
                             "image_id": pa.array([], pa.string())})
        return pa.table({"fragment_id": pa.concat_arrays(frag_ids),
                         "image_id": pa.concat_arrays(
                             [c.chunk(0) if isinstance(c, pa.ChunkedArray)
                              else c for c in key_cols])})


def _semi_join_group(g: pa.Table) -> pa.Table:
    """One hash-bucket of the distributed key intersect: changeset
    rows (fragment_id == "") form the probe set; fragment rows that
    hit it are the deletes. Vectorized is_in, no per-row Python."""
    import pyarrow.compute as pc

    is_ch = pc.equal(g["fragment_id"], "")
    ch = g.filter(is_ch)
    fr = g.filter(pc.invert(is_ch))
    if ch.num_rows == 0 or fr.num_rows == 0:
        return pa.table({"fragment_id": pa.array([], pa.string()),
                         "image_id": pa.array([], pa.string())})
    hit = pc.is_in(fr["image_id"], value_set=ch["image_id"].combine_chunks())
    return fr.filter(hit).select(["fragment_id", "image_id"])


class _WriteFragmentDeletes:
    """Per-fragment group task (distributed changed-key path):
    subtract the fragment's already-dead keys (existing deletion
    vectors, read by the WORKER), write the fragment's new delete file
    from the worker, and return one (fragment_id, del_rel, n) metadata
    row — delete data never touches the driver."""

    def __init__(self, root: str, run_id: str, dv_paths_ref):
        self.root = root
        self.run_id = run_id
        self.dv_paths_ref = dv_paths_ref
        self._dv = None
        self.__name__ = "write_fragment_deletes"  # map_groups wraps by name

    def __call__(self, g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        import ray

        empty = pa.table({"fragment_id": pa.array([], pa.string()),
                          "del_rel": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        if self._dv is None:
            self._dv = ray.get(self.dv_paths_ref)
        fid = g["fragment_id"][0].as_py()
        for rel in self._dv.get(fid, ()):
            t = pq.read_table(f"{self.root}/{rel}",
                              columns=["fragment_id", "image_id"])
            t = t.filter(pc.equal(t["fragment_id"], fid))
            if t.num_rows:
                g = g.filter(pc.invert(pc.is_in(
                    g["image_id"],
                    value_set=t["image_id"].combine_chunks())))
        if g.num_rows == 0:
            return empty
        rel = write_delete_file(self.root, f"{self.run_id}-{fid[:12]}",
                                g.select(["fragment_id", "image_id"]))
        return pa.table({"fragment_id": pa.array([fid], pa.string()),
                         "del_rel": pa.array([rel], pa.string()),
                         "n": pa.array([g.num_rows], pa.int64())})


class _KeysHit:
    """Does ANY of the (small, broadcast) key set appear in this batch
    of the changeset key column? Emits per-batch hit counts; the
    driver sums O(blocks) tiny rows. Used by the distributed path's
    commit-time concurrent-fragment check."""

    def __init__(self, keys_ref):
        self.keys_ref = keys_ref
        self._vs = None

    def __call__(self, b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        import ray

        if self._vs is None:
            self._vs = pa.array(sorted(ray.get(self.keys_ref)), pa.string())
        n = pc.sum(pc.is_in(b["image_id"], value_set=self._vs)).as_py() or 0
        return pa.table({"n": pa.array([int(n)], pa.int64())})


def merge_backlog(table: Table, changes_ds, app_id: str) -> dict:
    """Staged-but-unmerged rows per partition — the reference's
    offset-lag gauge (fetch_watermarks → consumer-lag metric,
    src/kafka/mod.rs:199-208) re-expressed for changesets: how far each
    partition's staged seq range runs ahead of the committed watermark.
    Returns {partition_id: pending_row_count}."""
    wm = table.read_manifest().txn.get(app_id, {})
    pending = changes_ds.map_batches(_ReplayFilter(wm),
                                     batch_format="pyarrow")
    rows = pending.groupby("partition_id").count().take_all()
    return {int(r["partition_id"]): int(r["count()"]) for r in rows}


def merge(table: Table, changes_ds, app_id: str,
          n_buckets: int = 32, run_id: str | None = None,
          target_fragment_rows: int = 4096,
          validate: bool = True,
          driver_keys_max: int = 2_000_000) -> Manifest | None:
    """MERGE the changeset Dataset (CHANGESET_SCHEMA) into the table.

    Returns the committed manifest, or None when every row was a replay
    (idempotent no-op). Raises CommitConflict if touched fragments were
    rewritten concurrently — rerun against the fresh snapshot.

    ``driver_keys_max``: changed-key count above which merge switches
    from the driver key-set path (micro-batch merges: one ray.put
    broadcast, zero shuffles) to the fully distributed path (giant
    backfills: sorted-block-range prune, hash-partitioned semi-join
    intersect, per-fragment delete files written by workers — nothing
    key- or delete-shaped ever materializes on the driver).

    ``validate``: decode-validate every incoming upsert payload before
    it can touch the table (the reference parses every message against
    the schema before insert, src/utils/mod.rs:122-153); failures go to
    ``quarantine/`` and — like the reference's dead-letter path — still
    advance the watermark (their offsets are committed, they are just
    never applied).
    """
    import ray
    import ray.data as rd

    from concurrent.futures import ThreadPoolExecutor

    ctx = RunContext(table.root, run_id, job="merge")
    t0 = time.time()
    snap = table.snapshot()
    m0 = snap.manifest
    wm0 = m0.txn.get(app_id, {})

    # watermark advance: max seq per partition — computed over the RAW
    # changeset's slim (partition_id, seq) columns, because a replayed
    # row's seq <= the committed watermark and the commit takes a max,
    # so including replays changes nothing. Quarantined rows advance it
    # too (reference: offsets are committed for dead-lettered messages,
    # src/kafka/mod.rs:187-231). Map-side partial max per batch + a
    # driver combine over <= batches x partitions tiny rows — one fewer
    # all-to-all exchange than a groupby().max(). Runs CONCURRENTLY
    # with the replay+validate materialization (independent dataset,
    # column-pruned second read of the changeset source).
    def _partial_wm(b: pa.Table) -> pa.Table:
        part = b["partition_id"].to_numpy(zero_copy_only=False)
        seq = b["seq"].to_numpy(zero_copy_only=False)
        ps = np.unique(part)
        mx = [int(seq[part == p].max()) for p in ps]
        return pa.table({"partition_id": pa.array(ps, pa.int32()),
                         "max_seq": pa.array(mx, pa.int64())})

    def _compute_wm() -> dict[str, int]:
        wm: dict[str, int] = {}
        for r in (changes_ds.select_columns(["partition_id", "seq"])
                  .map_batches(_partial_wm, batch_format="pyarrow",
                               batch_size=None).take_all()):
            k = str(r["partition_id"])
            wm[k] = max(int(r["max_seq"]), wm.get(k, -1))
        return wm

    # 1: replay filter fused with decode-validation in ONE pass over
    # the changeset, materialized once (changeset-sized, bounded —
    # never the base table). The round-2 predecessor materialized the
    # replay filter separately just to feed the watermark pass.
    # per-call nonce in the quarantine prefix: stream_ingest reuses one
    # ctx.run_id across every flush, so counting by run_id glob alone
    # would include EARLIER flushes' dead letters — a fully-replayed
    # later flush would then see n_fresh>0, skip the no-op return and
    # commit a spurious empty merge version. The nonce extends the
    # run_id prefix, so quarantine_report(run_id=...) still sees it.
    call_tag = f"{ctx.run_id}-c{uuid.uuid4().hex[:8]}"
    stages = [_ReplayFilter(wm0)]
    if validate:
        stages.append(_ValidateChanges(table.root, call_tag,
                                       constraints=table.constraints()))

    def _materialize_validated():
        out = changes_ds
        for s in stages:
            out = out.map_batches(s, batch_format="pyarrow")
        # TWO consumers follow (slim seq-duplicate detection + the
        # key-dedup path) — re-executing would decode every image
        # twice and double-write quarantine
        return out.materialize()

    with ThreadPoolExecutor(max_workers=2) as ex:
        fut_wm = ex.submit(_compute_wm)
        validated = _materialize_validated()
        new_wm = fut_wm.result()

    quarantined = 0
    if validate:
        import glob as _glob

        # count only THIS call's dead letters (call_tag, not run_id)
        for p in _glob.glob(os.path.join(table.root, "quarantine",
                                         f"q-{call_tag}-*.parquet")):
            quarantined += pq.read_metadata(p).num_rows
    n_fresh = validated.count() + quarantined
    if n_fresh == 0:
        ctx.log_metric("merge_noop", app_id=app_id, seconds=time.time() - t0)
        return None

    # 2: dual-domain first-wins dedup (reference D1). The seq domain
    # (duplicate offsets dropped regardless of key) is resolved on the
    # SLIM identity columns only — a ~20 B/row exchange — and runs
    # CONCURRENTLY with the key domain's single full-payload shuffle
    # (duplicate image_ids keep lowest seq): seq losers are normally
    # zero, so the optimistic key dedup is final; when they are not,
    # _repair_seq_losers recomputes just the affected keys. The
    # changeset's image bytes cross the wire ONCE, and the slim seq
    # pass is off the critical path.
    def _key_dedup():
        return (validated
                .map_batches(lambda b: _add_bucket(b, n_buckets),
                             batch_format="pyarrow")
                .groupby("bucket")
                .map_groups(_first_wins, batch_format="pyarrow")
                .materialize())

    with ThreadPoolExecutor(max_workers=2) as ex:
        fut_losers = ex.submit(_seq_losers, validated, n_buckets,
                               n_fresh - quarantined)
        deduped = _key_dedup()
        losers = fut_losers.result()
    if losers:
        deduped = _repair_seq_losers(validated, deduped, losers, n_buckets)
    ctx.log_dataset_stats("dedup", deduped)
    n_effective = deduped.count()
    if n_effective == 0:
        # nothing applicable (e.g. everything quarantined) — but the
        # watermark still advances so the batch is not replayed forever
        def build_wm_only(latest: Manifest) -> Manifest:
            txn = {k: dict(v) for k, v in latest.txn.items()}
            cur = txn.setdefault(app_id, {})
            for p, s in new_wm.items():
                cur[p] = max(int(s), int(cur.get(p, -1)))
            return Manifest(version=-1, parent=None, kind="merge",
                            schema=latest.schema,
                            fragments=list(latest.fragments),
                            txn=txn, properties=latest.properties)

        m = table.commit(build_wm_only)
        ctx.log_metric("merge_all_quarantined", app_id=app_id,
                       rows_fresh=n_fresh, seconds=time.time() - t0)
        return m

    import bisect

    distributed = n_effective > driver_keys_max
    key_ds = deduped.select_columns(["image_id"])
    changed_keys: set | None = None

    if not distributed:
        # changed-key set (driver-side; bounded by driver_keys_max)
        changed_keys = {r["image_id"] for r in key_ds.take_all()}
        kmin, kmax = min(changed_keys), max(changed_keys)
        keys_sorted = sorted(changed_keys)

        # 3: zone-map prune → per-fragment intersect. The prune checks
        # the fragment's [min,max] against the actual sorted key SET
        # (two binary searches per fragment), not just the global key
        # range — a global range over uniformly-spread keys covers
        # every fragment, while the set check prunes any fragment
        # whose range holds no changed key (precise on clustered/
        # id-ordered tables).
        def _holds_changed_key(f) -> bool:
            s = f.stats.get("image_id")
            if s is None or s.get("min") is None:
                return True  # no stats → cannot prune
            lo = bisect.bisect_left(keys_sorted, s["min"])
            return lo < len(keys_sorted) and keys_sorted[lo] <= s["max"]
    else:
        # distributed prune metadata: sort the slim key column once
        # (O(changeset) exchange of ~20 B rows) and keep only each
        # sorted block's [lo, hi] — O(blocks) rows on the driver.
        # Coarser than the exact set check (keys from two sides of a
        # gap INSIDE one block don't prune fragments in the gap) but
        # safe, and tight at scale where sorted blocks are dense.
        key_sorted = key_ds.sort("image_id").materialize()
        rng = key_sorted.map_batches(
            lambda b: pa.table({"lo": [b["image_id"][0].as_py()],
                                "hi": [b["image_id"][-1].as_py()]}),
            batch_format="pyarrow", batch_size=None).take_all()
        ranges = sorted((r["lo"], r["hi"]) for r in rng)
        his = [r[1] for r in ranges]
        kmin, kmax = ranges[0][0], ranges[-1][1]

        def _holds_changed_key(f) -> bool:
            s = f.stats.get("image_id")
            if s is None or s.get("min") is None:
                return True
            j = bisect.bisect_left(his, s["min"])
            return j < len(ranges) and ranges[j][0] <= s["max"]

    touched = [f for f in m0.fragments if _holds_changed_key(f)]

    def _run_intersect() -> pa.Table:
        empty = pa.table({"fragment_id": pa.array([], pa.string()),
                          "image_id": pa.array([], pa.string())})
        if not touched:
            return empty
        keys_ref = ray.put(changed_keys)
        metas = rd.from_items([{"id": f.id, "path": f.path} for f in touched],
                              override_num_blocks=len(touched))
        parts = metas.map_batches(_IntersectKeys(table.root, keys_ref),
                                  batch_format="pyarrow", batch_size=1).take_all()
        if not parts:
            return empty
        return pa.Table.from_pylist(
            parts, schema=pa.schema([("fragment_id", pa.string()),
                                     ("image_id", pa.string())]))

    def _run_intersect_distributed() -> list[dict]:
        """Replace the key-set broadcast with a hash-partitioned
        semi-join: touched fragments' key columns and the changeset
        keys meet in ~200k-row shuffle groups; each fragment's hits
        are then grouped per fragment, subtracted against its existing
        deletion vectors and written to a per-fragment delete file BY
        THE WORKER. The driver receives only (fragment_id, del_rel, n)
        metadata — O(touched fragments)."""
        if not touched:
            return []
        metas = rd.from_items([{"id": f.id, "path": f.path} for f in touched],
                              override_num_blocks=len(touched))
        frag_keys = metas.map_batches(_FragmentKeys(table.root),
                                      batch_format="pyarrow", batch_size=1)
        ch_keys = key_ds.map_batches(
            lambda b: pa.table({
                "fragment_id": pa.array([""] * b.num_rows, pa.string()),
                "image_id": b["image_id"].combine_chunks()}),
            batch_format="pyarrow")
        nb = max(64, n_effective // 200_000)

        def _add_kb(b: pa.Table) -> pa.Table:
            pl = _polars()

            h = pl.from_arrow(b["image_id"]).hash(seed=0).to_numpy()
            return b.append_column(
                "kb", pa.array((h % np.uint64(nb)).astype(np.int64)))

        hits = (frag_keys.union(ch_keys)
                .map_batches(_add_kb, batch_format="pyarrow")
                .groupby("kb")
                .map_groups(_semi_join_group, batch_format="pyarrow")
                .materialize())
        if hits.count() == 0:
            return []
        dv_ref = ray.put({f.id: list(f.delete_paths)
                          for f in touched if f.delete_paths})
        return (hits.groupby("fragment_id")
                .map_groups(_WriteFragmentDeletes(table.root, ctx.run_id,
                                                  dv_ref),
                            batch_format="pyarrow")
                .take_all())

    # 4 (concurrent with 3): new fragments from upsert rows. The base
    # intersect reads only touched fragments' key columns and the
    # fragment write only consumes the materialized changeset — fully
    # independent, so they overlap: merge wall-clock pays
    # max(intersect, write) instead of their sum.
    import pyarrow.compute as pc

    def _run_write():
        upserts = deduped.map_batches(
            lambda b: b.filter(pc.equal(b["op"], "upsert")).drop_columns(
                [c for c in _EXTRA_COLS if c in b.column_names]),
            batch_format="pyarrow")
        return upserts.map_batches(FragmentWriter(table.root, ctx.run_id),
                                   batch_format="pyarrow",
                                   batch_size=target_fragment_rows).take_all()

    with ThreadPoolExecutor(max_workers=2) as ex:
        fut_del = ex.submit(_run_intersect_distributed if distributed
                            else _run_intersect)
        meta = _run_write()
        del_out = fut_del.result()

    deletes_by_frag: dict[str, int] = {}
    del_rel_by_frag: dict[str, list] = {}
    if distributed:
        # dead-key subtraction + delete-file writes already happened
        # inside the per-fragment worker tasks; del_out is metadata
        for r in del_out:
            deletes_by_frag[r["fragment_id"]] = int(r["n"])
            del_rel_by_frag[r["fragment_id"]] = [r["del_rel"]]
    else:
        del_tbl = del_out
        # Subtract keys already dead under existing deletion vectors —
        # re-deleting them would double-count deleted_rows and drift
        # live_rows / total_rows() low (delete_where does the same).
        if del_tbl.num_rows:
            hit_ids = set(del_tbl["fragment_id"].to_pylist())
            already = snap.read_deletes(
                [f for f in touched
                 if f.id in hit_ids and f.delete_paths])
            if already:
                dead = {(fid, k) for fid, keys in already.items()
                        for k in keys}
                mask = [(fid, k) not in dead for fid, k in
                        zip(del_tbl["fragment_id"].to_pylist(),
                            del_tbl["image_id"].to_pylist())]
                del_tbl = del_tbl.filter(pa.array(mask))
        if del_tbl.num_rows:
            del_rel = write_delete_file(table.root, ctx.run_id, del_tbl)
            for fid in del_tbl["fragment_id"].to_pylist():
                deletes_by_frag[fid] = deletes_by_frag.get(fid, 0) + 1
            del_rel_by_frag = {fid: [del_rel] for fid in deletes_by_frag}
    n_deletes = sum(deletes_by_frag.values())

    new_frags = frags_from_meta(meta)

    # 5: one CAS
    scanned_ids = m0.fragment_ids()
    scanned_by_id = {f.id: f for f in m0.fragments}

    def build(latest: Manifest) -> Manifest:
        live = {f.id: f for f in latest.fragments}
        for fid in deletes_by_frag:
            if fid not in live:
                raise CommitConflict(
                    f"fragment {fid} was rewritten concurrently; rerun merge")
            if list(live[fid].delete_paths) != \
                    list(scanned_by_id[fid].delete_paths):
                # our key-intersect ran against the scanned snapshot; a
                # concurrent merge/delete attached new deletion vectors
                # to this fragment, so the intersect may be stale
                raise CommitConflict(
                    f"fragment {fid} gained deletes concurrently; rerun merge")
        # fragments added since our scan may carry the SAME keys we are
        # upserting (a concurrent merge of an overlapping changeset) —
        # committing blindly would leave one key live in two fragments,
        # breaking the invariant key-based deletion vectors rely on.
        # Zone-map prefilter, then an exact key intersect (I/O bounded
        # by fragments committed concurrently, normally zero or few).
        for f in latest.fragments:
            if f.id in scanned_ids:
                continue
            s = f.stats.get("image_id")
            if s and s.get("max") is not None and (
                    s["max"] < kmin or s["min"] > kmax):
                continue
            t = pq.read_table(table.abspath(f.path), columns=["image_id"])
            if changed_keys is not None:
                overlap = bool(changed_keys.intersection(
                    t["image_id"].to_pylist()))
            else:
                # distributed path: the changed keys never sat on the
                # driver; broadcast the ONE concurrent fragment's key
                # column (bounded by fragment size) and count hits
                # against the distributed key dataset instead
                kref = ray.put(set(t["image_id"].to_pylist()))
                counts = key_ds.map_batches(
                    _KeysHit(kref), batch_format="pyarrow").take_all()
                overlap = any(int(r["n"]) for r in counts)
            if overlap:
                raise CommitConflict(
                    f"concurrent fragment {f.id} contains keys this merge "
                    f"upserts; rerun merge against the new snapshot")
        frags = []
        for f in latest.fragments:
            if f.id in deletes_by_frag:
                f = type(f)(**{**f.to_json()})
                f.delete_paths = list(f.delete_paths) + del_rel_by_frag[f.id]
                f.deleted_rows = f.deleted_rows + deletes_by_frag[f.id]
            frags.append(f)
        frags += new_frags
        txn = {k: dict(v) for k, v in latest.txn.items()}
        cur = txn.setdefault(app_id, {})
        for p, s in new_wm.items():
            cur[p] = max(int(s), int(cur.get(p, -1)))
        return Manifest(version=-1, parent=None, kind="merge",
                        schema=latest.schema, fragments=frags,
                        txn=txn, properties=latest.properties)

    m = table.commit(build)
    # `quarantined` (A1 parity: the reference counts dead letters,
    # src/monitoring/mod.rs:150-202) was counted from this run's
    # quarantine files right after validation
    ctx.log_metric("merge_done", app_id=app_id, rows_effective=n_effective,
                   quarantined=quarantined,
                   bytes_written=sum(f.bytes for f in new_frags),
                   deletes=n_deletes,
                   distributed_keys=distributed,
                   inserted_fragments=len(new_frags),
                   touched_fragments=len(deletes_by_frag),
                   seconds=time.time() - t0, committed_version=m.version)
    return m
