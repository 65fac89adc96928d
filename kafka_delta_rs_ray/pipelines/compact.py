"""Bin-packing compaction (north_star: first-fit-decreasing over the
fragment size histogram).

Plan (driver-side, manifest metadata only — no data I/O):
  candidates = fragments smaller than the target OR carrying deletes;
  FFD: sort candidates by bytes descending, place each into the first
  bin with room (capacity = target_bytes); singleton bins without
  deletes are dropped (rewriting one clean fragment is churn).

Execute (Ray-Data-native fan-out): the bin list becomes a Dataset
(``from_items``) and each bin is rewritten by one ``map_batches`` task:
read the bin's fragments (column-complete, pyarrow), drop deleted keys,
write ONE new fragment. A bin is bounded by target_bytes, so a task's
working set is bounded regardless of table size; thousands of bins
stream through the actor/task pool with backpressure. No shuffle —
bin membership is decided from manifest stats (SURVEY §7.3).

Resume: each finished bin writes a done-marker recording its output
fragment; re-running with the same run_id skips finished bins
(mid-compaction resumability, north_rule).

Commit: one manifest CAS swaps input fragments for outputs. The
builder revalidates against the then-latest manifest: a bin commits
only if ALL its inputs are still live AND their delete state
(delete_paths + deleted_rows) is exactly what the rewrite applied.
Liveness alone is not enough — a concurrent merge/delete_where
attaches new deletion vectors WITHOUT changing fragment ids; swapping
in a rewrite that predates those deletes would resurrect deleted rows
(and duplicate upserted keys). Each rewrite therefore records the
delete fingerprint it applied (persisted in its resume marker), and
bins whose inputs drifted are skipped; their outputs become expirable
orphans.
"""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

from ..state.lineage import RunContext
from ..tablefmt.catalog import Table
from ..tablefmt.fragments import StreamingFragmentWriter  # noqa: F401 (used in _rewrite)
from ..tablefmt.manifest import Fragment, Manifest

DEFAULT_TARGET_BYTES = 128 << 20


def _delete_fp(f: Fragment) -> list:
    """A fragment's delete-state fingerprint (JSON-stable): the delete
    files applied to it plus the deleted-row count. Compared between
    rewrite time and commit time to catch concurrent merges/deletes
    that attach deletion vectors without changing the fragment id."""
    return [list(f.delete_paths), int(f.deleted_rows)]


def plan_compaction(manifest: Manifest, target_bytes: int = DEFAULT_TARGET_BYTES,
                    small_ratio: float = 0.8,
                    rewrite_all: bool = False) -> list[dict]:
    """Bin-packing over fragment sizes → list of bins (driver-side).

    ``rewrite_all`` makes every fragment a candidate (used by transcode
    compaction, which must touch clean full-size fragments too).

    Candidates are packed in two pools:
    - CLUSTERED candidates (fragments carrying a ``zcode`` zone map,
      i.e. written by a cluster() pass) are packed in zcode order into
      consecutive runs, so a bin's inputs cover adjacent key ranges —
      the rewrite preserves the sort (``sorted_by="zcode"``) and the
      output's zone map is the union of its inputs', keeping pruned
      scans selective. Plain FFD here would fuse distant key ranges
      into one file and widen every zone map to uselessness.
    - the rest (post-cluster ingest/merge fragments, or an unclustered
      table): first-fit-DECREASING over sizes (north-star FFD).
    """
    cand = [f for f in manifest.fragments
            if rewrite_all
            or f.bytes < target_bytes * small_ratio or f.deleted_rows > 0]
    zcand = [f for f in cand if "zcode" in f.stats]
    rest = [f for f in cand if "zcode" not in f.stats]

    zbins: list[dict] = []
    zcand.sort(key=lambda f: (f.stats["zcode"]["min"],
                              f.stats["zcode"]["max"]))
    for f in zcand:  # consecutive runs: adjacency beats fill ratio
        if zbins and zbins[-1]["bytes"] + f.bytes <= target_bytes:
            zbins[-1]["frags"].append(f)
            zbins[-1]["bytes"] += f.bytes
        else:
            zbins.append({"frags": [f], "bytes": f.bytes})

    bins: list[dict] = []
    rest.sort(key=lambda f: f.bytes, reverse=True)  # first-fit-DECREASING
    for f in rest:
        for b in bins:
            if b["bytes"] + f.bytes <= target_bytes:
                b["frags"].append(f)
                b["bytes"] += f.bytes
                break
        else:
            bins.append({"frags": [f], "bytes": f.bytes})

    out = []
    for i, b in enumerate(zbins + bins):
        if (not rewrite_all and len(b["frags"]) == 1
                and b["frags"][0].deleted_rows == 0):
            continue  # nothing to gain
        d = {"bin_id": i,
             "fragment_ids": [f.id for f in b["frags"]],
             "paths": [f.path for f in b["frags"]],
             "bytes": b["bytes"]}
        if all("zcode" in f.stats for f in b["frags"]):
            d["sorted_by"] = "zcode"
            d["zcode_min"] = min(f.stats["zcode"]["min"] for f in b["frags"])
            d["zcode_max"] = max(f.stats["zcode"]["max"] for f in b["frags"])
        out.append(d)
    return out


def transcode_table(t: pa.Table, fmt: str) -> pa.Table:
    """Re-encode every image to ``fmt`` (decode → encode; per-row by
    necessity — opaque binary payloads). Rows already in ``fmt`` pass
    through untouched. ``phash`` keeps its ingest-time value (it is the
    row's perceptual identity; the lossy codec guarantees PSNR ≥ 40 dB
    so decoded pixels stay equivalent)."""
    from ..codecs import decode, encode
    from ..functions.binview import binary_views

    fmts = t["fmt"].to_pylist()
    if all(f == fmt for f in fmts):
        return t
    bufs = binary_views(t["bytes"])  # zero-copy memoryviews
    out = [bytes(buf) if f == fmt else encode(decode(buf, f), fmt)
           for buf, f in zip(bufs, fmts)]
    i_bytes = t.column_names.index("bytes")
    i_fmt = t.column_names.index("fmt")
    return (t.set_column(i_bytes, t.field(i_bytes),
                         pa.array(out, t.field(i_bytes).type))
            .set_column(i_fmt, t.field(i_fmt),
                        pa.array([fmt] * t.num_rows, pa.string())))


class _RewriteBin:
    """map_batches stage over bin-descriptor rows (batch_size=1).

    The bin is rewritten as a STREAM: each input fragment is read,
    delete-filtered, optionally transcoded, and appended to an open
    ParquetWriter as its own row group, so peak memory is one input
    fragment — never the whole bin (a bin is target_bytes, but this
    keeps the task safe even with large targets). Measured 10-20x
    faster than materialize-then-write under 32-way concurrency
    (concurrent whole-bin concat+write stalls the allocator)."""

    def __init__(self, root: str, run_id: str, deletes_ref,
                 transcode_fmt: str | None = None,
                 schema_b64: str | None = None):
        self.root = root
        self.run_id = run_id
        self.deletes_ref = deletes_ref  # (delete-file paths, fingerprints)
        self.transcode_fmt = transcode_fmt
        # manifest schema (b64) for evolved tables: bins can mix
        # fragment GENERATIONS (pre/post merge_schema add or
        # drop_column), so each input conforms to the current schema
        # before the streaming writer sees it — the rewrite both fixes
        # the mixed-schema concat and physically materializes
        # adds (null-fill) / drops (reclaimed bytes)
        self.schema_b64 = schema_b64
        self._deletes = None
        self._fps = None
        self._ctx = None

    def _rewrite(self, row: dict) -> "Fragment":
        import pyarrow.compute as pc

        from ..tablefmt.fragments import StreamingFragmentWriter

        # clustered bins (adjacent zcode runs, see plan_compaction):
        # inputs are appended in zcode order, so the output inherits
        # the sort and the UNION of its inputs' zcode zone maps — the
        # zcode column itself lives only in the manifest, not the files
        sw = StreamingFragmentWriter(self.root, self.run_id,
                                     sorted_by=row.get("sorted_by"))
        from ..tablefmt.fragments import read_dead_keys

        target_schema = None
        if self.schema_b64 is not None:
            from ..tablefmt.schema import schema_from_b64

            target_schema = schema_from_b64(self.schema_b64)
        for fid, rel in zip(row["fragment_ids"], row["paths"]):
            t = pq.read_table(os.path.join(self.root, rel))
            keys = read_dead_keys(self.root, fid, self._deletes.get(fid))
            if keys is not None and len(keys) > 0:
                t = t.filter(pc.invert(pc.is_in(t["image_id"],
                                                value_set=keys)))
            if target_schema is not None:
                from ..tablefmt.schema import conform_table

                t = conform_table(t, target_schema)
            if self.transcode_fmt:
                t = transcode_table(t, self.transcode_fmt)
            sw.write(t)
        return sw.close()

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        if self._ctx is None:
            self._ctx = RunContext(self.root, self.run_id, job="compact")
            self._deletes, self._fps = ray.get(self.deletes_ref)
        out_rows = []
        for row in batch.to_pylist():
            bin_id = str(row["bin_id"])
            fp = {fid: self._fps.get(fid) for fid in row["fragment_ids"]}
            done = self._ctx.read_marker("bin", bin_id)
            # Resume requires the marker to carry the delete state the
            # ORIGINAL rewrite applied (fp_json). A pre-upgrade marker
            # without it is NOT resumable: substituting the current
            # snapshot's fingerprint would let a delete that landed
            # between the original rewrite and this resume pass the
            # commit check — the stale rewrite would resurrect deleted
            # rows, exactly what the fingerprint exists to prevent.
            if done is not None and "fp_json" in done:
                out_rows.append({"bin_id": row["bin_id"],
                                 "frag_json": done["frag_json"],
                                 "input_ids": row["fragment_ids"],
                                 # the delete state the ORIGINAL rewrite
                                 # applied, not this run's snapshot
                                 "fp_json": done["fp_json"],
                                 "resumed": True})
                continue
            t0 = time.time()
            frag = self._rewrite(row)
            if frag is not None and row.get("sorted_by") == "zcode":
                # zcode zone map = union of the bin's inputs (the
                # column lives only in manifests post-cluster)
                frag.stats["zcode"] = {"min": row["zcode_min"],
                                       "max": row["zcode_max"]}
            # frag None = every row in the bin was deleted: the inputs
            # are dropped from the manifest with no replacement
            fj = json.dumps(frag.to_json()) if frag is not None else None
            fp_json = json.dumps(fp)
            self._ctx.write_marker("bin", bin_id, {
                "frag_json": fj, "fp_json": fp_json,
                "rows": 0 if frag is None else frag.rows,
                "seconds": time.time() - t0})
            out_rows.append({"bin_id": row["bin_id"], "frag_json": fj,
                             "input_ids": row["fragment_ids"],
                             "fp_json": fp_json,
                             "resumed": False})
        return pa.Table.from_pylist(out_rows)


def compact(table: Table, target_bytes: int = DEFAULT_TARGET_BYTES,
            run_id: str | None = None, concurrency=None,
            transcode_fmt: str | None = None) -> Manifest | None:
    """Run one compaction pass. Returns the new manifest, or None if the
    table is already compact. Resumable: pass the previous run_id to
    skip bins that already finished.

    ``transcode_fmt``: rewrite-with-recompression — every image is
    re-encoded to this codec during the rewrite (ALL fragments become
    candidates). The per-row invariant holds: captions byte-identical,
    decoded pixels PSNR ≥ 40 dB (codec guarantee)."""
    import ray
    import ray.data as rd

    ctx = RunContext(table.root, run_id, job="compact")
    snap = table.snapshot()
    saved = ctx.read_plan()
    if saved is not None:
        bins = saved["bins"]
    else:
        bins = plan_compaction(snap.manifest, target_bytes,
                               rewrite_all=transcode_fmt is not None)
        ctx.write_plan({"bins": bins, "base_version": snap.version,
                        "target_bytes": target_bytes,
                        "transcode_fmt": transcode_fmt})
    if not bins:
        return None

    t0 = time.time()
    planned_ids = {fid for b in bins for fid in b["fragment_ids"]}
    frag_by_id = {f.id: f for f in snap.manifest.fragments}
    # ship delete-file PATHS (manifest metadata), not key data: each
    # rewrite task reads its own inputs' delete files, so the driver
    # never materializes deleted keys however many merges accumulated
    dv_paths = {i: list(frag_by_id[i].delete_paths) for i in planned_ids
                if i in frag_by_id and frag_by_id[i].delete_paths}
    # per-input delete fingerprint: what delete state this rewrite
    # APPLIES — compared at commit time against the then-latest
    # manifest to detect concurrent merges/deletes on the same ids
    fps = {i: _delete_fp(frag_by_id[i]) for i in planned_ids
           if i in frag_by_id}
    deletes_ref = ray.put((dv_paths, fps))

    kwargs = {"concurrency": concurrency} if concurrency is not None else {}
    # one block per bin — from_items yields a single block otherwise,
    # which would serialize every rewrite into one task
    schema_b64 = None
    if snap.manifest.properties.get("schema_evolved"):
        from ..tablefmt.schema import schema_to_b64

        schema_b64 = schema_to_b64(snap.manifest.schema)
    rewrite_ds = rd.from_items(bins, override_num_blocks=len(bins)).map_batches(
        _RewriteBin(table.root, ctx.run_id, deletes_ref,
                    transcode_fmt=transcode_fmt, schema_b64=schema_b64),
        batch_format="pyarrow", batch_size=1, **kwargs)
    results = rewrite_ds.take_all()
    ctx.log_dataset_stats("rewrite", rewrite_ds)

    attempts = {"n": 0}

    def build(latest: Manifest) -> Manifest | None:
        attempts["n"] += 1
        latest_by_id = {f.id: f for f in latest.fragments}
        keep = list(latest.fragments)
        removed: set = set()
        added: list[Fragment] = []
        for r in results:
            inputs = set(r["input_ids"])
            applied_fp = json.loads(r["fp_json"])
            # skip the bin unless every input is still live AND its
            # delete state is exactly what the rewrite applied — a
            # concurrent merge/delete attaches delete files without
            # changing ids, and committing over it would resurrect rows
            if any(fid not in latest_by_id
                   or _delete_fp(latest_by_id[fid]) != applied_fp.get(fid)
                   for fid in inputs):
                continue
            removed |= inputs
            if r["frag_json"]:  # None = bin fully deleted, no output
                added.append(Fragment.from_json(json.loads(r["frag_json"])))
        if not removed:
            return None
        keep = [f for f in keep if f.id not in removed] + added
        return Manifest(version=-1, parent=None, kind="compact",
                        schema=latest.schema, fragments=keep,
                        txn=latest.txn, properties=latest.properties)

    m = table.commit(build)
    ctx.log_metric("compact_done",
                   bins=len(bins),
                   fragments_in=len(planned_ids),
                   fragments_out=len(bins),
                   resumed_bins=sum(1 for r in results if r["resumed"]),
                   commit_attempts=attempts["n"],
                   seconds=time.time() - t0,
                   committed_version=None if m is None else m.version)
    return m
