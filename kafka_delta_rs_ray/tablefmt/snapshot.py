"""Snapshot reads: manifest version → ray.data.Dataset.

A snapshot is immutable: the fragment list and delete files referenced
by its manifest never change, so concurrent maintenance commits are
invisible to an open snapshot (snapshot isolation).

Scan strategy (scale notes):
- zone-map pruning happens BEFORE any I/O: fragments whose per-column
  min/max ranges miss the predicate are dropped from the read set
  (driver-side metadata only).
- fragments with no delete files are read with ``ray.data.read_parquet``
  (block splitting, column pruning at the parquet reader).
- fragments WITH delete files are scanned one task per fragment via
  ``from_items(frag metas) → map_batches(reader)``: the task reads its
  parquet (columns pruned), loads ITS OWN fragment's delete files
  (paths travel in the meta row) and anti-joins the dead keys. The
  driver never reads delete data — scan startup is O(manifest
  metadata) however many deletes accumulated since the last
  compaction. Fragment size is bounded by the compaction target, so
  one task per dirty fragment is memory-safe.
"""

from __future__ import annotations

import os
import typing

import pyarrow as pa
import pyarrow.parquet as pq

from .schema import conform_table

if typing.TYPE_CHECKING:
    from .catalog import Table
    from .manifest import Fragment, Manifest


def _overlaps(stats: dict, col: str, lo, hi) -> bool:
    s = stats.get(col)
    if s is None:
        return True  # no stats → cannot prune
    if lo is not None and s["max"] is not None and s["max"] < lo:
        return False
    if hi is not None and s["min"] is not None and s["min"] > hi:
        return False
    return True


class _DirtyFragmentReader:
    """map_batches stage over fragment-meta rows: read parquet, drop
    deleted keys. Each task reads ITS OWN fragment's delete files
    (paths ship in the meta row) — the driver never materializes any
    delete data, so scan startup is O(manifest metadata) no matter how
    many deletes accumulated since the last compaction."""

    def __init__(self, root: str, columns, schema=None,
                 row_filter=None):
        self.root = root
        self.columns = columns
        self.schema = schema  # target schema for evolved tables, or None
        self.row_filter = row_filter  # pyarrow.dataset expression

    def __call__(self, meta: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        out = []
        for row in meta.to_pylist():
            cols = self.columns
            read_cols = cols
            if cols is not None and "image_id" not in cols:
                read_cols = list(cols) + ["image_id"]
            if read_cols is not None and self.schema is not None:
                # evolved table: an old fragment may lack a projected col
                have = set(pq.read_schema(
                    os.path.join(self.root, row["path"])).names)
                read_cols = [c for c in read_cols if c in have]
            t = pq.read_table(os.path.join(self.root, row["path"]),
                              columns=read_cols, filters=self.row_filter)
            from .fragments import read_dead_keys

            keys = read_dead_keys(self.root, row["id"],
                                  row.get("delete_paths"))
            if keys is not None and len(keys) > 0:
                mask = pc.is_in(t["image_id"], value_set=keys)
                t = t.filter(pc.invert(mask))
            if self.schema is not None:
                proj = (self.schema if cols is None else
                        pa.schema([self.schema.field(c) for c in cols]))
                t = conform_table(t, proj)
            elif cols is not None:
                t = t.select(cols)
            out.append(t)
        if out:
            return pa.concat_tables(out)
        # typed empty block: a zero-COLUMN table would poison the
        # stream's schema downstream
        if self.schema is not None:
            proj = (self.schema if self.columns is None else
                    pa.schema([self.schema.field(c) for c in self.columns]))
            return proj.empty_table()
        return pa.table({})


class Snapshot:
    def __init__(self, table: "Table", manifest: "Manifest"):
        self.table = table
        self.manifest = manifest

    @property
    def version(self) -> int:
        return self.manifest.version

    def _select_fragments(self, prune: dict | None,
                          ids: set | None = None) -> list["Fragment"]:
        frags = self.manifest.fragments
        if ids is not None:
            frags = [f for f in frags if f.id in ids]
        if prune:
            for col, (lo, hi) in prune.items():
                frags = [f for f in frags if _overlaps(f.stats, col, lo, hi)]
        return frags

    def read_deletes(self, frags: list["Fragment"] | None = None) -> dict:
        """fragment_id → list[str] deleted keys (driver-side; small)."""
        frags = self.manifest.fragments if frags is None else frags
        out: dict[str, list] = {}
        for f in frags:
            if not f.delete_paths:
                continue
            keys: list = []
            for rel in f.delete_paths:
                t = pq.read_table(self.table.abspath(rel), columns=["fragment_id", "image_id"])
                import pyarrow.compute as pc

                t = t.filter(pc.equal(t["fragment_id"], f.id))
                keys.extend(t["image_id"].to_pylist())
            if keys:
                out[f.id] = keys
        return out

    def read_plan(self, columns: list | None = None,
                  prune: dict | None = None) -> dict:
        """Public scan-plan accessor for consumers that drive their own
        per-fragment reads (e.g. pipelines/export.py): the selected
        fragment metas, the projected schema, and whether old fragments
        need schema-evolution conform — the same three inputs
        ``dataset()`` computes internally, exposed so external readers
        can't drift from the scan's semantics."""
        frags = self._select_fragments(prune)
        schema = (self.manifest.schema if columns is None else pa.schema(
            [self.manifest.schema.field(c) for c in columns]))
        return {"fragments": frags, "schema": schema,
                "conform": bool(
                    self.manifest.properties.get("schema_evolved"))}

    def dataset(self, columns: list | None = None, prune: dict | None = None,
                apply_deletes: bool = True, row_filter=None,
                fragment_ids: set | None = None):
        """The snapshot as a lazy ray.data.Dataset.

        ``prune``: {col: (lo, hi)} zone-map predicate (inclusive; None =
        unbounded side) — drops whole fragments BEFORE any I/O.
        ``columns``: projection pushed to the parquet reader.
        ``row_filter``: a ``pyarrow.dataset`` expression pushed into the
        parquet scan of the surviving fragments (row-group/page-level
        filtering inside fragments; compose with ``prune`` for the full
        two-level pushdown).
        ``fragment_ids``: restrict to an explicit fragment subset (the
        incremental-maintenance hook — select by LAYOUT state, not by
        value predicate).
        """
        import ray.data as rd

        frags = self._select_fragments(prune, ids=fragment_ids)
        schema = self.manifest.schema if columns is None else pa.schema(
            [self.manifest.schema.field(c) for c in columns])
        if not frags:
            return rd.from_arrow(schema.empty_table())

        # dirty = has delete files attached — a MANIFEST property, so
        # classifying costs zero I/O; each dirty fragment's reader task
        # loads its own delete files (driver never touches delete data)
        dirty_ids = ({f.id for f in frags if f.delete_paths}
                     if apply_deletes else set())
        clean = [f for f in frags if f.id not in dirty_ids]
        dirty = [f for f in frags if f.id in dirty_ids]
        # set once schema evolution has happened (see ingest.append
        # mode="merge_schema"); older fragments then need null-fill +
        # column reorder, which costs one extra map stage — tables that
        # never evolved skip it entirely
        evolved = bool(self.manifest.properties.get("schema_evolved"))
        conform_schema = schema if evolved else None

        parts = []
        if clean:
            if evolved:
                # per-fragment read tasks (parquet column sets differ
                # per fragment, so push projection per file)
                meta = rd.from_items(
                    [{"id": f.id, "path": f.path, "delete_paths": []}
                     for f in clean],
                    override_num_blocks=len(clean))
                parts.append(meta.map_batches(
                    _DirtyFragmentReader(self.table.root, columns,
                                         schema=conform_schema,
                                         row_filter=row_filter),
                    batch_format="pyarrow", batch_size=1))
            else:
                kw = {"filter": row_filter} if row_filter is not None else {}
                parts.append(rd.read_parquet(
                    [self.table.abspath(f.path) for f in clean],
                    columns=columns, **kw))
        if dirty:
            meta = rd.from_items(
                [{"id": f.id, "path": f.path,
                  "delete_paths": list(f.delete_paths)} for f in dirty],
                override_num_blocks=len(dirty))
            parts.append(meta.map_batches(
                _DirtyFragmentReader(self.table.root, columns,
                                     schema=conform_schema,
                                     row_filter=row_filter),
                batch_format="pyarrow", batch_size=1))
        ds = parts[0]
        for p in parts[1:]:
            ds = ds.union(p)
        return ds

    def to_arrow(self, columns: list | None = None, prune: dict | None = None) -> pa.Table:
        """Materialize the snapshot driver-side — tests/small tables only."""
        tables = []
        deletes = self.read_deletes()
        proj = self.manifest.schema if columns is None else pa.schema(
            [self.manifest.schema.field(c) for c in columns])
        for f in self._select_fragments(prune):
            cols = columns
            if cols is not None and "image_id" not in cols:
                cols = list(cols) + ["image_id"]
            if cols is not None:
                have = set(pq.read_schema(self.table.abspath(f.path)).names)
                cols = [c for c in cols if c in have]
            t = pq.read_table(self.table.abspath(f.path), columns=cols)
            keys = deletes.get(f.id)
            if keys:
                import pyarrow.compute as pc

                t = t.filter(pc.invert(pc.is_in(t["image_id"],
                                                value_set=pa.array(keys, pa.string()))))
            tables.append(conform_table(t, proj))
        if not tables:
            return proj.empty_table()
        return pa.concat_tables(tables)
