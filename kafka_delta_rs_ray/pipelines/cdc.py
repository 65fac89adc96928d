"""Change-feed reads (CDC): the rows a table LOGICALLY gained or lost
between two versions, as a streaming ray.data.Dataset.

This is the table-format analog of the reference's Kafka change
stream (src/kafka/mod.rs:159-253): downstream consumers (index
builders, trainers, replicas) re-consume a bounded changeset instead
of re-scanning the table. The manifest chain already records
everything needed — each commit's ``kind`` plus its fragment/delete
diff against the parent — so the feed is computed from metadata only;
row data is read by per-fragment worker tasks, never on the driver.

Semantics per commit kind:
- ``append``/``merge``/``delete``: logical changes. New fragments emit
  their rows as ``insert``; keys newly covered by delete files emit the
  pre-image row as ``delete``; fragments dropped wholesale (predicate
  delete of a fully-contained fragment) emit their live rows as
  ``delete``. A merge UPDATE therefore appears as delete(old) +
  insert(new) — the standard CDC decomposition for engines that
  version rows by rewrite.
- ``create``/``compact``/``cluster``/``expire``: physical
  reorganizations — scan output is identical by the engine's
  scan-identity invariant, so they emit nothing.
- ``rollback``: rejected (the restored rows' provenance spans many
  commits; consumers should re-sync from a snapshot instead).

Output schema = table schema (conformed to ``to_version``'s schema)
+ ``_change_type`` (string) + ``_commit_version`` (int64).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from ..tablefmt.catalog import Table
from ..tablefmt.fragments import read_dead_keys
from ..tablefmt.schema import conform_table

_PHYSICAL_KINDS = {"create", "compact", "cluster", "expire"}


def _dead_set(root: str, frag_id: str, paths) -> set:
    keys = read_dead_keys(root, frag_id, list(paths or ()))
    return set(keys.to_pylist()) if keys is not None else set()


class _ChangeReader:
    """map_batches stage over change-meta rows (one fragment per row).

    mode per row:
    - ``insert``: fragment rows minus its own delete files (paths_a);
    - ``delete_new``: pre-image rows whose key is in the NEWLY added
      delete files (paths_a) but not already dead before (paths_b);
    - ``delete_all``: the fragment's live rows (minus paths_b) — it
      was dropped wholesale.
    Each task reads its own fragment + delete files; the driver ships
    only path strings (same contract as Snapshot's dirty readers)."""

    def __init__(self, root: str, schema: pa.Schema):
        self.root = root
        self.schema = schema  # target (to_version) schema, no CDC cols

    def __call__(self, meta: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        out = []
        for row in meta.to_pylist():
            have = set(pq.read_schema(
                os.path.join(self.root, row["path"])).names)
            cols = [f.name for f in self.schema if f.name in have]
            t = pq.read_table(os.path.join(self.root, row["path"]),
                              columns=cols)
            mode = row["mode"]
            if mode == "insert":
                dead = read_dead_keys(self.root, row["id"], row["paths_a"])
                if dead is not None and len(dead):
                    t = t.filter(pc.invert(pc.is_in(t["image_id"],
                                                    value_set=dead)))
                ct = "insert"
            elif mode == "delete_new":
                new_dead = _dead_set(self.root, row["id"], row["paths_a"])
                old_dead = _dead_set(self.root, row["id"], row["paths_b"])
                pick = pa.array(sorted(new_dead - old_dead), pa.string())
                t = t.filter(pc.is_in(t["image_id"], value_set=pick))
                ct = "delete"
            else:  # delete_all
                dead = read_dead_keys(self.root, row["id"], row["paths_b"])
                if dead is not None and len(dead):
                    t = t.filter(pc.invert(pc.is_in(t["image_id"],
                                                    value_set=dead)))
                ct = "delete"
            t = conform_table(t, self.schema)
            n = t.num_rows
            out.append(t.append_column("_change_type",
                                       pa.array([ct] * n, pa.string()))
                        .append_column("_commit_version",
                                       pa.array([row["version"]] * n,
                                                pa.int64())))
        if out:
            return pa.concat_tables(out)
        return _cdc_schema(self.schema).empty_table()


def _cdc_schema(schema: pa.Schema) -> pa.Schema:
    return pa.schema(list(schema)
                     + [pa.field("_change_type", pa.string()),
                        pa.field("_commit_version", pa.int64())])


def table_changes(table: Table, from_version: int,
                  to_version: int | None = None):
    """Rows inserted/deleted in (``from_version``, ``to_version``] as a
    lazy Dataset. Planning walks the manifest chain (metadata only);
    one worker task per changed fragment reads the row data. EVERY
    version in the span must still be retained (``expire`` prunes
    history; tag the feed's base version to pin it)."""
    import ray.data as rd

    latest = table.read_manifest()
    to_v = latest.version if to_version is None else int(to_version)
    from_v = int(from_version)
    if not 0 <= from_v <= to_v <= latest.version:
        raise ValueError(
            f"need 0 <= from_version <= to_version <= {latest.version}, "
            f"got ({from_v}, {to_v})")

    target_schema = table.read_manifest(to_v).schema
    metas = []
    for v in range(from_v + 1, to_v + 1):
        try:
            m = table.read_manifest(v)
        except FileNotFoundError:
            raise ValueError(
                f"v{v} inside the span ({from_v}, {to_v}] was expired "
                f"— a change feed needs EVERY version in its span "
                f"retained (tag the feed's base version, or expire "
                f"with a larger keep_last)") from None
        if m.kind in _PHYSICAL_KINDS:
            continue
        if m.kind == "rollback":
            raise ValueError(
                f"v{v} is a rollback commit; change feeds cannot span "
                f"rollbacks — re-sync consumers from a snapshot")
        p = table.read_manifest(m.parent)
        p_by_id = {f.id: f for f in p.fragments}
        m_ids = m.fragment_ids()
        for f in m.fragments:
            pf = p_by_id.get(f.id)
            if pf is None:
                metas.append({"version": v, "id": f.id, "path": f.path,
                              "mode": "insert",
                              "paths_a": list(f.delete_paths),
                              "paths_b": []})
            else:
                new_paths = [d for d in f.delete_paths
                             if d not in set(pf.delete_paths)]
                if new_paths:
                    metas.append({"version": v, "id": f.id,
                                  "path": f.path, "mode": "delete_new",
                                  "paths_a": new_paths,
                                  "paths_b": list(pf.delete_paths)})
        for fid, pf in p_by_id.items():
            if fid not in m_ids:
                metas.append({"version": v, "id": pf.id, "path": pf.path,
                              "mode": "delete_all", "paths_a": [],
                              "paths_b": list(pf.delete_paths)})

    if not metas:
        return rd.from_arrow(_cdc_schema(target_schema).empty_table())
    meta_schema = pa.schema([("version", pa.int64()),
                             ("id", pa.string()),
                             ("path", pa.string()),
                             ("mode", pa.string()),
                             ("paths_a", pa.list_(pa.string())),
                             ("paths_b", pa.list_(pa.string()))])
    meta_ds = rd.from_arrow(
        pa.Table.from_pylist(metas, schema=meta_schema))
    return (meta_ds.repartition(len(metas))
            .map_batches(_ChangeReader(table.root, target_schema),
                         batch_format="pyarrow", batch_size=1))


# ------------------------------------------------------- consumer cursors
# The reference's committed-offset checkpoint (src/kafka/mod.rs:187-231)
# on the CONSUMER side: a named cursor records the last table version a
# downstream consumer fully processed, so re-runs resume from the delta
# and a crash before ack() replays at-least-once (consumers are
# idempotent by keying on image_id + _commit_version).

def _cursor_path(table: Table, consumer_id: str) -> str:
    import re

    if not re.fullmatch(r"[A-Za-z0-9._-]{1,64}", consumer_id):
        raise ValueError(f"bad consumer_id {consumer_id!r}")
    return os.path.join(table.root, "_runs", "cursors",
                        f"{consumer_id}.json")


def cursor(table: Table, consumer_id: str) -> int:
    """Last acked version for this consumer; 0 (table creation) if
    never acked."""
    import json

    p = _cursor_path(table, consumer_id)
    if not os.path.exists(p):
        return 0
    with open(p) as f:
        return int(json.load(f)["version"])


def changes_since(table: Table, consumer_id: str,
                  bootstrap_version: int | None = None):
    """The unconsumed change feed: ``(feed, to_version)`` covering
    (last-acked, latest]. Process the feed, then ``ack(table,
    consumer_id, to_version)`` — the ack AFTER processing is the
    consumer-side write-then-commit ordering; a crash in between
    replays the span (at-least-once, idempotent by construction).

    ``bootstrap_version``: where a BRAND-NEW consumer starts (used
    only when no cursor exists). On a table whose early history was
    expired, a new consumer can't feed from v0 — seed it from a
    retained version (typically after syncing a snapshot)."""
    to_v = table.latest_version()
    cur = cursor(table, consumer_id)
    if cur == 0 and bootstrap_version is not None:
        cur = int(bootstrap_version)
    return table_changes(table, cur, to_v), to_v


def ack(table: Table, consumer_id: str, version: int) -> None:
    """Advance the cursor to ``version``. Monotonic under concurrency
    (the read-check-write runs under an flock, so two processes acking
    the same consumer can't regress the cursor); acking at or below
    the current cursor is a no-op (replay-safe); acking past the
    table's latest version is rejected (it would brick the consumer's
    next changes_since). Publication is an atomic replace."""
    import fcntl
    import json
    import tempfile

    version = int(version)
    latest = table.latest_version()
    if version > latest:
        raise ValueError(
            f"ack version {version} is past the table's latest "
            f"({latest})")
    p = _cursor_path(table, consumer_id)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    lock = open(p + ".lock", "w")
    try:
        fcntl.flock(lock, fcntl.LOCK_EX)
        if version <= cursor(table, consumer_id):
            return
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(p), suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump({"consumer_id": consumer_id, "version": version}, f)
        os.replace(tmp, p)
    finally:
        fcntl.flock(lock, fcntl.LOCK_UN)
        lock.close()
