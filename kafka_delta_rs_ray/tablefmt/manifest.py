"""Manifest model: one JSON document per table version.

The reference delegates its versioned log to the deltalake crate
(reference Cargo.toml:38, src/delta/mod.rs:35-63). There is no
deltalake/lance wheel in this environment, so the versioned-table layer
is ours: an immutable JSON manifest per version listing live fragments
(with zone-map stats and key-delete files), the schema, and the txn
ledger that carries writer-identity watermarks (the reference's
offset-commit anchor, src/kafka/mod.rs:187-231, becomes
``txn[app_id][partition] = last committed seq``).

Layout under a table root::

    data/frag-{run}-{uuid}.parquet      immutable fragment (ZSTD-3 parquet)
    deletes/del-{run}-{uuid}.parquet    key-delete file: (fragment_id, image_id)
    manifest/v{N:012d}.json             this document
    quarantine/*.parquet                dead-letter rows (never in fragments)
    _runs/{run_id}/                     lineage / checkpoint / metrics

Design note (scale): the manifest holds only per-fragment METADATA
(id, path, rows, bytes, min/max stats) — ~300 bytes per fragment, so a
million-fragment table is a ~300 MB manifest; fine for a driver-side
plan, and fragment stats enable zone-map pruning without touching data.

Format v2 (sharded fragment lists): past SHARD_THRESHOLD fragments the
version document stops inlining the fragment list and instead
references ``manifest/fraglist-*.parquet`` shard files (Iceberg-style
manifest files). A commit reuses every parent shard whose members are
all unchanged and writes only new/affected shards — commit cost is
O(changed fragments), not O(table fragments). Small tables keep the v1
inline form (zero overhead); readers handle both.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass, field

import pyarrow as pa

from .schema import schema_from_b64, schema_to_b64

MANIFEST_FMT = "v{:012d}.json"

SHARD_THRESHOLD = 512  # inline the fragment list below this count
# Fragments per new shard file. Small enough that one bulk append does
# not produce a single monolithic shard (which would defeat reuse: any
# touched member forces a full rewrite), large enough that a
# million-fragment table is ~8k shard files.
SHARD_SIZE = 128
SHARD_PREFIX = "fraglist-"


def _load_shards(root: str, descriptors: list) -> tuple[list, dict]:
    """Shard descriptors → (fragments, {shard path: [fragment ids]})."""
    import pyarrow.parquet as pq

    frags: list[Fragment] = []
    members: dict[str, list] = {}
    for d in descriptors:
        t = pq.read_table(os.path.join(root, d["path"]))
        members[d["path"]] = t["id"].to_pylist()
        frags.extend(Fragment.from_json(json.loads(j))
                     for j in t["json"].to_pylist())
    return frags, members


def write_shard(root: str, frags: list) -> dict:
    """Write one fragment-list shard parquet → its descriptor."""
    import pyarrow.parquet as pq

    rel = os.path.join("manifest",
                       f"{SHARD_PREFIX}{uuid.uuid4().hex[:12]}.parquet")
    t = pa.table({
        "id": pa.array([f.id for f in frags], pa.string()),
        "json": pa.array([json.dumps(f.to_json(), sort_keys=True)
                          for f in frags], pa.string())})
    pq.write_table(t, os.path.join(root, rel),
                   compression="zstd", compression_level=3)
    return {"path": rel, "n": len(frags)}


def plan_shards(parent: "Manifest | None", m: "Manifest",
                root: str) -> list | None:
    """Decide the new manifest's fragment-list layout.

    Returns shard descriptors (reusing every parent shard whose members
    are ALL unchanged in the new manifest, writing new shard files for
    the rest) or None → inline (small table). Commit I/O is
    proportional to CHANGED fragments: an append to a million-fragment
    table reuses ~all parent shards and writes one.

    "Unchanged" is decided by OBJECT IDENTITY against the parent
    manifest the builder consumed (``Table.commit`` passes that exact
    object here): builders keep the same Fragment instance for rows
    they do not touch and clone the ones they modify, so an identity
    check replaces the former per-fragment JSON round-trip — the
    driver-side cost of planning a commit against a 10^6-fragment
    table drops from seconds of json.dumps to two dict builds. A
    builder that clones an UNCHANGED fragment merely forfeits that
    shard's reuse (it gets rewritten); correctness never depends on
    identity."""
    if len(m.fragments) < SHARD_THRESHOLD:
        return None
    new_by_id = {f.id: f for f in m.fragments}
    descriptors: list[dict] = []
    covered: set = set()
    if parent is not None and parent.shard_members:
        parent_by_id = {f.id: f for f in parent.fragments}
        for path, ids in parent.shard_members.items():
            if ids and all(i in parent_by_id
                           and new_by_id.get(i) is parent_by_id[i]
                           for i in ids):
                descriptors.append({"path": path, "n": len(ids)})
                covered.update(ids)
    remaining = [f for f in m.fragments if f.id not in covered]
    for i in range(0, len(remaining), SHARD_SIZE):
        descriptors.append(write_shard(root, remaining[i:i + SHARD_SIZE]))
    return descriptors


@dataclass
class Fragment:
    id: str
    path: str  # relative to table root
    rows: int
    bytes: int
    stats: dict = field(default_factory=dict)  # col -> {"min": v, "max": v}
    delete_paths: list = field(default_factory=list)  # relative paths
    deleted_rows: int = 0  # upper bound of keys deleted from this fragment
    sorted_by: str | None = None  # e.g. "zcode" after clustering

    def to_json(self) -> dict:
        return {
            "id": self.id,
            "path": self.path,
            "rows": self.rows,
            "bytes": self.bytes,
            "stats": self.stats,
            "delete_paths": self.delete_paths,
            "deleted_rows": self.deleted_rows,
            "sorted_by": self.sorted_by,
        }

    @classmethod
    def from_json(cls, d: dict) -> "Fragment":
        return cls(**d)

    @property
    def live_rows(self) -> int:
        return self.rows - self.deleted_rows


@dataclass
class Manifest:
    version: int
    parent: int | None
    kind: str  # create | append | merge | compact | cluster | expire
    schema: pa.Schema
    fragments: list[Fragment] = field(default_factory=list)
    txn: dict = field(default_factory=dict)  # app_id -> {partition(str) -> seq(int)}
    properties: dict = field(default_factory=dict)
    # runtime-only (never serialized): shard path -> [fragment ids]
    # membership as loaded, so the next commit can reuse unchanged
    # shards. None for inline (v1) manifests.
    shard_members: dict | None = field(default=None, compare=False,
                                       repr=False)

    def to_json_str(self, fragment_lists: list | None = None) -> str:
        """``fragment_lists``: serialized shard descriptors (v2); when
        given, the fragment list is NOT inlined."""
        d = {
            "format_version": 2 if fragment_lists is not None else 1,
            "version": self.version,
            "parent": self.parent,
            "kind": self.kind,
            "schema_b64": schema_to_b64(self.schema),
            "txn": self.txn,
            "properties": self.properties,
            # summary lets history()/catalog listings answer "how big"
            # without loading shard files (v2) or parsing fragments
            "summary": {"fragments": len(self.fragments),
                        "rows": int(self.total_rows())},
        }
        if fragment_lists is not None:
            d["fragment_lists"] = fragment_lists
        else:
            d["fragments"] = [f.to_json() for f in self.fragments]
        return json.dumps(d, indent=None, separators=(",", ":"))

    @classmethod
    def from_json_str(cls, s: str, root: str | None = None) -> "Manifest":
        d = json.loads(s)
        if "fragment_lists" in d:
            if root is None:
                raise ValueError(
                    "sharded manifest requires the table root to load")
            fragments, members = _load_shards(root, d["fragment_lists"])
        else:
            fragments = [Fragment.from_json(f) for f in d["fragments"]]
            members = None
        return cls(
            version=d["version"],
            parent=d["parent"],
            kind=d["kind"],
            schema=schema_from_b64(d["schema_b64"]),
            fragments=fragments,
            txn=d["txn"],
            properties=d.get("properties", {}),
            shard_members=members,
        )

    def shard_paths(self) -> set:
        return set(self.shard_members or ())

    def fragment_ids(self) -> set:
        return {f.id for f in self.fragments}

    def total_rows(self) -> int:
        return sum(f.live_rows for f in self.fragments)

    def watermark(self, app_id: str, partition_id: int) -> int:
        """Last committed seq for (app_id, partition); -1 if never seen.

        Port of the reference's committed-offset checkpoint
        (src/kafka/mod.rs:187-231): a replayed batch with
        seq <= watermark is a no-op.
        """
        return int(self.txn.get(app_id, {}).get(str(partition_id), -1))
