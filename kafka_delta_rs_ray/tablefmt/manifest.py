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
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

import pyarrow as pa

from .schema import schema_from_b64, schema_to_b64

MANIFEST_FMT = "v{:012d}.json"


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

    def to_json_str(self) -> str:
        return json.dumps(
            {
                "format_version": 1,
                "version": self.version,
                "parent": self.parent,
                "kind": self.kind,
                "schema_b64": schema_to_b64(self.schema),
                "fragments": [f.to_json() for f in self.fragments],
                "txn": self.txn,
                "properties": self.properties,
            },
            indent=None,
            separators=(",", ":"),
        )

    @classmethod
    def from_json_str(cls, s: str) -> "Manifest":
        d = json.loads(s)
        return cls(
            version=d["version"],
            parent=d["parent"],
            kind=d["kind"],
            schema=schema_from_b64(d["schema_b64"]),
            fragments=[Fragment.from_json(f) for f in d["fragments"]],
            txn=d["txn"],
            properties=d.get("properties", {}),
        )

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
