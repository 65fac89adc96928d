"""Input sources.

The reference's source surface is a Kafka multi-topic consumer feeding
a schema-projected parser (S1/P1, src/kafka/mod.rs:113-253). Our
engine consumes bounded inputs: a committed table snapshot, and staged
changeset files (the "topic" analog — each maintenance run consumes a
bounded changeset instead of a stream; partition_id/seq carry the
topic-partition/offset coordinates).

``read_changeset`` is schema-FIRST like the reference's parser
(src/utils/mod.rs:139-151): the expected schema drives projection —
extra columns are silently dropped (projection), missing required
columns raise (the reference errors on missing fields), and castable
types are cast.
"""

from __future__ import annotations

import pyarrow as pa

from ..errors import ValidationError
from ..tablefmt.catalog import Table
from ..tablefmt.schema import CHANGESET_SCHEMA


def read_snapshot(root: str, version: int | None = None, columns=None,
                  prune: dict | None = None):
    """Open a table and scan one snapshot as a Dataset."""
    return Table(root).snapshot(version).dataset(columns=columns, prune=prune)


def _project_to_schema(batch: pa.Table, schema: pa.Schema) -> pa.Table:
    cols = []
    for f in schema:
        if f.name not in batch.column_names:
            raise ValidationError(f"changeset missing required column "
                                  f"{f.name!r} (schema-first parse)")
        col = batch[f.name]
        if col.type != f.type:
            try:
                col = col.cast(f.type)
            except pa.ArrowInvalid as e:
                raise ValidationError(
                    f"column {f.name!r}: cannot cast {col.type} → {f.type}: {e}"
                ) from None
        cols.append(col)
    return pa.Table.from_arrays(cols, schema=schema)


def read_changeset(paths, schema: pa.Schema = CHANGESET_SCHEMA):
    """Staged changeset parquet → Dataset projected to the changeset
    schema (drop extras, cast, error on missing)."""
    import ray.data as rd

    ds = rd.read_parquet(paths)
    return ds.map_batches(lambda b: _project_to_schema(b, schema),
                          batch_format="pyarrow")
