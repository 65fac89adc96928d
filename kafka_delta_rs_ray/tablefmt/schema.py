"""Canonical schemas.

The primary table schema comes verbatim from BASELINE.json input_hint:
(image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
caption:string, phash:int64). ``bytes`` is large_binary in blocks so a
single Arrow buffer can exceed 2 GiB at scale.

The changeset schema adds the reference's stream coordinates
(reference src/model/mod.rs:7-11: offset → seq, topic partition →
partition_id) plus an op column for MERGE.
"""

import pyarrow as pa

IMAGE_SCHEMA = pa.schema(
    [
        pa.field("image_id", pa.string()),
        pa.field("bytes", pa.large_binary()),
        pa.field("w", pa.int32()),
        pa.field("h", pa.int32()),
        pa.field("fmt", pa.string()),
        pa.field("caption", pa.string()),
        pa.field("phash", pa.int64()),
    ]
)

CHANGESET_EXTRA = [
    pa.field("partition_id", pa.int32()),
    pa.field("seq", pa.int64()),
    pa.field("op", pa.string()),  # "upsert" | "delete"
]

CHANGESET_SCHEMA = pa.schema(list(IMAGE_SCHEMA) + CHANGESET_EXTRA)

QUARANTINE_EXTRA = [pa.field("error", pa.string())]


def merge_schemas(base: pa.Schema, incoming: pa.Schema) -> pa.Schema:
    """Union of two schemas, reference W2 parity (``Upsert`` →
    ``WriteMode::MergeSchema``, src/pipeline/mod.rs:224-227): fields
    shared by name must have identical types; fields only in
    ``incoming`` are appended as nullable columns."""
    from ..errors import ValidationError

    fields = list(base)
    for f in incoming:
        try:
            existing = base.field(f.name)
        except KeyError:
            fields.append(f.with_nullable(True))
            continue
        if existing.type != f.type:
            raise ValidationError(
                f"schema mismatch for column {f.name!r}: table has "
                f"{existing.type}, incoming has {f.type}")
    return pa.schema(fields)


def validate_subset(base: pa.Schema, incoming: pa.Schema) -> None:
    """Default write mode (reference ``Insert`` → ``WriteMode::Default``):
    every incoming field must already exist in the table schema with the
    same type."""
    from ..errors import ValidationError

    for f in incoming:
        try:
            existing = base.field(f.name)
        except KeyError:
            raise ValidationError(
                f"column {f.name!r} not in table schema; use "
                f"mode='merge_schema' to evolve") from None
        if existing.type != f.type:
            raise ValidationError(
                f"schema mismatch for column {f.name!r}: table has "
                f"{existing.type}, incoming has {f.type}")


def conform_table(tbl: pa.Table, schema: pa.Schema) -> pa.Table:
    """Conform a fragment's table to the (possibly evolved) manifest
    schema: add missing columns as nulls, order columns canonically.
    No-op (same object) when the schemas already match."""
    if tbl.schema == schema:
        return tbl
    cols = []
    for f in schema:
        if f.name in tbl.column_names:
            cols.append(tbl[f.name].cast(f.type))
        else:
            cols.append(pa.nulls(tbl.num_rows, f.type))
    return pa.Table.from_arrays(cols, schema=schema)


def schema_to_b64(schema: pa.Schema) -> str:
    import base64

    return base64.b64encode(schema.serialize().to_pybytes()).decode("ascii")


def schema_from_b64(s: str) -> pa.Schema:
    import base64

    return pa.ipc.read_schema(pa.BufferReader(base64.b64decode(s)))
