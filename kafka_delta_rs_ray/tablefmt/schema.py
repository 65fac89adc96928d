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


def schema_to_b64(schema: pa.Schema) -> str:
    import base64

    return base64.b64encode(schema.serialize().to_pybytes()).decode("ascii")


def schema_from_b64(s: str) -> pa.Schema:
    import base64

    return pa.ipc.read_schema(pa.BufferReader(base64.b64decode(s)))
