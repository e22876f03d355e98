"""Arrow schemas and key/ordering contracts for the CDC lake engine.

Reference data model (untyped bytes records keyed by ``(topic, partition,
offset)`` — see /root/reference common/.../RecordReader.java:14-39 and
source/.../S3SourceRecord.java:3-44) is re-expressed as typed Arrow rows:

- lake row    = one transcript turn, keyed by ``(conv_id, turn_idx)``
- change row  = lake row + ``(partition, offset, op)`` provenance, where
  ``partition`` plays the reference's TopicPartition role and ``offset`` the
  dense per-partition Kafka offset (the checkpoint/watermark axis).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

# The base lake table of multi-turn transcripts (BASELINE.json input_hint).
LAKE_FIELDS = [
    pa.field("conv_id", pa.string()),
    pa.field("turn_idx", pa.int32()),
    pa.field("role", pa.string()),
    pa.field("text", pa.string()),
    pa.field("tool", pa.string()),
    pa.field("ts", pa.timestamp("us")),
]
LAKE_SCHEMA = pa.schema(LAKE_FIELDS)

# Change event = provenance + op + payload. ``op`` is one of:
#   "I"/"U" -> upsert the payload at the key (last writer wins by offset)
#   "D"     -> delete the key (payload columns are null)
CHANGE_SCHEMA = pa.schema(
    [
        pa.field("partition", pa.int32()),
        pa.field("offset", pa.int64()),
        pa.field("op", pa.string()),
    ]
    + LAKE_FIELDS
)

# Primary key of the lake and the total-order axis for LWW resolution.
KEY_COLUMNS = ["conv_id", "turn_idx"]
ORDER_COLUMNS = ["conv_id", "turn_idx", "offset"]
PROVENANCE_COLUMNS = ["partition", "offset", "op"]

UPSERT_OPS = ("I", "U")
DELETE_OP = "D"


def payload_columns(schema: pa.Schema) -> list[str]:
    """Columns of a change-event schema that belong to the lake payload
    (everything except provenance). Additive schema evolution shows up here:
    an evolved changelog carries extra payload columns (e.g. ``meta``)."""
    return [n for n in schema.names if n not in PROVENANCE_COLUMNS]


def schema_fingerprint(schema: pa.Schema) -> str:
    """Stable fingerprint of a schema, stored in the checkpoint manifest so
    replay from an old checkpoint can detect/version schema evolution
    (reference analog: the chunk index being the durable metadata sidecar,
    common/.../json/ChunksIndex.java:7-37)."""
    canon = ";".join(f"{f.name}:{f.type}" for f in sorted(schema, key=lambda f: f.name))
    return hashlib.sha256(canon.encode()).hexdigest()[:16]


def unify_with_nulls(tables: list[pa.Table]) -> list[pa.Table]:
    """Arrow additive schema unification: every table gets the union schema,
    missing columns null-filled. Column order follows first-seen order."""
    tables = [t for t in tables if t is not None]
    if not tables:
        return []
    names: list[str] = []
    types: dict[str, pa.DataType] = {}
    for t in tables:
        for f in t.schema:
            if f.name not in types:
                names.append(f.name)
                types[f.name] = f.type
            elif types[f.name] != f.type and pa.types.is_null(types[f.name]):
                types[f.name] = f.type
    target = pa.schema([pa.field(n, types[n]) for n in names])
    out = []
    for t in tables:
        cols = []
        for f in target:
            if f.name in t.column_names:
                col = t.column(f.name)
                if col.type != f.type:
                    col = col.cast(f.type)
            else:
                col = pa.nulls(len(t), f.type)
            cols.append(col)
        out.append(pa.Table.from_arrays(cols, schema=target))
    return out
