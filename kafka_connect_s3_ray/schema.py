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


def _promote(a: pa.DataType, b: pa.DataType) -> pa.DataType:
    """Type promotion for conflicting column types: null yields to anything;
    numeric conflicts widen (int32+int64 -> int64, int+float -> float64)
    instead of first-seen-wins, which would downcast a WIDENED evolved column
    back to the lake's old type and overflow at merge time. Non-promotable
    conflicts raise rather than corrupt."""
    if a == b:
        return a
    if pa.types.is_null(a):
        return b
    if pa.types.is_null(b):
        return a
    numeric = (pa.types.is_integer, pa.types.is_floating)
    if any(p(a) for p in numeric) and any(p(b) for p in numeric):
        if pa.types.is_floating(a) or pa.types.is_floating(b):
            return pa.float64()
        wider = a if a.bit_width >= b.bit_width else b
        if pa.types.is_signed_integer(a) != pa.types.is_signed_integer(b):
            return pa.int64()  # mixed signedness: pragmatic common type
        return wider
    raise ValueError(f"cannot unify column types {a} and {b}")


def project_to_schema(t: pa.Table, target: pa.Schema) -> pa.Table:
    """Project a table onto ``target``: present columns cast, missing columns
    null-filled — THE cast/fill rule, shared by schema unification and the
    commit-time alignment so the two can never diverge."""
    cols = []
    for f in target:
        if f.name in t.column_names:
            col = t.column(f.name)
            if col.type != f.type:
                col = col.cast(f.type)
        else:
            col = pa.nulls(len(t), f.type)
        cols.append(col)
    return pa.Table.from_arrays(cols, schema=target)


def unify_with_nulls(tables: list[pa.Table]) -> list[pa.Table]:
    """Arrow additive schema unification: every table gets the union schema,
    missing columns null-filled, conflicting numeric types WIDENED (see
    ``_promote``). Column order follows first-seen order."""
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
            else:
                types[f.name] = _promote(types[f.name], f.type)
    target = pa.schema([pa.field(n, types[n]) for n in names])
    return [project_to_schema(t, target) for t in tables]
