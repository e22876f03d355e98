"""Semi-structured extraction: pull typed fields out of a JSON string column.

The reference ships JSON record converters that deserialize whole Kafka
record payloads (source/.../BytesRecordReader.java via the format registry;
common/ JSON converters) — this is the columnar counterpart: a `props`-style
JSON column inside an otherwise-columnar table, extracted WITHOUT a per-row
``json.loads`` loop. Each batch's strings are newline-framed into one buffer
and handed to pyarrow's C++ JSON reader (``pyarrow.json.read_json``) with an
explicit schema, so the parse is one vectorized native pass and the output
types are stable regardless of batch content (an all-null batch still yields
typed columns).

Scale notes: per-batch work is O(bytes); nothing crosses the shuffle; use
inside ``map_batches(batch_format="pyarrow")``. Callers aggregate the
extracted fields with per-batch combiners as usual.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.json as pj

__all__ = ["json_extract"]


def json_extract(batch: pa.Table, col: str, fields: dict[str, pa.DataType],
                 drop: bool = False) -> pa.Table:
    """Append one typed column per entry of ``fields`` (top-level JSON keys)
    extracted from the JSON strings in ``batch[col]``.

    NULL rows and rows missing a key yield NULL in the extracted columns
    (SQL ``json_extract`` semantics). ``drop=True`` removes the source
    column. Raises ValueError when a row is not a single JSON object
    (framing depends on one-object-per-line; standard serializers never
    emit raw newlines inside a JSON string, and a mismatch is detected by
    row count rather than silently misaligned)."""
    existing = set(batch.column_names) - ({col} if drop else set())
    clash = [n for n in fields if n in existing]
    if clash:
        raise ValueError(f"json_extract: output fields {clash} collide with "
                         f"existing columns; rename or drop them first")
    s = pc.fill_null(pc.cast(batch.column(col), pa.string()), "{}")
    schema = pa.schema(list(fields.items()))
    if len(batch) == 0:
        out = batch.drop_columns([col]) if drop else batch
        for name, typ in fields.items():
            out = out.append_column(name, pa.array([], typ))
        return out
    # a whitespace-only cell would frame to ZERO lines (the reader skips
    # blanks), which could cancel against a multi-object cell and defeat the
    # row-count alignment check below — reject it as the malformed JSON it is
    blank = pc.and_(pc.is_valid(batch.column(col)),
                    pc.equal(pc.utf8_trim_whitespace(s), ""))
    if pc.any(blank).as_py():
        raise ValueError(f"json_extract: column {col!r} holds empty/"
                         f"whitespace-only strings — not valid JSON objects")
    payload = "\n".join(s.to_pylist()).encode("utf-8")
    try:
        parsed = pj.read_json(
            pa.BufferReader(payload),
            parse_options=pj.ParseOptions(
                explicit_schema=schema, unexpected_field_behavior="ignore"))
    except pa.ArrowInvalid as e:
        raise ValueError(f"json_extract: column {col!r} holds malformed "
                         f"JSON: {e}") from None
    if len(parsed) != len(batch):
        raise ValueError(
            f"json_extract: column {col!r} framed to {len(parsed)} JSON "
            f"objects for {len(batch)} rows — a value concatenates several "
            f"objects or is not a single object")
    out = batch.drop_columns([col]) if drop else batch
    for name in fields:
        out = out.append_column(name, parsed.column(name))
    return out
