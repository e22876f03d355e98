"""Changelog sources.

The engine's native changelog is partitioned Parquet (CHANGE_SCHEMA). This
module adds the *reference-format* source: a block-gzip byte archive exactly
like the one the reference sink writes (offset-named `.gz` files + chunk
indexes + cursors) whose record values carry JSON change events. It decodes
into the engine's Arrow change schema so an archive produced by the byte sink
(or by the original connector) can feed the lake-upsert pipeline directly —
the S5→lake bridge.

Value payload contract (one JSON object per record value):
    {"op": "I|U|D", "conv_id": str, "turn_idx": int, "role": str|null,
     "text": str|null, "tool": str|null, "ts_us": int|null}
Provenance (partition, offset) comes from the archive itself (file name +
positional offsets), exactly as the reference derives it
(source/.../S3SourceRecord.java:3-44).
"""

from __future__ import annotations

import json

import pandas as pd
import pyarrow as pa

import ray.data

from ..schema import CHANGE_SCHEMA
from .archive import read_archive


def encode_change_payload(events: pa.Table) -> pa.Table:
    """Inverse direction (for tests / export): change events -> byte records
    with JSON values, key = conv_id bytes."""
    df = events.to_pandas()
    values = []
    for r in df.itertuples(index=False):
        ts = getattr(r, "ts", None)
        ts_us = None if pd.isna(ts) else int(pd.Timestamp(ts).value // 1000)
        values.append(json.dumps(
            {
                "op": r.op,
                "conv_id": r.conv_id,
                "turn_idx": int(r.turn_idx),
                "role": None if pd.isna(r.role) else r.role,
                "text": None if pd.isna(r.text) else r.text,
                "tool": None if (not hasattr(r, "tool") or pd.isna(r.tool)) else r.tool,
                "ts_us": ts_us,
            },
            sort_keys=True,
        ).encode())
    return pa.table(
        {
            "partition": events.column("partition"),
            "offset": events.column("offset"),
            "key": pa.array([c.encode() for c in df["conv_id"]], pa.binary()),
            "value": pa.array(values, pa.binary()),
            "ts": events.column("ts"),
        }
    )


def _decode_change_batch(batch: pa.Table) -> pa.Table:
    if len(batch) == 0:
        return CHANGE_SCHEMA.empty_table()
    payloads = [json.loads(v) for v in batch.column("value").to_pylist()]
    df = pd.DataFrame(payloads)
    ts = pd.array(
        [None if pd.isna(v) else int(v)
         for v in df.get("ts_us", pd.Series([None] * len(df)))],
        dtype="Int64",
    )
    return pa.Table.from_arrays(
        [
            batch.column("partition").cast(pa.int32()),
            batch.column("offset").cast(pa.int64()),
            pa.array(df["op"], pa.string()),
            pa.array(df["conv_id"], pa.string()),
            pa.array(df["turn_idx"], pa.int32()),
            pa.array(df.get("role"), pa.string()),
            pa.array(df.get("text"), pa.string()),
            pa.array(df.get("tool"), pa.string()),
            pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
        ],
        schema=CHANGE_SCHEMA,
    )


def changelog_from_archive(
    archive_dir: str,
    topic: str | None = None,
    fmt_name: str = "binary",
    fmt_config: dict | None = None,
    layout_name: str = "grouped_by_date",
    resume_offsets: dict[int, int] | None = None,
) -> "ray.data.Dataset":
    """Read a reference-style block-gzip archive as a change-event Dataset
    (CHANGE_SCHEMA). Consumed-file skipping and per-partition resume come from
    the archive reader (D1/S7); JSON payload decode is an import-edge stage."""
    records = read_archive(
        archive_dir, fmt_name=fmt_name, fmt_config=fmt_config,
        layout_name=layout_name, topic=topic, resume_offsets=resume_offsets,
    )
    return records.map_batches(_decode_change_batch, batch_format="pyarrow")
