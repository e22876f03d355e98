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

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..schema import CHANGE_SCHEMA
from .archive import read_archive


_CONTRACT_KEYS = ("op", "conv_id", "turn_idx", "role", "text", "tool", "ts")
_PROVENANCE = ("partition", "offset")


def encode_change_payload(events: pa.Table) -> pa.Table:
    """Inverse direction (for tests / export): change events -> byte records
    with JSON values, key = conv_id bytes. Payload columns beyond the fixed
    contract (additive schema evolution, e.g. ``meta``) are serialized too —
    the archive bridge must not silently drop evolved columns."""
    df = events.to_pandas()
    extra_cols = [c for c in df.columns
                  if c not in _CONTRACT_KEYS and c not in _PROVENANCE]
    # positional column lists, NOT itertuples attribute access — pandas
    # renames non-identifier column names (e.g. 'user-id') to _N in the
    # namedtuple, which would crash the evolved-column export
    extra_series = {c: df[c].tolist() for c in extra_cols}
    values = []
    for i, r in enumerate(df.itertuples(index=False)):
        ts = getattr(r, "ts", None)
        ts_us = None if pd.isna(ts) else int(pd.Timestamp(ts).value // 1000)
        obj = {
            "op": r.op,
            "conv_id": r.conv_id,
            "turn_idx": int(r.turn_idx),
            "role": None if pd.isna(r.role) else r.role,
            "text": None if pd.isna(r.text) else r.text,
            "tool": None if (not hasattr(r, "tool") or pd.isna(r.tool)) else r.tool,
            "ts_us": ts_us,
        }
        for c in extra_cols:
            v = extra_series[c][i]
            try:  # pd.isna covers None/NaN/NaT/pd.NA; raises on array-likes
                null = bool(pd.isna(v))
            except (TypeError, ValueError):
                null = False
            obj[c] = None if null else v
        values.append(json.dumps(obj, sort_keys=True, default=str).encode())
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

    def opt(col: str) -> pd.Series:
        # third-party archives may OMIT optional keys entirely (not just null
        # them) — pa.array(None) raises, so fall back to a null-filled series
        s = df.get(col)
        return s if s is not None else pd.Series([None] * len(df), dtype=object)

    ts = pd.array(
        [None if pd.isna(v) else int(v) for v in opt("ts_us")],
        dtype="Int64",
    )
    out = pa.Table.from_arrays(
        [
            batch.column("partition").cast(pa.int32()),
            batch.column("offset").cast(pa.int64()),
            pa.array(df["op"], pa.string()),
            pa.array(df["conv_id"], pa.string()),
            pa.array(df["turn_idx"], pa.int32()),
            pa.array(opt("role"), pa.string()),
            pa.array(opt("text"), pa.string()),
            pa.array(opt("tool"), pa.string()),
            pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
        ],
        schema=CHANGE_SCHEMA,
    )
    # evolved payload keys beyond the fixed contract ride along as extra
    # columns (the merge handles additive evolution via schema unification)
    known = set(CHANGE_SCHEMA.names) | {"ts_us"}
    for c in df.columns:
        if c not in known:
            out = out.append_column(c, pa.array(df[c]))
    return out


def export_lake_to_archive(
    manifest,
    out_dir: str,
    topic: str = "lake_export",
    fmt=None,
    date: str = "1970-01-01",
    num_partitions: int | None = None,
    **archive_kw,
) -> list[dict]:
    """Inverse bridge: snapshot the CURRENT lake into a reference-format
    block-gzip archive (JSON values framed by the byte codec, offset-named
    files + chunk indexes + cursors) that the original connector's source —
    or ``changelog_from_archive`` — can replay. Every row exports as an "I"
    event with positional per-partition offsets."""
    from ..stages.partitioner import assign_partitions
    from ..state.manifest import Manifest
    from .archive import archive_records
    from ..pipelines.upsert import read_lake

    if isinstance(manifest, str):
        manifest = Manifest.load(manifest)
    P = num_partitions or manifest.num_partitions or 16
    ds = read_lake(manifest)

    def to_events(batch: pa.Table) -> pa.Table:
        n = len(batch)
        part = assign_partitions(
            batch.column("conv_id").to_numpy(zero_copy_only=False), P
        )
        cols = {
            "partition": pa.array(part, pa.int32()),
            "offset": pa.array([0] * n, pa.int64()),  # assigned per partition below
            "op": pa.array(["I"] * n, pa.string()),
        }
        for name in batch.column_names:
            cols[name] = batch.column(name)
        return pa.table(cols)

    def assign_offsets(g: pa.Table) -> pa.Table:
        import numpy as np

        g = g.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
        return g.set_column(
            g.schema.get_field_index("offset"), "offset",
            pa.array(np.arange(len(g), dtype=np.int64)),
        )

    events = (
        ds.map_batches(to_events, batch_format="pyarrow")
        .groupby("partition")
        .map_groups(assign_offsets, batch_format="pyarrow")
    )
    records = events.map_batches(encode_change_payload, batch_format="pyarrow")
    return archive_records(records, out_dir, topic=topic, fmt=fmt, date=date,
                           **archive_kw)


def changelog_from_archive(
    archive_dir: str,
    topic: str | None = None,
    fmt_name: str = "binary",
    fmt_config: dict | None = None,
    layout_name: str = "grouped_by_date",
    resume_offsets: dict[int, int] | None = None,
    start_marker: str | None = None,
) -> "ray.data.Dataset":
    """Read a reference-style block-gzip archive as a change-event Dataset
    (CHANGE_SCHEMA). Consumed-file skipping and per-partition resume come from
    the archive reader (D1/S7); ``start_marker`` is the s3.start.marker
    partial-replay knob (strictly-after file listing, see read_archive);
    JSON payload decode is an import-edge stage.

    A MULTI-topic archive must be read one topic at a time: CHANGE_SCHEMA
    keeps only (partition, offset) provenance, so two topics' streams would
    collide on identical keys and interleave nondeterministically — detected
    from the file layout before any byte is read."""
    if topic is None:
        import glob as _glob
        import os as _os

        from .archive import _rel_key
        from .layout import get_layout

        layout = get_layout(layout_name)
        topics = set()
        for path in _glob.glob(_os.path.join(archive_dir, "**", "*.gz"),
                               recursive=True):
            meta = layout.parse(_rel_key(path, archive_dir))
            if meta is not None:
                topics.add(meta.topic)
        if len(topics) > 1:
            raise ValueError(
                f"archive contains multiple topics {sorted(topics)} — pass "
                "topic=<one of them>; (partition, offset) provenance is only "
                "unique within a topic"
            )
    records = read_archive(
        archive_dir, fmt_name=fmt_name, fmt_config=fmt_config,
        layout_name=layout_name, topic=topic, resume_offsets=resume_offsets,
        start_marker=start_marker,
    )
    return records.map_batches(_decode_change_batch, batch_format="pyarrow")
