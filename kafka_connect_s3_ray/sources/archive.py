"""Byte-record archive sink + source over block-gzip files — the reference's
original workload (Kafka topic -> S3 archive -> replay), Ray-Data-native.

Sink side (reference S3SinkTask.put -> BlockGZIPFileWriter -> S3Writer.putChunk,
sink/.../S3SinkTask.java:152-183, S3Writer.java:47-67): a Dataset of
``(partition, offset, key, value)`` byte records is grouped by partition
(``groupby`` = the groupingBy(TopicPartition) shuffle, S3SinkTask.java:153-155);
each group is sorted by offset and written as block-gzip files named by a
Layout with zero-padded start offsets — idempotent, deterministic commits.

Source side (S3FilesReader.readAll, source/.../S3FilesReader.java:108-220):
list files lexicographically, apply partition/topic filters and
already-consumed-file skipping against a checkpoint offsets map, then decode
each file in parallel via ``read_binary_files`` + a vectorized-as-possible
codec stage, assign offsets by position (RecordReader ``offset++``,
common/.../RecordReader.java:22-61), drop records at or below the per-partition
resume offset (the ranged-GET + skip loop of S3FilesReader.java:244-311
replaced by a filter), and optionally drop records whose key contains a
blacklisted substring (message.key.exclude.list, S3FilesReader.java:344-384).
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .blockgzip import BlockGzipWriter, ChunksIndex, read_bytes_multimember
from .codecs import ByteLengthCodec, get_format
from .layout import BlockMetadata, GroupedByDateLayout, Layout

ARCHIVE_SCHEMA = pa.schema(
    [
        ("topic", pa.string()),
        ("partition", pa.int32()),
        ("offset", pa.int64()),
        ("key", pa.binary()),
        ("value", pa.binary()),
    ]
)


def archive_records(
    ds: "ray.data.Dataset",
    out_dir: str,
    topic: str,
    fmt=None,
    layout: Layout | None = None,
    date: str = "1970-01-01",
    chunk_threshold: int = 64 * 1024 * 1024,
) -> list[dict]:
    """Archive a Dataset of byte records into block-gzip files, one group of
    files per partition. Returns per-file commit stats. The date is explicit
    (never wall-clock; see sources/layout.py docstring)."""
    fmt = fmt or ByteLengthCodec()
    layout = layout or GroupedByDateLayout()

    def write_partition(group: pa.Table) -> pa.Table:
        group = group.sort_by([("offset", "ascending")])
        p = int(group.column("partition")[0].as_py())
        start = int(group.column("offset")[0].as_py())
        meta = BlockMetadata(topic=topic, partition=p, start_offset=start, date=date)
        rel = layout.build(meta, suffix=".gz")
        path = os.path.join(out_dir, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        w = BlockGzipWriter(path, start_offset=start, chunk_threshold=chunk_threshold)
        keys = group.column("key").to_pylist()
        values = group.column("value").to_pylist()
        # encode in bounded slices so one gzip member never buffers the whole
        # partition uncompressed
        step = 8192
        for i in range(0, len(values), step):
            w.write(fmt.encode(keys[i : i + step], values[i : i + step]),
                    record_count=len(values[i : i + step]))
        index = w.close()
        return pa.table(
            {
                "partition": pa.array([p], pa.int32()),
                "path": [path],
                "num_records": pa.array([len(group)], pa.int64()),
                "last_offset": pa.array([index.last_offset()], pa.int64()),
                "num_chunks": pa.array([len(index.chunks)], pa.int64()),
            }
        )

    stats = ds.groupby("partition").map_groups(write_partition, batch_format="pyarrow")
    return stats.take_all()


class _DecodeBlocks:
    """map_batches stage over ``read_binary_files(include_paths=True)`` rows:
    gunzip (the pluggable InputFilter.GUNZIP, source/.../S3FilesReader.java:222-225),
    frame-decode, assign positional offsets from the filename's start offset."""

    def __init__(self, fmt_name: str, fmt_config: dict, layout_name: str,
                 resume: dict[int, int]):
        from .layout import get_layout

        self.fmt = get_format(fmt_name, **fmt_config)
        self.layout = get_layout(layout_name)
        self.resume = resume or {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for path, data in zip(batch.column("path").to_pylist(),
                              batch.column("bytes").to_pylist()):
            meta = self.layout.parse(_rel_key(path))
            if meta is None:
                continue
            raw = read_bytes_multimember(data)
            tbl = self.fmt.decode(raw, start_offset=meta.start_offset)
            tbl = tbl.add_column(0, "partition",
                                 pa.array([meta.partition] * len(tbl), pa.int32()))
            tbl = tbl.add_column(0, "topic", pa.array([meta.topic] * len(tbl)))
            wm = self.resume.get(meta.partition)
            if wm is not None:
                tbl = tbl.filter(pc.greater(tbl.column("offset"), wm))
            out.append(tbl)
        if not out:
            return ARCHIVE_SCHEMA.empty_table()
        return pa.concat_tables(out)


def _rel_key(path: str) -> str:
    # layout keys are the last two path components (prefix/file)
    parts = path.replace("\\", "/").split("/")
    return "/".join(parts[-2:])


def read_archive(
    archive_dir: str,
    fmt_name: str = "binary",
    fmt_config: dict | None = None,
    layout_name: str = "grouped_by_date",
    topic: str | None = None,
    partitions: set[int] | None = None,
    resume_offsets: dict[int, int] | None = None,
    exclude_key_substrings: list[str] | None = None,
    target_topic: dict[str, str] | None = None,
) -> "ray.data.Dataset":
    """Replay an archive directory as a Dataset of byte records.

    File-level pruning happens before any byte is read: lexicographic listing
    (= offset order, O1), topic/partition predicate (M10), and skipping files
    whose *entire* offset range is consumed per the index sidecar (D1,
    source/.../S3FilesReader.java:177-184). Record-level residual filtering,
    key-exclude (M9) and topic remap (M11) run vectorized in the decode stage.
    """
    from .layout import get_layout

    layout = get_layout(layout_name)
    resume_offsets = dict(resume_offsets or {})
    files = []
    for path in sorted(glob.glob(os.path.join(archive_dir, "**", "*.gz"), recursive=True)):
        meta = layout.parse(_rel_key(path))
        if meta is None:
            continue
        if topic is not None and meta.topic != topic:
            continue
        if partitions is not None and meta.partition not in partitions:
            continue
        wm = resume_offsets.get(meta.partition)
        if wm is not None:
            idx_path = path + ".index.json"
            if os.path.exists(idx_path):
                index = ChunksIndex.from_json(open(idx_path).read())
                if index.last_offset() - 1 <= wm:
                    continue  # fully consumed file — skip without reading data
        files.append(path)
    if not files:
        return ray.data.from_arrow(ARCHIVE_SCHEMA.empty_table())

    # compression=None: Ray/Arrow would otherwise auto-gunzip by extension; the
    # explicit gunzip lives in the decode stage (pluggable InputFilter, U7).
    ds = ray.data.read_binary_files(
        files, include_paths=True, arrow_open_stream_args={"compression": None}
    )
    ds = ds.map_batches(
        _DecodeBlocks(fmt_name, fmt_config or {}, layout_name, resume_offsets),
        batch_format="pyarrow",
    )
    if exclude_key_substrings:
        pats = list(exclude_key_substrings)

        def exclude(t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return t
            keys = pc.cast(t.column("key"), pa.string())
            drop = None
            for p in pats:
                m = pc.fill_null(pc.match_substring(keys, p), False)
                drop = m if drop is None else pc.or_(drop, m)
            return t.filter(pc.invert(drop))

        ds = ds.map_batches(exclude, batch_format="pyarrow")
    if target_topic:
        remap = dict(target_topic)

        def rename(t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return t
            topics = t.column("topic").to_pylist()
            new = pa.array([remap.get(x, x) for x in topics])
            return t.set_column(t.schema.get_field_index("topic"), "topic", new)

        ds = ds.map_batches(rename, batch_format="pyarrow")
    return ds
