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

from .blockgzip import (BlockGzipWriter, ChunksIndex, index_path_for,
                        read_bytes_multimember)
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


def cursor_key(topic: str, partition: int) -> str:
    """Per-partition cursor object name (sink/.../S3Writer.java:66)."""
    return f"last_chunk_index.{topic}-{partition:05d}.txt"


def archive_records(
    ds: "ray.data.Dataset",
    out_dir: str,
    topic: str,
    fmt=None,
    layout: Layout | None = None,
    date: str = "1970-01-01",
    chunk_threshold: int = 64 * 1024 * 1024,
    file_threshold: int | None = None,
    flush_interval_us: int | None = None,
    ts_col: str = "ts",
) -> list[dict]:
    """Archive a Dataset of byte records into block-gzip files per partition.

    Flush/rotation policy parity with the sink (sink/.../S3SinkTask.java):
    - chunk rotation at ``chunk_threshold`` uncompressed bytes (W1,
      ``compressed_block_size`` default 64 MiB, S3SinkTask.java:47)
    - new FILE once the current file's raw bytes pass ``file_threshold`` (W2,
      ``compressed_file_size``, S3SinkTask.java:177-180) — flush AFTER the
      triggering record
    - new file BEFORE a record whose ``ts`` is >= ``flush_interval_us`` past
      the file's first record (W3, event-time tumbling flush,
      S3SinkTask.java:169-173,308-317) — the triggering record opens the next
      file

    Commit order per file: data -> index -> cursor, strictly (S3,
    sink/.../S3Writer.java:47-67): a crash can never leave the cursor ahead of
    data. The per-partition cursor names the newest index file; offset
    recovery reads it back (``fetch_next_offset``). The date is explicit —
    never wall-clock (see sources/layout.py)."""
    fmt = fmt or ByteLengthCodec()
    layout = layout or GroupedByDateLayout()

    def write_partition(group: pa.Table) -> pa.Table:
        group = group.sort_by([("offset", "ascending")])
        p = int(group.column("partition")[0].as_py())
        offs = group.column("offset").to_numpy(zero_copy_only=False)
        if len(offs) > 1 and (offs[1:] != offs[:-1] + 1).any():
            # the chunk index encodes offsets as first_record_offset + position
            # (reference: offset++ while reading + first+num recovery math);
            # non-dense input offsets would silently desync replay offsets and
            # resume watermarks from the input's own numbering
            raise ValueError(
                f"partition {p}: archive offsets must be dense "
                "(offset[i+1] == offset[i] + 1) — renumber (e.g. by position) "
                "before archiving, as the block-gzip format cannot represent gaps"
            )
        keys = group.column("key").to_pylist()
        values = group.column("value").to_pylist()
        offsets = group.column("offset").to_pylist()
        ts = (
            group.column(ts_col).cast(pa.int64()).to_pylist()  # epoch micros
            if flush_interval_us and ts_col in group.column_names
            else [None] * len(group)
        )

        out_rows: list[dict] = []
        w = None
        raw_bytes = 0
        first_ts = None

        def open_file(start_offset: int):
            meta = BlockMetadata(topic=topic, partition=p,
                                 start_offset=start_offset, date=date)
            path = os.path.join(out_dir, layout.build(meta, suffix=".gz"))
            os.makedirs(os.path.dirname(path), exist_ok=True)
            return BlockGzipWriter(path, start_offset=start_offset,
                                   chunk_threshold=chunk_threshold)

        def close_file(writer):
            index = writer.close()  # data file renamed, then index written
            first_off = index.chunks[0].first_record_offset if index.chunks else 0
            # cursor LAST: points at the newest index file
            cur = os.path.join(out_dir, cursor_key(topic, p))
            tmp = cur + ".tmp"
            with open(tmp, "w") as f:
                f.write(os.path.relpath(writer.index_path, out_dir))
            os.replace(tmp, cur)
            out_rows.append(
                {
                    "partition": p,
                    "path": writer.path,
                    "num_records": index.last_offset() - first_off,
                    "last_offset": index.last_offset(),
                    "num_chunks": len(index.chunks),
                }
            )

        if not file_threshold and not flush_interval_us:
            # fast path: one file, batch-encoded in slices bounded BY BYTES
            # (a fixed record count would let large records blow past the
            # chunk threshold in one indivisible write) and by record count
            import numpy as np

            sizes = np.array([len(k or b"") + len(v or b"") + 16
                              for k, v in zip(keys, values)], dtype=np.int64)
            budget = max(1, min(chunk_threshold, 8 * 1024 * 1024))
            w = open_file(int(offsets[0]))
            i = 0
            while i < len(values):
                j = i + 1
                acc = sizes[i]
                while j < len(values) and j - i < 8192 and acc + sizes[j] <= budget:
                    acc += sizes[j]
                    j += 1
                w.write(fmt.encode(keys[i:j], values[i:j]), record_count=j - i)
                i = j
            close_file(w)
            return pa.table(
                {
                    "partition": pa.array([p], pa.int32()),
                    "path": pa.array([out_rows[0]["path"]]),
                    "num_records": pa.array([len(group)], pa.int64()),
                    "last_offset": pa.array([out_rows[0]["last_offset"]], pa.int64()),
                    "num_chunks": pa.array([out_rows[0]["num_chunks"]], pa.int64()),
                }
            )

        for k, v, off, tv in zip(keys, values, offsets, ts):
            if w is not None and flush_interval_us and tv is not None \
                    and first_ts is not None and tv - first_ts >= flush_interval_us:
                close_file(w)  # W3: the triggering record goes to the NEXT file
                w, raw_bytes, first_ts = None, 0, None
            if w is None:
                w = open_file(off)
                first_ts = tv
            if first_ts is None and tv is not None:
                first_ts = tv  # a leading null ts must not disable W3
            framed = fmt.encode([k], [v])
            w.write(framed)
            raw_bytes += len(framed)
            if file_threshold and raw_bytes >= file_threshold:
                close_file(w)  # W2: flush AFTER the triggering record
                w, raw_bytes, first_ts = None, 0, None
        if w is not None:
            close_file(w)

        return pa.table(
            {
                "partition": pa.array([r["partition"] for r in out_rows], pa.int32()),
                "path": pa.array([r["path"] for r in out_rows]),
                "num_records": pa.array([r["num_records"] for r in out_rows], pa.int64()),
                "last_offset": pa.array([r["last_offset"] for r in out_rows], pa.int64()),
                "num_chunks": pa.array([r["num_chunks"] for r in out_rows], pa.int64()),
            }
        )

    stats = ds.groupby("partition").map_groups(write_partition, batch_format="pyarrow")
    return stats.take_all()


def fetch_next_offset(archive_dir: str, topic: str, partition: int) -> int:
    """Sink-side offset recovery (S4): cursor -> newest index -> next offset =
    last chunk\'s ``first_record_offset + num_records``
    (sink/.../S3Writer.java:69-96). Returns 0 with no cursor (the
    NoSuchKeyException cold-start path, S3Writer.java:76-78)."""
    cur = os.path.join(archive_dir, cursor_key(topic, partition))
    if not os.path.exists(cur):
        return 0
    index_rel = open(cur).read().strip()
    index = ChunksIndex.from_json(open(os.path.join(archive_dir, index_rel)).read())
    return index.last_offset()


class _DecodeBlocks:
    """map_batches stage over ``read_binary_files(include_paths=True)`` rows:
    gunzip (the pluggable InputFilter.GUNZIP, source/.../S3FilesReader.java:222-225),
    frame-decode, assign positional offsets from the filename's start offset.

    Corrupt-record policy (reference: hard DataException,
    common/.../BytesRecordReader.java:30-93): ``on_corrupt='raise'`` mirrors it;
    ``'quarantine'`` keeps the file's decodable prefix, drops a JSON quarantine
    record naming (file, first bad offset), and streaming continues — the
    dead-letter path a 100 TB replay needs instead of dying on one bad byte."""

    def __init__(self, fmt_name: str, fmt_config: dict, layout_name: str,
                 resume: dict[int, int], root: str, on_corrupt: str = "raise",
                 quarantine_dir: str | None = None):
        from .layout import get_layout

        self.fmt = get_format(fmt_name, **fmt_config)
        self.layout = get_layout(layout_name)
        self.root = root
        self.resume = resume or {}
        self.on_corrupt = on_corrupt
        self.quarantine_dir = quarantine_dir

    def _decode(self, data: bytes, meta, path: str) -> pa.Table:
        import zlib

        from .codecs import CorruptRecordError

        try:
            # gunzip INSIDE the policy: gzip-layer damage (truncated member,
            # inter-member garbage -> zlib.error) is corruption like any
            # frame-level damage and must hit the same raise/quarantine fork
            raw = read_bytes_multimember(data)
            return self.fmt.decode(raw, start_offset=meta.start_offset)
        except (CorruptRecordError, zlib.error) as e:
            if self.on_corrupt != "quarantine":
                raise
            raw = read_bytes_multimember(data, strict=False)  # salvage prefix
            ok, _err = self.fmt.decode_prefix(raw, start_offset=meta.start_offset)
            if self.quarantine_dir:
                import json as _json

                os.makedirs(self.quarantine_dir, exist_ok=True)
                qpath = os.path.join(
                    self.quarantine_dir,
                    os.path.basename(path) + ".quarantine.json",
                )
                with open(qpath, "w") as f:
                    _json.dump(
                        {"file": path, "error": str(e),
                         "decoded_records": len(ok),
                         "first_bad_offset": meta.start_offset + len(ok)}, f,
                    )
            return ok

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for path, data in zip(batch.column("path").to_pylist(),
                              batch.column("bytes").to_pylist()):
            meta = self.layout.parse(_rel_key(path, self.root))
            if meta is None:
                continue
            tbl = self._decode(data, meta, path)
            tbl = tbl.add_column(0, "partition",
                                 pa.array([meta.partition] * len(tbl), pa.int32()))
            tbl = tbl.add_column(0, "topic",
                                 pa.array([meta.topic] * len(tbl), pa.string()))
            wm = self.resume.get((meta.topic, meta.partition),
                                 self.resume.get(meta.partition))
            if wm is not None:
                tbl = tbl.filter(pc.greater(tbl.column("offset"), wm))
            out.append(tbl)
        if not out:
            return ARCHIVE_SCHEMA.empty_table()
        return pa.concat_tables(out)


def _rel_key(path: str, root: str) -> str:
    """Layout key = the path relative to the archive root (layouts may have
    2 components (grouped_by_date) or 3 (grouped_by_topic))."""
    rel = os.path.relpath(path, root)
    return rel.replace("\\", "/")


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
    on_corrupt: str = "raise",
    quarantine_dir: str | None = None,
    start_marker: str | None = None,
) -> "ray.data.Dataset":
    """Replay an archive directory as a Dataset of byte records.

    File-level pruning happens before any byte is read: lexicographic listing
    (= offset order, O1), topic/partition predicate (M10), and skipping files
    whose *entire* offset range is consumed per the index sidecar (D1,
    source/.../S3FilesReader.java:177-184). Record-level residual filtering,
    key-exclude (M9) and topic remap (M11) run vectorized in the decode stage.

    ``start_marker`` is the reference's ``s3.start.marker`` partial-replay
    knob (source/.../S3SourceConfig.java:9, S3FilesReader.java:131,153:
    ``listObjectsV2 startAfter``): listing begins strictly AFTER this
    archive-relative key, so files at or lexicographically before the marker
    are skipped before any byte is read. Because file names sort in offset
    order within a partition, pointing it at a data-file key replays only
    later files — an ad-hoc coarse resume that composes with (and is cheaper
    than) ``resume_offsets``.

    ``resume_offsets`` keys are ``(topic, partition)`` tuples (the reference's
    S3Partition identity, source/.../S3Partition.java:7-82); bare ``int``
    partition keys are accepted only when a single ``topic`` filter is given —
    in a multi-topic archive they would bleed one topic's checkpoint into
    another's.
    """
    from .layout import get_layout

    layout = get_layout(layout_name)
    resume_offsets = dict(resume_offsets or {})
    if resume_offsets and topic is None and any(
        not isinstance(k, tuple) for k in resume_offsets
    ):
        raise ValueError(
            "int-keyed resume_offsets are ambiguous without a topic filter; "
            "key them by (topic, partition) for multi-topic archives"
        )
    files = []
    for path in sorted(glob.glob(os.path.join(archive_dir, "**", "*.gz"), recursive=True)):
        rel = _rel_key(path, archive_dir)
        if start_marker is not None and rel <= start_marker:
            continue  # strictly-after semantics, like S3 startAfter
        meta = layout.parse(rel)
        if meta is None:
            continue
        if topic is not None and meta.topic != topic:
            continue
        if partitions is not None and meta.partition not in partitions:
            continue
        wm = resume_offsets.get((meta.topic, meta.partition),
                                resume_offsets.get(meta.partition))
        if wm is not None:
            idx_path = index_path_for(path)
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
        _DecodeBlocks(fmt_name, fmt_config or {}, layout_name, resume_offsets,
                      root=archive_dir, on_corrupt=on_corrupt,
                      quarantine_dir=quarantine_dir),
        batch_format="pyarrow",
    )
    if exclude_key_substrings:
        pats = list(exclude_key_substrings)

        def exclude(t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return t
            keys = t.column("key")  # binary: arbitrary key bytes stay legal
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
