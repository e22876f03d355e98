"""Byte-parity review fixes: reference index naming, keyed-text framing read
order, gzip-layer corruption policy, dense-offset contract, W3 null-ts,
multi-topic import guard, pre-checkpoint ranged reads."""

import glob
import gzip
import os
import zlib

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from kafka_connect_s3_ray.sources.archive import archive_records, fetch_next_offset, read_archive
from kafka_connect_s3_ray.sources.blockgzip import (
    BlockGzipWriter,
    ChunksIndex,
    index_path_for,
    read_block_from_offset,
    read_bytes_multimember,
)
from kafka_connect_s3_ray.sources.codecs import CorruptRecordError, TrailingDelimiterCodec


def _records(part, n, start=0):
    return pa.table({
        "partition": pa.array([part] * n, pa.int32()),
        "offset": pa.array(range(start, start + n), pa.int64()),
        "key": pa.array([f"k{i}".encode() for i in range(n)], pa.binary()),
        "value": pa.array([f"v{i}".encode() for i in range(n)], pa.binary()),
    })


def test_index_sidecar_uses_reference_name(tmp_path):
    """'{base}.index.json' — '.gz' replaced, exactly as S3Writer.java:54-55
    names it, so reference-produced archives and ours interoperate."""
    ds = ray.data.from_arrow(_records(0, 5))
    archive_records(ds, str(tmp_path), topic="t", date="2024-01-01")
    gz = [p for p in (tmp_path / "2024-01-01").iterdir() if p.suffix == ".gz"]
    assert gz
    for p in gz:
        idx = index_path_for(str(p))
        assert idx.endswith(".index.json") and not idx.endswith(".gz.index.json")
        assert os.path.exists(idx)
        assert not os.path.exists(str(p) + ".index.json")
    # offset recovery reads the cursor -> reference-named index
    assert fetch_next_offset(str(tmp_path), "t", 0) == 5
    # replay skips fully-consumed files via the same index name
    back = read_archive(str(tmp_path), topic="t", resume_offsets={("t", 0): 4})
    assert back.count() == 0


def test_keyed_text_decode_reads_key_delimiter_first():
    """Reference read order (DelimitedRecordReader): the key is scanned up to
    the KEY delimiter first, so keys may legally contain the value
    delimiter."""
    c = TrailingDelimiterCodec(include_keys=True)  # '\t' key, '\n' value
    framed = c.encode([b"a\nb", b"k2"], [b"v1", b"v2"])
    out = c.decode(framed)
    assert out.column("key").to_pylist() == [b"a\nb", b"k2"]
    assert out.column("value").to_pylist() == [b"v1", b"v2"]
    assert out.column("offset").to_pylist() == [0, 1]
    # a record with no key delimiter errors (reference: 'missing value for key')
    with pytest.raises(CorruptRecordError, match="key delimiter"):
        c.decode(b"norecordkeydelim\n")


def test_truncated_gzip_member_hits_corruption_policy(tmp_path):
    w = BlockGzipWriter(str(tmp_path / "t-00000-000000000000.gz"),
                        chunk_threshold=64)
    from kafka_connect_s3_ray.sources.codecs import ByteLengthCodec

    fmt = ByteLengthCodec()
    for i in range(8):
        w.write(fmt.encode([None], [f"value-{i}".encode() * 4]))
    w.close()
    data = open(tmp_path / "t-00000-000000000000.gz", "rb").read()
    index = ChunksIndex.from_json(
        open(index_path_for(str(tmp_path / "t-00000-000000000000.gz"))).read()
    )
    # cut INSIDE the final member's deflate payload (not just its trailer)
    cut = index.chunks[-1].byte_offset + index.chunks[-1].byte_length // 2
    truncated = data[:cut]
    with pytest.raises(zlib.error, match="truncated"):
        read_bytes_multimember(truncated)
    # non-strict salvage returns the decodable prefix
    prefix = read_bytes_multimember(truncated, strict=False)
    assert 0 < len(prefix) < len(read_bytes_multimember(data))


def test_archive_records_rejects_non_dense_offsets(tmp_path):
    gaps = pa.table({
        "partition": pa.array([0, 0, 0], pa.int32()),
        "offset": pa.array([0, 5, 10], pa.int64()),  # compacted-topic gaps
        "key": pa.array([b"a", b"b", b"c"], pa.binary()),
        "value": pa.array([b"x", b"y", b"z"], pa.binary()),
    })
    with pytest.raises(Exception, match="dense"):
        archive_records(ray.data.from_arrow(gaps), str(tmp_path), topic="t")


def test_event_time_flush_survives_leading_null_ts(tmp_path):
    n = 6
    ts = pa.array([None, 0, 1, 3_600_000_001, 3_600_000_002, 7_200_000_005],
                  pa.timestamp("us"))
    tbl = _records(0, n).append_column("ts", ts)
    stats = archive_records(ray.data.from_arrow(tbl), str(tmp_path), topic="t",
                            flush_interval_us=3_600_000_000)
    # W3 must still rotate: records past the first NON-NULL ts + interval open
    # new files (a leading null must not disable time-based rotation)
    assert sum(s["num_records"] for s in stats) == n
    assert len(stats) >= 3


def test_multi_topic_changelog_import_requires_topic(tmp_path):
    from kafka_connect_s3_ray.sources.changelog import changelog_from_archive

    for t in ("alpha", "beta"):
        archive_records(ray.data.from_arrow(_records(0, 3)), str(tmp_path),
                        topic=t, date="2024-01-01")
    with pytest.raises(ValueError, match="multiple topics"):
        changelog_from_archive(str(tmp_path))


def test_ranged_read_before_first_offset_replays_whole_file(tmp_path):
    path = str(tmp_path / "blk.gz")
    w = BlockGzipWriter(path, start_offset=10, chunk_threshold=64)
    from kafka_connect_s3_ray.sources.codecs import ByteLengthCodec

    fmt = ByteLengthCodec()
    for i in range(4):
        w.write(fmt.encode([None], [f"rec-{i}".encode()]))
    index = w.close()
    data, first = read_block_from_offset(path, index, offset=5)  # before 10
    assert first == 10
    assert len(fmt.decode(data, start_offset=first)) == 4
    # past the end still returns nothing
    data2, nxt = read_block_from_offset(path, index, offset=99)
    assert data2 == b"" and nxt == index.last_offset()


def test_layout_rejects_width_overflow():
    from kafka_connect_s3_ray.sources.layout import BlockMetadata, GroupedByDateLayout

    lo = GroupedByDateLayout()
    with pytest.raises(ValueError, match="key width"):
        lo.build(BlockMetadata("t", 100000, 0, "2024-01-01"))
    with pytest.raises(ValueError, match="key width"):
        lo.build(BlockMetadata("t", 0, 10**12, "2024-01-01"))


def test_null_text_semantics_match_sql():
    """Null text: kept by the exclude filter (can't CONTAIN a substring),
    null fingerprint (md5(NULL) IS NULL), one null group in dedup."""
    import duckdb

    from kafka_connect_s3_ray.functions.text import add_fingerprint

    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array([None, "", "x"], pa.string())})
    fp = add_fingerprint(t, trim=False).column("fingerprint").to_pylist()
    assert fp[0] is None and fp[1] is not None and fp[1] != fp[2]
    sql_null = duckdb.sql("SELECT md5(lower(NULL::VARCHAR))").fetchone()[0]
    assert sql_null is None


def test_schema_unification_widens_evolved_numeric_columns():
    """int32 lake + int64 evolved events must widen to int64, not downcast
    (first-seen-wins overflowed at merge time)."""
    from kafka_connect_s3_ray.schema import unify_with_nulls

    lake = pa.table({"k": pa.array([1], pa.int64()),
                     "value": pa.array([7], pa.int32())})
    events = pa.table({"k": pa.array([2], pa.int64()),
                       "value": pa.array([2**31 + 5], pa.int64())})
    a, b = unify_with_nulls([lake, events])
    assert a.schema.field("value").type == pa.int64()
    assert b.column("value").to_pylist() == [2**31 + 5]


def test_compact_events_rejects_null_keys():
    from kafka_connect_s3_ray.stages.merge import compact_events

    t = pa.table({"conv_id": pa.array(["a", None], pa.string()),
                  "turn_idx": pa.array([0, 0], pa.int32()),
                  "offset": pa.array([0, 1], pa.int64()),
                  "op": ["I", "I"]})
    with pytest.raises(ValueError, match="null values in key column"):
        compact_events(t)


def test_streaming_merge_rejects_duplicate_keys_in_piece():
    from kafka_connect_s3_ray.stages.merge import merge_sorted_stream
    from kafka_connect_s3_ray.synth import synth_changelog

    dup = pa.table({"conv_id": pa.array(["c", "c"], pa.string()),
                    "turn_idx": pa.array([1, 1], pa.int32()),
                    "role": ["user", "user"], "text": ["a", "b"],
                    "tool": pa.array([None, None], pa.string()),
                    "ts": pa.array([0, 0], pa.timestamp("us"))})
    events = synth_changelog(5, 10, seed=1, num_partitions=1)
    with pytest.raises(ValueError, match="duplicate keys|strictly key-ascending"):
        list(merge_sorted_stream(iter([dup]), events))


def test_tail_retries_arrow_invalid(tmp_path):
    """A half-written parquet file (ArrowInvalid, a ValueError) must back off
    and retry like any transient IO error, not kill the tail."""
    from kafka_connect_s3_ray.pipelines.tail import tail_changelog
    from kafka_connect_s3_ray.synth import write_fixture

    fx = write_fixture(str(tmp_path), n_conv=20, n_events=200, num_partitions=2)
    bad = os.path.join(fx["changelog_dir"], "partition=0", "log-999999999999.parquet")
    open(bad, "wb").write(b"PAR1 not really parquet")
    calls = []

    def fake_sleep(s):
        calls.append(s)
        os.remove(bad)  # the producer "finishes" its write -> next tick works

    m = tail_changelog(fx["changelog_dir"], str(tmp_path / "out"),
                       str(tmp_path / "m.json"), lake_dir=fx["lake_dir"],
                       num_partitions=2, max_rounds=1, poll_interval_s=0.0,
                       sleep=fake_sleep)
    assert calls, "no backoff happened"
    assert max(m.watermarks(2).values()) >= 0  # the retried tick succeeded


def test_busy_partition_delta_chain_is_bounded(tmp_path):
    """A partition receiving events EVERY tick never goes idle, so the grace
    check alone would let its delta chain grow forever; max_pending_deltas
    folds it regardless of write rate."""
    import pyarrow.parquet as pq

    from kafka_connect_s3_ray.pipelines.tail import tail_changelog
    from kafka_connect_s3_ray.synth import write_fixture

    fx = write_fixture(str(tmp_path), n_conv=20, n_events=100, num_partitions=1)
    logdir = os.path.join(fx["changelog_dir"], "partition=0")
    base_tbl = pq.read_table(sorted(glob.glob(os.path.join(logdir, "*.parquet")))[0])
    next_off = int(pa.compute.max(base_tbl.column("offset")).as_py()) + 1
    state = {"off": next_off}

    def on_round(i, m):
        # feed one new event every tick: the partition is never idle
        row = base_tbl.slice(0, 1).to_pydict()
        row["offset"] = [state["off"]]
        state["off"] += 1
        pq.write_table(pa.table(row, schema=base_tbl.schema),
                       os.path.join(logdir, f"log-{row['offset'][0]:012d}.parquet"))
        counts = m.delta_counts()
        assert counts.get(0, 0) <= 3, f"delta chain unbounded: {counts}"

    tail_changelog(fx["changelog_dir"], str(tmp_path / "out"),
                   str(tmp_path / "m.json"), lake_dir=fx["lake_dir"],
                   num_partitions=1, commit_mode="delta", max_rounds=8,
                   poll_interval_s=0.0, sleep=lambda s: None,
                   on_round=on_round, flush_interval_rounds=100,
                   grace_rounds=50, max_pending_deltas=3)
