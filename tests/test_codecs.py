"""Codec / block-gzip / layout / archive tests — mirrors the reference's
FormatTests round-trips, BlockGZIPFileWriterTest golden checks, and
S3FilesReaderTest replay/resume matrix (SURVEY.md §5)."""

import gzip
import json
import os

import pyarrow as pa
import pytest

import ray.data

from kafka_connect_s3_ray.sources.archive import archive_records, read_archive
from kafka_connect_s3_ray.sources.blockgzip import (
    BlockGzipWriter,
    ChunksIndex,
    read_block,
    read_block_from_offset,
)
from kafka_connect_s3_ray.sources.codecs import (
    ByteLengthCodec,
    CorruptRecordError,
    TrailingDelimiterCodec,
    get_format,
    register_format,
)
from kafka_connect_s3_ray.sources.layout import (
    BlockMetadata,
    GroupedByDateLayout,
    GroupedByTopicLayout,
    get_layout,
)

RECORDS = [b"hello", b"", b"with\tembedded", b"\x00\x01binary\xff", b"x" * 5000]
KEYS = [b"k1", None, b"k3", b"", b"k5"]


@pytest.mark.parametrize("codec", [
    TrailingDelimiterCodec(),
    TrailingDelimiterCodec(include_keys=True),
    ByteLengthCodec(include_keys=True),
    ByteLengthCodec(include_keys=False),
])
def test_codec_round_trip(codec):
    vals = [v for v in RECORDS if b"\n" not in v] if isinstance(codec, TrailingDelimiterCodec) else RECORDS
    keys = KEYS[: len(vals)]
    blob = codec.encode(keys, vals)
    out = codec.decode(blob, start_offset=100)
    assert out.column("value").to_pylist() == vals
    assert out.column("offset").to_pylist() == list(range(100, 100 + len(vals)))
    if getattr(codec, "include_keys", False):
        got_keys = out.column("key").to_pylist()
        assert got_keys == [k or b"" for k in keys]


def test_byte_length_corrupt_record():
    codec = ByteLengthCodec(include_keys=False)
    blob = codec.encode([None, None], [b"abc", b"defgh"])
    with pytest.raises(CorruptRecordError, match="Corrupt record at f.gz:1"):
        codec.decode(blob[:-2], source="f.gz")


def test_delimited_missing_trailing_delimiter():
    with pytest.raises(CorruptRecordError):
        TrailingDelimiterCodec().decode(b"abc\ndef")  # no delimiter at EOF


@pytest.mark.parametrize("charset", ["utf-8", "utf-16-be"])
def test_delimited_string_round_trip_charsets(charset):
    """FormatTests multi-charset parity (common/src/test/.../FormatTests.java:19-73):
    string records survive framing in any charset, keys optional."""
    codec = TrailingDelimiterCodec(include_keys=True, charset=charset,
                                   value_delimiter=" ".encode(charset),
                                   key_delimiter=" ".encode(charset))
    keys = ["k1", "clé", "键"]
    vals = ["hello", "héllo wörld", "多字节 값"]
    blob = codec.encode_strings(keys, vals)
    out = codec.decode_strings(blob, start_offset=7)
    assert out.column("value").to_pylist() == vals
    assert out.column("key").to_pylist() == keys
    assert out.column("offset").to_pylist() == [7, 8, 9]


def test_manifest_crash_atomicity(tmp_path):
    """A crash mid-commit leaves a .tmp the loader ignores; the committed
    manifest stays intact (write-then-rename)."""
    from kafka_connect_s3_ray.state.manifest import Manifest

    p = str(tmp_path / "m.json")
    m = Manifest(p)
    m.record_commit(0, "a.parquet", 5, 10, 3, 0.1)
    m.commit()
    # simulate a crashed second commit: partial tmp garbage on disk
    open(p + ".tmp", "w").write('{"version": 1, "partitions": {TRUNC')
    m2 = Manifest.load(p)
    assert m2.watermark(0) == 5  # loader reads the committed file only
    m2.record_commit(0, "b.parquet", 9, 12, 2, 0.1)
    m2.commit()  # replaces cleanly despite the stale tmp
    assert Manifest.load(p).watermark(0) == 9


def test_format_registry():
    assert isinstance(get_format("text"), TrailingDelimiterCodec)
    assert isinstance(get_format("binary", include_keys=False), ByteLengthCodec)

    class MyFmt(ByteLengthCodec):
        pass

    register_format("mine", MyFmt)
    assert isinstance(get_format("mine"), MyFmt)
    assert isinstance(
        get_format("kafka_connect_s3_ray.sources.codecs.TrailingDelimiterCodec"),
        TrailingDelimiterCodec,
    )
    with pytest.raises(KeyError):
        get_format("nope")


def test_block_gzip_writer_chunks_and_index(tmp_path):
    """Whole file and every chunk independently gunzip-able; index chains
    first_record_offset + num_records (BlockGZIPFileWriterTest.java:42-151)."""
    path = str(tmp_path / "blk.gz")
    w = BlockGzipWriter(path, start_offset=10, chunk_threshold=300)
    payload = []
    for i in range(50):
        rec = f"record-{i:04d}-".encode() + b"z" * 20
        payload.append(rec)
        w.write(rec)
    index = w.close()
    assert len(index.chunks) > 1
    # index chains and covers the byte range exactly
    nxt = 10
    byte_pos = 0
    for c in index.chunks:
        assert c.first_record_offset == nxt and c.byte_offset == byte_pos
        nxt += c.num_records
        byte_pos += c.byte_length
    assert index.last_offset() == 60
    assert index.total_size() == os.path.getsize(path)
    # whole-file gunzip == concatenated records
    assert read_block(path) == b"".join(payload)
    # each chunk independently valid gzip
    data = open(path, "rb").read()
    for c in index.chunks:
        member = data[c.byte_offset : c.byte_offset + c.byte_length]
        assert len(gzip.decompress(member)) == c.byte_length_uncompressed
    # sidecar round-trips, at the REFERENCE's name ('{base}.index.json' —
    # '.gz' replaced, not appended; sink/.../S3Writer.java:54-55)
    from kafka_connect_s3_ray.sources.blockgzip import index_path_for

    assert index_path_for(path) == str(tmp_path / "blk.index.json")
    idx2 = ChunksIndex.from_json(open(index_path_for(path)).read())
    assert idx2.to_json() == index.to_json()
    # deterministic bytes: rewriting produces identical file (rewind IT analog)
    w2 = BlockGzipWriter(str(tmp_path / "blk2.gz"), start_offset=10, chunk_threshold=300)
    for rec in payload:
        w2.write(rec)
    w2.close()
    assert open(path, "rb").read() == open(str(tmp_path / "blk2.gz"), "rb").read()


def test_ranged_read_resume(tmp_path):
    path = str(tmp_path / "blk.gz")
    w = BlockGzipWriter(path, start_offset=0, chunk_threshold=200)
    codec = ByteLengthCodec(include_keys=False)
    for i in range(40):
        w.write(codec.encode([None], [f"v{i:03d}".encode() * 5]))
    index = w.close()
    target = 27
    data, first = read_block_from_offset(path, index, target)
    assert first <= target
    tbl = codec.decode(data, start_offset=first)
    vals = tbl.filter(pa.compute.greater_equal(tbl.column("offset"), target))
    assert vals.column("value").to_pylist()[0] == b"v027" * 5
    assert len(vals) == 40 - target


@pytest.mark.parametrize("layout_name", ["grouped_by_date", "grouped_by_topic"])
def test_layout_build_parse_roundtrip(layout_name):
    layout = get_layout(layout_name)
    meta = BlockMetadata("my-topic", 3, 12031, "2024-05-01")
    key = layout.build(meta, suffix=".gz")
    assert "00003" in key and "000000012031" in key
    got = layout.parse(key)
    assert got == meta
    assert layout.parse("garbage") is None
    # lexicographic order == numeric offset order (zero padding)
    k2 = layout.build(BlockMetadata("my-topic", 3, 12032, "2024-05-01"), ".gz")
    assert key < k2


def test_archive_round_trip_and_resume(tmp_path):
    """Sink records -> block-gzip archive -> replay; then resume from offsets
    map skips consumed data; key-exclude filter and topic remap apply
    (S3FilesReaderTest.java:52-246,316-398)."""
    n, P = 200, 3
    rows = {
        "partition": pa.array([i % P for i in range(n)], pa.int32()),
        "offset": pa.array([i // P for i in range(n)], pa.int64()),
        "key": pa.array([f"key-{i:04d}".encode() for i in range(n)], pa.binary()),
        "value": pa.array([f"value-{i:04d}".encode() * 3 for i in range(n)], pa.binary()),
    }
    ds = ray.data.from_arrow(pa.table(rows))
    out = str(tmp_path / "archive")
    stats = archive_records(ds, out, topic="conv", date="2024-01-02")
    assert len(stats) == P and all(s["num_chunks"] >= 1 for s in stats)

    back = read_archive(out, topic="conv").to_pandas().sort_values(["partition", "offset"])
    orig = pa.table(rows).to_pandas().sort_values(["partition", "offset"])
    assert back["value"].tolist() == orig["value"].tolist()
    assert back["offset"].tolist() == orig["offset"].tolist()
    assert (back["topic"] == "conv").all()

    # partition filter (M10)
    only0 = read_archive(out, partitions={0}).to_pandas()
    assert set(only0["partition"]) == {0}

    # resume offsets (S7/D1): skip everything <= wm per partition
    wm = {0: 10, 1: 5}
    resumed = read_archive(out, topic="conv", resume_offsets=wm).to_pandas()
    for p, g in resumed.groupby("partition"):
        assert g["offset"].min() > wm.get(p, -1)

    # key exclude (M9)
    excl = read_archive(out, exclude_key_substrings=["key-000", "key-001"]).to_pandas()
    assert len(excl) == n - 20
    assert not excl["key"].apply(lambda k: b"key-000" in k or b"key-001" in k).any()

    # topic remap (M11)
    remapped = read_archive(out, target_topic={"conv": "conv2"}).to_pandas()
    assert (remapped["topic"] == "conv2").all()


def test_archive_fully_consumed_files_skipped(tmp_path):
    """A file whose whole offset range is below the watermark is pruned at
    listing time via its index sidecar, before any byte is read (D1)."""
    rows = pa.table(
        {
            "partition": pa.array([0] * 10, pa.int32()),
            "offset": pa.array(list(range(10)), pa.int64()),
            "key": pa.array([b"k"] * 10, pa.binary()),
            "value": pa.array([b"v"] * 10, pa.binary()),
        }
    )
    out = str(tmp_path / "arc")
    archive_records(ray.data.from_arrow(rows), out, topic="t")
    ds = read_archive(out, topic="t", resume_offsets={0: 9})
    assert ds.count() == 0


def test_decode_prefix_recovers_good_records():
    codec = ByteLengthCodec(include_keys=False)
    blob = codec.encode([None] * 3, [b"aaa", b"bbbb", b"cc"])
    tbl, err = codec.decode_prefix(blob[:-3], start_offset=5)  # truncate last
    assert err is not None
    assert tbl.column("value").to_pylist() == [b"aaa", b"bbbb"]
    assert tbl.column("offset").to_pylist() == [5, 6]
    d = TrailingDelimiterCodec()
    tbl2, err2 = d.decode_prefix(b"one\ntwo\nthr", start_offset=0)
    assert err2 is not None and tbl2.column("value").to_pylist() == [b"one", b"two"]


def test_archive_quarantine_on_corruption(tmp_path):
    """A corrupted block file routes to the dead-letter path: decodable prefix
    kept, quarantine JSON written, replay continues (on_corrupt='raise'
    mirrors the reference's hard DataException)."""
    import glob as g
    import json

    rows = pa.table(
        {
            "partition": pa.array([0] * 20 + [1] * 20, pa.int32()),
            "offset": pa.array(list(range(20)) * 2, pa.int64()),
            "key": pa.array([b"k"] * 40, pa.binary()),
            "value": pa.array([f"val-{i:03d}".encode() for i in range(40)], pa.binary()),
        }
    )
    out = str(tmp_path / "arc")
    archive_records(ray.data.from_arrow(rows), out, topic="t", chunk_threshold=10**9)
    victim = sorted(g.glob(os.path.join(out, "**", "*-00001-*.gz"), recursive=True))[0]
    blob = open(victim, "rb").read()
    # corrupt: truncate the gzip member mid-stream is messy; instead re-gzip a
    # truncated framing payload so the gzip layer stays valid
    import gzip as gz

    raw = gz.decompress(blob)
    open(victim, "wb").write(gz.compress(raw[:-5], mtime=0))

    with pytest.raises(Exception):
        read_archive(out).to_pandas()
    qdir = str(tmp_path / "quarantine")
    ok = read_archive(out, on_corrupt="quarantine", quarantine_dir=qdir).to_pandas()
    assert len(ok) < 40 and len(ok[ok["partition"] == 0]) == 20
    qfiles = os.listdir(qdir)
    assert len(qfiles) == 1
    q = json.load(open(os.path.join(qdir, qfiles[0])))
    assert q["first_bad_offset"] == q["decoded_records"]  # partition 1 starts at 0
