"""Property-based round-trips for the byte codecs and block-gzip writer:
write -> read must be identity for ARBITRARY byte records (the reference's
FormatTests generalized by hypothesis)."""

import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kafka_connect_s3_ray.sources.blockgzip import BlockGzipWriter, read_block
from kafka_connect_s3_ray.sources.codecs import ByteLengthCodec, TrailingDelimiterCodec

byte_values = st.lists(st.binary(min_size=0, max_size=200), min_size=0, max_size=20)


@settings(max_examples=50, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(values=byte_values, keys=byte_values, start=st.integers(0, 10**6))
def test_byte_length_round_trip_any_bytes(values, keys, start):
    keys = (keys + [b""] * len(values))[: len(values)]
    codec = ByteLengthCodec(include_keys=True)
    out = codec.decode(codec.encode(keys, values), start_offset=start)
    assert out.column("value").to_pylist() == values
    assert out.column("key").to_pylist() == keys
    assert out.column("offset").to_pylist() == list(range(start, start + len(values)))


@settings(max_examples=50, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(values=st.lists(
    st.binary(min_size=0, max_size=100).filter(lambda b: b"\n" not in b),
    min_size=0, max_size=20,
))
def test_delimited_round_trip_any_bytes(values):
    codec = TrailingDelimiterCodec()
    out = codec.decode(codec.encode([None] * len(values), values))
    assert out.column("value").to_pylist() == values


@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(records=st.lists(st.binary(min_size=1, max_size=300), min_size=1, max_size=30),
       threshold=st.integers(16, 512))
def test_block_gzip_round_trip_any_chunking(tmp_path_factory, records, threshold):
    path = str(tmp_path_factory.mktemp("bg") / "b.gz")
    w = BlockGzipWriter(path, start_offset=0, chunk_threshold=threshold)
    for r in records:
        w.write(r)
    index = w.close()
    assert read_block(path) == b"".join(records)
    assert index.last_offset() == len(records)
    # chunks chain and cover the byte range
    nxt, pos = 0, 0
    for c in index.chunks:
        assert c.first_record_offset == nxt and c.byte_offset == pos
        nxt += c.num_records
        pos += c.byte_length
