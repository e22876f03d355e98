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


# --- media codecs (round 4): JPEG / ADPCM property round-trips -------------

import numpy as np
from hypothesis import strategies as _st
from hypothesis.extra.numpy import arrays as _np_arrays


@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    img=_np_arrays(np.uint8, _st.tuples(_st.integers(8, 40), _st.integers(8, 40),
                                        _st.just(3))),
    quality=_st.integers(60, 100),
    sub=_st.sampled_from(["444", "420"]),
)
def test_jpeg_roundtrip_any_image(img, quality, sub):
    """Arbitrary uint8 images survive encode->decode with shape/dtype intact
    and bounded error (pure noise is JPEG's worst case: bound loosely but
    finitely — a broken entropy layer produces garbage far past this)."""
    from kafka_connect_s3_ray.functions.jpeg import decode_jpeg, encode_jpeg

    out = decode_jpeg(encode_jpeg(img, quality=quality, subsample=sub))
    assert out.shape == img.shape and out.dtype == np.uint8
    err = np.abs(out.astype(int) - img.astype(int)).mean()
    assert err < (40.0 if sub == "444" else 72.0)


@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    samples=_np_arrays(np.int16, _st.integers(0, 1500)),
    rate=_st.sampled_from([8000, 16000, 44100]),
)
def test_adpcm_roundtrip_any_signal(samples, rate):
    """Arbitrary int16 signals: exact length + rate back, bounded per-sample
    drift (ADPCM tracks within a few steps of the true value; a table or
    packing bug diverges to full-scale error)."""
    from kafka_connect_s3_ray.functions.adpcm import (decode_wav_adpcm,
                                                      encode_wav_adpcm)

    back, r = decode_wav_adpcm(encode_wav_adpcm(samples, rate))
    assert r == rate and len(back) == len(samples)
    if len(samples):
        # first sample of each block is verbatim
        assert back[0] == samples[0]
        err = np.abs(back.astype(np.int64) - samples.astype(np.int64))
        assert err.mean() < 16384  # white noise worst case stays sub-half-scale


@given(
    st.lists(st.binary(min_size=0, max_size=200), min_size=1, max_size=12),
    st.integers(min_value=1, max_value=60),
)
def test_mjpm_container_roundtrip(frames, fps):
    """encode_mjpm -> mjpm_index byte slices reproduce every input frame
    exactly (any payload bytes — the container is format-agnostic), fps
    survives, and the end sentinel equals the container length."""
    from kafka_connect_s3_ray.functions.multimodal import (encode_mjpm,
                                                           mjpm_index)

    payload = encode_mjpm(frames, fps=fps)
    offs, got_fps = mjpm_index(payload)
    assert got_fps == fps
    assert len(offs) == len(frames) + 1
    assert offs[-1] == len(payload)
    for i, f in enumerate(frames):
        assert payload[offs[i]:offs[i + 1]] == f
