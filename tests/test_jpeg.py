"""Pure-numpy baseline JPEG codec (`functions/jpeg.py`): table validity,
encoder/decoder roundtrip across qualities / subsampling / restart
intervals / grayscale, marker-level spec shape, and corrupt-stream
rejection. The reference's own test strategy for codec layers is
byte-golden unit tests (e.g. its format round-trips); roundtrip-with-
tolerance is the JPEG equivalent because quantization is lossy by design.
"""

import numpy as np
import pytest

from kafka_connect_s3_ray.functions.jpeg import (
    AC_BITS,
    AC_VALS,
    DC_BITS,
    DC_VALS,
    _canonical_codes,
    decode_jpeg,
    encode_jpeg,
)


def _test_image(h=48, w=64, seed=0):
    rng = np.random.default_rng(seed)
    base = np.linspace(0, 255, w, dtype=np.float32)[None, :, None]
    return (base + rng.integers(0, 48, (h, w, 3))).clip(0, 255).astype(np.uint8)


def test_huffman_tables_are_exactly_the_standard_symbol_sets():
    # DC: magnitude sizes 0..11; AC: (run<<4|size) complete grid + EOB + ZRL
    assert sorted(DC_VALS) == list(range(12)) and sum(DC_BITS) == 12
    expected = {0x00, 0xF0} | {(r << 4) | s for r in range(16)
                               for s in range(1, 11)}
    assert set(AC_VALS) == expected and len(AC_VALS) == 162
    assert sum(AC_BITS) == 162
    # canonical code construction cannot overflow any code length
    for bits, vals in ((AC_BITS, AC_VALS), (DC_BITS, DC_VALS)):
        codes = _canonical_codes(bits, vals)
        assert len(codes) == len(vals)
        assert all(c < (1 << ln) and ln <= 16 for c, ln in codes.values())


@pytest.mark.parametrize("subsample", ["444", "420"])
@pytest.mark.parametrize("quality", [95, 75])
def test_roundtrip_error_bounded(subsample, quality):
    img = _test_image()
    out = decode_jpeg(encode_jpeg(img, quality=quality, subsample=subsample))
    assert out.shape == img.shape and out.dtype == np.uint8
    err = np.abs(out.astype(int) - img.astype(int))
    # noise+gradient at q>=75 stays within ordinary JPEG loss
    assert err.mean() < 12.0
    assert err.max() < 64


def test_solid_color_is_exact_and_higher_quality_is_closer():
    solid = np.full((24, 40, 3), 200, np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(solid, quality=90)), solid)
    img = _test_image(seed=3)
    e95 = np.abs(decode_jpeg(encode_jpeg(img, 95)).astype(int) - img).mean()
    e50 = np.abs(decode_jpeg(encode_jpeg(img, 50)).astype(int) - img).mean()
    assert e95 < e50
    # and lower quality compresses harder
    assert len(encode_jpeg(img, 50)) < len(encode_jpeg(img, 95))


def test_odd_dimensions_crop_back():
    img = _test_image(45, 61, seed=5)
    for sub in ("444", "420"):
        out = decode_jpeg(encode_jpeg(img, quality=90, subsample=sub))
        assert out.shape == (45, 61, 3)


@pytest.mark.parametrize("interval", [1, 3, 7])
def test_restart_markers_decode_identically(interval):
    img = _test_image(seed=7)
    plain = decode_jpeg(encode_jpeg(img, 92, "420"))
    rst = decode_jpeg(encode_jpeg(img, 92, "420", restart_interval=interval))
    assert np.array_equal(plain, rst)


def test_grayscale_single_component():
    g = _test_image(seed=9)[:, :, 1].copy()
    out = decode_jpeg(encode_jpeg(g, quality=95))
    assert out.shape == (*g.shape, 3)
    assert np.array_equal(out[:, :, 0], out[:, :, 2])  # replicated channels
    assert np.abs(out[:, :, 0].astype(int) - g.astype(int)).mean() < 4.0


def test_marker_layout_is_spec_shaped():
    data = encode_jpeg(_test_image(), 85, "420", restart_interval=2)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    assert b"JFIF\x00" in data[:32]
    # walk the segment chain up to SOS: every marker must be well-formed
    pos, tags = 2, []
    while True:
        assert data[pos] == 0xFF
        tag = data[pos + 1]
        tags.append(tag)
        if tag == 0xDA:
            break
        ln = int.from_bytes(data[pos + 2:pos + 4], "big")
        pos += 2 + ln
    assert tags.count(0xDB) == 2 and tags.count(0xC4) == 4
    assert 0xC0 in tags and 0xDD in tags  # SOF0 + DRI present
    # restart markers appear in the entropy stream
    assert any(bytes([0xFF, 0xD0 + i]) in data for i in range(8))


def test_corrupt_and_unsupported_streams_fail_loudly():
    img = _test_image(24, 24)
    data = bytearray(encode_jpeg(img, 90))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01not a jpeg")
    with pytest.raises(ValueError):
        decode_jpeg(bytes(data[:40]))  # truncated before any scan
    # flip SOF0 -> SOF2 (progressive): must name the unsupported mode
    sof = data.find(b"\xff\xc0")
    data[sof + 1] = 0xC2
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(data))


def test_decoder_reads_tables_from_the_stream_not_module_constants():
    """Quality changes rewrite DQT in the file; the decoder must use the
    stream's tables (different qualities decode to visibly different data
    from the same coefficients if tables were ignored)."""
    img = _test_image(seed=11)
    lo = encode_jpeg(img, 30)
    hi = encode_jpeg(img, 95)
    assert lo[:2] == hi[:2]
    err_lo = np.abs(decode_jpeg(lo).astype(int) - img).mean()
    err_hi = np.abs(decode_jpeg(hi).astype(int) - img).mean()
    assert err_hi < err_lo < 40.0


@pytest.mark.parametrize("seed", range(4))
def test_dc_thumb_equals_full_decode_block_means(seed):
    """The DC-only entropy walk must agree with the FULL decoder: every 8x8
    AC basis function has zero mean over the block, so the block means of
    the full IDCT reconstruction ARE the DC terms — the thumb and the
    full-decode luma block means may differ only by the uint8
    rounding/clip + RGB<->YCbCr roundtrip (~2 levels). Randomized across
    sizes (incl. non-multiples of 8), quality, 4:2:0, and restarts."""
    from kafka_connect_s3_ray.functions.jpeg import decode_jpeg_luma_dc

    rng = np.random.default_rng(seed)
    h, w = int(rng.integers(17, 90)), int(rng.integers(17, 90))
    # mid-range content: keeps the IDCT away from the 0/255 clip, which
    # would shift block means asymmetrically
    img = (rng.uniform(40, 215, (h, w, 3))).astype(np.uint8)
    cases = [dict(quality=90), dict(quality=60),
             dict(subsample="420"), dict(restart_interval=2)]
    for kw in cases:
        jp = encode_jpeg(img, **kw)
        th = decode_jpeg_luma_dc(jp)
        assert th.shape == (-(-h // 8), -(-w // 8))
        full = decode_jpeg(jp).astype(np.float64) @ [0.299, 0.587, 0.114]
        bh, bw = h // 8, w // 8
        if bh and bw:  # compare only blocks fully inside the image
            bm = (full[: bh * 8, : bw * 8]
                  .reshape(bh, 8, bw, 8).mean(axis=(1, 3)))
            err = np.abs(th[:bh, :bw] - bm).max()
            assert err <= 2.5, (kw, err)


def test_quad_thumb_tracks_4x4_box_means():
    """The 2x2 scaled decode (DC + three lowest ACs) reconstructs quadrant
    means up to odd-frequency leakage — on smooth content it must track the
    true 4x4 box means of the source closely."""
    from kafka_connect_s3_ray.functions.jpeg import decode_jpeg_luma_quad

    img = _test_image(h=40, w=56, seed=3)
    jp = encode_jpeg(img, quality=90)
    q = decode_jpeg_luma_quad(jp)
    assert q.shape == (10, 14)
    y = img.astype(np.float64) @ [0.299, 0.587, 0.114]
    bm = y.reshape(10, 4, 14, 4).mean(axis=(1, 3))
    assert np.abs(q - bm).max() <= 6.0
