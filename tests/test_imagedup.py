"""Image perceptual-hash near-dup: recall on planted variants, precision
across cliques, pigeonhole completeness vs brute force, hash invariances,
error contract."""
import numpy as np
import pyarrow as pa
import pytest

import ray.data

from kafka_connect_s3_ray.functions.imagedup import (
    ImageHasher,
    _band_layout,
    decode_image,
    dhash64,
    dhash64_payload,
    hamming_pairs,
    image_near_dup,
    planted_cliques,
    planted_pairs,
    synth_image_corpus,
    _synth_img,
)
from kafka_connect_s3_ray.functions.multimodal import (
    encode_jpeg,
    encode_png,
    encode_ppm,
)

N = 96
MAXH = 10


def _pairs_set(df):
    return set(zip(df["left_id"].astype(int), df["right_id"].astype(int)))


@pytest.fixture(scope="module")
def corpus():
    return synth_image_corpus(N)


@pytest.fixture(scope="module")
def detected(corpus):
    out = image_near_dup(ray.data.from_arrow(corpus), max_hamming=MAXH).to_pandas()
    return out


def test_planted_recall(detected):
    # every (base, variant) planted pair is found
    missing = set(planted_pairs(N)) - _pairs_set(detected)
    assert not missing, f"planted pairs not detected: {missing}"


def test_cross_clique_precision(detected):
    cid = {}
    for k, c in enumerate(planted_cliques(N)):
        for i in c:
            cid[i] = k
    cross = [(a, b) for a, b in _pairs_set(detected) if cid[a] != cid[b]]
    assert not cross, f"cross-clique false positives: {cross}"


def test_exact_dup_hamming_zero(detected):
    # i % 16 == 3 rows are byte dups of the clique base -> hamming 0
    by_pair = {(int(r.left_id), int(r.right_id)): int(r.hamming)
               for r in detected.itertuples()}
    for c in planted_cliques(N):
        for v in c[1:]:
            if v % 16 == 3:
                assert by_pair[(c[0], v)] == 0


def test_brute_force_equality(corpus):
    # pigeonhole banding finds EXACTLY the pairs a full O(N^2) popcount does
    # (hashes via dhash64_payload — the block-mean-thumbnail hash the
    # pipeline's ImageHasher computes, with JPEGs on the DC-only path)
    payloads = corpus.column("payload").to_pylist()
    hs = np.array([dhash64_payload(p) for p in payloads], np.uint64)
    truth = set()
    for a in range(N):
        for b in range(a + 1, N):
            if bin(int(hs[a]) ^ int(hs[b])).count("1") <= MAXH:
                truth.add((a, b))
    ds = ray.data.from_arrow(pa.table({
        "media_id": pa.array(np.arange(N), pa.int64()),
        "dhash": pa.array(hs, pa.uint64())}))
    got = _pairs_set(hamming_pairs(ds, max_hamming=MAXH).to_pandas())
    assert got == truth


def test_layout_invariance(corpus, detected):
    out = image_near_dup(
        ray.data.from_arrow(corpus).repartition(7), max_hamming=MAXH
    ).to_pandas()
    assert _pairs_set(out) == _pairs_set(detected)


def test_hash_invariances():
    rng = np.random.default_rng(5)
    img = _synth_img(rng, 48, 40)
    h0 = int(dhash64(img))
    bright = (img.astype(np.int16) + 15).clip(0, 255).astype(np.uint8)
    assert bin(h0 ^ int(dhash64(bright))).count("1") <= 2
    requant = decode_image(encode_jpeg(img, quality=90))
    assert bin(h0 ^ int(dhash64(requant))).count("1") <= MAXH
    png_roundtrip = decode_image(encode_png(img))
    assert int(dhash64(png_roundtrip)) == h0  # PNG is lossless
    # payload-level hash (the pipeline's): same invariances on the
    # block-mean thumbnail geometry, and the JPEG DC path must land on the
    # PPM/PNG block means up to DC quantization
    p0 = int(dhash64_payload(encode_ppm(img)))
    assert int(dhash64_payload(encode_png(img))) == p0
    pj = int(dhash64_payload(encode_jpeg(img, quality=90)))
    assert bin(p0 ^ pj).count("1") <= MAXH
    pb = int(dhash64_payload(encode_ppm(bright)))
    assert bin(p0 ^ pb).count("1") <= 2


def test_band_layout():
    for d in (0, 3, 6, 10, 15):
        layout = _band_layout(d)
        assert len(layout) == d + 1
        assert sum(w for _, w in layout) == 64
        assert layout[0][0] == 0
        for (s1, w1), (s2, _) in zip(layout, layout[1:]):
            assert s1 + w1 == s2
    with pytest.raises(ValueError):
        _band_layout(16)


def test_decode_error_contract():
    t = pa.table({"media_id": pa.array([0, 1], pa.int64()),
                  "payload": pa.array([encode_ppm(np.zeros((8, 8, 3), np.uint8)),
                                       b"not an image"], pa.binary())})
    with pytest.raises(Exception, match="id=1"):
        ImageHasher()(t)
    out = ImageHasher(on_error="skip")(t)
    assert out.column("media_id").to_pylist() == [0]


def test_empty_and_single():
    empty = pa.table({"media_id": pa.array([], pa.int64()),
                      "payload": pa.array([], pa.binary())})
    assert len(ImageHasher()(empty)) == 0
    one = synth_image_corpus(1)
    out = image_near_dup(ray.data.from_arrow(one), max_hamming=MAXH).to_pandas()
    assert len(out) == 0


def test_noisy_midband_jpeg_reencode_still_near_dup():
    """Regression (round-5 review): mid-band (29-64 px) JPEGs must hash
    through TRUE box means, not the 2x2 scaled decode — its odd-frequency
    leakage on noisy content pushed genuine re-encode pairs past the
    10-bit threshold. High-detail images across the size bands: a q90
    re-encode of a stored PPM stays a near-dup."""
    rng = np.random.default_rng(17)
    for h, w in [(37, 36), (44, 59), (30, 90), (80, 80), (25, 40)]:
        img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        p0 = int(dhash64_payload(encode_ppm(img)))
        pj = int(dhash64_payload(encode_jpeg(img, quality=90)))
        assert bin(p0 ^ pj).count("1") <= MAXH, (h, w)
