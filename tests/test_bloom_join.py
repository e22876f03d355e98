"""bloom_prefilter: never drops a matching key (no false negatives), only
shrinks the left side; composed with an exact join it must equal the
unfiltered join on every input."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from kafka_connect_s3_ray.stages.joins import bloom_prefilter
from kafka_connect_s3_ray.state.bloom import (bloom_contains_many,
                                              build_bloom_bits)


def test_fixed_bloom_no_false_negatives_and_or_merge():
    keys = np.array([f"key-{i}" for i in range(5000)], object)
    m, k = 1 << 16, 7
    bm = build_bloom_bits(keys, m, k)
    assert bloom_contains_many(bm, m, k, keys).all()
    absent = np.array([f"other-{i}" for i in range(5000)], object)
    fp = bloom_contains_many(bm, m, k, absent).mean()
    assert fp < 0.15  # 5k keys in 64k bits: FP bounded, correctness-free
    # partials with the same geometry OR into the full filter exactly
    parts = [build_bloom_bits(keys[i::4], m, k) for i in range(4)]
    merged = parts[0]
    for p in parts[1:]:
        merged = np.bitwise_or(merged, p)
    assert (merged == bm).all()


def _ds(tbl, blocks=4):
    return ray.data.from_arrow(tbl).repartition(blocks)


def test_prefilter_keeps_all_matches_drops_most_nonmatches(ray_session):
    rng = np.random.RandomState(3)
    left = _ds(pa.table({
        "uid": pa.array(rng.randint(0, 10_000, 5_000), pa.int64()),
        "v": pa.array(np.arange(5_000), pa.int64())}))
    right = _ds(pa.table({
        "uid": pa.array(rng.randint(0, 300, 400), pa.int64())}))
    out = bloom_prefilter(left, right, on="uid", m_bits=1 << 14).to_pandas()
    lf = left.to_pandas()
    rkeys = set(right.to_pandas()["uid"])
    must_keep = lf[lf["uid"].isin(rkeys)]
    # exact containment: every matching row survives, identified by v
    assert set(must_keep["v"]) <= set(out["v"])
    # and the filter actually filters (uid domain is 33x the right side)
    assert len(out) < len(lf) * 0.5


def test_prefilter_plus_exact_semi_equals_plain_semi(ray_session):
    from kafka_connect_s3_ray.stages.joins import semi_join

    rng = np.random.RandomState(9)
    left = _ds(pa.table({
        "uid": pa.array(rng.randint(0, 2_000, 3_000), pa.int64()),
        "v": pa.array(np.arange(3_000), pa.int64())}))
    rkeys = np.unique(rng.randint(0, 500, 200))
    right = _ds(pa.table({"uid": pa.array(rkeys, pa.int64())}))
    pref = bloom_prefilter(left, right, on="uid", m_bits=1 << 12)
    a = semi_join(pref, rkeys, on="uid").to_pandas().sort_values("v")
    b = semi_join(left, rkeys, on="uid").to_pandas().sort_values("v")
    assert list(a["v"]) == list(b["v"])


def test_null_left_keys_never_match(ray_session):
    left = _ds(pa.table({
        "uid": pa.array([1, None, 2], pa.int64()),
        "v": pa.array([0, 1, 2], pa.int64())}), blocks=1)
    right = _ds(pa.table({"uid": pa.array([1, None], pa.int64())}), blocks=1)
    out = bloom_prefilter(left, right, on="uid", m_bits=1 << 10).to_pandas()
    assert list(out["v"]) == [0]


def test_prefilter_tree_reduced_partials_no_false_negatives(ray_session):
    # > _DRIVER_OR_CAP right blocks forces the in-cluster fold level(s);
    # the reduced bitmap must behave exactly like the driver-OR'd one:
    # every matching left key survives
    rng = np.random.RandomState(7)
    left = _ds(pa.table({
        "uid": pa.array(np.arange(2_000), pa.int64()),
        "v": pa.array(rng.randint(0, 100, 2_000), pa.int64())}), blocks=4)
    right_keys = np.arange(0, 2_000, 3)  # every 3rd key matches
    right = _ds(pa.table({"uid": pa.array(right_keys, pa.int64())}),
                blocks=300)  # 300 single-digit-row partials > 256 cap
    out = bloom_prefilter(left, right, "uid").to_pandas()
    got = set(out["uid"])
    assert set(right_keys) <= got  # no false negatives through the fold
    assert len(got) < 2_000  # and it did actually filter something
