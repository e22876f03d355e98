"""exact_quantiles: distributed histogram-refinement selection must equal a
local sort-and-select (quantile_disc rank = max(ceil(q*n)-1, 0)) on every
distribution shape that stresses a different code path."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from kafka_connect_s3_ray.functions.quantiles import (exact_quantiles,
                                                      grouped_exact_quantiles)

QS = [0.0, 0.25, 0.5, 0.9, 0.99, 1.0]


def _expected(vals: np.ndarray, qs) -> np.ndarray:
    s = np.sort(vals[~np.isnan(vals)])
    n = len(s)
    return np.array([s[max(int(np.ceil(q * n)) - 1, 0)] for q in qs])


def _ds(vals: np.ndarray, blocks: int = 7) -> "ray.data.Dataset":
    return ray.data.from_arrow(
        pa.table({"v": pa.array(vals, pa.float64())})
    ).repartition(blocks)


@pytest.mark.parametrize("shape", ["uniform", "lognormal", "duplicates",
                                   "constant", "two_values", "tiny"])
def test_matches_sort_select(shape, ray_session):
    rng = np.random.RandomState(7)
    vals = {
        "uniform": rng.uniform(-1e6, 1e6, 20_000),
        "lognormal": rng.lognormal(0, 4, 20_000),  # heavy tail across decades
        "duplicates": rng.choice([1.5, 2.5, 2.5, 99.0], 20_000),
        "constant": np.full(5_000, 42.0),
        "two_values": np.r_[np.zeros(9_999), np.ones(1)],
        "tiny": np.array([3.0, 1.0, 2.0]),
    }[shape]
    got = exact_quantiles(_ds(vals), "v", QS, n_bins=64)
    np.testing.assert_array_equal(got, _expected(vals, QS))


def test_collect_path_small_bins(ray_session):
    """Force the bounded-collect branch (max_collect smaller than any bin
    would naturally hold) and verify exact ranks survive the below-count
    bookkeeping."""
    rng = np.random.RandomState(11)
    vals = rng.uniform(0, 1, 50_000)
    got = exact_quantiles(_ds(vals), "v", [0.5, 0.9], n_bins=8,
                          max_collect=2_000)
    np.testing.assert_array_equal(got, _expected(vals, [0.5, 0.9]))


def test_nulls_and_nans_excluded(ray_session):
    """SQL aggregate scope: NULL/NaN rows do not participate in n or ranks."""
    vals = np.array([1.0, np.nan, 3.0, 2.0, np.nan, 4.0])
    ds = ray.data.from_arrow(pa.table({
        "v": pa.array([1.0, None, 3.0, 2.0, None, 4.0], pa.float64())
    }))
    got = exact_quantiles(ds, "v", [0.5, 1.0])
    np.testing.assert_array_equal(got, _expected(vals, [0.5, 1.0]))


def test_all_null_raises(ray_session):
    ds = ray.data.from_arrow(pa.table({"v": pa.array([None, None], pa.float64())}))
    with pytest.raises(ValueError, match="no non-null"):
        exact_quantiles(ds, "v", [0.5])


def test_bad_quantile_raises(ray_session):
    ds = ray.data.from_arrow(pa.table({"v": pa.array([1.0], pa.float64())}))
    with pytest.raises(ValueError, match="must be in"):
        exact_quantiles(ds, "v", [1.5])


def _gds(groups, vals, blocks: int = 7) -> "ray.data.Dataset":
    return ray.data.from_arrow(pa.table({
        "g": pa.array(groups, pa.string()),
        "v": pa.array(vals, pa.float64()),
    })).repartition(blocks)


@pytest.mark.parametrize("q", [0.0, 0.5, 0.9, 1.0])
def test_grouped_matches_per_group_sort_select(q, ray_session):
    rng = np.random.RandomState(5)
    groups = rng.choice(["a", "b", "c"], 20_000)
    vals = np.round(rng.lognormal(1, 2, 20_000), 3)
    got = grouped_exact_quantiles(_gds(groups, vals), "g", "v", q, n_bins=64)
    for gname in ("a", "b", "c"):
        exp = _expected(vals[groups == gname], [q])[0]
        assert got[gname] == exp, (gname, q)


def test_grouped_collect_path_and_skew(ray_session):
    """One giant group plus one 3-row group, max_collect tiny: both the
    bounded-collect branch and the per-group rank bookkeeping must hold."""
    rng = np.random.RandomState(13)
    groups = np.r_[np.repeat("big", 40_000), np.repeat("tiny", 3)]
    vals = np.r_[rng.uniform(0, 1, 40_000), [3.0, 1.0, 2.0]]
    got = grouped_exact_quantiles(_gds(groups, vals), "g", "v", 0.5,
                                  n_bins=8, max_collect=1_000)
    assert got["big"] == _expected(vals[:40_000], [0.5])[0]
    assert got["tiny"] == 2.0


def test_grouped_nulls_excluded(ray_session):
    """NULL values leave their group's n; NULL group rows are dropped."""
    ds = ray.data.from_arrow(pa.table({
        "g": pa.array(["a", "a", "a", None, "b"], pa.string()),
        "v": pa.array([1.0, None, 3.0, 9.0, 5.0], pa.float64()),
    }))
    got = grouped_exact_quantiles(ds, "g", "v", 1.0)
    assert got == {"a": 3.0, "b": 5.0}


def test_grouped_empty_and_bad_q(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "g": pa.array([], pa.string()), "v": pa.array([], pa.float64())}))
    assert grouped_exact_quantiles(ds, "g", "v", 0.5) == {}
    with pytest.raises(ValueError, match="must be in"):
        grouped_exact_quantiles(ds, "g", "v", -0.1)


def test_matches_duckdb_quantile_disc(ray_session):
    """The oracle contract itself: bit-for-bit equal to DuckDB on a mixed
    distribution, including q=0/q=1 endpoints."""
    import duckdb

    rng = np.random.RandomState(3)
    vals = np.round(rng.lognormal(2, 1.5, 30_000), 2)  # many exact ties
    got = exact_quantiles(_ds(vals), "v", QS, n_bins=128)
    exp = [duckdb.sql(
        f"SELECT quantile_disc(v, {q}) FROM (SELECT unnest(?) AS v)",
        params=[list(vals)]).fetchone()[0] for q in QS]
    np.testing.assert_array_equal(got, np.array(exp))
