"""Mergeable sketches: accuracy vs exact, mergeability, determinism."""

import numpy as np
import pyarrow as pa

import ray.data

from kafka_connect_s3_ray.functions.sketch import (
    HllSketch,
    QuantileSketch,
    approx_distinct,
    approx_quantiles,
)

SF = "/root/testdata/sf0.001"


def test_hll_accuracy_and_merge():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 50_000, 200_000)
    b = rng.integers(25_000, 75_000, 200_000)
    exact = len(np.union1d(np.unique(a), np.unique(b)))
    merged = HllSketch(12).add(a).merge(HllSketch(12).add(b))
    est = merged.estimate()
    assert abs(est - exact) / exact < 0.05  # ~1.6% expected at p=12
    # serialize round trip
    assert HllSketch.deserialize(merged.serialize()).estimate() == est
    # merge == single pass
    single = HllSketch(12).add(np.concatenate([a, b]))
    assert single.estimate() == est


def test_quantile_sketch_accuracy_and_merge():
    rng = np.random.default_rng(1)
    x = rng.lognormal(0, 1, 300_000)
    chunks = np.array_split(x, 7)
    acc = QuantileSketch(1024)
    for c in chunks:
        acc = acc.merge(QuantileSketch(1024).add(c))
    qs = [0.1, 0.5, 0.9, 0.99]
    got = np.asarray(acc.quantile(qs))
    exact = np.quantile(x, qs)
    rel = np.abs(got - exact) / exact
    assert (rel < 0.05).all(), rel
    # deterministic: same input -> same sketch values
    acc2 = QuantileSketch(1024)
    for c in chunks:
        acc2 = acc2.merge(QuantileSketch(1024).add(c))
    assert np.array_equal(np.asarray(acc2.quantile(qs)), got)


def test_distributed_sketches_over_events():
    ds = ray.data.read_parquet(f"{SF}/events.parquet")
    exact_users = ds.to_pandas()["user_id"].nunique()
    est = approx_distinct(ds, "user_id", p=12)
    assert abs(est - exact_users) / max(1, exact_users) < 0.1
    vals = ds.to_pandas()["value"]
    got = approx_quantiles(ds, "value", [0.5, 0.9])
    exact = np.quantile(vals, [0.5, 0.9])
    assert (np.abs(np.asarray(got) - exact) / exact < 0.05).all()


def test_hll_within_3_sigma_of_exact_at_driver_scale():
    """Principled tolerance keyed to the driver sf tables (VERDICT item 10):
    HLL standard error is 1.04/sqrt(2^p); the estimate must land within 3
    sigma of DuckDB's exact distinct count."""
    import duckdb

    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        exact = duckdb.sql(
            f"SELECT count(DISTINCT user_id) FROM '{sf}/events.parquet'"
        ).fetchone()[0]
        ds = ray.data.read_parquet(f"{sf}/events.parquet", columns=["user_id"])
        p = 12
        est = approx_distinct(ds, "user_id", p=p)
        sigma = 1.04 / np.sqrt(2**p)
        assert abs(est - exact) <= 3 * sigma * exact, (sf, est, exact)


def test_quantile_rank_error_bound_at_driver_scale():
    """Quantile-sketch guarantee is on RANK, not value: the empirical CDF at
    each returned value must be within ~2/k of the requested quantile."""
    import duckdb

    k = 1024
    qs = [0.5, 0.9, 0.99]
    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        vals = duckdb.sql(
            f"SELECT value FROM '{sf}/events.parquet'"
        ).df()["value"].to_numpy()
        vals = np.sort(vals[~np.isnan(vals)])
        ds = ray.data.read_parquet(f"{sf}/events.parquet", columns=["value"])
        got = np.asarray(approx_quantiles(ds, "value", qs, k=k))
        for q, v in zip(qs, got):
            rank = np.searchsorted(vals, v, side="right") / len(vals)
            # ~1/k per merge level; 2 levels here (batch sketch + final merge)
            assert abs(rank - q) <= 4.0 / k + 2e-3, (sf, q, v, rank)


def test_grouped_approx_distinct_accuracy_and_nulls(ray_session):
    import pyarrow as pa
    import ray.data

    from kafka_connect_s3_ray.functions.sketch import grouped_approx_distinct

    rng = np.random.RandomState(4)
    true = {"a": 3000, "b": 700, "c": 12}
    gs, vs = [], []
    for gname, n in true.items():
        ids = rng.choice(np.arange(n), n * 4)  # repeats: distinct != rows
        gs += [gname] * len(ids)
        vs += ids.tolist()
    ds = ray.data.from_arrow(pa.table({
        "g": pa.array(gs + [None], pa.string()),
        "v": pa.array(vs + [99], pa.int64()),
    })).repartition(6)
    out = grouped_approx_distinct(ds, "g", "v", p=12)
    got = dict(zip(out["g"], out["estimate"]))
    assert set(got) == set(true)  # NULL group excluded
    for gname, n in true.items():
        sigma = 1.04 / np.sqrt(4096) * n
        assert abs(got[gname] - n) <= max(3 * sigma, 3), (gname, got[gname])


def test_grouped_approx_distinct_null_values_ignored(ray_session):
    """A NULL value must not degrade the int64 numpy dtype (which would
    flip the hash onto the string path) nor count as a distinct value."""
    import pyarrow as pa
    import ray.data

    from kafka_connect_s3_ray.functions.sketch import grouped_approx_distinct

    base = pa.table({"g": pa.array(["a"] * 6, pa.string()),
                     "v": pa.array([1, 2, 3, 1, 2, 3], pa.int64())})
    with_null = pa.table({"g": pa.array(["a"] * 7, pa.string()),
                          "v": pa.array([1, 2, 3, 1, 2, 3, None], pa.int64())})
    e1 = grouped_approx_distinct(ray.data.from_arrow(base), "g", "v")
    e2 = grouped_approx_distinct(ray.data.from_arrow(with_null), "g", "v")
    assert float(e1["estimate"][0]) == float(e2["estimate"][0])


def test_spacesaving_bounds_and_guarantee():
    """count - err <= true <= count for every reported item, and every item
    with true count > N/m is present (the SpaceSaving guarantee), across a
    many-way merge of partial sketches."""
    import collections

    from kafka_connect_s3_ray.functions.sketch import SpaceSavingSketch

    rng = np.random.default_rng(1)
    vals = rng.zipf(1.4, 50_000)
    vals = vals[vals < 5_000]
    true = collections.Counter(vals.tolist())
    m = 128
    parts = [SpaceSavingSketch(m).add(chunk)
             for chunk in np.array_split(vals, 9)]
    acc = parts[0]
    for p in parts[1:]:
        acc = acc.merge(p)
    hh = acc.heavy_hitters()
    assert len(hh) <= m
    for _, r in hh.iterrows():
        t = true[r["item"]]
        assert r["count_est"] - r["err_bound"] <= t <= r["count_est"]
    thresh = len(vals) / m
    present = set(hh["item"])
    for item, cnt in true.items():
        if cnt > thresh:
            assert item in present, (item, cnt, thresh)


def test_spacesaving_exact_when_capacity_suffices():
    import collections

    from kafka_connect_s3_ray.functions.sketch import SpaceSavingSketch

    rng = np.random.default_rng(2)
    vals = rng.integers(0, 200, 10_000)
    true = collections.Counter(vals.tolist())
    s = SpaceSavingSketch(1000)
    for chunk in np.array_split(vals, 7):
        s = s.merge(SpaceSavingSketch(1000).add(chunk))
    hh = s.heavy_hitters()
    assert (hh["err_bound"] == 0).all()
    got = {r["item"]: r["count_est"] for _, r in hh.iterrows()}
    assert got == dict(true)


def test_spacesaving_serialize_roundtrip():
    from kafka_connect_s3_ray.functions.sketch import SpaceSavingSketch

    s = SpaceSavingSketch(8).add(["a", "b", "a", "c"])
    back = SpaceSavingSketch.deserialize(s.serialize())
    assert back.items == s.items and back.m == s.m


def test_heavy_hitters_driver_excludes_nulls(ray_session):
    from kafka_connect_s3_ray.functions.sketch import heavy_hitters

    t = pa.table({"v": pa.array(["x", "x", None, "y", None], pa.string())})
    out = heavy_hitters(ray.data.from_arrow(t), "v", k=5, m=16)
    assert out["item"].tolist() == ["x", "y"]
    assert out["count_est"].tolist() == [2, 1]


def test_grouped_heavy_hitters_exact_and_null_contract(ray_session):
    from kafka_connect_s3_ray.functions.sketch import grouped_heavy_hitters

    t = pa.table({
        "g": pa.array(["a", "a", "a", "b", "b", None, "a"], pa.string()),
        "v": pa.array(["x", "x", "y", "z", "z", "q", None], pa.string())})
    out = grouped_heavy_hitters(ray.data.from_arrow(t), "g", "v", k=2, m=16)
    rows = list(map(tuple, out[["g", "item", "count_est"]].values))
    assert rows == [("a", "x", 2), ("a", "y", 1), ("b", "z", 2)]
    assert (out["err_bound"] == 0).all()


def test_grouped_heavy_hitters_bounds_across_blocks(ray_session):
    """Per-group bounds hold when groups span many blocks and m forces
    evictions."""
    import collections

    from kafka_connect_s3_ray.functions.sketch import grouped_heavy_hitters

    rng = np.random.default_rng(5)
    g = np.where(rng.random(30_000) < 0.5, "p", "q")
    v = rng.zipf(1.5, 30_000)
    v = v[: len(g)]
    t = pa.table({"g": pa.array(g.tolist(), pa.string()),
                  "v": pa.array(v, pa.int64())})
    out = grouped_heavy_hitters(
        ray.data.from_arrow(t).repartition(6), "g", "v", k=20, m=64)
    for grp in ("p", "q"):
        true = collections.Counter(v[g == grp].tolist())
        sub = out[out["g"] == grp]
        for _, r in sub.iterrows():
            tr = true[r["item"]]
            assert r["count_est"] - r["err_bound"] <= tr <= r["count_est"]
