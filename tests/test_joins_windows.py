"""Unit tests for join strategies and windowed aggregation."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from kafka_connect_s3_ray.stages.joins import asof_join, broadcast_join, hash_join, semi_join
from kafka_connect_s3_ray.stages.windows import session_windows, tumbling_window_agg


def _events_tbl():
    return pa.table(
        {
            "event_id": pa.array(range(8), pa.int64()),
            "user_id": pa.array([1, 1, 1, 2, 2, 3, 3, 3], pa.int64()),
            "ts": pa.array([0, 10, 20, 5, 50, 1, 2, 100], pa.int64()),
            "value": pa.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0]),
        }
    )


def test_broadcast_join_basic():
    ds = ray.data.from_arrow(_events_tbl())
    dim = pd.DataFrame({"user_id": [1, 2], "segment": ["a", "b"]})
    out = broadcast_join(ds, dim, on="user_id").to_pandas()
    assert len(out) == 5  # user 3 dropped (inner)
    assert set(out[out["user_id"] == 1]["segment"]) == {"a"}


def test_semi_and_anti_join():
    ds = ray.data.from_arrow(_events_tbl())
    semi = semi_join(ds, [1, 3], on="user_id").to_pandas()
    assert set(semi["user_id"]) == {1, 3}
    anti = semi_join(ds, [1, 3], on="user_id", anti=True).to_pandas()
    assert set(anti["user_id"]) == {2}


def test_hash_join_native():
    left = ray.data.from_arrow(_events_tbl())
    right = ray.data.from_arrow(
        pa.table({"uid": pa.array([1, 2], pa.int64()),
                  "name": ["alice", "bo"]})
    )
    out = hash_join(left, right, on="user_id", right_on=("uid",),
                    num_partitions=2).to_pandas()
    assert len(out) == 5
    assert set(out["name"]) == {"alice", "bo"}


def test_asof_join_semantics():
    left = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 1, 2], pa.int64()),
                  "t": pa.array([15, 4, 7], pa.int64()),
                  "lv": ["x", "y", "z"]})
    )
    right = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 1, 2, 2], pa.int64()),
                  "t": pa.array([5, 10, 7, 8], pa.int64()),
                  "rv": pa.array([100, 200, 300, 400], pa.int64())})
    )
    out = asof_join(left, right, key="k", ts="t", right_cols=["rv"]).to_pandas()
    m = out.set_index(["k", "t"])["rv"]
    assert m.loc[(1, 15)] == 200  # most recent at-or-before 15 is t=10
    assert np.isnan(m.loc[(1, 4)])  # nothing at-or-before 4
    assert m.loc[(2, 7)] == 300  # inclusive boundary


def test_asof_join_left_int_dtypes_survive():
    """Regression (round-2 red cell): the union+shuffle's null-fill must not
    degrade left-only int columns to float64. Left carries an int64 payload
    (event_id); some left rows are unmatched AND some buckets are right-empty
    — both paths must still emit event_id as int64 with no nulls."""
    left = ray.data.from_arrow(
        pa.table({"event_id": pa.array([10, 11, 12, 13], pa.int64()),
                  "k": pa.array([1, 1, 2, 9], pa.int64()),
                  "t": pa.array([15, 4, 7, 3], pa.int64())})
    )
    right = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2], pa.int64()),
                  "t": pa.array([5, 7], pa.int64()),
                  "rv": pa.array([100, 300], pa.int64())})
    )
    ds = asof_join(left, right, key="k", ts="t", right_cols=["rv"], n_coarse=4)
    sch = ds.schema()
    types = dict(zip(sch.names, sch.types))
    assert types["event_id"] == pa.int64()
    assert types["k"] == pa.int64()
    assert types["t"] == pa.int64()
    out = ds.to_pandas()
    assert len(out) == 4
    assert out["event_id"].dtype == np.int64 and not out["event_id"].isna().any()
    assert sorted(out["event_id"]) == [10, 11, 12, 13]


def test_tumbling_window_agg():
    ds = ray.data.from_arrow(_events_tbl())
    out = tumbling_window_agg(ds, key="user_id", ts="ts", window_us=10,
                              value="value").to_pandas()
    u1 = out[out["user_id"] == 1].sort_values("window").set_index("window")
    assert list(u1.index) == [0, 1, 2] and (u1["n_events"] == 1).all()
    assert u1.loc[1, "total_value"] == 2.0
    u2 = out[out["user_id"] == 2].set_index("window")
    assert u2.loc[0, "n_events"] == 1 and u2.loc[5, "n_events"] == 1


def test_session_windows():
    ds = ray.data.from_arrow(_events_tbl())
    out = session_windows(ds, key="user_id", ts="ts", gap_us=15).to_pandas()
    s = out.set_index("user_id")
    assert s.loc[1, "n_sessions"] == 1  # gaps 10, 10 <= 15
    assert s.loc[2, "n_sessions"] == 2  # gap 45 > 15
    assert s.loc[3, "n_sessions"] == 2  # 1,2 then 100
    assert s.loc[3, "n_events"] == 3


def test_sliding_window_agg():
    from kafka_connect_s3_ray.stages.windows import sliding_window_agg

    ds = ray.data.from_arrow(_events_tbl())
    out = sliding_window_agg(ds, key="user_id", ts="ts", window_us=20, hop_us=10,
                             value="value").to_pandas()
    # user 1 events at ts 0,10,20; window [0,20) has ts 0,10; [10,30) has 10,20
    u1 = out[out["user_id"] == 1].set_index("window_start")
    assert u1.loc[0, "n_events"] == 2 and u1.loc[0, "total_value"] == 3.0
    assert u1.loc[1, "n_events"] == 2 and u1.loc[1, "total_value"] == 5.0
    assert u1.loc[-1, "n_events"] == 1  # window [-10,10) holds ts 0


def _brute_interval_matches(lk, lts, rk, rs, re_):
    out = []
    for i in range(len(lk)):
        for j in range(len(rk)):
            if lk[i] == rk[j] and rs[j] <= lts[i] < re_[j]:
                out.append((i, j))
    return set(out)


def test_interval_walk_matches_brute_force_randomized():
    from kafka_connect_s3_ray.stages.joins import _interval_walk

    rng = np.random.default_rng(7)
    for trial in range(5):
        nl, nr = 120, 80
        lk = rng.integers(0, 6, nl)
        rk = rng.integers(0, 6, nr)
        lts = rng.integers(0, 100, nl).astype(np.int64)
        rs = rng.integers(0, 90, nr).astype(np.int64)
        re_ = rs + rng.integers(1, 30, nr)
        li, ri, total = _interval_walk(lk.astype(np.int64), lts,
                                       rk.astype(np.int64), rs, re_)
        got = set(zip(li.tolist(), ri.tolist()))
        assert got == _brute_interval_matches(lk, lts, rk, rs, re_)
        assert total >= len(got)


def test_interval_walk_hot_key_bounded_candidates():
    """One key with 10^4 disjoint intervals: the walk's expanded candidate
    count must stay ~|queries| (one per left row), not the 10^8 per-key cross
    product a naive equi-join + range filter materializes."""
    from kafka_connect_s3_ray.stages.joins import _interval_walk

    n = 10_000
    rk = np.zeros(n, np.int64)
    rs = np.arange(n, dtype=np.int64) * 10          # [0,10), [10,20), ...
    re_ = rs + 10
    lk = np.zeros(n, np.int64)
    lts = np.arange(n, dtype=np.int64) * 10 + 5     # each hits exactly one
    li, ri, total = _interval_walk(lk, lts, rk, rs, re_)
    assert len(li) == n and (ri == li).all()
    assert total <= n  # zero slack: expansion == match count
    # a long straddling interval adds only its own true matches, never n^2
    rk2 = np.concatenate([rk, [0]])
    rs2 = np.concatenate([rs, [0]]).astype(np.int64)
    re2 = np.concatenate([re_, [n * 10]]).astype(np.int64)
    li2, ri2, total2 = _interval_walk(lk, lts, rk2, rs2, re2)
    assert len(li2) == 2 * n
    assert total2 <= 2 * n + n  # matches + slack, not n^2


def test_range_join_dataset_matches_pandas_brute_force():
    from kafka_connect_s3_ray.stages.joins import range_join

    rng = np.random.default_rng(3)
    left = pd.DataFrame({
        "k": rng.integers(0, 5, 60),
        "t": rng.integers(0, 50, 60),
        "payload": rng.standard_normal(60),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, 5, 40),
        "s": rng.integers(0, 45, 40),
        "rid": np.arange(40),
    })
    right["e"] = right["s"] + rng.integers(1, 20, 40)
    out = range_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                     key="k", ts="t", start="s", end="e",
                     num_partitions=4).to_pandas()
    m = left.merge(right, on="k")
    m = m[(m["s"] <= m["t"]) & (m["t"] < m["e"])]
    key = ["k", "t", "payload", "s", "e", "rid"]
    got = out[key].sort_values(key).reset_index(drop=True)
    want = m[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_hash_join_full_outer_semantics(ray_session):
    """Full outer preserves unmatched rows of BOTH sides with NULLs on the
    other side's columns, and int64 survives the nullable round trip."""
    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 3], pa.int64()),
        "lv": pa.array([10, 20, 30], pa.int64())}))
    right = ray.data.from_arrow(pa.table({
        "rk": pa.array([2, 3, 4], pa.int64()),
        "rv": pa.array([200, 300, 400], pa.int64())}))
    out = hash_join(left, right, on="k", right_on=("rk",),
                    join_type="full", num_partitions=4).to_pandas()
    assert len(out) == 4
    by_pair = {(None if pd.isna(r["k"]) else int(r["k"]),
                None if pd.isna(r["rk"]) else int(r["rk"])): r
               for _, r in out.iterrows()}
    assert set(by_pair) == {(1, None), (2, 2), (3, 3), (None, 4)}
    assert int(by_pair[(2, 2)]["lv"]) == 20 and int(by_pair[(2, 2)]["rv"]) == 200
    assert pd.isna(by_pair[(1, None)]["rv"])
    assert pd.isna(by_pair[(None, 4)]["lv"])
    assert out["lv"].dtype.name in ("int64", "Int64")
    assert out["rv"].dtype.name in ("int64", "Int64")


def test_hash_join_right_equals_flipped_left(ray_session):
    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2], pa.int64()),
        "lv": pa.array([10, 20], pa.int64())}))
    right = ray.data.from_arrow(pa.table({
        "rk": pa.array([2, 3], pa.int64()),
        "rv": pa.array([200, 300], pa.int64())}))
    out = hash_join(left, right, on="k", right_on=("rk",),
                    join_type="right", num_partitions=4).to_pandas()
    # one matched row (2) + one right-only row (3) with NULL left columns
    assert len(out) == 2
    assert sorted(out["rk"].astype(int)) == [2, 3]
    row3 = out[out["rk"] == 3].iloc[0]
    assert pd.isna(row3["k"]) and pd.isna(row3["lv"])
