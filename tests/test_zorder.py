"""Z-order clustering: layout determinism, lossless round-trip, 2-D file
pruning (the point of the Morton curve over a single-column sort), residual
filter exactness. The SQL oracle (zorder_lookup) runs in test_queries."""

import glob
import json

import numpy as np
import pyarrow as pa
import pytest

import ray.data

SF = "/root/testdata/sf0.001"


def _events():
    return ray.data.read_parquet(
        f"{SF}/events.parquet",
        columns=["event_id", "user_id", "value"]).repartition(4)


def test_zorder_roundtrip_lossless(ray_session, tmp_path):
    from kafka_connect_s3_ray.functions.zorder import (zorder_read,
                                                       zorder_write)

    d = str(tmp_path / "z")
    stats = zorder_write(_events(), d, ["user_id", "value"], n_files=8)
    assert sum(f["n"] for f in stats["files"].values()) == _events().count()
    back = zorder_read(d).to_pandas().sort_values(
        "event_id").reset_index(drop=True)
    orig = _events().to_pandas().sort_values(
        "event_id").reset_index(drop=True)
    assert back.equals(orig[back.columns.tolist()])


def test_zorder_prunes_both_dimensions(ray_session, tmp_path):
    from kafka_connect_s3_ray.functions.zorder import (zorder_read,
                                                       zorder_write)

    d = str(tmp_path / "z")
    zorder_write(_events(), d, ["user_id", "value"], n_files=16)
    with open(d + "/zorder_stats.json") as f:
        stats = json.load(f)
    n_all = len(stats["files"])

    def n_kept(preds):
        return sum(
            1 for fs in stats["files"].values()
            if all(fs[c][0] <= hi and fs[c][1] >= lo
                   for c, (lo, hi) in preds.items()))

    # a narrow range on EITHER dimension must prune files — the 2-D claim
    assert n_kept({"user_id": (0.0, 1.0)}) < n_all
    assert n_kept({"value": (0.0, 10.0)}) < n_all


def test_zorder_read_matches_brute_filter(ray_session, tmp_path):
    from kafka_connect_s3_ray.functions.zorder import (zorder_read,
                                                       zorder_write)

    d = str(tmp_path / "z")
    zorder_write(_events(), d, ["user_id", "value"], n_files=16)
    preds = {"user_id": (2.0, 6.0), "value": (15.0, 200.0)}
    got = zorder_read(d, preds).to_pandas().sort_values(
        "event_id").reset_index(drop=True)
    df = _events().to_pandas()
    want = df[(df.user_id >= 2) & (df.user_id <= 6)
              & (df.value >= 15.0) & (df.value <= 200.0)].sort_values(
        "event_id").reset_index(drop=True)
    assert got[["event_id"]].equals(want[["event_id"]])
    # empty intersection: typed empty result, zero rows
    nothing = zorder_read(d, {"user_id": (1e9, 2e9)})
    assert nothing.count() == 0
    assert set(nothing.schema().names) >= {"event_id", "user_id", "value"}


def test_zorder_pruned_read_opens_fewer_files(ray_session, tmp_path,
                                              monkeypatch):
    from kafka_connect_s3_ray.functions import zorder as Z

    d = str(tmp_path / "z")
    Z.zorder_write(_events(), d, ["user_id", "value"], n_files=16)
    opened: list[str] = []
    orig = Z.ray.data.read_parquet

    def spy(paths, *a, **kw):
        opened.extend(paths if isinstance(paths, list) else [paths])
        return orig(paths, *a, **kw)

    monkeypatch.setattr(Z.ray.data, "read_parquet", spy)
    Z.zorder_read(d, {"user_id": (0.0, 1.0),
                      "value": (0.0, 20.0)}).materialize()
    all_files = set(glob.glob(d + "/z-*.parquet"))
    assert opened and set(opened) < all_files


def test_zorder_rejects_nulls_and_bad_args(ray_session, tmp_path):
    from kafka_connect_s3_ray.functions.zorder import (zorder_read,
                                                       zorder_write)

    with pytest.raises(ValueError, match="exactly 2"):
        zorder_write(_events(), str(tmp_path / "z1"), ["user_id"])
    nulls = ray.data.from_arrow(pa.table({
        "a": pa.array([1.0, None]), "b": pa.array([2.0, 3.0])}))
    with pytest.raises(Exception, match="NULL"):
        zorder_write(nulls, str(tmp_path / "z2"), ["a", "b"])
    d = str(tmp_path / "z3")
    zorder_write(_events(), d, ["user_id", "value"], n_files=4)
    with pytest.raises(ValueError, match="no stats"):
        zorder_read(d, {"event_id": (0, 1)})


def test_zorder_key_is_morton(ray_session):
    from kafka_connect_s3_ray.functions.zorder import zorder_key

    a = np.array([0, 1, 0, 0b11], np.uint64)
    b = np.array([0, 0, 1, 0b10], np.uint64)
    # interleave: a bits land at odd positions, b at even
    got = zorder_key(a, b)
    assert got.tolist() == [0, 2, 1, 0b1110]
