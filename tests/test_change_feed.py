"""Change data feed: diff_tables kernel + snapshot_diff orchestration.

The feed is the inverse of the merge: applying the emitted I/U/D rows to the
old snapshot (via lww_merge) must reproduce the new one. Reference analog:
each cursor/index commit pins a partition state (sink/.../S3Writer.java:66-109);
the feed diffs two pins, touching only partitions whose cursor moved."""

import glob
import os

import numpy as np
import pyarrow as pa
import pytest

from kafka_connect_s3_ray.pipelines.upsert import (
    lake_table,
    run_upsert,
    snapshot_diff,
)
from kafka_connect_s3_ray.stages.merge import diff_tables, lww_merge
from kafka_connect_s3_ray.synth import write_fixture

P = 4
KEYS = ["conv_id", "turn_idx"]


def _t(rows):
    return pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "text": pa.array([r[2] for r in rows], pa.string()),
        }
    )


def test_diff_kernel_classifies_iud():
    old = _t([("a", 0, "x"), ("b", 0, "y"), ("c", 0, "z")])
    new = _t([("a", 0, "x"), ("b", 0, "Y"), ("d", 0, "w")])
    d = diff_tables(old, new)
    got = {
        (r["conv_id"], r["turn_idx"]): (r["change_op"], r["text"])
        for r in d.to_pylist()
    }
    # unchanged key "a" emits nothing; U carries NEW payload; D carries OLD
    assert got == {
        ("b", 0): ("U", "Y"),
        ("c", 0): ("D", "z"),
        ("d", 0): ("I", "w"),
    }
    # deterministic: key-sorted output
    assert d.column("conv_id").to_pylist() == sorted(d.column("conv_id").to_pylist())


def test_diff_kernel_null_semantics():
    # null == null is EQUAL (no U); null -> value and value -> null are U
    old = _t([("a", 0, None), ("b", 0, None), ("c", 0, "x")])
    new = _t([("a", 0, None), ("b", 0, "v"), ("c", 0, None)])
    d = diff_tables(old, new)
    got = {r["conv_id"]: r["change_op"] for r in d.to_pylist()}
    assert got == {"b": "U", "c": "U"}


def test_diff_kernel_schema_evolution():
    # new side carries an evolved column: old rows compare as null for it
    old = _t([("a", 0, "x"), ("b", 0, "y")])
    new = _t([("a", 0, "x"), ("b", 0, "y")]).append_column(
        "meta", pa.array(["m", None], pa.string())
    )
    d = diff_tables(old, new)
    # only "a" differs (meta null->'m'); "b" has meta null==null -> unchanged
    assert d.to_pylist() == [
        {"conv_id": "a", "turn_idx": 0, "text": "x", "meta": "m", "change_op": "U"}
    ]


def test_diff_kernel_one_sided():
    t = _t([("a", 0, "x"), ("b", 1, "y")])
    all_i = diff_tables(None, t)
    all_d = diff_tables(t, None)
    assert set(all_i.column("change_op").to_pylist()) == {"I"}
    assert set(all_d.column("change_op").to_pylist()) == {"D"}
    assert len(all_i) == len(all_d) == 2
    with pytest.raises(ValueError):
        diff_tables(None, None)


def test_diff_is_inverse_of_merge():
    """Property: lww_merge(old, feed) == new, with D rows as tombstones."""
    rng = np.random.default_rng(7)
    convs = [f"c{i}" for i in range(40)]

    def snap(seed):
        r = np.random.default_rng(seed)
        ks = sorted({(convs[r.integers(40)], int(r.integers(5))) for _ in range(120)})
        return pa.table(
            {
                "conv_id": pa.array([k[0] for k in ks], pa.string()),
                "turn_idx": pa.array([k[1] for k in ks], pa.int32()),
                "text": pa.array(
                    [None if r.random() < 0.1 else f"t{r.integers(8)}" for _ in ks],
                    pa.string(),
                ),
            }
        )

    old, new = snap(1), snap(2)
    d = diff_tables(old, new)
    events = (
        d.rename_columns(
            [c if c != "change_op" else "op" for c in d.column_names]
        )
        .append_column("offset", pa.array(np.arange(len(d)), pa.int64()))
    )
    merged = lww_merge(old, events, key_cols=KEYS)
    assert merged.select(new.column_names).equals(
        new.sort_by([(c, "ascending") for c in KEYS])
    )


@pytest.fixture()
def two_rounds(tmp_path, ray_session):
    root = str(tmp_path)
    fx = write_fixture(root, n_conv=60, n_events=800, num_partitions=P,
                       files_per_partition=2)
    out = os.path.join(root, "out")
    mpath = os.path.join(root, "m.json")
    firsts = [
        sorted(glob.glob(os.path.join(fx["changelog_dir"], f"partition={p}", "*.parquet")))[0]
        for p in range(P)
    ]
    run_upsert(firsts, out, mpath, lake_dir=fx["lake_dir"], num_partitions=P)
    after1 = lake_table(mpath)
    run_upsert(fx["changelog_dir"], out, mpath, num_partitions=P)
    after2 = lake_table(mpath)
    return {"mpath": mpath, "after1": after1, "after2": after2}


def test_snapshot_diff_matches_table_diff(two_rounds):
    import ray

    feed = snapshot_diff(two_rounds["mpath"], from_snapshot=1)
    t = pa.concat_tables(ray.get(feed.to_arrow_refs()))
    t = t.sort_by([(c, "ascending") for c in KEYS])
    expect = diff_tables(two_rounds["after1"], two_rounds["after2"])
    assert t.select(expect.column_names).equals(expect)
    assert len(expect) > 0  # non-vacuous: round 2 changed rows


def test_snapshot_diff_same_snapshot_is_empty(two_rounds):
    feed = snapshot_diff(two_rounds["mpath"], from_snapshot=-1)
    assert feed.count() == 0
    assert "change_op" in feed.schema().names
