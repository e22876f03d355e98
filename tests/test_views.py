"""Incrementally-maintained materialized views (pipelines/views.py).

Contract: the incrementally-refreshed conversation-stats view is
bit-identical to a from-scratch rollup of the live lake, and a refresh
touches ONLY partitions whose watermark moved (the CDC promise — O(delta),
never O(lake)). Commit ordering mirrors the reference's data-before-cursor
rule (sink/.../S3Writer.java:47-67): partition files land before the meta
JSON, so a crashed refresh leaves the previous view intact."""

import glob
import os

import pytest

from kafka_connect_s3_ray.pipelines.maintenance import conversation_stats_table
from kafka_connect_s3_ray.pipelines.upsert import read_lake, run_upsert
from kafka_connect_s3_ray.pipelines.views import (
    build_view,
    read_view,
    refresh_view,
    view_table,
)
from kafka_connect_s3_ray.state.manifest import Manifest
from kafka_connect_s3_ray.synth import write_fixture

P = 4


@pytest.fixture()
def fx(tmp_path):
    root = str(tmp_path / "fx")
    write_fixture(root, n_conv=60, n_events=1_500, num_partitions=P,
                  files_per_partition=3)
    return {
        "root": root,
        "lake": os.path.join(root, "lake"),
        "log": os.path.join(root, "changelog"),
        "out": str(tmp_path / "out"),
        "mpath": str(tmp_path / "manifest.json"),
        "view": str(tmp_path / "view"),
    }


def _log_files(fx, part=None):
    pat = (os.path.join(fx["log"], "partition=*", "*.parquet") if part is None
           else os.path.join(fx["log"], f"partition={part}", "*.parquet"))
    return sorted(glob.glob(pat))


def _upsert(fx, changelog):
    return run_upsert(changelog, fx["out"], fx["mpath"], lake_dir=fx["lake"],
                      num_partitions=P)


def test_view_equals_full_rollup_across_rounds(fx):
    # round 1: first file of each partition
    first = [f for p in range(P) for f in _log_files(fx, p)[:1]]
    m = _upsert(fx, first)
    meta1 = refresh_view(fx["mpath"], fx["view"])
    assert meta1["refreshed"] > 0 and meta1["carried"] == 0
    v1 = view_table(fx["view"])
    full1 = conversation_stats_table(read_lake(m))
    assert v1.equals(full1), "initial build must equal from-scratch rollup"

    # round 2: everything (watermarks skip what round 1 applied)
    m = _upsert(fx, fx["log"])
    meta2 = refresh_view(fx["mpath"], fx["view"])
    v2 = view_table(fx["view"])
    full2 = conversation_stats_table(read_lake(m))
    assert v2.equals(full2), "incremental refresh must equal full recompute"
    assert meta2["rows"] == len(v2)


def test_refresh_prunes_unmoved_partitions(fx):
    _upsert(fx, fx["log"])
    refresh_view(fx["mpath"], fx["view"])
    # no new data: nothing recomputes, files untouched
    before = {f: os.path.getmtime(f)
              for f in glob.glob(os.path.join(fx["view"], "view-*.parquet"))}
    meta = refresh_view(fx["mpath"], fx["view"])
    assert meta["refreshed"] == 0
    assert meta["carried"] == len(meta["partitions"])
    after = {f: os.path.getmtime(f)
             for f in glob.glob(os.path.join(fx["view"], "view-*.parquet"))}
    assert before == after


def test_partial_refresh_touches_only_changed_partitions(fx):
    # round 1: first file everywhere; round 2: remaining files of ONE partition
    first = [f for p in range(P) for f in _log_files(fx, p)[:1]]
    _upsert(fx, first)
    refresh_view(fx["mpath"], fx["view"])
    m = _upsert(fx, _log_files(fx, 2)[1:])
    meta = refresh_view(fx["mpath"], fx["view"])
    assert meta["refreshed"] == 1 and meta["carried"] == P - 1
    assert view_table(fx["view"]).equals(
        conversation_stats_table(read_lake(m)))


def test_refresh_is_idempotent_and_deterministic(fx):
    _upsert(fx, fx["log"])
    refresh_view(fx["mpath"], fx["view"])
    files = sorted(glob.glob(os.path.join(fx["view"], "view-*.parquet")))
    bytes1 = [open(f, "rb").read() for f in files]
    # force a full rebuild: same watermarks -> same names -> same bytes
    build_view(fx["mpath"], fx["view"])
    bytes2 = [open(f, "rb").read() for f in files]
    assert bytes1 == bytes2, "rebuild must regenerate identical bytes"


def test_partition_count_change_forces_full_rebuild(fx, tmp_path):
    _upsert(fx, fx["log"])
    refresh_view(fx["mpath"], fx["view"])
    # a view recorded under a different partition count must not carry
    # anything forward
    import json

    mp = os.path.join(fx["view"], "view_meta.json")
    doc = json.load(open(mp))
    doc["num_partitions"] = P * 2
    json.dump(doc, open(mp, "w"))
    meta = refresh_view(fx["mpath"], fx["view"])
    assert meta["carried"] == 0 and meta["refreshed"] > 0
    assert meta["num_partitions"] == P


def test_read_view_streams_same_rows(fx):
    m = _upsert(fx, fx["log"])
    refresh_view(fx["mpath"], fx["view"])
    ds = read_view(fx["view"])
    got = ds.take_all()
    want = conversation_stats_table(read_lake(m))
    assert sorted(r["conv_id"] for r in got) == \
        want.column("conv_id").to_pylist()


def test_view_requires_pinned_manifest(fx):
    Manifest.delete(fx["mpath"])
    with pytest.raises((ValueError, FileNotFoundError)):
        refresh_view(fx["mpath"], fx["view"])
