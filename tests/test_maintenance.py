"""Lake maintenance: vacuum lineage GC + invariant validation."""

import os

import pytest

from kafka_connect_s3_ray.pipelines.maintenance import validate_lake, vacuum
from kafka_connect_s3_ray.pipelines.upsert import run_upsert
from kafka_connect_s3_ray.state.manifest import Manifest
from kafka_connect_s3_ray.synth import write_fixture

P = 4


@pytest.fixture()
def two_generations(tmp_path):
    root = str(tmp_path)
    fx = write_fixture(root, n_conv=60, n_events=800, num_partitions=P,
                       files_per_partition=2)
    import glob

    out = os.path.join(root, "out")
    mpath = os.path.join(root, "m.json")
    firsts = [sorted(glob.glob(os.path.join(fx["changelog_dir"], f"partition={p}", "*.parquet")))[0]
              for p in range(P)]
    run_upsert(firsts, out, mpath, lake_dir=fx["lake_dir"], num_partitions=P)
    run_upsert(fx["changelog_dir"], out, mpath, num_partitions=P)
    return {"mpath": mpath, "out": out}


def test_validate_ok_then_vacuum(two_generations):
    mpath = two_generations["mpath"]
    report = validate_lake(mpath)
    assert report["total_rows"] > 0 and report["duplicate_keys"] == 0
    m = Manifest.load(mpath)
    assert all(len(st["files"]) == 2 for st in m.partitions.values())
    # dry run deletes nothing
    would = vacuum(mpath, keep_generations=1, dry_run=True)
    assert would and all(os.path.exists(p) for p in would)
    deleted = vacuum(mpath, keep_generations=1)
    assert sorted(deleted) == sorted(would)
    assert all(not os.path.exists(p) for p in deleted)
    # current snapshot untouched and still valid
    report2 = validate_lake(mpath)
    assert report2["total_rows"] == report["total_rows"]
    m2 = Manifest.load(mpath)
    assert all(len(st["files"]) == 1 for st in m2.partitions.values())


def test_validate_catches_duplicates(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "part=0"
    d.mkdir()
    t = pa.table({"conv_id": ["a", "a"], "turn_idx": pa.array([0, 0], pa.int32()),
                  "text": ["x", "y"]})
    pq.write_table(t, str(d / "commit-000000000001.parquet"))
    m = Manifest(str(tmp_path / "m.json"))
    m.record_commit(0, str(d / "commit-000000000001.parquet"), 1, 2, 2, 0.0)
    m.commit()
    with pytest.raises(AssertionError, match="duplicate keys"):
        validate_lake(m)


def test_validate_catches_unsorted(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "part=0"
    d.mkdir()
    t = pa.table({"conv_id": ["b", "a"], "turn_idx": pa.array([0, 0], pa.int32()),
                  "text": ["x", "y"]})
    pq.write_table(t, str(d / "commit-000000000001.parquet"))
    m = Manifest(str(tmp_path / "m.json"))
    m.record_commit(0, str(d / "commit-000000000001.parquet"), 1, 2, 2, 0.0)
    with pytest.raises(AssertionError, match="not key-sorted"):
        validate_lake(m)


def test_noop_vacuum_does_not_grow_commit_log(tmp_path, ray_session):
    """A periodic vacuum that deletes nothing must not retain a new snapshot
    each run — an hourly cron on a quiet lake would otherwise grow the
    transaction log without bound."""
    from kafka_connect_s3_ray.pipelines.maintenance import vacuum
    from kafka_connect_s3_ray.pipelines.upsert import run_upsert
    from kafka_connect_s3_ray.state.manifest import Manifest
    from kafka_connect_s3_ray.synth import write_fixture

    root = str(tmp_path)
    fx = write_fixture(root, n_conv=30, n_events=300, num_partitions=2)
    mpath = os.path.join(root, "m.json")
    run_upsert(fx["changelog_dir"], os.path.join(root, "out"), mpath,
               lake_dir=fx["lake_dir"], num_partitions=2)
    first = vacuum(mpath, keep_generations=1)
    snaps_after_first = Manifest.snapshots(mpath)
    for _ in range(3):  # quiet lake: repeated vacuums are no-ops
        assert vacuum(mpath, keep_generations=1) == []
    assert Manifest.snapshots(mpath) == snaps_after_first


def test_vacuum_retries_after_losing_commit_race(tmp_path, ray_session):
    """A vacuum holding a stale manifest object must survive a concurrent
    writer's commit: reload, re-apply the lineage trim, commit on top."""
    from kafka_connect_s3_ray.synth import write_fixture

    root = str(tmp_path)
    fx = write_fixture(root, n_conv=30, n_events=400, num_partitions=2,
                       files_per_partition=2)
    mpath = os.path.join(root, "m.json")
    out = os.path.join(root, "out")
    import glob as g
    firsts = [sorted(g.glob(os.path.join(fx["changelog_dir"], f"partition={p}",
                                         "*.parquet")))[0] for p in range(2)]
    run_upsert(firsts, out, mpath, lake_dir=fx["lake_dir"], num_partitions=2)
    run_upsert(fx["changelog_dir"], out, mpath, num_partitions=2)

    stale = Manifest.load(mpath)          # vacuum's view: snapshot 2
    # a concurrent writer wins snapshot 3 before vacuum commits
    winner = Manifest.load(mpath)
    winner.metrics = {"operation": "touch"}
    winner.commit()

    deleted = vacuum(stale, keep_generations=1)
    assert deleted  # two rounds -> at least one old generation vacuumed
    live = Manifest.load(mpath)
    assert live.snapshot_id == 4          # winner's 3 + vacuum's retried 4
    for st in live.partitions.values():
        for e in st["files"]:
            for pth in e["path"].split(";"):
                assert os.path.exists(pth) or pth in st["current"]
    assert validate_lake(live)["duplicate_keys"] == 0


def test_export_refuses_reused_directory(tmp_path, ray_session):
    """Exporting into a directory that already holds parquet would leave the
    UNION of both runs on disk while any count describes one run — the CLI
    must refuse and demand a fresh directory."""
    import json

    from kafka_connect_s3_ray.__main__ import main
    from kafka_connect_s3_ray.synth import write_fixture

    root = str(tmp_path)
    fx = write_fixture(root, n_conv=20, n_events=200, num_partitions=2)
    mpath = os.path.join(root, "m.json")
    run_upsert(fx["changelog_dir"], os.path.join(root, "out"), mpath,
               lake_dir=fx["lake_dir"], num_partitions=2)
    exp = os.path.join(root, "exp")
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        assert main(["export", "--manifest", mpath, "--out", exp]) == 0
    rows = json.loads(buf.getvalue().strip().splitlines()[-1])["rows"]
    assert rows > 0  # footer-metadata count of the files just written
    assert main(["export", "--manifest", mpath, "--out", exp]) == 2  # refused
