"""Time travel: versioned-manifest snapshots, historical reads, vacuum GC.

Every ``Manifest.commit`` retains ``<manifest>.v<N>`` (the transaction log);
``read_lake/lake_table(..., snapshot=N)`` reads the lake as of commit N.
Reference analog: the cursor + chunk-index pair pins a reconstructable
point-in-time view per partition (sink/.../S3Writer.java:66-109)."""

import glob
import os

import pytest

from kafka_connect_s3_ray.pipelines.maintenance import vacuum
from kafka_connect_s3_ray.pipelines.upsert import lake_table, run_upsert
from kafka_connect_s3_ray.state.manifest import Manifest
from kafka_connect_s3_ray.synth import write_fixture

P = 4


@pytest.fixture()
def two_rounds(tmp_path):
    """Two upsert rounds; captures the live lake table after each."""
    root = str(tmp_path)
    fx = write_fixture(root, n_conv=60, n_events=800, num_partitions=P,
                       files_per_partition=2)
    out = os.path.join(root, "out")
    mpath = os.path.join(root, "m.json")
    firsts = [sorted(glob.glob(os.path.join(fx["changelog_dir"], f"partition={p}", "*.parquet")))[0]
              for p in range(P)]
    run_upsert(firsts, out, mpath, lake_dir=fx["lake_dir"], num_partitions=P)
    after1 = lake_table(mpath)
    run_upsert(fx["changelog_dir"], out, mpath, num_partitions=P)
    after2 = lake_table(mpath)
    return {"mpath": mpath, "after1": after1, "after2": after2}


def test_snapshot_log_retained(two_rounds):
    mpath = two_rounds["mpath"]
    assert Manifest.snapshots(mpath) == [1, 2]
    assert Manifest.load(mpath).snapshot_id == 2
    # each retained snapshot is the manifest exactly as committed then
    s1 = Manifest.load_snapshot(mpath, 1)
    s2 = Manifest.load_snapshot(mpath, 2)
    assert s1.snapshot_id == 1 and s2.snapshot_id == 2
    assert s2.current_files() == Manifest.load(mpath).current_files()
    with pytest.raises(FileNotFoundError, match="retained"):
        Manifest.load_snapshot(mpath, 99)


def test_time_travel_read_matches_history(two_rounds):
    mpath = two_rounds["mpath"]
    # snapshot 1 reproduces the lake as it was after round 1 — bit-for-bit
    assert lake_table(mpath, snapshot=1).equals(two_rounds["after1"])
    assert lake_table(mpath, snapshot=2).equals(two_rounds["after2"])
    # negative index: -1 = latest, -2 = previous
    assert lake_table(mpath, snapshot=-1).equals(two_rounds["after2"])
    assert lake_table(mpath, snapshot=-2).equals(two_rounds["after1"])
    # history differs from the present (round 2 applied more events)
    assert not two_rounds["after1"].equals(two_rounds["after2"])


def test_snapshot_for_watermark(two_rounds):
    mpath = two_rounds["mpath"]
    s1 = Manifest.load_snapshot(mpath, 1)
    s2 = Manifest.load_snapshot(mpath, 2)
    wm1 = max(st["high_watermark"] for st in s1.partitions.values())
    wm2 = max(st["high_watermark"] for st in s2.partitions.values())
    assert wm2 > wm1
    assert Manifest.snapshot_for_watermark(mpath, wm1) == 1
    assert Manifest.snapshot_for_watermark(mpath, wm2) == 2
    assert Manifest.snapshot_for_watermark(mpath, wm1 - 1_000_000) is None


def test_vacuum_prunes_dead_snapshots(two_rounds):
    mpath = two_rounds["mpath"]
    deleted = vacuum(mpath, keep_generations=1)
    assert deleted  # round-1 fileset is gone
    # snapshot 1 depended on those files -> its manifest was pruned and a
    # time-travel read fails loudly at the driver
    assert 1 not in Manifest.snapshots(mpath)
    with pytest.raises(FileNotFoundError):
        lake_table(mpath, snapshot=1)
    # snapshot 2 (the current fileset) is still readable
    assert lake_table(mpath, snapshot=2).equals(two_rounds["after2"])
    assert lake_table(mpath).equals(two_rounds["after2"])


def test_vacuum_keep_two_generations_keeps_history(two_rounds):
    mpath = two_rounds["mpath"]
    assert vacuum(mpath, keep_generations=2) == []
    assert lake_table(mpath, snapshot=1).equals(two_rounds["after1"])


def test_lookup_time_travel(two_rounds):
    """Point reads resolve against a historical snapshot's fileset."""
    from kafka_connect_s3_ray.pipelines.maintenance import lookup

    mpath = two_rounds["mpath"]
    for snap, table in ((1, two_rounds["after1"]), (None, two_rounds["after2"])):
        cid = table.column("conv_id")[0].as_py()
        expect = table.filter(
            __import__("pyarrow").compute.equal(table.column("conv_id"), cid))
        got = lookup(mpath, cid, snapshot=snap)
        assert got is not None and len(got) == len(expect)
        assert sorted(got.column("turn_idx").to_pylist()) == \
            sorted(expect.column("turn_idx").to_pylist())


def test_snapshots_cli(two_rounds, capsys):
    """`snapshots` lists the commit log without touching Ray (it must return
    before the CLI's ray.init/shutdown, which would kill the test session)."""
    import json

    from kafka_connect_s3_ray.__main__ import main

    assert main(["snapshots", "--manifest", two_rounds["mpath"]]) == 0
    doc = json.loads(capsys.readouterr().out)
    assert doc["live_snapshot_id"] == 2
    assert [s["snapshot_id"] for s in doc["snapshots"]] == [1, 2]
    assert all(s["readable"] for s in doc["snapshots"])
