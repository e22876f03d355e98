"""Regression tests for the second review pass."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kafka_connect_s3_ray.pipelines.upsert import (
    _files_globally_key_sorted,
    compact_partitions,
    lake_table,
    run_upsert,
)
from kafka_connect_s3_ray.state.manifest import Manifest
from kafka_connect_s3_ray.synth import write_fixture

P = 4


def test_foreign_partitioning_rejected_loudly(tmp_path):
    """A changelog whose 'partition' column disagrees with hash(key) % P must
    error, not silently drop events behind the wrong watermark."""
    from kafka_connect_s3_ray.synth import synth_changelog

    ev = synth_changelog(50, 400, num_partitions=P)
    # sabotage: rotate the partition assignment (simulates murmur2/foreign)
    part = ev.column("partition").to_numpy(zero_copy_only=False)
    ev = ev.set_column(0, "partition", pa.array(((part + 1) % P).astype("int32")))
    log = str(tmp_path / "log")
    os.makedirs(log)
    pq.write_table(ev, os.path.join(log, "log-000000000000.parquet"))
    with pytest.raises(Exception, match="re-bucket|disagrees"):
        run_upsert(log, str(tmp_path / "out"), str(tmp_path / "m.json"),
                   num_partitions=P, mode="shuffle")


def test_compact_noop_preserves_manifest(tmp_path):
    root = str(tmp_path)
    fx = write_fixture(root, n_conv=30, n_events=300, num_partitions=P)
    out = os.path.join(root, "out")
    mpath = os.path.join(root, "m.json")
    m = run_upsert(fx["changelog_dir"], out, mpath, lake_dir=fx["lake_dir"],
                   num_partitions=P)
    fp = m.schema_fingerprint
    metrics = dict(m.metrics)
    m2 = compact_partitions(mpath, out)  # nothing to fold
    m3 = Manifest.load(mpath)
    assert m3.schema_fingerprint == fp
    assert m3.metrics == metrics


def test_streaming_order_guard(tmp_path):
    a = pa.table({"conv_id": ["m", "z"], "turn_idx": pa.array([0, 0], pa.int32())})
    b = pa.table({"conv_id": ["a", "l"], "turn_idx": pa.array([0, 0], pa.int32())})
    fa, fb = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    pq.write_table(a, fa)
    pq.write_table(b, fb)
    assert _files_globally_key_sorted([fb, fa])  # a..l then m..z: ordered
    assert not _files_globally_key_sorted([fa, fb])  # m..z then a..l: NOT


def test_vacuum_keeps_delta_generation_with_its_base(tmp_path):
    """keep_generations=1 after base+deltas+compaction keeps the whole newest
    full generation; deltas never survive without their base."""
    import glob

    from kafka_connect_s3_ray.pipelines.maintenance import vacuum

    root = str(tmp_path)
    fx = write_fixture(root, n_conv=40, n_events=600, num_partitions=P,
                       files_per_partition=2)
    out = os.path.join(root, "out")
    mpath = os.path.join(root, "m.json")
    firsts = [sorted(glob.glob(os.path.join(fx["changelog_dir"], f"partition={p}", "*.parquet")))[0]
              for p in range(P)]
    run_upsert(firsts, out, mpath, lake_dir=fx["lake_dir"], num_partitions=P,
               commit_mode="rewrite")
    run_upsert(fx["changelog_dir"], out, mpath, num_partitions=P, commit_mode="delta")
    m = Manifest.load(mpath)
    before = lake_table(m)
    # newest full generation = rewrite#1 + its deltas; keep_generations=1 must
    # keep ALL of them (deltas depend on the base)
    vacuum(mpath, keep_generations=1)
    m2 = Manifest.load(mpath)
    assert lake_table(m2).equals(before)
    for st in m2.partitions.values():
        for e in st["files"]:
            for path in e["path"].split(";"):
                assert os.path.exists(path), path


def test_delta_file_bytes_deterministic(tmp_path):
    """A replayed delta commit writes byte-identical delta files."""
    import hashlib

    root = str(tmp_path)
    fx = write_fixture(root, n_conv=30, n_events=400, num_partitions=P)

    def run(tag):
        out = os.path.join(root, f"out_{tag}")
        m = run_upsert(fx["changelog_dir"], out, os.path.join(root, f"m_{tag}.json"),
                       lake_dir=fx["lake_dir"], num_partitions=P, commit_mode="delta")
        hashes = {}
        for fs in m.current_files().values():
            for f in fs:
                if os.path.basename(f).startswith("delta-"):
                    hashes[os.path.basename(f)] = hashlib.sha256(
                        open(f, "rb").read()).hexdigest()
        return hashes

    assert run("a") == run("b")
