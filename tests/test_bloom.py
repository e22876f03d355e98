"""Bloom sidecar pruning for point lookups: filter math, deterministic
bytes, commit wiring (rewrite/streaming/delta all emit sidecars), lookup
correctness + actual file pruning, vacuum cleanup, and graceful fallback."""

import glob
import os

import numpy as np
import pytest

from kafka_connect_s3_ray.pipelines.maintenance import lookup, vacuum
from kafka_connect_s3_ray.pipelines.upsert import run_upsert
from kafka_connect_s3_ray.state.bloom import (
    bloom_contains,
    bloom_path,
    build_bloom,
    file_might_contain,
)
from kafka_connect_s3_ray.state.manifest import Manifest
from kafka_connect_s3_ray.synth import write_fixture

P = 4


def test_bloom_no_false_negatives_and_low_fp_rate():
    keys = [f"conv-{i:05d}" for i in range(2000)]
    blob = build_bloom(keys, fp_rate=0.01)
    assert all(bloom_contains(blob, k) for k in keys)
    absent = [f"other-{i:05d}" for i in range(2000)]
    fp = sum(bloom_contains(blob, k) for k in absent) / len(absent)
    assert fp < 0.05, f"false-positive rate {fp} way above the 0.01 target"


def test_bloom_bytes_deterministic_over_key_set():
    a = build_bloom(["x", "y", "z"])
    b = build_bloom(["z", "x", "y", "y", "x"])  # order/dupes don't matter
    assert a == b
    assert build_bloom(["x", "y"]) != a


def test_bloom_missing_or_corrupt_sidecar_means_might_contain(tmp_path):
    data = str(tmp_path / "f.parquet")
    assert file_might_contain(data, "anything")  # no sidecar at all
    with open(bloom_path(data), "wb") as f:
        f.write(b"garbage")
    assert file_might_contain(data, "anything")  # unreadable sidecar
    with pytest.raises(ValueError):
        bloom_contains(b"garbage", "k")


@pytest.fixture()
def committed_lake(tmp_path):
    root = str(tmp_path)
    fx = write_fixture(root, n_conv=60, n_events=800, num_partitions=P,
                       files_per_partition=2)
    out = os.path.join(root, "out")
    mpath = os.path.join(root, "m.json")
    firsts = [sorted(glob.glob(os.path.join(
        fx["changelog_dir"], f"partition={p}", "*.parquet")))[0]
        for p in range(P)]
    run_upsert(firsts, out, mpath, lake_dir=fx["lake_dir"], num_partitions=P)
    run_upsert(fx["changelog_dir"], out, mpath, num_partitions=P)
    return {"mpath": mpath, "out": out}


def test_every_committed_file_has_a_sidecar_and_lookup_agrees(committed_lake):
    m = Manifest.load(committed_lake["mpath"])
    current = [f for st in m.partitions.values() for f in st["current"]]
    assert current
    for f in current:
        assert os.path.exists(bloom_path(f)), f"missing sidecar for {f}"
    # a present key: same rows with and without sidecars on disk
    hit = lookup(committed_lake["mpath"], "conv-00000001")
    assert hit is not None and len(hit) > 0
    for f in current:
        os.rename(bloom_path(f), bloom_path(f) + ".hidden")
    try:
        bare = lookup(committed_lake["mpath"], "conv-00000001")
        assert hit.sort_by("turn_idx").equals(bare.sort_by("turn_idx"))
    finally:
        for f in current:
            os.rename(bloom_path(f) + ".hidden", bloom_path(f))


def test_lookup_absent_key_prunes_every_file(committed_lake, monkeypatch):
    import pyarrow.dataset as pads

    opened = []
    real = pads.dataset

    def spy(path, *a, **kw):
        opened.append(path)
        return real(path, *a, **kw)

    monkeypatch.setattr(pads, "dataset", spy)
    got = lookup(committed_lake["mpath"], "no-such-conversation-xyz")
    # committed partition + definitely-absent key: EMPTY table, and the
    # blooms rejected every file so no data file was opened at all
    assert got is not None and len(got) == 0
    assert "conv_id" in got.schema.names
    assert opened == [], f"bloom should have pruned these reads: {opened}"


def test_bloom_sidecars_replay_byte_identical(committed_lake):
    m = Manifest.load(committed_lake["mpath"])
    current = [f for st in m.partitions.values() for f in st["current"]]
    before = {f: open(bloom_path(f), "rb").read() for f in current}
    # idempotent replay of the same changelog rewrites identical sidecars
    root = os.path.dirname(committed_lake["mpath"])
    run_upsert(os.path.join(root, "changelog"), committed_lake["out"],
               committed_lake["mpath"], num_partitions=P)
    for f, blob in before.items():
        assert open(bloom_path(f), "rb").read() == blob


def test_vacuum_removes_sidecars_with_their_files(committed_lake):
    deleted = vacuum(committed_lake["mpath"], keep_generations=1)
    assert deleted
    for path in deleted:
        assert not os.path.exists(path)
        assert not os.path.exists(bloom_path(path)), (
            f"orphaned sidecar {bloom_path(path)}")
