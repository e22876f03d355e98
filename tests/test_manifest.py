"""Manifest + tail-mode tests (reference analog: S3WriterTest upload-order /
offset-fetch tests, sink/src/test/.../S3WriterTest.java:358-476)."""

import glob
import os

import pandas as pd
import pyarrow.parquet as pq

from kafka_connect_s3_ray.pipelines.tail import tail_changelog
from kafka_connect_s3_ray.pipelines.upsert import lake_table
from kafka_connect_s3_ray.state.manifest import EMPTY_WATERMARK, Manifest
from kafka_connect_s3_ray.synth import oracle_apply, write_fixture


def test_cold_start_watermarks(tmp_path):
    m = Manifest.load(str(tmp_path / "missing.json"))
    assert m.watermark(0) == EMPTY_WATERMARK
    assert m.global_min_watermark(4) == EMPTY_WATERMARK
    assert m.current_files() == {}


def test_commit_load_roundtrip_atomic(tmp_path):
    p = str(tmp_path / "m.json")
    m = Manifest(p)
    m.init_partition(0, ["lake/part=0/base.parquet"])
    m.record_commit(0, "out/part=0/commit-000000000009.parquet", 9, 100, 12, 0.5)
    m.record_commit(1, "out/part=1/commit-000000000004.parquet", 4, 50, 6, 0.2)
    m.schema_fingerprint = "abc"
    m.commit()
    assert not os.path.exists(p + ".tmp")
    m2 = Manifest.load(p)
    assert m2.watermark(0) == 9 and m2.watermark(1) == 4
    assert m2.global_min_watermark(2) == 4
    assert m2.global_min_watermark(3) == EMPTY_WATERMARK  # partition 2 unseen
    assert m2.current_files()[0] == ["out/part=0/commit-000000000009.parquet"]
    assert m2.partitions[0]["files"][0]["num_events"] == 12
    assert m2.schema_fingerprint == "abc"
    # lineage appends
    m2.record_commit(0, "out/part=0/commit-000000000020.parquet", 20, 110, 5, 0.1)
    assert len(m2.partitions[0]["files"]) == 2
    assert m2.current_files()[0] == ["out/part=0/commit-000000000020.parquet"]


def test_tail_mode_incremental(tmp_path):
    """Two ticks: tick 1 sees half the changelog, tick 2 the rest; the final
    table equals the oracle over all events and ticks are idempotent."""
    P = 4
    root = str(tmp_path)
    fx = write_fixture(root, n_conv=100, n_events=2000, num_partitions=P,
                       files_per_partition=2)
    live_dir = os.path.join(root, "live_log")
    # stage only the first file per partition
    later = []
    for p in range(P):
        pdir = os.path.join(live_dir, f"partition={p}")
        os.makedirs(pdir)
        fs = sorted(glob.glob(os.path.join(fx["changelog_dir"], f"partition={p}", "*.parquet")))
        os.link(fs[0], os.path.join(pdir, os.path.basename(fs[0])))
        later.extend(fs[1:])

    ticks = []

    def on_round(i, m):
        ticks.append({p: m.watermark(p) for p in range(P)})
        if i == 1:  # new data arrives between ticks
            for f in later:
                p = os.path.basename(os.path.dirname(f)).split("=")[1]
                os.link(f, os.path.join(live_dir, f"partition={p}", os.path.basename(f)))

    out = os.path.join(root, "out_tail")
    m = tail_changelog(
        live_dir, out, os.path.join(root, "m_tail.json"), lake_dir=fx["lake_dir"],
        num_partitions=P, max_rounds=3, sleep=lambda s: None, on_round=on_round,
    )
    exp = oracle_apply(fx["lake"], fx["events"])
    got = lake_table(m).to_pandas()[exp.columns].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp.reset_index(drop=True), check_dtype=False)
    # watermarks advanced between tick 1 and 2, then stayed (tick 3 = no-op)
    assert all(ticks[1][p] >= ticks[0][p] for p in range(P))
    assert any(ticks[1][p] > ticks[0][p] for p in range(P))
    assert ticks[2] == ticks[1]


def test_empty_changelog_tick_is_noop(tmp_path):
    """A tail tick before any changelog file exists (dirs created, no data)
    commits an empty manifest round instead of crashing."""
    import os

    from kafka_connect_s3_ray.pipelines.upsert import run_upsert

    os.makedirs(tmp_path / "log" / "partition=0")
    m = run_upsert(str(tmp_path / "log"), str(tmp_path / "out"),
                   str(tmp_path / "m.json"), num_partitions=2)
    assert m.watermark(0) == EMPTY_WATERMARK
    assert m.current_files() == {}


def test_concurrent_commit_loser_raises(tmp_path):
    """Optimistic concurrency: two writers that both loaded snapshot N race
    for the N+1 token; the loser raises and the winner's state is intact."""
    import pytest

    from kafka_connect_s3_ray.state.manifest import ConcurrentCommitError, Manifest

    p = str(tmp_path / "m.json")
    base = Manifest(p)
    base.record_commit(0, "a.parquet", 5, 10, 3, 0.1)
    base.commit()

    w1 = Manifest.load(p)
    w2 = Manifest.load(p)
    w1.record_commit(0, "b.parquet", 9, 12, 2, 0.2)
    w1.commit()
    w2.record_commit(0, "c.parquet", 11, 14, 4, 0.3)
    with pytest.raises(ConcurrentCommitError):
        w2.commit()
    live = Manifest.load(p)
    assert live.snapshot_id == 2
    assert live.partitions[0]["current"] == ["b.parquet"]
    # loser recovers by reloading and replaying on top of the winner
    w3 = Manifest.load(p)
    w3.record_commit(0, "c.parquet", 11, 14, 4, 0.3)
    w3.commit()
    assert Manifest.load(p).watermark(0) == 11


def test_crash_between_token_and_pointer_heals_on_load(tmp_path):
    """The snapshot token is the commit point: a crash between the token link
    and the live-pointer replace leaves the pointer one commit behind, and
    ``load()`` must adopt the token (and re-publish the pointer) — NOT hand
    back the stale state that would forever lose the race for the token."""
    import json
    import os

    from kafka_connect_s3_ray.state.manifest import Manifest

    p = str(tmp_path / "m.json")
    m = Manifest(p)
    m.record_commit(0, "a.parquet", 5, 10, 3, 0.1)
    m.commit()

    # simulate the crashed second commit: token v2 exists, live still at v1
    live_v1 = open(p).read()
    crashed = Manifest.load(p)
    crashed.record_commit(0, "b.parquet", 9, 12, 2, 0.777)
    crashed.metrics = {"operation": "upsert", "sum_merge_seconds": 0.777}
    crashed.commit()
    snap_bytes = open(p + ".v2").read()
    open(p, "w").write(live_v1)  # rewind live (as if os.replace never ran)

    healed = Manifest.load(p)
    assert healed.snapshot_id == 2  # token adopted
    assert healed.watermark(0) == 9
    assert open(p).read() == snap_bytes  # pointer re-published

    # replay with NEW input on top must commit v3 cleanly (no brick): the
    # healed watermarks prune the crashed round's offsets, new events apply
    healed.record_commit(0, "c.parquet", 14, 13, 1, 0.2)
    healed.commit()
    assert Manifest.load(p).snapshot_id == 3
    assert json.load(open(p))["partitions"]["0"]["current"] == ["c.parquet"]


def test_identical_replay_race_adopts_token(tmp_path):
    """Two replayers regenerating the IDENTICAL round (same state, different
    wall timings) both succeed — the second adopts the first's token."""
    from kafka_connect_s3_ray.state.manifest import Manifest

    p = str(tmp_path / "m.json")
    base = Manifest(p)
    base.record_commit(0, "a.parquet", 5, 10, 3, 0.1)
    base.commit()

    r1 = Manifest.load(p)
    r2 = Manifest.load(p)
    for r, secs in ((r1, 0.5), (r2, 0.9)):
        r.record_commit(0, "b.parquet", 9, 12, 2, secs)
        r.metrics = {"operation": "upsert", "sum_merge_seconds": secs}
    r1.commit()
    r2.commit()  # same deterministic state: adopt, don't raise
    live = Manifest.load(p)
    assert live.snapshot_id == 2
    assert live.watermark(0) == 9


def test_commit_without_snapshot_guards_live_pointer(tmp_path):
    import pytest

    from kafka_connect_s3_ray.state.manifest import ConcurrentCommitError, Manifest

    p = str(tmp_path / "m.json")
    base = Manifest(p)
    base.record_commit(0, "a.parquet", 5, 10, 3, 0.1)
    base.commit(retain_snapshot=False)

    stale = Manifest(p)  # never loaded the live manifest: thinks it's new
    stale.record_commit(0, "z.parquet", 1, 1, 1, 0.1)
    with pytest.raises(ConcurrentCommitError):
        stale.commit(retain_snapshot=False)


def test_corrupt_token_is_retryable_conflict_not_json_crash(tmp_path):
    """A partial/unreadable snapshot token (no-hardlink fallback writer
    mid-write, or a crashed partial) surfaces as the RETRYABLE
    ConcurrentCommitError, and load() serves the live state instead of
    crashing in the heal path."""
    import pytest

    from kafka_connect_s3_ray.state.manifest import ConcurrentCommitError, Manifest

    p = str(tmp_path / "m.json")
    m = Manifest(p)
    m.record_commit(0, "a.parquet", 5, 10, 3, 0.1)
    m.commit()
    open(p + ".v2", "w").write('{"version": 1, "snapshot_id": 2, TRUNC')

    # heal path: newest token unreadable -> live state, no ValueError
    live = Manifest.load(p)
    assert live.snapshot_id == 1

    w = Manifest.load(p)
    w.record_commit(0, "b.parquet", 9, 12, 2, 0.1)
    with pytest.raises(ConcurrentCommitError, match="not readable"):
        w.commit()
