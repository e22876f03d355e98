"""End-to-end upsert pipeline: correctness vs oracle, idempotent replay,
checkpoint resume, salted skew, schema evolution. Reference analog: the
sink IT matrix incl. the delete-bucket + rewind test
(sink/src/test/.../S3SinkConnectorIT.java:147-612)."""

import hashlib
import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kafka_connect_s3_ray.pipelines.upsert import lake_table, read_lake, run_upsert
from kafka_connect_s3_ray.state.manifest import Manifest
from kafka_connect_s3_ray.synth import HOT_CONV, oracle_apply, synth_changelog, write_fixture

P = 8


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cdc"))
    fx = write_fixture(root, n_conv=300, n_events=8000, num_partitions=P,
                       files_per_partition=3)
    fx["root"] = root
    fx["expected"] = oracle_apply(fx["lake"], fx["events"])
    return fx


def _run(fx, tag, **kw):
    out = os.path.join(fx["root"], f"out_{tag}")
    mpath = os.path.join(fx["root"], f"manifest_{tag}.json")
    m = run_upsert(fx["changelog_dir"], out, mpath, lake_dir=fx["lake_dir"],
                   num_partitions=P, **kw)
    return m, out, mpath


def _assert_matches_oracle(m, expected):
    got = lake_table(m).to_pandas()
    got = got[expected.columns].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, expected.reset_index(drop=True), check_dtype=False)


def _file_hashes(out_dir):
    hashes = {}
    for dirpath, _, files in os.walk(out_dir):
        for f in sorted(files):
            p = os.path.join(dirpath, f)
            hashes[os.path.relpath(p, out_dir)] = hashlib.sha256(open(p, "rb").read()).hexdigest()
    return hashes


def test_full_run_matches_oracle(fixture):
    m, out, _ = _run(fixture, "full")
    _assert_matches_oracle(m, fixture["expected"])
    # watermarks == max offset per partition
    ev = fixture["events"].to_pandas()
    for p_, g in ev.groupby("partition"):
        assert m.watermark(int(p_)) == g["offset"].max()
    # per-partition metrics recorded
    assert m.metrics["partitions_committed"] == P


def test_replay_is_byte_identical(fixture):
    _, out1, _ = _run(fixture, "r1")
    _, out2, _ = _run(fixture, "r2")
    assert _file_hashes(out1) == _file_hashes(out2)


def test_rerun_same_manifest_is_noop_convergent(fixture):
    m1, out, mpath = _run(fixture, "noop")
    h1 = _file_hashes(out)
    wm1 = {p: m1.watermark(p) for p in range(P)}
    # second run over the same changelog with the committed manifest: every
    # event is <= watermark, nothing changes
    m2 = run_upsert(fixture["changelog_dir"], out, mpath,
                    lake_dir=fixture["lake_dir"], num_partitions=P)
    assert {p: m2.watermark(p) for p in range(P)} == wm1
    assert _file_hashes(out) == h1
    _assert_matches_oracle(m2, fixture["expected"])


def test_incremental_resume_from_checkpoint(fixture):
    """Apply the first file-per-partition, commit, then the whole changelog:
    converges to the same final table (watermark filter skips applied events)."""
    root = fixture["root"]
    first_files = []
    import glob

    for p in range(P):
        fs = sorted(glob.glob(os.path.join(fixture["changelog_dir"], f"partition={p}", "*.parquet")))
        first_files.append(fs[0])
    out = os.path.join(root, "out_inc")
    mpath = os.path.join(root, "manifest_inc.json")
    m1 = run_upsert(first_files, out, mpath, lake_dir=fixture["lake_dir"], num_partitions=P)
    assert all(m1.watermark(p) >= 0 for p in range(P))
    m2 = run_upsert(fixture["changelog_dir"], out, mpath, num_partitions=P)
    _assert_matches_oracle(m2, fixture["expected"])
    # final file = same content as single-shot run
    m_full, _, _ = _run(fixture, "full2")
    assert lake_table(m2).equals(lake_table(m_full))


def test_shuffle_and_copartitioned_modes_identical(fixture):
    """The zero-shuffle co-partitioned path and the hash-shuffle path must
    produce byte-identical snapshots."""
    m_co, out_co, _ = _run(fixture, "mode_co", mode="copartitioned")
    m_sh, out_sh, _ = _run(fixture, "mode_sh", mode="shuffle")
    assert _file_hashes(out_co) == _file_hashes(out_sh)
    _assert_matches_oracle(m_sh, fixture["expected"])
    # foreign partition ids violate the co-partitioned contract loudly
    import glob as g

    import pyarrow.parquet as pq_

    bad_dir = os.path.join(fixture["root"], "bad_log", "partition=0")
    os.makedirs(bad_dir, exist_ok=True)
    src = sorted(g.glob(os.path.join(fixture["changelog_dir"], "partition=1", "*.parquet")))[0]
    os.link(src, os.path.join(bad_dir, "log-000000000000.parquet"))
    with pytest.raises(Exception, match="co-partitioned layout contract"):
        run_upsert(os.path.join(fixture["root"], "bad_log"),
                   os.path.join(fixture["root"], "bad_out"),
                   os.path.join(fixture["root"], "bad_m.json"),
                   num_partitions=P, mode="copartitioned")


def test_salted_skew_path_identical_result(fixture):
    m, _, _ = _run(fixture, "salted", hot_keys={HOT_CONV}, n_salts=4)
    _assert_matches_oracle(m, fixture["expected"])


def test_auto_hot_key_detection(fixture):
    from kafka_connect_s3_ray.stages.partitioner import detect_hot_keys
    import ray.data

    ds = ray.data.read_parquet(fixture["changelog_dir"])
    hot = detect_hot_keys(ds, threshold_frac=0.05)
    assert HOT_CONV in hot and len(hot) <= 3


def test_read_lake_streaming(fixture):
    m, _, _ = _run(fixture, "stream")
    ds = read_lake(m)
    assert ds.count() == len(fixture["expected"])


def test_cold_start_no_lake(fixture):
    """No base lake: pipeline builds the table purely from the changelog."""
    root = fixture["root"]
    out = os.path.join(root, "out_cold")
    m = run_upsert(fixture["changelog_dir"], out, os.path.join(root, "m_cold.json"),
                   lake_dir=None, num_partitions=P)
    exp = oracle_apply(None, fixture["events"])
    _assert_matches_oracle(m, exp)


def test_schema_evolution_new_column(fixture, tmp_path):
    """Changelog files carrying an extra payload column ``meta`` merge via
    schema unification; old rows null-filled; all partitions share the final
    schema (FIXTURES.md §3)."""
    ev = synth_changelog(300, 2000, seed=7, num_partitions=P)
    meta = pa.array([f"m{i}" if i % 3 == 0 else None for i in range(len(ev))], pa.string())
    ev = ev.append_column("meta", meta)
    log_dir = str(tmp_path / "log_evo")
    os.makedirs(log_dir)
    pq.write_table(ev, os.path.join(log_dir, "log-000000000000.parquet"))
    out = str(tmp_path / "out_evo")
    m = run_upsert(log_dir, out, str(tmp_path / "m_evo.json"),
                   lake_dir=fixture["lake_dir"], num_partitions=P)
    t = lake_table(m)
    assert "meta" in t.column_names
    exp = oracle_apply(fixture["lake"], ev)
    got = t.to_pandas()[exp.columns].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp.reset_index(drop=True), check_dtype=False)
    assert m.schema_fingerprint
    for files in m.current_files().values():
        assert "meta" in pq.read_schema(files[0]).names
