"""Exactly-once under Ray task retries: every compaction task fails once
(injected), Ray retries it, and the final snapshot is byte-identical to a
clean run — the reference's crash-between-upload-and-commit story
(sink/src/test/.../S3SinkConnectorIT.java:474-612) under real task failure."""

import hashlib
import os

import pandas as pd

from kafka_connect_s3_ray.pipelines.upsert import lake_table, run_upsert
from kafka_connect_s3_ray.synth import oracle_apply, write_fixture

P = 4


def _hashes(out_dir):
    out = {}
    for dirpath, _, files in os.walk(out_dir):
        for f in sorted(files):
            p = os.path.join(dirpath, f)
            out[os.path.relpath(p, out_dir)] = hashlib.sha256(open(p, "rb").read()).hexdigest()
    return out


def test_injected_faults_retry_to_identical_output(tmp_path):
    root = str(tmp_path)
    fx = write_fixture(root, n_conv=80, n_events=1500, num_partitions=P)
    # clean run
    out_clean = os.path.join(root, "out_clean")
    m_clean = run_upsert(fx["changelog_dir"], out_clean, os.path.join(root, "m1.json"),
                         lake_dir=fx["lake_dir"], num_partitions=P)
    # faulting run: first attempt of every partition's compaction raises
    fault_dir = os.path.join(root, "faults")
    os.makedirs(fault_dir)
    out_fault = os.path.join(root, "out_fault")
    m_fault = run_upsert(fx["changelog_dir"], out_fault, os.path.join(root, "m2.json"),
                         lake_dir=fx["lake_dir"], num_partitions=P,
                         _fault_inject_dir=fault_dir)
    fired = os.listdir(fault_dir)
    assert len(fired) == P  # every partition actually failed once
    assert _hashes(out_fault) == _hashes(out_clean)
    exp = oracle_apply(fx["lake"], fx["events"])
    got = lake_table(m_fault).to_pandas()[exp.columns].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp.reset_index(drop=True), check_dtype=False)
    assert {p: m_fault.watermark(p) for p in range(P)} == \
           {p: m_clean.watermark(p) for p in range(P)}


def test_tail_retries_concurrent_commit_loser(tmp_path, monkeypatch):
    """A tick that loses the optimistic-concurrency race (another writer
    claimed the snapshot token) is retried like any retryable source error;
    the retry tick reloads the live manifest and replays on top."""
    from kafka_connect_s3_ray.pipelines import tail as tail_mod
    from kafka_connect_s3_ray.pipelines.tail import tail_changelog
    from kafka_connect_s3_ray.state.manifest import ConcurrentCommitError

    root = str(tmp_path)
    fx = write_fixture(root, n_conv=60, n_events=900, num_partitions=P)
    real = tail_mod.run_upsert
    calls = {"n": 0}

    def racy(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise ConcurrentCommitError("snapshot 1 already committed")
        return real(*a, **kw)

    monkeypatch.setattr(tail_mod, "run_upsert", racy)
    m = tail_changelog(fx["changelog_dir"], os.path.join(root, "out"),
                       os.path.join(root, "m.json"), lake_dir=fx["lake_dir"],
                       num_partitions=P, max_rounds=1, sleep=lambda s: None)
    assert calls["n"] == 2  # losing tick retried exactly once
    exp = oracle_apply(fx["lake"], fx["events"])
    got = lake_table(m).to_pandas()[exp.columns].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp.reset_index(drop=True), check_dtype=False)
