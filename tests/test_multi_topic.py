"""Multi-topic lakes: per-topic isolation, regex subscription, independent
resume."""

import os
import shutil

import pandas as pd
import pyarrow as pa

from kafka_connect_s3_ray.pipelines.multi import discover_topics, run_upsert_topics
from kafka_connect_s3_ray.pipelines.upsert import lake_table
from kafka_connect_s3_ray.synth import oracle_apply, write_fixture

P = 4


def _setup(root):
    expected = {}
    for i, t in enumerate(["chatlogs", "agent_runs", "evals"]):
        sub = os.path.join(root, "stage")
        shutil.rmtree(sub, ignore_errors=True)
        fx = write_fixture(sub, n_conv=40 + i * 10, n_events=600 + i * 100,
                           seed=42 + i, num_partitions=P)
        os.makedirs(os.path.join(root, "changelog"), exist_ok=True)
        os.makedirs(os.path.join(root, "lake"), exist_ok=True)
        shutil.move(fx["changelog_dir"], os.path.join(root, "changelog", f"topic={t}"))
        shutil.move(fx["lake_dir"], os.path.join(root, "lake", t))
        expected[t] = oracle_apply(fx["lake"], fx["events"])
    return expected


def test_multi_topic_upserts(tmp_path):
    root = str(tmp_path)
    expected = _setup(root)
    assert discover_topics(os.path.join(root, "changelog")) == \
        ["agent_runs", "chatlogs", "evals"]
    assert discover_topics(os.path.join(root, "changelog"), r"chat.*") == ["chatlogs"]

    results = run_upsert_topics(
        os.path.join(root, "changelog"), os.path.join(root, "out"),
        os.path.join(root, "manifests"), lake_root=os.path.join(root, "lake"),
        num_partitions=P,
    )
    assert set(results) == set(expected)
    for t, m in results.items():
        exp = expected[t]
        got = lake_table(m).to_pandas()[exp.columns].reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp.reset_index(drop=True),
                                      check_dtype=False)
    # re-run is a no-op (per-topic watermarks hold)
    again = run_upsert_topics(
        os.path.join(root, "changelog"), os.path.join(root, "out"),
        os.path.join(root, "manifests"), lake_root=os.path.join(root, "lake"),
        num_partitions=P,
    )
    for t in expected:
        assert {p: again[t].watermark(p) for p in range(P)} == \
               {p: results[t].watermark(p) for p in range(P)}
