"""Merge-on-read delta commits + minor compaction."""

import glob
import os

import pandas as pd
import pytest

from kafka_connect_s3_ray.pipelines.upsert import (
    compact_partitions,
    lake_table,
    read_lake,
    run_upsert,
)
from kafka_connect_s3_ray.pipelines.maintenance import vacuum
from kafka_connect_s3_ray.state.manifest import Manifest
from kafka_connect_s3_ray.synth import oracle_apply, write_fixture

P = 4


@pytest.fixture()
def rounds(tmp_path):
    root = str(tmp_path)
    fx = write_fixture(root, n_conv=80, n_events=1600, num_partitions=P,
                       files_per_partition=3)
    per_part = {
        p: sorted(glob.glob(os.path.join(fx["changelog_dir"], f"partition={p}", "*.parquet")))
        for p in range(P)
    }
    return {"root": root, "per_part": per_part, **fx}


def test_delta_rounds_match_oracle_then_compact(rounds):
    root = rounds["root"]
    out = os.path.join(root, "out")
    mpath = os.path.join(root, "m.json")
    # three incremental delta rounds
    for i in range(3):
        files = [fs[i] for fs in rounds["per_part"].values() if i < len(fs)]
        m = run_upsert(files, out, mpath, lake_dir=rounds["lake_dir"],
                       num_partitions=P, commit_mode="delta")
    assert max(m.delta_counts().values()) == 3
    exp = oracle_apply(rounds["lake"], rounds["events"])
    got = lake_table(m).to_pandas()[exp.columns].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp.reset_index(drop=True), check_dtype=False)
    # streaming read resolves deltas too
    assert read_lake(m).count() == len(exp)
    # delta files are small: they hold change slices, not the partition
    delta_rows = sum(
        e["num_rows"] for st in m.partitions.values() for e in st["files"]
        if e.get("delta")
    )
    assert delta_rows < 2 * len(rounds["events"].to_pandas())

    # minor compaction folds deltas into a fresh base; table unchanged
    before = lake_table(m)
    m2 = compact_partitions(mpath, out)
    assert max(m2.delta_counts().values(), default=0) == 0
    assert lake_table(m2).equals(before)
    # watermarks preserved -> replaying the same changelog is a no-op
    m3 = run_upsert(rounds["changelog_dir"], out, mpath, num_partitions=P,
                    commit_mode="delta")
    assert lake_table(m3).equals(before)
    # vacuum drops the superseded base+delta generation
    deleted = vacuum(mpath, keep_generations=1)
    assert deleted
    assert lake_table(Manifest.load(mpath)).equals(before)


def test_delta_and_rewrite_modes_agree(rounds):
    root = rounds["root"]
    m_d = run_upsert(rounds["changelog_dir"], os.path.join(root, "out_d"),
                     os.path.join(root, "md.json"), lake_dir=rounds["lake_dir"],
                     num_partitions=P, commit_mode="delta")
    m_r = run_upsert(rounds["changelog_dir"], os.path.join(root, "out_r"),
                     os.path.join(root, "mr.json"), lake_dir=rounds["lake_dir"],
                     num_partitions=P, commit_mode="rewrite")
    assert lake_table(m_d).equals(lake_table(m_r))
