"""Synthesizer determinism + invariants (FIXTURES.md §1-2)."""

import numpy as np
import pyarrow as pa

from kafka_connect_s3_ray.schema import CHANGE_SCHEMA, LAKE_SCHEMA
from kafka_connect_s3_ray.stages.partitioner import assign_partitions
from kafka_connect_s3_ray.synth import HOT_CONV, oracle_apply, synth_changelog, synth_lake


def test_lake_shape_and_determinism():
    a = synth_lake(200, seed=42)
    b = synth_lake(200, seed=42)
    assert a.schema.equals(LAKE_SCHEMA)
    assert a.equals(b)
    # sorted by (conv_id, turn_idx); turn_idx dense per conversation
    df = a.to_pandas()
    assert (df.groupby("conv_id")["turn_idx"].apply(lambda s: (s.values == np.arange(len(s))).all())).all()
    lens = df["text"].str.len()
    assert lens.min() >= 3 and lens.max() > 1000  # wide-record tail present


def test_changelog_invariants():
    ev = synth_changelog(200, 5000, seed=42, num_partitions=8)
    assert ev.schema.equals(CHANGE_SCHEMA)
    df = ev.to_pandas()
    # dense monotone offsets per partition
    for p, g in df.groupby("partition"):
        assert (g["offset"].values == np.arange(len(g))).all()
    # partition consistent with hash
    expected = assign_partitions(df["conv_id"].to_numpy(), 8)
    assert (df["partition"].to_numpy() == expected).all()
    # op mix roughly 60/30/10
    mix = df["op"].value_counts(normalize=True)
    assert 0.5 < mix["I"] < 0.7 and 0.2 < mix["U"] < 0.4 and 0.05 < mix["D"] < 0.15
    # hot key holds ~10%
    frac = (df["conv_id"] == HOT_CONV).mean()
    assert 0.08 < frac < 0.16
    # deletes carry null payload
    dels = df[df["op"] == "D"]
    assert dels["text"].isna().all() and dels["role"].isna().all()
    # evolved tool column appears only in the later half
    has_tool = df["tool"].notna()
    assert has_tool.any() and not has_tool[: len(df) // 4].any()


def test_oracle_apply_semantics():
    lake = pa.table(
        {
            "conv_id": ["c1", "c1", "c2"],
            "turn_idx": pa.array([0, 1, 0], pa.int32()),
            "role": ["user", "assistant", "user"],
            "text": ["hello", "hi", "bye"],
            "tool": pa.array([None, None, None], pa.string()),
            "ts": pa.array([1, 2, 3], pa.timestamp("us")),
        }
    )
    events = pa.table(
        {
            "partition": pa.array([0, 0, 0, 0], pa.int32()),
            "offset": pa.array([0, 1, 2, 3], pa.int64()),
            "op": ["U", "D", "U", "U"],
            "conv_id": ["c1", "c2", "c3", "c1"],
            "turn_idx": pa.array([0, 0, 0, 0], pa.int32()),
            "role": ["user", None, "user", "user"],
            "text": ["hello2", None, "new", "hello3"],
            "tool": pa.array([None, None, "search", None], pa.string()),
            "ts": pa.array([10, None, 12, 13], pa.timestamp("us")),
        }
    )
    out = oracle_apply(lake, events)
    state = {(r.conv_id, r.turn_idx): r.text for r in out.itertuples()}
    assert state[("c1", 0)] == "hello3"  # LWW: offset 3 beats 0
    assert ("c2", 0) not in state  # deleted
    assert state[("c3", 0)] == "new"  # inserted
    assert state[("c1", 1)] == "hi"  # untouched lake row survives
