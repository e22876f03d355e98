"""Property-based tests (hypothesis): the LWW merge kernel must match the
naive oracle for ARBITRARY event sequences, and compaction must stay
associative under arbitrary splits. Complements the reference's golden-value
tests with randomized coverage it lacked (SURVEY.md §5: 'no property-based
testing')."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kafka_connect_s3_ray.stages.merge import compact_events, lww_merge
from kafka_connect_s3_ray.synth import oracle_apply

KEYS = [("c0", 0), ("c0", 1), ("c1", 0), ("c2", 0), ("c2", 5)]


@st.composite
def event_tables(draw):
    n = draw(st.integers(0, 40))
    rows = []
    for off in range(n):
        conv, turn = draw(st.sampled_from(KEYS))
        op = draw(st.sampled_from(["I", "U", "D"]))
        rows.append(
            {
                "partition": 0,
                "offset": off,
                "op": op,
                "conv_id": conv,
                "turn_idx": turn,
                "role": None if op == "D" else draw(st.sampled_from(["user", "assistant"])),
                "text": None if op == "D" else draw(st.text(max_size=8)),
                "tool": None,
                "ts": None if op == "D" else off,
            }
        )
    return pa.table(
        {
            "partition": pa.array([r["partition"] for r in rows], pa.int32()),
            "offset": pa.array([r["offset"] for r in rows], pa.int64()),
            "op": pa.array([r["op"] for r in rows], pa.string()),
            "conv_id": pa.array([r["conv_id"] for r in rows], pa.string()),
            "turn_idx": pa.array([r["turn_idx"] for r in rows], pa.int32()),
            "role": pa.array([r["role"] for r in rows], pa.string()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
            "tool": pa.array([r["tool"] for r in rows], pa.string()),
            "ts": pa.array([r["ts"] for r in rows], pa.timestamp("us")),
        }
    )


LAKE = pa.table(
    {
        "conv_id": ["c0", "c1"],
        "turn_idx": pa.array([0, 0], pa.int32()),
        "role": ["user", "user"],
        "text": ["base0", "base1"],
        "tool": pa.array([None, None], pa.string()),
        "ts": pa.array([0, 0], pa.timestamp("us")),
    }
)


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(events=event_tables())
def test_merge_equals_oracle(events):
    got = lww_merge(LAKE, events).to_pandas()
    exp = oracle_apply(LAKE, events)
    got = got[exp.columns].reset_index(drop=True).fillna("~")
    exp = exp.reset_index(drop=True).fillna("~")
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(events=event_tables(), split=st.integers(0, 40))
def test_compaction_associative_any_split(events, split):
    split = min(split, len(events))
    a, b = events.slice(0, split), events.slice(split)
    two = compact_events(pa.concat_tables([compact_events(a), compact_events(b)]))
    one = compact_events(events)
    assert two.sort_by("offset").equals(one.sort_by("offset"))


def test_commit_file_rotation(tmp_path):
    """A partition snapshot larger than max_file_rows rotates into several
    deterministic files; the manifest lineage carries all of them."""
    from kafka_connect_s3_ray.pipelines.upsert import _commit_partition, lake_table
    from kafka_connect_s3_ray.state.manifest import Manifest

    n = 1000
    events = pa.table(
        {
            "partition": pa.array([0] * n, pa.int32()),
            "offset": pa.array(range(n), pa.int64()),
            "op": pa.array(["I"] * n),
            "conv_id": pa.array([f"c{i:05d}" for i in range(n)]),
            "turn_idx": pa.array([0] * n, pa.int32()),
            "text": pa.array([f"t{i}" for i in range(n)]),
        }
    )
    target = pa.schema([("conv_id", pa.string()), ("turn_idx", pa.int32()),
                        ("text", pa.string())])
    stats = _commit_partition(0, events, [], -1, str(tmp_path / "out"), target,
                              max_file_rows=300)
    paths = stats.column("path")[0].as_py().split(";")
    assert len(paths) == 4 and all(os.path.exists(p) for p in paths)
    m = Manifest(str(tmp_path / "m.json"))
    m.record_commit(0, stats.column("path")[0].as_py(), 999, n, n, 0.1)
    m.commit()
    m2 = Manifest.load(str(tmp_path / "m.json"))
    assert m2.current_files()[0] == paths
    t = lake_table(m2)
    assert len(t) == n


@st.composite
def patch_tables(draw):
    n = draw(st.integers(0, 40))
    keys = draw(st.lists(st.integers(0, 4), min_size=n, max_size=n))
    a = draw(st.lists(st.one_of(st.none(), st.floats(-9, 9, allow_nan=False)),
                      min_size=n, max_size=n))
    b = draw(st.lists(st.one_of(st.none(), st.integers(0, 99)),
                      min_size=n, max_size=n))
    return pa.table({
        "k": pa.array(keys, pa.int64()),
        "offset": pa.array(list(range(n)), pa.int64()),
        "a": pa.array(a, pa.float64()),
        "b": pa.array([None if x is None else float(x) for x in b],
                      pa.float64()),
    })


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(patch_tables(), st.randoms(use_true_random=False))
def test_patch_merge_matches_naive_and_is_permutation_invariant(t, rnd):
    from kafka_connect_s3_ray.stages.merge import patch_merge

    # naive per-key per-column oracle
    df = t.to_pandas()
    exp = {}
    for _, row in df.sort_values("offset").iterrows():
        e = exp.setdefault(row["k"], {"a": None, "b": None, "n": 0})
        e["n"] += 1
        for c in ("a", "b"):
            if pd.notna(row[c]):
                e[c] = row[c]
    got = patch_merge(t, ["k"], "offset", ["a", "b"], count_col="n")
    gdf = got.to_pandas().sort_values("k").reset_index(drop=True)
    assert len(gdf) == len(exp)
    for _, row in gdf.iterrows():
        e = exp[row["k"]]
        for c in ("a", "b"):
            if e[c] is None:
                assert pd.isna(row[c])
            else:
                assert row[c] == e[c]
        assert row["n"] == e["n"]
    # permutation invariance: offsets are unique, so input row order is noise
    perm = list(range(len(t)))
    rnd.shuffle(perm)
    got2 = patch_merge(t.take(pa.array(perm, type=pa.int64())), ["k"], "offset",
                       ["a", "b"], count_col="n")
    g2 = got2.to_pandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(gdf, g2)
