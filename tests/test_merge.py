"""LWW merge kernel unit tests (reference analog: FormatTests round-trips +
golden-output block-writer tests, SURVEY.md §5)."""

import numpy as np
import pandas as pd
import pyarrow as pa

from kafka_connect_s3_ray.stages.merge import (
    align_to_schema,
    compact_events,
    last_per_key,
    lww_merge,
)
from kafka_connect_s3_ray.synth import oracle_apply, synth_changelog, synth_lake


def _ev(rows):
    cols = ["partition", "offset", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts"]
    d = {c: [r.get(c) for r in rows] for c in cols}
    return pa.table(
        {
            "partition": pa.array(d["partition"], pa.int32()),
            "offset": pa.array(d["offset"], pa.int64()),
            "op": pa.array(d["op"], pa.string()),
            "conv_id": pa.array(d["conv_id"], pa.string()),
            "turn_idx": pa.array(d["turn_idx"], pa.int32()),
            "role": pa.array(d["role"], pa.string()),
            "text": pa.array(d["text"], pa.string()),
            "tool": pa.array(d["tool"], pa.string()),
            "ts": pa.array(d["ts"], pa.timestamp("us")),
        }
    )


def test_compact_keeps_max_offset_and_is_associative():
    ev = synth_changelog(100, 3000, seed=42, num_partitions=4)
    full = compact_events(ev)
    df = full.to_pandas()
    # one row per key, and it is the max-offset row within its partition
    assert not df.duplicated(["conv_id", "turn_idx"]).any()
    raw = ev.to_pandas()
    exp = raw.loc[raw.groupby(["conv_id", "turn_idx"])["offset"].idxmax()]
    got = df.set_index(["conv_id", "turn_idx"]).sort_index()
    exp = exp.set_index(["conv_id", "turn_idx"]).sort_index()
    pd.testing.assert_frame_equal(got, exp, check_like=True)
    # associativity: compact(compact(a)+compact(b)) == compact(a+b)
    a, b = ev.slice(0, 1500), ev.slice(1500)
    two_phase = compact_events(pa.concat_tables([compact_events(a), compact_events(b)]))
    assert two_phase.sort_by("offset").equals(full.sort_by("offset"))
    # idempotence
    assert compact_events(full).sort_by("offset").equals(full.sort_by("offset"))


def test_lww_merge_semantics():
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
    events = _ev(
        [
            dict(partition=0, offset=0, op="U", conv_id="c1", turn_idx=0, role="user", text="v1", ts=10),
            dict(partition=0, offset=5, op="U", conv_id="c1", turn_idx=0, role="user", text="v2", ts=11),
            dict(partition=0, offset=1, op="D", conv_id="c2", turn_idx=0),
            dict(partition=0, offset=2, op="I", conv_id="c3", turn_idx=0, role="user", text="new", ts=12),
            dict(partition=0, offset=3, op="D", conv_id="c4", turn_idx=9),  # delete of absent key
        ]
    )
    out = lww_merge(lake, events).to_pandas().set_index(["conv_id", "turn_idx"])
    assert out.loc[("c1", 0), "text"] == "v2"  # LWW
    assert out.loc[("c1", 1), "text"] == "hi"  # untouched survivor
    assert ("c2", 0) not in out.index  # deleted
    assert out.loc[("c3", 0), "text"] == "new"  # inserted
    assert ("c4", 9) not in out.index  # delete of absent key is a no-op
    assert list(out.columns) == ["role", "text", "tool", "ts"]  # provenance dropped
    # sorted by key
    assert list(out.index) == sorted(out.index)


def test_delete_then_reinsert():
    events = _ev(
        [
            dict(partition=0, offset=0, op="I", conv_id="c9", turn_idx=0, role="user", text="first", ts=1),
            dict(partition=0, offset=1, op="D", conv_id="c9", turn_idx=0),
            dict(partition=0, offset=2, op="I", conv_id="c9", turn_idx=0, role="user", text="again", ts=2),
        ]
    )
    out = lww_merge(None, events).to_pandas()
    assert len(out) == 1 and out.iloc[0]["text"] == "again"


def test_schema_evolution_extra_column():
    lake = pa.table(
        {
            "conv_id": ["c1"],
            "turn_idx": pa.array([0], pa.int32()),
            "role": ["user"],
            "text": ["old"],
            "tool": pa.array([None], pa.string()),
            "ts": pa.array([1], pa.timestamp("us")),
        }
    )
    events = _ev(
        [dict(partition=0, offset=0, op="I", conv_id="c2", turn_idx=0, role="user", text="new", ts=2)]
    ).append_column("meta", pa.array(["m1"], pa.string()))
    out = lww_merge(lake, events)
    assert "meta" in out.column_names
    df = out.to_pandas().set_index("conv_id")
    assert df.loc["c1", "meta"] is None or pd.isna(df.loc["c1", "meta"])  # null-filled old row
    assert df.loc["c2", "meta"] == "m1"


def test_merge_matches_oracle_end_to_end():
    lake = synth_lake(300, seed=42)
    events = synth_changelog(300, 8000, seed=42, num_partitions=8)
    got = lww_merge(lake, events).to_pandas().reset_index(drop=True)
    exp = oracle_apply(lake, events)
    got = got[exp.columns]
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_last_per_key_and_align():
    t = pa.table({"k": ["a", "a", "b"], "v": [1, 2, 3]})
    out = last_per_key(t, ["k"])
    assert out.to_pydict() == {"k": ["a", "b"], "v": [2, 3]}
    target = pa.schema([("k", pa.string()), ("v", pa.int64()), ("w", pa.string())])
    al = align_to_schema(t, target)
    assert al.schema.equals(target) and al.column("w").null_count == 3


def test_patch_merge_matches_duckdb_max_by():
    """Coalescing partial-update merge: per key, per column, last non-null in
    offset order — checked value-for-value against DuckDB max_by + FILTER."""
    import duckdb

    from kafka_connect_s3_ray.stages.merge import patch_merge

    rng = np.random.default_rng(11)
    n = 4000
    t = pa.table({
        "k": rng.integers(0, 250, n),
        "g": rng.choice(["x", "y", "z"], n),  # composite string key part
        "offset": rng.permutation(n),
        "a": pa.array(np.where(rng.random(n) < 0.5,
                               rng.random(n).round(3), np.nan),
                      from_pandas=True),
        "b": pa.array(np.where(rng.random(n) < 0.2,
                               rng.integers(0, 9, n).astype(float), np.nan),
                      from_pandas=True),
    })
    got = (patch_merge(t, ["k", "g"], "offset", ["a", "b"], count_col="n")
           .to_pandas().sort_values(["k", "g"]).reset_index(drop=True))
    exp = duckdb.sql(
        'SELECT k, g, max_by(a, "offset") FILTER (a IS NOT NULL) AS a, '
        'max_by(b, "offset") FILTER (b IS NOT NULL) AS b, '
        'CAST(count(*) AS BIGINT) AS n FROM t GROUP BY k, g ORDER BY k, g'
    ).df()
    pd.testing.assert_frame_equal(
        got.astype({"k": "int64"}), exp.astype({"k": "int64"}),
        check_dtype=False)


def test_patch_merge_vs_whole_row_lww():
    """The semantic point: a newest row with NULLs must NOT erase columns an
    older row set (whole-row LWW does; patch merge must not)."""
    from kafka_connect_s3_ray.stages.merge import compact_events, patch_merge

    t = pa.table({
        "k": [1, 1, 1],
        "offset": [10, 20, 30],
        "a": pa.array([1.0, None, None], pa.float64()),
        "b": pa.array([None, 2.0, None], pa.float64()),
    })
    out = patch_merge(t, ["k"], "offset").to_pydict()
    assert out == {"k": [1], "a": [1.0], "b": [2.0]}
    lww = compact_events(t, ["k"], "offset").to_pydict()
    assert lww["a"] == [None] and lww["b"] == [None]  # what LWW would do
    # never-set column stays NULL; empty input keeps the schema
    t2 = pa.table({"k": [5], "offset": [1],
                   "a": pa.array([None], pa.float64()),
                   "b": pa.array([None], pa.float64())})
    out2 = patch_merge(t2, ["k"], "offset", count_col="n").to_pydict()
    assert out2 == {"k": [5], "a": [None], "b": [None], "n": [1]}
    empty = patch_merge(t.slice(0, 0), ["k"], "offset", count_col="n")
    assert empty.num_rows == 0
    assert empty.schema.names == ["k", "a", "b", "n"]
