"""Property-based tests for the round-2 kernels: batch Jaccard, batch
shingling, coarse-bucket hash join, LWW streaming with deltas — each checked
against an independent reference implementation on randomized inputs."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_connect_s3_ray.functions.dedup import (
    _batch_jaccard,
    _shingle_hashes,
    _shingle_sets_batch,
)

TEXT = st.text(alphabet=st.characters(codec="utf-8", exclude_categories=["Cs"]),
               max_size=120)


@settings(max_examples=60, deadline=None)
@given(st.lists(TEXT, max_size=12), st.integers(2, 9))
def test_shingle_batch_equals_per_doc(texts, k):
    """The batch shingle pass must equal per-doc extraction exactly."""
    flat, counts = _shingle_sets_batch(texts, k)
    assert len(counts) == len(texts)
    starts = np.cumsum(counts) - counts
    for i, t in enumerate(texts):
        got = flat[starts[i] : starts[i] + counts[i]]
        one, _ = _shingle_sets_batch([t], k)
        assert np.array_equal(got, one)
        assert np.array_equal(got, np.unique(got))  # sorted + unique


@settings(max_examples=60, deadline=None)
@given(st.lists(
    st.tuples(st.lists(st.integers(0, 300), max_size=40),
              st.lists(st.integers(0, 300), max_size=40)),
    max_size=20,
))
def test_batch_jaccard_matches_set_arithmetic(pairs):
    lsets = [np.unique(np.array(a, np.uint64)) for a, _ in pairs]
    rsets = [np.unique(np.array(b, np.uint64)) for _, b in pairs]
    got = _batch_jaccard(lsets, rsets)
    for i, (a, b) in enumerate(zip(lsets, rsets)):
        inter = len(set(a.tolist()) & set(b.tolist()))
        union = len(set(a.tolist()) | set(b.tolist()))
        exp = inter / union if union else 0.0
        assert abs(got[i] - exp) < 1e-12


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 15), st.integers(0, 100)), max_size=40),
    st.lists(st.tuples(st.integers(0, 15), st.text(alphabet="abc", max_size=2)),
             max_size=20),
)
def test_hash_join_matches_pandas_merge(left_rows, right_rows):
    """Coarse-bucket hash join == pandas merge on randomized int keys,
    including duplicate keys on both sides."""
    import ray.data

    from kafka_connect_s3_ray.stages.joins import hash_join

    ldf = pd.DataFrame(left_rows, columns=["k", "v"]).astype({"k": np.int64, "v": np.int64})
    rdf = pd.DataFrame(right_rows, columns=["k", "s"]).astype({"k": np.int64})
    if ldf.empty or rdf.empty:
        return  # empty datasets have no schema to join on
    out = hash_join(ray.data.from_pandas(ldf), ray.data.from_pandas(rdf),
                    on="k", num_partitions=4).to_pandas()
    exp = ldf.merge(rdf, on="k")
    if exp.empty:
        # Ray's to_pandas drops columns when every block is empty (the
        # Dataset.schema() itself stays correct) — only the row count is
        # comparable here
        assert len(out) == 0
        return
    key = lambda d: d.sort_values(["k", "v", "s"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(key(out), key(exp), check_dtype=False)


@settings(max_examples=20, deadline=None)
@given(st.data())
def test_streaming_merge_with_deltas_matches_oracle(data):
    """Randomized lake + two event rounds: delta commit then rewrite (both
    thresholds) must equal the naive single-process oracle."""
    import pyarrow.parquet as pq

    from kafka_connect_s3_ray.pipelines.upsert import _commit_partition
    from kafka_connect_s3_ray.synth import oracle_apply, synth_changelog, synth_lake

    import os
    import tempfile

    seed = data.draw(st.integers(0, 10_000))
    n_conv = data.draw(st.integers(5, 40))
    n_ev = data.draw(st.integers(10, 300))
    lake = synth_lake(n_conv, seed=seed).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    events = synth_changelog(n_conv, n_ev, seed=seed, num_partitions=1)
    half = len(events) // 2
    ev1, ev2 = events.slice(0, half), events.slice(half)
    with tempfile.TemporaryDirectory() as td:
        lf = os.path.join(td, "lake.parquet")
        pq.write_table(lake, lf)
        d = _commit_partition(0, ev1, [lf], -1, os.path.join(td, "o"),
                              lake.schema, commit_mode="delta")
        files = [lf, d.column("path")[0].as_py()]
        wm1 = int(pa.compute.max(ev1.column("offset")).as_py())
        out = _commit_partition(0, ev2, files, wm1, os.path.join(td, "s"),
                                lake.schema, streaming_threshold_rows=0)
        got = pa.concat_tables(
            [pq.read_table(f) for f in out.column("path")[0].as_py().split(";")]
        ).to_pandas()
    exp = oracle_apply(lake, events)
    got = got[exp.columns].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp.reset_index(drop=True), check_dtype=False)
