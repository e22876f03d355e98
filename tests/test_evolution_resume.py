"""Schema-evolution + checkpoint interplay (FIXTURES.md §3): replay from a
checkpoint taken BEFORE the evolution point converges to the same final
schema and table as a single-shot run; P is pinned in the manifest."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kafka_connect_s3_ray.pipelines.upsert import lake_table, run_upsert
from kafka_connect_s3_ray.state.manifest import Manifest
from kafka_connect_s3_ray.synth import oracle_apply, synth_changelog, synth_lake
from kafka_connect_s3_ray.stages.partitioner import assign_partitions

P = 4


def _write_changelog(events: pa.Table, root: str, name: str, split_offset: int | None = None):
    """Write partition-dirred changelog; optionally split files at an offset
    boundary so a checkpoint can land between them."""
    import numpy as np

    d = os.path.join(root, name)
    for p in range(P):
        sub = events.filter(pa.compute.equal(events.column("partition"), p))
        pdir = os.path.join(d, f"partition={p}")
        os.makedirs(pdir, exist_ok=True)
        if split_offset is None:
            pq.write_table(sub, os.path.join(pdir, "log-000000000000.parquet"))
        else:
            offs = sub.column("offset").to_numpy(zero_copy_only=False)
            lo = sub.filter(pa.array(offs <= split_offset))
            hi = sub.filter(pa.array(offs > split_offset))
            if len(lo):
                pq.write_table(lo, os.path.join(pdir, "log-000000000000.parquet"))
            if len(hi):
                first = hi.column("offset")[0].as_py()
                pq.write_table(hi, os.path.join(pdir, f"log-{first:012d}.parquet"))
    return d


def test_resume_across_evolution_point(tmp_path):
    root = str(tmp_path)
    lake = synth_lake(100, seed=42)
    events = synth_changelog(100, 2500, seed=42, num_partitions=P,
                             evolution_frac=0.5)
    # an extra evolved payload column appears only in the later half
    import numpy as np

    n = len(events)
    meta = pa.array([f"m{i}" if i >= n // 2 and i % 4 == 0 else None
                     for i in range(n)], pa.string())
    events = events.append_column("meta", meta)

    lake_dir = os.path.join(root, "lake")
    part = assign_partitions(lake.column("conv_id").to_numpy(zero_copy_only=False), P)
    for p in range(P):
        pdir = os.path.join(lake_dir, f"part={p}")
        os.makedirs(pdir)
        pq.write_table(lake.filter(pa.array(part == p)),
                       os.path.join(pdir, "base-000000000000.parquet"))

    split = 200  # per-partition offset boundary well before evolution kicks in
    log_dir = _write_changelog(events, root, "log", split_offset=split)

    # incremental: checkpoint lands after the first (pre-evolution) file set
    first_files = []
    import glob

    for p in range(P):
        first_files.append(sorted(glob.glob(
            os.path.join(log_dir, f"partition={p}", "*.parquet")))[0])
    out = os.path.join(root, "out_inc")
    mpath = os.path.join(root, "m_inc.json")
    run_upsert(first_files, out, mpath, lake_dir=lake_dir, num_partitions=P)
    m1 = Manifest.load(mpath)
    assert all(m1.watermark(p) <= split for p in range(P))
    # resume over the whole (evolved) changelog
    m2 = run_upsert(log_dir, out, mpath, num_partitions=P)

    # single-shot reference run
    out2 = os.path.join(root, "out_full")
    m_full = run_upsert(log_dir, out2, os.path.join(root, "m_full.json"),
                        lake_dir=lake_dir, num_partitions=P)

    t_inc, t_full = lake_table(m2), lake_table(m_full)
    assert t_inc.schema.names == t_full.schema.names
    assert "meta" in t_inc.schema.names
    assert t_inc.equals(t_full)
    assert m2.schema_fingerprint == m_full.schema_fingerprint
    # and both match the oracle
    exp = oracle_apply(lake, events)
    got = t_inc.to_pandas()[exp.columns].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp.reset_index(drop=True), check_dtype=False)


def test_partition_count_pinned(tmp_path):
    root = str(tmp_path)
    events = synth_changelog(50, 400, seed=1, num_partitions=P)
    log_dir = _write_changelog(events, root, "log")
    out = os.path.join(root, "out")
    mpath = os.path.join(root, "m.json")
    run_upsert(log_dir, out, mpath, num_partitions=P)
    with pytest.raises(ValueError, match="num_partitions"):
        run_upsert(log_dir, out, mpath, num_partitions=P * 2)
