"""Point lookup + explicit lake repartition."""

import os

import pandas as pd
import pytest

from kafka_connect_s3_ray.pipelines.maintenance import lookup, repartition_lake
from kafka_connect_s3_ray.pipelines.upsert import lake_table, run_upsert
from kafka_connect_s3_ray.synth import oracle_apply, write_fixture

P = 4


@pytest.fixture(scope="module")
def committed(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("lkp"))
    fx = write_fixture(root, n_conv=120, n_events=2000, num_partitions=P)
    out = os.path.join(root, "out")
    mpath = os.path.join(root, "m.json")
    m = run_upsert(fx["changelog_dir"], out, mpath, lake_dir=fx["lake_dir"],
                   num_partitions=P)
    return {"root": root, "m": m, "mpath": mpath, **fx}


def test_lookup_conversation(committed):
    exp = oracle_apply(committed["lake"], committed["events"])
    some_conv = exp["conv_id"].iloc[5]
    got = lookup(committed["m"], some_conv).to_pandas()
    want = exp[exp["conv_id"] == some_conv].reset_index(drop=True)
    assert list(got["turn_idx"]) == list(want["turn_idx"])
    assert list(got["text"]) == list(want["text"])
    # single turn
    one = lookup(committed["m"], some_conv, int(want["turn_idx"].iloc[0]))
    assert len(one) == 1 and one.column("text")[0].as_py() == want["text"].iloc[0]
    # absent key -> empty
    assert len(lookup(committed["m"], "conv-99999999")) == 0


def test_repartition_lake_roundtrip(committed):
    root = committed["root"]
    new_lake = os.path.join(root, "lake_p8")
    report = repartition_lake(committed["mpath"], new_lake, new_partitions=8)
    assert report["rows"] == len(lake_table(committed["m"]))
    # the re-sharded base feeds a fresh pipeline epoch: cold manifest, new P
    import pyarrow as pa
    import pyarrow.parquet as pq

    files = []
    for p in range(8):
        d = os.path.join(new_lake, f"part={p}")
        if os.path.isdir(d):
            files += [os.path.join(d, f) for f in os.listdir(d)]
    t = pa.concat_tables([pq.read_table(f) for f in files])
    t = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    assert t.equals(lake_table(committed["m"]))
    # per-file key consistency: every row routes to its directory's partition
    from kafka_connect_s3_ray.stages.partitioner import assign_partitions

    for f in files:
        sub = pq.read_table(f, columns=["conv_id"])
        p = int(os.path.basename(os.path.dirname(f)).split("=")[1])
        parts = assign_partitions(sub.column("conv_id").to_numpy(zero_copy_only=False), 8)
        assert (parts == p).all()
