"""CLI surfaces for the sanctioned P-change loop and wall-clock tail flush.

The upsert guard refuses a silent partition-count change and names the
explicit re-shard as the way out (reference: changing a connector's
partitioner re-routes records; kafka-connect requires a deliberate
redeploy). These tests drive that loop end-to-end THROUGH the CLI:
repartition -> fresh-epoch upsert at the new P -> invariant validation.
"""

import json
import os

import pyarrow.dataset as pads
import pytest

from kafka_connect_s3_ray.__main__ import main
from kafka_connect_s3_ray.pipelines.upsert import read_lake, run_upsert
from kafka_connect_s3_ray.synth import write_fixture

P = 4


@pytest.fixture()
def committed(tmp_path, ray_session):
    root = str(tmp_path)
    fx = write_fixture(root, n_conv=60, n_events=900, num_partitions=P)
    mpath = os.path.join(root, "m.json")
    run_upsert(fx["changelog_dir"], os.path.join(root, "out"), mpath,
               lake_dir=fx["lake_dir"], num_partitions=P)
    return {"root": root, "mpath": mpath}


def test_cli_repartition_content_parity(committed, capsys, ray_session):
    """`repartition` rebuilds the CURRENT snapshot at new P with identical
    content (per-turn text equality under (conv_id, turn_idx) order), and
    every new base file is key-sorted within its new bucket."""
    new_lake = os.path.join(committed["root"], "lake8")
    assert main(["repartition", "--manifest", committed["mpath"],
                 "--out-lake", new_lake, "--partitions", "8"]) == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["partitions"] == 8

    # `part` is the bucket id and legitimately changes under the new P —
    # parity is over the payload columns
    old = read_lake(committed["mpath"]).to_pandas().drop(
        columns=["part"], errors="ignore")
    new = pads.dataset(new_lake).to_table().to_pandas()
    key = ["conv_id", "turn_idx"]
    old = old.sort_values(key).reset_index(drop=True)
    new = new.sort_values(key).reset_index(drop=True)[old.columns]
    assert report["rows"] == len(old)
    assert old.equals(new)


def test_cli_repartition_then_upsert_at_new_p(committed, capsys, tmp_path,
                                              ray_session):
    """The re-shard starts a fresh changelog epoch: an upsert at the NEW P
    against the new lake is accepted (the old manifest would refuse) and
    the merged lake still holds the key-uniqueness invariant."""
    root = committed["root"]
    new_lake = os.path.join(root, "lake8")
    assert main(["repartition", "--manifest", committed["mpath"],
                 "--out-lake", new_lake, "--partitions", "8"]) == 0
    fx2 = write_fixture(os.path.join(root, "epoch2"), n_conv=60,
                        n_events=700, num_partitions=8, seed=7)
    m8 = os.path.join(root, "m8.json")
    run_upsert(fx2["changelog_dir"], os.path.join(root, "out8"), m8,
               lake_dir=new_lake, num_partitions=8)
    assert main(["validate", "--manifest", m8]) == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["duplicate_keys"] == 0
    assert len(report["partitions"]) == 8
    # the old-P guard still fires against the old manifest
    with pytest.raises(ValueError, match="num_partitions"):
        run_upsert(fx2["changelog_dir"], os.path.join(root, "out_bad"),
                   committed["mpath"], num_partitions=8)


def test_cli_tail_wall_clock_flush_flags(tmp_path, capsys, ray_session):
    """`tail --flush-interval-ms/--grace-ms` (reference rotate.schedule
    semantics, ms units) drives the W4 grace flush through the CLI."""
    root = str(tmp_path)
    fx = write_fixture(root, n_conv=30, n_events=400, num_partitions=2)
    assert main(["tail", "--changelog", fx["changelog_dir"],
                 "--out", os.path.join(root, "out"),
                 "--manifest", os.path.join(root, "mt.json"),
                 "--lake", fx["lake_dir"], "--partitions", "2",
                 "--rounds", "2", "--poll-interval", "0.05",
                 "--commit-mode", "delta",
                 "--flush-interval-ms", "40", "--grace-ms", "20"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(out["watermarks"]) == {"0", "1"}
    assert all(v >= 0 for v in out["watermarks"].values())


def test_cli_stats_summary_and_table(committed, capsys, ray_session):
    """`stats` rolls the committed lake up per conversation and prints the
    corpus summary; --out writes the per-conversation table whose sums
    equal the summary."""
    import pyarrow.parquet as pq

    out = os.path.join(committed["root"], "stats.parquet")
    assert main(["stats", "--manifest", committed["mpath"],
                 "--out", out]) == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    t = pq.read_table(out)
    assert summary["conversations"] == len(t)
    assert summary["turns"] == sum(t.column("turns").to_pylist())
    assert summary["tokens_ws"] == sum(t.column("tokens_ws").to_pylist())
    lake = read_lake(committed["mpath"]).to_pandas()
    assert summary["turns"] == len(lake)
    assert summary["tool_turns"] == int(lake["tool"].notna().sum())


def test_cli_profile_lake_audit(committed, capsys, ray_session):
    """`profile` audits every lake column: row counts equal the lake, NULL
    and distinct counts match a direct pandas check, --out writes the full
    typed table."""
    import pyarrow.parquet as pq

    out = os.path.join(committed["root"], "profile.parquet")
    assert main(["profile", "--manifest", committed["mpath"],
                 "--out", out]) == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    lake = read_lake(committed["mpath"]).to_pandas()
    cols = summary["columns"]
    assert set(cols) == set(lake.columns)
    for c, row in cols.items():
        assert row["n_rows"] == len(lake)
        assert row["n_nulls"] == int(lake[c].isna().sum())
        assert row["n_distinct"] == int(lake[c].dropna().nunique())
    t = pq.read_table(out)
    assert set(t.column("col").to_pylist()) == set(lake.columns)


def test_cli_query_catalog_surface(tmp_path, capsys, ray_session):
    """`query` runs any catalog entry by name over a table directory:
    --list enumerates the full catalog, a run prints rows/columns/preview
    and --out writes the parquet result; unknown names exit 2."""
    import pyarrow.parquet as pq

    assert main(["query", "--list"]) == 0
    names = json.loads(capsys.readouterr().out.strip())["queries"]
    assert "lang_id" in names and len(names) >= 140

    out = os.path.join(str(tmp_path), "langid.parquet")
    assert main(["query", "--name", "lang_id",
                 "--sf", "/root/testdata/sf0.001", "--out", out,
                 "--limit", "3"]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    t = pq.read_table(out)
    assert res["rows"] == len(t) > 0
    assert res["columns"] == t.column_names
    assert len(res["preview"]) == 3

    assert main(["query", "--name", "not_a_query"]) == 2
