"""Regressions for the round-4 session-B self-review findings:

1. export --format jsonl keeps ISO microsecond timestamps (pandas to_json
   defaults to epoch-ms, silently truncating lake event times).
2. _tokens_ws_sql_for counts like Python str.split() on edge whitespace
   (DuckDB trim() strips only spaces; trim-then-split over-counts tabs).
3. users_intersect survives NULL users split across blocks with a pinned
   partial schema (int64 everywhere, no double drift), matching INTERSECT's
   NULL-matches-NULL semantics.
"""

import json
import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data


def test_export_jsonl_iso_microsecond_timestamps(tmp_path, ray_session):
    from kafka_connect_s3_ray.__main__ import main
    from kafka_connect_s3_ray.pipelines.upsert import run_upsert
    from kafka_connect_s3_ray.synth import write_fixture

    root = str(tmp_path)
    fx = write_fixture(root, n_conv=20, n_events=200, num_partitions=2)
    mpath = os.path.join(root, "m.json")
    run_upsert(fx["changelog_dir"], os.path.join(root, "out"), mpath,
               lake_dir=fx["lake_dir"], num_partitions=2)
    out = os.path.join(root, "jl")
    assert main(["export", "--manifest", mpath, "--out", out,
                 "--format", "jsonl"]) == 0
    rows = []
    for dirpath, _, fnames in os.walk(out):
        for fn in fnames:
            if fn.endswith(".json"):
                with open(os.path.join(dirpath, fn)) as fh:
                    rows += [json.loads(ln) for ln in fh]
    assert rows
    ts = rows[0]["ts"]
    # ISO-8601 string with sub-second precision, not an epoch-ms integer
    assert isinstance(ts, str) and "T" in ts
    assert pd.Timestamp(ts) is not None


def test_tokens_ws_sql_matches_python_split_on_edge_whitespace():
    from kafka_connect_s3_ray.pipelines.queries import _tokens_ws_sql_for

    tricky = ["\tok", "ok\n", " a  b ", "", "   ", None, "a\tb\nc",
              "\n\t x \t\n"]
    df = pd.DataFrame({"s": tricky})
    got = duckdb.sql(
        f"SELECT {_tokens_ws_sql_for('s')} AS n FROM df").df()["n"].tolist()
    exp = [0 if s is None else len(s.split()) for s in tricky]
    assert got == exp


def test_users_intersect_null_users_across_blocks(tmp_path, ray_session):
    from kafka_connect_s3_ray.pipelines.queries import (ORACLE_SQL,
                                                        q_users_intersect)

    # NULL users click in one region and purchase in another, so blocks
    # disagree about NULL presence — the schema-drift trap
    events = pd.DataFrame({
        "event_id": np.arange(12, dtype=np.int64),
        "ts": pd.Timestamp("2026-01-01"),
        "user_id": pd.array([1, 1, 2, None, 3, 2, None, 4, 4, 5, None, 1],
                            dtype="Int64"),
        "event_type": ["click", "purchase", "click", "click", "view",
                       "purchase", "purchase", "click", "click", "purchase",
                       "click", "view"],
        "value": 1.0,
        "props": "{}",
    })
    sf = str(tmp_path)
    pq.write_table(pa.Table.from_pandas(events, preserve_index=False),
                   os.path.join(sf, "events.parquet"), row_group_size=3)
    got = (q_users_intersect(sf).to_pandas()["user_id"]
           .astype("Int64").sort_values(na_position="last")
           .reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{os.path.join(sf, 'events.parquet')}'")
    exp = (con.execute(ORACLE_SQL["users_intersect"]).df()["user_id"]
           .astype("Int64").sort_values(na_position="last")
           .reset_index(drop=True))
    pd.testing.assert_series_equal(got, exp, check_names=False)
    assert exp.isna().any()  # the NULL user genuinely intersects
