"""Crafted-fixture tests for the session-C catalog additions beyond the
DuckDB-oracle gate replica (which checks them on the driver tables):

- windowed_dedup: duplicate suppression semantics on a fixture BUILT to have
  in-window duplicates split across parquet row groups (so the per-batch
  combiner alone cannot win), plus the (ts, event_id) tie-break.
- regex_extract: no-match, NULL-text, and empty-text parity against DuckDB.
"""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data


def test_windowed_dedup_cross_block_duplicates(tmp_path, ray_session):
    from kafka_connect_s3_ray.pipelines.queries import (ORACLE_SQL,
                                                        q_windowed_dedup)

    base = pd.Timestamp("2026-02-01 10:00:00")
    rows = []
    # user 1 'click': 4 events inside hour h0 (dup!), 1 in h1
    for i, mins in enumerate([5, 10, 20, 59]):
        rows.append((100 + i, 1, "click", base + pd.Timedelta(minutes=mins)))
    rows.append((200, 1, "click", base + pd.Timedelta(minutes=70)))
    # user 1 'view': same-ts tie inside h0 -> event_id breaks the tie
    tie_ts = base + pd.Timedelta(minutes=30)
    rows.append((301, 1, "view", tie_ts))
    rows.append((300, 1, "view", tie_ts))
    # user 2 'click': straddles the hour boundary -> both kept
    rows.append((400, 2, "click", base + pd.Timedelta(minutes=59)))
    rows.append((401, 2, "click", base + pd.Timedelta(minutes=61)))
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "event_type",
                                     "ts"])
    # shuffle so duplicates land in DIFFERENT row groups (row_group_size=3)
    df = df.sample(frac=1.0, random_state=7).reset_index(drop=True)
    df["value"] = 1.0
    df["props"] = "{}"
    sf = str(tmp_path)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(sf, "events.parquet"), row_group_size=3)

    got = (q_windowed_dedup(sf).to_pandas()
           .sort_values(["user_id", "event_type", "win"])
           .reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{os.path.join(sf, 'events.parquet')}'")
    exp = (con.execute(ORACLE_SQL["windowed_dedup"]).df()
           .sort_values(["user_id", "event_type", "win"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # semantic spot-checks, independent of the oracle
    kept = set(got["event_id"])
    assert kept == {100, 200, 300, 400, 401}
    assert 301 not in kept  # same-ts tie -> smaller event_id wins


def test_regex_extract_null_empty_and_nomatch(tmp_path, ray_session):
    from kafka_connect_s3_ray.pipelines.queries import (ORACLE_SQL,
                                                        q_regex_extract)

    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": ["the quick brown foxes jumped", "ab cd ef", "", None,
                 "UPPER Case Words Only", "exactly fiveee sixsix"],
        "lang": "en", "source": "s", "n_chars": 0,
    })
    sf = str(tmp_path)
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   os.path.join(sf, "documents.parquet"))
    got = (q_regex_extract(sf).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{os.path.join(sf, 'documents.parquet')}'")
    exp = (con.execute(ORACLE_SQL["regex_extract"]).df()
           .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert got.loc[0, "first_long"] == "quick"
    assert got.loc[0, "n_long"] == 4  # quick, brown, foxes, jumped
    assert pd.isna(got.loc[1, "first_long"]) and got.loc[1, "n_long"] == 0
    assert pd.isna(got.loc[2, "first_long"]) and got.loc[2, "n_long"] == 0
    assert pd.isna(got.loc[3, "first_long"]) and pd.isna(got.loc[3, "n_long"])
    # mixed case: no >=5-letter LOWERCASE run anywhere -> null
    assert pd.isna(got.loc[4, "first_long"]) and got.loc[4, "n_long"] == 0
    assert got.loc[5, "first_long"] == "exactly" and got.loc[5, "n_long"] == 3
