"""Regressions for the round-4 session-C self-review findings:

1. moving_average: an all-NULL window frame must yield NULL sum4/avg4 (SQL
   semantics), not 0.0 — the fixture has no NULL values, so the divergence
   was latent.
2. revenue_filter: a scalar aggregate (no GROUP BY) returns exactly ONE row
   (NULL, 0) when the pushdown predicate matches nothing, never zero rows.
3. pagerank: zero total out-weight / NaN / negative weights raise loudly on
   both paths instead of silently propagating 0/0 NaN through the ranks.
4. _pagerank_sql renders damping at full float precision (0.875 stayed
   0.875, not 0.88).
"""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data


def _events_parquet(tmp_path, df: pd.DataFrame) -> str:
    sf = str(tmp_path)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(sf, "events.parquet"), row_group_size=4)
    return sf


def test_moving_average_all_null_frame_is_null(tmp_path, ray_session):
    from kafka_connect_s3_ray.pipelines.queries import (ORACLE_SQL,
                                                        q_moving_average)

    # user 7's first two values are NULL -> its first frame is all-NULL
    # (SQL sum/avg OVER w = NULL, count = 0); later frames mix NULL+real
    events = pd.DataFrame({
        "event_id": np.arange(10, dtype=np.int64),
        "ts": pd.date_range("2026-01-01", periods=10, freq="1min"),
        "user_id": pd.array([7, 7, 7, 7, 8, 8, 8, 8, 8, 7], dtype="Int64"),
        "event_type": "click",
        "value": pd.array([None, None, 3.0, None, 1.0, None, 2.0, 4.0,
                           None, 5.0], dtype="Float64"),
        "props": "{}",
    })
    sf = _events_parquet(tmp_path, events)
    got = (q_moving_average(sf).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{os.path.join(sf, 'events.parquet')}'")
    exp = (con.execute(ORACLE_SQL["moving_average"]).df()
           .sort_values("event_id").reset_index(drop=True))
    # event 0: all-NULL frame -> NULL aggregates, zero count, on BOTH sides
    assert pd.isna(exp.loc[0, "sum4"]) and pd.isna(got.loc[0, "sum4"])
    assert pd.isna(got.loc[0, "avg4"]) and got.loc[0, "n_frame"] == 0
    for c in ("sum4", "avg4"):
        np.testing.assert_allclose(
            got[c].to_numpy(dtype=np.float64),
            exp[c].to_numpy(dtype=np.float64), rtol=1e-9, equal_nan=True)
    assert got["n_frame"].tolist() == exp["n_frame"].tolist()


def test_revenue_filter_empty_predicate_one_row(tmp_path, ray_session):
    from kafka_connect_s3_ray.pipelines.queries import (ORACLE_SQL,
                                                        q_revenue_filter)

    # every ship date is outside the 1996 window -> predicate matches nothing
    li = pd.DataFrame({
        "l_orderkey": np.arange(6, dtype=np.int64),
        "l_returnflag": "N",
        "l_linestatus": "O",
        "l_quantity": np.array([10.0, 20.0, 5.0, 30.0, 2.0, 8.0]),
        "l_extendedprice": np.linspace(100.0, 600.0, 6),
        "l_discount": np.array([0.05, 0.06, 0.07, 0.05, 0.06, 0.07]),
        "l_shipdate": pd.date_range("1998-03-01", periods=6, freq="D"),
    })
    sf = str(tmp_path)
    pq.write_table(pa.Table.from_pandas(li, preserve_index=False),
                   os.path.join(sf, "lineitem.parquet"))
    res = q_revenue_filter(sf)
    got = res.to_pandas() if hasattr(res, "to_pandas") else res
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"'{os.path.join(sf, 'lineitem.parquet')}'")
    exp = con.execute(ORACLE_SQL["revenue_filter"]).df()
    assert len(got) == 1 == len(exp)
    assert pd.isna(got["revenue"].iloc[0]) and pd.isna(exp["revenue"].iloc[0])
    assert int(got["n_rows"].iloc[0]) == 0 == int(exp["n_rows"].iloc[0])


def test_revenue_filter_nonempty_still_matches(tmp_path, ray_session):
    from kafka_connect_s3_ray.pipelines.queries import (ORACLE_SQL,
                                                        q_revenue_filter)

    li = pd.DataFrame({
        "l_orderkey": np.arange(8, dtype=np.int64),
        "l_returnflag": "N",
        "l_linestatus": "O",
        "l_quantity": np.array([10.0, 25.0, 5.0, 30.0, 2.0, 8.0, 23.0, 12.0]),
        "l_extendedprice": np.linspace(100.0, 800.0, 8),
        "l_discount": np.array([0.05, 0.06, 0.07, 0.05, 0.04, 0.07, 0.06,
                                0.08]),
        "l_shipdate": pd.to_datetime(
            ["1996-03-01", "1996-04-01", "1995-12-31", "1996-06-15",
             "1996-07-01", "1996-12-31", "1997-01-01", "1996-05-05"]),
    })
    sf = str(tmp_path)
    pq.write_table(pa.Table.from_pandas(li, preserve_index=False),
                   os.path.join(sf, "lineitem.parquet"))
    res = q_revenue_filter(sf)
    got = res.to_pandas() if hasattr(res, "to_pandas") else res
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"'{os.path.join(sf, 'lineitem.parquet')}'")
    exp = con.execute(ORACLE_SQL["revenue_filter"]).df()
    assert len(got) == 1
    assert round(float(got["revenue"].iloc[0]), 4) == round(
        float(exp["revenue"].iloc[0]), 4)
    assert int(got["n_rows"].iloc[0]) == int(exp["n_rows"].iloc[0]) > 0


def _edges(rows):
    return ray.data.from_pandas(pd.DataFrame(
        rows, columns=["src", "dst", "w"]))


@pytest.mark.parametrize("method", ["driver", "distributed"])
def test_pagerank_rejects_zero_outweight(method, ray_session):
    from kafka_connect_s3_ray.functions.graph import pagerank

    bad = _edges([("a", "b", 0.0), ("b", "a", 1.0)])
    with pytest.raises(ValueError, match="sum to 0"):
        pagerank(bad, iterations=1, method=method).materialize()


@pytest.mark.parametrize("w", [float("nan"), -1.0, float("inf")])
def test_pagerank_rejects_nonfinite_or_negative(w, ray_session):
    from kafka_connect_s3_ray.functions.graph import pagerank

    bad = _edges([("a", "b", w), ("b", "a", 1.0)])
    with pytest.raises(ValueError, match="finite"):
        pagerank(bad, iterations=1, method="driver").materialize()


def test_pagerank_zero_weight_edge_with_positive_sibling_ok(ray_session):
    # a single 0-weight edge is fine while the src's TOTAL stays positive
    from kafka_connect_s3_ray.functions.graph import pagerank

    ok = _edges([("a", "b", 0.0), ("a", "c", 2.0), ("b", "a", 1.0),
                 ("c", "a", 1.0)])
    out = pagerank(ok, iterations=2, method="driver").to_pandas()
    assert np.isfinite(out["pr"]).all()


def test_pagerank_sql_full_precision_damping():
    from kafka_connect_s3_ray.pipelines.queries import _pagerank_sql

    sql = _pagerank_sql(2, 0.875)
    assert "0.875" in sql and "0.125" in sql
    assert "0.88" not in sql.replace("0.875", "")
