"""funnel: the per-bucket vectorized min-over-condition chain must match
hand-computed stage times, including strict-after tie semantics, users who
stall mid-funnel, and out-of-order arrivals."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from kafka_connect_s3_ray.functions.funnel import funnel


def _ds(rows, blocks=3):
    return ray.data.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows], pa.string()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
    })).repartition(blocks)


def _got(rows, stages, **kw):
    out = funnel(_ds(rows), stages, **kw).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def test_hand_computed_chain():
    rows = [
        # user 1: clean view(10) -> click(20) -> purchase(30)
        (1, "view", 10), (1, "click", 20), (1, "purchase", 30),
        # user 2: click BEFORE first view never counts; second click does
        (2, "click", 5), (2, "view", 10), (2, "click", 15), (2, "purchase", 40),
        # user 3: stalls after view (purchase precedes any post-view click)
        (3, "view", 10), (3, "purchase", 20),
        # user 4: never views, but exists in the table
        (4, "click", 10), (4, "purchase", 20),
        # user 5: earliest of several valid candidates wins at each stage
        (5, "view", 1), (5, "view", 3), (5, "click", 2), (5, "click", 4),
        (5, "purchase", 3), (5, "purchase", 9),
    ]
    out = _got(rows, ["view", "click", "purchase"])
    exp = pd.DataFrame({
        "user_id": [1, 2, 3, 4, 5],
        "t_view": [10, 10, 10, np.nan, 1],
        "t_click": [20, 15, np.nan, np.nan, 2],
        "t_purchase": [30, 40, np.nan, np.nan, 3],
    })
    for c in ["t_view", "t_click", "t_purchase"]:
        got = out[c].astype("int64", errors="ignore")
        for i in range(len(exp)):
            e = exp[c][i]
            v = out[c][i]
            if np.isnan(e):
                assert pd.isna(v), (c, i)
            else:
                assert v == pd.Timestamp(int(e), unit="us"), (c, i, v)


def test_strictly_after_ties_excluded():
    # click at the SAME ts as the first view does not advance the funnel
    rows = [(1, "view", 10), (1, "click", 10), (1, "click", 11)]
    out = _got(rows, ["view", "click"])
    assert out["t_click"][0] == pd.Timestamp(11, unit="us")
    rows2 = [(1, "view", 10), (1, "click", 10)]
    out2 = _got(rows2, ["view", "click"])
    assert pd.isna(out2["t_click"][0])


def test_matches_sql_reference_on_random_sequences(ray_session):
    import duckdb

    rng = np.random.RandomState(11)
    rows = [(int(rng.randint(0, 40)),
             str(rng.choice(["view", "click", "purchase", "other"])),
             int(rng.randint(0, 1000)))
            for _ in range(2000)]
    out = _got(rows, ["view", "click", "purchase"])
    df = pd.DataFrame(rows, columns=["user_id", "event_type", "ts_i"])
    df["ts"] = pd.to_datetime(df["ts_i"], unit="us")
    exp = duckdb.sql("""
        WITH u AS (SELECT DISTINCT user_id FROM df),
        v AS (SELECT user_id, min(ts) t_view FROM df
              WHERE event_type='view' GROUP BY user_id),
        c AS (SELECT e.user_id, min(e.ts) t_click FROM df e
              JOIN v ON e.user_id=v.user_id AND e.event_type='click'
              AND e.ts > v.t_view GROUP BY e.user_id),
        p AS (SELECT e.user_id, min(e.ts) t_purchase FROM df e
              JOIN c ON e.user_id=c.user_id AND e.event_type='purchase'
              AND e.ts > c.t_click GROUP BY e.user_id)
        SELECT u.user_id, v.t_view, c.t_click, p.t_purchase FROM u
        LEFT JOIN v USING(user_id) LEFT JOIN c USING(user_id)
        LEFT JOIN p USING(user_id) ORDER BY user_id
    """).df()
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)


def test_duplicate_or_empty_stages_raise(ray_session):
    ds = _ds([(1, "view", 1)])
    with pytest.raises(ValueError, match="distinct"):
        funnel(ds, ["view", "view"])
    with pytest.raises(ValueError, match="distinct"):
        funnel(ds, [])


def test_cohort_retention_matches_sql(ray_session):
    import duckdb

    from kafka_connect_s3_ray.functions.funnel import cohort_retention

    rng = np.random.RandomState(5)
    rows = [(int(rng.randint(0, 60)), "x",
             int(rng.randint(0, 20 * 86400_000_000)))
            for _ in range(3000)]
    got = cohort_retention(_ds(rows)).to_pandas().sort_values(
        ["cohort", "offset"]).reset_index(drop=True)
    df = pd.DataFrame(rows, columns=["user_id", "event_type", "ts_i"])
    df["ts"] = pd.to_datetime(df["ts_i"], unit="us")
    exp = duckdb.sql("""
        WITH f AS (SELECT user_id, min(ts) t0 FROM df GROUP BY user_id),
        a AS (SELECT DISTINCT e.user_id,
              epoch_us(f.t0) // 86400000000 AS cohort,
              epoch_us(e.ts) // 86400000000 - epoch_us(f.t0) // 86400000000
              AS "offset"
              FROM df e JOIN f USING(user_id))
        SELECT cohort, "offset", CAST(count(*) AS BIGINT) n_users FROM a
        GROUP BY 1, 2 ORDER BY 1, 2
    """).df()
    pd.testing.assert_frame_equal(
        got.astype({"cohort": "int64", "offset": "int64",
                    "n_users": "int64"}),
        exp.astype({"cohort": "int64", "offset": "int64",
                    "n_users": "int64"}))


def test_cohort_user_never_splits_across_cells(ray_session):
    """A user active the same day as their first event lands ONLY in
    offset 0, and multiple same-day events dedup to one cell count."""
    from kafka_connect_s3_ray.functions.funnel import cohort_retention

    day = 86_400_000_000
    rows = [(1, "x", 10), (1, "x", 20),            # same day, offset 0 once
            (1, "x", day + 5),                      # next day, offset 1
            (2, "x", day + 7)]                      # cohort day 1, offset 0
    got = cohort_retention(_ds(rows)).to_pandas()
    cells = {(int(r["cohort"]), int(r["offset"])): int(r["n_users"])
             for _, r in got.iterrows()}
    assert cells == {(0, 0): 1, (0, 1): 1, (1, 0): 1}


def test_null_user_rejected_loudly(ray_session):
    from kafka_connect_s3_ray.functions.funnel import cohort_retention

    ds = ray.data.from_arrow(pa.table({
        "user_id": pa.array([1, None], pa.int64()),
        "event_type": pa.array(["view", "view"], pa.string()),
        "ts": pa.array([1, 2], pa.timestamp("us")),
    }))
    with pytest.raises(Exception, match="NULL"):
        funnel(ds, ["view"]).to_pandas()
    with pytest.raises(Exception, match="NULL"):
        cohort_retention(ds).to_pandas()


def test_event_transitions_hand_computed_and_vs_sql(ray_session):
    import duckdb

    from kafka_connect_s3_ray.functions.funnel import event_transitions

    def _eds(rows, blocks=3):
        return ray.data.from_arrow(pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "ts": pa.array([r[3] for r in rows], pa.timestamp("us")),
        })).repartition(blocks)

    # user 1: a->b->a (out-of-order arrival; ts orders);
    # user 2: tie at ts=5 broken by event_id (10 then 11): b->b
    rows = [(1, 1, "b", 20), (2, 1, "a", 10), (3, 1, "a", 30),
            (10, 2, "b", 5), (11, 2, "b", 5)]
    out = event_transitions(_eds(rows)).to_pandas()
    got = {(r["from_type"], r["to_type"]): int(r["n"])
           for _, r in out.iterrows()}
    assert got == {("a", "b"): 1, ("b", "a"): 1, ("b", "b"): 1}

    rng = np.random.RandomState(17)
    rows = [(i, int(rng.randint(0, 30)),
             str(rng.choice(["x", "y", "z"])), int(rng.randint(0, 50)))
            for i in range(1500)]
    out = event_transitions(_eds(rows, blocks=5)).to_pandas().sort_values(
        ["from_type", "to_type"]).reset_index(drop=True)
    df = pd.DataFrame(rows, columns=["event_id", "user_id",
                                     "event_type", "ts_i"])
    df["ts"] = pd.to_datetime(df["ts_i"], unit="us")
    exp = duckdb.sql("""
        WITH s AS (SELECT event_type, lead(event_type) OVER (
          PARTITION BY user_id ORDER BY ts, event_id) AS nxt FROM df)
        SELECT event_type AS from_type, nxt AS to_type,
               CAST(count(*) AS BIGINT) AS n
        FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2 ORDER BY 1, 2
    """).df()
    pd.testing.assert_frame_equal(
        out.astype({"n": "int64"}), exp.astype({"n": "int64"}))


def test_transitions_null_type_contract(ray_session):
    """NULL from_type is a counted group; NULL to_type drops the pair —
    exactly the oracle's lead() + WHERE nxt IS NOT NULL semantics."""
    from kafka_connect_s3_ray.functions.funnel import event_transitions

    ds = ray.data.from_arrow(pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "user_id": pa.array([1, 1, 1], pa.int64()),
        "event_type": pa.array([None, "click", None], pa.string()),
        "ts": pa.array([1, 2, 3], pa.timestamp("us")),
    }))
    out = event_transitions(ds).to_pandas()
    # NULL->click counted; click->NULL dropped
    assert len(out) == 1
    row = out.iloc[0]
    assert pd.isna(row["from_type"]) and row["to_type"] == "click"
    assert int(row["n"]) == 1
