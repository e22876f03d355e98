"""Crafted-fixture tests for the session-D catalog additions beyond the
DuckDB-oracle gate replica (which checks them on the driver tables):

- table_profile: NULLs, -0.0 vs 0.0 (DuckDB DISTINCT merges them), NaN
  (counts once in DISTINCT; max returns NaN because NaN sorts greatest;
  min skips it), duplicates split across parquet row groups so the
  per-block distinct partial alone cannot win.
- burst_counts: the exact 1-hour boundary is INSIDE the frame (RANGE
  PRECEDING is inclusive), ts peers all count, cross-row-group windows.
- ewma: frames shorter than the 8-row window (normalization denominator
  follows the frame), single-event users, exact closed-form check.
"""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_events(tmp_path, df: pd.DataFrame, row_group_size: int = 3) -> str:
    for col, default in [("event_type", "click"), ("value", 1.0),
                         ("props", "{}")]:
        if col not in df.columns:
            df[col] = default
    sf = str(tmp_path)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(sf, "events.parquet"),
                   row_group_size=row_group_size)
    return sf


def _oracle(sf: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{os.path.join(sf, 'events.parquet')}'")
    return con.execute(sql).df()


def test_table_profile_nulls_negzero_nan(tmp_path, ray_session):
    from kafka_connect_s3_ray.pipelines.queries import (ORACLE_SQL,
                                                        q_table_profile)

    base = pd.Timestamp("2026-03-01")
    n = 12
    # built column-wise in Arrow: pandas->Arrow would silently turn the
    # true NaN payloads into NULLs, and the NaN row is the point here
    tbl = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array([base + pd.Timedelta(minutes=i) for i in range(n)],
                       pa.timestamp("us")),
        "user_id": pa.array([7] * n, pa.int64()),  # one distinct, repeated
        "event_type": pa.array(["click", "view"] * 6),
        # -0.0 and 0.0 merge in DuckDB DISTINCT; two NaNs count ONCE;
        # duplicates (5.5) straddle row groups (row_group_size=3)
        "value": pa.array([0.0, -0.0, np.nan, np.nan, 5.5, 1.25,
                           5.5, 2.0, 5.5, 3.0, 5.5, 4.0], pa.float64()),
        "props": pa.array(['{"a":1}', None, '{"a":1}', '{"b":2}'] * 3),
    })
    sf = str(tmp_path)
    pq.write_table(tbl, os.path.join(sf, "events.parquet"),
                   row_group_size=3)
    got = (q_table_profile(sf).to_pandas()
           .sort_values("col").reset_index(drop=True))
    exp = (_oracle(sf, ORACLE_SQL["table_profile"])
           .sort_values("col").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    row = got.set_index("col")
    # semantic spot-checks, independent of the oracle
    assert row.loc["props", "n_nulls"] == 3
    assert row.loc["props", "n_distinct"] == 2
    # {0.0(-0.0 merged), NaN(once), 5.5, 1.25, 2.0, 3.0, 4.0} = 7
    assert row.loc["value", "n_distinct"] == 7
    assert row.loc["value", "min_num"] == 0.0
    assert np.isnan(row.loc["value", "max_num"])  # NaN sorts greatest
    assert row.loc["user_id", "n_distinct"] == 1


def test_burst_counts_boundary_and_peers(tmp_path, ray_session):
    from kafka_connect_s3_ray.pipelines.queries import (ORACLE_SQL,
                                                        q_burst_counts)

    base = pd.Timestamp("2026-03-01 10:00:00")
    rows = [
        # user 1: e0 at t0, e1 exactly 1h later (frame INCLUDES e0),
        # e2 at 1h + 1us after e0 (frame excludes e0, includes e1)
        (0, 1, base),
        (1, 1, base + pd.Timedelta(hours=1)),
        (2, 1, base + pd.Timedelta(hours=1, microseconds=1)),
        # user 2: three ts PEERS — every row's frame counts all three
        (3, 2, base), (4, 2, base), (5, 2, base),
        # user 3: single event
        (6, 3, base),
        # user 1 again, far away (fresh window)
        (7, 1, base + pd.Timedelta(days=2)),
    ]
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts"])
    df = df.sample(frac=1.0, random_state=3).reset_index(drop=True)
    sf = _write_events(tmp_path, df)
    got = (q_burst_counts(sf).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    exp = (_oracle(sf, ORACLE_SQL["burst_counts"])
           .sort_values("event_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    n = got.set_index("event_id")["n_win"]
    assert n[0] == 1 and n[1] == 2 and n[2] == 2
    assert (n[[3, 4, 5]] == 3).all()
    assert n[6] == 1 and n[7] == 1


def test_ewma_short_frames_closed_form(tmp_path, ray_session):
    from kafka_connect_s3_ray.pipelines.queries import ORACLE_SQL, q_ewma

    base = pd.Timestamp("2026-03-01")
    # user 1: 12 events (frames grow 1..8 then slide); user 2: single event
    rows = [(i, 1, base + pd.Timedelta(minutes=i), float(i + 1))
            for i in range(12)]
    rows.append((100, 2, base, 42.0))
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "value"])
    df = df.sample(frac=1.0, random_state=5).reset_index(drop=True)
    sf = _write_events(tmp_path, df)
    got = (q_ewma(sf).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    exp = (_oracle(sf, ORACLE_SQL["ewma"])
           .sort_values("event_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                  rtol=1e-9, atol=1e-12)
    e = got.set_index("event_id")["ewma"]
    # closed-form checks: first row is its own value; single-event user too
    assert e[0] == 1.0 and e[100] == 42.0
    # second row: (2 + 0.9*1) / (1 + 0.9)
    assert abs(e[1] - (2 + 0.9) / 1.9) < 1e-12
    # row 11 uses exactly the trailing 8 values 5..12
    w = 0.9 ** np.arange(8)
    x = np.arange(12, 4, -1, dtype=float)
    assert abs(e[11] - (w * x).sum() / w.sum()) < 1e-12


def _lev_ref(a: str, b: str) -> int:
    import duckdb

    return duckdb.connect().execute(
        "SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]


def test_lev_vectorized_matches_duckdb_randomized():
    """The vectorized banded DP against DuckDB's levenshtein on seeded
    random equal-width pairs spanning distances 0..width."""
    from kafka_connect_s3_ray.functions.editdist import (_codepoint_matrix,
                                                         _lev_vectorized)

    rng = np.random.default_rng(11)
    W = 20
    alphabet = np.array(list("abcdefg "))
    lefts, rights = [], []
    for _ in range(60):
        a = rng.choice(alphabet, W)
        b = a.copy()
        for _ in range(int(rng.integers(0, 9))):
            op = rng.integers(0, 3)
            pos = int(rng.integers(0, W))
            if op == 0:  # substitute
                b[pos] = rng.choice(alphabet)
            elif op == 1:  # delete+pad (keeps fixed width, still an edit mix)
                b = np.delete(b, pos)
                b = np.append(b, rng.choice(alphabet))
            else:  # insert+trim
                b = np.insert(b, pos, rng.choice(alphabet))[:W]
        lefts.append("".join(a))
        rights.append("".join(b))
    A = _codepoint_matrix(np.array(lefts, dtype=object), W)
    B = _codepoint_matrix(np.array(rights, dtype=object), W)
    got = _lev_vectorized(A, B)
    exp = np.array([_lev_ref(l, r) for l, r in zip(lefts, rights)])
    np.testing.assert_array_equal(got, exp)


def test_edit_distance_join_planted(tmp_path, ray_session):
    """Planted fixture: pairs at distances 0, 1 (sub), 2 (ins+del shift —
    the segment-shift case the ±k probe window exists for), 4 (boundary,
    kept), 5 (just over, dropped); a short key (<20 chars) is excluded;
    duplicates straddle row groups."""
    from kafka_connect_s3_ray.functions.editdist import edit_distance_join
    from kafka_connect_s3_ray.pipelines.queries import (
        ORACLE_SQL, q_edit_distance_join)

    base = "the quick brown fox jumps over it"  # >= 20 chars
    k20 = base[:20]                      # 'the quick brown fox '
    docs = [
        (0, base),
        (1, base),                                        # d=0 vs 0
        (2, "thX quick brown fox jumps"),                 # d=1 vs 0
        (3, "he quick brown fox Zjumps"),                 # del at 0 -> shift
        (4, "thX qXick brXwn fXx jumps over it"),         # 4 subs, d=4
        (5, "thX qXick brXwn fXX jumps over it"),         # 5 subs, d=5
        (6, "short key"),                                 # < 20 cp: excluded
        (7, "completely different text entirely"),
    ]
    df = pd.DataFrame(docs, columns=["doc_id", "text"])
    df["lang"], df["source"], df["n_chars"] = "en", "s", df["text"].str.len()
    sf = str(tmp_path)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(sf, "documents.parquet"), row_group_size=2)

    got = (q_edit_distance_join(sf).to_pandas()
           .sort_values(["left_id", "right_id"]).reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{os.path.join(sf, 'documents.parquet')}'")
    exp = (con.execute(ORACLE_SQL["edit_distance_join"]).df()
           .sort_values(["left_id", "right_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    pairs = {(l, r): d for l, r, d in got.itertuples(index=False)}
    assert pairs[(0, 1)] == 0
    assert pairs[(0, 2)] == 1
    assert (0, 4) in pairs and pairs[(0, 4)] == 4   # boundary kept
    assert (0, 5) not in pairs                      # just over
    assert not any(6 in p for p in pairs)           # short key excluded
    # the deletion-shift pair: every segment of doc 3's key is shifted
    assert (0, 3) in pairs


def test_containment_join_planted(tmp_path, ray_session):
    """Planted containment: a short quote wholly inside a long doc pairs
    as (short, long) at containment 1.0 but NOT the reverse (the long
    doc's containment in the short one is tiny) — the asymmetric shape
    Jaccard misses; mutual near-duplicates pair BOTH ways; a sub-threshold
    overlap stays out."""
    from kafka_connect_s3_ray.functions.dedup import ngram_containment_join
    from kafka_connect_s3_ray.pipelines.queries import (
        ORACLE_SQL, q_containment_join)

    quote = "the five boxing wizards jump quickly over the lazy brown dog"
    long_doc = ("it was widely reported that " + quote +
                " which many observers found remarkable at the time and "
                "subsequently quoted in every retrospective essay written")
    near_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near_b = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    docs = [(0, quote), (1, long_doc), (2, near_a), (3, near_b),
            (4, "completely different words compose this other document "
                "about sailing ships and maritime navigation techniques")]
    df = pd.DataFrame(docs, columns=["doc_id", "text"])
    df["lang"], df["source"], df["n_chars"] = "en", "s", df["text"].str.len()
    sf = str(tmp_path)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(sf, "documents.parquet"), row_group_size=2)

    got = (q_containment_join(sf).to_pandas()
           .sort_values(["left_id", "right_id"]).reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{os.path.join(sf, 'documents.parquet')}'")
    exp = (con.execute(ORACLE_SQL["containment_join"]).df()
           .sort_values(["left_id", "right_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                  rtol=1e-6, atol=1e-9)
    pairs = {(l, r): c for l, r, c in got.itertuples(index=False)}
    assert pairs[(0, 1)] == 1.0          # quote contained in long doc
    assert (1, 0) not in pairs           # NOT the reverse
    # near-duplicates of equal length: mutual containment, both orderings
    assert (2, 3) in pairs and (3, 2) in pairs
    assert all(4 not in p for p in pairs)


# --- review-pass regressions (session D) -----------------------------------


def test_triangle_counts_selfloops_only_empty(ray_session):
    """Self-loops-only input: empty typed result, not an ArrowInvalid from
    an empty concat_tables (review finding)."""
    import ray.data

    from kafka_connect_s3_ray.functions.graph import triangle_counts

    out = triangle_counts(ray.data.from_pandas(
        pd.DataFrame({"u": [1, 2], "v": [1, 2]})))
    assert out.count() == 0
    assert out.schema().names == ["node", "n_tri"]


def test_ewma_null_value_raises(tmp_path, ray_session):
    """NULL value must fail LOUDLY: the oracle's list_dot_product rejects
    NULL frame members, so silent renormalization would diverge (review
    finding)."""
    from kafka_connect_s3_ray.pipelines.queries import q_ewma

    base = pd.Timestamp("2026-03-01")
    tbl = pa.table({
        "event_id": pa.array([0, 1], pa.int64()),
        "ts": pa.array([base, base + pd.Timedelta(minutes=1)],
                       pa.timestamp("us")),
        "user_id": pa.array([1, 1], pa.int64()),
        "event_type": pa.array(["a", "a"]),
        "value": pa.array([1.0, None], pa.float64()),
        "props": pa.array(["{}", "{}"]),
    })
    sf = str(tmp_path)
    pq.write_table(tbl, os.path.join(sf, "events.parquet"))
    with pytest.raises(Exception, match="NULL"):
        q_ewma(sf).to_pandas()


def test_edit_distance_join_multibyte_keys_excluded(tmp_path, ray_session):
    """Keys containing multibyte chars are excluded on BOTH engines (DuckDB
    levenshtein counts bytes, the DP counts codepoints — no shared
    semantics; review finding): the accented twin of a real pair must not
    appear, and the remaining ASCII pairs still match the oracle."""
    from kafka_connect_s3_ray.pipelines.queries import (
        ORACLE_SQL, q_edit_distance_join)

    base = "the quick brown fox jumps over it"
    docs = [(0, base), (1, base),
            (2, "thé quick brown fox jumps over it"),  # multibyte: excluded
            (3, "thX quick brown fox jumps over it")]
    df = pd.DataFrame(docs, columns=["doc_id", "text"])
    df["lang"], df["source"], df["n_chars"] = "en", "s", df["text"].str.len()
    sf = str(tmp_path)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(sf, "documents.parquet"))
    got = (q_edit_distance_join(sf).to_pandas()
           .sort_values(["left_id", "right_id"]).reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{os.path.join(sf, 'documents.parquet')}'")
    exp = (con.execute(ORACLE_SQL["edit_distance_join"]).df()
           .sort_values(["left_id", "right_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert not any(2 in (l, r) for l, r in zip(got["left_id"],
                                               got["right_id"]))
    assert {(0, 1), (0, 3), (1, 3)} <= set(
        zip(got["left_id"], got["right_id"]))


def test_chunk_bounds_progress_and_totals():
    """The shared expansion chunker: covers all indices exactly once, each
    range's total <= chunk except a single oversized item, which is
    yielded alone (review finding: three independent copies drifted)."""
    from kafka_connect_s3_ray.functions.dedup import _chunk_bounds

    counts = np.array([3, 1, 4, 100, 2, 2, 5], np.int64)
    ranges = list(_chunk_bounds(counts, 8))
    covered = [i for lo, hi in ranges for i in range(lo, hi)]
    assert covered == list(range(len(counts)))
    for lo, hi in ranges:
        tot = int(counts[lo:hi].sum())
        assert tot <= 8 or (hi - lo) == 1  # oversized item rides alone
    assert list(_chunk_bounds(np.array([], np.int64), 8)) == []


def test_triangle_hub_chunking_consistent(ray_session):
    """A hub star + closing edges with wedge_chunk=1 (every within-segment
    chunk split) must equal the default-chunk answer (review finding: hub
    segments previously emitted whole)."""
    import ray.data

    from kafka_connect_s3_ray.functions.graph import triangle_counts

    rng = np.random.default_rng(7)
    edges = pd.DataFrame({"u": rng.integers(0, 12, 120),
                          "v": rng.integers(0, 12, 120)})
    a = (triangle_counts(ray.data.from_pandas(edges))
         .to_pandas().sort_values("node").reset_index(drop=True))
    b = (triangle_counts(ray.data.from_pandas(edges), wedge_chunk=1)
         .to_pandas().sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


def test_weighted_median_skew_and_ties(tmp_path, ray_session):
    """Weight skew must pull the weighted median off the plain median, and
    a target landing exactly on a value boundary resolves to that value on
    both engines (integer weights keep mass comparisons exact)."""
    from kafka_connect_s3_ray.pipelines.queries import (ORACLE_SQL,
                                                        q_weighted_median)

    base = pd.Timestamp("2026-03-01")
    rows = []
    # group 'a': values 1..5 weight 1 except value 5 weight 100 -> wmedian 5
    for i, (v, k) in enumerate([(1, 1), (2, 1), (3, 1), (4, 1), (5, 100)]):
        rows.append((i, "a", float(v), '{"k": %d}' % k))
    # group 'b': exact boundary — w {1:1, 2:1} target 1.0 lands ON value 1
    rows.append((10, "b", 1.0, '{"k": 1}'))
    rows.append((11, "b", 2.0, '{"k": 1}'))
    # group 'c': zero/NULL weights excluded; only value 7 has w>0
    rows.append((20, "c", 3.0, '{"k": 0}'))
    rows.append((21, "c", 7.0, '{"k": 2}'))
    rows.append((22, "c", 9.0, None))
    df = pd.DataFrame(rows, columns=["event_id", "event_type", "value",
                                     "props"])
    df["user_id"] = np.int64(1)
    df["ts"] = base
    sf = str(tmp_path)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(sf, "events.parquet"), row_group_size=3)
    got = (q_weighted_median(sf).to_pandas()
           .sort_values("event_type").reset_index(drop=True))
    exp = (_oracle(sf, ORACLE_SQL["weighted_median"])
           .sort_values("event_type").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    m = dict(zip(got["event_type"], got["wq"]))
    assert m == {"a": 5.0, "b": 1.0, "c": 7.0}


def test_grouped_mode_tiebreak(tmp_path, ray_session):
    """Equal counts break to the SMALLEST value, duplicates straddle row
    groups so block-local counting alone cannot win."""
    from kafka_connect_s3_ray.pipelines.queries import (ORACLE_SQL,
                                                        q_grouped_mode)

    base = pd.Timestamp("2026-03-01")
    # 'x': 2.0 and 1.0 appear twice each -> tie -> 1.0 wins
    vals = [("x", 2.0), ("x", 1.0), ("x", 2.0), ("x", 1.0), ("x", 9.0),
            ("y", 5.0), ("y", 5.0), ("y", 4.0)]
    df = pd.DataFrame(vals, columns=["event_type", "value"])
    df["event_id"] = np.arange(len(df), dtype=np.int64)
    df["user_id"] = np.int64(1)
    df["ts"] = base
    df["props"] = "{}"
    sf = str(tmp_path)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(sf, "events.parquet"), row_group_size=2)
    got = (q_grouped_mode(sf).to_pandas()
           .sort_values("event_type").reset_index(drop=True))
    exp = (_oracle(sf, ORACLE_SQL["grouped_mode"])
           .sort_values("event_type").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    m = {r.event_type: (r.mode_value, r.n) for r in got.itertuples()}
    assert m == {"x": (1.0, 2), "y": (5.0, 2)}


def test_weighted_median_inf_and_null_group(tmp_path, ray_session):
    """Infinite values and NULL groups are excluded on BOTH engines (second
    review batch: inf poisoned the linspace edges; NULL groups fabricated a
    'None' string group)."""
    from kafka_connect_s3_ray.pipelines.queries import (ORACLE_SQL,
                                                        q_weighted_median)

    base = pd.Timestamp("2026-03-01")
    tbl = pa.table({
        "event_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "ts": pa.array([base] * 5, pa.timestamp("us")),
        "user_id": pa.array([1] * 5, pa.int64()),
        "event_type": pa.array(["a", "a", "a", None, "a"]),
        "value": pa.array([1.0, np.inf, 2.0, 5.0, 3.0], pa.float64()),
        "props": pa.array(['{"k": 1}'] * 5),
    })
    sf = str(tmp_path)
    pq.write_table(tbl, os.path.join(sf, "events.parquet"))
    got = (q_weighted_median(sf).to_pandas()
           .sort_values("event_type").reset_index(drop=True))
    exp = (_oracle(sf, ORACLE_SQL["weighted_median"])
           .sort_values("event_type").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # inf excluded -> weights {1,2,3}, median 2; NULL group absent
    assert dict(zip(got["event_type"], got["wq"])) == {"a": 2.0}


def test_weighted_quantile_q_validation(ray_session):
    import ray.data

    from kafka_connect_s3_ray.functions.quantiles import (
        grouped_weighted_quantile)

    ds = ray.data.from_pandas(pd.DataFrame(
        {"g": ["a"], "v": [1.0], "w": [1.0]}))
    with pytest.raises(ValueError, match="q must be"):
        grouped_weighted_quantile(ds, "g", "v", "w", q=1.5)


def test_grouped_mode_null_group_and_allnull_block(tmp_path, ray_session):
    """NULL event_type rows are excluded on BOTH engines, and an all-null
    block emits a TYPED empty partial (no null-typed schema drift across
    the exchange) — second review batch."""
    from kafka_connect_s3_ray.pipelines.queries import (ORACLE_SQL,
                                                        q_grouped_mode)

    base = pd.Timestamp("2026-03-01")
    tbl = pa.table({
        "event_id": pa.array(list(range(6)), pa.int64()),
        "ts": pa.array([base] * 6, pa.timestamp("us")),
        "user_id": pa.array([1] * 6, pa.int64()),
        # first row group (size 2) is ALL-NULL types -> typed-empty partial
        "event_type": pa.array([None, None, "y", "y", "y", None]),
        "value": pa.array([1.0, 1.0, 2.0, 2.0, 3.0, None], pa.float64()),
        "props": pa.array(["{}"] * 6),
    })
    sf = str(tmp_path)
    pq.write_table(tbl, os.path.join(sf, "events.parquet"),
                   row_group_size=2)
    got = (q_grouped_mode(sf).to_pandas()
           .sort_values("event_type").reset_index(drop=True))
    exp = (_oracle(sf, ORACLE_SQL["grouped_mode"])
           .sort_values("event_type").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert len(got) == 1 and got.loc[0, "event_type"] == "y"
    assert got.loc[0, "mode_value"] == 2.0 and got.loc[0, "n"] == 2


def test_lev_banded_equals_full_dp():
    """The banded+compacted DP must equal the full DP wherever distance
    <= k, and report exactly k+1 beyond it — across random pairs spanning
    the whole distance range and both k values the engine uses."""
    from kafka_connect_s3_ray.functions.editdist import (_codepoint_matrix,
                                                         _lev_banded,
                                                         _lev_vectorized)

    rng = np.random.default_rng(17)
    W = 20
    alphabet = np.array(list("abcd "))
    lefts = ["".join(rng.choice(alphabet, W)) for _ in range(400)]
    rights = []
    for a in lefts:
        b = np.array(list(a))
        for _ in range(int(rng.integers(0, 12))):
            b[int(rng.integers(0, W))] = rng.choice(alphabet)
        rights.append("".join(b))
    A = _codepoint_matrix(np.array(lefts, dtype=object), W)
    B = _codepoint_matrix(np.array(rights, dtype=object), W)
    full = _lev_vectorized(A, B)
    for k in (2, 4):
        banded = _lev_banded(A, B, k)
        exp = np.where(full <= k, full, k + 1)
        np.testing.assert_array_equal(banded, exp)
    # degenerate: empty pair set
    assert len(_lev_banded(A[:0], B[:0], 4)) == 0


def test_fuzzy_key_dedup_no_valid_keys(tmp_path, ray_session):
    """Every text shorter than the key width: the engine returns the typed
    empty result the oracle returns, instead of a KeyError on the
    columnless empty join (third review batch)."""
    from kafka_connect_s3_ray.pipelines.queries import (ORACLE_SQL,
                                                        q_fuzzy_key_dedup)

    df = pd.DataFrame({"doc_id": np.arange(6, dtype=np.int64),
                       "text": [f"short {i}" for i in range(6)]})
    df["lang"], df["source"], df["n_chars"] = "en", "s", df["text"].str.len()
    sf = str(tmp_path)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(sf, "documents.parquet"))
    got = q_fuzzy_key_dedup(sf).to_pandas()
    exp = _oracle_docs(sf, ORACLE_SQL["fuzzy_key_dedup"])
    assert len(got) == 0 and len(exp) == 0
    assert list(got.columns) == ["doc_id", "cluster_id", "kept"]


def _oracle_docs(sf: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{os.path.join(sf, 'documents.parquet')}'")
    return con.execute(sql).df()


def test_gap_quantiles_attribution_and_ties(tmp_path, ray_session):
    """Gaps attribute to the LATER event's type, first events carry no
    gap, and the quantile_disc tie rule holds on duplicate gaps."""
    from kafka_connect_s3_ray.pipelines.queries import (ORACLE_SQL,
                                                        q_gap_quantiles)

    base = pd.Timestamp("2026-03-01")
    rows = [
        # user 1: a@0 (no gap), b@10s (gap 10s->b), a@20s (gap 10s->a),
        # b@50s (gap 30s->b)
        (0, 1, "a", base),
        (1, 1, "b", base + pd.Timedelta(seconds=10)),
        (2, 1, "a", base + pd.Timedelta(seconds=20)),
        (3, 1, "b", base + pd.Timedelta(seconds=50)),
        # user 2: only one event -> contributes NO gap anywhere
        (4, 2, "b", base),
    ]
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "event_type",
                                     "ts"])
    df = df.sample(frac=1.0, random_state=1).reset_index(drop=True)
    sf = _write_events(tmp_path, df)
    got = (q_gap_quantiles(sf).to_pandas()
           .sort_values("event_type").reset_index(drop=True))
    exp = (_oracle(sf, ORACLE_SQL["gap_quantiles"])
           .sort_values("event_type").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    m = dict(zip(got["event_type"], got["p50_gap_us"]))
    # a: single gap 10s; b: gaps {10s, 30s} -> quantile_disc(0.5) = 10s
    assert m == {"a": 10_000_000, "b": 10_000_000}
