"""Randomized DuckDB-equality property tests for the session-D operators:
seeded random fixtures (sizes, duplicates, mutations, weights) where the
engine and DuckDB must agree value-for-value — the same protocol as the
gate replica but over adversarial generated inputs rather than the fixed
driver tables."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _oracle(sf: str, table: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW {table} AS SELECT * FROM "
                f"'{os.path.join(sf, table + '.parquet')}'")
    return con.execute(sql).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns), kind="stable").reset_index(
        drop=True)


WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa lambda "
         "mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega").split()


def _random_docs(rng, n: int) -> pd.DataFrame:
    """Template corpus with mutated replicas — the near-dup shape all the
    pair joins feed on."""
    texts = []
    n_templates = max(2, n // 4)
    templates = [" ".join(rng.choice(WORDS, rng.integers(12, 30)))
                 for _ in range(n_templates)]
    for i in range(n):
        t = templates[int(rng.integers(0, n_templates))].split()
        for _ in range(int(rng.integers(0, 4))):  # light mutation
            p = int(rng.integers(0, len(t)))
            t[p] = str(rng.choice(WORDS))
        texts.append(" ".join(t))
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                       "text": texts})
    df["lang"], df["source"] = "en", "s"
    df["n_chars"] = df["text"].str.len()
    return df


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_containment_join_random(tmp_path, ray_session, seed):
    from kafka_connect_s3_ray.pipelines.queries import (
        ORACLE_SQL, q_containment_join)

    rng = np.random.default_rng(100 + seed)
    df = _random_docs(rng, int(rng.integers(30, 90)))
    sf = str(tmp_path)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(sf, "documents.parquet"), row_group_size=7)
    got = _canon(q_containment_join(sf).to_pandas())
    exp = _canon(_oracle(sf, "documents", ORACLE_SQL["containment_join"]))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                  rtol=1e-6, atol=1e-9)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_edit_distance_join_random(tmp_path, ray_session, seed):
    from kafka_connect_s3_ray.pipelines.queries import (
        ORACLE_SQL, q_edit_distance_join)

    rng = np.random.default_rng(200 + seed)
    df = _random_docs(rng, int(rng.integers(30, 90)))
    sf = str(tmp_path)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(sf, "documents.parquet"), row_group_size=5)
    got = _canon(q_edit_distance_join(sf).to_pandas())
    exp = _canon(_oracle(sf, "documents",
                         ORACLE_SQL["edit_distance_join"]))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def _random_events(rng, n: int) -> pd.DataFrame:
    base = pd.Timestamp("2026-03-01")
    ts = base + pd.to_timedelta(
        np.sort(rng.integers(0, 3_600_000_000 * 30, n)), unit="us")
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": ts,
        "user_id": rng.integers(1, 8, n).astype(np.int64),
        "event_type": rng.choice(["a", "b", "c"], n),
        # duplicate-heavy values so mode ties and median peers are common
        "value": rng.integers(0, 12, n).astype(np.float64) / 2.0,
        "props": ['{"k": %d}' % k for k in rng.integers(0, 5, n)],
    })


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_event_window_ops_random(tmp_path, ray_session, seed):
    """burst_counts, ewma, grouped_mode, weighted_median, triangle_count,
    table_profile over one random event table — five distribution shapes
    against DuckDB on the same parquet."""
    from kafka_connect_s3_ray.pipelines.queries import (
        ORACLE_SQL, q_burst_counts, q_ewma, q_grouped_mode,
        q_table_profile, q_triangle_count, q_weighted_median)

    rng = np.random.default_rng(300 + seed)
    df = _random_events(rng, int(rng.integers(60, 220)))
    sf = str(tmp_path)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(sf, "events.parquet"), row_group_size=16)
    for name, fn in [("burst_counts", q_burst_counts), ("ewma", q_ewma),
                     ("grouped_mode", q_grouped_mode),
                     ("weighted_median", q_weighted_median),
                     ("triangle_count", q_triangle_count),
                     ("table_profile", q_table_profile)]:
        got = _canon(fn(sf).to_pandas())
        exp = _canon(_oracle(sf, "events", ORACLE_SQL[name]))
        pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                      rtol=1e-6, atol=1e-9,
                                      obj=name)


@pytest.mark.parametrize("seed", [0, 1])
def test_fuzzy_key_dedup_random(tmp_path, ray_session, seed):
    """Closure composition over random mutated-template corpora: clusters
    formed through chains (a~b, b~c but a!~c) must close transitively and
    the keep rule must hold for every valid-key doc."""
    from kafka_connect_s3_ray.pipelines.queries import (ORACLE_SQL,
                                                        q_fuzzy_key_dedup)

    rng = np.random.default_rng(400 + seed)
    df = _random_docs(rng, int(rng.integers(30, 80)))
    sf = str(tmp_path)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(sf, "documents.parquet"), row_group_size=9)
    g = q_fuzzy_key_dedup(sf).to_pandas()
    got = _canon(g)
    exp = _canon(_oracle(sf, "documents", ORACLE_SQL["fuzzy_key_dedup"]))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # exactly one kept doc per cluster, and it is the cluster minimum
    per = g.groupby("cluster_id")
    assert (per["kept"].sum() == 1).all()
    assert (per["doc_id"].min() == g[g["kept"]].set_index("cluster_id")
            ["doc_id"]).all()
