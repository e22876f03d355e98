"""Ordered-sequence funnel analysis: for each user, the earliest time each
funnel stage was reached, where stage k must happen STRICTLY after the
user's stage-(k-1) time (min-over-condition chain, the standard conversion
funnel).

Distributed shape: users co-locate by hash bucket (ONE coarse exchange of
only (user, type, ts) — the repo's topk_per_group / tfidf bucketing idiom),
and each bucket resolves its users' whole funnel with vectorized pandas
merges — per-stage work is O(bucket rows), no per-user Python. Output is
one row per distinct user with a nullable timestamp per stage (users who
never reach a stage carry NULL from there on), which is exactly the LEFT
JOIN chain a SQL oracle writes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["funnel", "cohort_retention", "event_transitions"]


def _user_bucketer(user_col: str, n_buckets: int, ts_col: str | None = None):
    """Shared bucket-assignment closure: splitmix64(user) % n_buckets.
    NULL users are rejected loudly — SQL's NULL-is-a-distinct-group
    semantics don't survive a NaN float round-trip (undefined uint64 cast),
    and silently folding NULL into some bucket would miscount; callers with
    NULL users must fill or filter first (same contract as key_hash).
    ``ts_col``, when given, extends the contract to timestamps: a NaT
    survives ``astype(int64)`` as int64-min (a garbage negative period) and
    orders differently from DuckDB's NULLS LAST in lexsorts, so the ops that
    do integer period math or ts ordering (cohort_retention,
    event_transitions) reject NULL ts the same loud way."""
    from .dedup import _splitmix64_mix

    def add_bucket(t: pa.Table) -> pa.Table:
        col = t.column(user_col)
        if col.null_count:
            raise ValueError(
                f"user-keyed sequence op (funnel/cohort/transitions): column "
                f"{user_col!r} holds NULLs — fill or filter them first "
                f"(NULL users have no hash bucket)")
        if ts_col is not None and t.column(ts_col).null_count:
            raise ValueError(
                f"user-keyed sequence op (cohort/transitions): column "
                f"{ts_col!r} holds NULL timestamps — fill or filter them "
                f"first (a NaT becomes int64-min in period math and orders "
                f"unlike SQL's NULLS LAST)")
        u = pc.cast(col, pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.uint64)
        b = (_splitmix64_mix(u) % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("bucket", pa.array(b))

    return add_bucket


def funnel(ds, stages: list[str], user_col: str = "user_id",
           type_col: str = "event_type", ts_col: str = "ts",
           n_buckets: int = 32):
    """Per-user funnel times over ``stages`` (strictly increasing ts chain).
    Returns a Dataset of (user_col, t_<stage>...) — one row per distinct
    user seen in ``ds``. Duplicate stage names would collide in the output
    and are rejected; NULL users are rejected (see ``_user_bucketer``)."""
    if len(stages) == 0 or len(set(stages)) != len(stages):
        raise ValueError(f"stages must be non-empty and distinct: {stages}")
    add_bucket = _user_bucketer(user_col, n_buckets)

    def bucket_funnel(g: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({user_col: np.unique(g[user_col].to_numpy())})
        prev = None  # (user, _prev) — users who reached the previous stage
        for s in stages:
            rows = g.loc[g[type_col] == s, [user_col, ts_col]]
            if prev is not None:
                rows = rows.merge(prev, on=user_col)
                rows = rows[rows[ts_col] > rows["_prev"]]
            t = (rows.groupby(user_col, as_index=False)[ts_col].min()
                 .rename(columns={ts_col: f"t_{s}"}))
            out = out.merge(t, on=user_col, how="left")
            prev = t.rename(columns={f"t_{s}": "_prev"})
        return out

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(bucket_funnel, batch_format="pandas"))


def cohort_retention(ds, user_col: str = "user_id", ts_col: str = "ts",
                     period_us: int = 86_400_000_000, n_buckets: int = 32):
    """Cohort retention: users cohort by the period (default: day) of their
    FIRST event; each cell (cohort, offset) counts DISTINCT users active
    ``offset`` periods after their cohort period. Period = floor(epoch_us /
    period_us) — pure integer arithmetic a SQL oracle replays exactly,
    deliberately not calendar weeks.

    Shape: same single coarse user-hash exchange as ``funnel`` (a user's
    rows land in ONE bucket, so per-bucket distinct (user, cohort, offset)
    triples are globally distinct and per-cell partial counts sum exactly);
    the driver merges O(cohorts x offsets) tiny partials — never user rows.
    Returns a Dataset of (cohort, offset, n_users). NULL users are rejected
    (see ``_user_bucketer``)."""
    add_bucket = _user_bucketer(user_col, n_buckets, ts_col=ts_col)

    def bucket_cells(g: pd.DataFrame) -> pd.DataFrame:
        per = (g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
               // period_us)
        df = pd.DataFrame({"u": g[user_col].to_numpy(), "p": per})
        t0 = df.groupby("u")["p"].transform("min")
        cells = pd.DataFrame({"u": df["u"], "cohort": t0,
                              "offset": df["p"] - t0}).drop_duplicates()
        out = (cells.groupby(["cohort", "offset"], as_index=False)
               .size().rename(columns={"size": "n_users"}))
        return out

    parts = (ds.map_batches(add_bucket, batch_format="pyarrow")
             .groupby("bucket")
             .map_groups(bucket_cells, batch_format="pandas"))
    from ..pipelines.queries import _sum_partials
    return _sum_partials(parts, ["cohort", "offset"],
                         {"n_users": "n_users"})


def event_transitions(ds, user_col: str = "user_id",
                      type_col: str = "event_type", ts_col: str = "ts",
                      id_col: str = "event_id", n_buckets: int = 32):
    """Markov transition counts: for each user's event stream ordered by
    (ts, id) — the id tiebreak makes ordering total, hence deterministic —
    count every consecutive (from_type, to_type) pair, summed corpus-wide.
    The sequence-mining primitive behind session-flow / next-event models.

    Shape: the same single user-hash exchange as ``funnel`` (a user's rows
    land in one bucket, so consecutive pairs never span buckets); each
    bucket sorts its rows once with one lexsort and counts pairs
    vectorized; the driver sums O(types^2) tiny partials. Returns a
    Dataset of (from_type, to_type, n)."""
    add_bucket = _user_bucketer(user_col, n_buckets, ts_col=ts_col)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        u = g[user_col].to_numpy()
        ts = g[ts_col].to_numpy()
        ei = g[id_col].to_numpy()
        et = g[type_col].to_numpy()
        order = np.lexsort((ei, ts, u))
        u, et = u[order], et[order]
        same = u[1:] == u[:-1]  # consecutive rows of the SAME user
        d = pd.DataFrame({"from_type": et[:-1][same], "to_type": et[1:][same]})
        # SQL-oracle NULL contract: a NULL *from* state is a real group
        # (groupby dropna=False keeps it), while a NULL *to* drops the pair
        # (the oracle's WHERE nxt IS NOT NULL)
        d = d[d["to_type"].notna()]
        return (d.groupby(["from_type", "to_type"], as_index=False,
                          dropna=False)
                .size().rename(columns={"size": "n"}))

    parts = (ds.map_batches(add_bucket, batch_format="pyarrow")
             .groupby("bucket")
             .map_groups(bucket_pairs, batch_format="pandas"))
    from ..pipelines.queries import _sum_partials
    return _sum_partials(parts, ["from_type", "to_type"], {"n": "n"})
