"""Shared bucket-offset global-rank scaffolding (DESIGN.md §27).

The shape both ``sample.seeded_shuffle`` (hash order) and
``quantiles.global_rank`` (value order) instantiate: a bucketing that
REFINES the target total order turns global ranking into (1) per-block
bincount partials -> (2) a driver exclusive prefix sum (2^bits ints, never
rows) -> (3) one bucket exchange where each group ranks locally and adds
its offset. Kept in one place so a fix to the offsets fold or the
group-ranking plumbing cannot silently miss one of the two callers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def bucket_offsets(meta, n_buckets: int) -> tuple[np.ndarray, int]:
    """Global exclusive prefix offsets of ``meta``'s int64 ``bucket`` column
    (values in [0, n_buckets)): per-block bincount partials, driver merge.
    Returns (offsets, total_rows)."""

    def counts(t: pa.Table) -> pa.Table:
        c = np.bincount(t.column("bucket").to_numpy(zero_copy_only=False),
                        minlength=n_buckets)
        nz = np.nonzero(c)[0]
        return pa.table({"bucket": pa.array(nz, pa.int64()),
                         "n": pa.array(c[nz], pa.int64())})

    parts = meta.map_batches(counts, batch_format="pyarrow").to_pandas()
    tot = np.zeros(n_buckets, np.int64)
    if not parts.empty:
        g = parts.groupby("bucket")["n"].sum()
        tot[g.index.to_numpy()] = g.to_numpy()
    offsets = np.concatenate([[0], np.cumsum(tot)[:-1]])
    return offsets, int(tot.sum())


def rank_by_bucket(meta, offsets: np.ndarray, rank_fn):
    """One bucket exchange: ``rank_fn(group_df, offset) -> DataFrame`` runs
    per bucket with that bucket's global offset (offsets broadcast once via
    the object store, resolved per task, never re-shipped per row)."""
    import ray

    ref = ray.put(offsets)

    def ranked(g: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        return rank_fn(g, int(offs[int(g["bucket"].iloc[0])]))

    return meta.groupby("bucket").map_groups(ranked, batch_format="pandas")
