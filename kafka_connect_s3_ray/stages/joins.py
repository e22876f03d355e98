"""Join strategies, Ray-Data-first.

The reference has no relational joins (its only lookup is the cursor->index
two-hop, sink/.../S3Writer.java:69-96); these are the join-shaped operators a
lake engine needs, each with an explicit distribution strategy:

- ``broadcast_join``   small side shipped ONCE via ``ray.put`` and merged
                       per batch inside ``map_batches`` — no shuffle at all.
                       Use when one side fits comfortably in a worker heap.
- ``hash_join``        both sides large: Ray's native hash-partitioned
                       ``Dataset.join`` (alpha in this Ray release), with
                       ``num_partitions`` the explicit exchange width.
- ``asof_join``        ordered semantics (each left row matched to the most
                       recent right row at or before it, per key): co-locate
                       by a COARSE key bucket (bounded group count — see the
                       coarse-bucket note in functions/dedup.py), then one
                       vectorized ``pd.merge_asof`` per bucket.
- ``semi/anti``        broadcast the key set and filter inside map_batches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

N_COARSE = 64


def broadcast_join(ds: "ray.data.Dataset", small: pd.DataFrame, on: str | list[str],
                   how: str = "inner", right_on: str | list[str] | None = None,
                   concurrency: int = 2) -> "ray.data.Dataset":
    """Join a Dataset against a small in-memory table. The small side is put
    into the object store once; each actor fetches it once in ``__init__``
    (never re-shipped per batch) and does a vectorized pandas merge."""
    ref = ray.put(small)

    class Joiner:
        def __init__(self):
            self.small = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            return batch.merge(self.small, how=how, left_on=on,
                               right_on=right_on or on)

    return ds.map_batches(Joiner, batch_format="pandas", concurrency=concurrency)


def semi_join(ds: "ray.data.Dataset", keys, on: str, anti: bool = False,
              concurrency: int = 2) -> "ray.data.Dataset":
    """Semi/anti join via a broadcast key set — a filter, not a shuffle."""
    ref = ray.put(np.asarray(list(keys)))

    class Filter:
        def __init__(self):
            self.keys = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vals = batch.column(on).to_numpy(zero_copy_only=False)
            mask = np.isin(vals, self.keys, invert=anti)
            return batch.filter(pa.array(mask))

    return ds.map_batches(Filter, batch_format="pyarrow", concurrency=concurrency)


def hash_join(left: "ray.data.Dataset", right: "ray.data.Dataset",
              on: str | tuple, join_type: str = "inner",
              num_partitions: int = 16, **kw) -> "ray.data.Dataset":
    """Both-sides-large hash join: Ray's hash-partitioned Dataset.join with an
    explicit partition count (the exchange width)."""
    on_t = (on,) if isinstance(on, str) else tuple(on)
    return left.join(right, join_type=join_type, num_partitions=num_partitions,
                     on=on_t, **kw)


def asof_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    key: str,
    ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    direction: str = "backward",
    n_coarse: int = N_COARSE,
) -> "ray.data.Dataset":
    """As-of join: for each left row, the most recent right row with
    ``right.ts <= left.ts`` (direction='backward') for the same key.

    Distribution: both sides are tagged with a coarse hash bucket of ``key``
    and aligned onto one union schema (each side null-fills the other's
    columns), unioned, grouped ONCE by the bucket (all rows of a key
    co-locate; group count stays bounded — see the coarse-bucket note in
    functions/dedup.py), and each bucket runs a single vectorized
    ``pd.merge_asof`` over its sorted slice. One shuffle total, no driver
    state. Partitioning assumption: a bucket's rows fit one task — raise
    ``n_coarse`` for bigger inputs."""
    lsch, rsch = left.schema(), right.schema()
    ltypes = dict(zip(lsch.names, lsch.types))
    rtypes = dict(zip(rsch.names, rsch.types))
    rkeep = [key, ts] + [c for c in (right_cols or rsch.names) if c not in (key, ts)]
    # right payload columns renamed when they collide with left names
    rmap = {c: (c if c in (key, ts) or c not in ltypes else c + suffix) for c in rkeep}
    right_only = [rmap[c] for c in rkeep if rmap[c] not in ltypes]
    all_cols = list(lsch.names) + right_only
    col_types = dict(ltypes)
    for c in rkeep:
        col_types.setdefault(rmap[c], rtypes[c])

    def tag(side: str):
        def fn(t: pa.Table, _s=side) -> pa.Table:
            if _s == "r":
                t = t.select([c for c in rkeep if c in t.column_names])
                t = t.rename_columns([rmap[c] for c in t.column_names])
            cols = [
                t.column(c).cast(col_types[c]) if c in t.column_names
                else pa.nulls(len(t), col_types[c])
                for c in all_cols
            ]
            t = pa.table(dict(zip(all_cols, cols)))
            k = t.column(key).to_numpy(zero_copy_only=False)
            if k.dtype.kind not in ("i", "u"):
                k = k.astype(object)
            coarse = (pd.util.hash_array(np.ascontiguousarray(k)) %
                      np.uint64(n_coarse)).astype(np.int32)
            t = t.append_column("_side", pa.array([_s] * len(t)))
            return t.append_column("_coarse", pa.array(coarse))

        return fn

    lt = left.map_batches(tag("l"), batch_format="pyarrow")
    rt = right.map_batches(tag("r"), batch_format="pyarrow")

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # the union frame already carries right_only columns null-filled with
        # the right dtypes (tag() builds them via pa.nulls(col_types)), so the
        # empty branches can keep them as-is — no dtype divergence across
        # buckets
        l_full = g[g["_side"] == "l"].drop(columns=["_side", "_coarse"])
        r = g[g["_side"] == "r"][[key, ts] + right_only]
        if l_full.empty or r.empty:
            return l_full
        l = l_full.drop(columns=right_only).sort_values([ts, key], kind="stable")
        r = r.sort_values([ts, key], kind="stable")
        return pd.merge_asof(l, r, on=ts, by=key, direction=direction)

    both = lt.union(rt)
    return both.groupby("_coarse").map_groups(merge_bucket, batch_format="pandas")
