"""Data-profiling aggregates: per-group embedding centroids and fixed-bin
value histograms.

Both follow the small-finals pattern this repo uses for low-cardinality
aggregates (cf. ``pipelines/queries.py`` distinct_users_by_type,
``functions/text.py`` top_k_tokens): each block collapses to a tiny partial
table (groups x dims rows / bins rows — never data rows), the driver sums
the partials, and no all-to-all exchange happens at all. At 100 TB the
driver still sees only O(blocks x groups x dims) ints."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def embedding_centroids(ds, group_col: str = "label",
                        vec_col: str = "embedding") -> pa.Table:
    """Element-wise mean embedding per group, LONG form: one row per
    (group, dim) with the centroid component — scalar float columns compare
    cleanly against a SQL oracle, unlike list columns. Per block: one
    reshape + one ``np.add.at`` scatter-sum into a (groups x dims) partial;
    the driver merges partials and divides. Requires fixed-width vectors
    (asserted); vectors accumulate in float64."""
    from .dedup import _list_flat

    def partial(t: pa.Table) -> pa.Table:
        lab = pc.cast(t.column(group_col), pa.int64()).to_numpy(
            zero_copy_only=False)
        flat, lens = _list_flat(t.column(vec_col))
        if len(lab) == 0:
            return pa.table({"label": pa.array([], pa.int64()),
                             "dim": pa.array([], pa.int64()),
                             "s": pa.array([], pa.float64()),
                             "n": pa.array([], pa.int64())})
        d = int(lens[0])
        assert (lens == d).all(), "ragged embedding widths"
        arr = flat.astype(np.float64).reshape(len(lab), d)
        uniq, inv, cnt = np.unique(lab, return_inverse=True,
                                   return_counts=True)
        sums = np.zeros((len(uniq), d), np.float64)
        np.add.at(sums, inv, arr)
        g = np.repeat(uniq, d)
        dim = np.tile(np.arange(d, dtype=np.int64), len(uniq))
        return pa.table({"label": pa.array(g, pa.int64()),
                         "dim": pa.array(dim, pa.int64()),
                         "s": pa.array(sums.ravel(), pa.float64()),
                         "n": pa.array(np.repeat(cnt, d), pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return pa.table({"label": pa.array([], pa.int64()),
                         "dim": pa.array([], pa.int64()),
                         "centroid": pa.array([], pa.float64())})
    fin = parts.groupby(["label", "dim"], as_index=False).agg(
        s=("s", "sum"), n=("n", "sum"))
    fin = fin.sort_values(["label", "dim"]).reset_index(drop=True)
    return pa.table({
        "label": pa.array(fin["label"], pa.int64()),
        "dim": pa.array(fin["dim"], pa.int64()),
        "centroid": pa.array(np.round(fin["s"].to_numpy()
                                      / fin["n"].to_numpy(), 6),
                             pa.float64())})


def value_histogram(ds, col: str, lo: float, hi: float,
                    n_bins: int) -> pa.Table:
    """Fixed-width histogram of ``ds[col]`` over [lo, hi): bin =
    clip(floor((v - lo) / w), 0, n_bins - 1), NULL/NaN dropped — the exact
    arithmetic a SQL least/greatest/floor expression computes, so the result
    is oracle-replayable (np.histogram's inclusive right edge is NOT).
    Empty bins are omitted (matching SQL GROUP BY). Output:
    (bin, bin_lo, n) sorted by bin."""
    w = (float(hi) - float(lo)) / n_bins

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        b = np.clip(np.floor((v - lo) / w), 0, n_bins - 1).astype(np.int64)
        cnt = np.bincount(b, minlength=n_bins)
        nz = np.nonzero(cnt)[0]
        return pa.table({"bin": pa.array(nz, pa.int64()),
                         "n": pa.array(cnt[nz], pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return pa.table({"bin": pa.array([], pa.int64()),
                         "bin_lo": pa.array([], pa.float64()),
                         "n": pa.array([], pa.int64())})
    fin = parts.groupby("bin", as_index=False)["n"].sum().sort_values("bin")
    bins = fin["bin"].to_numpy()
    return pa.table({"bin": pa.array(bins, pa.int64()),
                     "bin_lo": pa.array(lo + bins * w, pa.float64()),
                     "n": pa.array(fin["n"].to_numpy(), pa.int64())})
