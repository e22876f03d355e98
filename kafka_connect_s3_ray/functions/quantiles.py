"""Exact distributed quantiles by histogram refinement.

No reference analog (sugarcrm/kafka-connect-s3 computes no aggregates); this
is an engine extension for the LLM-data catalog (SURVEY §2.11). The
approximate path is ``functions.sketch.QuantileSketch``; this module answers
the same question EXACTLY — bit-for-bit equal to a sort-and-select (and to
DuckDB's ``quantile_disc``) — without ever sorting or shuffling the data:

- pass 0: per-batch (count, min, max) partials -> driver merge (tiny);
- refinement rounds: ONE column-pruned ``map_batches`` per round emits, per
  pending item, a fixed-width histogram over that item's candidate interval
  plus each bin's observed min/max and a below-interval count. The driver
  sums the partials (O(n_items × n_bins) ints), locates the bin holding
  the target rank, and shrinks the interval to that bin's OBSERVED value
  range — so a bin full of duplicates collapses to its single value in one
  step instead of stalling the bisection;
- final pass: once a candidate interval holds ≤ ``max_collect`` rows, one
  filter pass collects just those rows and selects the exact rank locally.

``exact_quantiles`` (many quantiles, one value set) and
``grouped_exact_quantiles`` (one quantile per group) are two pass-0 fronts
over the SAME refinement engine (``_refine``): a pending item is a
(selector, rank) pair where the selector is either "all rows" or "rows of
group g", so a fix to the rank/interval invariants applies to both paths by
construction.

Scale story: every pass is a full scan of ONE column with no shuffle — the
per-batch output is a few KB of partial counts — so at 100 TB this costs
O(rounds) pruned reads and the driver holds O(n_items · n_bins +
max_collect) values. Typical convergence on real-valued data is pass 0 +
1 refinement + 1 collect.

Rank semantics match SQL ``quantile_disc``: 0-based rank
``max(ceil(q·n) − 1, 0)`` over the non-null values (NULLs and NaNs do not
participate, as in any SQL aggregate).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["exact_quantiles", "grouped_exact_quantiles"]


def _col_f64(batch: pa.Table, col: str) -> np.ndarray:
    """Non-null, non-NaN float64 view of one column (SQL aggregate scope)."""
    v = batch.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
    return v[~np.isnan(v)]


def _refine(ds, gv, keys: list, ranks: np.ndarray, lo: np.ndarray,
            hi: np.ndarray, n_bins: int, max_collect: int,
            max_rounds: int, what: str, labels: list | None = None
            ) -> np.ndarray:
    """The shared refinement engine. ``gv(batch) -> (labels_or_None, v)``
    yields the (already null-filtered) values and, for grouped callers,
    their string group labels; item i selects ``v`` where
    ``labels == keys[i]`` (or all of ``v`` when ``keys[i]`` is None) and
    seeks 0-based rank ``ranks[i]`` inside the candidate interval
    ``[lo[i], hi[i])`` — hi exclusive, so callers seed
    ``hi = nextafter(max, inf)`` and every shrink below keeps the invariant
    via ``nextafter(observed bin max)``. Returns the resolved value per
    item; raises on non-convergence (``what`` names the caller in errors,
    ``labels`` names the items — quantile values for the ungrouped front,
    whose selector keys are all None and would print uselessly).
    """
    labels = keys if labels is None else labels

    def _sel(v: np.ndarray, labels, key) -> np.ndarray:
        return v if key is None else v[labels == key]

    m = len(keys)
    out = np.full(m, np.nan)
    below_lo = np.zeros(m, np.int64)  # count of values < lo[i]
    pending = list(range(m))

    for _ in range(max_rounds):
        if not pending:
            break
        # one shared edge matrix per round: workers and driver must bin with
        # the IDENTICAL float boundaries, so edges are computed once here and
        # captured by the closure (a few KB — fine to ship per task)
        edges = np.stack([np.linspace(lo[i], hi[i], n_bins + 1)
                          for i in pending])
        edges[:, -1] = hi[pending]  # linspace rounding must not clip the top
        pkeys = [keys[i] for i in pending]

        def hist_pass(batch: pa.Table, edges=edges, pkeys=pkeys) -> pa.Table:
            labels, v = gv(batch)
            k = len(pkeys)
            hist = np.zeros((k, n_bins), np.int64)
            bmin = np.full((k, n_bins), np.inf)
            bmax = np.full((k, n_bins), -np.inf)
            below = np.zeros(k, np.int64)
            for j in range(k):  # k passes over the values, not a (N, k) temp
                vv = _sel(v, labels, pkeys[j])
                below[j] = int((vv < edges[j, 0]).sum())
                idx = np.searchsorted(edges[j], vv, side="right") - 1
                sel = (idx >= 0) & (idx < n_bins)
                iv, ix = vv[sel], idx[sel]
                np.add.at(hist[j], ix, 1)
                np.minimum.at(bmin[j], ix, iv)
                np.maximum.at(bmax[j], ix, iv)
            return pa.table({
                "qrow": pa.array(np.arange(k, dtype=np.int32)),
                "below": pa.array(below),
                "hist": pa.array(hist.tolist(), pa.list_(pa.int64())),
                "bmin": pa.array(bmin.tolist(), pa.list_(pa.float64())),
                "bmax": pa.array(bmax.tolist(), pa.list_(pa.float64())),
            })

        agg = ds.map_batches(hist_pass, batch_format="pyarrow").to_pandas()
        still = []
        for row, i in enumerate(pending):
            sub = agg[agg["qrow"] == row]  # one row per batch for item i
            h = np.sum(np.stack([np.asarray(x) for x in sub["hist"]]), axis=0)
            mn = np.min(np.stack([np.asarray(x) for x in sub["bmin"]]), axis=0)
            mx = np.max(np.stack([np.asarray(x) for x in sub["bmax"]]), axis=0)
            below = int(sub["below"].sum())
            cum = np.cumsum(h)
            b = int(np.searchsorted(cum, ranks[i] - below, side="right"))
            if b >= n_bins:  # defensive: rank must land inside the interval
                raise AssertionError(
                    f"{what} lost rank {ranks[i]} for item {labels[i]!r} "
                    f"(below={below}, in-interval={int(cum[-1])}) — "
                    f"non-deterministic input?")
            if mn[b] == mx[b]:  # whole bin is one value: that IS the answer
                out[i] = mn[b]
                continue
            # shrink to the bin's OBSERVED range (not its nominal edges):
            # guarantees strict progress even when duplicates pile up. The
            # observed min is the smallest value >= the bin's lower edge, so
            # count(v < mn[b]) == count(v < edge_b) == below + cum[:b].
            lo[i] = mn[b]
            hi[i] = np.nextafter(mx[b], np.inf)
            below_lo[i] = below + (int(cum[b - 1]) if b > 0 else 0)
            still.append((i, int(h[b]) <= max_collect))
        # ---- bounded collect for the intervals that are now small ---------
        ready = [i for i, small in still if small]
        pending = [i for i, small in still if not small]
        if ready:
            clo, chi = lo[ready].copy(), hi[ready].copy()
            rkeys = [keys[i] for i in ready]

            def collect(batch: pa.Table, clo=clo, chi=chi,
                        rkeys=rkeys) -> pa.Table:
                labels, v = gv(batch)
                qidx, vals = [], []
                for j in range(len(clo)):
                    vv = _sel(v, labels, rkeys[j])
                    msk = (vv >= clo[j]) & (vv < chi[j])
                    vals.append(vv[msk])
                    qidx.append(np.full(int(msk.sum()), j, np.int32))
                return pa.table({"qidx": pa.array(np.concatenate(qidx)),
                                 "v": pa.array(np.concatenate(vals))})

            got = ds.map_batches(collect, batch_format="pyarrow").to_pandas()
            # the interval holds ranks [below_lo, below_lo + len(vs)) of the
            # item's values, so the answer sits at rank - below_lo locally
            for j, i in enumerate(ready):
                vs = np.sort(got.loc[got["qidx"] == j, "v"].to_numpy())
                out[i] = vs[ranks[i] - int(below_lo[i])]
    if pending:
        raise AssertionError(
            f"{what} did not converge for items "
            f"{[labels[i] for i in pending]} within {max_rounds} rounds")
    return out


def exact_quantiles(ds: "ray.data.Dataset", col: str, qs: list[float],
                    n_bins: int = 4096, max_collect: int = 1_000_000,
                    max_rounds: int = 24) -> np.ndarray:
    """Exact ``quantile_disc``-style quantiles of ``ds[col]``.

    Returns a float64 array aligned with ``qs``. Raises ValueError when the
    column has no non-null values. ``max_rounds`` is a safety bound only:
    each round shrinks a candidate interval to one bin's observed value
    range, so convergence needs at most ~64/log2(n_bins) rounds even on
    adversarial float distributions.
    """
    qs = [float(q) for q in qs]
    if not qs or any(not (0.0 <= q <= 1.0) for q in qs):
        raise ValueError(f"quantiles must be in [0, 1], got {qs}")

    def gv(batch: pa.Table):
        return None, _col_f64(batch, col)

    # ---- pass 0: global count / min / max --------------------------------
    def minmax(batch: pa.Table) -> pa.Table:
        v = _col_f64(batch, col)
        if len(v) == 0:
            return pa.table({"n": pa.array([0], pa.int64()),
                             "lo": pa.array([np.inf], pa.float64()),
                             "hi": pa.array([-np.inf], pa.float64())})
        return pa.table({"n": pa.array([len(v)], pa.int64()),
                         "lo": pa.array([float(v.min())], pa.float64()),
                         "hi": pa.array([float(v.max())], pa.float64())})

    parts = ds.map_batches(minmax, batch_format="pyarrow").to_pandas()
    n = int(parts["n"].sum())
    if n == 0:
        raise ValueError(f"exact_quantiles: column {col!r} has no non-null values")
    glo = float(parts["lo"].min())
    ghi = float(parts["hi"].max())
    ranks = np.array([max(int(np.ceil(q * n)) - 1, 0) for q in qs],
                     np.int64)  # quantile_disc
    return _refine(ds, gv, [None] * len(qs), ranks,
                   np.full(len(qs), glo),
                   np.full(len(qs), np.nextafter(ghi, np.inf)),
                   n_bins, max_collect, max_rounds, "exact_quantiles",
                   labels=qs)


def grouped_exact_quantiles(ds: "ray.data.Dataset", group_col: str, col: str,
                            q: float, n_bins: int = 4096,
                            max_collect: int = 1_000_000,
                            max_rounds: int = 24) -> "dict":
    """Exact per-group ``quantile_disc(col, q)`` — the grouped front of the
    same refinement engine as ``exact_quantiles``: every round is ONE
    column-pruned scan emitting per-(group, pending) histogram partials; no
    per-group sort, no shuffle, driver state = O(groups x n_bins) ints.

    Returns {group_value: quantile}. Designed for LOW-CARDINALITY group
    columns (an event_type / lang / label — the per-batch kernel loops over
    pending groups); a high-cardinality grouped quantile should use the
    mergeable ``QuantileSketch`` per group instead. NULL group rows are
    excluded (SQL GROUP BY drops no rows, but a NULL group is its own SQL
    group — callers wanting it can fill_null first; the fixtures have none)."""
    if not (0.0 <= float(q) <= 1.0):
        raise ValueError(f"quantile must be in [0, 1], got {q}")

    def gv(batch: pa.Table):
        g = batch.column(group_col).to_numpy(zero_copy_only=False)
        v = batch.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        keep = ~np.isnan(v)
        keep &= ~batch.column(group_col).is_null().to_numpy(
            zero_copy_only=False)
        return g[keep].astype(str), v[keep]

    # ---- pass 0: per-group count / min / max ------------------------------
    def minmax(batch: pa.Table) -> pa.Table:
        import pandas as pd

        g, v = gv(batch)
        if len(v) == 0:
            return pa.table({"g": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "lo": pa.array([], pa.float64()),
                             "hi": pa.array([], pa.float64())})
        f = pd.DataFrame({"g": g, "v": v}).groupby("g")["v"]
        agg = f.agg(["size", "min", "max"]).reset_index()
        return pa.table({"g": pa.array(agg["g"], pa.string()),
                         "n": pa.array(agg["size"].astype(np.int64)),
                         "lo": pa.array(agg["min"], pa.float64()),
                         "hi": pa.array(agg["max"], pa.float64())})

    parts = ds.map_batches(minmax, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return {}
    top = parts.groupby("g").agg(n=("n", "sum"), lo=("lo", "min"),
                                 hi=("hi", "max")).reset_index()
    groups = top["g"].tolist()
    n = top["n"].to_numpy()
    ranks = np.maximum(np.ceil(float(q) * n).astype(np.int64) - 1, 0)
    vals = _refine(ds, gv, groups, ranks, top["lo"].to_numpy().copy(),
                   np.nextafter(top["hi"].to_numpy(), np.inf),
                   n_bins, max_collect, max_rounds,
                   "grouped_exact_quantiles")
    return {g: float(x) for g, x in zip(groups, vals)}


def global_rank(ds, val_col: str, id_col: str, n_buckets: int = 32):
    """Exact global rank + percentile normalization of every row by
    ``(val_col, id_col)`` order — the quality-score -> percentile step of a
    curation pipeline, without a global sort operator.

    Distributed as a VALUE-bucketed offset rank (the value-ordered cousin of
    ``sample.seeded_shuffle``): bucket bounds come from ``exact_quantiles``
    at n_buckets fractions (bounds only affect bucket BALANCE, never the
    rank, so approximate bounds would suffice — measured, though, the
    mergeable sketch's per-batch serialize/merge costs MORE than the exact
    refinement at panel scale, so exact stays); a constant column
    degenerates to one bucket, which is correct, just unbalanced.
    Per-block bincount partials give driver prefix offsets, and
    one bucket exchange sorts locally by (val, id) and adds its offset.
    Equal values across bucket BOUNDS stay together: assignment is
    searchsorted(bounds, v, 'left'), so a run of duplicates lands in one
    bucket and within-bucket lexsort settles it — rnk is exactly
    ``row_number() OVER (ORDER BY val, id) - 1``. NULL/NaN values are
    excluded (SQL ORDER BY scope is the non-null WHERE; the fixtures carry
    no NaN); an ALL-null column yields an empty result, matching the
    oracle, not a raise. pct = rnk / (n - 1) rounded to 6 dp (0 for a
    single row). Returns a Dataset of (id_col, val_col, rnk, pct) —
    ``rnk`` because ``rank`` is a SQL keyword on the oracle side. Shares
    the bucket-offset scaffolding with ``sample.seeded_shuffle``
    (rank.bucket_offsets / rank_by_bucket)."""
    import pandas as pd

    import ray.data

    from .rank import rank_by_bucket

    got = _value_bucketed(ds, val_col, id_col, n_buckets)
    if got is None:  # no non-null values: the oracle's empty set
        return ray.data.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            val_col: pa.array([], pa.float64()),
            "rnk": pa.array([], pa.int64()),
            "pct": pa.array([], pa.float64())}))
    meta, offsets, n_all = got
    denom = float(max(n_all - 1, 1))

    def rank(g: pd.DataFrame, off: int) -> pd.DataFrame:
        v = g["v"].to_numpy(np.float64)
        k = g[id_col].to_numpy(np.int64)
        order = np.lexsort((k, v))
        pos = np.empty(len(g), np.int64)
        pos[order] = off + np.arange(len(g))
        return pd.DataFrame({id_col: k, val_col: v, "rnk": pos,
                             "pct": np.round(pos / denom, 6)})

    return rank_by_bucket(meta, offsets, rank)


def _value_bucketed(ds, val_col: str, id_col: str, n_buckets: int):
    """Shared front of the value-ordered offset-rank family (``global_rank``,
    ``ntile``): exact-quantile bucket bounds, one column-pruned projection to
    (id, v, bucket) with NULL/NaN rows dropped, and the bincount prefix
    offsets. Returns (meta, offsets, n_all), or None when no non-null value
    exists (callers emit their typed empty result)."""
    from .rank import bucket_offsets

    fracs = [i / n_buckets for i in range(1, n_buckets)]
    try:
        bounds = np.asarray(exact_quantiles(ds, val_col, fracs), np.float64)
    except ValueError:
        return None

    def project(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column(val_col)))
        v = t.column(val_col).to_numpy(zero_copy_only=False).astype(np.float64)
        keep = ~np.isnan(v)
        ids = pc.cast(t.column(id_col), pa.int64()).to_numpy(
            zero_copy_only=False)[keep]
        v = v[keep]
        b = np.searchsorted(bounds, v, side="left").astype(np.int64)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "v": pa.array(v, pa.float64()),
                         "bucket": pa.array(b, pa.int64())})

    meta = ds.map_batches(project, batch_format="pyarrow").materialize()
    offsets, n_all = bucket_offsets(meta, n_buckets)
    return meta, offsets, n_all


def ntile(ds, val_col: str, id_col: str, k: int, n_buckets: int = 32):
    """SQL ``NTILE(k) OVER (ORDER BY val, id)`` without a global sort: the
    same value-bucketed offset rank as ``global_rank``, then the standard
    NTILE split applied to the global 0-based rank r in closed form — with
    n rows, q = n // k and rem = n % k, the first rem tiles hold q + 1 rows:

        tile(r) = r // (q+1) + 1                      if r <  rem * (q+1)
                  rem + (r - rem*(q+1)) // q + 1      otherwise

    (q == 0, i.e. n < k, degenerates to tile = r + 1 — one row per leading
    tile — which is exactly SQL's behavior). Tiles are 1-based int64 like
    DuckDB's BIGINT NTILE. NULL/NaN values are excluded on both sides, same
    contract as ``global_rank``; ties across bucket bounds are settled by
    the (val, id) lexsort inside one bucket because bucket assignment uses
    searchsorted 'left' on the value alone. One exchange, never a sort."""
    import pandas as pd

    import ray.data

    from .rank import rank_by_bucket

    if int(k) < 1:
        raise ValueError(f"ntile k must be >= 1, got {k}")
    k = int(k)
    got = _value_bucketed(ds, val_col, id_col, n_buckets)
    if got is None:
        return ray.data.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            val_col: pa.array([], pa.float64()),
            "tile": pa.array([], pa.int64())}))
    meta, offsets, n_all = got

    def tiles(g: pd.DataFrame, off: int) -> pd.DataFrame:
        v = g["v"].to_numpy(np.float64)
        ids = g[id_col].to_numpy(np.int64)
        order = np.lexsort((ids, v))
        r = np.empty(len(g), np.int64)
        r[order] = off + np.arange(len(g))
        return pd.DataFrame({id_col: ids, val_col: v,
                             "tile": ntile_of_rank(r, n_all, k)})

    return rank_by_bucket(meta, offsets, tiles)


def ntile_of_rank(r, n, k: int) -> np.ndarray:
    """SQL ``NTILE(k)`` of 0-based rank ``r`` among ``n`` rows, vectorized
    (``n`` scalar for the global window, per-row array for the grouped one):
    with q = n // k and rem = n % k the first rem tiles take q + 1 rows;
    n < k degenerates to one row per leading tile. The ONE closed form both
    ``ntile`` and ``grouped_ntile`` apply — property-tested against DuckDB's
    NTILE over randomized (n, k) in test_property_round4."""
    r = np.asarray(r, np.int64)
    n = np.asarray(n, np.int64)
    q, rem = np.divmod(n, k)
    cut = rem * (q + 1)
    return (np.where(q == 0, r,
                     np.where(r < cut, r // np.maximum(q + 1, 1),
                              rem + (r - cut) // np.maximum(q, 1)))
            + 1).astype(np.int64)


def grouped_ntile(ds, group_col: str, val_col: str, id_col: str, k: int,
                  n_buckets: int = 64):
    """``NTILE(k) OVER (PARTITION BY group ORDER BY val, id)`` — and unlike
    the global ``ntile``, this needs NO driver offsets at all: the coarse
    group-hash exchange co-locates each partition's rows in exactly one
    bucket, so the group's size and local sort order ARE the window, and the
    closed-form NTILE split (see ``ntile``) applies bucket-locally. ONE
    exchange, zero driver state, any number of groups. NULL groups and
    NULL/NaN values are excluded on both sides (the mad_outliers WHERE
    scope — SQL's PARTITION BY would otherwise make NULL its own partition
    and NULLS LAST would tile null values, a contract nobody wants from a
    quality-band splitter). Returns (id, group, val, tile int64 1-based)."""
    import pandas as pd

    if int(k) < 1:
        raise ValueError(f"grouped_ntile k must be >= 1, got {k}")
    k = int(k)

    def project(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t.column(group_col)),
                             pc.is_valid(t.column(val_col))))
        v = t.column(val_col).to_numpy(zero_copy_only=False).astype(np.float64)
        keep = ~np.isnan(v)
        ids = pc.cast(t.column(id_col), pa.int64()).to_numpy(
            zero_copy_only=False)[keep]
        g = t.column(group_col).to_pandas().astype(str).to_numpy()[keep]
        b = (pd.util.hash_array(g.astype(object)) %
             np.uint64(n_buckets)).astype(np.int64)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         group_col: pa.array(g, pa.string()),
                         "v": pa.array(v[keep], pa.float64()),
                         "bucket": pa.array(b, pa.int64())})

    def tiles(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([group_col, "v", id_col],
                          kind="stable").reset_index(drop=True)
        grp = g.groupby(group_col, sort=False)
        r = grp.cumcount().to_numpy(np.int64)
        n = grp[id_col].transform("size").to_numpy(np.int64)
        return pd.DataFrame({id_col: g[id_col], group_col: g[group_col],
                             val_col: g["v"],
                             "tile": ntile_of_rank(r, n, k)})

    return (ds.map_batches(project, batch_format="pyarrow")
            .groupby("bucket").map_groups(tiles, batch_format="pandas"))


def global_value_ranks(ds, val_col: str, id_col: str, n_buckets: int = 32):
    """The full SQL rank family in ONE sortless shape — ``row_number() - 1``
    (by (val, id)), ``dense_rank()`` and ``cume_dist()`` (by val) — over the
    same value-bucketed meta as ``global_rank``. Ties never straddle
    buckets (searchsorted 'left' on the value alone), so every per-value
    statistic is bucket-local plus a driver offset:

    - row rank: bucket row-count prefix + local lexsort position;
    - dense rank: bucket DISTINCT-count prefix + local run index — distinct
      counts need the whole bucket, so a first tiny per-bucket stats
      exchange (one row per bucket) precedes the ranking exchange (two
      exchanges total, both of the already-materialized meta);
    - cume_dist: (bucket row offset + local count of values <= v) / n,
      rounded to 6 dp (the catalog float contract).

    NULL/NaN excluded as in ``global_rank``; empty input -> typed empty."""
    import pandas as pd

    import ray
    import ray.data

    got = _value_bucketed(ds, val_col, id_col, n_buckets)
    if got is None:
        return ray.data.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            val_col: pa.array([], pa.float64()),
            "rnk": pa.array([], pa.int64()),
            "dense_rnk": pa.array([], pa.int64()),
            "cume": pa.array([], pa.float64())}))
    meta, offsets, n_all = got

    def bucket_stats(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"bucket": [int(g["bucket"].iloc[0])],
                             "rows": [len(g)],
                             "distinct": [int(g["v"].nunique())]})

    stats = (meta.groupby("bucket")
             .map_groups(bucket_stats, batch_format="pandas").to_pandas()
             .sort_values("bucket"))
    dense_off = np.zeros(n_buckets, np.int64)
    d = np.zeros(n_buckets, np.int64)
    d[stats["bucket"].to_numpy()] = stats["distinct"].to_numpy()
    dense_off[1:] = np.cumsum(d)[:-1]
    ref = ray.put((offsets, dense_off))

    def ranks(g: pd.DataFrame) -> pd.DataFrame:
        offs, doffs = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        b = int(g["bucket"].iloc[0])
        v = g["v"].to_numpy(np.float64)
        ids = g[id_col].to_numpy(np.int64)
        order = np.lexsort((ids, v))
        rnk = np.empty(len(g), np.int64)
        rnk[order] = int(offs[b]) + np.arange(len(g))
        vs = v[order]
        dense_sorted = np.cumsum(np.r_[True, np.diff(vs) != 0])  # 1-based
        dense = np.empty(len(g), np.int64)
        dense[order] = int(doffs[b]) + dense_sorted
        count_le = int(offs[b]) + np.searchsorted(vs, v, side="right")
        return pd.DataFrame({id_col: ids, val_col: v, "rnk": rnk,
                             "dense_rnk": dense,
                             "cume": np.round(count_le / n_all, 6)})

    return meta.groupby("bucket").map_groups(ranks, batch_format="pandas")


def _refine_weighted(ds, gvw, keys: list, targets: np.ndarray,
                     lo: np.ndarray, hi: np.ndarray, n_bins: int,
                     max_collect: int, max_rounds: int, what: str
                     ) -> np.ndarray:
    """Weighted sibling of ``_refine``: item i seeks the smallest value v
    with cumulative WEIGHT(values <= v) >= targets[i] inside [lo[i], hi[i])
    — the weighted-quantile selector. Kept as a sibling rather than a
    parameter of ``_refine`` because the two differ in kind, not degree:
    ranks are exact int64 arithmetic, weight masses are float64 partial
    sums (exact for integer-valued weights under 2^53, the documented
    contract), the crossing test is >= on mass instead of searchsorted on
    count, and the collect step resolves WITHIN a value's weight. The
    histogram/below/observed-min-max invariants and the shrink-to-observed-
    range progress guarantee are copied from ``_refine`` verbatim.
    ``gvw(batch) -> (labels, v, w)`` yields null-filtered values, their
    group labels, and strictly-positive weights."""
    m = len(keys)
    out = np.full(m, np.nan)
    below_w = np.zeros(m, np.float64)  # weight of values < lo[i]
    pending = list(range(m))

    for _ in range(max_rounds):
        if not pending:
            break
        edges = np.stack([np.linspace(lo[i], hi[i], n_bins + 1)
                          for i in pending])
        edges[:, -1] = hi[pending]
        pkeys = [keys[i] for i in pending]

        def hist_pass(batch: pa.Table, edges=edges, pkeys=pkeys) -> pa.Table:
            labels, v, w = gvw(batch)
            k = len(pkeys)
            wsum = np.zeros((k, n_bins), np.float64)
            cnt = np.zeros((k, n_bins), np.int64)
            bmin = np.full((k, n_bins), np.inf)
            bmax = np.full((k, n_bins), -np.inf)
            below = np.zeros(k, np.float64)
            for j in range(k):
                sel = labels == pkeys[j]
                vv, ww = v[sel], w[sel]
                below[j] = float(ww[vv < edges[j, 0]].sum())
                idx = np.searchsorted(edges[j], vv, side="right") - 1
                s = (idx >= 0) & (idx < n_bins)
                iv, iw, ix = vv[s], ww[s], idx[s]
                np.add.at(wsum[j], ix, iw)
                np.add.at(cnt[j], ix, 1)
                np.minimum.at(bmin[j], ix, iv)
                np.maximum.at(bmax[j], ix, iv)
            return pa.table({
                "qrow": pa.array(np.arange(k, dtype=np.int32)),
                "below": pa.array(below),
                "wsum": pa.array(wsum.tolist(), pa.list_(pa.float64())),
                "cnt": pa.array(cnt.tolist(), pa.list_(pa.int64())),
                "bmin": pa.array(bmin.tolist(), pa.list_(pa.float64())),
                "bmax": pa.array(bmax.tolist(), pa.list_(pa.float64())),
            })

        agg = ds.map_batches(hist_pass, batch_format="pyarrow").to_pandas()
        still = []
        for row, i in enumerate(pending):
            sub = agg[agg["qrow"] == row]
            ws = np.sum(np.stack([np.asarray(x) for x in sub["wsum"]]), axis=0)
            ct = np.sum(np.stack([np.asarray(x) for x in sub["cnt"]]), axis=0)
            mn = np.min(np.stack([np.asarray(x) for x in sub["bmin"]]), axis=0)
            mx = np.max(np.stack([np.asarray(x) for x in sub["bmax"]]), axis=0)
            below = float(sub["below"].sum())
            cum = below + np.cumsum(ws)
            crossing = np.flatnonzero(cum >= targets[i])
            if not len(crossing):
                raise AssertionError(
                    f"{what} lost target {targets[i]} for item {keys[i]!r} "
                    f"(below={below}, in-interval mass={float(ws.sum())}) — "
                    f"non-deterministic input?")
            b = int(crossing[0])
            if mn[b] == mx[b]:  # whole bin is one value: that IS the answer
                out[i] = mn[b]
                continue
            lo[i] = mn[b]
            hi[i] = np.nextafter(mx[b], np.inf)
            below_w[i] = float(cum[b - 1]) if b > 0 else below
            still.append((i, int(ct[b]) <= max_collect))
        ready = [i for i, small in still if small]
        pending = [i for i, small in still if not small]
        if ready:
            clo, chi = lo[ready].copy(), hi[ready].copy()
            rkeys = [keys[i] for i in ready]

            def collect(batch: pa.Table, clo=clo, chi=chi,
                        rkeys=rkeys) -> pa.Table:
                labels, v, w = gvw(batch)
                qidx, vals, wts = [], [], []
                for j in range(len(clo)):
                    sel = labels == rkeys[j]
                    vv, ww = v[sel], w[sel]
                    msk = (vv >= clo[j]) & (vv < chi[j])
                    vals.append(vv[msk])
                    wts.append(ww[msk])
                    qidx.append(np.full(int(msk.sum()), j, np.int32))
                return pa.table({"qidx": pa.array(np.concatenate(qidx)),
                                 "v": pa.array(np.concatenate(vals)),
                                 "w": pa.array(np.concatenate(wts))})

            got = ds.map_batches(collect, batch_format="pyarrow").to_pandas()
            for j, i in enumerate(ready):
                sub = got[got["qidx"] == j]
                vs = sub["v"].to_numpy(np.float64)
                ws_ = sub["w"].to_numpy(np.float64)
                o = np.argsort(vs, kind="stable")
                vs, ws_ = vs[o], ws_[o]
                # cumulative mass AT each value = below_w + cumsum through
                # ALL rows of that value (ties share their peak cumsum,
                # matching SQL's RANGE-frame sum over value peers)
                cumw = below_w[i] + np.cumsum(ws_)
                # last index of each distinct value carries the full mass
                last = np.r_[vs[1:] != vs[:-1], True]
                vs_d, cum_d = vs[last], cumw[last]
                hit = np.flatnonzero(cum_d >= targets[i])
                if not len(hit):
                    raise AssertionError(
                        f"{what} collect lost target for {keys[i]!r}")
                out[i] = vs_d[hit[0]]
    if pending:
        raise AssertionError(
            f"{what} did not converge for items "
            f"{[keys[i] for i in pending]} within {max_rounds} rounds")
    return out


def grouped_weighted_quantile(ds: "ray.data.Dataset", group_col: str,
                              val_col: str, w_col: str, q: float = 0.5,
                              n_bins: int = 128, max_collect: int = 65536,
                              max_rounds: int = 40):
    """Exact weighted quantile per group: the smallest value v in the group
    with sum(weight | value <= v) >= q * sum(weight) — the
    weighted-median/quantile selector (token-weighted length cuts, spend-
    weighted percentiles) that plain quantiles misstate whenever weights
    skew. NULL/NaN values and non-positive/NULL weights are excluded (the
    documented scope, mirrored by the SQL oracle's WHERE). Integer-valued
    weights keep every mass comparison exact in float64 (< 2^53).

    Same scale story as ``grouped_exact_quantiles``: O(rounds) pruned
    column scans, a few KB of partials per batch, no shuffle, driver holds
    O(groups x bins). Returns a pandas DataFrame (group, wq)."""
    import pandas as pd

    if not 0.0 <= q <= 1.0:
        raise ValueError(f"grouped_weighted_quantile: q must be in [0, 1], "
                         f"got {q}")

    def gvw(batch: pa.Table):
        g = batch.column(group_col).to_numpy(zero_copy_only=False)
        v = batch.column(val_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        w = batch.column(w_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        # finite values only (an inf would poison the linspace bin edges),
        # strictly-positive finite weights, and NO NULL group labels — the
        # grouped_exact_quantiles scope, mirrored by the oracle's WHERE
        keep = (np.isfinite(v) & np.isfinite(w) & (w > 0)
                & pd.notna(g))
        return g[keep], v[keep], w[keep]

    def pass0(batch: pa.Table) -> pa.Table:
        g, v, w = gvw(batch)
        if len(g) == 0:
            return pa.table({"g": pa.array([], pa.string()),
                             "w": pa.array([], pa.float64()),
                             "mn": pa.array([], pa.float64()),
                             "mx": pa.array([], pa.float64())})
        import pandas as pd
        df = pd.DataFrame({"g": g.astype(str), "v": v, "w": w})
        a = df.groupby("g", as_index=False).agg(
            w=("w", "sum"), mn=("v", "min"), mx=("v", "max"))
        return pa.Table.from_pandas(a, preserve_index=False)

    parts = ds.map_batches(pass0, batch_format="pyarrow").to_pandas()
    if len(parts) == 0:
        return pd.DataFrame({group_col: pd.Series([], dtype=object),
                             "wq": pd.Series([], dtype=np.float64)})
    tot = parts.groupby("g", as_index=False).agg(
        w=("w", "sum"), mn=("mn", "min"), mx=("mx", "max"))
    keys = tot["g"].tolist()
    targets = q * tot["w"].to_numpy(np.float64)
    lo = tot["mn"].to_numpy(np.float64).copy()
    hi = np.nextafter(tot["mx"].to_numpy(np.float64), np.inf)

    def gvw_str(batch: pa.Table):
        g, v, w = gvw(batch)
        return g.astype(str), v, w

    vals = _refine_weighted(ds, gvw_str, keys, targets, lo, hi, n_bins,
                            max_collect, max_rounds,
                            "grouped_weighted_quantile")
    return pd.DataFrame({group_col: keys, "wq": vals})
