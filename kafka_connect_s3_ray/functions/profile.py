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


def zscore_outliers(ds, group_col: str, val_col: str,
                    threshold: float = 3.0):
    """Per-group z-score outlier detection: rows where
    ``|round((v - mu_g) / sd_g, 6)| > threshold`` with population moments per
    group. One tiny-partials pass ((group, n, sum, sumsq) per block — never
    data rows), a driver-side merge into per-group (mu, sd), then a broadcast
    streaming filter pass: zero all-to-all exchange at any corpus size, the
    same two-stage shape as ``pca_project``. The compare runs on the ROUNDED
    z on both engine and oracle, so float summation-order noise below 1e-6
    cannot flip a row across the threshold. NULL values and NULL groups are
    excluded (SQL aggregate + equi-join scope); groups with sd = 0 emit no
    rows (NULL z in SQL). Returns a Dataset of
    (group_col, id-and-value passthrough columns, z)."""
    import ray

    def partial(t: pa.Table) -> pa.Table:
        # explicit schema: an all-filtered block must not emit a null-typed
        # group column (from_pandas inference) and drift the block schemas
        gtype = t.schema.field(group_col).type
        t = t.filter(pc.and_(pc.is_valid(t.column(group_col)),
                             pc.is_valid(t.column(val_col))))
        g = t.column(group_col).to_pandas()
        v = t.column(val_col).to_numpy(zero_copy_only=False).astype(np.float64)
        keep = ~np.isnan(v)
        df = pd.DataFrame({"g": g[keep].to_numpy(), "v": v[keep]})
        df["v2"] = df["v"] * df["v"]
        out = df.groupby("g", as_index=False).agg(
            n=("v", "size"), s=("v", "sum"), s2=("v2", "sum"))
        return pa.table({"g": pa.array(out["g"], gtype),
                         "n": pa.array(out["n"], pa.int64()),
                         "s": pa.array(out["s"], pa.float64()),
                         "s2": pa.array(out["s2"], pa.float64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        raise ValueError("zscore_outliers: no non-null rows")
    fin = parts.groupby("g", as_index=False).agg(
        n=("n", "sum"), s=("s", "sum"), s2=("s2", "sum"))
    mu = fin["s"].to_numpy() / fin["n"].to_numpy()
    var = fin["s2"].to_numpy() / fin["n"].to_numpy() - mu * mu
    sd = np.sqrt(np.maximum(var, 0.0))
    ok = sd > 0.0  # lookup dicts built ONCE, not per batch
    ref = ray.put(({g: m for g, m, k in zip(fin["g"], mu, ok) if k},
                   {g: d for g, d, k in zip(fin["g"], sd, ok) if k}))

    def score(t: pa.Table) -> pa.Table:
        mu_of, sd_of = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        t = t.filter(pc.and_(pc.is_valid(t.column(group_col)),
                             pc.is_valid(t.column(val_col))))
        g = t.column(group_col).to_pandas()
        v = t.column(val_col).to_numpy(zero_copy_only=False).astype(np.float64)
        mu = g.map(mu_of).to_numpy(np.float64)
        sd = g.map(sd_of).to_numpy(np.float64)
        with np.errstate(invalid="ignore"):
            z = np.round((v - mu) / sd, 6)
        keep = np.abs(z) > threshold  # NaN compares False: sd=0 groups drop
        return t.filter(pa.array(keep)).append_column(
            "z", pa.array(z[keep], pa.float64()))

    return ds.map_batches(score, batch_format="pyarrow")


def _cov_moments(ds, vec_col: str):
    """One streaming pass -> (d, n, s, s2): vector width, non-null count,
    per-dim sums, and the (d x d) sum of outer products. NULL embeddings are
    excluded (the SQL aggregate scope — covar_pop's oracle filters
    embedding IS NOT NULL). Returns None when no non-null vectors exist.
    Shared by ``embedding_covariance`` and ``pca_project`` so the mean never
    needs a second scan."""
    from .dedup import _list_flat

    def partial(t: pa.Table) -> pa.Table:
        col = t.column(vec_col)
        if col.null_count:
            col = col.drop_null()
        flat, lens = _list_flat(col)
        if len(lens) == 0:
            return pa.table({"d": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "s": pa.array([], pa.list_(pa.float64())),
                             "s2": pa.array([], pa.list_(pa.float64()))})
        d = int(lens[0])
        if not (lens == d).all():
            raise ValueError("ragged embedding widths within a block")
        x = flat.astype(np.float64).reshape(-1, d)
        return pa.table({
            "d": pa.array([d], pa.int64()),
            "n": pa.array([len(x)], pa.int64()),
            "s": pa.array([x.sum(axis=0).tolist()], pa.list_(pa.float64())),
            "s2": pa.array([(x.T @ x).ravel().tolist()],
                           pa.list_(pa.float64()))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return None
    d = int(parts["d"].iloc[0])
    if (parts["d"] != d).any():
        raise ValueError("embedding width differs across blocks")
    n = int(parts["n"].sum())
    s = np.sum(np.stack([np.asarray(v) for v in parts["s"]]), axis=0)
    s2 = np.sum(np.stack([np.asarray(v) for v in parts["s2"]]),
                axis=0).reshape(d, d)
    return d, n, s, s2


def embedding_covariance(ds, vec_col: str = "embedding") -> pa.Table:
    """Population covariance matrix of the embedding columns, LONG upper
    triangle: one row per (dim_i, dim_j), i <= j, cov rounded to 6 dp (the
    same float contract as ``embedding_centroids``). The distributed-PCA
    building block: each block collapses to ONE (d x d) X^T X partial plus
    column sums — a 64-dim corpus ships 4k floats per block no matter how
    many rows it holds; the driver merges partials and applies
    cov = S2/n - outer(s, s)/n^2. No exchange, no second pass. NULL
    embeddings are excluded (SQL aggregate scope)."""
    m = _cov_moments(ds, vec_col)
    if m is None:
        return pa.table({"dim_i": pa.array([], pa.int64()),
                         "dim_j": pa.array([], pa.int64()),
                         "cov": pa.array([], pa.float64())})
    d, n, s, s2 = m
    cov = s2 / n - np.outer(s, s) / (n * n)
    iu, ju = np.triu_indices(d)
    return pa.table({"dim_i": pa.array(iu.astype(np.int64)),
                     "dim_j": pa.array(ju.astype(np.int64)),
                     "cov": pa.array(np.round(cov[iu, ju], 6), pa.float64())})


def pca_project(ds, q: int, vec_col: str = "embedding",
                id_col: str = "vec_id"):
    """Project embeddings onto their top-q principal components. Covariance
    AND mean come from ONE streaming pass of moment partials (the corpus is
    never centered in memory and never re-scanned), the (d x d)
    eigendecomposition runs on the driver over the 6 dp-rounded covariance
    (the published oracle contract of ``embedding_covariance``), and the
    (d x q) component matrix broadcasts into a streaming map_batches — the
    classic two-stage distributed PCA. Deterministic: components are
    sign-fixed (largest-|loading| coordinate positive, ties to the lower
    index) and eigenvalues sort descending. NULL embeddings are dropped.
    Returns a Dataset of (id_col, pc_0..pc_{q-1}) float64 columns."""
    import ray

    from .dedup import _list_flat

    m = _cov_moments(ds, vec_col)
    if m is None:
        raise ValueError("pca_project: no embeddings")
    d, n, s, s2 = m
    if not (1 <= int(q) <= d):
        raise ValueError(f"pca_project: q must be in [1, {d}], got {q}")
    cov = np.round(s2 / n - np.outer(s, s) / (n * n), 6)
    mean = s / n
    w, v = np.linalg.eigh(cov)          # ascending
    order = np.argsort(w)[::-1][:q]
    comps = v[:, order]                  # (d, q)
    flip = comps[np.abs(comps).argmax(axis=0), np.arange(comps.shape[1])] < 0
    comps[:, flip] *= -1.0
    ref = ray.put((comps, mean))

    class Project:
        def __init__(self, ref):
            self.comps, self.mean = ray.get(ref) if isinstance(
                ref, ray.ObjectRef) else ref

        def __call__(self, t: pa.Table) -> pa.Table:
            valid = pc.is_valid(t.column(vec_col))
            if not pc.all(valid).as_py():
                t = t.filter(valid)
            ids = pc.cast(t.column(id_col), pa.int64())
            flat, lens = _list_flat(t.column(vec_col))
            if len(lens) == 0:
                cols = {id_col: pa.array([], pa.int64())}
                for k in range(self.comps.shape[1]):
                    cols[f"pc_{k}"] = pa.array([], pa.float64())
                return pa.table(cols)
            x = flat.astype(np.float64).reshape(-1, self.comps.shape[0])
            proj = (x - self.mean) @ self.comps
            cols = {id_col: ids}
            for k in range(self.comps.shape[1]):
                cols[f"pc_{k}"] = pa.array(proj[:, k], pa.float64())
            return pa.table(cols)

    return ds.map_batches(Project, batch_format="pyarrow", concurrency=(1, 2),
                          fn_constructor_kwargs={"ref": ref})


def mad_outliers(ds, group_col: str, val_col: str, k: float = 3.0):
    """Per-group robust (median/MAD) outlier detection — the heavy-tail-safe
    sibling of ``zscore_outliers``: one extreme value drags mu and sd and so
    can MASK itself from a z-test; it cannot move the median. Keeps rows
    where ``|v - med_g| > k * MAD_g`` with ``med_g = quantile_disc(v, 0.5)``
    per group and ``MAD_g = quantile_disc(|v - med_g|, 0.5)`` — DISCRETE
    medians via the exact-quantiles refinement kernel, so both statistics
    are bit-equal to the SQL oracle's quantile_disc and the strict compare
    can never straddle float noise (the engine and oracle evaluate the SAME
    subtraction on the SAME med/MAD doubles). Cost: two grouped
    exact-quantile fronts (each a few column-pruned scans emitting tiny
    histogram partials, zero shuffle, driver state O(groups x bins)) plus
    one broadcast filter pass — scale-safe for dimension-like groups, same
    contract as zscore_outliers. NULL groups/values excluded (SQL aggregate
    + join scope). A MAD of 0 (majority-duplicate group) keeps only rows
    strictly off the median, exactly as the SQL reads. Returns a Dataset of
    the input row (group/id/value) plus ``dev = round(|v - med_g|, 6)``."""
    import ray

    from .quantiles import grouped_exact_quantiles

    meds = grouped_exact_quantiles(ds, group_col, val_col, 0.5)
    if not meds:
        raise ValueError("mad_outliers: no non-null rows")
    med_ref = ray.put(meds)

    def absdev(t: pa.Table) -> pa.Table:
        med_of = ray.get(med_ref) if isinstance(med_ref, ray.ObjectRef) \
            else med_ref
        t, g, v = _clean_group_val(t, group_col, val_col)
        med = g.map(med_of).to_numpy(np.float64)
        return pa.table({group_col: pa.array(g.to_numpy(), pa.string()),
                         "dev": pa.array(np.abs(v - med), pa.float64())})

    mads = grouped_exact_quantiles(
        ds.map_batches(absdev, batch_format="pyarrow"), group_col, "dev", 0.5)
    pair_ref = ray.put((meds, {g: float(k) * m for g, m in mads.items()}))

    def score(t: pa.Table) -> pa.Table:
        med_of, thr_of = ray.get(pair_ref) \
            if isinstance(pair_ref, ray.ObjectRef) else pair_ref
        t, g, v = _clean_group_val(t, group_col, val_col)
        med = g.map(med_of).to_numpy(np.float64)
        thr = g.map(thr_of).to_numpy(np.float64)
        dev = np.abs(v - med)
        keep = dev > thr
        return t.filter(pa.array(keep)).append_column(
            "dev", pa.array(np.round(dev[keep], 6), pa.float64()))

    return ds.map_batches(score, batch_format="pyarrow")


def _clean_group_val(t: pa.Table, group_col: str, val_col: str):
    """The robust-statistics family's shared row scope (mad_outliers,
    winsorize — SQL aggregate + equi-join semantics): drop NULL-group and
    NULL/NaN-value rows; return (filtered table, str group keys, float64
    values). One definition so a scope fix cannot miss a sibling."""
    t = t.filter(pc.and_(pc.is_valid(t.column(group_col)),
                         pc.is_valid(t.column(val_col))))
    v = t.column(val_col).to_numpy(zero_copy_only=False).astype(np.float64)
    keep = ~np.isnan(v)
    if not keep.all():
        t = t.filter(pa.array(keep))
        v = v[keep]
    g = t.column(group_col).to_pandas().astype(str)
    return t, g, v


def winsorize(ds, group_col: str, val_col: str, lo_q: float = 0.05,
              hi_q: float = 0.95):
    """Per-group winsorization (the outlier-CLIPPING cleaner, where
    ``mad_outliers`` is the outlier DETECTOR): clip each value into its
    group's [quantile_disc(lo_q), quantile_disc(hi_q)] — discrete bounds
    from the exact-quantiles kernel, bit-equal to the SQL oracle's, so
    least/greatest resolve identically on both engines. Two grouped
    quantile fronts (tiny histogram partials, zero shuffle) + one broadcast
    clip pass. NULL groups/values excluded (the mad_outliers scope).
    Returns the row plus ``clipped = round(clip(v), 6)`` (the catalog float
    contract; the unrounded original rides along in ``val_col``)."""
    import ray

    from .quantiles import grouped_exact_quantiles

    if not (0.0 <= float(lo_q) <= float(hi_q) <= 1.0):
        raise ValueError(f"need 0 <= lo_q <= hi_q <= 1: {lo_q}, {hi_q}")
    los = grouped_exact_quantiles(ds, group_col, val_col, lo_q)
    his = grouped_exact_quantiles(ds, group_col, val_col, hi_q)
    if not los:
        raise ValueError("winsorize: no non-null rows")
    ref = ray.put((los, his))

    def clip(t: pa.Table) -> pa.Table:
        lo_of, hi_of = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        t, g, v = _clean_group_val(t, group_col, val_col)
        lo = g.map(lo_of).to_numpy(np.float64)
        hi = g.map(hi_of).to_numpy(np.float64)
        return t.append_column("clipped", pa.array(
            np.round(np.minimum(np.maximum(v, lo), hi), 6), pa.float64()))

    return ds.map_batches(clip, batch_format="pyarrow")


_PROFILE_OUT = pa.schema([
    ("col", pa.string()), ("n_rows", pa.int64()), ("n_nulls", pa.int64()),
    ("n_distinct", pa.int64()), ("min_num", pa.float64()),
    ("max_num", pa.float64())])


def column_profile(ds, cols: list, numeric: set,
                   n_buckets: int = 64) -> pa.Table:
    """Data-quality audit: one profile row per column — row count, NULL
    count, EXACT distinct count, numeric min/max — the schema-drift gate a
    lake ingest runs before committing (the CDC analogue of the reference's
    record counters, sink/.../Metrics.java). Shared by the events catalog
    entry and the `profile` CLI verb over the merged lake.

    Distribution: per-block combiners shrink each column to its
    block-local distinct KEYS (int64 for ints/timestamps, canonicalized
    float64 bits for doubles — DuckDB DISTINCT semantics: -0.0 == 0.0, all
    NaN one value — the string itself otherwise; injective, never a
    formatted value), then ONE coarse hash exchange dedups keys globally
    and per-bucket distinct partials sum on the driver (<= n_buckets x
    #cols tiny rows). NULL/min/max ride per-block partial rows (no
    exchange); NaN-greatest max (DuckDB ordering) rides a partial flag.
    Exact distinct at 100 TB stays bounded because only distinct keys per
    block ever leave a task."""
    from ..pipelines.queries import _sum_partials

    def stats_partial(t: pa.Table) -> pa.Table:
        rows = {"col": [], "p_rows": [], "p_nulls": [],
                "p_min": [], "p_max": [], "p_has_nan": []}
        for c in cols:
            a = t.column(c)
            rows["col"].append(c)
            rows["p_rows"].append(len(a))
            rows["p_nulls"].append(a.null_count)
            if c in numeric and len(a) > a.null_count:
                v = a.drop_null().to_numpy(zero_copy_only=False) \
                    .astype(np.float64)
                all_nan = bool(np.isnan(v).all())
                rows["p_min"].append(np.nan if all_nan
                                     else float(np.nanmin(v)))
                rows["p_max"].append(np.nan if all_nan
                                     else float(np.nanmax(v)))
                rows["p_has_nan"].append(bool(np.isnan(v).any()))
            else:
                rows["p_min"].append(np.nan)
                rows["p_max"].append(np.nan)
                rows["p_has_nan"].append(False)
        return pa.table({
            "col": pa.array(rows["col"], pa.string()),
            "p_rows": pa.array(rows["p_rows"], pa.int64()),
            "p_nulls": pa.array(rows["p_nulls"], pa.int64()),
            "p_min": pa.array(rows["p_min"], pa.float64()),
            "p_max": pa.array(rows["p_max"], pa.float64()),
            "p_has_nan": pa.array(rows["p_has_nan"], pa.bool_())})

    def keys_partial(t: pa.Table) -> pa.Table:
        kcols, keys = [], []
        for c in cols:
            a = t.column(c)
            av = a.drop_null()
            if pa.types.is_timestamp(a.type):
                kk = np.unique(av.to_numpy(zero_copy_only=False)
                               .astype("datetime64[us]")
                               .astype(np.int64)).astype(str)
            elif pa.types.is_floating(a.type):
                v = av.to_numpy(zero_copy_only=False).astype(np.float64,
                                                             copy=True)
                v[v == 0.0] = 0.0
                v[np.isnan(v)] = np.nan
                kk = np.unique(v.view(np.int64)).astype(str)
            elif pa.types.is_integer(a.type):
                kk = np.unique(av.to_numpy(zero_copy_only=False)).astype(str)
            else:
                kk = np.unique(np.asarray(av.to_pylist(),
                                          dtype=object)).astype(str)
            kcols.append(np.full(len(kk), c, dtype=object))
            keys.append(kk.astype(object))
        kcol = np.concatenate(kcols) if kcols else np.empty(0, object)
        kkey = np.concatenate(keys) if keys else np.empty(0, object)
        bkt = (pd.util.hash_array(kkey, categorize=False)
               % n_buckets).astype(np.int32)
        return pa.table({
            "col": pa.array(kcol, pa.string()),
            "key": pa.array(kkey, pa.string()),
            "bucket": pa.array(bkt, pa.int32())})

    def bucket_distinct(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["col", "key"])
        return d.groupby("col", as_index=False).agg(
            p_distinct=("key", "size"))

    stats_ds = ds.map_batches(stats_partial, batch_format="pyarrow")
    keys_ds = ds.map_batches(keys_partial, batch_format="pyarrow")
    dist = _sum_partials(
        keys_ds.groupby("bucket").map_groups(
            bucket_distinct, batch_format="pandas"),
        "col", {"p_distinct": "n_distinct"})

    stats_df = stats_ds.to_pandas()  # bounded: #blocks x #cols rows
    agg = stats_df.groupby("col", as_index=False).agg(
        n_rows=("p_rows", "sum"), n_nulls=("p_nulls", "sum"),
        min_num=("p_min", "min"), max_num=("p_max", "max"),
        has_nan=("p_has_nan", "any"))
    # DuckDB's max returns NaN whenever any NaN exists (NaN sorts greatest)
    agg.loc[agg["has_nan"], "max_num"] = np.nan
    out = agg.merge(dist.to_pandas(), on="col", how="left")
    out["n_distinct"] = out["n_distinct"].fillna(0)
    return pa.Table.from_arrays(
        [pa.array(out["col"], pa.string()),
         pa.array(out["n_rows"].astype(np.int64), pa.int64()),
         pa.array(out["n_nulls"].astype(np.int64), pa.int64()),
         pa.array(out["n_distinct"].astype(np.int64), pa.int64()),
         pa.array(out["min_num"], pa.float64()),
         pa.array(out["max_num"], pa.float64())],
        schema=_PROFILE_OUT)
