"""Z-order (Morton-curve) file clustering + stats-pruned reads — the
OPTIMIZE ZORDER maintenance operation of Delta/Iceberg-class lakes, built
Ray-Data-first.

A table clustered on one column prunes range reads on that column only;
interleaving the bits of TWO columns' rank positions makes files compact in
BOTH dimensions, so min/max file stats prune point/range predicates on
either column (or both). The reference has no relational layout ops — its
analog is the lexicographic key layout that makes listing order = offset
order (source/.../S3FilesReader.java:38-40); z-ordering is that same
"filename/stats carry the pruning" idea applied to a 2-D predicate space.

Shape (three bounded streaming passes over the input, an offline
maintenance op like ``repartition_lake``):
  1. per-column global min/max (tiny partials);
  2. coarse z-histogram (one 65536-bin bincount partial per block, summed
     on the driver -> equi-depth file boundaries, the seeded_shuffle
     bucket-offset pattern — never a global sort operator);
  3. assign each row its file by searchsorted(boundaries, z), groupby file,
     sort WITHIN the file by (z, row order), write one parquet per bucket +
     a JSON stats sidecar (per-file min/max of every clustered column),
     sidecar written LAST (the data-before-meta commit ordering).

``zorder_read`` then opens ONLY files whose stats intersect every
predicate range and applies the residual filter vectorized — the same
file-level pruning the lake's bloom sidecars give point lookups, extended
to 2-D ranges.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

_MAGIC = [(8, 0x00FF00FF00FF00FF), (4, 0x0F0F0F0F0F0F0F0F),
          (2, 0x3333333333333333), (1, 0x5555555555555555)]


def _part1by1(x: np.ndarray) -> np.ndarray:
    """Spread each of the low 16 bits of ``x`` to even positions (classic
    Morton magic-number expansion), vectorized in uint64."""
    x = x.astype(np.uint64)
    for shift, mask in _MAGIC:
        x = (x | (x << np.uint64(shift))) & np.uint64(mask)
    return x


def _scale_u16(v: np.ndarray, lo: float, hi: float) -> np.ndarray:
    """Linear min/max scaling to [0, 2^16): rank position along one
    dimension. Degenerate (constant) columns collapse to 0."""
    if hi <= lo:
        return np.zeros(len(v), np.uint64)
    u = np.floor((v - lo) / (hi - lo) * 65535.0)
    return np.clip(u, 0, 65535).astype(np.uint64)


def zorder_key(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Interleave two u16 rank arrays into the 32-bit Morton key."""
    return (_part1by1(a) << np.uint64(1)) | _part1by1(b)


def _col_f64(t: pa.Table, col: str) -> np.ndarray:
    c = t.column(col)
    if c.null_count:
        raise ValueError(f"zorder: column {col!r} holds NULLs — fill or "
                         f"filter them first (a NULL has no rank position)")
    return pc.cast(c, pa.float64()).to_numpy(zero_copy_only=False)


def zorder_write(ds: "ray.data.Dataset", out_dir: str, cols: list[str],
                 n_files: int = 16) -> dict:
    """Cluster ``ds`` into ``n_files`` parquet files ordered along the
    z-curve of ``cols`` (exactly two columns — the 2-D case is the
    standard one; more dims dilute per-dim pruning). Returns the stats
    sidecar dict. Deterministic for a deterministic input."""
    if len(cols) != 2:
        raise ValueError(f"zorder_write clusters exactly 2 columns, "
                         f"got {cols}")
    import glob as _glob

    import pyarrow.parquet as pq

    marker = os.path.join(out_dir, "zorder_stats.json")
    if os.path.exists(marker):
        os.remove(marker)
    for f in _glob.glob(os.path.join(out_dir, "z-*.parquet")):
        os.remove(f)
    a_col, b_col = cols

    # pass 1: global min/max per clustered column (tiny partials)
    def mm(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"alo": pa.array([np.inf]),
                             "ahi": pa.array([-np.inf]),
                             "blo": pa.array([np.inf]),
                             "bhi": pa.array([-np.inf])})
        a, b = _col_f64(t, a_col), _col_f64(t, b_col)
        return pa.table({"alo": pa.array([float(a.min())]),
                         "ahi": pa.array([float(a.max())]),
                         "blo": pa.array([float(b.min())]),
                         "bhi": pa.array([float(b.max())])})

    p = ds.map_batches(mm, batch_format="pyarrow").to_pandas()
    alo, ahi = float(p["alo"].min()), float(p["ahi"].max())
    blo, bhi = float(p["blo"].min()), float(p["bhi"].max())

    def zvals(t: pa.Table) -> np.ndarray:
        return zorder_key(_scale_u16(_col_f64(t, a_col), alo, ahi),
                          _scale_u16(_col_f64(t, b_col), blo, bhi))

    # pass 2: equi-depth file boundaries from a coarse z-histogram
    # (65536 bins of z >> 16; one bincount partial per block, driver
    # prefix-sums — the bucket-offset pattern, never a global sort)
    def zhist(t: pa.Table) -> pa.Table:
        h = np.bincount((zvals(t) >> np.uint64(16)).astype(np.int64),
                        minlength=65536) if len(t) else np.zeros(65536,
                                                                 np.int64)
        return pa.table({"bin": pa.array(np.arange(65536, dtype=np.int64)),
                         "n": pa.array(h.astype(np.int64))})

    hist = (ds.map_batches(zhist, batch_format="pyarrow").to_pandas()
            .groupby("bin")["n"].sum().reindex(range(65536), fill_value=0)
            .to_numpy())
    cum = np.cumsum(hist)
    total = int(cum[-1])
    targets = (np.arange(1, n_files) * total) // n_files
    # boundary z for file i = first coarse bin where cum >= target
    bins = np.searchsorted(cum, targets, side="left") + 1
    bounds = np.unique(bins.astype(np.uint64) << np.uint64(16))

    def assign(t: pa.Table) -> pa.Table:
        z = zvals(t)
        f = np.searchsorted(bounds, z, side="right").astype(np.int32)
        return (t.append_column("_z", pa.array(z.astype(np.int64)))
                .append_column("_file", pa.array(f)))

    stats: dict = {"cols": cols, "files": {}}

    def write_file(g: pa.Table) -> pa.Table:
        fi = int(g.column("_file")[0].as_py())
        g = g.sort_by([("_z", "ascending")]).drop_columns(["_z", "_file"])
        path = os.path.join(out_dir, f"z-{fi:05d}.parquet")
        tmp = path + ".inprogress"
        pq.write_table(g, tmp, compression="zstd")
        os.replace(tmp, path)
        a, b = _col_f64(g, a_col), _col_f64(g, b_col)
        return pa.table({
            "file": pa.array([f"z-{fi:05d}.parquet"]),
            "n": pa.array([len(g)], pa.int64()),
            "amin": pa.array([float(a.min())]),
            "amax": pa.array([float(a.max())]),
            "bmin": pa.array([float(b.min())]),
            "bmax": pa.array([float(b.max())])})

    os.makedirs(out_dir, exist_ok=True)
    fstats = (ds.map_batches(assign, batch_format="pyarrow")
              .groupby("_file").map_groups(write_file,
                                           batch_format="pyarrow")
              .to_pandas())
    for r in fstats.itertuples():
        stats["files"][r.file] = {
            "n": int(r.n), a_col: [r.amin, r.amax], b_col: [r.bmin, r.bmax]}
    tmp = marker + ".inprogress"
    with open(tmp, "w") as f:
        json.dump(stats, f, sort_keys=True)
    os.replace(tmp, marker)
    return stats


def zorder_read(out_dir: str,
                predicates: dict[str, tuple[float, float]] | None = None
                ) -> "ray.data.Dataset":
    """Read back a ``zorder_write`` directory, opening ONLY the files whose
    min/max stats intersect EVERY ``col: (lo, hi)`` predicate (inclusive),
    then applying the residual filter vectorized. No predicate = full
    (still clustered) read. Returns an empty-but-typed Dataset when every
    file prunes."""
    with open(os.path.join(out_dir, "zorder_stats.json")) as f:
        stats = json.load(f)
    predicates = predicates or {}
    unknown = set(predicates) - set(stats["cols"])
    if unknown:
        raise ValueError(f"zorder_read: no stats for predicate columns "
                         f"{sorted(unknown)} (clustered: {stats['cols']})")
    keep = []
    for fname, fs in sorted(stats["files"].items()):
        ok = all(fs[c][0] <= hi and fs[c][1] >= lo
                 for c, (lo, hi) in predicates.items())
        if ok:
            keep.append(os.path.join(out_dir, fname))
    if not keep:
        first = os.path.join(out_dir, sorted(stats["files"])[0])
        return ray.data.read_parquet(first).limit(0)
    ds = ray.data.read_parquet(keep)
    if not predicates:
        return ds

    def residual(t: pa.Table) -> pa.Table:
        mask = np.ones(len(t), bool)
        for c, (lo, hi) in predicates.items():
            v = _col_f64(t, c)
            mask &= (v >= lo) & (v <= hi)
        return t.filter(pa.array(mask))

    return ds.map_batches(residual, batch_format="pyarrow")
