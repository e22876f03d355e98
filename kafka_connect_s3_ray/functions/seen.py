"""Incremental dedup against a persisted seen-content index.

The CDC-ingest face of dedup: a 100 TB lake is ingested over months, and
each new changelog batch must not re-admit documents the lake already
holds. Re-scanning the lake per batch is the anti-pattern; instead the
lake's content fingerprints live in a bucket-partitioned parquet index
(`build_seen_index`) that new batches are anti-joined against
(`filter_unseen`) and appended into (`update_seen_index`) — the same
persisted-index + commit-marker + file-rotation discipline as the IVF
index (`similarity.py::build_ivf_index`) and the lake writer
(reference parallel: the sink's offset-named chunk files,
`sink/.../S3Writer.java` — the index is to content what the manifest is
to offsets).

Fingerprints are ``text.py::add_fingerprint`` md5s (DuckDB-reproducible,
so the whole incremental chain is oracle-checkable with plain SQL text
equality). Scale posture:

- the index is partitioned ``bucket=<b>/part-*.parquet``; a batch's
  distinct fingerprint buckets are computed first and ONLY those bucket
  dirs are read (file-level pruning — a small/skewed batch touches a
  fraction of the index);
- the anti-join is a coarse-bucket hash exchange of (fingerprint) rows —
  the lake side never broadcasts, the new side never materializes;
- ``update_seen_index`` appends rotated part files per bucket; no
  rewrite of existing parts, so the index grows append-only like the
  lake itself.
"""

from __future__ import annotations

import glob as _glob
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data

from .text import add_fingerprint

_META = "seen_meta.json"


def _fp_bucket(fp: pa.Array, n_buckets: int) -> np.ndarray:
    """Deterministic bucket of an md5-hex fingerprint column: the first 8
    hex chars as an int — uniform by construction (md5), NULL -> -1."""
    s = fp.to_pylist()
    return np.array([-1 if x is None else int(x[:8], 16) % n_buckets
                     for x in s], np.int32)


def _with_fp_bucket(t: pa.Table, text_col: str, n_buckets: int) -> pa.Table:
    t = add_fingerprint(t, text_col=text_col, trim=False)
    return t.append_column(
        "_bucket", pa.array(_fp_bucket(t.column("fingerprint"), n_buckets)))


def build_seen_index(docs: "ray.data.Dataset", index_dir: str,
                     n_buckets: int = 64, text_col: str = "text",
                     max_file_rows: int = 1_000_000) -> int:
    """Materialize the distinct content fingerprints of ``docs`` as a
    bucket-partitioned parquet index. Returns the number of distinct
    fingerprints written. NULL-text docs carry no fingerprint and are
    never indexed (they can't collide on content). Rebuild semantics:
    the meta marker is removed first, old buckets second, data written,
    marker last — a reader never sees a half-built index as valid."""
    import shutil

    marker = os.path.join(index_dir, _META)
    if os.path.exists(marker):
        os.remove(marker)
    for d in _glob.glob(os.path.join(index_dir, "bucket=*")):
        shutil.rmtree(d, ignore_errors=True)
    os.makedirs(index_dir, exist_ok=True)

    tagged = docs.map_batches(
        lambda t: _with_fp_bucket(t, text_col, n_buckets)
        .select(["fingerprint", "_bucket"])
        .filter(pc.is_valid(pc.field("fingerprint"))),
        batch_format="pyarrow")

    def write_bucket(g: pa.Table) -> pa.Table:
        b = int(g.column("_bucket")[0].as_py())
        fps = pc.unique(g.column("fingerprint")).sort()  # deterministic bytes
        out = pa.table({"fingerprint": fps})
        bdir = os.path.join(index_dir, f"bucket={b}")
        os.makedirs(bdir, exist_ok=True)
        for i, lo in enumerate(range(0, len(out), max_file_rows)):
            path = os.path.join(bdir, f"part-base-{i:04d}.parquet")
            tmp = path + ".inprogress"
            pq.write_table(out.slice(lo, max_file_rows), tmp,
                           compression="zstd")
            os.replace(tmp, path)
        return pa.table({"bucket": pa.array([b], pa.int32()),
                         "n": pa.array([len(out)], pa.int64())})

    counts = tagged.groupby("_bucket").map_groups(
        write_bucket, batch_format="pyarrow").to_pandas()
    total = int(counts["n"].sum()) if len(counts) else 0
    tmp = marker + ".inprogress"
    with open(tmp, "w") as f:
        json.dump({"n_buckets": n_buckets, "generation": 0,
                   "fingerprints": total}, f)
    os.replace(tmp, marker)
    return total


def _read_meta(index_dir: str) -> dict:
    with open(os.path.join(index_dir, _META)) as f:
        return json.load(f)


def filter_unseen(new_docs: "ray.data.Dataset", index_dir: str,
                  text_col: str = "text",
                  keep_nulls: bool = True) -> "ray.data.Dataset":
    """Rows of ``new_docs`` whose content fingerprint is NOT in the index.
    Reads only the bucket dirs the batch actually hits (file-level
    pruning), then anti-joins by a coarse fingerprint-bucket exchange —
    per-bucket numpy ``isin`` against the index side, no broadcast of the
    lake. NULL-text rows pass through when ``keep_nulls`` (they have no
    content to collide on)."""
    meta = _read_meta(index_dir)
    n_buckets = int(meta["n_buckets"])

    tagged = new_docs.map_batches(
        lambda t: _with_fp_bucket(t, text_col, n_buckets),
        batch_format="pyarrow").materialize()

    # which index buckets can matter for THIS batch: a distributed distinct
    # over the one int32 column — per-block np.unique partials, driver sees
    # <= n_buckets ints per block, never the rows themselves
    def block_buckets(t: pa.Table) -> pa.Table:
        u = np.unique(t.column("_bucket").to_numpy(zero_copy_only=False))
        return pa.table({"_bucket": pa.array(u[u >= 0], pa.int32())})

    hit = sorted({
        int(r["_bucket"])
        for r in tagged.select_columns(["_bucket"])
        .map_batches(block_buckets, batch_format="pyarrow").take_all()
    })
    files = [f for b in hit
             for f in sorted(_glob.glob(
                 os.path.join(index_dir, f"bucket={b}", "*.parquet")))]

    if not files:  # empty index or no overlap: everything is unseen
        return tagged.map_batches(
            lambda t: t.drop_columns(["fingerprint", "_bucket"]),
            batch_format="pyarrow")

    seen = ray.data.read_parquet(files).map_batches(
        lambda t: t.append_column(
            "_bucket", pa.array(_fp_bucket(t.column("fingerprint"),
                                           n_buckets))),
        batch_format="pyarrow")

    # align both sides onto one union schema, exchange on _bucket, and keep
    # new rows whose fingerprint is absent from the bucket's index side
    data_cols = [f for f in tagged.schema().names if f != "_bucket"]

    def mark(is_index: bool):
        def f(t: pa.Table) -> pa.Table:
            return t.append_column(
                "_is_index", pa.array(np.full(len(t), is_index)))
        return f

    def align(t: pa.Table, schema: pa.Schema) -> pa.Table:
        cols = []
        for fld in schema:
            if fld.name in t.schema.names:
                cols.append(pc.cast(t.column(fld.name), fld.type))
            else:
                cols.append(pa.nulls(len(t), fld.type))
        return pa.Table.from_arrays(cols, schema=schema)

    tschema = tagged.schema()
    union_fields = [(n, tschema.types[tschema.names.index(n)])
                    for n in tagged.schema().names]
    union_schema = pa.schema(union_fields + [("_is_index", pa.bool_())])

    left = tagged.map_batches(
        lambda t: align(mark(False)(t), union_schema), batch_format="pyarrow")
    right = seen.map_batches(
        lambda t: align(mark(True)(t), union_schema), batch_format="pyarrow")

    out_cols = [c for c in data_cols if c != "fingerprint"]
    out_schema = pa.schema([(n, t) for n, t in union_fields
                            if n in out_cols])

    def anti(g: pd.DataFrame) -> pd.DataFrame:
        idx_fp = g.loc[g["_is_index"], "fingerprint"].to_numpy()
        new = g[~g["_is_index"]]
        fp = new["fingerprint"].to_numpy()
        mask = ~pd.Series(fp).isin(idx_fp).to_numpy()
        if keep_nulls:
            mask |= pd.isna(fp)
        else:
            mask &= ~pd.isna(fp)
        kept = new.loc[mask, out_cols]
        # the union's null-fill widened new-side ints to float64 (index rows
        # carry NULL data columns) — cast back to the input schema
        tbl = pa.Table.from_pandas(kept, preserve_index=False)
        tbl = pa.Table.from_arrays(
            [pc.cast(tbl.column(f.name), f.type) for f in out_schema],
            schema=out_schema)
        return tbl.to_pandas()

    return left.union(right).groupby("_bucket").map_groups(
        anti, batch_format="pandas")


def update_seen_index(new_docs: "ray.data.Dataset", index_dir: str,
                      text_col: str = "text") -> int:
    """Append ``new_docs``' fingerprints to the index as a new generation
    of rotated part files per bucket (no rewrite of existing parts — the
    append-only growth the lake itself uses). Idempotence is the caller's
    replay contract: the same batch appended twice adds duplicate rows,
    which ``filter_unseen``'s isin tolerates (set semantics); a vacuum-
    style rewrite can compact generations offline. Returns rows appended."""
    meta = _read_meta(index_dir)
    n_buckets = int(meta["n_buckets"])
    gen = int(meta.get("generation", 0)) + 1

    tagged = new_docs.map_batches(
        lambda t: _with_fp_bucket(t, text_col, n_buckets)
        .select(["fingerprint", "_bucket"])
        .filter(pc.is_valid(pc.field("fingerprint"))),
        batch_format="pyarrow")

    def append_bucket(g: pa.Table) -> pa.Table:
        b = int(g.column("_bucket")[0].as_py())
        fps = pc.unique(g.column("fingerprint")).sort()
        out = pa.table({"fingerprint": fps})
        bdir = os.path.join(index_dir, f"bucket={b}")
        os.makedirs(bdir, exist_ok=True)
        path = os.path.join(bdir, f"part-g{gen:06d}.parquet")
        tmp = path + ".inprogress"
        pq.write_table(out, tmp, compression="zstd")
        os.replace(tmp, path)
        return pa.table({"bucket": pa.array([b], pa.int32()),
                         "n": pa.array([len(out)], pa.int64())})

    counts = tagged.groupby("_bucket").map_groups(
        append_bucket, batch_format="pyarrow").to_pandas()
    total = int(counts["n"].sum()) if len(counts) else 0
    meta["generation"] = gen
    meta["fingerprints"] = int(meta.get("fingerprints", 0)) + total
    tmp = os.path.join(index_dir, _META + ".inprogress")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(index_dir, _META))
    return total
