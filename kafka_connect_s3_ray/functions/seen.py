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
    """Deterministic bucket of an md5-hex fingerprint column (NULL -> -1):
    pandas' vectorized string hash (fixed hash key, deterministic across
    runs/processes — the same bucketer the join stages use). Only build
    and probe need to agree; md5 is already uniform, the extra hash just
    keeps the kernel C-side instead of a per-row int(hex) parse."""
    arr = np.asarray(fp.to_pylist(), dtype=object)
    if len(arr) == 0:
        return np.empty(0, np.int32)
    null = np.array([x is None for x in arr], bool)
    arr[null] = ""
    out = (pd.util.hash_array(arr) % np.uint64(n_buckets)).astype(np.int32)
    out[null] = -1
    return out


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

    def anti(g: pa.Table) -> pa.Table:
        # Arrow-native: only the (string) fingerprint goes through pandas for
        # the isin; data columns never leave Arrow, so null-fill from the
        # index side can't widen int64 ids to float64 (which would silently
        # round values above 2^53 on the cast back)
        is_idx = g.column("_is_index").to_numpy(zero_copy_only=False)
        is_idx = np.asarray(is_idx, bool)
        fp_all = g.column("fingerprint").to_pandas()
        idx_fp = fp_all[is_idx].dropna().to_numpy()
        new = g.filter(pa.array(~is_idx))
        fp = fp_all[~is_idx]
        mask = ~fp.isin(idx_fp).to_numpy()
        isna = fp.isna().to_numpy()
        mask = (mask | isna) if keep_nulls else (mask & ~isna)
        kept = new.filter(pa.array(mask))
        return pa.Table.from_arrays(
            [pc.cast(kept.column(f.name), f.type) for f in out_schema],
            schema=out_schema)

    return left.union(right).groupby("_bucket").map_groups(
        anti, batch_format="pyarrow")


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


# ---------------------------------------------------------------------------
# near-dup tier: MinHash-LSH index for "near-seen" incremental dedup
# ---------------------------------------------------------------------------

_NMETA = "near_seen_meta.json"


def build_near_seen_index(docs: "ray.data.Dataset", index_dir: str,
                          num_perm: int = 64, bands: int = 16,
                          shingle_k: int = 5, seed: int = 42,
                          n_band_buckets: int = 64, n_doc_buckets: int = 64,
                          id_col: str = "doc_id", text_col: str = "text",
                          max_file_rows: int = 1_000_000) -> int:
    """Materialize the MinHash-LSH state of a corpus for incremental
    NEAR-dup checks (RefinedWeb-style "near-dedup against everything
    ingested so far" without rescanning it): one pass computes each doc's
    shingle set, signature, and LSH band keys (the fused chain's layout,
    `dedup.py::minhash_near_dup_verified`), persisted as

    - ``bandbkt=<h>/part-*.parquet``: lean (band, bucket, doc_id) rows,
      partitioned by a coarse hash of the band key — probes prune to the
      band buckets a new batch actually hits;
    - ``docbkt=<h>/part-*.parquet``: (doc_id, sig, shingles) payloads,
      partitioned by doc-id hash — the exact-verify stage prunes to the
      candidate docs' buckets only.

    Same rebuild discipline as the exact index (marker removed first,
    written last). Returns the number of docs indexed."""
    import shutil

    from .dedup import MinHasher, _shingle_sets_batch

    marker = os.path.join(index_dir, _NMETA)
    if os.path.exists(marker):
        os.remove(marker)
    for pat in ("bandbkt=*", "docbkt=*"):
        for d in _glob.glob(os.path.join(index_dir, pat)):
            shutil.rmtree(d, ignore_errors=True)
    os.makedirs(index_dir, exist_ok=True)

    hasher = MinHasher(num_perm, bands, shingle_k, seed,
                       id_col=id_col, text_col=text_col)

    def featurize(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column(id_col), pa.int64()).to_numpy(
            zero_copy_only=False)
        texts = ["" if s is None else s
                 for s in t.column(text_col).to_pylist()]
        flat, lens = _shingle_sets_batch(texts, shingle_k)
        sigs = hasher.sigs_from_sets(flat, lens)           # (P, n)
        bkeys = hasher.band_buckets(sigs).reshape(bands, len(ids))
        offs = np.concatenate([[0], np.cumsum(lens)])
        docbkt = (pd.util.hash_array(ids.astype(np.uint64))
                  % np.uint64(n_doc_buckets)).astype(np.int32)
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "sig": pa.array([sigs[:, i].tolist() for i in range(len(ids))],
                            pa.list_(pa.uint64())),
            "shingles": pa.array(
                [np.unique(flat[offs[i]:offs[i + 1]]).tolist()
                 for i in range(len(ids))], pa.list_(pa.uint64())),
            "bandkeys": pa.array([bkeys[:, i].tolist()
                                  for i in range(len(ids))],
                                 pa.list_(pa.int64())),
            "_docbkt": pa.array(docbkt, pa.int32()),
        })

    feats = docs.map_batches(featurize, batch_format="pyarrow",
                             concurrency=2).materialize()

    def write_payload(g: pa.Table) -> pa.Table:
        b = int(g.column("_docbkt")[0].as_py())
        out = (g.drop_columns(["bandkeys", "_docbkt"])
               .sort_by([(id_col, "ascending")]))
        bdir = os.path.join(index_dir, f"docbkt={b}")
        os.makedirs(bdir, exist_ok=True)
        for i, lo in enumerate(range(0, len(out), max_file_rows)):
            path = os.path.join(bdir, f"part-{i:04d}.parquet")
            tmp = path + ".inprogress"
            pq.write_table(out.slice(lo, max_file_rows), tmp,
                           compression="zstd")
            os.replace(tmp, path)
        return pa.table({"b": pa.array([b], pa.int32()),
                         "n": pa.array([len(out)], pa.int64())})

    counts = feats.groupby("_docbkt").map_groups(
        write_payload, batch_format="pyarrow").to_pandas()
    total = int(counts["n"].sum()) if len(counts) else 0

    def explode_bands(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        bk = np.array(t.column("bandkeys").to_pylist(), np.int64)
        if len(ids) == 0:
            return pa.table({"band": pa.array([], pa.int32()),
                             "bucket": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             "_bandbkt": pa.array([], pa.int32())})
        band = np.tile(np.arange(bands, dtype=np.int32), len(ids))
        doc = np.repeat(ids, bands)
        bucket = bk.reshape(-1)
        bkt = ((bucket.astype(np.uint64) ^ (band.astype(np.uint64) << 32))
               % np.uint64(n_band_buckets)).astype(np.int32)
        return pa.table({"band": pa.array(band, pa.int32()),
                         "bucket": pa.array(bucket, pa.int64()),
                         id_col: pa.array(doc, pa.int64()),
                         "_bandbkt": pa.array(bkt, pa.int32())})

    def write_bands(g: pa.Table) -> pa.Table:
        b = int(g.column("_bandbkt")[0].as_py())
        out = (g.drop_columns(["_bandbkt"])
               .sort_by([("band", "ascending"), ("bucket", "ascending"),
                         (id_col, "ascending")]))
        bdir = os.path.join(index_dir, f"bandbkt={b}")
        os.makedirs(bdir, exist_ok=True)
        for i, lo in enumerate(range(0, len(out), max_file_rows)):
            path = os.path.join(bdir, f"part-{i:04d}.parquet")
            tmp = path + ".inprogress"
            pq.write_table(out.slice(lo, max_file_rows), tmp,
                           compression="zstd")
            os.replace(tmp, path)
        return pa.table({"b": pa.array([b], pa.int32()),
                         "n": pa.array([len(out)], pa.int64())})

    feats.map_batches(explode_bands, batch_format="pyarrow").groupby(
        "_bandbkt").map_groups(write_bands, batch_format="pyarrow"
                               ).materialize()

    tmp = marker + ".inprogress"
    with open(tmp, "w") as f:
        json.dump({"num_perm": num_perm, "bands": bands,
                   "shingle_k": shingle_k, "seed": seed,
                   "n_band_buckets": n_band_buckets,
                   "n_doc_buckets": n_doc_buckets, "id_col": id_col,
                   "docs": total}, f)
    os.replace(tmp, marker)
    return total


def _read_nmeta(index_dir: str) -> dict:
    with open(os.path.join(index_dir, _NMETA)) as f:
        return json.load(f)


def near_seen_pairs(new_docs: "ray.data.Dataset", index_dir: str,
                    threshold: float = 0.6, margin_sigmas: float = 4.0,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> "ray.data.Dataset":
    """(new_id, hist_id, jaccard) for every new doc with an exact-verified
    near-duplicate (k-shingle Jaccard >= ``threshold``) in the indexed
    corpus. Candidate semantics are EXACTLY the fused chain's
    (`dedup.py::minhash_near_dup_verified` restricted to cross pairs):
    same seed -> same signatures -> same LSH band keys -> the same
    candidate set, signature-agreement prefilter at the same
    ``_est_cutoff``, exact Jaccard on the same shingle sets.

    Probe contract: the NEW batch is the small side (the incremental-ingest
    shape). Its band rows / signatures / shingle sets broadcast once via
    ``ray.put`` (O(batch)); the index is only READ at the band buckets the
    batch hits and the doc buckets its candidates live in (file-level
    pruning twice) — history is never broadcast and never rescanned."""
    from .dedup import (MinHasher, _batch_jaccard_flat, _est_cutoff,
                        _shingle_sets_batch)

    meta = _read_nmeta(index_dir)
    bands = int(meta["bands"])
    num_perm = int(meta["num_perm"])
    n_band_buckets = int(meta["n_band_buckets"])
    n_doc_buckets = int(meta["n_doc_buckets"])
    hid_col = meta.get("id_col", "doc_id")
    hasher = MinHasher(num_perm, bands, int(meta["shingle_k"]),
                       int(meta["seed"]), id_col=id_col, text_col=text_col)

    # --- one pass over the new batch: ids, sigs, shingle sets, band keys --
    tabs = [t for t in ray.get(new_docs.to_arrow_refs()) if len(t)]
    if not tabs:
        return ray.data.from_arrow(_NEAR_OUT.empty_table())
    nt = pa.concat_tables([t.select([id_col, text_col]) for t in tabs])
    nids = pc.cast(nt.column(id_col), pa.int64()).to_numpy(
        zero_copy_only=False)
    texts = ["" if s is None else s for s in nt.column(text_col).to_pylist()]
    flat, lens = _shingle_sets_batch(texts, int(meta["shingle_k"]))
    sigs = hasher.sigs_from_sets(flat, lens)            # (P, n)
    bkeys = hasher.band_buckets(sigs).reshape(bands, len(nids))
    offs = np.concatenate([[0], np.cumsum(lens)])
    new_sets = {int(nids[i]): np.unique(flat[offs[i]:offs[i + 1]])
                for i in range(len(nids))}

    # per-band probe tables (band count is small and fixed): sorted unique
    # bucket keys + CSR offsets into the flat new-id list — the index-side
    # match below is searchsorted + repeat, no Python per row
    probe_tabs = []
    hit_bkts: set[int] = set()
    for b in range(bands):
        row = bkeys[b]
        srt = np.argsort(row, kind="stable")
        uniq, starts_u = np.unique(row[srt], return_index=True)
        csr = np.append(starts_u, len(row))
        probe_tabs.append((uniq, csr, nids[srt].astype(np.int64)))
        hit_bkts.update((((row.astype(np.uint64)
                           ^ (np.uint64(b) << np.uint64(32)))
                          % np.uint64(n_band_buckets)).astype(int)).tolist())

    band_files = [f for b in sorted(hit_bkts)
                  for f in sorted(_glob.glob(
                      os.path.join(index_dir, f"bandbkt={b}", "*.parquet")))]
    if not band_files:
        return ray.data.from_arrow(_NEAR_OUT.empty_table())

    probe_ref = ray.put(probe_tabs)

    def find_candidates(t: pa.Table) -> pa.Table:
        ptabs = ray.get(probe_ref)
        bnd = t.column("band").to_numpy(zero_copy_only=False)
        bkt = t.column("bucket").to_numpy(zero_copy_only=False)
        hid = t.column(hid_col).to_numpy(zero_copy_only=False)
        hists, news = [], []
        for b in range(len(ptabs)):  # bands, not rows
            uniq, csr, flat_ids = ptabs[b]
            m = bnd == b
            if not m.any() or len(uniq) == 0:
                continue
            kb = bkt[m]
            hb = hid[m]
            pos = np.searchsorted(uniq, kb)
            ok = (pos < len(uniq)) & (uniq[np.minimum(pos, len(uniq) - 1)] == kb)
            if not ok.any():
                continue
            pos, hb = pos[ok], hb[ok]
            cnt = csr[pos + 1] - csr[pos]
            # flat gather of each match's [csr[pos], csr[pos]+cnt) range
            total = int(cnt.sum())
            base = np.repeat(csr[pos], cnt)
            step = np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt)
            news.append(flat_ids[base + step])
            hists.append(np.repeat(hb, cnt))
        if not hists:
            return pa.table({"hist_id": pa.array([], pa.int64()),
                             "new_id": pa.array([], pa.int64())})
        return pa.table({
            "hist_id": pa.array(np.concatenate(hists).astype(np.int64),
                                pa.int64()),
            "new_id": pa.array(np.concatenate(news), pa.int64())})

    cand = (ray.data.read_parquet(band_files)
            .map_batches(find_candidates, batch_format="pyarrow")
            .to_pandas())
    if cand.empty:  # empty to_pandas drops columns — bail before using them
        return ray.data.from_arrow(_NEAR_OUT.empty_table())
    cand = cand.drop_duplicates(["hist_id", "new_id"])
    # a new doc may itself be in history (re-presentation): a self-pair is
    # exact-dup territory (filter_unseen's job), not a near-dup
    cand = cand[cand["hist_id"] != cand["new_id"]]
    if cand.empty:
        return ray.data.from_arrow(_NEAR_OUT.empty_table())

    # --- pruned payload read for candidate hist docs ----------------------
    hist_ids = np.unique(cand["hist_id"].to_numpy(np.int64))
    doc_bkts = sorted(set(
        (pd.util.hash_array(hist_ids.astype(np.uint64))
         % np.uint64(n_doc_buckets)).astype(int).tolist()))
    pay_files = [f for b in doc_bkts
                 for f in sorted(_glob.glob(
                     os.path.join(index_dir, f"docbkt={b}", "*.parquet")))]

    cutoff = _est_cutoff(threshold, num_perm, margin_sigmas)
    # candidate map as sorted-CSR over NEW-SIDE COLUMN indices (not ids) so
    # the verify kernel is pure gathers; new shingle sets as one flat CSR
    col_of = {int(nids[i]): i for i in range(len(nids))}
    ch = np.sort(np.unique(cand["hist_id"].to_numpy(np.int64)))
    cand_sorted = cand.sort_values("hist_id")
    ch_all = cand_sorted["hist_id"].to_numpy(np.int64)
    cn_cols = np.array([col_of[int(x)] for x in
                        cand_sorted["new_id"].to_numpy(np.int64)], np.int64)
    csr_h = np.searchsorted(ch_all, ch)
    csr_h = np.append(csr_h, len(ch_all))
    sets_sorted = [new_sets[int(nids[i])] for i in range(len(nids))]
    set_lens = np.array([len(s) for s in sets_sorted], np.int64)
    set_offs = np.append(0, np.cumsum(set_lens))
    set_flat = (np.concatenate(sets_sorted) if len(sets_sorted)
                else np.empty(0, np.uint64))
    verify_ref = ray.put((ch, csr_h, cn_cols, sigs.T.copy(),  # (n, P)
                          set_flat, set_offs, set_lens, nids))

    def verify(t: pa.Table) -> pa.Table:
        ch_, csr_, cols_, sigmat, sflat, soffs, slens, nids_ = \
            ray.get(verify_ref)
        hid = t.column(hid_col).to_numpy(zero_copy_only=False)
        pos = np.searchsorted(ch_, hid)
        ok = (pos < len(ch_)) & (ch_[np.minimum(pos, len(ch_) - 1)] == hid)
        if not ok.any():
            return _NEAR_OUT.empty_table()
        t = t.filter(pa.array(ok))
        hid, pos = hid[ok], pos[ok]
        hsigs = np.array(t.column("sig").to_pylist(), np.uint64)   # (r, P)
        hsets = [np.asarray(s, np.uint64)
                 for s in t.column("shingles").to_pylist()]
        # expand candidate pairs: row r of this batch x its new columns
        cnt = csr_[pos + 1] - csr_[pos]
        total = int(cnt.sum())
        base = np.repeat(csr_[pos], cnt)
        step = np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        p_col = cols_[base + step]                 # new-side column per pair
        p_row = np.repeat(np.arange(len(hid)), cnt)
        # vectorized signature-agreement prefilter over all pairs at once
        agree = (hsigs[p_row] == sigmat[p_col]).mean(axis=1)
        pre = agree >= cutoff
        if not pre.any():
            return _NEAR_OUT.empty_table()
        p_row, p_col = p_row[pre], p_col[pre]
        lsets = [hsets[r] for r in p_row]
        rl = slens[p_col]
        r_base = np.repeat(soffs[p_col], rl)
        r_step = np.arange(int(rl.sum())) - np.repeat(np.cumsum(rl) - rl, rl)
        jac = _batch_jaccard_flat(
            np.concatenate(lsets),
            np.array([len(s) for s in lsets], np.int64),
            sflat[r_base + r_step], rl)
        keep = jac >= threshold
        return pa.table({
            "new_id": pa.array(nids_[p_col[keep]].astype(np.int64),
                               pa.int64()),
            "hist_id": pa.array(hid[p_row[keep]], pa.int64()),
            "jaccard": pa.array(np.round(jac[keep], 6), pa.float64())})

    out = (ray.data.read_parquet(pay_files)
           .map_batches(verify, batch_format="pyarrow")).materialize()
    if out.count() == 0:
        return ray.data.from_arrow(_NEAR_OUT.empty_table())
    return out


_NEAR_OUT = pa.schema([("new_id", pa.int64()), ("hist_id", pa.int64()),
                       ("jaccard", pa.float64())])


def filter_near_seen(new_docs: "ray.data.Dataset", index_dir: str,
                     threshold: float = 0.6, id_col: str = "doc_id",
                     text_col: str = "text") -> "ray.data.Dataset":
    """Rows of ``new_docs`` with NO verified near-duplicate in the indexed
    corpus — the near-dup counterpart of ``filter_unseen`` (compose both
    for RefinedWeb-style exact-then-fuzzy incremental dedup)."""
    pairs = near_seen_pairs(new_docs, index_dir, threshold=threshold,
                            id_col=id_col, text_col=text_col)
    matched = set(
        int(r["new_id"])
        for t in ray.get(pairs.select_columns(["new_id"]).to_arrow_refs())
        for r in t.to_pylist())
    ref = ray.put(np.array(sorted(matched), np.int64))

    def keep(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        ids = pc.cast(t.column(id_col), pa.int64()).to_numpy(
            zero_copy_only=False)
        return t.filter(pa.array(~np.isin(ids, m)))

    return new_docs.map_batches(keep, batch_format="pyarrow")


def update_near_seen_index(new_docs: "ray.data.Dataset", index_dir: str,
                           text_col: str = "text") -> int:
    """Append ``new_docs`` to the near-seen index as a new generation of
    part files in the existing band/payload bucket dirs (append-only, like
    ``update_seen_index`` — probes glob ``*.parquet`` so generations are
    transparent to readers; a rebuild clears them). Completes the
    RefinedWeb-style loop: filter_near_seen -> admit survivors ->
    update_near_seen_index(survivors). Returns docs appended."""
    from .dedup import MinHasher, _shingle_sets_batch

    meta = _read_nmeta(index_dir)
    bands = int(meta["bands"])
    n_band_buckets = int(meta["n_band_buckets"])
    n_doc_buckets = int(meta["n_doc_buckets"])
    id_col = meta.get("id_col", "doc_id")
    gen = int(meta.get("generation", 0)) + 1
    hasher = MinHasher(int(meta["num_perm"]), bands, int(meta["shingle_k"]),
                       int(meta["seed"]), id_col=id_col, text_col=text_col)
    shingle_k = int(meta["shingle_k"])

    def featurize(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column(id_col), pa.int64()).to_numpy(
            zero_copy_only=False)
        texts = ["" if s is None else s
                 for s in t.column(text_col).to_pylist()]
        flat, lens = _shingle_sets_batch(texts, shingle_k)
        sigs = hasher.sigs_from_sets(flat, lens)
        bkeys = hasher.band_buckets(sigs).reshape(bands, len(ids))
        offs = np.concatenate([[0], np.cumsum(lens)])
        docbkt = (pd.util.hash_array(ids.astype(np.uint64))
                  % np.uint64(n_doc_buckets)).astype(np.int32)
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "sig": pa.array([sigs[:, i].tolist() for i in range(len(ids))],
                            pa.list_(pa.uint64())),
            "shingles": pa.array(
                [np.unique(flat[offs[i]:offs[i + 1]]).tolist()
                 for i in range(len(ids))], pa.list_(pa.uint64())),
            "bandkeys": pa.array([bkeys[:, i].tolist()
                                  for i in range(len(ids))],
                                 pa.list_(pa.int64())),
            "_docbkt": pa.array(docbkt, pa.int32()),
        })

    feats = new_docs.map_batches(featurize, batch_format="pyarrow",
                                 concurrency=2).materialize()

    def append_payload(g: pa.Table) -> pa.Table:
        b = int(g.column("_docbkt")[0].as_py())
        out = (g.drop_columns(["bandkeys", "_docbkt"])
               .sort_by([(id_col, "ascending")]))
        bdir = os.path.join(index_dir, f"docbkt={b}")
        os.makedirs(bdir, exist_ok=True)
        path = os.path.join(bdir, f"part-g{gen:06d}.parquet")
        tmp = path + ".inprogress"
        pq.write_table(out, tmp, compression="zstd")
        os.replace(tmp, path)
        return pa.table({"n": pa.array([len(out)], pa.int64())})

    counts = feats.groupby("_docbkt").map_groups(
        append_payload, batch_format="pyarrow").to_pandas()
    total = int(counts["n"].sum()) if len(counts) else 0

    def explode_bands(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        bk = np.array(t.column("bandkeys").to_pylist(), np.int64)
        if len(ids) == 0:
            return pa.table({"band": pa.array([], pa.int32()),
                             "bucket": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             "_bandbkt": pa.array([], pa.int32())})
        band = np.tile(np.arange(bands, dtype=np.int32), len(ids))
        doc = np.repeat(ids, bands)
        bucket = bk.reshape(-1)
        bkt = ((bucket.astype(np.uint64) ^ (band.astype(np.uint64) << 32))
               % np.uint64(n_band_buckets)).astype(np.int32)
        return pa.table({"band": pa.array(band, pa.int32()),
                         "bucket": pa.array(bucket, pa.int64()),
                         id_col: pa.array(doc, pa.int64()),
                         "_bandbkt": pa.array(bkt, pa.int32())})

    def append_bands(g: pa.Table) -> pa.Table:
        b = int(g.column("_bandbkt")[0].as_py())
        out = (g.drop_columns(["_bandbkt"])
               .sort_by([("band", "ascending"), ("bucket", "ascending"),
                         (id_col, "ascending")]))
        bdir = os.path.join(index_dir, f"bandbkt={b}")
        os.makedirs(bdir, exist_ok=True)
        path = os.path.join(bdir, f"part-g{gen:06d}.parquet")
        tmp = path + ".inprogress"
        pq.write_table(out, tmp, compression="zstd")
        os.replace(tmp, path)
        return pa.table({"n": pa.array([len(out)], pa.int64())})

    feats.map_batches(explode_bands, batch_format="pyarrow").groupby(
        "_bandbkt").map_groups(append_bands,
                               batch_format="pyarrow").materialize()

    meta["generation"] = gen
    meta["docs"] = int(meta.get("docs", 0)) + total
    tmp = os.path.join(index_dir, _NMETA + ".inprogress")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(index_dir, _NMETA))
    return total


def compact_seen_index(index_dir: str) -> int:
    """Fold all of a bucket's generation files back into a single sorted,
    deduplicated base part — the index's analogue of the lake's
    ``compact_partitions`` (generations accumulate per ``update_*`` call;
    probes stay correct but touch ever more files). Buckets with no
    generation files are left byte-untouched. Crash-safe per bucket: the
    new base lands via rename BEFORE the old parts are unlinked, and a
    reader that races sees a superset (dedup semantics tolerate it).
    Returns the number of buckets compacted."""
    meta = _read_meta(index_dir)
    done = 0
    total_fps = 0  # true distinct count — this is the one moment it's known
    for bdir in sorted(_glob.glob(os.path.join(index_dir, "bucket=*"))):
        gens = sorted(_glob.glob(os.path.join(bdir, "part-g*.parquet")))
        if not gens:
            # untouched buckets hold only deduplicated base parts; footer
            # metadata gives their distinct count without a data read
            total_fps += sum(
                pq.read_metadata(p).num_rows
                for p in _glob.glob(os.path.join(bdir, "*.parquet")))
            continue
        parts = sorted(_glob.glob(os.path.join(bdir, "*.parquet")))
        merged = pa.concat_tables([pq.read_table(p) for p in parts])
        fps = pc.unique(merged.column("fingerprint")).sort()
        path = os.path.join(bdir, "part-base-0000.parquet")
        tmp = path + ".inprogress"
        pq.write_table(pa.table({"fingerprint": fps}), tmp,
                       compression="zstd")
        os.replace(tmp, path)
        for p in parts:
            if os.path.abspath(p) != os.path.abspath(path):
                os.remove(p)
        done += 1
        total_fps += len(fps)
    meta["generation"] = 0
    # update_seen_index can only add per-batch distinct counts (it never sees
    # the index side), so the running meta total drifts upward on replays;
    # compaction resets it to the recomputed truth
    meta["fingerprints"] = total_fps
    tmp = os.path.join(index_dir, _META + ".inprogress")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(index_dir, _META))
    return done


def compact_near_seen_index(index_dir: str) -> int:
    """Same generation-fold for the near-seen index: every band/payload
    bucket's parts merge into one sorted base file (payloads dedup by doc
    id — the LAST generation wins, matching update semantics where a doc
    re-presented after admission carries identical features anyway).
    Returns buckets compacted."""
    meta = _read_nmeta(index_dir)
    id_col = meta.get("id_col", "doc_id")
    done = 0
    for kind, sort_keys, dedup_keys in (
            ("bandbkt", [("band", "ascending"), ("bucket", "ascending"),
                         (id_col, "ascending")], ["band", "bucket", id_col]),
            ("docbkt", [(id_col, "ascending")], [id_col])):
        for bdir in sorted(_glob.glob(os.path.join(index_dir, f"{kind}=*"))):
            gens = sorted(_glob.glob(os.path.join(bdir, "part-g*.parquet")))
            if not gens:
                continue
            parts = sorted(_glob.glob(os.path.join(bdir, "*.parquet")))
            merged = pa.concat_tables([pq.read_table(p) for p in parts])
            df = merged.to_pandas().drop_duplicates(dedup_keys, keep="last")
            out = pa.Table.from_pandas(df, preserve_index=False,
                                       schema=merged.schema).sort_by(sort_keys)
            path = os.path.join(bdir, "part-0000.parquet")
            tmp = path + ".inprogress"
            pq.write_table(out, tmp, compression="zstd")
            os.replace(tmp, path)
            for p in parts:
                if os.path.abspath(p) != os.path.abspath(path):
                    os.remove(p)
            done += 1
    meta["generation"] = 0
    tmp = os.path.join(index_dir, _NMETA + ".inprogress")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(index_dir, _NMETA))
    return done


# --------------------------------------------------------------------------
# Embedding-seen: incremental SEMANTIC dedup against a persisted IVF index
# --------------------------------------------------------------------------

_EMETA = "emb_seen_meta.json"


def build_embedding_seen_index(vecs: "ray.data.Dataset", index_dir: str,
                               n_clusters: int = 16,
                               sample_size: int = 2048,
                               id_col: str = "vec_id",
                               vec_col: str = "embedding",
                               seed: int = 42,
                               sub_splits: int = 1) -> int:
    """Build the SEMANTIC member of the incremental-dedup trio (exact
    fingerprints -> MinHash near-dup -> embedding cosine): the history
    corpus's vectors in a cluster-partitioned IVF layout
    (``similarity.py::build_ivf_index`` — ``cluster=<c>/part-*.parquet``
    plus a ``centroids.npy`` commit marker), so each new CDC batch probes
    only its nprobe nearest clusters instead of rescanning the lake
    (SemDeDup's neighbor question asked incrementally). Same invalidation
    discipline as the other indexes: meta removed first, written last.
    Returns vectors indexed."""
    from .similarity import build_ivf_index

    marker = os.path.join(index_dir, _EMETA)
    if os.path.exists(marker):
        os.remove(marker)
    # NULL-embedding rows carry nothing to compare — never indexed (the
    # fingerprint twin's pc.is_valid contract); _CentroidAssign would
    # otherwise crash stacking the None
    valid = vecs.select_columns([id_col, vec_col]).map_batches(
        lambda t: t.filter(pc.is_valid(t.column(vec_col))),
        batch_format="pyarrow")
    build_ivf_index(valid, index_dir,
                    n_clusters=n_clusters, sample_size=sample_size,
                    id_col=id_col, vec_col=vec_col, seed=seed,
                    sub_splits=sub_splits)
    n = sum(pq.read_metadata(f).num_rows
            for f in _glob.glob(os.path.join(index_dir, "cluster=*",
                                             "*.parquet")))
    meta = {"n_clusters": n_clusters, "id_col": id_col, "vec_col": vec_col,
            "seed": seed, "generation": 0, "docs": n}
    tmp = marker + ".inprogress"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, marker)
    return n


def _read_emeta(index_dir: str) -> dict:
    with open(os.path.join(index_dir, _EMETA)) as f:
        return json.load(f)


def semantic_seen_hits(new_vecs: "ray.data.Dataset", index_dir: str,
                       threshold: float = 0.5,
                       nprobe: int | None = None) -> pd.DataFrame:
    """Each new vector's nearest history vector (max cosine) from the
    index, as (id, hist_id, cosine) for hits >= threshold. The new side is
    the O(batch) side and broadcasts (``ivf_topk_indexed``'s query
    matrix); history never broadcasts and only the probed clusters' files
    are READ. ``nprobe=None`` probes every cluster — exact (the oracle
    anchor); realistic nprobe trades recall for an
    ~n_clusters/nprobe read+compute cut. Rows with NULL embeddings never
    hit (nothing to compare)."""
    from .similarity import ivf_topk_indexed

    meta = _read_emeta(index_dir)
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    new = new_vecs.select_columns([id_col, vec_col]).to_pandas()
    vec_ok = new[vec_col].notna().to_numpy()
    if not vec_ok.any():
        return pd.DataFrame({id_col: pd.Series([], dtype=np.int64),
                             "hist_id": pd.Series([], dtype=np.int64),
                             "cosine": pd.Series([], dtype=np.float64)})
    q_ids = new.loc[vec_ok, id_col].to_numpy()
    q = np.stack(new.loc[vec_ok, vec_col].to_list()).astype(np.float64)
    res = ivf_topk_indexed(
        index_dir, q, k=1,
        nprobe=int(meta["n_clusters"]) if nprobe is None else nprobe,
        id_col=id_col, vec_col=vec_col)
    res = res[res["score"] >= threshold]
    return pd.DataFrame({
        id_col: q_ids[res["query_id"].to_numpy(np.int64)],
        "hist_id": res[id_col].to_numpy(),
        "cosine": res["score"].to_numpy(np.float64)})


def filter_embedding_seen(new_vecs: "ray.data.Dataset", index_dir: str,
                          threshold: float = 0.5,
                          nprobe: int | None = None) -> "ray.data.Dataset":
    """Emit only the rows of ``new_vecs`` with NO history vector at cosine
    >= threshold — the admission filter of the incremental semantic-dedup
    loop (probe -> admit survivors -> ``update_embedding_seen_index``).
    Cross pairs only, like the other seen filters: semantic dup WITHIN the
    batch is ``semdedup``'s batch job."""
    meta = _read_emeta(index_dir)
    id_col = meta["id_col"]
    hits = semantic_seen_hits(new_vecs, index_dir, threshold=threshold,
                              nprobe=nprobe)
    seen_ref = ray.put(set(hits[id_col].tolist()))

    def keep(t: pa.Table) -> pa.Table:
        seen = ray.get(seen_ref)
        if not seen:
            return t
        ids = t.column(id_col).to_pandas()
        return t.filter(pa.array(~ids.isin(seen).to_numpy()))

    return new_vecs.map_batches(keep, batch_format="pyarrow")


def update_embedding_seen_index(new_vecs: "ray.data.Dataset",
                                index_dir: str) -> int:
    """Append admitted vectors to the index as a new generation of part
    files per cluster — assignment uses the ORIGINAL centroids (IVF
    semantics: centroids stay fixed across generations so probe and build
    agree; distribution drift is a rebuild, not an append). Returns rows
    appended."""
    from .similarity import _CentroidAssign

    meta = _read_emeta(index_dir)
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    gen = int(meta.get("generation", 0)) + 1
    cents = np.load(os.path.join(index_dir, "centroids.npy"))
    # survivors may legitimately include NULL-embedding rows (the filter
    # admits them — nothing to compare); they are never indexable
    assigned = new_vecs.select_columns([id_col, vec_col]).map_batches(
        lambda t: t.filter(pc.is_valid(t.column(vec_col))),
        batch_format="pyarrow").map_batches(
        _CentroidAssign(ray.put(cents), vec_col), batch_format="pyarrow")

    def append_cluster(g: pa.Table) -> pa.Table:
        c = int(g.column("cluster")[0].as_py())
        out = g.sort_by([(id_col, "ascending")])
        cdir = os.path.join(index_dir, f"cluster={c}")
        os.makedirs(cdir, exist_ok=True)
        path = os.path.join(cdir, f"part-g{gen:06d}-0000.parquet")
        tmp = path + ".inprogress"
        pq.write_table(out, tmp, compression="zstd")
        os.replace(tmp, path)
        return pa.table({"cluster": pa.array([c], pa.int32()),
                         "n": pa.array([len(out)], pa.int64())})

    counts = assigned.groupby("cluster").map_groups(
        append_cluster, batch_format="pyarrow").to_pandas()
    total = int(counts["n"].sum()) if len(counts) else 0
    meta["generation"] = gen
    meta["docs"] = int(meta.get("docs", 0)) + total
    tmp = os.path.join(index_dir, _EMETA + ".inprogress")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(index_dir, _EMETA))
    return total


def compact_embedding_seen_index(index_dir: str) -> int:
    """Fold each cluster's generation files into its base parts (sorted by
    id, duplicates by id keep-last — re-admitting an id replaces its
    vector), and reset the meta count to the recomputed truth. Returns
    clusters compacted."""
    meta = _read_emeta(index_dir)
    id_col = meta["id_col"]
    done = 0
    total = 0
    for cdir in sorted(_glob.glob(os.path.join(index_dir, "cluster=*"))):
        gens = sorted(_glob.glob(os.path.join(cdir, "part-g*.parquet")))
        if not gens:
            total += sum(pq.read_metadata(p).num_rows
                         for p in _glob.glob(os.path.join(cdir,
                                                          "*.parquet")))
            continue
        parts = sorted(_glob.glob(os.path.join(cdir, "*.parquet")))
        merged = pa.concat_tables([pq.read_table(p) for p in parts])
        df = merged.to_pandas().drop_duplicates([id_col], keep="last")
        out = pa.Table.from_pandas(df, preserve_index=False,
                                   schema=merged.schema).sort_by(
                                       [(id_col, "ascending")])
        path = os.path.join(cdir, "part-0000-0000.parquet")
        tmp = path + ".inprogress"
        pq.write_table(out, tmp, compression="zstd")
        os.replace(tmp, path)
        for p in parts:
            if os.path.abspath(p) != os.path.abspath(path):
                os.remove(p)
        done += 1
        total += len(out)
    meta["generation"] = 0
    meta["docs"] = total
    tmp = os.path.join(index_dir, _EMETA + ".inprogress")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(index_dir, _EMETA))
    return done
