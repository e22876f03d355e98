"""Exact repeated-span detection (ExactSubstr-class dedup).

Finds every maximal token span whose k-token windows all occur at least
``min_count`` times in the corpus — the "duplicated training text" signal of
Lee et al., *Deduplicating Training Data Makes Language Models Better* (ACL
2022). Their construction is one global suffix array; this is the Ray-Data
re-expression: a vectorized rolling hash per block, ONE hash-partitioned
exchange to count window occurrences, and one doc-partitioned exchange of
only the duplicated positions for the per-doc maximal-span merge. No stage
holds more than a block; nothing is O(corpus) on any single worker.

Exchange volume is the honest cost of exactness: one 28-byte row per token
position for the counting pass (the suffix-array equivalent moves the same
order of data into the sort). The second exchange carries only duplicated
positions — tiny on a mostly-unique corpus.

Equality contract: windows are compared by a pair of independent 64-bit
rolling hashes over stable token hashes (effectively 128-bit), not by
string equality — two distinct windows collide with p ~ 2^-128 per pair,
negligible even at 10^12 windows. The DuckDB oracle compares the actual
strings, so a hash-green catalog run certifies the hash scheme too.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .dedup import _stable_token_hash

_WIN = pa.schema([("h1", pa.uint64()), ("h2", pa.uint64()),
                  ("doc_id", pa.int64()), ("pos", pa.int32()),
                  ("coarse", pa.int32())])
_DPOS = pa.schema([("doc_id", pa.int64()), ("pos", pa.int32()),
                   ("coarse2", pa.int32())])
_SPAN = pa.schema([("doc_id", pa.int64()), ("span_start", pa.int64()),
                   ("span_end", pa.int64())])

# per-doc position offset for the cross-doc cummax island trick; positions
# are int32 so 2^34 keeps doc*OFF+pos collision-free and inside int64
_OFF = np.int64(1) << np.int64(34)


def _window_rows(t: pa.Table, id_col: str, text_col: str, k: int,
                 n_coarse: int) -> pa.Table:
    """Every k-token window of every doc as (h1, h2, doc_id, pos) — the
    same whitespace tokenization + stable token hashes as the n-gram
    kernels (``_stable_token_hash``), windows combined by two independent
    polynomial mixes. Positions are 0-based token indices."""
    if len(t) == 0:
        return _WIN.empty_table()
    texts = t.column(text_col).to_pylist()
    toks = [(s or "").split() for s in texts]
    lens = np.array([len(x) for x in toks], np.int64)
    ids = pc.cast(t.column(id_col), pa.int64()).to_numpy(zero_copy_only=False)
    flat = np.array([w for doc in toks for w in doc], dtype=object)
    if len(flat) < k:
        return _WIN.empty_table()
    h = _stable_token_hash(flat)
    doc_idx = np.repeat(np.arange(len(toks), dtype=np.int64), lens)
    m = len(h) - k + 1
    g1 = h[:m].copy()
    g2 = h[:m] * np.uint64(0x9E3779B97F4A7C15)
    ok = np.ones(m, bool)
    for j in range(1, k):
        g1 = g1 * np.uint64(1000003) ^ h[j:m + j]
        g2 = g2 * np.uint64(6364136223846793005) ^ (h[j:m + j] + np.uint64(j))
        ok &= doc_idx[j:m + j] == doc_idx[:m]
    starts = np.cumsum(lens) - lens
    gdoc = doc_idx[:m][ok]
    gpos = (np.arange(m, dtype=np.int64)[ok] - starts[gdoc]).astype(np.int32)
    g1, g2 = g1[ok], g2[ok]
    return pa.Table.from_arrays(
        [pa.array(g1, pa.uint64()), pa.array(g2, pa.uint64()),
         pa.array(ids[gdoc], pa.int64()), pa.array(gpos, pa.int32()),
         pa.array((g1 % np.uint64(n_coarse)).astype(np.int32), pa.int32())],
        schema=_WIN)


def duplicate_spans(docs: "ray.data.Dataset", k: int = 8,
                    id_col: str = "doc_id", text_col: str = "text",
                    min_count: int = 2, n_coarse: int = 256,
                    n_coarse_doc: int = 64) -> "ray.data.Dataset":
    """Maximal duplicated token spans: (doc_id, span_start, span_end) with
    span_end exclusive, covering exactly the union of all k-token windows
    whose content occurs >= ``min_count`` times corpus-wide (other docs OR
    elsewhere in the same doc). Overlapping and touching windows merge
    (pos <= running max end), so each output row is one contiguous
    duplicated region, the unit ExactSubstr removes or flags.

    Pipeline: window rows -> groupby(h1 bucket) run-length count ->
    duplicated (doc, pos) -> groupby(doc bucket) vectorized island merge.
    Both groupbys are coarse-bucket exchanges; every kernel is numpy on
    flat arrays (lexsort + reduceat), no per-row Python anywhere."""
    win = docs.map_batches(
        lambda t: _window_rows(t, id_col, text_col, k, n_coarse),
        batch_format="pyarrow")
    # the sort-shuffle groupby emits one output partition per input block;
    # window rows are lean (28 B/token), so materialize (they feed the
    # shuffle next anyway) and split to cluster width if the read was
    # narrower than that
    win = win.materialize()
    min_blocks = int(ray.cluster_resources().get("CPU", 8)) * 2
    if win.num_blocks() < min_blocks:
        win = win.repartition(min_blocks)

    def dup_positions(g: "pa.Table") -> pa.Table:
        h1 = g.column("h1").to_numpy(zero_copy_only=False)
        h2 = g.column("h2").to_numpy(zero_copy_only=False)
        doc = g.column("doc_id").to_numpy(zero_copy_only=False)
        pos = g.column("pos").to_numpy(zero_copy_only=False)
        order = np.lexsort((h2, h1))
        h1, h2, doc, pos = h1[order], h2[order], doc[order], pos[order]
        new_run = np.ones(len(h1), bool)
        new_run[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
        run_id = np.cumsum(new_run) - 1
        run_len = np.bincount(run_id)
        keep = run_len[run_id] >= min_count
        doc, pos = doc[keep], pos[keep]
        return pa.Table.from_arrays(
            [pa.array(doc, pa.int64()), pa.array(pos, pa.int32()),
             pa.array((doc % n_coarse_doc).astype(np.int32), pa.int32())],
            schema=_DPOS)

    dpos = (win.groupby("coarse")
            .map_groups(dup_positions, batch_format="pyarrow"))

    def merge_spans(g: "pa.Table") -> pa.Table:
        doc = g.column("doc_id").to_numpy(zero_copy_only=False)
        pos = g.column("pos").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((pos, doc))
        doc, pos = doc[order], pos[order]
        end = pos + k
        # cross-doc island scan in one accumulate: rank*OFF+pos is globally
        # ordered, and a new doc's keys exceed every prior doc's end keys,
        # so one running max of end-keys finds island breaks for ALL docs
        # (dense per-group rank, not doc_id itself, so rank*OFF can't
        # overflow int64 for arbitrary ids)
        rank = np.zeros(len(doc), np.int64)
        if len(doc) > 1:
            rank[1:] = np.cumsum(doc[1:] != doc[:-1])
        key = rank * _OFF + pos
        endkey = rank * _OFF + end
        cummax = np.maximum.accumulate(endkey)
        brk = np.ones(len(doc), bool)
        brk[1:] = key[1:] > cummax[:-1]
        starts = np.flatnonzero(brk)
        span_end = np.maximum.reduceat(end, starts)
        return pa.Table.from_arrays(
            [pa.array(doc[starts], pa.int64()),
             pa.array(pos[starts], pa.int64()),
             pa.array(span_end, pa.int64())],
            schema=_SPAN)

    out = (dpos.groupby("coarse2")
           .map_groups(merge_spans, batch_format="pyarrow")).materialize()
    # internal stages use the private "doc_id" name; the OUTPUT surface
    # carries the caller's id_col so downstream joins (remove_duplicate_spans
    # with id_col="media_id", …) see the column they keyed on
    if id_col != "doc_id":
        out = out.map_batches(
            lambda t: t.rename_columns([id_col, "span_start", "span_end"]),
            batch_format="pyarrow")
    if out.count() == 0:  # cheap: materialized (all-unique or sub-k corpus)
        empty = _SPAN.empty_table()
        if id_col != "doc_id":
            empty = empty.rename_columns([id_col, "span_start", "span_end"])
        return ray.data.from_arrow(empty)
    return out


def remove_duplicate_spans(docs: "ray.data.Dataset", k: int = 8,
                           id_col: str = "doc_id", text_col: str = "text",
                           min_count: int = 2,
                           broadcast_budget_rows: int = 2_000_000,
                           n_coarse: int = 256,
                           n_coarse_doc: int = 64) -> "ray.data.Dataset":
    """ExactSubstr REMOVAL (Lee et al. ACL'22): rewrite every doc with its
    ``duplicate_spans`` regions cut out — the released
    deduplicate-text-datasets tool's semantics, which removes EVERY
    occurrence of a duplicated substring (all copies, not all-but-one).

    Contract: docs with NULL/whitespace-only text are passed through with
    ``text_clean = NULL`` / ``''``; all other docs are re-emitted as
    (id_col, text_clean) where text_clean is the doc's whitespace tokens
    minus the flagged [span_start, span_end) ranges, rejoined by a single
    space — i.e. output text is TOKEN-NORMALIZED (runs of whitespace
    collapse) even for untouched docs, which keeps the operator a pure
    function of the token sequence the span finder saw. A fully-duplicated
    doc comes back as ``''``.

    Scale: the span table is bounded by duplicated volume, not corpus
    size — per-doc span lists are aggregated with the same coarse doc-hash
    exchange the finder ends with, then broadcast once via ``ray.put``
    below ``broadcast_budget_rows`` spans (the common case: dup regions
    are a small fraction of a 100 TB corpus) or joined by a coarse-bucket
    hash exchange above it. The strip kernel walks numpy range masks per
    batch; only the final per-doc ' '.join is per-row, the same cost class
    as the tokenize it mirrors."""
    spans = duplicate_spans(docs, k=k, id_col=id_col, text_col=text_col,
                            min_count=min_count, n_coarse=n_coarse,
                            n_coarse_doc=n_coarse_doc).materialize()

    def strip_fn(lookup: "dict[int, np.ndarray]"):
        def strip(t: pa.Table) -> pa.Table:
            ids = pc.cast(t.column(id_col), pa.int64()).to_numpy(
                zero_copy_only=False)
            texts = t.column(text_col).to_pylist()
            out = []
            for did, s in zip(ids, texts):
                if s is None:
                    out.append(None)
                    continue
                toks = s.split()
                ranges = lookup.get(int(did))
                if ranges is None or not toks:
                    out.append(" ".join(toks))
                    continue
                keep = np.ones(len(toks), bool)
                for a, b in ranges:
                    keep[a:b] = False
                out.append(" ".join(w for w, kf in zip(toks, keep) if kf))
            return pa.table({id_col: pa.array(ids, pa.int64()),
                             "text_clean": pa.array(out, pa.string())})
        return strip

    n_spans = spans.count()
    if n_spans == 0:
        return docs.map_batches(strip_fn({}), batch_format="pyarrow")
    if n_spans <= broadcast_budget_rows:
        sdf = spans.to_pandas()
        lookup = {
            int(did): g[["span_start", "span_end"]].to_numpy(np.int64)
            for did, g in sdf.groupby(id_col, sort=False)
        }
        ref = ray.put(lookup)

        def strip_bc(t: pa.Table) -> pa.Table:
            return strip_fn(ray.get(ref))(t)

        return docs.map_batches(strip_bc, batch_format="pyarrow")

    # above-budget scale path: co-partition docs and spans on a coarse
    # doc-hash bucket, strip inside each bucket group
    from .dedup import _splitmix64_mix

    def tag(col: str):
        def f(t: pa.Table) -> pa.Table:
            d = pc.cast(t.column(col), pa.int64()).to_numpy(
                zero_copy_only=False).astype(np.uint64)
            h = _splitmix64_mix(d)
            return t.append_column("coarse3", pa.array(
                (h % np.uint64(n_coarse_doc)).astype(np.int32)))
        return f

    import pandas as pd

    # align both sides onto one union schema (explicit null-fill — Dataset
    # union of mismatched schemas is undefined behavior)
    union_schema = pa.schema([
        (id_col, pa.int64()), (text_col, pa.string()),
        ("span_start", pa.int64()), ("span_end", pa.int64()),
        ("is_span", pa.bool_()), ("coarse3", pa.int32()),
    ])

    def align(t: pa.Table) -> pa.Table:
        cols = []
        for f in union_schema:
            if f.name in t.schema.names:
                cols.append(pc.cast(t.column(f.name), f.type))
            else:
                cols.append(pa.nulls(len(t), f.type))
        return pa.Table.from_arrays(cols, schema=union_schema)

    dtag = (docs.map_batches(tag(id_col), batch_format="pyarrow")
            .map_batches(align, batch_format="pyarrow"))
    stag = (spans.map_batches(tag(id_col), batch_format="pyarrow")
            .map_batches(lambda t: align(t.append_column(
                "is_span", pa.array(np.ones(len(t), bool)))),
                batch_format="pyarrow"))

    def strip_group(g: pd.DataFrame) -> pd.DataFrame:
        sp = g[g.get("is_span").notna()] if "is_span" in g else g.iloc[0:0]
        dd = g[g.get("is_span").isna()] if "is_span" in g else g
        lookup = {
            int(did): s[["span_start", "span_end"]].to_numpy(np.int64)
            for did, s in sp.groupby(id_col, sort=False)
        } if len(sp) else {}
        tbl = pa.Table.from_pandas(
            dd[[id_col, text_col]], preserve_index=False)
        return strip_fn(lookup)(tbl).to_pandas()

    both = dtag.union(stag)
    return both.groupby("coarse3").map_groups(strip_group,
                                              batch_format="pandas")
