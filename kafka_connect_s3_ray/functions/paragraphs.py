"""Paragraph-level exact dedup with document rebuild — the CCNet/Dolma
curation op ("dedup at paragraph granularity, keep documents"): every
repeated paragraph keeps its FIRST corpus occurrence (ordered by
(doc_id, position)), every later copy is cut, and each document is rebuilt
from its surviving paragraphs in order.

The fixture corpus has no newline structure, so "paragraph" is a
deterministic CHUNK: consecutive runs of ``chunk_tokens`` lowercase
whitespace tokens (last chunk short) — the same fixed-window convention the
SQL oracle replays with a dual-unnest position enumeration. On a real
corpus pass ``split_re`` to chunk on blank lines instead; the exchange
layout is identical.

Scale shape (the Dolma dedup shape — two bounded exchanges, no broadcast,
no driver materialization):
  1. streaming chunker: doc -> (doc_id, chunk_idx, chunk, n_total) rows,
     coarse-bucketed by a stable hash of the chunk STRING — equal chunks
     co-locate, so per-bucket first-occurrence selection (min
     (doc_id, chunk_idx) per chunk) is globally exact;
  2. winners re-key by doc-id bucket and UNION with a zero-shuffle per-doc
     totals stream keyed the same way; one groupby rebuilds each doc from
     its surviving chunks in position order and joins its total — docs that
     lost every chunk surface with empty text, never vanish.

Reference analog: none (the reference moves opaque records); this is the
corpus-content tier of D1-D3's file/key-level dedup family.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .dedup import N_COARSE, _splitmix64_mix, _stable_token_hash

_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("chunk_idx", pa.int64()),
    ("chunk", pa.string()),
    ("n_total", pa.int64()),
    ("side", pa.string()),   # 'w' = winner chunk row, 't' = per-doc total
    ("bucket", pa.int64()),
])


def _doc_bucket(ids: np.ndarray, n_buckets: int) -> np.ndarray:
    return (_splitmix64_mix(ids.astype(np.uint64))
            % np.uint64(n_buckets)).astype(np.int64)


def _fixed_window_chunks(text: str | None, chunk_tokens: int) -> list[str]:
    toks = ("" if text is None else text).lower().split()
    return [" ".join(toks[j:j + chunk_tokens])
            for j in range(0, len(toks), chunk_tokens)]


def _paragraph_chunks(text: str | None, split_re) -> list[str]:
    return [p.strip() for p in split_re.split(text or "") if p.strip()]


def chunk_dedup(docs: "ray.data.Dataset", text_col: str = "text",
                id_col: str = "doc_id", chunk_tokens: int = 16,
                split_re: str | None = None, join_sep: str = " ",
                n_buckets: int = N_COARSE) -> "ray.data.Dataset":
    """Returns (doc_id, text, n_chunks_kept, n_chunks_total): the corpus
    with duplicate chunks removed (first occurrence by (doc_id, chunk_idx)
    wins) and documents rebuilt from survivors.

    ``split_re`` switches chunking from fixed token windows to regex
    paragraph splitting (e.g. ``r"\\n{2,}"`` for blank-line paragraphs,
    stripped, empties dropped; pass ``join_sep="\\n\\n"`` to rebuild with
    paragraph breaks). The exchange layout is identical either way."""
    import re

    pat = re.compile(split_re) if split_re else None

    def _chunks(x):
        return (_paragraph_chunks(x, pat) if pat
                else _fixed_window_chunks(x, chunk_tokens))

    def chunk_rows(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column(id_col), pa.int64()).to_numpy(
            zero_copy_only=False)
        out_id, out_idx, out_chunk, out_tot = [], [], [], []
        for i, x in zip(ids, t.column(text_col).to_pylist()):
            chunks = _chunks(x)
            n = len(chunks)
            for j, ch in enumerate(chunks):
                out_id.append(i)
                out_idx.append(j)
                out_chunk.append(ch)
                out_tot.append(n)
        chunks = np.array(out_chunk, object)
        bucket = (_stable_token_hash(chunks) % np.uint64(n_buckets)
                  ).astype(np.int64) if len(chunks) else np.empty(0, np.int64)
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "chunk_idx": pa.array(out_idx, pa.int64()),
            "chunk": pa.array(out_chunk, pa.string()),
            "n_total": pa.array(out_tot, pa.int64()),
            "side": pa.array(["w"] * len(out_id), pa.string()),
            "bucket": pa.array(bucket, pa.int64()),
        }, schema=_SCHEMA)

    def first_occurrence(g: pd.DataFrame) -> pd.DataFrame:
        # equal chunks co-locate in one bucket -> global min is bucket-local
        w = (g.sort_values(["chunk", "doc_id", "chunk_idx"], kind="stable")
             .drop_duplicates("chunk"))
        return w.drop(columns=["bucket"])

    winners = (docs.map_batches(chunk_rows, batch_format="pyarrow")
               .groupby("bucket")
               .map_groups(first_occurrence, batch_format="pandas"))

    def rekey_by_doc(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket", pa.array(_doc_bucket(ids, n_buckets), pa.int64()))

    def totals_rows(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column(id_col), pa.int64()).to_numpy(
            zero_copy_only=False)
        texts = t.column(text_col).to_pylist()
        tot = np.fromiter((len(_chunks(x)) for x in texts),
                          np.int64, len(ids))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "chunk_idx": pa.array([None] * len(ids), pa.int64()),
            "chunk": pa.array([None] * len(ids), pa.string()),
            "n_total": pa.array(tot, pa.int64()),
            "side": pa.array(["t"] * len(ids), pa.string()),
            "bucket": pa.array(_doc_bucket(ids, n_buckets), pa.int64()),
        }, schema=_SCHEMA)

    unioned = (winners.map_batches(rekey_by_doc, batch_format="pyarrow")
               .union(docs.map_batches(totals_rows, batch_format="pyarrow")))

    def rebuild(g: pd.DataFrame) -> pd.DataFrame:
        t = g[g["side"] == "t"]
        w = g[g["side"] == "w"].sort_values(["doc_id", "chunk_idx"],
                                            kind="stable")
        kept = w.groupby("doc_id").agg(
            text=("chunk", join_sep.join), n_chunks_kept=("chunk", "size"))
        out = t[["doc_id", "n_total"]].rename(
            columns={"n_total": "n_chunks_total"}).set_index("doc_id")
        out = out.join(kept)
        out["text"] = out["text"].fillna("")
        out["n_chunks_kept"] = out["n_chunks_kept"].fillna(0).astype(np.int64)
        return out.reset_index()[
            ["doc_id", "text", "n_chunks_kept", "n_chunks_total"]]

    return unioned.groupby("bucket").map_groups(rebuild, batch_format="pandas")
