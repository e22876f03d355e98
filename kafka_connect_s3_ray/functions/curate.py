"""Corpus curation: the composed training-data pipeline.

One streaming pass per stage, all Ray-Data-native, in the order large corpus
pipelines run them (cheap filters first so later stages see fewer bytes):

    quality gate (vectorized stats + thresholds)
      -> exact dedup (content hash, coarse-bucket keep-min)
      -> near-dup removal (MinHash LSH candidates -> drop the higher id)
      -> language filter (optional)
      -> token accounting (per-doc counts + corpus totals)

Each stage is also available standalone (functions/text.py, functions/dedup.py);
this module is the composition + the bookkeeping a curation run reports
(per-stage kept/dropped counts).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .dedup import exact_dedup, minhash_lsh_candidates
from .text import LanguageId, add_quality_stats, add_token_counts


def quality_filter(ds: "ray.data.Dataset", text_col: str = "text",
                   min_chars: int = 50, max_chars: int = 1_000_000,
                   max_punct_ratio: float = 0.3,
                   min_stopword_ratio: float = 0.0) -> "ray.data.Dataset":
    """Drop low-quality docs on vectorized stats; keeps original columns."""

    def gate(batch: pa.Table) -> pa.Table:
        stats = add_quality_stats(batch, text_col)
        keep = pc.and_(
            pc.and_(
                pc.greater_equal(stats.column("len_chars"), min_chars),
                pc.less_equal(stats.column("len_chars"), max_chars),
            ),
            pc.and_(
                pc.less_equal(stats.column("punct_ratio"), max_punct_ratio),
                pc.greater_equal(stats.column("stopword_ratio"), min_stopword_ratio),
            ),
        )
        return batch.filter(keep)

    return ds.map_batches(gate, batch_format="pyarrow")


def drop_near_duplicates(ds: "ray.data.Dataset", id_col: str = "doc_id",
                         text_col: str = "text", num_perm: int = 64,
                         bands: int = 16, jaccard_threshold: float | None = 0.8,
                         prefilter_margin_sigmas: float | None = 4.0,
                         ) -> "ray.data.Dataset":
    """Remove near-duplicates: LSH candidate pairs -> exact shingle-Jaccard
    verification (candidates only — never all pairs) -> drop the higher id of
    every confirmed pair (keep-first policy). The drop set is ids only (small)
    and broadcast as an anti-join filter — the corpus itself never shuffles.
    ``jaccard_threshold=None`` skips verification (pure-LSH, more aggressive).
    ``prefilter_margin_sigmas`` passes through to ``jaccard_verify``: at
    >20k candidates it bounds the exchange with a signature prefilter
    (~3e-5 miss probability per borderline true pair at the default 4
    sigma); ``None`` keeps the verification strictly exact at any size."""
    pairs = minhash_lsh_candidates(ds, id_col=id_col, text_col=text_col,
                                   num_perm=num_perm, bands=bands)
    cand = pairs.to_pandas()  # candidate pairs only: small by construction
    if cand.empty:
        return ds
    if jaccard_threshold is not None:
        from .dedup import jaccard_verify

        verified = jaccard_verify(
            ray.data.from_pandas(cand), ds, threshold=jaccard_threshold,
            id_col=id_col, text_col=text_col,
            prefilter_margin_sigmas=prefilter_margin_sigmas,
        ).to_pandas()
    else:
        verified = cand
    if verified.empty:
        return ds
    drop_ids = verified["right_id"].unique()
    from ..stages.joins import semi_join

    return semi_join(ds, drop_ids, on=id_col, anti=True)


def curate(ds: "ray.data.Dataset", id_col: str = "doc_id", text_col: str = "text",
           languages: set[str] | None = None,
           quality_kw: dict | None = None) -> tuple["ray.data.Dataset", dict]:
    """Full curation chain. Returns (curated dataset with token counts, report
    of per-stage survivor counts)."""
    # Each stage materializes so the per-stage counts don't re-execute the
    # whole lazy prefix (O(stages^2)). At full scale, swap materialize() for a
    # write_parquet checkpoint per stage — same role, disk-backed.
    report: dict[str, int] = {"input": ds.count()}
    ds = quality_filter(ds, text_col, **(quality_kw or {})).materialize()
    report["after_quality"] = ds.count()
    ds = exact_dedup(ds, id_col=id_col, text_col=text_col).materialize()
    report["after_exact_dedup"] = ds.count()
    ds = drop_near_duplicates(ds, id_col=id_col, text_col=text_col).materialize()
    report["after_near_dedup"] = ds.count()
    if languages:
        langs = set(languages)

        def lang_gate(batch: pa.Table) -> pa.Table:
            import numpy as np

            pred = batch.column("lang_pred").to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(np.isin(pred, list(langs))))

        ds = ds.map_batches(LanguageId, batch_format="pyarrow",
                            concurrency=(1, 2))
        ds = ds.map_batches(lang_gate, batch_format="pyarrow")
        ds = ds.drop_columns(["lang_pred"])
        report["after_language"] = ds.count()
    ds = ds.map_batches(add_token_counts, batch_format="pyarrow")
    # materialize once: every count() above re-executed the lazy chain; the
    # final dataset is reused by the caller
    ds = ds.materialize()
    report["output"] = ds.count()
    report["total_tokens"] = int(ds.sum("n_tokens_ws") or 0)
    return ds, report
