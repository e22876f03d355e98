"""Local replica of the driver's correctness gate: run each ``queries()``
entry and its ``oracle_sql()`` side by side on the driver testdata, compare
row count, column names, and order-insensitive values."""

import os

import numpy as np
import pandas as pd
import pytest

SF = os.environ.get("KCS3_TEST_SF", "/root/testdata/sf0.001")


def _to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(6)
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def _oracle(sql: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    for t in ["events", "documents", "embeddings", "lineitem", "orders", "customer"]:
        path = f"{SF}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con.execute(sql).df()


def _queries():
    import __ray_entry__ as e

    return e.queries(), e.oracle_sql()


QUERIES, ORACLES = None, None


def _load():
    global QUERIES, ORACLES
    if QUERIES is None:
        import sys

        sys.path.insert(0, "/root/repo")
        import __ray_entry__ as e

        QUERIES, ORACLES = e.queries(), e.oracle_sql()
    return QUERIES, ORACLES


SQL_CHECKED = [
    "watermark_filter", "partition_watermarks", "lww_keep_last",
    "cdc_merge_events", "time_travel", "change_data_feed",
    "archive_roundtrip", "partition_prune",
    "replay_order",
    "topk_events", "exclude_filter", "token_count", "quality_stats",
    "dedup_exact", "token_sum_by_lang", "cosine_topk", "embedding_near_dup",
    "semdedup", "lang_id",
    "distinct_users_by_type", "windowed_distinct", "ngram_jaccard",
    "ngram_jaccard_prefix", "duplicate_spans", "remove_duplicate_spans",
    "filter_unseen", "near_seen",
    "near_dup_clusters",
    "pii_redact", "decontaminate", "json_props_agg", "funnel",
    "cohort_retention", "unigram_logprob", "event_transitions",
    "tfidf_terms",
    "embedding_centroids", "embedding_covariance",
    "value_histogram", "zscore_outliers", "mad_outliers", "users_intersect",
    "users_except", "daily_trends", "bm25_search",
    "sequence_packing", "seeded_shuffle", "percentile_rank", "ntile_buckets",
    "grouped_ntile", "winsorize", "turn_pairs", "rag_chunks", "sft_curation",
    "clean_text", "value_ranks",
    "exact_k_sample", "grouped_exact_k", "heavy_hitters",
    "grouped_heavy_hitters", "semantic_unseen", "weighted_sample",
    "left_join", "full_outer_join", "running_totals", "patch_merge",
    "pagerank", "moving_average", "unpivot_events", "revenue_filter",
    "numeric_corr", "grouping_sets", "gap_fill",
    "event_lag_lead", "bigram_logprob", "pq_topk", "zorder_lookup",
    "token_entropy", "rollup_summary", "cube_summary", "chunk_dedup",
    "rrf_fusion", "type_regression", "pivot_events", "token_mix_sample",
    "pmi_pairs", "grouped_packing", "order_revenue",
    "quality_filtered", "rolling_fingerprint",
    "train_val_split", "keyed_sample", "stratified_sample", "top_terms",
    "minhash_near_dup", "near_dup_verified", "curation_chain",
    "simhash_near_dup", "approx_distinct", "grouped_approx_distinct",
    "exact_quantiles",
    "grouped_quantiles",
    "tumbling_window", "sliding_window", "session_windows", "broadcast_join", "asof_join",
    "range_join",
    "hash_join", "anti_join", "semi_join_bloom", "pricing_summary",
    "topk_per_group",
    "cdc_transcripts", "conversation_stats", "incremental_view",
    "conversation_rebuild", "dialog_integrity",
    "nb_classify",
    # exhaustive-probe IVF (nprobe == n_clusters) is exact: scanning every
    # cluster makes clustering irrelevant to the result, so the brute-force
    # cosine SQL is the oracle
    "cosine_topk_ivf", "cosine_topk_ivf_indexed",
    "repetition_signals", "knn_graph", "knn_graph_ivf",
    "windowed_dedup", "regex_extract",
    "table_profile", "burst_counts", "ewma", "edit_distance_join",
    "triangle_count", "containment_join", "weighted_median",
    "grouped_mode", "fuzzy_key_dedup", "gap_quantiles",
    # multimodal: decode stays binary, but the compared values are exact
    # int64 decode sums checked against a driver-side-decoded per-unit
    # fixture (media_oracle_fixture) — SQL does aggregation + (for video)
    # the frame selection independently
    "media_features", "video_frames",
    # banded pair discovery vs an independent DuckDB brute-force popcount
    # join over the driver-side-hashed fixture
    "image_near_dup",
]
# the legitimately non-SQL-checkable entries: the quantile sketch's thinning
# depends on batch boundaries, and media decode is binary.
ROWS_ONLY = [
    "approx_quantiles",
    "pca_projection",  # eigendecomposition: not SQL-expressible; pytest
                       # asserts equality with single-machine numpy PCA
    "knn_graph_ivf_nprobe6",  # approximate by construction; recall >= 0.9
                              # pinned by test_repetition_knn + bench figure
    "ivfpq_topk",  # approximate by construction (residual byte codes +
                   # probe pruning); recall pinned by test_pq
    "bpe_tokens",  # iterative merge training: not SQL-expressible; quadratic
                   # reference-implementation equality oracle in test_bpe
]


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_matches_oracle(name):
    queries, oracles = _load()
    # the cdc_transcripts oracle reads the deterministic sf0.01 fixture from
    # /tmp (the scale the driver gate runs at) — compare both sides there
    sf = ("/root/testdata/sf0.01"
          if name in ("cdc_transcripts", "conversation_stats",
                      "incremental_view", "conversation_rebuild",
                      "dialog_integrity", "turn_pairs",
                      "sft_curation",
                      # media oracles are built from the sf0.01 corpora
                      # (the scale the driver gate runs at)
                      "media_features", "video_frames",
                      "image_near_dup") else SF)
    got = _canon(_to_pandas(queries[name](sf)))
    exp = _canon(_oracle(oracles[name]))
    assert list(got.columns) == list(exp.columns), (
        f"{name}: columns {list(got.columns)} != {list(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: {len(got)} rows != {len(exp)}"
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=False,
                                  rtol=1e-6, atol=1e-9)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(name):
    queries, _ = _load()
    got = _to_pandas(queries[name](SF))
    assert got is not None and len(got.columns) > 0
    assert len(got) >= 0


def test_every_query_has_oracle_or_is_rows_only():
    queries, oracles = _load()
    assert set(oracles) <= set(queries)
    assert set(SQL_CHECKED) == set(oracles)
    assert set(SQL_CHECKED) | set(ROWS_ONLY) == set(queries)


def test_entry_smoke():
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    out = _to_pandas(e.entry())
    assert len(out) > 0
    assert {"conv_id", "turn_idx", "role", "text", "ts"} <= set(out.columns)
