"""Composite corpus-curation pipeline."""

import pandas as pd
import pyarrow as pa

import ray.data

from kafka_connect_s3_ray.functions.curate import (
    curate,
    drop_near_duplicates,
    quality_filter,
)

SF = "/root/testdata/sf0.001"


def _docs_with_noise():
    base = ray.data.read_parquet(f"{SF}/documents.parquet").to_pandas()
    junk = pd.DataFrame(
        {
            "doc_id": [90_001, 90_002, 90_003],
            "text": ["x", "!!!???!!!..,,;;!!" * 5, "the " * 20_000],
            "lang": ["en"] * 3,
            "source": ["junk"] * 3,
            "n_chars": [1, 85, 80_000],
        }
    )
    dup = base.head(3).copy()
    dup["doc_id"] = dup["doc_id"] + 90_100  # exact dups
    near = base.head(2).copy()
    near["doc_id"] = near["doc_id"] + 90_200
    near["text"] = near["text"] + " tiny tail"
    return pd.concat([base, junk, dup, near], ignore_index=True)


def test_quality_filter_drops_junk():
    df = _docs_with_noise()
    out = quality_filter(ray.data.from_pandas(df), min_chars=50,
                         max_chars=50_000, max_punct_ratio=0.3).to_pandas()
    assert 90_001 not in set(out["doc_id"])  # too short
    assert 90_002 not in set(out["doc_id"])  # punctuation soup
    assert 90_003 not in set(out["doc_id"])  # too long
    assert len(out) >= 500


def test_drop_near_duplicates_keeps_lower_id():
    df = _docs_with_noise()
    df = pd.concat([df.head(150), df[df["doc_id"] >= 90_000]], ignore_index=True)
    out = drop_near_duplicates(ray.data.from_pandas(df)).to_pandas()
    ids = set(out["doc_id"])
    assert 90_200 not in ids and 90_201 not in ids  # near-dups dropped
    assert 0 in ids and 1 in ids  # originals kept


def test_curate_end_to_end():
    df = _docs_with_noise()
    curated, report = curate(
        ray.data.from_pandas(df),
        quality_kw={"min_chars": 50, "max_chars": 50_000},
    )
    assert report["input"] == len(df)
    assert report["after_quality"] < report["input"]
    assert report["after_exact_dedup"] <= report["after_quality"]
    assert report["after_near_dedup"] <= report["after_exact_dedup"]
    assert report["output"] == report["after_near_dedup"]
    assert report["total_tokens"] > 0
    out = curated.to_pandas()
    assert "n_tokens_ws" in out.columns
    # all planted noise and duplicates are gone
    assert not (out["doc_id"] >= 90_000).any()
