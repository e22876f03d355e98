"""Late-round-3 additions: per-group z-score outliers, BM25 ranked
retrieval, distributed greedy sequence packing."""

import numpy as np
import pandas as pd

import ray


def test_zscore_outliers_null_and_degenerate_contracts():
    """NULL groups/values are excluded, a constant group (sd = 0) emits no
    rows, and the surviving z values match the single-machine formula."""
    from kafka_connect_s3_ray.functions.profile import zscore_outliers

    df = pd.DataFrame({
        "event_id": np.arange(12, dtype=np.int64),
        "grp": ["a"] * 8 + ["const", "const", None, "a"],
        "value": [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 100.0,
                  5.0, 5.0, 2.0, None],
    })
    out = zscore_outliers(ray.data.from_pandas(df), "grp", "value",
                          threshold=2.0).to_pandas()
    # group a: mean=13.375, var=(8*1+10000)/8 - mu^2 -> only the 100.0 row
    # has |z| > 2; const group sd=0 -> dropped; NULL group/value -> dropped
    v = np.array([1.0] * 7 + [100.0])
    mu, sd = v.mean(), v.std()
    assert list(out["event_id"]) == [7]
    assert abs(out["z"].iloc[0] - round((100.0 - mu) / sd, 6)) < 1e-12
