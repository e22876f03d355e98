"""embedding_covariance / pca_project: one-pass distributed partials must
reproduce a single-machine numpy PCA exactly (same centering, same
eigensystem, same sign convention)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from kafka_connect_s3_ray.functions.profile import (embedding_covariance,
                                                    pca_project)


def _ds(x: np.ndarray, blocks: int = 5) -> "ray.data.Dataset":
    return ray.data.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(len(x)), pa.int64()),
        "embedding": pa.array([row.tolist() for row in x],
                              pa.list_(pa.float32())),
    })).repartition(blocks)


def _rand(n=400, d=12, seed=0):
    rng = np.random.RandomState(seed)
    # anisotropic so the eigenvalues are well separated (stable order)
    return (rng.randn(n, d) * np.linspace(5, 0.1, d)).astype(np.float32)


def test_covariance_matches_numpy(ray_session):
    x = _rand()
    got = embedding_covariance(_ds(x)).to_pandas()
    ref = np.cov(x.astype(np.float64), rowvar=False, bias=True)
    d = x.shape[1]
    assert len(got) == d * (d + 1) // 2
    for _, r in got.iterrows():
        assert r["cov"] == pytest.approx(
            ref[int(r["dim_i"]), int(r["dim_j"])], abs=1.5e-6)


def test_projection_matches_numpy_pca(ray_session):
    x = _rand(seed=3)
    q = 4
    out = pca_project(_ds(x), q=q).to_pandas().sort_values(
        "vec_id").reset_index(drop=True)
    xf = x.astype(np.float64)
    c = xf - xf.mean(axis=0)
    # reference eigensystem from the ROUND-TRIPPED covariance (the engine
    # rounds cov to 6 dp by the oracle contract before eigh)
    cov = np.round(np.cov(xf, rowvar=False, bias=True), 6)
    w, v = np.linalg.eigh(cov)
    comps = v[:, np.argsort(w)[::-1][:q]]
    flip = comps[np.abs(comps).argmax(axis=0), np.arange(q)] < 0
    comps[:, flip] *= -1.0
    ref = c @ comps
    got = out[[f"pc_{k}" for k in range(q)]].to_numpy()
    np.testing.assert_allclose(got, ref, atol=1e-6)
    # variance along pc_0 >= pc_1 >= ... (descending eigenvalues)
    var = got.var(axis=0)
    assert np.all(np.diff(var) <= 1e-9)


def test_projection_deterministic_across_block_counts(ray_session):
    x = _rand(seed=7)
    a = pca_project(_ds(x, blocks=3), q=2).to_pandas().sort_values("vec_id")
    b = pca_project(_ds(x, blocks=11), q=2).to_pandas().sort_values("vec_id")
    np.testing.assert_allclose(a[["pc_0", "pc_1"]].to_numpy(),
                               b[["pc_0", "pc_1"]].to_numpy(), atol=1e-9)


def test_ragged_embeddings_raise(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array([0, 1], pa.int64()),
        "embedding": pa.array([[1.0, 2.0], [1.0, 2.0, 3.0]],
                              pa.list_(pa.float32())),
    }))
    with pytest.raises(Exception, match="ragged|width"):
        embedding_covariance(ds)


def test_empty_raises_for_pca_and_empty_table_for_cov(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float32())),
    }))
    assert len(embedding_covariance(ds)) == 0
    with pytest.raises(ValueError, match="no embeddings"):
        pca_project(ds, q=2)


def test_null_embeddings_excluded_like_sql(ray_session):
    """NULL embedding rows leave the aggregate scope (the oracle filters
    embedding IS NOT NULL) instead of crashing the width assertion, and
    pca_project drops them from the projection output."""
    x = _rand(n=50, d=4, seed=9)
    rows = [r.tolist() for r in x]
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(len(rows) + 2), pa.int64()),
        "embedding": pa.array(rows + [None, None], pa.list_(pa.float32())),
    })).repartition(3)
    got = embedding_covariance(ds).to_pandas()
    ref = np.cov(x.astype(np.float64), rowvar=False, bias=True)
    for _, r in got.iterrows():
        assert r["cov"] == pytest.approx(
            ref[int(r["dim_i"]), int(r["dim_j"])], abs=1.5e-6)
    out = pca_project(ds, q=2).to_pandas()
    assert len(out) == len(rows)
    assert set(out["vec_id"]) == set(range(len(rows)))


def test_q_out_of_range_raises(ray_session):
    x = _rand(n=30, d=4, seed=1)
    with pytest.raises(ValueError, match=r"q must be in \[1, 4\]"):
        pca_project(_ds(x), q=5)
    with pytest.raises(ValueError, match="q must be in"):
        pca_project(_ds(x), q=0)
