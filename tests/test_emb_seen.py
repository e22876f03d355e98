"""Incremental SEMANTIC dedup against the persisted IVF embedding index
(`functions/seen.py` embedding-seen section): build / probe / filter /
update / compact lifecycle, exhaustive-probe exactness, pruned reads,
and the CLI loop."""

import glob
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from kafka_connect_s3_ray.functions.seen import (
    build_embedding_seen_index,
    compact_embedding_seen_index,
    filter_embedding_seen,
    semantic_seen_hits,
    update_embedding_seen_index,
)


def _vecs(ids, mat):
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in mat],
                              pa.list_(pa.float64()))}))


def _corpus(n=64, dim=8, seed=0):
    rng = np.random.default_rng(seed)
    m = rng.normal(size=(n, dim))
    return m / np.linalg.norm(m, axis=1, keepdims=True)


def test_build_filter_update_lifecycle(ray_session, tmp_path):
    idx = str(tmp_path / "emb")
    hist = _corpus(48)
    n = build_embedding_seen_index(_vecs(range(48), hist), idx, n_clusters=4)
    assert n == 48
    # new batch: two near-copies of history vectors + two orthogonal-ish
    fresh = _corpus(2, seed=99)
    new_mat = np.vstack([hist[3] + 0.001, hist[17] + 0.001, fresh])
    out = filter_embedding_seen(
        _vecs([100, 101, 102, 103], new_mat), idx,
        threshold=0.95).to_pandas()
    assert sorted(out["vec_id"]) == [102, 103]

    # remember the survivors; re-presenting them now filters them out
    surv = _vecs([102, 103], fresh)
    assert update_embedding_seen_index(surv, idx) == 2
    out2 = filter_embedding_seen(surv, idx, threshold=0.95).to_pandas()
    assert len(out2) == 0
    meta = json.load(open(os.path.join(idx, "emb_seen_meta.json")))
    assert meta["generation"] == 1 and meta["docs"] == 50
    gens = glob.glob(os.path.join(idx, "cluster=*", "part-g*.parquet"))
    assert gens


def test_exhaustive_probe_matches_brute_force(ray_session, tmp_path):
    """nprobe=None (all clusters) reproduces exact brute-force max-cosine
    membership for every new vector."""
    idx = str(tmp_path / "emb")
    hist = _corpus(40, seed=1)
    new = _corpus(20, seed=2)
    build_embedding_seen_index(_vecs(range(40), hist), idx, n_clusters=5)
    t = 0.6
    hits = semantic_seen_hits(_vecs(range(100, 120), new), idx, threshold=t)
    got = set(hits["vec_id"])
    sims = new @ hist.T
    want = {100 + i for i in range(20) if sims[i].max() >= t}
    assert got == want
    # and the reported neighbor is THE argmax with the right cosine
    for _, r in hits.iterrows():
        i = int(r["vec_id"]) - 100
        assert int(r["hist_id"]) == int(np.argmax(sims[i]))
        assert abs(r["cosine"] - sims[i].max()) < 1e-9


def test_realistic_nprobe_recall(ray_session, tmp_path):
    """nprobe < n_clusters keeps most hits (recall bound) and never
    invents one (precision 1.0 by construction)."""
    idx = str(tmp_path / "emb")
    hist = _corpus(200, seed=3)
    new = hist[:50] + 0.001  # 50 guaranteed hits at 0.99
    build_embedding_seen_index(_vecs(range(200), hist), idx, n_clusters=8)
    exact = semantic_seen_hits(_vecs(range(500, 550), new), idx,
                               threshold=0.99)
    approx = semantic_seen_hits(_vecs(range(500, 550), new), idx,
                                threshold=0.99, nprobe=3)
    assert set(approx["vec_id"]) <= set(exact["vec_id"])
    assert len(approx) >= 0.9 * len(exact)


def test_null_embedding_rows_pass_through(ray_session, tmp_path):
    idx = str(tmp_path / "emb")
    build_embedding_seen_index(_vecs(range(8), _corpus(8)), idx,
                               n_clusters=2)
    t = pa.table({"vec_id": pa.array([1000], pa.int64()),
                  "embedding": pa.array([None], pa.list_(pa.float64()))})
    out = filter_embedding_seen(rd.from_arrow(t), idx,
                                threshold=0.0).to_pandas()
    assert out["vec_id"].tolist() == [1000]
    # the filter-then-remember loop must accept NULL survivors: they are
    # skipped (nothing to index), not a crash in _CentroidAssign
    assert update_embedding_seen_index(rd.from_arrow(t), idx) == 0
    meta = json.load(open(os.path.join(idx, "emb_seen_meta.json")))
    assert meta["docs"] == 8


def test_build_skips_null_embedding_history(ray_session, tmp_path):
    idx = str(tmp_path / "emb")
    hist = _corpus(6)
    t = pa.table({"vec_id": pa.array(range(7), pa.int64()),
                  "embedding": pa.array(
                      [list(map(float, v)) for v in hist] + [None],
                      pa.list_(pa.float64()))})
    assert build_embedding_seen_index(rd.from_arrow(t), idx,
                                      n_clusters=2) == 6


def test_compact_folds_generations_and_resets_meta(ray_session, tmp_path):
    idx = str(tmp_path / "emb")
    hist = _corpus(30, seed=4)
    build_embedding_seen_index(_vecs(range(30), hist), idx, n_clusters=3)
    extra = _corpus(6, seed=5)
    update_embedding_seen_index(_vecs(range(100, 106), extra), idx)
    update_embedding_seen_index(_vecs(range(100, 106), extra), idx)  # replay
    done = compact_embedding_seen_index(idx)
    assert done >= 1
    assert not glob.glob(os.path.join(idx, "cluster=*", "part-g*.parquet"))
    meta = json.load(open(os.path.join(idx, "emb_seen_meta.json")))
    assert meta["generation"] == 0
    assert meta["docs"] == 36  # replayed ids deduped keep-last
    # probes still work after compaction
    hits = semantic_seen_hits(_vecs([500], extra[:1] + 0.0005), idx,
                              threshold=0.99)
    assert hits["vec_id"].tolist() == [500]


def test_emb_seen_cli_roundtrip(tmp_path, capsys, ray_session):
    from kafka_connect_s3_ray.__main__ import main

    import pyarrow.parquet as pq

    hist = _corpus(32, seed=6)
    hp = str(tmp_path / "hist.parquet")
    pq.write_table(pa.table({
        "vec_id": pa.array(range(32), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in hist],
                              pa.list_(pa.float64()))}), hp)
    newm = np.vstack([hist[5] + 0.001, _corpus(1, seed=7)])
    np_ = str(tmp_path / "new.parquet")
    pq.write_table(pa.table({
        "vec_id": pa.array([100, 101], pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in newm],
                              pa.list_(pa.float64()))}), np_)
    idx = str(tmp_path / "idx")
    assert main(["emb-seen-build", "--vecs", hp, "--index", idx,
                 "--clusters", "4"]) == 0
    assert main(["emb-seen-filter", "--vecs", np_, "--index", idx,
                 "--threshold", "0.95", "--update"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["incoming"] == 2 and out["survivors"] == 1
    assert out["index_appended"] == 1
    # the survivor is now seen
    assert main(["emb-seen-filter", "--vecs", np_, "--index", idx,
                 "--threshold", "0.95"]) == 0
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["survivors"] == 0
    # compaction folds the appended generation
    assert main(["seen-compact", "--index", idx]) == 0
    out3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out3["emb_clusters"] >= 1
