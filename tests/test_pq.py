"""Product quantization: codebook training, byte codes, ADC scan, exact
re-rank, persisted code index. The SQL oracle (pq_topk, seeded iters=0
codebook) runs in test_queries; here we pin what SQL can't: training
improves quantization, the refined path recovers recall on PQ's worst-case
corpus (unstructured Gaussian), and the persisted index equals the live
scan."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

SF = "/root/testdata/sf0.001"


def _emb_ds():
    return ray.data.read_parquet(f"{SF}/embeddings.parquet").repartition(4)


def _queries(n=10):
    import duckdb

    qdf = duckdb.sql(
        f"SELECT embedding FROM '{SF}/embeddings.parquet' "
        f"ORDER BY vec_id LIMIT {n}").df()
    return np.stack(qdf["embedding"].to_list()).astype(np.float64)


def _recall(approx, exact, k):
    gt = exact.groupby("query_id")["vec_id"].apply(set)
    ap = approx.groupby("query_id")["vec_id"].apply(set)
    return float(np.mean([len(gt[q] & ap[q]) / k for q in gt.index]))


def test_pq_train_reduces_quantization_error(ray_session):
    from kafka_connect_s3_ray.functions.similarity import (_normalize_seq,
                                                           _sq_dist_seq,
                                                           pq_train)

    sample = _emb_ds().limit(400).to_pandas()["embedding"]
    X = _normalize_seq(np.stack(sample.to_list()))

    def mse(cb):
        m, _, dsub = cb.shape
        tot = 0.0
        for mi in range(m):
            sub = X[:, mi * dsub:(mi + 1) * dsub]
            tot += _sq_dist_seq(sub, cb[mi]).min(axis=1).sum()
        return tot / len(X)

    cb0 = pq_train(X, m=8, ksub=16, iters=0, seed=7)
    cb10 = pq_train(X, m=8, ksub=16, iters=10, seed=7)
    assert mse(cb10) < mse(cb0)


def test_pq_refined_recall_and_exact_coverage(ray_session):
    from kafka_connect_s3_ray.functions.similarity import (brute_force_topk,
                                                           pq_topk_refined)

    emb = _emb_ds()
    q = _queries(10)
    exact = brute_force_topk(emb, q, k=10)
    # worst-case corpus for PQ (no structure): refined path must still
    # recover >= 0.9 recall from a 100-candidate shortlist
    ref = pq_topk_refined(emb, q, k=10, shortlist=100, m=8, ksub=64,
                          iters=10, sample_size=1024)
    assert _recall(ref, exact, 10) >= 0.9
    # shortlist >= corpus: the ADC stage nominates everything, the exact
    # re-rank IS brute force -> identical frame (scores bit-equal)
    full = pq_topk_refined(emb, q, k=10, shortlist=600, m=8, ksub=16,
                           iters=0, sample_size=1024)
    assert full.reset_index(drop=True).equals(exact.reset_index(drop=True))


def test_pq_index_roundtrip_equals_live(ray_session, tmp_path):
    from kafka_connect_s3_ray.functions.similarity import (build_pq_index,
                                                           pq_topk,
                                                           pq_topk_indexed,
                                                           pq_train)

    emb = _emb_ds()
    q = _queries(5)
    sample = emb.limit(512).to_pandas()["embedding"]
    cb = pq_train(np.stack(sample.to_list()), m=8, ksub=16, iters=5, seed=3)
    live = pq_topk(emb, q, k=7, codebook=cb)
    got = build_pq_index(emb, str(tmp_path / "pqidx"), codebook=cb)
    assert np.array_equal(got, cb)
    idx = pq_topk_indexed(str(tmp_path / "pqidx"), q, k=7)
    assert idx.reset_index(drop=True).equals(live.reset_index(drop=True))
    # marker-last commit: codebook file exists alongside code files
    assert (tmp_path / "pqidx" / "pq_codebook.npy").exists()


def test_pq_codes_are_m_bytes(ray_session):
    from kafka_connect_s3_ray.functions.similarity import pq_encode, pq_train

    emb = _emb_ds()
    sample = emb.limit(256).to_pandas()["embedding"]
    cb = pq_train(np.stack(sample.to_list()), m=16, ksub=16, iters=0)
    codes = pq_encode(emb, cb).to_pandas()
    assert len(codes) == emb.count()
    lens = codes["codes"].map(len).unique()
    assert list(lens) == [16]
    flat = np.concatenate(codes["codes"].to_list())
    assert flat.dtype == np.uint8 and flat.max() < 16


def test_pq_encode_empty_batch(ray_session):
    from kafka_connect_s3_ray.functions.similarity import (_PQEncode,
                                                           pq_train)

    import ray as _ray

    sample = _emb_ds().limit(64).to_pandas()["embedding"]
    cb = pq_train(np.stack(sample.to_list()), m=8, ksub=4, iters=0)
    enc = _PQEncode(_ray.put(cb), "vec_id", "embedding")
    out = enc(pa.table({"vec_id": pa.array([], pa.int64()),
                        "embedding": pa.array([], pa.list_(pa.float32()))}))
    assert out.num_rows == 0 and out.column_names == ["vec_id", "codes"]


def test_pq_rejects_indivisible_dim(ray_session):
    from kafka_connect_s3_ray.functions.similarity import (
        pq_codebook_from_vectors)

    with pytest.raises(ValueError, match="not divisible"):
        pq_codebook_from_vectors(np.ones((4, 10)), m=3)


def test_ivfpq_recall_and_probe_monotonicity(ray_session, tmp_path):
    from kafka_connect_s3_ray.functions.similarity import (brute_force_topk,
                                                           build_ivfpq_index,
                                                           ivfpq_topk_indexed)

    emb = _emb_ds()
    q = _queries(10)
    exact = brute_force_topk(emb, q, k=10)
    d = str(tmp_path / "ivfpq")
    build_ivfpq_index(emb, d, n_clusters=16, m=8, ksub=64, iters=10)
    recs = []
    for nprobe in (4, 16):
        r = ivfpq_topk_indexed(d, q, k=10, nprobe=nprobe, refine_ds=emb,
                               shortlist=100)
        recs.append(_recall(r, exact, 10))
    # more probes never hurt, and the production shape (refine) clears 0.85
    assert recs[1] >= recs[0]
    assert recs[1] >= 0.85


def test_ivfpq_reads_only_probed_clusters(ray_session, tmp_path, monkeypatch):
    import glob as _glob

    import ray.data as rd

    from kafka_connect_s3_ray.functions import similarity as S

    emb = _emb_ds()
    q = _queries(2)
    d = str(tmp_path / "ivfpq")
    S.build_ivfpq_index(emb, d, n_clusters=16, m=8, ksub=16, iters=2)
    seen: list[str] = []
    orig = rd.read_parquet

    def spy(paths, *a, **kw):
        seen.extend(paths if isinstance(paths, list) else [paths])
        return orig(paths, *a, **kw)

    monkeypatch.setattr(S.ray.data, "read_parquet", spy)
    S.ivfpq_topk_indexed(d, q, k=5, nprobe=2)
    all_files = set(_glob.glob(d + "/cluster=*/codes-*.parquet"))
    touched = set(f for f in seen if "cluster=" in f)
    assert touched and touched < all_files  # strictly pruned read
    probed_dirs = {f.split("cluster=")[1].split("/")[0] for f in touched}
    assert len(probed_dirs) <= 2 * 2  # <= nprobe clusters per query, unioned
