"""Unit tests for the repetition quality signal (top word n-gram fraction)
and the exact kNN graph — hand-computed expectations, deterministic
tie-breaks, null/short-doc contracts, and batch invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from kafka_connect_s3_ray.functions.similarity import knn_graph
from kafka_connect_s3_ray.functions.text import repetition_top_ngram


def _rep(texts, n=2):
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    return repetition_top_ngram(t, n=n).to_pandas()


def test_repetition_hand_computed():
    out = _rep(["a b a b c", "x y", None, "", "w"])
    # doc0: bigrams {a b: 2, b a: 1, b c: 1}; word chars = 5 -> 2*2/5
    # doc1: one bigram "x y"; chars = 2 -> 2*1/2
    # docs 2/3/4: <2 tokens -> dropped (same as the SQL's len(ws) >= 2)
    assert out["doc_id"].tolist() == [0, 1]
    assert out["top_ngram"].tolist() == ["a b", "x y"]
    assert out["top_ngram_count"].tolist() == [2, 1]
    assert out["n_words"].tolist() == [5, 2]
    assert out["top_ngram_char_frac"].tolist() == [2 * 2 / 5, 1.0]


def test_repetition_tie_breaks_lexicographically():
    # "b c" and "a d" both occur twice -> the lexicographically smaller
    # bigram wins, matching the SQL ORDER BY cnt DESC, g
    out = _rep(["b c b c a d a d"])
    assert out["top_ngram"].tolist() == ["a d"]
    assert out["top_ngram_count"].tolist() == [2]


def test_repetition_lowercases_like_the_oracle():
    out = _rep(["A b a B"])
    assert out["top_ngram"].tolist() == ["a b"]
    assert out["top_ngram_count"].tolist() == [2]


def test_repetition_trigram_mode():
    out = _rep(["p q r p q r p q"], n=3)
    # 8 tokens -> 6 trigram windows: "p q r", "q r p", "r p q" twice each —
    # a three-way tie at count 2, resolved to the lexicographic min "p q r"
    assert out["top_ngram"].tolist() == ["p q r"]
    assert out["top_ngram_count"].tolist() == [2]
    # gram chars = 3, count 2, total word chars = 8
    assert out["top_ngram_char_frac"].tolist() == [3 * 2 / 8]


def _emb_ds(ids, vecs):
    return ray.data.from_arrow(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    }))


def test_knn_graph_excludes_self_and_ranks():
    ids = [1, 2, 3, 4]
    vecs = [[1, 0], [0.9, 0.1], [0, 1], [-1, 0]]
    out = knn_graph(_emb_ds(ids, vecs), k=2).to_pandas()
    out = out.sort_values(["vec_id", "score"],
                          ascending=[True, False]).reset_index(drop=True)
    assert (out.groupby("vec_id").size() == 2).all()
    assert not (out["vec_id"] == out["neighbor_id"]).any()
    # brute-force reference
    m = np.array(vecs, dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m.T
    for qi, qid in enumerate(ids):
        order = sorted((-(sims[qi, j]), ids[j]) for j in range(4) if j != qi)
        want = [i for _, i in order[:2]]
        got = out[out["vec_id"] == qid]["neighbor_id"].tolist()
        assert got == want, (qid, got, want)


def test_knn_graph_exact_tie_orders_by_neighbor_id():
    # vec 5 duplicates vec 2: from vec 1's view both score identically ->
    # the stable argsort must order the tie by ascending neighbor id
    ids = [1, 2, 3, 5]
    vecs = [[1, 0], [0.6, 0.8], [0, 1], [0.6, 0.8]]
    out = knn_graph(_emb_ds(ids, vecs), k=2).to_pandas()
    got = out[out["vec_id"] == 1]["neighbor_id"].tolist()
    assert got == [2, 5]
    # the duplicate pair are each other's perfect (score 1.0) neighbors
    top2 = out[out["vec_id"] == 2].iloc[0]
    assert top2["neighbor_id"] == 5 and top2["score"] == pytest.approx(1.0)


def test_knn_graph_batch_invariance():
    rng = np.random.default_rng(7)
    ids = list(range(40))
    vecs = rng.normal(size=(40, 8))
    a = knn_graph(_emb_ds(ids, vecs), k=3, batch_size=7).to_pandas()
    b = knn_graph(_emb_ds(ids, vecs), k=3, batch_size=1024).to_pandas()
    key = ["vec_id", "neighbor_id"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_knn_graph_k_clamped_to_corpus():
    ids = [1, 2]
    out = knn_graph(_emb_ds(ids, [[1, 0], [0, 1]]), k=5).to_pandas()
    # only one possible neighbor each
    assert len(out) == 2
    assert not (out["vec_id"] == out["neighbor_id"]).any()


def test_topk_rows_deterministic_matches_full_sort():
    from kafka_connect_s3_ray.functions.similarity import (
        _topk_rows_deterministic,
    )

    rng = np.random.default_rng(11)
    # k <= 16 takes the argmax-sweep path; k > 16 the argpartition path
    # (with boundary-tie fallback); pad pushing m >= N the full-sort path
    for k, pad in [(3, 4), (5, 2), (1, 1), (20, 8), (18, 500)]:
        sims = rng.normal(size=(17, 200))
        # plant heavy exact ties, including ties wider than pad that force
        # the boundary fallback
        sims[:, 40:80] = 0.5
        sims[3, :] = 1.0
        sims[5, 190:] = sims[5, 0]
        idx, sc = _topk_rows_deterministic(sims, k, pad=pad)
        full = np.argsort(-sims, axis=1, kind="stable")[:, :k]
        np.testing.assert_array_equal(idx, full)
        np.testing.assert_array_equal(
            sc, np.take_along_axis(sims, full, axis=1))


def _graphs(n=300, dim=12, seed=3):
    rng = np.random.default_rng(seed)
    # clustered corpus (mixture of 10 gaussians) — the regime IVF exists for
    centers = rng.normal(size=(10, dim)) * 3
    vecs = centers[rng.integers(0, 10, n)] + rng.normal(size=(n, dim))
    return list(range(n)), vecs


def test_knn_graph_ivf_exhaustive_probe_equals_exact(ray_session):
    from kafka_connect_s3_ray.functions.similarity import knn_graph_ivf

    ids, vecs = _graphs()
    key = ["vec_id", "neighbor_id"]
    exact = (knn_graph(_emb_ds(ids, vecs), k=4).to_pandas()
             .sort_values(key).reset_index(drop=True))
    ivf = (knn_graph_ivf(_emb_ds(ids, vecs), k=4, n_clusters=8, nprobe=8)
           .to_pandas().sort_values(key).reset_index(drop=True))
    # nprobe == n_clusters: every query meets every member -> bit-for-bit
    # equal to the full-corpus exact graph (same float64 dots, same
    # (score DESC, id ASC) tie-break)
    pd.testing.assert_frame_equal(ivf, exact)


def test_knn_graph_ivf_recall_at_realistic_nprobe(ray_session):
    from kafka_connect_s3_ray.functions.similarity import knn_graph_ivf

    ids, vecs = _graphs()
    exact = knn_graph(_emb_ds(ids, vecs), k=5).to_pandas()
    ivf = knn_graph_ivf(_emb_ds(ids, vecs), k=5, n_clusters=16,
                        nprobe=6).to_pandas()
    # every vector still gets a full top-k list (its home cluster alone has
    # >= k members on this corpus)
    assert (ivf.groupby("vec_id").size() == 5).all()
    assert not (ivf["vec_id"] == ivf["neighbor_id"]).any()
    want = set(zip(exact["vec_id"], exact["neighbor_id"]))
    got = set(zip(ivf["vec_id"], ivf["neighbor_id"]))
    recall = len(want & got) / len(want)
    assert recall >= 0.9, recall


def test_knn_graph_ivf_visitor_rows_rank_without_self_hit(ray_session):
    from kafka_connect_s3_ray.functions.similarity import knn_graph_ivf

    # two tight far-apart clusters; nprobe=2 makes every vector visit the
    # other cluster too, so the merge must pick only genuine neighbors and
    # never a self-pair routed through a visitor copy
    ids = [1, 2, 3, 11, 12, 13]
    vecs = [[10, 0.1], [10, -0.1], [10.2, 0.0],
            [-10, 0.1], [-10, -0.1], [-10.2, 0.0]]
    out = knn_graph_ivf(_emb_ds(ids, vecs), k=2, n_clusters=2, nprobe=2,
                        sample_size=6).to_pandas()
    assert not (out["vec_id"] == out["neighbor_id"]).any()
    for qid in ids:
        nb = set(out[out["vec_id"] == qid]["neighbor_id"])
        same = {1, 2, 3} if qid < 10 else {11, 12, 13}
        assert nb == same - {qid}, (qid, nb)


def test_knn_graph_ivf_auto_nprobe_meets_recall_floor(ray_session):
    """nprobe='auto' (the default) self-selects a dial whose true recall vs
    the exact graph meets the 0.9 floor — on a clustered corpus it should
    pick a SMALL nprobe (the probe CDF saturates fast), on a hard
    random-direction corpus a larger one; in both regimes no hand tuning."""
    from kafka_connect_s3_ray.functions.similarity import knn_graph_ivf

    for seed, kind in [(3, "clustered"), (7, "random")]:
        if kind == "clustered":
            ids, vecs = _graphs(seed=seed)
        else:
            rng = np.random.default_rng(seed)
            n = 300
            ids, vecs = list(range(n)), rng.normal(size=(n, 12))
        exact = knn_graph(_emb_ds(ids, vecs), k=3).to_pandas()
        ivf = knn_graph_ivf(_emb_ds(ids, vecs), k=3,
                            n_clusters=16).to_pandas()  # nprobe defaults auto
        chosen = knn_graph_ivf.last_auto_nprobe
        assert 1 <= chosen <= 16, chosen
        want = set(zip(exact["vec_id"], exact["neighbor_id"]))
        got = set(zip(ivf["vec_id"], ivf["neighbor_id"]))
        recall = len(want & got) / len(want)
        assert recall >= 0.88, (kind, chosen, recall)
    # and the probe is monotone in its target: asking for near-exhaustive
    # recall must not pick a smaller dial than the 0.9 floor did
    from kafka_connect_s3_ray.functions.similarity import (_auto_nprobe,
                                                           _normalize,
                                                           kmeans_fit)
    rng = np.random.default_rng(11)
    smat = _normalize(rng.normal(size=(400, 12)))
    cents = kmeans_fit(smat, 16)
    assert (_auto_nprobe(smat, cents, 3, target=0.99)
            >= _auto_nprobe(smat, cents, 3, target=0.9))
