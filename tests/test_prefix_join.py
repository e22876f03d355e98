"""Prefix-filtered set-similarity join (AllPairs/PPJoin) vs the exact
O(n^2) kernel: equality on the fixture and on adversarial corpora, plus the
degenerate edges (empty corpus, docs below n words, strict-exact mode).

The candidate-recall proof (smallest common token in both prefixes) and the
positional-filter validity argument live in the ``ngram_prefix_join``
docstring; these tests pin them empirically.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from kafka_connect_s3_ray.functions.dedup import (ngram_jaccard_pairs,
                                                  ngram_prefix_join)

SF = "/root/testdata/sf0.001"


def _run(docs, **kw) -> pd.DataFrame:
    out = ngram_prefix_join(docs, **kw).to_pandas()
    return out.sort_values(["left_id", "right_id"]).reset_index(drop=True)


def _exact(docs, **kw) -> pd.DataFrame:
    out = ngram_jaccard_pairs(docs, **kw).to_pandas()
    return out.sort_values(["left_id", "right_id"]).reset_index(drop=True)


@pytest.mark.parametrize("threshold", [0.3, 0.8])
def test_prefix_equals_exact_on_fixture(ray_session, threshold):
    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    a = _run(docs, n=2, threshold=threshold)
    b = _exact(docs, n=2, threshold=threshold)
    pd.testing.assert_frame_equal(a, b, atol=1e-12)
    assert len(a) > 0  # the fixture plants near-dup pairs


def test_strict_exact_mode_no_prefilter(ray_session):
    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    a = _run(docs, n=2, threshold=0.8, prefilter_margin_sigmas=None)
    b = _exact(docs, n=2, threshold=0.8)
    pd.testing.assert_frame_equal(a, b, atol=1e-12)


def test_adversarial_hot_vocab_and_boundary_pairs(ray_session):
    # tiny vocabulary (every token "hot") + docs straddling the threshold:
    # identical docs (J=1), 2/3-overlap docs (J=0.5), disjoint docs
    texts = {
        1: "a b c d",          # grams {ab, bc, cd}
        2: "a b c d",          # J(1,2) = 1.0
        3: "a b c x",          # grams {ab, bc, cx}: J(1,3) = 2/4 = 0.5
        4: "p q r s",          # disjoint from 1-3
        5: "p q r s",          # J(4,5) = 1.0
        6: "w",                # below n words: never pairs
        7: "",                 # empty: never pairs
    }
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(texts), pa.int64()),
        "text": pa.array(list(texts.values()), pa.string()),
    }))
    for t in (0.4, 0.5, 0.51, 1.0):
        a = _run(docs, n=2, threshold=t, hot_tokens=2)  # force hot reorder
        b = _exact(docs, n=2, threshold=t)
        pd.testing.assert_frame_equal(a, b, atol=1e-12), t
    a = _run(docs, n=2, threshold=0.5)
    assert {(r.left_id, r.right_id) for r in a.itertuples()} == {
        (1, 2), (1, 3), (2, 3), (4, 5)}


def test_empty_and_all_short_corpora(ray_session):
    empty = rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64()),
                                    "text": pa.array([], pa.string())}))
    out = ngram_prefix_join(empty, n=2, threshold=0.8)
    # ray.data's to_pandas drops columns on a fully-empty dataset; the
    # Dataset-level schema is the typed-empty contract
    assert out.schema().names == ["left_id", "right_id", "jaccard"]
    assert out.count() == 0

    short = rd.from_arrow(pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                                    "text": pa.array(["one", "two"],
                                                     pa.string())}))
    out = ngram_prefix_join(short, n=2, threshold=0.8)
    assert out.schema().names == ["left_id", "right_id", "jaccard"]
    assert out.count() == 0


def test_positional_filter_math():
    # the pruning bound 1 + min(|a|-i-1, |b|-j-1) >= ceil(t/(1+t)(|a|+|b|))
    # must hold at the smallest common token of every true pair: brute-force
    # over random small sets
    rng = np.random.default_rng(7)
    for _ in range(300):
        t = rng.choice([0.3, 0.5, 0.8])
        a = np.unique(rng.integers(0, 20, rng.integers(2, 12)))
        b = np.unique(rng.integers(0, 20, rng.integers(2, 12)))
        inter = np.intersect1d(a, b)
        if len(inter) == 0:
            continue
        j = len(inter) / len(np.union1d(a, b))
        if j < t:
            continue
        w = inter.min()
        i, jj = int(np.searchsorted(a, w)), int(np.searchsorted(b, w))
        ub = 1 + min(len(a) - i - 1, len(b) - jj - 1)
        alpha = np.ceil(t / (1 + t) * (len(a) + len(b)) - 1e-9)
        assert ub >= alpha, (a, b, t)
        # and the prefix containment guarantee itself
        assert i < len(a) - int(np.ceil(t * len(a))) + 1
        assert jj < len(b) - int(np.ceil(t * len(b))) + 1
