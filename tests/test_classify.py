"""Naive-Bayes classifier (functions/classify.py): closed-form training
counts, Laplace smoothing, priors, OOV-ignore, tie-break, NULL contracts."""

import math

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from kafka_connect_s3_ray.functions.classify import nb_classify, train_nb


def _docs(rows):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
    }))


TRAIN = [
    (0, "apple banana apple", "en"),
    (1, "banana cherry", "en"),
    (2, "pomme poire pomme pomme", "fr"),
    (3, "poire", "fr"),
]


def _hand_model(alpha=1.0):
    """Hand-computed reference: vocab sorted, (V, C) smoothed log-probs."""
    vocab = ["apple", "banana", "cherry", "poire", "pomme"]
    cnt = {  # (token, class) counts from TRAIN
        ("apple", "en"): 2, ("banana", "en"): 2, ("cherry", "en"): 1,
        ("pomme", "fr"): 3, ("poire", "fr"): 2,
    }
    tok_c = {"en": 5, "fr": 5}
    V = len(vocab)
    lp = {(w, c): math.log((cnt.get((w, c), 0) + alpha)
                           / (tok_c[c] + alpha * V))
          for w in vocab for c in ("en", "fr")}
    prior = {"en": math.log(2 / 4), "fr": math.log(2 / 4)}
    return vocab, lp, prior


def test_train_counts_and_smoothing_match_hand_computation():
    m = train_nb(_docs(TRAIN))
    vocab, lp, prior = _hand_model()
    assert list(m["vocab"]) == vocab
    assert m["classes"] == ["en", "fr"]
    for i, w in enumerate(vocab):
        for j, c in enumerate(["en", "fr"]):
            assert m["logprob"][i, j] == pytest.approx(lp[(w, c)], abs=1e-12)
    assert m["logprior"][0] == pytest.approx(prior["en"], abs=1e-12)


def test_scoring_matches_hand_computation_and_ignores_oov():
    m = train_nb(_docs(TRAIN))
    vocab, lp, prior = _hand_model()
    score_docs = _docs([
        (10, "apple apple durian", None),   # durian is OOV -> ignored
        (11, "pomme poire", None),
        (12, None, None),                   # token-less -> priors only
    ])
    out = {r["doc_id"]: r for r in
           nb_classify(score_docs, m).take_all()}
    want_en = prior["en"] + 2 * lp[("apple", "en")]
    want_fr = prior["fr"] + 2 * lp[("apple", "fr")]
    assert out[10]["pred"] == ("en" if want_en > want_fr else "fr")
    assert out[10]["score"] == pytest.approx(round(max(want_en, want_fr), 6))
    assert out[11]["pred"] == "fr"
    # priors tie at ln(1/2) -> lexicographically smallest class wins
    assert out[12]["pred"] == "en"
    assert out[12]["score"] == pytest.approx(round(prior["en"], 6))


def test_null_label_and_null_text_excluded_from_training():
    noisy = TRAIN + [(4, "apple apple apple", None), (5, None, "en")]
    m1, m2 = train_nb(_docs(TRAIN)), train_nb(_docs(noisy))
    assert list(m1["vocab"]) == list(m2["vocab"])
    assert np.allclose(m1["logprob"], m2["logprob"])
    assert np.allclose(m1["logprior"], m2["logprior"])


def test_block_layout_invariance():
    ds = _docs(TRAIN).repartition(4)
    m1, m2 = train_nb(_docs(TRAIN)), train_nb(ds)
    assert list(m1["vocab"]) == list(m2["vocab"])
    assert np.allclose(m1["logprob"], m2["logprob"])


def test_classifies_separable_corpus_heldout():
    """Behavioral sanity on a held-out split: classes drawing from mostly
    disjoint vocabularies (plus shared noise words) classify near-perfectly.
    (The driver fixture's languages share one vocabulary, so accuracy there
    is chance — parity with the oracle is what the catalog entry checks.)"""
    rng = np.random.default_rng(7)
    vocabs = {"en": ["cat", "dog", "bird", "fish"],
              "fr": ["chat", "chien", "oiseau", "poisson"],
              "zh": ["mao", "gou", "niao", "yu"]}
    shared = ["the", "a", "of"]
    rows = []
    for i in range(300):
        lang = ["en", "fr", "zh"][i % 3]
        words = list(rng.choice(vocabs[lang], 12)) + list(rng.choice(shared, 3))
        rng.shuffle(words)
        rows.append((i, " ".join(words), lang))
    train = _docs([r for r in rows if r[0] % 2 == 0])
    test = _docs([r for r in rows if r[0] % 2 == 1])
    m = train_nb(train)
    pred = {r["doc_id"]: r["pred"] for r in nb_classify(test, m).take_all()}
    truth = {r[0]: r[2] for r in rows if r[0] % 2 == 1}
    acc = np.mean([pred[k] == truth[k] for k in truth])
    assert acc == 1.0, f"held-out accuracy {acc:.3f}"


def test_invalid_alpha_and_empty_training_raise():
    with pytest.raises(ValueError):
        train_nb(_docs(TRAIN), alpha=0.0)
    with pytest.raises(ValueError):
        train_nb(_docs([(0, None, None)]))
