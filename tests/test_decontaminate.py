"""decontaminate: benchmark n-gram membership must flag exactly the docs
sharing a word n-gram with the benchmark corpus, counting each doc's
DISTINCT contaminated grams once (SQL count(DISTINCT g) semantics)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from kafka_connect_s3_ray.functions.text import (ContaminationScorer,
                                                 _word_ngrams_batch,
                                                 benchmark_ngram_set,
                                                 decontaminate)


def _docs(rows, blocks=3):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })).repartition(blocks)


def _ngrams_ref(text, n):
    w = (text or "").lower().split()
    return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}


@pytest.mark.parametrize("n", [2, 3, 5])
def test_batch_ngrams_match_per_doc_reference(n, ray_session):
    rng = np.random.RandomState(n)
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, rng.randint(0, 12)))
             for _ in range(50)] + [None, "", "  ", "one two"]
    grams, didx = _word_ngrams_batch(texts, n)
    got = {}
    for g, d in zip(grams, didx):
        got.setdefault(int(d), set()).add(g)
    for i, t in enumerate(texts):
        assert got.get(i, set()) == _ngrams_ref(t, n), i
    # per-doc distinct: no (doc, gram) pair appears twice
    assert len(grams) == len({(int(d), g) for d, g in zip(didx, grams)})


def test_planted_contamination_flagged_exactly(ray_session):
    bench = _docs([(0, "the quick brown fox jumps"),
                   (20, "pack my box with five dozen jugs")])
    train = _docs([
        (1, "a quick brown fox ran away"),        # shares 'quick brown fox'
        (2, "my box with five dozen jugs of ale"  # shares 3 benchmark grams
        ), (3, "completely unrelated words here"),
        (4, "the quick brown fox jumps the quick brown fox jumps"),  # dup grams count once
    ])
    out = decontaminate(train, bench, n=3).to_pandas()
    got = dict(zip(out["doc_id"], out["n_contaminated"]))
    assert got == {1: 1, 2: 4, 4: 3}
    # 2: 'my box with','box with five','with five dozen','five dozen jugs'
    # 4: the 3 distinct grams of the 5-word benchmark doc, each counted once


def test_no_benchmark_or_no_overlap_empty(ray_session):
    train = _docs([(1, "alpha beta gamma delta")])
    out = decontaminate(train, _docs([(0, "x y")]), n=3)
    # Ray to_pandas() drops columns on an empty dataset — check the schema
    assert out.schema().names == ["doc_id", "n_contaminated"]
    assert out.count() == 0
    out2 = decontaminate(train, _docs([(0, "zz yy xx ww")]), n=3).to_pandas()
    assert len(out2) == 0


def test_benchmark_set_is_distinct_sorted(ray_session):
    bench = _docs([(0, "a b c a b c"), (20, "b c d")], blocks=2)
    grams = benchmark_ngram_set(bench, n=2)
    assert list(grams) == ["a b", "b c", "c a", "c d"]


def test_scorer_accepts_plain_array(ray_session):
    """The broadcast ref can be a raw array in unit scope (no ray.put)."""
    s = ContaminationScorer(np.array(["a b c"], object), n=3)
    out = s(pa.table({"doc_id": pa.array([7], pa.int64()),
                      "text": pa.array(["x a b c y"], pa.string())}))
    assert out.to_pydict() == {"doc_id": [7], "n_contaminated": [1]}


# ---------------------------------------------------------------------------
# unigram LM scoring (same tokenization family as decontamination)
# ---------------------------------------------------------------------------

def test_unigram_logprob_hand_computed(ray_session):
    from kafka_connect_s3_ray.functions.text import unigram_logprob

    # corpus: tokens a a a b  -> p(a)=3/4, p(b)=1/4
    docs = _docs([(1, "a a a"), (2, "b"), (3, None), (4, "   ")])
    out = unigram_logprob(docs).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    import math
    assert out["mean_logprob"][0] == round(math.log(3 / 4), 6)
    assert out["mean_logprob"][1] == round(math.log(1 / 4), 6)
    assert out["mean_logprob"].isna()[2] and out["mean_logprob"].isna()[3]


def test_unigram_scorer_rejects_oov(ray_session):
    import numpy as np
    import pytest as _pt

    from kafka_connect_s3_ray.functions.text import UnigramLogProb

    s = UnigramLogProb((np.array(["a"], object), np.array([2.0])))
    with _pt.raises(ValueError, match="missing from the LM"):
        s(pa.table({"doc_id": pa.array([1], pa.int64()),
                    "text": pa.array(["a z"], pa.string())}))


# ---------------------------------------------------------------------------
# interpolated bigram LM scoring
# ---------------------------------------------------------------------------

def test_bigram_logprob_hand_computed(ray_session):
    import math

    from kafka_connect_s3_ray.functions.text import bigram_logprob

    # corpus: doc1 = "a b a b", doc2 = "a"; unigrams a:3 b:2 T=5
    # bigrams: (a,b):2 (b,a):1; ctx(a)=2 ctx(b)=1
    docs = _docs([(1, "a b a b"), (2, "a"), (3, None)])
    out = bigram_logprob(docs, lam=0.7).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    lam = 0.7
    p_ab = lam * (2 / 2) + (1.0 - lam) * (2 / 5)   # p(b|a)
    p_ba = lam * (1 / 1) + (1.0 - lam) * (3 / 5)   # p(a|b)
    d1 = (math.log(3 / 5) + math.log(p_ab) + math.log(p_ba)
          + math.log(p_ab)) / 4
    assert out["mean_logprob"][0] == round(d1, 6)
    assert out["mean_logprob"][1] == round(math.log(3 / 5), 6)  # unigram only
    assert out["mean_logprob"].isna()[2]


def test_bigram_scorer_rejects_missing_pairs(ray_session):
    import numpy as np
    import pytest as _pt

    from kafka_connect_s3_ray.functions.text import BigramLogProb

    # LM knows tokens a,b and only the pair (a,a) -> code 0*2+0 = 0
    s = BigramLogProb((np.array(["a", "b"], object), np.array([2.0, 1.0]),
                       np.array([0], np.int64), np.array([1.0]),
                       np.array([1.0, 0.0])))
    with _pt.raises(ValueError, match="pairs missing"):
        s(pa.table({"doc_id": pa.array([1], pa.int64()),
                    "text": pa.array(["a b"], pa.string())}))


def test_bigram_counts_cross_doc_boundary_free(ray_session):
    from kafka_connect_s3_ray.functions.text import corpus_bigram_counts

    # "x" | "y" in separate docs must NOT create the (x, y) pair
    docs = _docs([(1, "x"), (2, "y"), (3, "x y")])
    bi = corpus_bigram_counts(docs).sort_values(
        ["prev", "tok"]).reset_index(drop=True)
    assert bi.to_dict("records") == [{"prev": "x", "tok": "y", "n": 1}]
