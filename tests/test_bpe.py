"""BPE trainer/encoder: equality with an obviously-correct quadratic
reference, hand-computed classics, overlap/adjacency edge cases, tie-break
determinism, distributed == driver histogram, encode contract."""
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from kafka_connect_s3_ray.functions.bpe import (
    BPEEncoder,
    EOW,
    _word_symbols,
    bpe_token_counts,
    bpe_train,
    bpe_train_from_counts,
)


def slow_train(wc: dict, num_merges: int) -> list:
    """Quadratic reference: recount every pair from scratch each merge."""
    words = {w: list(_word_symbols(w)) for w in wc if w}
    merges = []
    for _ in range(num_merges):
        counts = Counter()
        for w, syms in words.items():
            for p in zip(syms, syms[1:]):
                counts[p] += wc[w]
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


def slow_encode(word: str, merges: list) -> tuple:
    syms = list(_word_symbols(word))
    for a, b in merges:  # rank order = training order
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return tuple(syms)


def test_classic_low_lower():
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = bpe_train_from_counts(wc, num_merges=4)
    assert merges == slow_train(wc, 4)
    # the textbook first merges: (e,s) count 9, then (es,t</w>) 9 ...
    assert merges[0] == ("e", "s")


def test_matches_slow_reference_random():
    rng = np.random.default_rng(11)
    alphabet = list("abcdef")
    wc = {}
    for _ in range(120):
        w = "".join(rng.choice(alphabet, size=rng.integers(1, 9)))
        wc[w] = wc.get(w, 0) + int(rng.integers(1, 40))
    got = bpe_train_from_counts(wc, num_merges=60)
    assert got == slow_train(wc, 60)


def test_overlapping_occurrences():
    # 'aaaa' stresses adjacent-merge bookkeeping: (a,a) merges greedily
    # left-to-right, then (aa,aa) etc.
    wc = {"aaaa": 10, "aaab": 3, "baaa": 2}
    got = bpe_train_from_counts(wc, num_merges=8)
    assert got == slow_train(wc, 8)


def test_tiebreak_lexicographic():
    wc = {"ab": 3, "cd": 3}  # (a,b</w>) and (c,d</w>) tie at 3
    merges = bpe_train_from_counts(wc, num_merges=1)
    assert merges == [("a", "b" + EOW)]


def test_min_count_and_early_stop():
    wc = {"xy": 1, "zz": 5}
    merges = bpe_train_from_counts(wc, num_merges=100, min_count=2)
    # only 'zz' survives; it fully merges in one step, then training stops
    assert merges == [("z", "z" + EOW)]


def test_encoder_matches_slow_apply():
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3, "lowest": 4}
    merges = bpe_train_from_counts(wc, num_merges=10)
    enc = BPEEncoder(merges)
    for w in list(wc) + ["unseen", "x", "newestest"]:
        assert enc.encode_word(w) == slow_encode(w, merges), w


def test_distributed_train_equals_histogram_train():
    docs = pa.table({
        "doc_id": pa.array(np.arange(8), pa.int64()),
        "text": pa.array(["low low lower", "newest widest", "low newest",
                          "the newest low", None, "", "widest lower low",
                          "the the the"], pa.string())})
    ds = ray.data.from_arrow(docs).repartition(3)
    got = bpe_train(ds, num_merges=12)
    flat = " ".join(x or "" for x in docs.column("text").to_pylist()).lower().split()
    wc = dict(Counter(flat))
    assert got == bpe_train_from_counts(wc, num_merges=12)


def test_end_to_end_counts():
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["low lower lowest", None, "low"], pa.string())})
    out = (bpe_token_counts(ray.data.from_arrow(docs), num_merges=6)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["n_words"].tolist() == [3, 0, 1]
    assert out.loc[1, "n_bpe_tokens"] == 0
    merges = bpe_train(ray.data.from_arrow(docs), num_merges=6)
    enc = BPEEncoder(merges)
    exp0 = sum(len(enc.encode_word(w)) for w in ["low", "lower", "lowest"])
    assert out.loc[0, "n_bpe_tokens"] == exp0
    assert out.loc[2, "n_bpe_tokens"] == len(enc.encode_word("low"))
