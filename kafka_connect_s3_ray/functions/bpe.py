"""Distributed BPE tokenizer: train merges over the corpus, encode per doc —
the "train your own tokenizer on the data you just curated" step of an LLM
data pipeline (Sennrich et al. ACL'16; the word-histogram formulation is the
one HuggingFace tokenizers trains with).

Scale shape — the insight that makes BPE training cheap at 100 TB:
merge decisions depend ONLY on the distinct-word histogram, never on the
corpus layout. So:

  1. ONE distributed word-count pass (the same `_token_count_partial`
     exchange every vocabulary consumer shares: per-block np.unique
     partials, one token-hash bucket exchange of (word, count) rows — counts
     cross the wire, never text; vocabulary is sublinear in corpus size by
     Heaps' law);
  2. the merge loop runs ON THE DRIVER over that bounded histogram with
     incremental pair-count maintenance (each merge touches only the words
     that contain the pair — an inverted pair->words index, not a rescan);
  3. encoding broadcasts the rank table once (`ray.put`, resolved per
     actor) and streams zero-shuffle; a per-actor word->tokens cache makes
     the amortized cost per REPEATED word a dict probe (Zipf makes that the
     common case).

Determinism contract (what the reference-implementation pytest pins): ties
on pair count break on the lexicographically SMALLEST pair, so train is a
pure function of the histogram; encode applies merges by rank, lowest
first (the standard greedy BPE apply).

Reference analog: none in sugarcrm/kafka-connect-s3 (opaque bytes); this
extends SURVEY §2's token-counting tier (`functions/text.py:33`) from
counting to learned subword segmentation.
"""

from __future__ import annotations

from itertools import chain

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

EOW = "</w>"  # end-of-word marker, attached to a word's final symbol


def _word_symbols(word: str) -> tuple[str, ...]:
    return tuple(word[:-1]) + (word[-1] + EOW,)


def bpe_train_from_counts(word_counts: "pd.DataFrame | dict[str, int]",
                          num_merges: int = 200,
                          min_count: int = 1) -> list[tuple[str, str]]:
    """The driver-side merge loop over a (word -> count) histogram.

    Incremental: ``pair_counts`` and an inverted pair -> {word ids} index
    are maintained across merges, so each iteration costs O(words containing
    the merged pair), not O(vocabulary). Stops early when no pair remains
    (fully merged vocabulary). Ties break on the lexicographically smallest
    (a, b) pair — full determinism from the histogram alone."""
    if isinstance(word_counts, dict):
        items = sorted(word_counts.items())
    else:
        df = word_counts.sort_values(word_counts.columns[0])
        items = list(zip(df.iloc[:, 0], df.iloc[:, 1]))
    words: list[list[str]] = []
    weights: list[int] = []
    for w, c in items:
        if w and int(c) >= min_count:
            words.append(list(_word_symbols(w)))
            weights.append(int(c))

    pair_counts: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[int]] = {}
    for wi, syms in enumerate(words):
        cnt = weights[wi]
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + cnt
            where.setdefault((a, b), set()).add(wi)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        best = None
        for p, c in pair_counts.items():
            if c <= 0:
                continue
            if best is None or c > best[1] or (c == best[1] and p < best[0]):
                best = (p, c)
        if best is None:
            break
        (a, b), _c = best
        merged = a + b
        merges.append((a, b))
        from collections import Counter

        for wi in sorted(where.get((a, b), ())):
            syms = words[wi]
            cnt = weights[wi]
            i = 0
            out: list[str] = []
            while i < len(syms):  # greedy left-to-right (standard BPE apply)
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            # pair-count delta = after-pairs minus before-pairs (exact even
            # for overlapping/adjacent occurrences, where local neighbour
            # bookkeeping mis-credits freshly merged symbols)
            delta = Counter(zip(out, out[1:]))
            delta.subtract(Counter(zip(syms, syms[1:])))
            for p, d in delta.items():
                if d:
                    pair_counts[p] = pair_counts.get(p, 0) + d * cnt
                    if d > 0:
                        # `where` may keep stale members (word later loses the
                        # pair) — harmless: the merge pass is a no-op there
                        where.setdefault(p, set()).add(wi)
            words[wi] = out
        pair_counts.pop((a, b), None)
        where.pop((a, b), None)
    return merges


def bpe_train(docs: "ray.data.Dataset", text_col: str = "text",
              num_merges: int = 200, min_count: int = 1,
              n_buckets: int = 32) -> list[tuple[str, str]]:
    """Distributed word histogram (one bucket exchange), driver merge loop."""
    from .text import corpus_token_counts

    wc = corpus_token_counts(docs, text_col=text_col, n_buckets=n_buckets)
    return bpe_train_from_counts(wc[["token", "n"]], num_merges=num_merges,
                                 min_count=min_count)


class BPEEncoder:
    """Actor-pool stage: doc text -> (doc_id, n_words, n_bpe_tokens).

    The rank table resolves from the object store once per actor; encoding
    a word is the standard greedy lowest-rank merge, memoized per actor
    (Zipf: the overwhelming share of word OCCURRENCES hit the cache).
    Zero shuffle; NULL/empty docs encode to 0 tokens."""

    def __init__(self, merges_ref, text_col: str = "text",
                 id_col: str = "doc_id"):
        merges = (ray.get(merges_ref)
                  if isinstance(merges_ref, ray.ObjectRef) else merges_ref)
        self.ranks = {tuple(p): i for i, p in enumerate(merges)}
        self.text_col, self.id_col = text_col, id_col
        self.cache: dict[str, int] = {}

    def encode_word(self, word: str) -> tuple[str, ...]:
        syms = list(_word_symbols(word))
        while len(syms) > 1:
            best_rank, best_i = None, -1
            for i, p in enumerate(zip(syms, syms[1:])):
                r = self.ranks.get(p)
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        return tuple(syms)

    def _n_tokens(self, word: str) -> int:
        n = self.cache.get(word)
        if n is None:
            n = len(self.encode_word(word))
            self.cache[word] = n
        return n

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column(self.id_col), pa.int64()).to_numpy(
            zero_copy_only=False)
        toks = [("" if x is None else x).lower().split()
                for x in batch.column(self.text_col).to_pylist()]
        n_words = np.fromiter((len(t) for t in toks), np.int64, len(toks))
        n_bpe = np.fromiter(
            (sum(self._n_tokens(w) for w in t) for t in toks),
            np.int64, len(toks))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n_words": pa.array(n_words, pa.int64()),
                         "n_bpe_tokens": pa.array(n_bpe, pa.int64())})


def bpe_token_counts(docs: "ray.data.Dataset", text_col: str = "text",
                     id_col: str = "doc_id", num_merges: int = 200,
                     min_count: int = 1,
                     concurrency: int = 2) -> "ray.data.Dataset":
    """Train on the corpus, encode the corpus: per-doc subword token counts
    under a tokenizer learned from the same data (the pre-training
    token-budget accounting pass)."""
    merges = bpe_train(docs, text_col=text_col, num_merges=num_merges,
                       min_count=min_count)
    ref = ray.put(merges)
    return docs.map_batches(
        BPEEncoder, fn_constructor_args=(ref, text_col, id_col),
        batch_format="pyarrow", concurrency=(1, max(1, concurrency)))
