"""Distributed multinomial Naive-Bayes text classification (train + score).

The fastText-style quality/domain/language filter step of an LLM data
pipeline (CCNet, LLaMA, RefinedWeb all gate documents through a linear
bag-of-words classifier): train on a labeled subset, score the whole corpus,
keep/route by predicted class. Multinomial NB with Laplace smoothing is the
classic closed-form member of that family — training is exactly one
token-count aggregation, so it distributes as the engine's vocabulary ops do
(functions/text.py corpus_token_counts) and, unlike SGD models, is
deterministic and SQL-replayable, which is what makes the catalog entry
hash-checkable.

Scale posture:
- TRAIN: per-block (token, label, partial count) rows -> one coarse
  token-hash bucket exchange -> exact per-(token, label) sums; counts cross
  the wire, never token rows. Class priors are O(classes) partial sums.
  The collected model is O(vocab x classes); vocabulary is sublinear in
  corpus size (Heaps' law) and classes are dimension-like (a handful of
  languages/domains/quality tiers — same contract as grouped_heavy_hitters).
  Past driver comfort, prune the vocab with a min-count threshold in engine
  and oracle alike.
- SCORE: the (vocab x classes) log-prob matrix broadcasts once per actor
  via ray.put; scoring is a zero-shuffle streaming map_batches pass —
  tokenize, one vocab-index probe, C bincount folds per batch.

Float contract: log-probs are ln of ratios of exact integers (+alpha), both
engines sum ~doc-length terms in float64 and compare at the repo's round-6 /
rtol 1e-6 contract (the unigram_logprob precedent). Tokens outside the
training vocabulary are IGNORED at scoring time (the SQL join's natural
semantics); a doc with no in-vocab tokens is scored by priors alone.
Tokenization is the engine-wide lowercase whitespace contract
(text._token_count_partial).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def train_nb(docs, text_col: str = "text", label_col: str = "lang",
             alpha: float = 1.0, n_buckets: int = 32) -> dict:
    """Train a multinomial NB model over the labeled Dataset ``docs``.
    Rows with a NULL label or NULL text are excluded from training (the
    oracle's ``WHERE label IS NOT NULL AND text IS NOT NULL``). Returns
    ``{"classes": [..], "vocab": np.ndarray, "logprior": (C,) float64,
    "logprob": (V, C) float64, "alpha": alpha}``."""
    from .dedup import _stable_token_hash

    if alpha <= 0:
        raise ValueError(f"alpha must be positive: {alpha}")

    def partial(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        labels = t.column(label_col).to_pylist()
        toks, labs = [], []
        for txt, lab in zip(texts, labels):
            if txt is None or lab is None:
                continue
            ws = txt.lower().split()
            if ws:
                toks.extend(ws)
                labs.extend([lab] * len(ws))
        # per-class doc counts ride along as token='' rows (never a real
        # token: the tokenizer can't emit an empty string)
        n_docs = pd.Series([lab for txt, lab in zip(texts, labels)
                            if txt is not None and lab is not None],
                           dtype=object).value_counts()
        if not toks and n_docs.empty:
            return pa.table({"token": pa.array([], pa.string()),
                             "label": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int64())})
        df = pd.DataFrame({"token": np.array(toks, object),
                           "label": np.array(labs, object)})
        g = df.groupby(["token", "label"], as_index=False).size()
        g = g.rename(columns={"size": "n"})
        doc_rows = pd.DataFrame({"token": "", "label": n_docs.index.astype(str),
                                 "n": n_docs.to_numpy(np.int64)})
        g = pd.concat([g, doc_rows], ignore_index=True)
        h = _stable_token_hash(g["token"].to_numpy(object))
        bucket = (h % np.uint64(n_buckets)).astype(np.int64)
        return pa.table({"token": pa.array(g["token"], pa.string()),
                         "label": pa.array(g["label"].astype(str), pa.string()),
                         "n": pa.array(g["n"].to_numpy(np.int64), pa.int64()),
                         "bucket": pa.array(bucket, pa.int64())})

    def bucket_sum(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["token", "label"], as_index=False)["n"].sum()

    counts = (docs.map_batches(partial, batch_format="pyarrow")
              .groupby("bucket").map_groups(bucket_sum, batch_format="pandas")
              .to_pandas())
    if counts.empty:  # Ray's empty to_pandas drops columns — guard before use
        raise ValueError("train_nb: no labeled training rows")
    doc_counts = counts[counts["token"] == ""]
    counts = counts[counts["token"] != ""]
    if doc_counts.empty:
        raise ValueError("train_nb: no labeled training rows")
    classes = sorted(doc_counts["label"].unique())
    vocab = np.sort(counts["token"].unique().astype(object))
    cidx = {c: i for i, c in enumerate(classes)}
    n_docs_c = np.zeros(len(classes), np.int64)
    for _, r in doc_counts.iterrows():
        n_docs_c[cidx[r["label"]]] += int(r["n"])
    # (V, C) token counts
    vindex = pd.Index(vocab)
    mat = np.zeros((len(vocab), len(classes)), np.int64)
    vi = vindex.get_indexer(counts["token"].to_numpy(object))
    ci = np.array([cidx[c] for c in counts["label"]], np.int64)
    np.add.at(mat, (vi, ci), counts["n"].to_numpy(np.int64))
    tok_c = mat.sum(axis=0)  # class token totals
    V = len(vocab)
    logprob = np.log((mat + alpha) / (tok_c + alpha * V))
    logprior = np.log(n_docs_c / n_docs_c.sum())
    return {"classes": classes, "vocab": vocab, "logprior": logprior,
            "logprob": logprob, "alpha": alpha}


class NBScorer:
    """Actor-pool scoring stage: the model resolves from the object store
    once per actor; each batch is one vocab-index probe + C bincount folds.
    Emits (id_col, pred, score) with score = round-6 winning log-posterior;
    ties on the ROUNDED score break to the lexicographically smallest class
    on both engines (classes are stored ascending, argmax takes the first
    max). OOV tokens are ignored; token-less docs score by priors alone."""

    def __init__(self, model_ref, text_col: str = "text",
                 id_col: str = "doc_id"):
        import ray

        m = (ray.get(model_ref)
             if isinstance(model_ref, ray.ObjectRef) else model_ref)
        self.classes = np.array(m["classes"], object)
        self.index = pd.Index(m["vocab"])
        self.logprob = m["logprob"]
        self.logprior = m["logprior"]
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from itertools import chain

        ids = batch.column(self.id_col)
        toks = [("" if x is None else x).lower().split()
                for x in batch.column(self.text_col).to_pylist()]
        lens = np.fromiter((len(x) for x in toks), np.int64, len(toks))
        n, C = len(toks), len(self.classes)
        scores = np.tile(self.logprior, (n, 1))
        if int(lens.sum()) > 0:
            flat = np.array(list(chain.from_iterable(toks)), object)
            pos = self.index.get_indexer(flat)
            doc = np.repeat(np.arange(n), lens)
            known = pos >= 0  # OOV tokens are ignored (SQL join semantics)
            pos, doc = pos[known], doc[known]
            for c in range(C):
                scores[:, c] += np.bincount(doc, weights=self.logprob[pos, c],
                                            minlength=n)
        scores = np.round(scores, 6)
        win = np.argmax(scores, axis=1)  # first max = smallest class label
        return pa.table({
            self.id_col: ids,
            "pred": pa.array(self.classes[win], pa.string()),
            "score": pa.array(scores[np.arange(n), win], pa.float64()),
        })


def nb_classify(docs, model: dict, text_col: str = "text",
                id_col: str = "doc_id", concurrency: int = 2):
    """Score ``docs`` with a trained NB model: broadcast once per actor,
    zero-shuffle streaming pass. Returns a Dataset of (id_col, pred, score)."""
    import ray

    ref = ray.put(model)
    return docs.map_batches(
        NBScorer, batch_format="pyarrow",
        concurrency=(1, max(1, concurrency)),
        fn_constructor_kwargs={"model_ref": ref, "text_col": text_col,
                               "id_col": id_col})
