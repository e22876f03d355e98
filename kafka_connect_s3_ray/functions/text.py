"""Text-analysis stages for large-scale training-data pipelines: token
counting, quality scoring, language ID, document fingerprinting.

All hot-path work is vectorized (pyarrow.compute string kernels / pandas str
ops); stages needing compiled state (regexes, stopword tables) are callable
classes so `map_batches(Cls, concurrency=N)` builds the state once per actor
(reference analog ST3: per-file reader instances holding buffers,
common/.../DelimitedRecordReader.java:21-39).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# Small per-language stopword profiles for the n-gram/stopword language-ID
# heuristic. Public knowledge (common function words).
_LANG_STOPWORDS: dict[str, set[str]] = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for", "with", "as", "was"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "los", "las", "por", "con", "para"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "von", "zu", "den"},
    "fr": {"le", "la", "les", "de", "des", "et", "un", "une", "est", "que", "pour", "dans"},
    "it": {"il", "la", "di", "che", "e", "un", "una", "per", "con", "del", "sono", "non"},
}

TOKEN_REGEX = r"\w+|[^\w\s]"  # BPE-ish: words plus standalone punctuation


def add_token_counts(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Vectorized token counting: whitespace tokens (``n_tokens_ws``) and
    word+punctuation tokens (``n_tokens``) via Arrow regex-count kernels."""
    text = batch.column(text_col)
    ws = pc.count_substring_regex(text, r"\S+")
    bpe = pc.count_substring_regex(text, TOKEN_REGEX)
    batch = batch.append_column("n_tokens_ws", pc.cast(ws, pa.int64()))
    return batch.append_column("n_tokens", pc.cast(bpe, pa.int64()))


def add_quality_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality-scoring features: length, punctuation ratio, digit ratio,
    uppercase ratio, mean word length, stopword ratio (en) — all Arrow/numpy
    kernels, no Python per row."""
    text = batch.column(text_col)
    n_chars = pc.cast(pc.utf8_length(text), pa.float64())
    safe_chars = pc.max_element_wise(n_chars, pa.scalar(1.0))
    n_punct = pc.cast(pc.count_substring_regex(text, r"[^\w\s]"), pa.float64())
    n_digit = pc.cast(pc.count_substring_regex(text, r"\d"), pa.float64())
    n_upper = pc.cast(pc.count_substring_regex(text, r"[A-Z]"), pa.float64())
    n_ws = pc.cast(pc.count_substring_regex(text, r"\S+"), pa.float64())
    safe_ws = pc.max_element_wise(n_ws, pa.scalar(1.0))
    stop_pat = r"\b(" + "|".join(sorted(_LANG_STOPWORDS["en"])) + r")\b"
    n_stop = pc.cast(pc.count_substring_regex(text, stop_pat), pa.float64())
    batch = batch.append_column("len_chars", pc.cast(n_chars, pa.int64()))
    batch = batch.append_column("n_punct", pc.cast(n_punct, pa.int64()))
    batch = batch.append_column("n_digit", pc.cast(n_digit, pa.int64()))
    batch = batch.append_column("punct_ratio", pc.divide(n_punct, safe_chars))
    batch = batch.append_column("digit_ratio", pc.divide(n_digit, safe_chars))
    batch = batch.append_column("upper_ratio", pc.divide(n_upper, safe_chars))
    # non-whitespace chars / tokens — subtracting (tokens - 1) would count
    # every EXTRA separator char (double spaces, newlines) as word length
    n_space = pc.cast(pc.count_substring_regex(text, r"\s"), pa.float64())
    batch = batch.append_column(
        "mean_word_len", pc.divide(pc.subtract(n_chars, n_space), safe_ws)
    )
    return batch.append_column("stopword_ratio", pc.divide(n_stop, safe_ws))


class LanguageId:
    """Stopword-profile language-ID heuristic as an actor-pool stage: profiles
    compiled once per actor in ``__init__``, batches scored vectorized via one
    regex-count per language."""

    def __init__(self, languages: list[str] | None = None):
        langs = languages or sorted(_LANG_STOPWORDS)
        self.patterns = {
            lang: r"\b(" + "|".join(sorted(_LANG_STOPWORDS[lang])) + r")\b"
            for lang in langs
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = pc.utf8_lower(batch.column("text"))
        n_ws = pc.max_element_wise(
            pc.cast(pc.count_substring_regex(text, r"\S+"), pa.float64()), pa.scalar(1.0)
        ).to_numpy(zero_copy_only=False)
        scores = np.stack(
            [
                pc.cast(pc.count_substring_regex(text, pat), pa.float64())
                .to_numpy(zero_copy_only=False)
                for pat in self.patterns.values()
            ]
        ) / n_ws
        langs = np.array(list(self.patterns))
        best = scores.argmax(axis=0)
        pred = langs[best].astype(object)
        pred[scores.max(axis=0) < 0.03] = "und"  # no profile matched
        # null text -> 'und' explicitly (NaN scores would otherwise argmax to
        # index 0); mirrored by the generated oracle SQL
        null_mask = pc.is_null(batch.column("text")).to_numpy(zero_copy_only=False)
        if null_mask.any():
            pred[null_mask] = "und"
        return batch.append_column("lang_pred", pa.array(pred, pa.string()))


def add_fingerprint(batch: pa.Table, text_col: str = "text", trim: bool = True) -> pa.Table:
    """Content fingerprint = md5 of the lowercased (optionally
    whitespace-trimmed) text (DuckDB-reproducible for the oracle check; used as
    the exact-dedup key)."""
    text = pc.utf8_lower(batch.column(text_col))
    if trim:
        text = pc.utf8_trim_whitespace(text)
    # NULL text -> NULL fingerprint (md5(NULL) is NULL in SQL); mapping it to
    # md5('') would merge null-text docs with genuinely empty ones
    fp = [None if s is None else hashlib.md5(s.encode()).hexdigest()
          for s in text.to_pylist()]
    return batch.append_column("fingerprint", pa.array(fp, pa.string()))


def rolling_hash_fingerprint(batch: pa.Table, text_col: str = "text",
                             window: int = 8) -> pa.Table:
    """Polynomial rolling-hash document fingerprint (numpy-vectorized per doc):
    min of rolling window hashes over the byte sequence — a cheap shift-robust
    signature (winnowing-style). Non-SQL; rows-only oracle."""
    out = np.zeros(len(batch), dtype=np.uint64)
    texts = batch.column(text_col).to_pylist()
    B = np.uint64(1000003)
    powers = B ** np.arange(window, dtype=np.uint64)
    for i, t in enumerate(texts):
        b = np.frombuffer((t or "").encode(), dtype=np.uint8).astype(np.uint64)
        if len(b) < window:
            out[i] = (b * powers[: len(b)]).sum() if len(b) else 0
            continue
        win = np.lib.stride_tricks.sliding_window_view(b, window)
        out[i] = (win * powers).sum(axis=1).min()
    return batch.append_column("rolling_fp", pa.array(out, pa.uint64()))


def _token_count_partial(text_col: str, n_buckets: int):
    """The shared per-block token-count partial (tokenize lowercase
    whitespace, np.unique to distinct tokens + counts, stable hash bucket) —
    ONE tokenization contract for every vocabulary consumer (top_k_tokens,
    corpus_token_counts, and the oracle SQL generated from it). Python
    str.split() and the oracles' RE2 ``\\s+`` agree on ASCII whitespace;
    exotic Unicode whitespace (NBSP, thin space, vertical tab) would split
    differently — the fixtures are ASCII-spaced, and any non-ASCII corpus
    should normalize whitespace upstream."""
    from .dedup import _stable_token_hash

    def partial(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        flat = " ".join(x or "" for x in texts).lower().split()
        if not flat:
            return pa.table({"token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int64())})
        uniq, counts = np.unique(np.array(flat, object), return_counts=True)
        bucket = (_stable_token_hash(uniq) % np.uint64(n_buckets)).astype(np.int64)
        return pa.table({"token": pa.array(uniq, pa.string()),
                         "n": pa.array(counts.astype(np.int64), pa.int64()),
                         "bucket": pa.array(bucket, pa.int64())})

    return partial


def top_k_tokens(ds, text_col: str = "text", k: int = 20,
                 n_buckets: int = 32) -> pd.DataFrame:
    """EXACT global top-k vocabulary (most frequent whitespace tokens,
    lowercased) without a per-token global shuffle.

    Three bounded stages: (1) each block collapses to its DISTINCT tokens
    with partial counts (np.unique — block output is vocabulary-sized, not
    token-sized); (2) tokens co-locate by hash bucket and each bucket sums
    its partials and keeps ITS top-k — exact, because a token lives in
    exactly one bucket, so the global top-k is a subset of the union of
    per-bucket top-ks; (3) the driver merges <= n_buckets * k tiny rows.
    Ties break by token ascending at every stage so the result is
    deterministic and matches the SQL oracle's ORDER BY n DESC, token."""
    partial = _token_count_partial(text_col, n_buckets)

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("token", as_index=False)["n"].sum()
        s = s.sort_values(["n", "token"], ascending=[False, True], kind="mergesort")
        return s.head(k)[["token", "n"]]

    tops = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(bucket_topk, batch_format="pandas")
            .to_pandas())  # <= n_buckets * k rows
    tops = tops.sort_values(["n", "token"], ascending=[False, True],
                            kind="mergesort").head(k)
    return tops.reset_index(drop=True)


# ---------------------------------------------------------------------------
# regex redaction (PII scrubbing)
# ---------------------------------------------------------------------------

# Default PII rules, applied IN ORDER (order matters: an earlier replacement
# can consume text a later pattern would have matched, in both engines).
# RE2 syntax only — pyarrow's replace_substring_regex and DuckDB's
# regexp_replace both run RE2, which is what makes the scrub SQL-replayable.
PII_RULES: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<ID>"),                      # SSN-shaped
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),                # IPv4-shaped
    (r"\+?\d[\d\s().-]{7,}\d", "<PHONE>"),                   # phone-shaped
]


def regex_redact(batch: pa.Table, rules: list[tuple[str, str]] | None = None,
                 text_col: str = "text", out_col: str | None = None,
                 count_col: str = "n_redactions") -> pa.Table:
    """Sequentially apply (pattern -> replacement) rules to ``text_col`` and
    count total replacements — the scrub/normalize stage a training-data
    pipeline runs before tokenization (PII removal, boilerplate strip).

    Vectorized end to end: one RE2 count + one RE2 replace kernel pass per
    rule per batch, no per-row Python. Each rule's count is taken on the text
    state AFTER the previous rules applied, mirroring the nested
    regexp_replace stages of the SQL oracle exactly. NULL text stays NULL
    with a NULL count (SQL semantics). Use inside ``map_batches`` — rules are
    plain strings so there is no per-actor state to build."""
    rules = PII_RULES if rules is None else rules
    out_col = text_col if out_col is None else out_col
    t = batch.column(text_col)
    if t.type != pa.string() and t.type != pa.large_string():
        t = pc.cast(t, pa.string())
    total = pa.nulls(len(batch), pa.int64())
    total = pc.if_else(pc.is_valid(t), pa.scalar(0, pa.int64()), total)
    for pattern, repl in rules:
        total = pc.add(total, pc.cast(
            pc.count_substring_regex(t, pattern), pa.int64()))
        t = pc.replace_substring_regex(t, pattern, repl)
    cols = {name: batch.column(name) for name in batch.column_names}
    cols[out_col] = t
    cols[count_col] = total
    return pa.table(cols)


# ---------------------------------------------------------------------------
# TF-IDF top terms per document
# ---------------------------------------------------------------------------

_TF_ROWS = pa.schema([("doc_id", pa.int64()), ("token", pa.string()),
                      ("tf", pa.int64())])


def _n_docs_with_tokens(docs, text_col: str) -> int:
    """Count docs with >= 1 whitespace token (the tf-idf corpus size N) —
    one per-block int back to the driver, never rows."""

    def cnt(t: pa.Table) -> pa.Table:
        s = pc.utf8_trim_whitespace(pc.cast(t.column(text_col), pa.string()))
        ok = pc.and_kleene(pc.is_valid(s), pc.not_equal(s, ""))
        n = pc.sum(pc.cast(ok, pa.int64())).as_py() or 0
        return pa.table({"n": pa.array([int(n)], pa.int64())})

    return sum(r["n"] for r in
               docs.map_batches(cnt, batch_format="pyarrow").take_all())


def tfidf_top_terms(docs, k: int = 3, id_col: str = "doc_id",
                    text_col: str = "text", n_buckets: int = 64,
                    num_partitions: int = 16):
    """Top-k terms per document with tf-idf weights (tfidf = tf * ln(N/df)),
    distributed end to end:

    1. per-batch tokenize (lowercase whitespace split, the same convention
       as ``top_k_tokens`` and its green SQL oracle) -> (doc, token, tf)
       rows via one vectorized pandas groupby — a (doc, token) pair is
       globally unique because a document lives in one input row;
    2. document frequencies WITHOUT a raw-token shuffle: per-block distinct
       tokens with partial counts, summed per token-hash bucket (a token
       lives in exactly one bucket) — the ``top_k_tokens`` pattern;
    3. tf rows join df rows on token through the repo's coarse-bucket
       ``hash_join`` (one exchange, no driver state);
    4. per-doc top-k in doc-hash buckets.

    Ranking is INTEGER-ONLY — tf desc, then df asc (rarer wins), then token
    asc — deliberately not a float tfidf sort: both engines rank on exact
    ints, so a 1-ulp ln() difference between numpy and the SQL oracle can
    never flip which terms are selected. The ranking agrees with tfidf
    whenever terms differ in tf at equal df or in df at equal tf; conflicting
    (higher-tf, commoner) vs (lower-tf, rarer) pairs resolve frequency-first.
    The tfidf value itself is reported for the selected terms (round 6)."""
    from itertools import chain

    from ..stages.joins import hash_join
    from .dedup import _splitmix64_mix, _stable_token_hash

    def tf_rows(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column(id_col), pa.int64()).to_numpy(
            zero_copy_only=False)
        texts = t.column(text_col).to_pylist()
        toks = [("" if x is None else x).lower().split() for x in texts]
        lens = np.fromiter((len(x) for x in toks), np.int64, len(toks))
        if int(lens.sum()) == 0:
            return _TF_ROWS.empty_table()
        flat = np.array(list(chain.from_iterable(toks)), object)
        doc = np.repeat(ids, lens)
        cnt = (pd.DataFrame({"doc_id": doc, "token": flat})
               .groupby(["doc_id", "token"], sort=False)
               .size().reset_index(name="tf"))
        return pa.table({"doc_id": pa.array(cnt["doc_id"], pa.int64()),
                         "token": pa.array(cnt["token"], pa.string()),
                         "tf": pa.array(cnt["tf"], pa.int64())})

    tfr = docs.map_batches(tf_rows, batch_format="pyarrow")

    def df_partial(t: pa.Table) -> pa.Table:
        toks = t.column("token").to_numpy(zero_copy_only=False)
        if len(toks) == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "dfp": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int64())})
        uniq, counts = np.unique(toks.astype(object), return_counts=True)
        bucket = (_stable_token_hash(uniq) % np.uint64(n_buckets)).astype(
            np.int64)
        return pa.table({"token": pa.array(uniq, pa.string()),
                         "dfp": pa.array(counts.astype(np.int64), pa.int64()),
                         "bucket": pa.array(bucket, pa.int64())})

    def df_sum(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("token", as_index=False)["dfp"].sum()
        return s.rename(columns={"dfp": "df"})[["token", "df"]]

    dfd = (tfr.map_batches(df_partial, batch_format="pyarrow")
           .groupby("bucket").map_groups(df_sum, batch_format="pandas"))

    n_docs = _n_docs_with_tokens(docs, text_col)
    joined = hash_join(tfr, dfd, on="token", num_partitions=num_partitions)

    def add_bucket(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (_splitmix64_mix(d) % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("dbucket", pa.array(b))

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "tf", "df", "token"],
                          ascending=[True, False, True, True],
                          kind="mergesort")
        g = g.groupby("doc_id", sort=False).head(k)
        tfidf = g["tf"].to_numpy() * np.log(
            float(n_docs) / g["df"].to_numpy().astype(np.float64))
        return (g.drop(columns=["dbucket"])
                .assign(tfidf=np.round(tfidf, 6)))

    return (joined.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("dbucket").map_groups(topk, batch_format="pandas"))


# ---------------------------------------------------------------------------
# benchmark decontamination (train/eval word-n-gram overlap)
# ---------------------------------------------------------------------------

_DECON_SCHEMA = pa.schema([("doc_id", pa.int64()),
                           ("n_contaminated", pa.int64())])


def _word_ngram_windows(texts: list, n: int) -> tuple[np.ndarray, np.ndarray,
                                                      np.ndarray]:
    """ALL per-doc word n-gram occurrences (lowercase whitespace tokens
    joined by one space) for a whole batch, vectorized: one flat object-array
    join builds every window with n-1 elementwise concats, windows crossing
    doc boundaries are masked (the ``_shingle_sets_batch`` layout). Returns
    (grams, doc_idx, tokens_per_doc) — grams/doc_idx aligned per occurrence
    (duplicates KEPT), tokens_per_doc aligned to ``texts``; docs shorter than
    n words contribute no windows."""
    from itertools import chain

    nd = len(texts)
    toks = [("" if t is None else t).lower().split() for t in texts]
    lens = np.fromiter((len(w) for w in toks), np.int64, nd)
    total = int(lens.sum())
    if total < n:
        return np.empty(0, object), np.empty(0, np.int64), lens
    flat = np.array(list(chain.from_iterable(toks)), object)
    nwin = total - n + 1
    grams = flat[:nwin]
    for j in range(1, n):
        grams = grams + " " + flat[j:j + nwin]
    starts = np.cumsum(lens) - lens
    win_doc = np.repeat(np.arange(nd), lens)[:nwin]
    valid = np.arange(nwin) - starts[win_doc] <= lens[win_doc] - n
    return grams[valid], win_doc[valid], lens


def _word_ngrams_batch(texts: list, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc DISTINCT word n-grams: the occurrence windows of
    ``_word_ngram_windows`` deduped with one pandas drop_duplicates.
    Returns (grams, doc_idx) aligned arrays."""
    grams, win_doc, _ = _word_ngram_windows(texts, n)
    if len(grams) == 0:
        return np.empty(0, object), np.empty(0, np.int64)
    df = pd.DataFrame({"d": win_doc, "g": grams}).drop_duplicates()
    return df["g"].to_numpy(), df["d"].to_numpy()


def benchmark_ngram_set(bench, n: int = 3, text_col: str = "text") -> np.ndarray:
    """Distinct word n-grams of the (SMALL) benchmark/eval corpus — the
    broadcast side of ``decontaminate``. Per-block distinct first, so the
    driver only ever merges vocabulary-sized partials, never token streams;
    a benchmark is eval-set-sized by definition, so the result fits one
    ``ray.put``. Returns a sorted unique string array."""

    def partial(t: pa.Table) -> pa.Table:
        g, _ = _word_ngrams_batch(t.column(text_col).to_pylist(), n)
        u = np.unique(g.astype(str)) if len(g) else np.empty(0, object)
        return pa.table({"g": pa.array(u, pa.string())})

    parts = bench.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return np.empty(0, object)
    return np.unique(parts["g"].to_numpy())


class ContaminationScorer:
    """Actor-pool stage flagging training docs that share >= 1 word n-gram
    with a benchmark set — the train/test decontamination step every
    LLM-data pipeline runs before a corpus ships. The benchmark gram set is
    resolved from the object store ONCE per actor (broadcast pattern: the
    small side never re-ships per batch); membership is one hash-based
    pd.Index probe per batch. Emits (doc_id, n_contaminated) for hits only,
    so output is contamination-sized, not corpus-sized."""

    def __init__(self, bench_ref, n: int = 3, id_col: str = "doc_id",
                 text_col: str = "text"):
        import ray

        grams = ray.get(bench_ref) if isinstance(
            bench_ref, ray.ObjectRef) else bench_ref
        # pd.Index.get_indexer requires uniqueness; benchmark_ngram_set
        # already dedups, but a caller-built array may not — one np.unique
        # here beats an InvalidIndexError deep inside the first batch
        self.index = pd.Index(np.unique(np.asarray(grams, object)))
        self.n, self.id_col, self.text_col = int(n), id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column(self.id_col), pa.int64()).to_numpy(
            zero_copy_only=False)
        g, d = _word_ngrams_batch(batch.column(self.text_col).to_pylist(),
                                  self.n)
        if len(g) == 0 or len(self.index) == 0:
            return _DECON_SCHEMA.empty_table()
        member = self.index.get_indexer(g) >= 0
        hits = np.bincount(d[member], minlength=len(ids)).astype(np.int64)
        keep = hits > 0
        return pa.table({"doc_id": pa.array(ids[keep], pa.int64()),
                         "n_contaminated": pa.array(hits[keep], pa.int64())})


def decontaminate(docs, bench, n: int = 3, id_col: str = "doc_id",
                  text_col: str = "text", concurrency: int = 2):
    """Contamination report for ``docs`` against benchmark corpus ``bench``:
    (doc_id, n_contaminated = count of the doc's DISTINCT word n-grams that
    appear anywhere in the benchmark), rows only for contaminated docs.
    One streaming pass over the training corpus, zero shuffles: the
    benchmark gram set broadcasts via ray.put and each scoring actor
    resolves it once. Dropping the flagged docs is a ``filter``/anti-join
    away; this emits the report so callers can audit before deleting."""
    import ray

    ref = ray.put(benchmark_ngram_set(bench, n=n, text_col=text_col))
    return docs.map_batches(
        ContaminationScorer, batch_format="pyarrow",
        concurrency=(1, max(1, concurrency)),
        fn_constructor_kwargs={"bench_ref": ref, "n": n, "id_col": id_col,
                               "text_col": text_col})


# ---------------------------------------------------------------------------
# unigram language-model scoring (perplexity-style quality filter)
# ---------------------------------------------------------------------------

def corpus_token_counts(docs, text_col: str = "text",
                        n_buckets: int = 32) -> "pd.DataFrame":
    """Global (token, count) table + implicit total — the unigram LM a
    perplexity-style quality filter scores against. Same two bounded stages
    as ``top_k_tokens``: per-block distinct tokens with partial counts, then
    per-bucket exact sums (a token lives in one bucket); the driver collects
    the vocabulary-sized result (every count, not a top-k — the LM needs the
    full support). Vocabulary is sublinear in corpus size (Heaps' law); at a
    scale where it outgrows the driver, score against a pruned LM instead
    (min-count threshold in SQL and engine alike)."""
    partial = _token_count_partial(text_col, n_buckets)

    def bucket_sum(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("token", as_index=False)["n"].sum()

    return (docs.map_batches(partial, batch_format="pyarrow")
            .groupby("bucket").map_groups(bucket_sum, batch_format="pandas")
            .to_pandas())


class UnigramLogProb:
    """Actor-pool stage scoring each doc by the mean natural-log probability
    of its tokens under the corpus unigram LM (token count / total tokens) —
    the perplexity-filter building block (low mean log-prob = far from the
    corpus distribution). The (vocab-sized) LM resolves from the object
    store once per actor; scoring is one hash-index probe + one log pass per
    batch. Token rows (not distinct tokens) are averaged, so a repeated
    token weighs each occurrence, matching SQL ``avg`` over the token rows.
    Docs with no tokens get NULL. Tokens absent from the LM (never when
    scoring the LM's own corpus) raise rather than silently skew."""

    def __init__(self, lm_ref, text_col: str = "text",
                 id_col: str = "doc_id"):
        import ray

        lm = ray.get(lm_ref) if isinstance(lm_ref, ray.ObjectRef) else lm_ref
        tokens, counts = lm
        self.index = pd.Index(tokens)
        if not self.index.is_unique:
            # counts must stay aligned with tokens, so a blind np.unique
            # can't repair this — fail at construction, not mid-batch
            raise ValueError("UnigramLogProb: LM tokens must be unique "
                             "(merge duplicate shards' counts first)")
        self.logp = np.log(counts / counts.sum())
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from itertools import chain

        ids = pc.cast(batch.column(self.id_col), pa.int64()).to_numpy(
            zero_copy_only=False)
        toks = [("" if x is None else x).lower().split()
                for x in batch.column(self.text_col).to_pylist()]
        lens = np.fromiter((len(x) for x in toks), np.int64, len(toks))
        out = np.full(len(ids), np.nan)
        if int(lens.sum()) > 0:
            flat = np.array(list(chain.from_iterable(toks)), object)
            pos = self.index.get_indexer(flat)
            if (pos < 0).any():
                missing = flat[pos < 0][:3]
                raise ValueError(f"UnigramLogProb: tokens missing from the "
                                 f"LM, e.g. {list(missing)!r}")
            doc = np.repeat(np.arange(len(ids)), lens)
            sums = np.bincount(doc, weights=self.logp[pos],
                               minlength=len(ids))
            nz = lens > 0
            out[nz] = sums[nz] / lens[nz]
        # from_pandas=True: NaN (token-less doc) becomes SQL NULL, not a
        # float NaN — avg() over zero rows is NULL in the oracle
        return pa.table({
            self.id_col: pa.array(ids, pa.int64()),
            "mean_logprob": pa.array(np.round(out, 6), pa.float64(),
                                     from_pandas=True)})


def unigram_logprob(docs, text_col: str = "text", id_col: str = "doc_id",
                    concurrency: int = 2):
    """Score every doc against the corpus's own unigram LM: one bounded
    counting pass builds the LM, ``ray.put`` broadcasts it, one streaming
    pass scores. Returns a Dataset of (id_col, mean_logprob) — NULL for
    token-less docs; round-6 floats per the repo's oracle contract.

    The input executes twice (count, then score), so it is materialized
    first: a non-deterministic upstream (sample/shuffle) would otherwise
    produce a second corpus whose unseen tokens trip the OOV guard, and
    even a deterministic one would pay the read twice."""
    import ray

    docs = docs.materialize()
    lm = corpus_token_counts(docs, text_col=text_col)
    lm = lm.sort_values("token").reset_index(drop=True)
    ref = ray.put((lm["token"].to_numpy(object),
                   lm["n"].to_numpy().astype(np.float64)))
    return docs.map_batches(
        UnigramLogProb, batch_format="pyarrow",
        concurrency=(1, max(1, concurrency)),
        fn_constructor_kwargs={"lm_ref": ref, "text_col": text_col,
                               "id_col": id_col})


def corpus_bigram_counts(docs, text_col: str = "text",
                         n_buckets: int = 32) -> "pd.DataFrame":
    """Global (prev, tok, n) bigram table over per-doc token streams — the
    context model a KenLM/CCNet-style interpolated LM scores against. Same
    two bounded stages as ``corpus_token_counts``, keyed by the PAIR: each
    block collapses to its distinct (prev, tok) pairs with partial counts
    (pairs never cross doc boundaries), pairs co-locate by a stable hash of
    the joined pair string, each bucket sums exactly. The driver collects
    the distinct-pair table — sublinear in corpus size for natural text
    (Heaps' law over bigrams); past driver scale, prune by min pair count
    in engine and SQL alike (the documented corpus_token_counts contract)."""
    from .dedup import _stable_token_hash

    def partial(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        prevs: list[str] = []
        toks: list[str] = []
        for x in texts:
            w = ("" if x is None else x).lower().split()
            if len(w) >= 2:
                prevs.extend(w[:-1])
                toks.extend(w[1:])
        if not toks:
            return pa.table({"prev": pa.array([], pa.string()),
                             "tok": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int64())})
        # \x00 can't appear inside a whitespace token, so the joined key is
        # collision-free; np.unique on it gives distinct pairs + counts
        joined = np.array([p + "\x00" + t_ for p, t_ in zip(prevs, toks)],
                          object)
        uniq, first, counts = np.unique(joined, return_index=True,
                                        return_counts=True)
        prev_arr = np.array(prevs, object)[first]
        tok_arr = np.array(toks, object)[first]
        bucket = (_stable_token_hash(uniq)
                  % np.uint64(n_buckets)).astype(np.int64)
        return pa.table({"prev": pa.array(prev_arr, pa.string()),
                         "tok": pa.array(tok_arr, pa.string()),
                         "n": pa.array(counts.astype(np.int64), pa.int64()),
                         "bucket": pa.array(bucket, pa.int64())})

    def bucket_sum(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["prev", "tok"], as_index=False)["n"].sum()

    return (docs.map_batches(partial, batch_format="pyarrow")
            .groupby("bucket").map_groups(bucket_sum, batch_format="pandas")
            .to_pandas())


class BigramLogProb:
    """Actor-pool stage scoring each doc by the mean natural-log probability
    of its tokens under an interpolated bigram LM:
    ``p(t1) = c_uni(t1)/T`` for the doc-initial token and
    ``p(ti|prev) = lam * c_bi(prev,ti)/c_ctx(prev) + (1-lam) * c_uni(ti)/T``
    for the rest, where ``c_ctx(prev)`` is the bigram-context total (the
    count of occurrences of ``prev`` that have a successor) — the
    Jelinek-Mercer smoothing KenLM-class quality filters use. Both LM
    tables resolve from the object store once per actor; scoring is two
    hash-index probes + vectorized float64 math per batch, with the same
    expression shape the generated SQL replays (lam * (bn/cn) +
    (1.0 - lam) * (un/T), then ln). Docs with no tokens get NULL; tokens or
    pairs absent from the LM (never when scoring the LM's own corpus)
    raise rather than silently skew."""

    def __init__(self, lm_ref, lam: float = 0.7, text_col: str = "text",
                 id_col: str = "doc_id"):
        import ray

        lm = ray.get(lm_ref) if isinstance(lm_ref, ray.ObjectRef) else lm_ref
        # pair_code = prev_id * V + tok_id over the unigram vocab — integer
        # keys, so no string-separator collisions and the pair probe is a
        # searchsorted, not a hash build; ctx_n is DENSE (length V)
        uni_tok, uni_n, pair_code, pair_n, ctx_n = lm
        self.uni_index = pd.Index(uni_tok)
        if not self.uni_index.is_unique:
            raise ValueError("BigramLogProb: LM tokens must be unique "
                             "(merge duplicate shards' counts first)")
        if not (np.diff(pair_code) > 0).all():
            raise ValueError("BigramLogProb: pair codes must be strictly "
                             "sorted (merge duplicate shards' counts first)")
        self.uni_n = uni_n.astype(np.float64)
        self.total = float(uni_n.sum())
        self.pair_code = pair_code.astype(np.int64)
        self.pair_n = pair_n.astype(np.float64)
        self.ctx_n = ctx_n.astype(np.float64)
        self.lam = float(lam)
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from itertools import chain

        ids = pc.cast(batch.column(self.id_col), pa.int64()).to_numpy(
            zero_copy_only=False)
        toks = [("" if x is None else x).lower().split()
                for x in batch.column(self.text_col).to_pylist()]
        lens = np.fromiter((len(x) for x in toks), np.int64, len(toks))
        out = np.full(len(ids), np.nan)
        if int(lens.sum()) > 0:
            flat = np.array(list(chain.from_iterable(toks)), object)
            doc = np.repeat(np.arange(len(ids)), lens)
            upos = self.uni_index.get_indexer(flat)
            if (upos < 0).any():
                missing = flat[upos < 0][:3]
                raise ValueError(f"BigramLogProb: tokens missing from the "
                                 f"LM, e.g. {list(missing)!r}")
            p_uni = self.uni_n[upos] / self.total
            lp = np.log(p_uni)  # doc-initial tokens score as unigrams
            # non-initial positions: same doc as the previous flat slot
            has_prev = np.zeros(len(flat), bool)
            if len(flat) > 1:
                has_prev[1:] = doc[1:] == doc[:-1]
            if has_prev.any():
                prev_id = np.empty(len(flat), np.int64)
                prev_id[1:] = upos[:-1]
                pid = prev_id[has_prev]
                codes = pid * np.int64(len(self.uni_index)) + upos[has_prev]
                ppos = np.searchsorted(self.pair_code, codes)
                bad = (ppos >= len(self.pair_code))
                bad |= self.pair_code[np.minimum(
                    ppos, len(self.pair_code) - 1)] != codes
                if bad.any():
                    raise ValueError("BigramLogProb: pairs missing from the "
                                     "LM (score the LM's own corpus, or "
                                     "rebuild the LM)")
                p_bi = self.pair_n[ppos] / self.ctx_n[pid]
                lp[has_prev] = np.log(
                    self.lam * p_bi
                    + (1.0 - self.lam) * p_uni[has_prev])
            sums = np.bincount(doc, weights=lp, minlength=len(ids))
            nz = lens > 0
            out[nz] = sums[nz] / lens[nz]
        return pa.table({
            self.id_col: pa.array(ids, pa.int64()),
            "mean_logprob": pa.array(np.round(out, 6), pa.float64(),
                                     from_pandas=True)})


def bigram_logprob(docs, lam: float = 0.7, text_col: str = "text",
                   id_col: str = "doc_id", concurrency: int = 2):
    """Score every doc against the corpus's own interpolated bigram LM
    (Jelinek-Mercer: lam * bigram + (1-lam) * unigram) — the next tier of
    the CCNet-style perplexity gate above ``unigram_logprob``. Two bounded
    counting passes build the unigram and bigram tables (per-block distinct
    partials, per-bucket exact sums), the driver derives context totals
    from the bigram table (so engine and SQL share one definition), one
    ``ray.put`` broadcasts all three, one streaming pass scores. NULL for
    token-less docs; round-6 floats per the repo's oracle contract.

    Materialized first for the same reason as ``unigram_logprob``: the
    input executes three times (two counting passes + scoring), and a
    non-deterministic upstream would trip the OOV guard."""
    import ray

    docs = docs.materialize()
    uni = corpus_token_counts(docs, text_col=text_col)
    uni = uni.sort_values("token").reset_index(drop=True)
    bi = corpus_bigram_counts(docs, text_col=text_col)
    tok_index = pd.Index(uni["token"].to_numpy(object))
    V = len(tok_index)
    prev_id = tok_index.get_indexer(bi["prev"].to_numpy(object))
    tok_id = tok_index.get_indexer(bi["tok"].to_numpy(object))
    if (prev_id < 0).any() or (tok_id < 0).any():
        raise ValueError("bigram_logprob: bigram members missing from the "
                         "unigram vocabulary (inconsistent counting passes)")
    pair_code = prev_id.astype(np.int64) * V + tok_id
    order = np.argsort(pair_code, kind="stable")
    pair_n = bi["n"].to_numpy().astype(np.float64)[order]
    # dense context totals: count of each token's occurrences WITH a
    # successor = sum of its outgoing bigram counts (one definition the
    # SQL replays)
    ctx_n = np.bincount(prev_id, weights=bi["n"].to_numpy(), minlength=V)
    ref = ray.put((uni["token"].to_numpy(object),
                   uni["n"].to_numpy().astype(np.float64),
                   pair_code[order], pair_n, ctx_n.astype(np.float64)))
    return docs.map_batches(
        BigramLogProb, batch_format="pyarrow",
        concurrency=(1, max(1, concurrency)),
        fn_constructor_kwargs={"lm_ref": ref, "lam": lam,
                               "text_col": text_col, "id_col": id_col})


def repetition_top_ngram(batch: pa.Table, n: int = 2, id_col: str = "doc_id",
                         text_col: str = "text") -> pa.Table:
    """Per-doc repetition signal (the Gopher-style "fraction of characters
    in the most frequent word n-gram" quality gate, Rae et al. 2021 §A1.1):
    for every doc with >= n whitespace tokens, find the most frequent word
    n-gram (ties -> lexicographically smallest, so the result is
    deterministic) and report how much of the doc's word mass it covers.

    Emits (id_col, n_words, top_ngram, top_ngram_count, top_ngram_char_frac)
    where char_frac = gram_chars * count / total_word_chars — an exact
    integer ratio evaluated in float64, so the DuckDB oracle reproduces it
    bit-for-bit without rounding (the quality_stats contract). Docs shorter
    than n tokens emit nothing (SQL drops them the same way).

    Pure per-batch kernel: a doc lives in one row, so this needs NO shuffle —
    one streaming map_batches pass at any corpus size. Tokenization is the
    repo-wide lowercase ``str.split()`` convention (ASCII-whitespace parity
    with the oracles' RE2 ``\\s+``; see _token_count_partial)."""
    texts = batch.column(text_col).to_pylist()
    grams, win_doc, lens = _word_ngram_windows(texts, n)
    out_schema = pa.schema([
        pa.field(id_col, batch.schema.field(id_col).type),
        pa.field("n_words", pa.int64()),
        pa.field("top_ngram", pa.string()),
        pa.field("top_ngram_count", pa.int64()),
        pa.field("top_ngram_char_frac", pa.float64()),
    ])
    if len(grams) == 0:
        return out_schema.empty_table()
    df = pd.DataFrame({"d": win_doc, "g": grams})
    c = df.groupby(["d", "g"], sort=False).size().reset_index(name="cnt")
    c = c.sort_values(["d", "cnt", "g"], ascending=[True, False, True],
                      kind="stable")
    top = c.drop_duplicates("d")
    d_idx = top["d"].to_numpy()
    # total word chars per doc: one flat pass over all tokens (the gram
    # strings count their n-1 joining spaces, subtracted below)
    tok_chars = np.zeros(len(texts), np.int64)
    for i, t in enumerate(texts):
        if t:
            toks = t.lower().split()
            tok_chars[i] = sum(map(len, toks))
    gram_chars = top["g"].str.len().to_numpy() - (n - 1)
    cnt = top["cnt"].to_numpy().astype(np.int64)
    frac = (gram_chars * cnt).astype(np.float64) / tok_chars[d_idx]
    return pa.table({
        id_col: batch.column(id_col).take(pa.array(d_idx)),
        "n_words": pa.array(lens[d_idx], pa.int64()),
        "top_ngram": pa.array(top["g"].to_numpy(), pa.string()),
        "top_ngram_count": pa.array(cnt, pa.int64()),
        "top_ngram_char_frac": pa.array(frac, pa.float64()),
    }, schema=out_schema)


def pmi_pairs(docs, window: int = 5, min_count: int = 10, k: int = 20,
              text_col: str = "text", n_buckets: int = 64) -> pa.Table:
    """Top-k word pairs by pointwise mutual information over within-window
    co-occurrence (collocation mining / tokenizer-merge candidates):
    PMI(u, v) = ln((c_uv / C) * T^2 / (c_u * c_v)) with c_uv the count of
    UNORDERED pairs (lexicographic normalization) at forward distance
    < window inside one doc, C total such pairs, T total tokens.

    Distribution: per-block vectorized pair expansion (window-1 shifted
    compares over the flat token array — no per-pair Python) collapses to
    per-block (u, v, partial count) rows; a pair-hash bucket exchange sums
    them exactly (a pair lives in one bucket); the driver sees ONLY pairs
    with c_uv >= min_count (<= C/min_count rows) plus one total per bucket,
    and computes PMI + the k-cut there. Unigram counts reuse
    ``corpus_token_counts`` (vocab-sized, Heaps-law bounded). Ranking is on
    the 6 dp-rounded PMI with (u, v) tiebreak — the oracle's exact key."""
    from itertools import chain

    from .dedup import _stable_token_hash

    out_schema = {"u": pa.string(), "v": pa.string(),
                  "pair_count": pa.int64(), "pmi": pa.float64()}
    tok = corpus_token_counts(docs, text_col)
    if tok.empty:  # zero tokens in the corpus: the oracle's empty set
        return pa.table({n: pa.array([], t) for n, t in out_schema.items()})
    T = float(tok["n"].sum())
    cnt_of = dict(zip(tok["token"], tok["n"].astype(np.float64)))

    def pair_partial(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        toks = [("" if x is None else x).lower().split() for x in texts]
        lens = np.fromiter((len(x) for x in toks), np.int64, len(toks))
        empty = pa.table({"u": pa.array([], pa.string()),
                          "v": pa.array([], pa.string()),
                          "c": pa.array([], pa.int64()),
                          "bucket": pa.array([], pa.int64())})
        if int(lens.sum()) < 2:
            return empty
        flat = np.array(list(chain.from_iterable(toks)), object)
        # int codes ordered like the strings (np.unique sorts), so the
        # swap-normalization compares int64s — no per-pair Python compare
        uniq, codes = np.unique(flat, return_inverse=True)
        doc = np.repeat(np.arange(len(toks)), lens)
        us, vs = [], []
        for d in range(1, window):
            if d >= len(codes):
                break
            a, b = codes[:-d], codes[d:]
            m = doc[:-d] == doc[d:]
            if m.any():
                a, b = a[m], b[m]
                us.append(np.minimum(a, b))
                vs.append(np.maximum(a, b))
        if not us:
            return empty
        df = pd.DataFrame({"u": np.concatenate(us), "v": np.concatenate(vs)})
        c = df.groupby(["u", "v"], sort=False).size().reset_index(name="c")
        cu = uniq[c["u"].to_numpy()]
        cv = uniq[c["v"].to_numpy()]
        key = np.array([a + "\x00" + b for a, b in zip(cu, cv)], object)
        bucket = (_stable_token_hash(key) % np.uint64(n_buckets)).astype(
            np.int64)
        return pa.table({"u": pa.array(cu, pa.string()),
                         "v": pa.array(cv, pa.string()),
                         "c": pa.array(c["c"], pa.int64()),
                         "bucket": pa.array(bucket, pa.int64())})

    def bucket_sum(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["u", "v"], as_index=False)["c"].sum()
        total = int(s["c"].sum())          # C contribution incl. rare pairs
        s = s[s["c"] >= min_count]
        return pd.DataFrame({"u": list(s["u"]) + [None],
                             "v": list(s["v"]) + [None],
                             "c": list(s["c"]) + [total],
                             "is_total": [False] * len(s) + [True]})

    rows = (docs.map_batches(pair_partial, batch_format="pyarrow")
            .groupby("bucket").map_groups(bucket_sum, batch_format="pandas")
            .to_pandas())
    if rows.empty:
        return pa.table({n: pa.array([], t) for n, t in out_schema.items()})
    C = float(rows.loc[rows["is_total"], "c"].sum())
    s = rows.loc[~rows["is_total"]].copy()
    if s.empty:
        return pa.table({n: pa.array([], t) for n, t in out_schema.items()})
    ca = s["u"].map(cnt_of).to_numpy(np.float64)
    cb = s["v"].map(cnt_of).to_numpy(np.float64)
    c = s["c"].to_numpy(np.float64)
    s["pmi"] = np.round(np.log((c / C) * T * T / (ca * cb)), 6)
    s = s.sort_values(["pmi", "u", "v"], ascending=[False, True, True],
                      kind="mergesort").head(k)
    return pa.table({"u": pa.array(s["u"], pa.string()),
                     "v": pa.array(s["v"], pa.string()),
                     "pair_count": pa.array(s["c"].astype(np.int64),
                                            pa.int64()),
                     "pmi": pa.array(s["pmi"], pa.float64())})


# ---------------------------------------------------------------------------
# BM25 ranked retrieval
# ---------------------------------------------------------------------------


def _term_tf(t: pa.Table, terms: list[str], text_col: str):
    """Vectorized per-doc term frequencies: flatten lowercase whitespace
    tokens once (Arrow kernel, zero Python per token), then one np.isin +
    bincount per query term. Returns (dl, tf) with dl = exact whitespace
    token count (NULL text -> 0) and tf shape (n_docs, n_terms)."""
    text = pc.fill_null(pc.cast(t.column(text_col), pa.string()), "")
    dl = pc.cast(pc.count_substring_regex(text, r"\S+"), pa.int64()).to_numpy(
        zero_copy_only=False)
    toks = pc.utf8_split_whitespace(pc.utf8_lower(text))
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten().to_numpy(zero_copy_only=False)
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    doc = np.repeat(np.arange(len(dl)), lens)
    tf = np.zeros((len(dl), len(terms)), np.int64)
    # Arrow's split can emit '' fragments around whitespace runs; they never
    # equal a real term, and dl comes from the \S+ count, so they're inert
    for j, term in enumerate(terms):
        hit = flat == term
        if hit.any():
            tf[:, j] = np.bincount(doc[hit], minlength=len(dl))
    return dl, tf


def bm25_search(docs, terms: list[str], k: int = 20, k1: float = 1.2,
                b: float = 0.75, id_col: str = "doc_id",
                text_col: str = "text"):
    """Top-k documents by BM25 score for a fixed term query (Robertson
    formula: idf * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl)) with
    idf = ln(1 + (N - df + .5) / (df + .5)), always positive). Two streaming
    passes, zero exchange: (1) tiny per-block partials (N, sum dl, per-term
    df) merged on the driver; (2) broadcast-stats scoring with a per-block
    top-k partial, merged on the driver (top-k is distributive). Ranking and
    the k-cut run on the 6 dp-ROUNDED score with doc-id tiebreak on BOTH
    engine and oracle, so float noise cannot flip the selection. N counts
    every doc (NULL text scores 0 tokens); zero-score docs are excluded.
    Terms are matched against LOWERCASED tokens, so they are lowercased once
    here (a mixed-case term would silently match nothing)."""
    terms = [t.lower() for t in terms]

    def stats_partial(t: pa.Table) -> pa.Table:
        dl, tf = _term_tf(t, terms, text_col)
        return pa.table({
            "n": pa.array([len(dl)], pa.int64()),
            "sum_dl": pa.array([int(dl.sum())], pa.int64()),
            "df": pa.array([(tf > 0).sum(axis=0).tolist()],
                           pa.list_(pa.int64()))})

    parts = docs.map_batches(stats_partial, batch_format="pyarrow").to_pandas()
    n_docs = int(parts["n"].sum())
    if n_docs == 0:
        raise ValueError("bm25_search: empty corpus")
    avgdl = float(parts["sum_dl"].sum()) / n_docs
    df = np.sum(np.stack([np.asarray(v) for v in parts["df"]]), axis=0)
    idf = np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))

    def score_topk(t: pa.Table) -> pa.Table:
        dl, tf = _term_tf(t, terms, text_col)
        tff = tf.astype(np.float64)
        norm = k1 * (1.0 - b + b * dl.astype(np.float64)[:, None] / avgdl)
        with np.errstate(invalid="ignore"):
            s = np.where(tf > 0, idf * tff * (k1 + 1.0) / (tff + norm), 0.0)
        score = np.round(s.sum(axis=1), 6)
        keep = score > 0.0
        ids = pc.cast(t.column(id_col), pa.int64()).to_numpy(
            zero_copy_only=False)[keep]
        score = score[keep]
        order = np.lexsort((ids, -score))[:k]
        return pa.table({id_col: pa.array(ids[order], pa.int64()),
                         "score": pa.array(score[order], pa.float64())})

    top = docs.map_batches(score_topk, batch_format="pyarrow").to_pandas()
    if top.empty:  # no term matched: Ray's to_pandas drops empty columns
        return pa.table({id_col: pa.array([], pa.int64()),
                         "score": pa.array([], pa.float64())})
    top = top.sort_values(["score", id_col], ascending=[False, True],
                          kind="mergesort").head(k).reset_index(drop=True)
    return pa.table({id_col: pa.array(top[id_col], pa.int64()),
                     "score": pa.array(top["score"], pa.float64())})


def chunk_documents(ds, size: int = 32, stride: int = 24,
                    text_col: str = "text", id_col: str = "doc_id"):
    """RAG/embedding-prep chunking: split each document into overlapping
    whitespace-token windows (``size`` tokens every ``stride``) and emit
    (id, chunk_idx, chunk text, n_tokens). Zero shuffle — one stateless
    vectorized-per-batch pass whose output streams straight to a sink or an
    embedding stage; the per-doc slice loop is inherent to ragged token
    arrays (the pmi_pairs posture), bounded by batch size. Tokenization is
    the engine-wide whitespace contract (Python ``str.split()`` ==
    ``list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')`` on
    ASCII whitespace). NULL and zero-token documents emit nothing (the SQL
    unnest scope). A trailing window shorter than ``size`` IS emitted —
    dropping it would lose the document tail forever, the one thing a
    chunker must not do."""
    if int(size) < 1 or int(stride) < 1:
        raise ValueError(f"size and stride must be >= 1: {size}, {stride}")
    size, stride = int(size), int(stride)

    def chunks(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column(text_col)))
        ids = pc.cast(t.column(id_col), pa.int64()).to_numpy(
            zero_copy_only=False)
        out_id: list = []
        out_ci: list = []
        out_chunk: list = []
        out_n: list = []
        for did, txt in zip(ids, t.column(text_col).to_pylist()):
            toks = txt.split()
            n = len(toks)
            for ci, s in enumerate(range(0, n, stride)):
                piece = toks[s:s + size]
                out_id.append(did)
                out_ci.append(ci)
                out_chunk.append(" ".join(piece))
                out_n.append(len(piece))
        return pa.table({id_col: pa.array(out_id, pa.int64()),
                         "chunk_idx": pa.array(out_ci, pa.int64()),
                         "chunk": pa.array(out_chunk, pa.string()),
                         "n_tokens": pa.array(out_n, pa.int64())})

    return ds.map_batches(chunks, batch_format="pyarrow")


def clean_text(ds, text_col: str = "text", id_col: str = "doc_id"):
    """ASCII-safe text normalization — the deterministic cleaner a curation
    chain starts with: control characters (C0 + DEL) -> space, whitespace
    runs collapsed to one space, edges trimmed, ASCII-only lowercase.
    DELIBERATELY not Unicode lowercase or NFC: Arrow and DuckDB disagree on
    Turkish dotted-I and on composition forms (measured — same glyphs,
    different bytes), so the portable bit-equal contract stops at what RE2
    and the ASCII table guarantee on every engine; non-ASCII passes through
    untouched. Zero shuffle, one vectorized Arrow pass; ``changed`` flags
    rows the cleaner touched (NULL text -> NULL output, changed=false)."""

    def f(t: pa.Table) -> pa.Table:
        s = pc.cast(t.column(text_col), pa.string())
        x = pc.replace_substring_regex(
            s, pattern=r"[\x00-\x1f\x7f]", replacement=" ")
        x = pc.replace_substring_regex(x, pattern=r"\s+", replacement=" ")
        x = pc.utf8_trim_whitespace(x)
        x = pc.ascii_lower(x)
        changed = pc.fill_null(pc.not_equal(x, s), False)
        return pa.table({id_col: pc.cast(t.column(id_col), pa.int64()),
                         "clean": x,
                         "changed": changed})

    return ds.map_batches(f, batch_format="pyarrow")
