"""Deduplication operators for training-data pipelines.

Exact and near-duplicate detection, all expressed Ray-Data-first:

- exact:      content-hash -> hash-partitioned groupby -> keep first
              (the groupby IS the hash partitioning; no driver-side state)
- MinHash+LSH: shingle -> minhash signature (vectorized numpy) -> band rows
              (flat explode) -> groupby (band, bucket) -> candidate pairs ->
              Jaccard verify. Shuffle volume = docs x bands small ints, never
              the text itself.
- SimHash:    64-bit token-hash sign aggregate -> band buckets -> Hamming
              verify.
- embedding:  random-hyperplane LSH buckets -> within-bucket cosine.

Scale notes: each step is a map_batches (per-batch numpy kernels) plus one
groupby on a small projected table (id + small ints). Pair verification
re-reads only candidate texts via a broadcast lookup when the candidate set is
small (ray.put once), or can be disabled for a pure LSH pass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

_MERSENNE = np.uint64((1 << 61) - 1)


_SM_C1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_C2 = np.uint64(0x94D049BB133111EB)


def _splitmix64_mix(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (xor-shift / multiply avalanche) — mixes the
    low-entropy high bits a short polynomial hash leaves, and is exactly
    reproducible in SQL (HUGEINT mod-2^64 + xor/bit_count), unlike SipHash."""
    with np.errstate(over="ignore"):
        x = (x ^ (x >> np.uint64(30))) * _SM_C1
        x = (x ^ (x >> np.uint64(27))) * _SM_C2
        return x ^ (x >> np.uint64(31))


def _stable_token_hash(tokens: np.ndarray) -> np.ndarray:
    """Deterministic uint64 token hashes: base-257 polynomial over each
    token's utf-8 bytes (mod 2^64) + splitmix64 finalizer.

    Chosen over pandas' fixed-key SipHash so the SimHash pipeline is
    ORACLE-REPRODUCIBLE: DuckDB can evaluate the same polynomial and mixer
    in HUGEINT arithmetic (see queries._simhash_sql). Vectorized with one
    flat byte pass: per-token hash = (S_end - S_start) * 257^-start via
    wraparound prefix sums and the modular inverse of 257 (odd, so
    invertible mod 2^64) — no per-token Python beyond the encode."""
    n = len(tokens)
    if n == 0:
        return np.empty(0, np.uint64)
    bufs = [str(t).encode("utf-8", "ignore") for t in tokens]
    lens = np.fromiter((len(b) for b in bufs), np.int64, n)
    total = int(lens.sum())
    if total == 0:
        return np.zeros(n, np.uint64)
    flat = np.frombuffer(b"".join(bufs), np.uint8).astype(np.uint64)
    inv257 = np.uint64(pow(257, -1, 1 << 64))
    with np.errstate(over="ignore"):
        pows = np.full(total, np.uint64(257))
        pows[0] = 1
        np.multiply.accumulate(pows, out=pows)          # 257^i mod 2^64
        # 257^-start per token (np.power wraps per multiply => correct mod 2^64)
        ipows = inv257 ** (np.cumsum(lens) - lens).astype(np.uint64)
        pref = np.cumsum(flat * pows)                   # wraparound prefix sums
        ends = np.cumsum(lens)
        s_end = pref[ends - 1]
        starts = ends - lens
        s_before = np.where(starts > 0, pref[np.maximum(starts - 1, 0)],
                            np.uint64(0))
        h = (s_end - s_before) * ipows
    h[lens == 0] = 0
    return _splitmix64_mix(h)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(ds: "ray.data.Dataset", id_col: str = "doc_id",
                text_col: str = "text") -> "ray.data.Dataset":
    """Keep the min-id row per distinct (lowercased) text — EXACT, no digest.

    Hash-partitions by a COARSE bucket of a vectorized 64-bit content hash
    (identical texts always co-locate), then groups by the normalized text
    ITSELF inside each bucket — one vectorized idxmin per bucket, so a 64-bit
    hash collision can never merge two distinct documents (at 10^10 docs
    birthday collisions on 64 bits are expected; the oracle-facing
    ``q_dedup_exact`` keeps md5 only for DuckDB parity). NULL texts form
    their own dedup key, distinct from empty/whitespace-only text — the same
    null-distinct contract as add_fingerprint / q_dedup_exact (and SQL
    GROUP BY, which pools NULLs into one group). No per-row Python, no
    global sort, no driver state."""
    import pyarrow.compute as pc

    def norm_coarse(t: pa.Table) -> pa.Table:
        # nulls propagate through lower/trim and hash to their own bucket —
        # never coalesced with ''
        norm = pc.utf8_lower(pc.utf8_trim_whitespace(t.column(text_col)))
        h = pd.util.hash_array(norm.to_numpy(zero_copy_only=False).astype(object))
        t = t.append_column("_norm", norm)
        return t.append_column(
            "coarse", pa.array((h % np.uint64(N_COARSE)).astype(np.int32))
        )

    ds = ds.map_batches(norm_coarse, batch_format="pyarrow")

    def keep_min(g: pd.DataFrame) -> pd.DataFrame:
        keep = g.loc[g.groupby("_norm", dropna=False)[id_col].idxmin()]
        return keep.drop(columns=["_norm", "coarse"])

    return ds.groupby("coarse").map_groups(keep_min, batch_format="pandas")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _shingle_sets_batch(texts: list[str], k: int) -> tuple[np.ndarray, np.ndarray]:
    """Unique-sorted k-shingle hash sets for a WHOLE batch in one vectorized
    pass: all docs' bytes are concatenated, the polynomial window hash is
    computed with k shifted multiply-adds over the flat array (uint64
    wraparound; no (N, k) temp), windows crossing doc boundaries are masked
    out, and per-doc dedup is one lexsort + adjacent-diff. Returns
    (flat_hashes, counts_per_doc) — exactly the layout ``np.minimum.reduceat``
    wants. Replaces a per-doc Python loop that dominated the minhash stage."""
    n = len(texts)
    if n == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    bufs = []
    for t in texts:
        b = (t or "").lower().encode("utf-8", "ignore")
        if len(b) < k:
            b = b + b"\x00" * (k - len(b))
        bufs.append(b)
    lens = np.fromiter((len(b) for b in bufs), np.int64, n)
    flat = np.frombuffer(b"".join(bufs), dtype=np.uint8).astype(np.uint64)
    nwin = len(flat) - k + 1
    coef = np.uint64(257) ** np.arange(k, dtype=np.uint64)
    with np.errstate(over="ignore"):
        h = np.zeros(nwin, np.uint64)
        for j in range(k):  # k passes over the flat array, not a (N, k) temp
            h += flat[j : j + nwin] * coef[j]
    starts = np.cumsum(lens) - lens
    win_doc = np.repeat(np.arange(n), lens)[:nwin]
    valid = np.arange(nwin) - starts[win_doc] <= lens[win_doc] - k
    h, d = h[valid], win_doc[valid]
    order = np.lexsort((h, d))
    hs, ds = h[order], d[order]
    keep = np.ones(len(hs), bool)
    if len(hs) > 1:
        keep[1:] = (ds[1:] != ds[:-1]) | (hs[1:] != hs[:-1])
    hs, ds = hs[keep], ds[keep]
    return hs, np.bincount(ds, minlength=n).astype(np.int64)


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Single-doc convenience over ``_shingle_sets_batch`` (one source of
    truth: the broadcast and partitioned verify paths must produce identical
    sets)."""
    flat, _ = _shingle_sets_batch([text], k)
    return flat


class MinHasher:
    """Actor-pool stage: doc -> minhash signature -> LSH band rows.

    ``__init__`` draws the hash coefficients once per actor from a fixed seed.
    ``__call__`` is vectorized ACROSS the whole batch: all docs' shingle hashes
    are concatenated once, permutations applied as multiply-shift hashing
    (uint64 overflow arithmetic — no modulo) in permutation-chunks bounded to
    ~tens of MB, and per-doc minima taken with ``np.minimum.reduceat`` over the
    doc boundaries. Emits ``bands`` rows per doc: (doc_id, band, bucket); docs
    sharing any (band, bucket) are near-dup candidates."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_k: int = 5,
                 seed: int = 42, id_col: str = "doc_id", text_col: str = "text"):
        assert num_perm % bands == 0
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, np.iinfo(np.uint64).max, size=num_perm,
                              dtype=np.uint64) | np.uint64(1)  # odd multipliers
        self.b = rng.integers(0, np.iinfo(np.uint64).max, size=num_perm,
                              dtype=np.uint64)
        self.num_perm, self.bands, self.k = num_perm, bands, shingle_k
        self.rows_per_band = num_perm // bands
        self.id_col, self.text_col = id_col, text_col

    def sigs_from_sets(self, flat: np.ndarray, lens: np.ndarray) -> np.ndarray:
        """(num_perm, n_docs) minhash signatures from an already-shingled
        batch (``_shingle_sets_batch`` layout) — lets fused pipelines compute
        shingles ONCE and derive both signatures and verify sets from them."""
        n = len(lens)
        if n == 0:
            # reduceat with starts=[0] over a width-0 array raises; an empty
            # block (e.g. a fully-filtered batch) must featurize to empty
            return np.empty((self.num_perm, 0), dtype=np.uint64)
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        sigs = np.empty((self.num_perm, n), dtype=np.uint64)
        chunk = max(1, (16 << 20) // max(1, flat.nbytes))  # ~16 MB per slab
        with np.errstate(over="ignore"):
            for p0 in range(0, self.num_perm, chunk):
                a = self.a[p0 : p0 + chunk, None]
                b = self.b[p0 : p0 + chunk, None]
                h = a * flat[None, :]  # uint64 wraparound = mod 2^64
                # np.add with out= : the (k,1)-broadcast `h + b` / `h += b`
                # spelling takes a ~10x slower strided ufunc path on uint64
                np.add(h, b, out=h)
                sigs[p0 : p0 + chunk] = np.minimum.reduceat(h, starts, axis=1)
        return sigs

    def band_buckets(self, sigs: np.ndarray) -> np.ndarray:
        """(bands * n,) int64 LSH bucket keys — all rows of each band folded
        into one 64-bit key, hashed. Row-major by band (band 0's n docs
        first), matching np.repeat/np.tile emission order."""
        n = sigs.shape[1]
        folded = sigs.reshape(self.bands, self.rows_per_band, n)
        band_key = np.zeros((self.bands, n), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for r in range(self.rows_per_band):  # fold ALL rows of the band
                band_key = band_key * np.uint64(1000003) + folded[:, r, :]
        band_key = np.ascontiguousarray(band_key.ravel())
        return pd.util.hash_array(band_key).view(np.int64)

    def _signatures(self, texts: list[str]) -> np.ndarray:
        """(num_perm, n_docs) minhash signature matrix, fully vectorized —
        including shingle extraction (one batch pass, no per-doc loop)."""
        flat, lens = _shingle_sets_batch(texts, self.k)
        return self.sigs_from_sets(flat, lens)

    def signature(self, text: str) -> np.ndarray:
        return self._signatures([text])[:, 0]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        texts = batch.column(self.text_col).to_pylist()
        n = len(texts)
        if n == 0:
            id_type = batch.schema.field(self.id_col).type
            return pa.table({self.id_col: pa.array([], id_type),
                             "band": pa.array([], pa.int32()),
                             "bucket": pa.array([], pa.int64())})
        buckets = self.band_buckets(self._signatures(texts))  # (bands*n,)
        return pa.table(
            {
                self.id_col: pa.array(np.tile(ids, self.bands)),
                "band": pa.array(np.repeat(np.arange(self.bands, dtype=np.int32), n)),
                "bucket": pa.array(buckets, pa.int64()),
            }
        )


def _pairs_by_bucket(g: pd.DataFrame, id_col: str, bucket_cols: "str | list[str]",
                     cap: int = 64,
                     emit_cols: "list[str] | None" = None) -> pd.DataFrame:
    """All (left < right) id pairs sharing a bucket value — vectorized
    (bucket-size filter + self-merge), no per-bucket Python. ``cap`` drops
    pathological buckets (a bucket of size B emits B^2/2 pairs).
    ``emit_cols`` (a subset of ``bucket_cols``) are carried into the output —
    the broadcast verify path uses the emitting band for its zero-shuffle
    canonical pair dedup."""
    bucket_cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    emit_cols = emit_cols or []
    sizes = g.groupby(bucket_cols)[id_col].transform("size")
    g = g.loc[(sizes > 1) & (sizes <= cap), bucket_cols + [id_col]]
    if g.empty:
        id_dtype = g[id_col].dtype
        cols = {"left_id": pd.Series([], dtype=id_dtype),
                "right_id": pd.Series([], dtype=id_dtype)}
        for c in emit_cols:
            cols[c] = pd.Series([], dtype=g[c].dtype)
        return pd.DataFrame(cols)
    m = g.merge(g, on=bucket_cols, suffixes=("_l", "_r"))
    m = m[m[f"{id_col}_l"] < m[f"{id_col}_r"]]
    out = m.rename(columns={f"{id_col}_l": "left_id", f"{id_col}_r": "right_id"})
    return out[["left_id", "right_id"] + emit_cols].drop_duplicates()


N_COARSE = 64  # coarse-bucket count for high-cardinality groupbys


def _chunk_bounds(counts: np.ndarray, chunk: int):
    """Yield (lo, hi) index ranges over ``counts`` so each range's total
    stays ~<= ``chunk`` — the shared boundary arithmetic of every
    repeat-expansion kernel (pair enumeration, wedge emission). Progress is
    guaranteed: a single item larger than ``chunk`` is yielded alone (the
    one unavoidable over-wide emission; callers chunk WITHIN an item when
    its expansion can itself be split)."""
    n = len(counts)
    if n == 0:
        return
    csum = np.cumsum(counts)
    lo = 0
    while lo < n:
        base = int(csum[lo]) - int(counts[lo])
        hi = int(np.searchsorted(csum, base + chunk, side="right"))
        hi = min(max(hi, lo + 1), n)
        yield lo, hi
        lo = hi


def _distinct_pairs(cand: "ray.data.Dataset") -> "ray.data.Dataset":
    """Distinct (left_id, right_id), exactly, without a high-cardinality
    groupby: Ray's groupby pays per-group overhead, so grouping by ~10^5
    individual pairs is pathological. Instead group by a COARSE bucket
    (pair-hash % N_COARSE — identical pairs always land together) and run one
    vectorized drop_duplicates per bucket."""

    def add_coarse(t: pa.Table) -> pa.Table:
        l = t.column("left_id").to_numpy(zero_copy_only=False).astype(np.int64)
        r = t.column("right_id").to_numpy(zero_copy_only=False).astype(np.int64)
        coarse = ((l * 1000003 + r) % N_COARSE).astype(np.int32)
        return t.append_column("coarse", pa.array(coarse))

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["left_id", "right_id"]).drop(columns=["coarse"])

    return (
        cand.map_batches(add_coarse, batch_format="pyarrow")
        .groupby("coarse")
        .map_groups(dedup, batch_format="pandas")
    )


def minhash_lsh_candidates(ds: "ray.data.Dataset", id_col: str = "doc_id",
                           text_col: str = "text", num_perm: int = 64,
                           bands: int = 16, shingle_k: int = 5,
                           n_coarse: int = 509) -> "ray.data.Dataset":
    """Candidate near-dup pairs via MinHash LSH. Returns distinct
    (left_id, right_id) with left < right.

    Shuffle layout: band rows (id + two small ints) group by a COARSE hash of
    (band, bucket) — EXACT (candidate pairs require equal (band, bucket),
    which always co-locates) and, unlike grouping by ``band`` alone, task
    granularity stays bounded at corpus scale: one band's rows are the whole
    corpus, one coarse bucket's rows are ~1/``n_coarse`` of it (raise
    ``n_coarse`` for bigger corpora; each group costs a ~2 ms task constant).
    Per-group pair generation is one vectorized pandas self-merge."""
    band_rows = ds.map_batches(
        MinHasher(num_perm, bands, shingle_k, id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
    )

    def add_coarse(t: pa.Table) -> pa.Table:
        band = t.column("band").to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = t.column("bucket").to_numpy(zero_copy_only=False)
        coarse = (((band * 1000003) ^ bucket) % n_coarse).astype(np.int32)
        return t.append_column("coarse", pa.array(coarse))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        return _pairs_by_bucket(g, id_col, ["band", "bucket"])

    cand = (
        band_rows.map_batches(add_coarse, batch_format="pyarrow")
        .groupby("coarse")
        .map_groups(pairs, batch_format="pandas")
    )
    return _distinct_pairs(cand)


def _batch_jaccard_flat(lvals: np.ndarray, llen: np.ndarray,
                        rvals: np.ndarray, rlen: np.ndarray) -> np.ndarray:
    """Jaccard for a batch of pairs given FLAT concatenated set values plus
    per-pair lengths (exactly Arrow's list-array layout — zero-copy from a
    ``ListArray``) in one lexsort pass, no per-pair Python work.

    Each set is duplicate-free within its side, so after sorting all
    (pair_id, hash) rows, an adjacent equal pair can only be a cross-side
    match — counting them per pair_id via bincount yields the intersections."""
    npairs = len(llen)
    if npairs == 0:
        return np.empty(0, np.float64)
    pid = np.concatenate([np.repeat(np.arange(npairs), llen),
                          np.repeat(np.arange(npairs), rlen)])
    h = np.concatenate([lvals, rvals])
    order = np.lexsort((h, pid))
    ph, hh = pid[order], h[order]
    dup = (ph[1:] == ph[:-1]) & (hh[1:] == hh[:-1])
    inter = np.bincount(ph[1:][dup], minlength=npairs)
    union = llen + rlen - inter
    return np.where(union > 0, inter / np.maximum(union, 1), 0.0)


def _flat_gather(flat: np.ndarray, starts: np.ndarray,
                 lens: np.ndarray) -> np.ndarray:
    """Concatenate ``flat[starts[i] : starts[i]+lens[i]]`` for every i —
    vectorized slice gather (repeat/arange expansion, no Python loop)."""
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, flat.dtype)
    offs = np.cumsum(lens) - lens
    pos = np.arange(total) - np.repeat(offs, lens) + np.repeat(starts, lens)
    return flat[pos]


def _rank_bitmaps(doc_lens: np.ndarray, rank_flat: np.ndarray,
                  npool: int) -> np.ndarray:
    """(n_docs, ceil(npool/64)) uint64 bitmap matrix: bit r of row d set iff
    rank r is in doc d's set. Fully vectorized: per-doc ranks are sorted, so
    (doc, word) group keys are presorted and one ``np.bitwise_or.reduceat``
    folds each group's bits; the result scatters into the flat matrix."""
    n_docs = len(doc_lens)
    words = (npool + 63) // 64
    bm = np.zeros(n_docs * words, np.uint64)
    if len(rank_flat):
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), doc_lens)
        word = rank_flat.astype(np.int64) >> 6
        bits = np.uint64(1) << (rank_flat.astype(np.uint64) & np.uint64(63))
        key = doc_idx * words + word  # sorted: doc blocks x ascending ranks
        starts = np.flatnonzero(np.concatenate([[True], key[1:] != key[:-1]]))
        bm[key[starts]] = np.bitwise_or.reduceat(bits, starts)
    return bm.reshape(n_docs, words)


def _bitmap_inter(bm: np.ndarray, li: np.ndarray, ri: np.ndarray) -> np.ndarray:
    """Per-pair intersection sizes: popcount(AND) over bitmap rows — the
    cheapest exact kernel when the rank pool is small (memory traffic is
    2 x words x 8 B per pair instead of two gathered rank sets)."""
    both = (bm[li] & bm[ri]).view(np.uint8)
    return _POPCOUNT8[both].sum(axis=1, dtype=np.int64)


def _batch_jaccard_ranked(lranks: np.ndarray, llen: np.ndarray,
                          rranks: np.ndarray, rlen: np.ndarray,
                          npool: int) -> np.ndarray:
    """Jaccard for a batch of pairs whose set values are RANKS into a shared
    pool (int32, from one driver-side ``np.unique`` over the corpus), flat
    per-pair-sorted layout. Because each doc's set is sorted and rank is
    monotone in value, the composite key ``pair_id * npool + rank`` is
    globally sorted on BOTH sides by construction — intersection is then one
    binary-search membership pass (searchsorted) + bincount, with no
    per-batch lexsort: ~5x cheaper than ``_batch_jaccard_flat`` on
    ~400-element sets (the lexsort's permutation materialization dominates
    it)."""
    npairs = len(llen)
    if npairs == 0:
        return np.empty(0, np.float64)
    npool_ = np.int64(npool)
    pidl = np.repeat(np.arange(npairs, dtype=np.int64), llen)
    pidr = np.repeat(np.arange(npairs, dtype=np.int64), rlen)
    lc = pidl * npool_ + lranks
    rc = pidr * npool_ + rranks
    if len(rc) == 0:
        inter = np.zeros(npairs, np.int64)
    else:
        pos = np.minimum(np.searchsorted(rc, lc), len(rc) - 1)
        member = rc[pos] == lc
        inter = np.bincount(pidl[member], minlength=npairs)
    union = llen + rlen - inter
    return np.where(union > 0, inter / np.maximum(union, 1), 0.0)


def _broadcast_corpus_ref(ids: np.ndarray, flat: np.ndarray,
                          lens: np.ndarray, budget: int):
    """One ray.put of the whole (id-sorted) set corpus for the
    zero-shuffle exact-Jaccard verify: rank-compress once (np.unique); if
    per-doc BITMAPS over the rank pool fit ``budget`` the kernel downstream
    is popcount(AND) (cheapest memory traffic), else gathered rank sets
    through ``_batch_jaccard_ranked``. Returns (corpus_ref, use_bitmap)."""
    order = np.argsort(ids, kind="stable")
    starts = (np.cumsum(lens) - lens)[order]
    pool, rank_flat = np.unique(flat, return_inverse=True)
    npool = len(pool)
    words = (npool + 63) // 64
    use_bitmap = len(ids) * words * 8 <= budget
    if use_bitmap:
        bm = _rank_bitmaps(lens, rank_flat, npool)[order]
        return ray.put((ids[order], bm, lens[order])), True
    return ray.put((ids[order], rank_flat.astype(np.int32), starts,
                    lens[order], npool)), False


def _broadcast_verify_fn(corpus_ref, use_bitmap: bool, threshold: float,
                         out_schema: pa.Schema):
    """Streaming exact-Jaccard verify over a ``_broadcast_corpus_ref``
    corpus: per batch of (left_id, right_id) pairs, gather both sides by
    searchsorted and keep pairs at >= threshold, emitting (left_id,
    right_id, jaccard). Zero shuffle; the corpus is a zero-copy object
    store view in every worker."""

    def verify(t: pa.Table) -> pa.Table:
        corpus = ray.get(corpus_ref)
        sid = corpus[0]
        l = t.column("left_id").to_numpy(zero_copy_only=False).astype(np.int64)
        r = t.column("right_id").to_numpy(zero_copy_only=False).astype(np.int64)
        li = np.clip(np.searchsorted(sid, l), 0, len(sid) - 1)
        ri = np.clip(np.searchsorted(sid, r), 0, len(sid) - 1)
        ok = (sid[li] == l) & (sid[ri] == r)
        li, ri, lt, rt = li[ok], ri[ok], l[ok], r[ok]
        if use_bitmap:
            _, bm_, clen = corpus
            llen, rlen = clen[li], clen[ri]
            inter = _bitmap_inter(bm_, li, ri)
            union = llen + rlen - inter
            sims = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
        else:
            _, cranks, cstart, clen, npool_ = corpus
            llen, rlen = clen[li], clen[ri]
            sims = _batch_jaccard_ranked(
                _flat_gather(cranks, cstart[li], llen), llen,
                _flat_gather(cranks, cstart[ri], rlen), rlen, npool_)
        keep = sims >= threshold
        return pa.Table.from_arrays(
            [pa.array(lt[keep], pa.int64()),
             pa.array(rt[keep], pa.int64()),
             pa.array(sims[keep], pa.float64())],
            schema=out_schema)

    return verify


def _batch_jaccard(left_sets: list[np.ndarray], right_sets: list[np.ndarray]) -> np.ndarray:
    """List-of-arrays convenience over ``_batch_jaccard_flat``."""
    npairs = len(left_sets)
    if npairs == 0:
        return np.empty(0, np.float64)
    llen = np.fromiter((len(a) for a in left_sets), np.int64, npairs)
    rlen = np.fromiter((len(a) for a in right_sets), np.int64, npairs)
    lv = np.concatenate(left_sets) if llen.sum() else np.empty(0, np.uint64)
    rv = np.concatenate(right_sets) if rlen.sum() else np.empty(0, np.uint64)
    return _batch_jaccard_flat(lv, llen, rv, rlen)


def _list_flat(col) -> tuple[np.ndarray, np.ndarray]:
    """(flat_values, per_row_lengths) for an Arrow list column — zero-copy
    where possible, no per-row Python."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return (arr.flatten().to_numpy(zero_copy_only=False),
            arr.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64))


class ShingleSets:
    """map_batches stage: doc -> unique-sorted shingle-hash set as a
    ``list<uint64>`` column (the partitioned-join verify path ships these
    instead of broadcasting texts)."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text",
                 shingle_k: int = 5):
        self.id_col, self.text_col, self.k = id_col, text_col, shingle_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        flat, counts = _shingle_sets_batch(texts, self.k)
        offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
        sets = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                        pa.array(flat, pa.uint64()))
        return pa.table({self.id_col: batch.column(self.id_col),
                         "shingles": sets})


def _est_cutoff(threshold: float, num_perm: int, margin_sigmas: float) -> float:
    """Minhash-agreement acceptance cutoff: ``threshold - margin_sigmas *
    sigma`` where sigma = sqrt(j(1-j)/num_perm) is the estimator's std. A
    true pair at exactly ``threshold`` falls below the cutoff with probability
    ~Phi(-margin_sigmas) (3e-5 at the default 4 sigma)."""
    return threshold - margin_sigmas * float(
        np.sqrt(threshold * (1.0 - threshold) / num_perm)
    )


def _pair_payload_exchange(pairs: "ray.data.Dataset", payload: "ray.data.Dataset",
                           payload_cols: list[str],
                           payload_types: list[pa.DataType],
                           combine, out_schema: pa.Schema,
                           n_coarse: int = 64) -> "ray.data.Dataset":
    """Double-sided repartition join shared by every pair-verification stage:
    attach per-doc payload columns to each side of a (left_id, right_id) pair
    table, then reunite the pair's two sides and run ``combine(lt, rt)`` on
    two row-ALIGNED Arrow tables (row i of each is the L / R side of the same
    pair, payload attached) — Arrow all the way, no per-pair Python.

    Expressed as ONE union + two sequential coarse-bucket shuffles (chained
    hash_joins would nest union-inside-union, which this Ray release's
    executor cannot schedule):

    1. each pair emits two rows keyed by its left / right doc id; payload
       rows key by doc id; union -> groupby coarse(doc id) attaches the
       payload to each pair side (vectorized searchsorted lookup).
    2. groupby coarse(pair) reunites a pair's two sides; ``combine`` scores
       each bucket.

    Shuffle volume = 2 id-rows per pair + one payload copy per pair side —
    never raw texts, never driver state."""
    def pair_rows(t: pa.Table) -> pa.Table:
        l = t.column("left_id").to_numpy(zero_copy_only=False).astype(np.int64)
        r = t.column("right_id").to_numpy(zero_copy_only=False).astype(np.int64)
        jid = np.concatenate([l, r])
        cols = {
            "join_id": pa.array(jid, pa.int64()),
            "left_id": pa.array(np.concatenate([l, l]), pa.int64()),
            "right_id": pa.array(np.concatenate([r, r]), pa.int64()),
            "side": pa.array(["L"] * len(l) + ["R"] * len(r), pa.string()),
        }
        for c, typ in zip(payload_cols, payload_types):
            cols[c] = pa.nulls(2 * len(l), typ)
        cols["coarse"] = pa.array((jid % n_coarse).astype(np.int32))
        return pa.table(cols)

    def payload_rows(t: pa.Table) -> pa.Table:
        d = t.column("join_id").to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {
            "join_id": pa.array(d, pa.int64()),
            "left_id": pa.nulls(len(t), pa.int64()),
            "right_id": pa.nulls(len(t), pa.int64()),
            "side": pa.array(["S"] * len(t), pa.string()),
        }
        for c, typ in zip(payload_cols, payload_types):
            cols[c] = t.column(c).cast(typ)
        cols["coarse"] = pa.array((d % n_coarse).astype(np.int32))
        return pa.table(cols)

    both = pairs.map_batches(pair_rows, batch_format="pyarrow").union(
        payload.map_batches(payload_rows, batch_format="pyarrow")
    )

    ATTACHED = pa.schema(
        [("left_id", pa.int64()), ("right_id", pa.int64()), ("side", pa.string())]
        + list(zip(payload_cols, payload_types)) + [("coarse2", pa.int32())]
    )

    def attach(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        side = g.column("side")
        s = g.filter(pc.equal(side, "S"))
        p = g.filter(pc.not_equal(side, "S"))
        if len(p) == 0 or len(s) == 0:
            return ATTACHED.empty_table()
        sid = s.column("join_id").to_numpy(zero_copy_only=False)
        order = np.argsort(sid, kind="stable")
        sid_sorted = sid[order]
        jid = p.column("join_id").to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(sid_sorted, jid), 0, len(sid_sorted) - 1)
        valid = sid_sorted[pos] == jid  # pairs citing unknown docs drop out
        p = p.filter(pa.array(valid))
        take_idx = pa.array(order[pos[valid]])
        l = p.column("left_id").to_numpy(zero_copy_only=False).astype(np.int64)
        r = p.column("right_id").to_numpy(zero_copy_only=False).astype(np.int64)
        arrs = [p.column("left_id"), p.column("right_id"), p.column("side")]
        for c in payload_cols:
            a = s.column(c).take(take_idx)
            arrs.append(a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a)
        arrs.append(pa.array(((l * 1000003 + r) % n_coarse).astype(np.int32)))
        return pa.Table.from_arrays(arrs, schema=ATTACHED)

    attached = both.groupby("coarse").map_groups(attach, batch_format="pyarrow")

    def combine_bucket(g: pa.Table) -> pa.Table:
        if len(g) < 2:
            return out_schema.empty_table()
        l = g.column("left_id").to_numpy(zero_copy_only=False)
        r = g.column("right_id").to_numpy(zero_copy_only=False)
        is_r = pc.equal(g.column("side"), "R").to_numpy(zero_copy_only=False)
        # one lexsort does everything: duplicates of a pair (multi-band LSH
        # emission) always land in the same coarse2 bucket, so adjacent-dedup
        # here IS the global pair dedup, and after it each complete pair is
        # exactly one L row followed by its R row
        order = np.lexsort((is_r, r, l))
        lo, ro, so = l[order], r[order], is_r[order]
        keep = np.ones(len(order), bool)
        keep[1:] = (lo[1:] != lo[:-1]) | (ro[1:] != ro[:-1]) | (so[1:] != so[:-1])
        idx, lo, ro, so = order[keep], lo[keep], ro[keep], so[keep]
        if len(idx) < 2:
            return out_schema.empty_table()
        m = (lo[:-1] == lo[1:]) & (ro[:-1] == ro[1:]) & ~so[:-1] & so[1:]
        if not m.any():
            return out_schema.empty_table()
        lt = g.take(pa.array(idx[:-1][m]))
        rt = g.take(pa.array(idx[1:][m]))
        return combine(lt, rt)

    return attached.groupby("coarse2").map_groups(combine_bucket,
                                                  batch_format="pyarrow")


def _signature_prefilter(pairs: "ray.data.Dataset", docs: "ray.data.Dataset",
                         threshold: float, id_col: str, text_col: str,
                         shingle_k: int, num_perm: int = 64,
                         margin_sigmas: float = 4.0,
                         n_coarse: int = 64) -> "ray.data.Dataset":
    """Cheap minhash-agreement prefilter ahead of exact Jaccard verification.

    The fraction of agreeing minhash values is an unbiased Jaccard estimator;
    dropping pairs below ``_est_cutoff`` removes the bulk of LSH false
    positives (measured 86% at sf0.1: 130,611 -> 18,170 candidates) while the
    exact kernel still scores every survivor, so final jaccard values are
    exact. Ships fixed-width signatures (num_perm uint64s per doc side,
    ~512 B) instead of full shingle sets — what makes running it FIRST
    cheaper than verifying everything when docs are long."""
    sig_type = pa.list_(pa.uint64())
    hasher = MinHasher(num_perm=num_perm, bands=1, shingle_k=shingle_k,
                       id_col=id_col, text_col=text_col)

    def sig_rows(t: pa.Table) -> pa.Table:
        d = t.column(id_col)
        texts = t.column(text_col).to_pylist()
        sigs = hasher._signatures(texts).T if len(texts) else \
            np.empty((0, num_perm), np.uint64)  # (n, num_perm)
        offsets = np.arange(0, (len(t) + 1) * num_perm, num_perm, dtype=np.int32)
        lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                         pa.array(sigs.ravel(), pa.uint64()))
        return pa.table({"join_id": pc.cast(d, pa.int64()), "sig": lists})

    cutoff = _est_cutoff(threshold, num_perm, margin_sigmas)
    OUT = pa.schema([("left_id", pa.int64()), ("right_id", pa.int64())])

    def estimate(lt: pa.Table, rt: pa.Table) -> pa.Table:
        keep = _sig_agreement(lt, rt, num_perm) >= cutoff
        return pa.Table.from_arrays(
            [lt.column("left_id").filter(pa.array(keep)),
             lt.column("right_id").filter(pa.array(keep))],
            schema=OUT,
        )

    return _pair_payload_exchange(
        pairs, docs.map_batches(sig_rows, batch_format="pyarrow"),
        ["sig"], [sig_type], estimate, OUT, n_coarse,
    )


def jaccard_verify(pairs: "ray.data.Dataset", docs: "ray.data.Dataset",
                   threshold: float = 0.6, id_col: str = "doc_id",
                   text_col: str = "text", shingle_k: int = 5,
                   broadcast_threshold: int = 50_000,
                   prefilter_threshold: int = 20_000,
                   prefilter_margin_sigmas: float | None = 4.0,
                   concurrency: int = 8) -> "ray.data.Dataset":
    """Exact k-shingle Jaccard over candidate pairs, batch-vectorized
    (``_batch_jaccard``: one lexsort per batch, no per-pair loop).

    Exactness caveat: above ``prefilter_threshold`` candidate pairs, a
    minhash signature-agreement prefilter drops pairs whose ESTIMATED
    Jaccard is more than ``prefilter_margin_sigmas`` estimator-sigmas below
    ``threshold`` before the expensive shingle exchange — a true pair at
    exactly ``threshold`` is missed with probability ~Phi(-margin) (3e-5 at
    the default 4 sigma; pairs clearly above threshold are exponentially
    safer). Every pair that SURVIVES the prefilter is scored exactly. Pass
    ``prefilter_margin_sigmas=None`` for strict exactness at any candidate
    count (pays the full exchange on all LSH false positives).

    Distribution: when the candidate set is small (<= ``broadcast_threshold``
    pairs), the candidate doc texts are broadcast once via ray.put and
    shingled per actor with a cache. Larger candidate sets switch to the
    partitioned path: docs are shingled once, the pair table is repartition-
    joined (one union + two coarse-bucket shuffles) to the shingle sets on
    each side, and the verify kernel runs per bucket — shuffle volume =
    candidate shingle sets, never driver state, and the kernel spreads over
    the bucket tasks (measured 3x faster than the broadcast pool once the
    candidate set reaches ~10^5 pairs)."""
    # materialize once: count() would otherwise re-execute the whole lazy
    # candidate pipeline (LSH is the expensive stage) a second time when the
    # chosen path consumes `pairs` again; pair rows are just two ids each
    pairs = pairs.materialize()
    n_pairs = pairs.count()
    if n_pairs > prefilter_threshold and prefilter_margin_sigmas is not None:
        # LSH over-generates at low thresholds (measured 99.8% false positives
        # at theta=0.6 on sf0.1); the signature prefilter removes most of them
        # at ~512 B per pair side before the expensive shingle-set exchange
        pairs = _signature_prefilter(pairs, docs, threshold, id_col, text_col,
                                     shingle_k,
                                     margin_sigmas=prefilter_margin_sigmas
                                     ).materialize()
        n_pairs = pairs.count()
    if n_pairs > broadcast_threshold:
        return _jaccard_verify_joined(pairs, docs, threshold, id_col, text_col,
                                      shingle_k)
    cand_df = pairs.to_pandas()
    cand_ids = np.unique(np.concatenate([cand_df["left_id"].to_numpy(),
                                         cand_df["right_id"].to_numpy()])) \
        if len(cand_df) else np.array([])
    from ..stages.joins import semi_join

    if len(cand_ids):
        cand_docs = semi_join(docs, cand_ids, on=id_col).to_pandas()
    else:
        cand_docs = pd.DataFrame({id_col: [], text_col: []})
    lookup_ref = ray.put(dict(zip(cand_docs[id_col].tolist(),
                                  cand_docs[text_col].tolist())))
    import ray.data as _rd

    pairs = _rd.from_pandas(cand_df) if len(cand_df) else pairs

    class Verify:
        def __init__(self):
            self.lookup = ray.get(lookup_ref)
            self.shingle_cache: dict = {}

        def _shingles(self, doc_id):
            s = self.shingle_cache.get(doc_id)
            if s is None:
                s = _shingle_hashes(self.lookup.get(doc_id, ""), shingle_k)
                self.shingle_cache[doc_id] = s  # docs repeat across many pairs
            return s

        def __call__(self, batch: pa.Table) -> pa.Table:
            lsets = [self._shingles(i) for i in batch.column("left_id").to_pylist()]
            rsets = [self._shingles(i) for i in batch.column("right_id").to_pylist()]
            sims = _batch_jaccard(lsets, rsets)
            batch = batch.append_column("jaccard", pa.array(sims, pa.float64()))
            return batch.filter(pa.compute.greater_equal(batch.column("jaccard"), threshold))

    # near-dup-heavy corpora produce candidate sets ~ O(corpus): size the
    # actor pool for it, and bound the per-batch kernel (pairs x shingles)
    return pairs.map_batches(Verify, batch_format="pyarrow",
                             concurrency=(1, max(1, concurrency)),
                             batch_size=4096)


def _sig_agreement(lt: pa.Table, rt: pa.Table, num_perm: int) -> np.ndarray:
    """Per-pair fraction of agreeing minhash values for row-aligned side
    tables with a fixed-width ``sig`` list column — flat reshape, no per-pair
    Python."""
    sl, _ = _list_flat(lt.column("sig"))
    sr, _ = _list_flat(rt.column("sig"))
    n = len(lt)
    return (sl.reshape(n, num_perm) == sr.reshape(n, num_perm)).mean(axis=1)


def _exact_jaccard_combine(threshold: float, out_schema: pa.Schema,
                           col: str = "shingles"):
    """Combine kernel for ``_pair_payload_exchange`` with a hash-set list
    payload column ``col``: batched exact Jaccard (flat kernel straight off
    the Arrow list layout) + threshold filter."""

    def combine(lt: pa.Table, rt: pa.Table) -> pa.Table:
        lv, ll = _list_flat(lt.column(col))
        rv, rl = _list_flat(rt.column(col))
        sims = _batch_jaccard_flat(lv, ll, rv, rl)
        keep = pa.array(sims >= threshold)
        return pa.Table.from_arrays(
            [lt.column("left_id").filter(keep),
             lt.column("right_id").filter(keep),
             pa.array(sims[sims >= threshold], pa.float64())],
            schema=out_schema,
        )

    return combine


def _jaccard_verify_joined(pairs: "ray.data.Dataset", docs: "ray.data.Dataset",
                           threshold: float, id_col: str, text_col: str,
                           shingle_k: int, n_coarse: int = 64) -> "ray.data.Dataset":
    """Partitioned verify path for large candidate sets: the
    ``_pair_payload_exchange`` join with shingle sets as the payload and the
    batched ``_batch_jaccard`` kernel as the combine. Shuffle volume = 2
    id-rows per pair + one shingle set per pair side — never texts, never
    driver state."""
    sh = docs.map_batches(ShingleSets(id_col, text_col, shingle_k),
                          batch_format="pyarrow")

    def as_payload(t: pa.Table) -> pa.Table:
        return pa.table({"join_id": pc.cast(t.column(id_col), pa.int64()),
                         "shingles": t.column("shingles")})

    OUT = pa.schema([("left_id", pa.int64()), ("right_id", pa.int64()),
                     ("jaccard", pa.float64())])
    return _pair_payload_exchange(
        pairs, sh.map_batches(as_payload, batch_format="pyarrow"),
        ["shingles"], [pa.list_(pa.uint64())],
        _exact_jaccard_combine(threshold, OUT), OUT, n_coarse,
    )


def minhash_near_dup_verified(docs: "ray.data.Dataset", threshold: float = 0.6,
                              id_col: str = "doc_id", text_col: str = "text",
                              num_perm: int = 64, bands: int = 16,
                              shingle_k: int = 5, seed: int = 42,
                              n_coarse_lsh: int = 509, n_coarse: int = 64,
                              bucket_cap: int = 64,
                              margin_sigmas: float = 4.0,
                              sig_broadcast_docs: int = 200_000,
                              corpus_broadcast_bytes: int = 1 << 30) -> "ray.data.Dataset":
    """Fused near-dup chain: MinHash-LSH candidates + exact k-shingle Jaccard
    verification with shingles and signatures computed ONCE per doc (the
    staged chain — candidates, signature prefilter, verify — shingles every
    doc three times and pays each stage's shuffle constants).

    Layout:
    1. one map over docs emits 16 lean band rows per doc (id + two small
       ints) AND one payload row (signature + shingle set), materialized once
       (object-store footprint ~2x the shingled corpus; Ray spills past that).
    2. band rows -> coarse(band, bucket) groupby -> candidate pairs
       (per-group distinct; cross-group duplicates from multi-band agreement
       survive to step 4, whose pair-keyed bucketing dedups them globally).
    3. signature-agreement prefilter on the LEAN pair stream (ids only): the
       fraction of agreeing minhash values is an unbiased Jaccard estimator;
       pairs below ``_est_cutoff`` are dropped (removes ~86% of LSH false
       positives at sf0.1; a true pair at the threshold is lost with p~3e-5
       at 4 sigma). Signatures are fixed-width (num_perm x 8 B = 512 B/doc),
       so corpora <= ``sig_broadcast_docs`` broadcast the whole (id, sig)
       matrix via ray.put and filter per batch with zero shuffle; larger
       corpora fall back to the partitioned ``_pair_payload_exchange`` with
       the sig column as payload. Filtering BEFORE the shingle exchange is
       the key cost lever: shingle sets are ~10-100x a signature, and without
       the prefilter every false-positive pair ships two of them.
    4. exact verify: when the flat shingle corpus fits the broadcast budget
       (``corpus_broadcast_bytes``), it ships ONCE via ray.put and surviving
       pairs stream through a zero-shuffle map_batches (searchsorted gather +
       flat lexsort kernel) — the payload exchange would ship one set copy
       per pair side, a (pairs-per-doc)x blow-up on dup-dense corpora.
       Past the budget, ``_pair_payload_exchange`` attaches shingle sets to
       each surviving pair side and the batched kernel scores each bucket.
       Either way emitted jaccard values are exact.

    Output: distinct (left_id, right_id, jaccard >= threshold), left < right."""
    hasher = MinHasher(num_perm, bands, shingle_k, seed,
                       id_col=id_col, text_col=text_col)
    sig_type = pa.list_(pa.uint64())

    STAGED = pa.schema([(id_col, pa.int64()), ("band", pa.int32()),
                        ("bucket", pa.int64()), ("side", pa.string()),
                        ("sig", sig_type), ("shingles", sig_type)])

    def prep(t: pa.Table) -> pa.Table:
        n = len(t)
        if n == 0:
            return STAGED.empty_table()
        ids = pc.cast(t.column(id_col), pa.int64()).to_numpy(zero_copy_only=False)
        texts = t.column(text_col).to_pylist()
        flat, counts = _shingle_sets_batch(texts, shingle_k)
        sigs = hasher.sigs_from_sets(flat, counts)  # (num_perm, n)
        buckets = hasher.band_buckets(sigs)  # (bands * n,)
        sig_off = np.arange(0, (n + 1) * num_perm, num_perm, dtype=np.int32)
        sig_list = pa.ListArray.from_arrays(
            pa.array(sig_off, pa.int32()),
            pa.array(np.ascontiguousarray(sigs.T).ravel(), pa.uint64()))
        sh_off = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
        sh_list = pa.ListArray.from_arrays(pa.array(sh_off, pa.int32()),
                                           pa.array(flat, pa.uint64()))
        nb = bands * n
        return pa.Table.from_arrays(
            [pa.array(np.concatenate([np.tile(ids, bands), ids]), pa.int64()),
             pa.array(np.concatenate(
                 [np.repeat(np.arange(bands, dtype=np.int32), n),
                  np.full(n, -1, np.int32)]), pa.int32()),
             pa.array(np.concatenate([buckets, np.zeros(n, np.int64)]), pa.int64()),
             pa.array(["B"] * nb + ["S"] * n, pa.string()),
             pa.concat_arrays([pa.nulls(nb, sig_type), sig_list]),
             pa.concat_arrays([pa.nulls(nb, sig_type), sh_list])],
            schema=STAGED,
        )

    staged = docs.map_batches(prep, batch_format="pyarrow").materialize()

    def band_coarse(t: pa.Table) -> pa.Table:
        band = t.column("band").to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = t.column("bucket").to_numpy(zero_copy_only=False)
        coarse = (((band * 1000003) ^ bucket) % n_coarse_lsh).astype(np.int32)
        return pa.table({id_col: t.column(id_col), "band": t.column("band"),
                         "bucket": t.column("bucket"),
                         "coarse": pa.array(coarse)})

    payload_rows = staged.filter(expr="side == 'S'")
    cutoff = _est_cutoff(threshold, num_perm, margin_sigmas)
    n_docs = payload_rows.count()  # cheap: staged is materialized
    broadcast_sigs = n_docs <= sig_broadcast_docs

    def pairs_fn(g: pd.DataFrame) -> pd.DataFrame:
        # broadcast path: carry the emitting band — its prefilter dedups
        # pairs in place (keep iff band == canonical min agreeing band), so
        # no pair-keyed exchange is needed before the verify
        return _pairs_by_bucket(g, id_col, ["band", "bucket"], cap=bucket_cap,
                                emit_cols=["band"] if broadcast_sigs else None)

    band_rows = staged.filter(expr="side == 'B'")
    # the sort-shuffle groupby emits one output partition per INPUT block, so
    # a small-block input (8 parquet blocks at sf1) would run the whole
    # pairs+prefilter stage 8-wide no matter how many CPUs the cluster has.
    # The band rows are lean (id + two small ints), so splitting them up to a
    # healthy task count is ~free; inputs that already arrive in many blocks
    # (the 100 TB case) are left alone.
    min_blocks = int(ray.cluster_resources().get("CPU", 8)) * 2
    if staged.num_blocks() < min_blocks:  # known: staged is materialized
        band_rows = band_rows.repartition(min_blocks)
    cand = (
        band_rows
        .map_batches(band_coarse, batch_format="pyarrow")
        .groupby("coarse")
        .map_groups(pairs_fn, batch_format="pandas")
    )

    OUT = pa.schema([("left_id", pa.int64()), ("right_id", pa.int64()),
                     ("jaccard", pa.float64())])

    if broadcast_sigs:
        # broadcast prefilter: whole (id, sig) matrix once via ray.put
        # (<= ~100 MB at the cap), per-batch searchsorted lookup, no shuffle.
        # Whether the shingle corpus ALSO fits the broadcast budget (which
        # would let the exact verify run broadcast-side and skip the payload
        # exchange entirely) is decided from a bytes-only metadata pass
        # FIRST, so the driver never materializes a corpus it won't use —
        # the budget knob genuinely bounds driver memory.
        def sh_nbytes(t: pa.Table) -> pa.Table:
            flat, _ = _list_flat(t.column("shingles"))
            return pa.table({"nb": pa.array([int(flat.nbytes)], pa.int64())})

        corpus_bytes = sum(
            r["nb"] for r in payload_rows.map_batches(
                sh_nbytes, batch_format="pyarrow").take_all())
        pull_shingles = corpus_bytes <= corpus_broadcast_bytes

        def sig_sh(t: pa.Table) -> pa.Table:
            cols = {"join_id": t.column(id_col), "sig": t.column("sig")}
            if pull_shingles:
                cols["shingles"] = t.column("shingles")
            return pa.table(cols)

        tbls = [t for t in ray.get(
                    payload_rows.map_batches(sig_sh, batch_format="pyarrow")
                    .to_arrow_refs())
                if len(t)]
        if not tbls:  # empty docs input: the documented empty pair set
            return ray.data.from_arrow(OUT.empty_table())
        tbl = pa.concat_tables(tbls)
        ids = tbl.column("join_id").to_numpy(zero_copy_only=False).astype(np.int64)
        flat, _ = _list_flat(tbl.column("sig"))
        order = np.argsort(ids, kind="stable")
        mat_sorted = flat.reshape(len(ids), num_perm)[order]
        # canonical-band dedup state (replaces the pair-keyed _distinct_pairs
        # exchange): the broadcast matrix is enough to recompute, for every
        # pair, the full set of bands whose buckets BOTH docs share — band
        # buckets are a pure function of the signature. A (pair, band) row is
        # kept iff its band is the smallest agreeing band whose bucket was
        # actually emittable (bucket size <= cap; size >= 2 is implied by the
        # agreement itself), so exactly one row per pair survives globally
        # with ZERO additional shuffle. bb is (bands, n) int64; emit_ok the
        # matching capped-bucket mask — ~9 B/doc/band, tiny next to the sigs.
        bb = hasher.band_buckets(mat_sorted.T).reshape(bands, len(ids))
        emit_ok = np.empty((bands, len(ids)), bool)
        for b in range(bands):
            _, inv, cnt = np.unique(bb[b], return_inverse=True,
                                    return_counts=True)
            emit_ok[b] = cnt[inv] <= bucket_cap
        sig_ref = ray.put((ids[order], mat_sorted, bb, emit_ok))

        def prefilt(t: pa.Table) -> pa.Table:
            sids, mat, bb_, ok_ = ray.get(sig_ref)  # zero-copy object store
            l = t.column("left_id").to_numpy(zero_copy_only=False).astype(np.int64)
            r = t.column("right_id").to_numpy(zero_copy_only=False).astype(np.int64)
            band = t.column("band").to_numpy(zero_copy_only=False)
            li = np.clip(np.searchsorted(sids, l), 0, len(sids) - 1)
            ri = np.clip(np.searchsorted(sids, r), 0, len(sids) - 1)
            # chunked gather: one (rows, num_perm) fancy-index per side per
            # chunk — a single full-block gather allocates pairs x 512 B
            # temporaries per side and measures 20x slower than this loop
            # (allocator/cache thrash), see BASELINE bench notes
            keep = np.empty(len(l), bool)
            CH = 262_144
            for s in range(0, len(l), CH):
                lc, rc = li[s:s + CH], ri[s:s + CH]
                agree = (mat[lc] == mat[rc]).mean(axis=1)
                # canonical min agreeing emittable band; the row's own band
                # always agrees and was emitted, so argmax finds a real band
                cand_band = (bb_[:, lc] == bb_[:, rc]) & ok_[:, lc]
                keep[s:s + CH] = (
                    (cand_band.argmax(axis=0) == band[s:s + CH])
                    & (agree >= cutoff))
            # pairs cite ids from the same corpus, so lookups always hit;
            # the clip only guards an empty-corpus edge
            return t.filter(pa.array(keep)).drop_columns(["band"])

        cand = cand.map_batches(prefilt, batch_format="pyarrow")

        if pull_shingles:
            sh_flat, sh_lens = _list_flat(tbl.column("shingles"))
            # Corpus-broadcast exact verify, ZERO pair-side shuffle: the
            # whole flat shingle corpus ships once via ray.put (zero-copy
            # views in every worker); surviving pairs stream through a
            # map_batches that gathers both sides' sets by searchsorted and
            # runs the flat lexsort kernel. The payload exchange ships one
            # set copy PER PAIR SIDE (dup factor = pairs per doc — measured
            # 19x / 1.6 GB at the sf1 panel, 26 s -> the whole chain's cost),
            # so whenever the corpus itself is the smaller object, broadcast
            # wins; past the cap (100 TB corpora) the exchange below remains
            # the scale path. Pair dedup that the exchange's combine step
            # used to do already happened in prefilt (canonical-band rule),
            # so the verify streams straight off the prefiltered pairs.
            # Rank-compress the corpus once (np.unique); if the rank pool is
            # small enough that per-doc BITMAPS fit the budget, the kernel is
            # popcount(AND) over bitmap rows (cheapest memory traffic — the
            # gather/searchsorted kernel is bandwidth-bound and collapses
            # under 32 concurrent first-touch tasks on one box), else the
            # lexsort-free _batch_jaccard_ranked over gathered rank sets.
            sh_starts = (np.cumsum(sh_lens) - sh_lens)[order]
            pool, rank_flat = np.unique(sh_flat, return_inverse=True)
            npool = len(pool)
            words = (npool + 63) // 64
            use_bitmap = n_docs * words * 8 <= corpus_broadcast_bytes
            if use_bitmap:
                # _rank_bitmaps wants docs in ORIGINAL flat layout order;
                # reorder rows to sorted-id order afterwards
                bm = _rank_bitmaps(sh_lens, rank_flat, npool)[order]
                corpus_ref = ray.put((ids[order], bm, sh_lens[order]))
            else:
                corpus_ref = ray.put((ids[order], rank_flat.astype(np.int32),
                                      sh_starts, sh_lens[order], npool))

            def verify(t: pa.Table) -> pa.Table:
                corpus = ray.get(corpus_ref)
                sid = corpus[0]
                l = t.column("left_id").to_numpy(zero_copy_only=False).astype(np.int64)
                r = t.column("right_id").to_numpy(zero_copy_only=False).astype(np.int64)
                li = np.clip(np.searchsorted(sid, l), 0, len(sid) - 1)
                ri = np.clip(np.searchsorted(sid, r), 0, len(sid) - 1)
                ok = (sid[li] == l) & (sid[ri] == r)
                li, ri, lt, rt = li[ok], ri[ok], l[ok], r[ok]
                if use_bitmap:
                    _, bm_, clen = corpus
                    llen, rlen = clen[li], clen[ri]
                    inter = _bitmap_inter(bm_, li, ri)
                    union = llen + rlen - inter
                    sims = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
                else:
                    _, cranks, cstart, clen, npool_ = corpus
                    llen, rlen = clen[li], clen[ri]
                    sims = _batch_jaccard_ranked(
                        _flat_gather(cranks, cstart[li], llen), llen,
                        _flat_gather(cranks, cstart[ri], rlen), rlen, npool_)
                keep = sims >= threshold
                return pa.Table.from_arrays(
                    [pa.array(lt[keep], pa.int64()),
                     pa.array(rt[keep], pa.int64()),
                     pa.array(sims[keep], pa.float64())],
                    schema=OUT)

            return cand.map_batches(
                verify, batch_format="pyarrow", batch_size=16 * 1024)
    else:
        # partitioned prefilter: sig column as exchange payload (512 B/side)
        PRE = pa.schema([("left_id", pa.int64()), ("right_id", pa.int64())])

        def sig_payload(t: pa.Table) -> pa.Table:
            return pa.table({"join_id": t.column(id_col),
                             "sig": t.column("sig")})

        def estimate(lt: pa.Table, rt: pa.Table) -> pa.Table:
            keep = pa.array(_sig_agreement(lt, rt, num_perm) >= cutoff)
            return pa.Table.from_arrays(
                [lt.column("left_id").filter(keep),
                 lt.column("right_id").filter(keep)],
                schema=PRE,
            )

        cand = _pair_payload_exchange(
            cand, payload_rows.map_batches(sig_payload, batch_format="pyarrow"),
            ["sig"], [sig_type], estimate, PRE, n_coarse,
        )

    def sh_payload(t: pa.Table) -> pa.Table:
        return pa.table({"join_id": t.column(id_col),
                         "shingles": t.column("shingles")})

    return _pair_payload_exchange(
        cand, payload_rows.map_batches(sh_payload, batch_format="pyarrow"),
        ["shingles"], [sig_type],
        _exact_jaccard_combine(threshold, OUT), OUT, n_coarse,
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class SimHasher:
    """64-bit SimHash per doc (vectorized: token hashes -> +-1 bit votes), plus
    4x16-bit band columns: two docs within Hamming distance 3 share at least
    one identical band (pigeonhole), so grouping by (band, value) yields the
    candidate set."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col, self.text_col = id_col, text_col
        self.bits = np.uint64(1) << np.arange(64, dtype=np.uint64)

    def _simhashes(self, texts: list[str]) -> np.ndarray:
        """Vectorized across the batch: all token hashes concatenated, bit
        votes summed per doc with np.add.reduceat."""
        toks = [(t or "").lower().split() for t in texts]
        lens = np.array([len(t) for t in toks], dtype=np.int64)
        flat = np.array([w for doc in toks for w in doc], dtype=object)
        h = _stable_token_hash(flat) if len(flat) else np.empty(0, np.uint64)
        bits = ((h[:, None] & self.bits) != 0).astype(np.int32)  # (T, 64)
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        # reduceat can't take a start == len(h) (trailing empty docs); clip and
        # rely on the lens==0 overwrite below
        starts = np.minimum(starts, max(0, len(h) - 1))
        counts = np.add.reduceat(bits, starts, axis=0) if len(h) else \
            np.zeros((len(texts), 64), np.int32)  # (n_docs, 64)
        votes = counts * 2 - lens[:, None]
        out = ((votes > 0) * self.bits).sum(axis=1, dtype=np.uint64)
        out[lens == 0] = 0
        return out

    def simhash(self, text: str) -> np.uint64:
        return self._simhashes([text])[0]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        sh = self._simhashes(texts)
        tbl = {self.id_col: pa.array(ids), "simhash": pa.array(sh, pa.uint64())}
        for b in range(4):
            tbl[f"band{b}"] = pa.array(
                ((sh >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.uint32),
                pa.uint32(),
            )
        return pa.table(tbl)


_POPCOUNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)


def _popcount64(x: np.ndarray) -> np.ndarray:
    return _POPCOUNT8[x.view(np.uint8).reshape(len(x), 8)].sum(axis=1)


def simhash_candidates(ds: "ray.data.Dataset", id_col: str = "doc_id",
                       text_col: str = "text", max_hamming: int = 3) -> "ray.data.Dataset":
    """Near-dup pairs with Hamming(simhash) <= max_hamming via 16-bit band
    grouping (pigeonhole: distance <= 3 over 4 bands shares one exact band).

    Single-shuffle layout: the signature stage emits LONG-FORM rows — 4 rows
    per doc, one per band (id, simhash, band, band_val) — grouped once by a
    coarse bucket of (band, band_val); within each bucket an exact vectorized
    self-merge on (band, band_val) + popcount-table Hamming yields the pairs.
    A second coarse groupby dedups pairs (min hamming)."""
    hasher = SimHasher(id_col, text_col)

    def band_rows(batch: pa.Table) -> pa.Table:
        out = hasher(batch)
        n = len(out)
        ids = out.column(id_col).to_numpy(zero_copy_only=False)
        sh = out.column("simhash").to_numpy(zero_copy_only=False)
        band_vals = np.concatenate(
            [out.column(f"band{b}").to_numpy(zero_copy_only=False) for b in range(4)]
        ).astype(np.int64)
        bands = np.repeat(np.arange(4, dtype=np.int32), n)
        coarse = ((bands * 65536 + band_vals) % 509).astype(np.int32)
        return pa.table(
            {
                id_col: pa.array(np.tile(ids, 4)),
                "simhash": pa.array(np.tile(sh, 4), pa.uint64()),
                "band": pa.array(bands, pa.int32()),
                "band_val": pa.array(band_vals, pa.int64()),
                "coarse": pa.array(coarse, pa.int32()),
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        sizes = g.groupby(["band", "band_val"])[id_col].transform("size")
        g = g[(sizes > 1) & (sizes <= 64)]
        if g.empty:
            return pd.DataFrame({"left_id": pd.Series([], dtype=np.int64),
                                 "right_id": pd.Series([], dtype=np.int64),
                                 "hamming": pd.Series([], dtype=np.int64)})
        m = g.merge(g, on=["band", "band_val"], suffixes=("_l", "_r"))
        m = m[m[f"{id_col}_l"] < m[f"{id_col}_r"]]
        ham = _popcount64(
            m["simhash_l"].to_numpy(dtype=np.uint64)
            ^ m["simhash_r"].to_numpy(dtype=np.uint64)
        )
        m = m.assign(hamming=ham)[ham <= max_hamming]
        return m.rename(
            columns={f"{id_col}_l": "left_id", f"{id_col}_r": "right_id"}
        )[["left_id", "right_id", "hamming"]].drop_duplicates(["left_id", "right_id"])

    cand = (
        ds.map_batches(band_rows, batch_format="pyarrow")
        .groupby("coarse")
        .map_groups(pairs, batch_format="pandas")
    )

    def add_coarse(t: pa.Table) -> pa.Table:
        l = t.column("left_id").to_numpy(zero_copy_only=False).astype(np.int64)
        r = t.column("right_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "coarse", pa.array(((l * 1000003 + r) % N_COARSE).astype(np.int32))
        )

    def dedup_min(g: pd.DataFrame) -> pd.DataFrame:
        keep = g.loc[g.groupby(["left_id", "right_id"])["hamming"].idxmin()]
        return keep.drop(columns=["coarse"])

    return (
        cand.map_batches(add_coarse, batch_format="pyarrow")
        .groupby("coarse")
        .map_groups(dedup_min, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# embedding near-dup
# ---------------------------------------------------------------------------

def _block_pairs(ids: np.ndarray, mat: np.ndarray, threshold: float,
                 chunk_elems: int = 8_000_000) -> pd.DataFrame:
    """All (left < right by id) cosine pairs >= threshold within one vector
    set, computed in ROW CHUNKS so peak memory is O(chunk x n), never the full
    n x n similarity matrix (the dense-bucket memory fix)."""
    order = np.argsort(ids, kind="stable")
    ids, mat = ids[order], mat[order]
    n = len(ids)
    out_l, out_r, out_s = [], [], []
    chunk = max(1, chunk_elems // max(n, 1))
    col_idx = np.arange(n)
    for s in range(0, n, chunk):
        block = mat[s : s + chunk] @ mat.T  # (c, n)
        row_idx = np.arange(s, s + block.shape[0])
        keep = (block >= threshold) & (col_idx[None, :] > row_idx[:, None])
        li, ri = np.nonzero(keep)
        if len(li):
            out_l.append(ids[row_idx[li]])
            out_r.append(ids[ri])
            out_s.append(block[li, ri])
    if not out_l:
        return pd.DataFrame({"left_id": pd.Series([], dtype=ids.dtype),
                             "right_id": pd.Series([], dtype=ids.dtype),
                             "cosine": pd.Series([], dtype=np.float64)})
    return pd.DataFrame(
        {"left_id": np.concatenate(out_l), "right_id": np.concatenate(out_r),
         "cosine": np.concatenate(out_s)}
    ).sort_values(["left_id", "right_id"], kind="stable")


def _ivf_cluster_pairs(g: pa.Table, threshold: float, id_col: str) -> pa.Table:
    """Per-cluster near-dup kernel: exact all-pairs (chunked matmul,
    ``_block_pairs``) among EVERY row the cluster received — members and
    visitors alike, so a pair is found whenever the two probe sets
    intersect anywhere (measured +6-15 points of recall over the
    member-only rule at equal compute). A pair sharing k clusters is
    emitted k times — the downstream ``_distinct_pairs`` dedup collapses
    those (the cosine is bit-identical in every copy: same normalized
    float64 vectors, same dot)."""
    out_schema = pa.schema([("left_id", pa.int64()), ("right_id", pa.int64()),
                            ("cosine", pa.float64())])
    if len(g) < 2:
        return out_schema.empty_table()
    ids = g.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    mat = np.stack(g.column("normed").to_pylist())
    df = _block_pairs(ids, mat, threshold)
    if df.empty:
        return out_schema.empty_table()
    return pa.table({"left_id": pa.array(df["left_id"].to_numpy(), pa.int64()),
                     "right_id": pa.array(df["right_id"].to_numpy(), pa.int64()),
                     "cosine": pa.array(df["cosine"].to_numpy(), pa.float64())})


def _embedding_near_dup_ivf(ds: "ray.data.Dataset", threshold: float,
                            id_col: str, vec_col: str, seed: int,
                            n_clusters: int | None = None, nprobe: int = 12,
                            sample_size: int = 4096) -> "ray.data.Dataset":
    """IVF cluster-blocked cosine near-dup — the 100 TB path for MODERATE
    thresholds, where sign-pattern LSH has no usable recall (at t=0.5 the
    per-hyperplane agreement is 2/3, so one 8-plane table catches 4% of true
    pairs — measured on the sf1 panel corpus). Coarse k-means centroids fit
    on a driver sample; every vector lands in its home cluster and visits
    its nprobe-1 next-nearest clusters (``_IvfGraphAssign``, shared with
    ``knn_graph_ivf``); each cluster runs an exact chunked all-pairs over
    the rows it received, so a pair is found iff the two probe sets share
    ANY cluster. Emitted cosines are exact; only the pairing is
    approximate — measured recall 0.99 at t=0.5 on the 20k-vector sf1
    panel corpus at the defaults (precision is 1.0 by construction).

    Scale posture: compute ~ nprobe^2/n_clusters of the exact all-pairs
    matmul; per-task memory is one cluster (~nprobe*N/n_clusters rows). The
    sqrt(2N) default keeps both shrinking relative to exact as N grows; for
    1e9-vector corpora pass n_clusters ~ N/4000 explicitly so a single
    cluster stays task-sized, and raise nprobe if spot-checked recall (vs
    ``method='exact'`` on a sample) drops."""
    from .similarity import _IvfGraphAssign, kmeans_fit

    if n_clusters is None:
        n_clusters = max(16, int(np.sqrt(2 * max(1, ds.count()))))
    # the fit sample must dominate the cluster count or the centroids are
    # just sample points (sqrt(2N) clusters from a fixed 4096-row sample
    # collapses to ~3 points/cluster at N=1M); keep >= ~32 points/cluster
    # and never request more clusters than the sample can support
    sample_size = max(sample_size, 32 * n_clusters)
    sample = ds.limit(sample_size).to_pandas()[vec_col]
    n_clusters = min(n_clusters, max(1, len(sample)))
    cents = kmeans_fit(np.stack(sample.to_list()), n_clusters, seed=seed)
    cents_ref = ray.put(cents)
    staged = ds.map_batches(_IvfGraphAssign(cents_ref, nprobe, id_col, vec_col),
                            batch_format="pyarrow")
    pairs = staged.groupby("cluster").map_groups(
        lambda g: _ivf_cluster_pairs(g, threshold, id_col),
        batch_format="pyarrow")
    return _distinct_pairs(pairs)


def embedding_near_dup(ds: "ray.data.Dataset", threshold: float = 0.95,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       n_planes: int = 8, seed: int = 42,
                       method: str = "auto", exact_max_rows: int = 10_000,
                       bucket_cap: int = 4096,
                       max_extra_rounds: int = 4) -> "ray.data.Dataset":
    """Cosine near-duplicate pairs over an embedding column.

    Three paths:
    - ``exact`` (default for corpora <= ``exact_max_rows``): EXACT all-pairs,
      distributed — the normalized corpus matrix is broadcast once via
      ``ray.put`` and every Dataset batch does a chunked matmul against it,
      emitting only its own rows' pairs (row id < col id, so each unordered
      pair is produced exactly once, no dedup shuffle). Matches a SQL
      cross-join oracle bit-for-bit. The 10k default switch point is the
      quadratic-compute cliff, not a memory bound: all-pairs work grows
      N^2/2 x dim and past ~10k rows the blocked paths' pruning dominates
      the exact leg's better constants.
    - ``ivf`` (the 100 TB path, ``auto`` above the switch point): coarse
      k-means cluster blocking, exact scoring within each vector's
      nprobe nearest clusters — see ``_embedding_near_dup_ivf``. Recall
      holds at MODERATE thresholds (0.99 measured at t=0.5 on the sf1
      panel corpus) where sign-pattern LSH collapses.
    - ``lsh``: random-hyperplane bucket (one sign-pattern int per vector)
      -> within-bucket pairs. Only sound for VERY high thresholds (a pair
      at cosine t shares one n-plane bucket with p = (1-acos(t)/pi)^n:
      0.43 at t=0.95, 0.04 at t=0.5 — use ``ivf`` below ~0.99). Dense
      buckets are recursively RE-SPLIT with extra seeded hyperplanes (up
      to ``max_extra_rounds``), residual dense buckets fall back to the
      CHUNKED matmul — bounded memory, still exact within the bucket.
    """
    if method == "auto":
        # for a plain parquet read this count() is file-metadata only
        method = "exact" if ds.count() <= exact_max_rows else "ivf"
    if method == "exact":
        return _embedding_near_dup_exact(ds, threshold, id_col, vec_col)
    if method == "ivf":
        return _embedding_near_dup_ivf(ds, threshold, id_col, vec_col, seed)

    class Bucket:
        def __init__(self):
            self.planes = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            if len(batch) == 0:
                return pa.table({id_col: pa.array([], batch.schema.field(id_col).type),
                                 "bucket": pa.array([], pa.int64()),
                                 "normed": pa.array([], pa.list_(pa.float64()))})
            vecs = np.stack(batch.column(vec_col).to_pylist()).astype(np.float64)
            if self.planes is None:
                rng = np.random.default_rng(seed)
                self.planes = rng.standard_normal((vecs.shape[1], n_planes))
            signs = (vecs @ self.planes) > 0
            bucket = (signs * (1 << np.arange(n_planes))).sum(axis=1).astype(np.int64)
            norms = np.linalg.norm(vecs, axis=1, keepdims=True)
            normed = vecs / np.maximum(norms, 1e-12)
            return pa.table(
                {
                    id_col: batch.column(id_col),
                    "bucket": pa.array(bucket, pa.int64()),
                    "normed": pa.array(list(normed)),
                }
            )

    def pairs_recursive(ids: np.ndarray, mat: np.ndarray, depth: int) -> pd.DataFrame:
        if len(ids) <= bucket_cap or depth >= max_extra_rounds:
            return _block_pairs(ids, mat, threshold)
        rng = np.random.default_rng(seed + 7919 * (depth + 1))
        planes = rng.standard_normal((mat.shape[1], 4))
        sub = (((mat @ planes) > 0) * (1 << np.arange(4))).sum(axis=1)
        uniq = np.unique(sub)
        if len(uniq) == 1:  # signs never diverge — chunked exact fallback
            return _block_pairs(ids, mat, threshold)
        frames = [pairs_recursive(ids[sub == b], mat[sub == b], depth + 1)
                  for b in uniq]
        return pd.concat(frames, ignore_index=True)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        mat = np.stack(g["normed"].to_list())
        return pairs_recursive(ids, mat, 0)

    bucketed = ds.map_batches(Bucket, batch_format="pyarrow",
                              concurrency=(1, 2))
    return bucketed.groupby("bucket").map_groups(pairs, batch_format="pandas")


def _embedding_near_dup_exact(ds: "ray.data.Dataset", threshold: float,
                              id_col: str, vec_col: str) -> "ray.data.Dataset":
    """Exact distributed all-pairs: broadcast the normalized corpus once,
    chunked matmul per batch. O(n^2) compute spread over the cluster with
    O(batch x chunk) memory per task — the brute-force baseline the LSH path
    is measured against. The input is read ONCE (the corpus pull); the
    scoring fan-out re-distributes the pulled chunks rather than re-reading
    the source."""
    corpus = ds.select_columns([id_col, vec_col]).to_pandas()
    ids_all = corpus[id_col].to_numpy()
    mat_all = np.stack(corpus[vec_col].to_list()).astype(np.float64)
    mat_all /= np.maximum(np.linalg.norm(mat_all, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids_all, mat_all))
    chunk_rows = 8 * 1024
    ds = ray.data.from_pandas(
        [corpus.iloc[i : i + chunk_rows] for i in range(0, len(corpus), chunk_rows)]
        or [corpus]
    )

    class PairsVsCorpus:
        def __init__(self):
            self.ids, self.mat = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            id_type = batch.schema.field(id_col).type
            empty = pa.table({"left_id": pa.array([], id_type),
                              "right_id": pa.array([], id_type),
                              "cosine": pa.array([], pa.float64())})
            if len(batch) == 0:
                return empty
            bids = batch.column(id_col).to_numpy(zero_copy_only=False)
            bmat = np.stack(batch.column(vec_col).to_pylist()).astype(np.float64)
            bmat /= np.maximum(np.linalg.norm(bmat, axis=1, keepdims=True), 1e-12)
            out_l, out_r, out_s = [], [], []
            chunk = max(1, 8_000_000 // max(len(self.ids), 1))
            for s in range(0, len(bids), chunk):
                block = bmat[s : s + chunk] @ self.mat.T  # (c, n_corpus)
                keep = (block >= threshold) & (self.ids[None, :] > bids[s : s + chunk, None])
                li, ri = np.nonzero(keep)
                if len(li):
                    out_l.append(bids[s + li])
                    out_r.append(self.ids[ri])
                    out_s.append(block[li, ri])
            if not out_l:
                return empty
            return pa.table(
                {
                    "left_id": pa.array(np.concatenate(out_l)),
                    "right_id": pa.array(np.concatenate(out_r)),
                    "cosine": pa.array(np.concatenate(out_s), pa.float64()),
                }
            )

    return ds.map_batches(PairsVsCorpus, batch_format="pyarrow",
                          concurrency=(1, 2), batch_size=8 * 1024)


# ---------------------------------------------------------------------------
# word n-gram Jaccard (exact all-pairs — the oracle-facing member of the
# near-dup family; the LSH chains above are the 100 TB approximate path)
# ---------------------------------------------------------------------------

def _word_ngram_sets_batch(texts: list, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Unique-sorted word-n-gram hash sets for a whole batch: one flat word
    pass (stable 64-bit token hashes), n-gram hashes by combining n
    consecutive word hashes within a doc (boundary-masked), per-doc dedup by
    one lexsort + adjacent diff. Returns (flat_hashes, counts_per_doc) —
    sets sorted within each doc, the layout the rank/bitmap kernels want."""
    ndocs = len(texts)
    toks = [(t or "").split() for t in texts]
    lens = np.array([len(t) for t in toks], dtype=np.int64)
    flat = np.array([w for doc in toks for w in doc], dtype=object)
    counts = np.zeros(ndocs, np.int64)
    if len(flat) < n:
        return np.empty(0, np.uint64), counts
    h = _stable_token_hash(flat)
    doc_idx = np.repeat(np.arange(ndocs, dtype=np.int64), lens)
    gh = h[: len(h) - n + 1].copy()
    ok = np.ones(len(gh), bool)
    for k in range(1, n):
        gh = gh * np.uint64(1000003) ^ h[k: len(h) - n + 1 + k]
        ok &= doc_idx[k: len(h) - n + 1 + k] == doc_idx[: len(h) - n + 1]
    gdoc = doc_idx[: len(h) - n + 1][ok]
    gh = gh[ok]
    if len(gh) == 0:
        return np.empty(0, np.uint64), counts
    order = np.lexsort((gh, gdoc))
    gd, gv = gdoc[order], gh[order]
    keep = np.ones(len(gv), bool)
    keep[1:] = (gd[1:] != gd[:-1]) | (gv[1:] != gv[:-1])
    gd, gv = gd[keep], gv[keep]
    counts = np.bincount(gd, minlength=ndocs).astype(np.int64)
    return gv, counts


def ngram_jaccard_pairs(docs: "ray.data.Dataset", n: int = 2,
                        threshold: float = 0.3, id_col: str = "doc_id",
                        text_col: str = "text",
                        exact_cap: int = 20_000) -> "ray.data.Dataset":
    """EXACT all-pairs word-n-gram Jaccard near-dup pairs (left_id <
    right_id, jaccard >= threshold) — matches a DuckDB
    list_intersect/list_distinct oracle value-for-value.

    Distribution: n-gram sets are built in one vectorized map pass; the
    rank-compressed corpus becomes per-doc BITMAPS over the distinct-gram
    pool, broadcast once via ray.put; strided ray.remote tasks popcount each
    row against every later row — work is O(n_docs^2 x words) TOTAL but the
    driver sees only the >= threshold pairs. ``exact_cap`` (docs) and the
    bitmap-bytes guard bound the quadratic and the broadcast honestly
    (~20k short docs is a few seconds on one node); past either limit use
    ``minhash_near_dup_verified`` (LSH candidates + exact verify), which is
    the scale path for the same question. Docs with fewer than n words have
    no n-grams and never pair (parity with the SQL's len(ws) >= n filter)."""
    sets = docs.map_batches(
        lambda t: _ngram_rows(t, id_col, text_col, n),
        batch_format="pyarrow",
    )
    tbls = [t for t in ray.get(sets.to_arrow_refs()) if len(t)]
    if not tbls:  # no doc has >= n words: the documented empty pair set
        return ray.data.from_arrow(_NGRAM_OUT.empty_table())
    tbl = pa.concat_tables(tbls)
    ids = tbl.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    if len(ids) > exact_cap:
        raise ValueError(
            f"ngram_jaccard_pairs is the exact O(n^2) member of the near-dup "
            f"family, capped at {exact_cap} docs ({len(ids)} given); use "
            "minhash_near_dup_verified for larger corpora"
        )
    flat, lens = _list_flat(tbl.column("grams"))
    order = np.argsort(ids, kind="stable")
    # reorder flat sets to sorted-id order so emitted pairs are id-ordered
    starts = (np.cumsum(lens) - lens)[order]
    flat = _flat_gather(flat, starts, lens[order])
    ids, lens = ids[order], lens[order]
    pool, rank_flat = np.unique(flat, return_inverse=True)
    npool = max(1, len(pool))
    bitmap_bytes = len(ids) * ((npool + 63) // 64) * 8
    if bitmap_bytes > 2 << 30:
        raise ValueError(
            f"distinct n-gram pool too large for the exact bitmap kernel "
            f"({bitmap_bytes >> 20} MiB of bitmaps); use "
            "minhash_near_dup_verified for this corpus"
        )
    bm = _rank_bitmaps(lens, rank_flat.astype(np.int64), npool)
    corpus_ref = ray.put((ids, bm, lens))
    # Raw-task fan-out (documented Dataset-API exception): each task's INPUT
    # is ~zero bytes (a stride index) while its COMPUTE is O(n_docs^2 x
    # words / n_tasks) popcounts against the broadcast corpus — Ray Data's
    # block bundling coalesces such byte-less inputs into ~3 tasks, so the
    # fan-out is expressed as plain ray.remote tasks over row strides
    # (round-robin: early sorted rows scan the longest suffix, striding
    # balances the triangle) and the results re-enter the Dataset world via
    # from_arrow_refs — no driver copy of the pair tables.
    n_tasks = int(min(64, max(8, len(ids) // 64)))
    refs = [_ngram_score_stride.remote(corpus_ref, k, n_tasks, threshold)
            for k in range(n_tasks)]
    return ray.data.from_arrow_refs(refs)


_NGRAM_OUT = pa.schema([("left_id", pa.int64()), ("right_id", pa.int64()),
                        ("jaccard", pa.float64())])


@ray.remote
def _ngram_score_stride(corpus, k: int, n_tasks: int,
                        threshold: float) -> pa.Table:
    """Score rows k, k+n_tasks, ... of the sorted corpus against every
    later row (each unordered pair scored exactly once across tasks)."""
    sid, bm_, slen = corpus
    outs = []
    for i in range(k, len(sid) - 1, n_tasks):
        inter = _POPCOUNT8[(bm_[i + 1:] & bm_[i]).view(np.uint8)].sum(axis=1)
        union = slen[i + 1:] + slen[i] - inter
        j = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
        hit = np.flatnonzero(j >= threshold)
        if len(hit):
            outs.append((np.full(len(hit), sid[i]), sid[i + 1 + hit], j[hit]))
    if not outs:
        return _NGRAM_OUT.empty_table()
    return pa.Table.from_arrays(
        [pa.array(np.concatenate([o[0] for o in outs]), pa.int64()),
         pa.array(np.concatenate([o[1] for o in outs]), pa.int64()),
         pa.array(np.concatenate([o[2] for o in outs]), pa.float64())],
        schema=_NGRAM_OUT)


def _ngram_rows(t: pa.Table, id_col: str, text_col: str, n: int) -> pa.Table:
    """(id, grams list<uint64>) rows for ``ngram_jaccard_pairs`` — docs with
    no n-grams are dropped here (they can never pair)."""
    texts = t.column(text_col).to_pylist()
    flat, counts = _word_ngram_sets_batch(texts, n)
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    grams = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                     pa.array(flat, pa.uint64()))
    out = pa.table({id_col: pc.cast(t.column(id_col), pa.int64()),
                    "grams": grams})
    return out.filter(pa.array(counts > 0))


def _token_df_ref(sets: "ray.data.Dataset", hot_tokens: int,
                  hot_partial_cap: int):
    """Broadcast (sorted_tokens, df) of the globally hottest tokens from
    bounded per-block count partials — the AllPairs frequency-ordering
    table shared by the prefix and containment joins. Tokens outside the
    table rank df=1 (rare-first). Approximate df (cross-block singletons
    are missed) — an ordering optimization only, never a correctness
    input."""
    def tok_partial(t: pa.Table) -> pa.Table:
        flat, _ = _list_flat(t.column("grams"))
        tok, cnt = np.unique(flat, return_counts=True)
        keep = cnt >= 2  # a block-locally-unique token can't be ranked hot
        tok, cnt = tok[keep], cnt[keep]
        if len(tok) > hot_partial_cap:
            top = np.argpartition(cnt, -hot_partial_cap)[-hot_partial_cap:]
            tok, cnt = tok[top], cnt[top]
        return pa.table({"tok": pa.array(tok, pa.uint64()),
                         "cnt": pa.array(cnt, pa.int64())})

    partials = sets.map_batches(tok_partial, batch_format="pyarrow").take_all()
    if partials:
        ptoks = np.array([r["tok"] for r in partials], np.uint64)
        pcnts = np.array([r["cnt"] for r in partials], np.float64)
        utok, inv = np.unique(ptoks, return_inverse=True)
        df = np.bincount(inv, weights=pcnts)
        if len(utok) > hot_tokens:
            top = np.argpartition(df, -hot_tokens)[-hot_tokens:]
            utok, df = utok[top], df[top]
        order = np.argsort(utok)
        df_tok, df_val = utok[order], df[order].astype(np.int64)
    else:
        df_tok = np.empty(0, np.uint64)
        df_val = np.empty(0, np.int64)
    return ray.put((df_tok, df_val))


def _sig_rows_fn(hasher: "MinHasher", num_perm: int, id_col: str):
    """(join_id, sig list<uint64>) rows from the SAME gram sets the join
    runs on, so signature agreement estimates exactly the target overlap
    measure."""
    def sig_rows(t: pa.Table) -> pa.Table:
        flat, lens = _list_flat(t.column("grams"))
        sigs = hasher.sigs_from_sets(flat, lens) if len(t) else \
            np.empty((num_perm, 0), np.uint64)
        off = np.arange(0, (len(t) + 1) * num_perm, num_perm,
                        dtype=np.int32)
        lists = pa.ListArray.from_arrays(
            pa.array(off, pa.int32()),
            pa.array(np.ascontiguousarray(sigs.T).ravel(), pa.uint64()))
        return pa.table({"join_id": pc.cast(t.column(id_col), pa.int64()),
                         "sig": lists})

    return sig_rows


def _sig_matrix8_ref(sig_ds: "ray.data.Dataset", num_perm: int):
    """Driver gather of the whole (id, sig) matrix as LOW-BYTE uint8 lanes,
    id-sorted, via one ray.put — the fused in-kernel prefilter's broadcast
    form. Equality compare on uint8 truncations can only FALSE-MATCH
    (p=1/256 per perm), so the estimated agreement is biased UP: the
    prefilter keeps strictly more than the full-width compare would, never
    fewer. Returns None when the matrix is empty."""
    tbls = [t for t in ray.get(sig_ds.to_arrow_refs()) if len(t)]
    if not tbls:
        return None
    stbl = pa.concat_tables(tbls)
    sids = stbl.column("join_id").to_numpy(
        zero_copy_only=False).astype(np.int64)
    sflat, _ = _list_flat(stbl.column("sig"))
    sorder = np.argsort(sids, kind="stable")
    mat8 = (sflat.reshape(len(sids), num_perm)[sorder]
            & np.uint64(0xFF)).astype(np.uint8)
    return ray.put((sids[sorder], mat8))


def ngram_prefix_join(docs: "ray.data.Dataset", n: int = 2,
                      threshold: float = 0.8, id_col: str = "doc_id",
                      text_col: str = "text", hot_tokens: int = 4096,
                      hot_partial_cap: int = 16_384,
                      n_coarse_tok: int = 509,
                      n_coarse: int = 64, num_perm: int = 64,
                      prefilter_margin_sigmas: "float | None" = 4.0,
                      sig_broadcast_docs: int = 200_000,
                      corpus_broadcast_bytes: int = 1 << 30,
                      seed: int = 42) -> "ray.data.Dataset":
    """Word-n-gram Jaccard pairs (left_id < right_id, jaccard >= threshold)
    via PREFIX FILTERING (AllPairs / PPJoin family: Bayardo et al. WWW'07,
    Xiao et al. TODS'11) — same answer as ``ngram_jaccard_pairs`` with NO
    corpus cap and no O(n_docs^2) stage; the scale member of the exact
    family (exactness caveat of the default signature prefilter below).

    Why candidate recall is provably 1.0: fix any total order on tokens and
    sort each doc's gram set by it. If J(a,b) >= t then |a ∩ b| >=
    t*max(|a|,|b|), so the SMALLEST common token sits within the first
    |x| - ceil(t*|x|) + 1 tokens of BOTH sides (fewer than ceil(t*|x|)
    tokens can follow it among x's commons). Grouping prefix tokens
    therefore surfaces every true pair at least once, and both exact prunes
    keep that emission: the LENGTH filter (J >= t forces min_len >=
    t*max_len) and the PPJoin POSITIONAL filter — at the smallest common
    token (ranks i, j in the total order) overlap <= 1 + min(|a|-i-1,
    |b|-j-1), which for a true pair is >= the required overlap
    ceil(t/(1+t)*(|a|+|b|)); non-smallest emissions of the same pair may be
    pruned by the same formula, harmlessly.

    Distribution (all stages bounded):
    1. gram sets once per doc (vectorized ``_ngram_rows``), materialized —
       reused as prefix source, signature source, and verify payload.
    2. prefix emission -> coarse(token) groupby -> per-token candidate
       pairs with the length + positional prunes. Token order is
       (df ascending, hash): a small broadcast df table of the globally
       most frequent tokens (bounded per-block count partials -> driver
       top-``hot_tokens``; tokens outside it rank df=1, i.e. rare-first)
       puts each doc's RAREST grams in its prefix — the AllPairs frequency
       ordering that minimizes sum(df_prefix^2). An optimization only (any
       consistent total order is correct), but the decisive one on
       low-entropy vocabularies.
    3. minhash signature-agreement prefilter over the candidate ids
       (signatures derived from the SAME gram sets via ``sigs_from_sets``,
       so agreement estimates exactly the target Jaccard): pairs whose
       estimate is more than ``prefilter_margin_sigmas`` estimator-sigmas
       below ``threshold`` are dropped before the expensive set exchange —
       a true pair at exactly ``threshold`` is missed with p ~ Phi(-margin)
       (3e-5 at 4 sigma; same documented contract as ``jaccard_verify``).
       Pass ``prefilter_margin_sigmas=None`` for strict exactness. The
       (id, sig) matrix broadcasts via ray.put up to ``sig_broadcast_docs``
       docs; larger corpora use the partitioned sig-payload exchange.
    4. exact verify. On the broadcast path, when the flat gram corpus fits
       ``corpus_broadcast_bytes``, the corpus ships ONCE via ray.put and
       surviving pairs stream through the zero-shuffle popcount/rank-set
       kernel (``_broadcast_verify_fn``, same trade as near_dup_verified:
       the payload exchange ships one set copy PER PAIR SIDE, so whenever
       the corpus is the smaller object the broadcast wins); cross-bucket
       duplicate candidates are collapsed by ``_distinct_pairs`` first
       (near-true-pair-sized after the prefilter). Otherwise the
       ``_pair_payload_exchange`` with gram payloads remains the scale
       path, deduping pair-keyed in its buckets.

    Prefix filtering is effective when token df is Zipfian (real corpora:
    prefixes hit rare tokens). On a degenerate tiny vocabulary every token
    is frequent and candidate volume degrades toward all-pairs — that is a
    property of ALL inverted-index set joins, and the positional +
    signature prunes are what keep this join cheap there too (961-bigram
    flat-df fixture, 50k docs: 246M length-filtered enumerations -> 89M
    after the positional prune -> 1.4k after the fused signature filter,
    nothing wider than a chunk ever materialized).
    Reference parity: same pair semantics as ngram_jaccard's DuckDB
    list_intersect oracle, value-for-value."""
    sets = docs.map_batches(
        lambda t: _ngram_rows(t, id_col, text_col, n),
        batch_format="pyarrow",
    ).materialize()
    n_docs = sets.count()  # cheap: materialized
    if n_docs < 2:  # no pair possible; keeps the typed empty schema
        return ray.data.from_arrow(_NGRAM_OUT.empty_table())

    # --- hot-token detection: bounded per-block partials, driver top-H ---
    df_ref = _token_df_ref(sets, hot_tokens, hot_partial_cap)

    # --- prefix emission ---
    PREFIX = pa.schema([("tok", pa.int64()), (id_col, pa.int64()),
                        ("set_len", pa.int32()), ("pos", pa.int32()),
                        ("coarse", pa.int32())])

    def emit_prefix(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return PREFIX.empty_table()
        df_tok, df_val = ray.get(df_ref)
        flat, lens = _list_flat(t.column("grams"))
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        doc_idx = np.repeat(np.arange(len(t), dtype=np.int64), lens)
        if len(df_tok):
            dpos = np.clip(np.searchsorted(df_tok, flat), 0, len(df_tok) - 1)
            dfv = np.where(df_tok[dpos] == flat, df_val[dpos], 1)
        else:
            dfv = np.ones(len(flat), np.int64)
        # total order (df asc, hash): consistent across docs (the df table
        # is one fixed broadcast), rarest tokens land in prefixes — the
        # AllPairs frequency ordering that minimizes sum(df_prefix^2)
        order = np.lexsort((flat, dfv, doc_idx))
        starts = np.cumsum(lens) - lens
        rank_in_doc = np.arange(len(flat), dtype=np.int64) - np.repeat(starts, lens)
        # prefix length |x| - ceil(t|x|) + 1 (>= 1 for 0 < t <= 1)
        p = lens - np.ceil(threshold * lens).astype(np.int64) + 1
        keep = rank_in_doc < np.repeat(p, lens)
        tok = flat[order][keep].view(np.int64)
        return pa.Table.from_arrays(
            [pa.array(tok, pa.int64()),
             pa.array(ids[doc_idx[order][keep]], pa.int64()),
             pa.array(lens[doc_idx[order][keep]].astype(np.int32), pa.int32()),
             pa.array(rank_in_doc[keep].astype(np.int32), pa.int32()),
             pa.array((tok % n_coarse_tok).astype(np.int32), pa.int32())],
            schema=PREFIX)

    prefix_rows = sets.map_batches(emit_prefix, batch_format="pyarrow")
    # the sort-shuffle groupby emits one output partition per INPUT block
    # (same fix as the minhash chain): prefix rows are lean, split to width
    min_blocks = int(ray.cluster_resources().get("CPU", 8)) * 2
    if sets.num_blocks() < min_blocks:
        prefix_rows = prefix_rows.repartition(min_blocks)

    # --- minhash signatures (from the SAME gram sets, so agreement
    # estimates exactly the target Jaccard) — built BEFORE the pair kernel
    # so the broadcast path can fuse the prefilter into pair generation ---
    sig_ref = None
    sig_ds = None
    cutoff = 0.0
    if prefilter_margin_sigmas is not None:
        hasher = MinHasher(num_perm=num_perm, bands=1, seed=seed,
                           id_col=id_col)
        sig_type = pa.list_(pa.uint64())
        sig_ds = sets.map_batches(_sig_rows_fn(hasher, num_perm, id_col),
                                  batch_format="pyarrow")
        cutoff = _est_cutoff(threshold, num_perm, prefilter_margin_sigmas)
        if n_docs <= sig_broadcast_docs:
            # broadcast path: whole (id, sig) matrix once via ray.put
            # (one uint8 lane per perm per doc), consumed INSIDE the pair
            # kernel — candidates are prefiltered before they ever
            # materialize, so the kernel's output is near-true-pair-sized
            # even when the vocabulary is degenerate and candidate volume
            # is ~all-pairs (see _sig_matrix8_ref for the bias contract)
            sig_ref = _sig_matrix8_ref(sig_ds, num_perm)

    def prefix_pairs(g: pd.DataFrame) -> pd.DataFrame:
        tok = g["tok"].to_numpy(np.int64)
        ids = g[id_col].to_numpy(np.int64)
        slen = g["set_len"].to_numpy(np.int64)
        pos = g["pos"].to_numpy(np.int64)
        # (token, set_len asc) segments: within a segment, partners of row
        # i are exactly the j > i with slen_j <= slen_i / t — the LENGTH
        # filter (J >= t forces min_len >= t*max_len) applied DURING
        # enumeration via searchsorted, so df^2 is never materialized
        o = np.lexsort((slen, tok))
        tok, ids, slen, pos = tok[o], ids[o], slen[o], pos[o]
        seg = np.flatnonzero(np.r_[True, tok[1:] != tok[:-1]])
        seg_end = np.append(seg[1:], len(tok))
        if sig_ref is not None:
            sid, mat = ray.get(sig_ref)
        out_l, out_r = [], []
        CH = 1_048_576  # pairs per enumeration chunk: bounds kernel memory
        # (sig gather per chunk = 2 x CH x num_perm uint8 = ~128 MiB)
        for s, e in zip(seg, seg_end):
            if e - s < 2:
                continue
            sl_seg = slen[s:e]
            hi = s + np.searchsorted(sl_seg, sl_seg / threshold + 1e-9,
                                     side="right")
            lo = np.arange(s + 1, e + 1)
            cnt = np.maximum(hi - lo, 0)
            csum = np.cumsum(cnt)
            # i-row chunk boundaries so each chunk emits <= CH pairs
            bounds = np.searchsorted(csum, np.arange(CH, csum[-1], CH)) + 1
            for ii, jj in zip(np.r_[0, bounds], np.r_[bounds, e - s]):
                c = cnt[ii:jj]
                tot = int(c.sum())
                if tot == 0:
                    continue
                offs = np.cumsum(c) - c
                li = np.repeat(np.arange(s + ii, s + jj), c)
                ri = np.arange(tot) - np.repeat(offs, c) + np.repeat(
                    lo[ii:jj], c)
                # PPJoin positional filter: required overlap for J >= t is
                # alpha = ceil(t/(1+t)*(|a|+|b|)); at the smallest common
                # token the true overlap is <= 1 + min(suffix_l, suffix_r).
                # Valid for the smallest-common emission (which every true
                # pair has), so pruning every emission never loses a pair.
                alpha = np.ceil(threshold / (1.0 + threshold)
                                * (slen[li] + slen[ri]) - 1e-9)
                ub = 1 + np.minimum(slen[li] - pos[li] - 1,
                                    slen[ri] - pos[ri] - 1)
                m = ub >= alpha
                li, ri = li[m], ri[m]
                if sig_ref is not None and len(li):
                    # fused signature-agreement prefilter (see docstring)
                    lx = np.clip(np.searchsorted(sid, ids[li]), 0,
                                 len(sid) - 1)
                    rx = np.clip(np.searchsorted(sid, ids[ri]), 0,
                                 len(sid) - 1)
                    m = (mat[lx] == mat[rx]).mean(axis=1) >= cutoff
                    li, ri = li[m], ri[m]
                if len(li):
                    out_l.append(ids[li])
                    out_r.append(ids[ri])
        if not out_l:
            return pd.DataFrame({"left_id": pd.Series([], dtype=np.int64),
                                 "right_id": pd.Series([], dtype=np.int64)})
        l = np.concatenate(out_l)
        r = np.concatenate(out_r)
        out = pd.DataFrame({"left_id": np.minimum(l, r),
                            "right_id": np.maximum(l, r)})
        # within-group dedup only (a pair found via two tokens of the same
        # coarse bucket); cross-bucket duplicates are deduped pair-keyed
        # inside the payload exchange
        return out.drop_duplicates()

    cand = (prefix_rows.groupby("coarse")
            .map_groups(prefix_pairs, batch_format="pandas"))

    # --- signature prefilter for the large-corpus path (sig matrix too big
    # to broadcast): pairs exchange against the partitioned sig payload ---
    if prefilter_margin_sigmas is not None and sig_ref is None:
        PRE = pa.schema([("left_id", pa.int64()), ("right_id", pa.int64())])

        def estimate(lt: pa.Table, rt: pa.Table) -> pa.Table:
            keep = pa.array(_sig_agreement(lt, rt, num_perm) >= cutoff)
            return pa.Table.from_arrays(
                [lt.column("left_id").filter(keep),
                 lt.column("right_id").filter(keep)],
                schema=PRE)

        cand = _pair_payload_exchange(
            cand, sig_ds, ["sig"], [sig_type], estimate, PRE, n_coarse)

    # --- exact verify: broadcast corpus when it fits (see docstring) ---
    if sig_ref is not None:
        def g_nbytes(t: pa.Table) -> pa.Table:
            flat, _ = _list_flat(t.column("grams"))
            return pa.table({"nb": pa.array([int(flat.nbytes)], pa.int64())})

        corpus_bytes = sum(r["nb"] for r in sets.map_batches(
            g_nbytes, batch_format="pyarrow").take_all())
        if corpus_bytes <= corpus_broadcast_bytes:
            cand = _distinct_pairs(cand)
            tbls = [t for t in ray.get(sets.to_arrow_refs()) if len(t)]
            tbl = pa.concat_tables(tbls)
            gids = tbl.column(id_col).to_numpy(
                zero_copy_only=False).astype(np.int64)
            gflat, glens = _list_flat(tbl.column("grams"))
            corpus_ref, use_bitmap = _broadcast_corpus_ref(
                gids, gflat, glens, corpus_broadcast_bytes)
            out = cand.map_batches(
                _broadcast_verify_fn(corpus_ref, use_bitmap, threshold,
                                     _NGRAM_OUT),
                batch_format="pyarrow", batch_size=16 * 1024).materialize()
            if out.count() == 0:  # typed empty (no surviving candidates)
                return ray.data.from_arrow(_NGRAM_OUT.empty_table())
            return out

    # --- exact verify, scale path: gram sets as the exchange payload ---
    def as_payload(t: pa.Table) -> pa.Table:
        return pa.table({"join_id": pc.cast(t.column(id_col), pa.int64()),
                         "grams": t.column("grams")})

    return _pair_payload_exchange(
        cand, sets.map_batches(as_payload, batch_format="pyarrow"),
        ["grams"], [pa.list_(pa.uint64())],
        _exact_jaccard_combine(threshold, _NGRAM_OUT, col="grams"),
        _NGRAM_OUT, n_coarse,
    )


_CONTAIN_OUT = pa.schema([("left_id", pa.int64()), ("right_id", pa.int64()),
                          ("containment", pa.float64())])


def ngram_containment_join(docs: "ray.data.Dataset", n: int = 2,
                           threshold: float = 0.7, id_col: str = "doc_id",
                           text_col: str = "text", hot_tokens: int = 4096,
                           hot_partial_cap: int = 16_384,
                           n_coarse_tok: int = 509,
                           n_coarse: int = 64, ell: int = 4,
                           corpus_broadcast_bytes: int = 1 << 30
                           ) -> "ray.data.Dataset":
    """ASYMMETRIC n-gram set-containment pairs: every ORDERED pair
    (left_id, right_id, containment) with ``|A ∩ B| / |A| >= threshold``
    (A = left's gram set, B = right's); A != B, both orderings when mutual.
    The quote / subset / superset-dedup member of the family — Jaccard
    misses a short document wholly contained in a long one (the union
    dilutes it), which is exactly the contamination shape quote-detection
    and superset-dedup need. Reference parity: extension operator (the
    reference has no string operators); SQL oracle = DuckDB list_intersect
    over the identical gram definition.

    Exactness scheme — one-sided ell-EXTENDED prefix COUNTING (the
    adaptive-prefix idea of ED-Join / Xiao et al., recast for containment):
    fix the (df asc, hash) total token order. A true pair misses at most
    ``m_A = |A| - ceil(t|A|)`` of A's tokens in B, so among A's first
    ``min(|A|, m_A + ell)`` tokens at least ``req = min(ell, ceil(t|A|))``
    occur in B. The left side therefore emits its extended prefix, the
    right side emits FULL postings (containment puts NO bound on where B's
    matching tokens rank), and a pair survives iff its shared-emission
    COUNT reaches ``req`` — an exact necessary condition, enforced with
    one pair-keyed counting exchange. The only other exact prune is the
    one-sided length filter ``|B| >= ceil(t|A|)``. (The PPJoin positional
    prune is deliberately ABSENT: it may drop non-smallest emissions of a
    true pair, which is harmless under candidate DEDUP but breaks
    candidate COUNTING.)

    Why no minhash prefilter (the prefix join's weapon): signature
    agreement estimates JACCARD, and a small-in-big true containment pair
    has J ~ t|A|/|B| — arbitrarily small. At any practical num_perm the
    estimator cannot separate J=0.04 from J=0 (sigma ~ 0.025 at 64 perms),
    so the converted cutoff goes negative and the filter admits
    everything; measured on the 10x corpus it passed 172M of 172M
    candidates. The counting scheme replaces it with an EXACT filter that
    needs no signatures at all.

    Distribution (all stages bounded, the house coarse-bucket shape):
    gram sets once -> token-hash exchange (prefix + posting rows) ->
    per-token-bucket vectorized enumeration emitting PARTIAL pair counts
    (lexsort + run-length, never a pandas dedup) -> one pair-hash counting
    exchange applying ``req`` -> exact verify: broadcast popcount corpus
    under ``corpus_broadcast_bytes``, pair-payload gram exchange past it.
    Candidate volume is Sum_tok df_prefix(tok) * df(tok) — the inherent
    cost of exact containment joins (no symmetric prefix exists); the
    rare-first order keeps prefixes off the hot tokens, and the counting
    filter keeps everything downstream true-pair-sized."""
    sets = docs.map_batches(
        lambda t: _ngram_rows(t, id_col, text_col, n),
        batch_format="pyarrow",
    ).materialize()
    n_docs = sets.count()
    if n_docs < 2:
        return ray.data.from_arrow(_CONTAIN_OUT.empty_table())

    df_ref = _token_df_ref(sets, hot_tokens, hot_partial_cap)

    EMIT = pa.schema([("tok", pa.int64()), (id_col, pa.int64()),
                      ("set_len", pa.int32()), ("role", pa.int8()),
                      ("coarse", pa.int32())])

    def emit_rows(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return EMIT.empty_table()
        df_tok, df_val = ray.get(df_ref)
        flat, lens = _list_flat(t.column("grams"))
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        doc_idx = np.repeat(np.arange(len(t), dtype=np.int64), lens)
        if len(df_tok):
            dpos = np.clip(np.searchsorted(df_tok, flat), 0, len(df_tok) - 1)
            dfv = np.where(df_tok[dpos] == flat, df_val[dpos], 1)
        else:
            dfv = np.ones(len(flat), np.int64)
        order = np.lexsort((flat, dfv, doc_idx))
        starts = np.cumsum(lens) - lens
        rank_in_doc = np.arange(len(flat), dtype=np.int64) - np.repeat(
            starts, lens)
        # LEFT: ell-extended prefix = first min(|A|, m_A + ell) tokens
        # (m_A = |A| - ceil(t|A|)); RIGHT: all tokens
        m_a = lens - np.ceil(threshold * lens - 1e-9).astype(np.int64)
        p = np.minimum(lens, m_a + ell)
        tok_o = flat[order].view(np.int64)
        id_o = ids[doc_idx[order]]
        len_o = lens[doc_idx[order]].astype(np.int32)
        # `order` permutes WITHIN each doc segment only (doc_idx is the
        # primary lexsort key), so the UNpermuted 0..len-1 labels ARE the
        # sorted ranks (the prefix-join trick)
        pref_o = rank_in_doc < np.repeat(p, lens)
        tok2 = np.concatenate([tok_o[pref_o], tok_o])
        id2 = np.concatenate([id_o[pref_o], id_o])
        len2 = np.concatenate([len_o[pref_o], len_o])
        role2 = np.concatenate([np.zeros(int(pref_o.sum()), np.int8),
                                np.ones(len(tok_o), np.int8)])
        return pa.Table.from_arrays(
            [pa.array(tok2, pa.int64()), pa.array(id2, pa.int64()),
             pa.array(len2, pa.int32()), pa.array(role2, pa.int8()),
             pa.array((tok2 % n_coarse_tok).astype(np.int32), pa.int32())],
            schema=EMIT)

    emitted = sets.map_batches(emit_rows, batch_format="pyarrow")
    min_blocks = int(ray.cluster_resources().get("CPU", 8)) * 2
    if sets.num_blocks() < min_blocks:
        emitted = emitted.repartition(min_blocks)

    def contain_partials(g: pd.DataFrame) -> pd.DataFrame:
        """Per-token-bucket PARTIAL pair counts: enumerate (A-prefix row x
        B-posting row) per token under the one-sided length prune, then
        collapse duplicates with a lexsort + run-length — one (left,
        right, la, cnt) row per pair per bucket, fully vectorized."""
        tok = g["tok"].to_numpy(np.int64)
        ids = g[id_col].to_numpy(np.int64)
        slen = g["set_len"].to_numpy(np.int64)
        role = g["role"].to_numpy(np.int8)
        o = np.lexsort((slen, role, tok))
        tok, ids, slen, role = tok[o], ids[o], slen[o], role[o]
        seg = np.flatnonzero(np.r_[True, tok[1:] != tok[:-1]])
        seg_end = np.append(seg[1:], len(tok))
        out_l, out_r, out_la = [], [], []
        CH = 1_048_576
        for s, e in zip(seg, seg_end):
            nl = int(np.searchsorted(role[s:e], 1, side="left"))
            if nl == 0 or nl == e - s:
                continue
            r0 = s + nl
            r_len = slen[r0:e]  # ascending within rights
            need = np.ceil(threshold * slen[s:s + nl] - 1e-9)
            lo = r0 + np.searchsorted(r_len, need, side="left")
            cnt = np.maximum(e - lo, 0)
            if not cnt.sum():
                continue
            for ii, jj in _chunk_bounds(cnt, CH):
                c = cnt[ii:jj]
                tot = int(c.sum())
                if tot == 0:
                    continue
                offs = np.cumsum(c) - c
                li = np.repeat(np.arange(s + ii, s + jj), c)
                ri = np.arange(tot) - np.repeat(offs, c) + np.repeat(
                    lo[ii:jj], c)
                m = ids[li] != ids[ri]
                li, ri = li[m], ri[m]
                if len(li):
                    out_l.append(ids[li])
                    out_r.append(ids[ri])
                    out_la.append(slen[li])
        if not out_l:
            return pd.DataFrame({"left_id": pd.Series([], dtype=np.int64),
                                 "right_id": pd.Series([], dtype=np.int64),
                                 "la": pd.Series([], dtype=np.int64),
                                 "cnt": pd.Series([], dtype=np.int64)})
        l = np.concatenate(out_l)
        r = np.concatenate(out_r)
        la = np.concatenate(out_la)
        po = np.lexsort((r, l))
        l, r, la = l[po], r[po], la[po]
        new = np.r_[True, (l[1:] != l[:-1]) | (r[1:] != r[:-1])]
        starts_p = np.flatnonzero(new)
        counts = np.diff(np.append(starts_p, len(l)))
        return pd.DataFrame({"left_id": l[starts_p],
                             "right_id": r[starts_p],
                             "la": la[starts_p],
                             "cnt": counts.astype(np.int64)})

    partial_counts = (emitted.groupby("coarse")
                      .map_groups(contain_partials, batch_format="pandas"))

    # --- pair-keyed counting exchange: sum partials, apply the exact
    # req = min(ell, ceil(t|A|)) necessary condition -----------------------
    def add_pair_bucket(t: pa.Table) -> pa.Table:
        l = t.column("left_id").to_numpy(zero_copy_only=False)
        r = t.column("right_id").to_numpy(zero_copy_only=False)
        return t.append_column("pb", pa.array(
            ((l * 1000003 + r) % N_COARSE).astype(np.int32)))

    def count_filter(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["left_id", "right_id"], as_index=False).agg(
            la=("la", "first"), cnt=("cnt", "sum"))
        req = np.minimum(ell, np.ceil(
            threshold * agg["la"].to_numpy(np.float64) - 1e-9))
        keep = agg["cnt"].to_numpy(np.int64) >= req
        return agg.loc[keep, ["left_id", "right_id"]]

    cand = (partial_counts.map_batches(add_pair_bucket,
                                       batch_format="pyarrow")
            .groupby("pb").map_groups(count_filter, batch_format="pandas"))

    # --- exact verify ------------------------------------------------------
    def g_nbytes(t: pa.Table) -> pa.Table:
        flat, _ = _list_flat(t.column("grams"))
        return pa.table({"nb": pa.array([int(flat.nbytes)], pa.int64())})

    corpus_bytes = sum(r["nb"] for r in sets.map_batches(
        g_nbytes, batch_format="pyarrow").take_all())
    if corpus_bytes <= corpus_broadcast_bytes:
        tbls = [t for t in ray.get(sets.to_arrow_refs()) if len(t)]
        tbl = pa.concat_tables(tbls)
        gids = tbl.column(id_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        gflat, glens = _list_flat(tbl.column("grams"))
        corpus_ref, use_bitmap = _broadcast_corpus_ref(
            gids, gflat, glens, corpus_broadcast_bytes)
        jverify = _broadcast_verify_fn(corpus_ref, use_bitmap, 0.0,
                                       _NGRAM_OUT)

        def cverify(t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return _CONTAIN_OUT.empty_table()
            jt = jverify(t)  # (left, right, jaccard) for every candidate
            sid = ray.get(corpus_ref)[0]
            clen = ray.get(corpus_ref)[2] if use_bitmap else \
                ray.get(corpus_ref)[3]
            l = jt.column("left_id").to_numpy(zero_copy_only=False)
            r = jt.column("right_id").to_numpy(zero_copy_only=False)
            j = jt.column("jaccard").to_numpy(zero_copy_only=False)
            la = clen[np.searchsorted(sid, l)].astype(np.float64)
            lb = clen[np.searchsorted(sid, r)].astype(np.float64)
            # recover the INTEGER intersection from Jaccard exactly:
            # I = J(|A|+|B|)/(1+J) is an integer and doubles resolve it
            # far beyond any realistic set size
            inter = np.rint(j * (la + lb) / (1.0 + j))
            c = inter / np.maximum(la, 1.0)
            keep = c >= threshold
            return pa.Table.from_arrays(
                [pa.array(l[keep], pa.int64()),
                 pa.array(r[keep], pa.int64()),
                 pa.array(c[keep], pa.float64())],
                schema=_CONTAIN_OUT)

        out = cand.map_batches(cverify, batch_format="pyarrow",
                               batch_size=16 * 1024).materialize()
        if out.count() == 0:
            return ray.data.from_arrow(_CONTAIN_OUT.empty_table())
        return out

    # scale path: gram payload exchange with a containment combine
    def as_payload(t: pa.Table) -> pa.Table:
        return pa.table({"join_id": pc.cast(t.column(id_col), pa.int64()),
                         "grams": t.column("grams")})

    def contain_combine(lt: pa.Table, rt: pa.Table) -> pa.Table:
        lv, ll = _list_flat(lt.column("grams"))
        rv, rl = _list_flat(rt.column("grams"))
        j = _batch_jaccard_flat(lv, ll, rv, rl)
        la = ll.astype(np.float64)
        lb = rl.astype(np.float64)
        inter = np.rint(j * (la + lb) / (1.0 + j))
        c = inter / np.maximum(la, 1.0)
        keep = c >= threshold
        return pa.Table.from_arrays(
            [lt.column("left_id").filter(pa.array(keep)),
             lt.column("right_id").filter(pa.array(keep)),
             pa.array(c[keep], pa.float64())],
            schema=_CONTAIN_OUT)

    return _pair_payload_exchange(
        cand, sets.map_batches(as_payload, batch_format="pyarrow"),
        ["grams"], [pa.list_(pa.uint64())], contain_combine,
        _CONTAIN_OUT, n_coarse,
    )


# ---------------------------------------------------------------------------
# connected components over near-dup pairs -> cluster dedup
# ---------------------------------------------------------------------------

_CC_EDGES = pa.schema([("child", pa.int64()), ("parent", pa.int64())])
_CC_OUT = pa.schema([("doc_id", pa.int64()), ("cluster_id", pa.int64())])
_CC_MIX = np.uint64(0x9E3779B97F4A7C15)


def _distinct_edges(edges: "ray.data.Dataset",
                    n_coarse: int = N_COARSE) -> "ray.data.Dataset":
    """Distinct (child, parent) edges via the same coarse-bucket pattern as
    ``_distinct_pairs`` — identical edges always share a bucket, each bucket
    is one vectorized drop_duplicates, never a per-edge groupby."""

    def add_coarse(t: pa.Table) -> pa.Table:
        c = t.column("child").to_numpy(zero_copy_only=False).astype(np.uint64)
        p = t.column("parent").to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = _splitmix64_mix(c * _CC_MIX ^ p)
        return t.append_column(
            "coarse", pa.array((h % np.uint64(n_coarse)).astype(np.int32)))

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["child", "parent"]).drop(columns=["coarse"])

    return (edges.map_batches(add_coarse, batch_format="pyarrow")
            .groupby("coarse").map_groups(dedup, batch_format="pandas"))


def _edge_fingerprint(edges: "ray.data.Dataset") -> tuple[int, int]:
    """(count, order-insensitive checksum) of an edge set. Per-block partials
    (two ints per block) come back to the driver; the exact big-int sum is
    finished in Python so uint64 partial sums can never overflow an int64
    aggregate. Used only for convergence detection between rounds."""

    def fp(t: pa.Table) -> pa.Table:
        c = t.column("child").to_numpy(zero_copy_only=False).astype(np.uint64)
        p = t.column("parent").to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = _splitmix64_mix(c * _CC_MIX ^ p)
        # split the uint64 sum into two int64-safe halves for the transfer
        return pa.table({"n": pa.array([len(t)], pa.int64()),
                         "lo": pa.array([int(h.astype(np.uint32).sum())], pa.int64()),
                         "hi": pa.array([int((h >> np.uint64(32)).sum())], pa.int64())})

    rows = edges.map_batches(fp, batch_format="pyarrow").take_all()
    n = sum(r["n"] for r in rows)
    s = sum(r["lo"] for r in rows) + (sum(r["hi"] for r in rows) << 32)
    return n, s


def _star_round(edges: "ray.data.Dataset", large: bool,
                n_coarse: int) -> "ray.data.Dataset":
    """One large-star or small-star round (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14 — public algorithm).

    Edges arrive oriented child > parent. large-star groups every node with
    its FULL neighborhood (both directions) and re-points neighbors larger
    than the node at the neighborhood minimum; small-star groups each node
    with its smaller neighbors only and points all of them (and itself) at
    that minimum. Alternating the two converges to per-component stars rooted
    at the component minimum. Each round is one coarse-bucketed shuffle of
    (int64, int64) rows — never payloads."""

    def emit(t: pa.Table) -> pa.Table:
        c = t.column("child").to_numpy(zero_copy_only=False).astype(np.int64)
        p = t.column("parent").to_numpy(zero_copy_only=False).astype(np.int64)
        if large:
            node = np.concatenate([c, p])
            nbr = np.concatenate([p, c])
        else:
            node, nbr = c, p
        h = _splitmix64_mix(node.astype(np.uint64))
        return pa.table({"node": pa.array(node, pa.int64()),
                         "nbr": pa.array(nbr, pa.int64()),
                         "coarse": pa.array((h % np.uint64(n_coarse))
                                            .astype(np.int32))})

    def star(g: pd.DataFrame) -> pd.DataFrame:
        node = g["node"].to_numpy()
        nbr = g["nbr"].to_numpy()
        m = np.minimum(g.groupby("node")["nbr"].transform("min").to_numpy(),
                       node)
        if large:
            mask = nbr > node
            child, parent = nbr[mask], m[mask]
        else:
            first = ~pd.Series(node).duplicated().to_numpy()
            child = np.concatenate([nbr, node[first]])
            parent = np.concatenate([m, m[first]])
        keep = child != parent
        return pd.DataFrame({"child": child[keep], "parent": parent[keep]})

    starred = (edges.map_batches(emit, batch_format="pyarrow")
               .groupby("coarse").map_groups(star, batch_format="pandas"))
    return _distinct_edges(starred, n_coarse)


def _components_driver(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """Driver union-find for SMALL edge sets (the ``driver_cap`` fast path):
    path-halving find + min-root union, one pass over a numpy edge list.
    Each alternating-star round costs several Ray stages of fixed overhead;
    below the cap that overhead dominates the actual work by ~10x."""
    # select() normalizes column order and drops empty blocks whose schema
    # drifted (an upstream stage's no-match bucket can emit a column-less or
    # reordered empty table; concat_tables refuses mixed schemas)
    blocks = [t.select(["child", "parent"])
              for t in ray.get(edges.to_arrow_refs()) if t.num_rows]
    tbl = pa.concat_tables(blocks)
    c = tbl.column("child").to_numpy(zero_copy_only=False).astype(np.int64)
    p = tbl.column("parent").to_numpy(zero_copy_only=False).astype(np.int64)
    parent: dict = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(c.tolist(), p.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = np.fromiter(parent.keys(), np.int64, len(parent))
    roots = np.fromiter((find(int(x)) for x in nodes), np.int64, len(nodes))
    order = np.argsort(nodes, kind="stable")
    return ray.data.from_arrow(pa.Table.from_arrays(
        [pa.array(nodes[order], pa.int64()),
         pa.array(roots[order], pa.int64())], schema=_CC_OUT))


def connected_components(pairs: "ray.data.Dataset",
                         left_col: str = "left_id",
                         right_col: str = "right_id",
                         n_coarse: int = N_COARSE,
                         max_rounds: int = 64,
                         driver_cap: int = 1_000_000) -> "ray.data.Dataset":
    """Connected components over an undirected pair/edge Dataset via the
    alternating large-star/small-star algorithm (Kiveris et al., SoCC'14).
    Returns (doc_id, cluster_id) for every node that appears in an edge,
    cluster_id = the component's minimum node id — the transitive closure a
    keep-one-per-duplicate-cluster dedup needs (pairwise output alone splits
    a cluster {a,b,c} found as (a,b),(b,c) into two keeps).

    Scale: each round shuffles only (int64, int64) edge rows in ``n_coarse``
    coarse buckets; rounds converge in O(log^2 n) (typically 2-3 for near-dup
    graphs, whose components are tiny); the driver sees two ints per block
    per round (the convergence fingerprint), never edges. Edges are
    materialized between rounds — the edge set is O(candidate pairs), orders
    of magnitude smaller than the corpus."""

    def to_edges(t: pa.Table) -> pa.Table:
        l = pc.cast(t.column(left_col), pa.int64())
        r = pc.cast(t.column(right_col), pa.int64())
        child = pc.max_element_wise(l, r)
        parent = pc.min_element_wise(l, r)
        out = pa.table({"child": child, "parent": parent})
        return out.filter(pc.not_equal(child, parent))

    edges = _distinct_edges(
        pairs.map_batches(to_edges, batch_format="pyarrow"), n_coarse
    ).materialize()
    prev = _edge_fingerprint(edges)
    if prev[0] == 0:
        return ray.data.from_arrow(_CC_OUT.empty_table())
    if prev[0] <= driver_cap:
        # near-dup edge sets are orders of magnitude smaller than the corpus;
        # below the cap the driver union-find beats the per-round Ray stage
        # constants ~10x (6.9 s -> sub-second on the sf0.1 panel). The
        # distributed path below is the >cap route and stays property-tested
        # via driver_cap=0 in tests.
        return _components_driver(edges)
    for _ in range(max_rounds):
        for large in (True, False):
            edges = _star_round(edges, large, n_coarse).materialize()
        cur = _edge_fingerprint(edges)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds")

    def comp_rows(t: pa.Table) -> pa.Table:
        c = t.column("child").to_numpy(zero_copy_only=False).astype(np.int64)
        p = t.column("parent").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"doc_id": pa.array(np.concatenate([c, p]), pa.int64()),
                         "cluster_id": pa.array(np.concatenate([p, p]),
                                                pa.int64())})

    # root rows (p, p) repeat across blocks/edges -> same coarse-bucket
    # distinct pattern (doc_id alone determines the row: child->its root,
    # root->itself, and at convergence each child has exactly one parent)
    rows = edges.map_batches(comp_rows, batch_format="pyarrow")

    def add_coarse(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        h = _splitmix64_mix(d)
        return t.append_column(
            "coarse", pa.array((h % np.uint64(n_coarse)).astype(np.int32)))

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["doc_id"]).drop(columns=["coarse"])

    return (rows.map_batches(add_coarse, batch_format="pyarrow")
            .groupby("coarse").map_groups(dedup, batch_format="pandas"))


def semdedup(ds: "ray.data.Dataset", threshold: float = 0.95,
             id_col: str = "vec_id", vec_col: str = "embedding",
             method: str = "auto", broadcast_budget_rows: int = 2_000_000,
             seed: int = 42) -> "ray.data.Dataset":
    """SemDeDup-style semantic dedup (Abbas et al., arXiv:2303.09540):
    embedding-cosine duplicate CLUSTERS, keep one representative each.

    The reference engine has no semantic layer (it moves opaque bytes,
    `sink/.../S3SinkTask.java`); this is the LLM-curation composition of
    this repo's scale primitives, end to end:

    1. ``embedding_near_dup`` — cosine pairs at ``threshold``. ``auto``
       runs the exact distributed all-pairs leg under 10k vectors (the
       oracle regime) and the IVF cluster-blocked leg above it (the
       100 TB route; recall-tested in pytest).
    2. ``connected_components`` — pairwise hits to transitive duplicate
       clusters (a cluster {a,b,c} discovered as (a,b),(b,c) must drop
       TWO docs, not one per pair); int64 edge shuffles only.
    3. decision join back to the corpus: the component map is bounded by
       the number of duplicate-involved docs — broadcast once via
       ``ray.put`` below ``broadcast_budget_rows``, coarse-bucket hash
       join above it. Every id gets ``cluster_id`` (its component min, or
       itself) and ``kept`` (True iff it is the representative).

    Returns (id_col, cluster_id, kept) for EVERY input row — callers
    filter ``kept`` for the surviving corpus or join the drop set back to
    the documents table. SemDeDup proper prunes per-cluster by distance
    to a k-means centroid; the keep-min-id rule here is its deterministic,
    oracle-checkable specialization (identical drop COUNT per cluster,
    stable under replay — the property a training-data pipeline needs)."""
    pairs = embedding_near_dup(ds, threshold=threshold, id_col=id_col,
                               vec_col=vec_col, method=method, seed=seed)
    comps = connected_components(pairs).materialize()
    return keep_one_per_cluster(ds.select_columns([id_col]), comps,
                                id_col=id_col,
                                broadcast_budget_rows=broadcast_budget_rows)


def keep_one_per_cluster(ids: "ray.data.Dataset",
                         comps: "ray.data.Dataset", id_col: str = "doc_id",
                         broadcast_budget_rows: int = 2_000_000
                         ) -> "ray.data.Dataset":
    """The shared cluster-to-decision finish of every compose-then-decide
    dedup (semdedup, fuzzy_key_dedup): join the (doc_id, cluster_id)
    component table back onto the FULL id set — broadcast once under
    ``broadcast_budget_rows``, coarse-bucket hash join above — and emit
    (id, cluster_id, kept) for EVERY id, where singletons cluster as
    themselves and ``kept`` is the deterministic keep-min-id rule."""
    from ..stages.joins import broadcast_join, hash_join

    def finish(t: pa.Table) -> pa.Table:
        mine = pc.cast(t.column(id_col), pa.int64())
        cl = pc.coalesce(pc.cast(t.column("cluster_id"), pa.int64()), mine)
        return pa.table({id_col: mine, "cluster_id": cl,
                         "kept": pc.equal(mine, cl)})

    n_comp = comps.count()
    if n_comp == 0:  # no duplicates anywhere: every row keeps itself

        def all_kept(t: pa.Table) -> pa.Table:
            mine = pc.cast(t.column(id_col), pa.int64())
            return pa.table({id_col: mine, "cluster_id": mine,
                             "kept": pa.array(np.ones(len(t), bool))})

        return ids.map_batches(all_kept, batch_format="pyarrow")
    if n_comp <= broadcast_budget_rows:
        cdf = comps.to_pandas().rename(columns={"doc_id": id_col})
        joined = broadcast_join(ids, cdf, on=id_col, how="left")
    else:
        joined = hash_join(ids, comps, on=id_col, right_on="doc_id",
                           join_type="left")
    return joined.map_batches(finish, batch_format="pyarrow")
