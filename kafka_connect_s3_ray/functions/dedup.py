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

import ray
import ray.data

_MERSENNE = np.uint64((1 << 61) - 1)


def _stable_token_hash(tokens: np.ndarray) -> np.ndarray:
    """Deterministic uint64 hashes for string tokens (fixed-key SipHash)."""
    return pd.util.hash_array(tokens.astype(object), categorize=False)


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
    ``q_dedup_exact`` keeps md5 only for DuckDB parity). No per-row Python,
    no global sort, no driver state."""
    import pyarrow.compute as pc

    def norm_coarse(t: pa.Table) -> pa.Table:
        norm = pc.utf8_lower(
            pc.utf8_trim_whitespace(pc.fill_null(t.column(text_col), ""))
        )
        h = pd.util.hash_array(norm.to_numpy(zero_copy_only=False).astype(object))
        t = t.append_column("_norm", norm)
        return t.append_column(
            "coarse", pa.array((h % np.uint64(N_COARSE)).astype(np.int32))
        )

    ds = ds.map_batches(norm_coarse, batch_format="pyarrow")

    def keep_min(g: pd.DataFrame) -> pd.DataFrame:
        keep = g.loc[g.groupby("_norm")[id_col].idxmin()]
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

    def _signatures(self, texts: list[str]) -> np.ndarray:
        """(num_perm, n_docs) minhash signature matrix, fully vectorized —
        including shingle extraction (one batch pass, no per-doc loop)."""
        flat, lens = _shingle_sets_batch(texts, self.k)
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        sigs = np.empty((self.num_perm, len(texts)), dtype=np.uint64)
        chunk = max(1, (16 << 20) // max(1, flat.nbytes))  # ~16 MB per slab
        with np.errstate(over="ignore"):
            for p0 in range(0, self.num_perm, chunk):
                a = self.a[p0 : p0 + chunk, None]
                b = self.b[p0 : p0 + chunk, None]
                h = a * flat[None, :] + b  # uint64 wraparound = mod 2^64
                sigs[p0 : p0 + chunk] = np.minimum.reduceat(h, starts, axis=1)
        return sigs

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
        sigs = self._signatures(texts).reshape(
            self.bands, self.rows_per_band, n
        )
        band_key = np.zeros((self.bands, n), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for r in range(self.rows_per_band):  # fold ALL rows of the band
                band_key = band_key * np.uint64(1000003) + sigs[:, r, :]
        band_key = np.ascontiguousarray(band_key.ravel())
        buckets = pd.util.hash_array(band_key).view(np.int64)  # (bands*n,)
        return pa.table(
            {
                self.id_col: pa.array(np.tile(ids, self.bands)),
                "band": pa.array(np.repeat(np.arange(self.bands, dtype=np.int32), n)),
                "bucket": pa.array(buckets, pa.int64()),
            }
        )


def _pairs_by_bucket(g: pd.DataFrame, id_col: str, bucket_cols: "str | list[str]",
                     cap: int = 64) -> pd.DataFrame:
    """All (left < right) id pairs sharing a bucket value — vectorized
    (bucket-size filter + self-merge), no per-bucket Python. ``cap`` drops
    pathological buckets (a bucket of size B emits B^2/2 pairs)."""
    bucket_cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    sizes = g.groupby(bucket_cols)[id_col].transform("size")
    g = g.loc[(sizes > 1) & (sizes <= cap), bucket_cols + [id_col]]
    if g.empty:
        id_dtype = g[id_col].dtype
        return pd.DataFrame({"left_id": pd.Series([], dtype=id_dtype),
                             "right_id": pd.Series([], dtype=id_dtype)})
    m = g.merge(g, on=bucket_cols, suffixes=("_l", "_r"))
    m = m[m[f"{id_col}_l"] < m[f"{id_col}_r"]]
    out = m.rename(columns={f"{id_col}_l": "left_id", f"{id_col}_r": "right_id"})
    return out[["left_id", "right_id"]].drop_duplicates()


N_COARSE = 64  # coarse-bucket count for high-cardinality groupbys


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


def _batch_jaccard(left_sets: list[np.ndarray], right_sets: list[np.ndarray]) -> np.ndarray:
    """Jaccard similarity for a BATCH of (left, right) shingle-set pairs in one
    concatenated lexsort pass — no per-pair Python work.

    Each set is a unique-sorted uint64 array; within a pair each side is
    duplicate-free, so after sorting all (pair_id, hash) rows, an adjacent
    equal pair can only be a cross-side match — counting them per pair_id via
    bincount yields the intersection sizes."""
    npairs = len(left_sets)
    if npairs == 0:
        return np.empty(0, np.float64)
    llen = np.fromiter((len(a) for a in left_sets), np.int64, npairs)
    rlen = np.fromiter((len(a) for a in right_sets), np.int64, npairs)
    pid = np.concatenate([np.repeat(np.arange(npairs), llen),
                          np.repeat(np.arange(npairs), rlen)])
    h = np.concatenate(
        [np.concatenate(left_sets) if llen.sum() else np.empty(0, np.uint64),
         np.concatenate(right_sets) if rlen.sum() else np.empty(0, np.uint64)]
    )
    order = np.lexsort((h, pid))
    ph, hh = pid[order], h[order]
    dup = (ph[1:] == ph[:-1]) & (hh[1:] == hh[:-1])
    inter = np.bincount(ph[1:][dup], minlength=npairs)
    union = llen + rlen - inter
    return np.where(union > 0, inter / np.maximum(union, 1), 0.0)


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


def jaccard_verify(pairs: "ray.data.Dataset", docs: "ray.data.Dataset",
                   threshold: float = 0.6, id_col: str = "doc_id",
                   text_col: str = "text", shingle_k: int = 5,
                   broadcast_threshold: int = 50_000,
                   concurrency: int = 8) -> "ray.data.Dataset":
    """Exact k-shingle Jaccard over candidate pairs, batch-vectorized
    (``_batch_jaccard``: one lexsort per batch, no per-pair loop).

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
                             concurrency=concurrency, batch_size=4096)


def _jaccard_verify_joined(pairs: "ray.data.Dataset", docs: "ray.data.Dataset",
                           threshold: float, id_col: str, text_col: str,
                           shingle_k: int, n_coarse: int = 64) -> "ray.data.Dataset":
    """Partitioned verify path for large candidate sets — a double-sided
    repartition join expressed as ONE union + two sequential coarse-bucket
    shuffles (two chained hash_joins would nest union-inside-union, which this
    Ray release's executor cannot schedule):

    1. each pair emits two rows keyed by its left / right doc id; shingle
       rows key by doc id; union -> groupby coarse(doc id) attaches the
       shingle set to each pair side (vectorized searchsorted lookup).
    2. groupby coarse(pair) reunites a pair's two sides; the batched
       ``_batch_jaccard`` kernel scores each bucket.

    Shuffle volume = 2 id-rows per pair + one shingle set per doc side —
    never texts, never driver state."""
    sh_type = pa.list_(pa.uint64())
    sh = docs.map_batches(ShingleSets(id_col, text_col, shingle_k),
                          batch_format="pyarrow")

    def pair_rows(t: pa.Table) -> pa.Table:
        l = t.column("left_id").to_numpy(zero_copy_only=False).astype(np.int64)
        r = t.column("right_id").to_numpy(zero_copy_only=False).astype(np.int64)
        jid = np.concatenate([l, r])
        return pa.table(
            {
                "join_id": pa.array(jid, pa.int64()),
                "left_id": pa.array(np.concatenate([l, l]), pa.int64()),
                "right_id": pa.array(np.concatenate([r, r]), pa.int64()),
                "side": pa.array(["L"] * len(l) + ["R"] * len(r), pa.string()),
                "shingles": pa.nulls(2 * len(l), sh_type),
                "coarse": pa.array((jid % n_coarse).astype(np.int32)),
            }
        )

    def shingle_rows(t: pa.Table) -> pa.Table:
        d = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "join_id": pa.array(d, pa.int64()),
                "left_id": pa.nulls(len(t), pa.int64()),
                "right_id": pa.nulls(len(t), pa.int64()),
                "side": pa.array(["S"] * len(t), pa.string()),
                "shingles": t.column("shingles").cast(sh_type),
                "coarse": pa.array((d % n_coarse).astype(np.int32)),
            }
        )

    both = pairs.map_batches(pair_rows, batch_format="pyarrow").union(
        sh.map_batches(shingle_rows, batch_format="pyarrow")
    )

    ATTACHED = pa.schema([("left_id", pa.int64()), ("right_id", pa.int64()),
                          ("side", pa.string()), ("shingles", sh_type),
                          ("coarse2", pa.int32())])

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
        attached = s.column("shingles").take(pa.array(order[pos[valid]]))
        l = p.column("left_id").to_numpy(zero_copy_only=False).astype(np.int64)
        r = p.column("right_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.Table.from_arrays(
            [p.column("left_id"), p.column("right_id"), p.column("side"),
             attached.combine_chunks() if isinstance(attached, pa.ChunkedArray) else attached,
             pa.array(((l * 1000003 + r) % n_coarse).astype(np.int32))],
            schema=ATTACHED,
        )

    attached = both.groupby("coarse").map_groups(attach, batch_format="pyarrow")

    OUT = pa.schema([("left_id", pa.int64()), ("right_id", pa.int64()),
                     ("jaccard", pa.float64())])

    def combine(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        df_l = g.filter(pc.equal(g.column("side"), "L")).to_pandas()
        df_r = g.filter(pc.equal(g.column("side"), "R")).to_pandas()
        m = df_l.merge(df_r, on=["left_id", "right_id"], suffixes=("_l", "_r"))
        if m.empty:
            return OUT.empty_table()
        lsets = [np.asarray(x, np.uint64) for x in m["shingles_l"]]
        rsets = [np.asarray(x, np.uint64) for x in m["shingles_r"]]
        sims = _batch_jaccard(lsets, rsets)
        keep = sims >= threshold
        return pa.Table.from_arrays(
            [pa.array(m["left_id"].to_numpy()[keep], pa.int64()),
             pa.array(m["right_id"].to_numpy()[keep], pa.int64()),
             pa.array(sims[keep], pa.float64())],
            schema=OUT,
        )

    return attached.groupby("coarse2").map_groups(combine, batch_format="pyarrow")


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


def embedding_near_dup(ds: "ray.data.Dataset", threshold: float = 0.95,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       n_planes: int = 8, seed: int = 42,
                       method: str = "auto", exact_max_rows: int = 100_000,
                       bucket_cap: int = 4096,
                       max_extra_rounds: int = 4) -> "ray.data.Dataset":
    """Cosine near-duplicate pairs over an embedding column.

    Two paths:
    - ``exact`` (default for corpora <= ``exact_max_rows``): EXACT all-pairs,
      distributed — the normalized corpus matrix is broadcast once via
      ``ray.put`` (e.g. 100k x 64 float64 = 51 MB) and every Dataset batch
      does a chunked matmul against it, emitting only its own rows' pairs
      (row id < col id, so each unordered pair is produced exactly once,
      no dedup shuffle). Matches a SQL cross-join oracle bit-for-bit.
    - ``lsh`` (the 100 TB path): random-hyperplane bucket (one sign-pattern
      int per vector) -> within-bucket pairs. Vectors in different buckets
      are never compared. Dense buckets (common in real embedding corpora)
      are handled two ways: a bucket over ``bucket_cap`` is recursively
      RE-SPLIT with extra seeded hyperplanes (up to ``max_extra_rounds``),
      and any residual dense bucket (e.g. thousands of near-identical
      vectors whose signs never diverge) falls back to the CHUNKED matmul —
      bounded memory, still exact within the bucket.
    """
    if method == "auto":
        # for a plain parquet read this count() is file-metadata only
        method = "exact" if ds.count() <= exact_max_rows else "lsh"
    if method == "exact":
        return _embedding_near_dup_exact(ds, threshold, id_col, vec_col)

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

    bucketed = ds.map_batches(Bucket, batch_format="pyarrow", concurrency=2)
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

    return ds.map_batches(PairsVsCorpus, batch_format="pyarrow", concurrency=2,
                          batch_size=8 * 1024)
