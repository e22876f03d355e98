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
    """Keep the min-id row per distinct (normalized) text. The groupby on the
    fingerprint hash-partitions content across the cluster; per group we keep
    the first row after an in-group sort — no global sort, no driver state."""
    from .text import add_fingerprint

    ds = ds.map_batches(add_fingerprint, batch_format="pyarrow")

    def keep_min(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_col, kind="stable").head(1)

    out = ds.groupby("fingerprint").map_groups(keep_min, batch_format="pandas")
    return out.drop_columns(["fingerprint"])


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Hashes of character k-shingles of a lowercased text (numpy rolling)."""
    b = np.frombuffer(text.lower().encode("utf-8", "ignore"), dtype=np.uint8)
    if len(b) < k:
        b = np.pad(b, (0, k - len(b)))
    win = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
    coef = np.uint64(257) ** np.arange(k, dtype=np.uint64)
    return np.unique((win * coef).sum(axis=1))


class MinHasher:
    """Actor-pool stage: doc -> minhash signature -> LSH band rows.

    ``__init__`` draws the (a, b) hash coefficients once per actor from a fixed
    seed; ``__call__`` emits ``bands`` rows per doc: (doc_id, band, bucket)
    where bucket is a hash of the band's signature slice. Docs sharing any
    (band, bucket) are near-dup candidates."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_k: int = 5,
                 seed: int = 42, id_col: str = "doc_id", text_col: str = "text"):
        assert num_perm % bands == 0
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm, self.bands, self.k = num_perm, bands, shingle_k
        self.rows_per_band = num_perm // bands
        self.id_col, self.text_col = id_col, text_col

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text or "", self.k)
        # (P, S) permuted hashes -> min per permutation
        h = (np.outer(self.a, sh) + self.b[:, None]) % _MERSENNE
        return h.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        out_id, out_band, out_bucket = [], [], []
        for i, t in zip(ids, texts):
            sig = self.signature(t).reshape(self.bands, self.rows_per_band)
            buckets = pd.util.hash_array(
                np.ascontiguousarray(sig[:, 0] * np.uint64(31) + sig[:, -1])
            ).view(np.int64)  # bit-reinterpret: int64 shuffles everywhere
            out_id.extend([i] * self.bands)
            out_band.extend(range(self.bands))
            out_bucket.extend(buckets.tolist())
        return pa.table(
            {
                self.id_col: pa.array(out_id),
                "band": pa.array(out_band, pa.int32()),
                "bucket": pa.array(out_bucket, pa.int64()),
            }
        )


def _bucket_pairs(g: pd.DataFrame, id_col: str, cap: int = 64) -> pd.DataFrame:
    ids = np.sort(g[id_col].unique())[:cap]  # cap guards pathological buckets
    if len(ids) < 2:
        return pd.DataFrame({"left_id": [], "right_id": []})
    li, ri = np.triu_indices(len(ids), k=1)
    return pd.DataFrame({"left_id": ids[li], "right_id": ids[ri]})


def minhash_lsh_candidates(ds: "ray.data.Dataset", id_col: str = "doc_id",
                           text_col: str = "text", num_perm: int = 64,
                           bands: int = 16, shingle_k: int = 5) -> "ray.data.Dataset":
    """Candidate near-dup pairs via MinHash LSH. Returns distinct
    (left_id, right_id) with left < right."""
    band_rows = ds.map_batches(
        MinHasher(num_perm, bands, shingle_k, id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
    )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        return _bucket_pairs(g, id_col)

    cand = band_rows.groupby(["band", "bucket"]).map_groups(pairs, batch_format="pandas")

    def dedup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return cand.groupby(["left_id", "right_id"]).map_groups(dedup_pairs, batch_format="pandas")


def jaccard_verify(pairs: "ray.data.Dataset", docs: "ray.data.Dataset",
                   threshold: float = 0.6, id_col: str = "doc_id",
                   text_col: str = "text", shingle_k: int = 5) -> "ray.data.Dataset":
    """Exact k-shingle Jaccard over candidate pairs. The doc texts are
    broadcast once via ray.put (small-side lookup: candidates << corpus); at
    larger candidate sets swap this for a partitioned hash join on id."""
    lookup_ref = ray.put(dict(zip(
        docs.to_pandas()[id_col].tolist(), docs.to_pandas()[text_col].tolist()
    )))

    class Verify:
        def __init__(self):
            self.lookup = ray.get(lookup_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            sims = []
            for l, r in zip(batch.column("left_id").to_pylist(),
                            batch.column("right_id").to_pylist()):
                a = _shingle_hashes(self.lookup.get(l, ""), shingle_k)
                b = _shingle_hashes(self.lookup.get(r, ""), shingle_k)
                inter = np.intersect1d(a, b, assume_unique=True).size
                union = a.size + b.size - inter
                sims.append(inter / union if union else 0.0)
            batch = batch.append_column("jaccard", pa.array(sims, pa.float64()))
            return batch.filter(pa.compute.greater_equal(batch.column("jaccard"), threshold))

    return pairs.map_batches(Verify, batch_format="pyarrow", concurrency=2)


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

    def simhash(self, text: str) -> np.uint64:
        toks = np.array((text or "").lower().split(), dtype=object)
        if toks.size == 0:
            return np.uint64(0)
        h = _stable_token_hash(toks)
        votes = ((h[:, None] & self.bits) != 0).sum(axis=0) * 2 - len(h)
        return np.uint64((self.bits[votes > 0]).sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        sh = np.array([self.simhash(t) for t in texts], dtype=np.uint64)
        tbl = {self.id_col: pa.array(ids), "simhash": pa.array(sh, pa.uint64())}
        for b in range(4):
            tbl[f"band{b}"] = pa.array(
                ((sh >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.uint32),
                pa.uint32(),
            )
        return pa.table(tbl)


def simhash_candidates(ds: "ray.data.Dataset", id_col: str = "doc_id",
                       text_col: str = "text", max_hamming: int = 3) -> "ray.data.Dataset":
    """Near-dup pairs with Hamming(simhash) <= max_hamming via band grouping."""
    sigs = ds.map_batches(SimHasher(id_col, text_col), batch_format="pyarrow")

    frames = []
    for b in range(4):
        def pairs(g: pd.DataFrame, _b=b) -> pd.DataFrame:
            g = g.sort_values(id_col).head(64)
            ids = g[id_col].to_numpy()
            hs = g["simhash"].to_numpy(dtype=np.uint64)
            if len(ids) < 2:
                return pd.DataFrame({"left_id": [], "right_id": [], "hamming": []})
            li, ri = np.triu_indices(len(ids), k=1)
            ham = np.array([bin(int(hs[i]) ^ int(hs[j])).count("1") for i, j in zip(li, ri)])
            keep = ham <= max_hamming
            return pd.DataFrame(
                {"left_id": ids[li][keep], "right_id": ids[ri][keep], "hamming": ham[keep]}
            )

        frames.append(sigs.groupby(f"band{b}").map_groups(pairs, batch_format="pandas"))
    allp = frames[0].union(*frames[1:])

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return allp.groupby(["left_id", "right_id"]).map_groups(first, batch_format="pandas")


# ---------------------------------------------------------------------------
# embedding near-dup
# ---------------------------------------------------------------------------

def embedding_near_dup(ds: "ray.data.Dataset", threshold: float = 0.95,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       n_planes: int = 8, seed: int = 42) -> "ray.data.Dataset":
    """Cosine near-duplicate pairs over an embedding column: random-hyperplane
    LSH bucket (one sign-pattern int per vector, computed by a batched matmul)
    -> within-bucket exact cosine. Vectors in different buckets are never
    compared (the scale path); raise n_planes to shrink buckets."""

    class Bucket:
        def __init__(self):
            rng = np.random.default_rng(seed)
            self.planes = None

        def __call__(self, batch: pa.Table) -> pa.Table:
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

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        mat = np.stack(g["normed"].to_list())
        sim = mat @ mat.T
        li, ri = np.triu_indices(len(ids), k=1)
        keep = sim[li, ri] >= threshold
        order = np.argsort(ids)  # determinism under shuffle
        return pd.DataFrame(
            {"left_id": ids[li][keep], "right_id": ids[ri][keep],
             "cosine": sim[li, ri][keep]}
        ).sort_values(["left_id", "right_id"], kind="stable")

    bucketed = ds.map_batches(Bucket, batch_format="pyarrow", concurrency=2)
    return bucketed.groupby("bucket").map_groups(pairs, batch_format="pandas")
