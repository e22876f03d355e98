"""Edit-distance (Levenshtein) similarity join over fixed-width string keys.

The record-linkage / fuzzy-key member of the dedup family: find all pairs of
documents whose WIDTH-codepoint key prefix is within ``k`` edits — the
classic blocking primitive for near-identical titles, IDs-with-typos, and
template-generated text where token-level Jaccard (``ngram_prefix_join``) is
too coarse. Reference parity: the reference engine has no string operators
(records are opaque bytes, common/.../AlreadyBytesConverter.java:16-23);
this is an extension operator in the SURVEY §2.11 family.

Exactness strategy (PassJoin-style segment pigeonhole, Li et al. VLDB'11):
partition each key into ``k + 1`` contiguous segments. If ``ed(a, b) <= k``
then at least one segment of ``a`` is untouched by every edit, and its exact
text occurs in ``b`` at an offset shifted by at most the number of
insertions/deletions before it — i.e. within ``±k`` of its own offset. So
joining { (slot, segment-text) } of every string against
{ (slot, every window of the segment length within ±k of that slot's
offset) } of every string surfaces EVERY true pair at least once; the
vectorized banded DP then verifies candidates exactly. Window texts are
compared via a mixed 64-bit hash: equal windows always hash equal (recall
stays 1.0), collisions only add false CANDIDATES, which the DP kills.

Distribution (the house coarse-bucket shape):
1. one pass builds the (id, key) table and the codepoint matrix per block;
   segment/window rows (≈ (k+1) + (k+1)(2k+1) rows per key, ~46 at the
   defaults) flow into ONE hash exchange on the window hash;
2. per-bucket sorted searchsorted match emits candidate id pairs in bounded
   chunks (hot windows never materialize a df_i x df_p cross product wider
   than the chunk), canonicalized and bucket-deduped, then globally
   deduped pair-keyed (``_distinct_pairs``);
3. exact verify: the (id -> codepoint row) corpus broadcasts ONCE via
   ``ray.put`` below ``corpus_broadcast_bytes`` (4 x WIDTH bytes per key —
   40 MB at a million keys) and pairs stream through the vectorized
   Levenshtein DP; above the budget the pair-payload exchange ships each
   pair's two keys instead (``_pair_payload_exchange``), same combine.

Scale posture: emission is O(k^2) rows per key, candidates are
window-selective (4-codepoint exact match at a pinned slot), verify is
candidate-bound — no stage holds more than a bucket. The one assumption is
WIDTH-codepoint fixed keys: shorter keys are excluded (the oracle mirrors
this), which is the honest contract for a fuzzy KEY join; variable-length
PassJoin (length-grouped segment widths) is the documented extension if a
corpus ever needs it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

_PAIR_OUT = pa.schema([("left_id", pa.int64()), ("right_id", pa.int64()),
                       ("dist", pa.int64())])

# multiplicative mixing constants (splitmix64 finalizer style)
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)


def _hash_windows(mat: np.ndarray, off: int, seg: int) -> np.ndarray:
    """64-bit mixed hash of the ``seg`` codepoints at column ``off`` of
    every row — equal windows hash equal (exact recall); collisions only
    create extra candidates for the DP to reject."""
    h = np.full(mat.shape[0], np.uint64(0x9E3779B97F4A7C15))
    for j in range(off, off + seg):
        h = (h ^ mat[:, j].astype(np.uint64)) * _MIX1
        h ^= h >> np.uint64(31)
    return h


def _codepoint_matrix(keys: np.ndarray, width: int) -> np.ndarray:
    """(N, width) uint32 codepoint matrix from an object array of
    equal-length strings — numpy's fixed-width unicode dtype IS the
    codepoint layout, so this is one view, no per-char Python."""
    if len(keys) == 0:
        return np.empty((0, width), np.uint32)
    u = keys.astype(f"U{width}")
    return u.view(np.uint32).reshape(len(keys), width)


def _lev_banded(A: np.ndarray, B: np.ndarray, k: int) -> np.ndarray:
    """Thresholded Levenshtein for P aligned pairs of equal-width codepoint
    rows: exact distance where it is <= k, and k+1 (a sentinel meaning
    "over threshold") elsewhere. Two classic cuts over ``_lev_vectorized``:
    the ±k BAND (equal widths: a cell with |i-j| > k needs > k indels, so
    the band bounds every <= k path — W(2k+1) vector ops instead of W^2)
    and ALIVE-PAIR COMPACTION (once a pair's row minimum exceeds k it can
    never recover — rows are >= monotone in DP distance — so the working
    set shrinks to true-ish pairs after a few rows; candidates outnumber
    true pairs ~70:1 after the bag prune, making this the verify's main
    lever: measured 16.4 s -> ~3 s on the 9.4M-candidate 10x corpus)."""
    P, W = A.shape
    out = np.full(P, k + 1, np.int32)
    if P == 0:
        return out
    idx = np.arange(P)
    band = 2 * k + 1
    BIG = np.int32(k + 2)
    # row i stores cells j in [i-k, i+k] at band offset j - (i-k)
    prev = np.empty((P, band), np.int32)
    for o in range(band):
        j = o - k  # row 0: cell j = distance j (j >= 0), else invalid
        prev[:, o] = j if j >= 0 else BIG
    for i in range(1, W + 1):
        n = A.shape[0]  # live pair count (shrinks under compaction)
        cur = np.full((n, band), BIG, np.int32)
        jlo, jhi = max(0, i - k), min(W, i + k)
        ai = A[:, i - 1]
        for j in range(jlo, jhi + 1):
            o = j - (i - k)  # offset in cur's band
            po = j - (i - 1 - k)  # same cell j in prev's band
            best = np.full(n, BIG, np.int32)
            if 0 <= po < band:  # deletion: prev[j] + 1
                np.minimum(best, prev[:, po] + 1, out=best)
            if o > 0:  # insertion: cur[j-1] + 1
                np.minimum(best, cur[:, o - 1] + 1, out=best)
            if j > 0 and 0 <= po - 1 < band:  # sub/match: prev[j-1] + cost
                cost = (ai != B[:, j - 1]).astype(np.int32)
                np.minimum(best, prev[:, po - 1] + cost, out=best)
            cur[:, o] = best
        # alive compaction: row minima are monotone non-decreasing in i
        alive = cur.min(axis=1) <= k
        if not alive.all():
            if not alive.any():
                return out
            cur, A, B = cur[alive], A[alive], B[alive]
            idx = idx[alive]
        prev = cur
    # final cell is j = W at row W: offset W - (W - k) = k
    d = prev[:, k]
    ok = d <= k
    out[idx[ok]] = d[ok]
    return out


def _lev_vectorized(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Exact Levenshtein distance for P aligned pairs of equal-width
    codepoint rows, vectorized ACROSS pairs: the (W+1)^2 DP runs as W^2
    numpy ops over all P pairs at once — never a per-pair Python loop."""
    P, W = A.shape
    prev = np.broadcast_to(np.arange(W + 1, dtype=np.int32),
                           (P, W + 1)).copy()
    cur = np.empty((P, W + 1), np.int32)
    for i in range(1, W + 1):
        cur[:, 0] = i
        cost = (A[:, i - 1][:, None] != B).astype(np.int32)  # (P, W)
        for j in range(1, W + 1):
            np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1, out=cur[:, j])
            np.minimum(cur[:, j], prev[:, j - 1] + cost[:, j - 1],
                       out=cur[:, j])
        prev, cur = cur, prev
    return prev[:, W].copy()


def keyed_table(t: pa.Table, id_col: str, text_col: str,
                width: int) -> pa.Table:
    """(kid, key) rows for the WIDTH-codepoint fixed key contract shared by
    the join and the dedup composition. Single-byte (ASCII) keys only, on
    BOTH engines: DuckDB's levenshtein counts BYTES while this kernel
    counts codepoints, so a multibyte key would measure differently there —
    excluding them (byte length == codepoint length == width) keeps the
    contract identical; the oracle mirrors with octet_length(encode(s)) =
    width."""
    txt = t.column(text_col)
    sl = pc.utf8_slice_codeunits(txt, 0, width)
    keep = pc.and_(pc.and_(pc.is_valid(sl),
                           pc.equal(pc.utf8_length(sl), width)),
                   pc.equal(pc.binary_length(sl), width))
    f = t.filter(keep)
    return pa.table({
        "kid": pc.cast(f.column(id_col), pa.int64()),
        "key": pc.cast(pc.utf8_slice_codeunits(f.column(text_col), 0,
                                               width), pa.string())})


def edit_distance_join(docs: "ray.data.Dataset", k: int = 4,
                       width: int = 20, id_col: str = "doc_id",
                       text_col: str = "text", n_coarse: int = 64,
                       corpus_broadcast_bytes: int = 1 << 30,
                       pair_chunk: int = 1 << 20,
                       keys_ds: "ray.data.Dataset | None" = None,
                       max_pairs: "int | None" = None,
                       on_budget: str = "raise") -> "ray.data.Dataset":
    """All pairs (left_id < right_id, dist) with Levenshtein distance
    ``<= k`` between the first ``width`` codepoints of ``text_col``; keys
    shorter than ``width`` are excluded (fixed-width fuzzy-key contract,
    mirrored by the SQL oracle). Pass a pre-materialized ``keys_ds``
    (``keyed_table`` output for the SAME width) to skip the keying scan —
    compositions that need the valid-id set anyway (fuzzy_key_dedup) key
    the corpus once instead of twice.

    ``max_pairs`` is the output guard rail every other join here has: this
    is the one operator whose result size is a property of the DATA (a
    template-heavy corpus can emit quadratically many true pairs), so a
    100 TB run wants an explicit ceiling. ``on_budget="raise"`` (default)
    fails loudly naming the overflow; ``"truncate"`` keeps the
    deterministic (left_id, right_id)-sorted prefix and logs how many pairs
    were dropped."""
    if k < 1 or width < (k + 1):
        raise ValueError("edit_distance_join needs k >= 1 and width > k")
    if on_budget not in ("raise", "truncate"):
        raise ValueError(f"unknown on_budget: {on_budget!r}")

    def enforce_budget(pairs_ds: "ray.data.Dataset") -> "ray.data.Dataset":
        if max_pairs is None:
            return pairs_ds
        pairs_ds = pairs_ds.materialize()
        n = pairs_ds.count()
        if n <= max_pairs:
            return pairs_ds
        if on_budget == "raise":
            raise ValueError(
                f"edit_distance_join: {n} result pairs exceed "
                f"max_pairs={max_pairs} — raise the budget, tighten k, or "
                f"pass on_budget='truncate'")
        import logging

        logging.getLogger(__name__).warning(
            "edit_distance_join: truncating %d of %d result pairs to "
            "max_pairs=%d (deterministic (left_id, right_id) order)",
            n - max_pairs, n, max_pairs)
        return pairs_ds.sort(["left_id", "right_id"]).limit(max_pairs)
    seg_starts = [round(i * width / (k + 1)) for i in range(k + 1)]
    seg_lens = [seg_starts[i + 1] - seg_starts[i] for i in range(k)] + \
        [width - seg_starts[k]]
    seg = min(seg_lens)
    # uniform windows of the SHORTEST segment length keep the hash kernel
    # one-shape; a longer segment's pigeonhole guarantee transfers to its
    # leading `seg` codepoints (an untouched segment has an untouched prefix)
    del seg_lens

    if keys_ds is None:
        keys_ds = docs.map_batches(
            lambda t: keyed_table(t, id_col, text_col, width),
            batch_format="pyarrow").materialize()

    # --- broadcast corpus (codepoints + char-bag) when it fits ------------
    # The bag powers an EXACT in-kernel prefilter: for equal-width strings
    # every edit changes the L1 distance of character counts by at most 2,
    # so ed >= L1/2; hashed 64-bin counts only MERGE bins (L1_binned <=
    # L1_true), keeping the bound safe. Template corpora share hot 4-char
    # windows ("the ", "ing ") across wildly different keys, so candidates
    # are ~10^3 x the answer without this — the bag kills them before the
    # pair ever leaves its bucket. Above the broadcast budget the prefilter
    # is skipped and the payload exchange carries verification alone.
    n_keys = keys_ds.count()
    corpus_bytes = n_keys * (8 + 4 * width + 64)
    corpus_ref = None
    if corpus_bytes <= corpus_broadcast_bytes:
        tbls = [t for t in ray.get(keys_ds.to_arrow_refs()) if len(t)]
        if not tbls:
            return ray.data.from_arrow(_PAIR_OUT.empty_table())
        tbl = pa.concat_tables(tbls)
        cids = tbl.column("kid").to_numpy(zero_copy_only=False)
        cmat = _codepoint_matrix(
            np.asarray(tbl.column("key").to_pylist(), dtype=object), width)
        o = np.argsort(cids, kind="stable")
        cids, cmat = cids[o], np.ascontiguousarray(cmat[o])
        # column-wise add into a preallocated int16 bag: no N*width int64
        # index temporaries (a bincount over N*64 would transiently cost
        # ~7x the broadcast budget on the driver)
        binned = (cmat % np.uint32(61)).astype(np.int16)
        cbag = np.zeros((len(cids), 64), np.int16)
        rows = np.arange(len(cids))
        for j in range(width):
            np.add.at(cbag, (rows, binned[:, j]), 1)
        corpus_ref = ray.put((cids, cmat, cbag))

    def emit(t: pa.Table) -> pa.Table:
        ids = t.column("kid").to_numpy(zero_copy_only=False)
        keys = np.asarray(t.column("key").to_pylist(), dtype=object)
        mat = _codepoint_matrix(keys, width)
        # hash every window offset ONCE; the ±k ranges of adjacent slots
        # overlap ~3x, so slots index this cache instead of re-hashing
        hcache = [_hash_windows(mat, off, seg)
                  for off in range(width - seg + 1)]
        out_h, out_id, out_role = [], [], []
        for slot, start in enumerate(seg_starts):
            salt = np.uint64(slot * 0x9E37)
            # index role: the segment's own window
            out_h.append(hcache[start] ^ salt)
            out_id.append(ids)
            out_role.append(np.zeros(len(ids), np.int8))
            # probe role: every window within ±k of the slot offset
            for off in range(max(0, start - k),
                             min(width - seg, start + k) + 1):
                out_h.append(hcache[off] ^ salt)
                out_id.append(ids)
                out_role.append(np.ones(len(ids), np.int8))
        h = np.concatenate(out_h) if out_h else np.empty(0, np.uint64)
        return pa.table({
            "wkey": pa.array(h.view(np.int64), pa.int64()),
            "kid": pa.array(np.concatenate(out_id) if out_id else
                            np.empty(0, np.int64), pa.int64()),
            "role": pa.array(np.concatenate(out_role) if out_role else
                             np.empty(0, np.int8), pa.int8()),
            "bucket": pa.array((h % np.uint64(n_coarse)).astype(np.int32)),
        })

    emitted = keys_ds.map_batches(emit, batch_format="pyarrow")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        wk = g["wkey"].to_numpy(np.int64)
        ids = g["kid"].to_numpy(np.int64)
        role = g["role"].to_numpy(np.int8)
        im = role == 0
        iw, iid = wk[im], ids[im]
        pw, pid = wk[~im], ids[~im]
        io = np.argsort(iw, kind="stable")
        iw, iid = iw[io], iid[io]
        lo = np.searchsorted(iw, pw, side="left")
        hi = np.searchsorted(iw, pw, side="right")
        cnt = hi - lo
        keep = cnt > 0
        lo, cnt, pid_k = lo[keep], cnt[keep], pid[keep]
        from .dedup import _chunk_bounds
        out = []
        # chunk the expansion so a hot window never materializes wide
        # (a single probe row bigger than the chunk still emits alone)
        for start_row, end_row in _chunk_bounds(cnt, pair_chunk):
            c = cnt[start_row:end_row]
            offs = np.cumsum(c) - c
            tot = int(c.sum())
            left = np.repeat(pid_k[start_row:end_row], c)
            idx = np.arange(tot) - np.repeat(offs, c) + np.repeat(
                lo[start_row:end_row], c)
            right = iid[idx]
            # keep ONE direction only: ed is symmetric, so the pigeonhole
            # guarantee holds with a as the index side and b as the probe
            # side for BOTH orderings of a true pair — enumerating only
            # index_id < probe_id halves candidate volume exactly
            m = right < left
            l, r = left[m], right[m]
            if corpus_ref is not None and len(l):
                cid, _, cbag = ray.get(corpus_ref)
                li = np.searchsorted(cid, l)
                ri = np.searchsorted(cid, r)
                l1 = np.abs(cbag[li] - cbag[ri]).sum(axis=1)
                keep_m = l1 <= 2 * k  # ed >= L1/2 (exact bound, see above)
                l, r = l[keep_m], r[keep_m]
            pairs = pd.DataFrame({"left_id": np.minimum(l, r),
                                  "right_id": np.maximum(l, r)})
            out.append(pairs.drop_duplicates())
        if not out:
            return pd.DataFrame({"left_id": pd.Series([], dtype=np.int64),
                                 "right_id": pd.Series([], dtype=np.int64)})
        return pd.concat(out, ignore_index=True).drop_duplicates()

    cand = (emitted.groupby("bucket")
            .map_groups(bucket_pairs, batch_format="pandas"))

    from .dedup import _distinct_pairs, _pair_payload_exchange
    cand = _distinct_pairs(cand)

    def verify_tables(lkeys: np.ndarray, rkeys: np.ndarray,
                      lids: np.ndarray, rids: np.ndarray) -> pa.Table:
        A = _codepoint_matrix(lkeys, width)
        B = _codepoint_matrix(rkeys, width)
        d = _lev_banded(A, B, k)
        m = d <= k
        return pa.Table.from_arrays(
            [pa.array(lids[m], pa.int64()), pa.array(rids[m], pa.int64()),
             pa.array(d[m].astype(np.int64), pa.int64())],
            schema=_PAIR_OUT)

    if corpus_ref is not None:
        def bverify(t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return _PAIR_OUT.empty_table()
            cid, cm, _ = ray.get(corpus_ref)
            l = t.column("left_id").to_numpy(zero_copy_only=False)
            r = t.column("right_id").to_numpy(zero_copy_only=False)
            li = np.searchsorted(cid, l)
            ri = np.searchsorted(cid, r)
            d = _lev_banded(cm[li], cm[ri], k)
            m = d <= k
            return pa.Table.from_arrays(
                [pa.array(l[m], pa.int64()), pa.array(r[m], pa.int64()),
                 pa.array(d[m].astype(np.int64), pa.int64())],
                schema=_PAIR_OUT)

        out = cand.map_batches(bverify, batch_format="pyarrow",
                               batch_size=64 * 1024).materialize()
        if out.count() == 0:
            return ray.data.from_arrow(_PAIR_OUT.empty_table())
        return enforce_budget(out)

    # scale path: ship each pair's two keys through the payload exchange
    def as_payload(t: pa.Table) -> pa.Table:
        return pa.table({"join_id": t.column("kid"),
                         "key": t.column("key")})

    def combine(lt: pa.Table, rt: pa.Table) -> pa.Table:
        lk = np.asarray(lt.column("key").to_pylist(), dtype=object)
        rk = np.asarray(rt.column("key").to_pylist(), dtype=object)
        return verify_tables(
            lk, rk,
            lt.column("left_id").to_numpy(zero_copy_only=False),
            lt.column("right_id").to_numpy(zero_copy_only=False))

    return enforce_budget(_pair_payload_exchange(
        cand, keys_ds.map_batches(as_payload, batch_format="pyarrow"),
        ["key"], [pa.string()], combine, _PAIR_OUT, n_coarse))
