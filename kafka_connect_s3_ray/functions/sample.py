"""Deterministic sampling and dataset splitting for training-data pipelines.

A 100 TB corpus needs reproducible train/validation/test splits and
subsampling that (a) never depend on row order, partitioning, or cluster
size, and (b) are CONTAMINATION-SAFE: every row sharing a key (user,
conversation, document) must land in the same split, or near-duplicate
leakage across splits poisons evaluation. Both come from one primitive —
hash the key with splitmix64 (the same SQL-replayable mixer the dedup stack
uses, DESIGN.md §16) and compare against integer thresholds in hash space.
No shuffle, no state, no RNG: each map task decides its rows alone, so the
assignment is identical on 1 CPU or 256 nodes, and replays are free.

Reference analog: the reference keys output files by partition so replays
land deterministically (sink/.../S3Writer.java:47-67); here determinism
extends to row-level membership.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .dedup import _splitmix64_mix

_U64 = 1 << 64


def key_hash(keys: np.ndarray, salt: int = 0) -> np.ndarray:
    """splitmix64 of an integer key column (int64 bit pattern reinterpreted
    as uint64 — negative keys wrap), optionally xor-salted. Exactly
    reproducible in SQL via HUGEINT mod-2^64 arithmetic
    (queries._splitmix64_ctes). Null keys are an ERROR, not a silent split:
    an Arrow column with nulls reaches numpy as float64-with-NaN, whose
    int64 cast is platform garbage — refusing keeps membership deterministic
    and matches the merge kernel's null-key contract."""
    arr = np.asarray(keys)
    if arr.dtype.kind == "f" and np.isnan(arr).any():
        raise ValueError(
            "null key values in sampling/split key column — fill or drop "
            "null keys before assign_split/sample_by_key"
        )
    h = arr.astype(np.int64).view(np.uint64)
    if salt:
        h = h ^ np.uint64(salt)
    return _splitmix64_mix(h)


def split_thresholds(fractions: dict[str, float]) -> tuple[list[str], list[int]]:
    """(names, cumulative integer thresholds in hash space). Thresholds are
    computed ONCE here and embedded as the same literals in the SQL oracle,
    so engine and oracle agree bit-for-bit even where float rounding of
    fraction * 2^64 is ambiguous."""
    names = list(fractions)
    fr = np.cumsum([float(fractions[n]) for n in names])
    if abs(fr[-1] - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {fr[-1]}")
    thr = [min(int(f * _U64), _U64 - 1) for f in fr]
    thr[-1] = _U64 - 1
    return names, thr


def assign_split(ds: "object", key_col: str,
                 fractions: dict[str, float] | None = None,
                 salt: int = 0, out_col: str = "split"):
    """Tag every row with its split label. Row r belongs to split i iff
    hash(key) falls in [thr[i-1], thr[i]) — all rows of one key share a hash,
    hence a split (contamination safety)."""
    fractions = fractions or {"train": 0.9, "val": 0.05, "test": 0.05}
    names, thr = split_thresholds(fractions)
    bounds = np.array(thr[:-1], np.uint64)
    labels = np.array(names, object)

    def tag(t: pa.Table) -> pa.Table:
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(bounds, key_hash(k, salt), side="right")
        return t.append_column(out_col, pa.array(labels[idx], pa.string()))

    return ds.map_batches(tag, batch_format="pyarrow")


def split_datasets(ds, key_col: str, fractions: dict[str, float] | None = None,
                   salt: int = 0) -> dict[str, "object"]:
    """The splits as independent lazy Datasets (each a filtered view; Ray
    re-reads per consumer, so materialize upstream if all are consumed)."""
    fractions = fractions or {"train": 0.9, "val": 0.05, "test": 0.05}
    tagged = assign_split(ds, key_col, fractions, salt)
    return {name: tagged.filter(expr=f"split == '{name}'")
            for name in fractions}


def sample_by_key(ds, key_col: str, rate: float, salt: int = 0):
    """Keyed Bernoulli sample: keep rows whose key hashes below
    rate * 2^64 — the same rows on every run and every cluster shape, with
    whole keys kept or dropped together (never a partial user/conversation)."""
    thr = np.uint64(min(int(float(rate) * _U64), _U64 - 1))

    def keep(t: pa.Table) -> pa.Table:
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        return t.filter(pa.array(key_hash(k, salt) < thr))

    return ds.map_batches(keep, batch_format="pyarrow")


def stratified_sample(ds, group_col: str, key_col: str,
                      rates: dict[str, float], default_rate: float = 1.0,
                      salt: int = 0):
    """Per-group keyed Bernoulli sample — the class-rebalancing step a
    training pipeline runs (e.g. downsample 'error' events to 10% while
    keeping every 'purchase'). Same primitive as ``sample_by_key``: keep a
    row iff splitmix64(key) < rate[group] * 2^64, so membership is
    deterministic, order/parallelism-independent, and whole keys stay
    together WITHIN a group. Thresholds are computed once as integers and
    looked up through a factorized group index (never a float map — a
    float64 round-trip would perturb thresholds near 2^64 and diverge from
    the SQL oracle's integer literals). NULL groups take default_rate via
    an explicit null mask (no sentinel value a genuine group could collide
    with); NULL keys raise (key_hash's contract)."""
    for g, r in rates.items():
        if not (0.0 <= float(r) <= 1.0):
            raise ValueError(f"rate for group {g!r} must be in [0, 1]: {r}")
    thr = {str(g): np.uint64(min(int(float(r) * _U64), _U64 - 1))
           for g, r in rates.items()}
    default_thr = np.uint64(min(int(float(default_rate) * _U64), _U64 - 1))

    def keep(t: pa.Table) -> pa.Table:
        col = pc.cast(t.column(group_col), pa.string())
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        row_thr = np.full(len(t), default_thr, np.uint64)
        if valid.any():
            g = col.to_numpy(zero_copy_only=False)[valid].astype(str)
            uniq, inv = np.unique(g, return_inverse=True)
            per_uniq = np.array([thr.get(u, default_thr) for u in uniq],
                                np.uint64)
            row_thr[valid] = per_uniq[inv]
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        return t.filter(pa.array(key_hash(k, salt) < row_thr))

    return ds.map_batches(keep, batch_format="pyarrow")


def sample_exact_k(ds, key_col: str, k: int, seed: int = 0,
                   keep_cols: list[str] | None = None):
    """EXACT-size deterministic sample: the k rows whose
    ``splitmix64(u64(key) xor seed)`` is smallest — a uniform "random" k
    without an RNG, reproducible from the seed on any cluster shape (the
    rate-based ``sample_by_key`` gives a binomial size; this gives exactly
    k). Distributive top-k: each block keeps its k smallest (h, key), the
    driver merges k x blocks candidate rows — never the data. Ties are
    impossible for unique keys (bijective mixer); equal keys break by key,
    the oracle's ORDER BY h, key. Returns an Arrow table of
    (key_col + keep_cols) for the selected rows."""
    import pandas as pd

    cols = [key_col] + [c for c in (keep_cols or []) if c != key_col]

    def localtop(t: pa.Table) -> pa.Table:
        ks = t.column(key_col).to_numpy(zero_copy_only=False)
        h = key_hash(ks, salt=seed)
        order = np.lexsort((ks.astype(np.int64), h))[:k]
        out = t.select(cols).take(pa.array(order))
        return out.append_column("h", pa.array(h[order].view(np.int64),
                                               pa.int64()))

    parts = ds.map_batches(localtop, batch_format="pyarrow").to_pandas()
    if parts.empty:  # typed empty: column types come from the input schema
        sch = ds.schema()
        types = dict(zip(sch.names, sch.types))
        return pa.table({c: pa.array([], types[c]) for c in cols})
    hu = parts["h"].to_numpy(np.int64).view(np.uint64)
    order = np.lexsort((parts[key_col].to_numpy(), hu))[:k]
    sel = parts.iloc[order][cols].reset_index(drop=True)
    return pa.Table.from_pandas(sel, preserve_index=False)


def seeded_shuffle(ds, key_col: str = "doc_id", seed: int = 0,
                   bucket_bits: int = 10):
    """Deterministic global training shuffle: every row gets its 0-based
    position in the order of ``splitmix64(u64(key) xor seed)`` — the same
    permutation on any cluster shape, any block layout, any run (unlike
    ``random_shuffle``). A new seed is a brand-new permutation.

    Distributed as a bucket-offset rank (no global sort operator): the
    bucket is the hash's TOP ``bucket_bits`` bits, so bucket order IS hash
    order — (1) per-block bincount partials -> driver exclusive prefix
    offsets (2^bucket_bits ints, never rows), (2) one hash-bucket exchange
    of (key, h), each bucket sorting locally and adding its offset (the
    shared ``rank.bucket_offsets``/``rank_by_bucket`` scaffolding). Rank
    ties are impossible for unique keys (the mixer is a bijection); equal
    keys order by key, matching the oracle's ``ORDER BY h, key``. NULL keys
    raise (key_hash's contract). Returns (key_col, shuffle_pos int64)."""
    import pandas as pd

    from .rank import bucket_offsets, rank_by_bucket

    nb = 1 << int(bucket_bits)
    shift = np.uint64(64 - int(bucket_bits))

    def project(t: pa.Table) -> pa.Table:
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        h = key_hash(k, salt=seed)
        return pa.table({
            key_col: pa.array(k.astype(np.int64), pa.int64()),
            "h": pa.array(h.view(np.int64), pa.int64()),  # bit pattern
            "bucket": pa.array((h >> shift).astype(np.int64), pa.int64())})

    meta = ds.map_batches(project, batch_format="pyarrow").materialize()
    offsets, _ = bucket_offsets(meta, nb)

    def rank(g: pd.DataFrame, off: int) -> pd.DataFrame:
        h = g["h"].to_numpy(np.int64).view(np.uint64)
        k = g[key_col].to_numpy(np.int64)
        order = np.lexsort((k, h))
        pos = np.empty(len(g), np.int64)
        pos[order] = off + np.arange(len(g))
        return pd.DataFrame({key_col: k, "shuffle_pos": pos})

    return rank_by_bucket(meta, offsets, rank)


def grouped_exact_k(ds, group_col: str, key_col: str, k: int, seed: int = 0,
                    keep_cols: list[str] | None = None):
    """Exactly-k-PER-GROUP deterministic sample: within each group, the k
    rows whose ``splitmix64(u64(key) xor seed)`` is smallest — the
    per-class counterpart of ``sample_exact_k`` (rate-based
    ``stratified_sample`` gives binomial sizes; this caps every class at
    exactly k, the "at most k examples per domain" curation knob).

    Distributive exactly like the global version, with the group as a
    segment key: each block lexsorts (group, h, key) once and keeps the
    first k of every run (vectorized run segmentation, no per-group loop),
    so the driver merges <= k x groups x blocks candidate rows and applies
    the same selection again — never the data. NULL group or key raises
    (``key_hash`` / the stratified contract). Returns an Arrow table of
    (group_col, key_col + keep_cols)."""
    import pandas as pd

    cols = [group_col, key_col] + [c for c in (keep_cols or [])
                                   if c not in (group_col, key_col)]

    def localtop(t: pa.Table) -> pa.Table:
        if t.column(group_col).null_count:
            raise ValueError(f"NULL {group_col} in grouped_exact_k")
        ks = t.column(key_col).to_numpy(zero_copy_only=False)
        h = key_hash(ks, salt=seed)
        gv = t.column(group_col).to_numpy(zero_copy_only=False)
        codes, _ = pd.factorize(gv, sort=False)
        order = np.lexsort((ks.astype(np.int64), h, codes))
        cs = codes[order]
        run_start = np.zeros(len(cs), np.int64)
        new_run = np.ones(len(cs), bool)
        new_run[1:] = cs[1:] != cs[:-1]
        starts = np.flatnonzero(new_run)
        run_start = np.repeat(starts, np.diff(np.append(starts, len(cs))))
        pos = np.arange(len(cs)) - run_start
        sel = order[pos < k]
        out = t.select(cols).take(pa.array(sel))
        return out.append_column("h", pa.array(h[sel].view(np.int64),
                                               pa.int64()))

    parts = ds.map_batches(localtop, batch_format="pyarrow").to_pandas()
    if parts.empty:
        sch = ds.schema()
        types = dict(zip(sch.names, sch.types))
        return pa.table({c: pa.array([], types[c]) for c in cols})
    hu = parts["h"].to_numpy(np.int64).view(np.uint64)
    parts = parts.assign(_hu=hu)
    sel = (parts.sort_values(["_hu", key_col], kind="stable")
           .groupby(group_col, sort=False).head(k)[cols]
           .reset_index(drop=True))
    return pa.Table.from_pandas(sel, preserve_index=False)


def weighted_sample_k(ds, key_col: str, weight_col: str, k: int,
                      seed: int = 0, keep_cols: list[str] | None = None):
    """Weighted sampling WITHOUT replacement, P(selected) proportional to
    ``weight_col`` (Efraimidis–Spirakis exponential keys): each row's key is
    ``-ln(u) / w`` — an Exp(w) variate — and the k SMALLEST keys win, which
    is exactly successive weight-proportional draws without replacement.
    The curation use: sample documents proportional to length/quality so
    the sample holds k docs but a token-fair share of the corpus.

    Determinism: ``u`` derives bit-exactly from the engine's splitmix64
    mixer — the hash's top 53 bits plus 0.5 over 2^53, an exactly
    representable double on any platform, replayed verbatim by the SQL
    oracle (h // 2048). The only float op is the ln itself; DuckDB's and
    numpy's ln may differ in the final ulp, which can only flip membership
    if two keys at the k-boundary sit within ~1e-16 relative — never
    observed on the fixed driver fixtures the oracle compares against (and
    deterministic per fixture+seed, so a green check stays green).

    Rows with weight <= 0 or NULL weight are EXCLUDED (a zero-weight row
    must never be drawn; exponential keys would need an inf guard anyway).
    Distributive: each block keeps its k smallest (key, id), the driver
    merges <= k x blocks candidates — the data never moves."""
    import pandas as pd

    cols = [key_col, weight_col] + [
        c for c in (keep_cols or []) if c not in (key_col, weight_col)]

    def localtop(t: pa.Table) -> pa.Table:
        ks = t.column(key_col).to_numpy(zero_copy_only=False)
        w = t.column(weight_col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        ok = np.isfinite(w) & (w > 0)
        h = key_hash(ks[ok], salt=seed)
        u = ((h >> np.uint64(11)).astype(np.float64) + 0.5) / float(1 << 53)
        ekey = -np.log(u) / w[ok]
        order = np.lexsort((ks[ok].astype(np.int64), ekey))[:k]
        out = t.filter(pa.array(ok)).select(cols).take(pa.array(order))
        return out.append_column("_ekey", pa.array(ekey[order], pa.float64()))

    parts = ds.map_batches(localtop, batch_format="pyarrow").to_pandas()
    if parts.empty:
        sch = ds.schema()
        types = dict(zip(sch.names, sch.types))
        return pa.table({c: pa.array([], types[c]) for c in cols})
    order = np.lexsort((parts[key_col].to_numpy(),
                        parts["_ekey"].to_numpy()))[:k]
    sel = parts.iloc[order][cols].reset_index(drop=True)
    return pa.Table.from_pandas(sel, preserve_index=False)


def token_mix_sample(ds: "ray.data.Dataset", shares_pct: dict[str, int],
                     budget_pct: int, text_col: str = "text",
                     source_col: str = "source", id_col: str = "doc_id"):
    """Data mixing by TOKEN budget (the DoReMi-lite static-mix step: 'the
    training set should be budget_pct% of the corpus tokens, split across
    domains per shares_pct'): per-source keep rates are derived from exact
    per-source token totals so each domain's EXPECTED kept tokens hit
    budget_pct/100 * shares_pct[s]/100 * T.

    Determinism contract — NO float touches membership: the keep threshold
    is thr_s = floor(shares_pct[s] * budget_pct * T * 2^64
    / (10000 * T_s)), capped at 2^64 - 1, computed in exact Python integer
    arithmetic; a doc survives iff splitmix64(doc_id) < thr_s. The SQL
    oracle replays the identical integer expression in HUGEINT, so the
    sample is bit-reproducible from (corpus, shares, budget) alone. An
    over-demanded tiny domain saturates at keep-everything (rate 1), the
    standard static-mix behavior — shares are targets, not guarantees.

    Shape: pass 1 = tiny per-block (source, token-sum) partials, zero
    shuffle; driver computes S thresholds; pass 2 = zero-shuffle vectorized
    filter (hash probe + per-source threshold lookup). Sources absent from
    shares_pct get threshold 0 (dropped), loudly listed in the docstring
    contract rather than silently defaulted."""
    import pandas as pd

    def tok_rows(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        n = np.fromiter((len(("" if x is None else x).lower().split())
                         for x in texts), np.int64, len(texts))
        return pa.table({
            id_col: pc.cast(t.column(id_col), pa.int64()),
            source_col: t.column(source_col),
            "n_tokens": pa.array(n, pa.int64()),
        })

    toks = ds.map_batches(tok_rows, batch_format="pyarrow")

    def totals(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({source_col: t.column(source_col).to_pandas(),
                           "n": t.column("n_tokens").to_pandas()})
        g = df.groupby(source_col, as_index=False)["n"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    part = toks.map_batches(totals, batch_format="pyarrow").to_pandas()
    per_src = part.groupby(source_col)["n"].sum().to_dict()
    big_t = int(sum(per_src.values()))
    thr = {}
    for s, ts in per_src.items():
        share = int(shares_pct.get(s, 0))
        thr[s] = min((share * int(budget_pct) * big_t << 64)
                     // (10000 * int(ts)), (1 << 64) - 1) if ts else 0

    def keep(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        h = key_hash(ids)
        srcs = t.column(source_col).to_pylist()
        row_thr = np.fromiter((thr.get(s, 0) for s in srcs),
                              np.uint64, len(srcs))
        return t.filter(pa.array(h < row_thr))

    return toks.map_batches(keep, batch_format="pyarrow")
