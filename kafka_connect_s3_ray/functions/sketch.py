"""Mergeable sketches for aggregation at scale.

The scalable aggregate pattern: emit ONE serialized sketch per batch inside
``map_batches`` (the combiner), then merge the handful of sketches in a tiny
final stage — the shuffle moves sketches, never rows. Two classic public
algorithms, implemented numpy-vectorized:

- ``HllSketch`` — HyperLogLog distinct counting (Flajolet et al.): 2^p
  registers of leading-zero ranks over a stable 64-bit hash; merge = register
  max. Standard error ~1.04/sqrt(2^p).
- ``QuantileSketch`` — bounded sorted-sample sketch: keep k evenly-spaced
  order statistics (with weights) per batch; merge = weighted merge +
  re-thin. Rank error ~1/k per merge level; deterministic (no randomness),
  so replays produce identical results.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

class HllSketch:
    def __init__(self, p: int = 12, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.registers = (registers if registers is not None
                          else np.zeros(self.m, dtype=np.uint8))

    def add(self, values) -> "HllSketch":
        # splitmix64 for integers / base-257-poly+splitmix64 for strings:
        # both exactly reproducible in SQL (HUGEINT mod-2^64), which makes
        # the HLL registers — and hence the estimate — oracle-checkable
        # (queries._approx_distinct_sql), unlike pandas' SipHash
        from .dedup import _splitmix64_mix, _stable_token_hash

        arr = np.asarray(values)
        if arr.dtype.kind in ("i", "u"):
            h = _splitmix64_mix(arr.astype(np.uint64))
        else:
            h = _stable_token_hash(arr.astype(object))
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = h << np.uint64(self.p)
        # rank = leading zeros of the remaining bits + 1 (capped)
        ranks = np.ones(len(h), dtype=np.uint8)
        mask = np.uint64(1) << np.uint64(63)
        work = rest.copy()
        live = work < mask  # leading bit is 0
        while live.any() and ranks.max() < 64 - self.p:
            ranks[live] += 1
            work[live] = work[live] << np.uint64(1)
            live = live & (work < mask)
        np.maximum.at(self.registers, idx, ranks)
        return self

    def merge(self, other: "HllSketch") -> "HllSketch":
        assert self.p == other.p
        return HllSketch(self.p, np.maximum(self.registers, other.registers))

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(2.0 ** -self.registers.astype(np.float64))
        zeros = int((self.registers == 0).sum())
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)  # small-range correction
        return float(est)

    def serialize(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def deserialize(cls, blob: bytes) -> "HllSketch":
        p = blob[0]
        return cls(p, np.frombuffer(blob[1:], dtype=np.uint8).copy())


# ---------------------------------------------------------------------------
# quantile sketch (deterministic evenly-spaced order statistics)
# ---------------------------------------------------------------------------

class QuantileSketch:
    def __init__(self, k: int = 1024, values: np.ndarray | None = None,
                 weights: np.ndarray | None = None):
        self.k = k
        self.values = values if values is not None else np.empty(0)
        self.weights = weights if weights is not None else np.empty(0)

    def _thin(self) -> "QuantileSketch":
        if len(self.values) <= self.k:
            return self
        order = np.argsort(self.values, kind="stable")
        v, w = self.values[order], self.weights[order]
        cum = np.cumsum(w)
        total = cum[-1]
        # k evenly spaced target ranks; each kept point carries its span weight
        targets = (np.arange(self.k) + 0.5) * total / self.k
        idx = np.searchsorted(cum, targets, side="left")
        idx = np.minimum(idx, len(v) - 1)
        keep_v = v[idx]
        keep_w = np.full(self.k, total / self.k)
        return QuantileSketch(self.k, keep_v, keep_w)

    def add(self, values) -> "QuantileSketch":
        arr = np.asarray(values, dtype=np.float64)
        arr = arr[~np.isnan(arr)]
        s = QuantileSketch(
            self.k,
            np.concatenate([self.values, arr]),
            np.concatenate([self.weights, np.ones(len(arr))]),
        )
        return s._thin()

    def merge(self, other: "QuantileSketch") -> "QuantileSketch":
        return QuantileSketch(
            self.k,
            np.concatenate([self.values, other.values]),
            np.concatenate([self.weights, other.weights]),
        )._thin()

    def quantile(self, q: float | list[float]):
        if len(self.values) == 0:
            return None
        order = np.argsort(self.values, kind="stable")
        v, w = self.values[order], self.weights[order]
        cum = np.cumsum(w) - w / 2
        cum = cum / np.sum(w)
        return np.interp(q, cum, v)

    def serialize(self) -> bytes:
        import pickle

        return pickle.dumps((self.k, self.values, self.weights))

    @classmethod
    def deserialize(cls, blob: bytes) -> "QuantileSketch":
        import pickle

        k, v, w = pickle.loads(blob)
        return cls(k, v, w)


# ---------------------------------------------------------------------------
# distributed drivers
# ---------------------------------------------------------------------------

def approx_distinct(ds: "ray.data.Dataset", col: str, p: int = 12) -> float:
    """Distributed HLL distinct count: one sketch per batch, merged small."""

    def per_batch(batch: pa.Table) -> pa.Table:
        s = HllSketch(p).add(batch.column(col).to_numpy(zero_copy_only=False))
        return pa.table({"sketch": pa.array([s.serialize()], pa.binary())})

    blobs = ds.map_batches(per_batch, batch_format="pyarrow").to_pandas()["sketch"]
    acc = HllSketch(p)
    for b in blobs:  # tiny: one register array per batch
        acc = acc.merge(HllSketch.deserialize(b))
    return acc.estimate()


def approx_quantiles(ds: "ray.data.Dataset", col: str, qs: list[float],
                     k: int = 1024) -> np.ndarray:
    """Distributed quantiles: per-batch sketch -> merge -> interpolate."""

    def per_batch(batch: pa.Table) -> pa.Table:
        s = QuantileSketch(k).add(batch.column(col).to_numpy(zero_copy_only=False))
        return pa.table({"sketch": pa.array([s.serialize()], pa.binary())})

    blobs = ds.map_batches(per_batch, batch_format="pyarrow").to_pandas()["sketch"]
    acc = QuantileSketch(k)
    for b in blobs:
        acc = acc.merge(QuantileSketch.deserialize(b))
    return acc.quantile(qs)


def grouped_approx_distinct(ds: "ray.data.Dataset", group_col: str,
                            col: str, p: int = 12) -> pd.DataFrame:
    """Per-group HLL distinct count: each batch emits ONE serialized sketch
    per group it contains (groups x 4 KiB, never rows), the driver
    max-merges per group and estimates. Same oracle-checkable hash
    arithmetic as ``approx_distinct``; designed for LOW-CARDINALITY group
    columns (the per-batch loop is over groups present in the batch).
    Returns a DataFrame (group, estimate) sorted by group; NULL group rows
    are excluded (the grouped-quantiles contract)."""

    def per_batch(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pac

        # filter IN ARROW before to_numpy: a NULL in an int64 value column
        # would otherwise degrade the whole numpy array to float64 and flip
        # HllSketch.add onto the string-hash path ('123.0' != splitmix(123)
        # across batches). NULL values leave the count (SQL count(DISTINCT)
        # ignores NULL); NULL groups are excluded like grouped quantiles.
        valid = pac.and_(pac.is_valid(batch.column(group_col)),
                         pac.is_valid(batch.column(col)))
        batch = batch.filter(valid)
        g = batch.column(group_col).to_numpy(zero_copy_only=False).astype(str)
        v = batch.column(col).to_numpy(zero_copy_only=False)
        names, blobs = [], []
        for name in np.unique(g):
            names.append(name)
            blobs.append(HllSketch(p).add(v[g == name]).serialize())
        return pa.table({"g": pa.array(names, pa.string()),
                         "sketch": pa.array(blobs, pa.binary())})

    parts = ds.map_batches(per_batch, batch_format="pyarrow").to_pandas()
    acc: dict = {}
    for name, blob in zip(parts["g"], parts["sketch"]):
        s = HllSketch.deserialize(blob)
        acc[name] = s if name not in acc else acc[name].merge(s)
    out = pd.DataFrame({"g": sorted(acc),
                        "estimate": [acc[k].estimate() for k in sorted(acc)]})
    return out


class SpaceSavingSketch:
    """Mergeable heavy-hitters summary (Metwally et al. SpaceSaving, merge
    per Agarwal et al. "Mergeable Summaries", PODS'12): at most ``m``
    (item, count, err) counters where ``count`` OVERestimates the true
    frequency by at most ``err`` (count - err <= true <= count). Any item
    with true count > N/m is guaranteed present. When the live item count
    never exceeds m, counts are EXACT (err 0 everywhere) — the regime the
    SQL oracle checks; accuracy at m << distinct is pytest-bounded.

    Batched ``add``: values collapse to (unique, weight) first, existing
    counters take a vectorized += via searchsorted, and the remaining new
    items enter by evicting the smallest counters (weighted SpaceSaving:
    new count = evicted_min + w, err = evicted_min)."""

    def __init__(self, m: int = 256):
        self.m = int(m)
        self.items: dict = {}  # item -> [count, err]

    def add(self, values, weights=None) -> "SpaceSavingSketch":
        vals = np.asarray(values)
        if len(vals) == 0:
            return self
        uniq, inv = np.unique(vals, return_inverse=True)
        w = (np.bincount(inv, minlength=len(uniq)).astype(np.int64)
             if weights is None else
             np.bincount(inv, weights=np.asarray(weights, np.float64),
                         minlength=len(uniq)).astype(np.int64))
        # the batch's exact counts ARE a valid summary (capacity > live
        # items -> never evicted, err 0, floor 0), so adding = merging it —
        # O((m+u) log(m+u)) total, vs the per-item min-scan eviction loop's
        # O(u*m) on a full sketch
        batch = SpaceSavingSketch(max(self.m, len(uniq) + 1))
        batch.items = {item: [wt, 0]
                       for item, wt in zip(uniq.tolist(), w.tolist())}
        self.items = self.merge(batch).items
        return self

    def merge(self, other: "SpaceSavingSketch") -> "SpaceSavingSketch":
        # An item ABSENT from a full sketch may still have true count up to
        # that sketch's minimum counter (the SpaceSaving invariant), so it
        # contributes (min, min) there; absent from a non-full sketch means
        # never seen -> contributes 0. This keeps count an overestimate and
        # err a valid slack across merges (Agarwal et al., Mergeable
        # Summaries, PODS'12). Truncating back to top-m preserves the
        # invariant: every dropped count <= every kept count.
        floor_a = (min(c for c, _ in self.items.values())
                   if len(self.items) >= self.m and self.items else 0)
        floor_b = (min(c for c, _ in other.items.values())
                   if len(other.items) >= other.m and other.items else 0)
        out = SpaceSavingSketch(self.m)
        merged: dict = {}
        for item in self.items.keys() | other.items.keys():
            ca, ea = self.items.get(item, (floor_a, floor_a))
            cb, eb = other.items.get(item, (floor_b, floor_b))
            merged[item] = [ca + cb, ea + eb]
        if len(merged) > self.m:
            keep = sorted(merged, key=lambda k: -merged[k][0])[: self.m]
            merged = {k: merged[k] for k in keep}
        out.items = merged
        return out

    def heavy_hitters(self, k: int | None = None) -> "pd.DataFrame":
        rows = sorted(((item, c, e) for item, (c, e) in self.items.items()),
                      key=lambda r: (-r[1], r[0]))
        if k is not None:
            rows = rows[:k]
        return pd.DataFrame(rows, columns=["item", "count_est", "err_bound"])

    def serialize(self) -> bytes:
        import pickle

        return pickle.dumps((self.m, self.items))

    @classmethod
    def deserialize(cls, blob: bytes) -> "SpaceSavingSketch":
        import pickle

        m, items = pickle.loads(blob)
        out = cls(m)
        out.items = items
        return out


def heavy_hitters(ds: "ray.data.Dataset", col: str, k: int = 20,
                  m: int = 1024) -> pd.DataFrame:
    """Distributed top-k frequent values: one SpaceSaving sketch per batch
    (m counters — the only thing that crosses the exchange), driver merge,
    top-k by (count desc, item). Exact whenever per-batch distinct counts
    stay <= m (the oracle regime); otherwise every returned count carries
    its per-item overestimate bound. NULL values are excluded (count(x)
    semantics)."""

    def per_batch(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pac

        col_arr = batch.column(col)
        col_arr = col_arr.filter(pac.is_valid(col_arr))
        s = SpaceSavingSketch(m).add(col_arr.to_numpy(zero_copy_only=False))
        return pa.table({"sketch": pa.array([s.serialize()], pa.binary())})

    blobs = ds.map_batches(per_batch, batch_format="pyarrow").to_pandas()["sketch"]
    acc = SpaceSavingSketch(m)
    for b in blobs:
        acc = acc.merge(SpaceSavingSketch.deserialize(b))
    return acc.heavy_hitters(k)


def grouped_heavy_hitters(ds: "ray.data.Dataset", group_col: str, col: str,
                          k: int = 10, m: int = 1024) -> pd.DataFrame:
    """Per-group top-k frequent values: one SpaceSaving sketch PER GROUP per
    batch (the mergeable-summaries property makes the per-group merge exact
    in the same regimes as ``heavy_hitters``), driver merges per group and
    reports each group's top-k by (count desc, item). Only sketches cross
    the exchange — groups x m counters per block — so the contract is
    dimension-like group cardinality (languages, event types, sources); a
    corpus-cardinality group column belongs in a bucketed groupby instead.
    NULL group rows and NULL values are excluded."""

    def per_batch(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pac

        t = batch.select([group_col, col])
        mask = pac.and_(pac.is_valid(t.column(group_col)),
                        pac.is_valid(t.column(col)))
        t = t.filter(mask)
        df = pd.DataFrame({
            "g": t.column(group_col).to_pandas(),
            "v": t.column(col).to_pandas()})
        rows_g, rows_b = [], []
        for g, sub in df.groupby("g", sort=False):
            rows_g.append(g)
            rows_b.append(SpaceSavingSketch(m).add(sub["v"].to_numpy())
                          .serialize())
        return pa.table({"g": pa.array(rows_g),
                         "sketch": pa.array(rows_b, pa.binary())})

    parts = ds.map_batches(per_batch, batch_format="pyarrow").to_pandas()
    out = []
    for g, sub in parts.groupby("g", sort=True):
        acc = SpaceSavingSketch(m)
        for b in sub["sketch"]:
            acc = acc.merge(SpaceSavingSketch.deserialize(b))
        hh = acc.heavy_hitters(k)
        hh.insert(0, group_col, g)
        out.append(hh)
    if not out:
        return pd.DataFrame({group_col: [], "item": [], "count_est": [],
                             "err_bound": []})
    return pd.concat(out, ignore_index=True)
