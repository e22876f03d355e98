"""Windowed aggregation over an ordered, partitioned event stream.

Ray Data is a batch engine with no event-time runtime; windows are computed
from the data itself (the reference's only window is the event-time flush,
sink/.../S3SinkTask.java:169-173 — window assignment = the file split; here it
becomes an explicit column). Ordering contract: per key, events are ordered by
``order_col`` — the same per-partition ordering assumption as the changelog
(SURVEY.md §2.9 W5).

- ``tumbling_window_agg``: window id = floor(ts / size). Pre-aggregates per
  batch (combiner: one row per (key, window) per batch) before the groupby —
  the shuffle moves partial sums, not events.
- ``session_windows``: sessions split where the gap to the previous event of
  the same key exceeds ``gap``; computed per coarse key-bucket with one
  vectorized pandas pass (sort + diff + cumsum), bounded group count.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

N_COARSE = 64


def _final_sum(part_ds: "ray.data.Dataset", group_cols: list[str],
               n_coarse: int = N_COARSE) -> "ray.data.Dataset":
    """Final combine for (partial_n, partial_sum) rows WITHOUT a per-group
    Ray aggregate: (key, window) cardinality grows with the data (~100k groups
    at sf0.1) and Ray's Aggregate pays per-group overhead (~30us/group
    measured). Group by a COARSE hash bucket instead — all rows of a group
    co-locate — and run one vectorized pandas groupby per bucket."""

    from .joins import _coarse_of  # one implementation of the bucket hash

    def add_coarse(t: pa.Table) -> pa.Table:
        cols = [t.column(c).to_numpy(zero_copy_only=False) for c in group_cols]
        return t.append_column("_coarse", pa.array(_coarse_of(cols, n_coarse)))

    def final(g: pd.DataFrame) -> pd.DataFrame:
        # sort before summing: Ray's shuffle does not fix tie order within a
        # bucket, and float summation is order-sensitive — the sort makes
        # every combine (and hence every committed state byte) a pure
        # function of the multiset of partials
        g = g.sort_values(group_cols + ["partial_n", "partial_sum"], kind="stable")
        return g.groupby(group_cols, as_index=False).agg(
            n_events=("partial_n", "sum"), total_value=("partial_sum", "sum")
        )

    return (
        part_ds.map_batches(add_coarse, batch_format="pyarrow")
        .groupby("_coarse")
        .map_groups(final, batch_format="pandas")
    )


def tumbling_window_agg(
    ds: "ray.data.Dataset",
    key: str,
    ts: str,
    window_us: int,
    value: str,
) -> "ray.data.Dataset":
    """Per (key, window): count + sum(value), window = floor(ts / window_us).
    Returns columns (key, window, n_events, total_value)."""

    def partial(batch: pa.Table) -> pa.Table:
        t_us = batch.column(ts).cast(pa.int64()).to_numpy(zero_copy_only=False)
        win = t_us // window_us
        df = pd.DataFrame(
            {
                key: batch.column(key).to_numpy(zero_copy_only=False),
                "window": win,
                "_v": batch.column(value).to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby([key, "window"], as_index=False).agg(
            partial_n=("_v", "size"), partial_sum=("_v", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    return _final_sum(
        ds.map_batches(partial, batch_format="pyarrow"), [key, "window"]
    )


def sliding_window_agg(
    ds: "ray.data.Dataset",
    key: str,
    ts: str,
    window_us: int,
    hop_us: int,
    value: str,
) -> "ray.data.Dataset":
    """Sliding (hopping) windows: window k covers [k*hop, k*hop + window).
    Each event replicates into its ``window/hop`` covering windows inside the
    per-batch combiner (vectorized repeat), partial-aggregated, then one small
    groupby — the replication never crosses the shuffle unaggregated.
    Returns (key, window_start, n_events, total_value); window_start in units
    of ``hop_us``."""
    assert window_us % hop_us == 0, "window must be a multiple of hop"
    fanout = window_us // hop_us

    def partial(batch: pa.Table) -> pa.Table:
        t_us = batch.column(ts).cast(pa.int64()).to_numpy(zero_copy_only=False)
        keys = batch.column(key).to_numpy(zero_copy_only=False)
        vals = batch.column(value).to_numpy(zero_copy_only=False)
        base = t_us // hop_us  # newest window containing the event
        # windows k in (base - fanout, base] contain ts
        ks = np.repeat(base, fanout) - np.tile(np.arange(fanout), len(base))
        df = pd.DataFrame(
            {
                key: np.repeat(keys, fanout),
                "window_start": ks,
                "_v": np.repeat(vals, fanout),
            }
        )
        g = df.groupby([key, "window_start"], as_index=False).agg(
            partial_n=("_v", "size"), partial_sum=("_v", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    return _final_sum(
        ds.map_batches(partial, batch_format="pyarrow"), [key, "window_start"]
    )


def session_windows(
    ds: "ray.data.Dataset",
    key: str,
    ts: str,
    gap_us: int,
    order_col: str | None = None,
    n_coarse: int = N_COARSE,
) -> "ray.data.Dataset":
    """Per key: number of sessions, where a new session starts when the gap to
    the previous event exceeds ``gap_us``. Returns (key, n_sessions,
    n_events). Exact: all rows of a key share a coarse bucket."""

    def add_coarse(batch: pa.Table) -> pa.Table:
        k = batch.column(key).to_numpy(zero_copy_only=False)
        if k.dtype.kind not in ("i", "u"):
            k = k.astype(object)
        coarse = (pd.util.hash_array(np.ascontiguousarray(k)) %
                  np.uint64(n_coarse)).astype(np.int32)
        cols = [key, ts] + ([order_col] if order_col and order_col not in (key, ts) else [])
        t = batch.select(cols)
        return t.append_column("_coarse", pa.array(coarse))

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        sort_cols = [key, ts] + ([order_col] if order_col else [])
        g = g.sort_values(sort_cols, kind="stable")
        vals = g[ts].to_numpy()
        if np.issubdtype(vals.dtype, np.datetime64):
            vals = vals.astype("datetime64[us]").astype("int64")
        tsv = pd.Series(vals, index=g.index)
        new_key = g[key] != g[key].shift()
        gap = tsv - tsv.shift()
        new_session = new_key | (gap > gap_us)
        out = g.assign(_new=new_session.astype(int)).groupby(key, as_index=False).agg(
            n_sessions=("_new", "sum"), n_events=("_new", "size")
        )
        return out

    return (
        ds.map_batches(add_coarse, batch_format="pyarrow")
        .groupby("_coarse")
        .map_groups(sessions, batch_format="pandas")
    )


class IncrementalWindowAgg:
    """Streaming tumbling-window aggregate: per-(key, window) count + sum
    maintained ACROSS tail rounds in a persisted state table.

    Each ``update(ds, round_id)`` aggregates the round's new events (per-batch
    combiner -> coarse-bucket final, same kernels as the batch operator) and
    merges them into the state — partial sums are associative, so round-by-
    round updates equal one batch pass over all events (the invariant the
    tests assert). State commits are deterministic files
    ``state-<round:06d>.parquet`` written tmp+rename, so a replayed round
    overwrites identical bytes (the engine's idempotence contract); the
    newest state file is the snapshot, older ones are lineage.

    Scale: the state table is (key, window, n_events, total_value) — bounded
    by active-key x window cardinality, not event count; the merge is one
    coarse-bucket groupby over old-state ∪ new-partials, never a driver-side
    loop."""

    def __init__(self, state_dir: str, key: str, ts: str, window_us: int,
                 value: str):
        import os

        self.state_dir = state_dir
        self.key, self.ts, self.window_us, self.value = key, ts, window_us, value
        os.makedirs(state_dir, exist_ok=True)

    @staticmethod
    def _round_of(path: str) -> int:
        import os

        # robust to any digit width ('state-1000000.parquet' parses fine —
        # a fixed [6:12] slice or lexicographic sort would break at 10^6)
        return int(os.path.basename(path)[len("state-"):-len(".parquet")])

    def _latest(self, before_round: "int | None" = None) -> "str | None":
        import glob
        import os

        files = glob.glob(os.path.join(self.state_dir, "state-*.parquet"))
        if before_round is not None:
            # a REPLAYED round must merge against its predecessor, never its
            # own previous output (that would double-count the round)
            files = [f for f in files if self._round_of(f) < before_round]
        return max(files, key=self._round_of) if files else None

    def update(self, ds: "ray.data.Dataset", round_id: int) -> str:
        import os

        import pyarrow.parquet as pq

        new = tumbling_window_agg(ds, self.key, self.ts, self.window_us, self.value)

        def as_partial(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    self.key: t.column(self.key),
                    "window": t.column("window"),
                    "partial_n": t.column("n_events"),
                    "partial_sum": t.column("total_value"),
                }
            )

        parts = new.map_batches(as_partial, batch_format="pyarrow")
        prev = self._latest(before_round=round_id)
        if prev is not None:
            old = ray.data.read_parquet(prev).map_batches(
                as_partial, batch_format="pyarrow"
            )
            parts = parts.union(old)
        merged = _final_sum(parts, [self.key, "window"])
        batches = [
            pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
            for b in merged.iter_batches(batch_format="pyarrow", batch_size=65536)
        ]
        batches = [b for b in batches if len(b)]
        if batches:
            tbl = pa.concat_tables(batches)
        else:  # zero-event first round: empty state typed from the INPUT
            from .joins import _schema_types

            types = _schema_types(ds)
            vt = types.get(self.value, pa.float64())
            tbl = pa.schema(
                [(self.key, types.get(self.key, pa.int64())),
                 ("window", pa.int64()), ("n_events", pa.int64()),
                 ("total_value",
                  pa.int64() if pa.types.is_integer(vt) else pa.float64())]
            ).empty_table()
        tbl = tbl.sort_by([(self.key, "ascending"), ("window", "ascending")])
        path = os.path.join(self.state_dir, f"state-{round_id:06d}.parquet")
        tmp = path + ".inprogress"
        pq.write_table(tbl, tmp, compression="zstd")
        os.replace(tmp, path)
        return path

    def snapshot(self) -> "ray.data.Dataset":
        prev = self._latest()
        if prev is None:
            raise FileNotFoundError(f"no state committed under {self.state_dir}")
        return ray.data.read_parquet(prev)
