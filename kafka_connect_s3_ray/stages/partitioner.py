"""Deterministic hash partitioning + hot-key salting.

Reference analog: the sink routes every record to its TopicPartition writer via
``records.stream().collect(groupingBy(TopicPartition))`` (sink/.../S3SinkTask.java:153-155)
and the source statically assigns partitions round-robin (source/.../S3SourceConnector.java:38-59).
Here the partition is *derived* from the record key — ``part = H(conv_id) % P`` —
so all events of a conversation meet the lake partition that owns it, and the
hash is a fixed-key SipHash (``pandas.util.hash_array``) so the assignment is
stable across processes, runs and cluster sizes (Python's builtin ``hash`` is
salted per-process and must never be used here).

Skew: the reference serializes a hot partition on one task (README.md:55-57 warns
about it, offers nothing). We salt: events of detected hot keys get
``salt = offset % n_salts`` so their *volume* spreads over sub-groups; a
per-(part, salt) LWW compaction bounds each group by key-cardinality before the
final per-part merge (see stages/merge.py — LWW keep-max-offset is associative,
so two-phase reduction is exact).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

PART_COLUMN = "part"
SALT_COLUMN = "salt"


def stable_hash(values) -> np.ndarray:
    """Deterministic uint64 hash of a string/int array (fixed-key SipHash via
    pandas.util.hash_array — stable across processes and machines)."""
    arr = np.asarray(values)
    if arr.dtype.kind not in ("i", "u"):
        arr = arr.astype(object)
    return pd.util.hash_array(arr, categorize=False)


def assign_partitions(conv_ids, num_partitions: int) -> np.ndarray:
    """part = H(conv_id) % P as int32."""
    return (stable_hash(conv_ids) % np.uint64(num_partitions)).astype(np.int32)


class PartitionAssigner:
    """map_batches stage: adds ``part`` (+ optional ``salt``) columns to change
    events. Vectorized, Arrow in / Arrow out.

    Parameters
    ----------
    num_partitions: P, the lake partition count (choose so one partition's
        compacted state is ~<=1 GiB at full scale).
    hot_keys: conv_ids holding a large share of events; their rows are salted
        ``offset % n_salts`` to split shuffle volume (cold keys get salt 0).
    """

    def __init__(self, num_partitions: int, hot_keys: set[str] | None = None,
                 n_salts: int = 8):
        self.num_partitions = num_partitions
        self.hot_keys = set(hot_keys or ())
        # precomputed once: rebuilding a list and re-sorting per batch would
        # tax every batch of the ingest hot path
        self._hot_arr = np.array(sorted(self.hot_keys), dtype=object)
        self.n_salts = max(1, n_salts)

    def __call__(self, batch: pa.Table) -> pa.Table:
        conv = batch.column("conv_id").to_numpy(zero_copy_only=False)
        part = assign_partitions(conv, self.num_partitions)
        if PART_COLUMN in batch.column_names:
            batch = batch.drop_columns([PART_COLUMN])
        batch = batch.append_column(PART_COLUMN, pa.array(part, pa.int32()))
        salt = np.zeros(len(batch), dtype=np.int32)
        if self.hot_keys and len(batch):
            hot_mask = np.isin(conv, self._hot_arr)
            if hot_mask.any():
                offs = batch.column("offset").to_numpy(zero_copy_only=False)
                salt[hot_mask] = (offs[hot_mask] % self.n_salts).astype(np.int32)
        if SALT_COLUMN in batch.column_names:
            batch = batch.drop_columns([SALT_COLUMN])
        return batch.append_column(SALT_COLUMN, pa.array(salt, pa.int32()))


def detect_hot_keys(ds, threshold_frac: float = 0.05, sample_frac: float | None = None,
                    seed: int = 7, n_coarse: int = 64) -> set[str]:
    """Find conv_ids holding more than ``threshold_frac`` of all events.

    Two-level count to stay cheap at scale: per-batch partial counts (one row
    per conv per batch) -> groupby a COARSE hash bucket (bounded group count;
    a per-conv groupby would pay Ray's per-group overhead on millions of tiny
    groups) -> exact per-conv sums inside each bucket, filtered to the heavy
    hitters before anything returns to the driver. Optionally sampled — the
    estimate only has to find heavy hitters, not exact counts.
    """
    import pyarrow as pa

    if sample_frac is not None and sample_frac < 1.0:
        ds = ds.random_sample(sample_frac, seed=seed)
    total = ds.count()
    if total == 0:
        return set()
    cutoff = threshold_frac * total

    def partial_counts(batch: pa.Table) -> pa.Table:
        conv = batch.column("conv_id").to_numpy(zero_copy_only=False)
        uniq, counts = np.unique(conv, return_counts=True)
        coarse = (stable_hash(uniq) % np.uint64(n_coarse)).astype(np.int32)
        return pa.table({"conv_id": pa.array(uniq), "n": pa.array(counts),
                         "coarse": pa.array(coarse)})

    def hot_in_bucket(g, _cutoff=cutoff):
        sums = g.groupby("conv_id", as_index=False)["n"].sum()
        return sums[sums["n"] >= _cutoff][["conv_id"]]

    hot = (
        ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("coarse")
        .map_groups(hot_in_bucket, batch_format="pandas")
        .to_pandas()
    )
    return set(hot["conv_id"].tolist())
