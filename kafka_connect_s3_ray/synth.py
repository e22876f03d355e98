"""Deterministic (pure-function-of-seed) transcript lake + changelog generator,
plus the single-process replay oracle tests compare against.

FIXTURES.md is the contract. No wall-clock anywhere — the reference's
CurrentUtcDateSupplier (common/.../CurrentUtcDateSupplier.java:13-26) is exactly
the nondeterminism we must NOT replicate; all timestamps derive from the seed.

Scale model: ``n_conv`` conversations, ``n_events`` change events. The changelog
has the reference's provenance shape — dense, monotone per-partition offsets
(common/.../RecordReader.java:32-39 assigns offsets by position) with
``partition = H(conv_id) % P`` so keys never span partitions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .schema import CHANGE_SCHEMA, LAKE_SCHEMA
from .stages.partitioner import assign_partitions

EPOCH0_US = 1_700_000_000_000_000  # fixed epoch, microseconds
ROLES = np.array(["user", "assistant", "tool"])
TOOLS = np.array(["search", "python", "browser", "calculator"])
_VOCAB = np.array(
    (
        "the a to of and in for with on at by from into over under stream batch "
        "offset partition commit merge upsert delete insert update replay lake "
        "changelog manifest watermark turn conversation transcript agent model "
        "token vector index shuffle arrow parquet block chunk gzip cursor key "
        "value record topic sink source task writer reader flush rotate salt "
        "hash order sort group count bytes schema evolve column null row table"
    ).split()
)
HOT_CONV = "conv-00000000"


def _conv_ids(idx: np.ndarray) -> np.ndarray:
    return np.char.add("conv-", np.char.zfill(idx.astype("U8"), 8))


def _texts(rng: np.random.Generator, n: int, wide_frac: float = 0.01) -> list[str]:
    """Seeded token sampler, ~10–2000 chars, with a wide-record tail (multi-KiB
    rows exercise the bytes-not-rows batch-sizing path)."""
    n_tok = rng.integers(2, 60, size=n)
    wide = rng.random(n) < wide_frac
    n_tok[wide] = rng.integers(300, 700, size=int(wide.sum()))
    flat = _VOCAB[rng.integers(0, len(_VOCAB), size=int(n_tok.sum()))]
    bounds = np.cumsum(n_tok)[:-1]
    return [" ".join(chunk) for chunk in np.split(flat, bounds)]


def synth_lake(n_conv: int = 1000, seed: int = 42, with_tool: bool = False) -> pa.Table:
    """Base lake: per-conversation turn counts ~ clamped Zipf [1, 64], sorted by
    (conv_id, turn_idx)."""
    rng = np.random.default_rng(seed)
    turns = np.clip(rng.zipf(1.5, size=n_conv), 1, 64).astype(np.int64)
    conv_idx = np.repeat(np.arange(n_conv), turns)
    total = int(turns.sum())
    starts = np.concatenate([[0], np.cumsum(turns)[:-1]])
    turn_idx = (np.arange(total) - np.repeat(starts, turns)).astype(np.int32)
    ts = EPOCH0_US + conv_idx * 3_600_000_000 + turn_idx.astype(np.int64) * 1_000_000
    tool = pa.nulls(total, pa.string())
    if with_tool:
        vals = TOOLS[rng.integers(0, len(TOOLS), size=total)]
        mask = rng.random(total) < 0.2
        tool = pa.array(np.where(mask, vals, None), pa.string())
    return pa.Table.from_arrays(
        [
            pa.array(_conv_ids(conv_idx), pa.string()),
            pa.array(turn_idx, pa.int32()),
            pa.array(ROLES[turn_idx % 3], pa.string()),
            pa.array(_texts(rng, total), pa.string()),
            tool,
            pa.array(ts, pa.timestamp("us")),
        ],
        schema=LAKE_SCHEMA,
    )


def synth_changelog(
    n_conv: int = 1000,
    n_events: int = 40_000,
    seed: int = 42,
    num_partitions: int = 16,
    hot_frac: float = 0.10,
    evolution_frac: float | None = 0.5,
) -> pa.Table:
    """Change-event stream: ~60% I / 30% U / 10% D; one hot conversation
    (conv-00000000) receives ``hot_frac`` of all events; events in the last
    ``1-evolution_frac`` of the stream may carry the evolved ``tool`` column
    (null before — additive schema evolution is exercised at merge, not by
    changing the file schema). A deterministic D→re-I tail for conv-00000001
    turn 0 is appended so delete-then-reinsert is always covered."""
    rng = np.random.default_rng(seed + 1)
    conv_idx = rng.integers(0, n_conv, size=n_events)
    hot = rng.random(n_events) < hot_frac
    conv_idx[hot] = 0
    turn_idx = rng.integers(0, 80, size=n_events).astype(np.int32)
    op = np.array(["I", "U", "D"])[
        rng.choice(3, size=n_events, p=[0.6, 0.3, 0.1])
    ].astype(object)

    # Deterministic tail: D then re-I of (conv-00000001, 0), plus a double-U.
    conv_idx = np.concatenate([conv_idx, [1, 1, 2, 2]])
    turn_idx = np.concatenate([turn_idx, np.array([0, 0, 0, 0], np.int32)]).astype(np.int32)
    op = np.concatenate([op, np.array(["D", "I", "U", "U"], object)])
    n = len(conv_idx)

    conv_ids = _conv_ids(conv_idx)
    texts = np.array(_texts(rng, n), dtype=object)
    is_del = op == "D"
    texts[is_del] = None
    roles = ROLES[turn_idx % 3].astype(object)
    roles[is_del] = None
    ts = EPOCH0_US + np.arange(n, dtype=np.int64) * 1_000_000 + 10**12
    ts_arr = pa.array(np.where(is_del, None, ts), pa.timestamp("us"))

    tool = np.full(n, None, dtype=object)
    if evolution_frac is not None:
        evolved = np.arange(n) >= int(n * evolution_frac)
        pick = rng.random(n) < 0.3
        sel = evolved & pick & ~is_del
        tool[sel] = TOOLS[rng.integers(0, len(TOOLS), size=n)][sel]

    part = assign_partitions(conv_ids, num_partitions)
    # Dense, monotone per-partition offsets in global arrival order
    # (reference: offsets assigned by position while reading,
    # common/.../RecordReader.java:32-39).
    offset = pd.Series(np.zeros(n)).groupby(part).cumcount().to_numpy().astype(np.int64)

    return pa.Table.from_arrays(
        [
            pa.array(part, pa.int32()),
            pa.array(offset, pa.int64()),
            pa.array(op, pa.string()),
            pa.array(conv_ids, pa.string()),
            pa.array(turn_idx, pa.int32()),
            pa.array(roles, pa.string()),
            pa.array(texts, pa.string()),
            pa.array(tool, pa.string()),
            ts_arr,
        ],
        schema=CHANGE_SCHEMA,
    )


def oracle_apply(lake: pa.Table | None, events: pa.Table) -> pd.DataFrame:
    """Single-process replay oracle (FIXTURES.md §4): apply events per key in
    (partition, offset) order — I/U upsert, D delete — then sort by
    (conv_id, turn_idx). Deliberately naive; the engine must match it."""
    state: dict[tuple, dict] = {}
    payload_cols = ["role", "text", "tool", "ts"]
    if lake is not None:
        for row in lake.to_pylist():
            state[(row["conv_id"], row["turn_idx"])] = {c: row.get(c) for c in payload_cols}
    ev = events.to_pandas().sort_values(["partition", "offset"], kind="stable")
    extra = [c for c in ev.columns if c not in set(payload_cols) | {"partition", "offset", "op", "conv_id", "turn_idx"}]
    for row in ev.itertuples(index=False):
        key = (row.conv_id, row.turn_idx)
        if row.op == "D":
            state.pop(key, None)
        else:
            state[key] = {c: getattr(row, c) for c in payload_cols + extra}
    if not state:
        cols = ["conv_id", "turn_idx"] + payload_cols
        return pd.DataFrame(columns=cols)
    recs = [{"conv_id": k[0], "turn_idx": k[1], **v} for k, v in state.items()]
    out = pd.DataFrame(recs).sort_values(["conv_id", "turn_idx"], kind="stable")
    return out.reset_index(drop=True)


def write_fixture(root: str, n_conv: int = 1000, n_events: int = 40_000,
                  seed: int = 42, num_partitions: int = 16,
                  files_per_partition: int = 1, **changelog_kw) -> dict:
    """Materialize lake/ + changelog/ parquet dirs under ``root``.

    The changelog is laid out one directory per partition with zero-padded
    offset-named files (reference layout: '%s-%05d-%012d' keys whose
    lexicographic order IS offset order, common/.../GroupedByDateLayout.java:33-38),
    so listing order = replay order and resume can prune whole files.
    """
    import os

    import pyarrow.parquet as pq

    lake = synth_lake(n_conv, seed)
    events = synth_changelog(n_conv, n_events, seed, num_partitions, **changelog_kw)
    lake_dir, log_dir = os.path.join(root, "lake"), os.path.join(root, "changelog")
    part = assign_partitions(lake.column("conv_id").to_numpy(zero_copy_only=False), num_partitions)
    for p in range(num_partitions):
        pdir = os.path.join(lake_dir, f"part={p}")
        os.makedirs(pdir, exist_ok=True)
        sub = lake.filter(pa.array(part == p))
        pq.write_table(sub, os.path.join(pdir, "base-000000000000.parquet"))
        edir = os.path.join(log_dir, f"partition={p}")
        os.makedirs(edir, exist_ok=True)
        esub = events.filter(pa.compute.equal(events.column("partition"), p))
        splits = np.array_split(np.arange(len(esub)), files_per_partition)
        for chunk in splits:
            if len(chunk) == 0:
                continue
            piece = esub.slice(int(chunk[0]), len(chunk))
            first = piece.column("offset")[0].as_py()
            pq.write_table(piece, os.path.join(edir, f"log-{first:012d}.parquet"))
    return {"lake_dir": lake_dir, "changelog_dir": log_dir, "lake": lake, "events": events}
