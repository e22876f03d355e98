"""Incrementally-maintained materialized views over the CDC'd lake.

The engine's CDC contract makes derived tables cheap to keep fresh: a
conversation lives wholly in one hash partition, every commit advances that
partition's watermark, and an untouched partition's content is provably
unchanged (fileset carried forward by reference — the same metadata-only
pruning ``snapshot_diff`` uses). So a per-conversation rollup view can be
maintained O(changed partitions) per refresh instead of O(lake):

- ``build_view``  — full rollup, one Ray task per lake partition, each
  writing ``view-<p>-<wm>.parquet`` (deterministic name AND bytes: the
  partition's watermark names the file, exactly the lake's
  commit-offset-named idempotence trick — reference analog:
  sink/.../S3SinkTask.java:249-254's start-offset-named files).
- ``refresh_view`` — recompute ONLY partitions whose watermark moved since
  the view's recorded state; everything else is carried forward by
  reference. Watermarks only move when new events commit, and compaction
  preserves content, so watermark equality proves rollup equality.
- Commit ordering mirrors S3Writer.putChunk (data -> index -> cursor,
  sink/.../S3Writer.java:47-67): partition files first (tmp + atomic
  rename), the view meta JSON (the cursor) last. A crash mid-refresh leaves
  the old meta pointing at the old (still present) files; the re-run
  regenerates identical bytes at identical names.

The view's rollup kernel is shared verbatim with ``conversation_stats``
(maintenance._conv_partial/_conv_final), so the incrementally-maintained
view is bit-identical to a from-scratch rollup — which is what the
``incremental_view`` oracle asserts.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

import ray

from ..state.manifest import Manifest

VIEW_META = "view_meta.json"


def _meta_path(view_dir: str) -> str:
    return os.path.join(view_dir, VIEW_META)


def _view_file(view_dir: str, p: int, wm: int) -> str:
    return os.path.join(view_dir, f"view-{p:05d}-{wm:012d}.parquet")


@ray.remote
def _rollup_partition_task(files: list[str], out_path: str) -> int:
    """Resolve one lake partition (merge-on-read) and write its rollup with
    deterministic bytes at ``out_path`` (tmp + atomic rename). Returns the
    rollup row count."""
    from .maintenance import conv_rollup_table
    from .upsert import _resolve_partition, _tmp_path

    t = _resolve_partition(files)
    roll = conv_rollup_table(t) if t is not None and len(t) else None
    if roll is None:
        from .maintenance import _conv_typed
        import pandas as pd

        roll = _conv_typed(pd.DataFrame(
            {c: [] for c in ("conv_id", "turns", "assistant_turns",
                             "tool_turns", "tokens_ws", "tokens_per_turn")}))
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    tmp = _tmp_path(out_path)
    pq.write_table(roll, tmp, compression="zstd")
    os.replace(tmp, out_path)
    return len(roll)


def _load_meta(view_dir: str) -> dict | None:
    try:
        with open(_meta_path(view_dir)) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def _write_meta(view_dir: str, meta: dict) -> None:
    from .upsert import _tmp_path

    path = _meta_path(view_dir)
    tmp = _tmp_path(path)
    with open(tmp, "w") as f:
        json.dump(meta, f, sort_keys=True)
    os.replace(tmp, path)


def refresh_view(manifest: Manifest | str, view_dir: str) -> dict:
    """Bring the conversation-stats view in ``view_dir`` up to date with the
    live lake snapshot. First call (or after a lake re-shard) builds from
    scratch; later calls recompute only partitions whose watermark advanced.
    Returns the new view meta: ``{"num_partitions": P, "partitions":
    {p: {"wm": w, "file": path}}, "rows": total}``."""
    m = Manifest.load(manifest) if isinstance(manifest, str) else manifest
    if not m.num_partitions:
        raise ValueError("manifest has no pinned partition count — "
                         "run an upsert before building a view over it")
    current = m.current_files()
    old = _load_meta(view_dir) or {}
    old_parts = old.get("partitions", {}) if (
        old.get("num_partitions") == m.num_partitions) else {}

    new_parts: dict[str, dict] = {}
    pending: list[tuple[str, "ray.ObjectRef"]] = []
    for p, files in sorted(current.items()):
        if not files:
            continue
        wm = m.watermark(p)
        prev = old_parts.get(str(p))
        if prev and prev["wm"] == wm and os.path.exists(prev["file"]):
            new_parts[str(p)] = prev  # watermark unmoved -> content unchanged
            continue
        out = _view_file(view_dir, p, wm)
        pending.append((str(p), _rollup_partition_task.remote(files, out)))
        new_parts[str(p)] = {"wm": wm, "file": out}
    counts = ray.get([r for _, r in pending])
    for (k, _), n in zip(pending, counts):
        new_parts[k]["rows"] = n
    for k, v in new_parts.items():
        if "rows" not in v:  # carried forward
            v["rows"] = int(old_parts[k].get("rows", 0))
    meta = {
        "view": "conversation_stats",
        "num_partitions": m.num_partitions,
        "partitions": new_parts,
        "rows": sum(int(v["rows"]) for v in new_parts.values()),
        "refreshed": len(pending),
        "carried": len(new_parts) - len(pending),
    }
    _write_meta(view_dir, meta)  # data before cursor
    return meta


def build_view(manifest: Manifest | str, view_dir: str) -> dict:
    """Full (re)build: forget any prior view state, then refresh. Use after
    changing the lake's partition count out from under an existing view."""
    try:
        os.remove(_meta_path(view_dir))
    except OSError:
        pass
    return refresh_view(manifest, view_dir)


def read_view(view_dir: str) -> "ray.data.Dataset":
    """The view's current contents as a streaming Dataset."""
    meta = _load_meta(view_dir)
    if meta is None:
        raise FileNotFoundError(f"no view meta at {_meta_path(view_dir)}")
    files = [v["file"] for _, v in sorted(meta["partitions"].items())]
    if not files:
        from .maintenance import _conv_typed
        import pandas as pd

        empty = _conv_typed(pd.DataFrame(
            {c: [] for c in ("conv_id", "turns", "assistant_turns",
                             "tool_turns", "tokens_ws", "tokens_per_turn")}))
        return ray.data.from_arrow(empty)
    return ray.data.read_parquet(files)


def view_table(view_dir: str) -> pa.Table:
    """Small-scale convenience: the whole view as one conv_id-sorted table
    (tests / oracle comparison only)."""
    meta = _load_meta(view_dir)
    if meta is None:
        raise FileNotFoundError(f"no view meta at {_meta_path(view_dir)}")
    tabs = [pq.read_table(v["file"])
            for _, v in sorted(meta["partitions"].items())]
    if not tabs:
        return read_view(view_dir).take_all()  # typed empty
    return pa.concat_tables(tabs).sort_by([("conv_id", "ascending")])
