"""Lake maintenance: lineage GC and invariant validation.

Reference analog: the reference leans on S3 lifecycle rules for old objects
and on its IT suite for invariants (delete-bucket + rewind,
sink/src/test/.../S3SinkConnectorIT.java:474-612); here both are first-class
ops on the manifest.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

from ..schema import KEY_COLUMNS
from ..state.bloom import bloom_path
from ..state.manifest import Manifest


def vacuum(manifest: Manifest | str, keep_generations: int = 1,
           dry_run: bool = False) -> list[str]:
    """Delete partition files older than the last ``keep_generations`` commits
    of each partition, and sweep aged ``*.inprogress*`` tmps that a crashed
    commit orphaned (delta-mode commits never rewrite the partition dir, so
    without this sweep their crash leavings would persist forever). The
    CURRENT fileset is never deleted; with keep_generations > 1, older
    snapshots stay replayable from their checkpoints. Returns the deleted
    (or would-delete) paths."""
    import glob as _glob

    from .upsert import _sweep_stale_tmp

    if isinstance(manifest, str):
        manifest = Manifest.load(manifest)
    doomed: list[str] = []
    lineage_changed = False
    if not dry_run and manifest.path:
        # sweep commit-token / pointer / heal tmps a crash left behind
        # (never the tokens themselves — they ARE the transaction log).
        # AGE-GATED like _sweep_stale_tmp: an in-flight concurrent commit
        # holds its tmp between write and os.link, and deleting it there
        # would turn the commit into a FileNotFoundError crash.
        import time as _time

        for tmp in (_glob.glob(manifest.path + ".v*.tmp-*")
                    + _glob.glob(manifest.path + ".tmp-*")):
            try:
                if _time.time() - os.path.getmtime(tmp) > 3600:
                    os.remove(tmp)
            except OSError:
                pass
        # also heal aged UNPARSABLE commit tokens: on a no-hardlink
        # filesystem the O_EXCL fallback (state/manifest.py commit) can die
        # between create and write, leaving a partial token that makes every
        # later commit of that snapshot id raise the retryable
        # ConcurrentCommitError forever. A healthy token is never touched;
        # the age gate (same 1h as the tmp sweep) protects a fallback writer
        # that is genuinely mid-write.
        import json as _json
        import re as _re

        for tok in _glob.glob(manifest.path + ".v*"):
            if not _re.search(r"\.v\d+$", tok):
                continue  # tmps handled above
            try:
                if _time.time() - os.path.getmtime(tok) <= 3600:
                    continue
                with open(tok) as f:
                    _json.load(f)
            except (ValueError, OSError):
                try:
                    os.remove(tok)
                    doomed.append(tok)
                except OSError:
                    pass
    pdirs: set[str] = set()
    for p, st in manifest.partitions.items():
        pdirs.update(os.path.dirname(path)
                     for e in st.get("files", []) for path in e["path"].split(";"))
        pdirs.update(os.path.dirname(path) for path in st.get("current", []))
    if not dry_run:
        for d in sorted(pdirs):
            _sweep_stale_tmp(d)
    for p, st in manifest.partitions.items():
        files = st.get("files", [])
        # A "generation" is a full snapshot: a REWRITE entry plus any deltas
        # after it. Deltas depend on their preceding base, so the cut point is
        # the K-th-newest rewrite entry; everything from it onward stays.
        if keep_generations > 0:
            rewrite_idx = [i for i, e in enumerate(files) if not e.get("delta")]
            cut = rewrite_idx[-keep_generations] if len(rewrite_idx) >= keep_generations \
                else 0
            keep = files[cut:]
            drop = files[:cut]
        else:
            keep, drop = [], files
        keep_paths = {path for e in keep for path in e["path"].split(";")}
        keep_paths.update(st.get("current", []))
        for e in drop:
            for path in e["path"].split(";"):
                if path not in keep_paths and os.path.exists(path):
                    doomed.append(path)
                    if not dry_run:
                        os.remove(path)
                        try:  # the file's bloom sidecar dies with it
                            os.remove(bloom_path(path))
                        except OSError:
                            pass
        if not dry_run:
            # lineage keeps only the retained generations (plus current refs)
            kept = [e for e in files
                    if e in keep or set(e["path"].split(";")) & set(st.get("current", []))]
            lineage_changed = lineage_changed or len(kept) != len(files)
            st["files"] = kept
    # A vacuum that deleted nothing and trimmed no lineage must NOT commit:
    # each commit retains a new snapshot, so a periodic no-op vacuum would
    # grow the transaction log without bound.
    if not dry_run and manifest.path and (doomed or lineage_changed):
        from ..state.manifest import ConcurrentCommitError

        caller_obj = manifest
        for attempt in range(5):
            try:
                manifest.commit()
                break
            except ConcurrentCommitError:
                # a writer committed while we were deleting: reload the
                # winner's state and re-apply the lineage trim there — drop
                # every lineage entry whose whole fileset is GONE FROM DISK
                # (covers both this run's deletions and dangling entries a
                # crashed earlier vacuum left); current refs always survive.
                if attempt == 4:
                    raise
                manifest = Manifest.load(manifest.path)
                retrimmed = False
                for st in manifest.partitions.values():
                    kept = [
                        e for e in st.get("files", [])
                        if (any(os.path.exists(pth)
                                for pth in e["path"].split(";"))
                            or set(e["path"].split(";"))
                            & set(st.get("current", [])))
                    ]
                    retrimmed = retrimmed or len(kept) != len(st.get("files", []))
                    st["files"] = kept
                if not retrimmed:
                    # the winner's state already reflects everything this
                    # vacuum did — committing would retain a no-op snapshot
                    break
        if caller_obj is not manifest:
            # vacuum(Manifest-object) callers keep using their object: sync
            # it to the state that was actually committed (the retry path
            # committed via a reloaded instance)
            caller_obj.__dict__.update(manifest.__dict__)
            manifest = caller_obj
        # Drop retained snapshot manifests that the deletions above made
        # unreadable (some of their fileset is gone). Snapshots whose files
        # survive (keep_generations > 1) remain time-travel-readable.
        # Tolerant of a CONCURRENT vacuum removing the same tokens between
        # our listing and our read/remove.
        live = set(Manifest.snapshots(manifest.path)[-1:])  # just committed
        for sid in Manifest.snapshots(manifest.path):
            if sid in live:
                continue
            try:
                snap = Manifest.load_snapshot(manifest.path, sid)
                ok = all(os.path.exists(f)
                         for fs in snap.current_files().values() for f in fs)
                if not ok:
                    os.remove(snap.path)
            except (FileNotFoundError, ValueError):
                continue
    return doomed


def lookup(manifest: Manifest | str, conv_id: str,
           turn_idx: int | None = None,
           snapshot: int | None = None) -> pa.Table | None:
    """Point read: fetch one conversation (or one turn) from the lake.
    Returns None when the routed partition has never been committed (its
    schema is unknown); an existing partition with no matching key returns an
    EMPTY table. ``snapshot`` reads a retained historical commit instead of
    the live lake (see ``Manifest.snapshots``).

    Routes by ``hash(conv_id) % P`` to exactly one partition's current files,
    then lets Parquet row-group statistics prune within them (files are
    key-sorted, so conv_id min/max stats skip non-matching row groups). Reads
    one partition's worth of metadata, never the lake."""
    from ..stages.partitioner import assign_partitions
    from .upsert import _resolve_manifest

    manifest = _resolve_manifest(manifest, snapshot)
    if not manifest.num_partitions:
        raise ValueError("manifest has no pinned partition count")
    from .upsert import _is_delta

    from ..schema import unify_with_nulls
    from ..stages.merge import lww_merge

    p = int(assign_partitions([conv_id], manifest.num_partitions)[0])
    files = manifest.partitions.get(p, {}).get("current", [])
    flt = pc.field("conv_id") == conv_id
    if turn_idx is not None:
        flt = flt & (pc.field("turn_idx") == turn_idx)
    import pyarrow.dataset as pads

    from ..state.bloom import file_might_contain

    base_tbls, delta_tbls = [], []
    for f in files:
        # bloom sidecar prunes whole files before any footer is opened;
        # missing/corrupt sidecar degrades to "might contain"
        if not file_might_contain(f, conv_id):
            continue
        t = pads.dataset(f).to_table(filter=flt)  # row-group stats prune
        (delta_tbls if _is_delta(f) else base_tbls).append(t)
    if not base_tbls and not delta_tbls:
        if files:
            # committed partition, key definitely absent (every file's bloom
            # rejected it): an EMPTY table with the partition's PAYLOAD
            # schema — probe a base file when one exists; a delta-only
            # partition's raw files still carry the provenance columns
            # (op/offset/...) that lww_merge drops on a real read, so the
            # empty result must drop them too or the same lookup would
            # return two different schemas depending on bloom hits
            from ..stages.merge import NON_PAYLOAD

            base_files = [f for f in files if not _is_delta(f)]
            sch = pq.read_schema((base_files or files)[0])
            if not base_files:
                sch = pa.schema([f for f in sch if f.name not in NON_PAYLOAD])
            return sch.empty_table()
        return None
    base = pa.concat_tables(base_tbls) if base_tbls else None
    if delta_tbls:
        # merge-on-read: the key's pending deltas (tiny after the filter)
        # resolve through the same LWW kernel as full reads
        out = lww_merge(base, pa.concat_tables(unify_with_nulls(delta_tbls)))
    else:
        out = base
    return out.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])


def repartition_lake(manifest: Manifest | str, out_lake_dir: str,
                     new_partitions: int) -> dict:
    """Explicit lake re-shard: re-bucket the CURRENT snapshot into
    ``part=<p'>/`` base files under ``out_lake_dir`` with ``hash(key) %
    new_partitions``.

    This is the sanctioned way to change P (run_upsert refuses a silent
    change). The output is a fresh BASE lake for a new changelog epoch: the
    old manifest's watermarks describe the old changelog partitioning and do
    not carry over — point the pipeline at the new lake_dir with a fresh
    manifest and a changelog whose offsets restart (or whose already-applied
    prefix is trimmed). Distribution: one groupby shuffle keyed on the new
    partition id; each group writes one key-sorted base file."""
    import ray.data

    from ..stages.partitioner import PartitionAssigner

    from .upsert import read_lake

    if isinstance(manifest, str):
        manifest = Manifest.load(manifest)
    ds = read_lake(manifest)  # resolves merge-on-read deltas
    ds = ds.map_batches(PartitionAssigner(new_partitions), batch_format="pyarrow")

    def write_part(g: pa.Table) -> pa.Table:
        p = int(g.column("part")[0].as_py())
        g = g.drop_columns([c for c in ("part", "salt") if c in g.column_names])
        g = g.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
        pdir = os.path.join(out_lake_dir, f"part={p}")
        os.makedirs(pdir, exist_ok=True)
        path = os.path.join(pdir, "base-000000000000.parquet")
        tmp = path + ".inprogress"
        pq.write_table(g, tmp, compression="zstd")
        os.replace(tmp, path)
        return pa.table({"part": pa.array([p], pa.int32()),
                         "rows": pa.array([len(g)], pa.int64())})

    stats = ds.groupby("part").map_groups(write_part, batch_format="pyarrow").take_all()
    return {"partitions": len(stats), "rows": int(sum(s["rows"] for s in stats)),
            "lake_dir": out_lake_dir}


def validate_lake(manifest: Manifest | str,
                  key_cols: list[str] = KEY_COLUMNS) -> dict:
    """Check lake invariants, distributed:

    - key uniqueness across the whole snapshot (hash-grouped count)
    - per-file key-sorted order (the determinism contract)
    - manifest/file agreement (row counts, files exist)

    Returns a report dict; raises AssertionError on violation."""
    from .upsert import _is_delta, read_lake

    if isinstance(manifest, str):
        manifest = Manifest.load(manifest)
    report = {"partitions": {}, "total_rows": 0, "duplicate_keys": 0}
    any_files = False
    for p, st in sorted(manifest.partitions.items()):
        rows = 0
        has_delta = False
        for path in st.get("current", []):
            if not os.path.exists(path):  # bare asserts vanish under -O
                raise AssertionError(f"manifest references missing file {path}")
            md = pq.read_metadata(path)
            rows += md.num_rows
            has_delta = has_delta or _is_delta(path)
            tbl = pq.read_table(path, columns=key_cols)
            srt = tbl.sort_by([(c, "ascending") for c in key_cols])
            if not tbl.equals(srt):
                raise AssertionError(f"{path} is not key-sorted")
            any_files = True
        last = st.get("files", [])[-1:] if st.get("files") else []
        if last and not has_delta:
            # with pending deltas the snapshot row count is a merge result,
            # not a sum of file rows — the dup check below still covers it
            if last[0]["num_rows"] != rows:
                raise AssertionError(
                    f"partition {p}: manifest says {last[0]['num_rows']} "
                    f"rows, files have {rows}"
                )
        report["partitions"][p] = {"rows": rows, "files": len(st.get("current", []))}
        report["total_rows"] += rows
    if any_files:
        # read_lake resolves merge-on-read deltas, so key uniqueness is
        # checked on the SNAPSHOT view, not raw files
        ds = read_lake(manifest)

        def dup_count(batch: pa.Table) -> pa.Table:
            import numpy as np
            import pandas as pd

            batch = batch.select(key_cols)  # only keys cross the shuffle
            h = pd.util.hash_pandas_object(
                batch.to_pandas(), index=False
            ).to_numpy()
            coarse = (h % np.uint64(64)).astype(np.int32)
            return batch.append_column("_coarse", pa.array(coarse))

        def dups(g, _k=tuple(key_cols)):
            d = int(g.duplicated(list(_k)).sum())
            import pandas as pd

            return pd.DataFrame({"dups": [d]})

        total_dups = int(
            ds.map_batches(dup_count, batch_format="pyarrow")
            .groupby("_coarse")
            .map_groups(dups, batch_format="pandas")
            .to_pandas()["dups"].sum()
        )
        report["duplicate_keys"] = total_dups
        if total_dups != 0:
            raise AssertionError(f"{total_dups} duplicate keys in the lake")
    return report


def _conv_partial(t: pa.Table) -> "pa.Table":
    """Per-block conversation rollup partial: one row per conv_id seen in the
    block with its additive contributions (turns, assistant_turns, tool_turns,
    tokens_ws). Shared verbatim by the streaming rollup and the incremental
    view so both compute bit-identical stats."""
    import numpy as np
    import pandas as pd

    ws = pc.fill_null(pc.cast(
        pc.count_substring_regex(t.column("text"), r"\S+"),
        pa.int64()), 0)
    df = pd.DataFrame({
        "conv_id": t.column("conv_id").to_pandas(),
        "turns": np.ones(len(t), np.int64),
        "assistant_turns": pc.fill_null(
            pc.equal(t.column("role"), "assistant"),
            False).to_numpy(zero_copy_only=False).astype(np.int64),
        "tool_turns": pc.is_valid(t.column("tool")).to_numpy(
            zero_copy_only=False).astype(np.int64),
        "tokens_ws": ws.to_numpy(zero_copy_only=False),
    })
    g = df.groupby("conv_id", as_index=False).sum()
    return pa.Table.from_pandas(g, preserve_index=False)


def _conv_final(g: "pd.DataFrame") -> "pd.DataFrame":
    """Fold conversation rollup partials to final per-conv rows and derive
    tokens_per_turn (exact-int float64 ratio — the oracle contract)."""
    import numpy as np

    out = g.groupby("conv_id", as_index=False)[
        ["turns", "assistant_turns", "tool_turns", "tokens_ws"]].sum()
    out["tokens_per_turn"] = (out["tokens_ws"].astype(np.float64)
                              / out["turns"].to_numpy())
    return out


def _conv_typed(df: "pd.DataFrame") -> "pa.Table":
    """Pin the rollup's output schema (conv_id-sorted)."""
    df = df.sort_values("conv_id").reset_index(drop=True)
    return pa.table({
        "conv_id": pa.array(df["conv_id"], pa.string()),
        "turns": pa.array(df["turns"], pa.int64()),
        "assistant_turns": pa.array(df["assistant_turns"], pa.int64()),
        "tool_turns": pa.array(df["tool_turns"], pa.int64()),
        "tokens_ws": pa.array(df["tokens_ws"], pa.int64()),
        "tokens_per_turn": pa.array(df["tokens_per_turn"], pa.float64()),
    })


def conv_rollup_table(t: pa.Table) -> "pa.Table":
    """Rollup of ONE in-memory transcript table (a single lake partition —
    a conversation lives wholly in one partition, so per-partition rollups
    are globally final). Used by the incremental view's partition tasks."""
    return _conv_typed(_conv_final(_conv_partial(t).to_pandas()))


def string_hash_buckets(col, n_buckets: int = 64) -> "pa.Array":
    """Coarse hash-bucket ids (int32) for a string key column — THE exchange
    key of every per-conversation / per-prompt analytics stage
    (conversation_stats, conversation_rebuild, dialog_integrity, turn_pairs,
    sft_curation's prompt dedup). One definition so the bucket count, the
    hash, and the NULL rule ('' — bucketing only; grouping still sees the
    real value) can never drift between the five callers."""
    import numpy as np
    import pandas as pd

    ids = np.asarray(["" if x is None else x for x in col.to_pylist()],
                     dtype=object)
    return pa.array((pd.util.hash_array(ids)
                     % np.uint64(n_buckets)).astype(np.int32))


def conversation_stats_table(ds) -> "pa.Table":
    """Per-conversation rollup of a transcript Dataset (turns, role mix,
    tool usage, whitespace-token volume, tokens/turn) — the shared kernel
    behind the `stats` CLI and the `conversation_stats` catalog entry.
    Two-level aggregation shaped for corpus-cardinality keys: per-block
    vectorized partials (Arrow regex token counts + one pandas groupby per
    batch) -> coarse conv-hash bucket exchange -> per-bucket final sums.
    Returns a conv_id-sorted Arrow table."""
    import pandas as pd

    def add_bkt(t: pa.Table) -> pa.Table:
        return t.append_column("_bkt",
                               string_hash_buckets(t.column("conv_id")))

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return _conv_final(g)

    parts = ds.map_batches(_conv_partial, batch_format="pyarrow").map_batches(
        add_bkt, batch_format="pyarrow")
    df = (parts.groupby("_bkt").map_groups(final, batch_format="pandas")
          .to_pandas())
    return _conv_typed(df)


def turn_pairs_dataset(ds):
    """Instruction-response pair mining over a transcript Dataset — the
    kernel shared by the ``turn_pairs`` catalog entry and the
    ``export-pairs`` CLI verb (same single-kernel discipline as
    ``conversation_stats_table``). Every user turn whose NEXT surviving
    turn (positional lead in turn order — deletes can gap turn_idx) is an
    assistant turn yields (conv_id, turn_idx, prompt, response). One coarse
    conv-hash exchange; per-bucket lexsort + shift(-1) compare; NULL texts
    pass through as genuine NULLs (SQL lead semantics)."""
    import pandas as pd

    def project(t: pa.Table) -> pa.Table:
        return pa.table({"conv_id": pc.cast(t.column("conv_id"), pa.string()),
                         "turn_idx": pc.cast(t.column("turn_idx"), pa.int64()),
                         "role": pc.cast(t.column("role"), pa.string()),
                         "text": pc.cast(t.column("text"), pa.string()),
                         "_bkt": string_hash_buckets(t.column("conv_id"))})

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx"],
                          kind="stable").reset_index(drop=True)
        same_next = g["conv_id"].eq(g["conv_id"].shift(-1))
        nrole = g["role"].shift(-1)
        keep = (same_next & (g["role"] == "user")
                & (nrole == "assistant")).to_numpy()
        out = pd.DataFrame({"conv_id": g["conv_id"],
                            "turn_idx": g["turn_idx"],
                            "prompt": g["text"],
                            "response": g["text"].shift(-1)})
        return out[keep]

    out = (ds.map_batches(project, batch_format="pyarrow")
           .groupby("_bkt").map_groups(pairs, batch_format="pandas"))

    def fix(t: pa.Table) -> pa.Table:
        return pa.table({
            "conv_id": pc.cast(t.column("conv_id"), pa.string()),
            "turn_idx": pc.cast(t.column("turn_idx"), pa.int64()),
            "prompt": pc.cast(t.column("prompt"), pa.string()),
            "response": pc.cast(t.column("response"), pa.string())})

    return out.map_batches(fix, batch_format="pyarrow")
