"""The flagship pipeline: changelog tail -> hash-partition shuffle -> per-partition
LWW merge -> deterministic partition-file commits -> manifest.

Ray translation of the reference sink lifecycle (SURVEY.md §3.1-3.3):

    manifest = Manifest.load(...)                     # cursor/offset recovery (S4)
    events = read_parquet(changelog,                  # source read (S5/S6)
                          filter=offset > min_wm)     #   row-group pruning (S7/D1)
      .map_batches(PrepareEvents)                     # residual watermark filter,
                                                      #   part/salt assign (M1), and
                                                      #   per-batch LWW combiner
      [.groupby(part, salt).map_groups(compact)]      # salted pre-reduce for hot keys
      .groupby(part).map_groups(MergeCommit)          # S1+S2+S3+J1+D3: merge with the
                                                      #   lake partition, write
                                                      #   part=<p>/commit-<wm>.parquet
    manifest.commit()                                 # cursor written LAST (S3 ordering)

Exactly-once: output file names and bytes are deterministic functions of
(partition, watermark range, events) — a Ray task retry or a full replay from
any checkpoint overwrites identical files (reference rewind IT,
sink/src/test/.../S3SinkConnectorIT.java:474-612). No wall-clock enters data.

Scale notes (100 TB design):
- the only all-to-all exchange is the groupby("part") shuffle of *compacted*
  events; the per-batch combiner bounds its volume by touched-key cardinality.
- the lake itself never shuffles: each merge task reads exactly its partition's
  current snapshot file(s) and streams one new file out. P is chosen so one
  partition snapshot fits a worker heap (~<=1 GiB).
- partitions with no new events are carried forward in the manifest without
  touching their files (no copy).
"""

from __future__ import annotations

import glob
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

import ray.data

from ..schema import KEY_COLUMNS as KEY_COLUMNS_DEFAULT
from ..schema import PROVENANCE_COLUMNS, schema_fingerprint, unify_with_nulls
from ..stages.merge import align_to_schema, compact_events, lww_merge
from ..state.bloom import write_bloom_sidecar
from ..stages.partitioner import PART_COLUMN, SALT_COLUMN, PartitionAssigner
from ..state.manifest import EMPTY_WATERMARK, Manifest, is_delta_file

STATS_SCHEMA = pa.schema(
    [
        ("part", pa.int32()),
        ("path", pa.string()),
        ("high_watermark", pa.int64()),
        ("num_rows", pa.int64()),
        ("num_events", pa.int64()),
        ("merge_seconds", pa.float64()),
        ("mode", pa.string()),  # "rewrite" | "delta"
    ]
)


def _stats_row(p, paths, wm, rows, events, sec, mode):
    return pa.Table.from_arrays(
        [
            pa.array([p], pa.int32()),
            pa.array([";".join(paths)], pa.string()),
            pa.array([wm], pa.int64()),
            pa.array([rows], pa.int64()),
            pa.array([events], pa.int64()),
            pa.array([sec], pa.float64()),
            pa.array([mode], pa.string()),
        ],
        schema=STATS_SCHEMA,
    )


def _tmp_path(final: str) -> str:
    """Attempt-unique in-progress name: on shared storage a falsely-declared-
    lost task and its retry can run CONCURRENTLY; sharing one tmp path would
    let one attempt rename the other's partial file into the committed path.
    Unique tmps + atomic os.replace keep every rename whole (both attempts
    write identical deterministic bytes, so last-rename-wins is safe);
    orphaned tmps are swept by vacuum() (all partition dirs) and by the next
    rewrite commit to the same partition dir (_sweep_stale_tmp) — both only
    touch tmps old enough that no live retry can still be writing them."""
    import uuid

    return f"{final}.inprogress-{uuid.uuid4().hex[:8]}"


def _sweep_stale_tmp(pdir: str, min_age_s: float = 3600.0) -> None:
    """Remove crashed commits' orphaned tmp files — but only ones old enough
    that no live (concurrent retry) attempt can still be writing them."""
    now = time.time()
    for stale in glob.glob(os.path.join(pdir, "*.inprogress*")):
        try:
            if now - os.path.getmtime(stale) >= min_age_s:
                os.remove(stale)
        except OSError:
            pass


def _commit_delta(p: int, events: pa.Table, wm: int, out_dir: str,
                  t0: float) -> pa.Table:
    """Merge-on-read commit: write ONLY the compacted change slice as
    ``delta-<wm>.parquet`` (op + offset + payload, key-sorted). The snapshot
    is resolved at read time by the same LWW kernel (lake_table/read_lake
    call lww_merge(base, concat(deltas))); ``compact_partitions`` folds deltas
    back into the base. This is the LSM tradeoff the rewrite mode's write
    amplification motivates: O(delta) writes per round instead of O(partition)."""
    events = compact_events(events)  # one row per key -> deterministic bytes
    drop = [c for c in ("partition", "part", "salt") if c in events.column_names]
    delta = events.drop_columns(drop) if drop else events
    delta = delta.sort_by([(c, "ascending") for c in KEY_COLUMNS_DEFAULT])
    new_wm = max(wm, int(pc.max(events.column("offset")).as_py()))
    pdir = os.path.join(out_dir, f"part={p}")
    os.makedirs(pdir, exist_ok=True)
    path = os.path.join(pdir, f"delta-{new_wm:012d}.parquet")
    tmp = _tmp_path(path)
    pq.write_table(delta, tmp, compression="zstd")
    os.replace(tmp, path)
    write_bloom_sidecar(path, delta.column("conv_id"))
    return _stats_row(p, [path], new_wm, len(delta), len(events),
                      time.monotonic() - t0, "delta")


class PrepareEvents:
    """Stateless map_batches stage (Arrow in/out, zero-copy): assigns
    ``part``/``salt``, drops events at or below the partition watermark
    (vectorized np lookup — the reference's record-skip loop,
    source/.../S3FilesReader.java:306-311, replaced by a filter), and runs the
    per-batch LWW combiner so the shuffle moves at most one row per touched key
    per batch."""

    def __init__(self, watermarks: dict[int, int], num_partitions: int,
                 hot_keys: set[str] | None = None, n_salts: int = 8,
                 combine: bool = True):
        self.assigner = PartitionAssigner(num_partitions, hot_keys, n_salts)
        wm = np.full(num_partitions, EMPTY_WATERMARK, dtype=np.int64)
        for p, w in watermarks.items():
            if 0 <= p < num_partitions:
                wm[p] = w
        self.wm = wm
        self.combine = combine

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch
        batch = self.assigner(batch)
        part = batch.column(PART_COLUMN).to_numpy(zero_copy_only=False)
        if "partition" in batch.column_names:
            # Ingest contract: changelog partition assignment must equal
            # hash(conv_id) % P — offsets are dense per changelog partition,
            # so the per-lake-partition watermark filter is only sound when
            # the two partitionings coincide. A foreign partitioning must be
            # re-bucketed (or fed without a partition column, with globally
            # monotone offsets) — fail loudly instead of silently dropping.
            src = batch.column("partition").to_numpy(zero_copy_only=False)
            if not (src == part).all():
                raise ValueError(
                    "changelog 'partition' column disagrees with hash(conv_id) % "
                    f"{len(self.wm)} — re-bucket the changelog (repartition_lake / "
                    "re-ingest) or drop the partition column if offsets are a "
                    "single global sequence"
                )
        offs = batch.column("offset").to_numpy(zero_copy_only=False)
        keep = offs > self.wm[part]
        if not keep.all():
            batch = batch.filter(pa.array(keep))
        if self.combine and len(batch):
            batch = compact_events(batch)
        return batch


def _salted_compact(group: pa.Table) -> pa.Table:
    return compact_events(group)


class MergeCommit:
    """Per-partition merge + deterministic file commit, run inside
    ``groupby("part").map_groups``. One invocation sees ALL (compacted) events
    of its partition — the co-location the reference gets from Kafka's
    consumer-group assignment (sink/.../S3SinkConnector.java:36-45), here
    re-established by the hash shuffle."""

    def __init__(self, out_dir: str, current_files: dict[int, list[str]],
                 watermarks: dict[int, int], target_schema: pa.Schema,
                 row_group_size: int = 128 * 1024, commit_mode: str = "rewrite"):
        self.out_dir = out_dir
        self.current_files = current_files
        self.watermarks = watermarks
        self.target_schema = target_schema
        self.row_group_size = row_group_size
        self.commit_mode = commit_mode

    def __call__(self, group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return pa.Table.from_arrays([[]] * len(STATS_SCHEMA.names), schema=STATS_SCHEMA)
        p = int(group.column(PART_COLUMN)[0].as_py())
        return _commit_partition(
            p, group, self.current_files.get(p, []),
            self.watermarks.get(p, EMPTY_WATERMARK), self.out_dir,
            self.target_schema, self.row_group_size,
            commit_mode=self.commit_mode,
        )



def _ncpu(default: int = 8) -> int:
    try:
        return int(ray.cluster_resources().get("CPU", default))
    except Exception:
        return default


def _auto_task_cpus(task_num_cpus) -> dict:
    """Memory-heavy stage sizing (see the co-partitioned path note): reserve
    extra CPUs per task on SMT-oversubscribed hosts."""
    if task_num_cpus == "auto":
        task_num_cpus = max(1, round(_ncpu() / 16))
    return {"num_cpus": task_num_cpus} if task_num_cpus != 1 else {}


def _commit_partition(p: int, events: pa.Table, lake_files: list[str], wm: int,
                      out_dir: str, target_schema: pa.Schema,
                      row_group_size: int = 128 * 1024,
                      max_file_rows: int = 4_000_000,
                      streaming_threshold_rows: int = 2_000_000,
                      commit_mode: str = "rewrite") -> pa.Table:
    """Merge ``events`` (all events of partition ``p`` this round) with the
    partition's current snapshot and commit one deterministic file.

    Small partitions merge in memory (fastest); a partition whose snapshot
    exceeds ``streaming_threshold_rows`` switches to the streaming merge-join
    (``merge_sorted_stream``), which never holds more than one lake row-group
    plus the compacted change set — the path that keeps per-task memory
    bounded no matter how big a partition grows."""
    t0 = time.monotonic()
    if commit_mode == "delta":
        return _commit_delta(p, events, wm, out_dir, t0)
    n_events = len(events)
    bases = [f for f in lake_files if not _is_delta(f)]
    deltas = [f for f in lake_files if _is_delta(f)]
    base_rows = sum(pq.read_metadata(f).num_rows for f in bases) if bases else 0
    if base_rows > streaming_threshold_rows and _files_globally_key_sorted(bases):
        # Delta-aware streaming: pending merge-on-read deltas ARE compacted
        # change slices (op + offset + payload), so they fold into this
        # round's change set — LWW by offset resolves base-vs-delta-vs-event
        # exactly — and the bounded-memory merge-join path stays available in
        # delta mode (memory: O(row_group + compacted deltas + events)).
        if deltas:
            delta_tbl = pa.concat_tables(
                unify_with_nulls([pq.read_table(f) for f in deltas])
            )
            events = compact_events(pa.concat_tables(
                unify_with_nulls([delta_tbl, events])
            ))
        # n_events = this round's NEW events only — the folded delta rows were
        # already counted by the commit that wrote them
        return _commit_partition_streaming(
            p, events, bases, wm, out_dir, target_schema,
            row_group_size, max_file_rows, t0, n_events=n_events,
        )
    # small partition: resolve deltas + merge fully in memory (fastest)
    lake_tbl = _resolve_partition(lake_files) if lake_files else None
    merged = lww_merge(lake_tbl, events)
    merged = align_to_schema(merged, target_schema)
    new_wm = max(wm, int(pc.max(events.column("offset")).as_py()))
    pdir = os.path.join(out_dir, f"part={p}")
    os.makedirs(pdir, exist_ok=True)
    _sweep_stale_tmp(pdir)
    # Rotate into bounded files (never one giant file — resumable output, and
    # the analog of the sink's file-size flush W2): deterministic names
    # commit-<wm>[-<seq>].parquet, deterministic split points (row count).
    n_files = max(1, -(-len(merged) // max_file_rows))
    paths = []
    rows_per = -(-len(merged) // n_files) if n_files else len(merged)
    for seq in range(n_files):
        piece = merged.slice(seq * rows_per, rows_per)
        suffix = f"-{seq:04d}" if n_files > 1 else ""
        path = os.path.join(pdir, f"commit-{new_wm:012d}{suffix}.parquet")
        tmp = _tmp_path(path)
        # Deterministic bytes: fixed writer settings, stable row order (merged
        # is key-sorted), no wall-clock metadata.
        pq.write_table(piece, tmp, row_group_size=row_group_size, compression="zstd")
        os.replace(tmp, path)  # data committed before the manifest (cursor) is
        write_bloom_sidecar(path, piece.column("conv_id"))
        paths.append(path)
    return _stats_row(p, paths, new_wm, len(merged), n_events,
                      time.monotonic() - t0, "rewrite")


def _files_globally_key_sorted(files: list[str]) -> bool:
    """The streaming merge-join needs the partition's files to cover DISJOINT,
    ascending key ranges (true for engine-written commits; an imported base
    may not satisfy it). Checked from each file's first/last key only."""
    prev_last = None
    for f in files:
        pf = pq.ParquetFile(f)
        if pf.metadata.num_rows == 0:
            continue
        head = next(pf.iter_batches(batch_size=1, columns=["conv_id", "turn_idx"]))
        first = (head.column(0)[0].as_py(), head.column(1)[0].as_py())
        lastrg = pf.read_row_group(pf.num_row_groups - 1,
                                   columns=["conv_id", "turn_idx"])
        last = (lastrg.column(0)[-1].as_py(), lastrg.column(1)[-1].as_py())
        if prev_last is not None and first <= prev_last:
            return False
        prev_last = last
    return True


def _commit_partition_streaming(p: int, events: pa.Table, lake_files: list[str],
                                wm: int, out_dir: str, target_schema: pa.Schema,
                                row_group_size: int, max_file_rows: int,
                                t0: float, n_events: int | None = None) -> pa.Table:
    """Streaming merge-join commit: iterate the key-sorted snapshot row-group
    by row-group, merge each piece with its slice of the (compacted) change
    set, and write through a rolling ParquetWriter with deterministic file
    rotation. Memory: O(row_group + compacted events). ``n_events`` lets the
    caller report the pre-delta-fold event count so already-committed delta
    rows aren't double-counted in the stats row."""
    from ..stages.merge import merge_sorted_stream

    n_events = len(events) if n_events is None else n_events
    pdir = os.path.join(out_dir, f"part={p}")
    os.makedirs(pdir, exist_ok=True)
    _sweep_stale_tmp(pdir)
    new_wm = max(wm, int(pc.max(events.column("offset")).as_py()))

    def lake_batches():
        for f in lake_files:
            pf = pq.ParquetFile(f)
            for rb in pf.iter_batches(batch_size=row_group_size):
                yield pa.Table.from_batches([rb])

    paths: list[str] = []
    writer = None
    tmp = None
    rows_in_file = 0
    total_rows = 0
    file_keys: list[pa.Array] = []  # this file's distinct conv_ids (bloom)

    final_path = None

    def close_current():
        writer.close()
        os.replace(tmp, final_path)
        write_bloom_sidecar(
            final_path,
            pa.chunked_array(file_keys) if file_keys
            else pa.array([], pa.string()))
        file_keys.clear()
        paths.append(final_path)

    def roll():
        nonlocal writer, tmp, rows_in_file, final_path
        if writer is not None:
            close_current()
        suffix = f"-{len(paths):04d}"
        final_path = os.path.join(pdir, f"commit-{new_wm:012d}{suffix}.parquet")
        tmp = _tmp_path(final_path)
        writer = pq.ParquetWriter(tmp, target_schema, compression="zstd")
        rows_in_file = 0

    roll()
    for piece in merge_sorted_stream(lake_batches(), events):
        piece = align_to_schema(piece, target_schema)
        if rows_in_file and rows_in_file + len(piece) > max_file_rows:
            roll()
        writer.write_table(piece, row_group_size=row_group_size)
        # arrow-native per-piece dedup: no object conversion in the hot loop
        file_keys.append(pc.unique(piece.column("conv_id").combine_chunks()))
        rows_in_file += len(piece)
        total_rows += len(piece)
    close_current()

    return _stats_row(p, paths, new_wm, total_rows, n_events,
                      time.monotonic() - t0, "rewrite")


def _discover_partition_dirs(changelog) -> dict[int, list[str]] | None:
    """Detect a pre-partitioned changelog layout (``partition=<p>/`` dirs —
    the engine's own ingest layout, mirroring Kafka's keyed partitioning).
    Returns {p: [files]} or None if the layout doesn't apply."""
    if not isinstance(changelog, str) or not os.path.isdir(changelog):
        return None
    out: dict[int, list[str]] = {}
    for entry in sorted(os.listdir(changelog)):
        full = os.path.join(changelog, entry)
        if not (os.path.isdir(full) and entry.startswith("partition=")):
            return None
        try:
            p = int(entry.split("=", 1)[1])
        except ValueError:
            return None
        files = sorted(glob.glob(os.path.join(full, "*.parquet")))
        if files:
            out[p] = files
    return out or None


# Task retry budget mirrors the reference's S3-put retries (5 attempts,
# sink/.../S3Writer.java:119-136): transient worker/IO failures retry; the
# commits are idempotent (same names, same bytes), so a retried task can never
# duplicate or diverge output.
@ray.remote(max_retries=4, retry_exceptions=True)
def _compact_partition_files(p: int, files: list[str], wm: int,
                             batch_rows: int = 256 * 1024,
                             fault_inject_dir: str | None = None) -> pa.Table:
    """Stream one partition's changelog files and LWW-compact them.

    Compaction is associative, so memory stays bounded by the touched-key
    cardinality, not the event count — and a skewed (hot) partition can split
    its files across several of these tasks and combine the results exactly
    (the salted-splits idea without a shuffle).

    ``fault_inject_dir`` is a testing hook: the first attempt per partition
    raises after dropping a marker file, proving convergence under Ray task
    retries (reference analog: the rewind/restart IT matrix)."""
    import pyarrow.dataset as pads_local

    if fault_inject_dir:
        marker = os.path.join(fault_inject_dir, f"fault-fired-{p}")
        if not os.path.exists(marker):
            open(marker, "w").close()
            raise RuntimeError(f"injected transient fault for partition {p}")

    acc: pa.Table | None = None
    # scan with the UNION schema: a first-fragment-inferred schema would drop
    # (or choke on) columns added by mid-stream evolution in later files
    scanner = pads_local.dataset(files, schema=_union_file_schema(files)).scanner(
        filter=(pads_local.field("offset") > wm) if wm > EMPTY_WATERMARK else None,
        batch_size=batch_rows,
    )
    for rb in scanner.to_batches():
        if rb.num_rows == 0:
            continue
        t = pa.Table.from_batches([rb])
        if pc.any(pc.not_equal(t.column("partition"), p)).as_py():
            raise ValueError(
                f"changelog file in partition={p} contains foreign partition ids "
                "— co-partitioned layout contract violated; rerun with mode='shuffle'"
            )
        t = compact_events(t)
        acc = t if acc is None else compact_events(pa.concat_tables(
            unify_with_nulls([acc, t])))
    if acc is None:
        return pa.schema([]).empty_table()
    return acc


@ray.remote(max_retries=4, retry_exceptions=True)
def _fold_deltas_task(p: int, bases: list[str], delta_files: list[str], wm: int,
                      out_dir: str, target_schema: pa.Schema) -> pa.Table:
    """Compaction worker: read the partition's pending delta files HERE (never
    on the driver — deltas accumulate between compactions and must not ship as
    task args), fold them into a fresh base commit."""
    delta_tbl = pa.concat_tables(
        unify_with_nulls([pq.read_table(f) for f in delta_files])
    )
    return _commit_partition(p, delta_tbl, bases, wm, out_dir, target_schema,
                             commit_mode="rewrite")


@ray.remote(max_retries=4, retry_exceptions=True)
def _commit_compacted_task(p: int, lake_files: list[str], wm: int, out_dir: str,
                           target_schema: pa.Schema, commit_mode: str,
                           *compacted: pa.Table) -> pa.Table:
    """Combine the partition's compacted slices (exact — compaction is
    associative), merge with its lake snapshot, commit one file."""
    parts = [t for t in compacted if len(t.schema)]
    if not parts or sum(len(t) for t in parts) == 0:
        return pa.Table.from_arrays([[]] * len(STATS_SCHEMA.names), schema=STATS_SCHEMA)
    events = parts[0] if len(parts) == 1 else compact_events(
        pa.concat_tables(unify_with_nulls(parts))
    )
    return _commit_partition(p, events, lake_files, wm, out_dir, target_schema,
                             commit_mode=commit_mode)


def _discover_base_files(lake_dir: str | None, num_partitions: int) -> dict[int, list[str]]:
    out: dict[int, list[str]] = {}
    if not lake_dir or not os.path.isdir(lake_dir):
        return out
    for p in range(num_partitions):
        files = sorted(glob.glob(os.path.join(lake_dir, f"part={p}", "*.parquet")))
        if files:
            out[p] = files
    return out


def _payload_schema(sch: pa.Schema) -> pa.Schema:
    return pa.schema([f for f in sch
                      if f.name not in (*PROVENANCE_COLUMNS, PART_COLUMN, SALT_COLUMN)])


def _target_schema(changelog_schema: pa.Schema,
                   current_files: dict[int, list[str]]) -> pa.Schema:
    """Union payload schema across the changelog and EVERY partition's current
    fileset so the new snapshot is written with one schema (additive
    evolution: new columns null-filled everywhere).

    Every partition must be sampled — untouched partitions carry forward
    without rewriting, so an evolved column can live in SOME partitions'
    files only; sampling just one partition would drop it (silent data loss)
    at the next rewrite of the evolved partitions. One parquet FOOTER read
    per partition file-set (metadata only, driver-side, cheap)."""
    tables = [_payload_schema(changelog_schema).empty_table()]
    for files in current_files.values():
        # a base file carries the partition's full snapshot schema; deltas
        # may additionally carry newer evolved columns — union both kinds
        picks = [next((f for f in files if not _is_delta(f)), None)]
        picks += [f for f in files if _is_delta(f)]
        for pick in picks:
            if pick is None:
                continue
            tables.append(_payload_schema(pq.read_schema(pick)).empty_table())
    unified = unify_with_nulls(tables)
    return unified[0].schema


def _union_file_schema(files: list[str]) -> pa.Schema:
    """Union schema over parquet files (footer reads only) — mid-stream
    additive evolution means later files can carry columns the first one
    lacks; inferring from one fragment would drop them."""
    if not files:
        return pa.schema([])  # empty changelog tick: nothing to contribute
    schemas = [pq.read_schema(f) for f in files]
    unified = unify_with_nulls([s.empty_table() for s in schemas])
    return unified[0].schema


def run_upsert(
    changelog: str | list[str],
    out_dir: str,
    manifest_path: str,
    lake_dir: str | None = None,
    num_partitions: int = 16,
    hot_keys: set[str] | str | None = None,
    n_salts: int = 8,
    batch_size: int | None = 64 * 1024,
    concurrency: int | None = None,
    mode: str = "auto",
    commit_mode: str = "rewrite",
    task_num_cpus: int | float | str = "auto",
    _fault_inject_dir: str | None = None,
) -> Manifest:
    """Run one incremental upsert round. Idempotent and resumable: replaying
    with the same inputs regenerates identical files; already-applied offsets
    (<= per-partition watermark) are filtered out.

    ``mode``:
      - "auto" (default): use the zero-shuffle co-partitioned path when the
        changelog is laid out ``partition=<p>/`` (the engine's ingest layout,
        = Kafka keyed partitioning), else the hash-shuffle path.
      - "copartitioned" / "shuffle": force one path (tests, foreign layouts).
    """
    from ..stages.partitioner import detect_hot_keys

    if isinstance(hot_keys, str) and hot_keys != "auto":
        raise ValueError(
            "hot_keys must be 'auto' or a collection of keys — a bare string "
            f"({hot_keys!r}) would be exploded into its characters"
        )
    manifest = Manifest.load(manifest_path)
    manifest.pin_partitions(num_partitions)
    base = _discover_base_files(lake_dir, num_partitions)
    for p, files in base.items():
        manifest.init_partition(p, files)
    current = manifest.current_files()
    wms = manifest.watermarks(num_partitions)
    min_wm = manifest.global_min_watermark(num_partitions)

    # -- Dataset input (e.g. a decoded byte-archive changelog): shuffle path --
    if isinstance(changelog, ray.data.Dataset):
        ds = changelog
        if hot_keys == "auto":
            from ..stages.partitioner import detect_hot_keys as _dhk

            hot_keys = _dhk(ds, threshold_frac=0.05)
        hot_keys = set(hot_keys or ())
        prep = PrepareEvents(wms, num_partitions, hot_keys, n_salts)
        ds = ds.map_batches(prep, batch_format="pyarrow", batch_size=batch_size)
        if hot_keys:
            ds = ds.groupby([PART_COLUMN, SALT_COLUMN]).map_groups(
                _salted_compact, batch_format="pyarrow"
            )
        ds_schema = pa.schema(
            [pa.field(n, t) for n, t in zip(changelog.schema().names,
                                            changelog.schema().types)]
        )
        target = _target_schema(ds_schema, current)
        commit = MergeCommit(out_dir, current, wms, target, commit_mode=commit_mode)

        def merge_commit_ds(group: pa.Table, _c=commit) -> pa.Table:
            return _c(group)

        stats = ds.groupby(PART_COLUMN).map_groups(
            merge_commit_ds, batch_format="pyarrow", **_auto_task_cpus(task_num_cpus)
        )
        return _finalize(manifest, manifest_path, stats.take_all(), target)

    # -- co-partitioned fast path: changelog already laid out partition=<p>/ --
    # The reference's own execution model — parallelism unit = the partition,
    # partitioning established at ingest (Kafka consumer-group assignment,
    # sink/.../S3SinkConnector.java:36-45) — so there is nothing to exchange:
    # zero shuffle. Skewed partitions fan their compaction out over several
    # sub-tasks (associative LWW reduction) so a hot conversation cannot make
    # one straggler task bound the wall clock.
    part_files = _discover_partition_dirs(changelog) if mode in ("auto", "copartitioned") else None
    if mode == "copartitioned" and part_files is None:
        raise ValueError(
            "mode='copartitioned' was forced but the changelog is not laid "
            f"out partition=<p>/ under {changelog!r} — fix the layout or use "
            "mode='shuffle'"
        )
    if part_files is not None:
        # union over ALL changelog files: mid-stream additive evolution means
        # later files can carry columns the first one lacks
        all_files = [f for fs in part_files.values() for f in fs]
        target = _target_schema(_union_file_schema(all_files), current)
        # Merge tasks are memory-streaming (parquet decode, sorts, zstd): on
        # hosts where logical CPUs outnumber memory-bandwidth lanes (SMT),
        # running one task per logical CPU *degrades* wall time. "auto"
        # reserves extra CPUs per task beyond 16-way concurrency so in-flight
        # tasks stay within real hardware lanes; tune per deployment.
        task_opts = _auto_task_cpus(task_num_cpus)
        compact_task = (
            _compact_partition_files.options(**task_opts) if task_opts
            else _compact_partition_files
        )
        commit_task = (
            _commit_compacted_task.options(**task_opts) if task_opts
            else _commit_compacted_task
        )
        sizes = {p: sum(os.path.getsize(f) for f in fs) for p, fs in part_files.items()}
        total = sum(sizes.values())
        # target slice size: keep ~2 compaction tasks per core in flight, with
        # a floor so tiny inputs stay single-task
        slice_bytes = max(8 * 1024 * 1024, total // max(1, 2 * _ncpu()))
        refs = []
        for p, files in sorted(part_files.items()):
            k = min(len(files), max(1, round(sizes[p] / slice_bytes)))
            groups = [files[i::k] for i in range(k)] if k > 1 else [files]
            crefs = [
                compact_task.remote(
                    p, g, wms.get(p, EMPTY_WATERMARK),
                    fault_inject_dir=_fault_inject_dir,
                )
                for g in groups
            ]
            refs.append(
                commit_task.remote(
                    p, current.get(p, []), wms.get(p, EMPTY_WATERMARK),
                    out_dir, target, commit_mode, *crefs,
                )
            )
        entries = [
            {k: v[0].as_py() for k, v in zip(STATS_SCHEMA.names, t.columns)}
            for t in ray.get(refs)
            if len(t)
        ]
        return _finalize(manifest, manifest_path, entries, target)

    log_ds = pads.dataset(changelog)
    read_filter = (pads.field("offset") > min_wm) if min_wm > EMPTY_WATERMARK else None
    # Bound the block count. Ray's sort-based shuffle (behind groupby/
    # map_groups) does an all-to-all exchange whose cost grows with
    # input-blocks x output-partitions; letting the reader emit hundreds of
    # small blocks makes the shuffle slower at HIGHER cpu counts. Target:
    # enough blocks to keep every core busy, few enough that the exchange
    # matrix stays small, and never bigger than ~256 MB per block.
    nblk = max(num_partitions, _ncpu())
    try:
        total_bytes = sum(os.path.getsize(f) for f in log_ds.files)
        nblk = max(nblk, int(total_bytes // (256 * 1024 * 1024)) + 1)
    except Exception:
        pass
    ds = ray.data.read_parquet(changelog, filter=read_filter, override_num_blocks=nblk)

    if hot_keys == "auto":
        hot_keys = detect_hot_keys(ds, threshold_frac=0.05)
    hot_keys = set(hot_keys or ())

    prep = PrepareEvents(wms, num_partitions, hot_keys, n_salts)
    ds = ds.map_batches(prep, batch_format="pyarrow", batch_size=batch_size)

    if hot_keys:
        # Salted pre-reduce: hot partitions are split into (part, salt)
        # sub-groups first; the exact LWW compaction makes the two-phase
        # reduction equal to a single global pass.
        ds = ds.groupby([PART_COLUMN, SALT_COLUMN]).map_groups(
            _salted_compact, batch_format="pyarrow"
        )

    try:  # union over all files — pads.dataset infers from the first fragment
        log_schema = _union_file_schema(list(log_ds.files))
    except (AttributeError, TypeError):
        log_schema = log_ds.schema
    target = _target_schema(log_schema, current)
    commit = MergeCommit(out_dir, current, wms, target, commit_mode=commit_mode)

    def merge_commit(group: pa.Table, _c=commit) -> pa.Table:
        return _c(group)

    kwargs = _auto_task_cpus(task_num_cpus)
    if concurrency:
        kwargs["concurrency"] = concurrency
    stats = ds.groupby(PART_COLUMN).map_groups(merge_commit, batch_format="pyarrow", **kwargs)
    entries = stats.take_all()  # P tiny rows — the only driver-side materialization
    return _finalize(manifest, manifest_path, entries, target)


def _finalize(manifest: Manifest, manifest_path: str, entries: list[dict],
              target: pa.Schema, operation: str = "upsert") -> Manifest:
    """Record commits + metrics, then write the manifest LAST (cursor-last
    ordering, sink/.../S3Writer.java:47-67). ``metrics`` describe the LAST
    operation; ``operation`` tags which kind so consumers can tell a
    compaction fold from an upsert round."""
    t_total = 0.0
    ev_total = 0
    for e in entries:
        rec = (manifest.record_delta if e.get("mode") == "delta"
               else manifest.record_commit)
        rec(
            int(e["part"]), e["path"], int(e["high_watermark"]),
            int(e["num_rows"]), int(e["num_events"]), float(e["merge_seconds"]),
        )
        t_total += float(e["merge_seconds"])
        ev_total += int(e["num_events"])
    manifest.schema_fingerprint = schema_fingerprint(target)
    manifest.metrics = {
        "operation": operation,
        "partitions_committed": len(entries),
        "compacted_events_applied": ev_total,
        "sum_merge_seconds": round(t_total, 4),
        "per_partition": {
            str(e["part"]): {
                "events": int(e["num_events"]),
                "rows": int(e["num_rows"]),
                "seconds": round(float(e["merge_seconds"]), 4),
            }
            for e in sorted(entries, key=lambda e: e["part"])
        },
    }
    manifest.commit(manifest_path)  # cursor last
    return manifest


_is_delta = is_delta_file  # canonical definition lives in state/manifest


def _resolve_partition(files: list[str]) -> pa.Table:
    """Merge-on-read: resolve one partition's current fileset (base files +
    delta files) into its snapshot table. Deltas ARE compacted change slices
    (op + offset + payload), so resolution is exactly the LWW kernel."""
    bases = [f for f in files if not _is_delta(f)]
    deltas = [f for f in files if _is_delta(f)]
    base_tbl = pa.concat_tables([pq.read_table(f) for f in bases]) if bases else None
    if not deltas:
        return base_tbl
    delta_tbl = pa.concat_tables(
        unify_with_nulls([pq.read_table(f) for f in deltas])
    )
    return lww_merge(base_tbl, delta_tbl)


@ray.remote
def _resolve_partition_task(files: list[str]) -> pa.Table:
    return _resolve_partition(files)


def _resolve_manifest(manifest: Manifest | str,
                      snapshot: int | None = None) -> Manifest:
    """Live manifest, or — time travel — the retained snapshot ``snapshot``
    (a positive commit id, or a negative index: -1 = latest, -2 = previous).
    Verifies the snapshot's fileset still exists so a vacuumed-away snapshot
    fails loudly at the driver instead of inside a read task."""
    if snapshot is None:
        return Manifest.load(manifest) if isinstance(manifest, str) else manifest
    path = manifest.path if isinstance(manifest, Manifest) else manifest
    if not path:
        raise ValueError("time-travel read needs a manifest path")
    if snapshot < 0:
        sids = Manifest.snapshots(path)
        if len(sids) < -snapshot:
            raise FileNotFoundError(
                f"snapshot index {snapshot} out of range (retained: {sids})")
        snapshot = sids[snapshot]
    m = Manifest.load_snapshot(path, snapshot)
    missing = [f for fs in m.current_files().values() for f in fs
               if not os.path.exists(f)]
    if missing:
        raise FileNotFoundError(
            f"snapshot {snapshot} of {path} is no longer readable — "
            f"{len(missing)} of its files were vacuumed (first: {missing[0]}); "
            "retain history with vacuum(keep_generations>1)"
        )
    return m


def read_lake(manifest: Manifest | str,
              snapshot: int | None = None,
              columns: "list[str] | None" = None) -> "ray.data.Dataset":
    """Current lake snapshot as a streaming Dataset. With rewrite commits this
    is a plain parquet read; with pending deltas each partition resolves
    merge-on-read in its own Ray task first. ``snapshot`` time-travels to a
    retained commit (see ``Manifest.snapshots`` / ``snapshot_for_watermark``).

    ``columns`` prunes the read to the named payload columns — the
    100-TB lever for analytics that never touch the text/ts columns
    (dialog_integrity reads 3 of the lake's 6). Pruning applies only on the
    no-delta path AND only when every current file's footer carries all
    requested columns (schema evolution can leave an older base without a
    later column, and a pruned read of a missing column is a hard error —
    measured); otherwise it silently falls back to the full read, which the
    caller's own projection then narrows. Footer checks are driver-side
    metadata reads, O(files)."""
    manifest = _resolve_manifest(manifest, snapshot)
    current = manifest.current_files()
    if not any(_is_delta(f) for fs in current.values() for f in fs):
        files = [f for fs in current.values() for f in fs]
        if not files:  # never-committed manifest: typed empty lake, not a
            from ..schema import LAKE_SCHEMA  # read_parquet([]) crash

            return ray.data.from_arrow(LAKE_SCHEMA.empty_table())
        if columns and all(
                set(columns) <= set(pq.read_schema(f).names) for f in files):
            return ray.data.read_parquet(files, columns=list(columns))
        return ray.data.read_parquet(files)
    refs = [_resolve_partition_task.remote(fs) for fs in current.values() if fs]
    return ray.data.from_arrow_refs(refs)


def lake_table(manifest: Manifest | str,
               snapshot: int | None = None) -> pa.Table | None:
    """Small-scale convenience: the full snapshot as one key-sorted Arrow table
    (tests / oracle comparison only — do not call at 100 TB). None when the
    manifest has no committed files. ``snapshot`` time-travels (see read_lake)."""
    manifest = _resolve_manifest(manifest, snapshot)
    current = manifest.current_files()
    tables = [t for t in (_resolve_partition(fs) for fs in current.values() if fs)
              if t is not None]
    if not tables:
        return None
    t = pa.concat_tables(unify_with_nulls(tables))
    return t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])


def compact_partitions(manifest_path: str, out_dir: str,
                       min_deltas: int = 1,
                       partitions: "set[int] | None" = None,
                       task_num_cpus: int | float | str = "auto") -> Manifest:
    """Minor compaction: fold each partition's pending deltas into a fresh
    base commit (the rewrite path), replacing base+deltas in the manifest.
    Old files stay in lineage for ``vacuum``. Partitions with fewer than
    ``min_deltas`` pending deltas are left alone; ``partitions`` restricts the
    fold to a subset (the tail's per-partition grace flush uses this).

    The driver only reads file METADATA (pq.read_schema); delta contents are
    read inside the fold tasks — deltas accumulate between compactions and
    must never ship through driver memory."""
    manifest = Manifest.load(manifest_path)
    task_opts = _auto_task_cpus(task_num_cpus)
    fold_task = (
        _fold_deltas_task.options(**task_opts) if task_opts
        else _fold_deltas_task
    )
    current = manifest.current_files()
    # ONE global union target across every partition's current files: folded
    # partitions converge to the lake-wide schema, and the recorded schema
    # fingerprint reflects the union — fingerprinting one partition's new
    # base would regress it whenever that partition predates an evolution
    global_target = _target_schema(pa.schema([]), current)
    refs = []
    for p, files in sorted(current.items()):
        if partitions is not None and p not in partitions:
            continue
        deltas = [f for f in files if _is_delta(f)]
        if len(deltas) < min_deltas:
            continue
        bases = [f for f in files if not _is_delta(f)]
        refs.append(fold_task.remote(
            p, bases, deltas, manifest.watermark(p), out_dir, global_target,
        ))
    if not refs:
        return manifest  # nothing to fold — leave manifest untouched
    entries = [
        {k: v[0].as_py() for k, v in zip(STATS_SCHEMA.names, t.columns)}
        for t in ray.get(refs)
        if len(t)
    ]
    if not entries:
        return manifest
    return _finalize(manifest, manifest_path, entries, global_target,
                     operation="compaction")


@ray.remote
def _diff_partition_task(old_files: list[str], new_files: list[str]) -> pa.Table:
    from ..stages.merge import diff_tables

    return diff_tables(
        _resolve_partition(old_files) if old_files else None,
        _resolve_partition(new_files) if new_files else None,
    )


def snapshot_diff(manifest_path: str,
                  from_snapshot: int,
                  to_snapshot: int | None = None) -> "ray.data.Dataset":
    """Change data feed: the exact row-level changes (I/U/D per key) between
    two retained snapshots of the lake — ``from_snapshot`` (a commit id or
    negative index, see ``_resolve_manifest``) and ``to_snapshot`` (default:
    the live manifest). Output columns = lake payload + ``change_op``; 'D'
    rows carry the OLD payload.

    Scale design: the diff is PARTITION-ALIGNED — both snapshots hash the same
    key to the same partition, so each partition diffs independently in its
    own Ray task with zero shuffle. Partitions whose filesets are identical
    between the two snapshots are pruned at the driver from manifest metadata
    alone (no file read): an untouched partition is carried forward by
    reference in the manifest, so fileset equality proves content equality.
    Reference analog: the cursor/index pair pins each partition's state per
    commit (sink/.../S3Writer.java:66-109); diffing two pins only touches
    partitions whose cursor moved."""
    m_old = _resolve_manifest(manifest_path, from_snapshot)
    m_new = (Manifest.load(manifest_path) if to_snapshot is None
             else _resolve_manifest(manifest_path, to_snapshot))
    old_files = m_old.current_files()
    new_files = m_new.current_files()
    refs = []
    for p in sorted(set(old_files) | set(new_files)):
        of, nf = old_files.get(p, []), new_files.get(p, [])
        if sorted(of) == sorted(nf) or (not of and not nf):
            continue  # identical fileset -> identical content: prune
        refs.append(_diff_partition_task.remote(of, nf))
    if not refs:
        # no partition changed: typed empty feed (keys + change_op at minimum)
        probe = next((f for fs in new_files.values() for f in fs), None)
        base = (pq.read_schema(probe) if probe
                else pa.schema([(c, pa.string()) for c in KEY_COLUMNS_DEFAULT]))
        empty = pa.schema(list(base) + [pa.field("change_op", pa.string())])
        return ray.data.from_arrow(empty.empty_table())
    return ray.data.from_arrow_refs(refs)
