"""Checkpoint manifest: per-partition high-watermark offsets + file lineage.

Reference analog: the cursor object (per-partition pointer to the newest chunk
index, sink/.../S3Writer.java:66,98-109) plus the ChunksIndex sidecar
(common/.../json/ChunksIndex.java:7-37) and the two-hop offset recovery
``cursor -> index -> first_record_offset + num_records``
(sink/.../S3Writer.java:69-96). Here one JSON document holds, per lake
partition: the high-watermark offset (events <= wm are already applied), the
current committed snapshot file, and the lineage of past commits.

Commit protocol mirrors the reference's strict ordering — data file first,
cursor last (sink/.../S3Writer.java:47-67): partition files are written and
atomically renamed by the merge tasks, and only after ALL succeed does the
driver write the manifest (tmp + ``os.replace``). A crash in between leaves
the old manifest pointing at old files; replay regenerates identical new files
(idempotence) and re-commits.
"""

from __future__ import annotations

import glob as _glob
import json
import os
import re
from typing import Any

from ..schema import schema_fingerprint  # noqa: F401  (re-exported convenience)

EMPTY_WATERMARK = -1


class ConcurrentCommitError(RuntimeError):
    """Another writer already committed this snapshot id with DIFFERENT lake
    state. The loser must reload the live manifest and replay its round on
    top (replay is idempotent: already-applied offsets are watermark-pruned,
    regenerated files are byte-identical)."""


def _commit_state(doc: dict) -> dict:
    """The deterministic identity of a commit: everything except wall-clock
    timings (the ``metrics`` block and per-file ``merge_seconds``), which are
    the only fields that differ between a crash replay and the commit it
    regenerates (file names/bytes are deterministic, D2)."""
    state = {k: v for k, v in doc.items() if k != "metrics"}
    parts = {}
    for p, st in (state.get("partitions") or {}).items():
        st = dict(st)
        st["files"] = [
            {k: v for k, v in e.items() if k != "merge_seconds"}
            for e in st.get("files", [])
        ]
        parts[p] = st
    state["partitions"] = parts
    return state


def is_delta_file(path: str) -> bool:
    """THE delta-file naming contract (``delta-<wm>.parquet``) — one
    definition; upsert/compaction/tail all import it from here."""
    return os.path.basename(path).startswith("delta-")


def _snapshot_path(path: str, snapshot_id: int) -> str:
    return f"{path}.v{int(snapshot_id)}"


class Manifest:
    def __init__(self, path: str | None = None):
        self.path = path
        self.version = 1
        # Monotonic commit counter. Every ``commit()`` bumps it and retains a
        # versioned copy of the manifest (``manifest.json.v<N>``) next to the
        # live one — the transaction log that makes time-travel reads possible
        # (read_lake(..., snapshot=N)). Old snapshots stay READABLE for as
        # long as ``vacuum(keep_generations=K)`` retains their data files.
        self.snapshot_id = 0
        self.schema_fingerprint: str | None = None
        # The lake's partition count is part of its identity: hash(key) % P
        # routes keys, so P can never silently change between runs (a
        # repartition is an explicit rebuild). Pinned at first commit.
        self.num_partitions: int | None = None
        # partition -> {"high_watermark": int, "current": [paths], "files": [...]}
        self.partitions: dict[int, dict[str, Any]] = {}
        self.metrics: dict[str, Any] = {}

    def pin_partitions(self, num_partitions: int) -> None:
        if self.num_partitions is None:
            self.num_partitions = int(num_partitions)
        elif self.num_partitions != num_partitions:
            raise ValueError(
                f"lake was committed with num_partitions={self.num_partitions}; "
                f"got {num_partitions} — changing P reroutes hash(key) % P and "
                "requires an explicit lake rebuild/repartition"
            )

    # -- queries ---------------------------------------------------------
    def watermark(self, p: int) -> int:
        return self.partitions.get(p, {}).get("high_watermark", EMPTY_WATERMARK)

    def watermarks(self, num_partitions: int) -> dict[int, int]:
        return {p: self.watermark(p) for p in range(num_partitions)}

    def global_min_watermark(self, num_partitions: int) -> int:
        """Safe global lower bound for read-time predicate pushdown: rows with
        ``offset <= min_wm`` can be pruned at the Parquet row-group level for
        every partition (residual per-partition filtering happens in the
        PrepareEvents stage). Reference analog: skipping wholly-consumed files
        by lexicographic key comparison (source/.../S3FilesReader.java:177-184)."""
        wms = self.watermarks(num_partitions)
        return min(wms.values(), default=EMPTY_WATERMARK)

    def current_files(self) -> dict[int, list[str]]:
        return {p: st.get("current", []) for p, st in self.partitions.items() if st.get("current")}

    # -- mutation --------------------------------------------------------
    def init_partition(self, p: int, base_files: list[str]) -> None:
        self.partitions.setdefault(
            p, {"high_watermark": EMPTY_WATERMARK, "current": list(base_files), "files": []}
        )

    def record_commit(self, p: int, path: str | list[str], high_watermark: int,
                      num_rows: int, num_events: int, seconds: float) -> None:
        # ``path`` may be one file or several (";"-joined or a list) when the
        # commit rotated into bounded files
        paths = path.split(";") if isinstance(path, str) else list(path)
        st = self.partitions.setdefault(
            p, {"high_watermark": EMPTY_WATERMARK, "current": [], "files": []}
        )
        st["high_watermark"] = int(high_watermark)
        st["current"] = paths
        st["files"].append(
            {
                "path": ";".join(paths),
                "high_watermark": int(high_watermark),
                "num_rows": int(num_rows),
                "num_events": int(num_events),
                "merge_seconds": round(float(seconds), 4),
            }
        )

    def record_delta(self, p: int, path: str | list[str], high_watermark: int,
                     num_rows: int, num_events: int, seconds: float) -> None:
        """Merge-on-read commit: the delta file APPENDS to the partition's
        current fileset (base + prior deltas) instead of replacing it; reads
        resolve LWW across the set, and compaction folds it back into a base."""
        paths = path.split(";") if isinstance(path, str) else list(path)
        st = self.partitions.setdefault(
            p, {"high_watermark": EMPTY_WATERMARK, "current": [], "files": []}
        )
        st["high_watermark"] = int(high_watermark)
        st["current"] = list(st.get("current", [])) + paths
        st["files"].append(
            {
                "path": ";".join(paths),
                "high_watermark": int(high_watermark),
                "num_rows": int(num_rows),
                "num_events": int(num_events),
                "merge_seconds": round(float(seconds), 4),
                "delta": True,
            }
        )

    def delta_counts(self) -> dict[int, int]:
        """Per partition: how many of the CURRENT files are deltas."""
        out = {}
        for p, st in self.partitions.items():
            out[p] = sum(1 for f in st.get("current", []) if is_delta_file(f))
        return out

    # -- persistence -----------------------------------------------------
    @classmethod
    def load(cls, path: str) -> "Manifest":
        m = cls(path)
        if path and os.path.exists(path):
            with open(path) as f:
                doc = json.load(f)
            m.version = doc.get("version", 1)
            m.snapshot_id = int(doc.get("snapshot_id", 0))
            m.schema_fingerprint = doc.get("schema_fingerprint")
            m.num_partitions = doc.get("num_partitions")
            m.partitions = {int(k): v for k, v in doc.get("partitions", {}).items()}
            m.metrics = doc.get("metrics", {})
        # Heal a lagging live pointer. The snapshot token's atomic creation is
        # the COMMIT POINT (it is what concurrent writers race for); the live
        # file is a convenience pointer published after it. A crash between
        # the two leaves the pointer one commit behind — without healing,
        # every later writer would reload the old state, recompute a
        # DIFFERENT next commit once new input arrived, and lose the race
        # against the orphaned token forever. Adopting the newest token keeps
        # replay correct too: its watermarks already cover the crashed
        # round, so the watermark filter prunes those offsets on replay.
        # (For a snapshot file path, ``snapshots()`` globs "<p>.vN.v*" and
        # finds nothing, so healing is a no-op there.)
        toks = cls.snapshots(path) if path else []
        if toks and toks[-1] > m.snapshot_id:
            try:
                healed = cls.load(_snapshot_path(path, toks[-1]))
            except ValueError:
                # unreadable newest token (a no-hardlink-fallback writer mid-
                # write, or a crashed partial): serve the live state; the
                # writer will finish or its commit's unlink-on-failure (or a
                # later vacuum) clears the partial
                return m
            m = healed
            m.path = path
            try:  # best-effort pointer re-publish; readers heal regardless
                with open(_snapshot_path(path, m.snapshot_id)) as f:
                    payload = f.read()
                tmp = f"{path}.tmp-heal-{os.getpid()}"
                with open(tmp, "w") as f:
                    f.write(payload)
                # re-check before publishing: a writer may have committed a
                # NEWER token (and pointer) while we read ours. This SHRINKS
                # the regression window to the gap between this check and
                # os.replace — it cannot close it without a filesystem lock;
                # a stale pointer published in that residual window is
                # corrected by the next load()'s heal.
                latest = cls.snapshots(path)
                if latest and latest[-1] == m.snapshot_id:
                    os.replace(tmp, path)
                else:
                    os.unlink(tmp)
            except OSError:
                pass
        return m

    def commit(self, path: str | None = None, retain_snapshot: bool = True) -> str:
        """Atomic write-then-rename — the cursor-last commit point, with
        OPTIMISTIC CONCURRENCY between writers.

        Bumps ``snapshot_id`` and (unless ``retain_snapshot=False``) creates
        the versioned copy ``<path>.v<N>`` BEFORE replacing the live
        manifest. The token's atomic creation IS the commit point: the
        retained copies are the lake's transaction log
        (``Manifest.snapshots(path)`` lists them, ``read_lake(path,
        snapshot=N)`` reads as of commit N), and the live file is a pointer
        published after it — ``load()`` heals a pointer that a crash left
        one commit behind, so data files -> token -> pointer keeps the
        reference's strict data-first/cursor-last ordering
        (sink/.../S3Writer.java:47-67) with the token as the cursor.

        Concurrency: the token is claimed with an atomic put-if-absent
        (``os.link``, the POSIX analog of S3 If-None-Match). Two writers that
        both loaded snapshot N race for ``<path>.v<N+1>``; the loser gets
        ``ConcurrentCommitError`` and must reload + replay — its partition
        files are orphans the next ``vacuum`` sweeps, the winner's lake state
        is untouched. Two replayers regenerating the IDENTICAL round are
        admitted rather than failed: if the existing token's deterministic
        state (everything but wall-clock timings) equals ours, we adopt it.
        Without ``retain_snapshot`` there is no token file, so the guard
        degrades to comparing the live pointer's snapshot_id against the one
        this object loaded."""
        path = path or self.path
        assert path, "manifest path required"
        next_id = int(self.snapshot_id) + 1
        doc = {
            "version": self.version,
            "snapshot_id": next_id,
            "schema_fingerprint": self.schema_fingerprint,
            "num_partitions": self.num_partitions,
            "partitions": {str(k): v for k, v in sorted(self.partitions.items())},
            "metrics": self.metrics,
        }
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        payload = json.dumps(doc, indent=1, sort_keys=False)
        if retain_snapshot:
            spath = _snapshot_path(path, next_id)
            tmp = f"{spath}.tmp-{os.getpid()}"
            with open(tmp, "w") as f:
                f.write(payload)
            try:
                try:
                    os.link(tmp, spath)  # atomic put-if-absent: commit token
                except FileExistsError:
                    raise
                except OSError:
                    # no-hardlink filesystem (FUSE/object-store mounts):
                    # O_EXCL keeps the put-if-absent exclusivity; content
                    # atomicity degrades to best-effort (a concurrent
                    # load_snapshot could transiently see partial JSON). A
                    # FAILED write (ENOSPC etc.) must not leave a partial
                    # token that would conflict with every future commit of
                    # this id — unlink it before re-raising.
                    try:
                        with open(spath, "x") as f:
                            f.write(payload)
                    except FileExistsError:
                        raise
                    except OSError:
                        try:
                            os.unlink(spath)
                        except OSError:
                            pass
                        raise
            except FileExistsError:
                try:
                    with open(spath) as f:
                        existing = json.load(f)
                except (ValueError, OSError):
                    # token exists but is unreadable: a fallback-path writer
                    # mid-write (transient) or a crashed partial. Surface it
                    # as the RETRYABLE conflict error, not a JSON crash —
                    # the retry re-reads a finished token normally.
                    raise ConcurrentCommitError(
                        f"snapshot token {next_id} of {path} exists but is "
                        "not readable (concurrent writer mid-write or crashed "
                        "partial) — retry; delete the token if it persists"
                    ) from None
                if _commit_state(existing) != _commit_state(doc):
                    raise ConcurrentCommitError(
                        f"snapshot {next_id} of {path} was already committed "
                        "by another writer with different lake state — reload "
                        "the manifest and replay this round"
                    ) from None
                # identical state: a crash replay regenerating its own
                # orphaned snapshot — adopt it (live pointer gets the
                # snapshot's exact bytes, so log and pointer stay identical)
                with open(spath) as f:
                    payload = f.read()
            finally:
                os.unlink(tmp)
        elif os.path.exists(path):
            with open(path) as f:
                on_disk = int(json.load(f).get("snapshot_id", 0))
            if on_disk != int(self.snapshot_id):
                raise ConcurrentCommitError(
                    f"live manifest {path} is at snapshot {on_disk}, but this "
                    f"writer loaded snapshot {self.snapshot_id} — reload and "
                    "replay"
                )
        self.snapshot_id = next_id
        # pid-unique tmp: concurrent committers (winner publishing its
        # pointer while a loser replays N+2) must not truncate each other's
        # in-flight pointer write mid-os.replace
        tmp = f"{path}.tmp-{os.getpid()}"
        with open(tmp, "w") as f:
            f.write(payload)
        os.replace(tmp, path)
        self.path = path
        return path

    @staticmethod
    def delete(path: str) -> None:
        """Remove a lake's ENTIRE transaction log: the live pointer, every
        retained snapshot token, and commit tmps. This is the only correct
        way to reset a manifest path for a rebuild-in-place — deleting just
        the live file leaves tokens behind, and ``load()`` would heal to the
        stale epoch's state (which references the rebuilt lake's deleted
        files). Order matters: tokens first (newest first), THEN the live
        pointer — the reverse would let a concurrent ``load()`` heal-publish
        a fresh live file from a not-yet-deleted token after delete() had
        already passed it."""
        tokens = [_snapshot_path(path, sid)
                  for sid in reversed(Manifest.snapshots(path))]
        others = [f for f in _glob.glob(path + ".v*") if f not in tokens]
        for f in (tokens + others + [path] + _glob.glob(path + ".tmp*")):
            try:
                os.remove(f)
            except FileNotFoundError:
                pass

    # -- time travel -------------------------------------------------------
    @staticmethod
    def snapshots(path: str) -> list[int]:
        """Snapshot ids retained next to the live manifest, ascending."""
        pat = re.compile(re.escape(os.path.basename(path)) + r"\.v(\d+)$")
        out = []
        for f in _glob.glob(path + ".v*"):
            m = pat.match(os.path.basename(f))
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    @classmethod
    def load_snapshot(cls, path: str, snapshot_id: int) -> "Manifest":
        """The manifest exactly as committed at ``snapshot_id``. Raises
        FileNotFoundError when that snapshot was never retained."""
        spath = _snapshot_path(path, snapshot_id)
        if not os.path.exists(spath):
            raise FileNotFoundError(
                f"snapshot {snapshot_id} of {path} not found "
                f"(retained: {cls.snapshots(path)})"
            )
        m = cls.load(spath)
        m.path = spath
        return m

    @classmethod
    def snapshot_for_watermark(cls, path: str, watermark: int) -> int | None:
        """Newest retained snapshot whose every partition high-watermark is
        <= ``watermark`` — 'the lake as of offset W'. None if no snapshot
        qualifies."""
        best = None
        for sid in cls.snapshots(path):
            m = cls.load_snapshot(path, sid)
            wms = [st.get("high_watermark", EMPTY_WATERMARK)
                   for st in m.partitions.values()]
            if all(w <= watermark for w in wms):
                best = sid
        return best
