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

import json
import os
from typing import Any

from ..schema import schema_fingerprint  # noqa: F401  (re-exported convenience)

EMPTY_WATERMARK = -1


def is_delta_file(path: str) -> bool:
    """THE delta-file naming contract (``delta-<wm>.parquet``) — one
    definition; upsert/compaction/tail all import it from here."""
    return os.path.basename(path).startswith("delta-")


class Manifest:
    def __init__(self, path: str | None = None):
        self.path = path
        self.version = 1
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
            m.schema_fingerprint = doc.get("schema_fingerprint")
            m.num_partitions = doc.get("num_partitions")
            m.partitions = {int(k): v for k, v in doc.get("partitions", {}).items()}
            m.metrics = doc.get("metrics", {})
        return m

    def commit(self, path: str | None = None) -> str:
        """Atomic write-then-rename — the cursor-last commit point."""
        path = path or self.path
        assert path, "manifest path required"
        doc = {
            "version": self.version,
            "schema_fingerprint": self.schema_fingerprint,
            "num_partitions": self.num_partitions,
            "partitions": {str(k): v for k, v in sorted(self.partitions.items())},
            "metrics": self.metrics,
        }
        tmp = path + ".tmp"
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(tmp, "w") as f:
            json.dump(doc, f, indent=1, sort_keys=False)
        os.replace(tmp, path)
        self.path = path
        return path
