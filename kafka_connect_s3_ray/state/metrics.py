"""Pluggable metrics: named reporter registry + per-partition tagged counters.

Reference analog: the process-global named ``Metrics`` registry with pluggable
reporters (common/.../Metrics.java:32-61, configured by class name via
``metrics.reporter=<fqcn>``, common/.../Configure.java:96-123) and the
per-connector/topic/partition tags the sink attaches
(sink/.../S3SinkTask.java:244-247).

Here a ``MetricsRegistry`` collects counters/timers tagged by partition; the
engine emits events/sec, rows written, merge seconds and lag
(= max input offset - committed watermark) per partition, and reporters render
them (dict / JSON file / log line). Counters live driver-side and in the
manifest's ``metrics`` block — per-task numbers travel back in the commit
stats rows, never through shared mutable state."""

from __future__ import annotations

import json
import time
from collections import defaultdict
from typing import Any, Callable


class MetricsRegistry:
    def __init__(self, tags: dict[str, str] | None = None):
        self.tags = dict(tags or {})
        self.counters: dict[tuple, float] = defaultdict(float)
        self.gauges: dict[tuple, float] = {}

    def _key(self, name: str, tags: dict | None) -> tuple:
        return (name, tuple(sorted((tags or {}).items())))

    def incr(self, name: str, value: float = 1.0, **tags) -> None:
        self.counters[self._key(name, tags)] += value

    def gauge(self, name: str, value: float, **tags) -> None:
        self.gauges[self._key(name, tags)] = value

    def timer(self, name: str, **tags):
        reg = self

        class _Timer:
            def __enter__(self):
                self.t0 = time.monotonic()
                return self

            def __exit__(self, *exc):
                reg.incr(name, time.monotonic() - self.t0, **tags)

        return _Timer()

    def snapshot(self) -> dict[str, Any]:
        def render(d):
            return {
                f"{name}{dict(tags) if tags else ''}": round(v, 6)
                for (name, tags), v in sorted(d.items())
            }

        return {"tags": self.tags, "counters": render(self.counters),
                "gauges": render(self.gauges)}


# -- reporter registry (U5) --------------------------------------------------

Reporter = Callable[[MetricsRegistry], Any]


def dict_reporter(reg: MetricsRegistry) -> dict:
    return reg.snapshot()


def json_file_reporter(path: str) -> Reporter:
    def report(reg: MetricsRegistry) -> str:
        with open(path, "w") as f:
            json.dump(reg.snapshot(), f, indent=1)
        return path

    return report


def log_reporter(reg: MetricsRegistry) -> str:
    line = json.dumps(reg.snapshot())
    print(line)
    return line


REPORTERS: dict[str, Any] = {
    "dict": dict_reporter,
    "log": log_reporter,
    "json_file": json_file_reporter,  # factory: call with path first
}


def register_reporter(name: str, reporter) -> None:
    REPORTERS[name] = reporter


def get_reporter(name: str):
    if name in REPORTERS:
        return REPORTERS[name]
    if "." in name:  # dotted class-path escape hatch, as the reference's <fqcn>
        import importlib

        mod, _, attr = name.rpartition(".")
        return getattr(importlib.import_module(mod), attr)
    raise KeyError(f"unknown metrics reporter {name!r}; known: {sorted(REPORTERS)}")


def engine_metrics_from_manifest(manifest, input_max_offsets: dict[int, int] | None = None,
                                 wall_seconds: float | None = None) -> MetricsRegistry:
    """Standard engine metrics: per-partition events applied, rows, merge
    seconds, and lag = max input offset - committed watermark (the reference's
    consumer-lag analog)."""
    reg = MetricsRegistry(tags={"engine": "kafka_connect_s3_ray"})
    per_part = manifest.metrics.get("per_partition", {})
    total_events = 0
    for p, st in per_part.items():
        reg.incr("events_applied", st["events"], partition=p)
        reg.gauge("rows", st["rows"], partition=p)
        reg.incr("merge_seconds", st["seconds"], partition=p)
        total_events += st["events"]
    # lag for EVERY partition with known input backlog — a backlogged
    # partition that committed NOTHING this round (the stuck case this metric
    # exists to catch) has no per_partition entry and must still report
    for p_int, max_off in (input_max_offsets or {}).items():
        wm = manifest.watermark(int(p_int))
        reg.gauge("lag", max(0, max_off - wm), partition=str(p_int))
    if wall_seconds:
        reg.gauge("wall_seconds", wall_seconds)
        reg.gauge("events_per_sec", total_events / wall_seconds if wall_seconds else 0.0)
    return reg
