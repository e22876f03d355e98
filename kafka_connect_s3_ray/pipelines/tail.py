"""Continuous changelog tailing: the reference source's poll/backoff loop
re-expressed as repeated incremental upsert rounds.

Reference analog: S3SourceTask polls the archive, sleeps
``s3.new.record.poll.interval`` when caught up, and rebuilds the reader with
backoff on retryable errors (source/.../S3SourceTask.java:122-124,165-184).
Here each tick re-lists the changelog directory and runs one incremental
``run_upsert`` — the per-partition watermark filter makes a tick that sees no
new offsets a no-op (files fully below the global min watermark are pruned at
the Parquet read).

This is a batch-replay engine's tail mode: ticks are bounded (``max_rounds``)
for tests; in production the loop runs under ``ray job submit`` with a real
sleep. No wall-clock ever enters the data path — only the loop scheduling.
"""

from __future__ import annotations

import time
from typing import Callable

import pyarrow as _pa
from ray.exceptions import RayError as _RayError

# pyarrow raises ArrowInvalid (a ValueError) for a half-written parquet file a
# producer is mid-flight on — as transient as any OSError for a tail loop
_RETRYABLE = (OSError, RuntimeError, _RayError, _pa.lib.ArrowInvalid)

from ..state.manifest import Manifest
from .upsert import run_upsert


def _grace_flush(
    manifest: Manifest,
    manifest_path: str,
    out_dir: str,
    now: float,
    saw_events: set[int],
    first_pending: dict[int, float],
    last_event: dict[int, float],
    flush_interval: float,
    grace: float,
    max_pending_deltas: int = 16,
) -> Manifest:
    """The W4 preCommit check, clock-agnostic: fold pending deltas for
    partitions whose first buffered state is past interval+grace and that
    have received nothing for more than grace. ``now`` / ``flush_interval``
    / ``grace`` share ONE unit — loop ticks (deterministic tests) or
    wall-clock ms (the reference's ``flush.interval.ms`` semantics,
    sink/.../S3SinkTask.java:84-92); the check is the same arithmetic either
    way. A partition that NEVER idles would escape the grace check forever,
    so ``max_pending_deltas`` bounds its chain regardless of write rate (the
    reference's size-based flush W2 plays this role for busy partitions)."""
    from .upsert import _is_delta, compact_partitions

    for p in saw_events:
        last_event[p] = now
    pending = {p for p, files in manifest.current_files().items()
               if any(_is_delta(f) for f in files)}
    for p in pending:
        first_pending.setdefault(p, now)
    for p in list(first_pending):
        if p not in pending:  # compacted elsewhere (compact_every) — reset
            del first_pending[p]
    counts = manifest.delta_counts()
    due = {
        p for p in pending
        if (now - first_pending[p] >= flush_interval + grace
            and now - last_event.get(p, first_pending[p]) > grace)
        or counts.get(p, 0) >= max_pending_deltas
    }
    if not due:
        return manifest
    manifest = compact_partitions(manifest_path, out_dir, partitions=due)
    for p in due:
        first_pending.pop(p, None)
    return manifest


def tail_changelog(
    changelog_dir: str,
    out_dir: str,
    manifest_path: str,
    lake_dir: str | None = None,
    num_partitions: int = 16,
    poll_interval_s: float = 10.0,
    error_backoff_s: float = 1.0,
    max_rounds: int | None = None,
    sleep: Callable[[float], None] = time.sleep,
    on_round: Callable[[int, Manifest], None] | None = None,
    commit_mode: str = "rewrite",
    compact_every: int | None = None,
    flush_interval_rounds: int | None = None,
    grace_rounds: int | None = None,
    flush_interval_ms: float | None = None,
    grace_ms: float | None = None,
    clock: Callable[[], float] = time.monotonic,
    max_pending_deltas: int = 16,
    **upsert_kw,
) -> Manifest:
    """Repeatedly apply new changelog data until ``max_rounds`` ticks (None =
    forever). Transient errors back off and retry (reference
    ``s3.error.backoff``); each successful round commits the manifest, so the
    loop can be killed and restarted at any point and converges.

    W4 parity (wall-time flush + grace, sink/.../S3SinkTask.java:84-92,278-299):
    in delta mode, a partition whose OLDEST pending delta is
    ``flush_interval_rounds + grace_rounds`` ticks old AND that has been idle
    (no new events) for more than ``grace_rounds`` ticks gets its deltas
    folded into a fresh base commit — so an idle or lagging partition's
    buffered state flushes without waiting for the global ``compact_every``
    cadence, exactly the reference's preCommit grace check with rounds as the
    (deterministic) clock. ``grace_rounds`` defaults to half the interval,
    like the reference's ``flush.interval.ms``-derived grace.

    ``flush_interval_ms`` / ``grace_ms`` are the same check in the
    reference's native unit (``flush.interval.ms``,
    sink/.../S3SinkTask.java:84-92): deadlines measure against ``clock``
    (monotonic seconds; injectable so the 12h-idle IT scenario,
    S3SinkConnectorIT.java:314-472, is testable without sleeping 12h).
    Rounds and ms are mutually exclusive — pick the deterministic tick clock
    for replay tests, the ms clock for production tails."""
    rounds = 0
    consecutive_errors = 0
    max_consecutive_errors = 10
    manifest = Manifest.load(manifest_path)
    use_ms = flush_interval_ms is not None
    if use_ms and flush_interval_rounds:
        raise ValueError(
            "flush_interval_rounds and flush_interval_ms are the same check "
            "on different clocks — pass one, not both")
    # a grace on the clock the interval doesn't use would be silently
    # ignored — reject instead (the operator meant something)
    if grace_ms is not None and not use_ms:
        raise ValueError(
            "grace_ms requires flush_interval_ms (the wall-clock flush); "
            "with flush_interval_rounds pass grace_rounds")
    if grace_rounds is not None and use_ms:
        raise ValueError(
            "grace_rounds requires flush_interval_rounds (the tick flush); "
            "with flush_interval_ms pass grace_ms")
    if flush_interval_rounds and grace_rounds is None:
        grace_rounds = max(1, flush_interval_rounds // 2)
    if use_ms and grace_ms is None:
        grace_ms = max(1.0, flush_interval_ms / 2)
    first_pending_round: dict[int, float] = {}
    last_event_round: dict[int, float] = {}
    while max_rounds is None or rounds < max_rounds:
        try:
            manifest = run_upsert(
                changelog_dir,
                out_dir,
                manifest_path,
                lake_dir=lake_dir,
                num_partitions=num_partitions,
                commit_mode=commit_mode,
                **upsert_kw,
            )
            saw_events = {
                int(p) for p, m in
                (manifest.metrics or {}).get("per_partition", {}).items()
                if int(m.get("events", 0)) > 0
            }
            if (compact_every and commit_mode == "delta"
                    and (rounds + 1) % compact_every == 0):
                from .upsert import compact_partitions

                manifest = compact_partitions(manifest_path, out_dir)
            if (flush_interval_rounds or use_ms) and commit_mode == "delta":
                now = clock() * 1000.0 if use_ms else float(rounds + 1)
                manifest = _grace_flush(
                    manifest, manifest_path, out_dir, now, saw_events,
                    first_pending_round, last_event_round,
                    flush_interval_ms if use_ms else flush_interval_rounds,
                    grace_ms if use_ms else grace_rounds, max_pending_deltas,
                )
        except _RETRYABLE as e:
            consecutive_errors += 1
            if consecutive_errors >= max_consecutive_errors:
                raise RuntimeError(
                    f"tail aborted after {consecutive_errors} consecutive "
                    f"failed ticks (last: {e})"
                ) from e
            sleep(error_backoff_s)
            continue
        consecutive_errors = 0
        rounds += 1
        if on_round is not None:
            on_round(rounds, manifest)
        if max_rounds is None or rounds < max_rounds:
            sleep(poll_interval_s)
    return manifest
