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

from ray.exceptions import RayError as _RayError

from ..state.manifest import Manifest
from .upsert import run_upsert


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
    **upsert_kw,
) -> Manifest:
    """Repeatedly apply new changelog data until ``max_rounds`` ticks (None =
    forever). Transient errors back off and retry (reference
    ``s3.error.backoff``); each successful round commits the manifest, so the
    loop can be killed and restarted at any point and converges."""
    rounds = 0
    consecutive_errors = 0
    max_consecutive_errors = 10
    manifest = Manifest.load(manifest_path)
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
            if (compact_every and commit_mode == "delta"
                    and (rounds + 1) % compact_every == 0):
                from .upsert import compact_partitions

                manifest = compact_partitions(manifest_path, out_dir)
        except (OSError, RuntimeError, _RayError) as e:
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
