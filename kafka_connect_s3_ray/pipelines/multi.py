"""Multi-table (multi-topic) lakes.

The reference connector serves many topics at once (``topics`` /
``topics.regex`` subscription; per-topic key layouts,
common/.../GroupedByTopicLayout.java:33-57). Here a *topic* is a logical lake
table: the changelog root holds one directory per topic
(``topic=<name>/partition=<p>/...``), and each topic gets its own lake
directory, manifest and upsert round. Rounds are independent — failures
isolate per topic, and a re-run only redoes unfinished topics (their
watermarks filter applied events exactly as in the single-table case).
"""

from __future__ import annotations

import os
import re

from ..state.manifest import Manifest
from .upsert import run_upsert


def discover_topics(changelog_root: str, topics_regex: str | None = None) -> list[str]:
    """List topic directories (``topic=<name>``), optionally filtered by a
    regex over topic names (the ``topics.regex`` subscription)."""
    out = []
    if not os.path.isdir(changelog_root):
        return out
    pat = re.compile(topics_regex) if topics_regex else None
    for entry in sorted(os.listdir(changelog_root)):
        if not entry.startswith("topic="):
            continue
        name = entry.split("=", 1)[1]
        if pat and not pat.fullmatch(name):
            continue
        out.append(name)
    return out


def run_upsert_topics(
    changelog_root: str,
    out_root: str,
    manifest_dir: str,
    lake_root: str | None = None,
    topics: list[str] | None = None,
    topics_regex: str | None = None,
    num_partitions: int = 16,
    **upsert_kw,
) -> dict[str, Manifest]:
    """One upsert round per topic. Layout:

        changelog_root/topic=<t>/partition=<p>/log-*.parquet
        lake_root/<t>/part=<p>/...            (optional base)
        out_root/<t>/part=<p>/commit-*.parquet
        manifest_dir/<t>.json
    """
    names = topics or discover_topics(changelog_root, topics_regex)
    results: dict[str, Manifest] = {}
    for t in names:
        results[t] = run_upsert(
            os.path.join(changelog_root, f"topic={t}"),
            os.path.join(out_root, t),
            os.path.join(manifest_dir, f"{t}.json"),
            lake_dir=os.path.join(lake_root, t) if lake_root else None,
            num_partitions=num_partitions,
            **upsert_kw,
        )
    return results
