"""Key-layout strategies: deterministic object naming whose lexicographic order
IS replay order.

Reference analog: ``Layout`` (common/.../Layout.java:5-21) with two
implementations — ``grouped_by_date`` (``{date}/{topic}-{partition:05d}-{offset:012d}``)
and ``grouped_by_topic`` (``{topic}/{date}/...``) — built with zero-padded
``%s-%05d-%012d`` formatting and parsed back with a named-group regex
(common/.../GroupedByDateLayout.java:33-56, GroupedByTopicLayout.java:33-57).
Zero padding makes lexicographic listing order equal numeric (partition,
offset) order — the property the source relies on for ordered replay and
checkpoint skipping (source/.../S3FilesReader.java:38-40,177-184).

One deliberate divergence: the reference stamps keys with the *wall-clock*
upload date (common/.../CurrentUtcDateSupplier.java:13-26), which breaks replay
determinism. Here the date is an explicit argument (derive it from event time
or fix it per run) — never ``now()``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass


@dataclass(frozen=True)
class BlockMetadata:
    """Identity of a committed block (common/.../BlockMetadata.java:5-21)."""

    topic: str
    partition: int
    start_offset: int
    date: str = "1970-01-01"


class Layout:
    """build(meta) -> relative key; parse(key) -> BlockMetadata or None."""

    name = "abstract"
    pattern: re.Pattern

    @staticmethod
    def _check_widths(meta: BlockMetadata) -> None:
        """The zero-pad widths ARE the format: an offset past 10^12 would
        emit a key parse() silently rejects (committed data skipped on
        replay), and a partition past 10^5 backtrack-parses into the WRONG
        (topic, partition) identity — and lexicographic ordering (the layout's
        core contract, O1) breaks at the rollover. Fail at write time."""
        if meta.partition >= 10**5 or meta.partition < 0:
            raise ValueError(
                f"partition {meta.partition} exceeds the %05d key width")
        if meta.start_offset >= 10**12 or meta.start_offset < 0:
            raise ValueError(
                f"start_offset {meta.start_offset} exceeds the %012d key width")

    def build(self, meta: BlockMetadata, suffix: str = ".gz") -> str:
        raise NotImplementedError

    def parse(self, key: str) -> BlockMetadata | None:
        m = self.pattern.match(key)
        if not m:
            return None
        return BlockMetadata(
            topic=m.group("topic"),
            partition=int(m.group("partition")),
            start_offset=int(m.group("offset")),
            date=m.group("date"),
        )


class GroupedByDateLayout(Layout):
    name = "grouped_by_date"
    pattern = re.compile(
        r"(?P<date>\d{4}-\d{2}-\d{2})/(?P<topic>.+)-(?P<partition>\d{5})-(?P<offset>\d{12})(?P<suffix>\..*)?$"
    )

    def build(self, meta: BlockMetadata, suffix: str = ".gz") -> str:
        self._check_widths(meta)
        return f"{meta.date}/{meta.topic}-{meta.partition:05d}-{meta.start_offset:012d}{suffix}"


class GroupedByTopicLayout(Layout):
    name = "grouped_by_topic"
    pattern = re.compile(
        r"(?P<topic>.+)/(?P<date>\d{4}-\d{2}-\d{2})/(?P<partition>\d{5})-(?P<offset>\d{12})(?P<suffix>\..*)?$"
    )

    def build(self, meta: BlockMetadata, suffix: str = ".gz") -> str:
        self._check_widths(meta)
        return f"{meta.topic}/{meta.date}/{meta.partition:05d}-{meta.start_offset:012d}{suffix}"


LAYOUTS: dict[str, type[Layout]] = {
    GroupedByDateLayout.name: GroupedByDateLayout,
    GroupedByTopicLayout.name: GroupedByTopicLayout,
}


def get_layout(name: str) -> Layout:
    """Registry lookup (reference: Configure.createLayout,
    common/.../Configure.java:152-165)."""
    try:
        return LAYOUTS[name]()
    except KeyError:
        raise KeyError(f"unknown layout {name!r}; known: {sorted(LAYOUTS)}") from None
