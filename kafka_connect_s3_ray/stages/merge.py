"""Pure-Arrow last-writer-wins merge kernel.

This is the engine's J1/D3 operator (SURVEY.md §2.4/§2.7): apply I/U/D change
events to a lake partition, last writer (max ``offset``) wins per key, ``D``
deletes. The reference has no merge — it keeps every record version and relies
on offset-named idempotent files (sink/.../S3SinkTask.java:249-254); the merge
is the north-rule extension, built so that:

- ``compact_events`` (keep max-offset row per key) is an associative,
  commutative reduction — it can run per batch (combiner, before the shuffle),
  per (part, salt) sub-group (salted skew split), and finally per partition,
  and the result is identical to a single global pass. This is what bounds
  shuffle volume by key-cardinality instead of event count at 10^10 scale.
- ``lww_merge`` is a pure function (Table, Table) -> Table: deterministic
  given its inputs, which is the exactly-once story — a retried task
  regenerates byte-identical output (reference rewind IT,
  sink/src/test/.../S3SinkConnectorIT.java:474-612).
- additive schema evolution (new payload columns like ``meta``) is handled by
  Arrow schema unification with null-fill (schema.unify_with_nulls).

All kernels are vectorized (pyarrow.compute / numpy); no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..schema import DELETE_OP, KEY_COLUMNS, unify_with_nulls

# Columns that belong to provenance / shuffle bookkeeping, never to the lake.
NON_PAYLOAD = ("partition", "offset", "op", "part", "salt")


def last_per_key(sorted_tbl: pa.Table, key_cols: list[str]) -> pa.Table:
    """Keep the last row of each key run in an already-sorted table.

    Vectorized: a row is kept iff the next row starts a different key. O(n)
    with no Python loop."""
    n = len(sorted_tbl)
    if n <= 1:
        return sorted_tbl
    keep = np.zeros(n, dtype=bool)
    keep[-1] = True
    diff = np.zeros(n - 1, dtype=bool)
    for c in key_cols:
        col = sorted_tbl.column(c).combine_chunks()
        ne = pc.not_equal(col.slice(0, n - 1), col.slice(1, n - 1))
        diff |= pc.fill_null(ne, True).to_numpy(zero_copy_only=False)
    keep[:-1] = diff
    return sorted_tbl.filter(pa.array(keep))


def compact_events(
    events: pa.Table,
    key_cols: list[str] = KEY_COLUMNS,
    order_col: str = "offset",
) -> pa.Table:
    """LWW compaction: one row per key — the one with the max ``order_col``.

    Keeps ALL columns (including op: a surviving ``D`` row is a tombstone that
    must flow to the final merge). Idempotent and associative:
    compact(compact(a) + compact(b)) == compact(a + b).

    Hot-path implementation: keys are factorized to int codes (exact — codes
    are unique per distinct value, unlike hashes) and the argmax-per-group is
    found with a multi-key integer ``np.lexsort`` — ~3x cheaper than a lexicographic
    string sort of the full table. Output rows keep input order (the merge
    establishes its own final order); a selected row set is a deterministic
    function of the input."""
    if len(events) <= 1:
        return events
    import pandas as pd

    n = len(events)
    code_arrays = []
    for c in key_cols:
        if events.column(c).null_count:
            raise ValueError(
                f"null values in key column {c!r}: keys must be non-null "
                "(factorize would merge all nulls into one key while the "
                "merge anti-join treats nulls as never-equal)"
            )
        vals = events.column(c).to_numpy(zero_copy_only=False)
        if vals.dtype.kind in ("i", "u"):
            codes = vals.astype(np.int64)
        else:  # strings etc.: dense-factorize to exact int codes
            codes, _ = pd.factorize(vals)
            codes = codes.astype(np.int64)
        code_arrays.append(codes)
    order = events.column(order_col).to_numpy(zero_copy_only=False)
    # multi-key integer lexsort: last key in the tuple is primary
    idx = np.lexsort((order, *reversed(code_arrays)))
    diff = np.zeros(n - 1, dtype=bool)
    for codes in code_arrays:
        srt = codes[idx]
        diff |= srt[1:] != srt[:-1]
    last_of_group = np.ones(n, dtype=bool)
    last_of_group[:-1] = diff
    keep = np.sort(idx[last_of_group])  # input order, deterministic
    return events.take(pa.array(keep))


def patch_merge(
    events: pa.Table,
    key_cols: list[str] = KEY_COLUMNS,
    order_col: str = "offset",
    payload_cols: list[str] | None = None,
    count_col: str | None = None,
) -> pa.Table:
    """Coalescing partial-update (patch) merge: one row per key, where each
    payload column independently takes its value from the LAST (max
    ``order_col``) event that SET it (non-null) and stays NULL if no event
    for that key ever set it.

    This is the Debezium/JDBC-source partial-update contract: a CDC delta
    may carry only the columns the upstream UPDATE touched (the rest NULL).
    Whole-row LWW (``compact_events`` + ``lww_merge``) would wrongly erase
    untouched columns with the newest row's NULLs; patch semantics coalesce
    per column instead. The reference never merges at all — it keeps every
    record version (sink/.../S3SinkTask.java:249-254) — so like J1/D3 this
    is a north-rule extension, the sibling of ``lww_merge`` for sources
    that emit sparse deltas.

    Same per-partition assumption as every merge here: all events for a key
    are present in ``events`` (keys are co-partitioned upstream). Ties in
    ``order_col`` within a key resolve to the later input row (stable
    lexsort), so callers wanting full determinism need unique order values —
    identical to ``compact_events``. Vectorized end to end: composite-key
    factorize (``_key_codes``) + integer lexsort + ``np.maximum.reduceat``
    per payload column; no per-row Python.

    ``count_col``: optionally emit the per-key event count under this name
    (int64) — the audit column a CDC consumer wants next to the patched row.
    """
    if payload_cols is None:
        payload_cols = [
            c for c in events.column_names
            if c not in key_cols and c != order_col and c not in NON_PAYLOAD
        ]
    n = len(events)
    if n == 0:
        cols = {c: events.column(c) for c in key_cols}
        cols.update({c: events.column(c) for c in payload_cols})
        if count_col is not None:
            cols[count_col] = pa.array([], type=pa.int64())
        return pa.table(cols)
    codes = _key_codes([events], key_cols)
    order = events.column(order_col).to_numpy(zero_copy_only=False)
    idx = np.lexsort((order, codes))  # by key, then order; stable
    scodes = codes[idx]
    starts = np.flatnonzero(np.r_[True, scodes[1:] != scodes[:-1]])
    ends = np.r_[starts[1:], n] - 1  # last row of each key (sorted space)
    cols = {}
    key_take = pa.array(idx[ends])
    for c in key_cols:
        cols[c] = events.column(c).take(key_take)
    arange = np.arange(n, dtype=np.int64)
    for c in payload_cols:
        col = events.column(c).combine_chunks()
        svalid = pc.is_valid(col).to_numpy(zero_copy_only=False)[idx]
        # sorted-space position of each non-null row; -1 marks null, so the
        # per-key running max is the LAST position that set the column
        pos = np.where(svalid, arange, np.int64(-1))
        last = np.maximum.reduceat(pos, starts)
        src = idx[np.where(last >= 0, last, 0)]
        cols[c] = col.take(pa.array(src, mask=last < 0))
    if count_col is not None:
        cols[count_col] = pa.array(np.diff(np.r_[starts, n]).astype(np.int64))
    return pa.table(cols)


def lww_merge(
    lake: pa.Table | None,
    events: pa.Table,
    key_cols: list[str] = KEY_COLUMNS,
    order_col: str = "offset",
    op_col: str = "op",
    compact: bool = True,
) -> pa.Table:
    """Merge compacted change events into a lake partition.

    Per key: the event (max offset) replaces the lake row; a ``D`` tombstone
    removes it; untouched lake rows survive. Output is sorted by ``key_cols``
    (keys are unique after the merge, so the order — and hence the written
    file — is fully deterministic; Ray shuffles do not preserve order, every
    ordering guarantee is re-established here, SURVEY.md §4 'Ordering')."""
    if compact:
        events = compact_events(events, key_cols, order_col)
    drop = [c for c in NON_PAYLOAD if c in events.column_names and c not in key_cols]
    upserts = events.filter(pc.not_equal(events.column(op_col), DELETE_OP)).drop_columns(drop)

    survivors = None
    if lake is not None and len(lake):
        if len(events):
            keys = events.select(key_cols)
            survivors = lake.join(keys, keys=key_cols, join_type="left anti")
        else:
            survivors = lake
    parts = unify_with_nulls([survivors, upserts])
    if not parts:
        return upserts
    out = pa.concat_tables(parts) if len(parts) > 1 else parts[0]
    return out.sort_by([(c, "ascending") for c in key_cols])


def merge_sorted_stream(
    lake_batches,
    events: pa.Table,
    key_cols: list[str] = KEY_COLUMNS,
    order_col: str = "offset",
):
    """Streaming merge-join: yield key-sorted merged pieces without ever
    holding the whole lake partition.

    ``lake_batches`` is an iterator of KEY-SORTED Arrow tables covering the
    partition in key order (the engine's write invariant); ``events`` is this
    round's change set (compacted here; memory = touched keys only). Each
    lake piece is merged with exactly the events whose key falls at or below
    the piece's last key — keys are unique in the lake, so no key spans
    pieces — and leftover events (keys beyond the lake) flush at the end.
    Memory: O(piece + compacted events)."""
    events = compact_events(events, key_cols, order_col)
    ev_sorted = events.sort_by([(c, "ascending") for c in key_cols])
    n_ev = len(ev_sorted)
    pos = 0
    # boundary search is a binary search over the sorted event keys (two-level
    # searchsorted for the (conv_id, turn_idx) pair), never a row loop
    key_arrays = [
        ev_sorted.column(c).to_numpy(zero_copy_only=False) for c in key_cols
    ]

    def _upper_bound(bmax: tuple) -> int:
        lo, hi = 0, n_ev
        for depth, bval in enumerate(bmax):
            arr = key_arrays[depth]
            if depth == len(bmax) - 1:
                return lo + int(np.searchsorted(arr[lo:hi], bval, side="right"))
            new_lo = lo + int(np.searchsorted(arr[lo:hi], bval, side="left"))
            hi = lo + int(np.searchsorted(arr[lo:hi], bval, side="right"))
            lo = new_lo
        return hi

    def _key_tuple(tbl: pa.Table, i: int):
        return tuple(tbl.column(c)[i].as_py() for c in key_cols)

    prev_last: tuple | None = None
    for piece in lake_batches:
        if len(piece) == 0:
            continue
        # Guard the sortedness PRECONDITION loudly: an imported base whose
        # file-boundary keys happen to ascend can still be unsorted inside a
        # piece — merging it silently would leave duplicate keys in the
        # snapshot. O(piece) vectorized check.
        first = _key_tuple(piece, 0)
        if prev_last is not None and first <= prev_last:
            raise ValueError(
                "streaming merge precondition violated: lake pieces are not "
                f"globally key-ascending at {first} — re-sort the base "
                "(repartition_lake) or use the in-memory merge path"
            )
        if len(piece) > 1 and not _is_key_sorted(piece, key_cols):
            raise ValueError(
                "streaming merge precondition violated: a lake piece is not "
                "strictly key-ascending (unsorted rows or duplicate keys) — "
                "re-sort/dedup the base (repartition_lake) or use the "
                "in-memory merge path"
            )
        prev_last = _key_tuple(piece, len(piece) - 1)
        bmax = prev_last
        hi = _upper_bound(bmax)
        evs = ev_sorted.slice(pos, hi - pos)
        pos = hi
        # slices of the already-compacted change set skip re-compaction
        yield lww_merge(piece, evs, key_cols, order_col, compact=False)
    if pos < n_ev:
        rest = ev_sorted.slice(pos)
        yield lww_merge(None, rest, key_cols, order_col, compact=False)


def _is_key_sorted(tbl: pa.Table, key_cols: list[str]) -> bool:
    """Vectorized multi-key ascending check (lexicographic over key_cols)."""
    n = len(tbl)
    undecided = np.ones(n - 1, dtype=bool)  # rows whose order is still tied
    for c in key_cols:
        col = tbl.column(c).combine_chunks()
        a, b = col.slice(0, n - 1), col.slice(1, n - 1)
        lt = pc.fill_null(pc.less(a, b), False).to_numpy(zero_copy_only=False)
        gt = pc.fill_null(pc.greater(a, b), False).to_numpy(zero_copy_only=False)
        if (undecided & gt).any():
            return False
        undecided &= ~lt
        if not undecided.any():
            return True
    # rows still undecided are FULLY EQUAL adjacent keys — duplicates, which
    # the unique-key lake invariant forbids just as firmly as disorder
    return not undecided.any()


def align_to_schema(tbl: pa.Table, target: pa.Schema) -> pa.Table:
    """Project ``tbl`` onto ``target``: missing columns null-filled, order and
    types from ``target`` — delegates to the ONE shared cast/fill rule
    (schema.project_to_schema) so commit alignment and merge-time unification
    can never diverge."""
    from ..schema import project_to_schema

    return project_to_schema(tbl, target)


def _key_codes(tables: "list[pa.Table]", key_cols: list[str]) -> np.ndarray:
    """Exact dense int64 codes for the composite key over the CONCATENATION of
    ``tables`` (so equal keys get equal codes across tables). Pairwise fold
    with re-densification keeps every intermediate < n_total, so the product
    step can never overflow regardless of key-column count."""
    import pandas as pd

    n_total = sum(len(t) for t in tables)
    combined = None
    for c in key_cols:
        vals = np.concatenate(
            [t.column(c).to_numpy(zero_copy_only=False) for t in tables]
        )
        codes = pd.factorize(vals)[0].astype(np.int64)
        if (codes < 0).any():
            raise ValueError(f"null values in key column {c!r}")
        if combined is None:
            combined = codes
        else:
            # both factors are dense codes < n_total <= 2^31: product fits
            combined = pd.factorize(combined * np.int64(n_total) + codes)[0].astype(np.int64)
    return combined if combined is not None else np.zeros(n_total, np.int64)


def _null_safe_unequal(a: pa.ChunkedArray, b: pa.ChunkedArray) -> np.ndarray:
    """Row mask where a != b, treating null == null as EQUAL (SQL
    IS DISTINCT FROM semantics) — the comparison a change-data-feed needs."""
    eq = pc.fill_null(pc.equal(a, b), False)
    both_null = pc.and_(pc.is_null(a), pc.is_null(b))
    return pc.invert(pc.or_(eq, both_null)).to_numpy(zero_copy_only=False)


def diff_tables(
    old: pa.Table | None,
    new: pa.Table | None,
    key_cols: list[str] = KEY_COLUMNS,
    op_col: str = "change_op",
) -> pa.Table:
    """Change data feed between two key-unique snapshot tables of one
    partition: per key, emit 'I' (in new only, new payload), 'U' (in both,
    any non-key column differs null-safely, new payload), 'D' (in old only,
    OLD payload). Keys equal in both with identical payload emit nothing.

    Fully vectorized: exact factorized key codes + np.isin set membership +
    Arrow null-safe column compares; no per-row Python. Output is key-sorted
    so the feed is deterministic. Inverse of ``lww_merge``: applying the diff
    (with any offset order) to ``old`` reproduces ``new``."""
    aligned = unify_with_nulls([old, new])
    if not aligned:
        raise ValueError("diff_tables: both sides empty/None")
    if old is None or new is None:
        src = aligned[0]
        op = "D" if new is None else "I"
        out = src.append_column(op_col, pa.array([op] * len(src), pa.string()))
        return out.sort_by([(c, "ascending") for c in key_cols])
    old, new = aligned
    codes = _key_codes([old, new], key_cols)
    old_codes, new_codes = codes[: len(old)], codes[len(old):]
    in_new = np.isin(old_codes, new_codes)
    in_old = np.isin(new_codes, old_codes)
    inserts = new.filter(pa.array(~in_old)) if not in_old.all() else new.slice(0, 0)
    deletes = old.filter(pa.array(~in_new)) if not in_new.all() else old.slice(0, 0)
    oi = np.flatnonzero(in_new)
    ni = np.flatnonzero(in_old)
    # align common rows by key code (keys unique per side -> 1:1 pairing)
    oi = oi[np.argsort(old_codes[oi], kind="stable")]
    ni = ni[np.argsort(new_codes[ni], kind="stable")]
    old_common = old.take(pa.array(oi))
    new_common = new.take(pa.array(ni))
    changed = np.zeros(len(oi), dtype=bool)
    for c in new.column_names:
        if c in key_cols:
            continue
        changed |= _null_safe_unequal(old_common.column(c), new_common.column(c))
    updates = new_common.filter(pa.array(changed)) if changed.any() else new.slice(0, 0)

    def _with_op(t: pa.Table, op: str) -> pa.Table:
        return t.append_column(op_col, pa.array([op] * len(t), pa.string()))

    out = pa.concat_tables(
        [_with_op(inserts, "I"), _with_op(updates, "U"), _with_op(deletes, "D")]
    )
    return out.sort_by([(c, "ascending") for c in key_cols])
