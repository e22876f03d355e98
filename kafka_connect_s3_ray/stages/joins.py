"""Join strategies, Ray-Data-first.

The reference has no relational joins (its only lookup is the cursor->index
two-hop, sink/.../S3Writer.java:69-96); these are the join-shaped operators a
lake engine needs, each with an explicit distribution strategy:

- ``broadcast_join``   small side shipped ONCE via ``ray.put`` and merged
                       per batch inside ``map_batches`` — no shuffle at all.
                       Use when one side fits comfortably in a worker heap.
- ``hash_join``        both sides large: coarse-bucket hash exchange — both
                       sides tagged with ``hash(key) % B``, one union+groupby
                       shuffle, vectorized pandas merge per bucket
                       (``hash_join_native`` keeps Ray's alpha ``Dataset.join``
                       for comparison; the bucketed merge measures ~3x faster
                       here and emits no schema warnings).
- ``asof_join``        ordered semantics (each left row matched to the most
                       recent right row at or before it, per key): co-locate
                       by a COARSE key bucket (bounded group count — see the
                       coarse-bucket note in functions/dedup.py), then one
                       vectorized ``pd.merge_asof`` per bucket.
- ``semi/anti``        broadcast the key set and filter inside map_batches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

N_COARSE = 64


def broadcast_join(ds: "ray.data.Dataset", small: pd.DataFrame, on: str | list[str],
                   how: str = "inner", right_on: str | list[str] | None = None,
                   concurrency: int = 2) -> "ray.data.Dataset":
    """Join a Dataset against a small in-memory table. The small side is put
    into the object store once; each actor fetches it once in ``__init__``
    (never re-shipped per batch) and does a vectorized pandas merge."""
    ref = ray.put(small)

    class Joiner:
        def __init__(self):
            self.small = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            return batch.merge(self.small, how=how, left_on=on,
                               right_on=right_on or on)

    return ds.map_batches(Joiner, batch_format="pandas", concurrency=concurrency)


def semi_join(ds: "ray.data.Dataset", keys, on: str, anti: bool = False,
              concurrency: int = 2) -> "ray.data.Dataset":
    """Semi/anti join via a broadcast key set — a filter, not a shuffle."""
    ref = ray.put(np.asarray(list(keys)))

    class Filter:
        def __init__(self):
            self.keys = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vals = batch.column(on).to_numpy(zero_copy_only=False)
            mask = np.isin(vals, self.keys, invert=anti)
            return batch.filter(pa.array(mask))

    return ds.map_batches(Filter, batch_format="pyarrow", concurrency=concurrency)


def hash_join_native(left: "ray.data.Dataset", right: "ray.data.Dataset",
                     on: str | tuple, join_type: str = "inner",
                     num_partitions: int = 16, **kw) -> "ray.data.Dataset":
    """Ray's native hash-partitioned ``Dataset.join`` (alpha in this Ray
    release) — kept for comparison; ``hash_join`` below (coarse-bucket pandas
    merge) measures ~3x faster on this sandbox and emits no schema warnings."""
    on_t = (on,) if isinstance(on, str) else tuple(on)
    return left.join(right, join_type=join_type, num_partitions=num_partitions,
                     on=on_t, **kw)


def _schema_types(ds: "ray.data.Dataset") -> dict:
    """Column name -> Arrow DataType for a Dataset. Pandas-block datasets
    report numpy dtypes / Python classes from ``schema()`` (which
    ``pa.nulls``/``cast`` reject); non-object entries convert directly, and
    any OBJECT column's true Arrow type (string vs binary vs list) is
    resolved by converting one block to Arrow (``take_batch`` — one-block
    partial execution, cheap next to the join itself)."""
    sch = ds.schema()
    out: dict = {}
    unresolved = []
    for n, t in zip(sch.names, sch.types):
        if isinstance(t, pa.DataType):
            out[n] = t
            continue
        try:
            dt = np.dtype(t)
        except TypeError:
            dt = np.dtype(object)
        if dt.kind != "O":
            out[n] = pa.from_numpy_dtype(dt)
        else:
            unresolved.append(n)
    if unresolved:
        try:
            b = ds.take_batch(1, batch_format="pyarrow")
            for n in unresolved:
                out[n] = b.schema.field(n).type
        except Exception:  # empty dataset etc. — strings are the common case
            for n in unresolved:
                out[n] = pa.string()
    return out


def _coarse_of(df_cols: list[np.ndarray], n_coarse: int) -> np.ndarray:
    """Combined deterministic hash bucket over one side's key columns —
    identical across sides for equal key values (int keys hashed as int64,
    everything else as object)."""
    h = np.zeros(len(df_cols[0]), dtype=np.uint64)
    for vals in df_cols:
        if vals.dtype.kind in ("i", "u"):
            vals = vals.astype(np.int64)
        else:
            vals = vals.astype(object)
        h = h * np.uint64(1000003) + pd.util.hash_array(np.ascontiguousarray(vals))
    return (h % np.uint64(n_coarse)).astype(np.int32)


def hash_join(left: "ray.data.Dataset", right: "ray.data.Dataset",
              on: str | tuple | list, join_type: str = "inner",
              right_on: str | tuple | list | None = None,
              num_partitions: int = 16, suffix: str = "_right",
              **_compat) -> "ray.data.Dataset":
    """Both-sides-large hash join, coarse-bucket style: each side is tagged
    with ``hash(key) % B`` (B = ``num_partitions``, the exchange width),
    null-filled onto one union schema, unioned, grouped ONCE by the bucket
    (equal keys always co-locate), and each bucket runs one vectorized pandas
    merge. One shuffle total, no driver state; the reference has no joins —
    this is the M1 partition-grouper shuffle (sink/.../S3SinkTask.java:153-155)
    reused as a join exchange. Partitioning assumption: a bucket's rows fit
    one task — raise ``num_partitions`` for bigger inputs / finer skew.

    Right columns whose names collide with left ones are renamed with
    ``suffix`` (join-key pairs with identical names merge into one column,
    pandas semantics)."""
    on_t = [on] if isinstance(on, str) else list(on)
    ron_t = [right_on] if isinstance(right_on, str) else list(right_on or on_t)
    assert len(on_t) == len(ron_t)
    if join_type not in ("inner", "left"):
        raise ValueError(f"unsupported join_type: {join_type}")
    lsch, rsch = left.schema(), right.schema()
    ltypes = _schema_types(left)
    rtypes = _schema_types(right)
    shared_keys = on_t == ron_t
    # rename colliding right columns (shared join keys stay as-is: they merge)
    rmap = {}
    for c in rsch.names:
        if c in ltypes and not (shared_keys and c in ron_t):
            rmap[c] = c + suffix
        else:
            rmap[c] = c
    left_cols = list(lsch.names)
    right_cols = [rmap[c] for c in rsch.names]
    all_cols = left_cols + [c for c in right_cols if c not in ltypes]
    col_types = dict(ltypes)
    for c in rsch.names:
        col_types.setdefault(rmap[c], rtypes[c])

    def tag(side: str, key_cols: list[str]):
        def fn(t: pa.Table, _s=side, _k=key_cols) -> pa.Table:
            if _s == "r":
                t = t.rename_columns([rmap[c] for c in t.column_names])
            keys = [t.column(c).to_numpy(zero_copy_only=False) for c in _k]
            coarse = _coarse_of(keys, num_partitions)
            cols = [
                t.column(c).cast(col_types[c]) if c in t.column_names
                else pa.nulls(len(t), col_types[c])
                for c in all_cols
            ]
            t = pa.table(dict(zip(all_cols, cols)))
            t = t.append_column("_side", pa.array([_s] * len(t), pa.string()))
            return t.append_column("_coarse", pa.array(coarse))

        return fn

    lt = left.map_batches(tag("l", on_t), batch_format="pyarrow")
    rt = right.map_batches(tag("r", [rmap[c] for c in ron_t]), batch_format="pyarrow")
    ron_out = [rmap[c] for c in ron_t]

    # A left join introduces nulls into right columns for unmatched rows —
    # but only in SOME buckets, which would give integer right columns
    # float64 blocks in unmatched buckets and int64 blocks elsewhere (the
    # divergent-schema problem the native join suffered). Cast right-side
    # value columns to pandas NULLABLE dtypes in every bucket so all blocks
    # agree; Arrow maps Int64 back to int64-with-nulls.
    _NULLABLE = {pa.int64(): "Int64", pa.int32(): "Int32", pa.int16(): "Int16",
                 pa.int8(): "Int8", pa.uint64(): "UInt64", pa.uint32(): "UInt32",
                 pa.uint16(): "UInt16", pa.uint8(): "UInt8",
                 pa.bool_(): "boolean"}
    # shared-name keys come from the left side (never null) and must keep the
    # exact merge dtype; differently-named right keys DO null on unmatched
    left_nullable = (
        {c: _NULLABLE[col_types[c]] for c in right_cols
         if not (shared_keys and c in ron_out) and col_types[c] in _NULLABLE}
        if join_type == "left" else {}
    )
    # the merge's output columns, in pandas-merge order, with declared types
    out_cols = left_cols + [c for c in right_cols
                            if not (shared_keys and c in ron_out)]
    out_schema = pa.schema([(c, col_types[c]) for c in out_cols])

    def _side_frame(t: pa.Table, cols: list[str]) -> pd.DataFrame:
        # Select the side's own columns and CAST back to the declared Arrow
        # types: if Ray materialized an intermediate block as pandas (e.g. a
        # zero-row pandas input block forces pandas consolidation in the
        # sort), the other side's null-fill degrades ints to float64 — the
        # cast restores them before the merge, so output dtypes never depend
        # on block-format accidents.
        t = t.select(cols)
        arrs = []
        for c in cols:
            col = t.column(c)
            if col.type != col_types[c]:
                col = pc.cast(col, col_types[c])
            arrs.append(col)
        return pa.table(dict(zip(cols, arrs))).to_pandas()

    def merge_bucket(t: pa.Table) -> pa.Table:
        # sides are separated IN ARROW before to_pandas so the other side's
        # null-fill can't degrade int columns to float
        side = t.column("_side")
        ldf = _side_frame(t.filter(pc.equal(side, "l")), left_cols)
        rdf = _side_frame(t.filter(pc.equal(side, "r")), right_cols)
        if left_nullable:
            rdf = rdf.astype(left_nullable)
        if shared_keys:
            m = ldf.merge(rdf, on=on_t, how=join_type)
        else:
            m = ldf.merge(rdf, left_on=on_t, right_on=ron_out, how=join_type)
        # return ARROW with the EXPLICIT output schema: Ray drops the schema
        # of empty pandas blocks, and from_pandas would infer type null for
        # an all-NaN string/binary column in a no-match bucket — either way a
        # divergent block schema downstream
        return pa.Table.from_pandas(m, schema=out_schema, preserve_index=False)

    both = lt.union(rt)
    return both.groupby("_coarse").map_groups(merge_bucket, batch_format="pyarrow")


def asof_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    key: str,
    ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    direction: str = "backward",
    n_coarse: int = N_COARSE,
) -> "ray.data.Dataset":
    """As-of join: for each left row, the most recent right row with
    ``right.ts <= left.ts`` (direction='backward') for the same key.

    Distribution: both sides are tagged with a coarse hash bucket of ``key``
    and aligned onto one union schema (each side null-fills the other's
    columns), unioned, grouped ONCE by the bucket (all rows of a key
    co-locate; group count stays bounded — see the coarse-bucket note in
    functions/dedup.py), and each bucket runs a single vectorized
    ``pd.merge_asof`` over its sorted slice. One shuffle total, no driver
    state. Partitioning assumption: a bucket's rows fit one task — raise
    ``n_coarse`` for bigger inputs."""
    lsch, rsch = left.schema(), right.schema()
    ltypes = _schema_types(left)
    rtypes = _schema_types(right)
    rkeep = [key, ts] + [c for c in (right_cols or rsch.names) if c not in (key, ts)]
    # right payload columns renamed when they collide with left names
    rmap = {c: (c if c in (key, ts) or c not in ltypes else c + suffix) for c in rkeep}
    right_only = [rmap[c] for c in rkeep if rmap[c] not in ltypes]
    all_cols = list(lsch.names) + right_only
    col_types = dict(ltypes)
    for c in rkeep:
        col_types.setdefault(rmap[c], rtypes[c])

    def tag(side: str):
        def fn(t: pa.Table, _s=side) -> pa.Table:
            if _s == "r":
                t = t.select([c for c in rkeep if c in t.column_names])
                t = t.rename_columns([rmap[c] for c in t.column_names])
            cols = [
                t.column(c).cast(col_types[c]) if c in t.column_names
                else pa.nulls(len(t), col_types[c])
                for c in all_cols
            ]
            t = pa.table(dict(zip(all_cols, cols)))
            k = t.column(key).to_numpy(zero_copy_only=False)
            if k.dtype.kind not in ("i", "u"):
                k = k.astype(object)
            coarse = (pd.util.hash_array(np.ascontiguousarray(k)) %
                      np.uint64(n_coarse)).astype(np.int32)
            t = t.append_column("_side", pa.array([_s] * len(t), pa.string()))
            return t.append_column("_coarse", pa.array(coarse))

        return fn

    lt = left.map_batches(tag("l"), batch_format="pyarrow")
    rt = right.map_batches(tag("r"), batch_format="pyarrow")

    out_cols = list(lsch.names) + right_only
    out_schema = pa.schema([(c, col_types[c]) for c in out_cols])

    def _side_frame(t: pa.Table, cols: list[str]) -> pd.DataFrame:
        # Select one side's columns and cast back to the DECLARED Arrow types
        # before pandas: if the shuffle materialized an intermediate block as
        # pandas (e.g. a zero-row pandas block forces pandas consolidation in
        # the sort), the other side's null-fill degrades left-only int columns
        # (event_id) to float64 — the cast restores them, so output dtypes
        # never depend on block-format accidents.
        arrs = []
        for c in cols:
            col = t.column(c)
            if col.type != col_types[c]:
                col = pc.cast(col, col_types[c])
            arrs.append(col)
        return pa.table(dict(zip(cols, arrs))).to_pandas()

    def merge_bucket(g: pa.Table) -> pa.Table:
        # sides are separated IN ARROW (and cast to declared types) before
        # to_pandas, so the other side's null-fill can't degrade int columns
        side = g.column("_side")
        lt_ = g.filter(pc.equal(side, "l"))
        rt_ = g.filter(pc.equal(side, "r"))
        if len(lt_) == 0 or len(rt_) == 0:
            # left rows keep their null-filled right_only columns (built by
            # tag() via pa.nulls(col_types)); cast pins the declared schema
            return (lt_.select(out_cols).cast(out_schema) if len(lt_)
                    else out_schema.empty_table())
        l = _side_frame(lt_, list(lsch.names)).sort_values([ts, key], kind="stable")
        # Deterministic tie-break: among right rows equal on (key, ts), the
        # winner is the lexicographically GREATEST payload tuple — merge_asof
        # (backward) picks the last of equal-ts duplicates, so sorting by the
        # payload columns last makes the pick a pure function of the data,
        # independent of block arrival order after the union+shuffle.
        r = _side_frame(rt_, [key, ts] + right_only).sort_values(
            [ts, key] + right_only, kind="stable")
        m = pd.merge_asof(l, r, on=ts, by=key, direction=direction)
        # explicit output schema: unmatched left rows null-fill right_only ints
        # to float64 in pandas; from_pandas(schema=) casts them back
        return pa.Table.from_pandas(m[out_cols], schema=out_schema,
                                    preserve_index=False)

    both = lt.union(rt)
    return both.groupby("_coarse").map_groups(merge_bucket, batch_format="pyarrow")


def range_join(left: "ray.data.Dataset", right: "ray.data.Dataset",
               key: str, ts: str, start: str, end: str,
               num_partitions: int = 16, suffix: str = "_right") -> "ray.data.Dataset":
    """Interval-containment join: each left row matched to every right row of
    the same key whose [start, end) interval contains ``left.ts``
    (half-open; many-to-many).

    Distribution: the coarse-bucket hash exchange co-locates keys, then the
    containment predicate is a vectorized Arrow filter over the equi-joined
    rows. A hot key forms its per-key cross product before the range filter —
    at interval-heavy scale, sort right intervals per key and walk them with
    searchsorted (or an interval tree) inside the bucket; the exchange layout
    is unchanged."""
    j = hash_join(left, right, on=key, join_type="inner",
                  num_partitions=num_partitions, suffix=suffix)
    # hash_join renames a right column whenever it collides with ANY left
    # column — resolve the interval columns by the same rule, or a left
    # payload column with the same name would silently shadow them
    lnames = set(left.schema().names)
    s_col = start + suffix if start in lnames else start
    e_col = end + suffix if end in lnames else end

    def contains(t: pa.Table) -> pa.Table:
        tsv = t.column(ts)
        keep = pc.and_(pc.greater_equal(tsv, t.column(s_col)),
                       pc.less(tsv, t.column(e_col)))
        return t.filter(pc.fill_null(keep, False))

    return j.map_batches(contains, batch_format="pyarrow")
