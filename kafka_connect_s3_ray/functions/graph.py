"""Fixed-iteration graph scoring over edge datasets (weighted PageRank).

The reference has no graph operators (its graph-shaped concern is the
partition-grouper exchange, sink/.../S3SinkTask.java:153-155); this module is
a north-rule extension for the curation side of the engine — engagement /
link-graph scoring is a standard signal for training-data source weighting.
Connected components (the other graph op) lives in ``functions/dedup.py``
(large-star/small-star); this module adds weighted PageRank with a FIXED
iteration count — the shape a SQL oracle can replay exactly (k join+aggregate
CTE levels), so correctness is hash-checkable rather than
convergence-eyeballed.

Distribution contract (designed for node/edge sets far beyond driver memory):

- out-weight normalization: ONE coarse src-hash exchange; a src's edges live
  wholly in one bucket, so the bucket-local out-weight sum is the global one.
- node extraction: one exchange over the (node) projection of both endpoints.
- per iteration: ranks join edges on src through the coarse-bucket hash join
  (``stages/joins.py``), then contributions are exchanged keyed by dst for
  the per-node sum — 2 bounded exchanges per iteration, 2k + 2 total.
- the rank vector is NEVER broadcast and NEVER driver-collected: at 10^9
  nodes it stays a distributed dataset end to end; the driver holds only the
  scalar node count N. Edges are aggregated (one row per distinct
  (src, dst)), so every exchange is bounded by graph size, not by the event
  count that produced it; the per-iteration ``materialize()`` pins a
  node/edge-bounded dataset (never the input events) to keep lineage flat.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..stages.joins import _coarse_of, hash_join


def _check_weights(w: np.ndarray) -> None:
    """Loud input contract (the _user_bucketer pattern): weights must be
    finite and non-negative, or the 0/0 and NaN arithmetic below silently
    propagates garbage into every reachable node's rank."""
    if w.size and (not np.isfinite(w).all() or (w < 0.0).any()):
        raise ValueError(
            "pagerank weights must be finite and >= 0 (got NaN/inf/negative)")


def _bucketer(col: str, n: int):
    def fn(t: pa.Table) -> pa.Table:
        vals = t.column(col).to_numpy(zero_copy_only=False)
        return t.append_column("_b", pa.array(_coarse_of([vals], n)))

    return fn


def pagerank(
    edges: "ray.data.Dataset",
    *,
    iterations: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    w_col: str = "w",
    num_partitions: int = 8,
    scale_by_n: bool = False,
    method: str = "auto",
    driver_budget_edges: int = 2_000_000,
) -> "ray.data.Dataset":
    """Weighted PageRank, exactly ``iterations`` synchronous rounds.

    r_0(v) = 1/N;  r_{i+1}(v) = (1-d)/N + d * sum_{(s->v)} r_i(s) * w/outw(s).

    Nodes with no in-edges keep the teleport term (the zero-contribution
    union below); dangling nodes (no OUT-edges) simply leak their mass —
    the standard simplification, and the one a fixed-k SQL replay matches.
    ``scale_by_n`` multiplies the result by N so values are O(1) regardless
    of graph size (stable to compare/round at any scale).

    ``method``: ``"distributed"`` is the 100-TB path described in the module
    docstring (2 bounded exchanges per round, rank vector never leaves the
    cluster). ``"driver"`` is the small-graph fast path — factorize nodes
    once and run the rounds as ``np.add.at`` scatter-adds, skipping ~2k
    exchange machineries that each cost ~1 s regardless of data size.
    ``"auto"`` picks driver below ``driver_budget_edges`` (same pattern and
    default posture as ``near_dup_clusters``' <1M-edge union-find fast
    path, functions/dedup.py). Both paths compute the identical recurrence
    and are pytest-equal (tests/test_graph.py)."""
    edges = edges.materialize()  # bounded: one row per distinct (src, dst)
    if method not in ("auto", "driver", "distributed"):
        raise ValueError(f"unknown pagerank method: {method!r}")
    if method == "auto":
        method = ("driver" if edges.count() <= driver_budget_edges
                  else "distributed")
    if method == "driver":
        df = edges.to_pandas()  # <= driver_budget_edges rows by contract
        if len(df) == 0:  # empty input may arrive columnless
            return ray.data.from_pandas(
                pd.DataFrame({"node": pd.Series([], dtype=object),
                              "pr": pd.Series([], dtype=np.float64)}))
        nodes_cat = pd.unique(
            pd.concat([df[src_col], df[dst_col]], ignore_index=True))
        n_nodes = len(nodes_cat)
        code = pd.Series(np.arange(n_nodes), index=nodes_cat)
        si = code[df[src_col]].to_numpy()
        di = code[df[dst_col]].to_numpy()
        w = df[w_col].to_numpy(dtype=np.float64)
        _check_weights(w)
        outw = np.zeros(n_nodes)
        np.add.at(outw, si, w)
        if (outw[si] <= 0.0).any():
            raise ValueError(
                "pagerank: a src's edge weights sum to 0 — its normalized "
                "contribution would be 0/0 NaN and silently poison every "
                "reachable rank; drop zero-out-weight sources first")
        wn = w / outw[si]
        r = np.full(n_nodes, 1.0 / n_nodes)
        tele = (1.0 - damping) / n_nodes
        for _ in range(iterations):
            contrib = np.zeros(n_nodes)
            np.add.at(contrib, di, r[si] * wn)
            r = tele + damping * contrib
        if scale_by_n:
            r = r * float(n_nodes)
        return ray.data.from_pandas(pd.DataFrame({"node": nodes_cat, "pr": r}))

    def norm(g: pd.DataFrame) -> pd.DataFrame:
        _check_weights(g[w_col].to_numpy(dtype=np.float64))
        ow = g.groupby(src_col)[w_col].transform("sum")
        if (ow.to_numpy(dtype=np.float64) <= 0.0).any():
            raise ValueError(
                "pagerank: a src's edge weights sum to 0 — its normalized "
                "contribution would be 0/0 NaN and silently poison every "
                "reachable rank; drop zero-out-weight sources first")
        return pd.DataFrame({
            src_col: g[src_col], dst_col: g[dst_col],
            "_wn": g[w_col].astype(np.float64) / ow})

    en = (edges.map_batches(_bucketer(src_col, num_partitions),
                            batch_format="pyarrow")
          .groupby("_b").map_groups(norm, batch_format="pandas")).materialize()

    def endpoints(t: pa.Table) -> pa.Table:
        s = t.column(src_col).combine_chunks()
        d = t.column(dst_col).combine_chunks()
        return pa.table({"node": pa.chunked_array([s, d])})

    def distinct(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": g["node"].drop_duplicates()})

    nodes = (edges.map_batches(endpoints, batch_format="pyarrow")
             .map_batches(_bucketer("node", num_partitions),
                          batch_format="pyarrow")
             .groupby("_b").map_groups(distinct, batch_format="pandas")
             ).materialize()
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.map_batches(
            lambda t: t.append_column("pr", pa.array([], pa.float64())),
            batch_format="pyarrow")
    r0 = 1.0 / n_nodes
    teleport = (1.0 - damping) / n_nodes

    def init_rank(t: pa.Table) -> pa.Table:
        return t.append_column("pr", pa.array(np.full(len(t), r0)))

    ranks = nodes.map_batches(init_rank, batch_format="pyarrow").materialize()

    def contrib(t: pa.Table) -> pa.Table:
        return pa.table({"node": t.column(dst_col),
                         "_c": pc.multiply(t.column("pr"), t.column("_wn"))})

    def zero(t: pa.Table) -> pa.Table:
        return pa.table({"node": t.column("node"),
                         "_c": pa.array(np.zeros(len(t)))})

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("node", as_index=False)["_c"].sum()
        return pd.DataFrame({"node": s["node"],
                             "pr": teleport + damping * s["_c"]})

    for _ in range(iterations):
        joined = hash_join(en, ranks, on=src_col, right_on="node",
                           num_partitions=num_partitions)
        ranks = (joined.map_batches(contrib, batch_format="pyarrow")
                 .union(nodes.map_batches(zero, batch_format="pyarrow"))
                 .map_batches(_bucketer("node", num_partitions),
                              batch_format="pyarrow")
                 .groupby("_b").map_groups(reduce_bucket,
                                           batch_format="pandas")
                 ).materialize()

    if scale_by_n:
        scale = float(n_nodes)

        def scaled(t: pa.Table) -> pa.Table:
            return pa.table({
                "node": t.column("node"),
                "pr": pc.multiply(t.column("pr"), pa.scalar(scale))})

        return ranks.map_batches(scaled, batch_format="pyarrow")
    return ranks


_TRI_OUT = pa.schema([("node", pa.int64()), ("n_tri", pa.int64())])


def triangle_counts(edges: "ray.data.Dataset", src: str = "u",
                    dst: str = "v", n_coarse: int = 64,
                    degree_broadcast_nodes: int = 5_000_000,
                    wedge_chunk: int = 1 << 20) -> "ray.data.Dataset":
    """Per-node triangle participation counts over an undirected edge set —
    the clustering / community-density signal next to ``pagerank`` and the
    connected-components closure. Input rows are (src, dst) pairs in any
    order/multiplicity; self-loops are dropped and edges deduped first.

    The classic degree-ordered algorithm (Chiba–Nishizeki; MapReduce form:
    Suri & Vassilvitskii WWW'11), whose work bound O(m^{3/2}) is what makes
    triangles tractable at scale — enumerating wedges at the LOWEST-degree
    endpoint caps every node's out-degree at O(sqrt(m)):

    1. canonical distinct edges (``_distinct_pairs`` — one pair-hash
       exchange);
    2. degrees via one node-hash exchange; each edge is then oriented from
       its smaller (degree, id) endpoint (degree table broadcast below
       ``degree_broadcast_nodes``, else two coarse hash joins);
    3. wedges: one src-hash exchange groups each node's out-neighbors; all
       ordered out-neighbor pairs (v, w) are emitted in bounded chunks —
       ordered by the SAME (degree, id) total order, so a closing edge can
       only be the oriented edge v -> w;
    4. closure: wedges and oriented edges meet in one pair-hash exchange;
       per-bucket pandas merge matches them (a wedge's witness u completes
       triangle u-v-w);
    5. corner counts: triangles emit their 3 corners through one final
       node-hash exchange.

    Every stage is bounded by graph size (never the event stream that
    produced the edges); nothing is driver-collected except the broadcast
    degree table under its documented budget."""
    from .dedup import _distinct_pairs

    def canon(t: pa.Table) -> pa.Table:
        a = t.column(src).to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column(dst).to_numpy(zero_copy_only=False).astype(np.int64)
        m = a != b
        a, b = a[m], b[m]
        return pa.table({"left_id": pa.array(np.minimum(a, b), pa.int64()),
                         "right_id": pa.array(np.maximum(a, b), pa.int64())})

    e = _distinct_pairs(edges.map_batches(canon, batch_format="pyarrow"))
    e = e.materialize()

    # --- degrees: one node-hash exchange over both endpoint projections ---
    def endpoints(t: pa.Table) -> pa.Table:
        u = t.column("left_id").to_numpy(zero_copy_only=False)
        v = t.column("right_id").to_numpy(zero_copy_only=False)
        n = np.concatenate([u, v])
        return pa.table({"node": pa.array(n, pa.int64()),
                         "_b": pa.array(_coarse_of([n], n_coarse))})

    def bucket_deg(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby("node", sort=False).size()
        return pd.DataFrame({"node": c.index.to_numpy(np.int64),
                             "deg": c.to_numpy(np.int64)})

    deg = (e.map_batches(endpoints, batch_format="pyarrow")
           .groupby("_b").map_groups(bucket_deg, batch_format="pandas")
           ).materialize()
    n_nodes = deg.count()
    if n_nodes == 0:  # empty input or self-loops only: no edge, no triangle
        return ray.data.from_arrow(_TRI_OUT.empty_table())

    if n_nodes <= degree_broadcast_nodes:
        dtbl = pa.concat_tables(
            [t for t in ray.get(deg.to_arrow_refs()) if len(t)])
        dn = dtbl.column("node").to_numpy(zero_copy_only=False)
        dd = dtbl.column("deg").to_numpy(zero_copy_only=False)
        o = np.argsort(dn, kind="stable")
        deg_ref = ray.put((dn[o], dd[o]))

        def orient(t: pa.Table) -> pa.Table:
            dn_, dd_ = ray.get(deg_ref)
            u = t.column("left_id").to_numpy(zero_copy_only=False)
            v = t.column("right_id").to_numpy(zero_copy_only=False)
            du = dd_[np.searchsorted(dn_, u)]
            dv = dd_[np.searchsorted(dn_, v)]
            # (deg, id) total order: u already < v, so ties keep u first
            swap = (dv < du)
            s = np.where(swap, v, u)
            d_ = np.where(swap, u, v)
            sdeg = np.where(swap, dv, du)
            ddeg = np.where(swap, du, dv)
            return pa.table({
                "s": pa.array(s, pa.int64()), "d": pa.array(d_, pa.int64()),
                "sdeg": pa.array(sdeg, pa.int64()),
                "ddeg": pa.array(ddeg, pa.int64()),
                "_b": pa.array(_coarse_of([s], n_coarse))})

        oriented = e.map_batches(orient, batch_format="pyarrow")
    else:
        # scale path: attach each endpoint's degree with a coarse hash join
        lj = hash_join(e, deg, on="left_id", right_on=("node",),
                       num_partitions=n_coarse)
        lj = lj.map_batches(
            lambda t: t.rename_columns(
                [{"deg": "ldeg"}.get(c, c) for c in t.column_names])
            .drop_columns(["node"]) if "node" in t.column_names else t,
            batch_format="pyarrow")
        rj = hash_join(lj, deg, on="right_id", right_on=("node",),
                       num_partitions=n_coarse)

        def orient2(t: pa.Table) -> pa.Table:
            u = t.column("left_id").to_numpy(zero_copy_only=False)
            v = t.column("right_id").to_numpy(zero_copy_only=False)
            du = t.column("ldeg").to_numpy(zero_copy_only=False)
            dv = t.column("deg").to_numpy(zero_copy_only=False)
            swap = (dv < du)
            s = np.where(swap, v, u)
            d_ = np.where(swap, u, v)
            sdeg = np.where(swap, dv, du)
            ddeg = np.where(swap, du, dv)
            return pa.table({
                "s": pa.array(s, pa.int64()), "d": pa.array(d_, pa.int64()),
                "sdeg": pa.array(sdeg, pa.int64()),
                "ddeg": pa.array(ddeg, pa.int64()),
                "_b": pa.array(_coarse_of([s], n_coarse))})

        oriented = rj.map_batches(orient2, batch_format="pyarrow")
    oriented = oriented.materialize()

    # --- wedges: per-src ordered out-neighbor pairs, chunk-bounded --------
    def bucket_wedges(g: pd.DataFrame) -> pd.DataFrame:
        # order neighbors by the orientation's (deg, id) total order so the
        # closing edge of a wedge (v, w) is exactly the oriented edge v->w
        g = g.sort_values(["s", "ddeg", "d"], kind="stable")
        s = g["s"].to_numpy(np.int64)
        d = g["d"].to_numpy(np.int64)
        seg = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
        sizes = np.diff(np.append(seg, len(s)))
        out_v, out_w, out_u = [], [], []
        # chunk WITHIN each segment too: a hub source's D(D-1)/2 pairs are
        # emitted by leading-row ranges, so no single np allocation exceeds
        # ~wedge_chunk rows even when one node's wedge count does
        from .dedup import _chunk_bounds
        for si in range(len(sizes)):
            n = int(sizes[si])
            if n < 2:
                continue
            off = int(seg[si])
            cnt = np.arange(n - 1, 0, -1, dtype=np.int64)  # pairs per row i
            for row, end in _chunk_bounds(cnt, wedge_chunk):
                c = cnt[row:end]
                tot = int(c.sum())
                offs = np.cumsum(c) - c
                iu = np.repeat(np.arange(row, end), c)
                iv = np.arange(tot) - np.repeat(offs, c) + iu + 1
                out_v.append(d[off + iu])
                out_w.append(d[off + iv])
                out_u.append(np.full(tot, s[off], np.int64))
        if not out_v:
            return pd.DataFrame({"v": pd.Series([], dtype=np.int64),
                                 "w": pd.Series([], dtype=np.int64),
                                 "u": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({"v": np.concatenate(out_v),
                             "w": np.concatenate(out_w),
                             "u": np.concatenate(out_u)})

    wedges = (oriented.groupby("_b")
              .map_groups(bucket_wedges, batch_format="pandas"))

    # --- closure: wedges meet oriented edges in one pair-hash exchange ----
    def wedge_rows(t: pa.Table) -> pa.Table:
        v = t.column("v").to_numpy(zero_copy_only=False)
        w = t.column("w").to_numpy(zero_copy_only=False)
        return pa.table({
            "v": pa.array(v, pa.int64()), "w": pa.array(w, pa.int64()),
            "u": pc.cast(t.column("u"), pa.int64()),
            "kind": pa.array(np.ones(len(v), np.int8)),
            "_pb": pa.array(_coarse_of([v, w], n_coarse))})

    def edge_rows(t: pa.Table) -> pa.Table:
        v = t.column("s").to_numpy(zero_copy_only=False)
        w = t.column("d").to_numpy(zero_copy_only=False)
        return pa.table({
            "v": pa.array(v, pa.int64()), "w": pa.array(w, pa.int64()),
            "u": pa.array(np.zeros(len(v), np.int64)),
            "kind": pa.array(np.zeros(len(v), np.int8)),
            "_pb": pa.array(_coarse_of([v, w], n_coarse))})

    both = (wedges.map_batches(wedge_rows, batch_format="pyarrow")
            .union(oriented.map_batches(edge_rows, batch_format="pyarrow")))

    def bucket_close(g: pd.DataFrame) -> pd.DataFrame:
        is_e = g["kind"].to_numpy() == 0
        ev = g.loc[is_e, ["v", "w"]]
        wd = g.loc[~is_e]
        if len(ev) == 0 or len(wd) == 0:
            return pd.DataFrame({"node": pd.Series([], dtype=np.int64)})
        hit = wd.merge(ev, on=["v", "w"], how="inner")
        if len(hit) == 0:
            return pd.DataFrame({"node": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({"node": np.concatenate([
            hit["u"].to_numpy(np.int64), hit["v"].to_numpy(np.int64),
            hit["w"].to_numpy(np.int64)])})

    corners = both.groupby("_pb").map_groups(bucket_close,
                                             batch_format="pandas")

    # --- final: corner counts through one node-hash exchange --------------
    def tag_node(t: pa.Table) -> pa.Table:
        n = t.column("node").to_numpy(zero_copy_only=False)
        return t.append_column("_b", pa.array(_coarse_of([n], n_coarse)))

    def bucket_count(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby("node", sort=False).size()
        return pd.DataFrame({"node": c.index.to_numpy(np.int64),
                             "n_tri": c.to_numpy(np.int64)})

    out = (corners.map_batches(tag_node, batch_format="pyarrow")
           .groupby("_b").map_groups(bucket_count, batch_format="pandas"))

    def fix(t: pa.Table) -> pa.Table:
        return pa.table({"node": pc.cast(t.column("node"), pa.int64()),
                         "n_tri": pc.cast(t.column("n_tri"), pa.int64())})

    return out.map_batches(fix, batch_format="pyarrow")
