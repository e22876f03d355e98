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
