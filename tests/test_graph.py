"""PageRank (functions/graph.py): the driver fast path and the distributed
exchange path must compute the identical fixed-k recurrence; a tiny
hand-solvable graph pins the numbers."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from kafka_connect_s3_ray.functions.graph import pagerank


def _edges_ds(rows):
    return ray.data.from_arrow(pa.table({
        "src": [r[0] for r in rows],
        "dst": [r[1] for r in rows],
        "w": [float(r[2]) for r in rows]}))


def _ranks(ds):
    return (ds.to_pandas().sort_values("node").reset_index(drop=True))


def test_pagerank_hand_case():
    # a -> b (w 1): after 1 iteration with d=0.5, N=2:
    # r0 = [0.5, 0.5]; b gets 0.25 + 0.5*0.5 = 0.5; a (no in-edges) gets 0.25
    out = _ranks(pagerank(_edges_ds([("a", "b", 1.0)]), iterations=1,
                          damping=0.5, method="driver"))
    assert out["node"].tolist() == ["a", "b"]
    assert np.allclose(out["pr"], [0.25, 0.5])
    # mass leaks through dangling b: total < 1 after the round
    assert out["pr"].sum() < 1.0


@pytest.mark.parametrize("method", ["driver", "distributed"])
def test_pagerank_paths_agree(method):
    rng = np.random.default_rng(5)
    n_edges = 400
    rows = [(f"n{rng.integers(0, 60)}", f"n{rng.integers(0, 60)}",
             float(rng.integers(1, 5))) for _ in range(n_edges)]
    # dedupe (src, dst) pairs: the contract is aggregated edges
    agg = {}
    for s, d, w in rows:
        agg[(s, d)] = agg.get((s, d), 0.0) + w
    rows = [(s, d, w) for (s, d), w in agg.items()]
    got = _ranks(pagerank(_edges_ds(rows), iterations=3, method=method,
                          scale_by_n=True))
    # reference: plain numpy replay computed inline (independent of either path)
    nodes = sorted({s for s, _, _ in rows} | {d for _, d, _ in rows})
    idx = {v: i for i, v in enumerate(nodes)}
    N = len(nodes)
    outw = np.zeros(N)
    for s, d, w in rows:
        outw[idx[s]] += w
    r = np.full(N, 1.0 / N)
    for _ in range(3):
        c = np.zeros(N)
        for s, d, w in rows:
            c[idx[d]] += r[idx[s]] * (w / outw[idx[s]])
        r = 0.15 / N + 0.85 * c
    exp = pd.DataFrame({"node": nodes, "pr": r * N})
    pd.testing.assert_frame_equal(
        got.round(9), exp.sort_values("node").reset_index(drop=True).round(9),
        check_dtype=False)


def test_pagerank_auto_switch_and_empty():
    ds = _edges_ds([("a", "b", 1.0), ("b", "a", 2.0)])
    small = _ranks(pagerank(ds, iterations=2, method="auto"))
    forced = _ranks(pagerank(ds, iterations=2, method="distributed"))
    pd.testing.assert_frame_equal(small.round(9), forced.round(9),
                                  check_dtype=False)
    empty = pagerank(_edges_ds([]), iterations=2, method="driver")
    assert empty.count() == 0
    with pytest.raises(ValueError):
        pagerank(ds, method="nope")


def test_triangle_counts_known_graph(ray_session):
    """K4 minus one edge: triangles {a,b,c} and {a,b,d} — a,b in 2 each,
    c,d in 1 each; self-loops and duplicate/reversed edges must not
    change the answer."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from kafka_connect_s3_ray.functions.graph import triangle_counts

    edges = pd.DataFrame({
        "u": [1, 1, 1, 2, 2, 2, 1, 3, 3],
        "v": [2, 3, 4, 3, 4, 1, 1, 1, 3],
        #     ^real K4-minus-(3,4)^  dup rev  self
    })
    out = (triangle_counts(ray.data.from_pandas(edges))
           .to_pandas().sort_values("node").reset_index(drop=True))
    assert dict(zip(out["node"], out["n_tri"])) == {1: 2, 2: 2, 3: 1, 4: 1}


def test_triangle_counts_degree_join_fallback(ray_session):
    """The past-broadcast-budget path (two coarse hash joins) must agree
    with the broadcast path on a random graph."""
    import numpy as np
    import pandas as pd
    import ray.data

    from kafka_connect_s3_ray.functions.graph import triangle_counts

    rng = np.random.default_rng(13)
    edges = pd.DataFrame({"u": rng.integers(0, 40, 400),
                          "v": rng.integers(0, 40, 400)})
    a = (triangle_counts(ray.data.from_pandas(edges))
         .to_pandas().sort_values("node").reset_index(drop=True))
    b = (triangle_counts(ray.data.from_pandas(edges),
                         degree_broadcast_nodes=0)
         .to_pandas().sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0
