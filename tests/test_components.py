"""Distributed connected components (alternating large-star/small-star over
coarse-bucketed edge shuffles) — correctness vs a driver-side union-find
reference, convergence on worst-case diameters, and the cluster-dedup
contract the near_dup_clusters catalog entry relies on."""

import numpy as np
import pandas as pd
import pytest

import ray
import ray.data

from kafka_connect_s3_ray.functions.dedup import connected_components


def _uf(pairs):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def _ds(pairs):
    return ray.data.from_pandas(pd.DataFrame(
        {"left_id": [int(p[0]) for p in pairs],
         "right_id": [int(p[1]) for p in pairs]}))


def _got(pairs, **kw):
    out = connected_components(_ds(pairs), **kw).to_pandas()
    return dict(zip(out["doc_id"].astype(int), out["cluster_id"].astype(int)))


# driver_cap=0 forces the distributed alternating-star path; the default
# takes the small-edge-set driver union-find fast path — both must agree
# with the reference on every graph
@pytest.mark.parametrize("cap", [0, 1_000_000])
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_components_match_union_find_on_random_graphs(seed, cap):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(10, 500))
    m = int(rng.integers(1, 3 * n))
    a, b = rng.integers(0, n, m), rng.integers(0, n, m)
    keep = a != b
    pairs = list(zip(a[keep].tolist(), b[keep].tolist()))
    if not pairs:
        pytest.skip("degenerate draw")
    assert _got(pairs, driver_cap=cap) == _uf(pairs)


@pytest.mark.parametrize("cap", [0, 1_000_000])
def test_components_chain_worst_case_diameter(cap):
    # a path graph maximizes rounds needed; star convergence must still hold
    pairs = [(i, i + 1) for i in range(300)]
    got = _got(pairs, driver_cap=cap)
    assert set(got) == set(range(301))
    assert set(got.values()) == {0}


def test_components_duplicate_and_reversed_edges_are_harmless():
    pairs = [(5, 3), (3, 5), (5, 3), (9, 3), (20, 21)]
    assert _got(pairs) == {3: 3, 5: 3, 9: 3, 20: 20, 21: 20}


def test_components_empty_pairs_give_empty_typed_output():
    out = connected_components(_ds([]).filter(lambda r: False))
    # Ray's to_pandas() drops columns on an empty dataset; the schema is the
    # contract downstream map_batches consumers see
    assert out.schema().names == ["doc_id", "cluster_id"]
    assert out.count() == 0


def test_components_transitive_cluster_not_split():
    # the motivating case: pairwise output alone would keep {a,c} from
    # {a,b,c} discovered as (a,b),(b,c); the closure maps all three together
    got = _got([(1, 2), (2, 3)])
    assert got == {1: 1, 2: 1, 3: 1}
