"""connected_components vs a driver-side union-find ground truth."""

import random

from glue_parquet_splitter_spark.operators.graph import connected_components


def _uf(edges):
    """Union-find with union-by-min: final root == min id per component."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {v: find(v) for v in parent}


def _run(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.vertex: r.component for r in connected_components(df).collect()}
    assert got == _uf(edges)


def test_path_graph_long_diameter(spark):
    # a 12-hop chain: forces multiple propagation rounds
    _run(spark, [(i, i + 1) for i in range(12)])


def test_cliques_with_bridge(spark):
    c1 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    c2 = [(a, b) for a in range(10, 15) for b in range(a + 1, 15)]
    _run(spark, c1 + c2 + [(4, 10)])


def test_self_loops_and_duplicates(spark):
    _run(spark, [(1, 1), (1, 2), (2, 1), (3, 3)])


def test_random_graph_matches_union_find(spark):
    rng = random.Random(42)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(80)]
    _run(spark, edges)


def test_connected_components_raises_on_non_convergence(spark):
    """A chain longer than max_iter hops must raise, not silently
    return split components."""
    import pytest

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], ["src", "dst"]
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=2)
    # and with enough rounds the same chain is one component
    comp = connected_components(edges, max_iter=10).collect()
    assert len({r.component for r in comp}) == 1
