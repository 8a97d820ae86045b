"""Connected components (operators/graph.py) vs a python union-find oracle.

The query-level parity check (neardup_cc_clusters vs a recursive-CTE oracle)
covers the fixture graph, which is mostly 2-cliques; these tests drive the
shapes that actually stress the algorithm — long chains (diameter ≫ rounds,
the case min-label propagation can't do in O(log n)), stars, cycles, and
random graphs.
"""

from __future__ import annotations

import random

from big_data__instagram_analysis_spark.operators.graph import (
    attach_components,
    connected_components,
)


def _union_find(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-id per component, for every node touched by an edge
    touched = {v for e in edges for v in e}
    comp_min: dict[int, int] = {}
    for v in touched:
        r = find(v)
        comp_min[r] = min(comp_min.get(r, v), v)
    return {v: comp_min[find(v)] for v in touched}


def _run_cc(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = connected_components(df)
    return {r["node"]: r["component"] for r in got.collect()}


def test_chain_collapses_despite_diameter(spark):
    """A 60-node chain: diameter 59, must converge in ≤ 25 alternations."""
    edges = [(i, i + 1) for i in range(59)]
    assert _run_cc(spark, edges) == _union_find(60, edges)


def test_two_stars_and_a_cycle(spark):
    edges = (
        [(0, i) for i in range(1, 6)]          # star rooted at 0
        + [(100, 100 + i) for i in range(1, 6)]  # star rooted at 100
        + [(20, 21), (21, 22), (22, 20)]       # 3-cycle
    )
    assert _run_cc(spark, edges) == _union_find(200, edges)


def test_duplicate_and_reversed_edges_are_canonicalized(spark):
    edges = [(3, 7), (7, 3), (3, 7), (7, 9)]
    got = _run_cc(spark, edges)
    assert got == {3: 3, 7: 3, 9: 3}


def test_random_graphs_match_union_find(spark):
    rng = random.Random(42)
    for _ in range(3):
        n = 40
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(rng.randrange(10, 50))
        ]
        edges = [e for e in edges if e[0] != e[1]]
        assert _run_cc(spark, edges) == _union_find(n, edges)


def test_attach_components_labels_isolated_nodes_as_self(spark):
    nodes = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    edges = spark.createDataFrame([(1, 4), (4, 5)], "src long, dst long")
    got = {
        r["doc_id"]: r["component"]
        for r in attach_components(nodes, edges, "doc_id").collect()
    }
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 1, 5: 1}
