"""Unit tests for distributed connected components (operators/graph.py):
exact agreement with a Python union-find over random graphs, chain graphs
deeper than one propagation round, and determinism across reruns."""

import random

from crawler_spark.operators.graph import connected_components


def _edges_df(spark, edges):
    return spark.createDataFrame(edges, ["doc_a", "doc_b"])


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


def test_chain_deeper_than_one_round(spark):
    # a 9-vertex path: min label must travel 8 hops -> exercises the loop
    edges = [(i, i + 1) for i in range(8)]
    got = {r.v: r.lbl for r in connected_components(_edges_df(spark, edges)).collect()}
    assert got == {v: 0 for v in range(9)}


def test_matches_union_find_on_random_graph(spark):
    rng = random.Random(7)
    verts = list(range(100, 160))
    edges = [(rng.choice(verts), rng.choice(verts)) for _ in range(70)]
    edges = [(a, b) for a, b in edges if a != b]
    want = _union_find(edges)
    df = _edges_df(spark, edges)
    got1 = {r.v: r.lbl for r in connected_components(df).collect()}
    got2 = {r.v: r.lbl for r in connected_components(df).collect()}
    assert got1 == want
    assert got2 == want  # deterministic across reruns


def test_duplicate_and_reversed_edges_are_harmless(spark):
    edges = [(1, 2), (2, 1), (1, 2), (3, 4)]
    got = {r.v: r.lbl for r in connected_components(_edges_df(spark, edges)).collect()}
    assert got == {1: 1, 2: 1, 3: 3, 4: 3}
