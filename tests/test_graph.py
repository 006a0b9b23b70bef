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


# ---------------------------------------------------------------------------
# pagerank_int: scaled-integer PageRank (operators/graph.pagerank_int)
# ---------------------------------------------------------------------------

from crawler_spark.operators.graph import PR_SCALE, pagerank_int


def _py_pagerank_int(edges, iters=5, d_num=85, d_den=100):
    """Reference: same scaled-integer recurrence, plain Python dicts."""
    e = sorted(set(edges))
    outdeg = {}
    for u, _v in e:
        outdeg[u] = outdeg.get(u, 0) + 1
    nodes = sorted({u for u, _ in e} | {v for _, v in e})
    base = (PR_SCALE * (d_den - d_num)) // d_den
    ranks = {n: PR_SCALE for n in nodes}
    for _ in range(iters):
        s = {n: 0 for n in nodes}
        for u, v in e:
            s[v] += ranks[u] // outdeg[u]
        ranks = {n: base + (d_num * s[n]) // d_den for n in nodes}
    return ranks


def test_pagerank_matches_python_reference(spark):
    rng = random.Random(13)
    verts = list(range(40))
    edges = [(rng.choice(verts), rng.choice(verts)) for _ in range(120)]
    edges = [(a, b) for a, b in edges if a != b]
    want = _py_pagerank_int(edges)
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.node: r.rank for r in pagerank_int(df).collect()}
    assert got == want


def test_pagerank_deterministic_across_partitioning(spark):
    rng = random.Random(29)
    edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(80)]
    edges = [(a, b) for a, b in edges if a != b]
    df1 = spark.createDataFrame(edges, ["src", "dst"]).repartition(1)
    df2 = spark.createDataFrame(edges, ["src", "dst"]).repartition(16)
    r1 = {r.node: r.rank for r in pagerank_int(df1, iters=4).collect()}
    r2 = {r.node: r.rank for r in pagerank_int(df2, iters=4).collect()}
    assert r1 == r2


def test_pagerank_star_hub_ranks_highest(spark):
    # spokes 1..8 all point at hub 0; hub points back at spoke 1
    edges = [(i, 0) for i in range(1, 9)] + [(0, 1)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    ranks = {r.node: r.rank for r in pagerank_int(df, iters=5).collect()}
    assert ranks[0] == max(ranks.values())
    assert ranks[0] > ranks[2] > 0
