"""Connected components / near-dup cluster collapse (operators/components.py):
parity against a pure-Python union-find on randomized graphs, multi-round
convergence on a path graph, and keep-list semantics."""

import random

import pytest
from pyspark.sql import functions as F

from webcrawler_spark.operators import components as CC


def _union_find_labels(n_nodes, edges):
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
    # min id of each component
    comp_min = {}
    touched = {x for e in edges for x in e}
    for x in touched:
        r = find(x)
        comp_min.setdefault(r, min(y for y in touched if find(y) == r))
    return {x: comp_min[find(x)] for x in touched}


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cc_matches_union_find(spark, seed):
    rng = random.Random(seed)
    n = 60
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(45)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "id_a int, id_b int")
    got = {
        (r["node"], r["cluster_id"])
        for r in CC.connected_components(df).collect()
    }
    want = set(_union_find_labels(n, edges).items())
    assert got == want


def test_cc_path_graph_needs_multiple_rounds(spark):
    # 0-1-2-...-15: diameter 15; min-label propagation must iterate, and the
    # single component collapses to label 0
    edges = [(i, i + 1) for i in range(15)]
    df = spark.createDataFrame(edges, "id_a int, id_b int")
    rows = CC.connected_components(df).collect()
    assert len(rows) == 16
    assert all(r["cluster_id"] == 0 for r in rows)


def test_cc_empty_pairs(spark):
    df = spark.createDataFrame([], "id_a int, id_b int")
    assert CC.connected_components(df).count() == 0


def test_cc_raises_past_max_iter(spark):
    edges = [(i, i + 1) for i in range(8)]
    df = spark.createDataFrame(edges, "id_a int, id_b int")
    with pytest.raises(RuntimeError, match="did not converge"):
        CC.connected_components(df, max_iter=2)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_star_matches_union_find(spark, seed):
    rng = random.Random(seed)
    n = 60
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(45)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "id_a int, id_b int")
    got = {
        (r["node"], r["cluster_id"])
        for r in CC.connected_components_star(df).collect()
    }
    want = set(_union_find_labels(n, edges).items())
    assert got == want


def test_star_long_path_beats_propagation_cap(spark):
    # 0-1-2-...-120: diameter 120 — min-label propagation needs ~120 rounds
    # (cap it low to keep the negative case cheap), large-star/small-star
    # converges in O(log^2 n)
    edges = [(i, i + 1) for i in range(120)]
    df = spark.createDataFrame(edges, "id_a int, id_b int")
    with pytest.raises(RuntimeError, match="did not converge"):
        CC.connected_components(df, max_iter=5)
    rows = CC.connected_components_star(df).collect()
    assert len(rows) == 121
    assert all(r["cluster_id"] == 0 for r in rows)


def test_star_empty_pairs(spark):
    df = spark.createDataFrame([], "id_a int, id_b int")
    assert CC.connected_components_star(df).count() == 0


def test_star_string_ids(spark):
    # ids pass through untouched (lexicographic min), matching propagation
    pairs = spark.createDataFrame(
        [("b", "c"), ("c", "a"), ("x", "y")], "id_a string, id_b string"
    )
    star = {
        (r["node"], r["cluster_id"])
        for r in CC.connected_components_star(pairs).collect()
    }
    prop = {
        (r["node"], r["cluster_id"])
        for r in CC.connected_components(pairs).collect()
    }
    assert star == prop == {
        ("a", "a"), ("b", "a"), ("c", "a"), ("x", "x"), ("y", "x"),
    }


def test_near_dup_clusters_algorithm_switch(spark):
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a int, id_b int")
    got = {
        (r["doc_id"], r["cluster_id"])
        for r in CC.near_dup_clusters(pairs, algorithm="star").collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1)}


def test_dedup_keep_list_semantics(spark):
    # clusters: {1,2,3} via 1-2, 2-3 (transitive); {7,8}; 5 and 9 singletons
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "id_a int, id_b int"
    )
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in (1, 2, 3, 5, 7, 8, 9)], "doc_id int, text string"
    )
    clusters = CC.near_dup_clusters(pairs)
    got = {
        (r["doc_id"], r["cluster_id"]) for r in clusters.collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (7, 7), (8, 7)}
    kept = sorted(
        r["doc_id"] for r in CC.dedup_keep_list(docs, clusters).collect()
    )
    # representatives 1 and 7 kept; transitives 2,3,8 dropped; singletons kept
    assert kept == [1, 5, 7, 9]
