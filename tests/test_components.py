"""connected_components vs a pure-Python union-find oracle, across graph
shapes that stress different convergence paths: chains (max diameter —
the case plain label propagation can't afford), cliques (dedup's usual
shape), random sparse graphs, stars, and singleton pairs."""

from __future__ import annotations

import random

import pytest

from opendataloader_pdf_spark.operators.components import connected_components


def _union_find(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min member
    return {n: find(n) for n in parent}


def _check(spark, edges: list[tuple[int, int]]) -> None:
    df = spark.createDataFrame(edges, "id_a: long, id_b: long")
    got = {
        (r["node"], r["component"])
        for r in connected_components(df, "id_a", "id_b").collect()
    }
    want = set(_union_find(edges).items())
    assert got == want


def test_chain(spark):
    # path graph 0-1-2-...-63: diameter 63, alternating star still
    # collapses it in O(log^2) rounds
    _check(spark, [(i, i + 1) for i in range(63)])


def test_cliques_and_singletons(spark):
    edges = []
    for base in (0, 100, 200):
        members = list(range(base, base + 7))
        edges += [(a, b) for a in members for b in members if a < b]
    edges += [(1000, 1001), (2000, 2001)]
    _check(spark, edges)


def test_star_and_reverse_orientation(spark):
    # hub listed as dst half the time: orientation must not matter
    _check(spark, [(0, i) if i % 2 else (i, 0) for i in range(1, 40)])


@pytest.mark.parametrize("seed", [7, 42])
def test_random_sparse(spark, seed):
    rng = random.Random(seed)
    edges = [
        (rng.randrange(500), rng.randrange(500)) for _ in range(400)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    _check(spark, edges)


def test_incremental_closure(spark):
    # the converged (node, component) mapping is itself an edge list with
    # the same closure — union it with NEW pairs instead of re-walking
    # old pairs (incremental corpus growth)
    old = [(i, i + 1) for i in range(0, 20, 2)]  # 10 two-node components
    new = [(1, 3), (5, 7), (100, 101)]
    prior = connected_components(
        spark.createDataFrame(old, "id_a: long, id_b: long"), "id_a", "id_b"
    ).toDF("id_a", "id_b")
    inc = connected_components(
        prior.unionAll(spark.createDataFrame(new, "id_a: long, id_b: long")),
        "id_a", "id_b",
    )
    batch = connected_components(
        spark.createDataFrame(old + new, "id_a: long, id_b: long"),
        "id_a", "id_b",
    )
    assert {tuple(r) for r in inc.collect()} == {tuple(r) for r in batch.collect()}


def test_empty(spark):
    df = spark.createDataFrame([], "id_a: long, id_b: long")
    assert connected_components(df, "id_a", "id_b").count() == 0


def test_self_loops_only(spark):
    df = spark.createDataFrame([(5, 5), (9, 9)], "id_a: long, id_b: long")
    assert connected_components(df, "id_a", "id_b").count() == 0
