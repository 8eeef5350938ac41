"""connected_components (operators/components.py) vs a union-find model."""

from __future__ import annotations

import pytest

import random


from arrowhouse_spark.operators.components import (
    connected_components,
    dedup_components,
)


def _model(edges):
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
    # min-id per component
    comp = {}
    for v in list(parent):
        comp[v] = find(v)
    return comp


def test_components_random_graph(spark):
    rng = random.Random(5)
    edges = [(rng.randint(0, 120), rng.randint(0, 120)) for _ in range(80)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: r.component for r in connected_components(df).collect()}
    assert got == _model(edges)


@pytest.mark.slow
def test_components_chain(spark):
    # a pure path graph has maximal diameter — worst case for propagation
    edges = [(i, i + 1) for i in range(20)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: r.component for r in connected_components(df).collect()}
    assert got == {i: 0 for i in range(21)}


def test_dedup_components_keeps_one_per_cluster(spark):
    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5)], "id_a long, id_b long"
    )
    kept = sorted(r.doc_id for r in dedup_components(docs, pairs).collect())
    # clusters {0,1,2} -> keep 0; {4,5} -> keep 4; isolated 3,6,7 pass through
    assert kept == [0, 3, 4, 6, 7]


def test_star_components_random_graph(spark):
    from arrowhouse_spark.operators.components import connected_components_star

    rng = random.Random(13)
    edges = [(rng.randint(0, 150), rng.randint(0, 150)) for _ in range(100)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: r.component for r in connected_components_star(df).collect()}
    assert got == _model(edges)


@pytest.mark.slow
def test_star_components_long_chain(spark):
    # 150-vertex path: diameter far beyond the propagation round cap —
    # the star contraction must converge in O(log^2 n) rounds
    from arrowhouse_spark.operators.components import connected_components_star

    edges = [(i, i + 1) for i in range(150)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: r.component for r in connected_components_star(df).collect()}
    assert got == {i: 0 for i in range(151)}

def test_dedup_keep_best_elects_max_score_min_id(spark):
    from arrowhouse_spark.operators.components import dedup_keep_best

    docs = spark.createDataFrame(
        [(0, 10), (1, 30), (2, 30), (3, 5), (4, 7), (5, 7), (6, 1)],
        "doc_id long, n_chars long",
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5)], "id_a long, id_b long"
    )
    rows = {r.doc_id: (r.component, r.kept) for r in dedup_keep_best(docs, pairs).collect()}
    # cluster {0,1,2}: max n_chars ties 1 vs 2 at 30 -> min doc_id 1 wins
    assert rows[0] == (0, 0) and rows[1] == (0, 1) and rows[2] == (0, 0)
    # cluster {4,5}: tie at 7 -> 4 wins
    assert rows[4] == (4, 1) and rows[5] == (4, 0)
    # singletons are their own component and always kept
    assert rows[3] == (3, 1) and rows[6] == (6, 1)
    assert len(rows) == 7
