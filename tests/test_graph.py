from __future__ import annotations

import numpy as np
import pytest

from arrowhouse_spark.operators.graph import pagerank


def _np_pagerank(edges, iterations=5, d=0.85):
    """Independent dense power-iteration model with uniform dangling
    redistribution — the property differential for the distributed form."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out: dict[int, list[int]] = {}
    for u, v in set(edges):
        out.setdefault(idx[u], []).append(idx[v])
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        nxt = np.full(n, (1.0 - d) / n)
        dangling = sum(r[i] for i in range(n) if i not in out)
        nxt += d * dangling / n
        for u, vs in out.items():
            for v in vs:
                nxt[v] += d * r[u] / len(vs)
        r = nxt
    return {nodes[i]: r[i] for i in range(n)}


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["id"]: r["r"] for r in pagerank(df, **kw).collect()}


@pytest.mark.slow
def test_pagerank_matches_dense_model_on_cycle_with_dangling(spark):
    # A->B->C->A plus C->D where D dangles
    edges = [(1, 2), (2, 3), (3, 1), (3, 4)]
    got = _run(spark, edges, iterations=5)
    want = _np_pagerank(edges, iterations=5)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-12)


@pytest.mark.slow
def test_pagerank_parallel_edges_collapse_and_hub_wins(spark):
    # everything points at 9; duplicated edges must not double-count
    # at low even iteration counts the 1<->9 cycle oscillates (rank mass
    # sloshes between hub and its single successor); 25 rounds is near
    # convergence where the hub's steady-state lead holds
    edges = [(1, 9), (1, 9), (2, 9), (3, 9), (9, 1)]
    got = _run(spark, edges, iterations=25)
    want = _np_pagerank(edges, iterations=25)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12)
    assert got[9] == max(got.values())


@pytest.mark.slow
def test_pagerank_random_graph_differential(spark):
    rng = np.random.default_rng(7)
    edges = [
        (int(rng.integers(0, 12)), int(rng.integers(0, 12))) for _ in range(40)
    ]
    got = _run(spark, edges, iterations=6)
    want = _np_pagerank(edges, iterations=6)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-9)


def _np_ppr(edges, seeds, iterations=5, d=0.85):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out: dict[int, list[int]] = {}
    for u, v in set(edges):
        out.setdefault(idx[u], []).append(idx[v])
    p0 = np.zeros(n)
    for s in seeds:
        p0[idx[s]] = 1.0 / len(seeds)
    r = p0.copy()
    for _ in range(iterations):
        dangling = sum(r[i] for i in range(n) if i not in out)
        nxt = (1 - d) * p0 + d * dangling * p0
        for u, vs in out.items():
            for v in vs:
                nxt[v] += d * r[u] / len(vs)
        r = nxt
    return {nodes[i]: r[i] for i in range(n)}


@pytest.mark.slow
def test_personalized_pagerank_matches_dense_model(spark):
    from arrowhouse_spark.operators.graph import personalized_pagerank

    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (5, 6)]
    seeds = [1]
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(x,) for x in seeds], "src long")
    got = {
        r["id"]: r["r"]
        for r in personalized_pagerank(e, s, iterations=6).collect()
    }
    want = _np_ppr(edges, seeds, iterations=6)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12, abs=1e-15)
    # the 5->6 island is unreachable from seed 1: rank decays to ~0
    assert got[6] < 1e-6 and got[2] > 0.1


def test_hits_star_graph_hand_checked(spark):
    from arrowhouse_spark.operators.graph import hits

    # 1,2,3 all endorse 10; 1 also endorses 11
    edges = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (1, 11)], "src long, dst long"
    )
    out = {r["id"]: (r["hub"], r["authority"]) for r in hits(edges, iterations=1).collect()}
    # a = (3/4, 1/4); h(1) = 1.0/2.5, h(2)=h(3) = 0.75/2.5
    assert out[10] == (0.0, 0.75)
    assert out[11] == (0.0, 0.25)
    assert out[1] == (0.4, 0.0)
    assert out[2] == (0.3, 0.0)
    assert out[3] == (0.3, 0.0)


def test_hits_deterministic_under_repartitioning(spark):
    import random

    from arrowhouse_spark.operators.graph import hits

    rng = random.Random(5)
    edges = spark.createDataFrame(
        [(rng.randint(0, 30), rng.randint(31, 60)) for _ in range(300)],
        "src long, dst long",
    )
    a = sorted(map(tuple, hits(edges, iterations=2).collect()))
    b = sorted(map(tuple, hits(edges.repartition(13), iterations=2).collect()))
    assert a == b
