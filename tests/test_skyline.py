from __future__ import annotations

import random

import pytest

from arrowhouse_spark.operators.skyline import pareto_frontier


def _brute(points):
    """Reference skyline on distinct points: minimize x, maximize y."""
    dom = set()
    pts = sorted(set(points))
    for a in pts:
        for b in pts:
            if b == a:
                continue
            if (b[0] < a[0] and b[1] >= a[1]) or (b[0] <= a[0] and b[1] > a[1]):
                dom.add(a)
                break
    return {p for p in pts if p not in dom}


def test_pareto_hand_checked_with_ties_and_dupes(spark):
    rows = [
        (1, 10.0, 5),
        (2, 10.0, 5),   # exact duplicate: same point, must survive as n=2
        (3, 10.0, 3),   # same price, smaller size: dominated
        (4, 12.0, 5),   # same size, higher price: dominated
        (5, 12.0, 7),
        (6, 15.0, 7),   # dominated by id5 (same size, cheaper exists)
        (7, 20.0, 9),
        (8, 25.0, 1),   # dominated by everything taller and cheaper
    ]
    df = spark.createDataFrame(rows, "pid int, x double, y int")
    got = {
        (r["x"], r["y"]): (r["n_rows"], r["min_id"])
        for r in pareto_frontier(df, "x", "y", "pid", n_buckets=4).collect()
    }
    assert got == {
        (10.0, 5): (2, 1),
        (12.0, 7): (1, 5),
        (20.0, 9): (1, 7),
    }


def test_pareto_degenerate_single_x(spark):
    # all points share x -> one bucket, only max y survives
    df = spark.createDataFrame(
        [(1, 5.0, 1), (2, 5.0, 9), (3, 5.0, 4)], "pid int, x double, y int"
    )
    got = [
        (r["x"], r["y"])
        for r in pareto_frontier(df, "x", "y", "pid").collect()
    ]
    assert got == [(5.0, 9)]


def test_pareto_randomized_vs_brute_force(spark):
    rng = random.Random(8)
    rows = [
        (i, float(rng.randint(0, 40)), rng.randint(0, 20)) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "pid int, x double, y int")
    got = {
        (r["x"], r["y"])
        for r in pareto_frontier(df, "x", "y", "pid", n_buckets=8).collect()
    }
    assert got == _brute([(x, y) for _, x, y in rows])


def test_pareto_rejects_bad_buckets(spark):
    df = spark.createDataFrame([(1, 1.0, 1)], "pid int, x double, y int")
    with pytest.raises(ValueError):
        pareto_frontier(df, "x", "y", "pid", n_buckets=0)
