"""grid_radius_pairs vs an O(n^2) python model: completeness + precision."""

from __future__ import annotations

import random

import pytest

from arrowhouse_spark.operators.spatial import grid_radius_pairs


def test_grid_radius_pairs_matches_bruteforce(spark):
    rng = random.Random(11)
    pts = [(i, rng.randrange(100), rng.randrange(100)) for i in range(250)]
    # clustered hotspot: many points in one cell exercises the dense path
    pts += [(1000 + i, 5 + (i % 3), 7 + (i // 3) % 3) for i in range(12)]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    r = 6
    got = {
        (p.id_a, p.id_b): p.dist2
        for p in grid_radius_pairs(df, "id", "x", "y", radius=r).collect()
    }
    want = {}
    for i, xa, ya in pts:
        for j, xb, yb in pts:
            d2 = (xa - xb) ** 2 + (ya - yb) ** 2
            if i < j and d2 <= r * r:
                want[(i, j)] = d2
    assert got == want  # complete AND precise, no duplicates

    # boundary: distance exactly r is IN (<=), r+epsilon out
    edge = spark.createDataFrame(
        [(1, 0, 0), (2, 6, 0), (3, 7, 0)], "id long, x long, y long"
    )
    g = {
        (p.id_a, p.id_b)
        for p in grid_radius_pairs(edge, "id", "x", "y", radius=6).collect()
    }
    assert (1, 2) in g and (1, 3) not in g and (2, 3) in g

    with pytest.raises(ValueError):
        grid_radius_pairs(df, "id", "x", "y", radius=0)
