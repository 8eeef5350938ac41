"""Spatial self-join by grid bucketing — the neighbor-cell pattern.

"All pairs of points within radius r" is the spatial twin of the dedup
family's LSH banding: the naive form is a cartesian self-join, the scale
form buckets points into an r-sized grid so candidates only meet inside a
3x3 cell neighborhood, then an exact integer distance check verifies.
Identical shape to proximity dedup of geotagged media, store-catchment
overlap, and trajectory contact tracing.

Reference parity note: the reference has no joins at all (SURVEY.md
§2.4); superset surface, same spirit as rangejoin.py (1-D interval
bucketing) lifted to 2-D.

Everything is exact integer arithmetic (cells via floor-div, distances as
squared sums) so any engine reproduces the pair set bit-for-bit; an
O(n²) brute-force oracle can certify COMPLETENESS of the candidate
generation, not just precision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_radius_pairs(
    points: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    radius: int,
    out_dist2: str = "dist2",
) -> DataFrame:
    """Every unordered pair of points at Euclidean distance <= ``radius``
    (integer coordinates), as (id_a, id_b, dist2) with id_a < id_b.

    Plan shape (the contract tests/test_plans.py gates): each point lands
    in cell (x DIV r, y DIV r); the left side EXPLODES to its 3x3
    neighbor cells (map-side, x9 rows of 4 longs each) and equi-joins the
    right side on the cell id — a plain hash join, never a cartesian or
    a rangepartitioned theta-join. Any true pair is at most one cell
    apart in each axis, so candidate generation is COMPLETE; the exact
    (dx² + dy² <= r²) filter keeps precision. id_a < id_b on the raw ids
    dedups the symmetric and self matches.

    Scale: shuffle keys are cell ids; cost is Σ_cell |cell|·|3x3
    neighborhood| — linear for bounded density, and a skewed (dense)
    cell is an ordinary hot join key (salt or AQE skew-split upstream).
    At 100 TB this is the only join shape that survives; r chooses the
    density/selectivity trade-off exactly like LSH band width."""
    if radius < 1:
        raise ValueError(f"need radius >= 1, got {radius}")
    from arrowhouse_spark.session import shuffle_parts

    # project to the three needed columns and repartition ONCE: the ×9
    # neighbor-cell explode plus the join's shuffle write otherwise run
    # fused into the scan at input-split parallelism (a single small file
    # = one task does the whole map side), and without the explicit seam
    # the left and right legs each re-scan the input. Both legs share
    # this exchange (ReusedExchange); width is the session's
    # shuffle_parts, and the shuffled rows are 3 longs per point.
    p = points.select(
        F.col(id_col).alias("__id"),
        F.col(x_col).cast("long").alias("__x"),
        F.col(y_col).cast("long").alias("__y"),
    ).repartition(shuffle_parts(points.sparkSession), "__id")
    r = F.lit(int(radius))
    cx = F.expr(f"__x DIV {int(radius)}")
    cy = F.expr(f"__y DIV {int(radius)}")
    right = p.select(
        F.col("__id").alias("__idb"),
        F.col("__x").alias("__xb"),
        F.col("__y").alias("__yb"),
        cx.alias("__cx"),
        cy.alias("__cy"),
    )
    offs = F.expr(
        "explode(array(-1,0,1))"
    )
    left = (
        p.withColumn("__ox", offs)
        .withColumn("__oy", F.expr("explode(array(-1,0,1))"))
        .select(
            F.col("__id").alias("__ida"),
            F.col("__x").alias("__xa"),
            F.col("__y").alias("__ya"),
            (cx + F.col("__ox")).alias("__cx"),
            (cy + F.col("__oy")).alias("__cy"),
        )
    )
    dx = F.col("__xa") - F.col("__xb")
    dy = F.col("__ya") - F.col("__yb")
    d2 = dx * dx + dy * dy
    return (
        left.join(right, ["__cx", "__cy"])
        .filter((F.col("__ida") < F.col("__idb")) & (d2 <= r * r))
        .select(
            F.col("__ida").alias("id_a"),
            F.col("__idb").alias("id_b"),
            d2.alias(out_dist2),
        )
        # no dedup needed: a pair meets at exactly ONE offset (the cell
        # delta), so the join emits each qualifying pair once
    )
