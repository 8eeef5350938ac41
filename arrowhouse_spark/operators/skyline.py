"""Pareto-frontier (skyline) computation — 2-D minimize/maximize.

The skyline operator (Börzsönyi/Kossmann/Stocker, ICDE 2001) returns
the points no other point dominates; for two objectives (minimize x,
maximize y) a point is dominated iff some other point has x' <= x and
y' >= y with at least one strict. Not in the reference's operator set
(`/root/reference/DataStreams/` has no dominance operator) — extension
surface, the standard multi-objective shortlist query (cheapest-vs-best
trade-off curves).

Distributed shape (the grid-partitioning scheme the skyline literature
uses, re-expressed declaratively):

1. Reduce to DISTINCT (x, y) points with a count + min-id rollup — one
   keyed aggregation; all dominance logic then runs on the (usually far
   smaller) point set, and exact duplicates can never knock each other
   out (dominance requires one STRICT inequality).
2. Grid-partition x into B fixed buckets from the global [min, max]
   (one 1-row broadcast aggregate). Points in a strictly lower bucket
   have strictly smaller x by construction.
3. LOCAL pass: per-bucket window ordered by (x asc, y desc): a point is
   locally dominated iff the running max of y over STRICTLY preceding
   rows >= y (an earlier row in this order has x' < x, or x' = x with
   y' > y — exactly a dominator). Windows are partitioned by bucket —
   never global.
4. CROSS-BUCKET pass: a point is dominated by a lower bucket iff that
   bucket's max y >= the point's y. The per-bucket max-y summary is B
   rows; its strict-lower cumulative max is a B x B broadcast theta
   self-join — constant-sized, corpus-size-free.

Both passes together are exact: a same-bucket dominator is caught by
(3) (the running max includes dominated dominators — dominance is
transitive through max), a lower-bucket one by (4), and a higher-bucket
point cannot dominate (its x is strictly larger).

Scale: shuffles are the distinct-point aggregation and the per-bucket
window sort; per-reducer window state is one running max. At 100 TB the
point reduction is the load-bearing step — frontier candidates per
bucket are bounded by the bucket's distinct-y count, and B scales the
parallelism knob.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pareto_frontier(
    df: DataFrame,
    min_col: str,
    max_col: str,
    id_col: str,
    n_buckets: int = 32,
) -> DataFrame:
    """Exact 2-D skyline: minimize ``min_col``, maximize ``max_col``.

    Returns one row per non-dominated DISTINCT (min_col, max_col) point:
    (min_col, max_col, n_rows, min_id) — n_rows counts the input rows on
    the point, min_id is the smallest ``id_col`` among them (the
    deterministic representative).
    """
    if n_buckets < 1:
        raise ValueError(f"need n_buckets >= 1, got {n_buckets}")
    x, y = F.col(min_col), F.col(max_col)
    pts = df.groupBy(min_col, max_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min(id_col).cast("long").alias("min_id"),
    )
    bounds = pts.agg(
        F.min(min_col).alias("__mn"), F.max(min_col).alias("__mx")
    )
    b = pts.crossJoin(F.broadcast(bounds)).withColumn(
        "__bucket",
        F.when(
            F.col("__mx") > F.col("__mn"),
            F.least(
                F.floor(
                    (x - F.col("__mn"))
                    / (F.col("__mx") - F.col("__mn"))
                    * F.lit(n_buckets)
                ),
                F.lit(n_buckets - 1),
            ),
        )
        .otherwise(F.lit(0))
        .cast("long"),
    )
    w = (
        Window.partitionBy("__bucket")
        .orderBy(x.asc(), y.desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = b.withColumn("__prev_max", F.max(y).over(w))
    summary = b.groupBy("__bucket").agg(F.max(y).alias("__bmax"))
    lower = (
        summary.alias("s")
        .join(
            F.broadcast(summary.alias("t")),
            F.col("t.__bucket") < F.col("s.__bucket"),
            "left",
        )
        .groupBy(F.col("s.__bucket").alias("__bucket"))
        .agg(F.max(F.col("t.__bmax")).alias("__lower_max"))
    )
    out = local.join(F.broadcast(lower), "__bucket", "left")
    keep = (
        (F.col("__prev_max").isNull() | (F.col("__prev_max") < y))
        & (F.col("__lower_max").isNull() | (F.col("__lower_max") < y))
    )
    return out.filter(keep).select(min_col, max_col, "n_rows", "min_id")
