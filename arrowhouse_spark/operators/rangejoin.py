"""Interval (range) join — points against [lo, hi] intervals — without the
cartesian/BroadcastNestedLoop plan Spark produces for a naive range predicate.

Not in the reference (which has no joins at all, SURVEY.md §2.4); this is
part of the capability superset, built scale-first: the standard bucketed
range join (interval binning, as used by Spark range-join optimizations and
interval-join implementations in Flink). Each interval explodes into the
fixed-width buckets it covers; points key by their own bucket; the join runs
as an ordinary equi-join on (by-keys, bucket) — shuffle-partitioned, AQE
skew-splittable — followed by the exact containment filter. Cost is
|intervals|·(len/bucket_width + 1) duplicated rows instead of |L|·|R| pairs;
choose ``bucket_width`` ≈ the typical interval length so the duplication
factor stays ~2.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    by: Sequence[str] = (),
    bucket_width: int | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with lo ≤ point ≤ hi (and
    equal ``by`` keys). ``point_col``/``lo_col``/``hi_col`` must be integral
    (e.g. epoch-µs longs). Output = points columns + intervals columns.

    ``bucket_width`` defaults to a single bucket per interval length of the
    widest *assumed* window — callers should pass the typical interval length
    explicitly; it is a required tuning knob at scale.
    """
    if how != "inner":
        raise ValueError("range_join supports inner joins only")
    if bucket_width is None:
        raise ValueError("bucket_width is required (≈ typical interval length)")
    w = F.lit(int(bucket_width))

    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w).cast("long"),
                F.floor(F.col(hi_col) / w).cast("long"),
            )
        ),
    )
    pt = points.withColumn("__bucket", F.floor(F.col(point_col) / w).cast("long"))
    on: list[Column] = [pt["__bucket"] == iv["__bucket"]]
    for k in by:
        on.append(pt[k] == iv[k])
    joined = pt.join(iv, on, "inner").filter(
        (pt[point_col] >= iv[lo_col]) & (pt[point_col] <= iv[hi_col])
    )
    # drop the helper bucket columns and the duplicated by-columns
    keep = [pt[c] for c in points.columns] + [
        iv[c] for c in intervals.columns if c not in by
    ]
    return joined.select(*keep)
