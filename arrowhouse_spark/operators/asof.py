"""As-of join — for each left row, the latest right row at-or-before its
timestamp (per key). Absent from the reference (it has no joins at all,
SURVEY.md §2.4); this is the canonical time-series operator a user of a
ClickHouse-family engine expects (ClickHouse ASOF JOIN), provided as part of
the engine's join superset.

Spark-first design — the "union trick", NOT a range join:
a naive join on ``l.key = r.key AND l.ts >= r.ts`` + max-per-left-row
explodes to |L|×|R| rows per key before pruning. Instead, union both sides
tagged, then one window pass per key ordered by (ts, side) carrying the
last-seen right payload forward:

    union(left+side=1, right+side=0)
      → last(value, ignorenulls=True) OVER (PARTITION BY key
            ORDER BY ts, side ROWS UNBOUNDED PRECEDING..CURRENT)
      → keep left rows

Cost: ONE shuffle by key + a linear per-partition sorted scan — the same
asymptotics as a dedicated merge-asof, and it holds at 100 TB because the
window never buffers more than the running state (last right row). Skewed
keys degrade to a hot partition like any keyed shuffle; salt upstream if a
single key dominates.

``allow_exact_matches`` controls tie order at equal timestamps: True (≥,
the ClickHouse/DuckDB default) sorts right rows before left ones so an
equal-ts right row is visible; False (>) sorts them after.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str],
    value_cols: Sequence[str],
    direction: str = "backward",
    allow_exact_matches: bool = True,
    prefix: str = "asof_",
) -> DataFrame:
    """For each left row, attach ``prefix``-renamed ``value_cols`` from the
    latest right row with ``r.on <= l.on`` (direction="backward"; "forward"
    = earliest right row with ``r.on >= l.on``), matching on ``by`` keys.
    Unmatched left rows keep NULLs (left-join semantics)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by = list(by)
    value_cols = [c for c in value_cols if c not in by and c != on]
    out_vals = [f"{prefix}{c}" for c in value_cols]

    # right rows sort before left at equal ts for >= semantics, after for >
    right_rank = 0 if allow_exact_matches else 2
    l_tagged = left.select(
        "*",
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(v) for c, v in zip(value_cols, out_vals)],
    )
    r_tagged = right.select(
        *[F.lit(None).cast(t).alias(c) for c, t in left.dtypes if c not in by and c != on],
        *by,
        F.col(on),
        F.lit(right_rank).alias("__side"),
        *[F.col(c).alias(v) for c, v in zip(value_cols, out_vals)],
    ).select(*l_tagged.columns)  # align column order for the union

    u = l_tagged.unionByName(r_tagged)
    order = [F.col(on).asc(), F.col("__side").asc()]
    if direction == "forward":
        order = [F.col(on).desc(), F.col("__side").asc()]
        if not allow_exact_matches:
            # forward strict: right rows at equal ts must be invisible, i.e.
            # sort after left in the DESC scan — rank 2 already does that
            pass
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for v in out_vals:
        u = u.withColumn(v, F.last(v, ignorenulls=True).over(w))
    return u.filter(F.col("__side") == 1).drop("__side")
