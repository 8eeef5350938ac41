"""Single-pass column profiler — per-column row/null/distinct counts and
min/max, emitted long-format (one row per column). The data-quality
pre-flight of a training pipeline (no reference counterpart; the closest
machinery is its per-column aggregate surface, SURVEY.md §2.3).

One wide aggregate computes every statistic in a single scan + one shuffle
of a handful of partial-state rows; the wide row then unpivots via stack().
Exact count(distinct) per column multiplies the aggregation buffers (Spark
expands each into its own dedup), so at 100 TB swap ``exact_distinct=False``
to approx_count_distinct — same plan shape, sketch-sized state.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def profile(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    exact_distinct: bool = True,
    round_digits: int = 4,
) -> DataFrame:
    """One row per profiled column:
    (column, n_rows, n_null, n_distinct, min_num, max_num, min_str, max_str).
    Numeric min/max are rounded doubles; string min/max are the values
    themselves; each is NULL for the other kind."""
    cols = list(columns) if columns is not None else df.columns
    numeric = {
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, T.NumericType)
    }
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        col = F.col(c)
        aggs.append(F.sum(col.isNull().cast("long")).alias(f"__null_{c}"))
        aggs.append(
            (
                F.count_distinct(col)
                if exact_distinct
                else F.approx_count_distinct(col)
            ).alias(f"__dist_{c}")
        )
        if c in numeric:
            aggs.append(F.round(F.min(col).cast("double"), round_digits).alias(f"__min_{c}"))
            aggs.append(F.round(F.max(col).cast("double"), round_digits).alias(f"__max_{c}"))
        else:
            aggs.append(F.min(col.cast("string")).alias(f"__min_{c}"))
            aggs.append(F.max(col.cast("string")).alias(f"__max_{c}"))
    wide = df.agg(*aggs)

    stack_parts = []
    for c in cols:
        if c in numeric:
            mn, mx = f"`__min_{c}`", f"`__max_{c}`"
            num = f"{mn}, {mx}, CAST(NULL AS STRING), CAST(NULL AS STRING)"
        else:
            mn, mx = f"`__min_{c}`", f"`__max_{c}`"
            num = f"CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), {mn}, {mx}"
        stack_parts.append(f"'{c}', `__null_{c}`, `__dist_{c}`, {num}")
    stack = (
        f"stack({len(cols)}, {', '.join(stack_parts)}) AS "
        "(column, n_null, n_distinct, min_num, max_num, min_str, max_str)"
    )
    return wide.select(F.col("n_rows"), F.expr(stack)).select(
        "column", "n_rows", "n_null", "n_distinct",
        "min_num", "max_num", "min_str", "max_str",
    )
