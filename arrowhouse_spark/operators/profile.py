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


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    cat_col: str,
    round_dp: int = 6,
    smooth: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between a reference and a current
    categorical distribution — the standard production drift monitor
    (PSI < 0.1 stable, 0.1-0.25 drifting, > 0.25 shifted; public credit-
    scoring/ML-ops convention). PSI = Σ (p_cur - p_ref) · ln(p_cur/p_ref)
    over categories, with symmetric ``smooth`` additive smoothing so a
    category present on one side only stays finite.

    Plan: one keyed count per side (map-side partials), a full-outer join
    on the category (tiny relation — distinct categories), totals as
    1-row broadcasts, one final 1-row sum. Emits both the total PSI and
    the per-category contributions (the drill-down a drift alert needs).
    """
    rc = ref.groupBy(F.col(cat_col).alias("cat")).agg(
        F.count(F.lit(1)).alias("n_ref")
    )
    cc = cur.groupBy(F.col(cat_col).alias("cat")).agg(
        F.count(F.lit(1)).alias("n_cur")
    )
    joined = rc.join(cc, "cat", "full_outer").select(
        "cat",
        F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
        F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
    )
    tot = joined.agg(
        F.sum("n_ref").alias("__tr"), F.sum("n_cur").alias("__tc")
    )
    p = (F.col("n_ref") + F.lit(smooth)) / (F.col("__tr") + F.lit(smooth))
    q = (F.col("n_cur") + F.lit(smooth)) / (F.col("__tc") + F.lit(smooth))
    return (
        joined.crossJoin(F.broadcast(tot))
        .withColumn("psi_term", F.round((q - p) * F.log(q / p), round_dp))
        .select("cat", "n_ref", "n_cur", "psi_term")
    )
