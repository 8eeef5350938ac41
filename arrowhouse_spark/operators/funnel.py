"""Event-funnel analysis — how far each user progresses through an ordered
step sequence within a time window (the role ClickHouse's ``windowFunnel``
plays; the reference itself has no event-time operators, SURVEY.md §2.8, so
this is capability-superset work for the events pipeline).

Spark-first design: NO per-user sorting or Python state. Step k's entry time
is the cascaded conditional aggregate

    t_k = min(ts WHERE type = step_k AND ts >= t_{k-1})

computed as one groupBy(user) pass per step: aggregate, self-join the
previous step's time back in, aggregate again. That is k shuffles all keyed
by the same user column (co-partitioned — AQE reuses the exchange), each
carrying one row per user, not per event. A 3-step funnel over 10^12 events
shuffles 3 × |users| rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_steps(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    window: int | None = None,
) -> DataFrame:
    """Per user: ``step_k_ts`` = earliest time the user completed step k
    having already completed steps 1..k-1 in order, and ``max_step`` = number
    of steps completed. ``window`` (same units as ``ts_col``, which must be
    numeric/ordinal) bounds the whole funnel relative to step 1.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    ev = events.select(user_col, type_col, ts_col)

    out = (
        ev.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("step_1_ts"))
    )
    for k, step in enumerate(steps[1:], start=2):
        prev = f"step_{k - 1}_ts"
        cand = ev.filter(F.col(type_col) == step).select(
            user_col, F.col(ts_col).alias("__t")
        )
        cond = [F.col("__t") >= F.col(prev)]
        if window is not None:
            cond.append(F.col("__t") <= F.col("step_1_ts") + F.lit(window))
        joined = out.join(cand, on=user_col, how="left").withColumn(
            "__ok",
            F.when(cond[0] & (cond[1] if window is not None else F.lit(True)), F.col("__t")),
        )
        out = joined.groupBy(user_col, *[f"step_{i}_ts" for i in range(1, k)]).agg(
            F.min("__ok").alias(f"step_{k}_ts")
        )
    step_cols = [f"step_{i}_ts" for i in range(1, len(steps) + 1)]
    max_step = sum(
        (F.col(c).isNotNull()).cast("int") for c in step_cols
    )
    return out.select(user_col, *step_cols, max_step.alias("max_step"))
