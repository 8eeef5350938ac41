"""Sessionization — split each key's event stream into sessions at
inactivity gaps. Not in the reference (which has no event-time notions);
provided because it is the standard event-table operation a training-data /
analytics pipeline needs, and it showcases the engine's window-function
superset (reference has no window functions, SURVEY.md §2.3).

Design: one shuffle by key, then two linear window passes over the sorted
partition — ``lag`` marks gap starts, a running sum numbers sessions. No
state beyond the previous row; holds at any scale (skewed keys → hot
partition, as for any keyed shuffle).

For continuous/streaming data the same semantics come from Structured
Streaming's ``session_window`` aggregation; this operator is the batch form
that also ASSIGNS the session id back to each event row.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    gap_seconds: int,
    out: str = "session_id",
) -> DataFrame:
    """Adds ``out``: a per-key session index (0-based) that increments
    whenever the gap to the previous event of the same key exceeds
    ``gap_seconds``."""
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col).asc())
    prev_ts = F.lag(ts_col).over(w)
    gap = F.col(ts_col).cast("double") - prev_ts.cast("double")
    is_new = F.when(prev_ts.isNull() | (gap > gap_seconds), 1).otherwise(0)
    # running sum of session starts, minus 1 to be 0-based
    sid = F.sum(is_new).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ) - F.lit(1)
    return df.withColumn(out, sid.cast("long"))


def session_stats(
    df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    gap_seconds: int,
) -> DataFrame:
    """One row per (key, session): event count, start, end, duration seconds.
    Built on sessionize — the groupBy reuses the same key partitioning, so
    AQE plans a single effective shuffle chain."""
    keys = list(key_cols)
    s = sessionize(df, ts_col, keys, gap_seconds)
    return s.groupBy(*keys, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (F.max(F.col(ts_col).cast("double")) - F.min(F.col(ts_col).cast("double"))).alias(
            "duration_s"
        ),
    )
