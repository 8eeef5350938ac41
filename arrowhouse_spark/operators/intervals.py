"""Interval & sequence analytics: gaps-and-islands and interval-union
coverage — the two classic ordered-set patterns the suite's session/window
family (sessionize, funnel, sweep-line concurrency) doesn't yet cover.

Reference parity note: the reference engine (DataStreams/*) has no interval
operators at all; these are part of the capability superset the brief asks
for (SURVEY.md §2.4-adjacent). Both are pure window+agg compositions —
no Python, no global window, one shuffle on the partition key.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def gaps_islands(
    df: DataFrame,
    key_cols: Sequence[str],
    seq_col: str,
    out_prefix: str = "island",
) -> DataFrame:
    """Maximal runs of CONSECUTIVE integers per key (gaps-and-islands):
    rows whose ``seq_col`` values form an unbroken integer run belong to
    one island. Returns one row per (keys, island) with ``<prefix>_start``,
    ``<prefix>_end`` and ``<prefix>_len``.

    The rn-difference trick keeps it one partitioned window + one keyed
    agg: within a key, ``seq - row_number()`` is constant exactly on a
    consecutive run (both increase by 1 per row), so it IS the island id.
    Requires ``seq_col`` distinct within a key (duplicate sequence values
    would merge runs; dedup upstream).

    Scale: state is one row_number counter per key; the only shuffle is
    the key partitioning, and the island agg reuses it (same keys prefix).
    """
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(F.col(seq_col).asc())
    grp = (F.col(seq_col) - F.row_number().over(w)).alias("__island")
    return (
        df.select(*keys, F.col(seq_col), grp)
        .groupBy(*keys, "__island")
        .agg(
            F.min(seq_col).alias(f"{out_prefix}_start"),
            F.max(seq_col).alias(f"{out_prefix}_end"),
            F.count(F.lit(1)).alias(f"{out_prefix}_len"),
        )
        .drop("__island")
    )


def interval_union_length(
    df: DataFrame,
    key_cols: Sequence[str],
    start_col: str | Column,
    end_col: str | Column,
    out: str = "covered",
) -> DataFrame:
    """Total length covered by the UNION of (possibly overlapping)
    half-open intervals per key — merged-interval coverage (total active
    time from per-event activity windows, total on-air time from
    overlapping sessions). Inputs are numeric interval endpoints
    (cast timestamps to epoch first); returns one row per key with the
    summed coverage and the merged-interval count ``n_intervals``.

    Sweep construction: order intervals by start; a NEW merged interval
    begins where start exceeds the running max of all previous ends
    (half-open: touching intervals [a,b) [b,c) merge — start == prev max
    end continues the merged run). A running sum of the new-interval flag
    labels each merged group; per group coverage = max(end) - min(start),
    exact in integer/epoch arithmetic on any engine.

    Scale: two windows over the SAME (key, start) partitioning — Catalyst
    plans one shuffle + one Window operator pair with O(1) state each (the
    running max and the running flag sum); the rollups reuse the key
    prefix. No global window, no self-join (the naive overlap-merge is a
    range self-join; this is the linear sweep form).
    """
    keys = list(key_cols)
    s, e = F.col(start_col) if isinstance(start_col, str) else start_col, (
        F.col(end_col) if isinstance(end_col, str) else end_col
    )
    base = df.select(*keys, s.alias("__s"), e.alias("__e"))
    w = Window.partitionBy(*keys).orderBy(F.col("__s").asc(), F.col("__e").asc())
    prev_max_end = F.max("__e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = base.withColumn(
        "__new", (prev_max_end.isNull() | (F.col("__s") > prev_max_end)).cast("int")
    )
    grp = F.sum("__new").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = (
        flagged.withColumn("__g", grp)
        .groupBy(*keys, "__g")
        .agg(F.min("__s").alias("__ms"), F.max("__e").alias("__me"))
    )
    return merged.groupBy(*keys).agg(
        F.sum(F.col("__me") - F.col("__ms")).alias(out),
        F.count(F.lit(1)).alias("n_intervals"),
    )
