"""Approximate GROUP BY with a key-cardinality limit ≡ the reference's
``max_rows_to_group_by`` + ``OverflowMode`` (/root/reference/
arrow_clickhouse_types.h:24-34; checkLimits Aggregator.cpp:531-550;
find-only path executeImplBatch Aggregator.cpp:361-369).

Reference semantics: once the hash table reaches max_rows,
  THROW — abort the query;
  BREAK — stop consuming input (not reproducible in a declarative plan);
  ANY   — keep aggregating rows whose key is already present, ignore new keys
          (arrival-order dependent!), optionally folding the rest into one
          ``overflow_row``.

Distributed design (SURVEY.md §4 item 1): arrival order is not meaningful
across shuffles, so ANY here picks a DETERMINISTIC key subset — the
``max_rows`` heaviest keys (count, tie-break by key) — and aggregates the
remainder into the overflow row when requested. This is the documented
deviation: same bounded-output guarantee, deterministic instead of
arrival-dependent.

Plan shape (2 passes over the pre-aggregated keys, not the input):
  1. full groupBy (partial→final; output is bounded by TRUE key cardinality);
  2. top-k select the max_rows heaviest keys (TakeOrderedAndProject — per-
     partition top-k then driver merge, never a global sort/window), and find
     the dropped tail with a broadcast anti-join against the kept key set.
Pass 1 is exactly the cost of the plain group-by; pass 2 operates on its
(already reduced) output with no extra shuffle — at 100 TB the dominant cost
is unchanged and the output bound is enforced exactly.
"""

from __future__ import annotations

import enum
from functools import reduce
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class OverflowMode(enum.Enum):
    THROW = "throw"
    ANY = "any"


class GroupByLimitExceeded(Exception):
    """≡ the THROW mode's "too many rows" error (Aggregator.cpp:538-543)."""


def group_by_limited(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, Column],
    max_rows: int,
    mode: OverflowMode = OverflowMode.ANY,
    overflow_row: bool = False,
) -> DataFrame:
    """GROUP BY with at most ``max_rows`` output groups.

    ``aggs`` maps result name → UNALIASED aggregate Column built from
    re-aggregable functions (sum/count/min/max — the merge step reuses them).
    With ``overflow_row=True`` one extra row with NULL keys carries the
    aggregate of all dropped groups (≡ the reference's params.overflow_row;
    note NULL keys are distinguishable from real NULL-key groups only by the
    ``__overflow`` marker column kept in the output).
    """
    agg_cols = [c.alias(n) for n, c in aggs.items()]
    full = df.groupBy(*keys).agg(
        *agg_cols, F.count(F.lit(1)).alias("__group_weight")
    )

    if mode is OverflowMode.THROW:
        n = full.limit(max_rows + 1).count()
        if n > max_rows:
            raise GroupByLimitExceeded(
                f"GROUP BY produced more than max_rows={max_rows} groups"
            )
        return full.drop("__group_weight")

    # ANY: deterministic heaviest-keys selection. orderBy().limit() compiles
    # to TakeOrderedAndProject (per-partition top-k, driver merge of k rows per
    # partition) — no global sort, no single-partition window, holds at any
    # group cardinality since only max_rows rows ever leave the partitions.
    kept_full = full.orderBy(
        F.col("__group_weight").desc(), *[F.col(k).asc_nulls_last() for k in keys]
    ).limit(max_rows)
    kept = kept_full.drop("__group_weight")
    if not overflow_row:
        return kept
    kept = kept.withColumn("__overflow", F.lit(False))
    # dropped tail = all groups minus the kept key set; kept is ≤ max_rows rows
    # so the anti-join broadcasts. Null-safe equality keeps NULL-key groups
    # matched (groupBy groups NULLs together, plain "=" would never match them).
    kept_keys = kept_full.select(*[F.col(k).alias(f"__kept_{k}") for k in keys])
    cond = reduce(
        lambda a, b: a & b,
        [F.col(k).eqNullSafe(F.col(f"__kept_{k}")) for k in keys],
    )
    dropped = full.join(F.broadcast(kept_keys), cond, "left_anti")
    # re-aggregate the dropped groups' aggregates into one row. sum/count fold
    # by sum; min/max fold by min/max — the caller's agg exprs are re-applied
    # to the partial columns where that is sound (sum,count,min,max,any).
    merged = dropped.agg(
        *[_refold(n, c).alias(n) for n, c in aggs.items()]
    )
    for k in keys:
        merged = merged.withColumn(k, F.lit(None).cast(dict(df.dtypes)[k] if k in dict(df.dtypes) else "string"))
    merged = merged.withColumn("__overflow", F.lit(True))
    return kept.unionByName(merged.select(*kept.columns))


def _refold(name: str, original: Column) -> Column:
    """Fold partial aggregate column ``name`` across dropped groups. Sound for
    the reference's aggregate set: sum→sum, count→sum, min→min, max→max,
    any→any_value. Detected from the expression string."""
    s = str(original)
    col = F.col(name)
    low = s.lower()
    if low.startswith("column<'count("):
        return F.sum(col)
    if low.startswith("column<'min("):
        return F.min(col)
    if low.startswith("column<'max("):
        return F.max(col)
    if low.startswith("column<'any_value(") or low.startswith("column<'first("):
        return F.any_value(col, True)
    return F.sum(col)  # sum and sum-like
